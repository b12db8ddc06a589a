#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads Verify.scala output (<out>/<name>/ parquet + oracle_sql.json), runs each
oracle SQL in DuckDB over the same sf tables, and strictly compares:
columns sorted by name, per-column ARROW DTYPES (the driver hashes
type-sensitively — a DuckDB HUGEINT vs Spark BIGINT drift fails there even
when values match), rows in emitted order, exact value equality
(floats bitwise, decimals exact). Strict pass here ⇒ driver pass.

Usage: local_gate.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
    if not files:
        return None
    import pyarrow as pa
    t = pa.concat_tables([pq.read_table(f) for f in files])
    return t

def run_oracle(con, sql, budget):
    """Run one oracle under an optional time budget.

    Returns (arrow_table, skipped). The watchdog races with a healthy
    fetch: if the budget expires in the window after fetch_arrow_table()
    returns but before done.set() runs, the interrupt lands on the shared
    connection and would cancel the NEXT query (ADVICE r9). Each watchdog
    therefore sets its own `fired` flag before interrupting — an
    interrupt exception without OUR flag is a stale leftover from a
    previous query's watchdog and is retried, never recorded as a
    SKIP/FAIL for this healthy oracle.
    """
    import threading, time
    attempts = 0
    t0 = time.monotonic()
    while True:
        attempts += 1
        done = threading.Event()
        fired = threading.Event()
        # stale-interrupt retries share ONE budget: each attempt gets only
        # what remains, so a single oracle can never run 3x the budget
        remaining = budget - (time.monotonic() - t0) if budget > 0 else 0
        if budget > 0 and remaining <= 0:
            return None, True
        if budget > 0:
            def watchdog(ev=done, fl=fired, b=remaining):
                if not ev.wait(b):
                    fl.set()
                    con.interrupt()
            threading.Thread(target=watchdog, daemon=True).start()
        try:
            return con.execute(sql).fetch_arrow_table(), False
        except Exception as e:
            # OUR watchdog fired: past budget regardless of how the
            # resulting error stringifies (SKIP, never FAIL)
            if fired.is_set():
                return None, True
            msg = str(e)
            is_int = "INTERRUPT" in msg.upper() or "interrupted" in msg.lower()
            if is_int and attempts < 3:
                continue  # stale interrupt from a prior watchdog: retry
            raise
        finally:
            done.set()

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def connect(sfdir):
    """Fresh DuckDB connection with the views + resource caps applied —
    also used to REPLACE a connection an OOM/interrupt has poisoned
    (a failed pending query leaves the old one returning 'unsuccessful
    or closed pending query result' for every later oracle)."""
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # big locally-generated SFs: bound DuckDB so a brute-force oracle
    # degrades to spill/timeout instead of taking down the box. A temp
    # directory is REQUIRED for the spill path — an in-memory connection
    # has none, so memory_limit alone turns into a hard OOM.
    mem = os.environ.get("GRAFT_DUCK_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        con.execute("SET temp_directory='/tmp/duck_spill'")
    thr = os.environ.get("GRAFT_DUCK_THREADS")
    if thr:
        con.execute(f"SET threads={int(thr)}")
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.isdir(p):
            # locally-generated tables (GenData) are multi-part dirs
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = connect(sfdir)
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_t = load_spark(outdir, name)
        if spark_t is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            # optional per-oracle budget (big locally-generated SFs where
            # brute-force oracles would run for hours): interrupt past
            # GRAFT_ORACLE_TIMEOUT seconds and record a SKIP, not a FAIL
            budget = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)
            duck_t, skipped = run_oracle(con, sql, budget)
            if skipped:
                print(f"SKIP {name}: oracle past {budget:.0f}s budget")
                n_skip += 1
                continue
        except Exception as e:
            msg = str(e)
            print(f"FAIL {name}: oracle error {msg.splitlines()[0][:160]}")
            n_fail += 1
            # an OOM/closed-result error poisons the connection for every
            # later oracle — replace it before moving on
            try:
                con.close()
            except Exception:  # noqa: BLE001
                pass
            con = connect(sfdir)
            continue
        # Output-boundary width lint: the driver's hasher canonicalizes
        # decimal128 (DECIMAL > 18 digits) differently from both engines'
        # agreed values (r6: q_anova/q_decay/q_ttest/txt_kappa all passed
        # here value-exact yet hash-FAILed there). Reject any output
        # column wider than BIGINT / DECIMAL(18,2) on EITHER side so
        # "strict pass here => driver pass" holds again.
        import pyarrow.types as pat

        def too_wide(typ):
            if pat.is_decimal(typ):
                return typ.precision > 18 or typ.scale > 2
            return False

        wide = [(side, c, str(t.schema.field(c).type))
                for side, t in (("spark", spark_t), ("duck", duck_t))
                for c in t.schema.names if too_wide(t.schema.field(c).type)]
        if wide:
            detail = ", ".join(f"{side}.{c}={ty}" for side, c, ty in wide)
            print(f"FAIL {name}: output wider than BIGINT/DECIMAL(18,2): {detail}")
            n_fail += 1
            continue
        if "localdata" in sfdir:
            # locally-GENERATED data: Spark writes LTZ (annotated UTC) so
            # DuckDB reads timestamptz where the driver's pyarrow files
            # are naive. Same UTC wall values — normalize tz-aware to
            # naive on the duck side for these dev dirs ONLY; driver-SF
            # gates stay byte-strict.
            import pyarrow as pa
            import pyarrow.types as pat2
            new_cols = []
            changed = False
            for c in duck_t.schema.names:
                col0 = duck_t.column(c)
                t = duck_t.schema.field(c).type
                if pat2.is_timestamp(t) and t.tz is not None:
                    col0 = col0.cast(pa.timestamp(t.unit))
                    changed = True
                new_cols.append(col0)
            if changed:
                duck_t = pa.table(
                    {c: new_cols[i] for i, c in enumerate(duck_t.schema.names)})
        s_cols = sorted(spark_t.schema.names)
        d_cols = sorted(duck_t.schema.names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        # Arrow dtype drift fails the driver's hash gate even when every
        # value compares equal (e.g. DuckDB widens sum(BIGINT) to HUGEINT
        # -> decimal128(38,0) while Spark emits int64). Compare types
        # per column, name-sorted, before touching values.
        bad_types = [(c, str(spark_t.schema.field(c).type), str(duck_t.schema.field(c).type))
                     for c in s_cols
                     if spark_t.schema.field(c).type != duck_t.schema.field(c).type]
        if bad_types:
            detail = ", ".join(f"{c}: spark={s} duck={d}" for c, s, d in bad_types)
            print(f"FAIL {name}: dtype drift {detail}")
            n_fail += 1
            continue
        s_rows = [[norm(spark_t.column(c)[i].as_py()) for c in s_cols]
                  for i in range(spark_t.num_rows)]
        d_rows = [[norm(duck_t.column(c)[i].as_py()) for c in d_cols]
                  for i in range(duck_t.num_rows)]
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            # compare cell-wise; decimals vs floats compared by ==
            eq = all((x == y) or (isinstance(x, float) and isinstance(y, float) and x == y)
                     for x, y in zip(a, b))
            if not eq:
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}  (cols={s_cols})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    skip = f", {n_skip} oracle-timeout-skip" if n_skip else ""
    print(f"== {n_pass} pass, {n_fail} fail{skip}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
