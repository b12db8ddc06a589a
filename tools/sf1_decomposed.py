#!/usr/bin/env python3
"""Decomposed sf1 verification for queries whose FULL oracle is
infeasible in DuckDB at 50k docs / 20k vectors (VERDICT r10 #3).

Three check kinds, all strict value comparisons:

1. sampled-corpus oracle ("sampled_oracle_pass"): for queries whose
   output rows are PAIRWISE-INDEPENDENT of the rest of the corpus
   (pair emitted iff a pairwise predicate holds — LSH bands, simhash
   signatures, blocking keys and IVF cells are all per-row functions),
   running the query's OWN oracle SQL on an id-prefix-restricted corpus
   must reproduce exactly the Spark dump's rows restricted to that
   prefix. This is the full driver protocol on a random-but-deterministic
   corpus slice, at a size where the quadratic oracle is feasible.

2. derived recompute ("derived_pass"): for outputs that are pure
   functions of OTHER verified dumps (cluster labels = connected
   components of the verified LSH pair table; eval/curve/stats
   aggregates over the verified pair/cluster tables), recompute the
   function exactly in Python/DuckDB from those dumps and compare the
   FULL output. Exact given the input table, whose own check is (1).

3. both checks log what they verified; anything inconclusive stays a
   skip — this tool never upgrades a query it could not check.

Usage: sf1_decomposed.py <sf1dir> <verifyOutDir> [query ...]
Prints one line per query: DPASS/DFAIL/DSKIP name: detail
"""
import glob
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

SFDIR = sys.argv[1]
OUTDIR = sys.argv[2]
ONLY = set(sys.argv[3:])

ORACLES = json.load(open(os.path.join(OUTDIR, "oracle_sql.json")))

# pairwise-independent queries: (id cols, base table, id key)
SAMPLED = {
    "dedup_ngram_jaccard": (("a", "b"), "documents", "doc_id"),
    "dedup_containment": (("a", "b"), "documents", "doc_id"),
    "dedup_minhash_lsh": (("a", "b"), "documents", "doc_id"),
    "dedup_levenshtein": (("doc_id_a", "doc_id_b"), "documents", "doc_id"),
    "dedup_simhash": (("a", "b"), "documents", "doc_id"),
    "dedup_embedding": (("a", "b"), "embeddings", "vec_id"),
    "dedup_embedding_ivf": (("a", "b"), "embeddings", "vec_id"),
    "ann_pair_sim": (("a", "b"), "embeddings", "vec_id"),
}

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def table_path(t):
    p = os.path.join(SFDIR, f"{t}.parquet")
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def load_dump(name):
    files = sorted(glob.glob(os.path.join(OUTDIR, name, "*.parquet")))
    if not files:
        return None
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files])


def rows_of(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, sorted(zip(*data)) if data and tbl.num_rows else []


def compare(name, spark_tbl, duck_rel, detail):
    """Strict: same sorted column names, same sorted row tuples."""
    sc, srows = rows_of(spark_tbl)
    import pyarrow as pa
    dt = duck_rel.fetch_arrow_table()
    dc, drows = rows_of(dt)
    if sc != dc:
        print(f"DFAIL {name}: columns {sc} vs {dc}")
        return False
    if srows != drows:
        diff = [i for i, (a, b) in enumerate(zip(srows, drows)) if a != b][:1]
        print(f"DFAIL {name}: {len(srows)} vs {len(drows)} rows, "
              f"first diff at {diff} ({detail})")
        return False
    print(f"DPASS {name}: {len(srows)} rows ({detail})")
    return True


def check_sampled(name):
    ids, table, key = SAMPLED[name]
    dump = load_dump(name)
    if dump is None:
        print(f"DSKIP {name}: no spark dump")
        return
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    n = con.execute(
        f"SELECT max({key}) + 1 FROM read_parquet('{table_path(table)}')").fetchone()[0]
    # adaptive prefix: grow until the restricted dump holds >= 3 rows, so
    # the completeness half of the check has something to prove
    import pyarrow.compute as pc
    cut = max(n // 20, 500)
    while True:
        mask = None
        for c in ids:
            m = pc.less(dump.column(c), cut)
            mask = m if mask is None else pc.and_(mask, m)
        sub = dump.filter(mask)
        if sub.num_rows >= 3 or cut >= n // 2:
            break
        cut *= 2
    if sub.num_rows == 0:
        print(f"DSKIP {name}: no dump pairs inside any feasible prefix")
        return
    for t in TABLES:
        p = os.path.join(SFDIR, f"{t}.parquet")
        if os.path.exists(p) or os.path.isdir(p):
            if t == table:
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"read_parquet('{table_path(t)}') WHERE {key} < {cut}")
            else:
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"read_parquet('{table_path(t)}')")
    rel = con.sql(ORACLES[name])
    compare(name, sub, rel,
            f"oracle on {key}<{cut} prefix ({cut}/{n} rows of {table})")


class UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        p = self.p
        r = x
        while p.get(r, r) != r:
            r = p[r]
        while p.get(x, x) != x:
            p[x], x = r, p[x]
        return r

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-id root: cluster_id = min member id
            if ra < rb:
                self.p[rb] = ra
            else:
                self.p[ra] = rb


def clusters_from_pairs():
    """(doc_id -> (cluster_id, cluster_size)) from the verified LSH pair
    dump + the full doc id list (singletons are their own cluster)."""
    pairs = load_dump("dedup_minhash_lsh")
    if pairs is None:
        return None
    con = duckdb.connect()
    ids = [r[0] for r in con.execute(
        f"SELECT doc_id FROM read_parquet('{table_path('documents')}')").fetchall()]
    uf = UF()
    for a, b in zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist()):
        uf.union(a, b)
    lab = {i: uf.find(i) for i in ids}
    from collections import Counter
    size = Counter(lab.values())
    return {i: (l, size[l]) for i, l in lab.items()}


def check_cluster(name):
    want = clusters_from_pairs()
    dump = load_dump(name)
    if want is None or dump is None:
        print(f"DSKIP {name}: missing dump")
        return None
    got = {d: (c, s) for d, c, s in zip(dump.column("doc_id").to_pylist(),
                                        dump.column("cluster_id").to_pylist(),
                                        dump.column("cluster_size").to_pylist())}
    if got == want:
        print(f"DPASS {name}: {len(got)} docs ≡ union-find over the "
              "verified LSH pair table (merge ≡ rebuild for cluster_merge)")
        return want
    bad = [k for k in want if got.get(k) != want[k]][:3]
    print(f"DFAIL {name}: {len(got)} vs {len(want)} docs, first diffs {bad}")
    return None


def check_incremental(name):
    """Per-new-doc dup counts ≡ the verified LSH pair dump filtered to
    pairs touching a new-batch (doc_id % 10 = 0) endpoint — the
    incremental path's candidate set is exactly the full band-collision
    set minus old×old, so its verified pairs are a filter of the full
    verified set."""
    pairs = load_dump("dedup_minhash_lsh")
    dump = load_dump(name)
    if pairs is None or dump is None:
        print(f"DSKIP {name}: missing dumps")
        return
    con = duckdb.connect()
    new_ids = [r[0] for r in con.execute(
        f"SELECT doc_id FROM read_parquet('{table_path('documents')}') "
        "WHERE doc_id % 10 = 0").fetchall()]
    from collections import defaultdict
    cnt = defaultdict(int)
    mx = defaultdict(int)
    for a, b, j in zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist(),
                       pairs.column("j_x1e6").to_pylist()):
        for e in (a, b):
            if e % 10 == 0:
                cnt[e] += 1
                mx[e] = max(mx[e], j)
    # the query emits only new docs WITH at least one dup
    want = {i: (cnt[i], mx[i]) for i in new_ids if cnt.get(i, 0) > 0}
    got = {d: (n, m) for d, n, m in zip(dump.column("doc_id").to_pylist(),
                                        dump.column("n_dup_of").to_pylist(),
                                        dump.column("max_j_x1e6").to_pylist())}
    if got == want:
        print(f"DPASS {name}: {len(got)} new docs ≡ pair-dump rollup")
    else:
        bad = [k for k in want if got.get(k) != want[k]][:3]
        print(f"DFAIL {name}: {len(got)} vs {len(want)} docs, diffs {bad} "
              f"got={[got.get(k) for k in bad]} want={[want[k] for k in bad]}")


def check_eval(name):
    tr = load_dump("dedup_ngram_jaccard")
    pr = load_dump("dedup_simhash")
    dump = load_dump(name)
    if tr is None or pr is None or dump is None:
        print(f"DSKIP {name}: missing input dumps")
        return
    t = set(zip(tr.column("a").to_pylist(), tr.column("b").to_pylist()))
    p = set(zip(pr.column("a").to_pylist(), pr.column("b").to_pylist()))
    tp = len(t & p)
    want = {"n_truth": len(t), "n_pred": len(p), "tp": tp,
            "fp": len(p - t), "fn": len(t - p),
            "precision_x1e6": tp * 1000000 // len(p) if p else None,
            "recall_x1e6": tp * 1000000 // len(t) if t else None}
    got = {c: dump.column(c).to_pylist()[0] for c in dump.column_names}
    if got == want:
        print(f"DPASS {name}: {want} (from the verified pair dumps)")
    else:
        print(f"DFAIL {name}: got {got} want {want}")


def check_threshold_curve(name):
    tr = load_dump("dedup_ngram_jaccard")
    dump = load_dump(name)
    if tr is None or dump is None:
        print(f"DSKIP {name}: missing input dumps")
        return
    pairs = list(zip(tr.column("a").to_pylist(), tr.column("b").to_pylist(),
                     tr.column("j_x1e6").to_pylist()))
    want = []
    for tau in (500000, 600000, 700000, 800000, 900000):
        keep = [(a, b) for a, b, j in pairs if j >= tau]
        docs = {d for ab in keep for d in ab}
        want.append((tau, len(keep), len(docs)))
    got = sorted(zip(dump.column("tau_x1e6").to_pylist(),
                     dump.column("n_pairs").to_pylist(),
                     dump.column("n_docs").to_pylist()))
    if got == [w for w in want]:
        print(f"DPASS {name}: 5 thresholds ≡ re-threshold of the verified pair dump")
    else:
        print(f"DFAIL {name}: got {got} want {want}")


def check_cluster_stats(name, verified):
    dump = load_dump(name)
    if verified is None or dump is None:
        print(f"DSKIP {name}: cluster table not verified")
        return
    from collections import Counter
    sizes = Counter(c for c, _ in verified.values())  # cluster_id -> k
    k_of = Counter(sizes.values())                    # k -> n_clusters
    total = sum(k * n for k, n in k_of.items())
    want = sorted((k, n, k * n, k * n * 1000000 // total) for k, n in k_of.items())
    got = sorted(zip(dump.column("cluster_size").to_pylist(),
                     dump.column("n_clusters").to_pylist(),
                     dump.column("n_docs").to_pylist(),
                     dump.column("docs_ppm").to_pylist()))
    if got == want:
        print(f"DPASS {name}: {len(got)} size buckets ≡ verified cluster table")
    else:
        print(f"DFAIL {name}: got {got[:4]}... want {want[:4]}...")


def check_bytes_saved(name, verified):
    """bytes_total/saved per source from the verified cluster table —
    a doc is dropped iff doc_id ≠ cluster_id (cluster_id IS the min
    member id, the keep-one rule)."""
    dump = load_dump(name)
    if verified is None or dump is None:
        print(f"DSKIP {name}: cluster table not verified")
        return
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, source, n_chars FROM "
        f"read_parquet('{table_path('documents')}')").fetchall()
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0, 0])  # total, saved, dropped
    for doc, src, nch in rows:
        a = agg[src]
        a[0] += nch
        if verified[doc][0] != doc:
            a[1] += nch
            a[2] += 1
    want = sorted((s, t, sv, dr, sv * 1000000 // t)
                  for s, (t, sv, dr) in agg.items())
    got = sorted(zip(dump.column("source").to_pylist(),
                     dump.column("bytes_total").to_pylist(),
                     dump.column("bytes_saved").to_pylist(),
                     dump.column("docs_dropped").to_pylist(),
                     dump.column("saved_ppm").to_pylist()))
    if got == want:
        print(f"DPASS {name}: {len(got)} sources ≡ verified cluster table + doc sizes")
    else:
        print(f"DFAIL {name}: got {got[:2]} want {want[:2]}")


def check_dup_rate_by_source(name, verified):
    """Per-source near-dup rates from the verified cluster table
    (rep = cluster_id, survivor iff doc_id == cluster_id)."""
    dump = load_dump(name)
    if verified is None or dump is None:
        print(f"DSKIP {name}: cluster table not verified")
        return
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, source FROM read_parquet('{table_path('documents')}')"
    ).fetchall()
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0, 0])  # n_docs, in_dup, survivors
    for doc, src in rows:
        c, size = verified[doc]
        a = agg[src]
        a[0] += 1
        if size > 1:
            a[1] += 1
        if c == doc:
            a[2] += 1
    want = sorted((s, n, d, sv, d * 10000 // n) for s, (n, d, sv) in agg.items())
    got = sorted(zip(dump.column("source").to_pylist(),
                     dump.column("n_docs").to_pylist(),
                     dump.column("n_in_dup_clusters").to_pylist(),
                     dump.column("n_survivors").to_pylist(),
                     dump.column("dup_rate_x1e4").to_pylist()))
    if got == want:
        print(f"DPASS {name}: {len(got)} sources ≡ verified cluster table")
    else:
        print(f"DFAIL {name}: got {got[:2]} want {want[:2]}")


def check_cluster_reps(name, verified):
    dump = load_dump(name)
    if verified is None or dump is None:
        print(f"DSKIP {name}: cluster table not verified")
        return
    multi = {d: c for d, (c, s) in verified.items() if s > 1}
    if not multi:
        print(f"DSKIP {name}: no multi-doc clusters")
        return
    con = duckdb.connect()
    idlist = ",".join(map(str, multi))
    uniq = dict(con.execute(
        f"SELECT doc_id, len(list_distinct(list_filter("
        f"string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))) "
        f"FROM read_parquet('{table_path('documents')}') "
        f"WHERE doc_id IN ({idlist})").fetchall())
    best = {}
    for d, c in multi.items():
        cand = (-uniq[d], d)
        if c not in best or cand < best[c]:
            best[c] = cand
    want = sorted((c, verified[cand[1]][1], cand[1], -cand[0])
                  for c, cand in best.items())
    got = sorted(zip(dump.column("cluster_id").to_pylist(),
                     dump.column("cluster_size").to_pylist(),
                     dump.column("rep_doc_id").to_pylist(),
                     dump.column("rep_uniq").to_pylist()))
    if got == want:
        print(f"DPASS {name}: {len(got)} reps ≡ quality argmax over verified clusters")
    else:
        print(f"DFAIL {name}: got {got[:3]} want {want[:3]}")


def check_dedup_corpus(name):
    """pipe_dedup_corpus = quality gate -> LSH pairs among survivors ->
    CC -> keep min per cluster. Decomposition (VERDICT r11 #3): the
    quality gate is a PER-ROW function, so its own oracle CTE runs
    verbatim at sf1 (no pairs); band rows are per-doc, so the survivor
    pair set is exactly the VERIFIED full-corpus LSH pair dump
    restricted to survivor endpoints (same tau, exact Jaccard is a
    per-pair function); clusters/sizes = union-find over that set —
    the same derived recompute dedup_cluster's check uses."""
    dump = load_dump(name)
    pairs = load_dump("dedup_minhash_lsh")
    if dump is None or pairs is None:
        print(f"DSKIP {name}: missing dumps")
        return
    sql = ORACLES[name]
    cut = sql.index("sh AS (")
    qsql = sql[:cut].rstrip().rstrip(",") + "\nSELECT doc_id FROM q"
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{table_path('documents')}')")
    q = {r[0] for r in con.execute(qsql).fetchall()}
    uf = UF()
    for a, b in zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist()):
        if a in q and b in q:
            uf.union(a, b)
    lab = {i: uf.find(i) for i in q}
    from collections import Counter
    size = Counter(lab.values())
    want = sorted((i, size[lab[i]]) for i in q if lab[i] == i)
    got = sorted(zip(dump.column("doc_id").to_pylist(),
                     dump.column("cluster_size").to_pylist()))
    if got == want:
        print(f"DPASS {name}: {len(got)} survivors ≡ quality-gate oracle (per-row) + "
              "union-find over the verified LSH pair dump ∩ survivor set")
    else:
        bad = [(g, w) for g, w in zip(got, want) if g != w][:3]
        print(f"DFAIL {name}: {len(got)} vs {len(want)} rows, diffs {bad}")


def check_cooccurrence(name):
    """txt_cooccurrence's oracle is a within-doc token-pair self-join +
    one 90M-row GROUP BY whose single-statement form resists DuckDB's
    budget interrupt at sf1 (r11's skip). Decomposition (VERDICT r11
    #3): pair counts grouped by (t1, t2) are ADDITIVE over disjoint doc
    subsets, so the ORACLE'S OWN SQL runs 10 times restricted to
    doc_id % 10 residues (pure string surgery on its FROM/ORDER
    clauses — no re-implementation), partials accumulate in a DuckDB
    table, and the summed counts are compared against the Spark dump
    entirely IN DuckDB (full outer join, IS DISTINCT FROM) — strict on
    missing, extra, and miscounted pairs alike."""
    files = sorted(glob.glob(os.path.join(OUTDIR, name, "*.parquet")))
    if not files:
        print(f"DSKIP {name}: no spark dump")
        return
    sql = ORACLES[name]
    if "FROM documents)" not in sql or " ORDER BY t1, t2" not in sql:
        print(f"DSKIP {name}: oracle text drifted from the expected shape")
        return
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute("SET memory_limit='60GB'")
    con.execute("SET threads=16")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{table_path('documents')}')")
    con.execute("CREATE TABLE part (t1 VARCHAR, t2 VARCHAR, n_docs BIGINT)")
    for r in range(10):
        batch = sql.replace(
            "FROM documents)", f"FROM documents WHERE doc_id % 10 = {r})"
        ).replace(" ORDER BY t1, t2", "")
        con.execute(f"INSERT INTO part\n{batch}")
    con.execute("CREATE TABLE agg AS SELECT t1, t2, "
                "CAST(sum(n_docs) AS BIGINT) AS n_docs FROM part GROUP BY 1, 2")
    con.execute("DROP TABLE part")
    dump_glob = os.path.join(OUTDIR, name, "*.parquet")
    bad, = con.execute(
        f"SELECT count(*) FROM agg a FULL OUTER JOIN "
        f"read_parquet('{dump_glob}') d USING (t1, t2) "
        f"WHERE a.n_docs IS DISTINCT FROM d.n_docs").fetchone()
    n, = con.execute("SELECT count(*) FROM agg").fetchone()
    if bad == 0:
        print(f"DPASS {name}: {n} pairs ≡ the oracle's own SQL run as 10 "
              "disjoint doc-residue partial aggregations (counts additive)")
    else:
        print(f"DFAIL {name}: {bad} of {n} pairs differ from the batched oracle")


def main():
    verified_clusters = None
    plan = [
        *(n for n in SAMPLED),
        "dedup_cluster", "pipe_cluster_merge", "pipe_dedup_incremental",
        "pipe_dedup_eval", "pipe_dedup_threshold_curve",
        "pipe_dup_cluster_stats", "pipe_cluster_reps", "pipe_dedup_bytes_saved",
        "pipe_near_dup_rate_by_source", "pipe_dedup_corpus",
        "txt_cooccurrence",
    ]
    for name in plan:
        if ONLY and name not in ONLY:
            continue
        try:
            if name in SAMPLED:
                check_sampled(name)
            elif name in ("dedup_cluster", "pipe_cluster_merge"):
                v = check_cluster(name)
                if name == "dedup_cluster":
                    verified_clusters = v
            elif name == "pipe_dedup_incremental":
                check_incremental(name)
            elif name == "pipe_dedup_eval":
                check_eval(name)
            elif name == "pipe_dedup_threshold_curve":
                check_threshold_curve(name)
            elif name == "pipe_dup_cluster_stats":
                check_cluster_stats(name, verified_clusters)
            elif name == "pipe_cluster_reps":
                check_cluster_reps(name, verified_clusters)
            elif name == "pipe_dedup_bytes_saved":
                check_bytes_saved(name, verified_clusters)
            elif name == "pipe_near_dup_rate_by_source":
                check_dup_rate_by_source(name, verified_clusters)
            elif name == "pipe_dedup_corpus":
                check_dedup_corpus(name)
            elif name == "txt_cooccurrence":
                check_cooccurrence(name)
        except Exception as e:  # noqa: BLE001
            print(f"DFAIL {name}: exception {str(e)[:160]}")


if __name__ == "__main__":
    main()
