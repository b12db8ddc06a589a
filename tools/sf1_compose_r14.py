#!/usr/bin/env python3
"""Compose the round-14 CORRECTNESS_sf1.json.

Inputs: the r13 artifact (standing passes — untouched queries carry
over), a Phase-A big-budget gate log (PASS/FAIL/SKIP — this round: the
four r14 additions plus the re-verified q_ktruss incremental peel), and
the decomposed log (DPASS/DFAIL from tools/sf1_decomposed.py).
Precedence: any FAIL is recorded, never hidden — neither a later PASS
nor a later SKIP may overwrite a recorded FAIL.

ADVICE r13 fix: a DuckDB crash (OOM / connection closed) is no longer
silently downgraded to brute_oracle_skip — the truncated error detail is
carried into the skip entry and a visible warning is printed, so
crash-shaped skips stay distinguishable from deliberate budget skips
when auditing the artifact.

Usage: sf1_compose_r14.py <r13.json> <decomposed.log> <phaseA.log...>
"""
import json
import sys
from pathlib import Path

r13 = json.loads(Path(sys.argv[1]).read_text())
queries = dict(r13["queries"])

for line in Path(sys.argv[2]).read_text().splitlines():
    if line.startswith("DPASS "):
        name = line.split()[1].rstrip(":")
        # a decomposed pass is the WEAKER check: it must never hide a
        # recorded full-oracle FAIL (review r14 — the PASS branch
        # already enforces this, the decomposed one did not)
        if queries.get(name, {}).get("status") == "fail":
            print(f"CONFLICT {name}: decomposed PASS vs recorded FAIL "
                  f"({queries[name].get('detail', '')[:120]}) — keeping FAIL")
            continue
        queries[name] = {"status": "decomposed_pass",
                         "detail": line.split(":", 1)[1].strip()[:220]}
    elif line.startswith("DFAIL "):
        name = line.split()[1].rstrip(":")
        queries[name] = {"status": "fail",
                         "detail": "decomposed: " + line.split(":", 1)[1].strip()[:200]}

for log in sys.argv[3:]:
    for line in Path(log).read_text().splitlines():
        if line.startswith("PASS "):
            name = line.split()[1]
            rows = int(line.split("(")[1].split()[0])
            prior = queries.get(name, {})
            if prior.get("status") == "fail":
                print(f"CONFLICT {name}: full-oracle PASS vs recorded FAIL "
                      f"({prior.get('detail', '')[:120]}) — keeping FAIL")
                continue
            queries[name] = {"status": "pass", "rows": rows}
        elif line.startswith("SKIP "):
            name = line.split()[1].rstrip(":")
            # a SKIP never overwrites a recorded result of EITHER kind:
            # "any FAIL is recorded, never hidden" applies here too
            if queries.get(name, {}).get("status") not in (
                    "pass", "decomposed_pass", "fail"):
                queries[name] = {"status": "oracle_budget_skip"}
        elif line.startswith("FAIL "):
            name = line.split()[1].rstrip(":")
            detail = line.split(":", 1)[1].strip()[:200]
            if "Out of Memory" in detail or "unsuccessful or closed" in detail:
                # crash-shaped skip: keep the error detail and warn
                # loudly (ADVICE r13 — setdefault used to swallow it)
                print(f"WARNING {name}: oracle CRASHED under the memory "
                      f"budget, recording as brute_oracle_skip with the "
                      f"error detail: {detail[:120]}")
                # a crash-shaped skip must never overwrite a RECORDED
                # result of any kind — pass, decomposed pass, or fail
                # (review r14: the first cut only protected 'fail')
                if queries.get(name, {}).get("status") not in (
                        "pass", "decomposed_pass", "fail"):
                    queries[name] = {"status": "brute_oracle_skip",
                                     "note": "oracle OOM/crash under budget",
                                     "error_detail": detail}
            else:
                queries[name] = {"status": "fail", "detail": detail}

counts = {}
for v in queries.values():
    counts[v["status"]] = counts.get(v["status"], 0) + 1
artifact = {
    "sf": "localdata/sf1 (GenData 1.0, vocab 20000)",
    "n_pass": counts.get("pass", 0),
    "n_decomposed_pass": counts.get("decomposed_pass", 0),
    "n_fail": counts.get("fail", 0),
    "n_budget_skip": counts.get("oracle_budget_skip", 0),
    "n_brute_skip": counts.get("brute_oracle_skip", 0),
    "note": ("Round 14: standing r13 passes carry over; this round's "
             "additions gated at sf1 in the same pass: "
             "stream_rate_limit_ttl, stream_cdc_compact, "
             "ann_descent_insert, plus q_ktruss re-verified under the "
             "incremental witness-delta peel. Crash-shaped oracle "
             "failures now carry their error detail (ADVICE r13)."),
    "queries": dict(sorted(queries.items())),
}
Path("/root/repo/CORRECTNESS_sf1.json").write_text(json.dumps(artifact, indent=1))
print({k: v for k, v in artifact.items() if k not in ("queries", "note")})
