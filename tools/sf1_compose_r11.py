#!/usr/bin/env python3
"""Compose the round-11 CORRECTNESS_sf1.json.

Inputs: the r10 artifact (376 full-oracle passes that still stand —
their queries are untouched this round or re-verified below), one or
more Phase-A big-budget gate logs (PASS/FAIL/SKIP lines), and the
decomposed-check log (DPASS/DFAIL/DSKIP lines from
tools/sf1_decomposed.py). Precedence per query: Phase-A PASS >
decomposed DPASS > r10 pass > budget/brute skip. Any FAIL (either
kind) is recorded as fail — this tool never hides a red.

Usage: sf1_compose_r11.py <r10.json> <decomposed.log> <phaseA.log...>
"""
import json
import sys
from pathlib import Path

r10 = json.loads(Path(sys.argv[1]).read_text())
queries = dict(r10["queries"])

# registry drift: new r11 queries default to brute-skip until a log says otherwise
for q in ("ann_hnsw_topk", "ann_hnsw_visited", "mm_features", "mm_feat_topk",
          "stream_dedup_within", "stream_attr_left"):
    queries.setdefault(q, {"status": "brute_oracle_skip",
                           "note": "new in r11; checked below if a log line exists"})

for line in Path(sys.argv[2]).read_text().splitlines():
    if line.startswith("DPASS "):
        name = line.split()[1].rstrip(":")
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
            # ADVICE r11: a Phase-A PASS must not silently bury a recorded
            # decomposed FAIL — the two checks verified different renderings
            # and a conflict means one of them is wrong. Keep the FAIL,
            # surface the conflict loudly for manual adjudication.
            prior = queries.get(name, {})
            if prior.get("status") == "fail":
                print(f"CONFLICT {name}: full-oracle PASS vs recorded FAIL "
                      f"({prior.get('detail', '')[:120]}) — keeping FAIL; adjudicate manually")
                continue
            queries[name] = {"status": "pass", "rows": rows}
        elif line.startswith("SKIP "):
            name = line.split()[1].rstrip(":")
            # a budget skip never downgrades a pass from another check
            if queries.get(name, {}).get("status") not in ("pass", "decomposed_pass"):
                queries[name] = {"status": "oracle_budget_skip"}
        elif line.startswith("FAIL "):
            name = line.split()[1].rstrip(":")
            detail = line.split(":", 1)[1].strip()[:200]
            # an OOM from a contending run — or the poisoned-connection
            # error every later oracle gets after one — is not a verdict;
            # keep the prior status unless nothing better exists
            if "Out of Memory" in detail or "unsuccessful or closed" in detail:
                queries.setdefault(name, {"status": "brute_oracle_skip",
                                          "note": "oracle OOM under budget"})
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
    "note": ("Round 11 (VERDICT r10 #3): the skip set shrank via (a) big-budget "
             "re-runs — the hnsw pair, ann_cell_purity, ann_ivf_pq_topk, "
             "dedup_exact_keep, dedup_span and others gate FULL-oracle at sf1 — "
             "and (b) tools/sf1_decomposed.py: sampled-corpus oracles (the "
             "query's own oracle on an id-prefix corpus slice, strict compare "
             "against the dump's slice — valid because those outputs are "
             "pairwise-independent) plus derived recomputation (cluster labels "
             "= union-find over the verified pair dump; eval/curve/stats/reps "
             "exact functions of verified dumps). decomposed_pass records "
             "exactly what was verified per query."),
    "queries": dict(sorted(queries.items())),
}
Path("/root/repo/CORRECTNESS_sf1.json").write_text(json.dumps(artifact, indent=1))
print({k: v for k, v in artifact.items() if k not in ("queries", "note")})
