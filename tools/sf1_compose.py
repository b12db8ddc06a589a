#!/usr/bin/env python3
"""Compose CORRECTNESS_sf1.json from sf1 gate logs — the ONE
parameterized script that replaces the four hand-copied
sf1_compose_r{11..14}.py (VERDICT r14 #3: the r14 review itself found
precedence regressions introduced by copying; consolidating stops the
fifth copy from shipping the next one).

Inputs: the previous round's artifact (standing passes carry over), a
decomposed log (DPASS/DFAIL lines from tools/sf1_decomposed.py), and
one or more Phase-A big-budget gate logs (PASS/FAIL/SKIP lines from
tools/gate.sh). May be run repeatedly, feeding its own output back as
<prev.json> — later runs merge additional logs.

Precedence (unit-tested in tools/test_sf1_compose.py — the f24b59f
rules, in one place):
- any recorded FAIL is never hidden: neither a later PASS, a later
  decomposed PASS, a later SKIP, nor a crash-shaped FAIL may
  overwrite it (a CONFLICT line is printed instead);
- a decomposed pass is the WEAKER check and never upgrades/downgrades
  a recorded full-oracle result;
- a SKIP never overwrites any recorded result (pass/decomposed/fail);
- a crash-shaped FAIL (DuckDB OOM / connection closed) records
  brute_oracle_skip WITH the truncated error detail and a visible
  warning (ADVICE r13), and never overwrites a recorded result.

PASS lines are parsed with a regex and malformed ones are warned about
and skipped instead of aborting the whole composition (ADVICE r14 —
the hand-copied versions raised IndexError on a PASS line without the
"(N rows)" parenthetical and lost the entire artifact run).

Usage:
  sf1_compose.py [--out PATH] [--note TEXT] [--sf TEXT]
                 <prev.json> <decomposed.log> <phaseA.log...>

--out defaults to /root/repo/CORRECTNESS_sf1.json; tests and dry runs
pass an explicit --out so the real artifact is never clobbered by a
fixture run (a round-14 gotcha).
"""
import argparse
import json
import re
import sys
from pathlib import Path

# "PASS <name> (N rows)" — name then a parenthesized row count; the
# rstrip(":") mirrors gate.sh variants that emit "PASS name: (N rows)"
PASS_RE = re.compile(r"^PASS\s+(\S+?):?\s+\((\d+)\s+rows?\)")

CRASH_MARKERS = ("Out of Memory", "unsuccessful or closed")

RECORDED = ("pass", "decomposed_pass", "fail")


def compose(queries, decomposed_lines, phase_logs):
    """Merge gate-log lines into the queries dict (mutated and
    returned). phase_logs is a list of line-lists, one per log file.
    Pure function over line content — no filesystem access — so the
    precedence rules are unit-testable without fixture files."""
    for line in decomposed_lines:
        if line.startswith("DPASS "):
            name = line.split()[1].rstrip(":")
            # a decomposed pass is the WEAKER check: it must never hide
            # a recorded full-oracle FAIL
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

    for lines in phase_logs:
        for line in lines:
            if line.startswith("PASS "):
                m = PASS_RE.match(line)
                if not m:
                    # ADVICE r14: never abort the whole composition on
                    # one malformed PASS line — warn and move on
                    print(f"WARNING: malformed PASS line skipped "
                          f"(no '(N rows)' parenthetical): {line[:160]}")
                    continue
                name, rows = m.group(1), int(m.group(2))
                prior = queries.get(name, {})
                if prior.get("status") == "fail":
                    print(f"CONFLICT {name}: full-oracle PASS vs recorded FAIL "
                          f"({prior.get('detail', '')[:120]}) — keeping FAIL")
                    continue
                queries[name] = {"status": "pass", "rows": rows}
            elif line.startswith("SKIP "):
                name = line.split()[1].rstrip(":")
                # a SKIP never overwrites a recorded result of EITHER
                # kind: "any FAIL is recorded, never hidden" applies
                if queries.get(name, {}).get("status") not in RECORDED:
                    queries[name] = {"status": "oracle_budget_skip"}
            elif line.startswith("FAIL "):
                name = line.split()[1].rstrip(":")
                detail = line.split(":", 1)[1].strip()[:200]
                if any(mk in detail for mk in CRASH_MARKERS):
                    # crash-shaped skip: keep the error detail and warn
                    # loudly (ADVICE r13 — setdefault used to swallow it)
                    print(f"WARNING {name}: oracle CRASHED under the memory "
                          f"budget, recording as brute_oracle_skip with the "
                          f"error detail: {detail[:120]}")
                    # a crash-shaped skip must never overwrite a
                    # RECORDED result — pass, decomposed pass, or fail
                    if queries.get(name, {}).get("status") not in RECORDED:
                        queries[name] = {"status": "brute_oracle_skip",
                                         "note": "oracle OOM/crash under budget",
                                         "error_detail": detail}
                else:
                    queries[name] = {"status": "fail", "detail": detail}
    return queries


def render(queries, sf, note):
    counts = {}
    for v in queries.values():
        counts[v["status"]] = counts.get(v["status"], 0) + 1
    return {
        "sf": sf,
        "n_pass": counts.get("pass", 0),
        "n_decomposed_pass": counts.get("decomposed_pass", 0),
        "n_fail": counts.get("fail", 0),
        "n_budget_skip": counts.get("oracle_budget_skip", 0),
        "n_brute_skip": counts.get("brute_oracle_skip", 0),
        "note": note,
        "queries": dict(sorted(queries.items())),
    }


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/CORRECTNESS_sf1.json")
    ap.add_argument("--note", default=None,
                    help="artifact note; defaults to the previous artifact's")
    ap.add_argument("--sf", default="localdata/sf1 (GenData 1.0, vocab 20000)")
    ap.add_argument("prev")
    ap.add_argument("decomposed")
    ap.add_argument("phase", nargs="+")
    args = ap.parse_args(argv)

    prev = json.loads(Path(args.prev).read_text())
    queries = compose(dict(prev["queries"]),
                      Path(args.decomposed).read_text().splitlines(),
                      [Path(p).read_text().splitlines() for p in args.phase])
    note = args.note if args.note is not None else prev.get("note", "")
    artifact = render(queries, args.sf, note)
    Path(args.out).write_text(json.dumps(artifact, indent=1))
    print({k: v for k, v in artifact.items() if k not in ("queries", "note")})


if __name__ == "__main__":
    main(sys.argv[1:])
