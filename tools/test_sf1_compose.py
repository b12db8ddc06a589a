#!/usr/bin/env python3
"""Unit tests for the consolidated sf1 compose precedence rules
(tools/sf1_compose.py). Run: python3 tools/test_sf1_compose.py

These pin the f24b59f rules in ONE place so a future edit can't
silently regress them the way the r11→r14 hand-copies did, plus the
ADVICE-r14 malformed-PASS robustness. Pure-function tests — no
filesystem writes, so the real CORRECTNESS_sf1.json is never at risk.
"""
import io
import sys
import unittest
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from sf1_compose import compose, render  # noqa: E402


def run(queries, dec=(), *phases):
    buf = io.StringIO()
    with redirect_stdout(buf):
        out = compose(dict(queries), list(dec), [list(p) for p in phases])
    return out, buf.getvalue()


class PrecedenceTests(unittest.TestCase):
    def test_pass_records_rows(self):
        q, _ = run({}, (), ["PASS q_a (42 rows)"])
        self.assertEqual(q["q_a"], {"status": "pass", "rows": 42})

    def test_pass_line_with_colon_variant(self):
        q, _ = run({}, (), ["PASS q_a: (7 rows)"])
        self.assertEqual(q["q_a"], {"status": "pass", "rows": 7})

    def test_malformed_pass_warns_and_continues(self):
        # ADVICE r14: a PASS line without "(N rows)" must not abort the
        # composition — the next line must still be processed
        q, out = run({}, (), ["PASS q_bad", "PASS q_ok (3 rows)"])
        self.assertNotIn("q_bad", q)
        self.assertIn("malformed PASS line", out)
        self.assertEqual(q["q_ok"], {"status": "pass", "rows": 3})

    def test_pass_never_hides_recorded_fail(self):
        q, out = run({"q_a": {"status": "fail", "detail": "hash"}},
                     (), ["PASS q_a (5 rows)"])
        self.assertEqual(q["q_a"]["status"], "fail")
        self.assertIn("CONFLICT", out)

    def test_decomposed_pass_never_hides_recorded_fail(self):
        q, out = run({"q_a": {"status": "fail", "detail": "hash"}},
                     ["DPASS q_a: parts 3/3"])
        self.assertEqual(q["q_a"]["status"], "fail")
        self.assertIn("CONFLICT", out)

    def test_decomposed_pass_records_detail(self):
        q, _ = run({}, ["DPASS q_a: parts 3/3 equal"])
        self.assertEqual(q["q_a"]["status"], "decomposed_pass")
        self.assertIn("parts 3/3", q["q_a"]["detail"])

    def test_dfail_records_fail(self):
        q, _ = run({"q_a": {"status": "pass", "rows": 1}},
                   ["DFAIL q_a: part 2 differs"])
        self.assertEqual(q["q_a"]["status"], "fail")
        self.assertTrue(q["q_a"]["detail"].startswith("decomposed:"))

    def test_skip_never_overwrites_any_recorded_result(self):
        prior = {"p": {"status": "pass", "rows": 1},
                 "d": {"status": "decomposed_pass", "detail": "x"},
                 "f": {"status": "fail", "detail": "y"},
                 "s": {"status": "oracle_budget_skip"}}
        q, _ = run(prior, (), ["SKIP p:", "SKIP d:", "SKIP f:",
                               "SKIP s:", "SKIP new:"])
        self.assertEqual(q["p"]["status"], "pass")
        self.assertEqual(q["d"]["status"], "decomposed_pass")
        self.assertEqual(q["f"]["status"], "fail")
        self.assertEqual(q["new"]["status"], "oracle_budget_skip")

    def test_crash_fail_becomes_brute_skip_with_detail(self):
        q, out = run({}, (), ["FAIL q_a: Out of Memory Error: could not allocate"])
        self.assertEqual(q["q_a"]["status"], "brute_oracle_skip")
        self.assertIn("Out of Memory", q["q_a"]["error_detail"])
        self.assertIn("WARNING q_a", out)

    def test_crash_fail_never_overwrites_recorded_result(self):
        for st in ({"status": "pass", "rows": 2},
                   {"status": "decomposed_pass", "detail": "x"},
                   {"status": "fail", "detail": "y"}):
            q, _ = run({"q_a": dict(st)}, (),
                       ["FAIL q_a: connection unsuccessful or closed"])
            self.assertEqual(q["q_a"]["status"], st["status"],
                             f"crash FAIL overwrote recorded {st['status']}")

    def test_plain_fail_records_detail(self):
        q, _ = run({"q_a": {"status": "pass", "rows": 9}},
                   (), ["FAIL q_a: hash mismatch col x"])
        self.assertEqual(q["q_a"],
                         {"status": "fail", "detail": "hash mismatch col x"})

    def test_later_log_pass_overwrites_budget_skip(self):
        q, _ = run({}, (), ["SKIP q_a:"], ["PASS q_a (11 rows)"])
        self.assertEqual(q["q_a"], {"status": "pass", "rows": 11})

    def test_render_counts(self):
        art = render({"a": {"status": "pass", "rows": 1},
                      "b": {"status": "decomposed_pass", "detail": "x"},
                      "c": {"status": "fail", "detail": "y"},
                      "d": {"status": "oracle_budget_skip"},
                      "e": {"status": "brute_oracle_skip", "note": "n"}},
                     "sf-test", "note-test")
        self.assertEqual((art["n_pass"], art["n_decomposed_pass"],
                          art["n_fail"], art["n_budget_skip"],
                          art["n_brute_skip"]), (1, 1, 1, 1, 1))
        self.assertEqual(list(art["queries"]), sorted(art["queries"]))


if __name__ == "__main__":
    unittest.main()
