package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-audit coverage lint (VERDICT r13 #2): the most expensive
  * queries are exactly the ones whose physical plans PLANS.md exists to
  * pin, and r13 shipped its heaviest query (q_ktruss, ~9% of suite
  * wall) without one. Policy: every query whose BENCH_DETAIL idle
  * min exceeds 1 s must have a `## <name>` section in PLANS.md.
  *
  * The min (noise floor) is used rather than the median, and the
  * threshold widens when the artifact was recorded under ambient load
  * (the driver regenerates BENCH_DETAIL post-commit at whatever load
  * the box carries; sub-second queries can phantom-spike past 1 s
  * there — see the SCALING noise protocol and the calib_sec probe).
  */
class PlansCoverageSpec extends AnyFunSuite {

  test("every >1s query has a PLANS.md section") {
    val bench = scala.io.Source.fromFile("BENCH_DETAIL.json", "UTF-8").mkString
    val loadAvg = """"load_avg":\s*(\d+\.?\d*)""".r
      .findFirstMatchIn(bench).map(_.group(1).toDouble).getOrElse(0.0)
    val threshold = if (loadAvg > 4.0) 2.5 else 1.0
    // tolerant of both writers: Bench.scala's compact one-line entries
    // AND a json.dumps(indent=1) rewrite (tools/baseline.py respike) —
    // [^}] crosses newlines, so only the key/brace adjacency needs \s*
    val entry =
      """"([a-z0-9_]+)":\s*\{\s*"times":[^}]*"min":\s*(\d+\.?\d*)""".r
    val heavy = entry.findAllMatchIn(bench)
      .filter(_.group(2).toDouble > threshold)
      .map(_.group(1)).toSet
    assert(heavy.nonEmpty, "no heavy queries parsed from BENCH_DETAIL.json — regex drift?")
    val plans = scala.io.Source.fromFile("PLANS.md", "UTF-8").mkString
    val sections = """(?m)^## ([a-z0-9_]+)""".r
      .findAllMatchIn(plans).map(_.group(1)).toSet
    val missing = heavy.diff(sections)
    assert(missing.isEmpty,
      s"queries with bench min > $threshold s (load_avg $loadAvg) lack a PLANS.md " +
        s"section — add them to PlanDump.Headline and regenerate " +
        s"(tools/plans.sh): ${missing.toSeq.sorted}")
  }

  test("every PlanDump headline query has a generated PLANS.md section (no drift)") {
    val plans = scala.io.Source.fromFile("PLANS.md", "UTF-8").mkString
    val sections = """(?m)^## ([a-z0-9_]+)""".r
      .findAllMatchIn(plans).map(_.group(1)).toSet
    val missing = PlanDump.Headline.toSet.diff(sections)
    assert(missing.isEmpty,
      s"PLANS.md is stale vs PlanDump.Headline — regenerate with tools/plans.sh: " +
        s"${missing.toSeq.sorted}")
  }
}
