package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2 inventory ≡ SparkEntry bookkeeping pin (VERDICT r7 #2 —
  * the checklist drifted from the driver-run query set two rounds in a
  * row: r6 mm_phash/q_xcorr, r7 the ann_ embedding-QA trio). Every
  * driver-run query must have a §2 checklist line, and every oracle
  * must gate a registered query. No Spark session needed — this is
  * pure bookkeeping, so it can never flake.
  */
class InventorySpec extends AnyFunSuite {

  private lazy val survey: String =
    scala.io.Source.fromFile("SURVEY.md", "UTF-8").mkString

  /** Backticked checklist names inside §2 (up to the §3 header). */
  private lazy val checklist: Set[String] = {
    val s2 = survey.substring(survey.indexOf("## §2"), survey.indexOf("## §3"))
    """- \[.\] `([a-z0-9_]+)`""".r.findAllMatchIn(s2).map(_.group(1)).toSet
  }

  test("every SparkEntry.queries key has a SURVEY §2 checklist line") {
    val missing = SparkEntry.queries.keySet.diff(checklist)
    assert(missing.isEmpty,
      s"queries with no §2 inventory line (add them to SURVEY.md): ${missing.toSeq.sorted}")
  }

  test("every oracle gates a registered query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty,
      s"oracleSql entries with no matching queries entry: ${orphans.toSeq.sorted}")
  }

  test("no registry key is defined twice across the source maps") {
    // a Map literal silently keeps only the LAST duplicate key, so a
    // re-registered name ships one implementation with the OTHER
    // name's oracle (caught live in round 8: a second pipe_shard_skew
    // gated against the wrong columns). Count key literals in source.
    val sources = Seq(
      "src/main/scala/graft/SparkEntry.scala",
      "src/main/scala/graft/operators/Metastore.scala",
      "src/main/scala/graft/operators/Pipeline.scala",
      "src/main/scala/graft/operators/Temporal.scala",
      "src/main/scala/graft/operators/Graph.scala",
      "src/main/scala/graft/operators/Text.scala")
    val keyRe = """"((?:ms|q[0-9]*|ann|txt|mm|pipe|dedup|stream)_[a-z0-9_]+)"\s*->""".r
    // the global invariant: every registered name has EXACTLY one
    // queries entry and at most one oracle entry — so its `"name" ->`
    // literal appears at most twice across all registry sources
    val counts = sources.flatMap { f =>
      val body = scala.io.Source.fromFile(f, "UTF-8").mkString
      keyRe.findAllMatchIn(body).map(_.group(1)).toSeq
    }.groupBy(identity).view.mapValues(_.length)
    val dups = counts.filter { case (k, n) =>
      n > 2 && SparkEntry.queries.contains(k)
    }.toMap
    assert(dups.isEmpty,
      s"registry key literal appears >2x across sources (silent Map override): $dups")
  }

  test("SURVEY's registry-size line matches the live registry (VERDICT r9 #5)") {
    // the r8/r9 narrative drift class (prose said 411, registry shipped
    // 413): SURVEY carries ONE machine-readable count line that this
    // lint pins to SparkEntry.queries.size — adding a query without
    // updating the line fails the suite, so totals can never drift
    val re = """Registry size: (\d+) gated queries""".r
    re.findFirstMatchIn(survey) match {
      case Some(m) =>
        assert(m.group(1).toInt == SparkEntry.queries.size,
          s"SURVEY says 'Registry size: ${m.group(1)}' but the registry has " +
            s"${SparkEntry.queries.size} queries - update the SURVEY line")
      case None => fail(
        "SURVEY.md must carry a 'Registry size: N gated queries' line")
    }
  }

  test("every query is oracle-gated or on the declared rows-only list") {
    // q_approx_distinct is the one DECLARED rows-only check (HLL —
    // its hash-exact twin q_approx_distinct_hll gates); anything else
    // without an oracle is an accidental gate hole, not a decision
    val rowsOnly = Set("q_approx_distinct")
    val ungated = SparkEntry.queries.keySet
      .diff(SparkEntry.oracleSql.keySet).diff(rowsOnly)
    assert(ungated.isEmpty,
      s"queries silently missing a DuckDB oracle: ${ungated.toSeq.sorted}")
  }
}
