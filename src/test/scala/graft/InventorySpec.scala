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
