package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure core of the plan-audit coverage lint, factored out so the
  * policy itself is unit-testable against synthetic fixtures (the r14
  * lesson: the first version read only the live BENCH_DETAIL.json, and
  * the driver's post-commit regeneration at load 5.7 phantom-spiked two
  * sub-0.2s-idle queries past even the load-widened threshold, turning
  * the suite red on plan-identical code).
  *
  * Policy: a query is "heavy" (must have a `## name` PLANS.md section)
  * when its NOISE-ROBUST min exceeds the threshold, where
  *   - robust min = min(live BENCH_DETAIL min, committed idle floor)
  *     — the floor ledger (tools/idle_floor.json) is written by the
  *     builder from an idle sweep (tools/idle_floor.py) and is not
  *     rewritten by the driver, so a contended regeneration can only
  *     RAISE the live min, never the effective one;
  *   - entries auto-flagged `noisy` (>3x in-sweep spread) are exempt —
  *     their min is already the comparison value elsewhere and a
  *     moving phantom spike must not demand a permanent PLANS section;
  *   - queries absent from the ledger (new this round) use the live
  *     min alone, so a genuinely heavy new query is still caught.
  */
object PlansCoverageLint {
  private val entryRe =
    """"([a-z0-9_]+)":\s*\{\s*"times":[^}]*"min":\s*(\d+\.?\d*),\s*"noisy":\s*(true|false)""".r
  private val loadRe = """"load_avg":\s*(\d+\.?\d*)""".r
  private val floorRe = """"([a-z0-9_]+)":\s*(\d+\.?\d*)""".r
  private val sectionRe = """(?m)^## ([a-z0-9_]+)""".r

  /** name -> (min, noisy) parsed from a BENCH_DETAIL.json body. */
  def parseEntries(benchJson: String): Map[String, (Double, Boolean)] =
    entryRe.findAllMatchIn(benchJson)
      .map(m => m.group(1) -> (m.group(2).toDouble, m.group(3).toBoolean))
      .toMap

  def parseLoad(benchJson: String): Double =
    loadRe.findFirstMatchIn(benchJson).map(_.group(1).toDouble).getOrElse(0.0)

  /** name -> idle-floor min from tools/idle_floor.json ("floors" map).
    * The scalar provenance fields (source_load_avg etc.) don't match
    * the [a-z0-9_] key pattern's value shape conflict because they are
    * top-level; restrict to the floors object to be safe. */
  def parseFloors(floorJson: String): Map[String, Double] = {
    val body = floorJson.indexOf("\"floors\"") match {
      case -1 => return Map.empty
      case i  => floorJson.substring(i)
    }
    floorRe.findAllMatchIn(body)
      .filter(_.group(1) != "floors")
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  def parseSections(plansMd: String): Set[String] =
    sectionRe.findAllMatchIn(plansMd).map(_.group(1)).toSet

  def threshold(loadAvg: Double): Double = if (loadAvg > 4.0) 2.5 else 1.0

  /** Heavy queries under the noise-robust policy. A floored entry's
    * effective min is idle-grade, so the flat 1 s bar applies to it
    * regardless of the live artifact's load; only unfloored (new this
    * round) entries use the load-widened threshold, since their only
    * measurement is the possibly-contended live one. */
  def heavy(benchJson: String, floorJson: String): Set[String] = {
    val widened = threshold(parseLoad(benchJson))
    val floors = parseFloors(floorJson)
    parseEntries(benchJson).collect {
      case (name, (liveMin, noisy)) if !noisy =>
        val t = if (floors.contains(name)) 1.0 else widened
        if (math.min(liveMin, floors.getOrElse(name, liveMin)) > t) Some(name)
        else None
    }.flatten.toSet
  }

  def missing(benchJson: String, floorJson: String, plansMd: String): Set[String] =
    heavy(benchJson, floorJson).diff(parseSections(plansMd))
}

class PlansCoverageSpec extends AnyFunSuite {
  private def read(p: String) = scala.io.Source.fromFile(p, "UTF-8").mkString

  test("every heavy query (noise-robust min > threshold) has a PLANS.md section") {
    val bench = read("BENCH_DETAIL.json")
    val floors = read("tools/idle_floor.json")
    val entries = PlansCoverageLint.parseEntries(bench)
    assert(entries.nonEmpty, "no entries parsed from BENCH_DETAIL.json — regex drift?")
    assert(PlansCoverageLint.parseFloors(floors).nonEmpty,
      "no floors parsed from tools/idle_floor.json — regenerate with tools/idle_floor.py")
    val miss = PlansCoverageLint.missing(bench, floors, read("PLANS.md"))
    assert(miss.isEmpty,
      s"heavy queries lack a PLANS.md section — add to PlanDump.Headline, run " +
        s"tools/plans.sh, and refresh tools/idle_floor.py from an idle sweep: " +
        s"${miss.toSeq.sorted}")
  }

  test("every PlanDump headline query has a generated PLANS.md section (no drift)") {
    val sections = PlansCoverageLint.parseSections(read("PLANS.md"))
    val missing = PlanDump.Headline.toSet.diff(sections)
    assert(missing.isEmpty,
      s"PLANS.md is stale vs PlanDump.Headline — regenerate with tools/plans.sh: " +
        s"${missing.toSeq.sorted}")
  }

  // --- fixture tests: the lint itself must survive the driver's ---
  // --- post-commit artifact rewrite protocol (VERDICT r14 #1)    ---

  private val floorsFx =
    """{"source_load_avg": 1.9, "n_floors": 2,
      | "floors": {"ms_fast": 0.102, "q_heavy": 2.31}}""".stripMargin

  private def benchFx(load: Double, entries: (String, Double, Boolean)*) = {
    val rows = entries.map { case (n, min, noisy) =>
      s""""$n": {"times": [$min, $min, $min], "median": $min, "min": $min, "noisy": $noisy, "jobs": 1, "stages": 1, "tasks": 1}"""
    }.mkString(",\n  ")
    s"""{\n"sf": "x", "reps": 3, "n_queries": ${entries.size},
       |"total_median": 1.0, "unit": "sec", "load_avg": $load,
       |"calib_sec": {"start": 0.1, "mid": 0.1, "end": 0.1},
       |"queries": {\n  $rows\n}\n}""".stripMargin
  }

  test("lint fixture: contended rewrite spiking a floored sub-second query is exempt") {
    // the exact r14 failure shape: idle 0.10s query lands at min 2.9s
    // under load 5.7 — the committed floor (0.102) must exempt it
    val bench = benchFx(5.7, ("ms_fast", 2.884, false), ("q_heavy", 2.6, false))
    assert(PlansCoverageLint.heavy(bench, floorsFx) === Set("q_heavy"))
  }

  test("lint fixture: noisy-flagged spike is exempt even without a floor") {
    val bench = benchFx(2.0, ("q_new_phantom", 7.9, true))
    assert(PlansCoverageLint.heavy(bench, floorsFx) === Set.empty[String])
  }

  test("lint fixture: genuinely heavy NEW query (no floor) is still caught") {
    val bench = benchFx(2.0, ("q_new_heavy", 3.2, false), ("ms_fast", 0.1, false))
    assert(PlansCoverageLint.heavy(bench, floorsFx) === Set("q_new_heavy"))
  }

  test("lint fixture: idle artifact reproduces the plain threshold behavior") {
    val bench = benchFx(1.5, ("q_heavy", 2.31, false), ("ms_fast", 0.102, false))
    assert(PlansCoverageLint.heavy(bench, floorsFx) === Set("q_heavy"))
  }

  test("lint fixture: floors parser ignores provenance scalars") {
    val f = PlansCoverageLint.parseFloors(floorsFx)
    assert(f === Map("ms_fast" -> 0.102, "q_heavy" -> 2.31))
  }
}
