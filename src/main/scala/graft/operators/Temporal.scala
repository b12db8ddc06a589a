package graft.operators

import graft.streaming.EventStreams
import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark lacks natively (SURVEY §2.2 extension).
  *
  * The as-of join is built by composing existing operators (preference
  * (a) of the custom-operator ladder): tag both sides, union, and take a
  * running `last(ignoreNulls)` over a per-key time-ordered window. One
  * shuffle + sort per key, no range-join row explosion — at 100 TB this
  * is a single repartition by join key with AQE-handled skew, vs the
  * quadratic blowup of an inequality join.
  */
object Temporal {

  /** Backward as-of join: for every left row, the latest right row of the
    * same key with rightTs ≤ leftTs. Right rows sort before left rows at
    * equal timestamps (≤, not <).
    *
    * @param left     rows to enrich; must contain `key` and `leftTs`
    * @param right    lookup rows; must contain `key` and `rightTs`
    * @param valueCol right column to carry (emitted as `asof_<valueCol>`)
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, valueCol: String): DataFrame =
    asofJoin(left, right, key, leftTs, rightTs, valueCol, backward = true)

  /** Shared tag→union→window scaffold for both as-of directions.
    * Direction decides three things in lockstep: which side sorts first
    * at equal timestamps (right-before-left for backward's ≤,
    * left-before-right for forward's ≥), the window frame (trailing vs
    * leading), and the pick (last vs first non-null right value).
    */
  private def asofJoin(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String, valueCol: String,
                       backward: Boolean): DataFrame = {
    val (lSide, rSide) = if (backward) (1, 0) else (0, 1)
    val lCols = left.columns
    val l = left.withColumn("_ts", col(leftTs)).withColumn("_side", lit(lSide))
      .withColumn("_rv", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(
      col(key), col(rightTs).as("_ts"), lit(rSide).as("_side"), col(valueCol).as("_rv"))
    val unioned = l.select((Seq(col(key), col("_ts"), col("_side"), col("_rv")) ++
      lCols.filterNot(_ == key).map(c => col(c))): _*)
      .unionByName(r, allowMissingColumns = true)
    val ordered = Window.partitionBy(col(key)).orderBy(col("_ts"), col("_side"))
    val (w, pick) =
      if (backward)
        (ordered.rowsBetween(Window.unboundedPreceding, 0),
          last(col("_rv"), ignoreNulls = true))
      else
        (ordered.rowsBetween(0, Window.unboundedFollowing),
          first(col("_rv"), ignoreNulls = true))
    unioned
      .withColumn(s"asof_$valueCol", pick.over(w))
      .filter(col("_side") === lSide)
      .drop("_ts", "_side", "_rv")
  }

  /** Forward as-of join: for every left row, the EARLIEST right row of
    * the same key with rightTs ≥ leftTs (the time-to-next-event lookup).
    * Mirror of [[asofBackward]]: left rows sort before right rows at
    * equal timestamps and take `first(ignoreNulls)` over the
    * current-row-to-unbounded-following frame — same one-shuffle,
    * no-row-explosion scale shape.
    */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String, valueCol: String): DataFrame =
    asofJoin(left, right, key, leftTs, rightTs, valueCol, backward = false)

  /** Query: each click joined to the user's NEXT purchase at or after it
    * (time-to-conversion; oracle: min-over-inequality-join).
    */
  def qAsofForward(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("p_ts"))
    asofForward(clicks, purchases, "user_id", "ts_us", "p_ts", "p_ts")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_p_ts").as("next_purchase_us"))
      .orderBy(col("event_id"))
  }

  /** Query: each click event joined to the user's latest purchase at or
    * before it (oracle: DuckDB ASOF LEFT JOIN).
    */
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("p_ts"))
    asofBackward(clicks, purchases, "user_id", "ts_us", "p_ts", "p_ts")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_p_ts").as("last_purchase_us"))
      .orderBy(col("event_id"))
  }

  /** Nearest-in-time join: each click paired with the user's purchase
    * of minimum |Δt|, composed from the two as-of directions on the
    * shared scaffold (last-at-or-before vs first-at-or-after, tie →
    * the earlier/backward side) — the "closest reading" join sensor
    * and attribution pipelines issue, at the cost of exactly two
    * as-of passes over the same user_id partitioning (Catalyst plans
    * one exchange per side, no range explosion anywhere).
    */
  def qAsofNearest(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("p_ts"))
    val back = asofBackward(clicks, purchases, "user_id", "ts_us", "p_ts", "p_ts")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("asof_p_ts").as("b_ts"))
    val fwd = asofForward(clicks, purchases, "user_id", "ts_us", "p_ts", "p_ts")
      .select(col("event_id"), col("asof_p_ts").as("f_ts"))
    back.join(fwd, Seq("event_id"))
      .withColumn("nearest_purchase_us", expr(
        """CASE WHEN b_ts IS NULL THEN f_ts WHEN f_ts IS NULL THEN b_ts
          |WHEN ts_us - b_ts <= f_ts - ts_us THEN b_ts ELSE f_ts END""".stripMargin))
      .withColumn("dist_us", expr("abs(nearest_purchase_us - ts_us)"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("nearest_purchase_us"), col("dist_us"))
      .orderBy(col("event_id"))
  }

  /** Time-bounded conversion funnel — view → click within 1 hour →
    * purchase within 24 hours of the click (the attribution-window
    * semantics real funnels carry, vs [[qFunnel3]]'s unbounded
    * ordering): same single-shuffle shape, the conversion windows are
    * just upper bounds on the conditional-min window columns.
    */
  def qFunnelWindow(s: SparkSession, d: String,
                    clickUs: Long = 3600000000L, purchUs: Long = 86400000000L): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id"), col("ts_us"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
    ev
      .withColumn("v_ts", min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn("c_ts", min(when(col("event_type") === "click" &&
        col("ts_us") >= col("v_ts") &&
        col("ts_us") <= col("v_ts") + clickUs, col("ts_us"))).over(w))
      .withColumn("p_ts", min(when(col("event_type") === "purchase" &&
        col("ts_us") >= col("c_ts") &&
        col("ts_us") <= col("c_ts") + purchUs, col("ts_us"))).over(w))
      .filter(col("v_ts").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(col("v_ts")).as("v_ts"), min(col("c_ts")).as("c_ts"),
        min(col("p_ts")).as("p_ts"))
      .withColumn("steps",
        (lit(1) + when(col("c_ts").isNotNull, 1).otherwise(0) +
          when(col("p_ts").isNotNull, 1).otherwise(0)).cast("int"))
      .orderBy(col("user_id"))
  }

  /** Peak concurrency per event type — the sweep-line counting of
    * overlapping intervals (each event holds a 1-hour lease): +1 at
    * start, −1 at end, per-type time-ordered cumulative sum, max. Ends
    * sort before starts at the same instant (half-open [s, e)
    * semantics). One narrow (type, t, ±1) shuffle and one per-type
    * ordered window — the standard scale shape for concurrency/load
    * profiling.
    */
  def qConcurrency(s: SparkSession, d: String, leaseUs: Long = 3600000000L): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(col("event_type"), col("ts_us"))
    val points = ev.select(col("event_type"), col("ts_us").as("t"), lit(1L).as("delta"))
      .union(ev.select(col("event_type"), (col("ts_us") + leaseUs).as("t"),
        lit(-1L).as("delta")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, 0)
    points.withColumn("load", sum(col("delta")).over(w))
      .groupBy(col("event_type"))
      .agg(max(col("load")).as("peak_concurrency"),
        (count(lit(1)) / 2).cast("long").as("n_events"))
      .orderBy(col("event_type"))
  }

  /** Cohort retention — users grouped by first-seen day, with day-1 and
    * day-7 return rates: the product-analytics staple. Two aggregates
    * (per-user-day activity, then per-user first day) and one join of
    * the small cohort table back onto user-days; retention flags are
    * exact integer day arithmetic.
    */
  def qRetention(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct()
    val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("c_day"))
    ev.join(cohort, Seq("user_id"))
      .groupBy(col("c_day"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("day") === col("c_day") + 1, col("user_id")))
          .as("n_day1"),
        countDistinct(when(col("day") === col("c_day") + 7, col("user_id")))
          .as("n_day7"))
      .orderBy(col("c_day"))
  }

  /** Interval (range) join by time-bucket blocking — preference (a) of
    * the custom-operator ladder. An inequality-only join would plan as a
    * broadcast-nested-loop (quadratic at scale); instead each interval
    * explodes into the fixed-width bins it covers (⌈span/W⌉+1 rows) and
    * points equi-join on their own bin, then the exact BETWEEN refines.
    * A point matches an interval through exactly ONE bin (its own), so
    * no post-join dedup is needed. At 100 TB: shuffle volume =
    * |points| + Σ bins-per-interval, all narrow rows with map-side
    * combinable aggregation downstream.
    */
  def rangeJoinByBucket(points: DataFrame, intervals: DataFrame,
                        ptCol: String, loCol: String, hiCol: String,
                        binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // integer `div`, not `/` (which widens to DOUBLE on longs)
    val bins = intervals.withColumn("_bin",
      explode(sequence(expr(s"CAST($loCol AS BIGINT) div $binWidth"),
                       expr(s"CAST($hiCol AS BIGINT) div $binWidth"))))
    val pts = points.withColumn("_bin", expr(s"CAST($ptCol AS BIGINT) div $binWidth"))
    pts.join(bins, Seq("_bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Query: "incident windows" (every 50th event, ±10 min) joined to
    * ALL events inside each window — a pure interval join with no equi
    * key — then count/sum per window.
    */
  def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    val W = 600000000L // 10 min in micros = bin width
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(col("event_id"), col("ts_us"), col("value"))
    val incidents = ev.filter(col("event_id") % 50 === 0)
      .select(col("event_id").as("incident_id"),
        (col("ts_us") - W).as("lo"), (col("ts_us") + W).as("hi"))
    rangeJoinByBucket(ev, incidents, "ts_us", "lo", "hi", W)
      .groupBy(col("incident_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .orderBy(col("incident_id"))
  }

  /** Funnel step: per user, the first 'click' and the first 'purchase'
    * within 24 h after it (NULL when no purchase converts). One shuffle:
    * conditional aggregates over a per-user window, no self-join.
    */
  def qFunnel(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400000000L
    val ev = EventStreams.normalize(Tables.events(s, d))
    val w = Window.partitionBy(col("user_id"))
    ev.withColumn("first_click_us",
        min(when(col("event_type") === "click", col("ts_us"))).over(w))
      .filter(col("first_click_us").isNotNull)
      .groupBy(col("user_id"), col("first_click_us"))
      .agg(min(when(col("event_type") === "purchase" &&
          col("ts_us") >= col("first_click_us") &&
          col("ts_us") <= col("first_click_us") + dayUs, col("ts_us")))
        .as("first_purchase_us"))
      .withColumn("converted", col("first_purchase_us").isNotNull)
      .orderBy(col("user_id"))
  }

  /** Strict 3-step ordered funnel (view → click → purchase): each
    * step's timestamp is the user's earliest qualifying event AT OR
    * AFTER the previous step. The chained conditional minima are three
    * Window nodes over ONE user_id exchange (each references the
    * previous node's column — Catalyst stacks them on the same sort),
    * then one aggregate row per user. No self-joins, no state machine.
    */
  def qFunnel3(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id"), col("ts_us"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
    ev
      .withColumn("v_ts", min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn("c_ts", min(when(col("event_type") === "click" &&
        col("ts_us") >= col("v_ts"), col("ts_us"))).over(w))
      .withColumn("p_ts", min(when(col("event_type") === "purchase" &&
        col("ts_us") >= col("c_ts"), col("ts_us"))).over(w))
      .filter(col("v_ts").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(col("v_ts")).as("v_ts"), min(col("c_ts")).as("c_ts"),
        min(col("p_ts")).as("p_ts"))
      .withColumn("steps",
        (lit(1) + when(col("c_ts").isNotNull, 1).otherwise(0) +
          when(col("p_ts").isNotNull, 1).otherwise(0)).cast("int"))
      .orderBy(col("user_id"))
  }

  /** Total covered time per event type under 1-hour leases — the union
    * of overlapping intervals (uptime/coverage gauges). Sweep-line like
    * [[qConcurrency]]: ±1 deltas, per-type ordered running count, and a
    * covered-segment length lead(t)−t wherever the running count > 0 —
    * merging overlaps without ever materializing merged intervals. One
    * narrow shuffle, exact micros.
    */
  def qIntervalCoverage(s: SparkSession, d: String, leaseUs: Long = 3600000000L): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(col("event_type"), col("ts_us"))
    val points = ev.select(col("event_type"), col("ts_us").as("t"), lit(1L).as("delta"))
      .union(ev.select(col("event_type"), (col("ts_us") + leaseUs).as("t"),
        lit(-1L).as("delta")))
    val byT = Window.partitionBy(col("event_type")).orderBy(col("t"), col("delta"))
    points
      .withColumn("active", sum(col("delta")).over(byT.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("next_t", lead(col("t"), 1).over(byT))
      .filter(col("active") > 0 && col("next_t").isNotNull)
      .groupBy(col("event_type"))
      .agg(sum(col("next_t") - col("t")).as("covered_us"))
      .orderBy(col("event_type"))
  }

  /** Top user journeys — the path-analysis staple: each user's first
    * three events (time-ordered, id tie-broken) joined into a `a>b>c`
    * path string, counted corpus-wide, top 20. One user_id window
    * (rank ≤ 3 filters early, so the per-user collect is bounded at 3
    * rows), one path groupBy, one TakeOrderedAndProject page.
    */
  def qPaths(s: SparkSession, d: String, steps: Int = 3, k: Int = 20): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= steps)
      .groupBy(col("user_id"))
      .agg(concat_ws(">",
        expr("transform(array_sort(collect_list(struct(rn, event_type))), x -> x.event_type)"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)
  }

  /** Full cohort-retention matrix — the (first-seen day × day-offset)
    * grid behind every retention curve: per-user-day activity distinct,
    * cohort min join, then one partial-agg groupBy onto a grid of at
    * most days² rows with exact per-mille retention (cohort size joins
    * back on the tiny cohort-day table). Generalizes [[qRetention]]'s
    * day-1/day-7 columns to every offset.
    */
  def qCohortMatrix(s: SparkSession, d: String): DataFrame = {
    val ud = EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct()
    val cohort = ud.groupBy(col("user_id")).agg(min(col("day")).as("c_day"))
    val sizes = cohort.groupBy(col("c_day")).agg(countDistinct(col("user_id")).as("cohort_n"))
    ud.join(cohort, Seq("user_id"))
      .groupBy(col("c_day"), (col("day") - col("c_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(broadcast(sizes), Seq("c_day"))
      .select(col("c_day"), col("day_offset"), col("n_active"), col("cohort_n"),
        expr("n_active * 1000 div cohort_n").as("retention_pm"))
      .orderBy(col("c_day"), col("day_offset"))
  }

  /** Cohort lifetime-value curves — the revenue companion of
    * [[qCohortMatrix]]'s retention grid: users grouped by first-seen
    * WEEK, purchase cents accumulated per (cohort, age-in-weeks), and
    * the running LTV per user ×100 (cum cents div cohort size) — "how
    * much is a week-N signup worth by age K", the payback-curve
    * readout. Scale shape: one per-user first-seen aggregate + one
    * purchase-scan groupBy onto the weeks² grid; the cumulative
    * window runs over the grid, cohort sizes broadcast.
    */
  def qCohortLtv(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id"), expr("(ts_us div 86400000000) div 7").as("week"),
        col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("week")).as("c_week"))
    val sizes = cohort.groupBy(col("c_week"))
      .agg(count(lit(1)).as("cohort_n"))
    val grid = ev.filter(col("event_type") === "purchase")
      .join(cohort, Seq("user_id"))
      .groupBy(col("c_week"), (col("week") - col("c_week")).as("age_weeks"))
      .agg(sum(col("cents")).cast("long").as("cents"))
    val wCum = Window.partitionBy(col("c_week")).orderBy(col("age_weeks"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid
      .withColumn("cum_cents", sum(col("cents")).over(wCum).cast("long"))
      .join(broadcast(sizes), Seq("c_week"))
      .select(col("c_week"), col("age_weeks"), col("cents"), col("cum_cents"),
        col("cohort_n"),
        expr("(cum_cents * 100) div cohort_n").as("ltv_per_user_x100"))
      .orderBy(col("c_week"), col("age_weeks"))
  }

  /** Deterministic A/B readout — arms assigned by a stateless hash
    * parity of user_id (re-derivable anywhere, like [[graft.operators
    * .Pipeline.splitAssign]]), conversion = any purchase event, rates
    * and per-user purchase value in exact scaled integers. One
    * per-user aggregate then a 2-row arm aggregate.
    */
  def qAbLift(s: SparkSession, d: String): DataFrame = {
    val perUser = EventStreams.normalize(Tables.events(s, d))
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"),
        sum(when(col("event_type") === "purchase",
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).otherwise(0L)).as("purchase_cents"))
    perUser
      .groupBy(expr("((user_id * 2654435761) % 4294967296) div 2147483648").as("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).cast("long").as("n_converted"),
        sum(col("purchase_cents")).as("value_cents"))
      .select(col("arm"), col("n_users"), col("n_converted"), col("value_cents"),
        expr("n_converted * 10000 div n_users").as("conv_x1e4"),
        expr("value_cents div n_users").as("value_per_user_cents"))
      .orderBy(col("arm"))
  }

  /** Additive seasonal decomposition of the daily event count — the
    * STL-lite readout (trend + day-of-week seasonal + residual) in
    * exact ×100 integers: trend = centered 7-day moving mean (edge
    * days use the available window — a DEFINED choice, same both
    * engines), seasonal = the mean DETRENDED deviation of that
    * weekday (so the seasonal component is centered around zero by
    * construction up to flooring), residual = actual·100 − trend −
    * seasonal. Day-domain windows and a 7-row weekday grid only; the
    * fact scan partial-aggregates once.
    */
  def qSeasonalDecompose(s: SparkSession, d: String): DataFrame = {
    val daily = EventStreams.normalize(Tables.events(s, d))
      .groupBy(expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", expr("day % 7"))
    val wTrend = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val t2 = daily
      .withColumn("tsum", sum(col("n")).over(wTrend))
      .withColumn("tcnt", count(lit(1)).over(wTrend))
      .withColumn("trend_x100", expr("(tsum * 100) div tcnt"))
      .withColumn("detr_x100", col("n") * 100 - col("trend_x100"))
      .localCheckpoint(eager = false)
    val seasonal = t2.groupBy(col("dow"))
      .agg(expr("CAST(sum(detr_x100) AS BIGINT)").as("ds"),
        count(lit(1)).as("dn"))
      .withColumn("seas_x100", expr(
        "CAST(sign(ds) AS BIGINT) * (abs(ds) div dn)"))
      .select(col("dow"), col("seas_x100"))
    t2.join(broadcast(seasonal), Seq("dow"))
      .select(col("day"), col("n"), col("trend_x100"), col("seas_x100"),
        (col("n") * 100 - col("trend_x100") - col("seas_x100")).as("resid_x100"))
      .orderBy(col("day"))
  }

  /** Heartbeat-gap detection per event type — the "did the pipeline go
    * silent" monitor: the largest interval between consecutive events
    * and the count of gaps over one hour. The scale-critical
    * decomposition: consecutive gaps are computed inside (type, DAY)
    * partitions — per-day state only, no one-reducer-per-type funnel
    * — and the day-BOUNDARY gaps come from a second window over the
    * bounded (type, day) summary grid (first/last event per day), so
    * no gap is ever missed and no partition ever exceeds a day of one
    * type. Union both gap families, roll up per type.
    */
  def qMaxGap(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(col("event_type"), col("ts_us"), col("event_id"),
        expr("ts_us div 86400000000").as("day"))
    val wIntra = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts_us"), col("event_id"))
    val intra = ev
      .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(wIntra))
      .filter(col("gap").isNotNull)
      .select(col("event_type"), col("gap"))
    val days = ev.groupBy(col("event_type"), col("day"))
      .agg(min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"),
        count(lit(1)).as("n"))
    val wDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val boundary = days
      .withColumn("gap", col("first_us") - lag(col("last_us"), 1).over(wDay))
      .filter(col("gap").isNotNull)
      .select(col("event_type"), col("gap"))
    val nTot = days.groupBy(col("event_type"))
      .agg(sum(col("n")).cast("long").as("n_events"))
    intra.unionByName(boundary)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_gaps"),
        max(col("gap")).cast("long").as("max_gap_us"),
        sum(when(col("gap") > 3600000000L, 1L).otherwise(0L))
          .cast("long").as("gaps_over_1h"))
      .join(nTot, Seq("event_type"))
      .select(col("event_type"), col("n_events"), col("n_gaps"),
        col("max_gap_us"), col("gaps_over_1h"))
      .orderBy(col("event_type"))
  }

  /** Daily-quota audit — who would a 5-events-per-day quota have hit
    * (the window is chosen to be NON-VACUOUS on this corpus: per-minute
    * peaks at 2 events at every SF — measured before shipping, the
    * probe-first discipline): per user, days over quota, the busiest
    * day, the events a strict limiter would have dropped
    * (Σ max(0, n−L)), and the drop ratio ppm. The (user, day) grid
    * partial-aggregates in one pass (never raw-event state), the
    * per-user rollup shuffles user-keyed counts only. Top-20 worst
    * offenders — a distributed top-k, not a global sort.
    */
  def qRateLimit(s: SparkSession, d: String, limit: Long = 5L): DataFrame = {
    val perDay = EventStreams.normalize(Tables.events(s, d))
      .groupBy(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
    perDay.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("n")).cast("long").as("n_events"),
        max(col("n")).cast("long").as("peak_day"),
        sum(when(col("n") > limit, col("n") - limit).otherwise(0L))
          .cast("long").as("n_dropped"),
        sum(when(col("n") > limit, 1L).otherwise(0L))
          .cast("long").as("days_over"))
      .withColumn("drop_ppm", expr("(n_dropped * 1000000) div n_events"))
      .orderBy(col("n_dropped").desc, col("user_id"))
      .limit(20)
  }

  /** SLO error-budget burn — the SRE readout that decides "can we ship
    * this week": with a 1% error-rate objective, each day's budget
    * burn is rate/SLO (×100: 100 = burning exactly the budget), and
    * the cumulative share of the window's total budget consumed so
    * far (×10⁶) tells you when you run out. 'error' events over all
    * events, exact integers throughout (rate ppm = e·10⁶ div n; burn
    * = rate_ppm div 100 since SLO = 1% = 10⁴ ppm). Day-domain
    * windows only; the fact scan partial-aggregates to the daily
    * grid in one pass.
    */
  def qErrorBudget(s: SparkSession, d: String): DataFrame = {
    val daily = EventStreams.normalize(Tables.events(s, d))
      .groupBy(expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .cast("long").as("e"))
    val tot = daily.agg(sum(col("n")).cast("long").as("n_tot"))
    val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    daily.crossJoin(broadcast(tot))
      .withColumn("rate_ppm", expr("(e * 1000000) div n"))
      .withColumn("burn_x100", expr("rate_ppm div 100"))
      .withColumn("cum_e", sum(col("e")).over(w))
      // window budget = 1% of ALL events; share of it consumed so far
      .withColumn("budget_used_ppm",
        expr("(cum_e * 1000000) div (n_tot div 100)"))
      .select(col("day"), col("n"), col("e"), col("rate_ppm"),
        col("burn_x100"), col("cum_e"), col("budget_used_ppm"))
      .orderBy(col("day"))
  }

  /** Dispersion (Fano) index of daily event counts per type — the
    * burstiness diagnostic that separates Poisson-like traffic
    * (fano ≈ 1) from bursty incident-driven load (fano ≫ 1) and
    * over-regular synthetic load (fano < 1): variance/mean ×10⁶ =
    * (n·Σx² − (Σx)²)·10⁶ div (n·Σx), exact integers staged
    * DECIMAL(38,0) (n·Σx²·10⁶ ~ 10³² at 10¹²-row days). The daily
    * grid is one partial-agg pass; everything after is
    * (types × days)-bounded.
    */
  def qDispersion(s: SparkSession, d: String): DataFrame = {
    val daily = EventStreams.normalize(Tables.events(s, d))
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("x")).cast("long").as("n_events"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sx2"))
      .select(col("event_type"), col("n_days"), col("n_events"),
        expr("(n_events * 100) div n_days").as("mean_x100"),
        // overflow-bound: sx2 <= n_events^2, so n_days * sx2 * 1e6 <= n_days * n_events^2 * 1e6 — inside DECIMAL(38) for n_events < 3*10^13 at n_days <= 10^5.
        expr("""CAST(((CAST(n_days AS DECIMAL(38,0)) * sx2
               |  - CAST(n_events AS DECIMAL(38,0)) * n_events) * 1000000)
               |  div (CAST(n_days AS DECIMAL(38,0)) * n_events) AS BIGINT)"""
          .stripMargin).as("fano_x1e6"))
      .withColumn("overdispersed", (col("fano_x1e6") > 1000000L).cast("int"))
      .orderBy(col("event_type"))
  }

  /** Difference-in-differences — the canonical quasi-experimental
    * estimator ([[qAbLift]]'s observational sibling): treatment =
    * odd user_id, intervention at day 19738 (mid-window of the event
    * span at every scale), outcome = mean event value in cents ×100.
    * DiD = (T_post − T_pre) − (C_post − C_pre), the parallel-trends
    * difference that nets out both the group baseline and the secular
    * trend. All four cell means are floored non-negative integer
    * divisions (sum·100 div n); the estimate is a signed difference of
    * EXACT integers, emitted as |did| + sign so truncate-vs-floor can
    * never diverge. One scan, one 1-row conditional aggregate — the
    * whole analysis is a single map-side-combined pass at any scale.
    */
  def qDid(s: SparkSession, d: String): DataFrame = {
    val cutoffDay = 19738L
    EventStreams.normalize(Tables.events(s, d))
      .select((col("user_id") % 2 === 1).as("treat"),
        (expr("ts_us div 86400000000") >= cutoffDay).as("post"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .agg(
        sum(when(col("treat") && !col("post"), 1L).otherwise(0L)).cast("long").as("n_tpre"),
        sum(when(col("treat") && col("post"), 1L).otherwise(0L)).cast("long").as("n_tpost"),
        sum(when(!col("treat") && !col("post"), 1L).otherwise(0L)).cast("long").as("n_cpre"),
        sum(when(!col("treat") && col("post"), 1L).otherwise(0L)).cast("long").as("n_cpost"),
        sum(when(col("treat") && !col("post"), col("cents")).otherwise(0L)).as("s_tpre"),
        sum(when(col("treat") && col("post"), col("cents")).otherwise(0L)).as("s_tpost"),
        sum(when(!col("treat") && !col("post"), col("cents")).otherwise(0L)).as("s_cpre"),
        sum(when(!col("treat") && col("post"), col("cents")).otherwise(0L)).as("s_cpost"))
      .select(col("n_tpre"), col("n_tpost"), col("n_cpre"), col("n_cpost"),
        expr("(s_tpre * 100) div n_tpre").as("m_tpre_x100"),
        expr("(s_tpost * 100) div n_tpost").as("m_tpost_x100"),
        expr("(s_cpre * 100) div n_cpre").as("m_cpre_x100"),
        expr("(s_cpost * 100) div n_cpost").as("m_cpost_x100"))
      .select(col("*"),
        abs(expr("(m_tpost_x100 - m_tpre_x100) - (m_cpost_x100 - m_cpre_x100)"))
          .as("did_abs_x100"),
        expr("CAST(sign((m_tpost_x100 - m_tpre_x100) - (m_cpost_x100 - m_cpre_x100)) AS INT)")
          .as("did_sign"))
  }

  /** Sample-ratio-mismatch check — the first gate every experimentation
    * platform runs before reading a result: does the realized
    * assignment match the designed 50/50 split? χ² for one degree of
    * freedom collapses to (a−b)²/(a+b) under equal expectation — one
    * exact integer division ×10⁶ — and the flag fires above the
    * critical value 3.841 (p < 0.05). Two assignment schemes are
    * audited so BOTH flag states are exercised: the healthy user-parity
    * split and a deliberately broken mod-5 split (⅕ vs ⅘ — the classic
    * bucketing bug SRM exists to catch, imbalanced enough to trip the
    * 3.841 critical value at every test scale). User-domain aggregate only.
    */
  def qSrm(s: SparkSession, d: String): DataFrame = {
    val users = EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id")).distinct()
    def scheme(name: String, isB: org.apache.spark.sql.Column) =
      users.agg(
        sum(when(isB, 0L).otherwise(1L)).cast("long").as("n_a"),
        sum(when(isB, 1L).otherwise(0L)).cast("long").as("n_b"))
        .select(lit(name).as("scheme"), col("n_a"), col("n_b"),
          expr("((n_a - n_b) * (n_a - n_b) * 1000000) div (n_a + n_b)").as("chi2_x1e6"))
        .withColumn("srm", (col("chi2_x1e6") > 3841000L).cast("int"))
    scheme("mod2", col("user_id") % 2 === 1)
      .unionByName(scheme("mod5", col("user_id") % 5 === 0))
      .orderBy(col("scheme"))
  }

  /** Gaps-and-islands — longest consecutive-day activity streak per
    * user (the engagement metric behind "7-day streak" features, and
    * the canonical SQL islands idiom the surface was missing). Island
    * key = day − row_number over the user's distinct active days:
    * constant exactly while days are consecutive. Per user this emits
    * total active days, island count, and the longest streak — scalar
    * aggregates only, so no tie-break is ever needed. Scale: the
    * distinct is a (user, day) partial-agg shuffle of narrow rows; the
    * window + island aggregate both run on the user_id partitioning
    * over per-user ACTIVE-DAY counts (≤ calendar days, never event
    * rows) — the event log itself is touched once, map-side.
    */
  def qStreaks(s: SparkSession, d: String): DataFrame = {
    val ud = EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    ud.withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).cast("long").as("n_active_days"),
        count(lit(1)).as("n_islands"),
        max(col("len")).as("longest_streak"))
      .orderBy(col("user_id"))
  }

  /** CUSUM changepoint scan over the daily event-count series — the
    * level-shift detector run scale-free in exact integers: with daily
    * counts x_k and total S over n days, the centered cumulative sum
    * n·Σ_{i≤k}x_i − k·S is BIGINT-exact (no mean division), and the
    * changepoint is the day of its maximum |value|. One narrow
    * (day, count) aggregate, one ordered window over n rows, one
    * max-join — the series is days-long no matter how many events.
    */
  def qChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = EventStreams.normalize(Tables.events(s, d))
      .select(expr("ts_us div 86400000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("x"))
    val tot = daily.agg(sum(col("x")).as("s_tot"), count(lit(1)).as("n_days"))
    val kW = Window.orderBy(col("day"))
    val cusum = daily.crossJoin(broadcast(tot))
      .withColumn("k", row_number().over(kW).cast("long"))
      .withColumn("cusum", expr("n_days * sum(x) OVER (ORDER BY day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - k * s_tot"))
    val peak = cusum.agg(max(abs(col("cusum"))).as("peak"))
    cusum.crossJoin(broadcast(peak))
      .select(col("day"), col("x"), col("cusum"),
        (abs(col("cusum")) === col("peak")).as("is_changepoint"))
      .orderBy(col("day"))
  }

  /** First-order Markov transition matrix over per-user event sequences
    * (sequence mining / behavioral modeling): pair every event with the
    * user's next event via `lead` over one per-user time-ordered window,
    * then count (from, to) transitions. Row-normalized probabilities are
    * exact ×10⁶ integers (BIGINT div) so the gate is hash-exact. Scale
    * shape: ONE shuffle on user_id for the window, then a partial-agg
    * groupBy on the (from, to) pair — the transition matrix itself is
    * |types|² rows, trivially small however large the corpus.
    */
  def qMarkov(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val counts = ev
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val rowTotal = Window.partitionBy(col("from_type"))
    counts
      .withColumn("row_n", sum(col("n")).over(rowTotal))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1000000 div row_n").as("p_x1e6"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Sequential-pattern support over per-user event histories — the
    * order-sensitive sibling of [[qMarkov]] (which counts only ADJACENT
    * transitions): for every ordered type pair (a, b), how many users
    * did a STRICTLY BEFORE their first b (first-occurrence semantics,
    * ties broken by event_id — the deterministic rendering of the
    * classic 2-sequence support of AprioriAll/PrefixSpan), plus
    * confidence P(b after a | a) and lift vs the independence
    * baseline, both exact ×10⁶ integers (lift's support·N·10⁶ staged
    * through DECIMAL(38,0)). Scale shape: ONE fact-scale shuffle to the
    * (user, type) first-occurrence grid — per-user state only — then a
    * user-keyed equi-join whose blowup is |types|² per user (types is
    * a small fixed domain, so this is linear in users), aggregated to
    * the |types|²-row pair matrix. The user count is a 1-row broadcast.
    */
  def qSeqPairs(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
    // first occurrence of each type per user; read by both pair-join
    // sides AND the marginals — materialize the narrow grid once
    val firsts = ev.groupBy(col("user_id"), col("event_type"))
      .agg(min(struct(col("ts_us"), col("event_id"))).as("f"))
      .select(col("user_id"), col("event_type"),
        col("f.ts_us").as("fts"), col("f.event_id").as("fid"))
      .localCheckpoint(eager = false)
    val nUsers = firsts.select(col("user_id")).distinct()
      .agg(count(lit(1)).cast("long").as("n_users"))
    val typeN = firsts.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"))
    firsts.as("x").join(firsts.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") =!= col("y.event_type") &&
          (col("x.fts") < col("y.fts") ||
            (col("x.fts") === col("y.fts") && col("x.fid") < col("y.fid"))))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(count(lit(1)).cast("long").as("support"))
      .join(typeN.select(col("event_type").as("type_a"), col("n").as("n_a")), "type_a")
      .join(typeN.select(col("event_type").as("type_b"), col("n").as("n_b")), "type_b")
      .crossJoin(broadcast(nUsers))
      // overflow-bound: support ≤ n_a ≤ n_users (user counts, int64);
      // support·n_users·10⁶ ≤ (10¹²)²·10⁶ = 10³⁰ < 10³⁸ and
      // n_a·n_b ≤ 10²⁴ — DECIMAL(38,0) holds to 10¹²-user corpora
      .select(col("type_a"), col("type_b"), col("support"), col("n_a"), col("n_b"),
        expr("(support * 1000000) div n_a").as("conf_x1e6"),
        expr("CAST((CAST(support AS DECIMAL(38,0)) * n_users * 1000000)" +
          " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("lift_x1e6"))
      .orderBy(col("support").desc, col("type_a"), col("type_b"))
  }

  /** Rolling (cumulative) mode of each user's event types — per event,
    * the most frequent type seen so far, ties broken lexicographically
    * smallest. Pure window functions, no token self-join: the running
    * count c of the current row's type is encoded with the type into
    * one order-reversing string key (`lpad(10¹²−c) || type`, 13 digits
    * — a per-(user, type) prefix count past 10¹² would need >10¹² events
    * for ONE user, far beyond any per-key state this engine plans for), and
    * `min(key)` over the user's prefix recovers the prefix mode — a
    * type's count within the prefix equals c at its last occurrence
    * there, so the prefix-min of keys is exactly (max count, min type).
    * Scale: two windows partitioned by user — per-user state only, one
    * shuffle on user_id, no join.
    */
  def qModeRolling(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
    val wc = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wp = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("c", count(lit(1)).over(wc))
      .withColumn("kk",
        concat(lpad((lit(1000000000000L) - col("c")).cast("string"), 13, "0"),
          col("event_type")))
      .withColumn("mkey", min(col("kk")).over(wp))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        expr("substring(mkey, 14)").as("mode_type"),
        (lit(1000000000000L) - expr("CAST(substring(mkey, 1, 13) AS BIGINT)")).as("mode_n"))
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  /** SCD Type-2 interval building from an event log: per user, collapse
    * consecutive same-type events into state segments — each type CHANGE
    * opens a row [valid_from, valid_to) closed by the next change
    * (`lead`), open-ended on the current state. The warehouse-standard
    * history-table materialization. Scale shape: one shuffle on user_id;
    * both window passes (change detection, then segment close) share the
    * same partitioning and sort order, so Catalyst plans a single
    * exchange + sort.
    */
  def qScd2(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val segStart = ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts_us").as("valid_from_us"))
    val wSeg = Window.partitionBy(col("user_id")).orderBy(col("valid_from_us"))
    segStart
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wSeg))
      .withColumn("is_current", col("valid_to_us").isNull)
      .orderBy(col("user_id"), col("valid_from_us"))
  }

  /** Per-user purchase spend in exact cents plus the deterministic hash
    * arm (same split as [[qAbLift]]): the shared base for the two-sample
    * statistical tests below. Users with no purchases keep cents = 0 —
    * the tests compare whole-population spend, not purchaser-only spend.
    */
  private def perUserArmCents(s: SparkSession, d: String): DataFrame =
    EventStreams.normalize(Tables.events(s, d))
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).otherwise(0L)).as("cents"))
      .select(col("user_id"), col("cents"),
        expr("((user_id * 2654435761) % 4294967296) div 2147483648").as("arm"))

  /** Batch 30-minute-gap sessionization — the canonical event-analytics
    * operator (and the batch twin of stream_sessionize): a session break
    * opens wherever a user's gap to the previous event exceeds 30 min,
    * session ids are the running sum of break flags, and the per-user
    * summary aggregates session counts/sizes/durations. All arithmetic
    * is integer microseconds, so the DuckDB oracle is hash-exact. Scale
    * shape: ONE shuffle on user_id; the lag, the running sum, and the
    * session rollup all reuse that partitioning (Catalyst plans a single
    * exchange), and the output is one row per user.
    */
  def qSessionize(s: SparkSession, d: String): DataFrame = {
    val gapUs = 1800L * 1000000L
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id"), col("ts_us"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val sess = ev
      .withColumn("new_sess",
        when(lag(col("ts_us"), 1).over(w).isNull ||
          col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(run))
    sess.groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_ev"),
        (max(col("ts_us")) - min(col("ts_us"))).as("dur_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_ev")).cast("long").as("n_events"),
        max(col("n_ev")).as("max_session_events"),
        expr("max(dur_us) div 1000000").as("longest_session_s"))
      .withColumn("events_per_session_x100",
        expr("(n_events * 100) div n_sessions"))
      .orderBy(col("user_id"))
  }

  /** Welch's two-sample t-test between the A/B hash arms on per-user
    * spend — the significance test behind [[qAbLift]]'s lift numbers,
    * run integer-exact so the oracle can gate it hash-exact: moments
    * (n, Σcents, Σcents²) stay in BIGINT/DECIMAL(38,0), the pooled
    * standard error is staged ×10⁶ through exact integer division
    * (DECIMAL(38,0) headroom for Σcents²·10⁶), and the only float op is
    * one IEEE-754 `sqrt` on an integer < 2⁵³ — correctly rounded and
    * bit-identical in both engines. |t| and sign are emitted separately
    * because Spark's `div` truncates while DuckDB's `//` floors, and
    * they disagree on negative numerators. Scale: one narrow per-user
    * aggregate then a single 8-column reduce — no shuffle after the
    * user_id partial.
    */
  def qTtest(s: SparkSession, d: String): DataFrame =
    perUserArmCents(s, d)
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("long").as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("long").as("n_b"),
        sum(when(col("arm") === 0, col("cents")).otherwise(0L)).cast("long").as("sum_cents_a"),
        sum(when(col("arm") === 1, col("cents")).otherwise(0L)).cast("long").as("sum_cents_b"),
        sum(when(col("arm") === 0, expr("CAST(cents AS DECIMAL(38,0)) * cents"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("ssq_a"),
        sum(when(col("arm") === 1, expr("CAST(cents AS DECIMAL(38,0)) * cents"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("ssq_b"))
      .withColumn("mean_diff_x1e4",
        expr("(sum_cents_a * 10000) div n_a - (sum_cents_b * 10000) div n_b"))
      .withColumn("se2_x1e6", expr(
        // overflow-bound: per-event cents < 10^5 so ssq <= n * 10^10 and n*ssq <= n^2 * 10^10; * 1e6 inside DECIMAL(38) for n < 10^11 events per arm.
        """CAST((CAST(n_a AS DECIMAL(38,0)) * ssq_a - CAST(sum_cents_a AS DECIMAL(38,0)) * sum_cents_a)
          |  * 1000000 div (CAST(n_a AS DECIMAL(38,0)) * (n_a - 1) * n_a) AS BIGINT)
          |+ CAST((CAST(n_b AS DECIMAL(38,0)) * ssq_b - CAST(sum_cents_b AS DECIMAL(38,0)) * sum_cents_b)
          |  * 1000000 div (CAST(n_b AS DECIMAL(38,0)) * (n_b - 1) * n_b) AS BIGINT)""".stripMargin))
      .withColumn("se_x1e3",
        expr("CAST(floor(sqrt(CAST(se2_x1e6 AS DOUBLE))) AS BIGINT)"))
      .withColumn("t_abs_x1e3", expr("(abs(mean_diff_x1e4) * 100) div se_x1e3"))
      .withColumn("t_sign", expr(
        "CAST(CASE WHEN mean_diff_x1e4 < 0 THEN -1 WHEN mean_diff_x1e4 > 0 THEN 1 ELSE 0 END AS INT)"))
      // BIGINT-only output boundary: the DECIMAL(38,0) Σcents² sums
      // emit as base-10¹⁸ hi/lo BIGINT pairs (sums of squares ⇒
      // non-negative ⇒ truncating div ≡ flooring //).
      .select(col("n_a"), col("n_b"), col("sum_cents_a"), col("sum_cents_b"),
        expr("CAST(ssq_a div 1000000000000000000 AS BIGINT)").as("ssq_a_hi"),
        expr("CAST(ssq_a % 1000000000000000000 AS BIGINT)").as("ssq_a_lo"),
        expr("CAST(ssq_b div 1000000000000000000 AS BIGINT)").as("ssq_b_hi"),
        expr("CAST(ssq_b % 1000000000000000000 AS BIGINT)").as("ssq_b_lo"),
        col("mean_diff_x1e4"), col("se2_x1e6"),
        col("se_x1e3"), col("t_abs_x1e3"), col("t_sign"))

  /** Two-sample Kolmogorov–Smirnov D between the A/B hash arms on
    * per-user spend — the distribution-shape complement to [[qTtest]]'s
    * mean test, fully integer-exact: at every distinct spend value the
    * scaled ECDF gap |cumA·n_b − cumB·n_a| is a BIGINT, D is its max,
    * and d_x1e6 rescales by n_a·n_b at the end. Scale shape: the event
    * log collapses to per-user rows, then to one row per DISTINCT spend
    * value (near-customer-cardinality — it GROWS with SF); both running
    * ECDFs run in ONE pass of [[graft.operators.Relational.rankedCumN]]'s
    * range-partitioned two-phase prefix sum (VERDICT r9 #1 — no bare
    * single-partition window), and the final reduce is one row.
    */
  def qKsTest(s: SparkSession, d: String): DataFrame = {
    val pu = perUserArmCents(s, d)
    val counts = pu.groupBy(col("cents")).agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("long").as("ca"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("long").as("cb"))
    val tot = pu.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("long").as("n_b"))
    Relational.rankedCumN(counts, Seq(col("cents")),
        Seq("a" -> col("ca"), "b" -> col("cb")))
      .crossJoin(broadcast(tot))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a"))).as("d_num"))
      .withColumn("d_x1e6", expr("(d_num * 1000000) div (n_a * n_b)"))
  }

  /** Mann–Whitney U between the same A/B hash arms as [[qTtest]] /
    * [[qKsTest]] — the non-parametric member of the significance-test
    * family, exact to the last tie: per DISTINCT spend value the ranks
    * occupied are [start, start+cnt-1], so the tie-averaged rank ×2 is
    * the integer 2·start+cnt−1 and R₁×2 = Σ cnt_a·(2·start+cnt−1);
    * U₁×2 = R₁×2 − n_a(n_a+1), U₂×2 = 2·n_a·n_b − U₁×2. Everything
    * stays BIGINT (the ×2 staging absorbs the .5 tie averages). The
    * rank scan over the collapsed value domain (which grows with SF)
    * runs as [[graft.operators.Relational.rankedCumN]]'s two-phase
    * range-partitioned prefix sum, exactly like the KS scan
    * (VERDICT r9 #1).
    */
  def qMannWhitney(s: SparkSession, d: String): DataFrame = {
    val pu = perUserArmCents(s, d)
    val counts = pu.groupBy(col("cents")).agg(
      count(lit(1)).as("cnt"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("long").as("ca"))
    val tot = pu.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("long").as("n_b"))
    Relational.rankedCumN(counts, Seq(col("cents")), Seq("t" -> col("cnt")))
      .withColumn("start", col("cum_t") - col("cnt") + 1)
      .agg(sum(expr("ca * (2 * start + cnt - 1)")).cast("long").as("r1_x2"))
      .crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"), col("r1_x2"),
        expr("r1_x2 - n_a * (n_a + 1)").as("u1_x2"),
        expr("2 * n_a * n_b - (r1_x2 - n_a * (n_a + 1))").as("u2_x2"),
        expr("n_a * n_b").as("u_mean_x2"),
        expr("CAST(sign(r1_x2 - n_a * (n_a + 1) - n_a * n_b) AS INT)").as("direction"))
  }

  /** Lead–lag cross-correlation of the daily click and purchase series
    * (lags −3..+3): does click volume predict purchase volume days
    * later? Everything downstream of one event-scan groupBy runs on
    * the DAY domain — the zero-filled grid (gap-fill pattern), the
    * 7-lag explode, the per-lag rollup — and stays exact BIGINT: the
    * emitted cov_num = n·Σxy − Σx·Σy is the covariance NUMERATOR
    * (the sign/argmax carrier), so no sqrt or division ever runs.
    */
  /** Granger-style lagged-regression readout: does YESTERDAY's click
    * volume explain TODAY's purchase volume beyond yesterday's purchase
    * volume alone? R² of the restricted AR model (y_t ~ y_{t−1}) vs the
    * full model (y_t ~ y_{t−1} + x_{t−1}), both computed EXACTLY from
    * integer normal equations: centered sums C·· = n·Σab − Σa·Σb fold
    * from one 1-row aggregate; the full-model R² closes by Cramer
    * (D, D1, D2) like q_linreg_multi; every ratio is a carry-staged
    * ×10⁶ floor division mirrored in the oracle. The lag is a
    * day-grid self-join (day = day+1) on the zero-filled [[dailyXy]]
    * day domain — deterministic under gaps, never a fact-scale window.
    * The causal claim is only as good as the lag-1 linear model — this
    * is the screening statistic, not an inference procedure.
    */
  def qGranger(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(expr("ts_us div 86400000000").as("day"), col("event_type"))
    val daily = ev.groupBy(col("day")).agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).cast("long").as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).cast("long").as("y"))
    val grid = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
    val full = grid.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
      .localCheckpoint(eager = false) // both lag-join sides
    val lagged = full.as("t")
      .join(full.select((col("day") + 1).as("day"),
          col("y").as("u"), col("x").as("v")), Seq("day"))
      .select(col("y"), col("u"), col("v"))
    lagged.agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("u")).cast("long").as("su"), sum(col("v")).cast("long").as("sv"),
        sum(col("y")).cast("long").as("sy"),
        sum(expr("CAST(u AS DECIMAL(38,0)) * u")).as("suu"),
        sum(expr("CAST(u AS DECIMAL(38,0)) * v")).as("suv"),
        sum(expr("CAST(u AS DECIMAL(38,0)) * y")).as("suy"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("svv"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * y")).as("svy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .withColumn("cuu", expr("n * suu - CAST(su AS DECIMAL(38,0)) * su"))
      .withColumn("cuv", expr("n * suv - CAST(su AS DECIMAL(38,0)) * sv"))
      .withColumn("cuy", expr("n * suy - CAST(su AS DECIMAL(38,0)) * sy"))
      .withColumn("cvv", expr("n * svv - CAST(sv AS DECIMAL(38,0)) * sv"))
      .withColumn("cvy", expr("n * svy - CAST(sv AS DECIMAL(38,0)) * sy"))
      .withColumn("cyy", expr("n * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      // overflow-bound: |C··| <= n²·d² with n = 30-day span and d = max daily count; the Cramer terms below are <= 2·(n²d²)³ = 2n⁶d⁶ — inside DECIMAL(38) for d < 6·10⁴/day (≈ sf2 here); past that pre-scale counts to thousands. The ×10⁶ carries stage as (A div B)·10⁶ + ((A mod B)·10⁶) div B so no intermediate exceeds max(A, B·10⁶).
      .withColumn("det", expr("cuu * cvv - CAST(cuv AS DECIMAL(38,0)) * cuv"))
      .withColumn("d1", expr("cuy * cvv - CAST(cvy AS DECIMAL(38,0)) * cuv"))
      .withColumn("d2", expr("cuu * cvy - CAST(cuv AS DECIMAL(38,0)) * cuy"))
      .withColumn("nf", expr("d1 * cuy + CAST(d2 AS DECIMAL(38,0)) * cvy"))
      .withColumn("df", expr("det * cyy"))
      .withColumn("ar", expr("CAST(cuy AS DECIMAL(38,0)) * cuy"))
      .withColumn("br", expr("cuu * cyy"))
      .select(col("n").as("n_days"),
        when(col("br") > 0, expr(
          "CAST((ar div br) * 1000000 + ((ar % br) * 1000000) div br AS BIGINT)"))
          .otherwise(0L).as("r2_restr_x1e6"),
        when(col("df") > 0, expr(
          "CAST((nf div df) * 1000000 + ((nf % df) * 1000000) div df AS BIGINT)"))
          .otherwise(0L).as("r2_full_x1e6"))
      .withColumn("gain_x1e6", col("r2_full_x1e6") - col("r2_restr_x1e6"))
  }

  /** Pairwise correlation NUMERATORS across the three daily event-count
    * series (click/view/purchase) — the q_xcorr convention generalized
    * to the 3×3 matrix's upper triangle: per pair n, the covariance
    * numerator n·Σxy − Σx·Σy (sign/magnitude carrier), both variance
    * numerators, and the sign — no sqrt or division ever runs, so every
    * cell is exact BIGINT-in-DECIMAL at any scale. One event scan to
    * the day domain, one 1-row aggregate, a 3-row stack.
    */
  def qCorrMatrix(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(expr("ts_us div 86400000000").as("day"), col("event_type"))
    val daily = ev.groupBy(col("day")).agg(
      sum(when(col("event_type") === "click", 1L).otherwise(0L)).cast("long").as("c"),
      sum(when(col("event_type") === "view", 1L).otherwise(0L)).cast("long").as("v"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).cast("long").as("p"))
    val grid = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
    val f = grid.join(daily, Seq("day"), "left")
      .select(coalesce(col("c"), lit(0L)).as("c"),
        coalesce(col("v"), lit(0L)).as("v"), coalesce(col("p"), lit(0L)).as("p"))
    // overflow-bound: daily counts < 10^9 over a bounded span keep every n·Σxy and Σx·Σy under 10^22 — inside DECIMAL(38) with 16 digits to spare.
    val sums = f.agg(count(lit(1)).cast("long").as("n"),
      sum(col("c")).cast("long").as("sc"), sum(col("v")).cast("long").as("sv"),
      sum(col("p")).cast("long").as("sp"),
      sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("scc"),
      sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("svv"),
      sum(expr("CAST(p AS DECIMAL(38,0)) * p")).as("spp"),
      sum(expr("CAST(c AS DECIMAL(38,0)) * v")).as("scv"),
      sum(expr("CAST(c AS DECIMAL(38,0)) * p")).as("scp"),
      sum(expr("CAST(v AS DECIMAL(38,0)) * p")).as("svp"))
    sums.select(expr(
        """stack(3,
          |  'click', 'view',
          |    CAST(n * scv - CAST(sc AS DECIMAL(38,0)) * sv AS BIGINT),
          |    CAST(n * scc - CAST(sc AS DECIMAL(38,0)) * sc AS BIGINT),
          |    CAST(n * svv - CAST(sv AS DECIMAL(38,0)) * sv AS BIGINT),
          |  'click', 'purchase',
          |    CAST(n * scp - CAST(sc AS DECIMAL(38,0)) * sp AS BIGINT),
          |    CAST(n * scc - CAST(sc AS DECIMAL(38,0)) * sc AS BIGINT),
          |    CAST(n * spp - CAST(sp AS DECIMAL(38,0)) * sp AS BIGINT),
          |  'view', 'purchase',
          |    CAST(n * svp - CAST(sv AS DECIMAL(38,0)) * sp AS BIGINT),
          |    CAST(n * svv - CAST(sv AS DECIMAL(38,0)) * sv AS BIGINT),
          |    CAST(n * spp - CAST(sp AS DECIMAL(38,0)) * sp AS BIGINT)
          |) AS (series_a, series_b, cov_num, var_a_num, var_b_num)""".stripMargin),
        col("n").as("n_days"))
      .select(col("series_a"), col("series_b"), col("n_days"),
        col("cov_num"), col("var_a_num"), col("var_b_num"),
        expr("CAST(sign(cov_num) AS INT)").as("corr_sign"))
      .orderBy(col("series_a"), col("series_b"))
  }

  def qXcorr(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(expr("ts_us div 86400000000").as("day"), col("event_type"))
    val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span.select(explode(expr("sequence(d0, d1)")).as("day"))
    def daily(t: String) = ev.filter(col("event_type") === t)
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
    val a = grid.join(daily("click"), Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("x"))
    val b = grid.join(daily("purchase"), Seq("day"), "left")
      .select(col("day").as("bday"), coalesce(col("n"), lit(0L)).as("y"))
    a.withColumn("lag", explode(typedlit((-3 to 3).toList)))
      .join(b, col("bday") === col("day") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).cast("long").as("sum_x"),
        sum(col("y")).cast("long").as("sum_y"),
        sum(col("x") * col("y")).cast("long").as("sum_xy"))
      .withColumn("cov_num",
        expr("CAST(n_days * sum_xy - sum_x * sum_y AS BIGINT)"))
      .orderBy(col("lag"))
  }

  /** DAU / rolling-30-day MAU / stickiness — the canonical "distinct
    * over a sliding window" metric, solved without any per-window
    * distinct recount: each user's active days merge into coverage
    * islands (gap > 29 breaks), every island contributes +1 at its
    * start day and −1 after its end+29 horizon, and MAU(day) is the
    * running sum of those boundary deltas — the sweep-line that turns
    * an O(days·users) rolling distinct into one user-partitioned
    * window pass plus a day-domain cumulative sum. DAU is the
    * (user, day)-distinct count per day; stickiness = DAU·10⁴ div MAU.
    * Scale: the event log collapses to distinct (user, day) narrow
    * rows map-side; everything after runs on per-user active days and
    * the day domain (the only single-partition window is over DAYS).
    */
  def qDauMau(s: SparkSession, d: String): DataFrame = {
    val ud = EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct()
    val wU = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val islands = ud
      .withColumn("brk",
        when(lag(col("day"), 1).over(wU).isNull ||
          col("day") - lag(col("day"), 1).over(wU) > 29, 1L).otherwise(0L))
      .withColumn("isl", sum(col("brk")).over(wU.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("isl"))
      .agg(min(col("day")).as("start"), (max(col("day")) + lit(29L)).as("end29"))
    val deltas = islands.select(col("start").as("day"), lit(1L).as("delta"))
      .unionByName(islands.select((col("end29") + 1).as("day"), lit(-1L).as("delta")))
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val merged = deltas
      .unionByName(dau.select(col("day"), lit(0L).as("delta")))
      .groupBy(col("day")).agg(sum(col("delta")).as("delta"))
    val wD = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    merged
      .withColumn("mau30", sum(col("delta")).over(wD).cast("long"))
      .join(dau, Seq("day"))
      .select(col("day"), col("dau"), col("mau30"))
      .withColumn("stickiness_x1e4", expr("(dau * 10000) div mau30"))
      .orderBy(col("day"))
  }

  /** Gap-fill with last-observation-carried-forward — the time-series
    * repair primitive [[Relational.qGapFill]]'s zero-fill can't express:
    * per user-bucket (user_id mod 16), the daily purchase-cents series
    * on the full day grid, with missing days carried forward from the
    * bucket's previous observed day (`last(_, ignoreNulls)` over the
    * trailing frame — Spark's IGNORE NULLS window, matched by DuckDB's
    * `last_value(x IGNORE NULLS)`). Days before a bucket's first
    * observation stay NULL in both engines. Scale shape: the event log
    * collapses to (bucket, day) partial aggregates map-side; the grid is
    * |buckets|×|days| (tiny); the only window is per-bucket over days —
    * partitioned, no global sort.
    */
  def qLocf(s: SparkSession, d: String): DataFrame = {
    val ev = purchaseCents(s, d)
      .select(col("day"), expr("user_id % 16").as("bucket"), col("cents"))
    val daily = ev.groupBy(col("bucket"), col("day"))
      .agg(sum(col("cents")).cast("long").as("cents_raw"))
    val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span.select(explode(expr("sequence(d0, d1)")).as("day"))
      .crossJoin(s.range(16).select(col("id").as("bucket")))
    val w = Window.partitionBy(col("bucket")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(daily, Seq("bucket", "day"), "left")
      .withColumn("cents_locf", last(col("cents_raw"), ignoreNulls = true).over(w))
      .withColumn("filled", expr(
        "CAST(CASE WHEN cents_raw IS NULL AND cents_locf IS NOT NULL THEN 1 ELSE 0 END AS INT)"))
      .select(col("bucket"), col("day"), col("cents_raw"), col("cents_locf"), col("filled"))
      .orderBy(col("bucket"), col("day"))
  }

  /** The two daily series the rank-correlation family compares — click
    * COUNT (x) and purchase CENTS (y) — zero-filled on the full
    * [min, max] day grid (gap-fill discipline; a day with no events of
    * either type is a genuine (0, 0) observation). One event-scan
    * groupBy with conditional aggregates builds both columns; the grid
    * join is day-domain-sized. SQL twin: [[dailyXySql]].
    */
  private def dailyXy(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(expr("ts_us div 86400000000").as("day"), col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val daily = ev.groupBy(col("day")).agg(
      sum(when(col("event_type") === "click", 1L).otherwise(0L)).cast("long").as("xr"),
      sum(when(col("event_type") === "purchase", col("cents")).otherwise(0L))
        .cast("long").as("yr"))
    val grid = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
    grid.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("xr"), lit(0L)).as("x"),
        coalesce(col("yr"), lit(0L)).as("y"))
  }

  private val dailyXySql: String =
    """SELECT g.day, COALESCE(d.xr, 0) AS x, COALESCE(d.yr, 0) AS y
      |FROM (SELECT unnest(range(
      |        (SELECT min(epoch_us(ts) // 86400000000) FROM events),
      |        (SELECT max(epoch_us(ts) // 86400000000) FROM events) + 1)) AS day) g
      |LEFT JOIN (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS xr,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |             THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS yr
      |  FROM events GROUP BY 1) d ON d.day = g.day""".stripMargin

  /** Spearman rank correlation between the daily click-count and daily
    * purchase-revenue series — "do the SHAPES of the two series move
    * together", robust to outliers where Pearson is not. Integer-exact
    * to the last tie: the tie-averaged rank ×2 is the BIGINT
    * 2·rank_first + cnt − 1 (the [[qMannWhitney]] staging), so the
    * centered moments S_xx/S_yy/S_xy (all ×4-scaled) are exact BIGINTs;
    * ρ·10⁶ divides |S_xy| by the PRODUCT of the two floored integer
    * sqrts (each argument ~n⁴/3 stays far under 2⁵³ because n is the
    * DAY domain — the sqrt is exact whatever the corpus size), with
    * |ρ| and sign split because div/​// disagree on negatives. Scale:
    * one fact-scan groupBy, then everything runs on the day domain —
    * the two rank windows included.
    */
  def qSpearman(s: SparkSession, d: String): DataFrame = {
    val xy = dailyXy(s, d)
    // tie-averaged rank ×2 = 2·rank() + count(same value) − 1: rank()
    // is the first rank of the tie group, so this is rank_first +
    // rank_last — both windows run over the day domain only
    val r2 = xy
      .withColumn("rx2", (rank().over(Window.orderBy(col("x"))) * 2
        + count(lit(1)).over(Window.partitionBy(col("x"))) - 1).cast("long"))
      .withColumn("ry2", (rank().over(Window.orderBy(col("y"))) * 2
        + count(lit(1)).over(Window.partitionBy(col("y"))) - 1).cast("long"))
    r2.agg(count(lit(1)).cast("long").as("n"),
        sum(col("rx2")).cast("long").as("sx"),
        sum(col("ry2")).cast("long").as("sy"),
        sum(col("rx2") * col("rx2")).cast("long").as("sxx"),
        sum(col("ry2") * col("ry2")).cast("long").as("syy"),
        sum(col("rx2") * col("ry2")).cast("long").as("sxy"))
      .withColumn("s_xy", expr("n * sxy - sx * sy"))
      .withColumn("s_xx", expr("n * sxx - sx * sx"))
      .withColumn("s_yy", expr("n * syy - sy * sy"))
      // overflow-bound: rx2, ry2 <= 2n over the DAY domain, so
      // |s_xy| <= 4n^3 and |s_xy|*1e6 <= 4e6*n^3 — inside DECIMAL(38)
      // below n ~ 3e10 days; the sqrt factors are each < 2^31.5 so
      // their LONG product cannot overflow.
      .withColumn("rho_abs_x1e6", expr(
        """CAST(CAST(abs(s_xy) AS DECIMAL(38,0)) * 1000000
          |  div (CAST(floor(sqrt(CAST(s_xx AS DOUBLE))) AS BIGINT)
          |     * CAST(floor(sqrt(CAST(s_yy AS DOUBLE))) AS BIGINT)) AS BIGINT)""".stripMargin))
      .withColumn("rho_sign", expr(
        "CAST(CASE WHEN s_xy < 0 THEN -1 WHEN s_xy > 0 THEN 1 ELSE 0 END AS INT)"))
      .select(col("n"), col("s_xy"), col("s_xx"), col("s_yy"),
        col("rho_abs_x1e6"), col("rho_sign"))
  }

  /** Kendall's τ-b between the same two daily series — the
    * concordant/discordant-pair member of the rank-correlation family
    * (Spearman measures monotone AGREEMENT of ranks; Kendall counts
    * pairwise ORDER inversions, with the τ-b tie correction). The
    * pairwise i<j join runs over the DAY domain (day²/2 pairs —
    * corpus-size-free, the [[qTheilSen]] discipline); C, D, and the
    * tie-corrected denominator pieces n₀−n₁, n₀−n₂ are exact BIGINTs,
    * their product stays far under 2⁵³ (≈n⁴/4), so one floored exact
    * sqrt gives τ·10⁶ with |τ| and sign split.
    */
  def qKendall(s: SparkSession, d: String): DataFrame = {
    val xy = dailyXy(s, d)
    val a = xy.select(col("day").as("di"), col("x").as("xi"), col("y").as("yi"))
    val b = xy.select(col("day").as("dj"), col("x").as("xj"), col("y").as("yj"))
    a.join(b, col("di") < col("dj"))
      .agg(count(lit(1)).cast("long").as("n0"),
        sum(when((col("xi") < col("xj") && col("yi") < col("yj")) ||
                 (col("xi") > col("xj") && col("yi") > col("yj")), 1L)
          .otherwise(0L)).cast("long").as("c"),
        sum(when((col("xi") < col("xj") && col("yi") > col("yj")) ||
                 (col("xi") > col("xj") && col("yi") < col("yj")), 1L)
          .otherwise(0L)).cast("long").as("d"),
        sum(when(col("xi") === col("xj"), 1L).otherwise(0L)).cast("long").as("n1"),
        sum(when(col("yi") === col("yj"), 1L).otherwise(0L)).cast("long").as("n2"))
      .withColumn("tau_abs_x1e6", expr(
        """abs(c - d) * 1000000
          |  div CAST(floor(sqrt(CAST((n0 - n1) * (n0 - n2) AS DOUBLE))) AS BIGINT)""".stripMargin))
      .withColumn("tau_sign", expr(
        "CAST(CASE WHEN c < d THEN -1 WHEN c > d THEN 1 ELSE 0 END AS INT)"))
      .select(col("n0"), col("c"), col("d"), col("n1"), col("n2"),
        col("tau_abs_x1e6"), col("tau_sign"))
  }

  /** Autocorrelation function of daily purchase revenue at lags 1–7 —
    * "does yesterday predict today" (weekly seasonality shows up as a
    * lag-7 peak). Per lag, exact Pearson over the overlapping day
    * pairs: the series is daily DOLLARS (cents div 100 at day grain —
    * keeps S_xx ≈ n²·var(x) inside 2⁵³ through ~sf1 so the sqrt stays
    * exact; headroom documented), moments are BIGINT, S_xy·10⁶ stages
    * through DECIMAL(38,0), and |r| and sign split as usual. Scale:
    * after the one fact-scan groupBy everything — the 7-lag explode
    * included — runs on the day domain, exactly like [[qXcorr]].
    */
  def qAutocorr(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCents(s, d)
      .select(col("day"), expr("cents div 100").as("x"))
    val b = daily.select(col("day").as("bday"), col("x").as("y"))
    daily.withColumn("lag", explode(typedlit((1L to 7L).toList)))
      .join(b, col("bday") === col("day") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("y")).cast("long").as("sy"),
        sum(col("x") * col("x")).cast("long").as("sxx"),
        sum(col("y") * col("y")).cast("long").as("syy"),
        sum(col("x") * col("y")).cast("long").as("sxy"))
      .withColumn("s_xy", expr("n * sxy - sx * sy"))
      .withColumn("s_xx", expr("n * sxx - sx * sx"))
      .withColumn("s_yy", expr("n * syy - sy * sy"))
      // overflow-bound: x, y are daily counts < 1e12 at 100 TB and n is
      // the DAY domain, so |s_xy| <= n*sxy < 1e4*1e24 = 1e28 and
      // |s_xy|*1e6 < 1e34 — inside DECIMAL(38); the sqrt factors are
      // each < sqrt(9.2e18) so their LONG product cannot overflow.
      .withColumn("r_abs_x1e6", expr(
        """CAST(CAST(abs(s_xy) AS DECIMAL(38,0)) * 1000000
          |  div (CAST(floor(sqrt(CAST(s_xx AS DOUBLE))) AS BIGINT)
          |     * CAST(floor(sqrt(CAST(s_yy AS DOUBLE))) AS BIGINT)) AS BIGINT)""".stripMargin))
      .withColumn("r_sign", expr(
        "CAST(CASE WHEN s_xy < 0 THEN -1 WHEN s_xy > 0 THEN 1 ELSE 0 END AS INT)"))
      .select(col("lag"), col("n"), col("s_xy"), col("r_abs_x1e6"), col("r_sign"))
      .orderBy(col("lag"))
  }

  /** Week-over-week revenue growth per event type — the reporting
    * query behind every "vs last week" dashboard tile: weekly cents
    * per type (week = epoch-day div 7 — pure integer arithmetic, no
    * calendar function), previous week by lag over the per-type
    * window, growth ×10⁴ emitted as |Δ|·10⁴ div prev with the sign
    * split (div//​ negative disagreement). First weeks emit NULL
    * growth. The window runs over the (type × week) grid only.
    */
  def qWowGrowth(s: SparkSession, d: String): DataFrame = {
    val weekly = EventStreams.normalize(Tables.events(s, d))
      .groupBy(col("event_type"),
        expr("(ts_us div 86400000000) div 7").as("week"))
      .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
        .cast("long").as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("week"))
    weekly
      .withColumn("prev", lag(col("cents"), 1).over(w))
      .withColumn("delta", col("cents") - col("prev"))
      // weekly-cents × 1e4 passes int64 at cluster scale — DECIMAL-staged
      .withColumn("growth_abs_x1e4", expr(
        "CAST(CAST(abs(delta) AS DECIMAL(38,0)) * 10000 div prev AS BIGINT)"))
      .withColumn("growth_sign", expr(
        "CAST(CASE WHEN delta < 0 THEN -1 WHEN delta > 0 THEN 1 ELSE 0 END AS INT)"))
      .select(col("event_type"), col("week"), col("cents"), col("prev"),
        col("delta"), col("growth_abs_x1e4"), col("growth_sign"))
      .orderBy(col("event_type"), col("week"))
  }

  /** Seasonal-naive forecast backtest — the baseline every forecasting
    * system must beat, with its evaluation loop run exactly:
    * fc(type, day) = count(type, day−7) on the zero-filled
    * (type × day) grid, scored over all days with a forecast as
    * WAPE ×10⁴ (Σ|err| div Σactual — total-volume-weighted) and
    * MAPE ×10⁴ over actual>0 days (each day's |err|·10⁴ div actual
    * floored BEFORE the mean, so both engines agree term by term).
    * One event-scan groupBy; the lag-7 is a per-type window over the
    * day grid; the scorecard is |types| rows.
    */
  def qForecastNaive(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(expr("ts_us div 86400000000").as("day"), col("event_type"))
    val daily = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val types = ev.select(col("event_type")).distinct()
    val grid = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
      .crossJoin(types)
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    grid.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), coalesce(col("n"), lit(0L)).as("actual"))
      .withColumn("fc", lag(col("actual"), 7).over(w))
      .filter(col("fc").isNotNull)
      .withColumn("abs_err", abs(col("actual") - col("fc")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("actual")).cast("long").as("total_actual"),
        sum(col("abs_err")).cast("long").as("total_abs_err"),
        sum(when(col("actual") > 0, expr("(abs_err * 10000) div actual"))
          .otherwise(0L)).cast("long").as("mape_num"),
        sum(when(col("actual") > 0, 1L).otherwise(0L)).cast("long").as("n_scored"))
      .withColumn("wape_x1e4", expr("(total_abs_err * 10000) div total_actual"))
      .withColumn("mape_x1e4", expr("mape_num div n_scored"))
      .select(col("event_type"), col("n_days"), col("total_actual"),
        col("total_abs_err"), col("wape_x1e4"), col("n_scored"), col("mape_x1e4"))
      .orderBy(col("event_type"))
  }

  /** Bollinger bands on daily purchase revenue — the rolling-moment
    * member of the monitoring family ([[qControlChart]] uses the
    * GLOBAL mean; bands adapt to the trailing window): over the
    * trailing 20 days, mean ×100 and the population sd as one floored
    * IEEE sqrt of the exact integer (n·Σx² − (Σx)²)·10⁴ div n² — the
    * series is daily DOLLARS (cents div 100 at day grain) so the
    * staged variance stays far inside 2⁵³ through ~sf10 (headroom
    * documented). Bands = mean ± 2·sd; breach flags emitted per day.
    * The window runs over the DAY domain only.
    */
  def qBollinger(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCents(s, d)
      .select(col("day"), expr("cents div 100").as("x"))
    val w = Window.orderBy(col("day")).rowsBetween(-19, 0)
    daily
      .withColumn("n_w", count(lit(1)).over(w).cast("long"))
      .withColumn("sx", sum(col("x")).over(w).cast("long"))
      .withColumn("sxx", sum(col("x") * col("x")).over(w).cast("long"))
      .withColumn("mean_x100", expr("(sx * 100) div n_w"))
      .withColumn("sd_x100", expr(
        "CAST(floor(sqrt(CAST((n_w * sxx - sx * sx) * 10000 div (n_w * n_w) AS DOUBLE))) AS BIGINT)"))
      .withColumn("upper_x100", expr("mean_x100 + 2 * sd_x100"))
      .withColumn("lower_x100", expr("mean_x100 - 2 * sd_x100"))
      .withColumn("breach", expr(
        """CAST(CASE WHEN x * 100 > mean_x100 + 2 * sd_x100 THEN 1
          |          WHEN x * 100 < mean_x100 - 2 * sd_x100 THEN -1
          |          ELSE 0 END AS INT)""".stripMargin))
      .select(col("day"), col("x"), col("n_w"), col("mean_x100"), col("sd_x100"),
        col("upper_x100"), col("lower_x100"), col("breach"))
      .orderBy(col("day"))
  }

  /** Event-sequence pattern matching — the MATCH_RECOGNIZE /
    * complex-event-processing analog built from composable pieces:
    * each user's time-ordered event stream renders to a compact
    * initial-letter string (c/v/p/s/e, first 40 events), and a pinned
    * pattern table of regexes from the RE2 ∩ java.util.regex COMMON
    * SUBSET (literals, classes, ., *, + — the txt_pii_scrub
    * discipline, so both engines match identically) is evaluated per
    * user: "view…click…purchase", "starts with signup", "two adjacent
    * clicks", "view-only funnel to purchase", "three errors". One
    * user_id shuffle builds every sequence; the 5 regexes run in ONE
    * conditional-aggregate pass (stack unpivots the counts); output is
    * |patterns| rows. At 100 TB the sequence strings are bounded (40
    * chars) and the scan is embarrassingly parallel.
    */
  def qEventRegex(s: SparkSession, d: String): DataFrame = {
    val pats = Seq("v.*c.*p", "^s", "cc", "v[vc]*p", "e.*e.*e")
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ini"))
    // cap BEFORE the collect: the row_number window and the groupBy share
    // one user_id exchange, so no user ever ships more than 40 events into
    // the sequence build — unbounded per-user histories stay bounded state
    val wU = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val seqs = ev
      .withColumn("rn", row_number().over(wU))
      .filter(col("rn") <= 40)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts_us"), col("event_id"),
        col("ini")))).as("evs"))
      .select(expr("substring(array_join(transform(evs, e -> e.ini), ''), 1, 40)")
        .as("seq"))
    val counts = seqs.agg(
      count(lit(1)).cast("long").as("n_users"),
      pats.zipWithIndex.map { case (p, k) =>
        sum(when(col("seq").rlike(p), 1L).otherwise(0L)).cast("long").as(s"p$k")
      }: _*)
    val stackArgs = pats.zipWithIndex
      .map { case (p, k) => s"'$p', p$k" }.mkString(", ")
    counts
      .select(col("n_users"),
        expr(s"stack(${pats.length}, $stackArgs) AS (pattern, n_matched)"))
      .select(col("pattern"), col("n_matched"), col("n_users"),
        expr("(n_matched * 1000000) div n_users").as("share_ppm"))
      .orderBy(col("pattern"))
  }

  /** Per-event purchase rows in exact cents with their day — the shared
    * base of the day-domain series family ([[qLocf]] / [[qRunsTest]] /
    * [[qRollingMedian]]); its SQL twin is [[purchaseCentsSql]].
    */
  private def purchaseCents(s: SparkSession, d: String): DataFrame =
    EventStreams.normalize(Tables.events(s, d))
      .filter(col("event_type") === "purchase")
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))

  /** Total daily purchase cents ([[purchaseCents]] rolled to days). */
  private def dailyCents(s: SparkSession, d: String): DataFrame =
    purchaseCents(s, d).groupBy(col("day"))
      .agg(sum(col("cents")).cast("long").as("cents"))

  /** Wald–Wolfowitz runs test for randomness of the daily purchase-
    * revenue series around its median — the fourth member of the exact
    * significance-test family ([[qTtest]]/[[qKsTest]]/[[qMannWhitney]]):
    * days are signed +/− against the LOWER median (row_number pick, no
    * interpolation — deterministic in both engines), ties dropped, runs
    * counted as 1 + sign changes. μ and σ² of the run count under H₀
    * stay exact integers staged ×10⁶/×10¹² through DECIMAL(38,0), and
    * the only float op is the same correctly-rounded `sqrt`-of-integer
    * the t-test uses; |z| and sign emit separately (div vs `//` disagree
    * on negatives). Scale: everything after one event-scan groupBy runs
    * on the DAY domain.
    */
  def qRunsTest(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCents(s, d).withColumnRenamed("cents", "x")
    val nTot = daily.agg(count(lit(1)).as("n_days"))
    val med = daily
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
      .crossJoin(broadcast(nTot))
      .filter(col("rn") === expr("(n_days + 1) div 2"))
      .select(col("x").as("med"))
    val wD = Window.orderBy(col("day"))
    daily.crossJoin(broadcast(med))
      .filter(col("x") =!= col("med"))
      .select(col("day"), when(col("x") > col("med"), 1).otherwise(-1).as("sgn"))
      .withColumn("chg",
        when(lag(col("sgn"), 1).over(wD).isNull ||
          col("sgn") =!= lag(col("sgn"), 1).over(wD), 1L).otherwise(0L))
      .agg(
        sum(when(col("sgn") === 1, 1L).otherwise(0L)).cast("long").as("n1"),
        sum(when(col("sgn") === -1, 1L).otherwise(0L)).cast("long").as("n2"),
        sum(col("chg")).cast("long").as("n_runs"))
      .withColumn("mu_x1e6", expr("(2 * n1 * n2 * 1000000) div (n1 + n2) + 1000000"))
      .withColumn("var_x1e12", expr(
        // overflow-bound: n1 + n2 = distinct DAYS (<= 10^5), so 4 * n^4 * 1e12 < 10^33.
        """CAST(CAST(2 * n1 * n2 AS DECIMAL(38,0)) * (2 * n1 * n2 - n1 - n2) * 1000000000000
          |  div (CAST(n1 + n2 AS DECIMAL(38,0)) * (n1 + n2) * (n1 + n2 - 1)) AS BIGINT)""".stripMargin))
      .withColumn("sd_x1e6", expr("CAST(floor(sqrt(CAST(var_x1e12 AS DOUBLE))) AS BIGINT)"))
      .withColumn("z_abs_x1e3", expr("(abs(n_runs * 1000000 - mu_x1e6) * 1000) div sd_x1e6"))
      .withColumn("z_sign", expr(
        "CAST(CASE WHEN n_runs * 1000000 < mu_x1e6 THEN -1 WHEN n_runs * 1000000 > mu_x1e6 THEN 1 ELSE 0 END AS INT)"))
      .select(col("n1"), col("n2"), col("n_runs"), col("mu_x1e6"),
        col("var_x1e12"), col("sd_x1e6"), col("z_abs_x1e3"), col("z_sign"))
  }

  /** Trailing 7-day rolling LOWER median of daily purchase revenue —
    * the robust-baseline twin of [[qModeRolling]] (median resists the
    * spiky outliers a rolling mean chases): per day, the ⌈w/2⌉-th
    * smallest of the trailing window's daily cents (no interpolation —
    * exact BIGINT, deterministic in both engines) plus the signed
    * deviation of the day from its own baseline. Windowed
    * `collect_list` + `sort_array` + 1-based `element_at` on the Spark
    * side ≡ windowed `list` + `list_sort` + 1-based `[i]` in DuckDB.
    * Scale: the window runs over the DAY domain (fact scan collapses
    * map-side), and the per-row sort cost is the constant w·log w.
    */
  def qRollingMedian(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCents(s, d)
    val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
    daily
      .withColumn("wl", sort_array(collect_list(col("cents")).over(w)))
      .select(col("day"), col("cents"),
        expr("element_at(wl, CAST((size(wl) + 1) div 2 AS INT))").as("med7"),
        size(col("wl")).as("w_n"))
      .withColumn("dev", expr("cents - med7"))
      .orderBy(col("day"))
  }

  /** Discrete-time survival table for signup→first-purchase (the
    * Kaplan–Meier/Nelson–Aalen risk-set construction, public
    * statistics): per user, event time t = whole hours from first
    * signup to first subsequent purchase, censored at the corpus'
    * global max timestamp when no purchase follows. For every distinct
    * EVENT hour: the risk set n_risk = users whose exit (event or
    * censoring) is ≥ t, the event count d, the discrete hazard
    * d·10⁶ div n_risk, and the Nelson–Aalen cumulative hazard as the
    * running sum of the floored per-step terms (defined that way so
    * both engines agree exactly — no rational products, no floats).
    * Scale shape: the event log collapses to one row per user, exits
    * collapse to the distinct-hour domain, and the only ordered window
    * runs over HOURS; risk sets come from one cumulative sum, not a
    * per-time recount.
    */
  def qSurvival(s: SparkSession, d: String): DataFrame = {
    // ONE events scan: per-user conditional aggregates carry the first
    // signup, the sorted purchase timestamps, and the user's max ts in
    // a single groupBy; the global horizon is the max of per-user
    // maxes (every event has a user), and first-purchase-after-signup
    // is an array scan over the user's own purchases — no second
    // fact scan, no purchase-side join
    val perUser = EventStreams.normalize(Tables.events(s, d))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts_us"))).as("s_ts"),
        sort_array(collect_list(
          when(col("event_type") === "purchase", col("ts_us")))).as("plist"),
        max(col("ts_us")).as("u_max"))
      .localCheckpoint(eager = false)
    val horizon = perUser.agg(max(col("u_max")).as("h_ts"))
    val users = perUser.filter(col("s_ts").isNotNull)
      .crossJoin(broadcast(horizon))
      .select(col("user_id"), col("s_ts"), col("h_ts"),
        expr("array_min(filter(plist, x -> x >= s_ts))").as("p_ts"))
      .select(col("user_id"),
        when(col("p_ts").isNotNull,
          expr("(p_ts - s_ts) div 3600000000")).as("t_event"),
        expr("(h_ts - s_ts) div 3600000000").as("t_censor"))
      .select(col("user_id"),
        coalesce(col("t_event"), col("t_censor")).as("t_exit"),
        when(col("t_event").isNotNull, 1L).otherwise(0L).as("is_event"))
    val byExit = users.groupBy(col("t_exit"))
      .agg(count(lit(1)).as("n_exit"), sum(col("is_event")).cast("long").as("d"))
    val total = users.agg(count(lit(1)).as("n_total"))
    val wT = Window.orderBy(col("t_exit"))
    val run = byExit.crossJoin(broadcast(total))
      // exits strictly BEFORE t leave the risk set: trailing sum minus self
      .withColumn("left_before",
        coalesce(sum(col("n_exit")).over(wT.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk", col("n_total") - col("left_before"))
      .filter(col("d") > 0)
      .withColumn("hazard_x1e6", expr("(d * 1000000) div n_risk"))
    run
      .withColumn("cum_hazard_x1e6",
        sum(col("hazard_x1e6")).over(wT.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .select(col("t_exit").as("t_hours"), col("n_risk").cast("long").as("n_risk"),
        col("d"), col("hazard_x1e6"), col("cum_hazard_x1e6"))
      .orderBy(col("t_hours"))
  }

  /** Deterministic bootstrap of mean per-user spend — the distributed
    * resampling technique (Poisson/online bootstrap, public literature:
    * each replicate reweights every unit independently instead of
    * drawing with replacement, so one pass computes all replicates):
    * B = 32 replicates, weight w(u, b) = hash(u, b) mod 3 ∈ {0,1,2}
    * (mean 1 — the deterministic multinomial stand-in for Poisson(1),
    * same integer-hash convention as [[qAbLift]]'s arm split), and each
    * replicate's mean spend ×100 is an exact integer division. The
    * rank column orders replicate means, so percentile CIs read
    * directly off the output. Scale: B× blowup of the per-USER frame
    * (not the event log), partial-aggregated map-side.
    */
  def qBootstrap(s: SparkSession, d: String): DataFrame = {
    val pu = perUserArmCents(s, d).select(col("user_id"), col("cents"))
    pu.withColumn("b", explode(typedlit((0 until 32).toList)))
      .withColumn("w", expr("((user_id * 2654435761 + b * 2246822519) % 4294967296) % 3"))
      .groupBy(col("b"))
      .agg(sum(col("w")).cast("long").as("n_eff"),
        sum(expr("w * cents")).cast("long").as("w_cents"))
      .withColumn("mean_cents_x100", expr("(w_cents * 100) div n_eff"))
      .withColumn("rank",
        rank().over(Window.orderBy(col("mean_cents_x100"), col("b"))))
      .select(col("b"), col("n_eff"), col("w_cents"),
        col("mean_cents_x100"), col("rank"))
      .orderBy(col("b"))
  }

  /** Multi-touch attribution by channel (the marketing-analytics
    * counterpart of [[qFunnelWindow]], batch twin of
    * stream_attribution's pairing): every purchase credits the clicks
    * of the same user in the trailing 24 h — linearly (each click gets
    * 10⁶ div n integer credit), plus first-touch and last-touch counts
    * picked by row_number over (ts, event_id) so ties resolve
    * identically in both engines. Channel = props.k mod 8 (the
    * synthetic channel axis of the test corpus). Scale shape: the
    * click↔purchase pairing is the per-user interval join the funnel
    * family uses (candidates bounded by per-user activity × window);
    * the windows partition by purchase id; output is 8 rows.
    */
  def qAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalizeProps(Tables.events(s, d))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("c_ts"), col("event_id").as("c_eid"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT) % 8").as("channel"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("p_ts"), col("event_id").as("p_eid"))
    val pairs = clicks.join(purchases, Seq("user_id"))
      .filter(col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - lit(86400000000L))
    val wP = Window.partitionBy(col("p_eid"))
    val attributed = pairs
      .withColumn("n_c", count(lit(1)).over(wP))
      .withColumn("rn_f", row_number().over(wP.orderBy(col("c_ts"), col("c_eid"))))
      .withColumn("rn_l", row_number().over(wP.orderBy(col("c_ts").desc, col("c_eid").desc)))
    attributed.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(when(col("rn_f") === 1, 1L).otherwise(0L)).cast("long").as("n_first"),
        sum(when(col("rn_l") === 1, 1L).otherwise(0L)).cast("long").as("n_last"),
        sum(expr("1000000 div n_c")).cast("long").as("credit_x1e6"))
      .orderBy(col("channel"))
  }

  /** Truncated exponential moving average of daily event revenue —
    * the smoothing primitive of monitoring dashboards, made hash-exact
    * by construction: with α = 1/2 the EWMA weights are dyadic, so the
    * 8-term truncation s_t = Σ_{j=0..7} 2^(7−j)·rev_{t−j} over the
    * weights actually present is all-BIGINT (series head has fewer
    * terms; the denominator sums only present weights, exactly the
    * standard renormalized-head EWMA). Daily revenue in exact cents;
    * days = observed days per type (the lag runs over the type's own
    * series). Scale shape: the event log collapses to a (type × day)
    * grid in one partial-agg pass; the 8 lags share ONE window sort of
    * that tiny grid. Truncation-vs-infinite error is 2⁻⁸ of the tail,
    * below the ×100 emission grain.
    */
  def qEwma(s: SparkSession, d: String): DataFrame = {
    val daily = EventStreams.normalize(Tables.events(s, d))
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("rev_cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val terms = (0 to 7).map { j =>
      val l = if (j == 0) col("rev_cents") else lag(col("rev_cents"), j).over(w)
      (when(l.isNotNull, l * lit(1L << (7 - j))).otherwise(lit(0L)),
        when(l.isNotNull, lit(1L << (7 - j))).otherwise(lit(0L)))
    }
    daily
      .withColumn("num", terms.map(_._1).reduce(_ + _))
      .withColumn("den", terms.map(_._2).reduce(_ + _))
      .select(col("event_type"), col("day"), col("rev_cents"),
        expr("(num * 100) div den").as("ewma_cents_x100"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Time-weighted average of the event `value` per user — the TWAP /
    * time-in-state primitive (sensor means, position-weighted prices):
    * each event's value holds until the user's next event, so the mean
    * is Σ cents·dur_us div Σ dur_us over lead()-derived intervals (the
    * last event carries no duration — standard left-closed convention).
    * Exact integers: cents·dur_us stages through DECIMAL(38,0) (a year
    * of microseconds × large cents clears BIGINT only barely; the sum
    * is bounded by max_cents·timespan per user, but headroom is free),
    * final ×100 division emits BIGINT. ONE shuffle on user_id shared by
    * the lead window and the rollup; output is one row per user with
    * ≥ 2 events.
    */
  /** Audience overlap between event types — exact pairwise Jaccard of
    * the user sets behind click/view/purchase: the segmentation readout
    * ("do purchasers come from clickers?"). One user-grain pass builds
    * a 3-bit membership profile, one 8-row profile rollup closes all
    * three pairs — user ids cross ONE shuffle, never a pairwise join.
    */
  def qAudienceOverlap(s: SparkSession, d: String): DataFrame = {
    val prof = EventStreams.normalize(Tables.events(s, d))
      .filter(col("event_type").isin("click", "view", "purchase"))
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "click", 1L).otherwise(0L)).as("hc"),
        max(when(col("event_type") === "view", 1L).otherwise(0L)).as("hv"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("hp"))
    val counts = prof.agg(
      sum(col("hc")).cast("long").as("nc"), sum(col("hv")).cast("long").as("nv"),
      sum(col("hp")).cast("long").as("np"),
      sum(col("hc") * col("hv")).cast("long").as("icv"),
      sum(col("hc") * col("hp")).cast("long").as("icp"),
      sum(col("hv") * col("hp")).cast("long").as("ivp"))
    counts.select(expr(
        """stack(3,
          |  'click', 'view', icv, nc + nv - icv,
          |  'click', 'purchase', icp, nc + np - icp,
          |  'view', 'purchase', ivp, nv + np - ivp
          |) AS (type_a, type_b, n_both, n_union)""".stripMargin))
      .withColumn("jaccard_x1e6", expr("(n_both * 1000000) div n_union"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** 1-D earth mover's distance (Wasserstein-1) between the click and
    * purchase value distributions over $10 bins — the distribution-
    * shift statistic that, unlike q_ks_test's sup-norm, charges HOW FAR
    * mass moved, not just that it did. Exact in cross-multiplied
    * integers: EMD·(N_a·N_b) = Σ_bins |cumA·N_b − cumB·N_a| (both
    * empirical CDFs scaled to a common denominator), emitted ×10⁶ via
    * one carry-staged floor division; the bin grid is bounded by the
    * value domain, the cumsum is a bin-domain window.
    */
  def qEmd(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), expr("CAST(floor(value / 10) AS BIGINT)").as("bin"))
    val cells = ev.groupBy(col("bin")).agg(
      sum(when(col("event_type") === "click", 1L).otherwise(0L)).cast("long").as("a"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).cast("long").as("b"))
    val w = Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, 0)
    // the bin domain is |value range|/10 rows — a bounded-domain window,
    // not a fact-scale one
    val cum = cells
      .withColumn("ca", sum(col("a")).over(w))
      .withColumn("cb", sum(col("b")).over(w))
    val tot = cells.agg(sum(col("a")).cast("long").as("na"),
      sum(col("b")).cast("long").as("nb"))
    cum.crossJoin(broadcast(tot))
      // overflow-bound: |ca·nb − cb·na| <= na·nb < 10^18 for counts < 10^9 per side; the ×10⁶ carries stage as (num div den)·10⁶ + ((num mod den)·10⁶) div den.
      .agg(sum(expr("abs(CAST(ca AS DECIMAL(38,0)) * nb - CAST(cb AS DECIMAL(38,0)) * na)"))
          .as("num"),
        max(col("na")).as("na"), max(col("nb")).as("nb"),
        count(lit(1)).cast("long").as("n_bins"))
      .withColumn("den", expr("CAST(na AS DECIMAL(38,0)) * nb"))
      .select(col("na").as("n_click"), col("nb").as("n_purchase"), col("n_bins"),
        expr("CAST((num div den) * 1000000 + ((num % den) * 1000000) div den AS BIGINT)")
          .as("emd_bins_x1e6"))
  }

  def qTwap(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .withColumn("dur_us", lead(col("ts_us"), 1).over(w) - col("ts_us"))
      .filter(col("dur_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur_us")).cast("long").as("dur_us_total"),
        // overflow-bound: cd = sum(cents*dur_us) per user <= 1e9 cents
        // x 1e17 us (3000 years) = 1e26, and cd*100 = 1e28 — inside
        // DECIMAL(38) with 10 digits of headroom.
        sum(expr("CAST(cents AS DECIMAL(38,0)) * dur_us")).as("cd"))
      .select(col("user_id"), col("n_intervals"), col("dur_us_total"),
        expr("CAST(cd * 100 div dur_us_total AS BIGINT)").as("twap_cents_x100"))
      .orderBy(col("user_id"))
  }

  /** Day-of-week seasonal index of event revenue per type — the
    * seasonality decomposition a traffic/revenue dashboard runs:
    * index = mean(dow) / mean(overall) staged as the exact integer
    * (sum_dow·n_total·10⁶) div (n_dow·sum_total), DECIMAL(38,0)
    * headroom for the cross-product. The weekday is pure epoch-day
    * arithmetic — isodow = ((day+3) mod 7)+1 off 1970-01-01 being a
    * Thursday — so no calendar-function or timezone drift can split
    * the engines. One partial-agg pass to the (type × 7) grid; the
    * per-type marginals broadcast back. Output: 7 rows per type.
    */
  def qSeasonality(s: SparkSession, d: String): DataFrame = {
    val base = EventStreams.normalize(Tables.events(s, d))
      .select(col("event_type"),
        expr("((ts_us div 86400000000 + 3) % 7) + 1").as("dow"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val cells = base.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .localCheckpoint(false) // feeds both the grid and its own marginal
    val marg = cells.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_total"), sum(col("cents")).as("cents_total"))
    cells.join(broadcast(marg), Seq("event_type"))
      .select(col("event_type"), col("dow"), col("n"), col("cents"),
        // overflow-bound: cents <= cents_total and n <= n_total, numerator <= cents_total * n_total * 1e6 — inside DECIMAL(38) for cents_total * n_total < 10^32.
        expr("""CAST(CAST(cents AS DECIMAL(38,0)) * n_total * 1000000
                 div (CAST(n AS DECIMAL(38,0)) * cents_total) AS BIGINT)""")
          .as("idx_x1e6"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** Theil–Sen robust trend slope of daily purchase revenue — the
    * outlier-immune regression the monitoring family pairs with
    * [[qRunsTest]]/q_changepoint: the (lower) median of all pairwise
    * slopes ×1000, each slope floored exactly — Spark's truncating
    * `div` is converted to a true floor via pmod ((num − pmod(num,
    * den)) div den, den > 0), matching DuckDB's flooring `//`, so
    * negative slopes cannot split the engines. Scale shape: the event
    * log collapses to the bounded day domain (the calendar, not the
    * data), so the pairwise self-join is days², corpus-size-free; the
    * median runs over that same bounded set.
    */
  def qTheilSen(s: SparkSession, d: String): DataFrame = {
    val daily = EventStreams.normalize(Tables.events(s, d))
      .filter(col("event_type") === "purchase")
      .select(expr("ts_us div 86400000000").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      .localCheckpoint(false) // both sides of the pair join
    val a = daily.select(col("day").as("d1"), col("cents").as("c1"))
    val b = daily.select(col("day").as("d2"), col("cents").as("c2"))
    a.join(b, col("d1") < col("d2"))
      .select(expr("(c2 - c1) * 1000").as("num"), expr("d2 - d1").as("den"))
      .select(expr("(num - pmod(num, den)) div den").as("slope_x1e3"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("slope_x1e3")).as("min_slope_x1e3"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY slope_x1e3) AS BIGINT)")
          .as("med_slope_x1e3"),
        max(col("slope_x1e3")).as("max_slope_x1e3"))
  }

  /** Two-sided CUSUM drift detection over daily purchase revenue — the
    * change-ACCUMULATION monitor that catches slow drifts q_changepoint
    * and [[qControlChart]]'s point limits miss. The clamped recursion
    * S⁺_t = max(0, S⁺_{t−1} + y_t − k) is computed by its closed form
    * S⁺_t = P_t − min(0, min_{i≤t} P_i) over the prefix sums P of
    * (y − k) — turning the sequential recursion into two stock window
    * functions (running sum, running min), the trick that makes CUSUM
    * distributable at all. Slack k = sd/2, alarm h = 4·sd, sd the
    * exact-integer sample deviation of the daily series (one IEEE
    * sqrt, floored). Everything ×100 integer. The windows run over
    * the bounded day domain, never the event log.
    */
  def qCusum(s: SparkSession, d: String): DataFrame = {
    val daily = EventStreams.normalize(Tables.events(s, d))
      .filter(col("event_type") === "purchase")
      .select(expr("ts_us div 86400000000").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      .localCheckpoint(false) // stats reduce + series scan
    val stats = daily.agg(count(lit(1)).as("n"),
        sum(col("cents")).cast("long").as("tot"),
        // overflow-bound: daily cents < 10^12 so n*ssq <= n^2 * 10^24; * 1e4 inside DECIMAL(38) for n (days) < 10^5.
        sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("ssq"))
      .withColumn("mean_x100", expr("(tot * 100) div n"))
      .withColumn("sd_x100", expr(
        """CAST(floor(sqrt(CAST(
          |  (CAST(n AS DECIMAL(38,0)) * ssq - CAST(tot AS DECIMAL(38,0)) * tot) * 10000
          |    div (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS DOUBLE))) AS BIGINT)""".stripMargin))
      .select(col("mean_x100"), col("sd_x100"),
        expr("sd_x100 div 2").as("k_x100"), (col("sd_x100") * 4).as("h_x100"))
    val wRun = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    daily.crossJoin(broadcast(stats))
      .withColumn("y", expr("cents * 100 - mean_x100"))
      .withColumn("p_hi", sum(expr("y - k_x100")).over(wRun))
      .withColumn("p_lo", sum(expr("y + k_x100")).over(wRun))
      .withColumn("s_pos", col("p_hi") - least(min(col("p_hi")).over(wRun), lit(0L)))
      .withColumn("s_neg", greatest(max(col("p_lo")).over(wRun), lit(0L)) - col("p_lo"))
      .select(col("day"), col("cents"), col("s_pos"), col("s_neg"), col("h_x100"),
        (col("s_pos") > col("h_x100")).cast("int").as("alarm_hi"),
        (col("s_neg") > col("h_x100")).cast("int").as("alarm_lo"))
      .orderBy(col("day"))
  }

  /** c-chart control limits over daily event counts per type — the SPC
    * (statistical process control) monitor: center = mean daily count,
    * UCL/LCL = mean ± 3·√mean, all staged ×100 with the √ taken as one
    * IEEE sqrt of an integer < 2⁵³ (floored — bit-identical in both
    * engines, the [[qTtest]] convention). Output per type: series
    * length, the limits, and how many days breach high/low. One
    * partial-agg pass to the (type × day) grid; limits are a per-type
    * reduce; the breach count re-joins the grid broadcast.
    */
  def qControlChart(s: SparkSession, d: String): DataFrame = {
    val daily = EventStreams.normalize(Tables.events(s, d))
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // grid feeds limits and breach scan
    val lim = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("n")).cast("long").as("total"))
      .withColumn("mean_x100", expr("(total * 100) div n_days"))
      .withColumn("s_x100",
        expr("CAST(floor(sqrt(CAST(mean_x100 * 100 AS DOUBLE))) AS BIGINT)"))
      .withColumn("ucl_x100", expr("mean_x100 + 3 * s_x100"))
      .withColumn("lcl_x100", expr("greatest(mean_x100 - 3 * s_x100, CAST(0 AS BIGINT))"))
    daily.join(broadcast(lim), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n_days")).as("n_days"), max(col("mean_x100")).as("mean_x100"),
        max(col("ucl_x100")).as("ucl_x100"), max(col("lcl_x100")).as("lcl_x100"),
        sum(when(col("n") * 100 > col("ucl_x100"), 1L).otherwise(0L)).cast("long").as("n_out_hi"),
        sum(when(col("n") * 100 < col("lcl_x100"), 1L).otherwise(0L)).cast("long").as("n_out_lo"))
      .orderBy(col("event_type"))
  }

  /** SQL twin of [[purchaseCents]], shared by the three day-domain
    * the week grain used by the growth-accounting family. */
  private def userWeeks(s: SparkSession, d: String): DataFrame =
    EventStreams.normalize(Tables.events(s, d))
      .select(col("user_id"), expr("ts_us div 604800000000").as("wk"))
      .distinct()

  /** Weekly growth accounting over the event log — the product-analytics
    * identity every activation dashboard decomposes MAU into (public
    * "growth accounting" framework: active(w) = new + retained +
    * resurrected, with churned(w) = active(w−1) − retained(w)): per
    * week, users seen for the first time (new), active both weeks
    * (retained), returning after a gap (resurrected), and lost from the
    * prior week (churned), plus the quick ratio ×100 =
    * (new+resurrected)·100 div churned. Scale shape: ONE distinct over
    * (user, week) — fact-scale partial-agg — then every further stage
    * runs on the users×weeks activity grid (≤ |users|·|weeks|, and the
    * self-joins are co-partitioned on user_id). No window, no collect.
    */
  def qGrowthAccounting(s: SparkSession, d: String): DataFrame = {
    val uw = userWeeks(s, d).localCheckpoint(eager = false)
    val fw = uw.groupBy(col("user_id")).agg(min(col("wk")).as("first_wk"))
    val prev = uw.select(col("user_id"), (col("wk") + 1).as("wk"),
      lit(1).as("was_prev"))
    val status = uw.join(fw, Seq("user_id"))
      .join(prev, Seq("user_id", "wk"), "left")
      .select(col("wk"),
        when(col("wk") === col("first_wk"), 1L).otherwise(0L).as("is_new"),
        when(col("wk") =!= col("first_wk") && col("was_prev").isNotNull, 1L)
          .otherwise(0L).as("is_retained"),
        when(col("wk") =!= col("first_wk") && col("was_prev").isNull, 1L)
          .otherwise(0L).as("is_resurrected"))
      .groupBy(col("wk"))
      .agg(sum(col("is_new")).cast("long").as("n_new"),
        sum(col("is_retained")).cast("long").as("n_retained"),
        sum(col("is_resurrected")).cast("long").as("n_resurrected"))
    // churned at w = active in w−1 but not in w (bounded to observed weeks)
    val maxWk = uw.agg(max(col("wk")).as("max_wk"))
    val churned = uw.select(col("user_id"), (col("wk") + 1).as("wk"))
      .join(uw, Seq("user_id", "wk"), "left_anti")
      .crossJoin(broadcast(maxWk))
      .filter(col("wk") <= col("max_wk"))
      .groupBy(col("wk")).agg(count(lit(1)).as("n_churned"))
    status.join(churned, Seq("wk"), "left")
      .withColumn("n_churned", coalesce(col("n_churned"), lit(0L)))
      .select(col("wk"), col("n_new"), col("n_retained"),
        col("n_resurrected"), col("n_churned"),
        when(col("n_churned") > 0,
          expr("((n_new + n_resurrected) * 100) div n_churned"))
          .otherwise(lit(null).cast("long")).as("quick_ratio_x100"))
      .orderBy(col("wk"))
  }

  /** 14-day rolling Pearson correlation between the daily click-count
    * and purchase-revenue series — "are the two signals moving together
    * THIS fortnight" (the windowed companion of [[qSpearman]]'s global
    * rank test), emitted integer-exact as r²·10⁶ with the sign split:
    * over each trailing 14-day window, num = n·Σxy − Σx·Σy and the
    * centered sums of squares stay DECIMAL(38,0); Cauchy–Schwarz bounds
    * num² ≤ sxx·syy so the ×10⁶ quotient fits BIGINT; degenerate
    * (constant) windows emit 0. Scale: the event log collapses to the
    * DAY domain first — only that passes the single-partition ordered
    * window (range-partition the running sums at 100 TB).
    */
  def qRollingCorr(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("day")).rowsBetween(-13, 0)
    val minD = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    dailyXy(s, d)
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxx", sum(expr("CAST(x AS DECIMAL(38,0)) * x")).over(w))
      .withColumn("syy", sum(expr("CAST(y AS DECIMAL(38,0)) * y")).over(w))
      .withColumn("sxy", sum(expr("CAST(x AS DECIMAL(38,0)) * y")).over(w))
      .withColumn("rn", count(lit(1)).over(minD))
      .filter(col("rn") >= 14)
      // overflow-bound: full derivation in the COMMON-DOWNSCALE note
      // below — after sc every factor is <10⁹, every product ≤10²⁴,
      // and the one remaining LONG-quotient ceiling is ~$260B/day
      .withColumn("num", expr("n * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("sxx_c", expr("n * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("syy_c", expr("n * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      // COMMON-DOWNSCALE division (round 9, forced by the sf1 gate —
      // the r8 staged form's first quotient num² div sxx_c ≈ r²·syy_c
      // exceeds BIGINT once syy_c passes ~9·10^18, and Spark's `div`
      // returns LONG, so ANSI throws ARITHMETIC_OVERFLOW at sf1 daily
      // revenues): r² is SCALE-INVARIANT, so floor-divide num, sxx_c,
      // syy_c by one common sc = ⌈max/10⁹⌉ first — every factor drops
      // under 10⁹, the single-shot quotient (n2²·10⁶) div (sx2·sy2) is
      // ≤ ~4·10⁶ by Cauchy-Schwarz (num² ≤ sxx·syy), and both engines
      // mirror the identical floors. sc = 1 at small SFs, where
      // ⌊⌊A/B⌋/C⌋ = ⌊A/(BC)⌋ makes this bit-identical to the r8 form;
      // past that the readout is r² of the downscaled sums (relative
      // error O(10⁻⁹)). overflow-bound: downstream of sc every div
      // result is ≤ 4·10⁶ and every product ≤ 10²⁴; the sc computation
      // ITSELF is the remaining ceiling — IntegralDivide returns LONG,
      // so greatest(|num|, sxx_c, syy_c) must stay ≤ ~9.2e27 (quotient
      // ≤ LONG_MAX). That is syy = Σy² over 14 days ≤ 6.6e26, i.e.
      // global daily revenue ~2.6e13 cents ≈ $260B/day — two orders
      // past world GDP/day, so the r9 fix moved the ceiling from the
      // sf1-reachable 9.2e18 to a physically unreachable bound rather
      // than to infinity (ADVICE r9: a computed common divisor cannot
      // jump DECIMAL(38)→LONG in one step by construction).
      .withColumn("sc",
        expr("greatest(abs(num), greatest(sxx_c, syy_c)) div 1000000000 + 1"))
      .withColumn("n2", expr("abs(num) div sc"))
      .withColumn("sx2", expr("sxx_c div sc"))
      .withColumn("sy2", expr("syy_c div sc"))
      .select(col("day"), col("x"), col("y"),
        when(col("sx2") > 0 && col("sy2") > 0, expr(
          """CAST((CAST(n2 AS DECIMAL(38,0)) * n2 * 1000000)
            |  div (CAST(sx2 AS DECIMAL(38,0)) * sy2) AS BIGINT)""".stripMargin))
          .otherwise(0L).as("r2_x1e6"),
        expr("CAST(sign(num) AS INT)").as("r_sign"))
      .orderBy(col("day"))
  }

  /** Brown's double exponential smoothing (α = 1/2, truncated 8-term
    * kernel — the [[qEwma]] convention applied twice) of daily revenue
    * per event type: S₁ = ewma(y), S₂ = ewma(S₁), level = 2·S₁ − S₂,
    * trend = S₁ − S₂ (exact for α = 1/2 where α/(1−α) = 1), and the
    * one-step forecast level + trend — the trend-aware upgrade of
    * [[qForecastNaive]], all in BIGINT cents·×100 (each smoothing stage
    * floors one integer division, a DEFINED part of the operator).
    * Both window passes share the one (type, day) partition — a single
    * day-domain shuffle after the fact-scale rollup.
    */
  def qHolt(s: SparkSession, d: String): DataFrame = {
    val daily = EventStreams.normalize(Tables.events(s, d))
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("rev_cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    // truncated α=1/2 kernel over column c: (num, den) window sums
    def kernel(c: Column): (Column, Column) = {
      val terms = (0 to 7).map { j =>
        val l = if (j == 0) c else lag(c, j).over(w)
        (when(l.isNotNull, l * lit(1L << (7 - j))).otherwise(lit(0L)),
          when(l.isNotNull, lit(1L << (7 - j))).otherwise(lit(0L)))
      }
      (terms.map(_._1).reduce(_ + _), terms.map(_._2).reduce(_ + _))
    }
    val (n1, d1) = kernel(col("rev_cents"))
    val withS1 = daily
      .withColumn("n1", n1).withColumn("d1", d1)
      .withColumn("s1_x100", expr("(n1 * 100) div d1"))
    val (n2, d2) = kernel(col("s1_x100"))
    withS1
      .withColumn("n2", n2).withColumn("d2", d2)
      .withColumn("s2_x100", expr("n2 div d2"))
      .select(col("event_type"), col("day"), col("rev_cents"),
        col("s1_x100"), col("s2_x100"),
        expr("2 * s1_x100 - s2_x100").as("level_x100"),
        expr("s1_x100 - s2_x100").as("trend_x100"),
        expr("3 * s1_x100 - 2 * s2_x100").as("forecast_x100"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Day-of-week seasonal anomaly screen over daily purchase revenue —
    * the "is Tuesday unusually low FOR A TUESDAY" monitor: residual =
    * cents − lower-median(same weekday), flagged when |residual| exceeds
    * 3× the lower-median of all |residuals| (MAD), every statistic an
    * exact integer via the row_number lower-median pick ([[qRunsTest]]'s
    * convention — no interpolation, deterministic in both engines).
    * |resid| and sign split per the signed-metric rule. Scale: the
    * event scan collapses to the DAY domain; medians run on ≤7-row
    * partitions and the 30-row day set.
    */
  def qAnomalyDow(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCents(s, d)
      .withColumn("dow", expr("((day + 3) % 7) + 1"))
    val wd = Window.partitionBy(col("dow")).orderBy(col("cents"), col("day"))
    val med = daily
      .withColumn("rn", row_number().over(wd))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("dow"))))
      .filter(expr("rn = (cnt + 1) div 2"))
      .select(col("dow"), col("cents").as("med_cents"))
    val resid = daily.join(med, Seq("dow"))
      .withColumn("resid_abs", abs(col("cents") - col("med_cents")))
      .withColumn("resid_sign",
        expr("CAST(sign(cents - med_cents) AS INT)"))
    val wm = Window.orderBy(col("resid_abs"), col("day"))
    val mad = resid
      .withColumn("rn", row_number().over(wm))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
      .filter(expr("rn = (cnt + 1) div 2"))
      .select(col("resid_abs").as("mad"))
    resid.crossJoin(broadcast(mad))
      .filter(col("resid_abs") > col("mad") * 3)
      .select(col("day"), col("dow"), col("cents"), col("med_cents"),
        col("resid_abs"), col("resid_sign"), col("mad"))
      .orderBy(col("day"))
  }

  /** Day-of-week × hour activity grid with per-weekday peak hours — the
    * calendar heatmap behind every traffic dashboard: 168 cells of
    * event count + revenue cents, each weekday's modal hour flagged
    * (ties to the earliest hour — deterministic). Weekday/hour are pure
    * epoch-microsecond arithmetic (no calendar functions, no timezone
    * drift). One fact-scale partial-agg to 168 rows; the peak window
    * runs on those rows only.
    */
  def qCalendarGrid(s: SparkSession, d: String): DataFrame = {
    val cells = EventStreams.normalize(Tables.events(s, d))
      .select(expr("((ts_us div 86400000000 + 3) % 7) + 1").as("dow"),
        expr("(ts_us % 86400000000) div 3600000000").as("hour"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).cast("long").as("cents"))
    val w = Window.partitionBy(col("dow")).orderBy(col("n_events").desc, col("hour"))
    cells
      .withColumn("is_peak_hour", (row_number().over(w) === 1).cast("int"))
      .orderBy(col("dow"), col("hour"))
  }

  /** The (event_type, day) revenue rollup shared by the channel/fill
    * queries below — the [[qHolt]] daily grain.
    */
  private def typeDaily(s: SparkSession, d: String): DataFrame =
    EventStreams.normalize(Tables.events(s, d))
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("rev_cents"))

  /** Trailing 7-day Donchian channel of daily revenue per event type —
    * rolling min / max / range plus the breakout flags (today touches
    * the channel edge), the band-trading sibling of [[qBollinger]]'s
    * mean±σ bands but in EXACT order statistics (min/max need no
    * variance staging at all). One day-domain window after the
    * fact-scale rollup.
    */
  def qMovingMinmax(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day")).rowsBetween(-6, 0)
    typeDaily(s, d)
      .select(col("event_type"), col("day"), col("rev_cents"),
        min(col("rev_cents")).over(w).as("min7_cents"),
        max(col("rev_cents")).over(w).as("max7_cents"))
      .withColumn("range7_cents", col("max7_cents") - col("min7_cents"))
      .withColumn("at_high", (col("rev_cents") === col("max7_cents")).cast("int"))
      .withColumn("at_low", (col("rev_cents") === col("min7_cents")).cast("int"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Linear interpolation gap fill of the per-type daily revenue series
    * — [[qLocf]]'s straight-line upgrade: missing days take
    * prev + ⌊|next − prev|·(day − prev_day) / (next_day − prev_day)⌋
    * (magnitude-and-sign so truncation is symmetric and identical in
    * both engines); leading/trailing gaps fall back to
    * backward/forward fill, and each row labels its source
    * (actual/interp/locf/bocf) so the gate pins the branch logic. The
    * dense grid and both anchor scans live on the DAY domain — the
    * fact scan collapses first.
    */
  def qInterpLinear(s: SparkSession, d: String): DataFrame = {
    val daily = typeDaily(s, d)
    val cal = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("event_type"), explode(expr("sequence(lo, hi)")).as("day"))
    val grid = cal.join(daily, Seq("event_type", "day"), "left_outer")
    val wb = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wf = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(0, Window.unboundedFollowing)
    grid
      .withColumn("pd", last(when(col("rev_cents").isNotNull, col("day")), ignoreNulls = true).over(wb))
      .withColumn("pv", last(col("rev_cents"), ignoreNulls = true).over(wb))
      .withColumn("nd", first(when(col("rev_cents").isNotNull, col("day")), ignoreNulls = true).over(wf))
      .withColumn("nv", first(col("rev_cents"), ignoreNulls = true).over(wf))
      .select(col("event_type"), col("day"),
        when(col("rev_cents").isNotNull, col("rev_cents"))
          .when(col("pv").isNotNull && col("nv").isNotNull, expr(
            """pv + CASE WHEN nv < pv THEN
              |  -(abs(nv - pv) * (day - pd) div (nd - pd))
              |ELSE abs(nv - pv) * (day - pd) div (nd - pd) END""".stripMargin))
          .when(col("pv").isNotNull, col("pv"))
          .otherwise(col("nv")).as("rev_filled_cents"),
        when(col("rev_cents").isNotNull, lit("actual"))
          .when(col("pv").isNotNull && col("nv").isNotNull, lit("interp"))
          .when(col("pv").isNotNull, lit("locf"))
          .otherwise(lit("bocf")).as("fill_src"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Two-proportion z-test: does the click channel "finish" (value ≥
    * 100, the eventIndex convention) at a different rate than view? The
    * classic A/B significance primitive, kept EXACT by emitting z²
    * (which needs no sqrt): z² = (x₁n₂ − x₂n₁)²·N div
    * (n₁n₂(x₁+x₂)(N−x₁−x₂)), ×10⁶, staged DECIMAL(38,0) — exact
    * through samples of ~10⁸ per arm (beyond that you subsample the
    * test, not the warehouse). Significance = z² vs the pinned
    * χ²₁(0.95) = 3.841459 constant. One partial-agg scan → 1 row.
    */
  def qPropZtest(s: SparkSession, d: String): DataFrame =
    EventStreams.normalize(Tables.events(s, d))
      .filter(col("event_type").isin("click", "view"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).cast("long").as("n1"),
        sum(when(col("event_type") === "click" && col("value") >= 100.0, 1L)
          .otherwise(0L)).cast("long").as("x1"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).cast("long").as("n2"),
        sum(when(col("event_type") === "view" && col("value") >= 100.0, 1L)
          .otherwise(0L)).cast("long").as("x2"))
      .withColumn("z2_x1e6", expr(
        // overflow-bound: |x1*n2 - x2*n1| <= n1*n2 <= (n/2)^2, so the numerator <= n^5/16 * 1e6 — inside DECIMAL(38) only for n = n1+n2 < 4*10^6 events; WATCH: first ceiling the sf1 gate can actually cross (int64 components x1*n2 themselves need n < 3*10^9).
        """CAST(CAST(x1 * n2 - x2 * n1 AS DECIMAL(38,0)) * (x1 * n2 - x2 * n1)
          |  * (n1 + n2) * 1000000
          |  div (CAST(n1 AS DECIMAL(38,0)) * n2 * (x1 + x2) * (n1 + n2 - x1 - x2))
          |  AS BIGINT)""".stripMargin))
      .withColumn("rate1_x1e4", expr("(x1 * 10000) div n1"))
      .withColumn("rate2_x1e4", expr("(x2 * 10000) div n2"))
      .withColumn("significant_95",
        (col("z2_x1e6") > 3841459L).cast("int"))

  /** Cumulative-uniques curve — "total distinct users ever seen, by
    * day" plus the daily new/active split. The naive shape
    * (COUNT(DISTINCT) over an expanding window) rescans every prefix —
    * quadratic; the scale shape used here is the FIRST-SEEN trick:
    * one (user → min day) aggregate, a day-domain rollup of first
    * appearances, and a running sum over the ≤days-sized grid. DAU
    * rides the same scan as a (day, user)-distinct count.
    */
  def qCumulativeUniques(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
    val firstDay = ev.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
      .groupBy(col("first_day").as("day")).agg(count(lit(1)).as("new_users"))
    val dau = ev.distinct().groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    // day-domain outer join (a gap day has DAU but no first-seens)
    dau.join(firstDay, Seq("day"), "full_outer")
      .select(col("day"), coalesce(col("new_users"), lit(0L)).as("new_users"),
        coalesce(col("dau"), lit(0L)).as("dau"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy(col("day"))
  }

  /** Inter-order gap distribution — days between a customer's
    * consecutive orders, rolled to the log₂ bucket grid (the
    * degree-dist convention): the purchase-cadence readout RFM recency
    * scores threshold. The lag runs in per-customer partitions
    * (parallel across the key domain — no global window), the
    * histogram is a ≤17-bucket rollup.
    */
  def qOrderGapStats(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("od"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1990-01-01') AS BIGINT)")
          .as("od"))
      .withColumn("gap", col("od") - lag(col("od"), 1).over(w))
      .filter(col("gap").isNotNull && col("gap") > 0)
      .groupBy(expr("CAST(length(bin(gap)) AS BIGINT)").as("bucket"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap")).as("min_gap_days"), max(col("gap")).as("max_gap_days"),
        countDistinct(col("o_custkey")).cast("long").as("n_customers"))
      .orderBy(col("bucket"))
  }

  /** New-vs-returning split per order month — the acquisition/retention
    * composition every growth dashboard leads with: orders from
    * customers whose FIRST order falls in that month vs returning,
    * share ×10⁴. First-month table is one aggregate over the customer
    * domain; the month rollup rides the same scan.
    */
  def qNewVsReturning(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .select(col("o_custkey"), substring(expr("CAST(o_orderdate AS STRING)"), 1, 7).as("month"))
    val firstMonth = ord.groupBy(col("o_custkey")).agg(min(col("month")).as("fm"))
    ord.join(firstMonth, Seq("o_custkey"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("month") === col("fm"), 1L).otherwise(0L)).cast("long").as("n_new"),
        sum(when(col("month") =!= col("fm"), 1L).otherwise(0L)).cast("long").as("n_returning"),
        countDistinct(when(col("month") === col("fm"), col("o_custkey")))
          .cast("long").as("n_new_customers"))
      .withColumn("new_share_x1e4", expr("(n_new * 10000) div n_orders"))
      .orderBy(col("month"))
  }

  /** Single text source for the per-(day, user) purchase-cents CTE the
    * series oracles so the cents rounding / purchase filter can never
    * drift between them.
    */
  private val purchaseCentsSql: String =
    "SELECT epoch_us(ts) // 86400000000 AS day, user_id, " +
      "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents " +
      "FROM events WHERE event_type = 'purchase'"

  val oracles: Map[String, String] = Map(
    "q_audience_overlap" ->
      """WITH prof AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hp
        |  FROM events WHERE event_type IN ('click', 'view', 'purchase')
        |  GROUP BY user_id),
        |c AS (SELECT CAST(sum(hc) AS BIGINT) AS nc, CAST(sum(hv) AS BIGINT) AS nv,
        |  CAST(sum(hp) AS BIGINT) AS np,
        |  CAST(sum(hc * hv) AS BIGINT) AS icv, CAST(sum(hc * hp) AS BIGINT) AS icp,
        |  CAST(sum(hv * hp) AS BIGINT) AS ivp FROM prof),
        |u AS (
        |  SELECT 'click' AS type_a, 'view' AS type_b, icv AS n_both,
        |    nc + nv - icv AS n_union FROM c
        |  UNION ALL SELECT 'click', 'purchase', icp, nc + np - icp FROM c
        |  UNION ALL SELECT 'view', 'purchase', ivp, nv + np - ivp FROM c)
        |SELECT type_a, type_b, n_both, n_union,
        |  (n_both * 1000000) // n_union AS jaccard_x1e6
        |FROM u ORDER BY type_a, type_b""".stripMargin,

    "q_emd" ->
      """WITH ev2 AS (
        |  SELECT event_type, CAST(floor(value / 10) AS BIGINT) AS bin
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |cells AS (
        |  SELECT bin,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM ev2 GROUP BY bin),
        |cum AS (
        |  SELECT bin, CAST(sum(a) OVER (ORDER BY bin) AS BIGINT) AS ca,
        |    CAST(sum(b) OVER (ORDER BY bin) AS BIGINT) AS cb
        |  FROM cells),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
        |        FROM cells),
        |agg AS (
        |  SELECT sum(abs(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na)) AS num,
        |    max(na) AS na, max(nb) AS nb, CAST(count(*) AS BIGINT) AS n_bins
        |  FROM cum CROSS JOIN tot)
        |SELECT na AS n_click, nb AS n_purchase, n_bins,
        |  CAST((num // (CAST(na AS HUGEINT) * nb)) * 1000000
        |    + ((num % (CAST(na AS HUGEINT) * nb)) * 1000000)
        |      // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS emd_bins_x1e6
        |FROM agg""".stripMargin,

    "q_corr_matrix" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p
        |  FROM events GROUP BY 1),
        |grid AS (SELECT unnest(range((SELECT min(day) FROM daily),
        |                             (SELECT max(day) FROM daily) + 1)) AS day),
        |f AS (SELECT COALESCE(d.c, 0) AS c, COALESCE(d.v, 0) AS v, COALESCE(d.p, 0) AS p
        |      FROM grid g LEFT JOIN daily d USING (day)),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(c) AS BIGINT) AS sc, CAST(sum(v) AS BIGINT) AS sv,
        |  CAST(sum(p) AS BIGINT) AS sp,
        |  sum(CAST(c AS HUGEINT) * c) AS scc, sum(CAST(v AS HUGEINT) * v) AS svv,
        |  sum(CAST(p AS HUGEINT) * p) AS spp, sum(CAST(c AS HUGEINT) * v) AS scv,
        |  sum(CAST(c AS HUGEINT) * p) AS scp, sum(CAST(v AS HUGEINT) * p) AS svp
        |  FROM f),
        |u AS (
        |  SELECT 'click' AS series_a, 'view' AS series_b, n AS n_days,
        |    CAST(n * scv - CAST(sc AS HUGEINT) * sv AS BIGINT) AS cov_num,
        |    CAST(n * scc - CAST(sc AS HUGEINT) * sc AS BIGINT) AS var_a_num,
        |    CAST(n * svv - CAST(sv AS HUGEINT) * sv AS BIGINT) AS var_b_num
        |  FROM s
        |  UNION ALL
        |  SELECT 'click', 'purchase', n,
        |    CAST(n * scp - CAST(sc AS HUGEINT) * sp AS BIGINT),
        |    CAST(n * scc - CAST(sc AS HUGEINT) * sc AS BIGINT),
        |    CAST(n * spp - CAST(sp AS HUGEINT) * sp AS BIGINT)
        |  FROM s
        |  UNION ALL
        |  SELECT 'view', 'purchase', n,
        |    CAST(n * svp - CAST(sv AS HUGEINT) * sp AS BIGINT),
        |    CAST(n * svv - CAST(sv AS HUGEINT) * sv AS BIGINT),
        |    CAST(n * spp - CAST(sp AS HUGEINT) * sp AS BIGINT)
        |  FROM s)
        |SELECT series_a, series_b, n_days, cov_num, var_a_num, var_b_num,
        |  CAST(sign(cov_num) AS INT) AS corr_sign
        |FROM u ORDER BY series_a, series_b""".stripMargin,

    "q_granger" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |grid AS (SELECT unnest(range((SELECT min(day) FROM daily),
        |                             (SELECT max(day) FROM daily) + 1)) AS day),
        |f AS (SELECT g.day, COALESCE(d.x, 0) AS x, COALESCE(d.y, 0) AS y
        |      FROM grid g LEFT JOIN daily d USING (day)),
        |l AS (SELECT t.y, p.y AS u, p.x AS v FROM f t JOIN f p ON t.day = p.day + 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(u) AS BIGINT) AS su, CAST(sum(v) AS BIGINT) AS sv,
        |  CAST(sum(y) AS BIGINT) AS sy,
        |  sum(CAST(u AS HUGEINT) * u) AS suu, sum(CAST(u AS HUGEINT) * v) AS suv,
        |  sum(CAST(u AS HUGEINT) * y) AS suy, sum(CAST(v AS HUGEINT) * v) AS svv,
        |  sum(CAST(v AS HUGEINT) * y) AS svy, sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM l),
        |c AS (SELECT n,
        |  n * suu - CAST(su AS HUGEINT) * su AS cuu,
        |  n * suv - CAST(su AS HUGEINT) * sv AS cuv,
        |  n * suy - CAST(su AS HUGEINT) * sy AS cuy,
        |  n * svv - CAST(sv AS HUGEINT) * sv AS cvv,
        |  n * svy - CAST(sv AS HUGEINT) * sy AS cvy,
        |  n * syy - CAST(sy AS HUGEINT) * sy AS cyy FROM s),
        |e AS (SELECT n, cuy, cvy, cyy,
        |  cuu * cvv - CAST(cuv AS HUGEINT) * cuv AS det,
        |  cuy * cvv - CAST(cvy AS HUGEINT) * cuv AS d1,
        |  cuu * cvy - CAST(cuv AS HUGEINT) * cuy AS d2,
        |  CAST(cuy AS HUGEINT) * cuy AS ar,
        |  cuu * cyy AS br FROM c),
        |r AS (SELECT n, ar, br,
        |  d1 * cuy + CAST(d2 AS HUGEINT) * cvy AS nf,
        |  det * cyy AS df FROM e)
        |SELECT n AS n_days,
        |  CASE WHEN br > 0 THEN CAST((ar // br) * 1000000
        |    + ((ar % br) * 1000000) // br AS BIGINT) ELSE 0 END AS r2_restr_x1e6,
        |  CASE WHEN df > 0 THEN CAST((nf // df) * 1000000
        |    + ((nf % df) * 1000000) // df AS BIGINT) ELSE 0 END AS r2_full_x1e6,
        |  CASE WHEN df > 0 THEN CAST((nf // df) * 1000000
        |    + ((nf % df) * 1000000) // df AS BIGINT) ELSE 0 END
        |  - CASE WHEN br > 0 THEN CAST((ar // br) * 1000000
        |    + ((ar % br) * 1000000) // br AS BIGINT) ELSE 0 END AS gain_x1e6
        |FROM r""".stripMargin,

    "q_cohort_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, (epoch_us(ts) // 86400000000) // 7 AS week, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |cohort AS (SELECT user_id, min(week) AS c_week FROM ev GROUP BY user_id),
        |sizes AS (SELECT c_week, CAST(count(*) AS BIGINT) AS cohort_n
        |          FROM cohort GROUP BY c_week),
        |grid AS (
        |  SELECT c.c_week, e.week - c.c_week AS age_weeks,
        |    CAST(sum(e.cents) AS BIGINT) AS cents
        |  FROM ev e JOIN cohort c USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY c.c_week, e.week - c.c_week),
        |cum AS (
        |  SELECT c_week, age_weeks, cents,
        |    CAST(sum(cents) OVER (PARTITION BY c_week ORDER BY age_weeks
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        |  FROM grid)
        |SELECT cum.c_week, cum.age_weeks, cum.cents, cum.cum_cents, s.cohort_n,
        |  (cum.cum_cents * 100) // s.cohort_n AS ltv_per_user_x100
        |FROM cum JOIN sizes s USING (c_week)
        |ORDER BY cum.c_week, cum.age_weeks""".stripMargin,

    "q_forecast_naive" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, event_type FROM events),
        |daily AS (
        |  SELECT event_type, day, CAST(count(*) AS BIGINT) AS n
        |  FROM ev GROUP BY event_type, day),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |g AS (
        |  SELECT t.event_type, d.day FROM ty t,
        |    (SELECT unnest(range((SELECT min(day) FROM ev),
        |                         (SELECT max(day) FROM ev) + 1)) AS day) d),
        |f AS (
        |  SELECT g.event_type, g.day, COALESCE(daily.n, 0) AS actual,
        |    lag(COALESCE(daily.n, 0), 7)
        |      OVER (PARTITION BY g.event_type ORDER BY g.day) AS fc
        |  FROM g LEFT JOIN daily USING (event_type, day)),
        |e AS (
        |  SELECT event_type, actual, fc, abs(actual - fc) AS abs_err
        |  FROM f WHERE fc IS NOT NULL)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(actual) AS BIGINT) AS total_actual,
        |  CAST(sum(abs_err) AS BIGINT) AS total_abs_err,
        |  (CAST(sum(abs_err) AS BIGINT) * 10000) // CAST(sum(actual) AS BIGINT) AS wape_x1e4,
        |  CAST(sum(CASE WHEN actual > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
        |  CAST(sum(CASE WHEN actual > 0 THEN (abs_err * 10000) // actual ELSE 0 END) AS BIGINT)
        |    // CAST(sum(CASE WHEN actual > 0 THEN 1 ELSE 0 END) AS BIGINT) AS mape_x1e4
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_bollinger" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100 AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |w AS (
        |  SELECT day, x,
        |    CAST(count(*) OVER tw AS BIGINT) AS n_w,
        |    CAST(sum(x) OVER tw AS BIGINT) AS sx,
        |    CAST(sum(x * x) OVER tw AS BIGINT) AS sxx
        |  FROM daily
        |  WINDOW tw AS (ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |b AS (
        |  SELECT day, x, n_w, (sx * 100) // n_w AS mean_x100,
        |    CAST(floor(sqrt(CAST((n_w * sxx - sx * sx) * 10000 // (n_w * n_w) AS DOUBLE))) AS BIGINT) AS sd_x100
        |  FROM w)
        |SELECT day, x, n_w, mean_x100, sd_x100,
        |  mean_x100 + 2 * sd_x100 AS upper_x100,
        |  mean_x100 - 2 * sd_x100 AS lower_x100,
        |  CAST(CASE WHEN x * 100 > mean_x100 + 2 * sd_x100 THEN 1
        |            WHEN x * 100 < mean_x100 - 2 * sd_x100 THEN -1
        |            ELSE 0 END AS INT) AS breach
        |FROM b ORDER BY day""".stripMargin,

    "q_event_regex" -> {
      val pats = Seq("v.*c.*p", "^s", "cc", "v[vc]*p", "e.*e.*e")
      val conds = pats.zipWithIndex.map { case (p, k) =>
        s"CAST(sum(CASE WHEN regexp_matches(seq, '$p') THEN 1 ELSE 0 END) AS BIGINT) AS p$k"
      }.mkString(",\n        ")
      val rows = pats.zipWithIndex.map { case (p, k) =>
        s"SELECT '$p' AS pattern, p$k AS n_matched, n_users FROM m"
      }.mkString("\n        UNION ALL ")
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         |    substring(event_type, 1, 1) AS ini
         |  FROM events),
         |seqs AS (
         |  SELECT user_id,
         |    substring(string_agg(ini, '' ORDER BY ts_us, event_id), 1, 40) AS seq
         |  FROM e GROUP BY user_id),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
         |        $conds
         |      FROM seqs),
         |u AS (
         |        $rows)
         |SELECT pattern, n_matched, n_users,
         |  (n_matched * 1000000) // n_users AS share_ppm
         |FROM u ORDER BY pattern""".stripMargin
    },

    "q_spearman" ->
      s"""WITH xy AS ($dailyXySql),
         |r AS (
         |  SELECT day,
         |    CAST(rank() OVER (ORDER BY x) * 2
         |      + count(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx2,
         |    CAST(rank() OVER (ORDER BY y) * 2
         |      + count(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry2
         |  FROM xy),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(rx2) AS BIGINT) AS sx, CAST(sum(ry2) AS BIGINT) AS sy,
         |    CAST(sum(rx2 * rx2) AS BIGINT) AS sxx,
         |    CAST(sum(ry2 * ry2) AS BIGINT) AS syy,
         |    CAST(sum(rx2 * ry2) AS BIGINT) AS sxy
         |  FROM r),
         |c AS (
         |  SELECT n, n * sxy - sx * sy AS s_xy, n * sxx - sx * sx AS s_xx,
         |    n * syy - sy * sy AS s_yy
         |  FROM m)
         |SELECT n, s_xy, s_xx, s_yy,
         |  CAST(CAST(abs(s_xy) AS HUGEINT) * 1000000
         |    // (CAST(floor(sqrt(CAST(s_xx AS DOUBLE))) AS BIGINT)
         |       * CAST(floor(sqrt(CAST(s_yy AS DOUBLE))) AS BIGINT)) AS BIGINT) AS rho_abs_x1e6,
         |  CAST(CASE WHEN s_xy < 0 THEN -1 WHEN s_xy > 0 THEN 1 ELSE 0 END AS INT) AS rho_sign
         |FROM c""".stripMargin,

    "q_kendall" ->
      s"""WITH xy AS ($dailyXySql),
         |p AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n0,
         |    CAST(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
         |                    OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END) AS BIGINT) AS c,
         |    CAST(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
         |                    OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END) AS BIGINT) AS d,
         |    CAST(sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS n2
         |  FROM xy a JOIN xy b ON a.day < b.day)
         |SELECT n0, c, d, n1, n2,
         |  abs(c - d) * 1000000
         |    // CAST(floor(sqrt(CAST((n0 - n1) * (n0 - n2) AS DOUBLE))) AS BIGINT) AS tau_abs_x1e6,
         |  CAST(CASE WHEN c < d THEN -1 WHEN c > d THEN 1 ELSE 0 END AS INT) AS tau_sign
         |FROM p""".stripMargin,

    "q_autocorr" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100 AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |l AS (SELECT unnest(range(1, 8)) AS lag),
        |m AS (
        |  SELECT l.lag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(a.x) AS BIGINT) AS sx, CAST(sum(b.x) AS BIGINT) AS sy,
        |    CAST(sum(a.x * a.x) AS BIGINT) AS sxx,
        |    CAST(sum(b.x * b.x) AS BIGINT) AS syy,
        |    CAST(sum(a.x * b.x) AS BIGINT) AS sxy
        |  FROM l
        |  JOIN daily a ON true
        |  JOIN daily b ON b.day = a.day + l.lag
        |  GROUP BY l.lag),
        |c AS (
        |  SELECT lag, n, n * sxy - sx * sy AS s_xy, n * sxx - sx * sx AS s_xx,
        |    n * syy - sy * sy AS s_yy
        |  FROM m)
        |SELECT lag, n, s_xy,
        |  CAST(CAST(abs(s_xy) AS HUGEINT) * 1000000
        |    // (CAST(floor(sqrt(CAST(s_xx AS DOUBLE))) AS BIGINT)
        |       * CAST(floor(sqrt(CAST(s_yy AS DOUBLE))) AS BIGINT)) AS BIGINT) AS r_abs_x1e6,
        |  CAST(CASE WHEN s_xy < 0 THEN -1 WHEN s_xy > 0 THEN 1 ELSE 0 END AS INT) AS r_sign
        |FROM c ORDER BY lag""".stripMargin,

    "q_wow_growth" ->
      """WITH weekly AS (
        |  SELECT event_type, (epoch_us(ts) // 86400000000) // 7 AS week,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, week, cents,
        |    lag(cents, 1) OVER (PARTITION BY event_type ORDER BY week) AS prev
        |  FROM weekly),
        |g AS (SELECT *, cents - prev AS delta FROM w)
        |SELECT event_type, week, cents, prev, delta,
        |  CAST(CAST(abs(delta) AS HUGEINT) * 10000 // prev AS BIGINT) AS growth_abs_x1e4,
        |  CAST(CASE WHEN delta < 0 THEN -1 WHEN delta > 0 THEN 1 ELSE 0 END AS INT) AS growth_sign
        |FROM g ORDER BY event_type, week""".stripMargin,

    "q_theil_sen" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |p AS (
        |  SELECT (b.cents - a.cents) * 1000 AS num, b.day - a.day AS den
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |sl AS (SELECT num // den AS slope_x1e3 FROM p),
        |r AS (SELECT slope_x1e3,
        |        row_number() OVER (ORDER BY slope_x1e3) AS rk,
        |        count(*) OVER () AS n
        |      FROM sl)
        |SELECT CAST(max(n) AS BIGINT) AS n_pairs,
        |  min(slope_x1e3) AS min_slope_x1e3,
        |  CAST(max(CASE WHEN rk = (n * 50 + 99) // 100 THEN slope_x1e3 END) AS BIGINT)
        |    AS med_slope_x1e3,
        |  max(slope_x1e3) AS max_slope_x1e3
        |FROM r""".stripMargin,

    "q_cusum" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |st0 AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS tot,
        |          sum(CAST(cents AS HUGEINT) * cents) AS ssq FROM daily),
        |st1 AS (SELECT *, (tot * 100) // n AS mean_x100,
        |          CAST(floor(sqrt(CAST(
        |            (CAST(n AS HUGEINT) * ssq - CAST(tot AS HUGEINT) * tot) * 10000
        |              // (CAST(n AS HUGEINT) * (n - 1)) AS DOUBLE))) AS BIGINT) AS sd_x100
        |        FROM st0),
        |st AS (SELECT mean_x100, sd_x100, sd_x100 // 2 AS k_x100,
        |         sd_x100 * 4 AS h_x100 FROM st1),
        |y AS (SELECT d.day, d.cents, d.cents * 100 - st.mean_x100 AS y,
        |        st.k_x100, st.h_x100 FROM daily d CROSS JOIN st),
        |p AS (SELECT *,
        |        sum(y - k_x100) OVER w AS p_hi,
        |        sum(y + k_x100) OVER w AS p_lo
        |      FROM y WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |m AS (SELECT *,
        |        min(p_hi) OVER w AS mn, max(p_lo) OVER w AS mx
        |      FROM p WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (SELECT day, cents,
        |        p_hi - least(mn, 0) AS s_pos,
        |        greatest(mx, 0) - p_lo AS s_neg, h_x100
        |      FROM m)
        |SELECT day, cents, CAST(s_pos AS BIGINT) AS s_pos,
        |  CAST(s_neg AS BIGINT) AS s_neg, h_x100,
        |  CAST(s_pos > h_x100 AS INTEGER) AS alarm_hi,
        |  CAST(s_neg > h_x100 AS INTEGER) AS alarm_lo
        |FROM f ORDER BY day""".stripMargin,

    "q_control_chart" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |lim AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(n) AS BIGINT) AS total
        |  FROM daily GROUP BY event_type),
        |l2 AS (SELECT *, (total * 100) // n_days AS mean_x100 FROM lim),
        |l3 AS (SELECT *,
        |  CAST(floor(sqrt(CAST(mean_x100 * 100 AS DOUBLE))) AS BIGINT) AS s_x100
        |  FROM l2),
        |l4 AS (SELECT event_type, n_days, mean_x100,
        |        mean_x100 + 3 * s_x100 AS ucl_x100,
        |        greatest(mean_x100 - 3 * s_x100, 0) AS lcl_x100 FROM l3)
        |SELECT d.event_type, max(l.n_days) AS n_days, max(l.mean_x100) AS mean_x100,
        |  max(l.ucl_x100) AS ucl_x100, max(l.lcl_x100) AS lcl_x100,
        |  CAST(sum(CASE WHEN d.n * 100 > l.ucl_x100 THEN 1 ELSE 0 END) AS BIGINT) AS n_out_hi,
        |  CAST(sum(CASE WHEN d.n * 100 < l.lcl_x100 THEN 1 ELSE 0 END) AS BIGINT) AS n_out_lo
        |FROM daily d JOIN l4 l USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    "q_ewma" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, day, rev_cents,
        |        lag(rev_cents, 1) OVER w AS l1, lag(rev_cents, 2) OVER w AS l2,
        |        lag(rev_cents, 3) OVER w AS l3, lag(rev_cents, 4) OVER w AS l4,
        |        lag(rev_cents, 5) OVER w AS l5, lag(rev_cents, 6) OVER w AS l6,
        |        lag(rev_cents, 7) OVER w AS l7
        |      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day))
        |SELECT event_type, day, rev_cents,
        |  ((rev_cents * 128 + coalesce(l1, 0) * 64 + coalesce(l2, 0) * 32
        |    + coalesce(l3, 0) * 16 + coalesce(l4, 0) * 8 + coalesce(l5, 0) * 4
        |    + coalesce(l6, 0) * 2 + coalesce(l7, 0)) * 100)
        |  // (128 + CASE WHEN l1 IS NULL THEN 0 ELSE 64 END
        |     + CASE WHEN l2 IS NULL THEN 0 ELSE 32 END
        |     + CASE WHEN l3 IS NULL THEN 0 ELSE 16 END
        |     + CASE WHEN l4 IS NULL THEN 0 ELSE 8 END
        |     + CASE WHEN l5 IS NULL THEN 0 ELSE 4 END
        |     + CASE WHEN l6 IS NULL THEN 0 ELSE 2 END
        |     + CASE WHEN l7 IS NULL THEN 0 ELSE 1 END) AS ewma_cents_x100
        |FROM l ORDER BY event_type, day""".stripMargin,

    "q_growth_accounting" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
        |fw AS (SELECT user_id, min(wk) AS first_wk FROM uw GROUP BY user_id),
        |st AS (
        |  SELECT u.wk,
        |    CASE WHEN u.wk = f.first_wk THEN 1 ELSE 0 END AS is_new,
        |    CASE WHEN u.wk <> f.first_wk AND p.user_id IS NOT NULL THEN 1 ELSE 0 END AS is_retained,
        |    CASE WHEN u.wk <> f.first_wk AND p.user_id IS NULL THEN 1 ELSE 0 END AS is_resurrected
        |  FROM uw u JOIN fw f USING (user_id)
        |  LEFT JOIN uw p ON p.user_id = u.user_id AND p.wk = u.wk - 1),
        |agg AS (SELECT wk, CAST(sum(is_new) AS BIGINT) AS n_new,
        |          CAST(sum(is_retained) AS BIGINT) AS n_retained,
        |          CAST(sum(is_resurrected) AS BIGINT) AS n_resurrected
        |        FROM st GROUP BY wk),
        |ch AS (
        |  SELECT u.wk + 1 AS wk, CAST(count(*) AS BIGINT) AS n_churned
        |  FROM uw u LEFT JOIN uw n ON n.user_id = u.user_id AND n.wk = u.wk + 1
        |  WHERE n.user_id IS NULL AND u.wk + 1 <= (SELECT max(wk) FROM uw)
        |  GROUP BY u.wk + 1)
        |SELECT a.wk, n_new, n_retained, n_resurrected,
        |  CAST(COALESCE(ch.n_churned, 0) AS BIGINT) AS n_churned,
        |  CASE WHEN COALESCE(ch.n_churned, 0) > 0
        |       THEN ((n_new + n_resurrected) * 100) // ch.n_churned
        |       ELSE NULL END AS quick_ratio_x100
        |FROM agg a LEFT JOIN ch ON ch.wk = a.wk
        |ORDER BY a.wk""".stripMargin,

    "q_rolling_corr" -> {
      s"""WITH xy AS ($dailyXySql),
         |w AS (
         |  SELECT day, x, y,
         |    row_number() OVER (ORDER BY day) AS rn,
         |    CAST(count(*) OVER win AS BIGINT) AS n,
         |    sum(x) OVER win AS sx, sum(y) OVER win AS sy,
         |    sum(CAST(x AS HUGEINT) * x) OVER win AS sxx,
         |    sum(CAST(y AS HUGEINT) * y) OVER win AS syy,
         |    sum(CAST(x AS HUGEINT) * y) OVER win AS sxy
         |  FROM xy
         |  WINDOW win AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
         |c AS (
         |  SELECT day, x, y,
         |    n * sxy - CAST(sx AS HUGEINT) * sy AS num,
         |    n * sxx - CAST(sx AS HUGEINT) * sx AS sxx_c,
         |    n * syy - CAST(sy AS HUGEINT) * sy AS syy_c
         |  FROM w WHERE rn >= 14),
         |d AS (
         |  SELECT day, x, y, num,
         |    abs(num) // sc AS n2, sxx_c // sc AS sx2, syy_c // sc AS sy2
         |  FROM (SELECT *, greatest(abs(num), sxx_c, syy_c) // 1000000000 + 1 AS sc
         |        FROM c))
         |SELECT day, x, y,
         |  CASE WHEN sx2 > 0 AND sy2 > 0 THEN
         |    CAST((CAST(n2 AS HUGEINT) * n2 * 1000000)
         |      // (CAST(sx2 AS HUGEINT) * sy2) AS BIGINT)
         |  ELSE 0 END AS r2_x1e6,
         |  CAST(CASE WHEN num < 0 THEN -1 WHEN num > 0 THEN 1 ELSE 0 END AS INT) AS r_sign
         |FROM d ORDER BY day""".stripMargin
    },

    "q_holt" -> {
      def lagCols(c: String): String =
        (1 to 7).map(j => s"lag($c, $j) OVER w AS ${c}_l$j").mkString(",\n        ")
      def kernel(c: String, scale: String): String = {
        val num = s"($c * 128" +
          (1 to 7).map(j => s" + coalesce(${c}_l$j, 0) * ${1 << (7 - j)}").mkString + s")$scale"
        val den = "(128" +
          (1 to 7).map(j => s" + CASE WHEN ${c}_l$j IS NULL THEN 0 ELSE ${1 << (7 - j)} END").mkString + ")"
        s"$num // $den"
      }
      s"""WITH daily AS (
         |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
         |  FROM events GROUP BY 1, 2),
         |l1 AS (SELECT event_type, day, rev_cents,
         |        ${lagCols("rev_cents")}
         |      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         |s1 AS (SELECT event_type, day, rev_cents,
         |        ${kernel("rev_cents", " * 100")} AS s1_x100
         |      FROM l1),
         |l2 AS (SELECT event_type, day, rev_cents, s1_x100,
         |        ${lagCols("s1_x100")}
         |      FROM s1 WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         |s2 AS (SELECT event_type, day, rev_cents, s1_x100,
         |        ${kernel("s1_x100", "")} AS s2_x100
         |      FROM l2)
         |SELECT event_type, day, rev_cents, s1_x100, s2_x100,
         |  2 * s1_x100 - s2_x100 AS level_x100,
         |  s1_x100 - s2_x100 AS trend_x100,
         |  3 * s1_x100 - 2 * s2_x100 AS forecast_x100
         |FROM s2 ORDER BY event_type, day""".stripMargin
    },

    "q_anomaly_dow" -> {
      s"""WITH pc AS ($purchaseCentsSql),
         |daily AS (SELECT day, CAST(sum(cents) AS BIGINT) AS cents
         |          FROM pc GROUP BY day),
         |dd AS (SELECT day, cents, ((day + 3) % 7) + 1 AS dow FROM daily),
         |med AS (
         |  SELECT dow, cents AS med_cents FROM (
         |    SELECT dow, cents,
         |      row_number() OVER (PARTITION BY dow ORDER BY cents, day) AS rn,
         |      count(*) OVER (PARTITION BY dow) AS cnt
         |    FROM dd)
         |  WHERE rn = (cnt + 1) // 2),
         |resid AS (
         |  SELECT d.day, d.dow, d.cents, m.med_cents,
         |    abs(d.cents - m.med_cents) AS resid_abs,
         |    CAST(CASE WHEN d.cents < m.med_cents THEN -1
         |              WHEN d.cents > m.med_cents THEN 1 ELSE 0 END AS INT) AS resid_sign
         |  FROM dd d JOIN med m ON m.dow = d.dow),
         |mad AS (
         |  SELECT resid_abs AS mad FROM (
         |    SELECT resid_abs,
         |      row_number() OVER (ORDER BY resid_abs, day) AS rn,
         |      count(*) OVER () AS cnt
         |    FROM resid)
         |  WHERE rn = (cnt + 1) // 2)
         |SELECT r.day, r.dow, r.cents, r.med_cents, r.resid_abs, r.resid_sign, m.mad
         |FROM resid r CROSS JOIN mad m
         |WHERE r.resid_abs > m.mad * 3
         |ORDER BY r.day""".stripMargin
    },

    "q_calendar_grid" ->
      """WITH cells AS (
        |  SELECT ((epoch_us(ts) // 86400000000 + 3) % 7) + 1 AS dow,
        |    (epoch_us(ts) % 86400000000) // 3600000000 AS hour,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2)
        |SELECT dow, hour, n_events, cents,
        |  CAST(CASE WHEN row_number() OVER
        |    (PARTITION BY dow ORDER BY n_events DESC, hour) = 1
        |    THEN 1 ELSE 0 END AS INT) AS is_peak_hour
        |FROM cells ORDER BY dow, hour""".stripMargin,

    "q_twap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |i AS (SELECT user_id, cents,
        |        lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |          - ts_us AS dur_us
        |      FROM e),
        |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        |        CAST(sum(dur_us) AS BIGINT) AS dur_us_total,
        |        sum(CAST(cents AS HUGEINT) * dur_us) AS cd
        |      FROM i WHERE dur_us IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n_intervals, dur_us_total,
        |  CAST(cd * 100 // dur_us_total AS BIGINT) AS twap_cents_x100
        |FROM g ORDER BY user_id""".stripMargin,

    "q_seasonality" ->
      """WITH base AS (SELECT event_type,
        |    ((epoch_us(ts) // 86400000000 + 3) % 7) + 1 AS dow,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |cells AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS cents FROM base GROUP BY event_type, dow),
        |m AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_total,
        |    CAST(sum(cents) AS BIGINT) AS cents_total FROM cells GROUP BY event_type)
        |SELECT c.event_type, c.dow, c.n, c.cents,
        |  CAST(CAST(c.cents AS HUGEINT) * m.n_total * 1000000
        |    // (CAST(c.n AS HUGEINT) * m.cents_total) AS BIGINT) AS idx_x1e6
        |FROM cells c JOIN m USING (event_type) ORDER BY event_type, dow""".stripMargin,

    "q_bootstrap" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents
        |  FROM events GROUP BY user_id),
        |r AS (SELECT pu.user_id, pu.cents, CAST(b.i AS INT) AS b
        |      FROM pu, range(0, 32) b(i)),
        |w AS (SELECT b, user_id, cents,
        |        ((user_id * 2654435761 + b * 2246822519) % 4294967296) % 3 AS w FROM r),
        |m AS (SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
        |        CAST(sum(w * cents) AS BIGINT) AS w_cents FROM w GROUP BY b),
        |f AS (SELECT b, n_eff, w_cents,
        |        (w_cents * 100) // n_eff AS mean_cents_x100 FROM m)
        |SELECT b, n_eff, w_cents, mean_cents_x100,
        |  CAST(rank() OVER (ORDER BY mean_cents_x100, b) AS INT) AS rank
        |FROM f ORDER BY b""".stripMargin,

    "q_attribution" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, props
        |           FROM events),
        |c AS (SELECT user_id, ts_us AS c_ts, event_id AS c_eid,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) % 8 AS channel
        |      FROM ev WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts_us AS p_ts, event_id AS p_eid
        |      FROM ev WHERE event_type = 'purchase'),
        |pr AS (SELECT c.channel, c.c_ts, c.c_eid, p.p_eid
        |       FROM c JOIN p ON c.user_id = p.user_id
        |         AND c.c_ts <= p.p_ts AND c.c_ts >= p.p_ts - 86400000000),
        |w AS (SELECT channel,
        |        CAST(count(*) OVER (PARTITION BY p_eid) AS BIGINT) AS n_c,
        |        row_number() OVER (PARTITION BY p_eid ORDER BY c_ts, c_eid) AS rn_f,
        |        row_number() OVER (PARTITION BY p_eid ORDER BY c_ts DESC, c_eid DESC) AS rn_l
        |      FROM pr)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum(CASE WHEN rn_f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
        |  CAST(sum(CASE WHEN rn_l = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_last,
        |  CAST(sum(1000000 // n_c) AS BIGINT) AS credit_x1e6
        |FROM w GROUP BY channel ORDER BY channel""".stripMargin,

    "q_survival" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |h AS (SELECT max(ts_us) AS h_ts FROM ev),
        |su AS (SELECT user_id, min(ts_us) AS s_ts FROM ev
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |fp AS (SELECT e.user_id, min(e.ts_us) AS p_ts
        |       FROM ev e JOIN su ON e.user_id = su.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts_us >= su.s_ts
        |       GROUP BY e.user_id),
        |users AS (SELECT su.user_id,
        |    CASE WHEN fp.p_ts IS NOT NULL
        |         THEN (fp.p_ts - su.s_ts) // 3600000000 END AS t_event,
        |    (h.h_ts - su.s_ts) // 3600000000 AS t_censor
        |  FROM su LEFT JOIN fp ON fp.user_id = su.user_id CROSS JOIN h),
        |ux AS (SELECT user_id, COALESCE(t_event, t_censor) AS t_exit,
        |    CASE WHEN t_event IS NOT NULL THEN 1 ELSE 0 END AS is_event FROM users),
        |bx AS (SELECT t_exit, CAST(count(*) AS BIGINT) AS n_exit,
        |         CAST(sum(is_event) AS BIGINT) AS d FROM ux GROUP BY t_exit),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM ux),
        |rk AS (SELECT t_exit, d,
        |    CAST(tot.n_total - COALESCE(sum(n_exit) OVER (ORDER BY t_exit
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        |  FROM bx CROSS JOIN tot),
        |evt AS (SELECT t_exit, n_risk, d,
        |          CAST((d * 1000000) // n_risk AS BIGINT) AS hazard_x1e6
        |        FROM rk WHERE d > 0)
        |SELECT t_exit AS t_hours, CAST(n_risk AS BIGINT) AS n_risk, d, hazard_x1e6,
        |  CAST(sum(hazard_x1e6) OVER (ORDER BY t_exit
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_hazard_x1e6
        |FROM evt ORDER BY t_hours""".stripMargin,

    "q_rolling_median" -> (
      s"""WITH ev AS ($purchaseCentsSql),
        |daily AS (SELECT day, CAST(sum(cents) AS BIGINT) AS cents FROM ev GROUP BY day),""".stripMargin +
      """
        |r AS (SELECT day, cents,
        |        list_sort(list(cents) OVER (ORDER BY day
        |          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS wl
        |      FROM daily)
        |SELECT day, cents, wl[(len(wl) + 1) // 2] AS med7,
        |  CAST(len(wl) AS INT) AS w_n, cents - wl[(len(wl) + 1) // 2] AS dev
        |FROM r ORDER BY day""".stripMargin),

    "q_locf" -> (
      s"""WITH ev AS ($purchaseCentsSql),
        |daily AS (SELECT user_id % 16 AS bucket, day,
        |            CAST(sum(cents) AS BIGINT) AS cents_raw
        |          FROM ev GROUP BY bucket, day),""".stripMargin +
      """
        |sp AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
        |grid AS (SELECT b.i AS bucket, g.day
        |         FROM range(0, 16) b(i),
        |              (SELECT unnest(range(d0, d1 + 1)) AS day FROM sp) g),
        |j AS (SELECT g.bucket, g.day, daily.cents_raw
        |      FROM grid g LEFT JOIN daily
        |        ON daily.bucket = g.bucket AND daily.day = g.day),
        |f AS (SELECT bucket, day, cents_raw,
        |        last_value(cents_raw IGNORE NULLS) OVER (
        |          PARTITION BY bucket ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_locf
        |      FROM j)
        |SELECT CAST(bucket AS BIGINT) AS bucket, day, cents_raw, cents_locf,
        |  CAST(CASE WHEN cents_raw IS NULL AND cents_locf IS NOT NULL
        |       THEN 1 ELSE 0 END AS INT) AS filled
        |FROM f ORDER BY bucket, day""".stripMargin),

    "q_runs_test" -> (
      s"""WITH ev AS ($purchaseCentsSql),
        |daily AS (SELECT day, CAST(sum(cents) AS BIGINT) AS x FROM ev GROUP BY day),""".stripMargin +
      """
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
        |r AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM daily),
        |med AS (SELECT x AS med FROM r, t WHERE rn = (n_days + 1) // 2),
        |sg AS (SELECT day, CASE WHEN x > med THEN 1 ELSE -1 END AS sgn
        |       FROM daily, med WHERE x <> med),
        |c AS (SELECT sgn,
        |        CASE WHEN lag(sgn) OVER (ORDER BY day) IS NULL
        |               OR sgn <> lag(sgn) OVER (ORDER BY day)
        |             THEN 1 ELSE 0 END AS chg
        |      FROM sg),
        |a AS (SELECT
        |        CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |        CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |        CAST(sum(chg) AS BIGINT) AS n_runs
        |      FROM c),
        |b AS (SELECT n1, n2, n_runs,
        |        (2 * n1 * n2 * 1000000) // (n1 + n2) + 1000000 AS mu_x1e6,
        |        CAST(CAST(2 * n1 * n2 AS HUGEINT) * (2 * n1 * n2 - n1 - n2) * 1000000000000
        |          // (CAST(n1 + n2 AS HUGEINT) * (n1 + n2) * (n1 + n2 - 1)) AS BIGINT) AS var_x1e12
        |      FROM a),
        |e AS (SELECT *, CAST(floor(sqrt(CAST(var_x1e12 AS DOUBLE))) AS BIGINT) AS sd_x1e6 FROM b)
        |SELECT n1, n2, n_runs, mu_x1e6, var_x1e12, sd_x1e6,
        |  (abs(n_runs * 1000000 - mu_x1e6) * 1000) // sd_x1e6 AS z_abs_x1e3,
        |  CAST(CASE WHEN n_runs * 1000000 < mu_x1e6 THEN -1
        |            WHEN n_runs * 1000000 > mu_x1e6 THEN 1 ELSE 0 END AS INT) AS z_sign
        |FROM e""".stripMargin),

    "q_dau_mau" ->
      """WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |l AS (SELECT user_id, day,
        |        lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev FROM ud),
        |m AS (SELECT user_id, day,
        |        CASE WHEN prev IS NULL OR day - prev > 29 THEN 1 ELSE 0 END AS brk FROM l),
        |si AS (SELECT user_id, day,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl FROM m),
        |isl AS (SELECT user_id, isl, min(day) AS start, max(day) + 29 AS end29
        |        FROM si GROUP BY user_id, isl),
        |deltas AS (SELECT start AS day, 1 AS delta FROM isl
        |           UNION ALL SELECT end29 + 1, -1 FROM isl),
        |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
        |alld AS (SELECT day, CAST(sum(delta) AS BIGINT) AS delta FROM
        |         (SELECT day, delta FROM deltas
        |          UNION ALL SELECT day, 0 FROM dau) GROUP BY day),
        |c AS (SELECT day, CAST(sum(delta) OVER (ORDER BY day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS mau30
        |      FROM alld)
        |SELECT d.day, d.dau, c.mau30,
        |  (d.dau * 10000) // c.mau30 AS stickiness_x1e4
        |FROM dau d JOIN c USING (day) ORDER BY d.day""".stripMargin,

    "q_sessionize" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
        |l AS (SELECT user_id, ts_us, event_id,
        |        lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_ts
        |      FROM ev),
        |m AS (SELECT user_id, ts_us, event_id,
        |        CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000
        |             THEN 1 ELSE 0 END AS new_sess
        |      FROM l),
        |sx AS (SELECT user_id, ts_us,
        |        sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |      FROM m),
        |ps AS (SELECT user_id, sess_id, CAST(count(*) AS BIGINT) AS n_ev,
        |        max(ts_us) - min(ts_us) AS dur_us
        |      FROM sx GROUP BY user_id, sess_id)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(n_ev) AS BIGINT) AS n_events,
        |  max(n_ev) AS max_session_events,
        |  CAST(max(dur_us) // 1000000 AS BIGINT) AS longest_session_s,
        |  CAST(sum(n_ev) * 100 // count(*) AS BIGINT) AS events_per_session_x100
        |FROM ps GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_ttest" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents
        |  FROM events GROUP BY user_id),
        |pa AS (SELECT cents,
        |         ((user_id * 2654435761) % 4294967296) // 2147483648 AS arm FROM pu),
        |m AS (SELECT
        |  CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |  CAST(sum(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS BIGINT) AS sum_cents_a,
        |  CAST(sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS BIGINT) AS sum_cents_b,
        |  CAST(sum(CASE WHEN arm = 0 THEN CAST(cents AS HUGEINT) * cents ELSE 0 END)
        |    AS DECIMAL(38,0)) AS ssq_a,
        |  CAST(sum(CASE WHEN arm = 1 THEN CAST(cents AS HUGEINT) * cents ELSE 0 END)
        |    AS DECIMAL(38,0)) AS ssq_b
        |  FROM pa),
        |d AS (SELECT *,
        |  (sum_cents_a * 10000) // n_a - (sum_cents_b * 10000) // n_b AS mean_diff_x1e4,
        |  CAST((CAST(n_a AS HUGEINT) * CAST(ssq_a AS HUGEINT)
        |      - CAST(sum_cents_a AS HUGEINT) * sum_cents_a) * 1000000
        |    // (CAST(n_a AS HUGEINT) * (n_a - 1) * n_a) AS BIGINT)
        |  + CAST((CAST(n_b AS HUGEINT) * CAST(ssq_b AS HUGEINT)
        |      - CAST(sum_cents_b AS HUGEINT) * sum_cents_b) * 1000000
        |    // (CAST(n_b AS HUGEINT) * (n_b - 1) * n_b) AS BIGINT) AS se2_x1e6
        |  FROM m),
        |e AS (SELECT *,
        |  CAST(floor(sqrt(CAST(se2_x1e6 AS DOUBLE))) AS BIGINT) AS se_x1e3
        |  FROM d)
        |SELECT n_a, n_b, sum_cents_a, sum_cents_b,
        |  CAST(ssq_a // 1000000000000000000 AS BIGINT) AS ssq_a_hi,
        |  CAST(ssq_a % 1000000000000000000 AS BIGINT) AS ssq_a_lo,
        |  CAST(ssq_b // 1000000000000000000 AS BIGINT) AS ssq_b_hi,
        |  CAST(ssq_b % 1000000000000000000 AS BIGINT) AS ssq_b_lo,
        |  mean_diff_x1e4, se2_x1e6, se_x1e3,
        |  (abs(mean_diff_x1e4) * 100) // se_x1e3 AS t_abs_x1e3,
        |  CAST(CASE WHEN mean_diff_x1e4 < 0 THEN -1
        |            WHEN mean_diff_x1e4 > 0 THEN 1 ELSE 0 END AS INT) AS t_sign
        |FROM e""".stripMargin,

    "q_ks_test" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents
        |  FROM events GROUP BY user_id),
        |pa AS (SELECT cents,
        |         ((user_id * 2654435761) % 4294967296) // 2147483648 AS arm FROM pu),
        |c AS (SELECT cents,
        |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |      FROM pa GROUP BY cents),
        |cum AS (SELECT cents,
        |        CAST(sum(ca) OVER (ORDER BY cents
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
        |        CAST(sum(cb) OVER (ORDER BY cents
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b
        |      FROM c),
        |t AS (SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |      FROM pa),
        |d AS (SELECT max(t.n_a) AS n_a, max(t.n_b) AS n_b,
        |        max(abs(cum_a * t.n_b - cum_b * t.n_a)) AS d_num
        |      FROM cum CROSS JOIN t)
        |SELECT n_a, n_b, d_num,
        |  (d_num * 1000000) // (n_a * n_b) AS d_x1e6
        |FROM d""".stripMargin,

    "q_mannwhitney" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents
        |  FROM events GROUP BY user_id),
        |pa AS (SELECT cents,
        |         ((user_id * 2654435761) % 4294967296) // 2147483648 AS arm FROM pu),
        |c AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt,
        |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca
        |      FROM pa GROUP BY cents),
        |cum AS (SELECT cents, cnt, ca,
        |        CAST(sum(cnt) OVER (ORDER BY cents
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |      FROM c),
        |r AS (SELECT CAST(sum(ca * (2 * (cum - cnt + 1) + cnt - 1)) AS BIGINT) AS r1_x2
        |      FROM cum),
        |t AS (SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |      FROM pa)
        |SELECT n_a, n_b, r1_x2,
        |  r1_x2 - n_a * (n_a + 1) AS u1_x2,
        |  2 * n_a * n_b - (r1_x2 - n_a * (n_a + 1)) AS u2_x2,
        |  n_a * n_b AS u_mean_x2,
        |  CAST(sign(r1_x2 - n_a * (n_a + 1) - n_a * n_b) AS INT) AS direction
        |FROM r CROSS JOIN t""".stripMargin,

    "q_xcorr" ->
      """WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS day, event_type FROM events),
        |sp AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
        |grid AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM sp),
        |ac AS (SELECT day, CAST(count(*) AS BIGINT) AS n FROM ev
        |       WHERE event_type = 'click' GROUP BY day),
        |pc AS (SELECT day, CAST(count(*) AS BIGINT) AS n FROM ev
        |       WHERE event_type = 'purchase' GROUP BY day),
        |a AS (SELECT g.day, COALESCE(ac.n, 0) AS x FROM grid g
        |      LEFT JOIN ac ON ac.day = g.day),
        |b AS (SELECT g.day AS bday, COALESCE(pc.n, 0) AS y FROM grid g
        |      LEFT JOIN pc ON pc.day = g.day),
        |l AS (SELECT a.day, a.x, lg.i AS lag FROM a, range(-3, 4) lg(i)),
        |j AS (SELECT l.lag, l.x, b.y FROM l JOIN b ON b.bday = l.day + l.lag)
        |SELECT CAST(lag AS INT) AS lag, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
        |  CAST(sum(x * y) AS BIGINT) AS sum_xy,
        |  CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS cov_num
        |FROM j GROUP BY lag ORDER BY lag""".stripMargin,

    "q_streaks" ->
      """WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |isl AS (
        |  SELECT user_id,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM ud),
        |g AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
        |      FROM isl GROUP BY user_id, grp)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  CAST(count(*) AS BIGINT) AS n_islands,
        |  max(len) AS longest_streak
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_funnel3" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |w1 AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts_us END) AS v_ts
        |  FROM ev GROUP BY user_id),
        |w2 AS (
        |  SELECT e.user_id, min(e.ts_us) AS c_ts
        |  FROM ev e JOIN w1 ON w1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts_us >= w1.v_ts
        |  GROUP BY e.user_id),
        |w3 AS (
        |  SELECT e.user_id, min(e.ts_us) AS p_ts
        |  FROM ev e JOIN w2 ON w2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us >= w2.c_ts
        |  GROUP BY e.user_id)
        |SELECT w1.user_id, w1.v_ts, w2.c_ts, w3.p_ts,
        |  CAST(1 + (CASE WHEN w2.c_ts IS NULL THEN 0 ELSE 1 END)
        |         + (CASE WHEN w3.p_ts IS NULL THEN 0 ELSE 1 END) AS INT) AS steps
        |FROM w1
        |LEFT JOIN w2 ON w2.user_id = w1.user_id
        |LEFT JOIN w3 ON w3.user_id = w1.user_id
        |WHERE w1.v_ts IS NOT NULL
        |ORDER BY w1.user_id""".stripMargin,

    "q_asof_nearest" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type FROM events),
        |c AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts_us AS p_ts FROM ev WHERE event_type = 'purchase'),
        |b AS (SELECT c.event_id, max(p.p_ts) AS b_ts
        |      FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.p_ts <= c.ts_us
        |      GROUP BY c.event_id),
        |f AS (SELECT c.event_id, min(p.p_ts) AS f_ts
        |      FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.p_ts >= c.ts_us
        |      GROUP BY c.event_id),
        |n AS (SELECT c.event_id, c.user_id, c.ts_us,
        |        CASE WHEN b.b_ts IS NULL THEN f.f_ts
        |             WHEN f.f_ts IS NULL THEN b.b_ts
        |             WHEN c.ts_us - b.b_ts <= f.f_ts - c.ts_us THEN b.b_ts
        |             ELSE f.f_ts END AS np
        |      FROM c JOIN b USING (event_id) JOIN f USING (event_id))
        |SELECT event_id, user_id, ts_us, np AS nearest_purchase_us,
        |  abs(np - ts_us) AS dist_us
        |FROM n ORDER BY event_id""".stripMargin,

    "q_funnel_window" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |w1 AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts_us END) AS v_ts
        |  FROM ev GROUP BY user_id),
        |w2 AS (
        |  SELECT e.user_id, min(e.ts_us) AS c_ts
        |  FROM ev e JOIN w1 ON w1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts_us >= w1.v_ts
        |    AND e.ts_us <= w1.v_ts + 3600000000
        |  GROUP BY e.user_id),
        |w3 AS (
        |  SELECT e.user_id, min(e.ts_us) AS p_ts
        |  FROM ev e JOIN w2 ON w2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us >= w2.c_ts
        |    AND e.ts_us <= w2.c_ts + 86400000000
        |  GROUP BY e.user_id)
        |SELECT w1.user_id, w1.v_ts, w2.c_ts, w3.p_ts,
        |  CAST(1 + (CASE WHEN w2.c_ts IS NULL THEN 0 ELSE 1 END)
        |         + (CASE WHEN w3.p_ts IS NULL THEN 0 ELSE 1 END) AS INT) AS steps
        |FROM w1
        |LEFT JOIN w2 ON w2.user_id = w1.user_id
        |LEFT JOIN w3 ON w3.user_id = w1.user_id
        |WHERE w1.v_ts IS NOT NULL
        |ORDER BY w1.user_id""".stripMargin,

    "q_interval_coverage" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) AS ts_us FROM events),
        |pts AS (
        |  SELECT event_type, ts_us AS t, CAST(1 AS BIGINT) AS delta FROM ev
        |  UNION ALL
        |  SELECT event_type, ts_us + 3600000000, CAST(-1 AS BIGINT) FROM ev),
        |run AS (
        |  SELECT event_type, t,
        |    CAST(sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS active,
        |    lead(t) OVER (PARTITION BY event_type ORDER BY t, delta) AS next_t
        |  FROM pts)
        |SELECT event_type, CAST(sum(next_t - t) AS BIGINT) AS covered_us
        |FROM run WHERE active > 0 AND next_t IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_paths" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
        |rk AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
        |  FROM ev),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM rk WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    "q_cohort_matrix" ->
      """WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |c AS (SELECT user_id, min(day) AS c_day FROM ud GROUP BY user_id),
        |s AS (SELECT c_day, CAST(count(DISTINCT user_id) AS BIGINT) AS cohort_n
        |      FROM c GROUP BY c_day),
        |g AS (
        |  SELECT c.c_day, ud.day - c.c_day AS day_offset,
        |    CAST(count(DISTINCT ud.user_id) AS BIGINT) AS n_active
        |  FROM ud JOIN c ON ud.user_id = c.user_id
        |  GROUP BY c.c_day, ud.day - c.c_day)
        |SELECT g.c_day, g.day_offset, g.n_active, s.cohort_n,
        |  g.n_active * 1000 // s.cohort_n AS retention_pm
        |FROM g JOIN s ON s.c_day = g.c_day
        |ORDER BY g.c_day, g.day_offset""".stripMargin,

    "q_ab_lift" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
        |    sum(CASE WHEN event_type = 'purchase'
        |             THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS purchase_cents
        |  FROM events GROUP BY user_id)
        |SELECT ((user_id * 2654435761) % 4294967296) // 2147483648 AS arm,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(converted) AS BIGINT) AS n_converted,
        |  CAST(sum(purchase_cents) AS BIGINT) AS value_cents,
        |  CAST(sum(converted) AS BIGINT) * 10000 // CAST(count(*) AS BIGINT) AS conv_x1e4,
        |  CAST(sum(purchase_cents) AS BIGINT) // CAST(count(*) AS BIGINT) AS value_per_user_cents
        |FROM pu GROUP BY arm ORDER BY arm""".stripMargin,

    "q_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY day),
        |t AS (
        |  SELECT day, n, day % 7 AS dow,
        |    (CAST(sum(n) OVER (ORDER BY day
        |       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) * 100)
        |      // CAST(count(*) OVER (ORDER BY day
        |       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS trend_x100
        |  FROM daily),
        |t2 AS (SELECT *, n * 100 - trend_x100 AS detr_x100 FROM t),
        |se AS (
        |  SELECT dow,
        |    CAST(sign(sum(detr_x100)) AS BIGINT)
        |      * (abs(CAST(sum(detr_x100) AS BIGINT))
        |         // CAST(count(*) AS BIGINT)) AS seas_x100
        |  FROM t2 GROUP BY dow)
        |SELECT t2.day, t2.n, t2.trend_x100, se.seas_x100,
        |  t2.n * 100 - t2.trend_x100 - se.seas_x100 AS resid_x100
        |FROM t2 JOIN se ON se.dow = t2.dow
        |ORDER BY t2.day""".stripMargin,

    "q_max_gap" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS ts_us, event_id,
        |    epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |intra AS (
        |  SELECT event_type,
        |    ts_us - lag(ts_us) OVER (PARTITION BY event_type, day
        |      ORDER BY ts_us, event_id) AS gap
        |  FROM e),
        |days AS (
        |  SELECT event_type, day, min(ts_us) AS first_us, max(ts_us) AS last_us,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM e GROUP BY event_type, day),
        |bnd AS (
        |  SELECT event_type,
        |    first_us - lag(last_us) OVER (PARTITION BY event_type
        |      ORDER BY day) AS gap
        |  FROM days),
        |g AS (
        |  SELECT event_type, gap FROM intra WHERE gap IS NOT NULL
        |  UNION ALL SELECT event_type, gap FROM bnd WHERE gap IS NOT NULL),
        |nt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events
        |       FROM days GROUP BY event_type)
        |SELECT g.event_type, nt.n_events,
        |  CAST(count(*) AS BIGINT) AS n_gaps,
        |  CAST(max(g.gap) AS BIGINT) AS max_gap_us,
        |  CAST(sum(CASE WHEN g.gap > 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS gaps_over_1h
        |FROM g JOIN nt ON nt.event_type = g.event_type
        |GROUP BY g.event_type, nt.n_events
        |ORDER BY g.event_type""".stripMargin,

    "q_rate_limit" ->
      """WITH pm AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY user_id, day),
        |u AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(n) AS BIGINT) AS n_events,
        |    CAST(max(n) AS BIGINT) AS peak_day,
        |    CAST(sum(CASE WHEN n > 5 THEN n - 5 ELSE 0 END) AS BIGINT) AS n_dropped,
        |    CAST(sum(CASE WHEN n > 5 THEN 1 ELSE 0 END) AS BIGINT) AS days_over
        |  FROM pm GROUP BY user_id)
        |SELECT user_id, n_days, n_events, peak_day, n_dropped,
        |  days_over, (n_dropped * 1000000) // n_events AS drop_ppm
        |FROM u ORDER BY n_dropped DESC, user_id LIMIT 20""".stripMargin,

    "q_error_budget" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS e
        |  FROM events GROUP BY day),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM daily)
        |SELECT day, n, e,
        |  (e * 1000000) // n AS rate_ppm,
        |  ((e * 1000000) // n) // 100 AS burn_x100,
        |  CAST(sum(e) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_e,
        |  (CAST(sum(e) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    * 1000000) // (t.n_tot // 100) AS budget_used_ppm
        |FROM daily CROSS JOIN t ORDER BY day""".stripMargin,

    "q_dispersion" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY event_type, day),
        |s AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(x) AS BIGINT) AS n_events,
        |    sum(CAST(x AS HUGEINT) * x) AS sx2
        |  FROM daily GROUP BY event_type)
        |SELECT event_type, n_days, n_events,
        |  (n_events * 100) // n_days AS mean_x100,
        |  CAST(((CAST(n_days AS HUGEINT) * sx2
        |      - CAST(n_events AS HUGEINT) * n_events) * 1000000)
        |    // (CAST(n_days AS HUGEINT) * n_events) AS BIGINT) AS fano_x1e6,
        |  CAST(CASE WHEN ((CAST(n_days AS HUGEINT) * sx2
        |      - CAST(n_events AS HUGEINT) * n_events) * 1000000)
        |    // (CAST(n_days AS HUGEINT) * n_events) > 1000000
        |    THEN 1 ELSE 0 END AS INT) AS overdispersed
        |FROM s ORDER BY event_type""".stripMargin,

    "q_did" ->
      """WITH e AS (
        |  SELECT user_id % 2 = 1 AS treat,
        |    epoch_us(ts) // 86400000000 >= 19738 AS post,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN treat AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_tpre,
        |    CAST(sum(CASE WHEN treat AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_tpost,
        |    CAST(sum(CASE WHEN NOT treat AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_cpre,
        |    CAST(sum(CASE WHEN NOT treat AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_cpost,
        |    CAST(sum(CASE WHEN treat AND NOT post THEN cents ELSE 0 END) AS BIGINT) AS s_tpre,
        |    CAST(sum(CASE WHEN treat AND post THEN cents ELSE 0 END) AS BIGINT) AS s_tpost,
        |    CAST(sum(CASE WHEN NOT treat AND NOT post THEN cents ELSE 0 END) AS BIGINT) AS s_cpre,
        |    CAST(sum(CASE WHEN NOT treat AND post THEN cents ELSE 0 END) AS BIGINT) AS s_cpost
        |  FROM e),
        |m AS (
        |  SELECT n_tpre, n_tpost, n_cpre, n_cpost,
        |    (s_tpre * 100) // n_tpre AS m_tpre_x100,
        |    (s_tpost * 100) // n_tpost AS m_tpost_x100,
        |    (s_cpre * 100) // n_cpre AS m_cpre_x100,
        |    (s_cpost * 100) // n_cpost AS m_cpost_x100
        |  FROM c)
        |SELECT *,
        |  abs((m_tpost_x100 - m_tpre_x100) - (m_cpost_x100 - m_cpre_x100)) AS did_abs_x100,
        |  CAST(sign((m_tpost_x100 - m_tpre_x100) - (m_cpost_x100 - m_cpre_x100)) AS INT)
        |    AS did_sign
        |FROM m""".stripMargin,

    "q_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |s2 AS (
        |  SELECT 'mod2' AS scheme,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM u),
        |s5 AS (
        |  SELECT 'mod5' AS scheme,
        |    CAST(sum(CASE WHEN user_id % 5 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN user_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM u),
        |b AS (SELECT * FROM s2 UNION ALL SELECT * FROM s5)
        |SELECT scheme, n_a, n_b,
        |  ((n_a - n_b) * (n_a - n_b) * 1000000) // (n_a + n_b) AS chi2_x1e6,
        |  CAST(CASE WHEN ((n_a - n_b) * (n_a - n_b) * 1000000) // (n_a + n_b)
        |    > 3841000 THEN 1 ELSE 0 END AS INT) AS srm
        |FROM b ORDER BY scheme""".stripMargin,

    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY day),
        |tot AS (SELECT CAST(sum(x) AS BIGINT) AS s_tot,
        |               CAST(count(*) AS BIGINT) AS n_days FROM daily),
        |c AS (
        |  SELECT day, x,
        |    tot.n_days * sum(x) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - (row_number() OVER (ORDER BY day)) * tot.s_tot AS cusum
        |  FROM daily CROSS JOIN tot),
        |p AS (SELECT max(abs(cusum)) AS peak FROM c)
        |SELECT day, x, CAST(cusum AS BIGINT) AS cusum,
        |  abs(cusum) = p.peak AS is_changepoint
        |FROM c CROSS JOIN p ORDER BY day""".stripMargin,

    "q_markov" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
        |nx AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS to_type
        |  FROM ev),
        |c AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM nx WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
        |SELECT from_type, to_type, n,
        |  CAST(n * 1000000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_x1e6
        |FROM c ORDER BY from_type, to_type""".stripMargin,

    "q_seq_pairs" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
        |f AS (
        |  SELECT user_id, event_type, ts_us AS fts, event_id AS fid FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY user_id, event_type ORDER BY ts_us, event_id) AS rn
        |    FROM ev) WHERE rn = 1),
        |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM f),
        |tn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY event_type),
        |sup AS (
        |  SELECT x.event_type AS type_a, y.event_type AS type_b,
        |    CAST(count(*) AS BIGINT) AS support
        |  FROM f x JOIN f y ON y.user_id = x.user_id
        |    AND x.event_type <> y.event_type
        |    AND (x.fts < y.fts OR (x.fts = y.fts AND x.fid < y.fid))
        |  GROUP BY 1, 2)
        |SELECT s.type_a, s.type_b, s.support, a.n AS n_a, b.n AS n_b,
        |  (s.support * 1000000) // a.n AS conf_x1e6,
        |  CAST((CAST(s.support AS HUGEINT) * nu.n_users * 1000000)
        |    // (CAST(a.n AS HUGEINT) * b.n) AS BIGINT) AS lift_x1e6
        |FROM sup s
        |JOIN tn a ON a.event_type = s.type_a
        |JOIN tn b ON b.event_type = s.type_b
        |CROSS JOIN nu
        |ORDER BY s.support DESC, s.type_a, s.type_b""".stripMargin,

    "q_mode_rolling" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
        |k AS (
        |  SELECT user_id, ts_us, event_id,
        |    lpad(CAST(1000000000000 - count(*) OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS VARCHAR), 13, '0') || event_type AS kk
        |  FROM ev),
        |m AS (
        |  SELECT user_id, ts_us, event_id,
        |    min(kk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mkey
        |  FROM k)
        |SELECT user_id, ts_us, event_id, substring(mkey, 14) AS mode_type,
        |  1000000000000 - CAST(substring(mkey, 1, 13) AS BIGINT) AS mode_n
        |FROM m ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q_scd2" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
        |ch AS (
        |  SELECT user_id, event_type AS state, ts_us AS valid_from_us,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
        |  FROM ev),
        |seg AS (
        |  SELECT user_id, state, valid_from_us FROM ch
        |  WHERE prev IS NULL OR prev <> state)
        |SELECT user_id, state, valid_from_us,
        |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us) AS valid_to_us,
        |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us) IS NULL AS is_current
        |FROM seg ORDER BY user_id, valid_from_us""".stripMargin,

    "q_funnel" ->
      """WITH ev AS (SELECT epoch_us(ts) AS ts_us, user_id, event_type FROM events),
        |fc AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'click' THEN ts_us END) AS first_click_us
        |  FROM ev GROUP BY user_id),
        |j AS (
        |  SELECT f.user_id, f.first_click_us,
        |    min(CASE WHEN e.event_type = 'purchase'
        |             AND e.ts_us >= f.first_click_us
        |             AND e.ts_us <= f.first_click_us + 86400000000
        |             THEN e.ts_us END) AS first_purchase_us
        |  FROM fc f JOIN ev e ON e.user_id = f.user_id
        |  WHERE f.first_click_us IS NOT NULL
        |  GROUP BY f.user_id, f.first_click_us)
        |SELECT user_id, first_click_us, first_purchase_us,
        |  first_purchase_us IS NOT NULL AS converted
        |FROM j ORDER BY user_id""".stripMargin,

    "q_range_join" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, value FROM events),
        |inc AS (
        |  SELECT event_id AS incident_id, ts_us - 600000000 AS lo, ts_us + 600000000 AS hi
        |  FROM ev WHERE event_id % 50 = 0)
        |SELECT i.incident_id, count(*) AS n_events,
        |  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM inc i JOIN ev e ON e.ts_us >= i.lo AND e.ts_us <= i.hi
        |GROUP BY i.incident_id ORDER BY i.incident_id""".stripMargin,

    "q_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |c AS (SELECT user_id, min(day) AS c_day FROM ud GROUP BY user_id)
        |SELECT c.c_day,
        |  CAST(count(DISTINCT ud.user_id) AS BIGINT) AS n_users,
        |  CAST(count(DISTINCT CASE WHEN ud.day = c.c_day + 1 THEN ud.user_id END) AS BIGINT) AS n_day1,
        |  CAST(count(DISTINCT CASE WHEN ud.day = c.c_day + 7 THEN ud.user_id END) AS BIGINT) AS n_day7
        |FROM ud JOIN c ON ud.user_id = c.user_id
        |GROUP BY c.c_day ORDER BY c.c_day""".stripMargin,

    "q_concurrency" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) AS ts_us FROM events),
        |pts AS (
        |  SELECT event_type, ts_us AS t, CAST(1 AS BIGINT) AS delta FROM ev
        |  UNION ALL
        |  SELECT event_type, ts_us + 3600000000, CAST(-1 AS BIGINT) FROM ev),
        |run AS (
        |  SELECT event_type,
        |    CAST(sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS load
        |  FROM pts)
        |SELECT event_type, max(load) AS peak_concurrency,
        |  CAST(count(*) / 2 AS BIGINT) AS n_events
        |FROM run GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_asof_forward" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type FROM events),
        |c AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts_us AS p_ts FROM ev WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts_us, min(p.p_ts) AS next_purchase_us
        |FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.p_ts >= c.ts_us
        |GROUP BY c.event_id, c.user_id, c.ts_us
        |ORDER BY c.event_id""".stripMargin,

    "q_asof_join" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type FROM events),
        |clicks AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click'),
        |purchases AS (SELECT user_id, ts_us AS p_ts FROM ev WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts_us, p.p_ts AS last_purchase_us
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts_us >= p.p_ts
        |ORDER BY c.event_id""".stripMargin)
}
