package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StructType}

/** Per-event input to the stateful sessionizer. */
case class Ev(user_id: Long, ts_us: Long, value: Double)

/** Mutable open-session state for flatMapGroupsWithState. */
case class Sess(var start_us: Long, var end_us: Long, var n: Long, var sum: Double)

/** Per-event input to the latest-state maintainer. */
case class LEv(user_id: Long, ts_us: Long, event_id: Long,
               event_type: String, value: Double)

/** Mutable per-user latest-state: the (ts, id)-max event plus lifetime
  * counters. `sum_cents` is kept integral so the cross-batch fold is
  * order-independent and matches the batch DECIMAL(18,2) sum exactly.
  */
case class Latest(var ts_us: Long, var event_id: Long, var event_type: String,
                  var value: Double, var n: Long, var sum_cents: Long)

/** Per-event input to the lateness auditor. */
case class AEv(user_id: Long, ts_us: Long, event_id: Long)

/** Per-user lateness-audit state: every (arrival, event_id, ts) seen so
  * far — the audit is ORDER-SENSITIVE (lateness is relative to the
  * running event-time high-water mark in arrival order), so the state
  * keeps the raw sequence and each batch re-derives the audit from it,
  * making the emitted row independent of cross-batch arrival split
  * (the [[FunnelSt]] replay discipline). A production deployment whose
  * transport preserves arrival order per key would keep only the hwm.
  */
case class LateSt(var evs: Seq[(Long, Long, Long)])

/** Per-event input to the funnel state machine. */
case class FEv(user_id: Long, ts_us: Long, event_type: String)

/** Per-user funnel state: every candidate step event seen so far, plus a
  * monotone batch counter so parity consumers resolve the current row as
  * argmax n_seen. Keeping the raw step timestamps makes the recurrence
  * exactly order-independent under ANY cross-batch arrival order (a
  * late-arriving earlier view legally shifts both attribution windows; a
  * min-only state would have already discarded the clicks the new window
  * admits). A production variant bounds these vectors by watermark
  * eviction — here they are per-user event counts, the same order of
  * state the sessionizer holds.
  */
case class FunnelSt(var views: Seq[Long], var clicks: Seq[Long],
                    var purchases: Seq[Long], var n_seen: Long)

/** Per-event input to the 2-sequence first-occurrence maintainer. */
case class SEv(user_id: Long, ts_us: Long, event_id: Long, event_type: String)

/** Per-user 2-sequence state: the FIRST (ts, id) per event type — the
  * exact state a streaming sequential-pattern miner maintains, bounded
  * by the type domain per user. The first-occurrence merge is a
  * per-type min — order-independent across any micro-batch arrival
  * split, which is what makes the streamed pair sets ≡ the batch face.
  */
case class SeqSt(var firsts: Map[String, (Long, Long)], var n: Long)

/** [[LEv]] carrying the watermark timestamp column: EventTimeTimeout
  * requires the watermarked column to SURVIVE to the stateful operator
  * (UnsupportedOperationChecker), so the TTL faces keep it in the row
  * and ignore it in the merge.
  */
case class LEvT(user_id: Long, ts_us: Long, event_id: Long,
  event_type: String, value: Double, tsx: java.sql.Timestamp)

/** [[SEv]] carrying the watermark timestamp column (see [[LEvT]]). */
case class SEvT(user_id: Long, ts_us: Long, event_id: Long,
  event_type: String, tsx: java.sql.Timestamp)

/** [[SeqSt]] plus the entity's LATEST event ts — the TTL face's
  * eviction anchor. firsts are per-type minima, so the latest-activity
  * timestamp must be carried explicitly: deriving it from the map
  * would let a late-arriving earlier event LOWER the timeout.
  */
case class SeqTtlSt(var firsts: Map[String, (Long, Long)], var n: Long,
  var last_ts: Long)

/** Token-bucket state: last event ts, credit balance (µs of event
  * time), allowed/denied counters — one row per entity, the bucket a
  * rate-limiting gateway holds.
  */
case class RlSt(var pt: Long, var cr: Long, var na: Long, var nd: Long)

/** [[AEv]] carrying the watermark timestamp column (see [[LEvT]]). */
case class AEvT(user_id: Long, ts_us: Long, event_id: Long,
  tsx: java.sql.Timestamp)

/** Per-(user, segment) CDC compaction state: the [[CdcSt]] fields
  * scoped to the CURRENT segment (since the last flush). The segment
  * is identified by its FIRST event ts — derived from data, never a
  * counter, so clearing the state on flush loses nothing (a counter
  * would collide with flushed segments after a restart).
  */
case class CdcCmpSt(var seg_start: Long, var ts_us: Long, var event_id: Long,
  var event_type: String, var n_upserts: Long, var n_deletes: Long)

/** Per-event input to the KMV sketch maintainer. */
case class KEv(event_type: String, h: Long)

/** Per-type KMV state: the ≤k smallest distinct hashes (sorted) plus a
  * monotone event counter. The bottom-k merge is a set operation —
  * order-independent across any micro-batch arrival order, which is
  * what makes the streaming sketch ≡ the batch BottomK aggregate.
  */
case class KmvSt(var hs: Seq[Long], var n: Long)

/** Per-user CDC state for the tombstone maintainer. */
case class CdcSt(var ts_us: Long, var event_id: Long, var event_type: String,
                 var n_upserts: Long, var n_deletes: Long)

/** Structured-Streaming operators over `events` (SURVEY §2.7).
  *
  * Each transform is written against a plain DataFrame so the SAME code
  * runs in batch (the oracle-gated path) and under `readStream` (pinned
  * by StreamingSpec with a memory sink). `ts_us` is epoch micros BIGINT
  * (events.ts is TIMESTAMP(NANOS) parquet → LongType nanos).
  */
object EventStreams {

  /** Normalize the raw events table: ts (nanos long or timestamp) → ts_us. */
  def normalize(ev: DataFrame): DataFrame = {
    val tsUs = ev.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case _        => unix_micros(col("ts"))
    }
    ev.select(col("event_id"), tsUs.as("ts_us"), col("user_id"),
      col("event_type"), col("value"))
  }

  /** [[normalize]] additionally carrying the raw props JSON column
    * (for consumers that extract typed fields from it).
    */
  def normalizeProps(ev: DataFrame): DataFrame = {
    val tsUs = ev.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case _        => unix_micros(col("ts"))
    }
    ev.select(col("event_id"), tsUs.as("ts_us"), col("user_id"),
      col("event_type"), col("value"), col("props"))
  }

  /** Tumbling 1-hour window count/sum per event type. In streaming this
    * runs with a watermark on the event time; state is one counter row
    * per (window, type).
    */
  def windowAgg(ev: DataFrame, watermark: Boolean = false): DataFrame = {
    val withTs = ev.withColumn("tsx", timestamp_micros(col("ts_us")))
    val marked = if (watermark) withTs.withWatermark("tsx", "1 hour") else withTs
    marked
      .groupBy(window(col("tsx"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Sliding 2-hour window (1-hour slide) count/sum per event type —
    * each event lands in exactly windowLen/slide = 2 windows. In
    * streaming this runs with a watermark like [[windowAgg]]; state is
    * one counter row per open (window, type).
    */
  def slidingAgg(ev: DataFrame, watermark: Boolean = false): DataFrame = {
    val withTs = ev.withColumn("tsx", timestamp_micros(col("ts_us")))
    val marked = if (watermark) withTs.withWatermark("tsx", "2 hours") else withTs
    marked
      .groupBy(window(col("tsx"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Per-6-hour-window histogram cells of the event value — the
    * MERGEABLE state behind a streaming quantile monitor (the
    * latency-dashboard primitive): counts per (window, $10 value bin).
    * In streaming this is an ordinary watermarked windowed count —
    * cells merge across micro-batches exactly like any windowed agg,
    * which is the whole point of histogram sketches: quantile state
    * that commutes with arbitrary batch splits.
    */
  def quantileCells(ev: DataFrame, watermark: Boolean = false): DataFrame = {
    val withTs = ev.withColumn("tsx", timestamp_micros(col("ts_us")))
    val marked = if (watermark) withTs.withWatermark("tsx", "6 hours") else withTs
    marked
      .groupBy(window(col("tsx"), "6 hours").as("w"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 1000").as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("bin"), col("n"))
  }

  /** Per-window p50 readout over [[quantileCells]]: cumulative count
    * across each window's bins (a window function over CELLS — dozens
    * of rows per time window at any scale), first bin reaching rank
    * ⌈n/2⌉, reported as the bin's [lo, hi] cents range. The windowed
    * sibling of [[graft.operators.Relational.qQuantileHist]].
    */
  def streamQuantile(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = quantileCells(ev)
    val ordered = Window.partitionBy(col("window_start_us")).orderBy(col("bin"))
    val whole = Window.partitionBy(col("window_start_us"))
    cells
      .withColumn("cum", sum(col("n")).over(ordered))
      .withColumn("n_total", sum(col("n")).over(whole))
      .withColumn("rank", expr("(50 * n_total + 99) div 100"))
      .filter(col("cum") >= col("rank"))
      .groupBy(col("window_start_us"), col("n_total"), col("rank"))
      .agg(min(col("bin")).as("est_bin"))
      .select(col("window_start_us"), col("n_total"), col("rank"),
        expr("est_bin * 1000").as("est_lo_cents"),
        expr("(est_bin + 1) * 1000 - 1").as("est_hi_cents"))
      .orderBy(col("window_start_us"))
  }

  /** Native session_window sessionization — the built-in operator the
    * hand-rolled [[sessionize]]/[[sessionizeStreaming]] pair re-implements
    * (kept for custom state logic; this is what you reach for first).
    * Boundary nuance the oracle must replay: session_window windows are
    * [t, t+gap) and merge on OVERLAP, so a gap of exactly `gapMin`
    * STARTS a new session (the manual sessionize breaks only on
    * strictly-greater). `end` = last event + gap. Runs identically under
    * readStream + watermark (append emits sessions the watermark has
    * sealed).
    */
  def sessionWindowAgg(ev: DataFrame, gapMin: Int = 30,
                       watermark: Boolean = false): DataFrame = {
    val base = ev.select(col("user_id"),
      timestamp_micros(col("ts_us")).as("tsx"), col("value"))
    val wm = if (watermark) base.withWatermark("tsx", "0 seconds") else base
    wm.groupBy(col("user_id"), session_window(col("tsx"), s"$gapMin minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"), col("n_events"), col("sum_value"))
  }

  /** Batch gap-sessionization: a new session starts when a user is idle
    * longer than `gapMin`. (Streaming equivalent uses
    * flatMapGroupsWithState — see [[sessionizeStreaming]].)
    */
  def sessionize(ev: DataFrame, gapMin: Int = 30): DataFrame = {
    val gapUs = gapMin * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    ev
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_no",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("sess_no"))
  }

  /** Static per-user enrichment dimension: lifetime spend segment
    * ('high' / 'low' around `tau`). In the streaming pipeline this is the
    * batch-computed side of a stream-static join — a snapshot dimension
    * the stream enriches against.
    */
  def userSegments(ev: DataFrame, tau: Double = 3300.0): DataFrame =
    ev.groupBy(col("user_id"))
      .agg(sum(col("value").cast(DecimalType(18, 2))).cast("double").as("life_value"))
      .select(col("user_id"),
        when(col("life_value") >= tau, "high").otherwise("low").as("segment"))

  /** Stream-static enrichment: join each event to the static user
    * dimension (broadcast — the dim is users-sized, never shuffled with
    * the stream), then tumbling hourly count/sum per segment. The same
    * plan runs batch (oracle-gated) and under readStream (stream-static
    * joins need no watermark on the static side; StreamingSpec pins
    * parity).
    */
  def enrichedWindowAgg(ev: DataFrame, dim: DataFrame,
                        watermark: Boolean = false): DataFrame = {
    val withTs = ev.withColumn("tsx", timestamp_micros(col("ts_us")))
    val marked = if (watermark) withTs.withWatermark("tsx", "1 hour") else withTs
    marked.join(broadcast(dim), Seq("user_id"))
      .groupBy(window(col("tsx"), "1 hour").as("w"), col("segment"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("segment"), col("n"), col("sum_value"))
  }

  /** Event dedup key: (user, type, minute bucket). Batch = DISTINCT; the
    * streaming path runs `dropDuplicates` on the same key under a
    * watermark (bounded state).
    */
  /** Per-day DISTINCT USER counts — streaming cardinality, the "how
    * many unique visitors today" dashboard tile. Batch face: one
    * (user, day)-distinct + day count. Streaming face: the same two
    * stages as chained stateful operators — watermarked
    * `dropDuplicates` (state = one key per distinct (user, day), the
    * exact-cardinality state bound) feeding a windowed count, the
    * composition Structured Streaming supports natively in append
    * mode; a distinct count thus commutes with arbitrary micro-batch
    * splits because the DEDUP state, not the count, carries the
    * semantics. Parity pinned in StreamingSpec.
    */
  def uniquesKeys(ev: DataFrame): DataFrame =
    ev.select(col("user_id"),
      (col("ts_us") - col("ts_us") % 86400000000L).as("day_us"))

  def uniquesBatch(ev: DataFrame): DataFrame =
    uniquesKeys(ev).distinct()
      .groupBy(col("day_us")).agg(count(lit(1)).as("n_unique"))
      .orderBy(col("day_us"))

  def uniquesStreaming(ev: DataFrame): DataFrame =
    uniquesKeys(ev)
      .withColumn("tsx", timestamp_micros(col("day_us")))
      .withWatermark("tsx", "1 day")
      .dropDuplicates(Seq("user_id", "day_us"))
      .groupBy(window(col("tsx"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_unique"))
      .select(unix_micros(col("w.start")).as("day_us"), col("n_unique"))

  def dedupKeys(ev: DataFrame): DataFrame =
    ev.select(col("user_id"), col("event_type"),
      (col("ts_us") - col("ts_us") % (60L * 1000000L)).as("minute_us"))

  def dedupBatch(ev: DataFrame): DataFrame =
    dedupKeys(ev).distinct()
      .orderBy(col("user_id"), col("event_type"), col("minute_us"))

  def dedupStreaming(ev: DataFrame): DataFrame =
    dedupKeys(ev)
      .withColumn("tsx", timestamp_micros(col("minute_us")))
      .withWatermark("tsx", "1 hour")
      .dropDuplicates(Seq("user_id", "event_type", "minute_us"))
      .drop("tsx")

  /** Watermark-scoped dedup delay (1 hour, = the stream's watermark). */
  val DedupWithinDelayUs = 3600000000L

  /** Batch face of `dropDuplicatesWithinWatermark` (VERDICT r10 #6a) —
    * the semantics the full-history `dropDuplicates` of [[dedupBatch]]
    * does NOT have: per (user, type), an event is a duplicate only
    * while its burst's FIRST event (the anchor) is within the delay;
    * once the anchor ages out the same key emits again. That is the
    * greedy anchor recurrence over the per-key event times in order:
    * emit t iff t > lastEmitted + delay, lastEmitted jumps to t.
    * Evaluated as one fold over the per-key sorted array (per-key event
    * counts are user-bounded, never corpus-wide — the collect_list is
    * safe at any corpus size); the oracle renders the identical
    * recurrence as a recursive CTE (each step = every key's next
    * anchor). The sentinel seed is −10¹⁸ (NOT Long.Min: the fold adds
    * the delay to it, which must not wrap).
    */
  def dedupWithinBatch(ev: DataFrame): DataFrame =
    ev.select(col("user_id"), col("event_type"), col("ts_us"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sort_array(collect_list(col("ts_us"))).as("tss"))
      .select(col("user_id"), col("event_type"),
        explode(expr(
          s"slice(aggregate(tss, array(CAST(-1000000000000000000 AS BIGINT)), " +
            s"(acc, t) -> IF(t > element_at(acc, -1) + ${DedupWithinDelayUs}L, " +
            // slice length is start-relative and start+length must stay
            // inside Int (2147483647 overflows to an empty result)
            "concat(acc, array(t)), acc)), 2, 100000000)")).as("ts_us"))
      .orderBy(col("user_id"), col("event_type"), col("ts_us"))

  /** The streaming twin: native `dropDuplicatesWithinWatermark` — state
    * per key expires at anchor + delay (the watermark delay), so the
    * state bound is the number of DISTINCT ACTIVE keys per hour, not
    * all keys ever seen (the [[dedupStreaming]] full-history trap at
    * 100 TB). Parity with [[dedupWithinBatch]] pinned in StreamingSpec
    * over two event-time-ordered micro-batches.
    */
  def dedupWithinStreaming(ev: DataFrame): DataFrame =
    ev.select(col("user_id"), col("event_type"),
        timestamp_micros(col("ts_us")).as("tsx"))
      .withWatermark("tsx", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))
      .select(col("user_id"), col("event_type"), unix_micros(col("tsx")).as("ts_us"))

  /** Per-purchase click attribution (batch, oracle-gated): every
    * purchase joined to the same user's clicks in the hour before it.
    * The join is an EQUI-join on user_id with the time range as a
    * residual predicate — per-user event counts are bounded, so the
    * shuffle partitions by user and never explodes; left_outer keeps
    * zero-click purchases. The streaming twin is
    * [[attributionPairsStreaming]] (stream-stream interval join).
    */
  def attribution(ev: DataFrame): DataFrame = {
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_us").as("c_ts_us"),
        col("event_id").as("c_id"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_us").as("p_ts_us"))
    p.join(c, col("user_id") === col("c_user") &&
        col("c_ts_us") >= col("p_ts_us") - lit(3600000000L) &&
        col("c_ts_us") <= col("p_ts_us"), "left_outer")
      .groupBy(col("purchase_id"), col("user_id"), col("p_ts_us"))
      .agg(count(col("c_id")).as("n_clicks_1h"), max(col("c_ts_us")).as("last_click_us"))
      .orderBy(col("purchase_id"))
  }

  /** Stream-stream interval join: purchases ⋈ clicks of the same user
    * within the hour before. Both sides carry event-time watermarks and
    * the join condition bounds one event time by the other, so Spark
    * derives a state-eviction bound for BOTH join buffers (the
    * stream-stream join contract). Works identically on batch inputs
    * (watermark is a no-op there) — StreamingSpec pins that parity at
    * the pair level; the gated aggregate view is [[attribution]].
    */
  def attributionPairsStreaming(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), timestamp_micros(col("ts_us")).as("c_tsx"),
        col("event_id").as("c_id"))
      .withWatermark("c_tsx", "2 hours")
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        timestamp_micros(col("ts_us")).as("p_tsx"))
      .withWatermark("p_tsx", "2 hours")
    p.join(c, col("user_id") === col("c_user") &&
      col("c_tsx") >= col("p_tsx") - expr("INTERVAL 1 HOUR") &&
      col("c_tsx") <= col("p_tsx"))
      .select(col("purchase_id"), col("c_id"))
  }

  /** Pair-level LEFT OUTER attribution, the batch face of the
    * stream-stream left outer interval join (VERDICT r10 #6b): every
    * purchase emits its in-window clicks, and a zero-click purchase
    * emits ONE (purchase_id, NULL) row. NULLS FIRST pinned explicitly —
    * Spark's ascending default, DuckDB's is NULLS LAST.
    */
  def attributionPairsBatch(ev: DataFrame): DataFrame = {
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_us").as("c_ts_us"),
        col("event_id").as("c_id"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("p_ts_us"))
    p.join(c, col("user_id") === col("c_user") &&
        col("c_ts_us") >= col("p_ts_us") - lit(3600000000L) &&
        col("c_ts_us") <= col("p_ts_us"), "left_outer")
      .select(col("purchase_id"), col("c_id"))
      .orderBy(col("purchase_id"), asc_nulls_first("c_id"))
  }

  /** Stream-stream LEFT OUTER interval join — the subtle semantics
    * worth pinning (VERDICT r10 #6b): matched pairs emit as they join,
    * but a zero-click purchase's NULL row can only emit once the CLICK
    * watermark has passed the end of its match window (no earlier —
    * a matching click could still arrive; no later — the join state
    * must evict). Both sides watermarked + a both-sided time bound,
    * the state-eviction contract stream-stream joins require; the
    * unmatched-side emission is exactly what the inner
    * [[attributionPairsStreaming]] can never produce. Parity vs
    * [[attributionPairsBatch]] pinned in StreamingSpec over two
    * micro-batches (null rows gated on the final watermark).
    */
  def attributionPairsLeftStreaming(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), timestamp_micros(col("ts_us")).as("c_tsx"),
        col("event_id").as("c_id"))
      .withWatermark("c_tsx", "2 hours")
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        timestamp_micros(col("ts_us")).as("p_tsx"))
      .withWatermark("p_tsx", "2 hours")
    p.join(c, col("user_id") === col("c_user") &&
      col("c_tsx") >= col("p_tsx") - expr("INTERVAL 1 HOUR") &&
      col("c_tsx") <= col("p_tsx"), "leftOuter")
      .select(col("purchase_id"), col("c_id"))
  }

  /** Streaming sessionization via flatMapGroupsWithState: per-user state =
    * (open-session start, last ts, count, sum); emits a session when the
    * gap closes it. Used by StreamingSpec; the batch path above is the
    * oracle-gated equivalent.
    */
  def sessionizeStreaming(spark: SparkSession, ev: DataFrame, gapMin: Int = 30): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMin * 60L * 1000000L

    def fn(user: Long, rows: Iterator[Ev], state: GroupState[Sess])
        : Iterator[(Long, Long, Long, Long, Double)] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us))
      var out = List.empty[(Long, Long, Long, Long, Double)]
      var cur = state.getOption.orNull
      sorted.foreach { e =>
        if (cur == null) cur = Sess(e.ts_us, e.ts_us, 0L, 0.0)
        else if (e.ts_us - cur.end_us > gapUs) {
          out ::= ((user, cur.start_us, cur.end_us, cur.n, cur.sum))
          cur = Sess(e.ts_us, e.ts_us, 0L, 0.0)
        }
        cur.end_us = e.ts_us; cur.n += 1; cur.sum += e.value
      }
      state.update(cur)
      out.reverseIterator
    }

    ev.select(col("user_id").cast("long"), col("ts_us"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn _)
      .toDF("user_id", "start_us", "end_us", "n_events", "sum_value")
  }

  /** CDC-style latest-state materialization (batch face): one row per
    * user carrying the most recent event — (ts_us, event_id) struct max,
    * so a same-microsecond tie goes to the larger id — plus lifetime
    * count and exact DECIMAL-cents value sum. One partial-agg shuffle of
    * a struct per user; no window sort. The upsert/compaction view a
    * key-value serving layer maintains; streaming face in
    * [[latestStateStreaming]], parity pinned in StreamingSpec.
    */
  def latestState(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"))
      .agg(max(struct(col("ts_us"), col("event_id"), col("event_type"), col("value")))
          .as("last"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("last.ts_us").as("last_ts_us"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_type"),
        col("last.value").as("last_value"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"))

  /** Streaming latest-state via mapGroupsWithState (Update mode): per
    * user one state row merged across micro-batches, one updated row
    * emitted per batch the user appears in. Counters are monotone, so a
    * consumer (or the parity spec) resolves the current row per key as
    * argmax n_events. The value sum folds in integer cents — order-
    * independent, equal to the batch DECIMAL(18,2) sum bit-for-bit.
    */
  def latestStateStreaming(spark: SparkSession, ev: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def fn(user: Long, rows: Iterator[LEv], state: GroupState[Latest])
        : (Long, Long, Long, String, Double, Long, Double) = {
      var cur = state.getOption.orNull
      rows.foreach { e =>
        // HALF_UP (away from zero), matching the batch DECIMAL(18,2)
        // cast — Math.round alone rounds -0.125 toward +Inf and would
        // break the bit-for-bit parity on negative half-cents
        val cents = Math.signum(e.value).toLong * Math.round(Math.abs(e.value) * 100.0)
        if (cur == null)
          cur = Latest(e.ts_us, e.event_id, e.event_type, e.value, 1L, cents)
        else {
          if (e.ts_us > cur.ts_us || (e.ts_us == cur.ts_us && e.event_id > cur.event_id)) {
            cur.ts_us = e.ts_us; cur.event_id = e.event_id
            cur.event_type = e.event_type; cur.value = e.value
          }
          cur.n += 1; cur.sum_cents += cents
        }
      }
      state.update(cur)
      (user, cur.ts_us, cur.event_id, cur.event_type, cur.value,
        cur.n, cur.sum_cents.toDouble / 100.0)
    }

    ev.select(col("user_id").cast("long"), col("ts_us"), col("event_id"),
        col("event_type"), col("value"))
      .as[LEv]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn _)
      .toDF("user_id", "last_ts_us", "last_event_id", "last_type",
        "last_value", "n_events", "sum_value")
  }

  /** Ordered 2-sequence support matrix (batch face of
    * stream_seq_pairs): per ordered type pair (a, b), how many users
    * hit their first a strictly before their first b ((ts, id) order —
    * the [[graft.operators.Temporal.qSeqPairs]] support stage, without
    * the marginals/lift so the matrix is the stream-maintainable
    * artifact: a per-user |types|-entry first-occurrence state plus a
    * |types|²-row count). Streaming face in [[seqPairsStreaming]];
    * parity pinned in StreamingSpec.
    */
  def seqPairsSupport(ev: DataFrame): DataFrame = {
    val firsts = ev.groupBy(col("user_id"), col("event_type"))
      .agg(min(struct(col("ts_us"), col("event_id"))).as("f"))
      .select(col("user_id"), col("event_type"),
        col("f.ts_us").as("fts"), col("f.event_id").as("fid"))
      .localCheckpoint(eager = false)
    firsts.as("x").join(firsts.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") =!= col("y.event_type") &&
          (col("x.fts") < col("y.fts") ||
            (col("x.fts") === col("y.fts") && col("x.fid") < col("y.fid"))))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(count(lit(1)).cast("long").as("support"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Streaming 2-sequence miner via mapGroupsWithState (Update mode):
    * per user the state holds the first (ts, id) per type — a per-type
    * MIN, so ANY cross-batch arrival order (including a late-arriving
    * EARLIER occurrence that legally rewrites the user's pair set)
    * converges to the identical state. Each batch the user appears in
    * emits the user's current ordered-pair set as a sorted array of
    * (a, b) structs plus a monotone event counter; a consumer (or the parity spec)
    * resolves the current row per user as argmax n_events, and the
    * corpus support matrix is one split+explode+count away — the
    * aggregation [[seqPairsSupport]] runs in batch.
    */
  def seqPairsStreaming(spark: SparkSession, ev: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

    def fn(user: Long, rows: Iterator[SEv], state: GroupState[SeqSt])
        : (Long, Long, Seq[(String, String)]) = {
      val st = state.getOption.getOrElse(SeqSt(Map.empty, 0L))
      rows.foreach { e =>
        st.n += 1
        val cur = st.firsts.get(e.event_type)
        if (cur.forall(c => e.ts_us < c._1 || (e.ts_us == c._1 && e.event_id < c._2)))
          st.firsts += (e.event_type -> ((e.ts_us, e.event_id)))
      }
      state.update(st)
      // STRUCTURAL pair encoding (array of (a, b) structs), never a
      // delimited string — an event_type is free text and may contain
      // any separator a string rendering would split on. The .toSeq on
      // the source is load-bearing: a for-comprehension over a Map
      // yielding tuples rebuilds a MAP and silently collapses pairs
      // sharing type_a.
      val pairs = for {
        (ta, (tsa, ida)) <- st.firsts.toSeq
        (tb, (tsb, idb)) <- st.firsts.toSeq
        if ta != tb && (tsa < tsb || (tsa == tsb && ida < idb))
      } yield (ta, tb)
      (user, st.n, pairs.sorted)
    }

    ev.select(col("user_id").cast("long"), col("ts_us"), col("event_id"),
        col("event_type"))
      .as[SEv]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn _)
      .toDF("user_id", "n_events", "pairs")
  }

  // --- TTL/eviction faces of the entity-keyed state (VERDICT r12 #2) ----

  /** Event-time TTL horizon for the entity-keyed stream state: 48 h of
    * inactivity evicts an entity. The NoTimeout faces above hold one
    * state row per entity EVER SEEN — minimal for the semantics but
    * immortal, so at 100 TB event volume state grows with the lifetime
    * distinct-entity domain. The TTL faces bound it by the ACTIVE
    * domain instead (the watermark-scoped-dedup argument applied to
    * mapGroupsWithState): an entity silent for the horizon is dropped,
    * and a returning entity restarts — i.e. per entity the state
    * covers exactly its FINAL activity session under gap>TTL breaks,
    * which is what [[finalSessionEvents]] renders in batch. 48 h sits
    * inside the generator's gap distribution (median per-user gap
    * ~7.5 h, p99 ~49 h), so both populations are exercised: at sf0.01
    * 81/150 users have a break and 69 do not.
    */
  val StateTtlUs = 48L * 3600L * 1000000L

  /** Events of each user's FINAL activity session: sessions break on
    * per-user inactivity gaps > ttl (event-time order (ts, id); the
    * gap is measured on ts). Two bounded-partition windows over the
    * per-user event sets — never a corpus-wide sort.
    */
  def finalSessionEvents(ev: DataFrame, ttlUs: Long = StateTtlUs): DataFrame = {
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val brk = when(col("ts_us") - lag(col("ts_us"), 1).over(byTs) > ttlUs, 1)
      .otherwise(0)
    ev.withColumn("sess", sum(brk).over(byTs))
      .withColumn("mx", max(col("sess")).over(Window.partitionBy(col("user_id"))))
      .filter(col("sess") === col("mx"))
      .drop("sess", "mx")
  }

  /** Batch face of [[latestStateTtlStreaming]]: latest-state over the
    * final activity session only — the view whose counters the TTL
    * stream job's state holds at end of stream.
    */
  def latestStateTtl(ev: DataFrame, ttlUs: Long = StateTtlUs): DataFrame =
    latestState(finalSessionEvents(ev, ttlUs))

  /** Batch face of [[seqPairsTtlStreaming]]: the 2-sequence support
    * matrix over final-session events only.
    */
  def seqPairsTtlSupport(ev: DataFrame, ttlUs: Long = StateTtlUs): DataFrame =
    seqPairsSupport(finalSessionEvents(ev, ttlUs))

  /** TTL latest-state via flatMapGroupsWithState + EventTimeTimeout
    * (Update mode): the merge recurrence of [[latestStateStreaming]],
    * plus a timeout at lastEventTs + ttl. When the WATERMARK passes an
    * entity's timeout the state row is REMOVED (the timeout invocation
    * emits nothing); if the entity returns later its counters restart
    * — per entity the surviving state covers its final activity
    * session, the [[latestStateTtl]] batch semantics (parity pinned in
    * StreamingSpec over an explicitly batched feed where eviction
    * timing is controlled). State is ∝ entities ACTIVE within the
    * horizon — the 100 TB production rendering. The timeout timestamp
    * is clamped above the current watermark: a state refreshed by a
    * late event must still be evictable, never throw.
    */
  def latestStateTtlStreaming(spark: SparkSession, ev: DataFrame,
      ttlUs: Long = StateTtlUs, delay: String = "0 seconds"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def fn(user: Long, rows: Iterator[LEvT], state: GroupState[Latest])
        : Iterator[(Long, Long, Long, String, Double, Long, Double)] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        var cur = state.getOption.orNull
        rows.foreach { e =>
          // HALF_UP cents fold — see [[latestStateStreaming]]
          val cents = Math.signum(e.value).toLong * Math.round(Math.abs(e.value) * 100.0)
          if (cur == null)
            cur = Latest(e.ts_us, e.event_id, e.event_type, e.value, 1L, cents)
          else {
            if (e.ts_us > cur.ts_us || (e.ts_us == cur.ts_us && e.event_id > cur.event_id)) {
              cur.ts_us = e.ts_us; cur.event_id = e.event_id
              cur.event_type = e.event_type; cur.value = e.value
            }
            cur.n += 1; cur.sum_cents += cents
          }
        }
        state.update(cur)
        // CEIL to ms: flooring both terms could fire the eviction up
        // to 999µs EARLY — splitting a session the batch face (strict
        // gap > ttl) keeps together; rounding up can only DELAY an
        // eviction by <1ms, the direction the tail-merge invariant
        // already absorbs
        state.setTimeoutTimestamp(
          math.max((cur.ts_us + ttlUs + 999L) / 1000L,
            state.getCurrentWatermarkMs() + 1L))
        Iterator.single((user, cur.ts_us, cur.event_id, cur.event_type,
          cur.value, cur.n, cur.sum_cents.toDouble / 100.0))
      }
    }

    ev.select(col("user_id").cast("long"), col("ts_us"), col("event_id"),
        col("event_type"), col("value"),
        timestamp_micros(col("ts_us")).as("tsx"))
      .withWatermark("tsx", delay)
      .as[LEvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout())(fn _)
      .toDF("user_id", "last_ts_us", "last_event_id", "last_type",
        "last_value", "n_events", "sum_value")
  }

  /** TTL 2-sequence miner: the [[seqPairsStreaming]] recurrence under
    * EventTimeTimeout eviction — state (the per-type first-occurrence
    * map) is removed after the horizon and REBUILT from scratch if the
    * entity returns, so the surviving pair set is the final session's
    * ([[seqPairsTtlSupport]] in batch). Emits last_ts_us next to the
    * monotone counter so a consumer resolves the current row per user
    * as argmax (last_ts_us, n_events) — across a restart the counter
    * alone is NOT monotone, the pair (ts, n) is.
    */
  def seqPairsTtlStreaming(spark: SparkSession, ev: DataFrame,
      ttlUs: Long = StateTtlUs, delay: String = "0 seconds"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def fn(user: Long, rows: Iterator[SEvT], state: GroupState[SeqTtlSt])
        : Iterator[(Long, Long, Long, Seq[(String, String)])] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val st = state.getOption.getOrElse(SeqTtlSt(Map.empty, 0L, Long.MinValue))
        rows.foreach { e =>
          st.n += 1
          if (e.ts_us > st.last_ts) st.last_ts = e.ts_us
          val cur = st.firsts.get(e.event_type)
          if (cur.forall(c => e.ts_us < c._1 || (e.ts_us == c._1 && e.event_id < c._2)))
            st.firsts += (e.event_type -> ((e.ts_us, e.event_id)))
        }
        state.update(st)
        // ceil to ms — see latestStateTtlStreaming: never evict early
        state.setTimeoutTimestamp(
          math.max((st.last_ts + ttlUs + 999L) / 1000L,
            state.getCurrentWatermarkMs() + 1L))
        val pairs = for {
          (ta, (tsa, ida)) <- st.firsts.toSeq
          (tb, (tsb, idb)) <- st.firsts.toSeq
          if ta != tb && (tsa < tsb || (tsa == tsb && ida < idb))
        } yield (ta, tb)
        Iterator.single((user, st.last_ts, st.n, pairs.sorted))
      }
    }

    ev.select(col("user_id").cast("long"), col("ts_us"), col("event_id"),
        col("event_type"), timestamp_micros(col("ts_us")).as("tsx"))
      .withWatermark("tsx", delay)
      .as[SEvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout())(fn _)
      .toDF("user_id", "last_ts_us", "n_events", "pairs")
  }

  // --- token-bucket rate limiting (round 13) -----------------------------

  /** Token-bucket parameters: refill one event-credit per
    * [[RateLimitPeriodUs]] of event time (1 sustained event/hour),
    * burst capacity [[RateLimitBurst]]. Integer event-time credits —
    * the bucket holds up to burst·period µs of credit, an event costs
    * period µs, allowed iff the refilled balance covers it — so the
    * recurrence is exact in BIGINT and gates hash-exact.
    */
  val RateLimitPeriodUs = 3600L * 1000000L
  val RateLimitBurst = 5L

  /** Batch face of [[rateLimitStreaming]] — the per-user token-bucket
    * admission fold, evaluated as one `aggregate` HOF over the per-user
    * (ts, id)-sorted event array (bounded per user, never corpus-wide;
    * the [[dedupWithinBatch]] shape with a 4-field accumulator). Unlike
    * q_rate_limit's day-quota AGGREGATE view, this is the event-level
    * admission decision an ingest gateway actually enforces: bursts
    * drain the bucket, idle time refills it, sustained overrate drops.
    * Output per user: totals + the admission ratio. The oracle renders
    * the identical recurrence as a recursive CTE.
    */
  def rateLimitBatch(ev: DataFrame, periodUs: Long = RateLimitPeriodUs,
      burst: Long = RateLimitBurst): DataFrame =
    rateLimitFold(ev, periodUs, burst)
      .select(col("user_id"), col("n_events"), col("st.na").as("n_allowed"),
        col("st.nd").as("n_denied"),
        expr("(st.na * 1000000) div (st.na + st.nd)").as("allow_ppm"))
      .orderBy(col("user_id"))

  /** The shared token-bucket fold: per user, (n_events, final bucket
    * struct st = (pt, cr, na, nd)). st.pt is the user's max event ts —
    * the fold runs in (ts, id) order, so the last folded ts IS the max.
    */
  private def rateLimitFold(ev: DataFrame, periodUs: Long, burst: Long): DataFrame = {
    val cap = burst * periodUs
    val newcr = s"least(CAST($cap AS BIGINT), acc.cr + IF(acc.pt < CAST(0 AS BIGINT), CAST(0 AS BIGINT), e.ts - acc.pt))"
    ev.select(col("user_id"), struct(col("ts_us").as("ts"), col("event_id").as("id")).as("e"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("evs"))
      .select(col("user_id"), size(col("evs")).cast("long").as("n_events"),
        expr(
          s"""aggregate(evs,
             |  named_struct('pt', CAST(-1 AS BIGINT), 'cr', CAST($cap AS BIGINT),
             |    'na', CAST(0 AS BIGINT), 'nd', CAST(0 AS BIGINT)),
             |  (acc, e) -> named_struct(
             |    'pt', e.ts,
             |    'cr', IF($newcr >= ${periodUs}L, $newcr - ${periodUs}L, $newcr),
             |    'na', acc.na + IF($newcr >= ${periodUs}L, 1L, 0L),
             |    'nd', acc.nd + IF($newcr < ${periodUs}L, 1L, 0L)))""".stripMargin).as("st"))
  }

  /** Eviction horizon for the rate-limit TTL face: the bucket CAPACITY
    * in event time (burst·period, 5 h at the gated constants). This is
    * the one entity-keyed operator where horizon eviction costs ZERO
    * admission semantics (VERDICT r13 #1): a user idle ≥ burst·period
    * has refilled to a FULL bucket whether or not its state row was
    * dropped — elapsed ≥ cap forces newcr = cap from ANY prior (pt, cr)
    * — so re-initializing (pt = −1, cr = cap) on return yields
    * bit-identical allow/deny decisions for every subsequent event.
    * Only the counters restart, which is exactly the final-session
    * batch face below.
    */
  val RateLimitHorizonUs: Long = RateLimitBurst * RateLimitPeriodUs

  /** Batch face of [[rateLimitTtlStreaming]]: the token-bucket fold
    * over each user's FINAL activity session under gap > horizon
    * breaks ([[finalSessionEvents]]) — the exact counters the TTL
    * stream job's state holds at end of stream when every eviction
    * fired. last_ts_us (= st.pt, the fold's running max) rides along
    * as the restart-resolution key the streaming consumers sort on.
    */
  def rateLimitTtl(ev: DataFrame, periodUs: Long = RateLimitPeriodUs,
      burst: Long = RateLimitBurst,
      horizonUs: Long = RateLimitHorizonUs): DataFrame = {
    require(horizonUs >= burst * periodUs,
      "horizon below bucket capacity: an evicted entity could return with a NON-full bucket, changing admission decisions")
    rateLimitFold(finalSessionEvents(ev, horizonUs), periodUs, burst)
      .select(col("user_id"), col("st.pt").as("last_ts_us"), col("n_events"),
        col("st.na").as("n_allowed"), col("st.nd").as("n_denied"),
        expr("(st.na * 1000000) div (st.na + st.nd)").as("allow_ppm"))
      .orderBy(col("user_id"))
  }

  /** Token-bucket enforcement with EventTimeTimeout eviction — the
    * 100 TB face of [[rateLimitStreaming]]: state is one bucket row per
    * entity ACTIVE within the horizon, not per entity ever seen. When
    * the watermark passes lastTs + horizon the row is removed; a
    * returning entity re-initializes to (pt = −1, cr = cap), which is
    * bit-identical to the un-evicted bucket because horizon ≥ cap
    * guarantees the idle refill already reached cap (see
    * [[RateLimitHorizonUs]]) — so eviction never changes an admission
    * decision, only restarts the counters (the [[rateLimitTtl]] batch
    * semantics; parity + eviction replay pinned in StreamingSpec,
    * bounded-state-vs-NoTimeout measured on the aging feed in
    * StreamBench).
    */
  def rateLimitTtlStreaming(spark: SparkSession, ev: DataFrame,
      periodUs: Long = RateLimitPeriodUs, burst: Long = RateLimitBurst,
      horizonUs: Long = RateLimitHorizonUs,
      delay: String = "0 seconds"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(horizonUs >= burst * periodUs,
      "horizon below bucket capacity: eviction would change admission decisions")
    val cap = burst * periodUs

    def fn(user: Long, rows: Iterator[AEvT], state: GroupState[RlSt])
        : Iterator[(Long, Long, Long, Long, Long, Long)] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val st = state.getOption.getOrElse(RlSt(-1L, cap, 0L, 0L))
        rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
          // late-event guard as in [[rateLimitStreaming]]: elapsed
          // floors at 0, pt is monotone
          val elapsed = if (st.pt < 0L) 0L else math.max(0L, e.ts_us - st.pt)
          val newcr = math.min(cap, st.cr + elapsed)
          if (newcr >= periodUs) { st.cr = newcr - periodUs; st.na += 1 }
          else { st.cr = newcr; st.nd += 1 }
          st.pt = math.max(st.pt, e.ts_us)
        }
        state.update(st)
        // ceil to ms — see latestStateTtlStreaming: never evict early;
        // clamped above the watermark so a late refresh can't throw
        state.setTimeoutTimestamp(
          math.max((st.pt + horizonUs + 999L) / 1000L,
            state.getCurrentWatermarkMs() + 1L))
        Iterator.single((user, st.pt, st.na + st.nd, st.na, st.nd,
          st.na * 1000000L / (st.na + st.nd)))
      }
    }

    ev.select(col("user_id").cast("long"), col("ts_us"), col("event_id"),
        timestamp_micros(col("ts_us")).as("tsx"))
      .withWatermark("tsx", delay)
      .as[AEvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout())(fn _)
      .toDF("user_id", "last_ts_us", "n_events", "n_allowed", "n_denied",
        "allow_ppm")
  }

  /** Token-bucket enforcement ON the stream via mapGroupsWithState
    * (Update mode): per user the state is the bucket itself — (last ts,
    * credit balance, allowed/denied counters), one row per entity. The
    * fold is SEQUENTIAL in event time (credits depend on elapsed time),
    * so rows are sorted within each batch and cross-batch parity holds
    * on event-time-ordered feeds exactly: folding an ordered split
    * through the carried (pt, cr) state ≡ folding the whole history
    * (pinned in StreamingSpec over a ts-range two-batch split).
    */
  def rateLimitStreaming(spark: SparkSession, ev: DataFrame,
      periodUs: Long = RateLimitPeriodUs, burst: Long = RateLimitBurst): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val cap = burst * periodUs

    def fn(user: Long, rows: Iterator[AEv], state: GroupState[RlSt])
        : (Long, Long, Long, Long, Long) = {
      val st = state.getOption.getOrElse(RlSt(-1L, cap, 0L, 0L))
      rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        // a late cross-batch event must never refill retroactively or
        // regress the clock: elapsed floors at 0 and pt is monotone —
        // the late event is charged against the bucket AS OF the
        // latest state (state stays valid; exact batch parity is the
        // ordered-feed contract, as for the other sequential folds)
        val elapsed = if (st.pt < 0L) 0L else math.max(0L, e.ts_us - st.pt)
        val newcr = math.min(cap, st.cr + elapsed)
        if (newcr >= periodUs) { st.cr = newcr - periodUs; st.na += 1 }
        else { st.cr = newcr; st.nd += 1 }
        st.pt = math.max(st.pt, e.ts_us)
      }
      state.update(st)
      (user, st.na + st.nd, st.na, st.nd, st.na * 1000000L / (st.na + st.nd))
    }

    ev.select(col("user_id").cast("long"), col("ts_us"), col("event_id"))
      .as[AEv]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn _)
      .toDF("user_id", "n_events", "n_allowed", "n_denied", "allow_ppm")
  }

  /** KMV distinct-users sketch per event type (batch face): the
    * deterministic approximate-distinct a stream job actually
    * maintains at 100 TB — k smallest distinct Knuth-hash values per
    * key via the native [[graft.functions.BottomK]] aggregate (≤ k
    * longs per group over the wire, map-side combined), estimate
    * (k−1)·2³² div h_k, exact when fewer than k distinct hashes
    * (the q_approx_distinct_kmv estimator applied per stream key).
    * Streaming face in [[kmvUniquesStreaming]]; parity in
    * StreamingSpec.
    */
  def kmvUniques(ev: DataFrame, k: Int = 64): DataFrame =
    ev.select(col("event_type"),
        ((col("user_id") * 2654435761L) % 4294967296L).as("h"))
      .groupBy(col("event_type"))
      .agg(graft.functions.BottomK.bottomK(col("h"), k).as("sk"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("n_events"),
        size(col("sk")).cast("long").as("sketch_size"),
        when(size(col("sk")) < k, size(col("sk")).cast("long"))
          .otherwise(expr(s"(${k - 1} * 4294967296) div greatest(element_at(sk, $k), 1)"))
          .as("est_distinct_users"))
      .orderBy(col("event_type"))

  /** Streaming KMV via mapGroupsWithState: per type the state holds the
    * ≤k smallest distinct hashes — a set-merge, so ANY cross-batch
    * arrival order yields the identical sketch, and the final row per
    * type (argmax n_events) is bit-equal to the batch face.
    */
  def kmvUniquesStreaming(spark: SparkSession, ev: DataFrame, k: Int = 64): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

    def fn(typ: String, rows: Iterator[KEv], state: GroupState[KmvSt])
        : (String, Long, Long, Long) = {
      val st = state.getOption.getOrElse(KmvSt(Vector.empty, 0L))
      val set = scala.collection.mutable.TreeSet.empty[Long] ++ st.hs
      rows.foreach { e => st.n += 1; set += e.h }
      st.hs = set.take(k).toVector
      state.update(st)
      val est =
        if (st.hs.length < k) st.hs.length.toLong
        else (k - 1).toLong * 4294967296L / math.max(st.hs(k - 1), 1L)
      (typ, st.n, st.hs.length.toLong, est)
    }

    ev.select(col("event_type"),
        ((col("user_id") * 2654435761L) % 4294967296L).as("h"))
      .as[KEv]
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn _)
      .toDF("event_type", "n_events", "sketch_size", "est_distinct_users")
  }

  /** CDC latest-state WITH tombstones (batch face): 'error' events are
    * delete markers — a user whose most-recent event (ts, id max) is a
    * tombstone is NOT live in the materialized view, the upsert/delete
    * semantics of a CDC sink compaction. One struct-max partial agg
    * plus marker counters; streaming face in
    * [[cdcTombstoneStreaming]], parity in StreamingSpec.
    */
  def cdcTombstone(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"))
      .agg(max(struct(col("ts_us"), col("event_id"), col("event_type"))).as("last"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .cast("long").as("n_deletes"),
        sum(when(col("event_type") =!= "error", 1L).otherwise(0L))
          .cast("long").as("n_upserts"))
      .select(col("user_id"), col("last.ts_us").as("last_ts_us"),
        col("last.event_id").as("last_event_id"),
        when(col("last.event_type") === "error", 0).otherwise(1)
          .cast("int").as("is_live"),
        col("n_upserts"), col("n_deletes"))
      .orderBy(col("user_id"))

  /** Streaming CDC-with-tombstones via mapGroupsWithState: the state is
    * the (ts, id)-max event plus monotone upsert/delete counters —
    * every merge is an idempotent max/add, so cross-batch order cannot
    * change the final row (argmax n_upserts + n_deletes per user).
    */
  def cdcTombstoneStreaming(spark: SparkSession, ev: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

    ev.select(col("user_id").cast("long"), col("ts_us"), col("event_id"),
        col("event_type"), col("value"))
      .as[LEv]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[LEv], state: GroupState[CdcSt]) =>
          var st = state.getOption.orNull
          rows.foreach { e =>
            val del = if (e.event_type == "error") 1L else 0L
            if (st == null)
              st = CdcSt(e.ts_us, e.event_id, e.event_type, 1L - del, del)
            else {
              if (e.ts_us > st.ts_us || (e.ts_us == st.ts_us && e.event_id > st.event_id)) {
                st.ts_us = e.ts_us; st.event_id = e.event_id; st.event_type = e.event_type
              }
              st.n_upserts += 1L - del; st.n_deletes += del
            }
          }
          state.update(st)
          (user, st.ts_us, st.event_id,
            if (st.event_type == "error") 0 else 1, st.n_upserts, st.n_deletes)
      }
      .toDF("user_id", "last_ts_us", "last_event_id", "is_live",
        "n_upserts", "n_deletes")
  }

  /** CDC snapshot+delta compaction (batch face of
    * [[cdcCompactStreaming]]; VERDICT r13 #6): unlike the rate-limit
    * bucket, evicting CDC state changes semantics (the latest-state
    * view must survive idleness), so the 100 TB face is the
    * Kafka-compacted-topic rendering — idle entities are FLUSHED to
    * the sink instead of dropped, live state holds only
    * horizon-active entities, and the view is sink ⊕ live state. The
    * merge algebra makes the compaction exact: each flushed segment
    * row carries a (ts, id)-max struct and since-flush counters, and
    * max-of-maxes / sum-of-sums per user reconstructs [[cdcTombstone]]
    * bit-exactly. This face renders that algebra in batch: segments =
    * per-user gap > horizon sessions, level 1 = the per-(user,
    * segment) sink rows, level 2 = the per-user merge. n_segments
    * (flushes + live) rides along as the compaction audit column. Two
    * user-keyed co-partitioned shuffles, nothing corpus-global.
    */
  def cdcCompact(ev: DataFrame, horizonUs: Long = StateTtlUs): DataFrame = {
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val brk = when(col("ts_us") - lag(col("ts_us"), 1).over(byTs) > horizonUs, 1)
      .otherwise(0)
    ev.withColumn("seg", sum(brk).over(byTs))
      .groupBy(col("user_id"), col("seg"))
      .agg(max(struct(col("ts_us"), col("event_id"), col("event_type"))).as("last"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .cast("long").as("n_deletes"),
        sum(when(col("event_type") =!= "error", 1L).otherwise(0L))
          .cast("long").as("n_upserts"))
      .groupBy(col("user_id"))
      .agg(max(col("last")).as("last"),
        sum(col("n_upserts")).cast("long").as("n_upserts"),
        sum(col("n_deletes")).cast("long").as("n_deletes"),
        count(lit(1)).cast("long").as("n_segments"))
      .select(col("user_id"), col("last.ts_us").as("last_ts_us"),
        col("last.event_id").as("last_event_id"),
        when(col("last.event_type") === "error", 0).otherwise(1)
          .cast("int").as("is_live"),
        col("n_upserts"), col("n_deletes"), col("n_segments"))
      .orderBy(col("user_id"))
  }

  /** Streaming CDC compaction via flatMapGroupsWithState +
    * EventTimeTimeout: per user the state holds the CURRENT segment's
    * (ts, id)-max struct + since-flush counters, keyed by the
    * segment's first event ts. A timeout invocation EMITS the state
    * row marked flushed = 1 (the write to the compacted sink — in
    * production the [[graft.sources.IdempotentSink]]) and REMOVES the
    * state; data invocations emit the running segment row flushed = 0
    * (update-mode upsert). A consumer resolves the view as: per
    * (user, seg_start) the latest row (argmax (n, flushed)), then the
    * per-user max/sum merge — which equals [[cdcCompact]] and hence
    * [[cdcTombstone]] when every eviction fired (parity pinned in
    * StreamingSpec; bounded live state measured on the aging feed in
    * StreamBench).
    */
  def cdcCompactStreaming(spark: SparkSession, ev: DataFrame,
      horizonUs: Long = StateTtlUs, delay: String = "0 seconds"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def fn(user: Long, rows: Iterator[LEvT], state: GroupState[CdcCmpSt])
        : Iterator[(Long, Long, Long, Long, Int, Long, Long, Int)] = {
      if (state.hasTimedOut) {
        val st = state.get
        state.remove()
        Iterator.single((user, st.seg_start, st.ts_us, st.event_id,
          if (st.event_type == "error") 0 else 1, st.n_upserts, st.n_deletes, 1))
      } else {
        var st = state.getOption.orNull
        rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
          val del = if (e.event_type == "error") 1L else 0L
          if (st == null)
            st = CdcCmpSt(e.ts_us, e.ts_us, e.event_id, e.event_type, 1L - del, del)
          else {
            if (e.ts_us > st.ts_us || (e.ts_us == st.ts_us && e.event_id > st.event_id)) {
              st.ts_us = e.ts_us; st.event_id = e.event_id; st.event_type = e.event_type
            }
            st.n_upserts += 1L - del; st.n_deletes += del
          }
        }
        state.update(st)
        // ceil to ms — see latestStateTtlStreaming: never flush early
        state.setTimeoutTimestamp(
          math.max((st.ts_us + horizonUs + 999L) / 1000L,
            state.getCurrentWatermarkMs() + 1L))
        Iterator.single((user, st.seg_start, st.ts_us, st.event_id,
          if (st.event_type == "error") 0 else 1, st.n_upserts, st.n_deletes, 0))
      }
    }

    ev.select(col("user_id").cast("long"), col("ts_us"), col("event_id"),
        col("event_type"), col("value"),
        timestamp_micros(col("ts_us")).as("tsx"))
      .withWatermark("tsx", delay)
      .as[LEvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout())(fn _)
      .toDF("user_id", "seg_start_us", "last_ts_us", "last_event_id",
        "is_live", "n_upserts", "n_deletes", "flushed")
  }

  /** Streaming time-bounded funnel (the streaming face of
    * [[graft.operators.Temporal.qFunnelWindow]]) via
    * flatMapGroupsWithState: per user the state holds the candidate
    * step events ([[FunnelSt]]), and each batch re-derives the funnel
    * from that state — v = min view, c = min click in [v, v+1h],
    * p = min purchase in [c, c+24h] — so the emitted row is exactly the
    * batch recurrence over everything seen so far, whatever the
    * cross-batch arrival order. Emits only once a view exists (the
    * batch face's `v_ts IS NOT NULL`); parity resolves per user by
    * argmax n_seen (StreamingSpec).
    */
  /** Ingestion-lateness audit — the data-quality readout every
    * event-time pipeline checks before trusting its watermarks: events
    * arrive in a jittered order (arrival = event_id + a deterministic
    * multiplicative-hash jitter < 1000 positions — the RNG-free stand-in
    * for network/broker reordering; `event_id % 1000003` bounds the
    * product at ~10¹⁵ so the hash can never overflow at any corpus
    * size), and an event is LATE if its event time is below the
    * per-user running event-time high-water mark at its arrival. Emits
    * per user: event count, late count, worst lateness, late ppm —
    * the numbers that size a real watermark delay. Scale shape: one
    * window partitioned by user (per-user state only), one user-domain
    * aggregate; nothing global.
    */
  def lateAudit(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("arrival"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.select(col("user_id"), col("event_id"), col("ts_us"))
      .withColumn("arrival",
        col("event_id") + ((col("event_id") % 1000003L) * 2654435761L) % 1000L)
      .withColumn("hwm", max(col("ts_us")).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("ts_us") < col("hwm"), 1L).otherwise(0L))
          .cast("long").as("n_late"),
        max(when(col("ts_us") < col("hwm"), col("hwm") - col("ts_us"))
          .otherwise(0L)).as("max_late_us"))
      .withColumn("late_ppm", expr("(n_late * 1000000) div n_events"))
      .orderBy(col("user_id"))
  }

  /** Batch face of [[lateAuditTtlStreaming]]: the lateness audit over
    * each user's FINAL activity session (gap > ttl breaks on EVENT
    * time). The [[LateSt]] state is the suite's worst growth class —
    * raw per-EVENT sequences, not per-entity counters — so the TTL
    * face matters more here than anywhere: evicting an idle entity
    * drops its whole replay buffer, and the surviving audit covers
    * exactly the final session's arrival-order replay. last_ts_us
    * (the session's max event ts, the eviction anchor) rides along as
    * the restart-resolution key.
    */
  def lateAuditTtl(ev: DataFrame, ttlUs: Long = StateTtlUs): DataFrame = {
    val fin = finalSessionEvents(ev, ttlUs)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("arrival"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    fin.select(col("user_id"), col("event_id"), col("ts_us"))
      .withColumn("arrival",
        col("event_id") + ((col("event_id") % 1000003L) * 2654435761L) % 1000L)
      .withColumn("hwm", max(col("ts_us")).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("ts_us")).as("last_ts_us"),
        count(lit(1)).as("n_events"),
        sum(when(col("ts_us") < col("hwm"), 1L).otherwise(0L))
          .cast("long").as("n_late"),
        max(when(col("ts_us") < col("hwm"), col("hwm") - col("ts_us"))
          .otherwise(0L)).as("max_late_us"))
      .withColumn("late_ppm", expr("(n_late * 1000000) div n_events"))
      .orderBy(col("user_id"))
  }

  /** Streaming lateness audit under EventTimeTimeout eviction: the
    * [[lateAuditStreaming]] replay recurrence with the state (the raw
    * per-user event buffer) REMOVED once the watermark passes the
    * entity's last event ts + ttl — a returning entity replays only
    * its final session, the [[lateAuditTtl]] batch semantics. The
    * eviction anchor is the buffer's max event ts (a set max — a
    * late-arriving earlier event can never LOWER it); parity +
    * eviction pinned in StreamingSpec, aging-feed state bytes in
    * StreamBench (per-EVENT state is where eviction pays most).
    */
  def lateAuditTtlStreaming(spark: SparkSession, ev: DataFrame,
      ttlUs: Long = StateTtlUs, delay: String = "0 seconds"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def fn(user: Long, rows: Iterator[AEvT], state: GroupState[LateSt])
        : Iterator[(Long, Long, Long, Long, Long, Long)] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val st = state.getOption.getOrElse(LateSt(Nil))
        rows.foreach { e =>
          val arrival = e.event_id + ((e.event_id % 1000003L) * 2654435761L) % 1000L
          st.evs = st.evs :+ ((arrival, e.event_id, e.ts_us))
        }
        state.update(st)
        val lastTs = st.evs.map(_._3).max
        // ceil to ms — see latestStateTtlStreaming: never evict early
        state.setTimeoutTimestamp(
          math.max((lastTs + ttlUs + 999L) / 1000L,
            state.getCurrentWatermarkMs() + 1L))
        val sorted = st.evs.sortBy(t => (t._1, t._2))
        var hwm = Long.MinValue; var nLate = 0L; var maxLate = 0L
        sorted.foreach { case (_, _, ts) =>
          if (hwm != Long.MinValue && ts < hwm) {
            nLate += 1; maxLate = math.max(maxLate, hwm - ts)
          }
          hwm = math.max(hwm, ts)
        }
        Iterator.single((user, lastTs, sorted.size.toLong, nLate, maxLate,
          nLate * 1000000L / sorted.size))
      }
    }

    ev.select(col("user_id").cast("long"), col("ts_us"), col("event_id"),
        timestamp_micros(col("ts_us")).as("tsx"))
      .withWatermark("tsx", delay)
      .as[AEvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout())(fn _)
      .toDF("user_id", "last_ts_us", "n_events", "n_late", "max_late_us",
        "late_ppm")
  }

  /** Streaming lateness audit via flatMapGroupsWithState: [[LateSt]]
    * holds the raw per-user (arrival, id, ts) sequence and every batch
    * re-derives the audit by replaying it in arrival order — so the
    * last emitted row per user equals [[lateAudit]]'s regardless of
    * how a micro-batch split interleaves arrivals.
    */
  def lateAuditStreaming(spark: SparkSession, ev: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def fn(user: Long, rows: Iterator[AEv], state: GroupState[LateSt])
        : Iterator[(Long, Long, Long, Long, Long)] = {
      val st = state.getOption.getOrElse(LateSt(Nil))
      rows.foreach { e =>
        val arrival = e.event_id + ((e.event_id % 1000003L) * 2654435761L) % 1000L
        st.evs = st.evs :+ ((arrival, e.event_id, e.ts_us))
      }
      state.update(st)
      val sorted = st.evs.sortBy(t => (t._1, t._2))
      var hwm = Long.MinValue; var nLate = 0L; var maxLate = 0L
      sorted.foreach { case (_, _, ts) =>
        if (hwm != Long.MinValue && ts < hwm) {
          nLate += 1; maxLate = math.max(maxLate, hwm - ts)
        }
        hwm = math.max(hwm, ts)
      }
      Iterator.single((user, sorted.size.toLong, nLate, maxLate,
        nLate * 1000000L / sorted.size))
    }

    ev.select(col("user_id").cast("long"), col("ts_us"), col("event_id"))
      .as[AEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn _)
      .toDF("user_id", "n_events", "n_late", "max_late_us", "late_ppm")
  }

  def funnelStreaming(spark: SparkSession, ev: DataFrame,
                      clickUs: Long = 3600000000L,
                      purchUs: Long = 86400000000L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def fn(user: Long, rows: Iterator[FEv], state: GroupState[FunnelSt])
        : Iterator[(Long, Long, java.lang.Long, java.lang.Long, Int, Long)] = {
      val st = state.getOption.getOrElse(FunnelSt(Nil, Nil, Nil, 0L))
      rows.foreach { e =>
        e.event_type match {
          case "view"     => st.views = st.views :+ e.ts_us
          case "click"    => st.clicks = st.clicks :+ e.ts_us
          case "purchase" => st.purchases = st.purchases :+ e.ts_us
          case _          => ()
        }
      }
      st.n_seen += 1
      state.update(st)
      if (st.views.isEmpty) Iterator.empty
      else {
        val v = st.views.min
        val c = st.clicks.filter(t => t >= v && t <= v + clickUs)
          .minOption
        val p = c.flatMap(ct => st.purchases.filter(t => t >= ct && t <= ct + purchUs)
          .minOption)
        val steps = 1 + c.size + p.size
        Iterator.single((user, v, c.map(Long.box).orNull, p.map(Long.box).orNull,
          steps, st.n_seen))
      }
    }

    ev.select(col("user_id").cast("long"), col("ts_us"), col("event_type"))
      .as[FEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn _)
      .toDF("user_id", "v_ts", "c_ts", "p_ts", "steps", "n_seen")
  }
}
