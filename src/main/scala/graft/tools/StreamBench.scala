package graft.tools

import java.nio.file.Files

import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming micro-batch throughput bench over the three state-heavy
  * paths — watermarked tumbling-window aggregation, stream-stream
  * interval join (two-sided watermark state), and mapGroupsWithState
  * latest-state — at MULTIPLE batch sizes (VERDICT r5 item 5: at the
  * old 16-file staging, fixed per-trigger cost dominated; the batch-size
  * sweep shows how rows/s scales as micro-batches grow toward the
  * trigger sizes a real ingest runs at).
  *
  * Stages the events table as N time-ordered parquet files, streams one
  * file per trigger, reports end-to-end rows/second + mean trigger
  * latency per (pipeline, N). This measures the Structured-Streaming
  * execution path (state store updates, watermark advance) that the
  * batch-equivalent correctness gate can't see.
  *
  * Run: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_STREAM_FILES=16,4 \
  *   sbt "runMain graft.tools.StreamBench"
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fileCounts = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "16,4")
      .split(",").map(_.trim.toInt).toSeq
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), logLevel = "ERROR")
    def ms(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val events = graft.Tables.events(spark, sfDir)
    val nRows = events.count()

    // the Bench calibration control (VERDICT r13 #4) wired into the
    // streaming bench too: StreamBench's throughput rows carry the same
    // host day-band caveat, so each file-count block leads with a
    // fixed-work CPU probe reading
    def calibSec(): Double = graft.GraftSession.calibSec(spark)
    calibSec() // untimed JIT warm-up

    for (nFiles <- fileCounts) {
      println(s"""{"metric":"calib_sec","value":${ms(calibSec())},""" +
        s""""n_files":$nFiles,"sf":"$sfDir"}""")
      // stage: N files ordered by time (realistic arrival order for the
      // watermark) — each becomes one micro-batch via maxFilesPerTrigger
      val stageDir = Files.createTempDirectory(s"graft-stream-bench-$nFiles").toString
      EventStreams.normalize(events)
        .withColumn("bucket", ntile(nFiles).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("ts_us"))))
        .repartitionByRange(nFiles, col("bucket"))
        .write.mode("overwrite").parquet(stageDir)
      val schema = spark.read.parquet(stageDir).schema
      def source(): DataFrame = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stageDir).drop("bucket")

      def run(name: String)(start: () => StreamingQuery): Unit = {
        val t0 = System.nanoTime()
        val q = start()
        q.processAllAvailable()
        val wallSec = (System.nanoTime() - t0) / 1e9
        val progress = q.recentProgress.toSeq.filter(_.numInputRows > 0)
        val latencies = progress
          .map(_.durationMs.getOrDefault("triggerExecution", 0L).toLong)
        // peak state-store footprint across the run (sum over operators
        // per trigger, max over triggers) — the number that separates
        // bounded-state operators (dropDuplicatesWithinWatermark, the
        // eviction-bounded join buffers) from full-history ones at 100 TB
        val stateRows = progress.map(_.stateOperators.map(_.numRowsTotal).sum)
          .maxOption.getOrElse(0L)
        val stateBytes = progress.map(_.stateOperators.map(_.memoryUsedBytes).sum)
          .maxOption.getOrElse(0L)
        q.stop()
        println(s"""{"metric":"stream_rows_per_sec","pipeline":"$name",""" +
          s""""n_files":$nFiles,"rows_per_batch":${nRows / nFiles},""" +
          s""""value":${ms(nRows / wallSec)},"rows":$nRows,""" +
          s""""micro_batches":${progress.size},"wall_sec":${ms(wallSec)},""" +
          s""""mean_batch_ms":${if (latencies.nonEmpty) latencies.sum / latencies.length else 0},""" +
          s""""state_rows":$stateRows,"state_bytes":$stateBytes,""" +
          s""""sf":"$sfDir"}""")
      }

      run("window_agg") { () =>
        EventStreams.windowAgg(source(), watermark = true)
          .writeStream.outputMode("update")
          .format("memory").queryName(s"sb_window_$nFiles").start()
      }
      run("ss_join") { () =>
        val s = source()
        EventStreams.attributionPairsStreaming(
            s.filter(col("event_type") === "click"),
            s.filter(col("event_type") === "purchase"))
          .writeStream.outputMode("append")
          .format("memory").queryName(s"sb_join_$nFiles").start()
      }
      run("latest_state") { () =>
        EventStreams.latestStateStreaming(spark, source())
          .writeStream.outputMode("update")
          .format("memory").queryName(s"sb_state_$nFiles").start()
      }
      // the r11 stateful pair (VERDICT r11 #4): watermark-scoped dedup
      // vs the full-history dedup on the SAME feed — the state_rows
      // column is the operator's selling point (distinct ACTIVE keys vs
      // all keys ever seen) — and the left-outer interval join, whose
      // null-side buffer drains on watermark advance
      run("dedup_within") { () =>
        EventStreams.dedupWithinStreaming(source())
          .writeStream.outputMode("append")
          .format("memory").queryName(s"sb_dwithin_$nFiles").start()
      }
      run("dedup_full_history") { () =>
        EventStreams.dedupStreaming(source())
          .writeStream.outputMode("append")
          .format("memory").queryName(s"sb_dfull_$nFiles").start()
      }
      run("ss_join_left_outer") { () =>
        val s = source()
        EventStreams.attributionPairsLeftStreaming(
            s.filter(col("event_type") === "click"),
            s.filter(col("event_type") === "purchase"))
          .writeStream.outputMode("append")
          .format("memory").queryName(s"sb_ljoin_$nFiles").start()
      }
      // the r12 stateful op: per-user first-occurrence map — state is
      // users × ≤|types| rows regardless of event volume, the bound
      // that separates it from the full-history dedup above
      run("seq_pairs") { () =>
        EventStreams.seqPairsStreaming(spark, source())
          .writeStream.outputMode("update")
          .format("memory").queryName(s"sb_seqp_$nFiles").start()
      }
      // the r13 TTL pair (VERDICT r12 #2) on an AGING feed: each
      // event-time day remaps to a fresh user-id block, so the entity
      // domain grows linearly with stream age — the 100 TB shape the
      // NoTimeout faces cannot survive. state_rows (peak) is the
      // readout: NoTimeout holds every entity ever seen (linear in
      // days), the EventTimeTimeout faces hold only the 48h-horizon
      // actives (flat). The remap is deterministic, so runs compare.
      def agingSource(): DataFrame = source().withColumn("user_id",
        col("user_id") + expr("ts_us div 86400000000") * 1000000L)
      run("latest_state_aging_full") { () =>
        EventStreams.latestStateStreaming(spark, agingSource())
          .writeStream.outputMode("update")
          .format("memory").queryName(s"sb_lsaf_$nFiles").start()
      }
      run("latest_state_aging_ttl") { () =>
        EventStreams.latestStateTtlStreaming(spark, agingSource())
          .writeStream.outputMode("update")
          .format("memory").queryName(s"sb_lsat_$nFiles").start()
      }
      run("seq_pairs_aging_full") { () =>
        EventStreams.seqPairsStreaming(spark, agingSource())
          .writeStream.outputMode("update")
          .format("memory").queryName(s"sb_spaf_$nFiles").start()
      }
      run("seq_pairs_aging_ttl") { () =>
        EventStreams.seqPairsTtlStreaming(spark, agingSource())
          .writeStream.outputMode("update")
          .format("memory").queryName(s"sb_spat_$nFiles").start()
      }
      // the r14 TTL face (VERDICT r13 #1): the token bucket is the one
      // entity-keyed operator where horizon eviction is decision-EXACT
      // (an idle-past-horizon bucket is full either way), so the
      // bounded-state column costs zero semantics
      run("rate_limit_aging_full") { () =>
        EventStreams.rateLimitStreaming(spark, agingSource())
          .writeStream.outputMode("update")
          .format("memory").queryName(s"sb_rlaf_$nFiles").start()
      }
      run("rate_limit_aging_ttl") { () =>
        EventStreams.rateLimitTtlStreaming(spark, agingSource())
          .writeStream.outputMode("update")
          .format("memory").queryName(s"sb_rlat_$nFiles").start()
      }
      // the r14 lateness-audit TTL face: the one whose NoTimeout state
      // grows per EVENT (raw replay buffers) — state_bytes is the
      // column to read here, not state_rows
      run("late_audit_aging_full") { () =>
        EventStreams.lateAuditStreaming(spark, agingSource())
          .writeStream.outputMode("append") // the full-history face is an Append-mode fMGWS
          .format("memory").queryName(s"sb_laaf_$nFiles").start()
      }
      run("late_audit_aging_ttl") { () =>
        EventStreams.lateAuditTtlStreaming(spark, agingSource())
          .writeStream.outputMode("update")
          .format("memory").queryName(s"sb_laat_$nFiles").start()
      }
      // the r14 CDC compaction (VERDICT r13 #6): unlike the TTL faces
      // the evicted rows are EMITTED (flushed to the sink), so the view
      // survives idleness while live state stays horizon-bounded
      run("cdc_aging_full") { () =>
        EventStreams.cdcTombstoneStreaming(spark, agingSource())
          .writeStream.outputMode("update")
          .format("memory").queryName(s"sb_cdaf_$nFiles").start()
      }
      run("cdc_aging_compact") { () =>
        EventStreams.cdcCompactStreaming(spark, agingSource())
          .writeStream.outputMode("update")
          .format("memory").queryName(s"sb_cdac_$nFiles").start()
      }
    }
    spark.stop()
  }
}
