package graft.tools

import java.nio.file.Files

import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming STATE-STORE scaling bench (VERDICT r8 #7): StreamBench
  * sweeps batch size at fixed state; this sweeps STATE SIZE (distinct
  * keys × open windows) and the state-store provider (default
  * HDFS-backed in-memory map vs RocksDB) on the state-heavy paths —
  * watermarked keyed windowed aggregation and mapGroupsWithState
  * latest-state — so SCALING.md can state a measured per-state-row cost
  * instead of assuming one. The key knob is synthetic
  * (xxhash64(event_id) % K) so state cardinality scales independently
  * of input volume: windowed-agg state rows ≈ min(K·windows, rows);
  * latest-state rows = min(K, rows). At 100 TB the provider choice IS
  * the knob that matters: the in-memory map holds every state row on
  * heap per partition, RocksDB spills to local SSD with a block cache —
  * flat-ish per-row cost vs an OOM cliff.
  *
  * Run: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_STATE_KEYS=10,1000,100000 \
  *   SPARK_GRAFT_STREAM_FILES=8 sbt "runMain graft.tools.StateBench"
  */
object StateBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val keyCounts = sys.env.getOrElse("SPARK_GRAFT_STATE_KEYS", "10,1000,100000")
      .split(",").map(_.trim.toLong).toSeq
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "8").toInt
    val providers = Seq(
      "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), logLevel = "ERROR")
    def ms(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val events = graft.Tables.events(spark, sfDir)
    val nRows = events.count()

    // stage once: nFiles time-ordered files, one micro-batch each
    val stageDir = Files.createTempDirectory("graft-state-bench").toString
    EventStreams.normalize(events)
      .withColumn("bucket", ntile(nFiles).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts_us"))))
      .repartitionByRange(nFiles, col("bucket"))
      .write.mode("overwrite").parquet(stageDir)
    val schema = spark.read.parquet(stageDir).schema
    def source(k: Long): DataFrame = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stageDir).drop("bucket")
      // synthetic key: state cardinality scales with K, not the input
      .withColumn("skey", pmod(xxhash64(col("event_id")), lit(k)))

    def run(name: String, provider: String, k: Long)(start: () => StreamingQuery): Unit = {
      val t0 = System.nanoTime()
      val q = start()
      q.processAllAvailable()
      val wallSec = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      val latencies = progress
        .map(_.durationMs.getOrDefault("triggerExecution", 0L).toLong)
      val stateRows = progress.lastOption.toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
      val stateBytes = progress.lastOption.toSeq
        .flatMap(_.stateOperators.toSeq).map(_.memoryUsedBytes).sum
      q.stop()
      println(s"""{"metric":"state_bench","pipeline":"$name","provider":"$provider",""" +
        s""""keys":$k,"state_rows":$stateRows,"state_bytes":$stateBytes,""" +
        s""""rows_per_sec":${ms(nRows / wallSec)},"wall_sec":${ms(wallSec)},""" +
        s""""mean_batch_ms":${if (latencies.nonEmpty) latencies.sum / latencies.length else 0},""" +
        s""""micro_batches":${progress.size},"sf":"$sfDir"}""")
    }

    for ((pName, pClass) <- providers) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", pClass)
      for (k <- keyCounts) {
        // keyed watermarked tumbling window: state rows ≈ min(K·open
        // windows, rows). Watermark delay spans the whole table so no
        // window EVICTS mid-run — the point is maximal live state (a
        // 1-hour delay kept only the last window alive and measured
        // nothing; eviction cost itself is visible in StreamBench)
        run("keyed_window_agg", pName, k) { () =>
          source(k).withColumn("tsx", timestamp_micros(col("ts_us")))
            .withWatermark("tsx", "720 hours")
            .groupBy(window(col("tsx"), "1 hour").as("w"), col("skey"))
            .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
            .writeStream.outputMode("update")
            .format("memory").queryName(s"st_w_${pName}_$k").start()
        }
        // mapGroupsWithState latest-state keyed by the synthetic key:
        // state rows = min(K, rows)
        run("latest_state", pName, k) { () =>
          EventStreams.latestStateStreaming(spark,
              source(k).drop("user_id").withColumnRenamed("skey", "user_id"))
            .writeStream.outputMode("update")
            .format("memory").queryName(s"st_l_${pName}_$k").start()
        }
      }
      // stream-stream interval join at both providers (fixed state —
      // the two-sided watermark buffer, no key knob)
      run("ss_join", pName, 0L) { () =>
        val s = source(2L)
        EventStreams.attributionPairsStreaming(
            s.filter(col("event_type") === "click"),
            s.filter(col("event_type") === "purchase"))
          .writeStream.outputMode("append")
          .format("memory").queryName(s"st_j_$pName").start()
      }
    }
    spark.stop()
  }
}
