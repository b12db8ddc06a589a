package graft.tools

import java.nio.file.{Files, Paths}

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Streaming micro-batch throughput bench: stage the events table as N
  * separate parquet files, stream them one file per trigger through the
  * watermarked tumbling-window aggregation, and report end-to-end
  * rows/second plus per-micro-batch latency. This measures the
  * Structured-Streaming execution path (state store updates, watermark
  * advance) that the batch-equivalent correctness gate can't see.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.StreamBench"
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "16").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), logLevel = "ERROR")

    // stage: N files ordered by time (realistic arrival order for the
    // watermark) — each becomes one micro-batch via maxFilesPerTrigger
    val events = graft.Tables.events(spark, sfDir)
    val nRows = events.count()
    val stageDir = Files.createTempDirectory("graft-stream-bench").toString
    EventStreams.normalize(events)
      .withColumn("bucket", ntile(nFiles).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts_us"))))
      .repartitionByRange(nFiles, col("bucket"))
      .write.mode("overwrite").parquet(stageDir)

    val schema = spark.read.parquet(stageDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stageDir)
    val t0 = System.nanoTime()
    val q = EventStreams.windowAgg(stream.drop("bucket"), watermark = true)
      .writeStream.outputMode("update")
      .format("memory").queryName("stream_bench").start()
    q.processAllAvailable()
    val wallSec = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.toSeq
    val batches = progress.count(_.numInputRows > 0)
    val latencies = progress.filter(_.numInputRows > 0)
      .map(_.durationMs.getOrDefault("triggerExecution", 0L).toLong)
    q.stop()
    def ms(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"stream_rows_per_sec","value":${ms(nRows / wallSec)},""" +
      s""""rows":$nRows,"micro_batches":$batches,"wall_sec":${ms(wallSec)},""" +
      s""""mean_batch_ms":${if (latencies.nonEmpty) latencies.sum / latencies.length else 0},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
