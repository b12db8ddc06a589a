package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Exactly-once parquet sink for `foreachBatch` — the piece that turns
  * Structured Streaming's at-least-once batch replay into exactly-once
  * OUTPUT. The engine guarantees a replayed micro-batch carries the SAME
  * batchId; this sink makes the write idempotent in that id:
  *
  *   1. a batch writes to `<root>/_staging/batch=<id>` (overwrite — a
  *      half-written staging dir from a crash is simply rewritten),
  *   2. the staging dir is atomically renamed to `<root>/batch=<id>`
  *      (one filesystem metadata op — the commit point),
  *   3. a batchId whose committed dir already exists is a NO-OP.
  *
  * Readers see `<root>/batch=*` only — never staging — so a batch is
  * visible all-or-nothing. Scale notes: the commit is O(1) metadata per
  * micro-batch regardless of row volume; on object stores without atomic
  * rename the same protocol holds with a manifest-file commit point
  * (write `batch=<id>/_SUCCESS` last and filter on it) — the rename is
  * the HDFS-flavored instance of the idea. No driver-side data movement
  * anywhere: the executors write the staging files, the driver renames
  * one directory.
  */
object IdempotentSink {

  /** The committed directory for a batch id. */
  def committedDir(root: String, batchId: Long): String =
    s"$root/batch=$batchId"

  /** True if `batchId` has already been committed under `root`. */
  def isCommitted(spark: org.apache.spark.sql.SparkSession,
                  root: String, batchId: Long): Boolean = {
    val p = new Path(committedDir(root, batchId))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Idempotent batch write: replaying the same (df, batchId) leaves the
    * committed output byte-identical. Pass this to
    * `writeStream.foreachBatch(IdempotentSink.write(root) _)`.
    */
  def write(root: String)(df: DataFrame, batchId: Long): Unit = {
    val spark = df.sparkSession
    if (!isCommitted(spark, root, batchId)) {
      val conf = spark.sparkContext.hadoopConfiguration
      val staging = new Path(s"$root/_staging/batch=$batchId")
      val committed = new Path(committedDir(root, batchId))
      df.write.mode("overwrite").parquet(staging.toString)
      val fs = committed.getFileSystem(conf)
      fs.mkdirs(committed.getParent)
      // the commit point: one atomic metadata op
      require(fs.rename(staging, committed),
        s"commit rename failed for batch $batchId")
    }
  }

  /** Everything committed so far, as one DataFrame (staging excluded by
    * construction — only `batch=*` dirs are read).
    */
  def readCommitted(spark: org.apache.spark.sql.SparkSession,
                    root: String): DataFrame =
    spark.read.option("basePath", root).parquet(s"$root/batch=*")
}
