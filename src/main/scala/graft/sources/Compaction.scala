package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction (SURVEY §5): rewrite a fragmented dataset into
  * size-targeted files. At 100 TB the small-files problem is a
  * first-order cost — a table left as millions of KB-scale files pays
  * per-file open/footer overhead on EVERY scan and floods the driver
  * with splits; compaction pays one bounded rewrite instead. The
  * partition count is planned from the MEASURED input bytes (actual
  * file lengths, not optimizer estimates), so output file sizes track
  * the target regardless of upstream fragmentation.
  */
object Compaction {

  /** Total on-disk bytes of the files backing `df` (parquet-compressed
    * size — the unit the file-count plan should be denominated in).
    * One batched `listStatus` per distinct parent directory, NOT one
    * getFileStatus RPC per file: on the fragmented tables this sink
    * exists for (millions of small files), per-file metadata
    * round-trips on the driver would cost more than the rewrite.
    */
  def inputBytes(spark: SparkSession, df: DataFrame): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = df.inputFiles
    val wanted = files.map(f => new Path(f).toUri.getPath).toSet
    files.map(f => new Path(f).getParent).distinct.map { dir =>
      dir.getFileSystem(conf).listStatus(dir)
        .filter(s => s.isFile && wanted.contains(s.getPath.toUri.getPath))
        .map(_.getLen).sum
    }.sum
  }

  /** Output file count for `bytes` of input at `targetBytes` per file:
    * ceil, floored at 1 — never zero files, never a file planned above
    * ~2× target (the ceil rounds the remainder into its own file).
    */
  def planFiles(bytes: Long, targetBytes: Long): Int =
    math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt

  /** Compact `df` to `path` at ~`targetBytes` per output file. With a
    * `sortCol` the write range-partitions + sorts by it, preserving
    * min/max pruning on that column (a plain round-robin repartition
    * would destroy any existing clustering); without one it
    * round-robins for even file sizes. Returns the planned file count.
    */
  def compact(spark: SparkSession, df: DataFrame, path: String,
              targetBytes: Long, sortCol: Option[String] = None): Int = {
    val n = planFiles(inputBytes(spark, df), targetBytes)
    val out = sortCol match {
      case Some(c) =>
        df.repartitionByRange(n, col(c)).sortWithinPartitions(col(c))
      case None => df.repartition(n)
    }
    out.write.mode("overwrite").parquet(path)
    n
  }

  /** (file, bytes) of a written dataset's data files — what the spec
    * asserts the size target against.
    */
  def fileSizes(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val p = new Path(path)
    val fs: FileSystem = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.getName, s.getLen))
  }
}
