package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping (SURVEY §5): interleave the bits of two scan dimensions
  * into one sort key, range-partition + sort the write by it, and
  * every output file/row-group gets TIGHT min/max statistics on BOTH
  * dimensions — so a predicate on either one prunes most of the scan
  * at planning time. A single-column sort gives this on its sort key
  * only; at 100 TB the second dimension is the difference between a
  * pruned scan and a full one. The spread/interleave is the classic
  * 5-step mask-shift identity (public bit-twiddling folklore, e.g.
  * Morton 1966), composed from codegen'd bitwise Columns — no UDF.
  */
object ZOrder {

  /** Spread the low 31 bits of a non-negative BIGINT so bit i lands at
    * position 2i (the even-bit expansion of 2-D Morton encoding).
    */
  def spreadBits(c: Column): Column = {
    val m0 = c.bitwiseAND(lit(0x7FFFFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val m4 = m3.bitwiseOR(shiftleft(m3, 2)).bitwiseAND(lit(0x3333333333333333L))
    m4.bitwiseOR(shiftleft(m4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 2-D Morton z-value of two non-negative dimensions (each truncated
    * to its low 31 bits; callers with wider domains should pre-bucket).
    */
  def zValue(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Write `df` z-clustered on (dimA, dimB): range-partition by the
    * z-value into `files` output files and sort each file by it. The
    * z-curve's locality makes each contiguous z-range a small rectangle
    * stack in (A, B) space — tight per-file min/max on both columns.
    */
  def clusterWrite(df: DataFrame, path: String, dimA: String, dimB: String,
                   files: Int = 16): Unit = {
    val z = zValue(col(dimA), col(dimB)).as("_z")
    df.withColumn("_z", z)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file [min, max] envelopes of two columns of a written dataset —
    * exactly the statistics a min/max-pruning scan consults, surfaced
    * via input_file_name() so a spec can count how many files a range
    * predicate would have to read under a given layout.
    */
  def fileEnvelopes(df: DataFrame, dimA: String, dimB: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(dimA)).as("a_min"), max(col(dimA)).as("a_max"),
        min(col(dimB)).as("b_min"), max(col(dimB)).as("b_max"))
}
