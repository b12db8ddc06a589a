package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers (SURVEY §5): pre-partition fact tables by join
  * key at write time so repeated co-located joins skip the shuffle
  * entirely. On a 100 TB cluster this is the difference between one
  * sort/shuffle at ingest and one per query.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two tables bucketed on the same key — shuffle-free when bucket
    * counts match (Catalyst recognizes the HashClusteredDistribution).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
