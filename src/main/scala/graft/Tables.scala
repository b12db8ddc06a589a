package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet loaders for the driver-generated test tables.
  *
  * All loaders are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown freedom (column pruning + predicate pushdown reach the scan).
  */
object Tables {
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fan a scan out to the session's core count ONLY when the source is
    * under-parallelized. At 100 TB an input arrives as thousands of
    * parquet splits, `getNumPartitions >= defaultParallelism`, and this
    * is an identity — no corpus-wide shuffle ever happens on a real
    * cluster. Locally the driver's single-row-group test files open as
    * ONE partition, which would serialize every downstream expression;
    * only in that degenerate case do we pay one round-robin shuffle.
    * (Replaces the unconditional `repartition` flagged in VERDICT r1 #3.)
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** The "dataset index" view: maps the `documents` table onto the
    * reference's dataset-document shape (reference: metastore/models.py:14-35
    * — fields datahub.{owner,ownerid,findability,stats.bytes},
    * datapackage.readme, title). Derivations are deterministic so the DuckDB
    * oracle can reproduce them; see SparkEntry.oracleSql's `idx` CTE.
    */
  def datasetIndex(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).select(
      col("doc_id"),
      concat(lit("pkg-"), col("doc_id")).as("name"),
      // title = first 5 whitespace tokens of the text
      array_join(slice(split(col("text"), " "), 1, 5), " ").as("title"),
      col("text").as("readme"),
      concat(lit("Owner "), col("source")).as("owner"),
      // a small set of doc_ids belongs to the boosted 'core' owner
      when(col("doc_id") % 11 === 0, lit("core")).otherwise(col("source")).as("ownerid"),
      when(col("doc_id") % 3 === 0, lit("published"))
        .when(col("doc_id") % 3 === 1, lit("unlisted"))
        .otherwise(lit("private")).as("findability"),
      col("n_chars").cast("long").as("bytes"),
      // nested datahub.stats struct (reference: models.py:14-35 stats
      // subdocument; dotted-path filtering pinned by
      // tests/test_controllers.py:347-352)
      struct(
        expr("CAST(n_chars div 10 AS BIGINT)").as("rowcount"),
        col("n_chars").cast("long").as("bytes")).as("stats"),
      col("lang"), col("source"))

  /** Events mapped onto the reference's event-document shape
    * (reference: metastore/models.py:27-34, tests/test_controllers.py:101-116:
    * event_entity/event_action/ownerid/dataset/status/findability/timestamp).
    */
  def eventIndex(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    // events.ts is TIMESTAMP(NANOS) parquet: Spark reads it as LongType
    // nanos under spark.sql.legacy.parquet.nanosAsLong=true (set in
    // Verify/Bench sessions); normalize to epoch micros (BIGINT) either way.
    val tsUs = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts"))
    }
    ev.select(
      col("event_id"),
      tsUs.as("ts_us"),
      col("event_type").as("event_entity"),
      when(col("value") >= 100.0, lit("finished")).otherwise(lit("deleted")).as("event_action"),
      concat(lit("user"), col("user_id")).as("ownerid"),
      concat(lit("dataset"), col("event_id") % 50).as("dataset"),
      when(col("event_id") % 7 === 0, lit("Not OK")).otherwise(lit("OK")).as("status"),
      when(col("event_id") % 2 === 0, lit("published")).otherwise(lit("unlisted")).as("findability"),
      col("value"))
  }

  /** The `idx` CTE for DuckDB oracles — must mirror datasetIndex exactly. */
  val datasetIndexSql: String =
    """SELECT doc_id,
      |  'pkg-' || doc_id AS name,
      |  array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS title,
      |  text AS readme,
      |  'Owner ' || source AS owner,
      |  CASE WHEN doc_id % 11 = 0 THEN 'core' ELSE source END AS ownerid,
      |  CASE WHEN doc_id % 3 = 0 THEN 'published'
      |       WHEN doc_id % 3 = 1 THEN 'unlisted'
      |       ELSE 'private' END AS findability,
      |  CAST(n_chars AS BIGINT) AS bytes,
      |  {'rowcount': CAST(n_chars // 10 AS BIGINT),
      |   'bytes': CAST(n_chars AS BIGINT)} AS stats,
      |  lang, source
      |FROM documents""".stripMargin

  /** The `ev` CTE for DuckDB oracles — must mirror eventIndex exactly. */
  val eventIndexSql: String =
    """SELECT event_id,
      |  epoch_us(ts) AS ts_us,
      |  event_type AS event_entity,
      |  CASE WHEN value >= 100.0 THEN 'finished' ELSE 'deleted' END AS event_action,
      |  'user' || user_id AS ownerid,
      |  'dataset' || (event_id % 50) AS dataset,
      |  CASE WHEN event_id % 7 = 0 THEN 'Not OK' ELSE 'OK' END AS status,
      |  CASE WHEN event_id % 2 = 0 THEN 'published' ELSE 'unlisted' END AS findability,
      |  value
      |FROM events""".stripMargin
}
