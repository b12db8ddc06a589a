package graft.search

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Result envelope mirroring the reference's response shape
  * (reference: metastore/models.py:158-164 — results + summary.total +
  * summary.totalBytes, or an empty envelope with `error` set).
  */
case class ApiResult(results: DataFrame, total: Long, totalBytes: Double,
                     error: Option[String] = None)

/** The `controllers.search` equivalent (reference:
  * metastore/controllers.py:6-17 + models.py:122-174): takes the raw
  * query-string multimap, applies the reference's parameter protocol —
  * `size` capped at 100 (first value), `from` offset, `q` free text,
  * `sort` for events, every other parameter a JSON-encoded exact-match
  * filter — and returns page + all-match summary. Malformed JSON values
  * and unknown fields produce the reference's empty-envelope-with-error
  * behavior, not an exception.
  */
object MetastoreApi {

  /** Minimal json.loads for filter values: "x" → string, 6 → number,
    * true/false → boolean. Bare words raise, like json.loads
    * (reference: tests/test_controllers.py:360-372).
    */
  private[graft] def jsonValue(s: String): Any = {
    val t = s.trim
    if (t.length >= 2 && t.head == '"' && t.last == '"') t.substring(1, t.length - 1)
    else if (t == "true") true
    else if (t == "false") false
    else if (t.matches("-?\\d+")) t.toLong
    else if (t.matches("-?\\d+\\.\\d+")) t.toDouble
    else throw new IllegalArgumentException(s"Expecting value: $t is not valid JSON")
  }

  /** Token-authenticated entry point (reference: metastore/blueprint.py:
    * 22-28): decodes an HS256 JWT to the acting userid via [[AuthToken]];
    * a missing or invalid token degrades to an anonymous search.
    */
  def searchWithToken(spark: SparkSession, dir: String, kind: String,
                      token: Option[String], key: Array[Byte],
                      args: Map[String, Seq[String]]): ApiResult =
    search(spark, dir, kind, token.flatMap(AuthToken.userid(_, key)), args)

  /** The kinds the reference's controller registry resolves
    * (controllers/__init__.py — dataset + events); anything else maps
    * to None there and HTTP 400 at the blueprint (blueprint.py:31-32).
    */
  val knownKinds: Set[String] = Set("dataset", "events")

  def search(spark: SparkSession, dir: String, kind: String = "dataset",
             userid: Option[String] = None,
             args: Map[String, Seq[String]] = Map.empty): ApiResult = {
    try {
      val (docs, engine, sortCol) = kind match {
        case "dataset" => (Tables.datasetIndex(spark, dir), SearchEngine.datasets, None)
        case "events" => (Tables.eventIndex(spark, dir), SearchEngine.events, Some("ts_us"))
        case other => throw new IllegalArgumentException(s"unknown kind: $other")
      }
      var kw = args
      def pop(k: String): Option[String] = {
        val v = kw.get(k).flatMap(_.headOption)
        kw -= k
        v
      }
      val size = math.min(pop("size").map(_.toInt).getOrElse(50), 100)
      val from = pop("from").map(_.toInt).getOrElse(0)
      val q = pop("q").map(v => String.valueOf(jsonValue(v)))
      val sortAsc = pop("sort").map(_.replace("\"", "")).contains("asc")

      // remaining params: exact filters, values OR'd (models.py:97-105).
      // Unknown columns → AnalysisException → error envelope, like an ES
      // unmapped-field error.
      val filters = kw.map { case (k, vs) =>
        k -> vs.map(v => String.valueOf(jsonValue(v)))
      }
      val req = SearchRequest(q = q, filters = filters, userid = userid,
        size = size, from = from, sortAsc = sortAsc)
      val projection = docs.columns.toSeq.filterNot(_ == engine.idCol)
      val page = sortCol match {
        case Some(ts) => engine.sortedPage(docs, req, ts, engine.idCol +: projection)
        case None if q.isDefined && Analyzer.analyzeQuery(q.get).nonEmpty =>
          engine.rankedSearch(docs, req, Seq("name"))
        case None => engine.page(docs, req, engine.idCol +: projection)
      }
      val sm = engine.summary(docs, req).collect()(0)
      val totalBytes = sm.get(1) match {
        case l: java.lang.Long => l.toDouble
        case d: java.lang.Double => d.doubleValue()
        case other => other.toString.toDouble
      }
      ApiResult(page, sm.getLong(0), totalBytes)
    } catch {
      case e: Exception =>
        val empty = spark.emptyDataFrame
        ApiResult(empty, 0L, 0.0, Some(e.getMessage))
    }
  }
}
