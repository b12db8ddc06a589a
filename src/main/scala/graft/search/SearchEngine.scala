package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A text-searchable field with its relevance boost
  * (reference: metastore/models.py:37-42 BOOSTS — title^5, owner^2,
  * ownerid^1, readme^2).
  */
case class SearchField(name: String, boost: Int)

/** A search request, mirroring the reference's query-string contract
  * (reference: metastore/models.py:54-141): free-text `q`, exact-value
  * filters (multiple values OR'd), optional authenticated user, page
  * size (cap 100, default 50) and offset, sort direction for
  * timestamp-sorted kinds.
  */
case class SearchRequest(
    q: Option[String] = None,
    filters: Map[String, Seq[String]] = Map.empty,
    userid: Option[String] = None,
    size: Int = 50,
    from: Int = 0,
    sortAsc: Boolean = false)

/** Spark-native re-expression of the metastore search semantics.
  *
  * Everything is a declarative DataFrame plan: visibility and filters are
  * pushdown-friendly predicates on the scan; ranking is a melt →
  * broadcast-joined corpus-stats → partial-aggregated score (SURVEY §5:
  * one tiny stats shuffle, no corpus-wide shuffle; final top-k is a
  * TakeOrderedAndProject).
  *
  * Scoring is the deterministic integer-scaled TF-IDF of SURVEY §4.2:
  * idf_t,f = (N*1000) div df_t,f (BIGINT), score = Σ_f Σ_t tf·boost·idf,
  * +4500 flat bonus for published docs of the boosted 'core' owner
  * (reference: metastore/models.py:65-71 boost_core).
  */
class SearchEngine(
    val fields: Seq[SearchField],
    val idCol: String = "doc_id",
    val findabilityCol: String = "findability",
    val ownerCol: String = "ownerid",
    val bytesCol: String = "bytes") {

  import SearchEngine._

  /** Visibility rule (reference: metastore/models.py:58-79): anonymous
    * sees `findability = 'published'`; an authenticated user additionally
    * sees documents they own.
    */
  def visible(docs: DataFrame, userid: Option[String]): DataFrame = {
    val published = col(findabilityCol) === "published"
    docs.filter(userid.fold(published)(u => published || col(ownerCol) === u))
  }

  /** Exact-value filters: AND across properties, OR across the values of
    * one property (reference: metastore/models.py:97-105).
    */
  def filtered(docs: DataFrame, filters: Map[String, Seq[String]]): DataFrame =
    filters.foldLeft(docs) { case (d, (field, values)) =>
      d.filter(values.map(v => col(field) === v).reduce(_ || _))
    }

  /** ES-5 `match`-mode filters — what the reference actually sends for
    * the DATASET kind (reference: metastore/models.py:97 —
    * `match_or_term = 'term' if kind == 'events' else 'match'`; on ES 5
    * dynamic text mappings a `match` filter ANALYZES its value). A
    * property passes when ANY of its values shares ANY analyzed token
    * with the analyzed field value — OR within a property's values (the
    * reference's bool-should with minimum_should_match: 1), AND across
    * properties; case folding and multi-token values behave like ES
    * `match` with its default OR operator. [[filtered]] keeps the exact
    * (term) mode the reference's own tests pin for events — the two
    * agree on the pre-normalized values those tests send for datasets.
    */
  def analyzedFiltered(docs: DataFrame, filters: Map[String, Seq[String]]): DataFrame =
    filters.foldLeft(docs) { case (d, (field, values)) =>
      val toks = values.flatMap(Analyzer.analyzeQuery).distinct
      d.filter(arrays_overlap(Analyzer.tokens(col(field)), typedlit(toks)))
    }

  /** Analyzed multi-field match: the doc matches if any analyzed query
    * term occurs in any q_field (reference: metastore/models.py:88-96
    * multi_match most_fields as a must clause).
    */
  def matchesQ(terms: Seq[String]): Column =
    fields.map(f => arrays_overlap(Analyzer.tokens(col(f.name)), typedlit(terms)))
      .reduce(_ || _)

  /** Stemmed variant: both sides of the match run through the Porter
    * stemmer, like the ES `english` analyzer ("merging" finds "merge").
    */
  def matchesQStemmed(stemmedTerms: Seq[String]): Column =
    fields.map(f => arrays_overlap(Analyzer.stemmedTokens(col(f.name)), typedlit(stemmedTerms)))
      .reduce(_ || _)

  /** Per-doc integer TF-IDF score over the q_fields (SURVEY §4.2).
    * Returns (idCol, raw_score) for docs with score > 0.
    * Corpus stats (df, N) are computed over the FULL index — the analog
    * of ES `dfs_query_then_fetch` global term stats
    * (reference: metastore/models.py:141) — then broadcast.
    */
  def scores(docs: DataFrame, terms: Seq[String],
             postingsIn: Option[DataFrame] = None): DataFrame =
    scoresFrom(scoreComponents(docs, terms, postingsIn))

  /** [[scores]] from ALREADY-COMPUTED components — lets a caller that
    * also needs the per-term breakdown (scoreExplain) reuse one
    * checkpointed component set instead of running the corpus-wide
    * tokenize+score pipeline twice (ADVICE r5).
    */
  def scoresFrom(components: DataFrame): DataFrame =
    components
      .groupBy(col(idCol))
      .agg(sum(col("component")).cast("long").as("raw_score"))

  /** Per-(doc, field, term) TF-IDF components — the ES `explain: true`
    * analog (reference: metastore/models.py:114): tf, df, the ×1000
    * integer idf, the field boost, and component = tf·boost·idf.
    * [[scores]] is exactly `sum(component) GROUP BY id`, so the explain
    * projection can never drift from the ranking it explains.
    */
  def scoreComponents(docs: DataFrame, terms: Seq[String],
                      postingsIn: Option[DataFrame] = None): DataFrame = {
    // tf feeds BOTH the df aggregate and the scoring join; it is tiny
    // (matching docs × query terms only). With a prebuilt postings
    // table (the memoized inverted index — [[postingsPlan]]) tf is a
    // term-filtered read of pinned blocks, so no barrier is needed; the
    // inline path materializes once so the corpus-wide tokenize+explode
    // cannot run twice (AQE gives no cross-consumer exchange reuse)
    val tf = postingsIn match {
      case Some(p) => p.filter(col("term").isin(terms: _*))
      case None => postingsPlan(docs)
        .filter(col("term").isin(terms: _*))
        .localCheckpoint()
    }
    val df = tf.groupBy(col("field"), col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    tf.join(broadcast(df), Seq("field", "term"))
      .crossJoin(broadcast(n))
      .withColumn("idf", expr("(n * 1000) div df"))
      .withColumn("component", (col("tf") * col("boost") * col("idf")).cast("long"))
  }

  /** The full (id, field, term, boost, tf) postings table — the
    * inverted index a search deployment builds ONCE at ingest and
    * every query reads (ES's own index shape). Melt fields, explode
    * analyzed tokens, count (doc, field, term) occurrences: one
    * analyzer pass per field, whole-stage codegen + partial
    * aggregation, no corpus shuffle (input splits parallelize the
    * scan; Tables.fanOut is an identity at scale). Registry queries
    * read the memoized+pinned copy ([[graft.operators.Metastore.memoPostings]])
    * so steady-state reps never re-tokenize the corpus; the filtered
    * inline build in [[scoreComponents]] stays for arbitrary callers.
    */
  def postingsPlan(docs: DataFrame): DataFrame =
    graft.Tables.fanOut(docs).select(
      col(idCol),
      explode(array(fields.map(f =>
        struct(lit(f.name).as("field"), lit(f.boost.toLong).as("boost"),
               Analyzer.tokens(col(f.name)).as("toks"))): _*)).as("f"))
      .select(col(idCol), col("f.field").as("field"), col("f.boost").as("boost"),
              explode(col("f.toks")).as("term"))
      .groupBy(col(idCol), col("field"), col("term"), col("boost"))
      .agg(count(lit(1)).as("tf"))

  /** Ranked search: visibility + filters + q-match + TF-IDF order + page.
    * Output: rank, id, score + the given projection columns.
    */
  def rankedSearch(docs: DataFrame, req: SearchRequest, projection: Seq[String],
                   postingsIn: Option[DataFrame] = None): DataFrame = {
    val terms = Analyzer.analyzeQuery(req.q.getOrElse(""))
    require(terms.nonEmpty, "rankedSearch needs a non-empty analyzed query")
    rankedSearchScored(docs, scores(docs, terms, postingsIn), req, projection)
  }

  /** [[rankedSearch]] with the per-doc scores supplied by the caller
    * (paired with [[scoresFrom]] for component reuse).
    */
  def rankedSearchScored(docs: DataFrame, docScores: DataFrame,
                         req: SearchRequest, projection: Seq[String]): DataFrame = {
    val scored = boostedHits(docs, docScores, req)
    val ordered = scored.orderBy(col("score").desc, col(idCol))
      .offset(req.from).limit(cappedSize(req.size))
    // rank the ≤100-row page only (scale-safe single-partition window)
    ordered
      .withColumn("rank",
        (row_number().over(Window.orderBy(col("score").desc, col(idCol))) + req.from).cast("int"))
      .select((Seq("rank", idCol) ++ projection ++ Seq("score")).map(col): _*)
  }

  /** The request's FULL boosted hit list (visibility ∧ filters joined
    * with scores + core boost), before pagination — the set
    * [[rankedSearchScored]] pages and field collapse
    * (ms_collapse) groups per key.
    */
  def boostedHits(docs: DataFrame, docScores: DataFrame, req: SearchRequest): DataFrame = {
    val vis = filtered(visible(docs, req.userid), req.filters)
    vis.join(docScores, Seq(idCol))
      .withColumn("score",
        col("raw_score") +
          when(col(ownerCol) === "core" && col(findabilityCol) === "published",
               lit(CoreBoost)).otherwise(lit(0L)))
  }

  /** Unranked search page with a deterministic sort (id order), mirroring
    * filter-only queries (reference: tests/test_controllers.py:374-393).
    */
  def page(docs: DataFrame, req: SearchRequest, projection: Seq[String]): DataFrame = {
    val vis = filtered(visible(docs, req.userid), req.filters)
    val withQ = Analyzer.analyzeQuery(req.q.getOrElse("")) match {
      case Nil => vis
      case terms => vis.filter(matchesQ(terms))
    }
    withQ.orderBy(col(idCol)).offset(req.from).limit(cappedSize(req.size))
      .select(projection.map(col): _*)
  }

  /** Sorted page for timestamp-ordered kinds (reference:
    * metastore/models.py:81-85 — events sort desc by default, asc on
    * request), ties broken by id in the sort direction.
    */
  def sortedPage(docs: DataFrame, req: SearchRequest, sortCol: String,
                 projection: Seq[String]): DataFrame = {
    val vis = filtered(visible(docs, req.userid), req.filters)
    val ord =
      if (req.sortAsc) Seq(col(sortCol).asc, col(idCol).asc)
      else Seq(col(sortCol).desc, col(idCol).desc)
    vis.orderBy(ord: _*).offset(req.from).limit(cappedSize(req.size))
      .select(projection.map(col): _*)
  }

  /** Summary over ALL matches, not the page: total hit count + totalBytes
    * (reference: metastore/models.py:116-117,150-163 — ES sum agg on
    * datahub.stats.bytes).
    */
  /** The full match set of a request — visibility ∧ filters ∧ analyzed
    * q-match; the set [[summary]] aggregates and [[facets]] buckets.
    */
  def matchSet(docs: DataFrame, req: SearchRequest): DataFrame = {
    val vis = filtered(visible(docs, req.userid), req.filters)
    Analyzer.analyzeQuery(req.q.getOrElse("")) match {
      case Nil => vis
      case terms => vis.filter(matchesQ(terms))
    }
  }

  def summary(docs: DataFrame, req: SearchRequest): DataFrame =
    matchSet(docs, req).agg(count(lit(1)).as("total"),
      coalesce(sum(col(bytesCol)), lit(0L)).as("total_bytes"))

  /** Faceted value counts over ALL matches (the search-UI sidebar; the
    * ES terms-aggregation analog, beyond the reference's total/bytes
    * summary): the facet columns melt to (facet, value) rows in one
    * stack() pass — no per-facet rescan — and a single partial-agg
    * groupBy reduces to the facet grid, which is values-sized at any
    * corpus scale.
    */
  def facets(docs: DataFrame, req: SearchRequest,
             facetFields: Seq[String]): DataFrame = {
    val stackExpr = s"stack(${facetFields.length}, " +
      facetFields.map(f => s"'$f', CAST(`$f` AS STRING)").mkString(", ") +
      ") AS (facet, value)"
    matchSet(docs, req).select(expr(stackExpr))
      .groupBy(col("facet"), col("value"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("facet"), col("value"))
  }
}

object SearchEngine {
  /** Flat integer bonus standing in for the reference's 4.5 boost on the
    * 'core' owner (metastore/models.py:65-71), scaled ×1000 like idf.
    */
  val CoreBoost = 4500L

  /** Reference page-size cap (metastore/models.py:129-132). */
  def cappedSize(size: Int): Int = math.min(size, 100)

  /** The dataset-index field spec (reference: metastore/models.py:37-42). */
  val datasetFields: Seq[SearchField] = Seq(
    SearchField("title", 5), SearchField("owner", 2),
    SearchField("ownerid", 1), SearchField("readme", 2))

  def datasets: SearchEngine = new SearchEngine(datasetFields)

  def events: SearchEngine =
    new SearchEngine(Nil, idCol = "event_id", bytesCol = "value")
}
