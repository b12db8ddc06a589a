package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analyzer mirroring the shape of the ES `english` analyzer the
  * reference relies on (reference: metastore/models.py:20-25 q_fields +
  * tests/test_controllers.py:16-17 "analyzer": "english"): lowercase,
  * split on non-alphanumerics, drop stop words.
  *
  * The stop-word list is a fixed 30-word spec shared bit-for-bit with the
  * DuckDB oracles (SURVEY §4.2); stemming is offered separately via
  * [[PorterStemmer]] and is not part of the oracle-gated path (float-free
  * determinism matters more than full ES fidelity here).
  */
object Analyzer {

  /** Fixed English stop-word spec (keep in sync with [[stopwordsSql]]). */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "is", "are", "was", "were",
    "to", "in", "on", "for", "with", "by", "at", "as", "it", "this",
    "that", "be", "from", "has", "have", "had", "not", "but", "they", "their")

  private val stopArr: Column = typedlit(stopwords)

  /** Analyzed token array: lowercase → split non-alphanumeric → drop
    * empties and stop words. Pure `functions._` composition (codegen'd).
    */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"),
           t => t =!= "" && !array_contains(stopArr, t))

  /** DuckDB list literal of the stop words, for oracle SQL. */
  val stopwordsSql: String = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")

  /** DuckDB rendering of [[tokens]] over a SQL expression. */
  def tokensSql(expr: String): String =
    s"list_filter(string_split_regex(lower($expr), '[^a-z0-9]+'), " +
      s"x -> x <> '' AND NOT list_contains($stopwordsSql, x))"

  /** Analyze a raw query string driver-side (for constant query terms). */
  def analyzeQuery(q: String): Seq[String] =
    q.toLowerCase.split("[^a-z0-9]+").toSeq
      .filter(t => t.nonEmpty && !stopwords.contains(t))

  /** Full ES-`english`-analyzer shape: tokens + Porter stemming
    * (reference: tests/test_controllers.py:16). Not oracle-gated (no SQL
    * stemmer) — pinned by AnalyzerSpec instead.
    */
  def stemmedTokens(c: Column): Column =
    transform(tokens(c), t => graft.functions.TextExpressionFunctions.porterStem(t))

  def analyzeQueryStemmed(q: String): Seq[String] =
    analyzeQuery(q).map(graft.text.PorterStemmer.stem)
}
