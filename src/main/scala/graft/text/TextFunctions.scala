package graft.text

import graft.search.Analyzer
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines (SURVEY §2.5).
  * All pure `functions._` compositions (codegen'd, no UDFs), each with an
  * exact DuckDB rendering for the oracle gate.
  */
object TextFunctions {

  /** Modulus for the rolling polynomial fingerprint (fits BIGINT: acc<M,
    * 31*M + 255 << 2^63).
    */
  val FpMod = 1000000007L

  /** Raw lowercase alphanumeric tokens (no stop-word removal). */
  def rawTokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")

  def rawTokensSql(e: String): String =
    s"list_filter(string_split_regex(lower($e), '[^a-z0-9]+'), x -> x <> '')"

  /** Whitespace tokens. */
  def wsTokens(c: Column): Column = filter(split(c, " "), t => t =!= "")

  def wsTokensSql(e: String): String =
    s"list_filter(string_split($e, ' '), x -> x <> '')"

  /** BPE-ish token count: alphanumeric runs, each digit separately, plus
    * standalone punctuation — the usual pre-tokenizer shape.
    */
  val bpeRegex = "[a-z]+|[0-9]|[^a-z0-9\\s]"
  def bpeCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit(bpeRegex), lit(0))).cast("long")
  def bpeCountSql(e: String): String =
    s"CAST(len(regexp_extract_all(lower($e), '$bpeRegex')) AS BIGINT)"

  /** Rolling polynomial hash fingerprint over the string's characters:
    * fold(chars, 0, (acc, ch) -> (acc*31 + codepoint) mod FpMod).
    * Evaluated by the codegen'd native [[graft.functions.PolyHash]];
    * bit-exact with DuckDB's `list_reduce` char fold for ASCII/BMP text
    * (pinned in AnalyzerSpec).
    */
  def fingerprint(c: Column): Column =
    graft.functions.TextExpressionFunctions.polyHash(c, 31L, FpMod)

  def fingerprintSql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split_regex($e, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % ${FpMod})"

  /** Language-ID marker profiles: a fixed spec scored by distinct-token
    * overlap; ties resolved by the profile's priority index (SURVEY §2.5 —
    * the heuristic is the deliverable; `lang` labels are synthetic).
    */
  val langProfiles: Seq[(String, Int, Seq[String])] = Seq(
    ("en", 4, Seq("the", "fast", "key", "order", "sort", "a")),
    ("de", 3, Seq("window", "hash", "join", "value", "slow")),
    ("es", 2, Seq("table", "scan", "merge", "part", "small")),
    ("fr", 1, Seq("group", "query", "row", "data", "column")),
    ("zh", 0, Seq("filter", "customer", "line", "batch", "stream")))

  /** Normalized text = analyzed tokens re-joined (for dedup hashing). */
  def normalized(c: Column): Column = array_join(Analyzer.tokens(c), " ")

  def normalizedSql(e: String): String =
    s"array_to_string(${Analyzer.tokensSql(e)}, ' ')"
}
