package graft.dedup

import graft.search.Analyzer
import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY §2.3).
  *
  * Scale design (SURVEY §5): nothing here ever self-joins the corpus
  * blindly. Exact dedup groups on a 64-bit-ish fingerprint of normalized
  * text; MinHash-LSH shuffles 64×8B signatures and joins on band buckets;
  * SimHash shuffles one BIGINT per doc and joins on 15-bit sub-bands with
  * a pigeonhole guarantee (hamming ≤ 3 ⇒ some band equal ⇒ recall 1 vs
  * brute force — what makes the DuckDB brute-force oracle exact).
  */
object Dedup {

  /** Word n-gram shingles over whitespace tokens, joined by '_', distinct. */
  def shingles(c: Column, n: Int = 3): Column = {
    val toks = TextFunctions.wsTokens(c)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), "_")))
      .otherwise(typedlit(Seq.empty[String])))
  }

  def shinglesSql(e: String, n: Int = 3): String = {
    val toks = TextFunctions.wsTokensSql(e)
    s"list_distinct(list_transform(range(1, greatest(len($toks) - ${n - 1} + 1, 1)), " +
      s"i -> array_to_string(list_slice($toks, i, i + ${n - 1}), '_')))"
  }

  /** Exact dedup: cluster docs by fingerprint of analyzer-normalized text;
    * every doc annotated with its cluster representative + size.
    */
  def exactClusters(docs: DataFrame): DataFrame = {
    val fp = TextFunctions.fingerprint(TextFunctions.normalized(col("text")))
    val w = Window.partitionBy(col("fp_norm"))
    docs.select(col("doc_id"), fp.as("fp_norm"))
      .withColumn("cluster_id", min(col("doc_id")).over(w))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .orderBy(col("doc_id"))
  }

  /** Dedup materialization: one representative row per cluster. */
  def exactKeep(docs: DataFrame): DataFrame = {
    val fp = TextFunctions.fingerprint(TextFunctions.normalized(col("text")))
    docs.select(col("doc_id"), fp.as("fp_norm"))
      .groupBy(col("fp_norm"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
      .select(col("doc_id"), col("fp_norm"), col("n_dups"))
      .orderBy(col("doc_id"))
  }

  /** Candidate pairs via shared shingles, verified by exact Jaccard ≥ τ.
    * The shared-shingle join is the blocking step: only docs with ≥1
    * common shingle ever meet (no O(n²) pair enumeration).
    */
  def ngramJaccardPairs(docs: DataFrame, tauX1e6: Long = 500000L): DataFrame = {
    val sh = docs.select(col("doc_id"), shingles(col("text")).as("sh"))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val cand = ex.as("x").join(ex.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    verifyJaccard(cand, sh, tauX1e6)
  }

  private def verifyJaccard(cand: DataFrame, sh: DataFrame, tauX1e6: Long): DataFrame =
    cand
      .join(sh.select(col("doc_id").as("a"), col("sh").as("sh_a")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("sh").as("sh_b")), Seq("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("jac_inter"),
        size(array_union(col("sh_a"), col("sh_b"))).cast("long").as("jac_union"))
      .withColumn("j_x1e6", expr("(1000000 * jac_inter) div jac_union"))
      .filter(col("j_x1e6") >= tauX1e6)
      .select(col("a"), col("b"), col("j_x1e6"))
      .orderBy(col("a"), col("b"))

  // --- MinHash LSH --------------------------------------------------------

  val MinHashPerms = 64
  val MinHashBands = 16 // 4 rows per band
  val MinHashP = 1000000007L

  /** Deterministic permutation constants a_i (odd), b_i. */
  private def permA(i: Int): Long = 2L * i + 1 + 104729L * (i + 1) % MinHashP
  private def permB(i: Int): Long = (7919L * (i + 1) + 13) % MinHashP

  private def sqlLongArray(xs: Seq[Long]): String =
    xs.map(x => s"${x}L").mkString("array(", ", ", ")")

  /** Per-doc MinHash signature: array of 64 BIGINT minima over shingle
    * hashes, h_i(s) = (a_i·fp(s) + b_i) mod p.
    *
    * Evaluation-cost note: interpreted HOF expressions re-evaluate any
    * inlined sub-expression at every lambda reference (ProjectCollapse
    * merges chained selects, so a named column is no protection). The
    * shape below hashes each shingle exactly ONCE (inner transform),
    * expands each hash to its 64 permuted values (cheap arithmetic), and
    * folds element-wise minima with zip_with — per doc: |sh| char-folds +
    * |sh|·64 mult-mods, not 64·|sh| char-folds.
    */
  def minhashSignature(shCol: String): Column = expr(
    s"""aggregate(
       |  transform(
       |    transform($shCol, s -> aggregate(split(s, ''), 0L,
       |      (a, c) -> (a * 31 + ascii(c)) % $MinHashP)),
       |    h -> transform(sequence(0, ${MinHashPerms - 1}), i ->
       |      (element_at(${sqlLongArray((0 until MinHashPerms).map(permA))}, i + 1) * h
       |       + element_at(${sqlLongArray((0 until MinHashPerms).map(permB))}, i + 1))
       |      % $MinHashP)),
       |  array_repeat(${Long.MaxValue}L, $MinHashPerms),
       |  (acc, v) -> zip_with(acc, v, (x, y) -> least(x, y)))""".stripMargin)

  /** LSH band keys: fold each 4-run of the signature into one BIGINT.
    * The signature expression is let-bound via a 1-element array wrapper
    * (`transform(array(sig), s -> …)[1]`) so it is evaluated once, not
    * once per band.
    */
  def bandKeysOf(sigExpr: Column): Column = {
    val rows = MinHashPerms / MinHashBands
    element_at(
      transform(array(sigExpr), sigv =>
        array((0 until MinHashBands).map { bnd =>
          aggregate(slice(sigv, bnd * rows + 1, rows), lit(0L),
            (acc, v) => (acc * 31 + v) % MinHashP)
        }: _*)),
      1)
  }

  /** MinHash-LSH near-dup pairs, verified by exact Jaccard ≥ τ.
    * With J ≥ 0.9 dups, P[miss] = (1-0.9^4)^16 ≈ 3e-8 ⇒ output equals the
    * brute-force oracle; the LSH layer is the 100 TB path (signatures are
    * 64×8 B per doc; candidates only where a band bucket collides).
    */
  def minhashLshPairs(docs: DataFrame, tauX1e6: Long = 500000L): DataFrame = {
    val sh = docs.select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    // repartition: parallelize signature computation (source parquet is a
    // single file) and barrier it from the downstream self-join
    val sig = sh.repartition(col("doc_id"))
      .select(col("doc_id"), bandKeysOf(minhashSignature("sh")).as("bands"))
    val ex = sig.select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "key")))
    val cand = ex.as("x").join(ex.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    verifyJaccard(cand, sh, tauX1e6)
  }

  // --- SimHash ------------------------------------------------------------

  val SimBits = 60
  val SimHamK = 3 // pairs with hamming ≤ 3; 4 bands × 15 bits ⇒ exact recall

  /** 60-bit SimHash over analyzed tokens: two 30-bit char-fold hashes per
    * token (multipliers 31 / 37, moduli 1e9+7 / 998244353); bit j of the
    * signature = sign of Σ_tokens (2·bit_j(h) − 1). SQL expr for nested
    * HOF lambdas; bit-exact DuckDB rendering in [[simhashSignatureSql]].
    */
  def simhashSignature(toksCol: String): Column = expr(
    s"""aggregate(sequence(0, 29), 0L, (acc, j) -> acc
       |  + IF(aggregate(transform($toksCol, t -> aggregate(split(t, ''), 0L,
       |        (a, c) -> (a * 31 + ascii(c)) % 1000000007)), 0L,
       |      (a, h) -> a + (CAST(shiftright(h, j) % 2 AS BIGINT) * 2 - 1)) > 0,
       |      shiftleft(1L, j), 0L)
       |  + IF(aggregate(transform($toksCol, t -> aggregate(split(t, ''), 0L,
       |        (a, c) -> (a * 37 + ascii(c)) % 998244353)), 0L,
       |      (a, h) -> a + (CAST(shiftright(h, j) % 2 AS BIGINT) * 2 - 1)) > 0,
       |      shiftleft(1L, CAST(j + 30 AS INT)), 0L))""".stripMargin)

  /** DuckDB rendering of [[simhashSignature]] over a token-list SQL expr. */
  def simhashSignatureSql(toksExpr: String): String =
    s"""list_sum(list_transform(range(0, 30), j ->
       |  (CASE WHEN list_sum(list_transform($toksExpr, t ->
       |      ((list_reduce(list_prepend(CAST(0 AS BIGINT),
       |          list_transform(string_split_regex(t, ''), c -> CAST(ascii(c) AS BIGINT))),
       |        (a, c) -> (a * 31 + c) % 1000000007) >> j) & 1) * 2 - 1)) > 0
       |    THEN (1::BIGINT << j) ELSE 0 END)
       |  + (CASE WHEN list_sum(list_transform($toksExpr, t ->
       |      ((list_reduce(list_prepend(CAST(0 AS BIGINT),
       |          list_transform(string_split_regex(t, ''), c -> CAST(ascii(c) AS BIGINT))),
       |        (a, c) -> (a * 37 + c) % 998244353) >> j) & 1) * 2 - 1)) > 0
       |    THEN (1::BIGINT << (j + 30)) ELSE 0 END)))""".stripMargin

  /** SimHash near-dup pairs with hamming ≤ K, found via 15-bit sub-band
    * blocking (pigeonhole: K=3 differing bits can't hit all 4 bands).
    */
  def simhashPairs(docs: DataFrame): DataFrame = {
    val sigs = docs
      .select(col("doc_id"), Analyzer.tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), simhashSignature("toks").as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> shiftright(sig, CAST(b * 15 AS INT)) % 32768)"))
        .as(Seq("band", "key")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("x.sig").as("sig_a"),
              col("y.doc_id").as("b"), col("y.sig").as("sig_b"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= SimHamK)
      .select(col("a"), col("b"), col("hamming"))
      .orderBy(col("a"), col("b"))
  }
}
