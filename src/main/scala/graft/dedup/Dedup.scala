package graft.dedup

import graft.search.Analyzer
import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Word n-gram shingles over whitespace tokens, joined by '_', distinct
    * (first-occurrence order) — computed by the native codegen'd
    * [[graft.functions.WordShingles]] expression (one pass per row).
    */
  def shingles(c: Column, n: Int = 3): Column =
    graft.functions.TextExpressionFunctions.wordShingles(c, n)

  /** Interpreted HOF rendering of [[shingles]] (spec-only parity pin).
    * The token array is let-bound via a 1-element array wrapper: inlined
    * subexpressions are re-evaluated at EVERY lambda reference under
    * interpreted HOF evaluation, so without the binding the text would be
    * re-split once per element_at (~150 regex splits per doc).
    */
  def shinglesHof(c: Column, n: Int = 3): Column =
    element_at(
      transform(array(TextFunctions.wsTokens(c)), tk =>
        array_distinct(
          when(size(tk) >= n,
            transform(sequence(lit(1), size(tk) - (n - 1)),
              i => concat_ws("_", (0 until n).map(k => element_at(tk, i + k)): _*)))
          .otherwise(typedlit(Seq.empty[String])))),
      1)

  def shinglesSql(e: String, n: Int = 3): String = {
    val toks = TextFunctions.wsTokensSql(e)
    s"list_distinct(list_transform(range(1, greatest(len($toks) - ${n - 1} + 1, 1)), " +
      s"i -> array_to_string(list_slice($toks, i, i + ${n - 1}), '_')))"
  }

  /** Repeated-span audit — the exact-substring dedup signal from the
    * public "deduplicating training data" literature: a K-token span
    * that recurs across documents marks boilerplate / cloned passages
    * that exact whole-doc dedup misses. Per doc: total K-token spans,
    * distinct spans, distinct spans also present in ≥1 OTHER doc, and
    * the ×1e6 contaminated fraction. Span identity is the ×31 mod 1e9+7
    * poly-hash of the '_'-joined token window (the oracle replays the
    * identical fold, so even a collision would gate identically); only
    * 8-byte hashes ever cross a shuffle — corpus text stays in-map. The
    * span→doc-count groupBy and the candidate join are both bounded by
    * corpus token volume, the same budget the n-gram index queries
    * already pay, so the shape holds at 100 TB.
    */
  def spanDups(docs: DataFrame, k: Int = 8): DataFrame = {
    val tk = TextFunctions.rawTokens(col("text"))
    // distinct span hashes per doc (WordShingles dedups per doc) —
    // checkpointed once: consumed by the explode AND the final join
    val spans = graft.Tables.fanOut(docs)
      .select(col("doc_id"), tk.as("tk"))
      .select(col("doc_id"),
        greatest(size(col("tk")).cast("long") - (k - 1), lit(0L)).as("n_spans"),
        transform(
          graft.functions.TextExpressionFunctions
            .wordShingles(array_join(col("tk"), " "), k),
          sh => TextFunctions.fingerprint(sh)).as("hs"))
      .withColumn("n_spans_d", size(col("hs")).cast("long"))
      .localCheckpoint()
    val ex = spans.select(col("doc_id"), explode(col("hs")).as("h"))
    val shared = ex.groupBy(col("h"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
    val dup = ex.join(shared.select(col("h")), "h")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    spans.join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"), col("n_spans_d"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_x1e6",
        expr("(n_dup * 1000000) div greatest(n_spans_d, 1)"))
      .orderBy(col("doc_id"))
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

  /** Exploded distinct shingles (doc_id, s), materialized once via
    * localCheckpoint: every consumer (self-join sides, size counts,
    * verification) reads the checkpointed blocks instead of re-running
    * the interpreted shingle expression per consumer.
    */
  def explodedShingles(docs: DataFrame): DataFrame =
    graft.Tables.fanOut(docs)
      .select(col("doc_id"), explode(shingles(col("text"))).as("s"))
      .localCheckpoint()

  /** Candidate pairs via PREFIX FILTERING (the AllPairs/PPJoin scheme),
    * verified by exact Jaccard ≥ τ — lossless, with a built-in guard
    * against hot boilerplate shingles.
    *
    * Order every doc's shingles by global rarity (df asc, shingle asc)
    * and keep only the first |A| − ⌈τ·|A|⌉ + 1 as its *prefix*; join
    * prefixes, not full postings. Lossless: if J(A,B) ≥ τ and A's prefix
    * held no shared shingle, A would have ≥ |A| − ⌈τ|A|⌉ + 1 unshared
    * shingles, so |A∩B| ≤ ⌈τ|A|⌉ − 1 < τ|A| ≤ τ|A∪B| — contradiction;
    * and since shared shingles sit at the same global positions in both
    * docs, the globally-smallest shared shingle is in BOTH prefixes.
    * (Pinned against brute force on adversarial corpora in PipelineSpec.)
    *
    * Scale: a boilerplate shingle with df in the millions lands at the
    * END of every doc's rarity order, so it never enters a prefix unless
    * a doc consists almost entirely of boilerplate — the d·(d−1)/2 pair
    * blowup of the naive postings self-join cannot happen. The df join
    * and the per-doc ranking are narrow (doc_id, shingle, df) shuffles.
    */
  def ngramJaccardPairs(docs: DataFrame, tauX1e6: Long = 500000L): DataFrame = {
    val ex = explodedShingles(docs)
    val dfs = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
    // sz shares byRarity's sort (full frame) so both window functions run
    // in ONE Window pass over one sort, not two
    val prefix = ex.join(dfs, Seq("s"))
      .withColumn("rn", row_number().over(byRarity))
      .withColumn("sz", count(lit(1)).over(
        byRarity.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      // ⌈τ·sz⌉ with τ = tauX1e6/1e6 in pure BIGINT arithmetic
      .filter(col("rn") <= col("sz") - expr(s"($tauX1e6 * sz + 999999) div 1000000") + 1)
      .select(col("doc_id"), col("s"), col("rn"), col("sz"))
      // both self-join sides consume the prefix — materialize it once or
      // the df-join + rarity sort run twice (no exchange reuse under AQE)
      .localCheckpoint()
    // positional filter (PPJoin): with w* = the canonically-largest shared
    // prefix hit at positions (pa, pb), every shared shingle < w* is in
    // both prefixes (positions are consistent with the global order), so
    // |A∩B| ≤ hits + min(sz_a − pa, sz_b − pb); prune pairs whose bound
    // can't reach the required overlap ⌈τ/(1+τ)·(sz_a+sz_b)⌉
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id") &&
          // AllPairs length filter AT GENERATION: J ≥ τ forces
          // τ·max(|A|,|B|) ≤ min(|A|,|B|), so size-incompatible pairs are
          // dropped inside the join probe before they ever reach the
          // (a,b) aggregation — on a dense shingle space this is the only
          // filter whose selectivity survives (rarity prefixes saturate
          // when every posting list is long)
          col("x.sz") * lit(1000000L) >= col("y.sz") * lit(tauX1e6) &&
          col("y.sz") * lit(1000000L) >= col("x.sz") * lit(tauX1e6))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("hits"),
        max(col("x.rn")).as("pa"), max(col("y.rn")).as("pb"),
        max(col("x.sz")).as("sz_a"), max(col("y.sz")).as("sz_b"))
      .filter(col("hits") + least(col("sz_a") - col("pa"), col("sz_b") - col("pb")) >=
        expr(s"($tauX1e6 * (sz_a + sz_b) + ${1000000L + tauX1e6} - 1) div ${1000000L + tauX1e6}"))
      .select(col("a"), col("b"))
    verifyJaccard(cand, docs, tauX1e6)
  }

  /** Exact-Jaccard verification of an (a, b) candidate set, computed
    * pair-at-a-time: the corpus is semi-join-restricted to candidate
    * docs, each candidate doc's distinct shingle ARRAY is computed in one
    * native pass ([[shingles]]), and |A∩B| is a per-pair codegen'd
    * `array_intersect` — no blow-up proportional to Σ|A| over pairs (the
    * previous exploded-postings join shape), and docs that are in no
    * candidate pair are never shuffled. A τ-length filter
    * (J ≥ τ ⟹ τ·|larger| ≤ |smaller|) prunes pairs before any array
    * work. Join strategies are AQE's (candidate volume is data-dependent).
    */
  private def verifyJaccardUnordered(candIn: DataFrame, docs: DataFrame,
      tauX1e6: Long): DataFrame = {
    // candidates feed three consumers (two doc-id projections + the pair
    // join); materialize once — AQE gives no exchange reuse across them.
    // Lazy: the first consumer is the eager `sets` checkpoint job below,
    // which fully computes candDocs and thereby persists cand before the
    // final job re-reads it — same reuse, one fewer job
    val cand = candIn.localCheckpoint(eager = false)
    val candDocs = cand.select(col("a").as("doc_id"))
      .union(cand.select(col("b").as("doc_id"))).distinct()
    // sets is read by BOTH pair-join sides → materialize once (it is
    // candidate-doc-scale, not corpus-scale)
    val sets = docs.join(candDocs, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), sort_array(shingles(col("text"))).as("sh"))
      .select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("sz"))
      .localCheckpoint()
    val scored = cand
      .join(sets.select(col("doc_id").as("a"), col("sh").as("sh_a"), col("sz").as("sz_a")), Seq("a"))
      .join(sets.select(col("doc_id").as("b"), col("sh").as("sh_b"), col("sz").as("sz_b")), Seq("b"))
      .filter(col("sz_a") * 1000000L >= col("sz_b") * tauX1e6 &&
              col("sz_b") * 1000000L >= col("sz_a") * tauX1e6)
      .select(col("a"), col("b"), col("sz_a"), col("sz_b"),
        graft.functions.TextExpressionFunctions.sortedIntersectCount(col("sh_a"), col("sh_b"))
          .as("jac_inter"))
      // LogicalRDD barrier on (a, b, sizes, |A∩B|) — narrow, candidate-
      // scale — BEFORE the Jaccard filter: otherwise Catalyst pushes the
      // threshold into the join condition and re-evaluates the intersect
      // 2-3× per row (SURVEY §4.5 re-evaluation pitfall). Lazy: single
      // downstream consumer, the barrier is the point, not the reuse
      .localCheckpoint(eager = false)
    scored
      .withColumn("j_x1e6",
        expr("(1000000 * jac_inter) div (sz_a + sz_b - jac_inter)"))
      .filter(col("j_x1e6") >= tauX1e6)
      .select(col("a"), col("b"), col("j_x1e6"))
  }

  /** [[verifyJaccardUnordered]] plus the (a, b) output sort — the shape
    * gated pair queries emit. CC-bound callers (clusterMerge's delta,
    * existingClusters) use the unordered core: their next step is a
    * shuffle anyway, so the sort exchange + its AQE stage wave is pure
    * waste there (r11 job-count pass).
    */
  private def verifyJaccard(candIn: DataFrame, docs: DataFrame, tauX1e6: Long): DataFrame =
    verifyJaccardUnordered(candIn, docs, tauX1e6).orderBy(col("a"), col("b"))

  /** Containment threshold τ ×10⁶ — the SINGLE source of truth for both
    * the Spark plan ([[containmentPairs]]' default) and the DuckDB brute
    * oracle (Pipeline.bruteContainment interpolates this constant), so
    * the two sides cannot silently diverge (r12 ADVICE).
    */
  val ContainmentTauX1e6 = 800000L

  /** Doc-inside-doc near-dup via the OVERLAP COEFFICIENT
    * C(A,B) = |A∩B| / min(|A|,|B|) ≥ τ — the asymmetric containment
    * signal Jaccard structurally misses: a passage wholly quoted inside
    * a 10× larger document has J ≈ |A|/|B| → 0 but C = 1 (the
    * quotation/boilerplate-inclusion case a training-data dedup pass
    * must catch). Lossless candidate generation is necessarily
    * ONE-SIDED here: classic prefix×prefix filtering degenerates for C
    * because a tiny partner B forces the required overlap down to
    * ⌈τ|B|⌉ regardless of |A| — no short prefix of the larger side is
    * safe. But every qualifying pair must share ⌈τ·min⌉ shingles OF THE
    * SMALLER SET, so if the smaller set's (|B| − ⌈τ|B|⌉ + 1)
    * globally-rarest shingles all miss A, then |A∩B| ≤ ⌈τ|B|⌉ − 1 < τ|B|
    * — contradiction. Hence: join SMALLER-SIDE PREFIXES against the
    * full inverted index (size asymmetry enforced in the join, equal
    * sizes probed from both sides and deduped). Work bound:
    * Σ_docs Σ_{s ∈ prefix} df(s) — the rarity ordering puts the
    * lowest-df shingles in the prefix, so a million-df boilerplate
    * shingle never drives the probe unless a doc consists of nothing
    * else; the full-postings side is only ever the INDEXED side of the
    * equi-join (it is never self-joined). Verification is the same
    * per-pair in-map sorted-intersect the Jaccard verifier uses, with
    * min(|A|,|B|) as the denominator.
    */
  def containmentPairs(docs: DataFrame, tauX1e6: Long = ContainmentTauX1e6): DataFrame = {
    val ex = explodedShingles(docs)
    val dfs = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
    // posted = full inverted index with per-doc rarity rank + size;
    // BOTH join sides (prefix slice + full postings) read it
    val posted = ex.join(dfs, Seq("s"))
      .withColumn("rn", row_number().over(byRarity))
      .withColumn("sz", count(lit(1)).over(
        byRarity.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("doc_id"), col("s"), col("rn"), col("sz"))
      .localCheckpoint()
    // ⌈τ·sz⌉ in pure BIGINT arithmetic — the smaller side's prefix
    val prefix = posted.filter(
      col("rn") <= col("sz") - expr(s"($tauX1e6 * sz + 999999) div 1000000") + 1)
    // SALTED shingle join (the LSH band-join discipline): a boilerplate
    // shingle stays out of prefixes on a normal corpus, but a corpus of
    // near-identical docs makes every doc's single rarest shingle the
    // SAME key — the full-postings side of that one key must not land
    // on one reducer. Salt the big (postings) side by its own doc id,
    // replicate the prefix side; the size-asymmetry predicate moves to
    // a post-join filter (it was conjoined with the equi key).
    val x = prefix.select(col("doc_id").as("x_id"), col("s"),
      col("sz").as("x_sz"))
    val y = posted.select(col("doc_id").as("y_id"), col("s"),
      col("sz").as("y_sz"))
    val cand = graft.operators.Skew
      .saltedJoin(y, x, Seq("s"), LshSalts, col("y_id"))
      // strict size asymmetry probes small→large once; equal sizes
      // probe both directions and collapse under the canonical pair
      .filter(col("x_sz") < col("y_sz") ||
        (col("x_sz") === col("y_sz") && col("x_id") =!= col("y_id")))
      .select(least(col("x_id"), col("y_id")).as("a"),
        greatest(col("x_id"), col("y_id")).as("b"))
      .distinct()
    verifyContainment(cand, docs, tauX1e6)
  }

  /** Exact overlap-coefficient verification of an (a, b) candidate set —
    * the [[verifyJaccardUnordered]] shape with min-size denominator:
    * corpus semi-join-restricted to candidate docs, one native shingle
    * pass per doc, per-pair codegen'd sorted-intersect; the LogicalRDD
    * barrier before the threshold filter keeps Catalyst from pushing
    * the predicate into the join and re-evaluating the intersect.
    */
  private def verifyContainment(candIn: DataFrame, docs: DataFrame,
      tauX1e6: Long): DataFrame = {
    val cand = candIn.localCheckpoint(eager = false)
    val candDocs = cand.select(col("a").as("doc_id"))
      .union(cand.select(col("b").as("doc_id"))).distinct()
    val sets = docs.join(candDocs, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), sort_array(shingles(col("text"))).as("sh"))
      .select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("sz"))
      .localCheckpoint()
    val scored = cand
      .join(sets.select(col("doc_id").as("a"), col("sh").as("sh_a"), col("sz").as("sz_a")), Seq("a"))
      .join(sets.select(col("doc_id").as("b"), col("sh").as("sh_b"), col("sz").as("sz_b")), Seq("b"))
      .select(col("a"), col("b"), col("sz_a"), col("sz_b"),
        graft.functions.TextExpressionFunctions.sortedIntersectCount(col("sh_a"), col("sh_b"))
          .as("inter"))
      .localCheckpoint(eager = false)
    scored
      .withColumn("c_x1e6", expr("(1000000 * inter) div least(sz_a, sz_b)"))
      .filter(col("c_x1e6") >= tauX1e6)
      .select(col("a"), col("b"), col("c_x1e6"))
      .orderBy(col("a"), col("b"))
  }

  // --- MinHash LSH --------------------------------------------------------

  val MinHashPerms = 64
  val MinHashBands = 16 // 4 rows per band
  val MinHashP = 1000000007L

  /** (doc_id, band, key) LSH bucket rows: one codegen'd char-fold per
    * (doc, shingle), then the native [[graft.functions.MinHashAgg]]
    * aggregate folds all 64 permutation minima in a SINGLE pass — one
    * narrow shuffle of 64 BIGINTs per doc with map-side combine (the
    * previous shape exploded 64 rows per shingle through two shuffle
    * stages). Band key = ×31 fold of each 4-run of the signature.
    */
  def lshBandRows(exSh: DataFrame): DataFrame =
    bandsFromSig(sigFromShingles(exSh))

  /** 64-permutation MinHash signature table (doc_id, mh ARRAY<BIGINT>)
    * from exploded (doc_id, s) shingles: one codegen'd char-fold per
    * (doc, shingle), all 64 permutation minima folded in a SINGLE
    * [[graft.functions.MinHashAgg]] pass with map-side combine.
    */
  def sigFromShingles(exSh: DataFrame): DataFrame =
    exSh
      .select(col("doc_id"),
        graft.functions.TextExpressionFunctions.polyHash(col("s"), 31L, MinHashP).as("h"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.MinHashAgg.minhashSig(col("h")).as("mh"))

  /** (doc_id, band, key) band rows from a signature table: band key =
    * ×31 fold of each `rows`-run of the 64-slot signature.
    */
  def bandsFromSig(sig: DataFrame): DataFrame = {
    val rows = MinHashPerms / MinHashBands
    sig.select(col("doc_id"),
      posexplode(expr(
        s"""transform(sequence(0, ${MinHashBands - 1}), b ->
           |  aggregate(sequence(0, ${rows - 1}), 0L,
           |    (acc, r) -> (acc * 31 + element_at(mh, b * $rows + r + 1)) % $MinHashP))"""
          .stripMargin)).as(Seq("band", "key")))
  }

  // --- shared memoized builds (once per (session, corpus)) ----------------

  /** Memoized, PINNED shared dedup tables — the §2.3 analog of the §2.1
    * `tokCorpus` discipline (VERDICT r8 #2): the MinHash signature table,
    * the band rows derived from it, the verified LSH pair set, and the
    * near-dup cluster assignment are each built ONCE per (session,
    * corpus) and shared by every consumer (dedup_minhash_lsh,
    * dedup_cluster, pipe_dup_cluster_stats, pipe_dedup_corpus,
    * pipe_dedup_eval, pipe_dedup_incremental, dedup_lsh_sweep …). At
    * 100 TB these ARE the maintained index-side tables a curation loop
    * reads — signatures and cluster assignments are persisted at ingest
    * and refreshed incrementally, not recomputed per query; the pinned
    * lazy localCheckpoint is the single-JVM stand-in. Pinned via
    * [[graft.GraftSession.pin]] so the between-queries dead-block sweep
    * spares them.
    */
  private val memoCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]
  private def memo(s: SparkSession, d: String, key: String)(build: => DataFrame): DataFrame =
    memoCache.getOrElseUpdate((s, d, key),
      // consult the persisted index store first (the ingest→serve
      // path, [[graft.sources.IndexStore]]): a session pointed at a
      // saved store serves the signature/band tables from parquet
      // instead of re-tokenizing the corpus; a hit replaces only the
      // BUILD — pinning and checkpoint semantics stay identical
      graft.GraftSession.pin(
        graft.sources.IndexStore.lookup(s, d, "dedup_" + key)
          .getOrElse(build).localCheckpoint(eager = false)))

  /** Shared signature table over the full `documents` corpus. */
  def memoSig(s: SparkSession, d: String): DataFrame =
    memo(s, d, "minhash_sig")(sigFromShingles(
      graft.Tables.fanOut(graft.Tables.documents(s, d))
        .select(col("doc_id"), explode(shingles(col("text"))).as("s"))))

  /** Shared (16-band, 4-row) band rows derived from [[memoSig]]. */
  def memoBands(s: SparkSession, d: String): DataFrame =
    memo(s, d, "lsh_bands")(bandsFromSig(memoSig(s, d)))

  /** Shared exact-Jaccard-verified LSH pair set over [[memoBands]]. */
  def memoLshPairs(s: SparkSession, d: String): DataFrame =
    memo(s, d, "lsh_pairs")(
      minhashLshPairsFromBands(memoBands(s, d), graft.Tables.documents(s, d)))

  /** Shared near-dup cluster assignment built on [[memoLshPairs]]. */
  def memoClusters(s: SparkSession, d: String): DataFrame =
    memo(s, d, "clusters")(clustersFrom(
      graft.Tables.documents(s, d), memoLshPairs(s, d).select(col("a"), col("b"))))

  /** Shared exact n-gram-Jaccard pair set (the dedup_eval ground truth). */
  def memoNgramPairs(s: SparkSession, d: String): DataFrame =
    memo(s, d, "ngram_pairs")(ngramJaccardPairs(graft.Tables.documents(s, d)))

  /** Shared SimHash hamming≤K pair set. */
  def memoSimhashPairs(s: SparkSession, d: String): DataFrame =
    memo(s, d, "simhash_pairs")(simhashPairs(graft.Tables.documents(s, d)))

  /** Shared overlap-coefficient containment pair set — the same
    * maintained-table treatment as [[memoNgramPairs]]: at 100 TB the
    * containment audit is a persisted ingest artifact, not a per-query
    * rebuild of the full inverted index.
    */
  def memoContainmentPairs(s: SparkSession, d: String): DataFrame =
    memo(s, d, "containment_pairs")(containmentPairs(graft.Tables.documents(s, d)))

  /** Containment threshold for the MinHash ESTIMATOR face (τ = 0.5 —
    * the estimator exists to cast a wider, cheaper net than the exact
    * τ = 0.8 face, which verifies what this one surfaces).
    */
  val ContainmentEstTauX1e6 = 500000L

  /** MinHash ESTIMATOR for the overlap coefficient — the asymmetric
    * twin of [[minhashLshPairsFromBands]], riding the SAME shared
    * signature/band tables (zero extra ingest state): candidates from
    * (16, 4)-band cohabitation (salted, as ever), Ĵ = matching
    * signature slots m / 64, and C through the inclusion identity
    * I = J·(|A|+|B|)/(1+J) with the EXACT distinct-shingle sizes
    * carried per doc:
    *   ĉ×1e6 = (m·(szA+szB)·10⁶) div ((64+m)·min(szA, szB)).
    * At 100 TB this is the cheap containment sweep — signatures and
    * sizes are 8-byte-per-slot ingest artifacts, no inverted index
    * probe — and every emitted pair carries its exact C as the
    * estimator-QA column (the ann_rq_error discipline: an estimator
    * ships WITH its measured error, exact-verified on the emitted set
    * only, never corpus²). Deterministic integer arithmetic end to end
    * (m·(szA+szB)·10⁶ ≤ 64·~10⁴·10⁶ ≪ 2⁶³) ⇒ hash-exact oracle.
    */
  def containmentMinhash(s: SparkSession, d: String,
      tauX1e6: Long = ContainmentEstTauX1e6): DataFrame =
    containmentMinhashFrom(graft.Tables.documents(s, d),
      memoSig(s, d), memoBands(s, d), tauX1e6)

  /** [[containmentMinhash]] over prebuilt (possibly shared) signature
    * and band tables — the testable core.
    */
  def containmentMinhashFrom(docs: DataFrame, sig: DataFrame, bands: DataFrame,
      tauX1e6: Long = ContainmentEstTauX1e6): DataFrame = {
    val left = bands.select(col("doc_id").as("a"), col("band"), col("key"))
    val right = bands.select(col("doc_id").as("b"), col("band"), col("key"))
    val cand = graft.operators.Skew
      .saltedJoin(left, right, Seq("band", "key"), LshSalts, col("a"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
      .localCheckpoint(eager = false)
    val candDocs = cand.select(col("a").as("doc_id"))
      .union(cand.select(col("b").as("doc_id"))).distinct()
    val sets = docs.join(candDocs, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), sort_array(shingles(col("text"))).as("sh"))
      .select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("sz"))
      .localCheckpoint()
    cand
      .join(sig.select(col("doc_id").as("a"), col("mh").as("mh_a")), Seq("a"))
      .join(sig.select(col("doc_id").as("b"), col("mh").as("mh_b")), Seq("b"))
      .withColumn("m_sig", expr(
        "aggregate(zip_with(mh_a, mh_b, (x, y) -> IF(x = y, 1L, 0L)), 0L, (acc, v) -> acc + v)"))
      .join(sets.select(col("doc_id").as("a"), col("sh").as("sh_a"), col("sz").as("sz_a")), Seq("a"))
      .join(sets.select(col("doc_id").as("b"), col("sh").as("sh_b"), col("sz").as("sz_b")), Seq("b"))
      .withColumn("c_est_x1e6", expr(
        s"(m_sig * (sz_a + sz_b) * 1000000) div (($MinHashPerms + m_sig) * least(sz_a, sz_b))"))
      .filter(col("c_est_x1e6") >= tauX1e6)
      .withColumn("inter",
        graft.functions.TextExpressionFunctions.sortedIntersectCount(col("sh_a"), col("sh_b")))
      .select(col("a"), col("b"), col("sz_a"), col("sz_b"), col("m_sig"),
        col("c_est_x1e6"),
        expr("(1000000 * inter) div least(sz_a, sz_b)").as("c_exact_x1e6"))
      .orderBy(col("a"), col("b"))
  }

  /** DuckDB rendering of [[containmentMinhash]]: the 64-permutation
    * signature replay (the [[lshSweepOracleSql]] constants table), the
    * (16, 4) band fold, bucket-cohabitation candidates, the slot-match
    * estimator, and the exact-intersect QA column.
    */
  def containmentMinhashOracleSql(tauX1e6: Long = ContainmentEstTauX1e6): String = {
    val permRows = (0 until graft.functions.MinHashAgg.Perms).map { i =>
      s"($i, ${graft.functions.MinHashAgg.permA(i)}, ${graft.functions.MinHashAgg.permB(i)})"
    }.mkString(", ")
    val hashS = graft.text.TextFunctions.fingerprintSql("s")
    val rows = MinHashPerms / MinHashBands
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(${shinglesSql("text")}) AS s FROM documents),
       |hh AS (SELECT doc_id, $hashS AS h FROM sh),
       |perm AS (SELECT * FROM (VALUES $permRows) p(k, a, b)),
       |sig AS MATERIALIZED (
       |  SELECT doc_id, k, min((a * h + b) % $MinHashP) AS mh
       |  FROM hh CROSS JOIN perm GROUP BY doc_id, k),
       |band AS MATERIALIZED (
       |  SELECT doc_id, k // $rows AS band,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list(mh ORDER BY k)),
       |      (acc, x) -> (acc * 31 + x) % $MinHashP) AS key
       |  FROM sig GROUP BY doc_id, k // $rows),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM band x JOIN band y
       |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |m AS (
       |  SELECT c.a, c.b, CAST(count(*) FILTER (sa.mh = sb.mh) AS BIGINT) AS m_sig
       |  FROM cand c
       |  JOIN sig sa ON sa.doc_id = c.a
       |  JOIN sig sb ON sb.doc_id = c.b AND sb.k = sa.k
       |  GROUP BY c.a, c.b),
       |sz AS MATERIALIZED (
       |  SELECT doc_id, ${shinglesSql("text")} AS sh FROM documents),
       |j AS (
       |  SELECT m.a, m.b,
       |    CAST(len(za.sh) AS BIGINT) AS sz_a, CAST(len(zb.sh) AS BIGINT) AS sz_b,
       |    m.m_sig,
       |    CAST(len(list_intersect(za.sh, zb.sh)) AS BIGINT) AS inter
       |  FROM m JOIN sz za ON za.doc_id = m.a JOIN sz zb ON zb.doc_id = m.b),
       |e AS (
       |  SELECT a, b, sz_a, sz_b, m_sig,
       |    (m_sig * (sz_a + sz_b) * 1000000)
       |      // (($MinHashPerms + m_sig) * least(sz_a, sz_b)) AS c_est_x1e6,
       |    (1000000 * inter) // least(sz_a, sz_b) AS c_exact_x1e6
       |  FROM j)
       |SELECT a, b, sz_a, sz_b, m_sig, c_est_x1e6, c_exact_x1e6
       |FROM e WHERE c_est_x1e6 >= $tauX1e6
       |ORDER BY a, b""".stripMargin
  }

  /** LSH banding-parameter sweep — the tuning readout that decides the
    * (bands, rows) operating point BEFORE a 100 TB dedup run: the SAME
    * 64-permutation signature table re-banded at (32,2)/(16,4)/(8,8)
    * (S-curve thresholds ≈ 0.18/0.50/0.77), per config the hot-bucket
    * count, the multiplicity pair mass Σ n·(n−1)/2 (the shuffle cost a
    * config implies), and the distinct candidate-pair count (the
    * verify cost). One signature build (checkpointed), three
    * band-domain passes — the sweep never re-reads the corpus text.
    */
  def lshSweep(docs: DataFrame): DataFrame =
    lshSweepFromSig(
      sigFromShingles(graft.Tables.fanOut(docs)
        .select(col("doc_id"), explode(shingles(col("text"))).as("s")))
        .localCheckpoint())

  /** [[lshSweep]] over a prebuilt (possibly shared) signature table. */
  def lshSweepFromSig(sig: DataFrame): DataFrame = {
    val configs = Seq((32, 2), (16, 4), (8, 8))
    configs.map { case (b, r) =>
      val bands = sig.select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, ${b - 1}), bb ->
             |  aggregate(sequence(0, ${r - 1}), 0L,
             |    (acc, rr) -> (acc * 31 + element_at(mh, bb * $r + rr + 1)) % $MinHashP))"""
            .stripMargin)).as(Seq("band", "key")))
        .localCheckpoint()
      val stats = bands.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) div 2")).cast("long").as("mult_pairs"),
          sum(when(col("n") >= 2, 1L).otherwise(0L)).cast("long").as("hot_buckets"))
      val left = bands.select(col("doc_id").as("a"), col("band"), col("key"))
      val right = bands.select(col("doc_id").as("b2"), col("band"), col("key"))
      val nCand = graft.operators.Skew
        .saltedJoin(left, right, Seq("band", "key"), LshSalts, col("a"))
        .filter(col("a") < col("b2")).select(col("a"), col("b2")).distinct()
        .agg(count(lit(1)).cast("long").as("n_candidate_pairs"))
      stats.crossJoin(broadcast(nCand))
        .select(lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
          col("hot_buckets"), col("mult_pairs"), col("n_candidate_pairs"))
    }.reduce(_ unionByName _).orderBy(col("bands"))
  }

  /** DuckDB oracle for [[lshSweep]]: the signature recomputed from the
    * [[graft.functions.MinHashAgg]] permutation spec as a 64-row
    * constants table, then each config's band fold + bucket math.
    */
  def lshSweepOracleSql: String = {
    val permRows = (0 until graft.functions.MinHashAgg.Perms).map { i =>
      s"($i, ${graft.functions.MinHashAgg.permA(i)}, ${graft.functions.MinHashAgg.permB(i)})"
    }.mkString(", ")
    val hashS = graft.text.TextFunctions.fingerprintSql("s")
    def cfg(b: Int, r: Int): String =
      s"""SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band,
         |  (SELECT CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) FROM (
         |     SELECT band, key, count(*) AS n FROM band_$b GROUP BY 1, 2)) AS hot_buckets,
         |  (SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) FROM (
         |     SELECT band, key, count(*) AS n FROM band_$b GROUP BY 1, 2)) AS mult_pairs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM (
         |     SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |     FROM band_$b x JOIN band_$b y
         |       ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id))
         |    AS n_candidate_pairs""".stripMargin
    def bandCte(b: Int, r: Int): String =
      s"""band_$b AS (
         |  SELECT doc_id, k // $r AS band,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), list(mh ORDER BY k)),
         |      (acc, x) -> (acc * 31 + x) % $MinHashP) AS key
         |  FROM sig GROUP BY doc_id, k // $r)""".stripMargin
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(${shinglesSql("text")}) AS s FROM documents),
       |hh AS (SELECT doc_id, $hashS AS h FROM sh),
       |perm AS (SELECT * FROM (VALUES $permRows) p(k, a, b)),
       |sig AS (
       |  SELECT doc_id, k, min((a * h + b) % $MinHashP) AS mh
       |  FROM hh CROSS JOIN perm GROUP BY doc_id, k),
       |${bandCte(32, 2)},
       |${bandCte(16, 4)},
       |${bandCte(8, 8)}
       |${cfg(32, 2)}
       |UNION ALL
       |${cfg(16, 4)}
       |UNION ALL
       |${cfg(8, 8)}
       |ORDER BY bands""".stripMargin
  }

  /** MinHash-LSH near-dup pairs, verified by exact Jaccard ≥ τ.
    * With J ≥ 0.9 dups, P[miss] = (1-0.9^4)^16 ≈ 3e-8 ⇒ output equals the
    * brute-force oracle; the LSH layer is the 100 TB path (signatures are
    * 64×8 B per doc; candidates only where a band bucket collides).
    */
  /** Salt count for the band-bucket self-join: a degenerate bucket (all
    * docs sharing boilerplate) spreads over this many reducers.
    */
  val LshSalts = 4

  /** Max batch-side band rows [[clusterMergeFrom]] will force-broadcast
    * (~tens of MB serialized at (long, int, long) width). Above it the
    * merge falls back to the salted shuffle join — slower, never an OOM.
    */
  val ClusterMergeBroadcastRows = 2000000L

  def minhashLshPairs(docs: DataFrame, tauX1e6: Long = 500000L): DataFrame = {
    // no shingle checkpoint: band rows are the only consumer of the
    // exploded shingles now (verification re-derives candidate docs'
    // shingle arrays natively), so the pipeline has ONE materialization
    // job instead of the round-1 two
    val exSh = graft.Tables.fanOut(docs)
      .select(col("doc_id"), explode(shingles(col("text"))).as("s"))
    minhashLshPairsFromBands(lshBandRows(exSh).localCheckpoint(), docs, tauX1e6)
  }

  /** [[minhashLshPairs]] over a prebuilt (possibly shared or filtered)
    * band-row table — band rows are per-doc, so restricting the corpus
    * is a semi-join on the band table, never a re-shingle.
    */
  def minhashLshPairsFromBands(bands: DataFrame, docs: DataFrame,
                               tauX1e6: Long = 500000L): DataFrame = {
    // salted bucket join (Skew.saltedJoin): web corpora have hot band
    // buckets (near-identical boilerplate docs), which would otherwise
    // funnel one (band, key) onto a single reducer. Salting by the left
    // doc id spreads each bucket over LshSalts reducers; rows are
    // identical to the plain join.
    val left = bands.select(col("doc_id").as("a"), col("band"), col("key"))
    val right = bands.select(col("doc_id").as("b"), col("band"), col("key"))
    val cand = graft.operators.Skew
      .saltedJoin(left, right, Seq("band", "key"), LshSalts, col("a"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    verifyJaccard(cand, docs, tauX1e6)
  }

  /** INCREMENTAL near-dup detection — the daily-ingest shape: find new-
    * batch docs (`newPred`) that are near-dups of the EXISTING corpus,
    * without ever self-joining either side. Same MinHash-LSH machinery
    * as [[minhashLshPairs]], but the band join is one-sided (new bands ⋈
    * corpus bands), so candidate volume scales with the new batch, not
    * the corpus; at 100 TB the corpus band table is the precomputed
    * persisted index a real pipeline maintains between ingests. Output:
    * one row per duplicate-of-corpus new doc with its match count and
    * best Jaccard.
    */
  def incrementalDups(docs: DataFrame, newPred: Column,
                      tauX1e6: Long = 500000L): DataFrame = {
    val exSh = graft.Tables.fanOut(docs)
      .select(col("doc_id"), explode(shingles(col("text"))).as("s"))
    incrementalDupsFromBands(lshBandRows(exSh).localCheckpoint(), docs, newPred, tauX1e6)
  }

  /** [[incrementalDups]] over a prebuilt (possibly shared) band table —
    * at 100 TB the corpus band table is the persisted index a pipeline
    * maintains between ingests, so the daily run builds bands only for
    * the delta.
    */
  def incrementalDupsFromBands(bands: DataFrame, docs: DataFrame, newPred: Column,
                               tauX1e6: Long = 500000L): DataFrame = {
    val left = bands.filter(newPred)
      .select(col("doc_id").as("a"), col("band"), col("key"))
    val right = bands.filter(!newPred)
      .select(col("doc_id").as("b"), col("band"), col("key"))
    val cand = graft.operators.Skew
      .saltedJoin(left, right, Seq("band", "key"), LshSalts, col("a"))
      .select(col("a"), col("b")).distinct()
    verifyJaccard(cand, docs, tauX1e6)
      .groupBy(col("a"))
      .agg(count(lit(1)).as("n_dup_of"), max(col("j_x1e6")).as("max_j_x1e6"))
      .select(col("a").as("doc_id"), col("n_dup_of"), col("max_j_x1e6"))
      .orderBy(col("doc_id"))
  }

  // --- near-dup clustering (connected components) -------------------------

  /** Connected components over an undirected edge list by Pregel-style
    * min-label propagation: every node starts labeled with itself; each
    * round a node takes the minimum label among itself and its
    * neighbors; converged when the global label sum stops decreasing
    * (the sum is strictly monotone while anything changes). Rounds
    * needed = graph diameter — near-dup clusters are shallow, so this
    * is a handful of narrow (id, label) shuffles; `localCheckpoint` per
    * round truncates the growing lineage. The driver-side loop is
    * control flow only (one 1-row aggregate per round) — no data ever
    * collects to the driver.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxRounds: Int = 50): DataFrame = {
    // re-attach the isolated nodes as their own singleton components
    nodes.select(col("id"))
      .join(activeComponents(edges, maxRounds), Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** [[connectedComponents]] restricted to the ACTIVE nodes (edge
    * endpoints) — callers whose node set IS the endpoint set
    * (clusterMergeFrom's contracted merge graph) skip the node-list
    * distinct and the isolated-rejoin entirely (VERDICT r11 #6).
    */
  private[graft] def activeComponents(edges: DataFrame,
                                      maxRounds: Int = 50): DataFrame = {
    // lazy checkpoints throughout the loop: each one is materialized by
    // the SAME action that computes the round's convergence sum, so a
    // round costs one Spark action, not a separate eager-checkpoint job
    // plus a collect (measured ~2x fewer jobs on the bench corpus)
    val sym = edges.select(col("a").as("x"), col("b").as("y"))
      .union(edges.select(col("b").as("x"), col("a").as("y")))
      .localCheckpoint(eager = false)
    // propagate over the ACTIVE set only — nodes incident to an edge.
    // Isolated nodes (the overwhelming majority of a deduped corpus) are
    // their own component by definition and never need a round; keeping
    // them out shrinks every per-round shuffle/checkpoint from |V| to
    // |V_active| ≈ 2|E|. The init IS the first propagation round:
    // label₀ = min(self, neighbors) from one aggregate over the edge
    // list (the active set is exactly sym's x column), so the loop
    // starts one round ahead of an identity-label init for free.
    var labels = sym.groupBy(col("x"))
      .agg(least(col("x"), min(col("y"))).as("label"))
      .localCheckpoint(eager = false)
    // coalesce: sum() is NULL over zero rows — an empty node set (e.g. a
    // quality gate that filtered every document) must yield an empty
    // result, not an NPE out of getLong
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("label")), lit(0L))).collect()(0).getLong(0)
    // one propagation + path-halving round; NO checkpoint of its own —
    // rounds are batched below and only the batch boundary checkpoints
    def round(labels: DataFrame): DataFrame = {
      // min over {own label} ∪ {neighbor labels} as ONE union + partial
      // aggregate — replaces the neighbor-min join + left-outer
      // reconcile join (one shuffle fewer per round)
      val prop = labels.union(
          sym.join(labels.select(col("x").as("y"), col("label")), Seq("y"))
            .select(col("x"), col("label")))
        .groupBy(col("x")).agg(min(col("label")).as("label"))
      // path halving: label ← label[label]. Labels are themselves active
      // node ids, so one extra (tiny) self-join per round doubles how far
      // a minimum travels — convergence in O(log diameter) rounds instead
      // of O(diameter).
      prop.join(
          prop.select(col("x").as("label"), col("label").as("ll")), Seq("label"), "left_outer")
        .select(col("x"),
          least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
    }
    // round-batching was MEASURED AND REVERTED here (r11): two
    // un-checkpointed rounds per action duplicate the prop subplan 4×
    // (exchange reuse does not fire across the aliased copies; 43→62
    // jobs), and a checkpointed 2-round batch forces ≥4 propagation
    // rounds on graphs that converge in 1 — near-dup cluster graphs are
    // shallow, so the init-as-first-round + path-halving loop usually
    // exits at the FIRST convergence check and per-round checking is
    // the job-minimal shape.
    var prevSum = labelSum(labels)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = round(labels).localCheckpoint(eager = false)
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      rounds += 1
    }
    // a silent cutoff would return wrong (unconverged) labels — fail
    // loudly instead; diameter > maxRounds means the caller should raise
    // the bound, not trust the output
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxRounds rounds " +
          "(component diameter exceeds the bound); raise maxRounds")
    labels.select(col("x").as("id"), col("label").as("cluster_id"))
  }

  /** Incremental cluster maintenance (VERDICT r9 #6) — the operation a
    * 100 TB curation loop actually runs between full rebuilds: the
    * persisted cluster assignment covers the EXISTING corpus
    * (doc_id % 10 ≠ 0, the same batch convention as
    * [[incrementalDupsFromBands]]); the new batch's verified pairs —
    * batch-internal plus one-sided batch→corpus bridges, so candidate
    * volume scales with the BATCH, never the corpus — merge into it by
    * connected components over the CONTRACTED merge graph: existing
    * endpoints collapse to their cluster ids before any label-prop
    * round, so the rounds touch only affected components. Contraction
    * preserves both the partition (contracting already-connected sets
    * preserves connectivity) and the id rule (cluster_id = min member
    * doc_id, and min over {touched cluster ids ∪ new doc ids} = min
    * over all member ids because each cluster id IS its members' min;
    * batch ids ≡ 0 (mod 10) and cluster ids ≢ 0 can never collide), so
    * merge ≡ rebuild EXACTLY — the oracle recomputes the clustering
    * from scratch on the union and the driver hash-compares.
    */
  def clusterMerge(s: SparkSession, d: String, tauX1e6: Long = 500000L): DataFrame = {
    val isNew = col("doc_id") % 10 === 0
    val docs = graft.Tables.documents(s, d)
    val bands = memoBands(s, d)
    // the persisted existing-corpus assignment (memoized: at 100 TB this
    // is the on-disk index table a pipeline maintains, not a per-query
    // build — the warm bench rep charges it to ingest like every memo)
    val exClusters = memo(s, d, s"ex_clusters_$tauX1e6")(
      existingClustersFrom(docs, bands, isNew, tauX1e6))
    clusterMergeFrom(docs, bands, exClusters, isNew, tauX1e6)
  }

  /** The existing-corpus-only assignment [[clusterMerge]] maintains —
    * LSH pairs among non-batch docs, clustered (spec entry point).
    */
  private[graft] def existingClustersFrom(docs: DataFrame, bands: DataFrame,
      isNew: Column, tauX1e6: Long): DataFrame = {
    val ex = bands.filter(!isNew)
    val cand = graft.operators.Skew.saltedJoin(
        ex.select(col("doc_id").as("a"), col("band"), col("key")),
        ex.select(col("doc_id").as("b"), col("band"), col("key")),
        Seq("band", "key"), LshSalts, col("a"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    clustersFrom(docs.filter(!isNew),
      verifyJaccardUnordered(cand, docs, tauX1e6).select(col("a"), col("b")))
  }

  /** [[clusterMerge]]'s core over injectable inputs — the spec drives
    * it with a synthetic corpus that FORCES the bridge case (one new
    * doc merging TWO existing clusters), which a real corpus may never
    * exercise at the gated SFs.
    */
  private[graft] def clusterMergeFrom(docs: DataFrame, bands: DataFrame,
      exClusters: DataFrame, isNew: Column, tauX1e6: Long,
      maxBroadcastRows: Long = ClusterMergeBroadcastRows): DataFrame = {
    // delta pairs: the union of (new,new) and one-sided (new,old)
    // candidates is exactly the full LSH candidate set minus the
    // already-indexed (old,old) pairs — nothing is missed, nothing
    // corpus-scale is re-joined. The BATCH side BROADCASTS (r11): a
    // merge batch is bounded (≪ corpus by the incremental contract), so
    // the bridge probe becomes a map-side hash join that streams the
    // corpus-scale band table IN PLACE — the salted shuffle it replaces
    // re-partitioned the whole persisted LSH index per batch, the exact
    // O(corpus)-per-merge cost this operator exists to avoid; skew is
    // moot with no shuffle (hot bands cost hash-probe time, not a hot
    // reducer). The contract is ENFORCED (ADVICE r11 #4), not assumed:
    // batches above maxBroadcastRows take the salted-shuffle fallback.
    // existingClustersFrom keeps its salted join — that one IS
    // corpus × corpus.
    val nb = bands.filter(isNew).localCheckpoint(eager = false)
    val eb = bands.filter(!isNew)
    val nbA = nb.select(col("doc_id").as("a"), col("band"), col("key"))
    val nbB = nb.select(col("doc_id").as("b"), col("band"), col("key"))
    val ebB = eb.select(col("doc_id").as("b"), col("band"), col("key"))
    // ADVICE r11: the broadcast hint bypasses autoBroadcastJoinThreshold,
    // so an oversized "batch" would OOM the driver instead of running a
    // slow join — enforce the bounded-batch contract with one count on
    // the checkpointed batch table (materializing blocks every
    // downstream consumer reuses) and fall back to the salted shuffle
    // join above the bound.
    val batchRows = nb.count()
    val (candInt, candBridge) =
      if (batchRows <= maxBroadcastRows)
        (broadcast(nbA).join(nbB, Seq("band", "key"))
           .filter(col("a") < col("b")).select(col("a"), col("b")),
         broadcast(nbA).join(ebB, Seq("band", "key"))
           .select(col("a"), col("b")))
      else
        (graft.operators.Skew.saltedJoin(nbA, nbB, Seq("band", "key"), LshSalts, col("a"))
           .filter(col("a") < col("b")).select(col("a"), col("b")),
         graft.operators.Skew.saltedJoin(ebB, nbA, Seq("band", "key"), LshSalts, col("b"))
           .select(col("a"), col("b")))
    val delta = verifyJaccardUnordered(candInt.unionByName(candBridge).distinct(), docs, tauX1e6)
      .select(col("a"), col("b"))
    // contract: old endpoints → their cluster ids (batch-internal b's
    // have no assignment row and stay themselves)
    val exAssign = exClusters.select(col("doc_id").as("b"), col("cluster_id").as("cid_b"))
    val cEdges = delta.join(exAssign, Seq("b"), "left")
      .select(col("a"), coalesce(col("cid_b"), col("b")).as("b"))
    // batch-sized merge graph: only affected components run label
    // rounds, and every merge-graph node is an edge endpoint by
    // construction, so the active-only CC face skips the node-list
    // distinct and isolated-rejoin a full corpus would need
    val remap = activeComponents(cEdges)
      .select(col("id"), col("cluster_id").as("new_cid"))
    // collapsed remap+assembly (VERDICT r11 #6): a batch doc's merge-graph
    // node IS its doc_id, so seeding it with provisional cluster_id =
    // doc_id lets ONE left join remap old and new rows together — the
    // r11 shape ran two remap joins and unioned the shuffled branches
    val assigned = exClusters.select(col("doc_id"), col("cluster_id"))
      .unionByName(docs.filter(isNew)
        .select(col("doc_id"), col("doc_id").as("cluster_id")))
    assigned
      .join(remap.withColumnRenamed("id", "cluster_id"), Seq("cluster_id"), "left")
      .select(col("doc_id"), coalesce(col("new_cid"), col("cluster_id")).as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .orderBy(col("doc_id"))
  }

  /** Near-dup clusters: MinHash-LSH pairs (exact-Jaccard verified)
    * → connected components → (doc_id, cluster_id, cluster_size).
    */
  def nearDupClusters(docs: DataFrame, tauX1e6: Long = 500000L): DataFrame =
    clustersFrom(docs, minhashLshPairs(docs, tauX1e6).select(col("a"), col("b")))

  /** [[nearDupClusters]] over a prebuilt (possibly shared) edge list. */
  def clustersFrom(docs: DataFrame, edges: DataFrame): DataFrame = {
    val cc = connectedComponents(docs.select(col("doc_id").as("id")), edges)
    cc.select(col("id").as("doc_id"), col("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .orderBy(col("doc_id"))
  }

  // --- SimHash ------------------------------------------------------------

  val SimBits = 60
  val SimHamK = 3 // pairs with hamming ≤ 3; 4 bands × 15 bits ⇒ exact recall

  /** Blocked edit-distance near-dup pairs: documents are blocked on
    * (first normalized token, 16-char length bucket), and within a block
    * every id-ordered pair whose lengths differ by ≤ maxLev (a pure
    * pushdown — levenshtein ≥ |len difference|, so the filter is exact)
    * is scored with the THRESHOLDED `levenshtein(a, b, maxLev)`, which
    * abandons the DP once the banded diagonal exceeds maxLev (O(len·k)
    * not O(len²)). A pair survives at ≤ maxLev edits AND ≤ tauX100 % of
    * the longer length. Like every blocked near-dup method here (simhash
    * bands, LSH), recall is bounded by the blocking: boundary-straddling
    * length buckets or differing lead tokens are not compared — the
    * documented trade-off that makes the candidate set block-bounded
    * instead of corpus-quadratic at 100 TB.
    */
  def levenshteinPairs(docs: DataFrame, maxLev: Int = 20, tauX100: Long = 20L): DataFrame = {
    // materialize the normalized projection: the blocking keys derive
    // from nt, and without a barrier Catalyst inlines the whole
    // tokenize+join pipeline into the join-side null filters — the
    // regex tokenization ran ~5× per row per side (measured 6.2 s →
    // 1.2 s at sf0.1 from this checkpoint alone)
    val base = graft.Tables.fanOut(docs
      .select(col("doc_id"), TextFunctions.normalized(col("text")).as("nt"))
      .filter(length(col("nt")) > 0)
      .withColumn("len", length(col("nt")).cast("long"))
      .withColumn("tok0", expr("split_part(nt, ' ', 1)"))
      .withColumn("lb", expr("length(nt) div 16")))
      .localCheckpoint()
    base.as("a").join(base.as("b"),
        col("a.tok0") === col("b.tok0") && col("a.lb") === col("b.lb") &&
          col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.len") - col("b.len")) <= maxLev)
      .select(col("a.doc_id").as("doc_id_a"), col("b.doc_id").as("doc_id_b"),
        levenshtein(col("a.nt"), col("b.nt"), maxLev).cast("long").as("lev"),
        greatest(col("a.len"), col("b.len")).as("max_len"))
      .filter(col("lev") >= 0 && col("lev") * 100 <= lit(tauX100) * col("max_len"))
      .withColumn("lev_ratio_x100", expr("(lev * 100) div max_len"))
      .orderBy(col("doc_id_a"), col("doc_id_b"))
  }

  /** 60-bit SimHash over analyzed tokens: two 30-bit char-fold hashes per
    * token (multipliers 31 / 37, moduli 1e9+7 / 998244353); bit j of the
    * signature = sign of Σ_tokens (2·bit_j(h) − 1). Computed by the
    * codegen'd native [[graft.functions.SimHash]] expression; bit-exact
    * DuckDB rendering in [[simhashSignatureSql]], and the interpreted
    * SQL-expr rendering is kept as [[simhashSignatureInterpreted]] for
    * the three-way parity spec.
    */
  def simhashSignature(toksCol: String): Column =
    graft.functions.TextExpressionFunctions.simHash(col(toksCol))

  /** Interpreted HOF rendering of the same signature (spec-only: the
    * codegen'd expression must match it bit for bit).
    */
  def simhashSignatureInterpreted(toksCol: String): Column = expr(
    // let-bind the two token-hash lists via a 1-element array wrapper so
    // each token is hashed ONCE, not once per bit position (30x saving in
    // interpreted HOF evaluation)
    s"""element_at(transform(array(named_struct(
       |    'h1', transform($toksCol, t -> aggregate(split(t, ''), 0L,
       |      (a, c) -> (a * 31 + ascii(c)) % 1000000007)),
       |    'h2', transform($toksCol, t -> aggregate(split(t, ''), 0L,
       |      (a, c) -> (a * 37 + ascii(c)) % 998244353)))),
       |  p -> aggregate(sequence(0, 29), 0L, (acc, j) -> acc
       |    + IF(aggregate(p.h1, 0L,
       |        (a, h) -> a + (CAST(shiftright(h, j) % 2 AS BIGINT) * 2 - 1)) > 0,
       |        shiftleft(1L, j), 0L)
       |    + IF(aggregate(p.h2, 0L,
       |        (a, h) -> a + (CAST(shiftright(h, j) % 2 AS BIGINT) * 2 - 1)) > 0,
       |        shiftleft(1L, CAST(j + 30 AS INT)), 0L))), 1)""".stripMargin)

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
    // compute sigs once, materialize them so both self-join sides read
    // the checkpoint instead of recomputing (fanOut = identity at scale)
    val sigs = graft.Tables.fanOut(docs)
      .select(col("doc_id"), Analyzer.tokens(col("text")).as("toks"))
      .select(col("doc_id"), simhashSignature("toks").as("sig"))
      .localCheckpoint()
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> shiftright(sig, CAST(b * 15 AS INT)) % 32768)"))
        .as(Seq("band", "key")))
    // filter on hamming BEFORE deduplicating pairs: the band join emits
    // millions of (mostly far) pairs; bit_count is codegen-cheap, so the
    // distinct only ever sees true near-dups
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).cast("long").as("hamming"))
      .filter(col("hamming") <= SimHamK)
      .distinct()
      .orderBy(col("a"), col("b"))
  }
}
