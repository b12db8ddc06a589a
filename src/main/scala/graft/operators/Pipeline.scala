package graft.operators

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.similarity.Similarity
import graft.streaming.EventStreams
import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.3/§2.4/§2.6/§2.7 — training-data pipeline operators. */
object Pipeline {

  /** (doc_id, fp_norm, n_tok, n_stop, n_uniq): the per-document
    * quality/fingerprint metadata table (r16) — a curation pipeline
    * computes these at INGEST and persists them; cleanCorpus and
    * dedupCorpus each re-ran the corpus tokenize+fingerprint pass per
    * invocation to derive the same five columns. Memoized+pinned like
    * the dedup signature tables; metadata-narrow at any scale.
    */
  private val docStatsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private[graft] def memoDocStats(s: SparkSession, d: String): DataFrame =
    docStatsCache.getOrElseUpdate((s, d), graft.GraftSession.pin {
      val toks = TextFunctions.rawTokens(col("text"))
      Tables.fanOut(Tables.documents(s, d))
        .select(col("doc_id"),
          TextFunctions.fingerprint(TextFunctions.normalized(col("text"))).as("fp_norm"),
          size(toks).cast("long").as("n_tok"),
          size(filter(toks, t =>
            array_contains(typedlit(graft.search.Analyzer.stopwords), t)))
            .cast("long").as("n_stop"),
          size(array_distinct(toks)).cast("long").as("n_uniq"))
        .localCheckpoint(eager = false)
    })

  // --- §2.3 dedup --------------------------------------------------------

  def dedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exactClusters(Tables.documents(s, d))

  def dedupExactKeep(s: SparkSession, d: String): DataFrame =
    Dedup.exactKeep(Tables.documents(s, d))

  def dedupNgramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.memoNgramPairs(s, d)

  def dedupMinhashLsh(s: SparkSession, d: String): DataFrame =
    Dedup.memoLshPairs(s, d)

  def dedupLshSweep(s: SparkSession, d: String): DataFrame =
    Dedup.lshSweepFromSig(Dedup.memoSig(s, d))

  def dedupSimhash(s: SparkSession, d: String): DataFrame =
    Dedup.memoSimhashPairs(s, d)

  def dedupSpan(s: SparkSession, d: String): DataFrame =
    Dedup.spanDups(Tables.documents(s, d))

  def dedupLevenshtein(s: SparkSession, d: String): DataFrame =
    Dedup.levenshteinPairs(Tables.documents(s, d))

  /** Asymmetric doc-inside-doc containment (overlap coefficient ≥ 0.8). */
  def dedupContainment(s: SparkSession, d: String): DataFrame =
    Dedup.memoContainmentPairs(s, d)

  /** MinHash containment ESTIMATOR off the shared signature/band
    * tables, with the exact C of every emitted pair as the QA column.
    */
  def dedupContainmentMinhash(s: SparkSession, d: String): DataFrame =
    Dedup.containmentMinhash(s, d)

  def dedupEmbedding(s: SparkSession, d: String): DataFrame =
    Similarity.pairSim(Tables.embeddings(s, d), 400000L)

  def dedupCluster(s: SparkSession, d: String): DataFrame =
    Dedup.memoClusters(s, d)

  /** SemDeDup-style near-dup: IVF-cell blocking with the pinned codebook. */
  def dedupEmbeddingIvf(s: SparkSession, d: String): DataFrame =
    Similarity.embeddingDedupIvf(Tables.embeddings(s, d), 400000L,
      graft.similarity.IvfModel.cells)

  /** Incremental ingest dedup: doc_id % 10 = 0 plays the new batch. */
  def dedupIncremental(s: SparkSession, d: String): DataFrame =
    Dedup.incrementalDupsFromBands(Dedup.memoBands(s, d), Tables.documents(s, d),
      col("doc_id") % 10 === 0)

  /** Incremental cluster maintenance: merge the new batch's verified
    * pairs into the persisted existing-corpus assignment — label rounds
    * touch only affected components; the oracle rebuilds from scratch
    * (merge ≡ rebuild, see [[graft.dedup.Dedup.clusterMerge]]).
    */
  def clusterMerge(s: SparkSession, d: String): DataFrame =
    Dedup.clusterMerge(s, d)

  def annCentroid(s: SparkSession, d: String): DataFrame =
    Similarity.centroids(Tables.embeddings(s, d))

  /** One exact Lloyd iteration (see [[Similarity.kmeansStep]]). */
  def annKmeansStep(s: SparkSession, d: String): DataFrame =
    Similarity.kmeansStep(Tables.embeddings(s, d))

  /** Per-dimension embedding moments (see [[Similarity.dimStats]]). */
  def annDimStats(s: SparkSession, d: String): DataFrame =
    Similarity.dimStats(Tables.embeddings(s, d))

  /** Within-cluster outliers (see [[Similarity.outlierDist]]). */
  def annOutlierDist(s: SparkSession, d: String): DataFrame =
    Similarity.outlierDist(Tables.embeddings(s, d))

  /** ANN-method QA — recall@10 of every approximate index against the
    * brute-force ground truth (the similarity-search twin of
    * [[dedupEval]]): one row per method with exact hit counts and the
    * ×10⁶ recall. The truth pair set is checkpointed once (k·|Q| rows);
    * each method side is the SAME plan its gated query ships, joined
    * pair-on-pair — so the audit measures the production indexes, not
    * re-implementations.
    */
  def annRecallEval(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    def pairs(df: DataFrame) = df.select(col("q_id"), col("vec_id"))
    val truth = Similarity.memoBruteTruth(s, d)
    val stats = truth.agg(count(lit(1)).cast("long").as("n_truth"),
      countDistinct(col("q_id")).cast("long").as("n_queries"))
    val methods = Seq(
      // hnsw rides the memoized shared walk ann_hnsw_topk ships — the
      // audit row costs one (queries × k)-scale join (VERDICT r11 #2)
      "hnsw" -> pairs(Similarity.hnswTopK(s, d, queryPred)),
      "ivf" -> pairs(Similarity.ivfTopK(emb, queryPred,
        model = Some(graft.similarity.IvfModel.cells),
        assignIn = Some(Similarity.memoIvfAssign(s, d)))),
      "lsh" -> pairs(Similarity.lshTopK(emb, queryPred)),
      // nnd: the SAME beam walk as hnsw over the NN-descent-BUILT
      // graph — the production build path audited as a serving
      // structure (VERDICT r12 #3); rides the memoized shared walk
      // ann_descent_topk ships
      "nnd" -> pairs(Similarity.descentTopK(s, d, queryPred)),
      "pq"  -> pairs(Similarity.pqTopK(emb, queryPred,
        codesIn = Some(Similarity.memoPqCodes(s, d)))),
      "rq"  -> pairs(Similarity.rqTopK(emb, queryPred,
        codesIn = Some(Similarity.memoRqCodes(s, d)))),
      "sq"  -> pairs(Similarity.sqTopK(emb, queryPred)))
    methods.map { case (nm, p) =>
      val hits = truth.join(p, Seq("q_id", "vec_id"))
        .agg(count(lit(1)).cast("long").as("hits"))
      stats.crossJoin(hits)
        .select(lit(nm).as("method"), col("n_queries"), col("n_truth"), col("hits"),
          expr("(hits * 1000000) div n_truth").as("recall_x1e6"))
    }.reduce(_ union _).orderBy(col("method"))
  }

  // --- §2.4 similarity ---------------------------------------------------

  // ONE definition with memoBruteTruth (ADVICE r15) — see
  // Similarity.auditQueryPred
  private val queryPred = Similarity.auditQueryPred

  /** IVF nprobe tuning curve — the recall-vs-cost sweep an ANN
    * deployment runs before picking its operating point: recall@10
    * against brute-force truth at nprobe ∈ {1, 2, 4} over the SAME
    * pinned codebook the shipped ann_ivf_topk uses. Recall must be
    * non-decreasing in nprobe by construction (more probed cells ⊇
    * fewer) — pinned in spec; the gate pins the exact numbers. Truth
    * is computed once (checkpoint) and each sweep point is a top-k
    * join against it — the whole sweep is (queries × k)-scale after
    * the per-point ANN plans.
    */
  def annPqError(s: SparkSession, d: String): DataFrame =
    Similarity.pqQuantError(Tables.embeddings(s, d))

  def annSqError(s: SparkSession, d: String): DataFrame =
    Similarity.sqQuantError(Tables.embeddings(s, d))

  def annProbeSweep(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val truth = Similarity.memoBruteTruth(s, d)
    val stats = truth.agg(count(lit(1)).cast("long").as("n_truth"))
    Seq(1, 2, 4).map { np =>
      val p = Similarity.ivfTopK(emb, queryPred, nProbe = np,
          model = Some(graft.similarity.IvfModel.cells),
          assignIn = Some(Similarity.memoIvfAssign(s, d)))
        .select(col("q_id"), col("vec_id"))
      val hits = truth.join(p, Seq("q_id", "vec_id"))
        .agg(count(lit(1)).cast("long").as("hits"))
      stats.crossJoin(hits)
        .select(lit(np.toLong).as("nprobe"), col("n_truth"), col("hits"),
          expr("(hits * 1000000) div n_truth").as("recall_x1e6"))
    }.reduce(_ union _).orderBy(col("nprobe"))
  }

  def annBruteTopk(s: SparkSession, d: String): DataFrame =
    Similarity.bruteTopK(Tables.embeddings(s, d), queryPred)

  def annLshTopk(s: SparkSession, d: String): DataFrame =
    Similarity.lshTopK(Tables.embeddings(s, d), queryPred)

  def annMmr(s: SparkSession, d: String): DataFrame =
    Similarity.mmrTopK(Tables.embeddings(s, d), col("vec_id") === 0)

  def annKnnClassify(s: SparkSession, d: String): DataFrame =
    Similarity.knnClassify(Tables.embeddings(s, d), queryPred)

  def annIvfTopk(s: SparkSession, d: String): DataFrame =
    Similarity.ivfTopK(Tables.embeddings(s, d), queryPred,
      model = Some(graft.similarity.IvfModel.cells),
      assignIn = Some(Similarity.memoIvfAssign(s, d)))

  def annPairSim(s: SparkSession, d: String): DataFrame =
    Similarity.pairSim(Tables.embeddings(s, d), 300000L)

  def annRangeSearch(s: SparkSession, d: String): DataFrame =
    Similarity.rangeSearch(Tables.embeddings(s, d), queryPred, 250000L)

  def annSqTopk(s: SparkSession, d: String): DataFrame =
    Similarity.sqTopK(Tables.embeddings(s, d), queryPred)

  def annPqTopk(s: SparkSession, d: String): DataFrame =
    Similarity.pqTopK(Tables.embeddings(s, d), queryPred,
      codesIn = Some(Similarity.memoPqCodes(s, d)))

  def annIvfPqTopk(s: SparkSession, d: String): DataFrame =
    Similarity.ivfPqTopK(Tables.embeddings(s, d), queryPred,
      codesIn = Some(Similarity.memoIvfPqCodes(s, d)))

  def annHnswTopk(s: SparkSession, d: String): DataFrame =
    Similarity.hnswTopK(s, d, queryPred)

  def annHnswVisited(s: SparkSession, d: String): DataFrame =
    Similarity.hnswVisitedStats(s, d, queryPred)

  def annRqTopk(s: SparkSession, d: String): DataFrame =
    Similarity.rqTopK(Tables.embeddings(s, d), queryPred,
      codesIn = Some(Similarity.memoRqCodes(s, d)))

  def annRqError(s: SparkSession, d: String): DataFrame =
    Similarity.rqQuantError(Tables.embeddings(s, d))

  def annNnDescent(s: SparkSession, d: String): DataFrame =
    Similarity.nnDescentTopM(s, d)

  /** Top-k SERVED from the NN-descent-built graph — the end-to-end
    * face of the production build path (same beam walk as
    * ann_hnsw_topk; only the graph under it differs).
    */
  def annDescentTopk(s: SparkSession, d: String): DataFrame =
    Similarity.descentTopK(s, d, queryPred)

  def annDescentVisited(s: SparkSession, d: String): DataFrame =
    Similarity.descentVisitedStats(s, d, queryPred)

  def annNnDescentRecall(s: SparkSession, d: String): DataFrame =
    Similarity.nnDescentRecall(s, d)

  /** Search-then-link insert of the ~1% held-out vectors into the base
    * descent graph (VERDICT r13 #5) — the production ingest path.
    */
  def annDescentInsert(s: SparkSession, d: String): DataFrame =
    Similarity.descentInsert(s, d)

  def annCellPurity(s: SparkSession, d: String): DataFrame =
    Similarity.cellPurity(Tables.embeddings(s, d))

  def annSimHist(s: SparkSession, d: String): DataFrame =
    Similarity.simHist(Tables.embeddings(s, d))

  // --- §2.6 multimodal ---------------------------------------------------

  def mmDecodeMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeMeta(Tables.documents(s, d)).orderBy(col("doc_id"))

  def mmResize(s: SparkSession, d: String): DataFrame =
    Multimodal.resizePlan(Multimodal.decodeMeta(Tables.documents(s, d)))

  def mmFrameSample(s: SparkSession, d: String): DataFrame =
    Multimodal.frameSamplePlan(Multimodal.decodeMeta(Tables.documents(s, d)))

  def mmFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.featuresPlan(Tables.documents(s, d))

  def mmFeatTopk(s: SparkSession, d: String): DataFrame =
    Multimodal.featTopkPlan(Tables.documents(s, d))

  def mmAudioWindow(s: SparkSession, d: String): DataFrame =
    Multimodal.audioWindowPlan(Multimodal.decodeMeta(Tables.documents(s, d)))

  def mmSceneDetect(s: SparkSession, d: String): DataFrame =
    Multimodal.sceneDetectPlan(Tables.documents(s, d))

  def mmDecodeBmp(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeBmpPlan(Tables.documents(s, d))

  def mmPhash(s: SparkSession, d: String): DataFrame =
    Multimodal.phashPlan(Tables.documents(s, d))

  def mmSobel(s: SparkSession, d: String): DataFrame =
    Multimodal.sobelPlan(Tables.documents(s, d))

  def mmIntegral(s: SparkSession, d: String): DataFrame =
    Multimodal.integralPlan(Tables.documents(s, d))

  def mmBoxBlur(s: SparkSession, d: String): DataFrame =
    Multimodal.boxBlurPlan(Tables.documents(s, d))

  def mmHistEq(s: SparkSession, d: String): DataFrame =
    Multimodal.histEqPlan(Tables.documents(s, d))

  def mmDecodeWav(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeWavPlan(Tables.documents(s, d))

  def mmAudioStats(s: SparkSession, d: String): DataFrame =
    Multimodal.audioStatsPlan(Tables.documents(s, d))

  def mmDecodePng(s: SparkSession, d: String): DataFrame =
    Multimodal.decodePngPlan(Tables.documents(s, d))

  def mmDecodeGif(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeGifPlan(Tables.documents(s, d))

  def mmDecodePngIdx(s: SparkSession, d: String): DataFrame =
    Multimodal.decodePngIndexedPlan(Tables.documents(s, d))

  def mmDecodeQoi(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeQoiPlan(Tables.documents(s, d))

  def mmThumbnail(s: SparkSession, d: String): DataFrame =
    Multimodal.thumbnailPlan(Tables.documents(s, d))

  def mmDecodeTga(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeTgaPlan(Tables.documents(s, d))

  def mmDecodeMulaw(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeMulawPlan(Tables.documents(s, d))

  def mmDecodePpm(s: SparkSession, d: String): DataFrame =
    Multimodal.decodePpmPlan(Tables.documents(s, d))

  def mmDecodeAdpcm(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeAdpcmPlan(Tables.documents(s, d))

  /** The [[mmDecodeAdpcm]] oracle: the IMA encode state machine (whose
    * running predictor IS the decoder's reconstruction) unrolled as 31
    * SQL steps, each a small expression pyramid joined against the
    * 89-row step table and 8-row index table — the same
    * unrolled-recurrence discipline as the graph oracles, applied to a
    * codec.
    */
  private def adpcmOracleSql: String = {
    val stepRows = graft.multimodal.MediaCodec.adpcmStepTable.zipWithIndex
      .map { case (v, i) => s"($i, $v)" }.mkString(", ")
    val idxRows = graft.multimodal.MediaCodec.adpcmIndexTable.zipWithIndex
      .map { case (dv, d) => s"($d, $dv)" }.mkString(", ")
    def stepCte(k: Int): String =
      s"""s$k AS (
         |  SELECT doc_id,
         |    greatest(-32768, least(32767,
         |      pred + CASE WHEN sgn THEN -dq ELSE dq END)) AS pred,
         |    greatest(0, least(88, idx + dv)) AS idx,
         |    sum_abs + abs(greatest(-32768, least(32767,
         |      pred + CASE WHEN sgn THEN -dq ELSE dq END))) AS sum_abs,
         |    greatest(max_abs, abs(greatest(-32768, least(32767,
         |      pred + CASE WHEN sgn THEN -dq ELSE dq END)))) AS max_abs
         |  FROM (
         |    SELECT q.*, ix.dv FROM (
         |      SELECT y.*,
         |        (v // 8 + CASE WHEN b0 THEN v // 4 ELSE 0 END
         |          + CASE WHEN b1 THEN v // 2 ELSE 0 END
         |          + CASE WHEN b2 THEN v ELSE 0 END) AS dq,
         |        (CASE WHEN b2 THEN 4 ELSE 0 END + CASE WHEN b1 THEN 2 ELSE 0 END
         |          + CASE WHEN b0 THEN 1 ELSE 0 END) AS delta
         |      FROM (
         |        SELECT x.*, (r1 >= v // 4) AS b0 FROM (
         |          SELECT w.*, (r2 >= v // 2) AS b1,
         |            r2 - CASE WHEN r2 >= v // 2 THEN v // 2 ELSE 0 END AS r1
         |          FROM (
         |            SELECT z0.*, (ad0 >= v) AS b2,
         |              ad0 - CASE WHEN ad0 >= v THEN v ELSE 0 END AS r2
         |            FROM (
         |              SELECT z.*, st.v, (sk < z.pred) AS sgn,
         |                abs(sk - z.pred) AS ad0
         |              FROM (
         |                SELECT *,
         |                  ((doc_id * 37 + ${3L * k * k}) % 8000) - 4000 AS sk
         |                FROM s${k - 1}) z
         |              JOIN stept st ON st.i = z.idx) z0) w) x) y) q
         |    JOIN idxt ix ON ix.d = q.delta) f)""".stripMargin
    val steps = (1 to 31).map(stepCte).mkString(",\n")
    s"""WITH stept AS (SELECT * FROM (VALUES $stepRows) t(i, v)),
       |idxt AS (SELECT * FROM (VALUES $idxRows) t(d, dv)),
       |s0 AS (
       |  SELECT doc_id,
       |    ((doc_id * 37) % 8000) - 4000 AS pred, 0 AS idx,
       |    abs(((doc_id * 37) % 8000) - 4000) AS sum_abs,
       |    abs(((doc_id * 37) % 8000) - 4000) AS max_abs
       |  FROM documents),
       |$steps
       |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
       |  CAST(32 AS BIGINT) AS n_samples,
       |  CAST(sum_abs AS BIGINT) AS sum_abs, CAST(max_abs AS BIGINT) AS max_abs,
       |  CAST(idx AS BIGINT) AS final_index
       |FROM s31 ORDER BY doc_id""".stripMargin
  }

  /** k-anonymity audit — the privacy-engineering check before a corpus
    * release: group documents by their quasi-identifier tuple
    * (lang, source, size bucket), measure each equivalence class's
    * size k, and report the re-identification risk profile — classes
    * and docs at k = 1 (unique ⇒ re-identifiable), 2–4, 5–9, ≥10,
    * with ppm shares. The k < 5 rows are what a release gate blocks
    * on. One partial-agg pass to the QI grid (bounded by the QI
    * domain, not the corpus), then a 4-row bucket rollup.
    */
  def qKAnonymity(s: SparkSession, d: String): DataFrame = {
    val classes = Tables.documents(s, d)
      .groupBy(col("lang"), col("source"),
        expr("n_chars div 100").as("size_bucket"))
      .agg(count(lit(1)).as("k"))
    val tot = classes.agg(sum(col("k")).cast("long").as("n_docs_total"))
    classes
      .withColumn("k_bucket",
        when(col("k") === 1, "1_unique")
          .when(col("k") <= 4, "2_to_4")
          .when(col("k") <= 9, "5_to_9")
          .otherwise(lit("10_plus")))
      .groupBy(col("k_bucket"))
      .agg(count(lit(1)).cast("long").as("n_classes"),
        sum(col("k")).cast("long").as("n_docs"),
        min(col("k")).cast("long").as("min_k"),
        max(col("k")).cast("long").as("max_k"))
      .crossJoin(broadcast(tot))
      .select(col("k_bucket"), col("n_classes"), col("n_docs"),
        col("min_k"), col("max_k"),
        expr("(n_docs * 1000000) div n_docs_total").as("docs_ppm"))
      .orderBy(col("k_bucket"))
  }

  /** l-diversity audit — [[qKAnonymity]]'s attribute-disclosure
    * companion (public l-diversity literature): within each
    * quasi-identifier class (source, size bucket), how many DISTINCT
    * values of the sensitive attribute (lang) appear. A class with
    * l = 1 leaks the sensitive value of every member even when k is
    * large — the case k-anonymity alone cannot catch. Profile rows by
    * l bucket with class/doc counts and ppm shares. Same scale shape
    * as the k audit: one partial-agg pass to the QI grid.
    */
  def qLDiversity(s: SparkSession, d: String): DataFrame = {
    val classes = Tables.documents(s, d)
      .groupBy(col("source"), expr("n_chars div 100").as("size_bucket"))
      .agg(count(lit(1)).as("k"),
        countDistinct(col("lang")).as("l"))
    val tot = classes.agg(sum(col("k")).cast("long").as("n_docs_total"))
    classes
      .withColumn("l_bucket",
        when(col("l") === 1, "1_homogeneous")
          .when(col("l") === 2, "2_binary")
          .otherwise(lit("3_plus")))
      .groupBy(col("l_bucket"))
      .agg(count(lit(1)).cast("long").as("n_classes"),
        sum(col("k")).cast("long").as("n_docs"),
        min(col("l")).cast("long").as("min_l"),
        max(col("l")).cast("long").as("max_l"))
      .crossJoin(broadcast(tot))
      .select(col("l_bucket"), col("n_classes"), col("n_docs"),
        col("min_l"), col("max_l"),
        expr("(n_docs * 1000000) div n_docs_total").as("docs_ppm"))
      .orderBy(col("l_bucket"))
  }

  /** t-closeness audit — the third leg of the release-privacy triad
    * ([[qKAnonymity]] membership, [[qLDiversity]] distinctness, this:
    * DISTRIBUTION skew): a class can have many distinct sensitive
    * values and still leak if its distribution diverges from the
    * global one. Distance = total variation (the categorical EMD),
    * computed exactly: Σ|c_i·N − n_i·C| over ALL langs collapses to
    * N·C + Σ_present(|c_i·N − n_i·C| − n_i·C) — absent langs
    * contribute n_i·C without ever being materialized — then
    * tvd ×10⁶ = num·10⁶ div (2·C·N), staged DECIMAL(38,0) (c·N ~
    * 10²⁴ at corpus scale). Emits the worst-5 classes with the
    * t > 0.2 breach flag. Same QI grid and scale shape as the k/l
    * audits: one partial-agg pass, then class-domain arithmetic.
    */
  def qTCloseness(s: SparkSession, d: String): DataFrame = {
    val cell = Tables.documents(s, d)
      .groupBy(col("source"), expr("n_chars div 100").as("size_bucket"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val cls = cell.groupBy(col("source"), col("size_bucket"))
      .agg(sum(col("c")).cast("long").as("k"), count(lit(1)).as("n_langs"))
    val global = cell.groupBy(col("lang")).agg(sum(col("c")).cast("long").as("n_g"))
    val tot = global.agg(sum(col("n_g")).cast("long").as("n_total"))
    val num = cell
      .join(broadcast(global), Seq("lang"))
      .join(cls.select(col("source"), col("size_bucket"), col("k")),
        Seq("source", "size_bucket"))
      .crossJoin(broadcast(tot))
      .groupBy(col("source"), col("size_bucket"))
      .agg(sum(expr(
        """abs(CAST(c AS DECIMAL(38,0)) * n_total - CAST(n_g AS DECIMAL(38,0)) * k)
          |  - CAST(n_g AS DECIMAL(38,0)) * k""".stripMargin)).as("part_num"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("tvd_x1e6").desc, col("source"), col("size_bucket"))
    cls.join(num, Seq("source", "size_bucket"))
      .crossJoin(broadcast(tot))
      .withColumn("tvd_x1e6", expr(
        // overflow-bound: part_num <= 2*n_total*k (TVD numerator is a sum of |c*N - n*k| <= 2*N*k), so the numerator <= 3*n_total*k*1e6 — inside DECIMAL(38) for n_total*k < 3*10^31.
        """CAST(((CAST(n_total AS DECIMAL(38,0)) * k + part_num) * 1000000)
          |  div (2 * CAST(n_total AS DECIMAL(38,0)) * k) AS BIGINT)""".stripMargin))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("rk").cast("int").as("rank"), col("source"), col("size_bucket"),
        col("k"), col("n_langs"), col("tvd_x1e6"),
        (col("tvd_x1e6") > 200000L).cast("int").as("breach"))
      .orderBy(col("rank"))
  }

  /** Class-balance report + uniform-rebalance weights per language —
    * the mixture bookkeeping before an oversampling/temperature pass
    * ([[pipeMixWeights]]' descriptive sibling): per class, doc and
    * token counts, corpus shares in ppm, and the exact integer weight
    * ×10⁶ that would rebalance doc counts to uniform
    * (n_total·10⁶ div (n_classes·n_class) — >10⁶ means upsample).
    * One corpus pass with map-side token counting; everything after
    * runs on the |langs|-row grid.
    */
  def pipeClassBalance(s: SparkSession, d: String): DataFrame = {
    val cls = Tables.documents(s, d)
      .select(col("lang"),
        size(graft.text.TextFunctions.rawTokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("long").as("n_tokens"))
    val tot = cls.agg(count(lit(1)).as("n_classes"),
      sum(col("n_docs")).cast("long").as("n_docs_total"),
      sum(col("n_tokens")).cast("long").as("n_tokens_total"))
    cls.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        expr("(n_docs * 1000000) div n_docs_total").as("docs_ppm"),
        expr("(n_tokens * 1000000) div n_tokens_total").as("tokens_ppm"),
        // overflow-bound: single data factor — n_docs_total * 1e6 inside DECIMAL(38) for any corpus under 10^32 docs.
        expr("CAST(CAST(n_docs_total AS DECIMAL(38,0)) * 1000000 div (n_classes * n_docs) AS BIGINT)")
          .as("uniform_weight_x1e6"))
      .orderBy(col("lang"))
  }

  /** Duplicate-cluster size histogram — the "how duplicated is my
    * corpus" readout over [[dedupCluster]]'s near-dup components:
    * per cluster size k, the number of clusters, the doc mass, and
    * its ppm share. k = 1 is the unique mass; the tail tells you what
    * a keep-one-per-cluster pass would delete. Runs on the cluster
    * table (≤ |docs| rows), two cheap rollups after the LSH+CC work.
    */
  def pipeDupClusterStats(s: SparkSession, d: String): DataFrame = {
    val cl = Dedup.memoClusters(s, d)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("k"))
    val tot = cl.agg(sum(col("k")).cast("long").as("n_docs_total"))
    cl.groupBy(col("k").as("cluster_size"))
      .agg(count(lit(1)).cast("long").as("n_clusters"),
        sum(col("k")).cast("long").as("n_docs"))
      .crossJoin(broadcast(tot))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        expr("(n_docs * 1000000) div n_docs_total").as("docs_ppm"))
      .orderBy(col("cluster_size"))
  }

  /** Quality-threshold sweep — the curation-tuning curve: for 5 pinned
    * uniqueness thresholds (the repetition-filter knob), how many docs
    * and tokens survive, as counts + ppm shares. ONE corpus pass:
    * per-doc (uniq_bp, n_tok) computed map-side, all thresholds as
    * conditional aggregates, stack() unpivots the 5-row scorecard.
    * The curve is what you consult BEFORE committing a filter setting
    * to a 100 TB run.
    */
  def pipeQualityCurve(s: SparkSession, d: String): DataFrame = {
    val taus = Seq(0L, 2000L, 4000L, 6000L, 8000L)
    val toks = graft.text.TextFunctions.rawTokens(col("text"))
    val perDoc = Tables.documents(s, d).select(
        size(toks).cast("long").as("n_tok"),
        size(array_distinct(toks)).cast("long").as("n_uniq"))
      .select(col("n_tok"), expr("(10000 * n_uniq) div n_tok").as("uniq_bp"))
    val aggCols = Seq(
      count(lit(1)).cast("long").as("n_docs"),
      sum(col("n_tok")).cast("long").as("n_tokens")) ++
      taus.flatMap { t =>
        Seq(sum(when(col("uniq_bp") >= t, 1L).otherwise(0L)).cast("long").as(s"d$t"),
          sum(when(col("uniq_bp") >= t, col("n_tok")).otherwise(0L))
            .cast("long").as(s"t$t"))
      }
    val aggs = perDoc.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = taus.map(t => s"${t}L, d$t, t$t").mkString(", ")
    aggs
      .select(col("n_docs"), col("n_tokens"),
        expr(s"stack(${taus.length}, $stackArgs) AS (tau_bp, docs_kept, tokens_kept)"))
      .select(col("tau_bp"), col("docs_kept"), col("tokens_kept"),
        expr("(docs_kept * 1000000) div n_docs").as("docs_ppm"),
        expr("(tokens_kept * 1000000) div n_tokens").as("tokens_ppm"))
      .orderBy(col("tau_bp"))
  }

  /** Min-length threshold curve — [[pipeQualityCurve]]'s companion for
    * the other universal curation knob: for 5 pinned minimum token
    * lengths, how many docs and tokens survive (counts + ppm). ONE
    * corpus pass, all thresholds as conditional aggregates — the
    * survival curve consulted before committing a length filter to a
    * 100 TB run.
    */
  def pipeLengthCurve(s: SparkSession, d: String): DataFrame = {
    val taus = Seq(0L, 20L, 40L, 60L, 80L)
    val toks = graft.text.TextFunctions.rawTokens(col("text"))
    val perDoc = Tables.documents(s, d).select(size(toks).cast("long").as("n_tok"))
    val aggCols = Seq(
      count(lit(1)).cast("long").as("n_docs"),
      sum(col("n_tok")).cast("long").as("n_tokens")) ++
      taus.flatMap { t =>
        Seq(sum(when(col("n_tok") >= t, 1L).otherwise(0L)).cast("long").as(s"d$t"),
          sum(when(col("n_tok") >= t, col("n_tok")).otherwise(0L))
            .cast("long").as(s"t$t"))
      }
    val aggs = perDoc.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = taus.map(t => s"${t}L, d$t, t$t").mkString(", ")
    aggs
      .select(col("n_docs"), col("n_tokens"),
        expr(s"stack(${taus.length}, $stackArgs) AS (min_tok, docs_kept, tokens_kept)"))
      .select(col("min_tok"), col("docs_kept"), col("tokens_kept"),
        expr("(docs_kept * 1000000) div n_docs").as("docs_ppm"),
        expr("(tokens_kept * 1000000) div n_tokens").as("tokens_ppm"))
      .orderBy(col("min_tok"))
  }

  def mmDecodeJpeg(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeJpegPlan(Tables.documents(s, d))

  /** Modality-coverage report — which documents have which modalities
    * attached (text ⋈ embedding here; image/audio in a real corpus):
    * one co-partitioned FULL OUTER join on the id, classified and
    * aggregated per source to the audit grid a multimodal ingest
    * pipeline alerts on. The missing-modality id ranges (min/max) come
    * free from the same partial agg.
    */
  def mmModality(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val vecs = Tables.embeddings(s, d).select(col("vec_id"))
    docs.join(vecs, col("doc_id") === col("vec_id"), "full_outer")
      .select(coalesce(col("doc_id"), col("vec_id")).as("id"),
        coalesce(col("source"), lit("<none>")).as("source"),
        when(col("doc_id").isNotNull && col("vec_id").isNotNull, lit("both"))
          .when(col("doc_id").isNotNull, lit("text_only"))
          .otherwise(lit("vector_only")).as("modality"))
      .groupBy(col("source"), col("modality"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"), max(col("id")).as("max_id"))
      .orderBy(col("source"), col("modality"))
  }

  // --- §2.7 streaming (batch-equivalent oracle path) ---------------------

  def streamWindowAgg(s: SparkSession, d: String): DataFrame =
    EventStreams.windowAgg(EventStreams.normalize(Tables.events(s, d)))
      .orderBy(col("window_start_us"), col("event_type"))

  def streamQuantile(s: SparkSession, d: String): DataFrame =
    EventStreams.streamQuantile(EventStreams.normalize(Tables.events(s, d)))

  def streamSlidingAgg(s: SparkSession, d: String): DataFrame =
    EventStreams.slidingAgg(EventStreams.normalize(Tables.events(s, d)))
      .orderBy(col("window_start_us"), col("event_type"))

  def streamSessionize(s: SparkSession, d: String): DataFrame =
    EventStreams.sessionize(EventStreams.normalize(Tables.events(s, d)))

  def streamDedup(s: SparkSession, d: String): DataFrame =
    EventStreams.dedupBatch(EventStreams.normalize(Tables.events(s, d)))

  def streamDedupWithin(s: SparkSession, d: String): DataFrame =
    EventStreams.dedupWithinBatch(EventStreams.normalize(Tables.events(s, d)))

  def streamAttrLeft(s: SparkSession, d: String): DataFrame =
    EventStreams.attributionPairsBatch(EventStreams.normalize(Tables.events(s, d)))

  def streamUniques(s: SparkSession, d: String): DataFrame =
    EventStreams.uniquesBatch(EventStreams.normalize(Tables.events(s, d)))

  /** Top-3 event types per hourly window by count — the "trending now"
    * query, composed as windowed aggregation → the NATIVE TopKPerKey
    * operator (bounded heap per window key before the exchange, so the
    * shuffle after the window agg carries ≤ k rows per partition-window
    * instead of the full per-window type distribution).
    */
  def streamTopk(s: SparkSession, d: String): DataFrame =
    graft.plans.TopK.perKey(
        EventStreams.windowAgg(EventStreams.normalize(Tables.events(s, d))),
        Seq("window_start_us"), Seq(("n", true), ("event_type", false)), 3)
      .orderBy(col("window_start_us"), col("n").desc, col("event_type"))

  /** Overlapping token-window chunking — the RAG/pretraining step that
    * slices each document into fixed windows with stride overlap
    * (window 8, stride 6 at the test corpus' ~16-token docs): a pure
    * map-side explode of ⌈max(n−window, 0)/stride⌉+1 rows per doc, no
    * shuffle, boundaries in exact token indices. A doc shorter than one
    * window yields exactly its single truncated chunk.
    */
  def chunk(s: SparkSession, d: String, window: Int = 8, stride: Int = 6): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(TextFunctions.rawTokens(col("text"))).as("n_tok"))
      .select(col("doc_id"), col("n_tok"),
        posexplode(expr(
          s"transform(sequence(0, greatest((n_tok - $window + ${stride - 1}) div $stride, 0)), " +
            s"i -> i * $stride)")).as(Seq("chunk_idx", "tok_start")))
      .select(col("doc_id"), col("chunk_idx"),
        col("tok_start").cast("int").as("tok_start"),
        least(lit(window), col("n_tok") - col("tok_start")).cast("long").as("tok_len"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Windowed spike detection — per event type, flag any hourly window
    * whose count reaches 2× the max of the previous six OBSERVED
    * windows (trailing ROWS frame; exact BIGINT comparison, no floats).
    * Composes the streaming window aggregate with one per-type ordered
    * window — the alerting query a monitoring pipeline runs on the agg
    * the stream job maintains.
    */
  def streamSpike(s: SparkSession, d: String): DataFrame = {
    val wa = EventStreams.windowAgg(EventStreams.normalize(Tables.events(s, d)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("window_start_us"))
      .rowsBetween(-6, -1)
    wa.withColumn("prev_max", max(col("n")).over(w))
      .select(col("window_start_us"), col("event_type"), col("n"), col("prev_max"),
        (col("prev_max").isNotNull && col("n") >= col("prev_max") * 2).as("spike"))
      .orderBy(col("window_start_us"), col("event_type"))
  }

  /** Deterministic train/val/test split — the reproducible 80/10/10
    * partition every training pipeline needs: a Knuth multiplicative
    * hash of doc_id against fixed 2³²-scaled thresholds, so membership
    * is a pure stateless map (any worker can re-derive any doc's split;
    * re-runs and late-arriving shards agree for free). Emitted as the
    * per-source × split audit table with exact ×10⁶ shares — the skew
    * report that catches a source whose ids correlate with the hash.
    */
  def splitAssign(s: SparkSession, d: String): DataFrame = {
    val train = 3435973836L // floor(0.8 * 2^32)
    val valCap = 3865470566L // floor(0.9 * 2^32)
    val tagged = Tables.documents(s, d).select(col("source"),
      expr("(doc_id * 2654435761) % 4294967296").as("h"))
      .withColumn("split",
        when(col("h") < train, lit("train"))
          .when(col("h") < valCap, lit("val"))
          .otherwise(lit("test")))
    tagged.groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share_x1e6",
        expr("n_docs * 1000000 div sum(n_docs) OVER (PARTITION BY source)"))
      .orderBy(col("source"), col("split"))
  }

  /** Reproducible per-epoch shuffle order — training loaders need a
    * DIFFERENT but DETERMINISTIC permutation per epoch: order key =
    * hash(doc_id, epoch), so any worker can re-derive any epoch's
    * order with no stored state. Emitted as the first k positions of
    * each epoch (the order-audit a resumable trainer checks against).
    * The per-epoch rank is the usual bounded top-k window shape.
    */
  def epochShuffle(s: SparkSession, d: String, epochs: Int = 2, k: Int = 20): DataFrame = {
    val e = Tables.documents(s, d).select(col("doc_id"))
      .withColumn("epoch", explode(expr(s"sequence(1, $epochs)")))
      // the epoch must perturb the id BEFORE the multiply — a post-hash
      // additive offset shifts every key equally and preserves the order
      .withColumn("h", expr("((doc_id + epoch * 7919) * 2654435761) % 4294967296"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch")).orderBy(col("h"), col("doc_id"))
    e.withColumn("pos", row_number().over(w))
      .filter(col("pos") <= k)
      .select(col("epoch").cast("int").as("epoch"), col("pos"), col("doc_id"), col("h"))
      .orderBy(col("epoch"), col("pos"))
  }

  /** Dataset card — the one-row corpus summary a catalog stores next to
    * the data: sizes, source/language breadth, token mass, exact-dup
    * rate, language share. ONE scan, one partial-agg row (every measure
    * is algebraic or a distinct-count) — the cheapest honest metadata a
    * 100 TB corpus can produce. (At web scale the distinct-text count
    * would ride a fingerprint, as the dedup family does; the card keeps
    * the plain form so the oracle stays equi-expressible.)
    */
  def datasetCard(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        sum(size(TextFunctions.rawTokens(col("text")))).cast("long").as("n_tokens"),
        countDistinct(col("text")).as("n_uniq_texts"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
      .select(col("n_docs"), col("n_sources"), col("n_langs"), col("n_tokens"),
        col("n_uniq_texts"),
        expr("(n_docs - n_uniq_texts) * 10000 div n_docs").as("dup_bp"),
        expr("n_en * 1000 div n_docs").as("en_pm"),
        expr("n_tokens div n_docs").as("avg_doc_tokens"))

  /** Feed-freshness report — the catalog's staleness monitor: per event
    * type, the last active day, staleness vs the corpus max day, days
    * active, and volume. One partial-agg pass + a broadcast 1-row
    * scalar for "now"; the report is |types| rows at any scale.
    */
  def freshness(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
    val mx = ev.agg(max(col("day")).as("now_day"))
    ev.groupBy(col("event_type"))
      .agg(max(col("day")).as("last_day"),
        countDistinct(col("day")).as("days_active"),
        count(lit(1)).as("n_events"))
      .crossJoin(broadcast(mx))
      .select(col("event_type"), col("last_day"),
        (col("now_day") - col("last_day")).as("staleness_days"),
        col("days_active"), col("n_events"))
      .orderBy(col("event_type"))
  }

  /** Data-quality assertion report — the ingest-time contract check a
    * catalog runs before admitting a batch: referential integrity
    * (orphan foreign keys via null-producing left joins + conditional
    * counts, never a second scan), domain checks, duplicate-key and
    * null-rate checks, one (check, n_bad, n_total) row each. Every
    * check is a partial-aggregable single pass over its table; the
    * union of six tiny aggregate rows costs nothing at any scale.
    */
  def dqReport(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    val docs = Tables.documents(s, d)
    val ev = Tables.events(s, d)

    def row(name: String, agg: DataFrame): DataFrame =
      agg.select(lit(name).as("check"), col("n_bad"), col("n_total"))

    val liOrphan = row("lineitem_orphan_order",
      li.select("l_orderkey")
        .join(ord.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left")
        .agg(count(when(col("o_orderkey").isNull, 1)).as("n_bad"),
          count(lit(1)).as("n_total")))
    val ordOrphan = row("order_orphan_customer",
      ord.select("o_custkey")
        .join(Tables.customer(s, d).select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left")
        .agg(count(when(col("c_custkey").isNull, 1)).as("n_bad"),
          count(lit(1)).as("n_total")))
    val emptyText = row("doc_empty_text",
      docs.agg(count(when(col("text").isNull || length(col("text")) === 0, 1)).as("n_bad"),
        count(lit(1)).as("n_total")))
    val dupIds = row("doc_dup_id",
      docs.agg((count(lit(1)) - countDistinct(col("doc_id"))).as("n_bad"),
        count(lit(1)).as("n_total")))
    val badQty = row("lineitem_nonpositive_qty",
      li.agg(count(when(col("l_quantity") <= 0, 1)).as("n_bad"),
        count(lit(1)).as("n_total")))
    val nullUser = row("event_null_user",
      ev.agg(count(when(col("user_id").isNull, 1)).as("n_bad"),
        count(lit(1)).as("n_total")))

    liOrphan.unionByName(ordOrphan).unionByName(emptyText)
      .unionByName(dupIds).unionByName(badQty).unionByName(nullUser)
      .orderBy(col("check"))
  }

  /** Stream-static enrichment join (events stream × per-user segment
    * dim) + tumbling hourly agg per segment; the batch plan is the
    * oracle-gated path, streaming parity pinned in StreamingSpec.
    */
  def streamJoin(s: SparkSession, d: String): DataFrame = {
    val ev = EventStreams.normalize(Tables.events(s, d))
    EventStreams.enrichedWindowAgg(ev, EventStreams.userSegments(ev))
      .orderBy(col("window_start_us"), col("segment"))
  }

  /** Native session_window sessionization (batch face; the streaming
    * run is pinned in StreamingSpec).
    */
  def streamSessionWindow(s: SparkSession, d: String): DataFrame =
    EventStreams.sessionWindowAgg(EventStreams.normalize(Tables.events(s, d)))
      .orderBy(col("user_id"), col("start_us"))

  /** CDC-style per-user latest-state view — batch face of
    * EventStreams.latestState / latestStateStreaming (parity pinned in
    * StreamingSpec).
    */
  def streamLatestState(s: SparkSession, d: String): DataFrame =
    EventStreams.latestState(EventStreams.normalize(Tables.events(s, d)))

  def streamKmvUniques(s: SparkSession, d: String): DataFrame =
    EventStreams.kmvUniques(EventStreams.normalize(Tables.events(s, d)))

  def streamCdcTombstone(s: SparkSession, d: String): DataFrame =
    EventStreams.cdcTombstone(EventStreams.normalize(Tables.events(s, d)))

  def streamSeqPairs(s: SparkSession, d: String): DataFrame =
    EventStreams.seqPairsSupport(EventStreams.normalize(Tables.events(s, d)))

  /** Batch faces of the TTL/eviction streaming ops (VERDICT r12 #2):
    * the per-entity view restricted to each user's FINAL activity
    * session under gap>48h breaks — exactly the state an
    * EventTimeTimeout stream job holds at end of stream (streaming
    * parity + eviction pinned in StreamingSpec; bounded-state-vs-
    * NoTimeout measured in StreamBench).
    */
  def streamLatestStateTtl(s: SparkSession, d: String): DataFrame =
    EventStreams.latestStateTtl(EventStreams.normalize(Tables.events(s, d)))

  def streamSeqPairsTtl(s: SparkSession, d: String): DataFrame =
    EventStreams.seqPairsTtlSupport(EventStreams.normalize(Tables.events(s, d)))

  /** Token-bucket admission per user — the batch face of
    * [[EventStreams.rateLimitStreaming]] (event-level enforcement, vs
    * q_rate_limit's day-quota aggregate view); ordered two-batch
    * streaming parity pinned in StreamingSpec.
    */
  def streamRateLimit(s: SparkSession, d: String): DataFrame =
    EventStreams.rateLimitBatch(EventStreams.normalize(Tables.events(s, d)))

  /** TTL face of the token bucket (VERDICT r13 #1): admission counters
    * over each user's final gap>horizon session — the state an
    * EventTimeTimeout rate limiter holds at end of stream. Horizon =
    * bucket capacity makes the eviction decision-exact (see
    * [[EventStreams.RateLimitHorizonUs]]).
    */
  def streamRateLimitTtl(s: SparkSession, d: String): DataFrame =
    EventStreams.rateLimitTtl(EventStreams.normalize(Tables.events(s, d)))

  /** CDC snapshot+delta compaction (VERDICT r13 #6): the sink ⊕ live
    * state view of [[EventStreams.cdcCompactStreaming]], rendered in
    * batch as the two-level (segment, then user) merge; equals
    * stream_cdc_tombstone bit-exactly on the shared columns (the
    * compaction algebra), n_segments audits the flush count.
    */
  def streamCdcCompact(s: SparkSession, d: String): DataFrame =
    EventStreams.cdcCompact(EventStreams.normalize(Tables.events(s, d)))

  def streamLateAudit(s: SparkSession, d: String): DataFrame =
    EventStreams.lateAudit(EventStreams.normalize(Tables.events(s, d)))

  /** TTL face of the lateness auditor (round 14): the audit over final
    * gap>48h sessions — the one whose eviction drops a per-EVENT replay
    * buffer, the suite's worst state-growth class.
    */
  def streamLateAuditTtl(s: SparkSession, d: String): DataFrame =
    EventStreams.lateAuditTtl(EventStreams.normalize(Tables.events(s, d)))

  /** Time-bounded funnel — the batch face of
    * [[EventStreams.funnelStreaming]] (same recurrence as
    * q_funnel_window; cross-batch state-machine parity pinned in
    * StreamingSpec).
    */
  def streamFunnel(s: SparkSession, d: String): DataFrame =
    Temporal.qFunnelWindow(s, d)

  /** Per-purchase click attribution — the batch face of the
    * stream-stream interval join (EventStreams.attributionPairsStreaming;
    * pair-level streaming ≡ batch parity pinned in StreamingSpec).
    */
  def streamAttribution(s: SparkSession, d: String): DataFrame =
    EventStreams.attribution(EventStreams.normalize(Tables.events(s, d)))

  /** Corpus snapshot diff — the dataset-versioning primitive a training
    * pipeline runs between releases (what changed since the last crawl
    * / curation pass?): two deterministic virtual snapshots of the
    * documents table (v1 drops doc_id ≡ 3 mod 11 — "added later"; v2
    * drops doc_id ≡ 5 mod 13 — "removed since"; v2 rewrites content
    * for doc_id ≡ 2 mod 7 — "changed"), compared by content
    * FINGERPRINT, never by text: the full-outer join on doc_id ships
    * (id, lang, bytes, 8-byte fp) rows only, so the diff costs one
    * co-partitioned shuffle at any corpus size. Output: docs + bytes
    * per (lang, added/removed/changed/unchanged) — the release-notes
    * table.
    */
  def datasetDiff(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
    val v1 = docs.filter(expr("doc_id % 11 != 3"))
      .select(col("doc_id"), col("lang"), col("n_chars").as("bytes1"),
        TextFunctions.fingerprint(col("text")).as("fp1"))
    val v2 = docs.filter(expr("doc_id % 13 != 5"))
      .select(col("doc_id"), col("lang").as("lang2"), col("n_chars").as("bytes2"),
        when(expr("doc_id % 7 = 2"),
          TextFunctions.fingerprint(concat(col("text"), lit(" v2"))))
          .otherwise(TextFunctions.fingerprint(col("text"))).as("fp2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("fp1").isNull, "added")
          .when(col("fp2").isNull, "removed")
          .when(col("fp1") =!= col("fp2"), "changed")
          .otherwise("unchanged"))
      .withColumn("lang", coalesce(col("lang"), col("lang2")))
      .withColumn("bytes", coalesce(col("bytes2"), col("bytes1")))
      .groupBy(col("lang"), col("status"))
      .agg(count(lit(1)).as("n_docs"), sum(col("bytes")).cast("long").as("bytes"))
      .orderBy(col("lang"), col("status"))
  }

  /** Filtered vector search — ANN under a metadata predicate (the
    * "filtered ANN" capability of modern vector stores): candidates
    * restricted to English documents by a LEFT-SEMI join of the
    * embedding table against the dimension-side id set BEFORE any
    * distance math, so the scan prunes to the slice first (at 100 TB
    * the filter rides partition/zone pruning, and the expensive cosine
    * never touches excluded vectors). Queries are the standard
    * vec_id ≡ 0 mod 97 grid restricted to the same slice; scoring is
    * the gated brute-cosine baseline.
    */
  def annFiltered(s: SparkSession, d: String): DataFrame = {
    val en = Tables.documents(s, d).filter(col("lang") === "en")
      .select(col("doc_id"))
    Similarity.bruteTopK(
      Tables.embeddings(s, d)
        .join(en, col("vec_id") === col("doc_id"), "left_semi"),
      queryPred)
  }

  /** Token-budget corpus assembly — the "fill the training mix" step:
    * per language, documents are admitted in quality order (distinct-
    * token ratio ×10⁴, ties by doc_id) until the cumulative token
    * count exceeds the 2500-token budget; the summary reports kept vs
    * total docs/tokens and budget utilization. One shuffle on lang;
    * the prefix sum reuses that partitioning. At 100 TB the
    * within-lang quality order is a range sort — the same discipline
    * as pipe_quota_sample's per-key top-k, with the budget replacing
    * the row quota.
    */
  def tokenBudget(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.rawTokens(col("text"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("prio").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        greatest(size(toks).cast("long"), lit(1L)).as("n_tok"),
        size(array_distinct(toks)).cast("long").as("n_uniq"))
      .withColumn("prio", expr("(10000 * n_uniq) div n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("tokens_total"),
        sum(when(col("cum_tok") <= 2500, 1L).otherwise(0L)).cast("long").as("n_kept"),
        sum(when(col("cum_tok") <= 2500, col("n_tok")).otherwise(0L)).cast("long")
          .as("tokens_kept"))
      .withColumn("util_ppm", expr("(tokens_kept * 1000000) div 2500"))
      .orderBy(col("lang"))
  }

  /** Curriculum staging plan — order training data easy→hard by lexical
    * diversity (type-token ratio ×10⁴, the [[tokenBudget]] prio) into
    * four FIXED difficulty bands. Fixed thresholds, not quantiles, on
    * purpose: data-dependent quartiles need a global rank (the exact
    * path [[graft.operators.Relational.rankedCum]] provides), while a
    * banded curriculum is one groupBy — zero extra shuffles at 100 TB
    * and stable stage semantics across corpus versions. Emits per
    * stage: doc/token mass, difficulty range, and the cumulative token
    * offset where the stage starts in the training order (a 4-row
    * window — bounded stage domain, not a fact-scale sort).
    */
  def curriculum(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.rawTokens(col("text"))
    val scored = Tables.documents(s, d)
      .select(col("doc_id"),
        greatest(size(toks).cast("long"), lit(1L)).as("n_tok"),
        size(array_distinct(toks)).cast("long").as("n_uniq"))
      .withColumn("difficulty_x1e4", expr("(10000 * n_uniq) div n_tok"))
      .withColumn("stage",
        when(col("difficulty_x1e4") < 2500, 1L)
          .when(col("difficulty_x1e4") < 5000, 2L)
          .when(col("difficulty_x1e4") < 7500, 3L).otherwise(4L))
    val stages = scored.groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        min(col("difficulty_x1e4")).as("min_diff"),
        max(col("difficulty_x1e4")).as("max_diff"))
    val w = Window.orderBy(col("stage")).rowsBetween(Window.unboundedPreceding, -1)
    stages.withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .orderBy(col("stage"))
  }

  /** Temperature-scaled language sampling (T = 2) — the standard
    * multilingual rebalancer: sample language i with probability
    * ∝ n_i^(1/T) = √n_i, which upweights low-resource languages
    * without flattening to uniform ([[mixWeights]] is the T → ∞
    * endpoint of the same family; the lang domain is the skewed one —
    * sources are deliberately balanced in this corpus). ⌊√n⌋ is exact
    * BIGINT for any count below 2⁵³ (IEEE sqrt is correctly rounded on
    * integers — bit-equal in both engines), so weights and the
    * 10k-draw allocation gate hash-exact. One lang-domain aggregate +
    * a 1-row broadcast: the fact scan is the only corpus-scale work.
    */
  def temperature(s: SparkSession, d: String): DataFrame = {
    val byLang = Tables.documents(s, d).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("sqrt_n", floor(sqrt(col("n_docs"))).cast("long"))
    val totals = byLang.agg(sum(col("n_docs")).as("n_total"),
      sum(col("sqrt_n")).as("sqrt_total"))
    byLang.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_docs"), col("sqrt_n"),
        expr("(n_docs * 1000000) div n_total").as("share_ppm"),
        expr("(sqrt_n * 1000000) div sqrt_total").as("weight_ppm"),
        expr("(sqrt_n * 10000) div sqrt_total").as("samples_per_10k"))
      .orderBy(col("lang"))
  }

  /** T5-style span-corruption masking plan: per doc, 15% of tokens
    * masked in mean-length-3 spans — n_masked = max(1, ⌊0.15·n⌋),
    * n_spans = max(1, ⌊n_masked/3⌋), encoder input n − n_masked +
    * n_spans sentinels, decoder target n_masked + n_spans + 1 (EOS) —
    * the seq2seq budget planner that sizes batches BEFORE any
    * tokenizer runs. The first span start is derived from the text
    * fingerprint (mod the last legal start), so masking is
    * reproducible without an RNG: a re-run of the pipeline masks the
    * same positions. Pure per-row arithmetic — embarrassingly
    * parallel, no shuffle before the output page.
    */
  def spanMask(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.rawTokens(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"),
        greatest(size(toks).cast("long"), lit(1L)).as("n_tok"))
      .withColumn("n_masked", greatest(lit(1L), expr("(n_tok * 15) div 100")))
      .withColumn("n_spans", greatest(lit(1L), expr("n_masked div 3")))
      .select(col("doc_id"), col("n_tok"), col("n_masked"), col("n_spans"),
        expr("n_tok - n_masked + n_spans").as("input_len"),
        expr("n_masked + n_spans + 1").as("target_len"),
        expr("fp % greatest(n_tok - n_masked + 1, 1)").as("first_start"))
      .orderBy(col("doc_id")).limit(100)
  }

  /** Train/eval split decontamination audit — the GPT-3-style n-gram
    * leakage check run BEFORE any benchmark number is trusted: docs
    * are split by the same multiplicative hash [[splitAssign]] ships,
    * and an eval (val/test) doc is CONTAMINATED if it shares any
    * 8-token span with any train doc (exact-dup fingerprints miss
    * near-identical paraphrases; span overlap is the published
    * decontamination standard). Emits per eval split: docs,
    * contaminated docs, leak ppm. Scale shape: only 8-byte span
    * poly-hashes ever shuffle (the [[graft.dedup.Dedup.spanDups]]
    * discipline — text stays in the map side), the train-gram set is
    * gram-vocabulary-scale, and the membership join is hash-to-hash.
    */
  def splitLeakage(s: SparkSession, d: String): DataFrame = {
    val train = 3435973836L // floor(0.8 * 2^32)
    val valCap = 3865470566L // floor(0.9 * 2^32)
    val tk = TextFunctions.rawTokens(col("text"))
    val tagged = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), tk.as("tk"),
        expr("(doc_id * 2654435761) % 4294967296").as("h32"))
      .withColumn("split",
        when(col("h32") < train, lit("train"))
          .when(col("h32") < valCap, lit("val")).otherwise(lit("test")))
      .select(col("doc_id"), col("split"),
        transform(graft.functions.TextExpressionFunctions
            .wordShingles(array_join(col("tk"), " "), 8),
          sh => TextFunctions.fingerprint(sh)).as("hs"))
      .localCheckpoint(eager = false)
    val ex = tagged.select(col("doc_id"), col("split"), explode(col("hs")).as("h"))
    val trainGrams = ex.filter(col("split") === "train").select(col("h")).distinct()
    val contaminated = ex.filter(col("split") =!= "train")
      .join(trainGrams, Seq("h"))
      .select(col("doc_id")).distinct()
      .withColumn("bad", lit(1L))
    tagged.filter(col("split") =!= "train")
      .join(contaminated, Seq("doc_id"), "left")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("bad"), lit(0L))).cast("long").as("n_contaminated"))
      .withColumn("leak_ppm", expr("(n_contaminated * 1000000) div n_docs"))
      .orderBy(col("split"))
  }

  /** Composed cleaning pipeline: quality-gate → exact-dedup (keep the
    * smallest doc_id per normalized-text fingerprint) — the minimal
    * corpus-preparation chain, one declarative plan end to end.
    */
  def cleanCorpus(s: SparkSession, d: String): DataFrame = {
    // the pinned per-doc stats table IS the checkpoint barrier the old
    // inline build needed (no alias-substitution pushdown through a
    // LogicalRDD), shared with dedupCorpus
    memoDocStats(s, d)
      .filter(col("n_tok") >= 10 &&
        expr("(10000 * n_stop) div n_tok") < 4000 &&
        expr("(10000 * n_uniq) div n_tok") > 2500)
      .groupBy(col("fp_norm"))
      .agg(min(col("doc_id")).as("doc_id"), min_by(col("n_tok"), col("doc_id")).as("n_tok"),
        count(lit(1)).as("n_dups"))
      .select(col("doc_id"), col("fp_norm"), col("n_tok"), col("n_dups"))
      .orderBy(col("doc_id"))
  }

  /** The full corpus-preparation pipeline: quality gate → NEAR-dup
    * clustering (MinHash-LSH pairs + connected components over the
    * survivors) → keep the minimum doc per cluster. The near-dup
    * analog of [[cleanCorpus]] (which only removes exact dups) — i.e.
    * the chain a 100 TB training-data prep actually runs.
    */
  def dedupCorpus(s: SparkSession, d: String): DataFrame = {
    // survivor ids from the pinned per-doc stats table; text re-attaches
    // by a semi-join against the raw scan, so the full tokenize pass is
    // never re-run per invocation and text is only materialized where a
    // consumer actually reads it (the candidate-pair verify)
    val qualIds = memoDocStats(s, d)
      .filter(col("n_tok") >= 10 &&
        expr("(10000 * n_stop) div n_tok") < 4000 &&
        expr("(10000 * n_uniq) div n_tok") > 2500)
      .select(col("doc_id"))
    val quality = Tables.documents(s, d)
      .join(qualIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"))
      // the survivor set feeds the shingle pipeline, both verify sides,
      // and the component node list — materialize ONCE per invocation
      // (r16 A/B: without this barrier the three consumers each re-ran
      // the scan+semi-join, 1.8 -> 2.5 s); the tokenize pass itself now
      // comes from the pinned stats table, never re-run
      .localCheckpoint()
    // band rows are per-doc, so the quality gate is a SEMI-JOIN on the
    // shared corpus band table ([[Dedup.memoBands]]) — the survivors are
    // never re-shingled or re-minhashed (identical rows by construction)
    val bands = Dedup.memoBands(s, d)
      .join(quality.select(col("doc_id")), Seq("doc_id"), "left_semi")
    Dedup.clustersFrom(quality, Dedup.minhashLshPairsFromBands(bands, quality)
        .select(col("a"), col("b")))
      .filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  /** Sequence packing — the concat-and-chunk step an LLM training-data
    * pipeline runs last: concatenate each shard's token stream in
    * doc_id order and cut it into fixed `budget`-token sequences. Emits
    * each document's placement: the pack it starts in, the pack it ends
    * in, and its offset inside the first pack. Packing is per-SHARD
    * (shard = doc_id % `shards`) by design: a global concatenation
    * order would force a single-partition window at 100 TB, while
    * per-shard cumulative sums are independent windows that scale with
    * the shard count (training jobs shuffle shards anyway, so no global
    * order is ever needed).
    */
  def packSequences(s: SparkSession, d: String,
                    budget: Long = 256L, shards: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), (col("doc_id") % shards).as("shard"),
        size(TextFunctions.rawTokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("cum_end", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        ((col("cum_end") - col("n_tok")) % budget).as("pack_offset"),
        expr(s"(cum_end - n_tok) div $budget").as("pack_first"),
        expr(s"(cum_end - 1) div $budget").as("pack_last"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark decontamination — flag training documents that share
    * word-3-gram shingles with a held-out evaluation set (doc_id % 97
    * = 0 plays the benchmark). The benchmark shingle set is
    * fixed-size (eval suites don't grow with the corpus), so it is
    * DISTINCT'd and broadcast; the corpus side is explode → broadcast
    * hash join → per-doc count — the only shuffle carries (doc_id,
    * n_sh) pairs for the aggregation, never text. Emits per
    * contaminated doc the absolute overlap and the basis-point overlap
    * ratio a filter would threshold on.
    */
  /** Bloom-filter decontamination — the scale path when the benchmark
    * set is too big to broadcast EXACTLY (pipe_contamination's shape):
    * bench shingles fold into an M=65536-bit Bloom bitmap (K=3
    * deterministic polynomial hashes; 32-bit words so every mask stays
    * a positive BIGINT in both engines), the ≤2048-row bitmap
    * broadcasts, and each training shingle probes its 3 bits via
    * broadcast joins — no corpus shuffle, and the bitmap stays M bits
    * however large the benchmark grows. The filter is deterministic, so
    * its false positives are REPLAYED by the DuckDB oracle and the
    * query gates hash-exact — an approximate operator with an exact
    * spec. Emits every training doc (zero-hit rows included: the audit
    * wants the clean ones too).
    */
  def contaminationBloom(s: SparkSession, d: String): DataFrame = {
    val M = 65536L
    val hashes = Seq((31L, 1000000007L), (37L, 998244353L), (41L, 1000000009L))
    def pos(c: Column, i: Int): Column = pmod(
      graft.functions.TextExpressionFunctions.polyHash(c, hashes(i)._1, hashes(i)._2),
      lit(M))
    val docs = Tables.documents(s, d)
    val bench = docs.filter(col("doc_id") % 97 === 0)
      .select(explode(Dedup.shingles(col("text"))).as("sh")).distinct()
    val bloom = bench
      .select(explode(array((0 until 3).map(i => pos(col("sh"), i)): _*)).as("pos"))
      .distinct()
      .select(expr("pos div 32").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").as("bit"))
      .groupBy(col("word")).agg(expr("bit_or(bit)").as("mask"))
    val train = docs.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), Dedup.shingles(col("text")).as("shs"))
      .select(col("doc_id"), size(col("shs")).cast("long").as("n_sh"),
        explode(col("shs")).as("sh"))
    val probed = (0 until 3).foldLeft(
        train.select(Seq(col("doc_id"), col("n_sh")) ++
          (0 until 3).map(i => pos(col("sh"), i).as(s"p$i")): _*)) { (df, i) =>
      df.join(broadcast(bloom.select(col("word").as(s"w$i"), col("mask").as(s"m$i"))),
          expr(s"p$i div 32") === col(s"w$i"), "left")
        .withColumn(s"hit$i",
          coalesce(expr(s"shiftright(m$i, CAST(p$i % 32 AS INT)) & 1"), lit(0L)))
    }
    probed
      .withColumn("hit", when(
        col("hit0") === 1L && col("hit1") === 1L && col("hit2") === 1L, 1L).otherwise(0L))
      .groupBy(col("doc_id"), col("n_sh")).agg(sum(col("hit")).as("n_bloom_hit"))
      .withColumn("hit_bp", expr("(10000 * n_bloom_hit) div n_sh"))
      .select(col("doc_id"), col("n_sh"), col("n_bloom_hit"), col("hit_bp"))
      .orderBy(col("doc_id"))
  }

  def contamination(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val bench = docs.filter(col("doc_id") % 97 === 0)
      .select(explode(Dedup.shingles(col("text"))).as("sh")).distinct()
    val train = docs.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), Dedup.shingles(col("text")).as("shs"))
      .select(col("doc_id"), size(col("shs")).cast("long").as("n_sh"),
        explode(col("shs")).as("sh"))
    // shingles are per-doc distinct (WordShingles) and bench is distinct,
    // so the join emits each (doc, shingle) hit at most once
    train.join(broadcast(bench), Seq("sh"))
      .groupBy(col("doc_id"), col("n_sh"))
      .agg(count(lit(1)).as("n_hit"))
      .withColumn("hit_bp", expr("(10000 * n_hit) div n_sh"))
      .select(col("doc_id"), col("n_sh"), col("n_hit"), col("hit_bp"))
      .orderBy(col("doc_id"))
  }

  /** Source-quota curation — cap every source at `quota` documents
    * (training-mix control: no domain may dominate the corpus). The
    * survivors are chosen by a DETERMINISTIC pseudo-random order — a
    * Knuth multiplicative hash of doc_id — so the cap takes an unbiased
    * fixed sample rather than "first N by id" recency bias, and both
    * engines replay the identical choice. Per-source top-k is the
    * row_number window shape the TopKRewrite rule lowers to the native
    * TopKPerKey operator; the shuffle carries (source, hash, id) rows
    * only — no text moves at 100 TB.
    */
  def quotaSample(s: SparkSession, d: String, quota: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("hkey"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        ((col("doc_id") * 2654435761L) % 4294967296L).as("hkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= quota)
      .select(col("source"), col("rk"), col("doc_id"), col("hkey"))
      .orderBy(col("source"), col("rk"))
  }

  /** Incremental aggregate maintenance — the ingest-time shape: each
    * arriving batch (batch = doc_id % `batches` here) reduces to
    * per-source PARTIAL aggregates (count/sum/min/max, all mergeable),
    * and corpus totals are maintained by MERGING partials — never by
    * rescanning the corpus. The merged result provably equals the
    * direct aggregate, and the oracle computes the direct form, so the
    * gate checks that algebraic identity. At 100 TB the partials are
    * the persisted per-ingest tables; a merge shuffles
    * batches×|sources| tiny rows.
    */
  def mergeStats(s: SparkSession, d: String, batches: Int = 5): DataFrame =
    Tables.documents(s, d)
      .groupBy((col("doc_id") % batches).as("batch"), col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
        min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_docs"), sum(col("chars")).as("sum_chars"),
        min(col("mn")).as("min_doc"), max(col("mx")).as("max_doc"),
        count(lit(1)).as("n_batches"))
      .orderBy(col("source"))

  def mmPatchify(s: SparkSession, d: String): DataFrame =
    Multimodal.patchifyPlan(Multimodal.decodeMeta(Tables.documents(s, d)))

  /** Training-mix reweighting — the sampling weights that move the
    * corpus from its ACTUAL source distribution to a TARGET one
    * (uniform here): weight_s = target_share / actual_share, scaled
    * ×10⁶ in BIGINT integer division for an exact gate. One tiny
    * per-source aggregate + a count; the weights table then broadcasts
    * onto the corpus for weighted sampling (pipe_quota_sample /
    * q_weighted_sample are the consumers of exactly this table).
    */
  /** Deterministic minority-class oversampling — the class-balancing
    * step before training on a skewed corpus: every language is
    * replicated up to the majority class's size, rep = ⌈target/n⌉
    * copies per doc (stateless — any worker re-derives any doc's copy
    * count, the [[Pipeline.split]] discipline). The audit row per
    * language carries n_orig/rep/n_after plus before/after corpus
    * shares (ppm) AND a checksum over the replicated rows
    * (Σ doc_id·copy) so the gate proves the explode actually ran, not
    * just the arithmetic around it. Scale shape: the rep table is
    * |langs| rows broadcast; replication is a map-side
    * explode(sequence) — no shuffle until the per-lang partial agg;
    * the only unpartitioned window runs over the |langs|-row audit.
    */
  def pipeOversample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_orig"))
    val totals = counts.agg(max(col("n_orig")).as("target"),
      sum(col("n_orig")).cast("long").as("n_tot"))
    val rep = counts.crossJoin(broadcast(totals))
      .withColumn("rep_factor", expr("(target + n_orig - 1) div n_orig"))
      .select(col("lang"), col("n_orig"), col("rep_factor"), col("n_tot"))
    val expanded = docs
      .join(broadcast(rep.select(col("lang"), col("rep_factor"))), Seq("lang"))
      .select(col("lang"), col("doc_id"),
        explode(expr("sequence(1L, rep_factor)")).as("copy"))
    val audit = expanded.groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_after"),
        sum(col("doc_id") * col("copy")).cast("long").as("checksum"))
      .join(broadcast(rep), Seq("lang"))
    audit
      .withColumn("n_tot_after",
        sum(col("n_after")).over(org.apache.spark.sql.expressions.Window
          .partitionBy()))
      .select(col("lang"), col("n_orig"), col("rep_factor"), col("n_after"),
        col("checksum"),
        expr("(n_orig * 1000000) div n_tot").as("share_before_ppm"),
        expr("(n_after * 1000000) div n_tot_after").as("share_after_ppm"))
      .orderBy(col("lang"))
  }

  def mixWeights(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val bySource = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val totals = bySource.agg(sum(col("n_docs")).as("n_total"),
      count(lit(1)).as("n_sources"))
    bySource.crossJoin(broadcast(totals))
      // target_share/actual_share = (total/sources) / (n_docs/total)
      // — rearranged to a single integer division
      .withColumn("weight_x1e6",
        expr("(1000000 * n_total) div (n_sources * n_docs)"))
      .select(col("source"), col("n_docs"), col("weight_x1e6"))
      .orderBy(col("source"))
  }

  /** Deterministic weighted interleave — the training-order writer:
    * each doc gets a virtual time vt = rk·10⁶ div weight(source)
    * (weighted fair queueing: rarer sources get smaller vt steps, so
    * their docs surface proportionally more often), with the per-source
    * order rk coming from the same multiplicative-hash shuffle
    * pipe_epoch_shuffle uses. The merge order is the global (vt,
    * source, doc_id) sort — realized as a distributed top-k
    * (TakeOrderedAndProject), never a single-partition global sort;
    * the k-row position window runs over the collected page only.
    * rk·10⁶ is staged through DECIMAL(38,0) (HUGEINT in the oracle)
    * so a 10¹²-row source cannot overflow the product at 100 TB.
    */
  def interleave(s: SparkSession, d: String, k: Int = 200): DataFrame = {
    val docs = Tables.documents(s, d)
    val bySource = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val totals = bySource.agg(sum(col("n_docs")).as("n_total"),
      count(lit(1)).as("n_sources"))
    val w = bySource.crossJoin(broadcast(totals))
      .select(col("source"),
        expr("(1000000 * n_total) div (n_sources * n_docs)").as("weight_x1e6"))
    val perSource = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("hkey"), col("doc_id"))
    val vt = docs
      .select(col("source"), col("doc_id"),
        ((col("doc_id") * 2654435761L) % 4294967296L).as("hkey"))
      .withColumn("rk", row_number().over(perSource).cast("long"))
      .join(broadcast(w), Seq("source"))
      .withColumn("vt",
        expr("CAST((CAST(rk AS DECIMAL(38,0)) * 1000000) div weight_x1e6 AS BIGINT)"))
    vt.orderBy(col("vt"), col("source"), col("doc_id")).limit(k)
      .withColumn("pos", row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("vt"), col("source"), col("doc_id"))))
      .select(col("pos"), col("source"), col("doc_id"), col("rk"), col("vt"))
      .orderBy(col("pos"))
  }

  /** Dedup-method evaluation — the pipeline-QA operator: precision and
    * recall of the SimHash hamming≤3 detector against the exact
    * n-gram-Jaccard ≥0.5 ground truth, both already first-class gated
    * operators here. One full-outer join of the two (candidate-scale,
    * corpus-independent) pair sets, one audit row out — the number a
    * curation pipeline checks before trusting a cheap detector at
    * 100 TB. Ratios are ×10⁶ integers; NULLIF guards the empty case.
    */
  def dedupEval(s: SparkSession, d: String): DataFrame = {
    val truth = Dedup.memoNgramPairs(s, d)
      .select(col("a"), col("b"), lit(1).as("t"))
    val pred = Dedup.memoSimhashPairs(s, d)
      .select(col("a"), col("b"), lit(1).as("p"))
    truth.join(pred, Seq("a", "b"), "full_outer")
      .agg(
        count(col("t")).as("n_truth"),
        count(col("p")).as("n_pred"),
        count(when(col("t").isNotNull && col("p").isNotNull, 1)).as("tp"),
        count(when(col("t").isNull && col("p").isNotNull, 1)).as("fp"),
        count(when(col("t").isNotNull && col("p").isNull, 1)).as("fn"))
      .select(col("n_truth"), col("n_pred"), col("tp"), col("fp"), col("fn"),
        expr("(tp * 1000000) div NULLIF(n_pred, 0)").as("precision_x1e6"),
        expr("(tp * 1000000) div NULLIF(n_truth, 0)").as("recall_x1e6"))
  }

  /** Several exact distincts in one aggregation pass (planner expands to
    * a single multi-way Expand + partial aggs — no per-distinct scan).
    */
  def multiDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** Surprisal (perplexity-proxy) histogram of the corpus — the
    * LM-quality-filter readout every "remove low/high-perplexity docs"
    * curation step is tuned from: docs bucketed by their mean unigram
    * surprisal in whole floor-log₂ bits ([[Text.surprisal]]'s per-doc
    * metric), per bucket the doc count, token mass, and corpus-share
    * ×10⁴. The vocabulary table is a broadcast; the histogram domain
    * is ≤ the 17-bit ceiling — nothing beyond token-scale pairs
    * shuffles.
    */
  def pipePerplexityBucket(s: SparkSession, d: String): DataFrame = {
    val perDoc = Text.surprisal(s, d)
    val tot = perDoc.agg(count(lit(1)).as("total_docs"))
    perDoc
      .groupBy(expr("mean_bits_x100 div 100").as("bits_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        sum(col("bits_total")).cast("long").as("bits_total"))
      .crossJoin(broadcast(tot))
      .withColumn("doc_share_x1e4", expr("(n_docs * 10000) div total_docs"))
      .drop("total_docs")
      .orderBy(col("bits_bucket"))
  }

  /** Tokenizer fertility by language — tokens-per-word and
    * tokens-per-100-chars, the "is the tokenizer efficient on this
    * language" health metric a multilingual pipeline tracks per slice:
    * fertility ×10⁴ = BPE-ish tokens ([[TextFunctions.bpeCount]])
    * per whitespace word, density ×10⁴ per 100 chars. One partial-agg
    * scan to the language domain.
    */
  def pipeTokenizerFertility(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"),
        size(TextFunctions.wsTokens(col("text"))).cast("long").as("ws"),
        TextFunctions.bpeCount(col("text")).as("bpe"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).cast("long").as("n_words"),
        sum(col("bpe")).cast("long").as("n_bpe_tokens"),
        sum(col("chars")).cast("long").as("n_chars"))
      .withColumn("fertility_x1e4", expr("(n_bpe_tokens * 10000) div n_words"))
      .withColumn("tokens_per_100chars_x100",
        expr("(n_bpe_tokens * 10000) div n_chars"))
      .orderBy(col("lang"))

  /** Shard-balance audit of the [[reshardAudit]] 16-shard ring — the
    * "is any output shard hot" operational readout a reshard job emits
    * next to its data: per-shard doc count and byte mass, each shard's
    * deviation from the ideal 1/16 share ×10⁴, and the max-over-mean
    * skew ×10⁴ (broadcast 1-row totals). The ring assignment reuses
    * the SAME consistent-hash vnode spec, so this audit and the
    * reshard can never disagree about placement.
    */
  def pipeShardSkew(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("n_chars"),
        expr("(doc_id * 2654435761) % 4294967296").as("h"))
    val vn = (0 until 16).flatMap { sh =>
      (0 until 4).map(v =>
        struct(lit(sh.toLong).as("sh"),
          lit((sh.toLong * 73856093L + v * 19349663L) % 4294967296L).as("pos")))
    }
    val assigned = docs.withColumn("vn", explode(array(vn: _*)))
      .groupBy(col("h"), col("n_chars"))
      .agg(min_by(col("vn.sh"),
        struct(expr("(vn.pos - h + 4294967296) % 4294967296").as("dist"),
          col("vn.pos").as("pos"))).as("shard"))
    val per = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("bytes"))
    val tot = per.agg(sum(col("n_docs")).cast("long").as("tot_docs"),
      sum(col("bytes")).cast("long").as("tot_bytes"),
      max(col("bytes")).cast("long").as("max_bytes"),
      count(lit(1)).as("n_shards"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("bytes"),
        expr("(bytes * 10000) div tot_bytes").as("byte_share_x1e4"),
        expr("(n_docs * 10000) div tot_docs").as("doc_share_x1e4"),
        expr("(max_bytes * n_shards * 10000) div tot_bytes").as("skew_x1e4"))
      .orderBy(col("shard"))
  }

  /** NEAR-dup rate per source — [[pipeDedupRateBySource]]'s LSH-cluster
    * sibling, and the reason the shared cluster table exists: the same
    * triage readout over MinHash-LSH near-dup clusters instead of exact
    * fingerprints. Reads [[graft.dedup.Dedup.memoClusters]] (built once
    * per session ≙ the maintained cluster-assignment table at 100 TB) —
    * this query itself is two cheap rollups.
    */
  def pipeNearDupRateBySource(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("cluster_id"))
    Dedup.memoClusters(s, d)
      .withColumn("rep", min(col("doc_id")).over(w))
      .join(Tables.documents(s, d).select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cluster_size") > 1, 1L).otherwise(0L)).cast("long")
          .as("n_in_dup_clusters"),
        sum(when(col("rep") === col("doc_id"), 1L).otherwise(0L)).cast("long")
          .as("n_survivors"))
      .withColumn("dup_rate_x1e4", expr("(n_in_dup_clusters * 10000) div n_docs"))
      .orderBy(col("source"))
  }

  /** Quality-based cluster representatives — the curation decision
    * [[Dedup.exactKeep]]'s min-doc-id rule dodges: per multi-doc
    * near-dup cluster, keep the doc with the HIGHEST distinct-token
    * count (ties → smallest doc_id). Runs on the shared cluster table;
    * the quality score is one map-side pass over cluster members only
    * (a semi-join restricts the corpus scan at scale).
    */
  def pipeClusterReps(s: SparkSession, d: String): DataFrame = {
    val cl = Dedup.memoClusters(s, d).filter(col("cluster_size") > 1)
    val uniq = Tables.documents(s, d)
      .join(cl.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        size(array_distinct(TextFunctions.rawTokens(col("text")))).cast("long").as("uniq"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("uniq").desc, col("doc_id"))
    cl.join(uniq, Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("cluster_size"),
        col("doc_id").as("rep_doc_id"), col("uniq").as("rep_uniq"))
      .orderBy(col("cluster_id"))
  }

  /** Dedup threshold curve — what τ buys BEFORE committing a 100 TB
    * run: for 5 pinned Jaccard thresholds, how many verified near-dup
    * pairs and how many distinct member docs survive. Reads the shared
    * exact-Jaccard pair table ([[Dedup.memoNgramPairs]], τ ≥ 0.5 base)
    * and re-thresholds it — the corpus text is never re-read, the same
    * one-signature-table economics as dedup_lsh_sweep.
    */
  def pipeDedupThresholdCurve(s: SparkSession, d: String): DataFrame = {
    val taus = "array(500000L, 600000L, 700000L, 800000L, 900000L)"
    val pairs = Dedup.memoNgramPairs(s, d)
    val perTau = pairs
      .select(explode(expr(s"filter($taus, t -> j_x1e6 >= t)")).as("tau_x1e6"))
      .groupBy(col("tau_x1e6")).agg(count(lit(1)).cast("long").as("n_pairs"))
    val docsPerTau = pairs
      .select(col("j_x1e6"), explode(array(col("a"), col("b"))).as("doc"))
      .select(explode(expr(s"filter($taus, t -> j_x1e6 >= t)")).as("tau_x1e6"), col("doc"))
      .groupBy(col("tau_x1e6")).agg(countDistinct(col("doc")).as("n_docs"))
    perTau.join(docsPerTau, Seq("tau_x1e6")).orderBy(col("tau_x1e6"))
  }

  /** Near-dup storage savings per source — the BYTES a keep-one-per-
    * cluster pass would reclaim, charged to the dropped doc's source
    * (the capacity-planning readout next to the count-based rates):
    * reads the shared cluster table, joins doc sizes for cluster
    * members only, two rollups.
    */
  def pipeDedupBytesSaved(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("cluster_id"))
    Dedup.memoClusters(s, d)
      .withColumn("rep", min(col("doc_id")).over(w))
      .join(Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars")),
        Seq("doc_id"))
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).cast("long").as("bytes_total"),
        sum(when(col("rep") =!= col("doc_id"), col("n_chars")).otherwise(0L))
          .cast("long").as("bytes_saved"),
        sum(when(col("rep") =!= col("doc_id"), 1L).otherwise(0L))
          .cast("long").as("docs_dropped"))
      .withColumn("saved_ppm", expr("(bytes_saved * 1000000) div bytes_total"))
      .orderBy(col("source"))
  }

  /** Exact-duplicate rate per source — "which ingest feed is most
    * duplicated", the triage readout that decides where dedup budget
    * goes: per source, docs, docs in multi-doc fingerprint clusters,
    * the dup rate ×10⁴, and how many would survive keep-one-per-
    * cluster (cluster representative = min doc_id, charged to ITS
    * source — the [[graft.dedup.Dedup.exactKeep]] rule). Fingerprint
    * groupBys only — the text never shuffles.
    */
  def pipeDedupRateBySource(s: SparkSession, d: String): DataFrame = {
    val fp = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        TextFunctions.fingerprint(TextFunctions.normalized(col("text"))).as("fp"))
      .localCheckpoint(eager = false)
    val w = Window.partitionBy(col("fp"))
    fp.withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("rep", min(col("doc_id")).over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cluster_size") > 1, 1L).otherwise(0L)).cast("long").as("n_in_dup_clusters"),
        sum(when(col("rep") === col("doc_id"), 1L).otherwise(0L)).cast("long").as("n_survivors"))
      .withColumn("dup_rate_x1e4", expr("(n_in_dup_clusters * 10000) div n_docs"))
      .orderBy(col("source"))
  }

  // --- oracles -----------------------------------------------------------

  private val fpNorm = TextFunctions.fingerprintSql(TextFunctions.normalizedSql("text"))
  private val shingleE = Dedup.shinglesSql("text")

  /** Shared CTE chain of the near-dup transitive closure (pairs -> sym
    * closure -> min-reachable label) — single source for the
    * dedup_cluster and pipe_dup_cluster_stats oracles.
    */
  private lazy val clusterCtes: String =
    s"""WITH RECURSIVE sh AS (SELECT doc_id, $shingleE AS sh FROM documents),
       |pr AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b
       |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id
       |  WHERE len(list_intersect(x.sh, y.sh)) > 0
       |    AND (1000000 * CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT))
       |        // CAST(len(list_distinct(x.sh || y.sh)) AS BIGINT) >= 500000),
       |sym AS (SELECT a AS x, b AS y FROM pr UNION ALL SELECT b, a FROM pr),
       |reach(x, y) AS (
       |  SELECT x, y FROM sym
       |  UNION
       |  SELECT r.x, s.y FROM reach r JOIN sym s ON r.y = s.x),
       |lab AS (
       |  SELECT d.doc_id,
       |    LEAST(d.doc_id, COALESCE(MIN(r.y), d.doc_id)) AS cluster_id
       |  FROM documents d LEFT JOIN reach r ON r.x = d.doc_id
       |  GROUP BY d.doc_id)""".stripMargin

  /** Shared CTEs for the mm_features family: decoded BMP pixel grid →
    * per-channel 3×3 block sums → pinned-LCG random projection →
    * sign-split ÷2²¹ ±127 clamp (mirrors Multimodal.featVec exactly;
    * overflow-bound: |W| ≤ 1000, block sums < 1.1e4 ⇒ |dt| < 3e8).
    */
  private val mmFeatCtes =
    """WITH m AS (SELECT doc_id, 4 + doc_id % 21 AS w, 3 + doc_id % 14 AS h
      |           FROM documents),
      |px AS (
      |  SELECT m.doc_id, m.w, m.h, x.i AS x, y.i AS y,
      |    (m.doc_id + 3 * x.i + 5 * y.i) % 256 AS r,
      |    (2 * m.doc_id + 7 * x.i + y.i) % 256 AS g,
      |    (5 * m.doc_id + x.i + 11 * y.i) % 256 AS b
      |  FROM m, range(0, 24) x(i), range(0, 16) y(i)
      |  WHERE x.i < m.w AND y.i < m.h),
      |bl AS (
      |  SELECT doc_id,
      |    (CASE WHEN y < h // 3 THEN 0 WHEN y < (2 * h) // 3 THEN 1 ELSE 2 END) * 3
      |      + CASE WHEN x < w // 3 THEN 0 WHEN x < (2 * w) // 3 THEN 1 ELSE 2 END AS cell,
      |    r, g, b
      |  FROM px),
      |bs AS MATERIALIZED (
      |  SELECT doc_id, cell, CAST(sum(r) AS BIGINT) AS sr,
      |    CAST(sum(g) AS BIGINT) AS sg, CAST(sum(b) AS BIGINT) AS sb
      |  FROM bl GROUP BY doc_id, cell),
      |xs AS (
      |  SELECT doc_id, cell AS j, sr AS v FROM bs
      |  UNION ALL SELECT doc_id, 9 + cell, sg FROM bs
      |  UNION ALL SELECT doc_id, 18 + cell, sb FROM bs),
      |ft AS MATERIALIZED (
      |  SELECT x.doc_id, k.i AS k,
      |    CAST(sum(((1103515245 * (k.i * 27 + x.j) + 12345) % 2001 - 1000) * x.v) AS BIGINT) AS dt
      |  FROM xs x, range(0, 16) k(i) GROUP BY x.doc_id, k.i),
      |fv AS MATERIALIZED (
      |  SELECT doc_id, k,
      |    CAST(CASE WHEN dt >= 0 THEN LEAST(dt // 2097152, 127)
      |              ELSE -LEAST((-dt) // 2097152, 127) END AS BIGINT) AS feature
      |  FROM ft)""".stripMargin

  private val annBruteSql =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id % 97 = 0),
       |sc AS (
       |  SELECT q.q_id, e.vec_id,
       |    CAST(floor(${Similarity.cosineSql("q.q_emb", "e.embedding")} * 1e6) AS BIGINT) AS cos_x1e6
       |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
       |rk AS (
       |  SELECT q_id, vec_id, cos_x1e6,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_x1e6 DESC, vec_id) AS INT) AS rk
       |  FROM sc)
       |SELECT q_id, rk, vec_id, cos_x1e6 FROM rk WHERE rk <= 10
       |ORDER BY q_id, rk""".stripMargin

  private val annLshSql =
    s"""WITH b AS (
       |  SELECT vec_id, embedding,
       |    ${Similarity.normSql("embedding")} AS nrm,
       |    ${Similarity.lshBucketSql("embedding")} AS bkt
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, bkt AS q_bkt
       |      FROM b WHERE vec_id % 97 = 0),
       |sc AS (
       |  SELECT q.q_id, b.vec_id,
       |    CAST(floor(${Similarity.cosineSql("q.q_emb", "b.embedding")} * 1e6) AS BIGINT) AS cos_x1e6
       |  FROM b CROSS JOIN q
       |  WHERE bit_count(xor(b.bkt, q.q_bkt)) <= 1 AND b.vec_id <> q.q_id),
       |rk AS (
       |  SELECT q_id, vec_id, cos_x1e6,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_x1e6 DESC, vec_id) AS INT) AS rk
       |  FROM sc)
       |SELECT q_id, rk, vec_id, cos_x1e6 FROM rk WHERE rk <= 10
       |ORDER BY q_id, rk""".stripMargin

  private val bruteContainment =
    s"""WITH sh AS (SELECT doc_id, $shingleE AS sh FROM documents),
       |pr AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b,
       |    CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS inter,
       |    CAST(least(len(x.sh), len(y.sh)) AS BIGINT) AS mn
       |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id)
       |SELECT a, b, (1000000 * inter) // mn AS c_x1e6
       |FROM pr WHERE inter > 0 AND (1000000 * inter) // mn >= ${Dedup.ContainmentTauX1e6}
       |ORDER BY a, b""".stripMargin

  private val bruteJaccard =
    s"""WITH sh AS (SELECT doc_id, $shingleE AS sh FROM documents),
       |pr AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b,
       |    CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS inter,
       |    CAST(len(list_distinct(x.sh || y.sh)) AS BIGINT) AS uni
       |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id)
       |SELECT a, b, (1000000 * inter) // uni AS j_x1e6
       |FROM pr WHERE inter > 0 AND (1000000 * inter) // uni >= 500000
       |ORDER BY a, b""".stripMargin

  /** Resharding-movement audit: when a 16-shard corpus layout grows to
    * 17 shards, how many documents move under mod-hash placement vs a
    * consistent-hash ring (Karger et al., public literature)? Mod
    * placement remaps ~16/17 of the corpus (every doc whose
    * h mod 16 ≠ h mod 17); the ring — 4 virtual nodes per shard at
    * deterministic hash positions, doc owned by its clockwise
    * successor vnode — moves only the docs the NEW shard's vnodes
    * capture (~1/17). At 100 TB this is the difference between
    * rewriting the corpus on every capacity change and rewriting one
    * shard's worth; the audit MEASURES it on the live corpus instead
    * of asserting it. Everything is integer hashing on pinned
    * constants; the vnode argmin is a 68-row broadcast cross join per
    * doc, one pass, no shuffle beyond the final 1-row aggregate.
    */
  def reshardAudit(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(expr("(doc_id * 2654435761) % 4294967296").as("h"))
    def vnodes(nShards: Int) = (0 until nShards).flatMap { sh =>
      (0 until 4).map(v =>
        (sh.toLong, (sh.toLong * 73856093L + v * 19349663L) % 4294967296L))
    }
    def ringAssign(n: Int, outCol: String)(df: DataFrame): DataFrame = {
      val vn = vnodes(n).map { case (sh, pos) =>
        struct(lit(sh).as("sh"), lit(pos).as("pos"))
      }
      // clockwise successor: min (pos - h) mod 2^32 over all vnodes —
      // min_by on the (distance, pos) pair so coincident vnodes break
      // ties identically in both engines
      df.withColumn("vn", explode(array(vn: _*)))
        .groupBy(col("h"))
        .agg(min_by(col("vn.sh"),
          struct(expr("(vn.pos - h + 4294967296) % 4294967296").as("dist"),
            col("vn.pos").as("pos"))).as(outCol))
    }
    val r16 = ringAssign(16, "ring16")(docs)
    val r17 = ringAssign(17, "ring17")(docs)
    docs
      .join(r16, Seq("h")).join(r17, Seq("h"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(expr("h % 16 <> h % 17"), 1L).otherwise(0L))
          .cast("long").as("moved_mod"),
        sum(when(col("ring16") =!= col("ring17"), 1L).otherwise(0L))
          .cast("long").as("moved_ring"))
      .withColumn("moved_mod_x1e6", expr("(moved_mod * 1000000) div n_docs"))
      .withColumn("moved_ring_x1e6", expr("(moved_ring * 1000000) div n_docs"))
  }

  val oracles: Map[String, String] = Map(
    "ann_filtered" ->
      s"""WITH en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
         |e AS (SELECT vec_id, embedding FROM embeddings
         |      WHERE vec_id IN (SELECT doc_id FROM en)),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM e WHERE vec_id % 97 = 0),
         |sc AS (
         |  SELECT q.q_id, e.vec_id,
         |    CAST(floor(${Similarity.cosineSql("q.q_emb", "e.embedding")} * 1e6) AS BIGINT) AS cos_x1e6
         |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
         |rk AS (
         |  SELECT q_id, vec_id, cos_x1e6,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_x1e6 DESC, vec_id) AS INT) AS rk
         |  FROM sc)
         |SELECT q_id, rk, vec_id, cos_x1e6 FROM rk WHERE rk <= 10
         |ORDER BY q_id, rk""".stripMargin,

    "pipe_token_budget" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    greatest(CAST(len(${TextFunctions.rawTokensSql("text")}) AS BIGINT), 1) AS n_tok,
         |    CAST(len(list_distinct(${TextFunctions.rawTokensSql("text")})) AS BIGINT) AS n_uniq
         |  FROM documents),
         |p AS (SELECT *, (10000 * n_uniq) // n_tok AS prio FROM t),
         |c AS (SELECT *,
         |        sum(n_tok) OVER (PARTITION BY lang ORDER BY prio DESC, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
         |      FROM p)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS tokens_total,
         |  CAST(sum(CASE WHEN cum_tok <= 2500 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN cum_tok <= 2500 THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_kept,
         |  (CAST(sum(CASE WHEN cum_tok <= 2500 THEN n_tok ELSE 0 END) AS BIGINT)
         |    * 1000000) // 2500 AS util_ppm
         |FROM c GROUP BY lang ORDER BY lang""".stripMargin,

    "pipe_dataset_diff" ->
      s"""WITH v1 AS (
         |  SELECT doc_id, lang, n_chars AS bytes1,
         |    ${TextFunctions.fingerprintSql("text")} AS fp1
         |  FROM documents WHERE doc_id % 11 != 3),
         |v2 AS (
         |  SELECT doc_id, lang AS lang2, n_chars AS bytes2,
         |    CASE WHEN doc_id % 7 = 2
         |      THEN ${TextFunctions.fingerprintSql("text || ' v2'")}
         |      ELSE ${TextFunctions.fingerprintSql("text")} END AS fp2
         |  FROM documents WHERE doc_id % 13 != 5),
         |j AS (
         |  SELECT COALESCE(v1.lang, v2.lang2) AS lang,
         |    CASE WHEN fp1 IS NULL THEN 'added'
         |         WHEN fp2 IS NULL THEN 'removed'
         |         WHEN fp1 != fp2 THEN 'changed'
         |         ELSE 'unchanged' END AS status,
         |    COALESCE(bytes2, bytes1) AS bytes
         |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
         |SELECT lang, status, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(bytes) AS BIGINT) AS bytes
         |FROM j GROUP BY lang, status ORDER BY lang, status""".stripMargin,

    "pipe_reshard" -> {
      def vnodesSql(n: Int) = (0 until n).flatMap { sh =>
        (0 until 4).map(v =>
          s"(${sh}, ${(sh.toLong * 73856093L + v * 19349663L) % 4294967296L})")
      }.mkString(", ")
      s"""WITH docs AS (
         |  SELECT (doc_id * 2654435761) % 4294967296 AS h FROM documents),
         |v16 AS (SELECT * FROM (VALUES ${vnodesSql(16)}) t(sh, pos)),
         |v17 AS (SELECT * FROM (VALUES ${vnodesSql(17)}) t(sh, pos)),
         |r16 AS (SELECT d.h, arg_min(v.sh,
         |          CAST((v.pos - d.h + 4294967296) % 4294967296 AS HUGEINT) * 4294967296 + v.pos) AS ring16
         |        FROM docs d CROSS JOIN v16 v GROUP BY d.h),
         |r17 AS (SELECT d.h, arg_min(v.sh,
         |          CAST((v.pos - d.h + 4294967296) % 4294967296 AS HUGEINT) * 4294967296 + v.pos) AS ring17
         |        FROM docs d CROSS JOIN v17 v GROUP BY d.h),
         |j AS (SELECT d.h, r16.ring16, r17.ring17
         |      FROM docs d JOIN r16 ON r16.h = d.h JOIN r17 ON r17.h = d.h)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN h % 16 <> h % 17 THEN 1 ELSE 0 END) AS BIGINT) AS moved_mod,
         |  CAST(sum(CASE WHEN ring16 <> ring17 THEN 1 ELSE 0 END) AS BIGINT) AS moved_ring,
         |  CAST(sum(CASE WHEN h % 16 <> h % 17 THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS moved_mod_x1e6,
         |  CAST(sum(CASE WHEN ring16 <> ring17 THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS moved_ring_x1e6
         |FROM j""".stripMargin
    },
    "pipe_perplexity_bucket" -> {
      val tk = TextFunctions.rawTokensSql("text")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($tk) AS t FROM documents),
         |tf AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY t),
         |n AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM tf),
         |bits AS (SELECT t,
         |    CAST(length(bin(n_total // c)) - 1 AS BIGINT) AS bits
         |  FROM tf CROSS JOIN n),
         |pd AS (
         |  SELECT toks.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         |    CAST(sum(b.bits) AS BIGINT) AS bits_total
         |  FROM toks JOIN bits b ON b.t = toks.t
         |  GROUP BY toks.doc_id),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total_docs FROM pd)
         |SELECT ((bits_total * 100) // n_tok) // 100 AS bits_bucket,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  CAST(sum(bits_total) AS BIGINT) AS bits_total,
         |  CAST(count(*) * 10000 // max(total_docs) AS BIGINT) AS doc_share_x1e4
         |FROM pd CROSS JOIN tot
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "pipe_tokenizer_fertility" -> {
      val ws = TextFunctions.wsTokensSql("text")
      val bpe = TextFunctions.bpeCountSql("text")
      s"""WITH c AS (
         |  SELECT lang, CAST(len($ws) AS BIGINT) AS ws, $bpe AS bpe,
         |    CAST(length(text) AS BIGINT) AS chars
         |  FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(ws) AS BIGINT) AS n_words,
         |  CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens,
         |  CAST(sum(chars) AS BIGINT) AS n_chars,
         |  CAST(sum(bpe) * 10000 // sum(ws) AS BIGINT) AS fertility_x1e4,
         |  CAST(sum(bpe) * 10000 // sum(chars) AS BIGINT) AS tokens_per_100chars_x100
         |FROM c GROUP BY lang ORDER BY lang""".stripMargin
    },

    "pipe_shard_skew" -> {
      val vnodesSql = (0 until 16).flatMap { sh =>
        (0 until 4).map(v =>
          s"(${sh}, ${(sh.toLong * 73856093L + v * 19349663L) % 4294967296L})")
      }.mkString(", ")
      s"""WITH docs AS (
         |  SELECT n_chars, (doc_id * 2654435761) % 4294967296 AS h FROM documents),
         |vn AS (SELECT * FROM (VALUES $vnodesSql) t(sh, pos)),
         |asg AS (SELECT d.h, d.n_chars, arg_min(v.sh,
         |          CAST((v.pos - d.h + 4294967296) % 4294967296 AS HUGEINT) * 4294967296 + v.pos) AS shard
         |        FROM docs d CROSS JOIN vn v GROUP BY d.h, d.n_chars),
         |per AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |          CAST(sum(n_chars) AS BIGINT) AS bytes
         |        FROM asg GROUP BY shard),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot_docs,
         |          CAST(sum(bytes) AS BIGINT) AS tot_bytes,
         |          CAST(max(bytes) AS BIGINT) AS max_bytes,
         |          CAST(count(*) AS BIGINT) AS n_shards
         |        FROM per)
         |SELECT CAST(shard AS BIGINT) AS shard, n_docs, bytes,
         |  CAST((bytes * 10000) // tot_bytes AS BIGINT) AS byte_share_x1e4,
         |  CAST((n_docs * 10000) // tot_docs AS BIGINT) AS doc_share_x1e4,
         |  CAST((max_bytes * n_shards * 10000) // tot_bytes AS BIGINT) AS skew_x1e4
         |FROM per CROSS JOIN tot ORDER BY shard""".stripMargin
    },

    "pipe_dedup_rate_by_source" ->
      s"""WITH fp AS (
         |  SELECT doc_id, source, $fpNorm AS fp FROM documents),
         |cl AS (
         |  SELECT doc_id, source,
         |    count(*) OVER (PARTITION BY fp) AS cluster_size,
         |    min(doc_id) OVER (PARTITION BY fp) AS rep
         |  FROM fp)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_in_dup_clusters,
         |  CAST(sum(CASE WHEN rep = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_survivors,
         |  CAST(sum(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END) * 10000
         |    // count(*) AS BIGINT) AS dup_rate_x1e4
         |FROM cl GROUP BY source ORDER BY source""".stripMargin,

    "dedup_exact" ->
      s"""SELECT doc_id, $fpNorm AS fp_norm,
         |  min(doc_id) OVER (PARTITION BY $fpNorm) AS cluster_id,
         |  count(*) OVER (PARTITION BY $fpNorm) AS cluster_size
         |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_exact_keep" ->
      s"""SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, fp_norm,
         |  CAST(count(*) AS BIGINT) AS n_dups
         |FROM (SELECT doc_id, $fpNorm AS fp_norm FROM documents)
         |GROUP BY fp_norm ORDER BY doc_id""".stripMargin,

    "dedup_levenshtein" -> {
      val norm = TextFunctions.normalizedSql("text")
      s"""WITH n AS (SELECT doc_id, $norm AS nt FROM documents),
         |b AS (SELECT doc_id, nt, CAST(length(nt) AS BIGINT) AS len,
         |        split_part(nt, ' ', 1) AS tok0, length(nt) // 16 AS lb
         |      FROM n WHERE length(nt) > 0),
         |p AS (SELECT a.doc_id AS doc_id_a, b2.doc_id AS doc_id_b,
         |        CAST(levenshtein(a.nt, b2.nt) AS BIGINT) AS lev,
         |        greatest(a.len, b2.len) AS max_len
         |      FROM b a JOIN b b2 ON a.tok0 = b2.tok0 AND a.lb = b2.lb
         |        AND a.doc_id < b2.doc_id AND abs(a.len - b2.len) <= 20)
         |SELECT doc_id_a, doc_id_b, lev, max_len,
         |  (lev * 100) // max_len AS lev_ratio_x100
         |FROM p WHERE lev <= 20 AND lev * 100 <= 20 * max_len
         |ORDER BY doc_id_a, doc_id_b""".stripMargin
    },

    "dedup_containment" -> bruteContainment,

    "dedup_containment_minhash" -> Dedup.containmentMinhashOracleSql(),
    "dedup_ngram_jaccard" -> bruteJaccard,
    "dedup_minhash_lsh" -> bruteJaccard,

    "dedup_lsh_sweep" -> Dedup.lshSweepOracleSql,

    "pipe_interleave" ->
      s"""WITH bs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |           FROM documents GROUP BY source),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
         |               CAST(count(*) AS BIGINT) AS n_sources FROM bs),
         |w AS (SELECT source, (1000000 * n_total) // (n_sources * n_docs) AS weight_x1e6
         |      FROM bs CROSS JOIN tot),
         |r AS (SELECT source, doc_id, (doc_id * 2654435761) % 4294967296 AS hkey,
         |        CAST(row_number() OVER (
         |          PARTITION BY source
         |          ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS BIGINT) AS rk
         |      FROM documents),
         |v AS (SELECT r.source, r.doc_id, r.rk,
         |        CAST((CAST(r.rk AS HUGEINT) * 1000000) // w.weight_x1e6 AS BIGINT) AS vt
         |      FROM r JOIN w USING (source)),
         |top AS (SELECT * FROM v ORDER BY vt, source, doc_id LIMIT 200)
         |SELECT CAST(row_number() OVER (ORDER BY vt, source, doc_id) AS INT) AS pos,
         |       source, doc_id, rk, vt
         |FROM top ORDER BY pos""".stripMargin,

    "pipe_dedup_eval" ->
      s"""WITH sh AS (SELECT doc_id, $shingleE AS sh FROM documents),
         |pr AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b,
         |    CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS inter,
         |    CAST(len(list_distinct(x.sh || y.sh)) AS BIGINT) AS uni
         |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id),
         |tr AS (SELECT a, b FROM pr
         |       WHERE inter > 0 AND (1000000 * inter) // uni >= 500000),
         |sig AS (
         |  SELECT doc_id, ${Dedup.simhashSignatureSql(graft.search.Analyzer.tokensSql("text"))} AS sig
         |  FROM documents),
         |pd AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b
         |  FROM sig x JOIN sig y ON x.doc_id < y.doc_id
         |  WHERE bit_count(xor(x.sig, y.sig)) <= 3),
         |j AS (
         |  SELECT COALESCE(t.a, p.a) AS a, COALESCE(t.b, p.b) AS b,
         |    t.a IS NOT NULL AS is_t, p.a IS NOT NULL AS is_p
         |  FROM tr t FULL OUTER JOIN pd p ON t.a = p.a AND t.b = p.b)
         |SELECT
         |  CAST(count(*) FILTER (is_t) AS BIGINT) AS n_truth,
         |  CAST(count(*) FILTER (is_p) AS BIGINT) AS n_pred,
         |  CAST(count(*) FILTER (is_t AND is_p) AS BIGINT) AS tp,
         |  CAST(count(*) FILTER (NOT is_t AND is_p) AS BIGINT) AS fp,
         |  CAST(count(*) FILTER (is_t AND NOT is_p) AS BIGINT) AS fn,
         |  (CAST(count(*) FILTER (is_t AND is_p) AS BIGINT) * 1000000)
         |    // NULLIF(CAST(count(*) FILTER (is_p) AS BIGINT), 0) AS precision_x1e6,
         |  (CAST(count(*) FILTER (is_t AND is_p) AS BIGINT) * 1000000)
         |    // NULLIF(CAST(count(*) FILTER (is_t) AS BIGINT), 0) AS recall_x1e6
         |FROM j""".stripMargin,

    "pipe_dedup_corpus" ->
      s"""WITH RECURSIVE q AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text,
         |      CAST(len(${TextFunctions.rawTokensSql("text")}) AS BIGINT) AS n_tok,
         |      CAST(len(list_filter(${TextFunctions.rawTokensSql("text")},
         |        x -> list_contains(${graft.search.Analyzer.stopwordsSql}, x))) AS BIGINT) AS n_stop,
         |      CAST(len(list_distinct(${TextFunctions.rawTokensSql("text")})) AS BIGINT) AS n_uniq
         |    FROM documents)
         |  WHERE n_tok >= 10 AND (10000 * n_stop) // n_tok < 4000
         |    AND (10000 * n_uniq) // n_tok > 2500),
         |sh AS (SELECT doc_id, $shingleE AS sh FROM q),
         |pr AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b
         |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id
         |  WHERE len(list_intersect(x.sh, y.sh)) > 0
         |    AND (1000000 * CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT))
         |        // CAST(len(list_distinct(x.sh || y.sh)) AS BIGINT) >= 500000),
         |sym AS (SELECT a AS x, b AS y FROM pr UNION ALL SELECT b, a FROM pr),
         |reach(x, y) AS (
         |  SELECT x, y FROM sym
         |  UNION
         |  SELECT r.x, s.y FROM reach r JOIN sym s ON r.y = s.x),
         |lab AS (
         |  SELECT d.doc_id,
         |    LEAST(d.doc_id, COALESCE(MIN(r.y), d.doc_id)) AS cluster_id
         |  FROM q d LEFT JOIN reach r ON r.x = d.doc_id
         |  GROUP BY d.doc_id)
         |SELECT doc_id, cluster_size FROM (
         |  SELECT doc_id, cluster_id,
         |    count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |  FROM lab)
         |WHERE doc_id = cluster_id ORDER BY doc_id""".stripMargin,

    "pipe_dedup_incremental" ->
      s"""WITH sh AS (SELECT doc_id, $shingleE AS sh FROM documents),
         |nw AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
         |cp AS (SELECT * FROM sh WHERE doc_id % 10 <> 0),
         |pr AS (
         |  SELECT n.doc_id AS a,
         |    (1000000 * CAST(len(list_intersect(n.sh, c.sh)) AS BIGINT))
         |      // CAST(len(list_distinct(n.sh || c.sh)) AS BIGINT) AS j
         |  FROM nw n CROSS JOIN cp c
         |  WHERE len(list_intersect(n.sh, c.sh)) > 0)
         |SELECT a AS doc_id, CAST(count(*) AS BIGINT) AS n_dup_of,
         |  max(j) AS max_j_x1e6
         |FROM pr WHERE j >= 500000 GROUP BY a ORDER BY doc_id""".stripMargin,

    "ann_kmeans_step" ->
      """WITH q AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xi,
        |    CAST(vec_id % 10 AS INT) AS cid0 FROM embeddings),
        |sums AS (
        |  SELECT cid0, CAST(t.i AS INT) AS dim,
        |    CAST(sum(xi[CAST(t.i AS INT) + 1]) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS nd
        |  FROM q CROSS JOIN range(0, 64) t(i) GROUP BY cid0, t.i),
        |cent AS (
        |  SELECT cid0 AS cid, CAST(max(nd) AS BIGINT) AS n_init,
        |    list(s // nd ORDER BY dim) AS c
        |  FROM sums GROUP BY cid0),
        |asn AS (
        |  SELECT q.vec_id, q.cid0,
        |    min(CAST(list_sum(list_transform(range(1, 65),
        |      d -> (q.xi[d] - c.c[d]) * (q.xi[d] - c.c[d]))) AS HUGEINT) * 16 + c.cid) AS key
        |  FROM q CROSS JOIN cent c GROUP BY q.vec_id, q.cid0),
        |a2 AS (SELECT vec_id, cid0, CAST(key % 16 AS INT) AS cid1, key // 16 AS d2 FROM asn),
        |roll AS (
        |  SELECT cid1 AS cid, CAST(count(*) AS BIGINT) AS n_after,
        |    CAST(sum(CASE WHEN cid1 <> cid0 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_in,
        |    sum(d2) AS inertia
        |  FROM a2 GROUP BY cid1)
        |SELECT c.cid, c.n_init,
        |  CAST(COALESCE(r.n_after, 0) AS BIGINT) AS n_after,
        |  CAST(COALESCE(r.n_moved_in, 0) AS BIGINT) AS n_moved_in,
        |  CAST(COALESCE(r.inertia // r.n_after, 0) AS BIGINT) AS mean_d2
        |FROM cent c LEFT JOIN roll r ON r.cid = c.cid ORDER BY c.cid""".stripMargin,

    "ann_dim_stats" ->
      """WITH x AS (
        |  SELECT CAST(t.i AS INT) AS dim,
        |    CAST(floor(CAST(embedding[CAST(t.i AS INT) + 1] AS DOUBLE) * 1000000) AS BIGINT) AS v
        |  FROM embeddings CROSS JOIN range(0, 64) t(i)),
        |g AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(v) AS BIGINT) AS sum_x1e6,
        |        sum(CAST(v AS HUGEINT) * v) AS ssq
        |      FROM x GROUP BY dim)
        |SELECT dim, n, sum_x1e6,
        |  abs(sum_x1e6) // n AS mean_abs_x1e6,
        |  CAST(CASE WHEN sum_x1e6 < 0 THEN -1 WHEN sum_x1e6 > 0 THEN 1 ELSE 0 END AS INT) AS mean_sign,
        |  CAST((n * ssq - CAST(sum_x1e6 AS HUGEINT) * sum_x1e6)
        |    // (CAST(n AS HUGEINT) * n) AS BIGINT) AS var_x1e12
        |FROM g ORDER BY dim""".stripMargin,

    "ann_outlier_dist" ->
      """WITH q AS (SELECT vec_id, CAST(label AS INT) AS label,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xi
        |  FROM embeddings),
        |sums AS (SELECT label, CAST(t.i AS INT) AS dim,
        |    CAST(sum(xi[CAST(t.i AS INT) + 1]) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS nd
        |  FROM q CROSS JOIN range(0, 64) t(i) GROUP BY label, t.i),
        |cent AS (SELECT label, list(s // nd ORDER BY dim) AS c FROM sums GROUP BY label)
        |SELECT q.vec_id, q.label,
        |  CAST(list_sum(list_transform(range(1, 65),
        |    d -> (q.xi[d] - c.c[d]) * (q.xi[d] - c.c[d]))) AS BIGINT) AS d2
        |FROM q JOIN cent c ON c.label = q.label
        |ORDER BY d2 DESC, vec_id LIMIT 20""".stripMargin,

    "ann_centroid" ->
      s"""WITH x AS (
         |  SELECT CAST(label AS INT) AS label, CAST(t.i AS INT) AS dim,
         |    CAST(floor(CAST(embedding[CAST(t.i AS INT) + 1] AS DOUBLE) * 1000000) AS BIGINT) AS v
         |  FROM embeddings CROSS JOIN range(0, 64) t(i))
         |SELECT label, dim, CAST(sum(v) AS BIGINT) AS sum_x1e6,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM x GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    // session_window semantics: a gap of EXACTLY 30 min starts a new
    // session (windows [t, t+gap) merge on overlap only); end = last+gap
    "stream_session_window" ->
      s"""WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, value FROM events),
         |lagged AS (
         |  SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_ts
         |  FROM ev),
         |marked AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL OR ts_us - prev_ts >= ${30 * 60L * 1000000L}
         |                 THEN 1 ELSE 0 END AS new_sess
         |  FROM lagged),
         |numbered AS (
         |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_no
         |  FROM marked)
         |SELECT user_id,
         |  CAST(min(ts_us) AS BIGINT) AS start_us,
         |  CAST(max(ts_us) + ${30 * 60L * 1000000L} AS BIGINT) AS end_us,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM numbered GROUP BY user_id, sess_no
         |ORDER BY user_id, start_us""".stripMargin,

    "stream_latest_state" ->
      s"""WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
         |           FROM events),
         |rk AS (SELECT *, row_number() OVER (
         |         PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rk
         |       FROM ev),
         |agg AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |        FROM ev GROUP BY user_id)
         |SELECT r.user_id, r.ts_us AS last_ts_us, r.event_id AS last_event_id,
         |  r.event_type AS last_type, r.value AS last_value,
         |  a.n_events, a.sum_value
         |FROM rk r JOIN agg a ON r.user_id = a.user_id WHERE r.rk = 1
         |ORDER BY r.user_id""".stripMargin,

    "stream_rate_limit" -> {
      val p = EventStreams.RateLimitPeriodUs
      val cap = EventStreams.RateLimitBurst * p
      val newcr = s"least(CAST($cap AS BIGINT), st.cr + CASE WHEN st.pt < 0 THEN 0 ELSE e.ts_us - st.pt END)"
      s"""WITH RECURSIVE ev AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(ts), event_id) AS i
         |  FROM events),
         |mx AS (SELECT user_id, max(i) AS m FROM ev GROUP BY 1),
         |st AS (
         |  SELECT user_id, CAST(0 AS BIGINT) AS i, CAST(-1 AS BIGINT) AS pt,
         |    CAST($cap AS BIGINT) AS cr,
         |    CAST(0 AS BIGINT) AS na, CAST(0 AS BIGINT) AS nd
         |  FROM mx
         |  UNION ALL
         |  SELECT st.user_id, st.i + 1, e.ts_us,
         |    CASE WHEN $newcr >= $p THEN $newcr - $p ELSE $newcr END,
         |    st.na + CASE WHEN $newcr >= $p THEN 1 ELSE 0 END,
         |    st.nd + CASE WHEN $newcr < $p THEN 1 ELSE 0 END
         |  FROM st JOIN ev e ON e.user_id = st.user_id AND e.i = st.i + 1)
         |SELECT st.user_id, mx.m AS n_events, st.na AS n_allowed,
         |  st.nd AS n_denied,
         |  (st.na * 1000000) // (st.na + st.nd) AS allow_ppm
         |FROM st JOIN mx ON mx.user_id = st.user_id AND st.i = mx.m
         |ORDER BY st.user_id""".stripMargin
    },

    "stream_rate_limit_ttl" -> {
      val p = EventStreams.RateLimitPeriodUs
      val cap = EventStreams.RateLimitBurst * p
      val h = EventStreams.RateLimitHorizonUs
      val newcr = s"least(CAST($cap AS BIGINT), st.cr + CASE WHEN st.pt < 0 THEN 0 ELSE e.ts_us - st.pt END)"
      s"""WITH RECURSIVE ev0 AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
         |sb AS (SELECT *, CASE WHEN ts_us - lag(ts_us) OVER (
         |         PARTITION BY user_id ORDER BY ts_us, event_id)
         |         > $h THEN 1 ELSE 0 END AS brk
         |       FROM ev0),
         |ss AS (SELECT *, sum(brk) OVER (
         |         PARTITION BY user_id ORDER BY ts_us, event_id) AS sess
         |       FROM sb),
         |mxs AS (SELECT *, max(sess) OVER (PARTITION BY user_id) AS m FROM ss),
         |ev AS (SELECT user_id, ts_us, event_id,
         |         row_number() OVER (PARTITION BY user_id
         |           ORDER BY ts_us, event_id) AS i
         |       FROM mxs WHERE sess = m),
         |mx AS (SELECT user_id, max(i) AS m FROM ev GROUP BY 1),
         |st AS (
         |  SELECT user_id, CAST(0 AS BIGINT) AS i, CAST(-1 AS BIGINT) AS pt,
         |    CAST($cap AS BIGINT) AS cr,
         |    CAST(0 AS BIGINT) AS na, CAST(0 AS BIGINT) AS nd
         |  FROM mx
         |  UNION ALL
         |  SELECT st.user_id, st.i + 1, e.ts_us,
         |    CASE WHEN $newcr >= $p THEN $newcr - $p ELSE $newcr END,
         |    st.na + CASE WHEN $newcr >= $p THEN 1 ELSE 0 END,
         |    st.nd + CASE WHEN $newcr < $p THEN 1 ELSE 0 END
         |  FROM st JOIN ev e ON e.user_id = st.user_id AND e.i = st.i + 1)
         |SELECT st.user_id, st.pt AS last_ts_us, mx.m AS n_events,
         |  st.na AS n_allowed, st.nd AS n_denied,
         |  (st.na * 1000000) // (st.na + st.nd) AS allow_ppm
         |FROM st JOIN mx ON mx.user_id = st.user_id AND st.i = mx.m
         |ORDER BY st.user_id""".stripMargin
    },

    "stream_cdc_compact" ->
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
         |            FROM events),
         |sb AS (SELECT *, CASE WHEN ts_us - lag(ts_us) OVER (
         |         PARTITION BY user_id ORDER BY ts_us, event_id)
         |         > ${EventStreams.StateTtlUs} THEN 1 ELSE 0 END AS brk
         |       FROM ev),
         |ss AS (SELECT *, sum(brk) OVER (
         |         PARTITION BY user_id ORDER BY ts_us, event_id) AS seg
         |       FROM sb),
         |srk AS (SELECT *, row_number() OVER (PARTITION BY user_id, seg
         |          ORDER BY ts_us DESC, event_id DESC) AS rk
         |        FROM ss),
         |scnt AS (SELECT user_id, seg,
         |           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         |             AS n_deletes,
         |           CAST(sum(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END) AS BIGINT)
         |             AS n_upserts
         |         FROM ss GROUP BY 1, 2),
         |sink AS (SELECT r.user_id, r.seg, r.ts_us, r.event_id, r.event_type,
         |           c.n_upserts, c.n_deletes
         |         FROM srk r JOIN scnt c ON c.user_id = r.user_id AND c.seg = r.seg
         |         WHERE r.rk = 1),
         |urk AS (SELECT *, row_number() OVER (PARTITION BY user_id
         |          ORDER BY ts_us DESC, event_id DESC) AS rk
         |        FROM sink),
         |uagg AS (SELECT user_id, CAST(sum(n_upserts) AS BIGINT) AS n_upserts,
         |           CAST(sum(n_deletes) AS BIGINT) AS n_deletes,
         |           CAST(count(*) AS BIGINT) AS n_segments
         |         FROM sink GROUP BY 1)
         |SELECT k.user_id, k.ts_us AS last_ts_us, k.event_id AS last_event_id,
         |  CAST(CASE WHEN k.event_type = 'error' THEN 0 ELSE 1 END AS INT) AS is_live,
         |  a.n_upserts, a.n_deletes, a.n_segments
         |FROM urk k JOIN uagg a ON a.user_id = k.user_id WHERE k.rk = 1
         |ORDER BY k.user_id""".stripMargin,

    "stream_latest_state_ttl" ->
      s"""WITH ev0 AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
         |            FROM events),
         |sb AS (SELECT *, CASE WHEN ts_us - lag(ts_us) OVER (
         |         PARTITION BY user_id ORDER BY ts_us, event_id)
         |         > ${EventStreams.StateTtlUs} THEN 1 ELSE 0 END AS brk
         |       FROM ev0),
         |ss AS (SELECT *, sum(brk) OVER (
         |         PARTITION BY user_id ORDER BY ts_us, event_id) AS sess
         |       FROM sb),
         |mxs AS (SELECT *, max(sess) OVER (PARTITION BY user_id) AS m FROM ss),
         |ev AS (SELECT event_id, ts_us, user_id, event_type, value
         |       FROM mxs WHERE sess = m),
         |rk AS (SELECT *, row_number() OVER (
         |         PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rk
         |       FROM ev),
         |agg AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |        FROM ev GROUP BY user_id)
         |SELECT r.user_id, r.ts_us AS last_ts_us, r.event_id AS last_event_id,
         |  r.event_type AS last_type, r.value AS last_value,
         |  a.n_events, a.sum_value
         |FROM rk r JOIN agg a ON r.user_id = a.user_id WHERE r.rk = 1
         |ORDER BY r.user_id""".stripMargin,

    "stream_seq_pairs_ttl" ->
      s"""WITH ev0 AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
         |            FROM events),
         |sb AS (SELECT *, CASE WHEN ts_us - lag(ts_us) OVER (
         |         PARTITION BY user_id ORDER BY ts_us, event_id)
         |         > ${EventStreams.StateTtlUs} THEN 1 ELSE 0 END AS brk
         |       FROM ev0),
         |ss AS (SELECT *, sum(brk) OVER (
         |         PARTITION BY user_id ORDER BY ts_us, event_id) AS sess
         |       FROM sb),
         |mxs AS (SELECT *, max(sess) OVER (PARTITION BY user_id) AS m FROM ss),
         |ev AS (SELECT user_id, ts_us, event_id, event_type
         |       FROM mxs WHERE sess = m),
         |f AS (
         |  SELECT user_id, event_type, ts_us AS fts, event_id AS fid FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY user_id, event_type ORDER BY ts_us, event_id) AS rn
         |    FROM ev) WHERE rn = 1)
         |SELECT x.event_type AS type_a, y.event_type AS type_b,
         |  CAST(count(*) AS BIGINT) AS support
         |FROM f x JOIN f y ON y.user_id = x.user_id
         |  AND x.event_type <> y.event_type
         |  AND (x.fts < y.fts OR (x.fts = y.fts AND x.fid < y.fid))
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "stream_seq_pairs" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
        |f AS (
        |  SELECT user_id, event_type, ts_us AS fts, event_id AS fid FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY user_id, event_type ORDER BY ts_us, event_id) AS rn
        |    FROM ev) WHERE rn = 1)
        |SELECT x.event_type AS type_a, y.event_type AS type_b,
        |  CAST(count(*) AS BIGINT) AS support
        |FROM f x JOIN f y ON y.user_id = x.user_id
        |  AND x.event_type <> y.event_type
        |  AND (x.fts < y.fts OR (x.fts = y.fts AND x.fid < y.fid))
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "stream_kmv_uniques" ->
      s"""WITH h AS (SELECT event_type,
         |             (user_id * 2654435761) % 4294967296 AS h FROM events),
         |d AS (SELECT DISTINCT event_type, h FROM h),
         |r AS (SELECT event_type, h,
         |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk,
         |        count(*) OVER (PARTITION BY event_type) AS nd
         |      FROM d),
         |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
         |      FROM h GROUP BY 1),
         |est AS (SELECT event_type, CAST(max(nd) AS BIGINT) AS nd,
         |          CAST(max(CASE WHEN rk = 64 THEN h END) AS BIGINT) AS h64
         |        FROM r GROUP BY event_type)
         |SELECT n.event_type, n.n_events,
         |  CAST(least(est.nd, 64) AS BIGINT) AS sketch_size,
         |  CAST(CASE WHEN est.nd < 64 THEN est.nd
         |       ELSE (63 * 4294967296) // greatest(est.h64, 1) END AS BIGINT)
         |    AS est_distinct_users
         |FROM n JOIN est USING (event_type) ORDER BY n.event_type""".stripMargin,

    "stream_cdc_tombstone" ->
      s"""WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type
         |            FROM events),
         |rk AS (SELECT *, row_number() OVER (
         |         PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rk
         |       FROM ev),
         |agg AS (SELECT user_id,
         |          CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         |            AS n_deletes,
         |          CAST(sum(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END) AS BIGINT)
         |            AS n_upserts
         |        FROM ev GROUP BY user_id)
         |SELECT r.user_id, r.ts_us AS last_ts_us, r.event_id AS last_event_id,
         |  CAST(CASE WHEN r.event_type = 'error' THEN 0 ELSE 1 END AS INT) AS is_live,
         |  a.n_upserts, a.n_deletes
         |FROM rk r JOIN agg a ON r.user_id = a.user_id WHERE r.rk = 1
         |ORDER BY r.user_id""".stripMargin,

    "stream_attribution" ->
      s"""WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type FROM events),
         |c AS (SELECT user_id, ts_us AS c_ts_us, event_id AS c_id FROM ev WHERE event_type = 'click'),
         |p AS (SELECT event_id AS purchase_id, user_id, ts_us AS p_ts_us FROM ev WHERE event_type = 'purchase')
         |SELECT p.purchase_id, p.user_id, p.p_ts_us,
         |  CAST(count(c.c_id) AS BIGINT) AS n_clicks_1h,
         |  max(c.c_ts_us) AS last_click_us
         |FROM p LEFT JOIN c ON c.user_id = p.user_id
         |  AND c.c_ts_us >= p.p_ts_us - 3600000000 AND c.c_ts_us <= p.p_ts_us
         |GROUP BY p.purchase_id, p.user_id, p.p_ts_us
         |ORDER BY p.purchase_id""".stripMargin,

    "pipe_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, doc_id % 8 AS shard,
         |    CAST(len(${TextFunctions.rawTokensSql("text")}) AS BIGINT) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, shard, n_tok,
         |    CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum_end
         |  FROM t)
         |SELECT doc_id, shard, n_tok,
         |  (cum_end - n_tok) % 256 AS pack_offset,
         |  (cum_end - n_tok) // 256 AS pack_first,
         |  (cum_end - 1) // 256 AS pack_last
         |FROM c ORDER BY doc_id""".stripMargin,

    "pipe_contamination_bloom" -> {
      def ph(e: String, mult: Long, p: Long): String =
        s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          s"list_transform(string_split_regex($e, ''), c -> CAST(ascii(c) AS BIGINT))), " +
          s"(a, b) -> (a * $mult + b) % $p)"
      val hs = Seq((31L, 1000000007L), (37L, 998244353L), (41L, 1000000009L))
      val posSel = hs.map { case (m, p) => s"SELECT ${ph("sh", m, p)} % 65536 AS p FROM b" }
        .mkString("\n         UNION ALL ")
      val pCols = hs.zipWithIndex
        .map { case ((m, p), i) => s"    ${ph("sh", m, p)} % 65536 AS p$i" }.mkString(",\n")
      val joins = (0 until 3)
        .map(i => s"LEFT JOIN bloom b$i ON b$i.word = pr.p$i // 32").mkString(" ")
      val hitCond = (0 until 3)
        .map(i => s"COALESCE((b$i.mask >> CAST(pr.p$i % 32 AS INT)) & 1, 0) = 1")
        .mkString(" AND ")
      s"""WITH sh AS (SELECT doc_id, unnest($shingleE) AS sh FROM documents),
         |b AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
         |pos AS (SELECT DISTINCT p FROM (
         |  $posSel)),
         |bloom AS (
         |  SELECT p // 32 AS word,
         |    bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS mask
         |  FROM pos GROUP BY 1),
         |t AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0),
         |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM t GROUP BY doc_id),
         |pr AS (
         |  SELECT doc_id,
         |$pCols
         |  FROM t),
         |h AS (
         |  SELECT pr.doc_id,
         |    CASE WHEN $hitCond THEN 1 ELSE 0 END AS hit
         |  FROM pr $joins)
         |SELECT h.doc_id, n.n_sh, CAST(sum(h.hit) AS BIGINT) AS n_bloom_hit,
         |  (10000 * CAST(sum(h.hit) AS BIGINT)) // n.n_sh AS hit_bp
         |FROM h JOIN n ON h.doc_id = n.doc_id
         |GROUP BY h.doc_id, n.n_sh ORDER BY h.doc_id""".stripMargin
    },

    "pipe_contamination" ->
      s"""WITH sh AS (SELECT doc_id, unnest($shingleE) AS sh FROM documents),
         |b AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
         |t AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0),
         |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM t GROUP BY doc_id)
         |SELECT t.doc_id, n.n_sh, CAST(count(*) AS BIGINT) AS n_hit,
         |  (10000 * CAST(count(*) AS BIGINT)) // n.n_sh AS hit_bp
         |FROM t JOIN b ON t.sh = b.sh JOIN n ON t.doc_id = n.doc_id
         |GROUP BY t.doc_id, n.n_sh ORDER BY t.doc_id""".stripMargin,

    "q_multi_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // transitive closure of the verified near-dup pairs via a recursive
    // CTE; cluster id = min reachable doc (same fixpoint the Spark
    // min-label propagation converges to)
    "dedup_cluster" ->
      s"""$clusterCtes
         |SELECT doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM lab ORDER BY doc_id""".stripMargin,

    // the merge gate IS the scratch rebuild: the Spark side maintains the
    // existing-corpus assignment incrementally (contracted batch-sized
    // merge graph), the oracle reclusters the full union from zero —
    // hash-equality proves merge ≡ rebuild
    "pipe_cluster_merge" ->
      s"""$clusterCtes
         |SELECT doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM lab ORDER BY doc_id""".stripMargin,

    "pipe_length_curve" -> {
      val tk = graft.text.TextFunctions.rawTokensSql("text")
      s"""WITH d AS (SELECT CAST(len($tk) AS BIGINT) AS n_tok FROM documents),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM d),
         |taus AS (SELECT CAST(unnest([0, 20, 40, 60, 80]) AS BIGINT) AS min_tok),
         |k AS (
         |  SELECT min_tok, CAST(count(*) AS BIGINT) AS docs_kept,
         |    CAST(sum(n_tok) AS BIGINT) AS tokens_kept
         |  FROM taus JOIN d ON n_tok >= min_tok GROUP BY 1)
         |SELECT min_tok, docs_kept, tokens_kept,
         |  (docs_kept * 1000000) // t.n_docs AS docs_ppm,
         |  (tokens_kept * 1000000) // t.n_tokens AS tokens_ppm
         |FROM k CROSS JOIN t ORDER BY min_tok""".stripMargin
    },

    "pipe_dedup_bytes_saved" ->
      s"""$clusterCtes,
         |cs AS (
         |  SELECT doc_id, cluster_id,
         |    min(doc_id) OVER (PARTITION BY cluster_id) AS rep
         |  FROM lab)
         |SELECT d.source,
         |  CAST(sum(d.n_chars) AS BIGINT) AS bytes_total,
         |  CAST(sum(CASE WHEN rep <> cs.doc_id THEN d.n_chars ELSE 0 END) AS BIGINT)
         |    AS bytes_saved,
         |  CAST(sum(CASE WHEN rep <> cs.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_dropped,
         |  (CAST(sum(CASE WHEN rep <> cs.doc_id THEN d.n_chars ELSE 0 END) AS BIGINT)
         |   * 1000000) // CAST(sum(d.n_chars) AS BIGINT) AS saved_ppm
         |FROM cs JOIN documents d ON cs.doc_id = d.doc_id
         |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "pipe_near_dup_rate_by_source" ->
      s"""$clusterCtes,
         |cs AS (
         |  SELECT doc_id, cluster_id,
         |    count(*) OVER (PARTITION BY cluster_id) AS k,
         |    min(doc_id) OVER (PARTITION BY cluster_id) AS rep
         |  FROM lab)
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_dup_clusters,
         |  CAST(sum(CASE WHEN rep = cs.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
         |  (CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) * 10000)
         |    // CAST(count(*) AS BIGINT) AS dup_rate_x1e4
         |FROM cs JOIN documents d ON cs.doc_id = d.doc_id
         |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "pipe_cluster_reps" ->
      s"""$clusterCtes,
         |cs AS (
         |  SELECT doc_id, cluster_id,
         |    CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
         |  FROM lab),
         |u AS (
         |  SELECT doc_id,
         |    CAST(len(list_distinct(${graft.text.TextFunctions.rawTokensSql("text")})) AS BIGINT) AS uniq
         |  FROM documents),
         |r AS (
         |  SELECT cs.cluster_id, cs.cluster_size, cs.doc_id, u.uniq,
         |    row_number() OVER (PARTITION BY cs.cluster_id
         |                       ORDER BY u.uniq DESC, cs.doc_id) AS rn
         |  FROM cs JOIN u USING (doc_id) WHERE cs.cluster_size > 1)
         |SELECT cluster_id, cluster_size, doc_id AS rep_doc_id, uniq AS rep_uniq
         |FROM r WHERE rn = 1 ORDER BY cluster_id""".stripMargin,

    "pipe_dedup_threshold_curve" ->
      s"""WITH sh AS (SELECT doc_id, $shingleE AS sh FROM documents),
         |pr AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b,
         |    (1000000 * CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT))
         |      // CAST(len(list_distinct(x.sh || y.sh)) AS BIGINT) AS j_x1e6
         |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id
         |  WHERE len(list_intersect(x.sh, y.sh)) > 0),
         |taus AS (SELECT unnest([500000, 600000, 700000, 800000, 900000]) AS tau),
         |q AS (SELECT CAST(t.tau AS BIGINT) AS tau_x1e6, a, b
         |      FROM taus t JOIN pr ON j_x1e6 >= t.tau),
         |p AS (SELECT tau_x1e6, CAST(count(*) AS BIGINT) AS n_pairs FROM q GROUP BY 1),
         |dd AS (SELECT tau_x1e6, CAST(count(DISTINCT doc) AS BIGINT) AS n_docs FROM (
         |  SELECT tau_x1e6, a AS doc FROM q UNION ALL SELECT tau_x1e6, b FROM q)
         |  GROUP BY 1)
         |SELECT p.tau_x1e6, p.n_pairs, dd.n_docs
         |FROM p JOIN dd USING (tau_x1e6) ORDER BY tau_x1e6""".stripMargin,

    "pipe_dup_cluster_stats" ->
      s"""$clusterCtes,
         |cl AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS k
         |       FROM lab GROUP BY cluster_id),
         |t AS (SELECT CAST(sum(k) AS BIGINT) AS n_docs_total FROM cl)
         |SELECT k AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(sum(k) AS BIGINT) AS n_docs,
         |  CAST((sum(k) * 1000000) // max(t.n_docs_total) AS BIGINT) AS docs_ppm
         |FROM cl CROSS JOIN t GROUP BY k ORDER BY cluster_size""".stripMargin,

    "dedup_simhash" ->
      s"""WITH sig AS (
         |  SELECT doc_id, ${Dedup.simhashSignatureSql(graft.search.Analyzer.tokensSql("text"))} AS sig
         |  FROM documents)
         |SELECT x.doc_id AS a, y.doc_id AS b,
         |  CAST(bit_count(xor(x.sig, y.sig)) AS BIGINT) AS hamming
         |FROM sig x JOIN sig y ON x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.sig, y.sig)) <= ${Dedup.SimHamK}
         |ORDER BY a, b""".stripMargin,

    "dedup_span" -> {
      val fp = graft.text.TextFunctions
        .fingerprintSql("array_to_string(list_slice(tk, i, i + 7), '_')")
      s"""WITH t AS (
         |  SELECT doc_id, ${graft.text.TextFunctions.rawTokensSql("text")} AS tk
         |  FROM documents),
         |s AS (
         |  SELECT doc_id,
         |    greatest(CAST(len(tk) AS BIGINT) - 7, CAST(0 AS BIGINT)) AS n_spans,
         |    CASE WHEN len(tk) >= 8 THEN
         |      list_distinct(list_transform(range(1, len(tk) - 6), i -> $fp))
         |    ELSE CAST([] AS BIGINT[]) END AS hs
         |  FROM t),
         |ex AS (SELECT doc_id, unnest(hs) AS h FROM s),
         |c AS (SELECT h FROM (SELECT h, count(*) AS nd FROM ex GROUP BY h)
         |      WHERE nd >= 2),
         |d AS (SELECT ex.doc_id, CAST(count(*) AS BIGINT) AS n_dup
         |      FROM ex JOIN c USING (h) GROUP BY ex.doc_id)
         |SELECT s.doc_id, s.n_spans, CAST(len(s.hs) AS BIGINT) AS n_spans_d,
         |  COALESCE(d.n_dup, CAST(0 AS BIGINT)) AS n_dup,
         |  (COALESCE(d.n_dup, CAST(0 AS BIGINT)) * 1000000)
         |    // greatest(CAST(len(s.hs) AS BIGINT), 1) AS dup_x1e6
         |FROM s LEFT JOIN d USING (doc_id) ORDER BY doc_id""".stripMargin
    },

    "dedup_embedding" -> pairSimSql(400000L),
    "dedup_embedding_ivf" ->
      Similarity.embeddingDedupIvfOracleSql(graft.similarity.IvfModel.cells, 400000L),
    "ann_pair_sim" -> pairSimSql(300000L),

    "ann_cell_purity" -> Similarity.cellPurityOracleSql(),

    "ann_sim_hist" -> Similarity.simHistOracleSql,

    "ann_ivf_topk" ->
      Similarity.ivfOracleSql(graft.similarity.IvfModel.cells, "vec_id % 97 = 0"),

    "ann_lsh_topk" -> annLshSql,

    // recall@10 audit: each method's pair set against the brute-force
    // ground truth, every side the VERBATIM oracle text of the gated
    // query it audits (embedded as CTE-bearing subqueries)
    "ann_pq_error" -> Similarity.pqErrorSql(),
    "ann_sq_error" -> Similarity.sqErrorSql(),

    "ann_probe_sweep" -> {
      val sweeps = Seq(1, 2, 4).map { np =>
        s"""SELECT CAST($np AS BIGINT) AS nprobe, q_id, vec_id FROM (
           |${Similarity.ivfOracleSql(graft.similarity.IvfModel.cells,
                "vec_id % 97 = 0", nProbe = np)}
           |) z""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH tr AS (SELECT q_id, vec_id FROM (\n$annBruteSql\n) z),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM tr),
         |mp AS (\n$sweeps\n),
         |h AS (SELECT nprobe, CAST(count(*) AS BIGINT) AS hits
         |      FROM mp JOIN tr USING (q_id, vec_id) GROUP BY nprobe)
         |SELECT h.nprobe, t.n_truth, h.hits,
         |  (h.hits * 1000000) // t.n_truth AS recall_x1e6
         |FROM h CROSS JOIN t ORDER BY h.nprobe""".stripMargin
    },

    "ann_recall_eval" ->
      s"""WITH tr AS (SELECT q_id, vec_id FROM (\n$annBruteSql\n) z),
         |mp AS (
         |  SELECT 'hnsw' AS method, q_id, vec_id FROM (
         |${Similarity.hnswOracleSql("vec_id % 97 = 0")}
         |  ) z
         |  UNION ALL SELECT 'ivf', q_id, vec_id FROM (
         |${Similarity.ivfOracleSql(graft.similarity.IvfModel.cells, "vec_id % 97 = 0")}
         |  ) z
         |  UNION ALL SELECT 'lsh', q_id, vec_id FROM (\n$annLshSql\n) z
         |  UNION ALL SELECT 'nnd', q_id, vec_id FROM (
         |${Similarity.descentTopKOracleSql("vec_id % 97 = 0")}
         |  ) z
         |  UNION ALL SELECT 'pq', q_id, vec_id FROM (
         |${Similarity.pqOracleSql("vec_id % 97 = 0")}
         |  ) z
         |  UNION ALL SELECT 'rq', q_id, vec_id FROM (
         |${Similarity.rqOracleSql("vec_id % 97 = 0")}
         |  ) z
         |  UNION ALL SELECT 'sq', q_id, vec_id FROM (
         |${Similarity.sqOracleSql("vec_id % 97 = 0")}
         |  ) z),
         |tstat AS (SELECT CAST(count(*) AS BIGINT) AS n_truth,
         |            CAST(count(DISTINCT q_id) AS BIGINT) AS n_queries FROM tr),
         |h AS (SELECT method, CAST(count(*) AS BIGINT) AS hits
         |      FROM mp JOIN tr USING (q_id, vec_id) GROUP BY method),
         |meth AS (SELECT DISTINCT method FROM mp)
         |SELECT m.method, t.n_queries, t.n_truth,
         |  CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
         |  (CAST(COALESCE(h.hits, 0) AS BIGINT) * 1000000) // t.n_truth AS recall_x1e6
         |FROM meth m CROSS JOIN tstat t LEFT JOIN h ON h.method = m.method
         |ORDER BY m.method""".stripMargin,

    "ann_brute_topk" -> annBruteSql,

    "ann_hnsw_topk" -> Similarity.hnswOracleSql("vec_id % 97 = 0"),

    "ann_hnsw_visited" -> Similarity.hnswVisitedOracleSql("vec_id % 97 = 0"),

    "ann_nn_descent" -> Similarity.nnDescentOracleSql(),

    "ann_descent_topk" -> Similarity.descentTopKOracleSql("vec_id % 97 = 0"),

    "ann_descent_visited" -> Similarity.descentVisitedOracleSql("vec_id % 97 = 0"),
    "ann_descent_insert" -> Similarity.descentInsertOracleSql(),

    "ann_nn_descent_recall" -> Similarity.nnDescentRecallOracleSql(),

    "ann_knn_classify" ->
      s"""WITH e AS (SELECT vec_id, embedding, CAST(label AS BIGINT) AS label FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb, CAST(label AS BIGINT) AS true_label
         |      FROM embeddings WHERE vec_id % 97 = 0),
         |sc AS (
         |  SELECT q.q_id, e.vec_id, e.label,
         |    CAST(floor(${Similarity.cosineSql("q.q_emb", "e.embedding")} * 1e6) AS BIGINT) AS cs
         |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
         |rk AS (
         |  SELECT q_id, label,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rk
         |  FROM sc),
         |votes AS (
         |  SELECT q_id, label, CAST(count(*) AS BIGINT) AS n_votes
         |  FROM rk WHERE rk <= 10 GROUP BY q_id, label),
         |best AS (
         |  SELECT q_id, label AS pred_label, n_votes FROM (
         |    SELECT q_id, label, n_votes,
         |      row_number() OVER (PARTITION BY q_id ORDER BY n_votes DESC, label) AS rn
         |    FROM votes) WHERE rn = 1)
         |SELECT b.q_id, q.true_label, b.pred_label, b.n_votes,
         |  b.pred_label = q.true_label AS correct
         |FROM best b JOIN q ON q.q_id = b.q_id
         |ORDER BY b.q_id""".stripMargin,

    "ann_mmr" -> {
      // unrolled greedy MMR recurrence: each step picks the not-yet-
      // selected candidate maximizing sim_q − max(sim to selected)
      val steps = (2 to 5).map { i =>
        val p = s"sel${i - 1}"
        s"""p$i AS (
           |  SELECT c.vec_id, c.sim_q, max(p.sim) AS penalty
           |  FROM cand c
           |  JOIN pairs p ON p.ai = c.vec_id
           |  JOIN $p s ON s.vec_id = p.bi
           |  WHERE c.vec_id NOT IN (SELECT vec_id FROM $p)
           |  GROUP BY c.vec_id, c.sim_q),
           |s$i AS MATERIALIZED (
           |  SELECT vec_id, sim_q, penalty, sim_q - penalty AS mmr, $i AS rank
           |  FROM p$i ORDER BY mmr DESC, vec_id LIMIT 1),
           |sel$i AS MATERIALIZED (
           |  SELECT * FROM $p UNION ALL SELECT * FROM s$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH vq AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |sc AS (
         |  SELECT e.vec_id,
         |    CAST(floor(${Similarity.cosineSql("vq.q_emb", "e.embedding")} * 1e6) AS BIGINT) AS sim_q
         |  FROM embeddings e CROSS JOIN vq WHERE e.vec_id <> 0),
         |cand AS MATERIALIZED (
         |  SELECT vec_id, sim_q FROM sc ORDER BY sim_q DESC, vec_id LIMIT 20),
         |pairs AS MATERIALIZED (
         |  SELECT a.vec_id AS ai, b.vec_id AS bi,
         |    CAST(floor(${Similarity.cosineSql("ea.embedding", "eb.embedding")} * 1e6) AS BIGINT) AS sim
         |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id),
         |sel1 AS MATERIALIZED (
         |  SELECT vec_id, sim_q, CAST(0 AS BIGINT) AS penalty, sim_q AS mmr, 1 AS rank
         |  FROM cand ORDER BY sim_q DESC, vec_id LIMIT 1),
         |$steps
         |SELECT CAST(rank AS INT) AS rank, vec_id, sim_q, penalty, mmr
         |FROM sel5 ORDER BY rank""".stripMargin
    },

    "ann_sq_topk" -> Similarity.sqOracleSql("vec_id % 97 = 0"),

    "ann_pq_topk" -> Similarity.pqOracleSql("vec_id % 97 = 0"),

    "ann_rq_topk" -> Similarity.rqOracleSql("vec_id % 97 = 0"),

    "ann_rq_error" -> Similarity.rqErrorSql(),

    "ann_ivf_pq_topk" -> Similarity.ivfPqOracleSql("vec_id % 97 = 0"),

    "ann_range_search" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id % 97 = 0)
         |SELECT q.q_id, e.vec_id,
         |  CAST(floor(${Similarity.cosineSql("q.q_emb", "e.embedding")} * 1e6) AS BIGINT) AS cos_x1e6
         |FROM e CROSS JOIN q
         |WHERE e.vec_id <> q.q_id
         |  AND CAST(floor(${Similarity.cosineSql("q.q_emb", "e.embedding")} * 1e6) AS BIGINT) >= 250000
         |ORDER BY q_id, vec_id""".stripMargin,

    "pipe_chunk" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len(${TextFunctions.rawTokensSql("text")}) AS INT) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_tok, CAST(i AS INT) AS chunk_idx,
         |    CAST(i * 6 AS INT) AS tok_start
         |  FROM (SELECT doc_id, n_tok,
         |          unnest(range(0, greatest((n_tok - 8 + 5) // 6, 0) + 1)) AS i
         |        FROM t))
         |SELECT doc_id, chunk_idx, tok_start,
         |  CAST(least(8, n_tok - tok_start) AS BIGINT) AS tok_len
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "stream_spike" ->
      """WITH wa AS (
        |  SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT window_start_us, event_type, n,
        |  max(n) OVER (PARTITION BY event_type ORDER BY window_start_us
        |    ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS prev_max,
        |  COALESCE(n >= 2 * max(n) OVER (PARTITION BY event_type
        |    ORDER BY window_start_us
        |    ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING), FALSE) AS spike
        |FROM wa ORDER BY window_start_us, event_type""".stripMargin,

    "stream_topk" ->
      """WITH wa AS (
        |  SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY window_start_us
        |    ORDER BY n DESC, event_type) AS rk
        |  FROM wa)
        |SELECT window_start_us, event_type, n, sum_value
        |FROM rk WHERE rk <= 3
        |ORDER BY window_start_us, n DESC, event_type""".stripMargin,

    "q_t_closeness" ->
      """WITH cell AS (
        |  SELECT source, n_chars // 100 AS size_bucket, lang,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY source, size_bucket, lang),
        |cls AS (
        |  SELECT source, size_bucket, CAST(sum(c) AS BIGINT) AS k,
        |    CAST(count(*) AS BIGINT) AS n_langs
        |  FROM cell GROUP BY source, size_bucket),
        |g AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_g FROM cell GROUP BY lang),
        |t AS (SELECT CAST(sum(n_g) AS BIGINT) AS n_total FROM g),
        |num AS (
        |  SELECT cell.source, cell.size_bucket,
        |    sum(abs(CAST(cell.c AS HUGEINT) * t.n_total
        |          - CAST(g.n_g AS HUGEINT) * cls.k)
        |        - CAST(g.n_g AS HUGEINT) * cls.k) AS part_num
        |  FROM cell
        |  JOIN g USING (lang)
        |  JOIN cls ON cls.source = cell.source AND cls.size_bucket = cell.size_bucket
        |  CROSS JOIN t
        |  GROUP BY cell.source, cell.size_bucket),
        |scored AS (
        |  SELECT cls.source, cls.size_bucket, cls.k, cls.n_langs,
        |    CAST(((CAST(t.n_total AS HUGEINT) * cls.k + num.part_num) * 1000000)
        |      // (2 * CAST(t.n_total AS HUGEINT) * cls.k) AS BIGINT) AS tvd_x1e6
        |  FROM cls
        |  JOIN num ON num.source = cls.source AND num.size_bucket = cls.size_bucket
        |  CROSS JOIN t),
        |pg AS (
        |  SELECT *, row_number() OVER (
        |    ORDER BY tvd_x1e6 DESC, source, size_bucket) AS rk
        |  FROM scored)
        |SELECT CAST(rk AS INT) AS rank, source, size_bucket, k, n_langs,
        |  tvd_x1e6,
        |  CAST(CASE WHEN tvd_x1e6 > 200000 THEN 1 ELSE 0 END AS INT) AS breach
        |FROM pg WHERE rk <= 5 ORDER BY rank""".stripMargin,

    "pipe_split_leakage" -> {
      val fp = graft.text.TextFunctions
        .fingerprintSql("array_to_string(list_slice(tk, i, i + 7), '_')")
      s"""WITH t AS (
         |  SELECT doc_id, ${TextFunctions.rawTokensSql("text")} AS tk,
         |    CASE WHEN (doc_id * 2654435761) % 4294967296 < 3435973836 THEN 'train'
         |         WHEN (doc_id * 2654435761) % 4294967296 < 3865470566 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, split,
         |    CASE WHEN len(tk) >= 8 THEN
         |      list_distinct(list_transform(range(1, len(tk) - 6), i -> $fp))
         |    ELSE CAST([] AS BIGINT[]) END AS hs
         |  FROM t),
         |ex AS (SELECT doc_id, split, unnest(hs) AS h FROM s),
         |tg AS (SELECT DISTINCT h FROM ex WHERE split = 'train'),
         |bad AS (SELECT DISTINCT ex.doc_id FROM ex JOIN tg USING (h)
         |        WHERE ex.split <> 'train')
         |SELECT s.split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(bad.doc_id) AS BIGINT) AS n_contaminated,
         |  (CAST(count(bad.doc_id) AS BIGINT) * 1000000) // count(*) AS leak_ppm
         |FROM s LEFT JOIN bad ON bad.doc_id = s.doc_id
         |WHERE s.split <> 'train'
         |GROUP BY s.split ORDER BY s.split""".stripMargin
    },

    "pipe_split" ->
      """WITH t AS (
        |  SELECT source,
        |    CASE WHEN (doc_id * 2654435761) % 4294967296 < 3435973836 THEN 'train'
        |         WHEN (doc_id * 2654435761) % 4294967296 < 3865470566 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |c AS (SELECT source, split, count(*) AS n_docs FROM t GROUP BY source, split)
        |SELECT source, split, n_docs,
        |  CAST(n_docs * 1000000 // sum(n_docs) OVER (PARTITION BY source) AS BIGINT) AS share_x1e6
        |FROM c ORDER BY source, split""".stripMargin,

    "mm_modality" ->
      """WITH j AS (
        |  SELECT COALESCE(d.doc_id, e.vec_id) AS id,
        |    COALESCE(d.source, '<none>') AS source,
        |    CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL THEN 'both'
        |         WHEN d.doc_id IS NOT NULL THEN 'text_only'
        |         ELSE 'vector_only' END AS modality
        |  FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id)
        |SELECT source, modality, CAST(count(*) AS BIGINT) AS n,
        |  min(id) AS min_id, max(id) AS max_id
        |FROM j GROUP BY source, modality ORDER BY source, modality""".stripMargin,

    "pipe_epoch_shuffle" ->
      """WITH e AS (
        |  SELECT doc_id, CAST(i AS INT) AS epoch,
        |    ((doc_id + CAST(i AS INT) * 7919) * 2654435761) % 4294967296 AS h
        |  FROM documents, unnest(range(1, 3)) AS u(i)),
        |rk AS (
        |  SELECT epoch, doc_id, h,
        |    CAST(row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) AS INT) AS pos
        |  FROM e)
        |SELECT epoch, pos, doc_id, h FROM rk WHERE pos <= 20
        |ORDER BY epoch, pos""".stripMargin,

    "pipe_dataset_card" ->
      s"""WITH a AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |    CAST(sum(len(${TextFunctions.rawTokensSql("text")})) AS BIGINT) AS n_tokens,
         |    CAST(count(DISTINCT text) AS BIGINT) AS n_uniq_texts,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
         |  FROM documents)
         |SELECT n_docs, n_sources, n_langs, n_tokens, n_uniq_texts,
         |  (n_docs - n_uniq_texts) * 10000 // n_docs AS dup_bp,
         |  n_en * 1000 // n_docs AS en_pm,
         |  n_tokens // n_docs AS avg_doc_tokens
         |FROM a""".stripMargin,

    "pipe_freshness" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events),
        |mx AS (SELECT max(day) AS now_day FROM ev),
        |g AS (
        |  SELECT event_type, max(day) AS last_day,
        |    CAST(count(DISTINCT day) AS BIGINT) AS days_active,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM ev GROUP BY event_type)
        |SELECT event_type, last_day, mx.now_day - last_day AS staleness_days,
        |  days_active, n_events
        |FROM g CROSS JOIN mx ORDER BY event_type""".stripMargin,

    "pipe_dq_report" ->
      """SELECT * FROM (
        |  SELECT 'lineitem_orphan_order' AS "check",
        |    CAST(count(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS BIGINT) AS n_bad,
        |    CAST(count(*) AS BIGINT) AS n_total
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  UNION ALL
        |  SELECT 'order_orphan_customer',
        |    CAST(count(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS BIGINT),
        |    CAST(count(*) AS BIGINT)
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |  UNION ALL
        |  SELECT 'doc_empty_text',
        |    CAST(count(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 END) AS BIGINT),
        |    CAST(count(*) AS BIGINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'doc_dup_id',
        |    CAST(count(*) - count(DISTINCT doc_id) AS BIGINT),
        |    CAST(count(*) AS BIGINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'lineitem_nonpositive_qty',
        |    CAST(count(CASE WHEN l_quantity <= 0 THEN 1 END) AS BIGINT),
        |    CAST(count(*) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'event_null_user',
        |    CAST(count(CASE WHEN user_id IS NULL THEN 1 END) AS BIGINT),
        |    CAST(count(*) AS BIGINT)
        |  FROM events)
        |ORDER BY "check"""".stripMargin,

    "pipe_quota_sample" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    (doc_id * 2654435761) % 4294967296 AS hkey FROM documents),
        |rk AS (
        |  SELECT source, doc_id, hkey,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY hkey, doc_id) AS INT) AS rk
        |  FROM t)
        |SELECT source, rk, doc_id, hkey FROM rk WHERE rk <= 20
        |ORDER BY source, rk""".stripMargin,

    "pipe_oversample" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_orig
        |           FROM documents GROUP BY lang),
        |t AS (SELECT max(n_orig) AS target, CAST(sum(n_orig) AS BIGINT) AS n_tot FROM c),
        |r AS (SELECT lang, n_orig, (t.target + n_orig - 1) // n_orig AS rep_factor,
        |        t.n_tot
        |      FROM c CROSS JOIN t),
        |e AS (SELECT d.lang, d.doc_id, unnest(range(1, r.rep_factor + 1)) AS copy
        |      FROM documents d JOIN r USING (lang)),
        |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_after,
        |        CAST(sum(doc_id * copy) AS BIGINT) AS checksum
        |      FROM e GROUP BY lang),
        |f AS (SELECT r.lang, r.n_orig, r.rep_factor, a.n_after, a.checksum, r.n_tot
        |      FROM r JOIN a USING (lang)),
        |t2 AS (SELECT CAST(sum(n_after) AS BIGINT) AS n_tot_after FROM f)
        |SELECT lang, n_orig, rep_factor, n_after, checksum,
        |  (n_orig * 1000000) // n_tot AS share_before_ppm,
        |  (n_after * 1000000) // n_tot_after AS share_after_ppm
        |FROM f CROSS JOIN t2 ORDER BY lang""".stripMargin,

    "pipe_curriculum" ->
      s"""WITH sc AS (
         |  SELECT doc_id,
         |    greatest(CAST(len(${TextFunctions.rawTokensSql("text")}) AS BIGINT), 1) AS n_tok,
         |    CAST(len(list_distinct(${TextFunctions.rawTokensSql("text")})) AS BIGINT) AS n_uniq
         |  FROM documents),
         |st AS (
         |  SELECT doc_id, n_tok, (10000 * n_uniq) // n_tok AS difficulty_x1e4,
         |    CASE WHEN (10000 * n_uniq) // n_tok < 2500 THEN 1
         |         WHEN (10000 * n_uniq) // n_tok < 5000 THEN 2
         |         WHEN (10000 * n_uniq) // n_tok < 7500 THEN 3
         |         ELSE 4 END AS stage
         |  FROM sc),
         |g AS (
         |  SELECT CAST(stage AS BIGINT) AS stage,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |    min(difficulty_x1e4) AS min_diff, max(difficulty_x1e4) AS max_diff
         |  FROM st GROUP BY stage)
         |SELECT stage, n_docs, n_tokens, min_diff, max_diff,
         |  coalesce(CAST(sum(n_tokens) OVER (ORDER BY stage
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |    CAST(0 AS BIGINT)) AS start_tok
         |FROM g ORDER BY stage""".stripMargin,

    "pipe_temperature" ->
      """WITH s AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(floor(sqrt(count(*))) AS BIGINT) AS sqrt_n
        |  FROM documents GROUP BY lang),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |        CAST(sum(sqrt_n) AS BIGINT) AS sqrt_total FROM s)
        |SELECT s.lang, s.n_docs, s.sqrt_n,
        |  (s.n_docs * 1000000) // t.n_total AS share_ppm,
        |  (s.sqrt_n * 1000000) // t.sqrt_total AS weight_ppm,
        |  (s.sqrt_n * 10000) // t.sqrt_total AS samples_per_10k
        |FROM s CROSS JOIN t ORDER BY s.lang""".stripMargin,

    "pipe_span_mask" ->
      s"""WITH b AS (
         |  SELECT doc_id, ${TextFunctions.fingerprintSql("text")} AS fp,
         |    greatest(CAST(len(${TextFunctions.rawTokensSql("text")}) AS BIGINT), 1) AS n_tok
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, n_tok,
         |    greatest(1, (n_tok * 15) // 100) AS n_masked
         |  FROM b),
         |sp AS (
         |  SELECT m.doc_id, m.n_tok, m.n_masked,
         |    greatest(1, m.n_masked // 3) AS n_spans, b.fp
         |  FROM m JOIN b USING (doc_id))
         |SELECT doc_id, n_tok, n_masked, n_spans,
         |  n_tok - n_masked + n_spans AS input_len,
         |  n_masked + n_spans + 1 AS target_len,
         |  fp % greatest(n_tok - n_masked + 1, 1) AS first_start
         |FROM sp ORDER BY doc_id LIMIT 100""".stripMargin,

    "pipe_mix_weights" ->
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |           FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |        CAST(count(*) AS BIGINT) AS n_sources FROM s)
        |SELECT s.source, s.n_docs,
        |  (1000000 * t.n_total) // (t.n_sources * s.n_docs) AS weight_x1e6
        |FROM s CROSS JOIN t ORDER BY s.source""".stripMargin,

    "pipe_merge_stats" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
        |  CAST(count(DISTINCT doc_id % 5) AS BIGINT) AS n_batches
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "mm_patchify" ->
      s"""WITH m AS (SELECT doc_id,
         |  1 + ${TextFunctions.fingerprintSql("text")} % 640 AS width,
         |  1 + ${TextFunctions.fingerprintSql("text")} % 480 AS height
         |FROM documents),
         |p AS (SELECT doc_id, width, height,
         |  (width + 15) // 16 AS pw, (height + 15) // 16 AS ph FROM m)
         |SELECT doc_id, width, height, pw, ph, pw * ph AS n_patches,
         |  least(pw * ph + 1, CAST(257 AS BIGINT)) AS seq_len,
         |  greatest(pw * ph + 1 - 257, CAST(0 AS BIGINT)) AS n_dropped
         |FROM p ORDER BY doc_id""".stripMargin,

    "mm_resize" ->
      s"""WITH m AS (SELECT doc_id,
         |  1 + ${TextFunctions.fingerprintSql("text")} % 640 AS width,
         |  1 + ${TextFunctions.fingerprintSql("text")} % 480 AS height
         |FROM documents)
         |SELECT doc_id, width, height,
         |  (width * 224) // greatest(width, height) AS new_w,
         |  (height * 224) // greatest(width, height) AS new_h
         |FROM m ORDER BY doc_id""".stripMargin,

    "mm_frame_sample" ->
      s"""WITH m AS (SELECT doc_id,
         |  1 + ${TextFunctions.fingerprintSql("text")} % 16 AS n_frames
         |FROM documents)
         |SELECT doc_id, n_frames,
         |  array_to_string(range(CAST(0 AS BIGINT), CAST(n_frames AS BIGINT), (n_frames + 3) // 4), ',')
         |    AS frame_idx_csv
         |FROM m ORDER BY doc_id""".stripMargin,

    "mm_features" ->
      s"""${mmFeatCtes}
         |SELECT doc_id, CAST(k AS INT) AS k, feature
         |FROM fv ORDER BY doc_id, k""".stripMargin,

    "mm_feat_topk" ->
      s"""${mmFeatCtes},
         |q AS (SELECT doc_id AS q_id, k, feature AS fq FROM fv WHERE doc_id % 97 = 0),
         |dots AS (
         |  SELECT q.q_id, f.doc_id, CAST(sum(q.fq * f.feature) AS BIGINT) AS fdot
         |  FROM q JOIN fv f USING (k) WHERE f.doc_id <> q.q_id
         |  GROUP BY q.q_id, f.doc_id)
         |SELECT q_id, rk, doc_id, fdot FROM (
         |  SELECT q_id, doc_id, fdot,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY fdot DESC, doc_id) AS INT) AS rk
         |  FROM dots)
         |WHERE rk <= 10 ORDER BY q_id, rk""".stripMargin,

    "mm_audio_window" ->
      s"""WITH m AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_samples FROM documents),
         |f AS (SELECT doc_id, n_samples,
         |  CASE WHEN n_samples >= 400 THEN 1 + (n_samples - 400) // 160
         |       ELSE CAST(0 AS BIGINT) END AS n_frames_audio
         |FROM m)
         |SELECT doc_id, n_samples, n_frames_audio,
         |  CASE WHEN n_frames_audio > 0 THEN (n_frames_audio - 1) * 160
         |       ELSE CAST(0 AS BIGINT) END AS last_start,
         |  CASE WHEN n_frames_audio > 0
         |       THEN n_samples - ((n_frames_audio - 1) * 160 + 400)
         |       ELSE n_samples END AS tail_samples
         |FROM f ORDER BY doc_id""".stripMargin,

    // real-pixel replay (r15): per (doc, frame) the oracle recomputes
    // the BT.601 mean luma over the SAME closed-form pixels the Spark
    // side encodes into genuine concatenated BMPs and decodes back via
    // the real frame walk — luma numerator is non-negative so DuckDB
    // // equals Spark div
    "mm_scene_detect" ->
      """WITH m AS (SELECT doc_id, 3 + doc_id % 6 AS w, 2 + doc_id % 5 AS h,
        |             2 + doc_id % 12 AS n FROM documents),
        |fr AS (SELECT m.doc_id, m.n, m.w, m.h, f.i AS idx
        |       FROM m, range(0, 14) f(i) WHERE f.i < m.n),
        |px AS (
        |  SELECT fr.doc_id, fr.n, fr.idx, fr.w, fr.h,
        |    (fr.doc_id + 17 * fr.idx * fr.idx + 3 * x.i + 5 * y.i) % 256 AS r,
        |    (2 * fr.doc_id + 31 * fr.idx * fr.idx + 7 * x.i + y.i) % 256 AS g,
        |    (3 * fr.doc_id + 47 * fr.idx * fr.idx + x.i + 11 * y.i) % 256 AS b
        |  FROM fr, range(0, 9) x(i), range(0, 7) y(i)
        |  WHERE x.i < fr.w AND y.i < fr.h),
        |lm AS (SELECT doc_id, n, idx,
        |         (299 * sum(r) + 587 * sum(g) + 114 * sum(b)) // (1000 * w * h) AS luma
        |       FROM px GROUP BY doc_id, n, idx, w, h),
        |lg AS (SELECT *, lag(luma) OVER (PARTITION BY doc_id ORDER BY idx) AS prev FROM lm),
        |ct AS (SELECT doc_id, n, idx,
        |         CASE WHEN prev IS NULL OR abs(luma - prev) > 48 THEN 1 ELSE 0 END AS cut
        |       FROM lg)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_frames, CAST(sum(cut) AS BIGINT) AS n_scenes,
        |  CAST(max(CASE WHEN cut = 1 THEN idx END) AS BIGINT) AS last_cut,
        |  CAST(sum(CASE WHEN cut = 1 THEN idx ELSE 0 END) AS BIGINT) AS cut_checksum
        |FROM ct GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,

    // mm_decode_bmp / mm_decode_wav verify the REAL codecs: payload
    // geometry and content are pure functions of doc_id, so the oracle
    // recomputes the decoded stats closed-form — any decoder bug
    // (offsets, bottom-up rows, row padding, sign extension, chunk walk)
    // diverges from these sums
    "mm_decode_bmp" ->
      """WITH m AS (SELECT doc_id, 4 + doc_id % 21 AS w, 3 + doc_id % 14 AS h
        |           FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.w, m.h,
        |    (m.doc_id + 3 * x.i + 5 * y.i) % 256 AS r,
        |    (2 * m.doc_id + 7 * x.i + y.i) % 256 AS g,
        |    (5 * m.doc_id + x.i + 11 * y.i) % 256 AS b
        |  FROM m, range(0, 24) x(i), range(0, 16) y(i)
        |  WHERE x.i < m.w AND y.i < m.h)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,

    "mm_decode_tga" ->
      """WITH m AS (SELECT doc_id, 5 + doc_id % 19 AS w, 3 + doc_id % 11 AS h,
        |             1 + doc_id % 5 AS rl
        |           FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.w, m.h,
        |    (m.doc_id + 3 * (x.i // m.rl) + 5 * y.i) % 256 AS r,
        |    (2 * m.doc_id + 7 * (x.i // m.rl) + y.i) % 256 AS g,
        |    (5 * m.doc_id + (x.i // m.rl) + 11 * y.i) % 256 AS b
        |  FROM m, range(0, 24) x(i), range(0, 14) y(i)
        |  WHERE x.i < m.w AND y.i < m.h)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(doc_id % 256 AS BIGINT) AS tl_r,
        |  CAST((2 * doc_id) % 256 AS BIGINT) AS tl_g,
        |  CAST((5 * doc_id) % 256 AS BIGINT) AS tl_b
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,

    // the full G.711 compand->expand roundtrip closed-form: segment
    // exponent = bitlen((|s|+132) >> 7) - 1, mantissa by shifted
    // floor-div, magnitude = ((8*man + 132) << e) - 132
    "mm_decode_mulaw" ->
      """WITH m AS (SELECT doc_id, 20 + doc_id % 50 AS n FROM documents),
        |s AS (
        |  SELECT m.doc_id, m.n,
        |    ((m.doc_id * 7919 + i.i * 2741) % 65536) - 32768 AS s
        |  FROM m, range(0, 70) i(i) WHERE i.i < m.n),
        |c AS (SELECT doc_id, n, least(abs(s), 32635) + 132 AS m132 FROM s),
        |e AS (SELECT doc_id, n, m132, length(bin(m132 // 128)) - 1 AS e FROM c),
        |d AS (
        |  SELECT doc_id, n,
        |    ((((m132 // (1 << (e + 3))) % 16) * 8 + 132) * (1 << e)) - 132 AS dec
        |  FROM e)
        |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(sum(dec) AS BIGINT) AS sum_abs, CAST(max(dec) AS BIGINT) AS max_abs
        |FROM d GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,

    "mm_decode_ppm" ->
      """WITH m AS (SELECT doc_id, 3 + doc_id % 17 AS w, 2 + doc_id % 13 AS h
        |           FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.w, m.h,
        |    (3 * m.doc_id + 2 * x.i + 7 * y.i) % 256 AS r,
        |    (m.doc_id + 5 * x.i + 3 * y.i) % 256 AS g,
        |    (7 * m.doc_id + 11 * x.i + y.i) % 256 AS b
        |  FROM m, range(0, 20) x(i), range(0, 15) y(i)
        |  WHERE x.i < m.w AND y.i < m.h)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(255 AS BIGINT) AS maxval,
        |  CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,

    "mm_decode_adpcm" -> adpcmOracleSql,

    "mm_phash" ->
      """WITH m AS (SELECT doc_id, 4 + doc_id % 21 AS w, 3 + doc_id % 14 AS h
        |           FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.w, m.h, x.i AS x, y.i AS y,
        |    ((m.doc_id + 3 * x.i + 5 * y.i) % 256
        |     + (2 * m.doc_id + 7 * x.i + y.i) % 256
        |     + (5 * m.doc_id + x.i + 11 * y.i) % 256) // 3 AS gray
        |  FROM m, range(0, 24) x(i), range(0, 16) y(i)
        |  WHERE x.i < m.w AND y.i < m.h),
        |bl AS (
        |  SELECT doc_id, w, h,
        |    (CASE WHEN y < h // 3 THEN 0 WHEN y < (2 * h) // 3 THEN 1 ELSE 2 END) * 3
        |      + CASE WHEN x < w // 3 THEN 0 WHEN x < (2 * w) // 3 THEN 1 ELSE 2 END AS k,
        |    gray
        |  FROM px),
        |bs AS (SELECT doc_id, w, h, k, CAST(sum(gray) AS BIGINT) AS bsum,
        |         CAST(count(*) AS BIGINT) AS bcnt
        |       FROM bl GROUP BY doc_id, w, h, k),
        |ts AS (SELECT doc_id, CAST(sum(bsum) AS BIGINT) AS tsum,
        |         CAST(sum(bcnt) AS BIGINT) AS tcnt
        |       FROM bs GROUP BY doc_id)
        |SELECT b.doc_id, CAST(max(b.w) AS BIGINT) AS width,
        |  CAST(max(b.h) AS BIGINT) AS height,
        |  CAST(sum(CASE WHEN b.bsum * t.tcnt > t.tsum * b.bcnt
        |               THEN 1::BIGINT << k ELSE 0 END) AS BIGINT) AS phash,
        |  CAST(sum(CASE WHEN b.bsum * t.tcnt > t.tsum * b.bcnt
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_ones
        |FROM bs b JOIN ts t USING (doc_id)
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,

    "mm_decode_png" ->
      """WITH m AS (SELECT doc_id, 1 + doc_id % 13 AS w, 1 + doc_id % 9 AS h
        |           FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.w, m.h,
        |    (m.doc_id + 2 * x.i + 3 * y.i) % 256 AS r,
        |    (3 * m.doc_id + 5 * x.i + y.i) % 256 AS g,
        |    (7 * m.doc_id + x.i + 4 * y.i) % 256 AS b
        |  FROM m, range(0, 13) x(i), range(0, 9) y(i)
        |  WHERE x.i < m.w AND y.i < m.h)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,

    // decoded flat-block JPEG closed form: dcq = floor((8(v-128))/16 + 1/2).
    // The +4096 shift keeps the // numerator non-negative (DuckDB integer
    // // truncates, floorDiv floors; they agree only above zero), then
    // reconstruction = 2·dcq + 128 clamped, ×64 samples per block
    "mm_decode_jpeg" ->
      """WITH m AS (SELECT doc_id, 1 + doc_id % 4 AS wb, 1 + doc_id % 3 AS hb
        |           FROM documents),
        |blk AS (
        |  SELECT m.doc_id, m.wb, m.hb,
        |    (7 * m.doc_id + 13 * bx.i + 29 * by.i) % 256 AS v
        |  FROM m, range(0, 4) bx(i), range(0, 3) by(i)
        |  WHERE bx.i < m.wb AND by.i < m.hb),
        |px AS (
        |  SELECT doc_id, wb, hb,
        |    least(255, greatest(0, 2 * (((16 * (v - 128) + 16 + 4096) // 32) - 128) + 128)) AS pix
        |  FROM blk)
        |SELECT doc_id, CAST(wb * 8 AS BIGINT) AS width, CAST(hb * 8 AS BIGINT) AS height,
        |  CAST(sum(64 * pix) AS BIGINT) AS sum_lum
        |FROM px GROUP BY doc_id, wb, hb ORDER BY doc_id""".stripMargin,

    "mm_integral_image" ->
      """WITH m AS (SELECT doc_id, 4 + doc_id % 21 AS w, 3 + doc_id % 14 AS h
        |           FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.w, m.h, x.i AS x, y.i AS y,
        |    ((m.doc_id + 3 * x.i + 5 * y.i) % 256
        |     + (2 * m.doc_id + 7 * x.i + y.i) % 256
        |     + (5 * m.doc_id + x.i + 11 * y.i) % 256) // 3 AS gray
        |  FROM m, range(0, 24) x(i), range(0, 16) y(i)
        |  WHERE x.i < m.w AND y.i < m.h)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(sum(gray) AS BIGINT) AS total,
        |  CAST(sum(CASE WHEN x <= w // 2 AND y <= h // 2 THEN gray ELSE 0 END)
        |    AS BIGINT) AS mid_sat,
        |  CAST(sum(CASE WHEN x >= w // 4 AND x < (3 * w) // 4
        |                 AND y >= h // 4 AND y < (3 * h) // 4
        |            THEN gray ELSE 0 END) AS BIGINT) AS block_sum,
        |  CAST(sum(gray * (w - x) * (h - y)) AS BIGINT) AS sat_checksum
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,

    "mm_box_blur" -> {
      def g(xs: String, ys: String) =
        s"(((m.doc_id + 3*($xs) + 5*($ys)) % 256 + (2*m.doc_id + 7*($xs) + ($ys)) % 256" +
          s" + (5*m.doc_id + ($xs) + 11*($ys)) % 256) // 3)"
      val nine = (for (dy <- -1 to 1; dx <- -1 to 1)
        yield g(s"x.i${if (dx >= 0) "+" + dx else dx.toString}",
          s"y.i${if (dy >= 0) "+" + dy else dy.toString}")).mkString(" + ")
      s"""WITH m AS (SELECT doc_id, 4 + doc_id % 21 AS w, 3 + doc_id % 14 AS h
         |           FROM documents),
         |t AS (
         |  SELECT m.doc_id, m.w, m.h,
         |    ($nine) // 9 AS b, ${g("x.i", "y.i")} AS c
         |  FROM m, range(1, 23) x(i), range(1, 15) y(i)
         |  WHERE x.i < m.w - 1 AND y.i < m.h - 1)
         |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         |  CAST((w - 2) * (h - 2) AS BIGINT) AS n_interior,
         |  CAST(sum(b) AS BIGINT) AS sum_blur,
         |  CAST(sum(abs(b - c)) AS BIGINT) AS sum_abs_delta,
         |  CAST(max(b) AS BIGINT) AS max_blur
         |FROM t GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin
    },

    "mm_sobel" -> {
      def g(xs: String, ys: String) =
        s"(((m.doc_id + 3*($xs) + 5*($ys)) % 256 + (2*m.doc_id + 7*($xs) + ($ys)) % 256" +
          s" + (5*m.doc_id + ($xs) + 11*($ys)) % 256) // 3)"
      val gx = s"((${g("x.i+1", "y.i-1")} + 2*${g("x.i+1", "y.i")} + ${g("x.i+1", "y.i+1")})" +
        s" - (${g("x.i-1", "y.i-1")} + 2*${g("x.i-1", "y.i")} + ${g("x.i-1", "y.i+1")}))"
      val gy = s"((${g("x.i-1", "y.i+1")} + 2*${g("x.i", "y.i+1")} + ${g("x.i+1", "y.i+1")})" +
        s" - (${g("x.i-1", "y.i-1")} + 2*${g("x.i", "y.i-1")} + ${g("x.i+1", "y.i-1")}))"
      s"""WITH m AS (SELECT doc_id, 4 + doc_id % 21 AS w, 3 + doc_id % 14 AS h
         |           FROM documents),
         |t AS (
         |  SELECT m.doc_id, m.w, m.h, abs($gx) AS agx, abs($gy) AS agy
         |  FROM m, range(1, 23) x(i), range(1, 15) y(i)
         |  WHERE x.i < m.w - 1 AND y.i < m.h - 1)
         |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         |  CAST((w - 2) * (h - 2) AS BIGINT) AS n_interior,
         |  CAST(sum(agx) AS BIGINT) AS sum_abs_gx,
         |  CAST(sum(agy) AS BIGINT) AS sum_abs_gy,
         |  CAST(sum(agx + agy) AS BIGINT) AS sum_mag,
         |  CAST(sum(CASE WHEN agx + agy >= 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_edge
         |FROM t GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin
    },

    "mm_hist_eq" ->
      """WITH m AS (SELECT doc_id, 4 + doc_id % 21 AS w, 3 + doc_id % 14 AS h
        |           FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.w, m.h,
        |    ((m.doc_id + 3 * x.i + 5 * y.i) % 256
        |     + (2 * m.doc_id + 7 * x.i + y.i) % 256
        |     + (5 * m.doc_id + x.i + 11 * y.i) % 256) // 3 AS gray
        |  FROM m, range(0, 24) x(i), range(0, 16) y(i)
        |  WHERE x.i < m.w AND y.i < m.h),
        |hist AS (
        |  SELECT doc_id, w, h, gray, CAST(count(*) AS BIGINT) AS c
        |  FROM px GROUP BY doc_id, w, h, gray),
        |cdf AS (
        |  SELECT doc_id, w, h, gray, c,
        |    CAST(sum(c) OVER (PARTITION BY doc_id ORDER BY gray) AS BIGINT) AS cdf
        |  FROM hist),
        |st AS (
        |  SELECT doc_id, CAST(w * h AS BIGINT) AS n,
        |    CAST(min_by(c, gray) AS BIGINT) AS cdf_min,
        |    CAST(min(gray) AS BIGINT) AS gray_min,
        |    CAST(max(gray) AS BIGINT) AS gray_max,
        |    CAST(count(*) AS BIGINT) AS n_levels
        |  FROM cdf GROUP BY doc_id, w, h)
        |SELECT c.doc_id, CAST(c.w AS BIGINT) AS width, CAST(c.h AS BIGINT) AS height,
        |  s.n_levels, s.gray_min, s.gray_max,
        |  CAST(sum((CASE WHEN s.n > s.cdf_min
        |    THEN ((c.cdf - s.cdf_min) * 255) // (s.n - s.cdf_min)
        |    ELSE 0 END) * c.c) AS BIGINT) AS sum_eq
        |FROM cdf c JOIN st s ON s.doc_id = c.doc_id
        |GROUP BY c.doc_id, c.w, c.h, s.n_levels, s.gray_min, s.gray_max
        |ORDER BY c.doc_id""".stripMargin,

    "mm_decode_png_idx" ->
      """WITH m AS (SELECT doc_id, 3 + doc_id % 13 AS w, 2 + doc_id % 9 AS h
        |           FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.w, m.h,
        |    (m.doc_id + 3 * x.i + 5 * y.i) % 16 AS idx
        |  FROM m, range(0, 16) x(i), range(0, 11) y(i)
        |  WHERE x.i < m.w AND y.i < m.h)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(16 AS BIGINT) AS n_colors,
        |  CAST(sum(idx) AS BIGINT) AS sum_idx,
        |  CAST(sum((doc_id + 17 * idx) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2 * doc_id + 29 * idx) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((3 * doc_id + 41 * idx) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,

    "mm_audio_stats" ->
      """WITH m AS (SELECT doc_id, 50 + doc_id % 300 AS n,
        |             8000 + (doc_id % 3) * 4000 AS sr FROM documents),
        |s AS (
        |  SELECT m.doc_id, m.n, m.sr,
        |    (m.doc_id * 31 + i.i * 17) % 4001 - 2000 AS v,
        |    CASE WHEN i.i > 0
        |      THEN (m.doc_id * 31 + (i.i - 1) * 17) % 4001 - 2000 END AS pv
        |  FROM m, range(0, 350) i(i) WHERE i.i < m.n)
        |SELECT doc_id, CAST(sr AS BIGINT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(sum(v * v) AS BIGINT) AS energy,
        |  CAST(sum(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS zero_crossings,
        |  CAST(max(abs(v)) AS BIGINT) AS peak
        |FROM s GROUP BY doc_id, sr, n ORDER BY doc_id""".stripMargin,

    "mm_thumbnail" ->
      """WITH m AS (SELECT doc_id, 4 + doc_id % 21 AS w, 3 + doc_id % 14 AS h
        |           FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.w, m.h,
        |    (m.doc_id + 3 * ((tx.i * m.w) // 4) + 5 * ((ty.i * m.h) // 3)) % 256 AS r,
        |    (2 * m.doc_id + 7 * ((tx.i * m.w) // 4) + ((ty.i * m.h) // 3)) % 256 AS g,
        |    (5 * m.doc_id + ((tx.i * m.w) // 4) + 11 * ((ty.i * m.h) // 3)) % 256 AS b
        |  FROM m, range(0, 4) tx(i), range(0, 3) ty(i))
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(sum(r) AS BIGINT) AS thumb_sum_r,
        |  CAST(sum(g) AS BIGINT) AS thumb_sum_g,
        |  CAST(sum(b) AS BIGINT) AS thumb_sum_b
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,

    "q_l_diversity" ->
      """WITH cl AS (
        |  SELECT source, n_chars // 100 AS size_bucket,
        |    CAST(count(*) AS BIGINT) AS k,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS l
        |  FROM documents GROUP BY source, size_bucket),
        |t AS (SELECT CAST(sum(k) AS BIGINT) AS n_docs_total FROM cl),
        |b AS (
        |  SELECT CASE WHEN l = 1 THEN '1_homogeneous'
        |              WHEN l = 2 THEN '2_binary'
        |              ELSE '3_plus' END AS l_bucket,
        |    CAST(count(*) AS BIGINT) AS n_classes,
        |    CAST(sum(k) AS BIGINT) AS n_docs,
        |    CAST(min(l) AS BIGINT) AS min_l, CAST(max(l) AS BIGINT) AS max_l
        |  FROM cl GROUP BY 1)
        |SELECT l_bucket, n_classes, n_docs, min_l, max_l,
        |  (n_docs * 1000000) // n_docs_total AS docs_ppm
        |FROM b CROSS JOIN t ORDER BY l_bucket""".stripMargin,

    "pipe_class_balance" -> {
      val tk = graft.text.TextFunctions.rawTokensSql("text")
      s"""WITH cls AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len($tk)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY lang),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_classes,
         |        CAST(sum(n_docs) AS BIGINT) AS n_docs_total,
         |        CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total FROM cls)
         |SELECT lang, n_docs, n_tokens,
         |  (n_docs * 1000000) // n_docs_total AS docs_ppm,
         |  (n_tokens * 1000000) // n_tokens_total AS tokens_ppm,
         |  CAST(CAST(n_docs_total AS HUGEINT) * 1000000
         |    // (CAST(n_classes AS HUGEINT) * n_docs) AS BIGINT) AS uniform_weight_x1e6
         |FROM cls CROSS JOIN t ORDER BY lang""".stripMargin
    },

    "q_k_anonymity" ->
      """WITH cl AS (
        |  SELECT lang, source, n_chars // 100 AS size_bucket,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM documents GROUP BY lang, source, size_bucket),
        |t AS (SELECT CAST(sum(k) AS BIGINT) AS n_docs_total FROM cl),
        |b AS (
        |  SELECT CASE WHEN k = 1 THEN '1_unique'
        |              WHEN k <= 4 THEN '2_to_4'
        |              WHEN k <= 9 THEN '5_to_9'
        |              ELSE '10_plus' END AS k_bucket,
        |    CAST(count(*) AS BIGINT) AS n_classes,
        |    CAST(sum(k) AS BIGINT) AS n_docs,
        |    CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k
        |  FROM cl GROUP BY 1)
        |SELECT k_bucket, n_classes, n_docs, min_k, max_k,
        |  (n_docs * 1000000) // n_docs_total AS docs_ppm
        |FROM b CROSS JOIN t ORDER BY k_bucket""".stripMargin,

    "pipe_quality_curve" -> {
      val taus = Seq(0L, 2000L, 4000L, 6000L, 8000L)
      val rows = taus.map { t =>
        s"""SELECT CAST($t AS BIGINT) AS tau_bp,
           |  CAST(sum(CASE WHEN uniq_bp >= $t THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
           |  CAST(sum(CASE WHEN uniq_bp >= $t THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_kept,
           |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
           |FROM pd""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH pd AS (
         |  SELECT n_tok, (10000 * n_uniq) // n_tok AS uniq_bp FROM (
         |    SELECT CAST(len(${graft.text.TextFunctions.rawTokensSql("text")}) AS BIGINT) AS n_tok,
         |      CAST(len(list_distinct(${graft.text.TextFunctions.rawTokensSql("text")})) AS BIGINT) AS n_uniq
         |    FROM documents)),
         |u AS ($rows)
         |SELECT tau_bp, docs_kept, tokens_kept,
         |  (docs_kept * 1000000) // n_docs AS docs_ppm,
         |  (tokens_kept * 1000000) // n_tokens AS tokens_ppm
         |FROM u ORDER BY tau_bp""".stripMargin
    },

    "mm_decode_qoi" ->
      """WITH m AS (SELECT doc_id, 1 + doc_id % 17 AS w, 1 + doc_id % 10 AS h
        |           FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.w, m.h,
        |    CASE WHEN y.i % 4 = 1 THEN (m.doc_id + 13 * y.i) % 256
        |         WHEN y.i % 4 = 2 THEN (m.doc_id + x.i + 2 * y.i) % 256
        |         WHEN y.i % 4 = 3 THEN
        |           (CASE WHEN x.i % 2 = 0 THEN m.doc_id ELSE m.doc_id + 128 END) % 256
        |         ELSE (m.doc_id + 3 * x.i + 5 * y.i) % 256 END AS r,
        |    CASE WHEN y.i % 4 = 1 THEN (m.doc_id + 13 * y.i) % 256
        |         WHEN y.i % 4 = 2 THEN (m.doc_id + x.i + 2 * y.i + 1) % 256
        |         WHEN y.i % 4 = 3 THEN
        |           (CASE WHEN x.i % 2 = 0 THEN m.doc_id ELSE m.doc_id + 128 END + 1) % 256
        |         ELSE (2 * m.doc_id + 7 * x.i + y.i) % 256 END AS g,
        |    CASE WHEN y.i % 4 = 1 THEN (m.doc_id + 13 * y.i) % 256
        |         WHEN y.i % 4 = 2 THEN (m.doc_id + x.i + 2 * y.i + 2) % 256
        |         WHEN y.i % 4 = 3 THEN
        |           (CASE WHEN x.i % 2 = 0 THEN m.doc_id ELSE m.doc_id + 128 END + 2) % 256
        |         ELSE (5 * m.doc_id + x.i + 11 * y.i) % 256 END AS b
        |  FROM m, range(0, 17) x(i), range(0, 10) y(i)
        |  WHERE x.i < m.w AND y.i < m.h)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,

    "mm_decode_gif" ->
      """WITH m AS (SELECT doc_id, 2 + doc_id % 14 AS w, 2 + doc_id % 11 AS h
        |           FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.w, m.h,
        |    (m.doc_id + 3 * x.i + 7 * y.i) % 16 AS idx
        |  FROM m, range(0, 16) x(i), range(0, 13) y(i)
        |  WHERE x.i < m.w AND y.i < m.h),
        |ch AS (
        |  SELECT doc_id, w, h,
        |    (doc_id + 17 * idx) % 256 AS r,
        |    (2 * doc_id + 31 * idx) % 256 AS g,
        |    (3 * doc_id + 47 * idx) % 256 AS b
        |  FROM px)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b
        |FROM ch GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,

    "mm_decode_wav" ->
      """WITH m AS (SELECT doc_id, 50 + doc_id % 300 AS n,
        |                  8000 + (doc_id % 3) * 4000 AS sr FROM documents),
        |s AS (
        |  SELECT m.doc_id, m.sr, m.n,
        |    abs((m.doc_id * 31 + t.i * 17) % 4001 - 2000) AS a
        |  FROM m, range(0, 350) t(i) WHERE t.i < m.n)
        |SELECT doc_id, CAST(sr AS BIGINT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(sum(a) AS BIGINT) AS sum_abs, CAST(max(a) AS BIGINT) AS max_abs
        |FROM s GROUP BY doc_id, sr, n ORDER BY doc_id""".stripMargin,

    "mm_decode_meta" ->
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS byte_len,
         |  ${TextFunctions.fingerprintSql("text")} AS fp,
         |  1 + ${TextFunctions.fingerprintSql("text")} % 640 AS width,
         |  1 + ${TextFunctions.fingerprintSql("text")} % 480 AS height,
         |  1 + ${TextFunctions.fingerprintSql("text")} % 16 AS n_frames
         |FROM documents ORDER BY doc_id""".stripMargin,

    "stream_window_agg" ->
      s"""SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // 6h windows are epoch-aligned (Spark's window() default), so the
    // start is plain integer floor arithmetic on epoch micros
    "stream_quantile" ->
      """WITH c AS (
        |  SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS window_start_us,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) // 1000 AS bin,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT window_start_us, bin,
        |    CAST(sum(n) OVER (PARTITION BY window_start_us ORDER BY bin) AS BIGINT) AS cum,
        |    CAST(sum(n) OVER (PARTITION BY window_start_us) AS BIGINT) AS n_total
        |  FROM c),
        |r AS (SELECT *, CAST((50 * n_total + 99) // 100 AS BIGINT) AS rank FROM t)
        |SELECT window_start_us, n_total, rank,
        |  min(bin) * 1000 AS est_lo_cents,
        |  (min(bin) + 1) * 1000 - 1 AS est_hi_cents
        |FROM r WHERE cum >= rank
        |GROUP BY window_start_us, n_total, rank
        |ORDER BY window_start_us""".stripMargin,

    // each event is in the 2 hourly-aligned sliding windows whose start
    // is trunc_hour(ts) − k·1h, k ∈ {0,1} (window '2 hours' slide '1 hour')
    "stream_sliding_agg" ->
      s"""SELECT epoch_us(date_trunc('hour', ts)) - k * 3600000000 AS window_start_us,
         |  event_type, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events CROSS JOIN range(0, 2) t(k)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "stream_join" ->
      s"""WITH dim AS (
         |  SELECT user_id,
         |    CASE WHEN CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) >= 3300.0
         |         THEN 'high' ELSE 'low' END AS segment
         |  FROM events GROUP BY user_id)
         |SELECT epoch_us(date_trunc('hour', e.ts)) AS window_start_us, d.segment,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events e JOIN dim d ON e.user_id = d.user_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "stream_late_audit_ttl" ->
      s"""WITH ev0 AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
         |sb AS (SELECT *, CASE WHEN ts_us - lag(ts_us) OVER (
         |         PARTITION BY user_id ORDER BY ts_us, event_id)
         |         > ${EventStreams.StateTtlUs} THEN 1 ELSE 0 END AS brk
         |       FROM ev0),
         |ss AS (SELECT *, sum(brk) OVER (
         |         PARTITION BY user_id ORDER BY ts_us, event_id) AS sess
         |       FROM sb),
         |mxs AS (SELECT *, max(sess) OVER (PARTITION BY user_id) AS m FROM ss),
         |e AS (
         |  SELECT user_id, event_id, ts_us,
         |    event_id + ((event_id % 1000003) * 2654435761) % 1000 AS arrival
         |  FROM mxs WHERE sess = m),
         |h AS (
         |  SELECT user_id, event_id, ts_us,
         |    max(ts_us) OVER (PARTITION BY user_id ORDER BY arrival, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
         |  FROM e)
         |SELECT user_id, CAST(max(ts_us) AS BIGINT) AS last_ts_us,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(CASE WHEN ts_us < hwm THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
         |  CAST(coalesce(max(CASE WHEN ts_us < hwm THEN hwm - ts_us END), 0)
         |    AS BIGINT) AS max_late_us,
         |  (CAST(sum(CASE WHEN ts_us < hwm THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |    // count(*) AS late_ppm
         |FROM h GROUP BY user_id ORDER BY user_id""".stripMargin,

    "stream_late_audit" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    event_id + ((event_id % 1000003) * 2654435761) % 1000 AS arrival
        |  FROM events),
        |h AS (
        |  SELECT user_id, event_id, ts_us,
        |    max(ts_us) OVER (PARTITION BY user_id ORDER BY arrival, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |  FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN ts_us < hwm THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |  CAST(coalesce(max(CASE WHEN ts_us < hwm THEN hwm - ts_us END), 0)
        |    AS BIGINT) AS max_late_us,
        |  (CAST(sum(CASE WHEN ts_us < hwm THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        |    // count(*) AS late_ppm
        |FROM h GROUP BY user_id ORDER BY user_id""".stripMargin,

    "stream_dedup" ->
      s"""SELECT DISTINCT user_id, event_type,
         |  epoch_us(ts) - epoch_us(ts) % ${60L * 1000000L} AS minute_us
         |FROM events ORDER BY user_id, event_type, minute_us""".stripMargin,

    // the greedy anchor recurrence of dropDuplicatesWithinWatermark:
    // each recursion step advances every key's anchor to its next event
    // past anchor + delay; anchors strictly increase so it terminates
    "stream_dedup_within" ->
      s"""WITH RECURSIVE t AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         |em AS (
         |  SELECT user_id, event_type, min(ts_us) AS ts_us FROM t GROUP BY 1, 2
         |  UNION ALL
         |  SELECT x.user_id, x.event_type, x.nts FROM (
         |    SELECT em.user_id, em.event_type, min(t.ts_us) AS nts
         |    FROM em JOIN t ON t.user_id = em.user_id
         |      AND t.event_type = em.event_type
         |      AND t.ts_us > em.ts_us + ${EventStreams.DedupWithinDelayUs}
         |    GROUP BY em.user_id, em.event_type, em.ts_us) x
         |  WHERE x.nts IS NOT NULL)
         |SELECT user_id, event_type, ts_us FROM em
         |ORDER BY user_id, event_type, ts_us""".stripMargin,

    "stream_attr_left" ->
      s"""WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type FROM events),
         |c AS (SELECT user_id, ts_us AS c_ts_us, event_id AS c_id FROM ev WHERE event_type = 'click'),
         |p AS (SELECT event_id AS purchase_id, user_id, ts_us AS p_ts_us FROM ev WHERE event_type = 'purchase')
         |SELECT p.purchase_id, c.c_id
         |FROM p LEFT JOIN c ON c.user_id = p.user_id
         |  AND c.c_ts_us >= p.p_ts_us - 3600000000 AND c.c_ts_us <= p.p_ts_us
         |ORDER BY p.purchase_id, c.c_id ASC NULLS FIRST""".stripMargin,

    "stream_uniques" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) - epoch_us(ts) % 86400000000 AS day_us
        |  FROM events)
        |SELECT day_us, CAST(count(*) AS BIGINT) AS n_unique
        |FROM ud GROUP BY day_us ORDER BY day_us""".stripMargin,

    "pipe_clean_corpus" ->
      s"""WITH q AS (
         |  SELECT doc_id, $fpNorm AS fp_norm,
         |    CAST(len(${TextFunctions.rawTokensSql("text")}) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(${TextFunctions.rawTokensSql("text")},
         |      x -> list_contains(${graft.search.Analyzer.stopwordsSql}, x))) AS BIGINT) AS n_stop,
         |    CAST(len(list_distinct(${TextFunctions.rawTokensSql("text")})) AS BIGINT) AS n_uniq
         |  FROM documents)
         |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, fp_norm,
         |  arg_min(n_tok, doc_id) AS n_tok, CAST(count(*) AS BIGINT) AS n_dups
         |FROM q
         |WHERE n_tok >= 10 AND (10000 * n_stop) // n_tok < 4000
         |  AND (10000 * n_uniq) // n_tok > 2500
         |GROUP BY fp_norm ORDER BY doc_id""".stripMargin,

    "stream_sessionize" ->
      s"""WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, value FROM events),
         |lagged AS (
         |  SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_ts
         |  FROM ev),
         |marked AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > ${30 * 60L * 1000000L}
         |                 THEN 1 ELSE 0 END AS new_sess
         |  FROM lagged),
         |numbered AS (
         |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_no
         |  FROM marked)
         |SELECT user_id, sess_no,
         |  CAST(min(ts_us) AS BIGINT) AS start_us, CAST(max(ts_us) AS BIGINT) AS end_us,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM numbered GROUP BY user_id, sess_no
         |ORDER BY user_id, sess_no""".stripMargin,

    // batch face of the streaming funnel state machine — identical
    // recurrence (and oracle) to q_funnel_window
    "stream_funnel" -> Temporal.oracles("q_funnel_window"),
  )

  private def pairSimSql(tau: Long): String =
    s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
       |SELECT x.vec_id AS a, y.vec_id AS b, CAST(x.label AS INT) AS label,
       |  CAST(floor(${Similarity.cosineSql("x.embedding", "y.embedding")} * 1e6) AS BIGINT) AS cos_x1e6
       |FROM e x JOIN e y ON x.label = y.label AND x.vec_id < y.vec_id
       |WHERE floor(${Similarity.cosineSql("x.embedding", "y.embedding")} * 1e6) >= $tau
       |ORDER BY a, b""".stripMargin
}
