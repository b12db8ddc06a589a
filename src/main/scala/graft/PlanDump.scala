package graft

import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: `explain("formatted")` for the headline
  * queries whose physical shape SURVEY §5 promises (pushdown, pruning,
  * broadcast-vs-shuffle choices, top-k pages). PlanSpec asserts the
  * load-bearing properties in CI; this file is the human-readable pin.
  *
  * Run: tools/plans.sh [sfDir]
  */
object PlanDump {
  val Headline: Seq[String] = Seq(
    "q3_join_topk", "q5_multijoin", "q6_filter_agg", "ms_q_rank_tfidf",
    "q_asof_join", "q_range_join", "q_topk_native", "dedup_minhash_lsh",
    "q_in_subquery", "ann_ivf_topk", "pipe_contamination", "pipe_pack_sequences",
    "q_triangle_count", "q_pagerank", "q7_volume", "ms_hybrid_rrf",
    "ann_pq_topk", "q_basket_rules", "ann_filtered", "ms_collapse",
    "q_hits", "q_assortativity", "ann_mmr", "txt_bpe_train",
    // round 8: the native-expression proximity scan over the shared
    // tokenized corpus, and the range-partitioned exact rank path
    "ms_span_near", "q_power_users",
    // round 9: the TPC-H Q21 one-aggregate EXISTS/NOT-EXISTS collapse,
    // the Q9 profit star, and a shared-dedup-table consumer
    "q21_late_supplier", "q9_profit", "pipe_dup_cluster_stats",
    // round 11: the graph-ANN beam walk over the pinned denormalized
    // neighbor table, the decode→featurize→top-k chain, and the
    // batch-broadcast incremental cluster merge
    "ann_hnsw_topk", "mm_feat_topk", "pipe_cluster_merge",
    // round 12: the 2-byte-per-vector residual-quantization ADC scan,
    // the one-sided-prefix containment join, and the σ-grid centrality
    "ann_rq_topk", "dedup_containment", "q_betweenness",
    // round 13: the descent-graph beam serve, the signature-riding
    // containment estimator, and the token-bucket admission fold
    "ann_descent_topk", "dedup_containment_minhash", "stream_rate_limit",
    // round 14 (VERDICT r13 #2): close the plan-audit blindness for the
    // heavy tail — PlansCoverageSpec lints that every query whose
    // BENCH_DETAIL idle median exceeds 1 s has a section here, so the
    // list below covers everything ≥ ~0.8 s for noise headroom
    "q_ktruss", "q_bridges", "ann_recall_eval", "dedup_levenshtein",
    "q_resource_alloc", "q_adamic_adar", "q_item_sim", "q_common_neighbors",
    "pipe_dedup_corpus", "ann_ivf_pq_topk", "txt_char_entropy",
    "q_weighted_median", "ann_probe_sweep", "txt_char_trigrams",
    "dedup_lsh_sweep", "stream_rate_limit_ttl", "ann_descent_insert",
    "stream_cdc_compact",
    // round 15 (VERDICT r14 #1): the two sub-second queries the
    // driver's contended rewrite phantom-spiked past the lint — cheap
    // insurance alongside the idle-floor ledger that actually fixes it
    "ann_sq_error", "ms_significant_terms")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/root/repo/PLANS.md")
    // ad-hoc mode: `PlanDump <sfDir> --print q1 q2 …` dumps the named
    // queries' formatted plans to stdout (shuffle/broadcast audit of
    // new operators) instead of rewriting PLANS.md
    val adhoc = if (args.lift(1).contains("--print")) args.drop(2).toSeq else Nil
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // queries whose registry entry reads a memoized pinned table: dump
    // the BUILD plan (what runs at ingest) — a LogicalRDD scan says
    // nothing about the shape that matters at 100 TB
    val buildPlans: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "dedup_containment" -> ((s, d) =>
        graft.dedup.Dedup.containmentPairs(Tables.documents(s, d))),
      // the serve face reads the memoized pinned code table; the plan
      // that matters at 100 TB is the ingest-time ENCODE (r12 ADVICE)
      "ann_rq_topk" -> ((s, d) =>
        graft.similarity.Similarity.rqCodesPlan(Tables.embeddings(s, d))),
      // estimator face reads the memoized signature/band tables: dump
      // the full build (sig + bands + candidate join) instead
      "dedup_containment_minhash" -> ((s, d) => {
        val docs = Tables.documents(s, d)
        val exSh = docs.select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.explode(
            graft.dedup.Dedup.shingles(
              org.apache.spark.sql.functions.col("text"))).as("s"))
        val sig = graft.dedup.Dedup.sigFromShingles(exSh)
        graft.dedup.Dedup.containmentMinhashFrom(docs, sig,
          graft.dedup.Dedup.bandsFromSig(sig))
      }),
      // the peel loop interleaves driver scalars + checkpoints, so the
      // registry query's final plan is LogicalRDD scans; the shape that
      // matters is the ROUND BODY delta (witness semi-join → triple
      // dedup → fringe delta → broadcast decrement)
      "q_ktruss" -> ((s, d) =>
        graft.operators.Graph.ktrussDeltaPlan(s, d)),
      // r15: the PQ / IVF-PQ serve faces read memoized pinned code
      // tables (the memoRqCodes discipline extended); the 100 TB shape
      // is the ingest-time ENCODE, same as ann_rq_topk above
      "ann_pq_topk" -> ((s, d) =>
        graft.similarity.Similarity.pqCodesPlan(Tables.embeddings(s, d))),
      "ann_ivf_pq_topk" -> ((s, d) =>
        graft.similarity.Similarity.ivfPqCodesPlan(Tables.embeddings(s, d))))
    if (adhoc.nonEmpty) {
      adhoc.foreach { name =>
        println(s"\n===== $name")
        // memoized-table queries dump their BUILD plan here too, so the
        // ad-hoc audit and the pinned PLANS.md agree about the shape
        println(buildPlans.getOrElse(name, SparkEntry.queries(name))(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
      spark.stop()
      return
    }
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of headline queries (sf0.01, local[8])\n\n")
    sb.append("Generated by tools/plans.sh (graft.PlanDump) from `explain(\"formatted\")`.\n")
    sb.append("What to look for: `PushedFilters` + pruned `ReadSchema` on every scan,\n")
    sb.append("broadcast only on bounded inputs (dims, stats, candidates — never a\n")
    sb.append("fact table by hint), `TakeOrderedAndProject` for pages, partial\n")
    sb.append("aggregation before every exchange, and no `BroadcastNestedLoopJoin`\n")
    sb.append("carrying data (the BNLJs below are the 1-row scalar corpus-count\n")
    sb.append("cross join in the ranked-search scorer and the bounded broadcast\n")
    sb.append("QUERY sets of ann_filtered / mm_feat_topk against the pruned or\n")
    sb.append("featurized corpus — broadcast scalars / query grids, never a\n")
    sb.append("data-bearing side).\n")
    val descriptions = Map(
      "q3_join_topk" -> "3-way join + agg + top-k; NO broadcast hints — strategy is AQE's.",
      "q5_multijoin" -> "6-table star join; only nation/region hinted, fact edges AQE-planned.",
      "q6_filter_agg" -> "tight filter scan: every predicate pushed, 4-column ReadSchema.",
      "ms_q_rank_tfidf" -> "ranked search: melt→explode→isin→partial agg, stats broadcast, TakeOrderedAndProject page.",
      "q_asof_join" -> "as-of join as union + running last-ignoring-nulls (one shuffle per key, no range explosion).",
      "q_range_join" -> "interval join via bucket blocking (equi-join on bins + BETWEEN refine; no nested loop).",
      "q_topk_native" -> "native TopKPerKey operator: Partial above Exchange above Final, ≤k rows per key shuffled.",
      "dedup_minhash_lsh" -> "MinHash-LSH: one-pass signature aggregate, salted band join, per-pair verify.",
      "q_in_subquery" -> "NOT IN subquery: broadcast null-aware anti join (LeftAnti, BuildRight, true).",
      "ann_ivf_topk" -> "IVF ANN with pinned codebook: pure map-pass assignment, probes broadcast, corpus never shuffled.",
      "pipe_contamination" -> "decontamination: benchmark shingle set broadcast (explicit hint — eval sets are fixed-size), corpus explode→broadcast-join→agg.",
      "pipe_pack_sequences" -> "sequence packing: per-shard window cumsum — shuffle carries (doc_id, shard, n_tok) only, parallelism = shard count.",
      "q_basket_rules" -> "market-basket rules: ONE fact scan into per-order part sets (lazy checkpoint shared by pairs/items/total), pair explode bounded per order, item stats broadcast.",
      "ann_filtered" -> "filtered ANN: metadata slice applied by a broadcast semi join BEFORE any cosine math — excluded vectors never reach the distance kernel.",
      "ms_collapse" -> "field collapse: full boosted hit list → per-source argmax window → bounded top-10 of group winners; the only post-score shuffle is source-keyed.",
      "q_hits" -> "HITS: ONE fact-scale edge extraction (checkpointed), then 3 rounds of broadcast-vector joins on the N²-bounded matrix — no fact rescan in any round.",
      "q_assortativity" -> "assortativity: V-sized degree aggregate off the checkpointed edge list, two E-scale degree joins, one 8-column reduce — linear in E, no wedge work.",
      "q21_late_supplier" -> "TPC-H Q21 shape: ONE order-keyed aggregate (supplier count, late count, unique late supplier) replaces the reference's EXISTS + NOT EXISTS double self-join; status filter pushed to the orders scan.",
      "q9_profit" -> "TPC-H Q9 star: part-name filter prunes the fact scan before any join, nation broadcast, DECIMAL(18,4) line terms partial-aggregated before the exchange.",
      "pipe_dup_cluster_stats" -> "shared-dedup-table consumer: the LSH clustering is the pinned session table (one LogicalRDD scan), the query itself is two bounded rollups.",
      "ann_mmr" -> "MMR re-rank: brute top-20 candidates + their ≤400-row pairwise-cosine table checkpointed once; each greedy round is an anti-join + max + top-1 over ≤20 rows.",
      "txt_bpe_train" -> "BPE trainer: corpus scanned once for word frequencies; every merge round (pairs→argmax→replace) runs on the vocabulary table only.",
      "ann_hnsw_topk" -> "graph ANN: the memoized denormalized M-NN table is a LogicalRDD scan; each beam round broadcasts the Q×beam frontier against it — the corpus is never rescanned after entry scoring.",
      "mm_feat_topk" -> "decode→featurize→top-k: one narrow mapPartitions decode+projection pass (no shuffle), query vectors broadcast, per-query top-k window.",
      "pipe_cluster_merge" -> "incremental cluster merge: the BATCH side broadcasts into both delta candidate joins, so the corpus-scale persisted band table streams in place — O(batch) per merge, never O(corpus).",
      "ann_rq_topk" -> "residual-quantization ADC: encode is a narrow map chain over checkpointed literal-dot columns (no shuffle), the K1xK2 per-query lookup table broadcasts, scan reads 2 codes per vector.",
      "dedup_containment" -> "containment BUILD plan (the gated query reads the memoized pinned pair table; this is the ingest-time shape): smaller-side rarity prefixes equi-join the full inverted index (never prefix x prefix, never postings self-join both-full); candidate pairs verified by one in-map sorted-intersect.",
      "q_betweenness" -> "betweenness: one fact-scale edge extraction (the shared flow matrix), then 6 sigma rounds + the pair enumeration all on <=N^2-row checkpointed grids.",
      "q_ktruss" -> "k-truss ROUND BODY (the loop's audit face): pinned witness table scanned once via broadcast semi-join against the fringe, canonical-triple dedup, 3-edge delta count, broadcast decrement of the live support table - no closure re-probe anywhere.",
      "q_bridges" -> "bridge detection: everything nation-domain-bounded (<=N^2/2 candidate edges x <=N^2 closure pairs); the non-equi join excludes the removed edge over two N-bounded tables - constant in fact-table scale.",
      "ann_recall_eval" -> "recall referee: 7 method rows off memoized pinned indexes, brute referee bounded to the query grid; the plan is the per-method join of pinned pair sets against the truth set.",
      "dedup_levenshtein" -> "edit-distance dedup: LSH-banded candidate generation (never all-pairs), per-candidate-pair codegen'd levenshtein verify.",
      "q_resource_alloc" -> "resource-allocation index: reads the pinned TX3 witness table, one degree join + per-edge witness-degree sum - no intersect probe at query time.",
      "q_adamic_adar" -> "Adamic-Adar: same pinned witness-table consumer shape as resource-alloc with a log-degree weight table join.",
      "q_item_sim" -> "item similarity: degree-oriented co-occurrence with per-order bounded pair blowup; item stats broadcast into the verify.",
      "q_common_neighbors" -> "common neighbors: pinned witness-table rollup + integer Jaccard over degree joins; top-100 bounded output.",
      "pipe_dedup_corpus" -> "full prep chain: quality gate -> LSH clustering over survivors -> keep-one-per-cluster; the cluster table is the pinned session artifact, the chain is filter + two bounded joins.",
      "ann_ivf_pq_topk" -> "IVF-PQ: pinned cell assignment prunes the scan to probed cells, the per-query ADC lookup table broadcasts, scan reads codes only.",
      "txt_char_entropy" -> "char entropy: one explode-free codegen'd per-doc histogram expression pass + corpus rollup - no per-char rows shuffle.",
      "q_weighted_median" -> "weighted median: per-group sorted prefix-sum window over co-partitioned shuffles; no global sort.",
      "ann_probe_sweep" -> "IVF probe sweep: ONE pinned cell assignment shared across probe counts; per-probe recall rows are bounded joins.",
      "txt_char_trigrams" -> "char trigrams: codegen'd per-doc trigram emission, single partial-agg rollup to the bounded trigram grid.",
      "dedup_lsh_sweep" -> "LSH band-count sweep: the signature table builds once; each band setting re-buckets the pinned signatures - candidate joins only.",
      "stream_rate_limit_ttl" -> "TTL token bucket batch face: per-user sessionize window (two user-keyed shuffles) + the same aggregate() bucket fold as stream_rate_limit.",
      "ann_descent_insert" -> "search-then-link insert: held-out queries beam-walk the pinned base graph (frontier broadcast per round), top-M link window - the corpus is never rescanned.",
      "stream_cdc_compact" -> "CDC compaction batch face: two-level (user,segment)->user merge, both levels user-keyed co-partitioned shuffles; struct-max + counter sums.")
    Headline.foreach { name =>
      val df = buildPlans.getOrElse(name, SparkEntry.queries(name))(spark, sfDir)
      sb.append(s"\n## $name\n${descriptions.getOrElse(name, "")}\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
