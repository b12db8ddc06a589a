package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: pushdown, pruning, and join strategies
  * must survive refactors (SURVEY §5 — graded at 100 TB design).
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Flatten a physical plan ACROSS the boundaries `TreeNode.collect`
    * stops at: AdaptiveSparkPlanExec is a leaf (so with AQE on — the
    * default — a plain collect on executedPlan sees nothing, ADVICE r3),
    * query stages and reused exchanges wrap their subplans, and subquery
    * expressions hold whole plans of their own.
    */
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val nested: Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case _                        => p.children
    }
    p +: (nested ++ p.subqueries).flatMap(flatten)
  }

  /** Shuffle exchanges whose input rows carry the raw corpus `text`
    * column — the SURVEY §5 "never shuffle the corpus" pin, checked
    * programmatically on the executed plan (AQE-unwrapped).
    */
  private def exchangesCarryingText(df: org.apache.spark.sql.DataFrame): Int =
    flatten(df.queryExecution.executedPlan).count {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        e.child.output.exists(_.name == "text")
      case _ => false
    }

  test("q3: no broadcast hints on fact-sized inputs, filters pushed to parquet") {
    val df = operators.Relational.q3JoinTopk(spark, sf)
    // orders/customer grow with SF: the join strategy must stay with
    // Catalyst/AQE stats, never a pinned hint (VERDICT r1 #2)
    assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "fact-sized join inputs must not carry explicit broadcast hints")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"),
      "lineitem date filter must reach the scan")
  }

  test("q3 accepts runtime bloom-filter injection at cluster scan sizes") {
    // at 100 TB the fact-fact edges are shuffle joins over >10 GiB scans,
    // where Spark's InjectRuntimeFilter (on by default) semi-join-reduces
    // the big side with a bloom filter built from the filtered side.
    // Locally the thresholds keep it inert, so simulate cluster
    // conditions and pin that our hint-free plan ACCEPTS the injection —
    // a pinned broadcast hint would have blocked it.
    val c = spark.conf
    c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    c.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
    c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = operators.Relational.q3JoinTopk(spark, sf)
        .queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter_agg"),
        s"expected runtime bloom filters on q3's fact-fact edges:\n$p")
    } finally {
      c.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      c.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      c.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("q5: broadcast hints only on the fixed-cardinality dims") {
    val df = operators.Relational.q5MultiJoin(spark, sf)
    val hints = "ResolvedHint".r.findAllIn(df.queryExecution.analyzed.toString).length
    assert(hints == 2, s"expected exactly nation+region hinted, got $hints hints")
  }

  test("q6: all predicates pushed, schema pruned to 4 columns") {
    // plan toString truncates long filter lists — assert on a prefix
    val p = plan(operators.Relational.q6FilterAgg(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate:timestamp>"))
  }

  test("ranked search: top-k via TakeOrdered, term stats broadcast") {
    val p = plan(operators.Metastore.qRankTfidf(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), "page must be a top-k, not a full sort")
    assert(p.contains("BroadcastExchange"), "df stats must broadcast")
  }

  test("q_in_subquery plans as a null-aware anti join, not a nested loop over the corpus") {
    val p = plan(operators.Relational.qInSubquery(spark, sf))
    // BroadcastHashJoin's simpleString prints the isNullAwareAntiJoin
    // flag as the bare trailing `true`
    assert(p.contains("LeftAnti, BuildRight, true"),
      s"NOT IN should plan as a broadcast null-aware anti join:\n$p")
  }

  test("stream_join broadcasts the user dim, never shuffles the event stream for it") {
    val p = plan(operators.Pipeline.streamJoin(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"enrichment dim must broadcast:\n$p")
  }

  test("text-shuffle detector self-check: it DOES count a shuffle that carries text") {
    // guards the guard (ADVICE r3): a plan that repartitions the full
    // document rows must register ≥1 text-carrying exchange even under
    // AQE; if this fails the three assertions below are vacuous
    import org.apache.spark.sql.functions.col
    val shuffled = Tables.documents(spark, sf)
      .repartition(4, col("doc_id"))
      .groupBy(col("text")).count()
    assert(exchangesCarryingText(shuffled) >= 1,
      "detector found no text-carrying exchange on a plan that plainly has one")
  }

  test("corpus text never crosses a shuffle beyond the local fan-out") {
    // Tables.fanOut may repartition a single-file LOCAL scan (identity on
    // real multi-split input) — that is the only exchange allowed to
    // carry the text column; everything downstream must shuffle only
    // derived narrow columns (tokens, hashes, signatures, pairs)
    assert(exchangesCarryingText(operators.Text.cooccurrence(spark, sf)) <= 1,
      "co-occurrence may fan the scan out but must shuffle pair counts, not text")
    assert(exchangesCarryingText(operators.Metastore.qRankTfidf(spark, sf)) <= 1,
      "ranked search must not shuffle the corpus beyond the scan spreader")
    assert(exchangesCarryingText(operators.Pipeline.dedupMinhashLsh(spark, sf)) <= 1,
      "LSH dedup must shuffle signatures, not text")
  }

  test("q_profile computes every column's stats in ONE customer scan") {
    val p = plan(operators.Relational.qProfile(spark, sf))
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"profile should scan customer once, found $scans scans:\n$p")
  }

  test("dataset index scan prunes unused document columns") {
    val p = plan(operators.Metastore.filterTerm(spark, sf))
    assert(!p.contains("n_chars") || p.contains("bytes"),
      "projection should reach the scan")
    assert(p.contains("PushedFilters"))
  }

  test("graph family: no pinned broadcast of part/vertex-scale inputs") {
    // VERDICT r6 scale-killer: components/labelProp/kcore broadcast the
    // V-row label/survivor vector every round, resourceAlloc the V-row
    // degree table, basketRules the catalog-scale item frequencies —
    // all grow with the corpus (multi-GB at 100 TB ⇒ pinned-hint driver
    // OOM). Only FIXED-cardinality inputs may carry a hint: the N=25
    // nation-scale vectors (pr/dist/score), their 1-row scalars
    // (nn/mx), and 1-row aggregates (nOrders, tot). The loop-round
    // joins land in checkpointed LogicalRDDs, so a final-plan hint
    // check is vacuous there — pin the discipline at the source level
    // with an allowlist of broadcast() argument heads.
    val src = scala.io.Source.fromFile(
      "src/main/scala/graft/operators/Graph.scala", "UTF-8").mkString
    // round 8 additions: n (nation count), rmax/scal (1-row aggregates
    // over the ≤N-row eccentricity table) — all fixed-cardinality.
    // round 12: mTot (modularity's 1-row total-edge-count scalar).
    // round 14 (k-truss incremental peel): removed/destroyed/delta0 are
    // NOT fixed-cardinality but every hint on them sits behind a
    // driver-known count guard (r / destroyedBound / 3·r·(minSup−1) ≤
    // bcastCap, the cluster-merge discipline) with a shuffle-join
    // fallback — verified below by the guard-presence grep
    // round 15 (ADVICE r14): removedPlan/deltaPlan are the
    // PLAN-DUMP-ONLY heads inside ktrussDeltaPlan (never executed —
    // PLANS.md renders it); the executed guarded heads keep their own
    // names so the per-guard grep below stays 1:1 with hints that run
    // round 16 (virtual k-truss live table): cumDec/removedSoFar are
    // the fringe-sized cumulative decrement / removed sets, hinted
    // only under their driver-tracked bounds (cumDecBound accumulates
    // the 3·r·(minSup−1) per-round delta bound; removedBound the
    // removed counts) — delta0 itself is no longer hinted
    val allowed = Set("nn", "pr", "dist", "score", "mx", "nOrders",
      "n", "rmax", "scal", "mTot", "removed", "destroyed",
      "cumDec", "removedSoFar", "removedPlan", "deltaPlan")
    // the guarded heads must actually carry their guards: each specific
    // cap condition must still exist verbatim next to its broadcast
    // (a file-wide 'bcastCap' grep would stay green if one guard were
    // dropped while another survived — review r14)
    for ((h, guard) <- Seq(
        "removed" -> "if (r <= bcastCap) broadcast(removed)",
        "destroyed" -> "if (destroyedBound <= bcastCap) broadcast(destroyed)",
        "cumDec" -> "if (cumDecBound <= bcastCap) broadcast(cumDec)",
        "removedSoFar" -> "if (removedBound <= bcastCap) broadcast(removedSoFar)"))
      assert(src.contains(guard),
        s"the count guard for broadcast($h) disappeared from Graph.scala " +
          s"(expected: $guard)")
    val heads = """broadcast\((\w+)""".r
      .findAllMatchIn(src).map(_.group(1)).toList
    val bad = heads.filterNot(allowed)
    assert(bad.isEmpty,
      s"part/vertex-scale broadcast hints crept back into Graph.scala: $bad")
    // and the non-loop consumers' final plans really carry no hint
    for ((n, df) <- Seq(
        "resourceAlloc" -> operators.Graph.resourceAlloc(spark, sf),
        "commonNeighbors" -> operators.Graph.commonNeighbors(spark, sf))) {
      assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
        s"$n must not pin a broadcast of a vertex-scale table")
    }
  }

  test("hnsw build: cell-blocked candidates, no pinned corpus broadcast, no n-squared product") {
    // VERDICT r11 #1: the r11 build broadcast the whole corpus into an
    // n² non-equi cosine join (BroadcastNestedLoopJoin) — the one
    // shipped plan that could not run at 100× data. The r12 build
    // blocks candidates by the pinned IVF cells and joins on the cell
    // KEY; a size-based broadcast of the tiny local corpus is fine
    // (Catalyst picks SMJ at scale), a pinned hint or a non-equi
    // product is not.
    val df = graft.similarity.Similarity.nnGraphBuildPlan(
      spark, sf, graft.similarity.Similarity.HnswM,
      graft.similarity.Similarity.HnswBuildProbe)
    assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "hnsw build must not pin a corpus-scale broadcast hint")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"hnsw build regressed to a non-equi n² product:\n$p")
    assert(p.contains("p_cell"), s"candidate join must key on the IVF cell:\n$p")
    // and the source carries no corpus-sized broadcast() hint anywhere:
    // every head is query-batch-, model-, or 1-row-aggregate-sized
    val src = scala.io.Source.fromFile(
      "src/main/scala/graft/similarity/Similarity.scala", "UTF-8").mkString
    // r12: qtab = the RQ scan's per-query (K1×K2) ADC lookup table —
    // query-batch-sized like qq/queries, never corpus-scale
    val allowed = Set("queries", "t", "probes", "qq", "cents", "entry", "bm", "qs", "n",
      "qtab")
    val bad = """broadcast\((\w+)""".r.findAllMatchIn(src).map(_.group(1))
      .toList.filterNot(allowed)
    assert(bad.isEmpty,
      s"corpus-scale broadcast hints crept into Similarity.scala: $bad")
  }

  test("nn-descent build: vertex-keyed joins only, no pinned broadcast, no product") {
    // the descent's per-round local join must move candidates through
    // vertex-keyed equi-joins (linear in the corpus), same discipline
    // as the hnsw build pin above
    val df = graft.similarity.Similarity.nnDescentBuildPlan(
      spark, sf, graft.similarity.Similarity.NndM, 1)
    assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "nn-descent build must not pin a corpus-scale broadcast hint")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"nn-descent build regressed to a non-equi product:\n$p")
  }

  test("exact rank paths: no single-partition window over fact-scale rows") {
    // VERDICT r7 #3: q_power_users/q_ntile funneled every customer/order
    // through ONE task via Window.orderBy with no partitionBy. The
    // two-phase rankedCum prefix sum replaces that; the ONLY allowed
    // empty-partitionSpec window is the per-range offset prefix sum,
    // whose input is the ≤shuffle.partitions (pid, pn, psum) rows.
    for ((n, df) <- Seq(
        "q_power_users" -> operators.Relational.qPowerUsers(spark, sf),
        "q_ntile" -> operators.Relational.qNtile(spark, sf))) {
      val plans = flatten(df.queryExecution.executedPlan)
      val offenders = plans.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty && !w.child.output.exists(_.name == "pn") => w
      }
      assert(offenders.isEmpty,
        s"$n has a single-partition window over non-offset rows:\n${offenders.mkString("\n")}")
      // and the fact rows really are range-repartitioned for the rank
      assert(plans.exists(_.toString.contains("rangepartitioning")),
        s"$n must range-repartition by the rank order")
    }
  }

  test("suite-wide: no single-partition window over a corpus-growing domain") {
    // VERDICT r9 #1: the empty-partitionSpec ban, widened from the
    // 2-query whitelist above to ALL registry plans. A Window.orderBy
    // with no partitionBy funnels its whole input through ONE task —
    // fine iff the input domain is BOUNDED (does not grow with corpus
    // size). Every query below is on the explicit allowlist because its
    // single-partition window runs over such a domain; everything else
    // must rank/cumsum via rankedCum's range-partitioned prefix sum
    // (whose own offset window — input = one row per range partition,
    // carrying the `pn` count column — is the one shape always allowed).
    // Structurally exempt shapes, detected from the plan itself:
    //  (a) rankedCum's offset window — input is one row per range
    //      partition (carries `pn` / `psum_*` columns);
    //  (b) a window whose child subtree contains a limit (TakeOrdered /
    //      GlobalLimit / CollectLimit / LocalLimit): the ES-page family
    //      (ms_*), txt_bigram_lm's top-20-ctx rank, pipe_interleave's
    //      k-row position window — Catalyst's LimitPushDownThroughWindow
    //      already bounded the input to a page.
    // Everything else must be on the explicit bounded-DOMAIN allowlist.
    val bounded = Map(
      // day/month/time grids — cardinality grows with calendar time,
      // not with corpus bytes (~2.5k rows even at 100 TB over 7 years)
      "ms_pipeline_aggs" -> "day grid", "ms_rollover_plan" -> "day grid",
      "q_adoption" -> "month grid", "q_anomaly_dow" -> "day grid",
      "q_backlog" -> "day grid", "q_bollinger" -> "day grid",
      "q_changepoint" -> "day grid", "q_cumulative_uniques" -> "day grid",
      "q_cusum" -> "day grid", "q_dau_mau" -> "day grid",
      "q_error_budget" -> "day grid", "q_rolling_corr" -> "day grid",
      "q_rolling_median" -> "day grid", "q_runs_test" -> "day grid",
      "q_spearman" -> "day grid", "q_survival" -> "tenure-day grid",
      // fixed categorical domains
      "ms_nested_aggs" -> "source domain", "ms_terms_error" -> "source domain",
      "pipe_curriculum" -> "stage domain (4)", "pipe_oversample" -> "lang domain",
      "q_benford" -> "9 leading digits", "q_bootstrap" -> "B=200 replicates",
      "q_emd" -> "value bins", "q_rank_shift" -> "brand domain (25)",
      "q_t_closeness" -> "source x size-bucket grid",
      // two-phase skyline: the global pass runs on the per-block local
      // skylines' union — O(blocks x skyline size), not part-scale
      "q_skyline" -> "local-skyline survivor set",
      // HITS' L-inf normalization window runs over the N-row nation
      // score vector (fixed graph cardinality, never fact-scale)
      "q_hits" -> "nation-N score vector")
    // the limit must sit on the window's DIRECT input lineage — descend
    // only through single-child operators, so a limit buried on one
    // branch of a join/union can never exempt a fact-scale window
    // (ADVICE r10: the old subtree-wide exists() would have)
    @annotation.tailrec
    def limited(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _: org.apache.spark.sql.execution.LocalLimitExec => true
      case _: org.apache.spark.sql.execution.CollectLimitExec => true
      case u if u.children.length == 1 => limited(u.children.head)
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn) if !bounded.contains(name) =>
        val plans = flatten(fn(spark, sf).queryExecution.executedPlan)
        val bad = plans.exists {
          case w: org.apache.spark.sql.execution.window.WindowExec =>
            w.partitionSpec.isEmpty &&
              !w.child.output.exists(a => a.name == "pn" || a.name.startsWith("psum_")) &&
              !limited(w.child)
          case _ => false
        }
        name -> bad
    }.collect { case (name, true) => name }
    assert(offenders.isEmpty,
      s"single-partition windows outside the bounded-domain allowlist " +
        s"(${offenders.length}): ${offenders.mkString(", ")}")
  }

  test("composite agg: the after-key predicate reaches the parquet scan") {
    // the WHOLE point of after-key pagination is that the page
    // predicate is on the GROUP KEYS and prunes the SCAN — if it only
    // filters post-scan, composite paging reads the full corpus per
    // page like from/size does
    val p = plan(operators.Metastore.compositeAggQ(spark, sf))
    val pushedLine = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushedLine.contains("source"),
      s"after-key source predicate not pushed to the scan: $pushedLine")
  }

  test("round-8 page/semi shapes: distributed top-k and a real semi join") {
    // q10's top-20 must be a TakeOrderedAndProject (per-partition heaps,
    // never a global sort); q4's EXISTS must stay a LeftSemi join (one
    // probe per order, no lineitem-scale fanout into the aggregate)
    val q10 = operators.Relational.q10Returned(spark, sf)
    q10.collect()
    assert(flatten(q10.queryExecution.executedPlan)
        .exists(_.nodeName.contains("TakeOrderedAndProject")),
      "q10 page is not a distributed top-k")
    val q4 = operators.Relational.q4OrderPriority(spark, sf)
    q4.collect()
    assert(flatten(q4.queryExecution.executedPlan)
        .exists(_.toString.contains("LeftSemi")),
      "q4 EXISTS did not plan as a semi join")
  }

  test("inline postings path: term filter lands below the postings aggregate (ADVICE r15)") {
    // The no-postingsIn scoreComponents path builds the full corpus
    // postings aggregate and filters terms AFTER the groupBy, relying on
    // Catalyst pushing the isin through the Aggregate (term is a
    // grouping column). If a future postingsPlan change adds a
    // non-pushable expression, the inline path silently degrades to a
    // corpus-wide all-terms aggregation inside every timed query — pin
    // the pushdown on the optimized plan.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    // scoreComponents eagerly checkpoints tf, so inspect the exact
    // pre-checkpoint plan the inline path constructs
    val eng = graft.search.SearchEngine.datasets
    val comps = eng.postingsPlan(graft.Tables.datasetIndex(spark, sf))
      .filter(org.apache.spark.sql.functions.col("term")
        .isin(Seq("data", "quality"): _*))
    val aggs = comps.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(_.name == "tf") => a
    }
    assert(aggs.nonEmpty, "no postings aggregate (tf) found in the inline path\n" +
      comps.queryExecution.optimizedPlan.treeString)
    // Catalyst may rewrite a 2-literal isin to OR-of-equals or InSet —
    // any term-referencing filter below the aggregate is the pushdown
    val pushed = aggs.exists(_.child.collect {
      case f: Filter if f.condition.references.exists(_.name == "term") => f
    }.nonEmpty)
    assert(pushed,
      "the term isin filter did not land below the postings aggregate — " +
        "the inline path would aggregate the whole corpus vocabulary")
  }
}
