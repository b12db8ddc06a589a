package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale-curve data generator: emits the driver's table shapes
  * (TESTDATA.md) at an arbitrary scale factor so sf0.1→sf1 wall-time
  * ratios can be measured locally (VERDICT r5 item 3). Shape-matched to
  * the sf0.1 tables — same schemas, key ranges, value distributions,
  * per-order line counts, vocabulary, label skew — but NOT bit-identical
  * to the driver's seed-42 stream (the driver generator is not public to
  * this repo; scaling curves only need the same SHAPE at two sizes).
  * Deterministic: every value is a pure function of (row id, column tag)
  * via xxhash64. Never writes under /root/testdata.
  *
  * Usage: GenData <outDir> <sf> [vocabN]   (sf=1.0 → 6 M lineitem rows)
  *
  * vocabN (default 31 — the driver corpus' fixed vocabulary) sizes the
  * document vocabulary. Passing vocabN ∝ corpus size reproduces the
  * REALISTIC Heaps-law regime where the shingle space grows with the
  * data and posting-list density stays constant — the regime the exact
  * dedup operators' prefix/band filters are designed for (VERDICT r6
  * item 7: demonstrate the dup-dense 31-word blowup is a density
  * artifact, not plan blowup).
  */
object GenData {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val sf = args(1).toDouble
    val vocabN = args.lift(2).map(_.toInt).getOrElse(31)
    require(!out.startsWith("/root/testdata"), "refusing to write into the driver's testdata")
    val s = graft.GraftSession.local(logLevel = "ERROR")
    gen(s, out, sf, vocabN)
    s.stop()
  }

  /** Uniform long in [0, n) as a pure function of (id, tag). */
  private def u(tag: String, n: Long) =
    pmod(xxhash64(col("id"), lit(tag)), lit(n))
  /** Uniform double in [0, 1) as a pure function of (id, tag). */
  private def uf(tag: String) = u(tag, 1000000L).cast("double") / 1000000.0

  def gen(s: SparkSession, out: String, sf: Double, vocabN: Int = 31): Unit = {
    val par = s.sparkContext.defaultParallelism
    def rows(atSf1: Long): Long = math.max(1L, (atSf1 * sf).toLong)
    def range(n: Long): DataFrame = s.range(0, n, 1, par).toDF("id")
    // NOTE on timestamps: Spark embeds its schema in the parquet footer,
    // so an NTZ-cast write makes SPARK re-read NTZ (breaking unix_micros
    // paths) while an LTZ write makes DUCKDB read timestamptz. The
    // driver's pyarrow files carry neither footer nor UTC annotation.
    // We keep the LTZ write (Spark-side semantics match the driver) and
    // the LOCAL gate normalizes DuckDB's timestamptz to wall-UTC naive
    // for localdata dirs only (tools/local_gate.py).
    def write(df: DataFrame, name: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")

    // region/nation are SF-invariant: reproduce the driver's fixed rows
    // verbatim (queries filter on the literal region names)
    val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    write(s.range(0, 5).select(col("id").cast("int").as("r_regionkey"),
      element_at(array(regions.map(lit): _*), (col("id") + 1).cast("int")).as("r_name")), "region")
    write(s.range(0, 25).select(col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey")), "nation")

    val nCust = rows(150000L)
    val nSupp = rows(10000L)
    val nPart = rows(200000L)
    val nOrd = rows(1500000L)
    val segs = array(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY").map(lit): _*)
    write(range(nCust).select(
      col("id").as("c_custkey"),
      concat(lit("Customer#"), col("id")).as("c_name"),
      u("cn", 25).cast("int").as("c_nationkey"),
      round(uf("cb") * 11000.0 - 1000.0, 2).as("c_acctbal"),
      element_at(segs, (u("cs", 5) + 1).cast("int")).as("c_mktsegment")), "customer")

    write(range(nSupp).select(
      col("id").as("s_suppkey"),
      concat(lit("Supplier#"), col("id")).as("s_name"),
      u("sn", 25).cast("int").as("s_nationkey"),
      round(uf("sb") * 11000.0 - 1000.0, 2).as("s_acctbal")), "supplier")

    val adjs = array(Seq("large", "hot", "blue", "old", "cold", "dim", "new", "dark", "pale", "deep").map(lit): _*)
    val nouns = array(Seq("ring", "bolt", "plate", "cap", "screw", "tube", "disk", "rod").map(lit): _*)
    val types = array(Seq("LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO").map(lit): _*)
    write(range(nPart).select(
      col("id").as("p_partkey"),
      concat(element_at(adjs, (u("pa", 10) + 1).cast("int")), lit(" "),
             element_at(nouns, (u("pn", 8) + 1).cast("int"))).as("p_name"),
      concat(lit("Brand#"), u("pb", 25)).as("p_brand"),
      element_at(types, (u("pt", 6) + 1).cast("int")).as("p_type"),
      (u("ps", 50) + 1).cast("int").as("p_size"),
      round(lit(900.0) + (col("id") % 1000).cast("double") / 10.0, 1).as("p_retailprice")), "part")

    val prios = array(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW").map(lit): _*)
    // orderdate: uniform over 1995-01-01 .. 2001-08-01 (2404 days), like sf0.1
    val orders = range(nOrd).select(
      col("id").as("o_orderkey"),
      u("oc", nCust).as("o_custkey"),
      element_at(array(lit("F"), lit("O"), lit("P")), (u("os", 3) + 1).cast("int")).as("o_orderstatus"),
      round(uf("op") * 499000.0 + 1000.0, 2).as("o_totalprice"),
      timestamp_seconds(lit(788918400L) + u("od", 2404) * 86400L).as("o_orderdate"),
      element_at(prios, (u("oo", 5) + 1).cast("int")).as("o_orderpriority"))
    write(orders, "orders")

    // lineitem: 1..7 lines/order, mean ~4 (sf0.1 measures mean 4.08);
    // line blowup is what the triangle/join heavies scale on
    val li = s.read.parquet(s"$out/orders.parquet")
      .select(col("o_orderkey").as("id"), col("o_orderdate"))
      .select(col("id"), col("o_orderdate"),
        explode(sequence(lit(1), (u("ln1", 4) + u("ln2", 4) + 1).cast("int"))).as("l_linenumber"))
      .select(
        col("id").as("l_orderkey"),
        pmod(xxhash64(col("id"), col("l_linenumber"), lit("lp")), lit(nPart)).as("l_partkey"),
        pmod(xxhash64(col("id"), col("l_linenumber"), lit("ls")), lit(nSupp)).as("l_suppkey"),
        col("l_linenumber"),
        (pmod(xxhash64(col("id"), col("l_linenumber"), lit("lq")), lit(50)) + 1).cast("double").as("l_quantity"),
        round(pmod(xxhash64(col("id"), col("l_linenumber"), lit("le")), lit(10410000)).cast("double") / 100.0 + 900.0, 2).as("l_extendedprice"),
        (pmod(xxhash64(col("id"), col("l_linenumber"), lit("ld")), lit(11)).cast("double") / 100.0).as("l_discount"),
        (pmod(xxhash64(col("id"), col("l_linenumber"), lit("lt")), lit(9)).cast("double") / 100.0).as("l_tax"),
        element_at(array(lit("R"), lit("A"), lit("N")),
          (pmod(xxhash64(col("id"), col("l_linenumber"), lit("lr")), lit(3)) + 1).cast("int")).as("l_returnflag"),
        element_at(array(lit("O"), lit("F")),
          (pmod(xxhash64(col("id"), col("l_linenumber"), lit("ll")), lit(2)) + 1).cast("int")).as("l_linestatus"),
        timestamp_seconds(unix_timestamp(col("o_orderdate")) +
          (pmod(xxhash64(col("id"), col("l_linenumber"), lit("lsd")), lit(95)) + 1) * 86400L).as("l_shipdate"))
    write(li, "lineitem")

    // events: fixed 30-day window (density grows with SF, like the driver)
    val nEv = rows(1000000L)
    val nUsers = rows(15000L)
    val etypes = array(Seq("view", "click", "purchase", "signup", "error").map(lit): _*)
    write(range(nEv).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1704067200000000L) + u("ets", 30L * 86400000000L)).as("ts"),
      u("eu", nUsers).as("user_id"),
      element_at(etypes, (u("ee", 5) + 1).cast("int")).as("event_type"),
      round(uf("ev") * 560.0, 2).as("value"),
      concat(lit("{\"k\": "), u("ek", 100), lit("}")).as("props")), "events")

    // documents: same 31-word vocabulary, 8..102 words (mean n_chars ~290),
    // same language/source mix — the dedup/text heavies scale on doc count
    // and shared-shingle density, both preserved
    val nDoc = rows(50000L)
    val vocab = array(Seq("a", "agg", "batch", "big", "column", "customer", "data",
      "dup", "fast", "filter", "group", "hash", "join", "key", "line", "merge",
      "order", "part", "query", "row", "scan", "slow", "small", "sort", "spark",
      "stream", "table", "the", "value", "vector", "window").map(lit): _*)
    // dup structure like the driver corpus (it has exact-dup groups and
    // LSH-findable near-dups): 1% exact copies (id%100==57 clones id-57),
    // 5% near-dups (id%20==19 clones id-19 minus its last word) — the
    // dup-pair count stays PROPORTIONAL to corpus size, so dedup queries
    // do real verify work at every SF
    val docs = range(nDoc)
      .withColumn("srcid",
        when(pmod(col("id"), lit(100)) === 57, col("id") - 57)
          .when(pmod(col("id"), lit(20)) === 19, col("id") - 19)
          .otherwise(col("id")))
      .withColumn("nw", (pmod(xxhash64(col("srcid"), lit("dw")), lit(95)) + 8).cast("int"))
      .withColumn("nw", when(pmod(col("id"), lit(20)) === 19 && pmod(col("id"), lit(100)) =!= 57,
        greatest(col("nw") - 1, lit(7))).otherwise(col("nw")))
      .select(
        col("id").as("doc_id"),
        // vocabN ≤ 31: the driver's fixed word list (shape-matched
        // density). vocabN > 31: synthetic "w<k>" tokens over a
        // vocabulary that the caller sizes ∝ corpus — Zipf-free uniform
        // draw keeps posting lists ∝ nDoc/vocabN, i.e. CONSTANT when
        // vocab grows linearly with the corpus (the Heaps regime)
        array_join(transform(sequence(lit(1), col("nw")),
          i =>
            if (vocabN <= 31)
              element_at(vocab, (pmod(xxhash64(col("srcid"), i, lit("dt")), lit(31)) + 1).cast("int"))
            else
              concat(lit("w"), pmod(xxhash64(col("srcid"), i, lit("dt")), lit(vocabN)))),
          " ").as("text"),
        when(u("dl", 20) < 8, "en").when(u("dl", 20) < 11, "zh")
          .when(u("dl", 20) < 14, "es").when(u("dl", 20) < 17, "fr")
          .otherwise("de").as("lang"),
        concat(lit("src"), u("ds", 20)).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    write(docs, "documents")

    // embeddings: 64-dim float vectors in 10 label clusters (center a pure
    // function of (label, dim); noise of (id, dim)) — ANN heavies scale on
    // corpus size at fixed dim/cluster structure
    val nVec = rows(20000L)
    write(range(nVec).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        ((pmod(xxhash64(pmod(xxhash64(col("id"), lit("el")), lit(10)), j, lit("ec")), lit(2000)).cast("double") / 1000.0 - 1.0) +
         (pmod(xxhash64(col("id"), j, lit("en")), lit(1000)).cast("double") / 1000.0 - 0.5) * 0.3
        ).cast("float")).as("embedding"),
      pmod(xxhash64(col("id"), lit("el")), lit(10)).cast("int").as("label")), "embeddings")
  }
}
