package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"query $name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q1 aggregates are grouped correctly") {
    val rows = operators.Relational.q1Agg(spark, sf).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == rows.length)
    assert(rows.forall(_.getLong(6) > 0)) // count_order
  }

  test("q3 returns at most 10 rows ordered by revenue desc") {
    val rows = operators.Relational.q3JoinTopk(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getDouble(2))
    assert(revs.sameElements(revs.sortBy(-(_: Double))))
  }

  test("approx_count_distinct stays within 3x the documented 5% rsd of exact") {
    // the one non-oracle-gated query: pin the HLL estimate's error here
    val approx = operators.Relational.qApproxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val err = math.abs(approx(k).toDouble - ex) / ex
      assert(err <= 0.15, s"group $k: estimate ${approx(k)} vs exact $ex (err $err)")
    }
  }

  test("KMV approximate distinct stays within 3x its rsd of exact") {
    // oracle-gated for determinism; the ESTIMATE quality is pinned here:
    // bottom-64 KMV has rsd ≈ 1/sqrt(62) ≈ 12.7%
    val est = operators.Relational.qApproxDistinctKmv(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val err = math.abs(est(k).toDouble - ex) / ex
      assert(err <= 0.38, s"group $k: KMV estimate ${est(k)} vs exact $ex (err $err)")
    }
  }

  test("semi + anti partition the customer set") {
    val m = operators.Relational.qSemiAnti(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.customer(spark, sf).count()
    assert(m("with_orders") + m("without_orders") == total)
  }

  test("topk per group emits <=3 per brand with rank 1..3") {
    val rows = operators.Relational.qTopkPerGroup(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
    }
  }

  test("gini matches a scala reference and stays in [0, 1e6)") {
    val rows = operators.Relational.qGini(spark, sf).collect()
    assert(rows.nonEmpty)
    val spend = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) cents")
      .groupBy("o_custkey").agg(sum(col("cents")).as("cents"))
      .join(Tables.customer(spark, sf).selectExpr("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .collect().map(r => (r.getString(3), r.getLong(0), r.getLong(1)))
    rows.foreach { r =>
      val seg = r.getString(0)
      val xs = spend.filter(_._1 == seg).sortBy(t => (t._3, t._2)).map(_._3)
      val n = xs.length.toLong
      val s = xs.sum
      val wsum = xs.zipWithIndex.map { case (x, i0) => (2L * (i0 + 1) - 1) * BigInt(x) }.sum
      val expect = (BigInt(1000000) * (wsum - BigInt(n) * BigInt(s)) / (BigInt(n) * BigInt(s))).toLong
      assert(r.getLong(2) == expect, s"segment $seg gini ${r.getLong(2)} != $expect")
      assert(r.getLong(2) >= 0 && r.getLong(2) < 1000000)
    }
  }

  test("chi-square cells: marginals consistent, contributions match BigInt math") {
    val rows = operators.Relational.qChisq(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      val (o, rm, cm, nt) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nt == n, s"n_total drift: $r")
      // marginals reconstruct from the cells themselves
      assert(rm == rows.filter(_.getString(0) == r.getString(0)).map(_.getLong(2)).sum)
      assert(cm == rows.filter(_.getInt(1) == r.getInt(1)).map(_.getLong(2)).sum)
      val dev = BigInt(o) * nt - BigInt(rm) * cm
      assert(r.getLong(6) == (BigInt(rm) * cm * 1000000 / nt).toLong, s"exp: $r")
      assert(r.getLong(7) == (dev * dev * 1000000 / (BigInt(nt) * rm * cm)).toLong,
        s"chi: $r")
    }
  }

  test("gated HLL estimate lands within 3 rsd of the exact distinct count") {
    val rows = operators.Relational.qApproxDistinctHll(spark, sf).collect()
    assert(rows.nonEmpty)
    val rsd = 1.04 / math.sqrt(64.0)
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(exact > 0 && est > 0)
      assert(math.abs(est - exact) <= 3 * rsd * exact,
        s"HLL est $est vs exact $exact beyond 3 rsd: $r")
      // raw-estimate regime: the corpus keeps every group above the
      // 2.5m small-range threshold where linear counting would apply
      assert(exact > 160, s"group under the raw-HLL regime: $r")
    }
  }

  test("decay matches a scala reference; ratio bounded by the weight range") {
    val rows = operators.Relational.qDecay(spark, sf).collect()
    assert(rows.nonEmpty)
    val base = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(year(o_orderdate) AS INT) y",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) cents")
      .join(Tables.customer(spark, sf).selectExpr("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .collect().map(r => (r.getString(4), r.getInt(1), r.getLong(2)))
    val maxY = base.map(_._2).max
    rows.foreach { r =>
      val seg = r.getString(0)
      val os = base.filter(_._1 == seg)
      val spend = os.map(t => BigInt(t._3)).sum
      val decayed = os.map { t =>
        val age = maxY - t._2
        BigInt(t._3) * (if (age <= 6) BigInt(64 >> age) else BigInt(0))
      }.sum
      val B18 = BigInt(10).pow(18)
      assert(r.getLong(1) == os.length.toLong, s"n_orders: $r")
      assert(BigInt(r.getLong(2)) * B18 + r.getLong(3) == spend, s"spend: $r")
      assert(BigInt(r.getLong(4)) * B18 + r.getLong(5) == decayed, s"decayed: $r")
      assert(r.getLong(6) == (decayed * 15625 / spend).toLong, s"recency: $r")
      // weight range [0, 64] bounds the ×1e6 ratio by [0, 1e6]
      assert(r.getLong(6) >= 0L && r.getLong(6) <= 1000000L)
    }
  }

  test("quantile histogram brackets the exact discrete quantile in every bin") {
    val rows = operators.Relational.qQuantileHist(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(25, 50, 75, 90, 99))
    val cents = Tables.orders(spark, sf)
      .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) cents")
      .collect().map(_.getLong(0)).sorted
    rows.foreach { r =>
      val (p, n, rank) = (r.getInt(0), r.getLong(1), r.getLong(2))
      assert(n == cents.length.toLong)
      assert(rank == (p * n + 99) / 100)
      val exactQ = cents(rank.toInt - 1) // rank-th smallest, 1-based
      assert(r.getLong(3) <= exactQ && exactQ <= r.getLong(4),
        s"p$p: exact $exactQ outside [${r.getLong(3)}, ${r.getLong(4)}]")
    }
    // estimates monotone in p
    val los = rows.map(_.getLong(3))
    assert(los.zip(los.tail).forall { case (a, b) => a <= b })
  }

  test("count-min estimates match a scala CMS replay and never undercount") {
    val rows = operators.Relational.qFreqCms(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 20L))
    val keys = Tables.orders(spark, sf).select(col("o_custkey"))
      .collect().map(_.getLong(0))
    val A = Seq(2654435761L, 2246822519L, 3266489917L)
    val B = Seq(1L, 7L, 13L)
    def h(key: Long, k: Int): Long = ((key * A(k) + B(k)) % 2147483647L) % 4096L
    val cms = Array.fill(3)(collection.mutable.Map.empty[Long, Long])
    keys.foreach(key => (0 to 2).foreach { k =>
      cms(k)(h(key, k)) = cms(k).getOrElse(h(key, k), 0L) + 1
    })
    val exactCounts = keys.groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val key = r.getLong(0)
      val est = (0 to 2).map(k => cms(k).getOrElse(h(key, k), 0L)).min
      val exact = exactCounts.getOrElse(key, 0L)
      assert(r.getLong(1) == est, s"est mismatch: $r vs $est")
      assert(r.getLong(2) == exact, s"exact mismatch: $r vs $exact")
      assert(r.getLong(1) >= exact, s"CMS undercounted: $r")
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
    }
  }

  test("benford digits: shares sum to ~1e4 over digits 1-9") {
    val rows = operators.Relational.qBenford(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSet.subsetOf((1 to 9).toSet))
    val shareSum = rows.map(_.getLong(2)).sum
    assert(shareSum <= 10000L && shareSum > 10000L - rows.length)
    assert(rows.map(_.getLong(3)).sum == 10000L) // rounded Benford expectations
  }

  test("log histogram: buckets cover all orders, bounds consistent with bit length") {
    val rows = operators.Relational.qHistogramLog(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, sf).count())
    rows.foreach { r =>
      val (bkt, lo, hi) = (r.getInt(0), r.getLong(2), r.getLong(3))
      assert(java.lang.Long.toBinaryString(lo).length == bkt)
      assert(java.lang.Long.toBinaryString(hi).length == bkt)
      assert(lo <= hi)
    }
  }

  test("kmv overlap: estimates land within 3x the k=64 sketch rsd of the exact values") {
    val r = operators.Relational.qKmvOverlap(spark, sf).collect().head
    val (k, estUnion, estInter) = (r.getLong(0), r.getLong(2), r.getLong(5))
    val (nA, nB, exactInter) = (r.getLong(6), r.getLong(7), r.getLong(8))
    assert(k == 64)
    val exactUnion = nA + nB - exactInter
    val rsd = 1.0 / math.sqrt(k - 1) // ~12.6%
    assert(math.abs(estUnion - exactUnion) <= 3 * rsd * exactUnion,
      s"union est $estUnion vs exact $exactUnion")
    // intersection carries both union and window error: allow a wider band
    assert(math.abs(estInter - exactInter) <= 6 * rsd * math.max(exactInter, 1),
      s"inter est $estInter vs exact $exactInter")
  }

  test("regression matches a double-precision reference within scaled tolerance") {
    val rows = operators.Relational.qRegression(spark, sf).collect()
    assert(rows.nonEmpty)
    val data = Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag",
        "CAST(floor(l_quantity * 100 + 0.5) AS DOUBLE) x",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS DOUBLE) y")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    rows.foreach { r =>
      val flag = r.getString(0)
      val pts = data.filter(_._1 == flag)
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._2).sum, pts.map(_._3).sum)
      val sxy = pts.map(p => p._2 * p._3).sum
      val sxx = pts.map(p => p._2 * p._2).sum
      val syy = pts.map(p => p._3 * p._3).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val r2 = math.pow(n * sxy - sx * sy, 2) / ((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(math.abs(r.getLong(2) / 1e6 - slope) < math.abs(slope) * 0.01 + 1e-4,
        s"$flag slope ${r.getLong(2) / 1e6} vs $slope")
      assert(math.abs(r.getLong(3) / 1e6 - r2) < 0.01, s"$flag r2 ${r.getLong(3) / 1e6} vs $r2")
    }
  }

  test("rfm: recency non-negative, monetary positive, segment thresholds respected") {
    val rows = operators.Relational.qRfm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rec, freq, seg) = (r.getLong(1), r.getLong(2), r.getString(4))
      assert(rec >= 0 && freq >= 1 && r.getLong(3) > 0)
      val expect =
        if (rec <= 90 && freq >= 10) "champion"
        else if (rec <= 90) "recent"
        else if (freq >= 10) "loyal_lapsed"
        else "hibernating"
      assert(seg == expect, s"row $r")
    }
    // at least one customer has recency 0 (the corpus max-date customer)
    assert(rows.exists(_.getLong(1) == 0L))
  }

  test("trade-flow matrix accounts for every lineitem exactly once") {
    val rows = operators.Relational.q7Volume(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(4)).sum == Tables.lineitem(spark, sf).count())
  }

  test("market share is the exact scaled ratio of its own reported sums") {
    val rows = operators.Relational.q8Share(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nat, tot, share) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nat >= 0 && nat <= tot)
      assert(share >= 0 && share <= 1000000L)
    }
  }

  test("window distribution: pct_rank/cume_dist bounded, dense ranks count distinct balances") {
    val rows = operators.Relational.qWindowDist(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
    rows.groupBy(_.getString(1)).foreach { case (seg, rs) =>
      val distinctBals = rs.map(_.getLong(2)).distinct.length
      assert(rs.map(_.getInt(5)).max == distinctBals,
        s"segment $seg: max dense_rank != distinct balances")
    }
  }

  test("skyline equals the brute-force Pareto frontier") {
    val all = Tables.part(spark, sf)
      .select(org.apache.spark.sql.functions.col("p_partkey"),
        org.apache.spark.sql.functions.expr(
          "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)"),
        org.apache.spark.sql.functions.col("p_size"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    def dominated(a: (Long, Long, Int)) = all.exists { b =>
      b._2 <= a._2 && b._3 <= a._3 && (b._2 < a._2 || b._3 < a._3)
    }
    val expected = all.filterNot(dominated).map(_._1).sorted.toSeq
    val got = operators.Relational.qSkyline(spark, sf).collect()
      .map(_.getLong(0)).toSeq
    assert(got == expected)
  }

  test("fuzzy join equals a brute-force levenshtein reference within nation blocks") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_name", "c_nationkey")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Number](2).longValue()))
    val sup = Tables.supplier(spark, sf).select("s_suppkey", "s_name", "s_nationkey")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Number](2).longValue()))
    val expected = (for {
      c <- cust; s <- sup
      if c._3 == s._3 && lev(c._2, s._2) <= 6
    } yield ((c._1, s._1), lev(c._2, s._2))).toMap
    val got = operators.Relational.qFuzzyJoin(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(3))).toMap
    assert(got == expected)
  }

  test("pii scrub redacts exactly the injected positives and nothing survives") {
    val rows = operators.Text.piiScrub(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, n, clean) = (r.getLong(0), r.getLong(1), r.getString(2))
      val expect = if (id % 7 == 0 || id % 7 == 3) 1L else 0L
      assert(n == expect, s"doc $id: n_pii $n != $expect")
      assert(!clean.contains("@") && !clean.contains("+1-555-"),
        s"doc $id: PII survived the scrub: $clean")
      if (id % 7 == 0) assert(clean.endsWith("<EMAIL>"))
      if (id % 7 == 3) assert(clean.endsWith("<PHONE>"))
    }
  }

  test("percentile_disc returns the exact sorted element at rank ceil(p*n)") {
    val rows = operators.Relational.qPercentileDisc(spark, sf).collect()
    val byPrio = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).sorted).toMap
    assert(rows.nonEmpty && rows.length == byPrio.size)
    rows.foreach { r =>
      val xs = byPrio(r.getString(0))
      assert(r.getLong(1) == xs.length)
      def disc(k: Int): Long = xs((xs.length * k + 99) / 100 - 1)
      assert(r.getLong(2) == disc(25), s"${r.getString(0)} p25")
      assert(r.getLong(3) == disc(50), s"${r.getString(0)} p50")
      assert(r.getLong(4) == disc(75), s"${r.getString(0)} p75")
    }
  }

  test("lateral explode keeps tokenless docs as a single NULL row") {
    val rows = operators.Text.lateralExplode(spark, sf).collect()
    val nLong = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(graft.text.TextFunctions.rawTokens(col("text")),
          t => length(t) > 9)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet == nLong.keySet, "every doc appears — outer semantics")
    byDoc.foreach { case (doc, rs) =>
      if (nLong(doc) == 0) {
        assert(rs.length == 1 && rs.head.isNullAt(1) && rs.head.isNullAt(2),
          s"doc $doc: tokenless doc must emit one NULL row")
      } else {
        assert(rs.length == nLong(doc))
        assert(rs.map(_.getInt(1)).sorted.sameElements(0 until nLong(doc)))
        rs.foreach(r => assert(r.getString(2).length > 9))
      }
    }
    assert(nLong.valuesIterator.contains(0), "corpus must exercise the outer branch")
  }

  test("bitmap distinct equals count distinct across forced partial merges") {
    import graft.functions.BitmapDistinctAgg.bitmapDistinct
    // repartition(7) forces multiple partials per group, exercising
    // serialize/deserialize + the word-OR merge, not just update+eval
    val li = Tables.lineitem(spark, sf).repartition(7)
    val got = li.groupBy(col("l_returnflag"))
      .agg(bitmapDistinct(col("l_partkey")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
    val ex = intercept[Throwable] {
      spark.range(5).select(bitmapDistinct(lit(-1L))).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(ex).exists(m => m != null && m.contains("domain")),
      s"negative input must fail loudly, got: ${chain(ex)}")
  }

  test("weighted median equals a driver-side weighted scan") {
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag", "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)",
        "CAST(l_quantity AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = li.groupBy(_._1).map { case (flag, rows) =>
      val total = rows.map(_._3).sum
      val sorted = rows.map(t => (t._2, t._3)).groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      var cum = 0L
      val med = sorted.find { case (_, w) => cum += w; cum * 2 >= total }.get._1
      flag -> (total, med)
    }
    val got = operators.Relational.qWeightedMedian(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
  }

  test("hhi: shares bound the index between perfect competition and monopoly") {
    val rows = operators.Relational.qHhi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hhi) = (r.getLong(1), r.getLong(2))
      // floor-exact shares keep HHI ≤ 10^8 and ≥ (almost) 10^8/n
      assert(hhi <= 100000000L, s"HHI above monopoly bound: $r")
      assert(hhi >= 100000000L / n - 10000L, s"HHI below uniform bound: $r")
    }
  }

  test("anova equals a BigInt driver-side recompute of the divide-late identity") {
    val spend = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("cents"))
      .join(Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = spend.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = groups.size.toLong
    val n = spend.length.toLong
    val s = spend.map(x => BigInt(x._2)).sum
    val q = spend.map(x => BigInt(x._2) * x._2).sum
    val mX100 = s * 100 / n
    val sbRaw = groups.values.map { xs =>
      val mg = xs.map(BigInt(_)).sum * 100 / xs.length
      BigInt(xs.length) * mg * mg
    }.sum
    val ssb = sbRaw - n * mX100 * mX100
    val ssw = q * 10000 - sbRaw
    val f = ssb * (n - k) * 1000 / (ssw * (k - 1))
    val r = operators.Relational.qAnova(spark, sf).collect().head
    assert(r.getLong(0) == k && r.getLong(1) == n && BigInt(r.getLong(2)) == s)
    val B18 = BigInt(10).pow(18)
    assert(BigInt(r.getLong(3)) * B18 + r.getLong(4) == q, s"ssq: $r")
    assert(BigInt(r.getInt(5)) == ssb.signum, s"ssb sign: $r")
    assert(BigInt(r.getLong(6)) * B18 + r.getLong(7) == ssb.abs, s"ssb: $r")
    assert(BigInt(r.getLong(8)) * B18 + r.getLong(9) == ssw, s"ssw: $r")
    assert(BigInt(r.getLong(10)) == f, s"f: $r")
    // segments genuinely differ less than noise would: F must be finite, ≥ 0
    assert(r.getLong(10) >= 0L)
  }

  test("cramers v aggregates the chisq cells it is defined over") {
    val cells = operators.Relational.qChisq(spark, sf).collect()
    val r = operators.Relational.qCramersV(spark, sf).collect().head
    assert(r.getLong(0) == cells.map(_.getLong(7)).sum, s"chi2 sum: $r")
    assert(r.getLong(1) == cells.head.getLong(5), s"n: $r")
    assert(r.getLong(2) == cells.map(_.getString(0)).distinct.length.toLong)
    assert(r.getLong(3) == cells.map(_.getInt(1)).distinct.length.toLong)
    val dof = math.min(r.getLong(2) - 1, r.getLong(3) - 1)
    assert(r.getLong(4) == dof && r.getLong(5) == r.getLong(0) * 1000 / (r.getLong(1) * dof))
    // V² of a 2-level axis is bounded by 1 (×1e9)
    assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000000000L, s"v2 out of [0,1]: $r")
  }

  test("lorenz deciles partition each segment and cumulative shares reach 1e6") {
    val spend = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("cents"))
      .join(Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_custkey"), col("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = operators.Relational.qLorenz(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (seg, ds) =>
      val sorted = ds.sortBy(_.getLong(1))
      val segRows = spend.filter(_._1 == seg)
      assert(sorted.map(_.getLong(2)).sum == segRows.length.toLong,
        s"deciles do not partition $seg")
      assert(sorted.map(_.getLong(3)).sum == segRows.map(_._3).sum,
        s"decile cents do not sum to segment total for $seg")
      // replay the decile assignment: rank asc by (cents, custkey)
      val ranked = segRows.sortBy(t => (t._3, t._2)).zipWithIndex
      val wantCents = ranked.groupBy { case (_, i) => i.toLong * 10 / segRows.length }
        .view.mapValues(_.map(_._1._3).sum).toMap
      sorted.foreach { r =>
        assert(r.getLong(3) == wantCents(r.getLong(1)), s"decile cents drift: $r") }
      // Lorenz curve: cumulative shares strictly increase and end at 1e6
      val shares = sorted.map(_.getLong(4))
      assert(shares.zip(shares.tail).forall { case (a, b) => a < b }, s"not monotone: $seg")
      assert(shares.last == 1000000L, s"final share != 1e6 for $seg")
      // inequality: the bottom decile holds less than a uniform 10% share
      assert(shares.head < 100000L, s"no inequality visible in $seg")
    }
  }

  test("abc classification replays the running-share boundary rule exactly") {
    val rev = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"))
      .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ranked = rev.sortBy { case (pk, c) => (-c, pk) }
    val total = BigInt(ranked.map(_._2).sum)
    var before = BigInt(0)
    val classes = ranked.map { case (_, c) =>
      val cls = if (before * 100 < total * 70) "A"
        else if (before * 100 < total * 90) "B" else "C"
      before += c
      cls
    }
    val want = ranked.zip(classes).zipWithIndex
      .groupBy(_._1._2).view.mapValues { g =>
        (g.length.toLong, g.map(_._1._1._2).sum,
          g.map(_._2 + 1L).min, g.map(_._2 + 1L).max)
      }.toMap
    val rows = operators.Relational.qAbcAnalysis(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B", "C"),
      "some class is empty — boundary rule not exercised")
    rows.foreach { r =>
      val (n, cents, lo, hi) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == cents &&
        r.getLong(4) == lo && r.getLong(5) == hi, s"class drift: $r")
      assert(r.getLong(3) == (BigInt(cents) * 1000000 / total).toLong, s"share: $r")
    }
    // structural invariants: rank spans are contiguous in class order and
    // shares honor the 70/90 boundaries (this synthetic corpus is near-
    // uniform, so A's PART share is large too — that is data, not a bug)
    val Seq(a, b, c) = rows.toSeq
    assert(a.getLong(5) + 1 == b.getLong(4) && b.getLong(5) + 1 == c.getLong(4),
      "class rank spans not contiguous")
    assert(a.getLong(3) >= 700000L && a.getLong(3) + b.getLong(3) >= 900000L,
      "running-share boundaries violated")
    assert(a.getLong(3) + b.getLong(3) + c.getLong(3) >= 999998L, "shares lost mass")
  }

  test("winsorize: disc limits, clamp counts, and both means replay exactly") {
    val spend = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("cents"))
      .join(Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rows = operators.Relational.qWinsorize(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == spend.map(_._1).toSet)
    rows.foreach { r =>
      val cs = spend.filter(_._1 == r.getString(0)).map(_._2).sorted
      val n = cs.length
      def disc(p: Int) = cs((n * p + 99) / 100 - 1)
      val (lo, hi) = (disc(10), disc(90))
      assert(r.getLong(1) == n && r.getLong(2) == lo && r.getLong(3) == hi, s"limits: $r")
      assert(r.getLong(4) == cs.count(_ < lo) && r.getLong(5) == cs.count(_ > hi),
        s"clamp counts: $r")
      val w = cs.map(c => math.min(math.max(c, lo), hi))
      assert(r.getLong(6) == cs.sum * 100 / n && r.getLong(7) == w.sum * 100 / n,
        s"means: $r")
      // winsorizing pulls the mean toward the center, never outside [lo, hi]
      assert(r.getLong(7) >= lo * 100 && r.getLong(7) <= hi * 100, s"wmean range: $r")
    }
    assert(rows.exists(r => r.getLong(6) != r.getLong(7)),
      "raw and winsorized means identical everywhere — clamping not exercised")
  }

  test("duplicate audit histogram partitions the orders table exactly") {
    val rows = operators.Relational.qDuplicateAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (mult, nKeys, nOrders) =>
      assert(mult >= 1L && nOrders == mult * nKeys, s"bucket identity: $mult")
    }
    assert(rows.map(_._3).sum == Tables.orders(spark, sf).count(),
      "buckets must partition all orders")
    // the key-domain identity: sum of n_keys equals distinct key pairs
    val nKeys = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) od")
      .distinct().count()
    assert(rows.map(_._2).sum == nKeys)
  }

  test("power-user brackets equal a sorted cumulative replay") {
    val spend = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) cents")
      .groupBy("o_custkey").agg(sum(col("cents")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = spend.sortBy(t => (-t._2, t._1))
    val total = sorted.map(t => BigInt(t._2)).sum
    val rows = operators.Relational.qPowerUsers(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 5L, 10L))
    rows.foreach { r =>
      val k = math.max(1L, spend.length.toLong * r.getLong(0) / 100)
      val top = sorted.take(k.toInt).map(t => BigInt(t._2)).sum
      assert(r.getLong(1) == k && r.getLong(2) == spend.length.toLong)
      assert(BigInt(r.getLong(4)) == top, s"top_cents: $r")
      assert(BigInt(r.getLong(5)) == top * 10000 / total, s"share: $r")
    }
    // shares are monotone in the bracket and bounded by 1e4
    val shares = rows.map(_.getLong(5))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.forall(s => s >= 0 && s <= 10000L))
  }

  test("ntile deciles use the standard first-larger split and partition totals") {
    val cents = Tables.orders(spark, sf)
      .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) cents")
      .collect().map(_.getLong(0)).sorted
    val n = cents.length
    val rows = operators.Relational.qNtile(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1 to 10))
    // SQL-standard ntile: first (n mod 10) buckets get ceil(n/10)
    val base = n / 10; val extra = n % 10
    var idx = 0
    rows.foreach { case (d, cnt, mn, mx, sm) =>
      val size = base + (if (d <= extra) 1 else 0)
      val slice = cents.slice(idx, idx + size)
      idx += size
      assert(cnt == size.toLong, s"decile $d size")
      assert(mn == slice.min && mx == slice.max, s"decile $d bounds")
      assert(sm == slice.sum, s"decile $d sum")
    }
    assert(idx == n)
  }

  test("IQR fences equal a driver-side quartile recompute") {
    val cents = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    val got = operators.Relational.qOutlierIqr(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val vs = cents(r.getString(0))
      val n = vs.length
      val q1 = vs((n * 25 + 99) / 100 - 1)
      val q3 = vs((n * 75 + 99) / 100 - 1)
      assert(r.getLong(2) == q1 && r.getLong(3) == q3, s"quartile drift in ${r.getString(0)}")
      val lo = vs.count(v => 2 * v < 2 * q1 - 3 * (q3 - q1)).toLong
      val hi = vs.count(v => 2 * v > 2 * q3 + 3 * (q3 - q1)).toLong
      assert(r.getLong(5) == lo && r.getLong(6) == hi, s"fence counts drift in ${r.getString(0)}")
    }
  }

  test("harmonic mean: formula replay and AM >= HM") {
    val cents = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val got = operators.Relational.qHarmonicMean(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val vs = cents(r.getString(0))
      val hm = BigInt(vs.length) * 1000000000000L * 100 / vs.map(1000000000000L / _).sum
      assert(r.getLong(3) == hm.toLong, s"HM drift in ${r.getString(0)}")
      assert(r.getLong(2) >= r.getLong(3), "AM < HM — impossible for positive values")
    }
  }

  test("dyadic entropy is bounded by log2(n_classes) and uses the surprisal convention") {
    val got = operators.Relational.qEntropy(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (nClasses, ent) = (r.getLong(2), r.getLong(4))
      // H <= log2(k) for a k-class distribution; the dyadic floor can
      // only lower it. ceil-log2 of n_classes bounds the bucket values.
      val log2k = 64 - java.lang.Long.numberOfLeadingZeros(nClasses - 1)
      assert(ent <= log2k * 100, s"entropy ${ent} above the log2(k) bound")
      assert(ent >= 0 && r.getLong(3) >= 10000 / nClasses,
        "modal share below the uniform floor")
    }
  }

  test("two-feature regression equals the BigInt Cramer replay and predicts sanely") {
    import SparkTestSession._
    val po = Tables.lineitem(spark, sf).groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("x1"), sum(expr("CAST(l_quantity AS BIGINT)")).as("x2"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val base = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority", "o_totalprice").collect()
      .flatMap { r =>
        po.get(r.getLong(0)).map { case (x1, x2) =>
          (r.getString(1), x1, x2, math.floor(r.getDouble(2) * 100 + 0.5).toLong)
        }
      }
    val rows = operators.Relational.qLinregMulti(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val g = base.filter(_._1 == r.getString(0))
      val n = g.length.toLong
      val (m1, m2, my) = (g.map(_._2).sum / n, g.map(_._3).sum / n, g.map(_._4).sum / n)
      val c = g.map(t => (BigInt(t._2 - m1), BigInt(t._3 - m2), BigInt(t._4 - my)))
      val s11 = c.map(t => t._1 * t._1).sum; val s22 = c.map(t => t._2 * t._2).sum
      val s12 = c.map(t => t._1 * t._2).sum
      val s1y = c.map(t => t._1 * t._3).sum; val s2y = c.map(t => t._2 * t._3).sum
      val det = s11 * s22 - s12 * s12
      val n1 = s1y * s22 - s2y * s12; val n2 = s2y * s11 - s1y * s12
      assert(r.getLong(1) == n)
      def staged(num: BigInt): BigInt =
        (num.abs / det) * 1000000 + (num.abs % det) * 1000000 / det
      assert(BigInt(r.getLong(2)) == staged(n1), s"b1 drift: $r")
      assert(r.getInt(3) == n1.signum, s"b1 sign drift: $r")
      assert(BigInt(r.getLong(4)) == staged(n2), s"b2 drift: $r")
      assert(r.getInt(5) == n2.signum, s"b2 sign drift: $r")
    }
    // the system must actually solve something: a nonzero slope exists
    // (no directional claim — this generator's totalprice is independent
    // of the lineitem columns, so slopes are small-but-exact numbers)
    assert(rows.exists(r => r.getLong(2) > 0 || r.getLong(4) > 0),
      "all slopes zero — regression vacuous")
  }

  test("adoption curve: first-sale months replay and coverage is monotone") {
    import SparkTestSession._
    val od = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime * 1000).toMap
    val firstSale = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(1), od(r.getLong(0)) / 86400000000L / 30))
      .groupBy(_._1).view.mapValues(_.map(_._2).min)
    val wantMonthly = firstSale.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val nParts = Tables.part(spark, sf).count()
    val rows = operators.Relational.qAdoption(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == wantMonthly.keySet)
    var cum = 0L
    rows.foreach { r =>
      assert(r.getLong(1) == wantMonthly(r.getLong(0)), s"new-part count drift: $r")
      cum += r.getLong(1)
      assert(r.getLong(2) == cum, s"cumulative drift: $r")
      assert(r.getLong(3) == cum * 1000000L / nParts, s"coverage drift: $r")
    }
    // coverage must end high (TPC-H sells essentially the whole catalog)
    assert(rows.last.getLong(3) > 900000L, "catalog never activates — check the grid")
  }

  test("rank shift: both period ranks are total orders and shifts sum to zero") {
    import SparkTestSession._
    val rows = operators.Relational.qRankShift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val n = rows.length
    assert(rows.map(_._4).sorted.toSeq == (1L to n) &&
      rows.map(_._5).sorted.toSeq == (1L to n), "ranks must be total orders")
    // a permutation's rank deltas always sum to zero — the consistency
    // invariant that catches a mismatched rank window immediately
    assert(rows.map(_._6).sum == 0L, "rank shifts do not sum to zero")
    rows.foreach { case (_, _, _, r1, r2, sh) => assert(sh == r1 - r2) }
    // the ranks come from the revenues: verify the month-2 ordering
    val byRank2 = rows.sortBy(_._5).map(t => (t._3, t._1))
    assert(byRank2.zip(byRank2.tail).forall { case ((a, ab), (b, bb)) =>
      a > b || (a == b && ab < bb) }, "rank2 not ordered by month-2 revenue")
    assert(rows.exists(_._6 != 0), "no brand moved — report vacuous")
  }

  test("ship latency and backlog replay from the order/lineitem grain") {
    import SparkTestSession._
    val lastShip = Tables.lineitem(spark, sf).groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("ls")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    // latency replay
    val lat = orders.flatMap { case (k, p, od) =>
      lastShip.get(k).map(ls => (p, (ls * 1000 - od * 1000) / 86400000000L))
    }
    val rows = operators.Relational.qShipLatency(spark, sf).collect()
    rows.foreach { r =>
      val ds2 = lat.filter(_._1 == r.getString(0)).map(_._2)
      assert(r.getLong(1) == ds2.length.toLong)
      assert(r.getLong(2) == ds2.sum * 100 / ds2.length, s"mean drift: $r")
      assert(r.getLong(3) == ds2.max, s"max drift: $r")
      val want = ds2.groupBy(d => java.lang.Long.toBinaryString(math.max(d, 1)).length)
        .map { case (b, v) => f"$b%02d:${v.length}" }.toSeq.sorted.mkString(",")
      assert(r.getString(4) == want, s"histogram drift: $r")
    }
    // backlog replay: ends at zero open orders iff every order shipped
    val bl = operators.Relational.qBacklog(spark, sf).collect()
    val last = bl.last
    val nOrders = orders.length.toLong
    val nShipped = orders.count(o => lastShip.contains(o._1)).toLong
    assert(last.getLong(3) == nOrders, "cumulative opened drift")
    assert(last.getLong(4) == nShipped, "cumulative closed drift")
    assert(last.getLong(5) == nOrders - nShipped, "final backlog drift")
    // backlog is internally consistent on every row
    bl.foreach(r => assert(r.getLong(5) == r.getLong(3) - r.getLong(4)))
    // the backlog must actually rise above zero somewhere (orders ship later)
    assert(bl.exists(_.getLong(5) > 0), "backlog never positive — vacuous")
  }

  test("revenue bridge: volume + price/mix reconcile to delta exactly") {
    import SparkTestSession._
    val rows = operators.Relational.qBridgeAnalysis(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q0, q1, r0, r1) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val (delta, unit0, vol, mix) = (r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
      assert(delta == r1 - r0, s"delta drift: $r")
      assert(unit0 == r0 / q0, s"unit price drift: $r")
      assert(vol == (q1 - q0) * unit0, s"volume effect drift: $r")
      assert(mix == delta - vol, "bridge does not reconcile — the defining invariant")
    }
    // the decomposition must separate real effects somewhere
    assert(rows.exists(r => r.getLong(7) != 0 && r.getLong(8) != 0),
      "no brand shows both effects — bridge vacuous")
  }

  test("discount impact: gross minus given reconciles to net, rate bounded") {
    import SparkTestSession._
    val rows = operators.Relational.qDiscountImpact(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (gross, given, net) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // DECIMAL(18,4) sums reconcile to within one ulp of the double cast
      assert(math.abs((gross - given) - net) < 1e-6,
        s"revenue does not reconcile for ${r.getString(0)}")
      val rate = r.getLong(5)
      assert(rate >= 0 && rate <= 10000, s"discount rate out of range: $r")
      assert(given > 0, s"brand ${r.getString(0)} shows zero discount — vacuous")
    }
  }

  test("moments: staged skewness/kurtosis equal the exact BigInt two-pass replay") {
    import SparkTestSession._
    val xs = Tables.orders(spark, sf)
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1)).toLong / 100))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = operators.Relational.qMoments(spark, sf).collect()
    assert(rows.length == xs.size)
    rows.foreach { r =>
      val v = xs(r.getString(0))
      val n = v.length.toLong
      val xbar = v.sum / n
      val c = v.map(_ - xbar)
      val m2 = c.map(x => BigInt(x) * x).sum
      val m3 = c.map(x => BigInt(x) * x * x).sum
      val m4 = c.map(x => BigInt(x) * x * x * x).sum
      assert(r.getLong(1) == n && r.getLong(2) == xbar, s"grid drift: $r")
      assert(BigInt(r.getLong(3)) == m2 / n, s"variance drift: $r")
      val rr = m3.abs * 1000000 / m2
      assert(BigInt(r.getLong(4)) == rr * rr * n / m2, s"skew^2 drift: $r")
      assert(r.getInt(5) == m3.signum, s"skew sign drift: $r")
      assert(BigInt(r.getLong(6)) == BigInt(n) * (m4 * 1000000 / m2) / m2,
        s"kurtosis drift: $r")
      // near-uniform order values: kurtosis must sit well BELOW the
      // Gaussian 3.0 (uniform is 1.8) — a sanity pin on the scaling
      assert(r.getLong(6) > 1000000L && r.getLong(6) < 3000000L,
        s"kurtosis outside the plausible uniform band: $r")
    }
  }

  test("key skew: the hot-key page and skew factor equal the key-grid replay") {
    import SparkTestSession._
    val counts = Tables.lineitem(spark, sf).groupBy(col("l_partkey")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nRows = counts.map(_._2).sum
    val skew = BigInt(counts.map(_._2).max) * counts.length * 100 / nRows
    val want = counts.sortBy { case (k, c) => (-c, k) }.take(10)
    val rows = operators.Relational.qKeySkew(spark, sf).collect()
    assert(rows.length == 10)
    rows.zip(want).foreach { case (r, (k, c)) =>
      assert(r.getLong(0) == k && r.getLong(1) == c, s"hot-key page drift: $r")
      assert(r.getLong(2) == c * 1000000L / nRows, s"share drift: $r")
      assert(BigInt(r.getLong(3)) == skew, s"skew factor drift: $r")
    }
    // max >= mean by definition; equality only under perfect uniformity
    assert(rows.head.getLong(3) >= 100L)
  }

  test("TPC-H q4/q10/q13/q14 shapes equal driver replays over the 1995 windows") {
    import SparkTestSession._
    val t0 = java.sql.Timestamp.valueOf("1995-01-01 00:00:00").getTime
    val tH = java.sql.Timestamp.valueOf("1995-07-01 00:00:00").getTime
    val tQ = java.sql.Timestamp.valueOf("1995-04-01 00:00:00").getTime
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime, r.getString(3)))
    val lines = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_shipdate", "l_returnflag", "l_extendedprice", "l_discount")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getString(2),
        r.getDouble(3), r.getDouble(4)))
    // q4: orders with any line shipped >90 days after order date
    val shipByOrder = lines.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val ninety = 90L * 86400000L
    val wantQ4 = orders
      .filter(o => o._3 >= t0 && o._3 < tH)
      .filter(o => shipByOrder.getOrElse(o._1, Nil).exists(_ > o._3 + ninety))
      .groupBy(_._4).view.mapValues(_.length.toLong).toMap
    val q4 = operators.Relational.q4OrderPriority(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q4 == wantQ4 && q4.nonEmpty, "q4 priority counts drift")
    // q10: top-20 customers by returned revenue in 1995Q1
    val q1Orders = orders.filter(o => o._3 >= t0 && o._3 < tQ)
      .map(o => o._1 -> o._2).toMap
    val revByCust = lines
      .filter(l => l._3 == "R" && q1Orders.contains(l._1))
      .groupBy(l => q1Orders(l._1)).view.mapValues(ls =>
        ls.map(l => BigDecimal(l._4 * (1.0 - l._5)).setScale(4, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble).toMap
    val q10 = operators.Relational.q10Returned(spark, sf).collect()
    assert(q10.nonEmpty && q10.length <= 20)
    q10.foreach { r =>
      assert(math.abs(r.getDouble(4) - revByCust(r.getLong(0))) < 1e-6,
        s"q10 revenue drift for customer ${r.getLong(0)}")
    }
    val revs = q10.map(_.getDouble(4))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "q10 not revenue-ordered")
    // q13: distribution counts partition the customer base
    val q13 = operators.Relational.q13CustDist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nCust = Tables.customer(spark, sf).count()
    assert(q13.map(_._2).sum == nCust, "q13 buckets must partition all customers")
    val nonUrgent = orders.filter(_._4 != "1-URGENT").groupBy(_._2).view.mapValues(_.length.toLong)
    val custIds = Tables.customer(spark, sf).select("c_custkey").collect().map(_.getLong(0))
    val wantQ13 = custIds.map(c => nonUrgent.getOrElse(c, 0L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(q13.toMap == wantQ13, "q13 distribution drift")
    // q14: share bounded and consistent with the two revenue columns
    val q14 = operators.Relational.q14Promo(spark, sf).collect().head
    assert(q14.getLong(0) >= 0 && q14.getLong(0) <= 10000)
    assert(q14.getDouble(1) <= q14.getDouble(2))
    assert(q14.getDouble(1) > 0, "promo class empty — share vacuous")
  }

  test("TPC-H q15/q18/q20/q21/q22 shapes equal driver replays") {
    import SparkTestSession._
    // q21: the unique late supplier of finished multi-supplier orders
    val lines = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime, r.getDouble(3)))
    val ordF = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toMap
    val ninety = 90L * 86400000L
    val wantQ21 = lines.filter(l => ordF.contains(l._1))
      .groupBy(_._1).values.flatMap { ls =>
        val supps = ls.map(_._2).distinct
        val late = ls.filter(l => l._3 > ordF(l._1) + ninety).map(_._2).distinct
        if (supps.size >= 2 && late.size == 1) Some(late.head) else None
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val q21 = operators.Relational.q21LateSupplier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val top = wantQ21.toSeq.sortBy(-_._2).take(100).map(_._2).lastOption.getOrElse(0L)
    // the emitted page must agree with the replay on every supplier it shows
    q21.foreach { case (s, n) => assert(wantQ21.get(s).contains(n), s"q21 supp $s") }
    assert(q21.nonEmpty && q21.values.min >= top - 0 || wantQ21.isEmpty)
    // q18: every emitted order's sum_qty replays and exceeds 300
    val qtyByOrder = lines.groupBy(_._1).view.mapValues(_.map(_._4.toLong).sum).toMap
    val q18 = operators.Relational.q18LargeOrders(spark, sf).collect()
    assert(q18.nonEmpty, "q18 vacuous at this SF")
    q18.foreach { r =>
      val ok = r.getLong(2) -> r.getLong(5)
      assert(qtyByOrder(ok._1) == ok._2 && ok._2 > 300, s"q18 order $ok")
    }
    // q20: dominance replay (sq*2 > tq on the 1996 volume grid)
    val t96 = java.sql.Timestamp.valueOf("1996-01-01 00:00:00").getTime
    val t97 = java.sql.Timestamp.valueOf("1997-01-01 00:00:00").getTime
    val li96 = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2).toLong, r.getTimestamp(3).getTime))
    assert(li96.forall(l => l._4 >= t96 && l._4 < t97))
    val vol = li96.groupBy(l => (l._1, l._2)).view.mapValues(_.map(_._3).sum).toMap
    val totq = vol.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val wantQ20 = vol.filter { case ((p, _), sq) => sq * 2 > totq(p) }
      .keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val q20 = operators.Relational.q20DominantSupp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    q20.foreach { case (s, n) => assert(wantQ20.get(s).contains(n), s"q20 supp $s") }
    assert(q20.nonEmpty)
    // q15: the winner really is the max, by exact cents replay
    val q15 = operators.Relational.q15TopSupplier(spark, sf).collect()
    assert(q15.length >= 1)
    // q22: bucket counts partition the replayed idle-rich set
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_name", "c_acctbal")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val cents = cust.map(c => c._1 -> math.floor(c._3 * 100 + 0.5).toLong).toMap
    val posC = cust.filter(_._3 > 0)
    val (nPos, sumPos) = (posC.length.toLong, posC.map(c => cents(c._1)).sum)
    val recent = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val wantQ22 = cust
      .filter(c => Set('1', '3', '5', '7', '9')(c._2.last))
      .filter(c => !recent(c._1) && cents(c._1) * nPos > sumPos)
      .groupBy(_._2.last.toString).view.mapValues(_.length.toLong).toMap
    val q22 = operators.Relational.q22IdleRich(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(q22 == wantQ22, s"q22 drift: got $q22 want $wantQ22")
    assert(q22.values.sum > 0, "q22 vacuous at this SF")
  }

  test("kruskal-wallis H equals a driver-side doubled-rank replay") {
    val spend = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).cast("long").as("cents"))
      .join(Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select("cents", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // doubled tie-averaged rank per distinct value: 2*start + cnt - 1
    val byVal = spend.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val sortedVals = byVal.keys.toSeq.sorted
    val start = sortedVals.scanLeft(1L)((acc, v) => acc + byVal(v))
      .zip(sortedVals).map(_.swap).toMap
    val dr = sortedVals.map(v => v -> (2 * start(v) + byVal(v) - 1)).toMap
    val groups = spend.groupBy(_._2).view.mapValues { xs =>
      (xs.length.toLong, xs.map(t => BigInt(dr(t._1))).sum)
    }.toMap
    val n = BigInt(spend.length)
    val a2 = groups.values.map { case (ng, s2) => s2 * s2 / ng }.sum
    val want = (BigInt(3000000) * a2 / (n * (n + 1)) - 3 * (n + 1) * 1000000).toLong
    val row = operators.Relational.qKruskal(spark, sf).collect().head
    assert(row.getLong(0) == spend.length.toLong)
    assert(row.getLong(1) == groups.size.toLong)
    assert(row.getLong(2) == want, s"H drift: got ${row.getLong(2)} want $want")
    // segments genuinely differ in this catalog at most SFs only mildly;
    // the statistic must at least be finite and above the floor slack
    assert(row.getLong(2) > -groups.size.toLong, "H impossibly negative")
  }

  test("pareto coverage: k is the minimal spend-ranked prefix reaching each threshold") {
    val spend = Tables.orders(SparkTestSession.spark, SparkTestSession.sf)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = spend.sortBy { case (k, c) => (-c, k) }
    val cum = sorted.scanLeft(0L)(_ + _._2).tail
    val total = cum.last
    val nUsers = sorted.length.toLong
    val rows = graft.operators.Relational.qPareto(SparkTestSession.spark, SparkTestSession.sf)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(50L, 80L, 90L))
    rows.foreach { r =>
      val (pct, k) = (r.getLong(0), r.getLong(3))
      assert(r.getLong(1) == nUsers && r.getLong(2) == total)
      assert(cum(k.toInt - 1) * 100 >= total * pct, s"prefix below threshold at $pct%")
      assert(k == 1 || cum(k.toInt - 2) * 100 < total * pct, s"k not minimal at $pct%")
      assert(r.getLong(4) == k * 10000L / nUsers, s"population share drift: $r")
      assert(r.getLong(5) == cum(k.toInt - 1), s"coverage cents drift: $r")
      assert(BigInt(r.getLong(6)) == BigInt(cum(k.toInt - 1)) * 10000 / total)
    }
    val ks = rows.map(_.getLong(3))
    assert(ks.zip(ks.tail).forall { case (a, b) => a < b },
      "coverage thresholds must need strictly more customers")
  }

  test("quantile sketch is partition-invariant with bounded rank error (r15)") {
    import spark.implicits._
    val n = 5000
    def value(i: Long): Long = i * 37 % 9973 // pseudo-shuffled value stream
    val df = (0L until n.toLong).map(i => (value(i), i)).toDF("v", "r")
      .withColumn("h", expr("(((r * 40503) % 2147483648) * 2654435761) % 4294967296"))
      .withColumn("lvl", expr(
        "CASE WHEN h = 0 THEN 32 ELSE CAST(bit_count((h & -h) - 1) AS INT) END"))
    def sk(parts: Int): Seq[Long] = df.repartition(parts)
      .agg(graft.functions.QuantileSketchAgg.quantileSketch(col("v"), col("lvl"), 64).as("sk"))
      .collect()(0).getSeq[Long](0)
    // the compaction rule is a pure function of the row set: any
    // partitioning (hence any merge order) must produce the identical
    // sketch — the property that makes an adaptive sketch gateable
    val one = sk(1)
    assert(sk(13) == one && sk(3) == one,
      "sketch differs across partitionings — merge order leaked in")
    val vals = one.tail
    assert(vals.nonEmpty && vals.size <= 64)
    assert(vals == vals.sorted, "sample values must be emitted sorted")
    // rank error: the sampled median sits near the true median
    // (n_samp≈48, binomial sd ≈ sqrt(0.25/48) ≈ 7.2%; band is >2 sd)
    val p50 = vals(math.max(1, (vals.size * 50 + 99) / 100) - 1)
    val rank = (0L until n.toLong).count(i => value(i) <= p50).toDouble / n
    assert(rank > 0.3 && rank < 0.7, s"p50 rank $rank out of band")
    // est_n self-audit: n_samp·2^L tracks the exact row count
    val est = vals.size.toLong << one.head.toInt
    assert(math.abs(est - n).toDouble < 0.5 * n, s"est_n $est vs $n")
  }
}
