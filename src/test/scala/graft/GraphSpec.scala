package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  import SparkTestSession._

  test("pagerank: mass stays within flooring slack of the full scale, floor is the teleport share") {
    val rows = Graph.pagerank(spark, sf).collect()
    assert(rows.length == 25)
    val n = rows.length
    val base = ((1000000000000L * 15) / 100) / n
    rows.foreach(r => assert(r.getLong(1) >= base, s"rank below teleport floor: $r"))
    val mass = rows.map(_.getLong(1)).sum
    // each of the n ranks floors at most twice per round (div by wt, div by 100),
    // dangling mass is zero on this graph (every nation has out-edges)
    assert(mass <= 1000000000000L)
    assert(mass > 1000000000000L - 1000L * n, s"mass $mass lost too much to flooring")
  }

  test("pagerank is non-uniform and iteration-sensitive") {
    val r5 = Graph.pagerank(spark, sf).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r1 = Graph.pagerank(spark, sf, iters = 1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r5.values.toSet.size > 1, "five rounds left a uniform vector")
    assert(r5 != r1, "iterations 1 and 5 agree — fixpoint loop is not iterating")
  }

  test("bfs hop distances equal a driver-side Dijkstra on the extracted edges") {
    val got = Graph.bfs(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // rebuild the edge list exactly as the operator does
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sf).selectExpr("c_custkey", "CAST(c_nationkey AS LONG) src")
    val supp = Tables.supplier(spark, sf).selectExpr("s_suppkey", "CAST(s_nationkey AS LONG) dst")
    val edges = li.join(ord, org.apache.spark.sql.functions.col("l_orderkey") ===
        org.apache.spark.sql.functions.col("o_orderkey"))
      .join(cust, org.apache.spark.sql.functions.col("o_custkey") ===
        org.apache.spark.sql.functions.col("c_custkey"))
      .join(supp, org.apache.spark.sql.functions.col("l_suppkey") ===
        org.apache.spark.sql.functions.col("s_suppkey"))
      .select("src", "dst").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val dist = scala.collection.mutable.Map(0L -> 0L)
    var frontier = Set(0L)
    var h = 0L
    while (frontier.nonEmpty && h < 6) {
      h += 1
      frontier = frontier.flatMap(u => adj.getOrElse(u, Array.empty[Long]))
        .filterNot(dist.contains)
      frontier.foreach(v => dist(v) = h)
    }
    val expected = got.keySet.map(nk => nk -> dist.getOrElse(nk, -1L)).toMap
    assert(got == expected)
  }

  test("triangle counts equal a brute-force reference on sf0.001") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges: Set[(Long, Long)] = li.groupBy(_._1).values.flatMap { lines =>
      val ps: Seq[Long] = lines.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val triCount = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, bs) <- adj; b <- bs
      cs <- adj.get(b); c <- cs
      if edges.contains((a, c))
    } {
      triCount(a) += 1; triCount(b) += 1; triCount(c) += 1
    }
    val got = Graph.triangleCounts(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == triCount.toMap, "per-part triangle counts diverge from reference")
  }

  test("witness-count audit row equals a brute-force recompute of E, degrees, wedge bound and T") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges: Set[(Long, Long)] = li.groupBy(_._1).values.flatMap { lines =>
      val ps: Seq[Long] = lines.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val wedgeBound = edges.toSeq.map(e => math.min(deg(e._1), deg(e._2))).sum
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var t = 0L
    for {
      (a, bs) <- adj; b <- bs
      cs <- adj.get(b); c <- cs
      if edges.contains((a, c))
    } t += 1
    val r = Graph.witnessCount(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == edges.size.toLong, "n_edges")
    assert(row.getLong(1) == deg.values.max, "max_deg")
    assert(row.getLong(2) == wedgeBound, "wedge_bound")
    assert(row.getLong(3) == t, "n_triangles")
    assert(row.getLong(4) == 3 * t, "n_witness_rows = 3T")
  }

  test("ktruss: two fixed peel rounds + output recount equal a driver-side replay") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges0: Set[(Long, Long)] = li.groupBy(_._1).values.flatMap { lines =>
      val ps: Seq[Long] = lines.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    def supportOf(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val sup = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
      for {
        (a, bs) <- adj; b <- bs
        cs <- adj.get(b); c <- cs
        if es.contains((a, c))
      } { sup((a, b)) += 1; sup((a, c)) += 1; sup((b, c)) += 1 }
      sup.toMap.withDefaultValue(0L)
    }
    def replay(minSup: Long): (Seq[(Long, Long, Long)], Int) = {
      var es = edges0
      for (_ <- 1 to 2) { val sp = supportOf(es); es = es.filter(e => sp(e) >= minSup) }
      val fin = supportOf(es)
      (es.toSeq.map(e => (e._1, e._2, fin(e)))
        .sortBy(t => (-t._3, t._1, t._2)).take(100), es.size)
    }
    val (want, _) = replay(2L)
    val got = Graph.ktruss(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"ktruss diverged:\n got=${got.take(5)}\nwant=${want.take(5)}")
    // the gated k=4 face peels nothing on this dense spec-SF graph
    // (every co-purchase edge sits in ≥2 triangles), so the PEEL is
    // exercised at k=30: edges genuinely drop and the replay still
    // matches — the recurrence, not just the support count, is pinned
    val (want30, size30) = replay(28L)
    val got30 = Graph.ktruss(spark, sf, k = 30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got30 == want30, s"k=30 ktruss diverged:\n got=${got30.take(5)}\nwant=${want30.take(5)}")
    assert(size30 < edges0.size, "k=30 peeled nothing — raise k in the spec")
  }

  test("bridges equal a driver-side remove-edge reachability check") {
    val got = Graph.bridges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // rebuild the same top-3 flow edge set driver-side
    val flows = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_nationkey").cast("long").as("src")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sf)
        .select(col("s_suppkey"), col("s_nationkey").cast("long").as("dst")),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val top3 = flows.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (-e._3, e._2)).take(3)
    }
    val und = top3.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    def reachable(edges: Set[(Long, Long)], from: Long, to: Long): Boolean = {
      val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      var seen = Set(from); var frontier = Set(from)
      while (frontier.nonEmpty && !seen.contains(to)) {
        frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty)) -- seen
        seen ++= frontier
      }
      seen.contains(to)
    }
    val want = und.map { e =>
      e -> (if (reachable(und - e, e._1, e._2)) 0L else 1L)
    }.toMap
    assert(got.keySet == want.keySet, "edge sets diverge")
    assert(got == want,
      s"bridge flags diverge: ${got.toSet -- want.toSet} vs ${want.toSet -- got.toSet}")
  }

  test("common-neighbor scores equal a brute-force adjacency recompute") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = (edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val scored = edges.toSeq.map { case (a, b) =>
      val cn = (adj(a) & adj(b)).size.toLong
      (a, b, cn, adj(a).size.toLong, adj(b).size.toLong,
        if (cn > 0) cn * 1000000L / (adj(a).size + adj(b).size - cn) else 0L)
    }.filter(_._3 > 0)
    val want = scored.sortBy(t => (-t._6, t._1, t._2)).take(100)
    val got = Graph.commonNeighbors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, "edge scores diverge from the brute-force recompute")
  }

  test("degree distribution buckets partition the vertex set on power-of-two bounds") {
    val rows = Graph.degreeDist(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, mn, mx) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(mn >= (1L << (b - 1).toInt) && mx < (1L << b.toInt),
        s"degree outside bucket bounds: $r")
    }
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nVertices = li.groupBy(_._1).values.flatMap { rows2 =>
      val ps = rows2.map(_._2).distinct.toSeq
      if (ps.length >= 2) ps else Nil
    }.toSet.size
    assert(rows.map(_.getLong(1)).sum == nVertices.toLong,
      "bucket counts do not partition the vertex set")
  }

  test("clustering coefficients equal a brute-force per-vertex recompute") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { rows2 =>
      val ps = rows2.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val want = adj.toSeq.filter(_._2.size >= 2).map { case (v, ns) =>
      val tri = ns.toSeq.combinations(2).count { case Seq(x, y) =>
        edges.contains((math.min(x, y), math.max(x, y)))
      }.toLong
      val deg = ns.size.toLong
      (v, deg, tri, tri * 2000000L / (deg * (deg - 1)))
    }.sortBy(_._1)
    val got = Graph.clusteringCoeff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, "clustering coefficients diverge from the brute force")
    assert(got.forall(_._4 <= 1000000L), "cc above 1")
  }

  test("resource-allocation index equals a brute-force witness-degree sum") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { rows2 =>
      val ps = rows2.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val scored = edges.toSeq.map { case (a, b) =>
      val ws = adj(a) & adj(b)
      (a, b, ws.size.toLong, ws.toSeq.map(w => 1000000000L / adj(w).size).sum)
    }.filter(_._3 > 0)
    val want = scored.sortBy(t => (-t._4, t._1, t._2)).take(100)
    val got = Graph.resourceAlloc(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, "RA scores diverge from the brute-force recompute")
  }

  test("adamic-adar equals a brute-force dyadic witness sum and ranks rare witnesses higher") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { rows2 =>
      val ps = rows2.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def bitlen(x: Long): Long = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val scored = edges.toSeq.map { case (a, b) =>
      val ws = adj(a) & adj(b)
      (a, b, ws.size.toLong, ws.toSeq.map(w => 1000000L / bitlen(adj(w).size.toLong)).sum)
    }.filter(_._3 > 0)
    val want = scored.sortBy(t => (-t._4, t._1, t._2)).take(100)
    val got = Graph.adamicAdar(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, "AA scores diverge from the brute-force recompute")
    assert(got.nonEmpty)
  }

  test("closeness and diameter derive from the same distance grid as apsp") {
    val apspRows = Graph.apsp(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val n = Tables.nation(spark, sf).count()
    val got = Graph.closeness(spark, sf).collect()
    got.foreach { r =>
      val (nr, _, s) = apspRows(r.getLong(0))
      assert(r.getLong(1) == nr && r.getLong(2) == s, "closeness inputs drift from apsp")
      val want = if (s > 0) (nr - 1) * (nr - 1) * 1000000L / ((n - 1) * s) else 0L
      assert(r.getLong(3) == want, s"closeness formula drift at src ${r.getLong(0)}")
    }
    val dia = Graph.graphDiameter(spark, sf).collect()
    val rMax = apspRows.values.map(_._1).max
    val full = apspRows.filter(_._2._1 == rMax)
    val eccs = full.values.map(_._2)
    val row = dia.head
    assert(row.getLong(0) == full.size && row.getLong(1) == eccs.max &&
      row.getLong(2) == eccs.min, "diameter/radius drift from apsp eccentricities")
    assert(row.getLong(3) == eccs.count(_ == eccs.min) &&
      row.getLong(4) == eccs.count(_ == eccs.max), "center/periphery counts drift")
  }

  test("avg-neighbor-degree buckets reproduce a brute-force knn curve") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { rows2 =>
      val ps = rows2.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sym = edges.toSeq.flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
    val want = sym.groupBy { case (a, _) => 64L - java.lang.Long.numberOfLeadingZeros(deg(a)) }
      .map { case (bucket, es) =>
        val s = es.map { case (_, b) => deg(b) }.sum
        (bucket, es.size.toLong, s, s * 1000000L / es.size)
      }.toSeq.sortBy(_._1)
    val got = Graph.avgNeighborDegree(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, "knn curve diverges from the brute-force recompute")
  }

  test("kcore: 12 rounds reach the fixpoint and equal a driver-side peel of the repeat graph") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairOrders = li.groupBy(_._1).toSeq.flatMap { case (ok, rows2) =>
      val ps = rows2.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield ((ps(i), ps(j)), ok)
    }
    var edges = pairOrders.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2)
      .keys.toSet
    var stable = false
    while (!stable) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (v, o) => v -> o.size }
      val next = edges.filter(e => deg(e._1) >= 3 && deg(e._2) >= 3)
      stable = next == edges
      edges = next
    }
    val want = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, o) => v -> o.size.toLong }
    val r12 = Graph.kcore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r12 == want, "12-round peel diverges from the driver-side fixpoint")
    val r13 = Graph.kcore(spark, sf, rounds = 13).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r12 == r13, "round 12 is not a fixpoint — raise R")
    assert(r12.nonEmpty, "3-core empty — graph too sparse to exercise the peel")
    assert(r12.values.forall(_ >= 3L), "core member below degree k")
  }

  test("label propagation equals a driver-side replay of the majority-vote rounds") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairOrders = li.groupBy(_._1).toSeq.flatMap { case (ok, rows2) =>
      val ps = rows2.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield ((ps(i), ps(j)), ok)
    }
    val rep = pairOrders.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keys.toSeq
    val sym = rep.flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
    val inNbrs = sym.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var lbl: Map[Long, Long] = sym.map(_._1).distinct.map(v => v -> v).toMap
    for (_ <- 1 to 6) {
      lbl = inNbrs.map { case (v, ns) =>
        val counts = ns.map(lbl).groupBy(identity).view.mapValues(_.size).toSeq
        v -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val want = lbl.groupBy(_._2).map { case (l, m) =>
      (l, m.size.toLong, m.keys.min, m.keys.max)
    }.toSeq.sortBy(_._1)
    val got = Graph.labelProp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, "LPA communities diverge from the synchronous replay")
  }

  test("labelProp has NOT converged at R — exactly-R-rounds is a semantic contract (VERDICT r7 #6)") {
    // Synchronous LPA on bipartite-like structure does not converge:
    // labels keep swapping round over round (the classic caveat —
    // SCALING.md measures a 5.7k-row swap at 10× data; probing here
    // shows it is not even a clean period-2 cycle: rounds 6, 7 AND 8
    // all differ). The engine's "defined as exactly R rounds" wording
    // is therefore load-bearing — the answer is a function of R, and
    // this pins that on the ENGINE plans, not just prose. sf0.001's
    // 200-vertex graph collapses to ONE community (converged — no
    // witness there), so this runs at sf0.01 where the swap was
    // measured.
    val oscSf = "/root/testdata/sf0.01"
    def run(iters: Int): Seq[(Long, Long, Long, Long)] =
      Graph.labelProp(spark, oscSf, iters).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(run(6) != run(7),
      "oscillation witness gone: rounds R and R+1 agree — if LPA now converges, " +
        "update the exactly-R-rounds contract docs and this pin together")
  }

  test("modularity equals a driver-side Newman Q replay of the label-prop partition") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val sym = und.flatMap(e => Seq(e, (e._2, e._1)))
    val inNbrs = sym.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var lbl: Map[Long, Long] = sym.map(_._1).distinct.map(v => v -> v).toMap
    for (_ <- 1 to 6) {
      lbl = inNbrs.map { case (v, ns) =>
        val counts = ns.map(lbl).groupBy(identity).view.mapValues(_.size).toSeq
        v -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val m = und.size.toLong
    val deg = sym.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    val want = lbl.groupBy(_._2).map { case (c, vs) =>
      val nodes = vs.keySet
      val mIntra = und.count(e => nodes(e._1) && nodes(e._2)).toLong
      val degSum = nodes.toSeq.map(deg).sum
      // both terms floored independently — the gated convention
      val q = (BigInt(mIntra) * 1000000000L / m -
        BigInt(degSum) * degSum * 1000000000L / (BigInt(4) * m * m)).toLong
      (c, nodes.size.toLong, mIntra, degSum, q)
    }.toSet
    val got = Graph.modularity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == want, "modularity rows diverge from the Newman Q replay")
    // aggregate Q is a sane modularity (Q ∈ [-0.5, 1] up to flooring)
    val qTot = got.toSeq.map(_._5).sum
    assert(qTot >= -500000000L && qTot <= 1000000000L, s"total Q out of range: $qTot")
  }

  test("betweenness equals a driver-side shortest-path-count replay") {
    // rebuild the directed nation trade edges exactly as the operator does
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sf)
      .selectExpr("c_custkey", "CAST(c_nationkey AS LONG) src")
    val supp = Tables.supplier(spark, sf)
      .selectExpr("s_suppkey", "CAST(s_nationkey AS LONG) dst")
    import org.apache.spark.sql.functions.col
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select("src", "dst").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = Tables.nation(spark, sf).selectExpr("CAST(n_nationkey AS LONG)")
      .collect().map(_.getLong(0)).sorted
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    // per-source BFS carrying shortest-path counts, 6-hop budget
    def grid(s0: Long): Map[Long, (Long, Long)] = {
      val dist = scala.collection.mutable.Map(s0 -> 0L)
      val sig = scala.collection.mutable.Map(s0 -> 1L)
      var frontier = Seq(s0)
      var h = 0L
      while (frontier.nonEmpty && h < 6) {
        h += 1
        val next = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for (u <- frontier; v <- adj.getOrElse(u, Array.empty[Long])
             if !dist.contains(v)) next(v) += sig(u)
        frontier = next.keys.toSeq
        next.foreach { case (v, c) => dist(v) = h; sig(v) = c }
      }
      dist.keys.map(v => v -> ((dist(v), sig(v)))).toMap
    }
    val grids = nodes.map(s0 => s0 -> grid(s0)).toMap
    val acc = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    for {
      s0 <- nodes
      (v, (d1, s1)) <- grids(s0) if v != s0
      (t, (d2, s2)) <- grids(v) if t != v && t != s0
      (dst, sst) <- grids(s0).get(t) if dst == d1 + d2
    } {
      val (np, st, bc) = acc(v)
      acc(v) = (np + 1, st + s1 * s2, bc + s1 * s2 * 1000000L / sst)
    }
    val want = nodes.map(v => (v, acc(v)._1, acc(v)._2, acc(v)._3)).toSet
    val got = Graph.betweenness(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, "betweenness/stress rows diverge from the σ replay")
    // a through-node exists exactly when some geodesic is ≥ 2 hops (the
    // sf0.001 trade graph is complete — all zeros is CORRECT there)
    val multiHop = nodes.exists(s0 => grids(s0).exists(_._2._1 >= 2L))
    assert(got.exists(_._4 > 0L) == multiHop,
      s"through-node witness inconsistent with multi-hop geodesics ($multiHop)")

    // the SAMPLED face: same replay restricted to the pinned source
    // subset s ≡ 0 (mod 5), raw sums equal, estimator = raw × N/|S|
    val accS = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    for {
      s0 <- nodes if s0 % 5 == 0
      (v, (d1, s1)) <- grids(s0) if v != s0
      (t, (d2, s2)) <- grids(v) if t != v && t != s0
      (dst, sst) <- grids(s0).get(t) if dst == d1 + d2
    } {
      val (np, st, bc) = accS(v)
      accS(v) = (np + 1, st + s1 * s2, bc + s1 * s2 * 1000000L / sst)
    }
    val nS = nodes.count(_ % 5 == 0).toLong
    val wantS = nodes.map(v => (v, accS(v)._1, accS(v)._2, accS(v)._3, nS,
      accS(v)._2 * nodes.length / nS, accS(v)._3 * nodes.length / nS)).toSet
    val gotS = Graph.betweennessSampled(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(gotS == wantS, "sampled betweenness diverges from the restricted replay")
  }

  test("components: 10-round labels equal a driver-side replay of the recurrence") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rep = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val sym = rep.flatMap(e => Seq(e, (e._2, e._1)))
    val nbrs = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lbl = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to 10)
      lbl = lbl.map { case (v, l) =>
        v -> math.min(l, nbrs(v).map(lbl).foldLeft(Long.MaxValue)(math.min))
      }
    val want = lbl.groupBy(_._2).map { case (c, m) =>
      (c, m.size.toLong, m.keys.min, m.keys.max)
    }.toSeq.sortBy(_._1)
    val got = Graph.components(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, "component rollup diverges from the replayed recurrence")
  }

  test("SortedLongPairs emits all a<b pairs of a sorted distinct array") {
    import org.apache.spark.sql.functions._
    val got = spark.range(1)
      .select(explode(graft.functions.GraphExpressionFunctions
        .sortedLongPairs(expr("array(2L, 5L, 9L)"))).as("p"))
      .selectExpr("p.a", "p.b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 5L), (2L, 9L), (5L, 9L)))
    val empty = spark.range(1)
      .select(graft.functions.GraphExpressionFunctions
        .sortedLongPairs(expr("array(7L)")).as("ps"))
      .selectExpr("size(ps) n").collect().head.getInt(0)
    assert(empty == 0, "singleton input must yield no pairs")
  }

  test("TriangleCredits folds intersect + credit emission into one pass") {
    import org.apache.spark.sql.functions._
    val got = spark.range(1)
      .select(explode(graft.functions.GraphExpressionFunctions
        .triangleCredits(lit(1L), lit(2L),
          expr("array(3L, 5L, 8L)"), expr("array(4L, 5L, 8L, 9L)"))).as("cr"))
      .selectExpr("cr.part", "cr.c").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // witnesses {5, 8}: endpoints credited k=2, each witness credited 1
    assert(got.toSet == Set((1L, 2L), (2L, 2L), (5L, 1L), (8L, 1L)))
    val none = spark.range(1)
      .select(graft.functions.GraphExpressionFunctions
        .triangleCredits(lit(1L), lit(2L),
          expr("array(3L)"), expr("array(4L)")).as("cr"))
      .selectExpr("size(cr) n").collect().head.getInt(0)
    assert(none == 0, "empty intersection must yield an empty credit array")
  }

  test("basket rules equal a driver-side support/confidence/lift recompute") {
    import org.apache.spark.sql.functions._
    val op = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = op.map(_._1).distinct.length.toLong
    val item = op.groupBy(_._2).map { case (pk, xs) => pk -> xs.length.toLong }
    val pairCount = op.groupBy(_._1).iterator.flatMap { case (_, xs) =>
      val ps = xs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).map { case (p, occ) => p -> occ.length.toLong }
    val rows = operators.Graph.basketRules(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach { r =>
      val (a, b, nAb, nA, nB) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pairCount((a, b)) == nAb && item(a) == nA && item(b) == nB, s"counts: $r")
      assert(nAb >= 2 && nAb <= math.min(nA, nB), s"bounds: $r")
      assert(r.getLong(5) == nAb * 1000000L / nOrders, s"support: $r")
      assert(r.getLong(6) == nAb * 1000000L / nA, s"conf a->b: $r")
      assert(r.getLong(7) == nAb * 1000000L / nB, s"conf b->a: $r")
      assert(r.getLong(8) == (BigInt(nAb) * nOrders * 1000000 / (BigInt(nA) * nB)).toLong,
        s"lift: $r")
    }
    // emitted in lift order
    val lifts = rows.map(_.getLong(8))
    assert(lifts.zip(lifts.tail).forall { case (x, y) => x >= y })
  }

  test("cheapest route equals a driver-side bounded Bellman-Ford replay") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, sf).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_nationkey"))
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), 1000000L / r.getLong(2)))
      .filter(e => e._1 != e._2)
    var dist = Map(0L -> 0L)
    for (_ <- 1 to 6) {
      val relax = edges.flatMap { case (u, v, c) => dist.get(u).map(du => v -> (du + c)) }
      dist = (dist.toSeq ++ relax).groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    }
    val rows = Graph.cheapestRoute(spark, sf).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      dist.get(r.getLong(0)) match {
        case Some(d) => assert(!r.isNullAt(1) && r.getLong(1) == d, s"cost drift: $r")
        case None    => assert(r.isNullAt(1), s"unreached nation has a cost: $r")
      }
    }
    // weighted costs must differentiate beyond hop counts (a cost of k·1e6
    // for every k-hop nation would make the semiring change vacuous)
    val costs = rows.filter(!_.isNullAt(1)).map(_.getLong(1))
    assert(costs.exists(c => c % 1000000L != 0L || c > 0 && costs.count(_ == c) == 1),
      "all costs are uniform multiples — weights not exercised")
  }

  test("mst equals driver-side Kruskal: spanning, acyclic, same total weight") {
    import org.apache.spark.sql.functions.{col, count, least, greatest, lit}
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, sf).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_nationkey"))
    val und = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(least(col("c_nationkey").cast("long"), col("s_nationkey").cast("long")).as("a"),
        greatest(col("c_nationkey").cast("long"), col("s_nationkey").cast("long")).as("b"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vertices = und.flatMap(e => Seq(e._1, e._2)).distinct
    // Kruskal with union-find for the reference MST weight
    val parent = scala.collection.mutable.Map(vertices.map(v => v -> v): _*)
    def find(v: Long): Long = { var r = v; while (parent(r) != r) r = parent(r); r }
    var kruskalWeight = 0L; var kruskalEdges = 0
    und.sortBy(e => (e._3, e._1, e._2)).foreach { case (a, b, w) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; kruskalWeight += w; kruskalEdges += 1 }
    }
    val rows = Graph.mst(spark, sf).collect()
    // spanning: V-1 edges (graph is connected on this data), acyclic
    assert(rows.length == kruskalEdges, "edge count != Kruskal forest size")
    assert(rows.length == vertices.length - 1, "not spanning — bump rounds")
    val p2 = scala.collection.mutable.Map(vertices.map(v => v -> v): _*)
    def find2(v: Long): Long = { var r = v; while (p2(r) != r) r = p2(r); r }
    rows.foreach { r =>
      val (ra, rb) = (find2(r.getLong(1)), find2(r.getLong(2)))
      assert(ra != rb, s"cycle in reported forest at $r")
      p2(ra) = rb
    }
    // MSTs may differ edge-by-edge only under weight ties; total weight
    // is the invariant (and the (w,a,b) total order makes ours unique)
    assert(rows.map(_.getLong(3)).sum == kruskalWeight,
      "total weight differs from Kruskal — not a minimum spanning tree")
  }

  test("apsp equals per-source BFS replays and agrees with the q_bfs row") {
    import org.apache.spark.sql.functions.col
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, sf).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_nationkey"))
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").cast("long"), col("s_nationkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val nations = Tables.nation(spark, sf).select(col("n_nationkey").cast("long"))
      .collect().map(_.getLong(0)).sorted
    def bfsFrom(src: Long): Map[Long, Long] = {
      var dist = Map(src -> 0L)
      for (_ <- 1 to 6) {
        val nxt = dist.toSeq.flatMap { case (v, dv) =>
          adj.getOrElse(v, Seq.empty[Long]).map(_ -> (dv + 1)) }
        dist = (dist.toSeq ++ nxt).groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      }
      dist
    }
    val rows = Graph.apsp(spark, sf).collect()
    assert(rows.length == nations.length)
    rows.foreach { r =>
      val d = bfsFrom(r.getLong(0))
      assert(r.getLong(1) == d.size.toLong, s"n_reachable: $r")
      assert(r.getLong(2) == d.values.max, s"ecc: $r")
      assert(r.getLong(3) == d.values.sum, s"closeness sum: $r")
    }
    // the src=0 row must agree with the single-source q_bfs distances
    val bfs0 = Graph.bfs(spark, sf).collect()
      .filter(!_.isNullAt(1)).map(_.getLong(1))
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getLong(1) == bfs0.length.toLong && r0.getLong(2) == bfs0.max,
      "apsp src=0 disagrees with q_bfs")
  }

  test("assortativity equals a brute-force degree-pair Pearson replay") {
    val op = Tables.lineitem(spark, sf)
      .select(org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = op.groupBy(_._1).iterator.flatMap { case (_, xs) =>
      val ps = xs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, o) => v -> o.length.toLong }
    val pairs = edges.toSeq.flatMap(e => Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val m = BigInt(pairs.length)
    val sx = BigInt(pairs.map(_._1).sum)
    val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
    val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
    val (bigSxy, bigSxx) = (m * sxy - sx * sx_dup(pairs), m * sxx - sx * sx)
    val r = Graph.assortativity(spark, sf).collect()(0)
    val B18 = BigInt(10).pow(18)
    assert(BigInt(r.getLong(0)) == m && BigInt(r.getLong(1)) == sx, s"m/sx: $r")
    assert(BigInt(r.getLong(2)) * B18 + r.getLong(3) == sxx &&
      BigInt(r.getLong(4)) * B18 + r.getLong(5) == sxy, s"moments: $r")
    assert(BigInt(r.getLong(6)) * B18 + r.getLong(7) == bigSxy.abs &&
      BigInt(r.getLong(8)) * B18 + r.getLong(9) == bigSxx, s"centered: $r")
    assert(BigInt(r.getLong(10)) == bigSxy.abs * 1000000 / bigSxx, s"r: $r")
    assert(r.getInt(11) == bigSxy.signum)
  }

  // Σy over the symmetric pair list — by symmetry equal to Σx; kept
  // explicit so the replay does not assume what the query proves
  private def sx_dup(pairs: Seq[(Long, Long)]): BigInt = BigInt(pairs.map(_._2).sum)

  test("hits equals a driver-side L-infinity-normalized recurrence replay") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, sf).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_nationkey"))
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nations = Tables.nation(spark, sf).select(col("n_nationkey").cast("long"))
      .collect().map(_.getLong(0)).sorted
    val scale = BigInt(1000000000000L)
    def half(score: Map[Long, BigInt], rev: Boolean): Map[Long, BigInt] = {
      val raw = edges.groupBy(e => if (rev) e._1 else e._2).map { case (v, es) =>
        v -> es.map(e => score(if (rev) e._2 else e._1) * e._3).sum }
      val mx = raw.values.max
      nations.map(v => v -> raw.get(v).map(_ * scale / mx).getOrElse(BigInt(0))).toMap
    }
    var hub = nations.map(_ -> scale).toMap
    var auth = Map.empty[Long, BigInt]
    for (_ <- 1 to 3) { auth = half(hub, rev = false); hub = half(auth, rev = true) }
    val rows = Graph.hits(spark, sf).collect()
    assert(rows.length == nations.length)
    rows.foreach { r =>
      assert(BigInt(r.getLong(1)) == auth(r.getLong(0)), s"auth drift: $r")
      assert(BigInt(r.getLong(2)) == hub(r.getLong(0)), s"hub drift: $r")
    }
    // the iteration must differentiate: some nation is a stronger hub
    // than authority (a uniform fixpoint would make the test vacuous)
    assert(rows.map(_.getLong(1)).distinct.length > 1, "uniform authority vector")
  }

  test("katz equals a driver-side floor recurrence replay and differentiates") {
    import org.apache.spark.sql.functions.col
    val edges = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").cast("long"), col("s_nationkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nations = Tables.nation(spark, sf).select(col("n_nationkey").cast("long"))
      .collect().map(_.getLong(0)).sorted
    var x = nations.map(_ -> 1000000L).toMap
    for (_ <- 1 to 12) {
      val inflow = edges.toSeq.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => x(e._1) / 32).sum }
      x = nations.map(v => v -> (1000000L + inflow.getOrElse(v, 0L))).toMap
    }
    val rows = operators.Graph.katz(spark, sf).collect()
    assert(rows.length == nations.length)
    rows.foreach(r => assert(r.getLong(1) == x(r.getLong(0)), s"katz drift: $r"))
    // attenuated walk counting must rank SOME nation above the 1e6 base
    assert(rows.map(_.getLong(1)).max > 1000000L)
    assert(rows.map(_.getLong(1)).distinct.length > 1, "uniform katz vector")
  }

  test("harmonic centrality equals a driver-side BFS replay over the trade edges") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sf).selectExpr("c_custkey", "CAST(c_nationkey AS LONG) a")
    val supp = Tables.supplier(spark, sf).selectExpr("s_suppkey", "CAST(s_nationkey AS LONG) b")
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("a"), col("b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nations = Tables.nation(spark, sf).select(col("n_nationkey").cast("long"))
      .collect().map(_.getLong(0))
    def dists(v: Long): Map[Long, Long] = {
      var d = Map(v -> 0L); var frontier = Set(v)
      for (hop <- 1L to 6L; if frontier.nonEmpty) {
        val nxt = frontier.flatMap(u => adj.getOrElse(u, Set.empty)) -- d.keySet
        d ++= nxt.map(_ -> hop); frontier = nxt
      }
      d
    }
    val want = nations.map { v =>
      val ds = dists(v).filter(_._2 > 0)
      v -> ((ds.size.toLong, ds.values.map(1000000L / _).sum))
    }.toMap
    val rows = Graph.harmonic(spark, sf).collect()
    assert(rows.length == nations.length)
    rows.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) == want(r.getLong(0)),
        s"harmonic drift for nation ${r.getLong(0)}")
    }
    val hs = rows.map(_.getLong(2))
    assert(hs.zip(hs.tail).forall { case (a, b) => a >= b }, "not ranked by centrality")
  }

  test("scc equals a driver-side BFS mutual-reachability replay on the top-3 flow graph") {
    import org.apache.spark.sql.functions._
    // rebuild the sparsified edge list independently: aggregate the
    // flows in Spark (fact-scale), rank driver-side
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sf).selectExpr("c_custkey", "CAST(c_nationkey AS LONG) a")
    val supp = Tables.supplier(spark, sf).selectExpr("s_suppkey", "CAST(s_nationkey AS LONG) b")
    val flows = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val edges = flows.groupBy(_._1).toSeq.flatMap { case (_, fs) =>
      fs.sortBy { case (_, b, w) => (-w, b) }.take(3).map(f => (f._1, f._2))
    }
    val nations = Tables.nation(spark, sf).select(col("n_nationkey").cast("long"))
      .collect().map(_.getLong(0))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def reach(v: Long): Set[Long] = {
      var seen = Set(v); var frontier = List(v)
      while (frontier.nonEmpty) {
        val nxt = frontier.flatMap(u => adj.getOrElse(u, Set.empty)).filterNot(seen)
        seen ++= nxt; frontier = nxt.distinct
      }
      seen
    }
    val r = nations.map(v => v -> reach(v)).toMap
    val wantScc = nations.map(v =>
      v -> nations.filter(w => r(v)(w) && r(w)(v)).min).toMap
    val wantSize = wantScc.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val outDeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val rows = Graph.scc(spark, sf).collect()
    assert(rows.length == nations.length)
    rows.foreach { row =>
      val (v, id, sz, deg) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      assert(id == wantScc(v), s"scc id drift for nation $v")
      assert(sz == wantSize(wantScc(v)), s"scc size drift for nation $v")
      assert(deg == outDeg.getOrElse(v, 0L), s"out-degree drift for nation $v")
    }
    // the structure must be non-trivial: at least one multi-node SCC
    // AND more than one component (a single giant SCC or all
    // singletons would both make the mutual-reachability logic vacuous)
    assert(wantSize.values.max > 1, "no multi-node SCC — sparsifier too aggressive")
    assert(wantSize.size > 1, "one giant SCC — sparsifier too weak")
  }

  test("item_sim metrics equal exact BigInt arithmetic over replayed basket counts") {
    import org.apache.spark.sql.functions._
    val op = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = op.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nItem = op.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val rows = Graph.itemSim(spark, sf).collect()
    assert(rows.length == 50)
    var prev = Long.MaxValue
    rows.foreach { r =>
      val (a, b, nab, na, nb) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val wantNab = byOrder.values.count(ps => ps(a) && ps(b)).toLong
      assert(nab == wantNab && nab >= 2, s"pair count drift for ($a,$b)")
      assert(na == nItem(a) && nb == nItem(b), s"item count drift for ($a,$b)")
      assert(BigInt(r.getLong(5)) ==
        BigInt(nab) * nab * 1000000000000L / (BigInt(na) * nb), s"cosine drift: $r")
      assert(r.getLong(6) == nab * 1000000L / (na + nb - nab), s"jaccard drift: $r")
      assert(r.getLong(7) == nab * 1000000L / math.min(na, nb), s"overlap drift: $r")
      assert(r.getLong(5) <= prev, "not sorted by cosine desc"); prev = r.getLong(5)
    }
  }

  test("shared graph tables: one instance per (session, corpus), content equals a direct rebuild") {
    import org.apache.spark.sql.functions._
    // identity: the memo returns THE SAME DataFrame, so every consumer
    // reads one pinned build (the r10 memoFlows/memoWitnesses discipline)
    val f1 = operators.Graph.memoFlows(spark, sf)
    val f2 = operators.Graph.memoFlows(spark, sf)
    assert(f1 eq f2, "memoFlows must return the cached instance")
    val w1 = operators.Graph.memoWitnesses(spark, sf)
    assert(w1 eq operators.Graph.memoWitnesses(spark, sf),
      "memoWitnesses must return the cached instance")
    // content parity: the shared flow matrix equals a direct rebuild of
    // the 4-table trade join (so no consumer can drift from the schema)
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("src"))
    val supp = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_nationkey").cast("long").as("dst"))
    val direct = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val shared = f1.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(shared == direct, "memoFlows drifted from the direct 4-table build")
    // and the witness table is consistent: every witness row's three
    // vertices are pairwise distinct and (a < b) canonical
    val bad = w1.filter(col("a") >= col("b") ||
      col("wit") === col("a") || col("wit") === col("b")).count()
    assert(bad == 0, s"$bad malformed witness rows")
  }

  test("shared-table checkpoints keep full width (the r10 AQE-freeze trap)") {
    // localCheckpoint FREEZES whatever partitioning the plan ended with;
    // AQE's size-based coalescing had shrunk the byte-light edge list to
    // ~4 partitions at sf1, serializing every CPU-dense consumer. The
    // explicit repartition must keep the frozen width at the core count.
    val par = spark.sparkContext.defaultParallelism
    assert(operators.Graph.triEdges(spark, sf).rdd.getNumPartitions == par,
      "triEdges checkpoint lost its width")
    assert(operators.Graph.memoWitnesses(spark, sf).rdd.getNumPartitions == par,
      "memoWitnesses checkpoint lost its width")
  }
}
