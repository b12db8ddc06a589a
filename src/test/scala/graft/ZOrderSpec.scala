package graft

import graft.sources.ZOrder
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  import SparkTestSession._

  test("zValue interleaves bits exactly (scala reference over a lattice)") {
    import spark.implicits._
    def mortonRef(a: Long, b: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 31) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val pts = for (a <- Seq(0L, 1L, 2L, 5L, 255L, 1023L, 0x7FFFFFFFL);
                   b <- Seq(0L, 1L, 3L, 7L, 512L, 0x7FFFFFFFL)) yield (a, b)
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (a, b) =>
      assert(got((a, b)) == mortonRef(a, b), s"z($a, $b)")
    }
  }

  test("z-clustered files prune on BOTH dimensions; linear sort only on one") {
    val ev = EventStreams.normalize(Tables.events(spark, sf))
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    val (zPath, uPath) = (s"$tmp/z", s"$tmp/u")
    ZOrder.clusterWrite(ev, zPath, "day", "user_id", files = 16)
    // baseline layout: range-partitioned + sorted on user_id alone
    ev.repartitionByRange(16, col("user_id")).sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(uPath)

    val zBack = spark.read.parquet(zPath)
    val uBack = spark.read.parquet(uPath)
    // layout must never change content
    assert(zBack.count() == ev.count() && uBack.count() == ev.count())

    def matching(path: String, dim: String, lo: Long, hi: Long): (Long, Long) = {
      val env = ZOrder.fileEnvelopes(spark.read.parquet(path), "day", "user_id")
        .collect()
      val (mn, mx) = if (dim == "day") ("a_min", "a_max") else ("b_min", "b_max")
      val hits = env.count { r =>
        val (a, b) = (r.getAs[Long](mn), r.getAs[Long](mx))
        a <= hi && b >= lo
      }
      (hits.toLong, env.length.toLong)
    }
    // ~10% slice of each dimension's domain
    val Row2 = ev.agg(min(col("day")), max(col("day")),
      min(col("user_id")), max(col("user_id"))).collect()(0)
    val (d0, d1, u0, u1) = (Row2.getLong(0), Row2.getLong(1), Row2.getLong(2), Row2.getLong(3))
    val dHi = d0 + math.max(1L, (d1 - d0) / 10)
    val uHi = u0 + math.max(1L, (u1 - u0) / 10)

    val (zDay, zTot) = matching(zPath, "day", d0, dHi)
    val (zUser, _)   = matching(zPath, "user_id", u0, uHi)
    val (uDay, uTot) = matching(uPath, "day", d0, dHi)
    val (uUser, _)   = matching(uPath, "user_id", u0, uHi)

    // z-layout prunes a strict majority of files on EITHER dimension
    assert(zDay * 2 < zTot, s"z-layout day slice reads $zDay of $zTot files")
    assert(zUser * 2 < zTot, s"z-layout user slice reads $zUser of $zTot files")
    // the single-key layout prunes on its sort key but NOT the other dim
    assert(uUser * 2 < uTot, s"linear layout user slice reads $uUser of $uTot")
    assert(uDay == uTot, s"linear layout cannot prune day ($uDay of $uTot)")

    // and the pruned predicate returns identical rows from either layout
    val q = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("day").between(d0, dHi))
        .groupBy(col("day")).agg(count(lit(1)).as("n"))
        .orderBy(col("day")).collect().toSeq
    assert(q(zBack) == q(uBack))
  }
}
