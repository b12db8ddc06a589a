package graft

import graft.plans.TopK
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPlanSpec extends AnyFunSuite {
  import SparkTestSession._

  test("native TopKPerKey equals the window row_number variant") {
    val native = operators.Relational.qTopkNative(spark, sf).collect().map(_.toSeq)
    val window = operators.Relational.qTopkPerGroup(spark, sf)
      .select("p_brand", "p_partkey", "p_retailprice")
      .orderBy(col("p_brand"), col("p_retailprice").desc, col("p_partkey"))
      .collect().map(_.toSeq)
    assert(native.toSeq == window.toSeq)
  }

  test("TopKRewrite: window row_number <= k with rank dropped plans as TopKPerKey") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
    val windowForm = Tables.part(spark, sf)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("p_brand", "p_partkey", "p_retailprice") // rank dropped → eligible
    val p = windowForm.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial") && p.contains("TopKPerKeyFinal"),
      s"rewrite did not fire:\n$p")
    assert(!p.contains("Window"), s"window operator should be gone:\n$p")
    // results equal the unrewritten semantics (computed via the kept-rank form)
    val got = windowForm.orderBy(col("p_brand"), col("p_retailprice").desc, col("p_partkey"))
      .collect().map(_.toSeq).toSeq
    val want = operators.Relational.qTopkPerGroup(spark, sf)
      .select("p_brand", "p_partkey", "p_retailprice")
      .orderBy(col("p_brand"), col("p_retailprice").desc, col("p_partkey"))
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("TopKRewrite: rn = 1 (first-row-per-group) rewrites and stays correct") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
    val firstRow = Tables.part(spark, sf)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("p_brand", "p_partkey")
    assert(firstRow.queryExecution.executedPlan.toString.contains("TopKPerKeyPartial"))
    val got = firstRow.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = Tables.part(spark, sf)
      .groupBy("p_brand")
      .agg(max_by(col("p_partkey"),
        struct(col("p_retailprice"), -col("p_partkey"))).as("p_partkey"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("TopKRewrite: compound predicates stay correct whether or not the rule fires") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
    // Catalyst may split the conjunction (pushing the non-rank half below
    // the window) or keep it whole — either way results must match the
    // window semantics
    val df = Tables.part(spark, sf)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2 && col("p_partkey") % 2 === 0)
      .select("p_brand", "p_partkey")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = Tables.part(spark, sf)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .filter(col("p_partkey") % 2 === 0)
      .select("p_brand", "p_partkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("TopKRewrite: rn < Int.MinValue stays an always-false filter (no overflow)") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
    val df = Tables.part(spark, sf)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") < Int.MinValue)
      .select("p_brand", "p_partkey") // rank dropped → rule inspects the predicate
    // v - 1 must not wrap to Int.MaxValue and return every row
    assert(df.count() == 0)
  }

  test("TopKRewrite does NOT fire when the rank column survives") {
    val p = operators.Relational.qTopkPerGroup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("TopKPerKeyPartial"), s"must keep the Window form:\n$p")
    assert(p.contains("Window"), p)
  }

  test("plan shape: partial heap before the exchange, final after") {
    val df = TopK.perKey(
      Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), 2)
    val p = df.queryExecution.executedPlan.toString
    val iPartial = p.indexOf("TopKPerKeyPartial")
    val iFinal = p.indexOf("TopKPerKeyFinal")
    val iExchange = p.indexOf("Exchange hashpartitioning")
    assert(iPartial >= 0 && iFinal >= 0 && iExchange >= 0, p)
    // plan prints top-down: Final above Exchange above Partial
    assert(iFinal < iExchange && iExchange < iPartial,
      s"expected Final > Exchange > Partial order in:\n$p")
    // correctness: every key emits at most 2 rows, the true max first
    val rows = df.collect()
    val byKey = rows.groupBy(_.getLong(0))
    assert(byKey.values.forall(_.length <= 2))
    val trueMax = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(max("o_totalprice").as("m")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    byKey.foreach { case (k, rs) =>
      assert(rs.map(_.getDouble(2)).max == trueMax(k))
    }
  }
}
