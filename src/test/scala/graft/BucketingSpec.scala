package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins that bucketed writes make the co-located join shuffle-free —
  * the SURVEY §5 ingest-time-partitioning claim, observed in the plan.
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("join of two same-key bucketed tables has no shuffle exchange") {
    val ord = Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice")
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    Bucketing.writeBucketed(ord, "b_orders", "o_custkey")
    Bucketing.writeBucketed(cust, "b_cust", "o_custkey")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the bucketing is what saves the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_cust", "o_custkey")
        .filter(col("c_mktsegment") === "BUILDING")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }
}
