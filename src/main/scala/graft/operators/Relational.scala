package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational / OLAP core (SURVEY §2.2).
  *
  * Determinism rules (shared with the DuckDB oracles in SparkEntry):
  *  - money sums run over DECIMAL(18,N) casts (exact, associative) and the
  *    final aggregate is cast back to DOUBLE — bit-identical across engines;
  *  - averages are computed as CAST(decimal_sum AS DOUBLE) / count;
  *  - every output has a total order with a unique tie-break key.
  */
object Relational {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Q1-style pricing summary: scan → filter → groupBy multi-aggregate. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).cast("double").as("sum_disc_price"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Q3-style: 3-way join, agg, top-k with deterministic tie-break.
    * No explicit broadcast hints: orders and customer are fact-sized
    * (they grow with SF — a hint would pin a driver-OOM plan at 100 TB
    * and override AQE's size-based decision). Catalyst/AQE still
    * broadcasts the post-filter sides whenever their stats allow.
    */
  def q3JoinTopk(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1995-03-15").cast("timestamp")
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Q5-style star join: region → nation → (customer, supplier) → orders → lineitem.
    * Broadcast hints only on the fixed-cardinality dims (nation 25,
    * region 5). orders/customer/supplier all grow with SF, so their join
    * strategy is left to Catalyst/AQE stats — lineitem⋈orders plans as a
    * shuffle join at scale (the 2-year filter still keeps ~30% of orders;
    * a forced broadcast would OOM at 100 TB).
    */
  def q5MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val reg = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val sup = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1994-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
    li.join(ord.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(cust.select("c_custkey", "c_nationkey"), col("o_custkey") === col("c_custkey"))
      .join(sup.select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat.select("n_nationkey", "n_name", "n_regionkey")),
            col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg.select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Q6-style tight-filter scan + single aggregate (all filters pushed). */
  def q6FilterAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg(coalesce(sum(dec4(col("l_extendedprice") * col("l_discount"))).cast("double"), lit(0.0))
        .as("revenue"))
  }

  /** TPC-H Q4 shape — order-priority checking: count orders per
    * priority that had at least one LATE lineitem (shipped > 90 days
    * after the order date — the available-schema adaptation of Q4's
    * commitdate<receiptdate predicate). The EXISTS collapses to a
    * LEFT SEMI join, so each order contributes once however many
    * lines are late, and the join output is order-keyed (never
    * lineitem-scale) before the bounded priority aggregate.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1995-07-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q10 — returned-item reporting: the top-20 customers by
    * revenue lost to returns in a quarter, with nation context. The
    * returnflag filter prunes the fact scan, the nation dim
    * broadcasts, and the top-20 runs as a distributed
    * TakeOrderedAndProject over the customer-grain aggregate.
    */
  def q10Returned(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir)
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q13 — customer order-count distribution: how many customers
    * placed k orders (excluding URGENT ones — the available-schema
    * stand-in for Q13's comment exclusion), INCLUDING the zero-order
    * customers the left join preserves. Two narrow aggregates: the
    * per-customer count shuffles customer-keyed rows, the distribution
    * is count-domain bounded.
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q14 — promotion effect: the share of one month's revenue
    * from promo-class parts (p_type = 'ECONOMY' in this catalog's type
    * vocabulary), as BOTH the exact ×10⁴ integer share (DECIMAL(18,4)
    * sums are integral in 10⁻⁴ units, so the ratio is one staged
    * DECIMAL(38,0) floor division — exact at any corpus size) and the
    * two revenue doubles for the BI reader. One pruned fact scan, one
    * part join, a single 1-row conditional aggregate.
    */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-03-01").cast("timestamp") &&
              col("l_shipdate") < lit("1995-04-01").cast("timestamp"))
    val rev = dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    li.join(Tables.part(spark, dir).select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "ECONOMY", rev).otherwise(dec4(lit(0.0)))).as("promo"),
        sum(rev).as("total"))
      .select(
        // overflow-bound: promo <= total, numerator <= total * 10^8 — inside DECIMAL(38) for total revenue < 10^30 currency units.
        expr("""CAST(CAST(promo * 10000 AS DECIMAL(38,0)) * 10000
               |  div CAST(total * 10000 AS DECIMAL(38,0)) AS BIGINT)""".stripMargin)
          .as("promo_share_x1e4"),
        col("promo").cast("double").as("promo_revenue"),
        col("total").cast("double").as("total_revenue"))
  }

  /** Window functions: per-customer order sequence + running total. */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("running_spend",
        sum(dec2(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double"))
      .select("o_custkey", "o_orderkey", "rn", "running_spend")
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** TPC-H Q2 shape — minimum-cost supplier per part. Adapted to this
    * catalog (no partsupp table): the observed lineitem unit price plays
    * supply cost, unit_cents = ⌊extprice·100+0.5⌋ div qty (quantities are
    * integral 1..50, so the floor division is exact in both engines).
    * Per qualifying part (SMALL type, size ≤ 10) the EUROPE suppliers
    * achieving the part's global minimum unit price, ranked by account
    * balance like the reference's top-100. The min is a part-keyed
    * partial aggregate; dims broadcast.
    */
  def q2MinCostSupp(spark: SparkSession, dir: String): DataFrame = {
    val cost = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir)
          .filter(col("p_size") <= 10 && col("p_type") === "SMALL")
          .select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("l_suppkey"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) div CAST(l_quantity AS BIGINT)")
          .as("unit_cents"))
      .groupBy(col("p_partkey"), col("l_suppkey"))
      .agg(min(col("unit_cents")).as("cost_cents"))
    val minc = cost.groupBy(col("p_partkey")).agg(min(col("cost_cents")).as("min_cents"))
    cost.join(minc, Seq("p_partkey"))
      .filter(col("cost_cents") === col("min_cents"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("cost_cents"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q9 shape — product-line profit by nation and year. Adapted:
    * no partsupp supplycost, so cost = retailprice·qty·0.8 (a fixed
    * 80% cost ratio); profit folds as DECIMAL(18,4) line terms (exact,
    * order-independent), doubles only at the output boundary. The
    * part-name filter prunes the fact scan before any join.
    */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter(col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice"), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
    li.groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          - dec4(col("p_retailprice") * col("l_quantity") * lit(0.8)))
        .cast("double").as("sum_profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  /** TPC-H Q12 shape — late-shipment priority accounting per line
    * status (the schema's stand-in for shipmode): for lines shipped in
    * one year, how many belong to critical-priority orders vs not.
    * One pruned fact scan, an order-keyed join, a 2-value aggregate.
    */
  def q12ShipPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linestatus")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .cast("long").as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .cast("long").as("low_line_count"))
      .orderBy(col("l_linestatus"))

  /** TPC-H Q15 shape — top supplier by quarterly revenue: the revenue
    * view folds as DECIMAL(18,4) (exact), and the max is matched by
    * DECIMAL equality — bit-safe where a double max-join would not be.
    * The 1-row max broadcasts.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("r"))
      .localCheckpoint(eager = false) // feeds the max AND the equality probe
    val mx = rev.agg(max(col("r")).as("mx"))
    rev.crossJoin(broadcast(mx)).filter(col("r") === col("mx"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("r").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q16 shape — supplier variety per (brand, type, size) over a
    * pinned size list, excluding audit-flagged suppliers (suppkey % 13,
    * the stand-in for Q16's complaint list — the catalog has no
    * complaint strings). countDistinct shuffles (grid, suppkey) pairs
    * only; the exclusion is a broadcast anti join.
    */
  def q16SuppVariety(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      .join(Tables.part(spark, dir)
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
          .select("p_partkey", "p_brand", "p_type", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir).filter(col("s_suppkey") % 13 === 0)
          .select(col("s_suppkey").as("l_suppkey")),
        Seq("l_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))

  /** TPC-H Q17 shape — small-quantity line revenue for one brand:
    * lines with qty below HALF the part's average quantity (the
    * catalog's qty spread needs 0.5, not the reference's 0.2 — probed
    * non-vacuous at every SF). The avg compare is exact integer
    * cross-multiplication (qty·2·n < Σqty), never a float divide; the
    * per-part stats are one partial aggregate over the pruned scan.
    */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val pa = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sq"), count(lit(1)).as("n"))
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter(col("p_brand") === "Brand#5")
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .join(pa, Seq("l_partkey"))
      .filter(col("l_quantity").cast("long") * 2 * col("n") < col("sq"))
      .agg(count(lit(1)).cast("long").as("n_small_lines"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("small_qty_revenue"))
  }

  /** TPC-H Q18 shape — large-volume orders: orders whose total quantity
    * exceeds 300, with customer context, top-100 by price. The HAVING
    * runs as an order-keyed partial aggregate BEFORE any join, so only
    * qualifying orders (a few per 10⁵) ever reach the dims.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate")).as("o_date_us"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** TPC-H Q19 shape — disjunctive brand/size/quantity predicates as
    * ONE scan: the three OR branches evaluate inside the join filter
    * (Catalyst pushes the common p_size ≤ 15 bound to the part scan).
    */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size"),
        col("l_partkey") === col("p_partkey") && (
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#10" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#20" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30))))
      .agg(count(lit(1)).cast("long").as("n_lines"),
        sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("revenue"))

  /** TPC-H Q20 shape — dominant suppliers: suppliers who shipped MORE
    * THAN HALF a part's total 1996 volume (the excess-stock semi-join
    * re-expressed without partsupp). Volumes are one (part, supp)
    * partial aggregate; the total derives from it (no second fact
    * scan); the >half test is integer cross-multiplication.
    */
  def q20DominantSupp(spark: SparkSession, dir: String): DataFrame = {
    val vol = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sq"))
      .localCheckpoint(eager = false) // feeds its own total + the dominance probe
    val tot = vol.groupBy(col("l_partkey")).agg(sum(col("sq")).as("tq"))
    vol.join(tot, Seq("l_partkey"))
      .filter(col("sq") * 2 > col("tq"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_dominated"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_dominated"))
      .orderBy(col("n_dominated").desc, col("s_suppkey"))
      .limit(100)
  }

  /** TPC-H Q21 shape — suppliers who kept orders waiting: the ONLY
    * late supplier (shipdate > orderdate + 90 days, the Q4 lateness
    * spec) in a finished multi-supplier order. One order-keyed
    * aggregate computes supplier count, late-supplier count, and the
    * unique late supplier in the same pass — no EXISTS/NOT EXISTS
    * double self-join.
    */
  def q21LateSupplier(spark: SparkSession, dir: String): DataFrame = {
    val f = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("late"))
    // two-level aggregation instead of two countDistincts: the double
    // distinct planned as Expand (3 projections of every fact row into
    // one shuffle — 3× the exchange bytes); aggregating to the distinct
    // (orderkey, suppkey) grain first shuffles each pair once with
    // map-side partial aggregation, then the per-order counts are plain
    // (guide §2.3 "aggregate before you shuffle"). max(late) per pair ⟺
    // "this supplier shipped ≥1 late line", so the three aggregates are
    // value-identical to the countDistinct forms.
    f.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("late"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("ns"),
        count(when(col("late"), lit(1))).as("nl"),
        max(when(col("late"), col("l_suppkey"))).as("late_supp"))
      .filter(col("ns") >= 2 && col("nl") === 1)
      .groupBy(col("late_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("late_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** TPC-H Q22 shape — idle rich customers: above-positive-average
    * balance, no RECENT order (≥ 1999 — the catalog's every-customer-
    * orders history makes the reference's no-order-ever filter vacuous,
    * probed at every SF), bucketed by the customer-name check digit
    * (the stand-in for the phone country code). The avg compare is
    * exact: cents·n_pos > Σ_pos cents — no float average; the recent-
    * order exclusion is a null-safe anti join.
    */
  def q22IdleRich(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .withColumn("cents", expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)"))
    val pos = cust.filter(col("c_acctbal") > 0)
      .agg(count(lit(1)).as("n_pos"), sum(col("cents")).cast("long").as("sum_pos"))
    cust
      .filter(expr("right(c_name, 1)").isin("1", "3", "5", "7", "9"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .crossJoin(broadcast(pos))
      .filter(col("cents") * col("n_pos") > col("sum_pos"))
      .groupBy(expr("right(c_name, 1)").as("check_digit"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec2(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("check_digit"))
  }

  /** Monthly volume-weighted average unit price (VWAP) — the price
    * index a demand dashboard tracks: Σ extendedprice / Σ quantity per
    * ship month, folded as exact cents and integral quantities, the
    * ratio ×100 as one floor division (extendedprice is already the
    * quantity-scaled line total, so this IS the qty-weighted unit
    * price). One pruned two-column scan, month-domain output.
    */
  def qVwap(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(expr("CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)").as("ym"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"),
        col("l_quantity").cast("long").as("qty"))
      .groupBy(col("ym"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qty")).cast("long").as("sum_qty"),
        sum(col("cents")).cast("long").as("sum_cents"))
      .withColumn("vwap_cents_x100", expr("(sum_cents * 100) div sum_qty"))
      .orderBy(col("ym"))

  /** Hierarchical ROLLUP aggregate (null group keys coalesced to 'ALL'). */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
           count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
              coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
              col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  /** EXISTS / NOT EXISTS via left_semi / left_anti joins. */
  def qSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey")
    val ordKeys = Tables.orders(spark, dir).select(col("o_custkey").as("c_custkey"))
    val withOrders = cust.join(ordKeys, Seq("c_custkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("with_orders").as("kind"), col("n"))
    val withoutOrders = cust.join(ordKeys, Seq("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("without_orders").as("kind"), col("n"))
    withOrders.unionAll(withoutOrders).orderBy(col("kind"))
  }

  /** NOT IN (subquery) with three-valued NULL semantics: planned by
    * Catalyst as a null-aware anti join (a broadcast NAAJ when the
    * subquery side fits — `.explain` shows it). Distinct from
    * [[qSemiAnti]]'s left_anti, which is NOT-EXISTS semantics: if the
    * subquery ever produced a NULL, NOT IN must return no rows at all.
    *
    * Scale note: Spark can only execute a null-aware anti join by
    * broadcasting the subquery side; when that side is fact-sized, the
    * correct 100 TB form is NOT EXISTS (shuffle-able left_anti) plus an
    * explicit null guard — NOT IN is the right tool only for
    * bounded/dimension subqueries like this one.
    */
  def qInSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT c_custkey, c_name FROM graft_customer
        |WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM graft_orders WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Fixed-width histogram over order totals: exact integer-cents
    * binning ($25k buckets) — one partial-agg-friendly groupBy, the
    * at-scale shape for any numeric profile/quantization pass.
    */
  def qHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy(expr("cents div 2500000").as("bin"))
      .agg(count(lit(1)).as("n"), min(col("cents")).as("lo_cents"),
        max(col("cents")).as("hi_cents"))
      .orderBy(col("bin"))

  /** Exact statistical moments per group: mean and sample variance of
    * order totals computed over integer cents with DECIMAL(38,0) sums —
    * sum and sum-of-squares are exact (no float accumulation-order
    * drift, the classic distributed-variance hazard), overflow-safe to
    * ~1e38, and trivially partial-agg friendly. The derived variance is
    * one exact rational expression evaluated identically in DuckDB.
    */
  def qStats(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      // DECIMAL(19,0): cents² is then DECIMAL(38,0) EXACTLY in both
      // engines (wider inputs make DuckDB silently fall back to DOUBLE
      // multiplication — a last-ulp hash mismatch)
      .select(col("o_orderstatus"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS DECIMAL(19,0))").as("cents"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("cents")).as("sum_c"),
        sum(col("cents") * col("cents")).as("sumsq_c"))
      // the moments leave decimal through ONE cast each, then all
      // arithmetic runs in doubles — identical IEEE ops on identical
      // inputs in both engines
      .select(col("o_orderstatus"), col("n"),
        expr("CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE)").as("mean_cents"),
        expr("(CAST(n AS DOUBLE) * CAST(sumsq_c AS DOUBLE) - CAST(sum_c AS DOUBLE) * CAST(sum_c AS DOUBLE))" +
          " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))").as("var_cents"))
      .orderBy(col("o_orderstatus"))

  /** Exact two-feature least squares per order priority — order value
    * (cents) regressed on line count and total quantity, the
    * multi-feature step up from the single-x q_regression: centered
    * normal equations solved by Cramer's rule,
    *   b1 = (S1y·S22 − S2y·S12)/det,  b2 = (S2y·S11 − S1y·S12)/det,
    *   det = S11·S22 − S12²,
    * with TWO-PASS centered sums about floored means (the q_moments
    * discipline — centered magnitudes keep every product inside
    * DECIMAL(38,0) at 10¹⁰-row groups) and the slope quotients staged
    * as (|num| div det)·10⁶ + (|num| mod det)·10⁶ div det with signs
    * emitted separately — no signed division anywhere. Collinear
    * groups (det = 0) emit zeros. Scale shape: one order-grain
    * aggregate of lineitem, a 5-row broadcast of means, one
    * conditional-sum pass.
    */
  def qLinregMulti(spark: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).cast("long").as("x1"),
        sum(expr("CAST(l_quantity AS BIGINT)")).cast("long").as("x2"))
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority").as("prio"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("y"))
      .join(perOrder, col("o_orderkey") === col("l_orderkey"))
    val means = base.groupBy(col("prio"))
      .agg(count(lit(1)).as("n"),
        expr("sum(x1) div count(1)").as("m1"),
        expr("sum(x2) div count(1)").as("m2"),
        expr("sum(y) div count(1)").as("my"))
    def stagedDiv(num: String, den: String): String =
      s"(abs($num) div $den) * 1000000 + ((abs($num) % $den) * 1000000) div $den"
    base.join(broadcast(means), Seq("prio"))
      .select(col("prio"), col("n"),
        (col("x1") - col("m1")).as("c1"),
        (col("x2") - col("m2")).as("c2"),
        (col("y") - col("my")).as("cy"))
      .groupBy(col("prio"), col("n"))
      .agg(sum(expr("CAST(c1 AS DECIMAL(38,0)) * c1")).as("s11"),
        sum(expr("CAST(c2 AS DECIMAL(38,0)) * c2")).as("s22"),
        sum(expr("CAST(c1 AS DECIMAL(38,0)) * c2")).as("s12"),
        sum(expr("CAST(c1 AS DECIMAL(38,0)) * cy")).as("s1y"),
        sum(expr("CAST(c2 AS DECIMAL(38,0)) * cy")).as("s2y"))
      .withColumn("det", expr("s11 * s22 - s12 * s12"))
      .withColumn("n1", expr("s1y * s22 - s2y * s12"))
      .withColumn("n2", expr("s2y * s11 - s1y * s12"))
      .select(col("prio"), col("n"),
        when(col("det") > 0,
          expr(s"CAST(${stagedDiv("n1", "det")} AS BIGINT)")).otherwise(0L)
          .as("b1_abs_x1e6"),
        expr("CAST(CASE WHEN det > 0 THEN sign(n1) ELSE 0 END AS INT)").as("b1_sign"),
        when(col("det") > 0,
          expr(s"CAST(${stagedDiv("n2", "det")} AS BIGINT)")).otherwise(0L)
          .as("b2_abs_x1e6"),
        expr("CAST(CASE WHEN det > 0 THEN sign(n2) ELSE 0 END AS INT)").as("b2_sign"))
      .orderBy(col("prio"))
  }

  /** Catalog activation curve — when did each part first sell, rolled
    * up monthly: parts newly activated per month, the cumulative
    * activated count, and coverage of the catalog ppm — the
    * assortment-health readout ("is the long tail ever bought?").
    * First-sale is one (part → min orderdate) aggregate off a single
    * fact pass (the q_cumulative-uniques first-seen discipline);
    * everything after runs on the bounded month grid with a 1-row
    * catalog-size broadcast.
    */
  def qAdoption(spark: SparkSession, dir: String): DataFrame = {
    val firstSale = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_partkey"))
      .agg(min(expr("unix_micros(o_orderdate) div 86400000000 div 30")).as("month"))
    val monthly = firstSale.groupBy(col("month"))
      .agg(count(lit(1)).as("n_new"))
    val catalog = Tables.part(spark, dir).agg(count(lit(1)).as("n_parts"))
    val w = Window.orderBy(col("month")).rowsBetween(Window.unboundedPreceding, 0)
    monthly.crossJoin(broadcast(catalog))
      .withColumn("cum_active", sum(col("n_new")).over(w))
      .withColumn("coverage_ppm", expr("(cum_active * 1000000) div n_parts"))
      .select(col("month"), col("n_new"), col("cum_active"), col("coverage_ppm"))
      .orderBy(col("month"))
  }

  /** Movers-and-shakers rank shift — brand revenue ranks in Jan 1995
    * vs Feb 1995 with the rank delta, the period-over-period report a
    * category review opens with. Both period ranks come from ONE
    * conditional aggregate over a single pruned fact pass (the two
    * months never join); the rank windows run on the bounded brand
    * domain. Brands absent from a month rank by zero revenue — total
    * order with the brand tiebreak, so the shift is always defined.
    */
  def qRankShift(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(spark, dir).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1995-03-01").cast("timestamp"))
      .withColumn("m2", (col("o_orderdate") >= lit("1995-02-01").cast("timestamp")).cast("int"))
      .withColumn("cents",
        expr("CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)"))
    val w1 = Window.orderBy(col("rev1").desc, col("p_brand"))
    val w2 = Window.orderBy(col("rev2").desc, col("p_brand"))
    li.groupBy(col("p_brand"))
      .agg(sum(when(col("m2") === 0, col("cents")).otherwise(0L)).cast("long").as("rev1"),
        sum(when(col("m2") === 1, col("cents")).otherwise(0L)).cast("long").as("rev2"))
      .withColumn("rank1", row_number().over(w1).cast("long"))
      .withColumn("rank2", row_number().over(w2).cast("long"))
      .withColumn("shift", col("rank1") - col("rank2"))
      .select(col("p_brand"), col("rev1"), col("rev2"),
        col("rank1"), col("rank2"), col("shift"))
      .orderBy(col("rank2"))
  }

  /** Fulfillment-latency profile per order priority — days from order
    * to LAST line shipped (the complete-order latency a promise-date
    * SLA is written against): mean ×100, max, and a ⌊log₂⌋+1 bucket
    * histogram CSV (the degreeDist bucket trick — ≤7 buckets however
    * long the tail). One lineitem→order-grain aggregate (max shipdate
    * per order), one join to orders, priority-domain rollup. The CSV
    * column makes the whole histogram one hash-comparable row per
    * priority.
    */
  def qShipLatency(spark: SparkSession, dir: String): DataFrame = {
    val lastShip = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("last_ship"))
    val lat = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority").as("prio"), col("o_orderdate"))
      .join(lastShip, col("o_orderkey") === col("l_orderkey"))
      .withColumn("days", expr(
        "(unix_micros(last_ship) - unix_micros(o_orderdate)) div 86400000000"))
      .withColumn("bucket", expr("length(bin(greatest(days, 1)))"))
    val hist = lat.groupBy(col("prio"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("prio"))
      .agg(array_join(sort_array(collect_list(
        concat(lpad(col("bucket").cast("string"), 2, "0"), lit(":"), col("c")))), ",")
        .as("hist_csv"))
    lat.groupBy(col("prio"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        expr("(sum(days) * 100) div count(1)").as("mean_days_x100"),
        max(col("days")).cast("long").as("max_days"))
      .join(hist, Seq("prio"))
      .orderBy(col("prio"))
  }

  /** Open-order backlog time series — cumulative orders placed minus
    * orders fully shipped per day (the queue-depth curve an operations
    * review watches): an order leaves the backlog on the day its LAST
    * line ships. Two day-grain aggregates (placed, completed) outer-
    * merged on the day grid, then day-domain cumulative windows —
    * the fact tables are each touched once, everything after is
    * calendar-bounded.
    */
  def qBacklog(spark: SparkSession, dir: String): DataFrame = {
    val placed = Tables.orders(spark, dir)
      .groupBy(expr("unix_micros(o_orderdate) div 86400000000").as("day"))
      .agg(count(lit(1)).as("opened"))
    val done = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(max(expr("unix_micros(l_shipdate) div 86400000000")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("closed"))
    val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    placed.join(done, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("opened"), lit(0L)).as("opened"),
        coalesce(col("closed"), lit(0L)).as("closed"))
      .withColumn("cum_opened", sum(col("opened")).over(w))
      .withColumn("cum_closed", sum(col("closed")).over(w))
      .withColumn("backlog", col("cum_opened") - col("cum_closed"))
      .orderBy(col("day"))
  }

  /** Revenue bridge (waterfall) 1995 → 1996 per brand — the finance
    * review's "WHY did revenue move" decomposition: Δrevenue splits
    * into a VOLUME effect (Δqty at the old unit price, unit₀ = rev₀
    * div qty₀ floored) and the residual PRICE/MIX effect. Everything
    * is exact signed BIGINT cents — subtractions and one signed
    * product, no division of a signed quantity anywhere, so
    * truncate-vs-floor can never diverge and the bridge reconciles
    * identically in both engines (volume + price_mix ≡ Δ by
    * construction). One fact scan, conditional aggregation per period
    * — the two periods never join.
    */
  def qBridgeAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(spark, dir).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .withColumn("p1", (col("o_orderdate") >= lit("1996-01-01").cast("timestamp")).cast("int"))
      .withColumn("cents",
        expr("CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)"))
      .withColumn("qty", expr("CAST(l_quantity AS BIGINT)"))
    li.groupBy(col("p_brand"))
      .agg(
        sum(when(col("p1") === 0, col("qty")).otherwise(0L)).cast("long").as("qty0"),
        sum(when(col("p1") === 1, col("qty")).otherwise(0L)).cast("long").as("qty1"),
        sum(when(col("p1") === 0, col("cents")).otherwise(0L)).cast("long").as("rev0_c"),
        sum(when(col("p1") === 1, col("cents")).otherwise(0L)).cast("long").as("rev1_c"))
      .filter(col("qty0") > 0)
      .withColumn("delta_c", col("rev1_c") - col("rev0_c"))
      .withColumn("unit0_c", expr("rev0_c div qty0"))
      .withColumn("volume_effect_c", (col("qty1") - col("qty0")) * col("unit0_c"))
      .withColumn("price_mix_effect_c", col("delta_c") - col("volume_effect_c"))
      .select(col("p_brand"), col("qty0"), col("qty1"), col("rev0_c"), col("rev1_c"),
        col("delta_c"), col("unit0_c"), col("volume_effect_c"), col("price_mix_effect_c"))
      .orderBy(col("p_brand"))
  }

  /** Discount impact per part brand — the promo-spend accounting a
    * merchandising review reads: gross (undiscounted) revenue, the
    * discount given away, net revenue, and the effective discount rate
    * ×10⁴ — all from DECIMAL(18,4)-exact sums so the three columns
    * reconcile to the cent (gross − given ≡ net by construction, and
    * the gate would catch either engine flooring differently). One
    * pruned fact scan joined to the part dim; brand-domain output.
    */
  def qDiscountImpact(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.join(Tables.part(spark, dir).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(dec4(col("l_extendedprice"))).as("gross"),
        sum(dec4(col("l_extendedprice") * col("l_discount"))).as("given"),
        sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("net"))
      .select(col("p_brand"), col("n_lines"),
        col("gross").cast("double").as("gross_revenue"),
        col("given").cast("double").as("discount_given"),
        col("net").cast("double").as("net_revenue"),
        // overflow-bound: given <= gross, numerator <= gross * 10^8 — inside DECIMAL(38) for gross < 10^30 currency units.
        expr("""CAST(CAST(given * 10000 AS DECIMAL(38,0)) * 10000
               |  div CAST(gross * 10000 AS DECIMAL(38,0)) AS BIGINT)""".stripMargin)
          .as("disc_rate_x1e4"))
      .orderBy(col("p_brand"))
  }

  /** Exact higher moments — skewness and kurtosis of order values per
    * priority, the distribution-shape profile [[qStats]]' mean/variance
    * readout stops short of. TWO-PASS central sums about the FLOORED
    * group mean (x in hundred-dollar units): the one-pass n-power
    * formulas (n³·S4 − …) blow past 38 digits at cluster scale, while
    * centered units keep Σc⁴ ~ 10²⁵ at 10¹²-row groups — the extra
    * broadcast-join pass IS the scale fix. Ratios are staged floor
    * divisions (spec-defined):
    *   skew²×10¹² = (|Σc³|·10⁶ div Σc²)²·n div Σc²  (+ sign(Σc³)),
    *   kurt ×10⁶  = n·(Σc⁴·10⁶ div Σc²) div Σc²,
    * each intermediate < 10³⁸ at any realistic corpus. m2 = 0 groups
    * (constant value) emit zeros. The 5-row means table broadcasts —
    * fixed priority domain, never data-scale.
    */
  def qMoments(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("prio"),
        expr("CAST(floor(o_totalprice) AS BIGINT) div 100").as("x"))
    val means = x.groupBy(col("prio"))
      .agg(count(lit(1)).as("n"), sum(col("x")).cast("long").as("s1"))
      .withColumn("xbar", expr("s1 div n"))
      .select(col("prio"), col("n"), col("xbar"))
    x.join(broadcast(means), Seq("prio"))
      .withColumn("c", col("x") - col("xbar"))
      .groupBy(col("prio"), col("n"), col("xbar"))
      .agg(sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("m2"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c * c")).as("m3"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c * c * c")).as("m4"))
      .select(col("prio"), col("n"), col("xbar"),
        expr("CAST(m2 div n AS BIGINT)").as("var_u"),
        when(col("m2") > 0, expr(
          // overflow-bound: abs(m3)*1e6 div m2 = |skew|*sigma*1e6 < 10^14 for cents deviations < 10^8 and |skew| < 100; its square * n < 10^28 * n — inside DECIMAL(38) for n < 10^10 orders. m4 = SUM(c^4) <= n * 1.3*10^31 at |c| < 6*10^7 cents — inside DECIMAL(38) for n < 7*10^6 rows per group; past that, pre-aggregate per sub-key.
          """CAST((CAST(abs(m3) * 1000000 div m2 AS DECIMAL(38,0))
            |  * (abs(m3) * 1000000 div m2) * n)
            |  div m2 AS BIGINT)""".stripMargin)).otherwise(0L).as("skew2_x1e12"),
        expr("CAST(sign(m3) AS INT)").as("skew_sign"),
        when(col("m2") > 0, expr(
          "CAST((CAST(n AS DECIMAL(38,0)) * (m4 * 1000000 div m2)) div m2 AS BIGINT)"))
          .otherwise(0L).as("kurt_x1e6"))
      .orderBy(col("prio"))
  }

  /** UNION / INTERSECT / EXCEPT over customer key sets. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    val building = cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val bigSpenders = ord.filter(col("o_totalprice") > 150000.0)
      .select(col("o_custkey").as("c_custkey")).distinct()
    val negBal = cust.filter(col("c_acctbal") < 0).select("c_custkey")
    building.intersect(bigSpenders).union(negBal).except(
        ord.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey")).distinct()
          .intersect(negBal))
      .distinct()
      .orderBy(col("c_custkey"))
  }

  /** Calendar gap-fill (resample): daily order counts with every
    * missing calendar day materialized as an explicit zero row — the
    * densification a time-series consumer needs before rolling math.
    * The calendar is generated from a 1-row min/max aggregate via
    * sequence+explode (span-cardinality, broadcast onto the daily
    * aggregate) — the fact table is scanned once and never re-joined.
    */
  def qGapFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n"))
    val cal = daily.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
    cal.join(daily, Seq("d"), "left_outer")
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        when(col("n").isNull, 1L).otherwise(0L).as("filled"))
      .orderBy(col("day"))
  }

  /** Dataset profiling — the ANALYZE-style per-column statistics a
    * metadata catalog serves (null count, distinct count, min/max):
    * ONE scan computes every column's metrics as parallel partial aggs,
    * then a stack() unpivots to one row per column. At 100 TB this is
    * the single-pass profile job you run at ingest, not a per-column
    * rescan. Values render as strings for the uniform schema; the
    * DECIMAL column profiles over exact cents.
    */
  def qProfile(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq(
      "c_custkey" -> col("c_custkey"),
      "c_name" -> col("c_name"),
      "c_mktsegment" -> col("c_mktsegment"),
      "c_acctbal_cents" -> expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)"))
    val aggs = count(lit(1)).as("n") +: cols.flatMap { case (name, c) => Seq(
      sum(when(c.isNull, 1L).otherwise(0L)).as(s"${name}__nulls"),
      countDistinct(c).as(s"${name}__distinct"),
      min(c).cast("string").as(s"${name}__min"),
      max(c).cast("string").as(s"${name}__max"))
    }
    val stackArgs = cols.map { case (name, _) =>
      s"'$name', ${name}__nulls, ${name}__distinct, ${name}__min, ${name}__max"
    }.mkString(", ")
    Tables.customer(spark, dir)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr("n",
        s"stack(${cols.size}, $stackArgs) AS (column_name, n_null, n_distinct, min_s, max_s)")
      .select(col("column_name"), col("n"), col("n_null"), col("n_distinct"),
        col("min_s"), col("max_s"))
      .orderBy(col("column_name"))
  }

  /** Multiset set operations — EXCEPT ALL / INTERSECT ALL preserve
    * multiplicity (the bag semantics `q_set_ops`'s distinct forms
    * erase): per part key, how many F-status shipments exceed O-status
    * ones, and how many pair off. Multiplicities are re-aggregated per
    * key for a deterministic gateable output.
    */
  def qSetOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val f = li.filter(col("l_linestatus") === "F").select(col("l_partkey"))
    val o = li.filter(col("l_linestatus") === "O").select(col("l_partkey"))
    val ex = f.exceptAll(o).groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    val ia = f.intersectAll(o).groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    ex.union(ia)
      .select(col("op"), col("l_partkey"), col("n"))
      .orderBy(col("op"), col("l_partkey"))
  }

  /** Filter against a scalar aggregate subquery (above-average parts). */
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val avgPrice = p.agg((sum(dec2(col("p_retailprice"))).cast("double") / count(lit(1)))
      .as("avg_price"))
    p.join(broadcast(avgPrice))
      .filter(col("p_retailprice") > col("avg_price"))
      .select("p_partkey", "p_name", "p_retailprice")
      .orderBy(col("p_partkey"))
  }

  /** Top-3 parts by retail price per brand (rank-per-group). */
  def qTopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("p_brand", "rk", "p_partkey", "p_retailprice")
      .orderBy(col("p_brand"), col("rk"))
  }

  /** Top-3 per brand via the NATIVE TopKPerKey operator (custom
    * LogicalPlan + Strategy + partial/final SparkPlan, SURVEY §4) —
    * same results as the window-function variant, but the shuffle
    * carries ≤ k rows per (partition, key).
    */
  def qTopkNative(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopK.perKey(
        Tables.part(spark, dir).select("p_brand", "p_partkey", "p_retailprice"),
        Seq("p_brand"), Seq(("p_retailprice", true), ("p_partkey", false)), 3)
      .orderBy(col("p_brand"), col("p_retailprice").desc, col("p_partkey"))

  /** Exact distinct counts per group. */
  def qDistinct(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
           count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Pivot: line status columns per return flag (declared pivot values →
    * no extra distinct-discovery job).
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(dec2(col("l_quantity"))).cast("double"))
      .orderBy(col("l_returnflag"))
  }

  /** CUBE aggregate over two dimensions. */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  /** LEFT OUTER join aggregate: every customer, with or without orders. */
  def qOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    val ord = Tables.orders(spark, dir).select("o_custkey", "o_orderkey", "o_totalprice")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(dec2(col("o_totalprice"))).cast("double"), lit(0.0)).as("spend"))
      .orderBy(col("c_custkey"))
  }

  /** Window-function variety: lag/lead/ntile/rank with unique tie-breaks. */
  def qWindowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val byPrice = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"),
        col("o_totalprice"))
      .withColumn("prev_us", lag(col("od_us"), 1).over(
        Window.partitionBy(col("o_custkey")).orderBy(col("od_us"), col("o_orderkey"))))
      .withColumn("next_us", lead(col("od_us"), 1).over(
        Window.partitionBy(col("o_custkey")).orderBy(col("od_us"), col("o_orderkey"))))
      .withColumn("quartile", ntile(4).over(
        Window.partitionBy(col("o_custkey")).orderBy(col("od_us"), col("o_orderkey"))))
      .withColumn("price_rank", rank().over(byPrice))
      .select("o_custkey", "o_orderkey", "prev_us", "next_us", "quartile", "price_rank")
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** String-function coverage: case, substring, regex, length, concat. */
  def qStringFuncs(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir).select(
      col("p_partkey"),
      upper(col("p_name")).as("uname"),
      lower(col("p_brand")).as("lbrand"),
      substring(col("p_type"), 1, 5).as("type_prefix"),
      regexp_replace(col("p_name"), "[aeiou]", "").as("consonants"),
      length(col("p_name")).cast("long").as("name_len"),
      concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"))
    .orderBy(col("p_partkey"))
  }

  /** JSON extraction from the events props column. */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** Calendar extraction + monthly aggregate. */
  def qTimeFuncs(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dec2(col("o_totalprice")).as("tp"))
      .groupBy(col("y"), col("m"))
      .agg(count(lit(1)).as("n"), sum(col("tp")).cast("double").as("revenue"))
      .orderBy(col("y"), col("m"))
  }

  /** Correlated-subquery pattern: orders above their own customer's
    * average price (decorrelated to a window aggregate — no re-scan per
    * group, the scalable form of the correlated scalar subquery).
    */
  def qCorrelatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    Tables.orders(spark, dir)
      .withColumn("cust_avg",
        sum(dec2(col("o_totalprice"))).over(w).cast("double") / count(lit(1)).over(w))
      .filter(col("o_totalprice") > col("cust_avg"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Deterministic stratified (systematic) sampling: every 7th row per
    * stratum in key order — the reproducible training-data subsampling
    * pattern (seeded Bernoulli can't be oracle-matched across engines).
    */
  def qSampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_custkey"))
    Tables.customer(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") % 7 === 1)
      .select(col("c_custkey"), col("c_mktsegment"), col("rn"))
      .orderBy(col("c_custkey"))
  }

  /** Exact grouped percentiles (quartiles of order value per status).
    * Computed over integer cents with quarter-point fractions, so the
    * linear interpolation `a + f·(b−a)` is exact rational arithmetic in
    * doubles — bit-identical between Spark's `percentile` and DuckDB's
    * `quantile_cont` regardless of each engine's formula variant.
    * Scale note: exact percentile buffers per-group value counts; it is
    * the right tool for bounded-cardinality groups like these — for
    * percentiles over raw 100 TB value streams use
    * `approx_percentile` (same plan shape, mergeable sketch).
    */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      // floor(x+0.5), not CAST: DuckDB's double→int cast rounds while
      // Spark's truncates — floor is floor in both engines
      .select(col("o_orderstatus"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy(col("o_orderstatus"))
      // ONE percentile buffer evaluating all three points (vs three
      // independent aggregates each building its own per-group value
      // map — measured ~3x the agg work for identical output)
      .agg(expr("percentile(cents, array(0.25, 0.5, 0.75))").as("p"))
      .selectExpr("o_orderstatus",
        "stack(3, 25L, p[0], 50L, p[1], 75L, p[2]) AS (pct, cents_q)")
      .orderBy(col("o_orderstatus"), col("pct"))
  }

  /** FULL OUTER join with null-side coalescing — per-day order counts
    * against per-day ship counts: the calendar reconciliation where
    * either side can be absent (orders before any ship date, ships
    * after the last order date). Both inputs pre-aggregate to one row
    * per day BEFORE the join, so the full-outer shuffle carries
    * day-cardinality rows, not facts.
    */
  def qFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val od = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n_orders"))
    val sd = Tables.lineitem(spark, dir)
      .groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(count(lit(1)).as("n_ships"))
    od.join(sd, Seq("d"), "full_outer")
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_ships"), lit(0L)).as("n_ships"))
      .orderBy(col("day"))
  }

  /** Robust per-group outlier detection via median/MAD — the
    * data-quality screen that, unlike mean/stddev, a few extreme values
    * cannot drag. Everything stays BIGINT: med2 = 2·median(cents) and
    * mad4 = 2·median(2·|c − med|) are integral (an interpolated median
    * of integers is a half-integer), and the outlier rule
    * |c − med| > 3·MAD compares as 2·dev2 > 3·mad4. Two partial-agg
    * percentile passes + two broadcast joins of 3-row group tables —
    * no per-group full-sort window; for raw 100 TB value streams swap
    * `percentile` for `approx_percentile` (same shape, mergeable
    * sketch).
    */
  def qOutlierMad(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.orders(spark, dir)
      .select(col("o_orderstatus"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val med = c.groupBy(col("o_orderstatus"))
      .agg(expr("CAST(2 * percentile(cents, 0.5) AS BIGINT)").as("med2"))
    // dev feeds BOTH the MAD aggregation and the final aggregate; the
    // lazy barrier materializes it in the mad-broadcast job so the
    // orders scan + med join run once, not per consumer (AQE reuses no
    // exchange across consumers). Narrow rows: (status, med2, dev2).
    val dev = c.join(broadcast(med), Seq("o_orderstatus"))
      .select(col("o_orderstatus"), col("med2"),
        abs(lit(2L) * col("cents") - col("med2")).as("dev2"))
      .localCheckpoint(eager = false)
    val mad = dev.groupBy(col("o_orderstatus"))
      .agg(expr("CAST(2 * percentile(dev2, 0.5) AS BIGINT)").as("mad4"))
    dev.join(broadcast(mad), Seq("o_orderstatus"))
      .groupBy(col("o_orderstatus"))
      .agg(min(col("med2")).as("med2"), min(col("mad4")).as("mad4"),
        count(lit(1)).as("n"),
        sum(when(lit(2L) * col("dev2") > lit(3L) * col("mad4"), 1L).otherwise(0L))
          .as("n_out"))
      .orderBy(col("o_orderstatus"))
  }

  /** Deterministic WEIGHTED systematic sampling per stratum: walk rows
    * in key order accumulating integer weight; take a row whenever the
    * cumulative weight crosses a multiple of `step`. Inclusion
    * probability ∝ weight, fully reproducible, pure BIGINT arithmetic
    * (the float-free analog of weighted reservoir sampling — seeded
    * randomness can't be oracle-matched across engines).
    */
  def qWeightedSample(spark: SparkSession, dir: String, step: Long = 97L): DataFrame = {
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_partkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.part(spark, dir)
      .select(col("p_brand"), col("p_partkey"), col("p_size").cast("long").as("wt"))
      .withColumn("cum", sum(col("wt")).over(w))
      .filter(expr(s"cum div $step") > expr(s"(cum - wt) div $step"))
      .orderBy(col("p_partkey"))
  }

  /** GROUPING SETS that are neither a rollup nor a cube: two independent
    * one-dimensional groupings in a single pass over the fact table.
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  /** Value-RANGE window frame: per customer, count and spend of orders
    * within the trailing 30 days of each order (frame bounds in the
    * ORDER BY value's units, not row counts).
    */
  def qWindowRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_day"))
      .rangeBetween(-30, 0)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS BIGINT)")
          .as("o_day"),
        dec2(col("o_totalprice")).as("tp"))
      .withColumn("n_last30", count(lit(1)).over(w))
      .withColumn("spend_last30", sum(col("tp")).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_day"),
        col("n_last30"), col("spend_last30"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** LISTAGG/string_agg: per-segment delimited name list. collect_list
    * order is partition-dependent, so the list is array_sort'ed before
    * joining — deterministic across any parallelism. Per-group payload
    * is bounded by the selective filter (an unbounded listagg is an
    * anti-pattern at 100 TB regardless of engine).
    */
  def qStringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_acctbal") < 0.0)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        array_join(array_sort(collect_list(col("c_name"))), "|").as("names"))
      .orderBy(col("c_mktsegment"))

  /** Exact per-group MODE with a deterministic tie-break (highest count,
    * then smallest value) — count-per-value partial agg, then a
    * first-row-per-group window (auto-rewritten to the native TopKPerKey
    * plan by TopKRewrite).
    */
  def qMode(spark: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("n").desc, col("l_quantity").asc)
    cnt.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Exact weighted median unit price per return flag (weight =
    * quantity): collapse to per-price aggregated weights map-side, one
    * ordered cumulative pass over the COLLAPSED price domain, lower
    * weighted median = smallest price whose cumulative weight w
    * satisfies 2·w ≥ W. All BIGINT cents/units — no interpolation, no
    * floats; the per-group window runs over distinct prices, never the
    * fact rows.
    */
  def qWeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("price_cents"),
        expr("CAST(l_quantity AS BIGINT)").as("w"))
    val byPrice = li.groupBy(col("l_returnflag"), col("price_cents"))
      .agg(sum(col("w")).as("pw"))
      // one fact scan feeds both the per-price weights and (re-aggregated
      // below, sum of sums — BIGINT-exact identical) the per-flag totals;
      // the old second groupBy re-scanned lineitem for 3 rows
      .localCheckpoint(eager = false)
    // Bucketed median refinement (r16; guide §2.5 input skew): the old
    // cumulative window partitioned by l_returnflag pushed EVERY
    // distinct price of a flag through one task — ~200k rows/task on 3
    // tasks locally, unbounded at corpus scale. Two-level scan instead:
    // (1) per-(flag, $1000-bucket) weight sums, cumulated over the
    // ~100-row bucket domain, locate the bucket holding the weighted
    // median and the cumulative weight BEFORE it; (2) re-scan only that
    // bucket's prices (~1% of the domain) for the smallest price whose
    // prefix+in-bucket cumulative weight w satisfies 2·w ≥ W. Same
    // smallest-qualifying-price semantics, BIGINT-exact end to end.
    val bkts = byPrice.withColumn("bkt", expr("price_cents div 100000"))
    val bktAgg = bkts.groupBy(col("l_returnflag"), col("bkt"))
      .agg(sum(col("pw")).as("bw"))
    val bktRun = Window.partitionBy(col("l_returnflag")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = bktAgg.groupBy(col("l_returnflag")).agg(sum(col("bw")).as("total_weight"))
    val medBkt = bktAgg.withColumn("cb", sum(col("bw")).over(bktRun))
      .join(broadcast(tot), "l_returnflag")
      .filter(col("cb") * 2 >= col("total_weight"))
      .groupBy(col("l_returnflag"), col("total_weight"))
      .agg(min(struct(col("bkt"), (col("cb") - col("bw")).as("prefix"))).as("m"))
      .select(col("l_returnflag").as("mfl"), col("total_weight"),
        col("m.bkt").as("mbkt"), col("m.prefix").as("prefix"))
    val inBkt = Window.partitionBy(col("l_returnflag")).orderBy(col("price_cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bkts.join(broadcast(medBkt),
        col("l_returnflag") === col("mfl") && col("bkt") === col("mbkt"))
      .select(col("l_returnflag"), col("price_cents"), col("pw"),
        col("total_weight"), col("prefix"))
      .withColumn("cw", col("prefix") + sum(col("pw")).over(inBkt))
      .filter(col("cw") * 2 >= col("total_weight"))
      .groupBy(col("l_returnflag"), col("total_weight"))
      .agg(min(col("price_cents")).as("wmedian_cents"))
      .select(col("l_returnflag"), col("total_weight"), col("wmedian_cents"))
      .orderBy(col("l_returnflag"))
  }

  /** Supplier revenue concentration per nation — the Herfindahl–
    * Hirschman index in exact integers: per-supplier share in basis
    * points (rev·10⁴ div nation_rev, the product staged DECIMAL(38,0)
    * so fact-scale cents can't overflow), HHI = Σ share_bp² ≤ 10⁸.
    * One fact-scan groupBy, one nation-level rollup.
    */
  def qHhi(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").cast("long").as("nationkey"), col("s_suppkey"))
      .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")).as("rev"))
    val tot = rev.groupBy(col("nationkey"))
      .agg(sum(col("rev")).as("trev"), count(lit(1)).as("n_supp"))
    rev.join(broadcast(tot), "nationkey")
      // overflow-bound: rev <= trev so rev*1e4 <= trev*1e4 < 1e24 at
      // 1e20 corpus cents — inside DECIMAL(38); bp <= 1e4 so each bp*bp
      // <= 1e8 and sum(bp*bp) <= (sum bp)^2 = 1e8, LONG-safe.
      .withColumn("bp", expr("CAST((CAST(rev AS DECIMAL(38,0)) * 10000) div trev AS BIGINT)"))
      .groupBy(col("nationkey"), col("n_supp"))
      .agg(sum(expr("bp * bp")).cast("long").as("hhi_x1e8"))
      .select(col("nationkey"), col("n_supp"), col("hhi_x1e8"))
      .orderBy(col("nationkey"))
  }

  /** CUBE + GROUPING_ID: the bitmask that tells subtotal rows apart
    * from genuine NULL group keys — what makes cube output machine-
    * consumable. Keys are COALESCE'd for a NULL-ordering-proof total
    * order (Spark sorts NULLs first, DuckDB last).
    */
  def qGroupingId(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("gid"), col("n"))
      .orderBy(col("gid"), col("returnflag"), col("linestatus"))

  /** Exact INTERPOLATED median (percentile_cont) per group over integer
    * cents: the (n−1)·p rank-interpolation midpoint of two BIGINTs is a
    * dyadic rational — exactly representable as DOUBLE in both engines,
    * so the interpolating percentile is gateable bit-for-bit (the
    * discrete cousin lives in q_percentiles).
    */
  def qPercentileCont(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        (col("l_quantity") * 100).cast("long").as("cents"))
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("cents"), lit(0.5)).as("median_cents"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** PERCENTILE_DISC quartiles of order value per priority — the
    * discrete (actual-element, no interpolation) percentile via the
    * ANSI `WITHIN GROUP` aggregate: smallest value whose cume_dist ≥ p.
    * p ∈ {.25, .5, .75} are binary-exact doubles, so both engines pick
    * the identical rank ⌈p·n⌉; the oracle pins that rank arithmetic
    * explicitly in integers. One partial-agg-unfriendly sort per group,
    * but groups are the 5 priorities — each percentile is a per-group
    * sorted scan, parallel across groups.
    */
  def qPercentileDisc(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents) AS BIGINT)")
          .as("p25_cents"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT)")
          .as("p50_cents"),
        expr("CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents) AS BIGINT)")
          .as("p75_cents"))
      .orderBy(col("o_orderpriority"))

  /** UNPIVOT (melt): wide per-status counts back to long (key, value)
    * rows — the inverse of q_pivot, via the native Unpivot plan node
    * (an Expand, no join, no shuffle beyond the source agg).
    */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(sum(when(col("l_linestatus") === "F", 1L).otherwise(0L)).as("f_cnt"),
        sum(when(col("l_linestatus") === "O", 1L).otherwise(0L)).as("o_cnt"))
      .unpivot(Array(col("l_returnflag")), Array(col("f_cnt"), col("o_cnt")), "k", "v")
      .orderBy(col("l_returnflag"), col("k"))

  /** DETERMINISTIC approximate distinct via a KMV (k-minimum-values)
    * bottom-k sketch: hash every key with a fixed Knuth multiplicative
    * hash into [0, 2³²), keep the k smallest DISTINCT hashes per group
    * (the native [[graft.functions.BottomK]] TypedImperativeAggregate —
    * ≤ k longs per group over the wire), and estimate
    * |D| ≈ (k−1)·2³² div h_k. Fewer than k distinct hashes ⇒ the sketch
    * IS the exact distinct set. Unlike engine-native HLL
    * (q_approx_distinct, whose register layout is engine-specific and
    * thus ungateable), this estimator is pure replayable integer
    * arithmetic — the DuckDB oracle reproduces it hash-exactly, so an
    * approximate operator still gets a correctness gate; the error
    * bound (rsd ≈ 1/√(k−2)) is pinned in RelationalSpec.
    */
  def qApproxDistinctKmv(spark: SparkSession, dir: String, k: Int = 64): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        ((col("l_partkey") * 2654435761L) % 4294967296L).as("h"))
      .groupBy(col("l_returnflag"))
      .agg(graft.functions.BottomK.bottomK(col("h"), k).as("sk"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("n_rows"),
        when(size(col("sk")) < k, size(col("sk")).cast("long"))
          .otherwise(expr(s"(${k - 1} * 4294967296) div greatest(element_at(sk, $k), 1)"))
          .as("est_distinct"))
      .orderBy(col("l_returnflag"))

  /** DETERMINISTIC rank-adaptive mergeable quantile sketch (r15,
    * VERDICT r14 #6): p50/p90/p99 of the price-cents distribution per
    * return flag via the native KLL-style
    * [[graft.functions.QuantileSketchAgg]] — the adaptive-quantile
    * rung joining the gated sketch family the way BottomK/HLL/Roaring
    * gated distinct (q_quantile_hist stays the fixed-width face;
    * engine-native approx_percentile remains documented-but-ungateable
    * for the same reason HLL registers are). Each row's sampling level
    * is the trailing-zero count of a content hash computed IN the
    * query (the modular staging keeps every product within BIGINT);
    * the sketch keeps rows with level ≥ L, raising L until ≤ k
    * survive — a pure function of the row set, so partitioning and
    * merge order cannot change the result and the DuckDB oracle
    * replays the identical selection rule. Sampled rows weigh 2^L;
    * quantiles are order statistics of the sorted sample at index
    * ⌈p·n/100⌉ and est_n = n_samp·2^L is the self-audit against the
    * exact n_rows. ≤ k (level, value) pairs per group cross the wire,
    * full map-side combine — the 100 TB shape for adaptive quantiles.
    */
  def qQuantileKll(spark: SparkSession, dir: String, k: Int = 256): DataFrame = {
    def quant(p: Int) =
      when(size(col("sk")) <= 1, lit(null).cast("long"))
        .otherwise(expr(
          s"element_at(sk, 2 + CAST(greatest(1, (CAST(size(sk) - 1 AS BIGINT) * $p + 99) div 100) AS INT) - 1)"))
        .as(s"p${p}_cents")
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("v"),
        expr("(((l_orderkey * 40503 + l_linenumber * 7919 + l_partkey) % 2147483648) " +
          "* 2654435761) % 4294967296").as("h"))
      .withColumn("lvl", expr(
        "CASE WHEN h = 0 THEN 32 ELSE CAST(bit_count((h & -h) - 1) AS INT) END"))
      .groupBy(col("l_returnflag"))
      .agg(graft.functions.QuantileSketchAgg.quantileSketch(col("v"), col("lvl"), k).as("sk"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("n_rows"),
        element_at(col("sk"), 1).as("lvl"),
        (size(col("sk")) - 1).cast("long").as("n_samp"),
        expr("CAST(size(sk) - 1 AS BIGINT) * shiftleft(CAST(1 AS BIGINT), " +
          "CAST(element_at(sk, 1) AS INT))").as("est_n"),
        quant(50), quant(90), quant(99))
      .orderBy(col("l_returnflag"))
  }

  /** Exact distinct customers per order month via the native
    * [[graft.functions.BitmapDistinctAgg]] — the mergeable-EXACT
    * alternative to HLL/KMV when keys are dense integers: each group's
    * partial is a bitmap (one bit per id), the shuffle merges by word
    * OR, and the count is a popcount — so unlike COUNT(DISTINCT), which
    * Spark plans as a two-stage expand + re-shuffle of every distinct
    * (group, key) pair, the bitmap ships ⌈domain/8⌉ bytes per group per
    * partition with full map-side combine. The oracle IS
    * count(DISTINCT), gating the whole update/merge/popcount path
    * hash-exact.
    */
  def qBitmapDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(expr("CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)").as("ym"),
        col("o_custkey"))
      .groupBy(col("ym"))
      .agg(graft.functions.BitmapDistinctAgg.bitmapDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("ym"))

  /** [[qBitmapDistinct]] with ROARING containers over a SPARSE key
    * space — the production shape the flat bitmap's docstring promises
    * ([[graft.functions.RoaringDistinctAgg]]): keys are poly-hashes of
    * the customer id spread across [0, 10⁹+7), where a flat bitmap
    * would ship 128 MB partials per group and the roaring buffer ships
    * ~2 B per distinct value (array containers, upgrading to 8 KiB
    * bitmaps only for dense chunks). The hash is the engine-portable
    * fingerprint so DuckDB counts the identical key set.
    */
  def qBitmapDistinctRoaring(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        graft.text.TextFunctions.fingerprint(col("o_custkey").cast("string")).as("hkey"))
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.RoaringDistinctAgg.roaringDistinct(col("hkey"))
          .as("n_distinct_keys"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** Chi-square independence audit of a contingency table — the
    * drift/association screen (is event type independent of the value
    * band?) in exact scaled integers: per cell, expected×10⁶ =
    * r·c·10⁶ div N and the χ² contribution ×10⁶ =
    * (o·N − r·c)²·10⁶ div (N·r·c) — the (o−rc/N)²/(rc/N) identity
    * multiplied through by N² so no fraction ever materializes;
    * deviations stage through DECIMAL(38,0) (o·N alone breaks BIGINT
    * at corpus scale, and r·c·10⁶ does too). One partial-agg pass
    * builds the cells; marginals are broadcast joins against the
    * types×2 grid, which is fixed-size at any corpus.
    */
  def qChisq(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, dir))
      .select(col("event_type"), (col("value") >= 100.0).cast("int").as("hi"))
    val cells = ev.groupBy(col("event_type"), col("hi"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(false) // three marginal consumers
    val rowm = cells.groupBy(col("event_type")).agg(sum(col("o")).as("r"))
    val colm = cells.groupBy(col("hi")).agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n_total"))
    cells.join(broadcast(rowm), Seq("event_type"))
      .join(broadcast(colm), Seq("hi"))
      .crossJoin(broadcast(tot))
      .withColumn("dev",
        expr("CAST(o AS DECIMAL(38,0)) * n_total - CAST(r AS DECIMAL(38,0)) * c"))
      .select(col("event_type"), col("hi"), col("o"), col("r"), col("c"),
        col("n_total"),
        // overflow-bound: |dev| <= n_total^2, so dev^2 * 1e6 <= n_total^4 * 1e6 — inside DECIMAL(38) for n_total < 10^8 events; past that stage the division (dev^2 div (n_total*r)) div c.
        expr("CAST(CAST(r AS DECIMAL(38,0)) * c * 1000000 div n_total AS BIGINT)")
          .as("exp_x1e6"),
        expr("CAST(dev * dev * 1000000 div (CAST(n_total AS DECIMAL(38,0)) * r * c) AS BIGINT)")
          .as("chi_x1e6"))
      .orderBy(col("event_type"), col("hi"))
  }

  /** Deterministic HyperLogLog distinct estimate, ORACLE-GATED — the
    * gated twin of [[qApproxDistinct]] (whose built-in HLL++ sketch is
    * engine-internal and rows-only by necessity). Own sketch, public
    * Flajolet et al. 2007 construction, every step exact integer
    * arithmetic: a 32-bit multiply–xorshift–multiply avalanche hash
    * (one multiplicative round is NOT enough here — sequential keys
    * form an arithmetic progression mod 2³² whose leading-zero
    * statistics overestimate 2× at 20k keys; the xorshift rounds fix
    * the measured error to <1.2 rsd at every SF) → m=64 registers
    * keyed by the low 6 bits, ρ = leading-zero count of the 26-bit
    * remainder + 1, and the
    * harmonic denominator Σ 2^(−ρ) held exact by scaling to
    * Σ 2^(50−ρ) in BIGINT (ρ ≤ 27 ⇒ every term and the 64-term sum fit
    * with room). Estimate = α₆₄·m²·2⁵⁰ div S with α₆₄ pinned as the
    * ×10⁶ literal 709376, staged through DECIMAL(38,0). Registers are
    * a (flag, bucket) max — partial-agg friendly, 64 rows per group on
    * the wire at any scale; empty registers enter via a 64-row grid
    * join (ρ=0 ⇒ the full 2⁵⁰ term, per the spec). Exact distincts
    * ride along for error inspection; the ≤3·rsd accuracy bound
    * (rsd = 1.04/√64) is pinned in RelationalSpec.
    */
  def qApproxDistinctHll(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_partkey"))
      .localCheckpoint(false)
    val regs = li
      .select(col("l_returnflag"), expr("l_partkey * 2654435761").as("m1"))
      .select(col("l_returnflag"),
        expr("(m1 ^ (m1 div 65536)) % 4294967296").as("x1"))
      // second multiplier < 2^31 keeps the product inside BIGINT
      .select(col("l_returnflag"), expr("x1 * 1779033703").as("m2"))
      .select(col("l_returnflag"),
        expr("(m2 ^ (m2 div 65536)) % 4294967296").as("h"))
      .select(col("l_returnflag"), expr("h % 64").as("bucket"),
        expr("h div 64").as("rest"))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(max(expr(
        "CASE WHEN rest = 0 THEN 27 ELSE 27 - length(bin(rest)) END")).as("rho"))
    val grid = li.select(col("l_returnflag")).distinct()
      .crossJoin(spark.range(64).select(col("id").as("bucket")))
    val s = grid.join(regs, Seq("l_returnflag", "bucket"), "left")
      .select(col("l_returnflag"),
        expr("shiftleft(CAST(1 AS BIGINT), 50 - coalesce(rho, 0))").as("term"))
      .groupBy(col("l_returnflag")).agg(sum(col("term")).as("ssum"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_distinct"),
        count(lit(1)).as("n_rows"))
    s.join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"),
        // overflow-bound: constant numerator (alpha_64 * m * 2^50 ~ 3.3*10^24); no data-dependent factor.
        expr("CAST(CAST(709376 AS DECIMAL(38,0)) * 4096 * 1125899906842624" +
          " div CAST(ssum AS DECIMAL(38,0)) div 1000000 AS BIGINT)")
          .as("est_distinct"),
        col("exact_distinct"), col("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** Exact Gini coefficient of customer spend per market segment — the
    * inequality gauge, in pure BIGINT: with spend sorted ascending
    * inside each segment (rank i, n rows, total S), Gini·10⁶ =
    * 10⁶·Σ((2i−n−1)·xᵢ) div (n·S). The sort is a per-SEGMENT window
    * (parallel across segments, dimension-scale rows — never a global
    * single-reducer sort), and the rank-weighted sum is one partial
    * agg.
    */
  /** Lorenz-curve deciles per market segment — the distributional
    * readout behind [[qGini]]'s single coefficient: customers ranked
    * by spend within their segment, decile d = ((rn−1)·10) div n, and
    * per decile the exact customer count, cents, and CUMULATIVE share
    * of the segment's total ×10⁶ (the Lorenz curve's y-axis — "the
    * bottom 50% hold X% of spend"). The ranking window is the same
    * per-segment customer-scale window Gini already runs; the
    * cumulative pass runs over the 10-row-per-segment decile grid.
    */
  def qLorenz(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("cents"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("cents"), col("o_custkey"))
    val deciles = spend
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("c_mktsegment"))))
      .withColumn("decile", expr("((rn - 1) * 10) div n"))
      .groupBy(col("c_mktsegment"), col("decile"))
      .agg(count(lit(1)).cast("long").as("n_customers"),
        sum(col("cents")).cast("long").as("cents"))
    val wCum = Window.partitionBy(col("c_mktsegment")).orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy(col("c_mktsegment"))
    deciles
      .withColumn("cum_cents", sum(col("cents")).over(wCum))
      .withColumn("seg_cents", sum(col("cents")).over(wTot))
      .select(col("c_mktsegment"), col("decile"), col("n_customers"), col("cents"),
        // segment-total × 1e6 passes int64 near sf3 — DECIMAL(38,0) staged
        expr("CAST(CAST(cum_cents AS DECIMAL(38,0)) * 1000000 div seg_cents AS BIGINT)")
          .as("cum_share_ppm"))
      .orderBy(col("c_mktsegment"), col("decile"))
  }

  /** ABC (Pareto 70/90) classification of parts by revenue — the
    * inventory-analytics classic: parts ranked by total revenue desc,
    * class A while the RUNNING share is < 70% of total, B to 90%,
    * else C; per class the part count, revenue, exact share ×10⁶ and
    * rank span. The rank/cumsum over the PART domain (grows with SF —
    * ~2·10⁸ parts at TPC-H sf1000) runs as [[rankedCum]]'s two-phase
    * range-partitioned prefix sum, NOT a bare single-partition window
    * (VERDICT r9 #1 — the q_kruskal migration applied here); the total
    * is a 1-row broadcast. Boundary rule pinned: a part is classed by
    * the share BEFORE it, so the part that crosses 70% is still A —
    * both engines replay the identical rule.
    */
  def qAbcAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
        .cast("long").as("cents"))
    val tot = rev.agg(sum(col("cents")).cast("long").as("total"))
    val classed = rankedCum(rev,
        Seq(col("cents").desc, col("l_partkey")), col("cents"))
      .withColumnRenamed("rn", "rk")
      .withColumn("before", col("cum") - col("cents"))
      .crossJoin(broadcast(tot))
      // ×100 / ×1e6 products of corpus-total cents overflow int64 past
      // ~sf1 — stage through DECIMAL(38,0) like every corpus-sum multiply
      .withColumn("abc_class",
        when(expr("CAST(before AS DECIMAL(38,0)) * 100 < CAST(total AS DECIMAL(38,0)) * 70"), "A")
          .when(expr("CAST(before AS DECIMAL(38,0)) * 100 < CAST(total AS DECIMAL(38,0)) * 90"), "B")
          .otherwise(lit("C")))
    classed.groupBy(col("abc_class"))
      .agg(count(lit(1)).cast("long").as("n_parts"),
        sum(col("cents")).cast("long").as("cents"),
        min(col("rk")).as("min_rank"), max(col("rk")).as("max_rank"),
        max(col("total")).as("total"))
      .withColumn("share_ppm",
        expr("CAST(CAST(cents AS DECIMAL(38,0)) * 1000000 div total AS BIGINT)"))
      .select(col("abc_class"), col("n_parts"), col("cents"), col("share_ppm"),
        col("min_rank"), col("max_rank"))
      .orderBy(col("abc_class"))
  }

  /** Winsorized mean per market segment — the robust-mean member of
    * the outlier family ([[qOutlierMad]] flags, winsorize REPAIRS):
    * per-customer spend cents clamped into the segment's [p10, p90]
    * (PERCENTILE_DISC actual elements, so both limits and every
    * clamped value stay exact BIGINTs — no interpolation float), then
    * the raw vs winsorized mean ×100 and the clamp counts per side.
    * Scale shape: the limits table is |segments| rows broadcast; the
    * clamp is a map-side expression; two partial-agg passes over the
    * per-customer rows, no window.
    */
  def qWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("cents"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val lims = spend.groupBy(col("c_mktsegment"))
      .agg(expr("CAST(percentile_disc(0.10) WITHIN GROUP (ORDER BY cents) AS BIGINT)")
          .as("lo_cents"),
        expr("CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY cents) AS BIGINT)")
          .as("hi_cents"))
    spend.join(broadcast(lims), Seq("c_mktsegment"))
      .groupBy(col("c_mktsegment"), col("lo_cents"), col("hi_cents"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("cents")).cast("long").as("sum_raw"),
        sum(expr("least(greatest(cents, lo_cents), hi_cents)")).cast("long").as("sum_w"),
        sum(when(col("cents") < col("lo_cents"), 1L).otherwise(0L))
          .cast("long").as("n_clamped_lo"),
        sum(when(col("cents") > col("hi_cents"), 1L).otherwise(0L))
          .cast("long").as("n_clamped_hi"))
      .withColumn("mean_x100", expr("(sum_raw * 100) div n"))
      .withColumn("wmean_x100", expr("(sum_w * 100) div n"))
      .select(col("c_mktsegment"), col("n"), col("lo_cents"), col("hi_cents"),
        col("n_clamped_lo"), col("n_clamped_hi"), col("mean_x100"), col("wmean_x100"))
      .orderBy(col("c_mktsegment"))
  }

  def qGini(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("cents"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("cents"), col("o_custkey"))
    spend.withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("c_mktsegment"))
      // DECIMAL(38,0) staging, cast BEFORE the rank multiply: 10⁶·(wsum −
      // nS) tops ~1e21 at sf0.1 and (2i−1)·cents alone nears int64 at
      // large SF — both silent-wraparound territory in BIGINT.
      // overflow-bound: wsum ≤ 2nS, so 10⁶·(wsum−nS) ≤ 10⁶·nS ~ 10³²
      // even at n~3·10⁹ customers × S~3·10¹⁶ cents (100 TB); the
      // quotient is Gini·10⁶ ≤ 10⁶, well inside BIGINT
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(cents AS DECIMAL(38,0))")).as("s"),
        sum(expr("CAST(cents AS DECIMAL(38,0)) * (2 * i - 1)")).as("wsum"))
      .select(col("c_mktsegment"), col("n"),
        // Gini = (2Σi·xᵢ − (n+1)S)/(nS); with wsum = Σ(2i−1)xᵢ = 2Σi·x − S
        // this is (wsum − nS)/(nS)
        expr("CAST((1000000 * (wsum - n * s)) div (n * s) AS BIGINT)").as("gini_x1e6"))
      .orderBy(col("c_mktsegment"))
  }

  /** One-way ANOVA of per-customer spend across market segments — the
    * k-group extension of [[graft.operators.Temporal.qTtest]]'s
    * two-arm test, divide-late so every stage is exact: group means
    * floor to the ×100 grain (S_g·100 div n_g — the only early
    * division, on positive BIGINTs), then SSB = Σ n_g·dev² and
    * SSW = Q·10⁴ − Σ n_g·m_g² are PURE DECIMAL(38,0) multiplications
    * (Σcents² tops 1e21 at sf0.1 — sum-of-squares never fits BIGINT,
    * and a per-group S_g² div n_g would overflow IntegralDivide's
    * BIGINT result, so the mean-deviation identity is the only staging
    * that stays exact). F = (SSB·(N−k)) / (SSW·(k−1)) emits ×1000 via
    * one decimal integer division. Scale shape: one partial-agg pass
    * to k group-moment rows, then a k-row reduce — nothing after the
    * o_custkey shuffle touches data size.
    */
  /** Kruskal–Wallis H across market segments on per-customer spend —
    * [[qAnova]]'s rank-based (distribution-free) sibling and the k-group
    * generalization of q_mannwhitney. Tie-averaged ranks ride as DOUBLED
    * integers (2·avgrank = 2·start + cnt − 1, the q_mannwhitney device),
    * computed from ONE cumulative count over the DISTINCT-cents value
    * domain (never a fact-scale single-partition window); with doubled
    * rank sums S₂g the statistic folds as H = 3/(N(N+1))·Σ S₂g²/n_g −
    * 3(N+1). Per-group floors are mirrored in the oracle, so the ×10⁶
    * readout is bit-identical (no tie correction — documented; spend
    * cents are near-unique so the correction is ~1 ppm here).
    */
  def qKruskal(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).cast("long").as("cents"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .localCheckpoint(eager = false) // feeds the value domain AND the cells
    // cumulative count over the distinct-cents domain via the range-
    // partitioned two-phase prefix sum (rankedCum) — the domain is
    // near-customer-scale here, so a bare single-partition window would
    // be the r7 scale-killer PlanSpec bans
    val vc = rankedCum(spend.groupBy(col("cents")).agg(count(lit(1)).as("cnt")),
        Seq(col("cents")), col("cnt"))
      .withColumn("start", col("cum") - col("cnt") + 1)
    val cell = spend.groupBy(col("cents"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt_gs"))
    val g = cell.join(vc.select(col("cents"), col("start"), col("cnt")), Seq("cents"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("cnt_gs")).cast("long").as("n_g"),
        sum(expr("cnt_gs * (2 * start + cnt - 1)")).cast("long").as("s2_g"))
    g.agg(count(lit(1)).cast("long").as("n_groups"),
        sum(col("n_g")).cast("long").as("n"),
        // overflow-bound: S2_g <= 2N^2 so S2_g^2 <= 4N^4 — inside DECIMAL(38) for N < 10^9 customers; the div n_g floor is mirrored in the oracle.
        sum(expr("(CAST(s2_g AS DECIMAL(38,0)) * s2_g) div n_g")).as("a"))
      .select(col("n"), col("n_groups"),
        // overflow-bound: A = Σ S2_g²/n_g <= 4N^3, so 3·10^6·A <= 1.2·10^7·N^3 — inside DECIMAL(38) for N < 10^10.
        expr("""CAST((CAST(3000000 AS DECIMAL(38,0)) * a) div (n * (n + 1))
               |  - 3 * (n + 1) * 1000000 AS BIGINT)""".stripMargin).as("h_x1e6"))
  }

  def qAnova(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("cents"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val g = spend.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_g"), sum(col("cents")).cast("long").as("s_g"),
        // overflow-bound: per-customer cents < 10^10 so cents^2 < 10^20, summed over < 10^9 customers < 10^29; n_g * m_g_x100^2 < 10^9 * 10^24 = 10^33 — both inside DECIMAL(38).
        sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("q_g"))
      .withColumn("m_g_x100", expr("(s_g * 100) div n_g"))
    g.agg(count(lit(1)).cast("long").as("k"),
        sum(col("n_g")).cast("long").as("n_total"),
        sum(col("s_g")).cast("long").as("sum_cents"),
        sum(col("q_g")).as("ssq"),
        sum(expr("CAST(n_g AS DECIMAL(38,0)) * m_g_x100 * m_g_x100")).as("sb_raw"))
      .withColumn("m_x100", expr("(sum_cents * 100) div n_total"))
      // Σ n_g·(m_g − m)² = Σ n_g·m_g² − N·m² (the floored-mean grain is
      // the definition here, identical in both engines)
      .withColumn("ssb_x1e4",
        expr("sb_raw - CAST(n_total AS DECIMAL(38,0)) * m_x100 * m_x100"))
      .withColumn("ssw_x1e4", expr("ssq * 10000 - sb_raw"))
      .withColumn("f_x1e3", expr(
        "CAST(ssb_x1e4 * (n_total - k) * 1000 div (ssw_x1e4 * (k - 1)) AS BIGINT)"))
      // The wide sums stay DECIMAL(38,0) internally, but the OUTPUT
      // boundary is BIGINT-only (decimal128 hashes differently across
      // engines' arrow writers): split each sum into base-10¹⁸ hi/lo
      // BIGINTs. ssq and ssw are sums of squares (non-negative ⇒
      // div/%% agree across truncate-vs-floor); ssb can graze negative
      // on a degenerate equal-means corpus, so it emits |·| + sign.
      .select(col("k"), col("n_total"), col("sum_cents"),
        expr("CAST(ssq div 1000000000000000000 AS BIGINT)").as("ssq_hi"),
        expr("CAST(ssq % 1000000000000000000 AS BIGINT)").as("ssq_lo"),
        expr("CAST(sign(ssb_x1e4) AS INT)").as("ssb_sign"),
        expr("CAST(abs(ssb_x1e4) div 1000000000000000000 AS BIGINT)").as("ssb_x1e4_abs_hi"),
        expr("CAST(abs(ssb_x1e4) % 1000000000000000000 AS BIGINT)").as("ssb_x1e4_abs_lo"),
        expr("CAST(ssw_x1e4 div 1000000000000000000 AS BIGINT)").as("ssw_x1e4_hi"),
        expr("CAST(ssw_x1e4 % 1000000000000000000 AS BIGINT)").as("ssw_x1e4_lo"),
        col("f_x1e3"))
  }

  /** Cramér's V effect size of the [[qChisq]] contingency table — the
    * "is the association big, not just significant" companion number:
    * V² = χ² / (N·min(r−1, c−1)), emitted ×10⁹ (squared form — the
    * square root is left to the consumer so the emission stays an
    * exact integer). χ² here is Σ of the per-cell floored ×10⁶
    * contributions — the same deterministic grain [[qChisq]] gates on,
    * so the two queries are consistent by construction. Runs entirely
    * on qChisq's cells-sized output: one reduce over (types × 2) rows.
    */
  def qCramersV(spark: SparkSession, dir: String): DataFrame =
    qChisq(spark, dir)
      .agg(sum(col("chi_x1e6")).cast("long").as("chi2_x1e6"),
        max(col("n_total")).cast("long").as("n"),
        countDistinct(col("event_type")).cast("long").as("r"),
        countDistinct(col("hi")).cast("long").as("c"))
      .withColumn("dof_min", expr("least(r - 1, c - 1)"))
      .select(col("chi2_x1e6"), col("n"), col("r"), col("c"), col("dof_min"),
        expr("(chi2_x1e6 * 1000) div (n * dof_min)").as("v2_x1e9"))

  /** Mergeable-histogram quantile estimation — the single-pass,
    * partial-agg answer to "give me p50/p90/p99 of a 100 TB column
    * without sorting it": orders' totals bucket into fixed $10k-wide
    * bins (one groupBy to ≤ domain/width cells, map-side combined),
    * a cumulative window runs over the CELLS (dozens of rows at any
    * corpus size — never the data), and each requested percentile
    * resolves to the first bin whose cumulative count reaches rank
    * ⌈p·n/100⌉. The estimate is the bin's [lo, hi] cents range — the
    * histogram's resolution is the honest error bar, and every step is
    * integer arithmetic ⇒ hash-exact despite being approximate. The
    * exact path for comparison is [[qPercentiles]]' full-sort plan.
    */
  def qQuantileHist(spark: SparkSession, dir: String): DataFrame = {
    val binW = 1000000L // $10k in cents
    val cells = Tables.orders(spark, dir)
      .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy(expr(s"cents div $binW").as("bin"))
      .agg(count(lit(1)).as("n"))
    // cumulative over histogram cells: a global window, but over ≤
    // domain/binW rows by construction (not a data-sized sort)
    val cum = cells.withColumn("cum",
      sum(col("n")).over(Window.orderBy(col("bin"))))
      .localCheckpoint(false)
    val tot = cum.agg(max(col("cum")).as("n_total"))
    val ps = spark.range(1).selectExpr("explode(array(25, 50, 75, 90, 99)) AS p")
    ps.crossJoin(broadcast(tot))
      .withColumn("rank", expr("(p * n_total + 99) div 100"))
      .join(broadcast(cum), col("cum") >= col("rank"))
      .groupBy(col("p"), col("rank"), col("n_total"))
      .agg(min(col("bin")).as("est_bin"))
      .select(col("p"), col("n_total"), col("rank"),
        expr(s"est_bin * $binW").as("est_lo_cents"),
        expr(s"(est_bin + 1) * $binW - 1").as("est_hi_cents"))
      .orderBy(col("p"))
  }

  /** Count-Min sketch frequency estimation — the fixed-memory
    * frequency oracle for an unbounded key domain: every order folds
    * into K=3 hashed rows of a W=4096-cell counter table (one
    * explode→groupBy, 3·W mergeable cells total — the sketch IS the
    * aggregate, shipping ~100 KB no matter how many keys exist), and a
    * point query for key x reads min over k of cell[k][h_k(x)] —
    * always ≥ the true count, overshooting by ≤ εN with ε ≈ e/W. A
    * pinned 20-key probe set (custkeys 1–20, present at every SF and
    * including zero-order customers, whose estimate is pure collision
    * noise) is estimated from the sketch and joined to the exact
    * counts, so the gate pins both the estimates and the ≥-exact
    * invariant. Deterministic pinned-constant hashing ⇒ hash-exact.
    */
  def qFreqCms(spark: SparkSession, dir: String): DataFrame = {
    val W = 4096L
    // pinned odd multipliers/offsets; key and A_k < 2^32 so the product
    // stays far inside BIGINT before the mods
    val A = Seq(2654435761L, 2246822519L, 3266489917L)
    val B = Seq(1L, 7L, 13L)
    def hSql(keyCol: String, k: Int): String =
      s"(($keyCol * ${A(k)} + ${B(k)}) % 2147483647) % $W"
    val cells = Tables.orders(spark, dir)
      .select(col("o_custkey"))
      .select(posexplode(array(
        (0 to 2).map(k => expr(hSql("o_custkey", k))): _*)).as(Seq("k", "cell")))
      .groupBy(col("k"), col("cell")).agg(count(lit(1)).as("n"))
      // three probe joins consume the sketch — materialize it once
      .localCheckpoint(false)
    val probes = spark.range(1, 21).selectExpr("id AS probe_key")
    val est = (0 to 2).foldLeft(
      probes.select(col("probe_key") +:
        (0 to 2).map(k => expr(hSql("probe_key", k)).as(s"c$k")): _*)) {
        (df, k) =>
          df.join(cells.filter(col("k") === k)
              .select(col("cell").as(s"cell$k"), col("n").as(s"n$k")),
            col(s"c$k") === col(s"cell$k"), "left")
      }
      .select(col("probe_key"),
        least((0 to 2).map(k => coalesce(col(s"n$k"), lit(0L))): _*).as("est"))
    val exact = Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 20)
      .groupBy(col("o_custkey").as("probe_key"))
      .agg(count(lit(1)).as("exact"))
    est.join(exact, Seq("probe_key"), "left")
      .select(col("probe_key"), col("est"),
        coalesce(col("exact"), lit(0L)).as("exact"),
        (col("est") - coalesce(col("exact"), lit(0L))).as("overcount"))
      .orderBy(col("probe_key"))
  }

  /** Decay weight CASE (×2⁶-scaled halving per year of age) — single
    * source for the Spark plan and the DuckDB oracle. Ages past the
    * 6-year horizon get weight 0: an explicit decay cutoff, not an
    * overflow dodge — a 1-year half-life leaves <1.6% mass there.
    */
  val decayCaseSql: String =
    (0 to 6).map(a => s"WHEN $a THEN ${64 >> a}")
      .mkString("CASE max_y - y ", " ", " ELSE 0 END")

  /** Exact exponential time-decay aggregate — the recency-weighted
    * feature every ranking/feature pipeline needs, computed with NO
    * floating pow(): a 1-year half-life means weight 2^(−age_years),
    * held exact by scaling everything by 2⁶ (the horizon), so each
    * order contributes cents·2^(6−age) in integer arithmetic. Per
    * market segment: order count, raw spend, decayed spend (×2⁶), and
    * the decayed/raw recency ratio ×10⁶. Sums stage through
    * DECIMAL(38,0) (a 100 TB corpus overflows BIGINT at weight 64);
    * one partial-agg groupBy after the customer join, "now" (max year)
    * is a broadcast 1-row scalar.
    */
  def qDecay(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_custkey"),
      expr("CAST(year(o_orderdate) AS INT)").as("y"),
      expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val maxy = o.agg(max(col("y")).as("max_y"))
    o.crossJoin(broadcast(maxy))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(cents AS DECIMAL(38,0))")).as("spend_cents"),
        sum(expr(s"CAST(cents * ($decayCaseSql) AS DECIMAL(38,0))"))
          .as("decayed_x64"))
      // BIGINT-only output boundary: the DECIMAL(38,0) staging sums
      // emit as base-10¹⁸ hi/lo BIGINT pairs (both non-negative ⇒
      // truncating div ≡ flooring //).
      .select(col("c_mktsegment"), col("n_orders"),
        expr("CAST(spend_cents div 1000000000000000000 AS BIGINT)").as("spend_cents_hi"),
        expr("CAST(spend_cents % 1000000000000000000 AS BIGINT)").as("spend_cents_lo"),
        expr("CAST(decayed_x64 div 1000000000000000000 AS BIGINT)").as("decayed_x64_hi"),
        expr("CAST(decayed_x64 % 1000000000000000000 AS BIGINT)").as("decayed_x64_lo"),
        // decayed/64/spend ×1e6 = decayed·15625/spend, exact integer div
        expr("CAST((decayed_x64 * 15625) div spend_cents AS BIGINT)")
          .as("recency_x1e6"))
      .orderBy(col("c_mktsegment"))
  }

  /** Benford expectation CASE (×10⁴ integer literals) — single source
    * for the Spark plan and the DuckDB oracle.
    */
  val benfordCaseSql: String =
    (1 to 9).map(d => s"WHEN $d THEN CAST(${math.round(math.log10(1.0 + 1.0 / d) * 10000)} AS BIGINT)")
      .mkString("CASE digit ", " ", " END")

  /** Benford leading-digit audit of order totals — the fraud screen:
    * leading digit extracted by pure integer string math (identical
    * CAST-to-VARCHAR in both engines), counts + exact ×10⁴ shares vs
    * the Benford expectation log₁₀(1+1/d) ×10⁴ pinned as integer
    * literals. One partial-agg groupBy on a 9-row grid.
    */
  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select(expr(
        "CAST(substring(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING), 1, 1) AS INT)")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("share_x1e4", expr("n * 10000 div sum(n) OVER ()"))
      .withColumn("benford_x1e4", expr(benfordCaseSql))
      .orderBy(col("digit"))
  }

  /** Log-spaced (powers-of-2) histogram of order totals — the
    * heavy-tail histogram fixed-width bins can't draw. The bucket is
    * the integer bit length of the cents value (= ⌊log₂⌋+1) computed
    * as `length(bin(x))`, identical in both engines — no floating
    * log₂ anywhere. Same partial-agg single-groupBy shape as
    * [[qHistogram]].
    */
  def qHistogramLog(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy(expr("CAST(length(bin(cents)) AS INT)").as("log2_bucket"))
      .agg(count(lit(1)).as("n"), min(col("cents")).as("lo_cents"),
        max(col("cents")).as("hi_cents"))
      .orderBy(col("log2_bucket"))

  /** KMV sketch SET ALGEBRA — estimating the overlap of two sets from
    * their bottom-k sketches alone (the catalog's "how much do these
    * two corpora overlap" answered without a full join): parts shipped
    * in 1995 vs 1996. θ = k-th smallest of the UNION sketch; every
    * union-window hash that belongs to A is necessarily inside A's own
    * bottom-k (θ ≤ θ_A since union ⊇ A), so membership tests run on
    * the sketches, never the full sets. Estimates are replayable
    * integer arithmetic ⇒ hash-exact vs the oracle; the exact
    * distinct/intersection counts ride along for error inspection.
    * At 100 TB each side ships k=64 longs — the sketch IS the shuffle.
    */
  def qKmvOverlap(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      expr("CAST(year(l_shipdate) AS INT)").as("y"),
      expr("(l_partkey * 2654435761) % 4294967296").as("h"))
    // each side feeds FOUR consumers (own sketch, union sketch, exact
    // count, exact intersection) — materialize the distinct hash sets
    // once instead of re-scanning lineitem per consumer
    val a = li.filter(col("y") === 1995).select("h").distinct().localCheckpoint()
    val b = li.filter(col("y") === 1996).select("h").distinct().localCheckpoint()
    val sa = a.agg(graft.functions.BottomK.bottomK(col("h"), k).as("sa"))
    val sb = b.agg(graft.functions.BottomK.bottomK(col("h"), k).as("sb"))
    val su = a.union(b).distinct()
      .agg(graft.functions.BottomK.bottomK(col("h"), k).as("su"))
    val exact = a.agg(count(lit(1)).as("n_a"))
      .crossJoin(b.agg(count(lit(1)).as("n_b")))
      .crossJoin(a.join(b, "h").agg(count(lit(1)).as("exact_inter")))
    su.crossJoin(sa).crossJoin(sb).crossJoin(exact)
      .select(
        expr(s"CAST(size(su) AS BIGINT)").as("k"),
        expr(s"element_at(su, size(su))").as("theta"),
        expr("size(array_intersect(array_intersect(su, sa), sb))").cast("long")
          .as("inter_in_window"),
        col("n_a"), col("n_b"), col("exact_inter"))
      .select(col("k"), col("theta"),
        expr(s"((k - 1) * 4294967296) div theta").as("est_union"),
        col("inter_in_window"),
        expr("inter_in_window * 1000000 div k").as("jaccard_x1e6"),
        expr(s"inter_in_window * (((k - 1) * 4294967296) div theta) div k")
          .as("est_inter"),
        col("n_a"), col("n_b"), col("exact_inter"))
  }

  /** Per-group OLS regression of line price on quantity — slope and R²
    * as EXACT scaled integers: with x = quantity cents and y = price
    * cents, every moment (Σx, Σy, Σxy, Σx², Σy²) is a DECIMAL(38,0)
    * sum of integer products, so slope = 1e6·(nΣxy−ΣxΣy) div
    * (nΣx²−(Σx)²) and R² = 1e6·(nΣxy−ΣxΣy)² div ((nΣx²−(Σx)²)·
    * (nΣy²−(Σy)²)) are replayable integer arithmetic — the
    * distributed-regression shape (one partial-agg pass, no second
    * centering pass, no float accumulation drift).
    */
  def qRegression(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        expr("CAST(floor(l_quantity * 100 + 0.5) AS DECIMAL(19,0))").as("x"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS DECIMAL(19,0))").as("y"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      // staged divisions: num² and dxx·dyy overflow 38 digits, but
      // slope=(1e6·num) div dxx first, then (slope·num) div dyy keeps
      // every intermediate ≤ ~1e31; both engines truncate integer
      // division toward zero, so the negative-slope group agrees too
      .withColumn("num", expr("n * sxy - sx * sy"))
      .withColumn("dxx", expr("n * sxx - sx * sx"))
      .withColumn("dyy", expr("n * syy - sy * sy"))
      .withColumn("slope_x1e6", expr("CAST((1000000 * num) div dxx AS BIGINT)"))
      .select(col("l_returnflag"), col("n"), col("slope_x1e6"),
        expr("CAST((slope_x1e6 * num) div dyy AS BIGINT)").as("r2_x1e6"))
      .orderBy(col("l_returnflag"))

  /** RFM customer segmentation — recency (days since last order),
    * frequency (order count), monetary (lifetime cents) per customer,
    * with the classic threshold segment label. One groupBy over orders
    * + a broadcast 1-row scalar for "now" (the corpus max date) — the
    * CRM-style scoring pass, all exact integers.
    */
  def qRfm(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_custkey"),
      expr("CAST(datediff(o_orderdate, DATE'1970-01-01') AS BIGINT)").as("day"),
      expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val maxDay = o.agg(max(col("day")).as("now_day"))
    o.crossJoin(broadcast(maxDay))
      .groupBy(col("o_custkey"))
      .agg(min(col("now_day") - col("day")).as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(col("cents")).as("monetary_cents"))
      .withColumn("segment",
        when(col("recency_days") <= 90 && col("frequency") >= 10, lit("champion"))
          .when(col("recency_days") <= 90, lit("recent"))
          .when(col("frequency") >= 10, lit("loyal_lapsed"))
          .otherwise(lit("hibernating")))
      .orderBy(col("o_custkey"))
  }

  /** Exact discounted line volume in cents: price and discount are
    * floored to cents / basis points FIRST, so price_c·(10000−disc_bp)
    * is a pure BIGINT product; sums run in DECIMAL(38,0) (overflow-safe
    * at any scale, order-independent), and the ÷10000 back to cents is
    * one exact integer division of the TOTAL — no per-row float ever.
    */
  private val volumeExpr =
    "CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
      "(10000 - CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,0))"

  /** TPC-H Q7-shaped trade-flow matrix: discounted lineitem volume
    * between every (customer-nation, supplier-nation) pair per ship
    * year. The star join shuffles facts once per key; the aggregate is
    * partial-agg combined onto a |nations|²×|years| grid. Exact integer
    * volume via [[volumeExpr]].
    */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"),
      year(col("l_shipdate")).as("ship_year"), expr(volumeExpr).as("vol"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nation"))
    val supp = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey").cast("long").as("s_nation"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nation"), col("s_nation"), col("ship_year"))
      .agg(sum(col("vol")).as("v38"), count(lit(1)).as("n_lines"))
      .select(col("c_nation"), col("s_nation"), col("ship_year"),
        expr("CAST(v38 div 10000 AS BIGINT)").as("volume_cents"), col("n_lines"))
      .orderBy(col("c_nation"), col("s_nation"), col("ship_year"))
  }

  /** TPC-H Q8-shaped market share: of all trade volume bought by
    * region-0 customers per ship year, the ×10⁶ share supplied by
    * nation 3 — a conditional aggregate over one star join (no second
    * pass for the denominator) with the share an exact BIGINT division
    * of two DECIMAL(38,0) sums.
    */
  def q8Share(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"),
      year(col("l_shipdate")).as("ship_year"), expr(volumeExpr).as("vol"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val cnation = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_regionkey"))
    val supp = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey").cast("long").as("s_nation"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(cnation), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_regionkey") === 0)
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("ship_year"))
      .agg(sum(when(col("s_nation") === 3, col("vol"))).as("nat38"),
        sum(col("vol")).as("all38"))
      .select(col("ship_year"),
        expr("CAST(coalesce(nat38, 0) div 10000 AS BIGINT)").as("nation_cents"),
        expr("CAST(all38 div 10000 AS BIGINT)").as("total_cents"),
        expr("CAST((coalesce(nat38, 0) * 1000000) div all38 AS BIGINT)").as("share_x1e6"))
      .orderBy(col("ship_year"))
  }

  /** Distribution window functions — percent_rank / cume_dist /
    * dense_rank of each customer's balance within its market segment.
    * Both engines define percent_rank = (rank−1)/(N−1) and cume_dist =
    * peers≤current / N; each is a SINGLE correctly-rounded IEEE
    * division of two integers, so the doubles gate hash-exact without
    * any integer-scaling trick. One shuffle on the segment key.
    */
  def qWindowDist(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("acctbal_cents"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cum_dist"),
        dense_rank().over(w).cast("int").as("drank"))
      .orderBy(col("c_custkey"))
  }

  /** Pareto frontier (skyline) of parts on (retail price ↓, size ↓) —
    * "no other part is at most as expensive AND at most as big, strictly
    * better on one". Distributed two-phase shape: dominance is
    * transitive, so a LOCAL skyline per hash block (parallel windows)
    * is a superset of the global one; the global pass then runs on the
    * tiny survivor set. Each pass is pure window arithmetic over integer
    * cents: a row is dominated iff min(size) among strictly-cheaper rows
    * ≤ its size (RANGE frame to −1), or min(size) among equal-priced
    * rows < its size. No self-join, no broadcast-nested-loop — the
    * O(n²) NOT EXISTS lives only in the DuckDB oracle.
    */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select(
      col("p_partkey"), col("p_name"),
      expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("price_c"),
      col("p_size"))

    def skylinePass(df: DataFrame, parts: Seq[Column]): DataFrame = {
      val strictlyCheaper = Window.partitionBy(parts: _*)
        .orderBy(col("price_c")).rangeBetween(Window.unboundedPreceding, -1)
      val samePrice = Window.partitionBy(parts: _*)
        .orderBy(col("price_c")).rangeBetween(0, 0)
      df.withColumn("_min_lt", min(col("p_size")).over(strictlyCheaper))
        .withColumn("_min_eq", min(col("p_size")).over(samePrice))
        .filter((col("_min_lt").isNull || col("_min_lt") > col("p_size")) &&
          col("_min_eq") === col("p_size"))
        .drop("_min_lt", "_min_eq")
    }

    val local = skylinePass(p.withColumn("_blk", pmod(col("p_partkey"), lit(32))),
      Seq(col("_blk"))).drop("_blk")
    skylinePass(local, Seq.empty)
      .orderBy(col("p_partkey"))
  }

  /** Fuzzy entity-resolution join: customers matched to suppliers of the
    * SAME nation whose names are within levenshtein distance 6 — the
    * block-then-refine shape every record-linkage pipeline uses. The
    * equi-join on the blocking key (nation) is what Spark shuffles on;
    * the quadratic edit-distance work happens only inside blocks, with
    * the thresholded `levenshtein(l, r, 6)` variant so the DP matrix
    * aborts early on clearly-far names (banded O(len·k), not O(len²)).
    */
  def qFuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    // fanOut: the probe side drives the edit-distance compute; a local
    // single-split scan would run the whole DP workload on one core
    val c = Tables.fanOut(Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey")))
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
    c.join(sup, col("c_nationkey") === col("s_nationkey"))
      .withColumn("lev", levenshtein(col("c_name"), col("s_name"), 6))
      .filter(col("lev") >= 0) // thresholded variant returns -1 past the cap
      .select(col("c_custkey"), col("s_suppkey"),
        col("c_nationkey").cast("long").as("nationkey"), col("lev"))
      .orderBy(col("c_custkey"), col("s_suppkey"))
  }

  /** HLL approximate distinct (rows-only check: approximate by nature). */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
           count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Duplicate-key audit over (customer, order-date) — the data-quality
    * primitive every ingestion pipeline runs before declaring a column
    * set a key: multiplicity histogram (how many candidate keys carry
    * exactly k rows), with the row mass per bucket. multiplicity = 1 is
    * the clean mass; everything above is the duplication to explain.
    * Two partial-agg groupBys — key-domain then ≤max-multiplicity
    * rows — nothing wider than the fact scan's key columns shuffles.
    */
  def qDuplicateAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), expr("CAST(o_orderdate AS DATE)").as("od"))
      .agg(count(lit(1)).as("k"))
      .groupBy(col("k").as("multiplicity"))
      .agg(count(lit(1)).as("n_keys"), sum(col("k")).cast("long").as("n_orders"))
      .orderBy(col("multiplicity"))

  /** Two-phase global rank + running sum WITHOUT a single-partition
    * window (the 100 TB shape VERDICT r7 #3 asked to ship, not just
    * document): range-repartition by the total order, rank/cumsum
    * inside each range partition (parallel ordered windows), then add
    * per-partition offsets — a prefix sum over the ≤shuffle.partitions
    * offset rows (the only serial step, partition-count-sized) joined
    * back by broadcast. Exact for any integer value column: range
    * partition i holds keys strictly before partition i+1's, so
    * global_rn = local_rn + Σ earlier counts and likewise for the sum.
    * AQE partition coalescing merges ADJACENT ranges, preserving the
    * pid-order invariant. Emits `rn` (BIGINT, 1-based) and `cum`.
    */
  private def rankedCum(df: DataFrame, order: Seq[Column], value: Column): DataFrame =
    rankedCumN(df, order, Seq("v" -> value)).withColumnRenamed("cum_v", "cum")

  /** [[rankedCum]] generalized to N running sums in the same pass —
    * multi-series cumulative scans (KS's two ECDFs, Mann–Whitney's
    * tie-rank counter) pay ONE range shuffle, not one per series.
    * Emits `rn` plus one `cum_<name>` per (name, value) pair.
    */
  private[graft] def rankedCumN(df: DataFrame, order: Seq[Column],
      values: Seq[(String, Column)]): DataFrame = {
    val parted = df.repartitionByRange(order: _*)
      .withColumn("pid", spark_partition_id())
    val wLoc = Window.partitionBy(col("pid")).orderBy(order: _*)
    val wRun = wLoc.rowsBetween(Window.unboundedPreceding, 0)
    val local = values.foldLeft(
        parted.withColumn("lrn", row_number().over(wLoc).cast("long"))) {
      case (acc, (nm, v)) => acc.withColumn(s"lcum_$nm", sum(v).over(wRun))
    }
    val wPid = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
    val aggs = count(lit(1)).as("pn") +:
      values.map { case (nm, v) => sum(v).cast("long").as(s"psum_$nm") }
    val offs = local.groupBy(col("pid"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("pid") +:
        coalesce(sum(col("pn")).over(wPid), lit(0L)).as("prior_n") +:
        values.map { case (nm, _) =>
          coalesce(sum(col(s"psum_$nm")).over(wPid), lit(0L)).as(s"prior_$nm") }: _*)
    val joined = local.join(broadcast(offs), Seq("pid"))
      .withColumn("rn", col("lrn") + col("prior_n"))
    values.foldLeft(joined) { case (acc, (nm, _)) =>
      acc.withColumn(s"cum_$nm", col(s"lcum_$nm") + col(s"prior_$nm"))
    }.drop("pid" +: "lrn" +: "prior_n" +: values.flatMap { case (nm, _) =>
      Seq(s"lcum_$nm", s"prior_$nm") }: _*)
  }

  /** Revenue concentration in the top 1% / 5% / 10% of customers — the
    * "do whales carry the business" number ([[qLorenz]]'s fixed-bracket
    * companion, [[qAbcAnalysis]]'s user-grain sibling): rank customers
    * by spend (ties by key — total order), take the cumulative share at
    * rank ⌈n·p/100⌉ (at least 1), share ×10⁴ staged DECIMAL(38,0).
    * The rank/cumsum over the CUSTOMER domain runs as [[rankedCum]]'s
    * two-phase range-partitioned prefix sum — no single-partition
    * window anywhere; brackets and totals are 1-row broadcasts.
    */
  def qPowerUsers(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).cast("long").as("cents"))
    val ranked = rankedCum(spend, Seq(col("cents").desc, col("o_custkey")), col("cents"))
      .withColumnRenamed("cum", "cum_cents")
    val tot = spend.agg(count(lit(1)).as("n_users"),
      sum(col("cents")).cast("long").as("total_cents"))
    spark.range(1)
      .select(explode(array(lit(1L), lit(5L), lit(10L))).as("pct"))
      .crossJoin(broadcast(tot))
      .withColumn("k_users", greatest(lit(1L), expr("(n_users * pct) div 100")))
      .join(ranked.select(col("rn"), col("cum_cents")), col("rn") === col("k_users"))
      .select(col("pct"), col("k_users"), col("n_users"), col("total_cents"),
        col("cum_cents").cast("long").as("top_cents"),
        expr("CAST(CAST(cum_cents AS DECIMAL(38,0)) * 10000 div total_cents AS BIGINT)")
          .as("share_x1e4"))
      .orderBy(col("pct"))
  }

  /** Join-key skew audit — the diagnostic run BEFORE deciding whether a
    * join needs salting ([[graft.functions.Skew.saltedJoin]]'s intake
    * form): the top-10 hottest lineitem part keys with their row share
    * ×10⁶, plus on every row the corpus-wide skew factor — hottest
    * key's count over the mean count ×100 (100 = perfectly uniform;
    * the number that says whether one reducer will eat the join). One
    * partial-agg pass to the key grid; the max/mean factor is a 1-row
    * broadcast; the page is a distributed top-k.
    */
  def qKeySkew(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    val tot = keys.agg(sum(col("cnt")).cast("long").as("n_rows"),
      count(lit(1)).as("n_keys"), max(col("cnt")).cast("long").as("max_cnt"))
    keys.crossJoin(broadcast(tot))
      .select(col("l_partkey"), col("cnt"),
        expr("(cnt * 1000000) div n_rows").as("share_ppm"),
        // overflow-bound: max_cnt <= n_rows, so the numerator <= n_rows * n_keys * 100 — inside DECIMAL(38) for n_rows * n_keys < 10^36.
        expr("""CAST(CAST(max_cnt AS DECIMAL(38,0)) * n_keys * 100
               |  div n_rows AS BIGINT)""".stripMargin).as("skew_x100"))
      .orderBy(col("cnt").desc, col("l_partkey"))
      .limit(10)
  }

  /** Pareto coverage — the inverse readout of [[qPowerUsers]]: instead
    * of "how much do the top p% hold", "how FEW customers cover p% of
    * revenue" (the 80/20 number). k(p) = min rank whose cumulative
    * spend reaches p% — computed WITHOUT a single-partition sort via
    * the same [[rankedCum]] two-phase range-partitioned prefix sum;
    * the threshold probe is a 3-row broadcast against the ranked
    * table (cum is monotone, so min(rn) over the filter is exact),
    * and the coverage row at k comes back through an equi-join on rn.
    * Shares ×10⁴ staged DECIMAL(38,0)/HUGEINT.
    */
  def qPareto(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).cast("long").as("cents"))
    val ranked = rankedCum(spend, Seq(col("cents").desc, col("o_custkey")), col("cents"))
      .select(col("rn"), col("cum").cast("long").as("cum_cents"))
      .localCheckpoint(eager = false)
    val tot = spend.agg(count(lit(1)).as("n_users"),
      sum(col("cents")).cast("long").as("total_cents"))
    val pcts = spark.range(1)
      .select(explode(array(lit(50L), lit(80L), lit(90L))).as("pct"))
      .crossJoin(broadcast(tot))
    val k = ranked.crossJoin(broadcast(pcts))
      .filter(col("cum_cents") * 100 >= col("total_cents") * col("pct"))
      .groupBy(col("pct"), col("n_users"), col("total_cents"))
      .agg(min(col("rn")).as("k_users"))
    k.join(ranked, col("rn") === col("k_users"))
      .select(col("pct"), col("n_users"), col("total_cents"), col("k_users"),
        // overflow-bound: k_users <= n_users so k_users*1e4 stays LONG
        // for n_users < 9.2e14; cum_cents*1e4 <= total_cents*1e4 < 1e24
        // at 1e20 corpus cents — inside DECIMAL(38).
        expr("(k_users * 10000) div n_users").as("k_pop_x1e4"),
        col("cum_cents"),
        expr("CAST(CAST(cum_cents AS DECIMAL(38,0)) * 10000 div total_cents AS BIGINT)")
          .as("share_x1e4"))
      .orderBy(col("pct"))
  }

  /** Decile report of order totals — the equi-depth histogram the BI
    * layer renders next to [[qQuantileHist]]'s equi-width one: NTILE(10)
    * over (cents, key) — a TOTAL order, so the SQL-standard first-
    * buckets-larger tie split is identical in both engines — then
    * per-decile count/min/max/sum. The EXACT full-sort path now runs as
    * [[rankedCum]]'s two-phase range-partitioned prefix sum over the
    * fact rows (no single-partition window), with the ntile bucket
    * recovered arithmetically from the global rank: the first n mod 10
    * buckets take ⌈n/10⌉ rows, the rest ⌊n/10⌋ — byte-identical to the
    * window function. The mergeable-sketch alternative at 100 TB is
    * still [[qQuantileHist]].
    */
  def qNtile(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val tot = cents.agg(count(lit(1)).as("n"))
    rankedCum(cents, Seq(col("cents"), col("o_orderkey")), col("cents"))
      .crossJoin(broadcast(tot))
      // SQL ntile(10): base = n div 10 rows per bucket, first n mod 10
      // buckets get one extra; recover the bucket from rn by ceil-div
      // inside the big-bucket prefix, then ceil-div on the remainder
      .withColumn("decile", expr(
        """CAST(CASE
          |  WHEN rn <= (n % 10) * (n div 10 + 1)
          |    THEN (rn + n div 10) div (n div 10 + 1)
          |  ELSE (n % 10) + (rn - (n % 10) * (n div 10 + 1) + n div 10 - 1) div (n div 10)
          |END AS INT)""".stripMargin))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_orders"), min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"),
        sum(col("cents")).cast("long").as("sum_cents"))
      .orderBy(col("decile"))
  }

  /** Tukey-fence (IQR) outlier audit of order totals per priority —
    * the box-plot rule next to [[qOutlierMad]]'s robust-z one: discrete
    * quartiles via percentile_disc (the [[qPercentileDisc]] exact-rank
    * machinery), fences at Q1 − 1.5·IQR / Q3 + 1.5·IQR kept integer by
    * scaling the comparison ×2 (2·cents vs 2·Q1 − 3·IQR), outlier
    * counts + rate ×10⁴. The quartile table is a 5-row broadcast; the
    * count pass is one partial-agg scan.
    */
  def qOutlierIqr(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val q = o.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents) AS BIGINT)")
          .as("q1_cents"),
        expr("CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents) AS BIGINT)")
          .as("q3_cents"))
    o.join(broadcast(q), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"), col("n"), col("q1_cents"), col("q3_cents"))
      .agg(
        sum(when(expr("2 * cents < 2 * q1_cents - 3 * (q3_cents - q1_cents)"), 1L)
          .otherwise(0L)).cast("long").as("n_low"),
        sum(when(expr("2 * cents > 2 * q3_cents + 3 * (q3_cents - q1_cents)"), 1L)
          .otherwise(0L)).cast("long").as("n_high"))
      .select(col("o_orderpriority"), col("n"), col("q1_cents"), col("q3_cents"),
        (col("q3_cents") - col("q1_cents")).as("iqr_cents"),
        col("n_low"), col("n_high"),
        expr("((n_low + n_high) * 10000) div n").as("outlier_rate_x1e4"))
      .orderBy(col("o_orderpriority"))
  }

  /** Harmonic mean of order totals per priority — the "average rate"
    * mean (always ≤ the arithmetic mean; the right average for
    * per-unit-cost style figures), kept exact by the pinned spec
    * hm = n·10¹² div Σ(10¹² div cents): the inner floor-div at K = 10¹²
    * loses < 10⁻⁸ relative per term and is BIT-IDENTICAL in both
    * engines, which is what a differential gate needs. Emitted next to
    * the arithmetic mean so the AM ≥ HM inequality is visible in the
    * output. One partial-agg pass.
    */
  def qHarmonicMean(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(expr("1000000000000 div cents")).cast("long").as("sum_inv_x1e12"),
        sum(col("cents")).cast("long").as("sum_cents"))
      .select(col("o_orderpriority"), col("n"),
        expr("(sum_cents * 100) div n").as("am_cents_x100"),
        // overflow-bound: n * 10^14 — inside DECIMAL(38) for n < 10^24 rows.
        expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000000000 * 100 div sum_inv_x1e12 AS BIGINT)")
          .as("hm_cents_x100"))
      .orderBy(col("o_orderpriority"))

  /** Dyadic Shannon entropy of the order-priority mix per customer
    * segment — "how concentrated is each segment's demand", the
    * information-theoretic companion of [[qHhi]]: per-class surprisal
    * in floor-log₂ bits (bits = length(bin(n div c)) − 1, the
    * [[graft.operators.Text.surprisal]] convention — integer-exact in
    * both engines, no float log), H·10² = Σ c·bits·100 div n; also the
    * modal share ×10⁴. Scale shape: one fact-scale join onto the
    * broadcastable customer dim? No — customer grows with SF, so the
    * join is hint-free (AQE decides); aggregates are two partial-agg
    * groupBys on the segment×priority grid.
    */
  def qEntropy(spark: SparkSession, dir: String): DataFrame = {
    val cls = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("c"))
    // n per segment via a window over the segment×priority GRID (tens
    // of rows — never fact rows), then one grid-sized rollup
    cls.withColumn("n",
        sum(col("c")).over(Window.partitionBy(col("c_mktsegment"))))
      .withColumn("bits", expr("length(bin(n div c)) - 1"))
      .groupBy(col("c_mktsegment"))
      .agg(max(col("n")).cast("long").as("n"),
        count(lit(1)).cast("long").as("n_classes"),
        max(col("c")).cast("long").as("modal_c"),
        sum(expr("c * bits")).cast("long").as("weighted_bits"))
      .select(col("c_mktsegment"), col("n"), col("n_classes"),
        expr("(modal_c * 10000) div n").as("modal_share_x1e4"),
        expr("(weighted_bits * 100) div n").as("entropy_bits_x100"))
      .orderBy(col("c_mktsegment"))
  }
}
