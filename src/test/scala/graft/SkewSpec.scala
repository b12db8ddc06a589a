package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew-mitigation stress (SURVEY §5): Skew.saltedJoin must be
  * result-identical to the plain join while spreading a degenerate hot
  * key over all salt buckets — the property that keeps one reducer from
  * absorbing a whole boilerplate LSH bucket (or sentinel join key) at
  * 100 TB.
  */
class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  // 90%-hot-key fact side: key 0 dominates; payload is a per-row value
  // usable as an independent salt source
  private lazy val big = spark.range(20000).select(
    when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") / 10).as("k"),
    col("id").as("payload"))
  private lazy val small = spark.range(0, 2000).select(
    col("id").as("k"), (col("id") * 7).as("v"))

  test("salted join is row-identical to the plain join under 90% key skew") {
    val plain = big.join(small, Seq("k")).select(col("k"), col("payload"), col("v"))
    val salted = Skew.saltedJoin(big, small, "k", salts = 8, saltSource = col("payload"))
      .select(col("k"), col("payload"), col("v"))
    assert(salted.exceptAll(plain).isEmpty, "salted join emitted extra rows")
    assert(plain.exceptAll(salted).isEmpty, "salted join dropped rows")
    assert(plain.count() > 0)
  }

  test("the hot key spreads across every salt bucket, roughly evenly") {
    val salts = 8
    // uses Skew.saltCol — the production derivation, not an inlined copy
    val spread = big.filter(col("k") === 0L)
      .withColumn("_salt", Skew.saltCol(col("payload"), salts))
      .groupBy(col("_salt")).count()
      .collect().map(r => r.getLong(1))
    assert(spread.length == salts, s"hot key landed in ${spread.length}/$salts buckets")
    // deterministic hash of a dense payload: no bucket should carry more
    // than 2x the mean (the point of salting is bounding the max reducer)
    val mean = spread.sum.toDouble / salts
    assert(spread.max <= 2 * mean,
      s"hot-key salt buckets unbalanced: ${spread.toSeq} (mean $mean)")
  }
}
