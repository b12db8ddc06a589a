package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §5). AQE's skew-join handles most
  * cases at runtime; explicit salting remains the tool when one join key
  * dominates so heavily that even split shuffle blocks hot-spot (e.g. a
  * null-ish sentinel key joining a dimension).
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a deterministic salt in
    * [0, salts) derived from a non-key column hash; the small side is
    * replicated `salts` times. Result rows are identical to a plain
    * inner join on `key`, but the shuffle spreads each hot key over
    * `salts` reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, saltSource: Column): DataFrame =
    saltedJoin(big, small, Seq(key), salts, saltSource)

  /** The salt derivation — exposed so specs exercise the PRODUCTION
    * formula, not a re-implementation of it.
    */
  def saltCol(saltSource: Column, salts: Int): Column =
    pmod(abs(hash(saltSource)), lit(salts))

  /** Composite-key variant (e.g. an LSH (band, key) bucket join): rows
    * equal the plain inner join on `keys`, but each hot bucket spreads
    * over `salts` reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, saltSource: Column): DataFrame = {
    val salted = big.withColumn("_salt", saltCol(saltSource, salts))
    val replicated = small.withColumn("_salt", explode(typedlit((0 until salts).toList)))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
