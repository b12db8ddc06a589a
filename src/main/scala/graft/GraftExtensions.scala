package graft

import graft.functions.{FloatVecDot, PolyHash, PorterStem, SimHash,
  SortedIntersectCount, WordPairs, WordShingles}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes graft's native expressions
  * available as SQL functions in any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * ```sql
  * SELECT float_vec_dot(a.embedding, b.embedding)
  * SELECT graft_stem('relational')       -- 'relat'
  * SELECT graft_poly_hash('doc text')    -- BIGINT fingerprint
  * ```
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("float_vec_dot",
      info("float_vec_dot", "float_vec_dot(a, b) - in-order double dot product of two float arrays"),
      (es: Seq[Expression]) => FloatVecDot(es(0), es(1))),
    ("graft_stem",
      info("graft_stem", "graft_stem(s) - Porter-stem a lowercase word"),
      (es: Seq[Expression]) => PorterStem(es.head)),
    ("graft_poly_hash",
      info("graft_poly_hash", "graft_poly_hash(s) - rolling polynomial fingerprint (x31 mod 1e9+7)"),
      (es: Seq[Expression]) => PolyHash(es.head, 31L, 1000000007L)),
    ("graft_simhash",
      info("graft_simhash", "graft_simhash(tokens) - 60-bit SimHash of a token array"),
      (es: Seq[Expression]) => SimHash(es.head)),
    ("word_shingles",
      info("word_shingles", "word_shingles(tokens, n) - distinct '_'-joined word n-grams"),
      (es: Seq[Expression]) => WordShingles(es(0), litInt(es, 1, "word_shingles"))),
    ("word_pairs",
      info("word_pairs", "word_pairs(tokens) - canonical distinct unordered token pairs"),
      (es: Seq[Expression]) => WordPairs(es.head)),
    ("sorted_intersect_count",
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - |A∩B| of two sorted distinct string arrays"),
      (es: Seq[Expression]) => SortedIntersectCount(es(0), es(1))),
    ("bottom_k",
      info("bottom_k", "bottom_k(h, k) - aggregate: k smallest distinct BIGINTs per group"),
      (es: Seq[Expression]) => graft.functions.BottomK(es(0), litInt(es, 1, "bottom_k"))),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(h) - aggregate: 64-permutation MinHash signature"),
      (es: Seq[Expression]) => graft.functions.MinHashAgg(es.head)),
    ("vector_sum",
      info("vector_sum", "vector_sum(v, dim) - aggregate: elementwise double[dim] sum"),
      (es: Seq[Expression]) => graft.functions.VectorSumAgg(es(0), litInt(es, 1, "vector_sum"))))

  /** Extract a literal INT argument (e.g. the `n`/`k` of a sketch). */
  private def litInt(es: Seq[Expression], i: Int, fn: String): Int = {
    if (es.length <= i)
      throw new IllegalArgumentException(
        s"$fn requires at least ${i + 1} arguments, got ${es.length}")
    es(i) match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an INT literal, got $other")
    }
  }

  /** Register into an already-built session (temp functions). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
