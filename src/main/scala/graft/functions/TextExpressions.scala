package graft.functions

import graft.text.PorterStemmer
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter-stem a string column (the ES-`english`-analyzer stemming step;
  * algorithm in [[graft.text.PorterStemmer]]). String-churny, so eval
  * with CodegenFallback — it sits outside hot joins by construction.
  */
case class PorterStem(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_stem"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(PorterStemmer.stem(v.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(c: Expression): PorterStem = copy(child = c)
}

/** Rolling polynomial hash over a string's characters:
  * fold(chars, 0, (acc, ch) -> (acc·mult + codepoint) mod modulus).
  * Codegen'd; equals TextFunctions.fingerprint / the DuckDB list_reduce
  * rendering for ASCII data.
  */
case class PolyHash(child: Expression, mult: Long, modulus: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) { acc = (acc * mult + s.charAt(i).toLong) % modulus; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * ${mult}L + (long) $s.charAt($i)) % ${modulus}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PolyHash = copy(child = c)
}

object TextExpressionFunctions {
  /** Column API for [[PorterStem]]. */
  def porterStem(c: Column): Column =
    GraftBridge.column(PorterStem(GraftBridge.expression(c)))

  /** Column API for [[PolyHash]] with the graft fingerprint constants. */
  def polyHash(c: Column, mult: Long = 31L, modulus: Long = 1000000007L): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(c), mult, modulus))
}
