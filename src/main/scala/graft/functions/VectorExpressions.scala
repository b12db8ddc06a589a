package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two float[] vectors,
  * accumulated left-to-right in DOUBLE — bit-identical to the SQL chain
  * `0.0 + cast(a[1] as double)*cast(b[1] as double) + …` the DuckDB
  * oracles use (SURVEY §4.3), but evaluated as a primitive loop inside
  * whole-stage codegen instead of ~130 interpreted lambda calls per pair.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, " +
        s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatVecDot =
    copy(left = l, right = r)
}

/** Dot of a float[] vector against a FIXED double[] coefficient row
  * (model weights: LSH hyperplanes, projection rows). The coefficients
  * ride along as a referenced double[] — no array<double> literal column,
  * no per-row literal materialization, and the accumulation is the same
  * left-to-right `(double) v[i] * c[i]` chain the DuckDB oracle renders.
  * The float input is NOT cast to float-coefficient space: coefficients
  * like 0.123 have no exact float representation, so a float-float dot
  * would diverge from the oracle's double literals.
  */
case class FloatVecDotConst(child: Expression, coef: Seq[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot_const"

  // the HOF fold this replaces (zip_with + aggregate) yields NULL on
  // ANY length mismatch (zip_with pads the shorter side with null, and
  // null times anything nulls the sum) and when any element is null —
  // preserve exactly that, don't silently read zeroed slots or truncate
  override def nullable: Boolean = true

  @transient private lazy val cs: Array[Double] = coef.toArray

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != cs.length) return null
    var acc = 0.0
    var i = 0
    while (i < cs.length) {
      if (x.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * cs(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cRef = ctx.addReferenceObj("coef", cs, "double[]")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($v.numElements() != $cRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $cRef.length; $i++) {
         |    if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $v.getFloat($i)) * $cRef[$i];
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): FloatVecDotConst =
    copy(child = c)
}

object VectorFunctions {
  /** Column API for [[FloatVecDot]]. */
  def floatVecDot(a: Column, b: Column): Column =
    GraftBridge.column(
      FloatVecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API for [[FloatVecDotConst]]. */
  def floatVecDotConst(v: Column, coef: Seq[Double]): Column =
    GraftBridge.column(FloatVecDotConst(GraftBridge.expression(v), coef))

  /** ‖v‖ via the codegen'd dot (same in-order accumulation). */
  def floatVecNorm(v: Column): Column =
    org.apache.spark.sql.functions.sqrt(floatVecDot(v, v))
}
