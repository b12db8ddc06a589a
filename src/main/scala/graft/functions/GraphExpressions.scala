package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Codegen'd graph-kernel expressions (triangle counting hot path —
  * reference semantics: co-purchase triangles over the order/part
  * bipartite projection, cf. metastore's ES aggregations being the
  * WHAT; the edge-iterator algorithm is Schank–Wagner, public
  * knowledge). Both run in-map inside whole-stage codegen so the
  * combinatorial parts of the triangle pipeline never materialize an
  * intermediate row set.
  */

/** All ordered pairs (a<b) of a SORTED, DISTINCT long array, as
  * array<struct<a,b>> — the per-order co-purchase edge generator.
  * Precondition (sorted ascending, no duplicates, no nulls) is
  * guaranteed by feeding `sort_array(collect_set(...))`; output pairs
  * inherit a<b from the input order, so no per-pair comparison runs.
  * Blowup is n·(n−1)/2 PER INPUT ROW — bounded by lines-per-order,
  * never corpus-wide.
  */
case class SortedLongPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> with containsNull=false " +
        "(feed it sort_array(collect_set(...)))")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
                   StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_sorted_long_pairs"

  def compute(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = xs.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(a, xs.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pairer", this, classOf[SortedLongPairs].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): SortedLongPairs =
    copy(child = c)
}

/** The whole triangle-closure inner loop for one oriented edge u→v in a
  * single pass: sorted-merge intersect adj⁺(u) ∩ adj⁺(v) (size k) and
  * emit the per-vertex credit rows directly —
  * [(u,k), (v,k)] ++ [(w,1) for each witness w] — as
  * array<struct<part,c>>. Replaces intersect→filter→two explodes→union
  * (which made the witness join a TWO-consumer stage needing a
  * checkpoint or double execution); with credits folded in, the probe
  * join has exactly one consumer and the downstream is one
  * explode→groupBy with map-side partial aggregation. Empty
  * intersection → empty array (explode drops the row; no filter stage).
  * Preconditions as [[SortedIntersectLongs]]: both arrays sorted
  * ascending, distinct (from sort_array(collect_set)).
  */
case class TriangleCredits(first: Expression, second: Expression,
                           third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (LongType, LongType, ArrayType(LongType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint, array<bigint>, array<bigint>) " +
          "with containsNull=false adjacency arrays")
    }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("part", LongType, nullable = false),
                   StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_triangle_credits"

  def compute(u: Long, v: Long, nu: ArrayData, nv: ArrayData): ArrayData = {
    val na = nu.numElements()
    val nb = nv.numElements()
    val ws = new Array[Long](math.min(na, nb))
    var i = 0
    var j = 0
    var k = 0
    while (i < na && j < nb) {
      val x = nu.getLong(i)
      val y = nv.getLong(j)
      if (x == y) { ws(k) = x; k += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (k == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](k + 2)
    val kl = k.toLong
    out(0) = InternalRow(u, kl)
    out(1) = InternalRow(v, kl)
    var t = 0
    while (t < k) { out(t + 2) = InternalRow(ws(t), 1L); t += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    compute(a.asInstanceOf[Long], b.asInstanceOf[Long],
            c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("closer", this, classOf[TriangleCredits].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c, d) => s"${ev.value} = $ref.compute($a, $b, $c, $d);")
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): TriangleCredits =
    copy(first = a, second = b, third = c, fourth = d)
}

/** Connected components of a BOUNDED-domain graph packed into one row:
  * input array<struct<x,y>> edge list where a self-loop (c,c) declares
  * an isolated-capable node; output array<struct<c,l>> with l = the
  * minimum node id reachable from c (min-label components), sorted by
  * c. Union-find with path compression in one pass — the whole 5-round
  * min-label-propagation loop of Borůvka's merge step collapses to one
  * task, legitimate ONLY because the component graph is domain-bounded
  * (≤N nation-component nodes, never fact-scale): the same rationale
  * as PlanSpec's bounded-domain window allowlist. Replaces 5 label
  * rounds × (join + groupBy shuffle) per Borůvka round — the r10
  * scheduler-latency class (each AQE stage is a ~35 ms driver job).
  */
case class MinLabelComponents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _)
        if fs.length == 2 && fs.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<x: bigint, y: bigint>>")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("c", LongType, nullable = false),
                   StructField("l", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_min_label_components"

  def compute(es: ArrayData): ArrayData = {
    val n = es.numElements()
    // dense-rank the node ids (sorted, distinct) for array union-find
    val ids = new Array[Long](2 * n)
    var i = 0
    while (i < n) {
      val r = es.getStruct(i, 2)
      ids(2 * i) = r.getLong(0); ids(2 * i + 1) = r.getLong(1)
      i += 1
    }
    java.util.Arrays.sort(ids)
    var m = 0
    i = 0
    while (i < 2 * n) { // dedup in place
      if (m == 0 || ids(m - 1) != ids(i)) { ids(m) = ids(i); m += 1 }
      i += 1
    }
    def idx(v: Long): Int = {
      var lo = 0; var hi = m - 1
      while (lo < hi) { val mid = (lo + hi) >>> 1; if (ids(mid) < v) lo = mid + 1 else hi = mid }
      lo
    }
    val parent = Array.tabulate(m)(identity)
    def find(a0: Int): Int = {
      var a = a0
      while (parent(a) != a) { parent(a) = parent(parent(a)); a = parent(a) }
      a
    }
    i = 0
    while (i < n) {
      val r = es.getStruct(i, 2)
      val ra = find(idx(r.getLong(0))); val rb = find(idx(r.getLong(1)))
      // union by MIN id so each root already carries the component min
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      i += 1
    }
    val out = new Array[Any](m)
    i = 0
    while (i < m) { out(i) = InternalRow(ids(i), ids(find(i))); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cc", this, classOf[MinLabelComponents].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): MinLabelComponents =
    copy(child = c)
}

object GraphExpressionFunctions {
  /** Column API for [[SortedLongPairs]]. */
  def sortedLongPairs(c: Column): Column =
    GraftBridge.column(SortedLongPairs(GraftBridge.expression(c)))

  /** Column API for [[MinLabelComponents]]. */
  def minLabelComponents(c: Column): Column =
    GraftBridge.column(MinLabelComponents(GraftBridge.expression(c)))

  /** Column API for [[TriangleCredits]]. */
  def triangleCredits(u: Column, v: Column, nu: Column, nv: Column): Column =
    GraftBridge.column(TriangleCredits(
      GraftBridge.expression(u), GraftBridge.expression(v),
      GraftBridge.expression(nu), GraftBridge.expression(nv)))
}
