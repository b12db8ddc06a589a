package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Mutable buffer: the current sampling level L plus every surviving
  * (level, value) item — by invariant exactly the input rows whose
  * level ≥ L, and |items| ≤ k after every update/merge.
  */
final class QSketchBuffer(var level: Int,
    val items: scala.collection.mutable.ArrayBuffer[(Int, Long)])

/** DETERMINISTIC rank-adaptive mergeable quantile sketch (r15, VERDICT
  * r14 #6) — the adaptive-quantile rung of the gated sketch family
  * ([[BottomK]]/HLL/Roaring gate distinct; q_quantile_hist is the
  * fixed-width mergeable face).
  *
  * KLL-style level sampling with a VALUE-deterministic compaction rule:
  * each row carries a level = trailing zeros of its content hash
  * (computed in the query so the oracle sees the same expression); the
  * sketch keeps every row with level ≥ L and raises L one step at a
  * time whenever more than k rows survive. Because "survives" depends
  * only on a row's own hash — never on arrival order or which partial
  * it passed through — the final state is a pure function of the input
  * row set: L_final = min L with |{rows: level ≥ L}| ≤ k, and the
  * sample is exactly that set. Textbook KLL compacts by arrival
  * position (keep-every-other within a sorted buffer) and is
  * merge-order-sensitive; trading it for hash-determinism costs a
  * constant factor in sample efficiency and buys a DuckDB-replayable
  * gate — the q_approx_distinct_hll playbook. Each partial ships ≤ k
  * (level, value) pairs per group, full map-side combine; each
  * sampled row represents 2^L inputs, so quantiles are order
  * statistics of the (uniformly-weighted) sample.
  *
  * eval returns ARRAY<BIGINT>: [L, v₁ ≤ v₂ ≤ … ≤ v_n] (the sorted
  * sample values) — the query derives n_samp/est_n/p50/p90/p99 from
  * it with plain codegen'd array expressions.
  */
case class QuantileSketchAgg(value: Expression, lvl: Expression, k: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QSketchBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(value, lvl)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantile_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType == LongType && lvl.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT value, INT level), got " +
        s"(${value.dataType}, ${lvl.dataType})")

  override def createAggregationBuffer(): QSketchBuffer =
    new QSketchBuffer(0, scala.collection.mutable.ArrayBuffer.empty)

  /** Raise L until ≤ k items survive. Terminates: levels are ≤ 64, and
    * past the max level the buffer is empty.
    */
  private def compact(b: QSketchBuffer): Unit =
    while (b.items.size > k) {
      b.level += 1
      b.items.filterInPlace(_._1 >= b.level)
    }

  override def update(b: QSketchBuffer, input: InternalRow): QSketchBuffer = {
    val v = value.eval(input)
    val l = lvl.eval(input)
    if (v != null && l != null) {
      val li = l.asInstanceOf[Int]
      if (li >= b.level) {
        b.items += ((li, v.asInstanceOf[Long]))
        compact(b)
      }
    }
    b
  }

  override def merge(b: QSketchBuffer, o: QSketchBuffer): QSketchBuffer = {
    if (o.level > b.level) {
      b.level = o.level
      b.items.filterInPlace(_._1 >= b.level)
    }
    o.items.foreach { it => if (it._1 >= b.level) b.items += it }
    compact(b)
    b
  }

  override def eval(b: QSketchBuffer): Any = {
    val vs = b.items.map(_._2).toArray
    java.util.Arrays.sort(vs)
    val out = new Array[Long](vs.length + 1)
    out(0) = b.level.toLong
    System.arraycopy(vs, 0, out, 1, vs.length)
    new GenericArrayData(out)
  }

  override def serialize(b: QSketchBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 12 * b.items.size)
    bb.putInt(b.level); bb.putInt(b.items.size)
    b.items.foreach { case (l, v) => bb.putInt(l); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QSketchBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val level = bb.getInt
    val n = bb.getInt
    val items = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    (0 until n).foreach(_ => items += ((bb.getInt, bb.getLong)))
    new QSketchBuffer(level, items)
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(value = c.head, lvl = c(1))
}

object QuantileSketchAgg {
  /** Column API: quantile sketch of (BIGINT value, INT level). */
  def quantileSketch(value: Column, lvl: Column, k: Int): Column =
    GraftBridge.column(
      QuantileSketchAgg(GraftBridge.expression(value),
        GraftBridge.expression(lvl), k).toAggregateExpression())
}
