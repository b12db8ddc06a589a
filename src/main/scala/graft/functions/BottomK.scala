package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bottom-k sketch aggregate: the k smallest DISTINCT BIGINT values per
  * group — the classic one-permutation MinHash sketch (bottom-k of a
  * hashed set estimates Jaccard between groups). A native
  * TypedImperativeAggregate: the buffer is a bounded sorted set, merge is
  * a bounded union, so partial aggregation ships ≤ k longs per group —
  * sketch-friendly at 100 TB.
  */
case class BottomK(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a BIGINT input")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def trim(b: java.util.TreeSet[java.lang.Long]): Unit =
    while (b.size() > k) b.pollLast()

  override def update(b: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) { b.add(v.asInstanceOf[Long]); trim(b) }
    b
  }

  override def merge(b: java.util.TreeSet[java.lang.Long],
                     o: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    b.addAll(o); trim(b); b
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](b.size())
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.size())
    bb.putInt(b.size())
    val it = b.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = createAggregationBuffer()
    (0 until n).foreach(_ => b.add(bb.getLong))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BottomK =
    copy(child = c.head)
}

object BottomK {
  /** Column API: bottom-k sketch of a BIGINT column. */
  def bottomK(c: Column, k: Int): Column =
    GraftBridge.column(
      BottomK(GraftBridge.expression(c), k).toAggregateExpression())
}
