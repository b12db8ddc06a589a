package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Elementwise vector sum aggregate over fixed-width float arrays:
  * buffer = dim doubles, update = one fused add loop, merge =
  * elementwise add — a centroid/mean computation is ONE narrow shuffle
  * of dim doubles per group with map-side combine, instead of the
  * posexplode-to-dim-rows + two-stage re-aggregation shape. Null rows
  * are skipped; the count needed for a mean is a plain `count` beside
  * it.
  */
case class VectorSumAgg(child: Expression, dim: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  require(dim > 0, "dim must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float|double> input")
  }

  // lazy: child.dataType is unresolvable while the expression tree is
  // still being analyzed (copy/withNewChildren run pre-resolution)
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim)

  override def update(b: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      // fixed-width contract: silently truncating a longer vector or
      // zero-padding a shorter one would yield quietly wrong centroids
      if (arr.numElements() != dim)
        throw new IllegalArgumentException(
          s"$prettyName(dim=$dim) got a vector of length ${arr.numElements()}")
      var i = 0
      while (i < dim) {
        b(i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Double], o: Array[Double]): Array[Double] = {
    var i = 0
    while (i < dim) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Double]): Any = new GenericArrayData(b.clone())

  override def serialize(b: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * dim)
    var i = 0
    while (i < dim) { bb.putDouble(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Array[Double](dim)
    var i = 0
    while (i < dim) { b(i) = bb.getDouble; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = c.head)
}

object VectorSumAgg {
  /** Column API: elementwise sum of a fixed-width vector column. */
  def vectorSum(c: Column, dim: Int): Column =
    GraftBridge.column(VectorSumAgg(GraftBridge.expression(c), dim).toAggregateExpression())
}
