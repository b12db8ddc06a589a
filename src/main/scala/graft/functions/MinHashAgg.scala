package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature aggregate: folds a group's shingle hashes into the
  * 64 permutation minima `min_x (a_i·x + b_i) mod p` in ONE pass — the
  * signature build is a single narrow shuffle with map-side combine
  * (64 longs per group per partition), replacing the explode-to-64-rows
  * + two-stage re-aggregation shape. Permutation constants are the
  * shared [[MinHashAgg.permA]]/[[MinHashAgg.permB]] spec, also used by
  * the LSH band fold in [[graft.dedup.Dedup]].
  */
case class MinHashAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import MinHashAgg._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a BIGINT input")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(Perms)(Long.MaxValue)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < Perms) {
        val hv = (permA(i) * h + permB(i)) % Modulus
        if (hv < b(i)) b(i) = hv
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Perms) { if (o(i) < b(i)) b(i) = o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b.clone())

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * Perms)
    var i = 0
    while (i < Perms) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Array[Long](Perms)
    var i = 0
    while (i < Perms) { b(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashAgg =
    copy(child = c.head)
}

object MinHashAgg {
  val Perms = 64
  val Modulus = 1000000007L

  /** Deterministic permutation constants a_i (odd), b_i — the graft
    * MinHash spec (SURVEY §2.3).
    */
  def permA(i: Int): Long = 2L * i + 1 + 104729L * (i + 1) % Modulus
  def permB(i: Int): Long = (7919L * (i + 1) + 13) % Modulus

  /** Column API: 64-permutation MinHash signature of a BIGINT hash column. */
  def minhashSig(c: Column): Column =
    GraftBridge.column(MinHashAgg(GraftBridge.expression(c)).toAggregateExpression())
}
