package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Roaring-container buffer: the [0, 2³¹) key space is split into
  * 2¹⁵ chunks of 2¹⁶ values; each present chunk holds EITHER a sorted
  * short array (≤ [[RoaringBuffer.ArrayMax]] entries, 2 B/value) or a
  * 1024-word bitmap (8 KiB flat) — the array/bitmap hybrid of the
  * published Roaring design (Chambi, Lemire et al., "Better bitmap
  * performance with Roaring bitmaps", 2016; run containers omitted —
  * they only matter for long runs, which hashed keys never form).
  * Sparse keys cost 2 bytes each instead of domain/8 bytes, which is
  * the difference between shipping partials for a 2³¹ hash domain
  * (flat: 256 MiB per group; roaring: ~2 B per distinct value).
  */
final class RoaringBuffer {
  import RoaringBuffer._
  var n: Int = 0
  var keys: Array[Int] = new Array[Int](4) // chunk ids, sorted
  var conts: Array[AnyRef] = new Array[AnyRef](4)

  private def findChunk(key: Int): Int = {
    // binary search over the sorted present-chunk ids
    var lo = 0; var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val k = keys(mid)
      if (k == key) return mid
      else if (k < key) lo = mid + 1
      else hi = mid - 1
    }
    -(lo + 1)
  }

  private def insertChunk(at: Int, key: Int, cont: AnyRef): Unit = {
    if (n == keys.length) {
      keys = java.util.Arrays.copyOf(keys, n * 2)
      conts = java.util.Arrays.copyOf(conts, n * 2)
    }
    System.arraycopy(keys, at, keys, at + 1, n - at)
    System.arraycopy(conts, at, conts, at + 1, n - at)
    keys(at) = key
    conts(at) = cont
    n += 1
  }

  def add(x: Long): Unit = {
    val key = (x >>> 16).toInt
    val low = (x & 0xffff).toInt
    val i = findChunk(key)
    if (i < 0) {
      insertChunk(-(i + 1), key, ArrayCont(Array(low.toShort), 1))
    } else conts(i) match {
      case a: ArrayCont =>
        val j = a.search(low)
        if (j < 0) {
          if (a.size == ArrayMax) {
            val bm = a.toBitmap
            bm((low >>> 6)) |= 1L << (low & 63)
            conts(i) = bm
          } else a.insert(-(j + 1), low)
        }
      case bm: Array[Long] =>
        bm(low >>> 6) |= 1L << (low & 63)
    }
  }

  def or(o: RoaringBuffer): Unit = {
    var i = 0
    while (i < o.n) {
      val key = o.keys(i)
      val j = findChunk(key)
      if (j < 0) insertChunk(-(j + 1), key, copyCont(o.conts(i)))
      else conts(j) = mergeCont(conts(j), o.conts(i))
      i += 1
    }
  }

  def cardinality: Long = {
    var c = 0L
    var i = 0
    while (i < n) {
      conts(i) match {
        case a: ArrayCont => c += a.size
        case bm: Array[Long] =>
          var w = 0
          while (w < bm.length) { c += java.lang.Long.bitCount(bm(w)); w += 1 }
      }
      i += 1
    }
    c
  }

  def serializedSize: Int = {
    var bytes = 4
    var i = 0
    while (i < n) {
      bytes += 4 + 1 + (conts(i) match {
        case a: ArrayCont => 4 + 2 * a.size
        case _: Array[Long] => 8 * BitmapWords
      })
      i += 1
    }
    bytes
  }
}

object RoaringBuffer {
  /** Array containers upgrade to bitmaps past this many entries — the
    * published crossover (4096 shorts = 8 KiB = the bitmap size).
    */
  val ArrayMax = 4096
  val BitmapWords = 1024 // 2^16 bits

  /** Sorted-short-array container with its own size (capacity doubles). */
  final case class ArrayCont(var vs: Array[Short], var size: Int) {
    def search(low: Int): Int = {
      var lo = 0; var hi = size - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = vs(mid) & 0xffff
        if (v == low) return mid
        else if (v < low) lo = mid + 1
        else hi = mid - 1
      }
      -(lo + 1)
    }
    def insert(at: Int, low: Int): Unit = {
      if (size == vs.length) vs = java.util.Arrays.copyOf(vs, size * 2)
      System.arraycopy(vs, at, vs, at + 1, size - at)
      vs(at) = low.toShort
      size += 1
    }
    def toBitmap: Array[Long] = {
      val bm = new Array[Long](BitmapWords)
      var i = 0
      while (i < size) {
        val v = vs(i) & 0xffff
        bm(v >>> 6) |= 1L << (v & 63)
        i += 1
      }
      bm
    }
  }

  def copyCont(c: AnyRef): AnyRef = c match {
    case a: ArrayCont => ArrayCont(java.util.Arrays.copyOf(a.vs, a.size), a.size)
    case bm: Array[Long] => java.util.Arrays.copyOf(bm, bm.length)
  }

  /** Merge other-container `o` into `c`, returning the (possibly
    * upgraded) result. Array∪array materializes the sorted union and
    * upgrades past [[ArrayMax]]; anything touching a bitmap ORs.
    */
  def mergeCont(c: AnyRef, o: AnyRef): AnyRef = (c, o) match {
    case (a: ArrayCont, b: ArrayCont) =>
      val out = new Array[Short](math.min(a.size + b.size, 1 << 16))
      var i = 0; var j = 0; var k = 0
      while (i < a.size && j < b.size) {
        val x = a.vs(i) & 0xffff; val y = b.vs(j) & 0xffff
        if (x < y) { out(k) = a.vs(i); i += 1 }
        else if (y < x) { out(k) = b.vs(j); j += 1 }
        else { out(k) = a.vs(i); i += 1; j += 1 }
        k += 1
      }
      while (i < a.size) { out(k) = a.vs(i); i += 1; k += 1 }
      while (j < b.size) { out(k) = b.vs(j); j += 1; k += 1 }
      if (k > ArrayMax) ArrayCont(out, k).toBitmap
      else ArrayCont(out, k)
    case (a: ArrayCont, bm: Array[Long]) =>
      val copy = java.util.Arrays.copyOf(bm, bm.length)
      var i = 0
      while (i < a.size) {
        val v = a.vs(i) & 0xffff
        copy(v >>> 6) |= 1L << (v & 63)
        i += 1
      }
      copy
    case (bm: Array[Long], a: ArrayCont) =>
      var i = 0
      while (i < a.size) {
        val v = a.vs(i) & 0xffff
        bm(v >>> 6) |= 1L << (v & 63)
        i += 1
      }
      bm
    case (x: Array[Long], y: Array[Long]) =>
      var w = 0
      while (w < x.length) { x(w) |= y(w); w += 1 }
      x
  }
}

/** Exact distinct-count aggregate over [0, 2³¹) with ROARING containers
  * — the production extension [[BitmapDistinctAgg]]'s docstring names:
  * same update/OR/popcount contract, but SPARSE key spaces (hashed ids)
  * ship ~2 bytes per distinct value in partials instead of domain/8
  * flat-bitmap bytes, and dense chunks degrade gracefully to the 8 KiB
  * bitmap. Map-side combine works exactly as for the flat version; the
  * wire format is per-chunk (key, type, payload).
  */
case class RoaringDistinctAgg(child: Expression,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[RoaringBuffer] {
  import RoaringBuffer._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "roaring_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a BIGINT input")

  override def createAggregationBuffer(): RoaringBuffer = new RoaringBuffer

  override def update(b: RoaringBuffer, input: InternalRow): RoaringBuffer = {
    val v = child.eval(input)
    if (v == null) return b
    val x = v.asInstanceOf[Long]
    if (x < 0 || x >= (1L << 31))
      throw new IllegalArgumentException(
        s"$prettyName input $x outside the supported [0, 2^31) domain")
    b.add(x)
    b
  }

  override def merge(b: RoaringBuffer, o: RoaringBuffer): RoaringBuffer = {
    b.or(o)
    b
  }

  override def eval(b: RoaringBuffer): Any = b.cardinality

  override def serialize(b: RoaringBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.serializedSize)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) {
      bb.putInt(b.keys(i))
      b.conts(i) match {
        case a: ArrayCont =>
          bb.put(0: Byte).putInt(a.size)
          var j = 0
          while (j < a.size) { bb.putShort(a.vs(j)); j += 1 }
        case bm: Array[Long] =>
          bb.put(1: Byte)
          var w = 0
          while (w < bm.length) { bb.putLong(bm(w)); w += 1 }
      }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): RoaringBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new RoaringBuffer
    val n = bb.getInt
    b.n = n
    b.keys = new Array[Int](math.max(n, 4))
    b.conts = new Array[AnyRef](math.max(n, 4))
    var i = 0
    while (i < n) {
      b.keys(i) = bb.getInt
      if (bb.get() == 0) {
        val sz = bb.getInt
        val vs = new Array[Short](math.max(sz, 1))
        var j = 0
        while (j < sz) { vs(j) = bb.getShort; j += 1 }
        b.conts(i) = ArrayCont(vs, sz)
      } else {
        val bm = new Array[Long](BitmapWords)
        var w = 0
        while (w < BitmapWords) { bm(w) = bb.getLong; w += 1 }
        b.conts(i) = bm
      }
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): RoaringDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RoaringDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): RoaringDistinctAgg =
    copy(child = c.head)
}

object RoaringDistinctAgg {
  /** Column API: exact roaring-bitmap distinct count of a non-negative
    * BIGINT column.
    */
  def roaringDistinct(c: Column): Column =
    GraftBridge.column(RoaringDistinctAgg(GraftBridge.expression(c)).toAggregateExpression())
}
