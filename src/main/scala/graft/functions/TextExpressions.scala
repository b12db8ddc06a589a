package graft.functions

import graft.text.PorterStemmer
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter-stem a string column (the ES-`english`-analyzer stemming step;
  * algorithm in [[graft.text.PorterStemmer]]). Codegen emits a static
  * call into the stemmer — the string churn itself can't be inlined
  * profitably, but staying codegen'd (vs CodegenFallback) keeps the
  * surrounding projection in ONE whole-stage span instead of splitting
  * it at every stem.
  */
case class PorterStem(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_stem"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(PorterStemmer.stem(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.text.PorterStemmer.stem($c.toString()))")

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

/** Distinct word n-gram shingles of a space-separated string, in one
  * pass: split on ' ' (empties skipped), join each n-run with '_',
  * de-dupe keeping first-occurrence order — the native form of the
  * interpreted HOF shingle expression (kept as
  * [[graft.dedup.Dedup.shinglesHof]] and pinned equal in PipelineSpec),
  * which was the dominant cost of every shingle-based dedup query.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  def compute(v: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = new java.util.ArrayList[String]()
    val s = v.toString
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) toks.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val out = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j + n <= toks.size()) {
      val sb = new java.lang.StringBuilder(toks.get(j))
      var k = 1
      while (k < n) { sb.append('_').append(toks.get(j + k)); k += 1 }
      out.add(sb.toString)
      j += 1
    }
    val arr = new Array[Any](out.size())
    val it = out.iterator()
    var m = 0
    while (it.hasNext) { arr(m) = UTF8String.fromString(it.next()); m += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** |A ∩ B| of two SORTED string arrays by a single merge pass — exact
  * set-intersection cardinality in O(|A|+|B|) string compares, with no
  * per-row hash-set allocation (the cost that makes built-in
  * `array_intersect` the bottleneck of pairwise Jaccard verification).
  * Inputs MUST be sorted ascending and distinct (graft wraps them in
  * `sort_array` over already-distinct shingle arrays).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(StringType, _),
            org.apache.spark.sql.types.ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires two array<string> inputs")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData,
              b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    var i = 0
    var j = 0
    var n = 0L
    val na = a.numElements()
    val nb = b.numElements()
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
            b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intersecter", this, classOf[SortedIntersectCount].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** Merge-intersection of two SORTED long arrays, codegen'd — the
  * triangle-closure inner loop. Built-in `array_intersect` builds a
  * hash set per call over boxed elements; on pre-sorted primitive
  * arrays a two-pointer scan does the same work allocation-free, and
  * the result ships as an UnsafeArrayData primitive block.
  */
case class SortedIntersectLongs(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(LongType, false),
            org.apache.spark.sql.types.ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      // containsNull=true is REJECTED, not tolerated: compute() reads
      // primitive slots with getLong, which on a null slot would yield a
      // garbage 0 silently. sort_array(collect_set(...)) — the intended
      // producer — always yields containsNull=false, so this costs
      // nothing there and turns a silent-wrong-answer caller into an
      // analysis error (ADVICE r5).
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs with containsNull=false " +
          "(e.g. from sort_array(collect_set(...)))")
    }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sorted_intersect_longs"

  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData,
              b: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { out(n) = x; n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
            b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intersecter", this, classOf[SortedIntersectLongs].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectLongs =
    copy(left = l, right = r)
}

/** 60-bit SimHash over a token array, fully codegen'd (replaces the
  * interpreted nested-HOF rendering — VERDICT r1 #5). Per token, two
  * rolling char-fold hashes (×31 mod 1e9+7, ×37 mod 998244353) supply 30
  * bits each; signature bit j is the sign of Σ_tokens (2·bit_j(h) − 1).
  * Bit-identical to [[graft.dedup.Dedup.simhashSignatureSql]]'s DuckDB
  * rendering for ASCII input.
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string> input")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val cnt = new Array[Int](60)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        var h1 = 0L; var h2 = 0L
        var k = 0
        while (k < s.length) {
          val c = s.charAt(k).toLong
          h1 = (h1 * 31L + c) % 1000000007L
          h2 = (h2 * 37L + c) % 998244353L
          k += 1
        }
        var j = 0
        while (j < 30) {
          cnt(j) += (((h1 >> j) & 1L).toInt * 2) - 1
          cnt(j + 30) += (((h2 >> j) & 1L).toInt * 2) - 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) { if (cnt(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val c = ctx.freshName("c")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $cnt = new int[60];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    String $s = $arr.getUTF8String($i).toString();
         |    long $h1 = 0L; long $h2 = 0L;
         |    for (int $k = 0; $k < $s.length(); $k++) {
         |      long $c = (long) $s.charAt($k);
         |      $h1 = ($h1 * 31L + $c) % 1000000007L;
         |      $h2 = ($h2 * 37L + $c) % 998244353L;
         |    }
         |    for (int $j = 0; $j < 30; $j++) {
         |      $cnt[$j] += (int) (($h1 >> $j) & 1L) * 2 - 1;
         |      $cnt[$j + 30] += (int) (($h2 >> $j) & 1L) * 2 - 1;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 60; $j++) {
         |  if ($cnt[$j] > 0) $sig |= 1L << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
}

/** All unordered distinct token pairs of an array<string>, canonically
  * sorted ("t1 t2" with t1 < t2, pairs in lexicographic order) — ONE
  * pass per row, so corpus co-occurrence is explode→groupBy with no
  * token-table self-join (and no corpus-scale materialization feeding
  * one). The pair count is quadratic in the per-DOCUMENT distinct-token
  * count — bounded by document length, never by corpus size. Tokens
  * must not contain spaces (graft's analyzer splits on non-alphanumerics,
  * so they cannot).
  */
case class WordPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<string> input")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_pairs"

  def compute(v: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val set = new java.util.TreeSet[String]()
    var i = 0
    val n = v.numElements()
    // input arrays may declare containsNull: skip null elements (the
    // output type promises containsNull=false, ADVICE r3)
    while (i < n) {
      if (!v.isNullAt(i)) set.add(v.getUTF8String(i).toString)
      i += 1
    }
    val toks = set.toArray(new Array[String](set.size()))
    val out = new Array[Any](toks.length * (toks.length - 1) / 2)
    var m = 0
    var a = 0
    while (a < toks.length) {
      var b = a + 1
      while (b < toks.length) {
        out(m) = UTF8String.fromString(toks(a) + " " + toks(b)); m += 1; b += 1
      }
      a += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pairer", this, classOf[WordPairs].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): WordPairs = copy(child = c)
}

/** Ordered-pair proximity gaps over a token array — the ES span_near /
  * match_phrase primitive as ONE codegen'd pass: for every pair of
  * positions (i < j) with toks[i] = first, toks[j] = second and
  * j − i − 1 ≤ maxGap, emit the gap j − i − 1, in (i asc, j asc) scan
  * order. maxGap = 0 is exact phrase adjacency (the output size is the
  * occurrence count); maxGap = slop is span_near with in_order = true.
  * Replaces the interpreted `filter(sequence(0, n−1), i -> toks[i] = …)`
  * HOF stack whose lambda re-evaluated the whole inlined tokenizer at
  * EVERY index reference (the §4.5 pitfall — ms_span_near ran ~8.5 s for
  * 5,000 16-token docs; this pass is O(occ(first)·occ(second)) array
  * reads inside whole-stage codegen).
  */
case class SpanGaps(child: Expression, first: String, second: String, maxGap: Int,
                    exclude: Option[String] = None)
    extends UnaryExpression {

  require(maxGap >= 0, "maxGap must be >= 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<string> input")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_span_gaps"

  private val firstU = UTF8String.fromString(first)
  private val secondU = UTF8String.fromString(second)
  // ES span_not analog: a pair is suppressed when the excluded term
  // occurs strictly INSIDE the span (between i and j)
  private val exclU = exclude.map(UTF8String.fromString).orNull

  def compute(v: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = v.numElements()
    // positions of `second` (and `exclude`) once, then for each `first`
    // a bounded forward scan of those (tiny) position lists
    val ps = new java.util.ArrayList[Integer]()
    val pe = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val t = v.getUTF8String(i)
        if (t.equals(secondU)) ps.add(i)
        if (exclU != null && t.equals(exclU)) pe.add(i)
      }
      i += 1
    }
    def excluded(i: Int, j: Int): Boolean = {
      var k = 0
      while (k < pe.size()) {
        val e = pe.get(k).intValue()
        if (e > i && e < j) return true
        k += 1
      }
      false
    }
    val gaps = new java.util.ArrayList[Integer]()
    i = 0
    while (i < n) {
      if (!v.isNullAt(i) && v.getUTF8String(i).equals(firstU)) {
        var k = 0
        var done = false
        while (k < ps.size() && !done) {
          val j = ps.get(k).intValue()
          if (j > i) {
            if (j - i - 1 <= maxGap) { if (!excluded(i, j)) gaps.add(j - i - 1) }
            else done = true
          }
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Int](gaps.size())
    var m = 0
    while (m < out.length) { out(m) = gaps.get(m).intValue(); m += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("spanner", this, classOf[SpanGaps].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): SpanGaps = copy(child = c)
}

/** Sorted distinct tokens that immediately follow `first` and start with
  * `prefix` — the ES match_phrase_prefix ("search-as-you-type")
  * completion set as one codegen'd pass over the token array. Same §4.5
  * rationale as [[SpanGaps]]: replaces an interpreted
  * transform-over-sequence whose lambda re-evaluated the inlined
  * tokenizer per index.
  */
case class PrefixFollowers(child: Expression, first: String, prefix: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<string> input")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_prefix_followers"

  private val firstU = UTF8String.fromString(first)
  private val prefixU = UTF8String.fromString(prefix)

  def compute(v: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = v.numElements()
    val set = new java.util.TreeSet[String]()
    var i = 0
    while (i + 1 < n) {
      if (!v.isNullAt(i) && !v.isNullAt(i + 1) &&
          v.getUTF8String(i).equals(firstU) &&
          v.getUTF8String(i + 1).startsWith(prefixU)) {
        set.add(v.getUTF8String(i + 1).toString)
      }
      i += 1
    }
    val out = new Array[Any](set.size())
    val it = set.iterator()
    var m = 0
    while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("follower", this, classOf[PrefixFollowers].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): PrefixFollowers = copy(child = c)
}

object TextExpressionFunctions {
  /** Column API for [[PorterStem]]. */
  def porterStem(c: Column): Column =
    GraftBridge.column(PorterStem(GraftBridge.expression(c)))

  /** Column API for [[PolyHash]] with the graft fingerprint constants. */
  def polyHash(c: Column, mult: Long = 31L, modulus: Long = 1000000007L): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(c), mult, modulus))

  /** Column API for [[SimHash]] over a token-array column. */
  def simHash(c: Column): Column =
    GraftBridge.column(SimHash(GraftBridge.expression(c)))

  /** Column API for [[WordShingles]]. */
  def wordShingles(c: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(c), n))

  /** Column API for [[WordPairs]]. */
  def wordPairs(c: Column): Column =
    GraftBridge.column(WordPairs(GraftBridge.expression(c)))

  /** Column API for [[SortedIntersectCount]]. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedIntersectCount(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API for [[SortedIntersectLongs]]. PRECONDITION: both inputs
    * must be sorted ascending and duplicate-free, with
    * containsNull=false element type (violations of the null shape are
    * rejected at analysis; sortedness/distinctness are the caller's
    * contract — feed `sort_array(collect_set(...))`). On unsorted input
    * the merge scan silently undercounts.
    */
  def sortedIntersectLongs(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedIntersectLongs(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API for [[SpanGaps]]. */
  def spanGaps(toks: Column, first: String, second: String, maxGap: Int,
               exclude: Option[String] = None): Column =
    GraftBridge.column(SpanGaps(GraftBridge.expression(toks), first, second, maxGap, exclude))

  /** Column API for [[PrefixFollowers]]. */
  def prefixFollowers(toks: Column, first: String, prefix: String): Column =
    GraftBridge.column(PrefixFollowers(GraftBridge.expression(toks), first, prefix))
}
