package graft

import graft.search.{Analyzer, MetastoreApi}
import graft.text.PorterStemmer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based guards (raw scalacheck generators, fixed seed) for the
  * pure driver-side pieces that must agree with the engine-side
  * expressions.
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '.', ',', '-', '_', '!'),
      1 -> Gen.oneOf('\t', '"', '\'', '(', ')')))
      .map(_.mkString)

  test("roaring buffer: cardinality/merge/serde agree with a reference Set across the array→bitmap upgrade") {
    import graft.functions.RoaringBuffer
    // mixed regimes: sparse across chunks, dense-in-one-chunk (forces
    // the 4096 array→bitmap upgrade), duplicates, chunk boundaries
    val sparse = Gen.chooseNum(0L, (1L << 31) - 1)
    val dense = Gen.chooseNum(0L, 8191L).map(65536L * 7 + _)
    val edge = Gen.oneOf(0L, 65535L, 65536L, (1L << 31) - 1)
    val value: Gen[Long] = Gen.frequency(3 -> sparse, 6 -> dense, 1 -> edge)
    val sets = (0 until 20).map { i =>
      samples(Gen.listOfN(1500, value), 1).head
    }
    sets.zipWithIndex.foreach { case (xs, i) =>
      val b = new RoaringBuffer
      xs.foreach(b.add)
      assert(b.cardinality == xs.toSet.size, s"set $i cardinality")
    }
    // pairwise merge ≡ set union, through serde on one side
    val agg = graft.functions.RoaringDistinctAgg(
      org.apache.spark.sql.GraftBridge.expression(lit(0L)))
    sets.grouped(2).zipWithIndex.foreach { case (Seq(xs, ys), i) =>
      val a = new RoaringBuffer; xs.foreach(a.add)
      val bb = new RoaringBuffer; ys.foreach(bb.add)
      val roundTripped = agg.deserialize(agg.serialize(bb))
      assert(roundTripped.cardinality == ys.toSet.size, s"pair $i serde")
      a.or(roundTripped)
      assert(a.cardinality == (xs.toSet ++ ys.toSet).size, s"pair $i union")
    }
    // the dense-chunk upgrade really happened and counts right
    val b = new RoaringBuffer
    (0L until 5000L).foreach(v => b.add(65536L * 3 + v))
    assert(b.cardinality == 5000L)
    // and flat-vs-roaring agree on a shared random workload
    val flat = graft.functions.BitmapDistinctAgg(
      org.apache.spark.sql.GraftBridge.expression(lit(0L)))
    val xs = sets.head
    var fb = flat.createAggregationBuffer()
    val rb = new RoaringBuffer
    xs.foreach { v =>
      val word = (v >>> 6).toInt
      // flat update path inlined (the agg's update needs an InternalRow)
      fb = { val g = if (word + 1 <= fb.length) fb else {
        var cap = fb.length; while (cap < word + 1) cap *= 2
        java.util.Arrays.copyOf(fb, cap) }
        g(word) |= 1L << (v & 63); g }
      rb.add(v)
    }
    assert(flat.eval(fb) == rb.cardinality)
  }

  test("driver-side analyzeQuery equals engine-side tokens() on arbitrary ASCII") {
    import spark.implicits._
    val inputs = samples(asciiText, 300)
    val engineSide = inputs.toDF("s")
      .select(Analyzer.tokens(col("s")).as("t")).collect()
      .map(_.getSeq[String](0).toList)
    val driverSide = inputs.map(Analyzer.analyzeQuery(_).toList)
    engineSide.zip(driverSide).zip(inputs).foreach { case ((e, d), s) =>
      assert(e == d, s"analyzer divergence on input: '$s'")
    }
  }

  test("stemmer is total and yields non-empty lowercase stems") {
    samples(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString), 500).foreach { w =>
      val s = PorterStemmer.stem(w)
      assert(s.nonEmpty, s"empty stem for '$w'")
      assert(s == s.toLowerCase)
      assert(s.length <= w.length)
    }
  }

  test("stemmer reaches a fixed point within two applications") {
    val suffixes = Seq("s", "ed", "ing", "es", "ation", "ness", "ful")
    val gen = for {
      root <- Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
      suf <- Gen.oneOf(suffixes)
    } yield root + suf
    samples(gen, 500).foreach { w =>
      val twice = PorterStemmer.stem(PorterStemmer.stem(w))
      assert(PorterStemmer.stem(twice) == twice, s"no fixed point for '$w'")
    }
  }

  test("jsonValue decodes like json.loads for scalars and rejects bare words") {
    assert(MetastoreApi.jsonValue("\"str6\"") == "str6")
    assert(MetastoreApi.jsonValue("6") == 6L)
    assert(MetastoreApi.jsonValue("6.5") == 6.5)
    assert(MetastoreApi.jsonValue("true") == true)
    assert(MetastoreApi.jsonValue("false") == false)
    intercept[IllegalArgumentException](MetastoreApi.jsonValue("str6"))
    intercept[IllegalArgumentException](MetastoreApi.jsonValue(""))
  }

  test("WordShingles equals a scala reference on arbitrary space-separated text") {
    import spark.implicits._
    val spacedText: Gen[String] = Gen.listOf(Gen.frequency(
      6 -> Gen.oneOf("aa", "b", "ccc", "dd", "e"), 3 -> Gen.const(" "), 1 -> Gen.const("  ")))
      .map(_.mkString(" "))
    def ref(s: String, n: Int): List[String] = {
      val toks = s.split(" ").filter(_.nonEmpty)
      if (toks.length < n) Nil
      else toks.sliding(n).map(_.mkString("_")).toList.distinct
    }
    val inputs = samples(spacedText, 300)
    for (n <- Seq(2, 3)) {
      val got = inputs.toDF("s")
        .select(graft.functions.TextExpressionFunctions.wordShingles(col("s"), n).as("sh"))
        .collect().map(_.getSeq[String](0).toList)
      got.zip(inputs).foreach { case (g, s) =>
        assert(g == ref(s, n), s"shingle divergence (n=$n) on input: '$s'")
      }
    }
  }

  test("WordPairs equals a scala reference on arbitrary token arrays") {
    import spark.implicits._
    val tokArr: Gen[List[String]] =
      Gen.listOf(Gen.oneOf("aa", "b", "ccc", "dd", "e", "f0", "g", "h1"))
    def ref(toks: List[String]): List[String] = {
      val d = toks.distinct.sorted
      (for { i <- d.indices; j <- (i + 1) until d.length } yield s"${d(i)} ${d(j)}").toList
    }
    val inputs = samples(tokArr, 300)
    val got = inputs.toDF("t")
      .select(graft.functions.TextExpressionFunctions.wordPairs(col("t")).as("p"))
      .collect().map(_.getSeq[String](0).toList)
    got.zip(inputs).foreach { case (g, t) =>
      assert(g == ref(t), s"pair divergence on input: $t")
    }
  }

  test("WordPairs skips null array elements instead of NPEing (ADVICE r3)") {
    val got = spark.sql("SELECT array('b', CAST(NULL AS STRING), 'a', 'b') AS t")
      .select(graft.functions.TextExpressionFunctions.wordPairs(col("t")).as("p"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got.head == List("a b"))
  }

  test("SpanGaps equals a scala reference on arbitrary token arrays") {
    import spark.implicits._
    // skew toward the two query terms so pairs actually occur
    val tokArr: Gen[List[String]] =
      Gen.listOf(Gen.frequency(3 -> Gen.const("merge"), 3 -> Gen.const("join"),
        4 -> Gen.oneOf("aa", "b", "table", "dd")))
    def ref(toks: List[String], maxGap: Int): List[Int] =
      (for {
        i <- toks.indices if toks(i) == "merge"
        j <- (i + 1) until toks.length
        if toks(j) == "join" && j - i - 1 <= maxGap
      } yield j - i - 1).toList
    val inputs = samples(tokArr, 300)
    for (maxGap <- Seq(0, 3)) {
      val got = inputs.toDF("t")
        .select(graft.functions.TextExpressionFunctions
          .spanGaps(col("t"), "merge", "join", maxGap).as("g"))
        .collect().map(_.getSeq[Int](0).toList)
      got.zip(inputs).foreach { case (g, t) =>
        assert(g == ref(t, maxGap), s"span divergence (maxGap=$maxGap) on input: $t")
      }
    }
  }

  test("SpanGaps skips null array elements and handles empty arrays") {
    val got = spark.sql(
      "SELECT array('merge', CAST(NULL AS STRING), 'join', 'merge', 'join') AS t")
      .select(graft.functions.TextExpressionFunctions
        .spanGaps(col("t"), "merge", "join", 3).as("g"))
      .collect().map(_.getSeq[Int](0).toList)
    // pairs: (0,2) gap 1, (0,4) gap 3, (3,4) gap 0 — scan order i asc, j asc
    assert(got.head == List(1, 3, 0))
    val empty = spark.sql("SELECT CAST(array() AS ARRAY<STRING>) AS t")
      .select(graft.functions.TextExpressionFunctions
        .spanGaps(col("t"), "merge", "join", 0).as("g"))
      .collect().map(_.getSeq[Int](0).toList)
    assert(empty.head == Nil)
  }

  test("PrefixFollowers equals a scala reference on arbitrary token arrays") {
    import spark.implicits._
    val tokArr: Gen[List[String]] =
      Gen.listOf(Gen.frequency(3 -> Gen.const("merge"),
        4 -> Gen.oneOf("join", "joins", "jolt", "jab", "table", "b")))
    def ref(toks: List[String]): List[String] =
      toks.indices.dropRight(1).toList
        .collect { case i if toks(i) == "merge" && toks(i + 1).startsWith("jo") => toks(i + 1) }
        .distinct.sorted
    val inputs = samples(tokArr, 300)
    val got = inputs.toDF("t")
      .select(graft.functions.TextExpressionFunctions
        .prefixFollowers(col("t"), "merge", "jo").as("c"))
      .collect().map(_.getSeq[String](0).toList)
    got.zip(inputs).foreach { case (g, t) =>
      assert(g == ref(t), s"completion divergence on input: $t")
    }
  }

  test("FloatVecDotConst equals the interpreted HOF fold bit-for-bit") {
    import spark.implicits._
    // arbitrary float vectors (including subnormals-ish small and large
    // magnitudes) against a fixed irrational-ish coefficient row: the
    // codegen'd loop and the aggregate/zip_with interpreted fold must
    // produce the IDENTICAL double (same left-to-right order)
    val coef = (0 until 16).map(i => ((i * 37 + 11) % 2001 - 1000) / 1000.0)
    val vec: Gen[List[Float]] = Gen.listOfN(16,
      Gen.chooseNum(-1e6f, 1e6f, 0.0f, 1.0f, -1.0f, 1e-30f))
    val vs = samples(vec, 300)
    val df = vs.toDF("v").select(
      graft.functions.VectorFunctions.floatVecDotConst(col("v"), coef).as("native"),
      aggregate(
        zip_with(col("v"), typedlit(coef), (x, c) => x.cast("double") * c),
        lit(0.0), _ + _).as("hof"))
    df.collect().foreach { r =>
      val (n, h) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h),
        s"dot divergence: native=$n hof=$h")
    }
  }

  test("SortedIntersectCount equals set intersection on arbitrary sorted arrays") {
    import spark.implicits._
    val arr: Gen[List[String]] =
      Gen.listOf(Gen.oneOf("a", "ab", "b", "ba", "c", "cc", "d", "", "e", "f"))
        .map(_.distinct.sorted)
    val pairs = samples(Gen.zip(arr, arr), 400)
    val got = pairs.toDF("x", "y")
      .select(graft.functions.TextExpressionFunctions
        .sortedIntersectCount(col("x"), col("y")).as("n"))
      .collect().map(_.getLong(0))
    got.zip(pairs).foreach { case (g, (x, y)) =>
      assert(g == (x.toSet & y.toSet).size.toLong, s"intersect divergence on ($x, $y)")
    }
  }

  test("QOI encode→decode inverts on arbitrary images (random + runs + small diffs)") {
    import graft.multimodal.MediaCodec
    // pixel generators chosen to hit every op class: pure random (RGB/
    // LUMA), long constant runs (RUN), few-color palettes (INDEX),
    // ±1 neighbours (DIFF)
    val dim = Gen.choose(1, 12)
    val img: Gen[(Int, Int, Array[Int])] = for {
      w <- dim; h <- dim
      mode <- Gen.oneOf("random", "runs", "palette", "drift")
      px <- mode match {
        case "random" => Gen.listOfN(w * h, Gen.choose(0, 0xffffff))
        case "runs" => Gen.listOfN((w * h + 9) / 10, Gen.choose(0, 0xffffff))
          .map(cs => List.tabulate(w * h)(i => cs(i / 10 min (cs.length - 1))))
        case "palette" => Gen.listOfN(3, Gen.choose(0, 0xffffff)).flatMap(pal =>
          Gen.listOfN(w * h, Gen.choose(0, 2)).map(_.map(pal(_))))
        case _ => Gen.choose(0, 0xffffff).map(start =>
          List.tabulate(w * h)(i => (start + i) & 0xffffff))
      }
    } yield (w, h, px.toArray)
    samples(img, 300).foreach { case (w, h, px) =>
      val enc = MediaCodec.encodeQoi(w, h, (x, y) => px(y * w + x))
      val m = MediaCodec.decodeQoi(enc)
      assert(m.width == w && m.height == h)
      def sum(shift: Int) = px.map(p => ((p >> shift) & 0xff).toLong).sum
      assert((m.sumR, m.sumG, m.sumB) == ((sum(16), sum(8), sum(0))),
        s"round-trip sums diverge on ${w}x$h ${px.take(6).mkString(",")}…")
    }
  }

  test("indexed PNG round-trips arbitrary palettes, indices, and filter schedules") {
    import graft.multimodal.MediaCodec
    val gen = for {
      w <- Gen.choose(1, 12)
      h <- Gen.choose(1, 10)
      pal <- Gen.listOfN(16, Gen.choose(0, 0xffffff))
      ixs <- Gen.listOfN(w * h, Gen.choose(0, 15))
      f0 <- Gen.choose(0, 4)
    } yield (w, h, pal.toArray, ixs.toArray, f0)
    samples(gen, 300).foreach { case (w, h, pal, ixs, f0) =>
      val enc = MediaCodec.encodePngIndexed(w, h, pal,
        (x, y) => ixs(y * w + x), y => (y + f0) % 5)
      val m = MediaCodec.decodePngIndexed(enc)
      assert(m.width == w && m.height == h && m.nColors == 16)
      assert(m.sumIdx == ixs.map(_.toLong).sum, s"index sum drift on ${w}x$h f0=$f0")
      def sum(shift: Int) = ixs.map(i => ((pal(i) >> shift) & 0xff).toLong).sum
      assert((m.sumR, m.sumG, m.sumB) == ((sum(16), sum(8), sum(0))),
        s"palette sums drift on ${w}x$h f0=$f0")
    }
  }

  test("foreachWavSample streams exactly the samples decodeWav aggregates") {
    import graft.multimodal.MediaCodec
    val gen = for {
      n <- Gen.choose(1, 200)
      sr <- Gen.oneOf(8000, 16000, 44100)
      xs <- Gen.listOfN(n, Gen.choose(-32768, 32767))
    } yield (sr, xs.toArray)
    samples(gen, 200).foreach { case (sr, xs) =>
      val enc = MediaCodec.encodeWavPcm16(xs.length, sr, xs(_))
      val agg = MediaCodec.decodeWav(enc)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
      val (dsr, dn) = MediaCodec.foreachWavSample(enc)(buf += _)
      assert(dsr == sr && dn == xs.length.toLong)
      assert(buf.toSeq == xs.toSeq, "sample walk diverged from the payload")
      assert(buf.map(v => math.abs(v.toLong)).sum == agg.sumAbs &&
        (if (buf.isEmpty) 0L else buf.map(v => math.abs(v.toLong)).max) == agg.maxAbs,
        "sample walk disagrees with the aggregate decoder")
    }
  }
}
