package graft

import graft.multimodal.{MediaCodec, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("BMP round-trip: decode inverts encode across every row-padding class") {
    // widths 4..7 cover row padding 0/1/2/3 bytes — the classic decoder bug
    for (w <- 4 to 7; h <- Seq(1, 3)) {
      val enc = MediaCodec.encodeBmp(w, h, (x, y) => (x << 16) | (y << 8) | ((x + y) & 0xff))
      val m = MediaCodec.decodeBmp(enc)
      assert(m.width == w && m.height == h)
      val expR = (0 until h).flatMap(y => (0 until w).map(x => x.toLong)).sum
      val expG = (0 until h).flatMap(y => (0 until w).map(_ => y.toLong)).sum
      val expB = (0 until h).flatMap(y => (0 until w).map(x => ((x + y) & 0xff).toLong)).sum
      assert((m.sumR, m.sumG, m.sumB) == ((expR, expG, expB)),
        s"channel sums diverge at ${w}x$h (padding ${(4 - (w * 3) % 4) % 4} bytes)")
    }
  }

  test("WAV round-trip: chunk walk finds fmt/data, sign-extends negative samples") {
    val enc = MediaCodec.encodeWavPcm16(5, 16000, i => Seq(-32768, -1, 0, 1, 32767)(i))
    val m = MediaCodec.decodeWav(enc)
    assert(m.sampleRate == 16000 && m.nSamples == 5L)
    assert(m.sumAbs == 32768L + 1 + 0 + 1 + 32767 && m.maxAbs == 32768L)
    // an extra chunk between fmt and data must not break the walk
    val extra = enc.take(36) ++
      "LIST".getBytes ++ Array[Byte](4, 0, 0, 0, 9, 9, 9, 9) ++ enc.drop(36)
    // fix the RIFF size field for the inserted 12 bytes
    val riffLen = (extra.length - 8)
    extra(4) = riffLen.toByte; extra(5) = (riffLen >> 8).toByte
    extra(6) = (riffLen >> 16).toByte; extra(7) = (riffLen >> 24).toByte
    val m2 = MediaCodec.decodeWav(extra)
    assert(m2 == m, "chunk walk must skip unknown chunks")
  }

  test("PNG round-trip: every filter type, 1-pixel edge widths, multi-IDAT, CRC") {
    // each h uses filter (y % 5): h=6 cycles through all five filter types;
    // w=1 exercises the no-left-neighbor edge of Sub/Average/Paeth
    for (w <- Seq(1, 2, 5, 13); h <- Seq(1, 6, 9)) {
      val enc = MediaCodec.encodePng(w, h,
        (x, y) => ((x * 37 & 0xff) << 16) | ((y * 91 & 0xff) << 8) | ((x * y + 3) & 0xff),
        y => y % 5)
      val m = MediaCodec.decodePng(enc)
      assert(m.width == w && m.height == h)
      val px = for (y <- 0 until h; x <- 0 until w) yield (x, y)
      assert(m.sumR == px.map { case (x, _) => (x * 37 & 0xff).toLong }.sum, s"R ${w}x$h")
      assert(m.sumG == px.map { case (_, y) => (y * 91 & 0xff).toLong }.sum, s"G ${w}x$h")
      assert(m.sumB == px.map { case (x, y) => ((x * y + 3) & 0xff).toLong }.sum, s"B ${w}x$h")
    }
    // a corrupted byte inside IDAT must fail the CRC check, not decode junk
    val enc = MediaCodec.encodePng(5, 5, (x, y) => x + y, _ % 5)
    val tampered = enc.clone()
    tampered(40) = (tampered(40) ^ 0x55).toByte
    assertThrows[IllegalArgumentException](MediaCodec.decodePng(tampered))
    // truncation mid-chunk must throw, never read out of bounds
    assertThrows[IllegalArgumentException](MediaCodec.decodePng(enc.take(enc.length - 6)))
  }

  test("GIF round-trip: LZW dictionary growth, KwKwK case, extension skip") {
    for (w <- Seq(2, 7, 15); h <- Seq(2, 9, 12)) {
      val pal = (i: Int) => (i << 16) | ((15 - i) << 8) | ((i * 7) & 0xff)
      val px = (x: Int, y: Int) => (x + 2 * y) % 16
      val enc = MediaCodec.encodeGif(w, h, pal, px)
      val m = MediaCodec.decodeGif(enc)
      assert(m.width == w && m.height == h)
      val cells = for (y <- 0 until h; x <- 0 until w) yield px(x, y)
      assert(m.sumR == cells.map(i => ((pal(i) >> 16) & 0xff).toLong).sum, s"R ${w}x$h")
      assert(m.sumG == cells.map(i => ((pal(i) >> 8) & 0xff).toLong).sum, s"G ${w}x$h")
      assert(m.sumB == cells.map(i => (pal(i) & 0xff).toLong).sum, s"B ${w}x$h")
    }
    // the KwKwK self-reference arises from an all-same-index run
    val runs = MediaCodec.encodeGif(9, 9, i => i, (_, _) => 5)
    val mr = MediaCodec.decodeGif(runs)
    assert(mr.sumR == 0L && mr.sumG == 0L && mr.sumB == 81L * 5)
    // an extension block before the image descriptor must be skipped
    val enc = MediaCodec.encodeGif(3, 3, i => i, (x, y) => (x + y) % 16)
    val withExt = enc.take(13 + 48) ++
      Array[Byte](0x21, 0xFE.toByte, 3, 9, 9, 9, 0) ++ enc.drop(13 + 48)
    assert(MediaCodec.decodeGif(withExt) == MediaCodec.decodeGif(enc))
    // truncation inside the LZW stream must throw, never mis-decode
    assertThrows[IllegalArgumentException](MediaCodec.decodeGif(enc.take(enc.length - 4)))
  }

  test("JPEG round-trip: Huffman DC categories both signs, EOB path, clamps") {
    def expectedPix(v: Int): Long = {
      val dcq = Math.floorDiv(2 * 8 * (v - 128) + 16, 32)
      math.max(0, math.min(255, 2 * dcq + 128)).toLong
    }
    for (wb <- Seq(1, 3, 5); hb <- Seq(1, 2, 4)) {
      // alternate extremes so successive DC diffs swing positive and
      // negative through every category size, and both clamps fire
      val bv = (bx: Int, by: Int) => Seq(0, 255, 17, 200, 128)((bx + hb * by) % 5)
      val enc = MediaCodec.encodeJpegFlat(wb, hb, bv)
      val m = MediaCodec.decodeJpeg(enc)
      assert(m.width == wb * 8 && m.height == hb * 8)
      val want = (for (by <- 0 until hb; bx <- 0 until wb)
        yield 64L * expectedPix(bv(bx, by))).sum
      assert(m.sumLum == want, s"sum ${wb}x$hb")
    }
    // clamp edges: v=255 reconstructs past 255 (2·64+128), v=0 to exactly 0
    assert(MediaCodec.decodeJpeg(MediaCodec.encodeJpegFlat(1, 1, (_, _) => 255)).sumLum == 64L * 255)
    assert(MediaCodec.decodeJpeg(MediaCodec.encodeJpegFlat(1, 1, (_, _) => 0)).sumLum == 0L)
    // truncating the entropy stream must throw, never mis-decode
    val enc = MediaCodec.encodeJpegFlat(4, 4, (bx, by) => (37 * bx + 91 * by) % 256)
    assertThrows[IllegalArgumentException](
      MediaCodec.decodeJpeg(enc.take(enc.length - 6)))
    // non-JPEG payloads are rejected at the magic
    assertThrows[IllegalArgumentException](
      MediaCodec.decodeJpeg(Array[Byte](1, 2, 3, 4)))
  }

  test("decodeMeta sniffs real formats and falls back to the byte-fold stub") {
    import spark.implicits._
    val bmp = MediaCodec.encodeBmp(4, 2, (_, _) => 0x010203)
    val wav = MediaCodec.encodeWavPcm16(3, 8000, _ => 7)
    val txt = "not a media payload".getBytes("UTF-8")
    val df = Seq((1L, bmp), (2L, wav), (3L, txt))
      .toDF("doc_id", "payload")
      .selectExpr("doc_id", "CAST(payload AS STRING) AS text")
    // decodeMeta casts text→binary; real payloads aren't UTF-8 safe, so
    // feed binary directly through the same sniffing map
    val rows = Multimodal.decodeMeta(
        Seq((1L, bmp), (2L, wav), (3L, txt)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(3) == 4L && rows(1L).getLong(4) == 2L,
      "BMP payload must decode real geometry")
    assert(rows(2L).getLong(5) == 3L, "WAV payload must expose real sample count")
    val (fp, w, h, f) = Multimodal.decodeBytes(txt)
    assert(rows(3L).getLong(2) == fp && rows(3L).getLong(3) == w,
      "non-media payload must use the deterministic fallback")
    assert(df.count() == 3) // silence unused warning path; schema sanity
  }

  test("phash: 9-bit range, popcount consistency, and a hand-decoded witness") {
    val rows = graft.operators.Pipeline.mmPhash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (hash, ones) = (r.getLong(3), r.getLong(4))
      assert(hash >= 0L && hash < 512L, s"hash outside 9 bits: $r")
      assert(java.lang.Long.bitCount(hash).toLong == ones, s"popcount: $r")
      assert(r.getLong(1) == 4 + r.getLong(0) % 21 && r.getLong(2) == 3 + r.getLong(0) % 14)
    }
    assert(rows.map(_.getLong(3)).distinct.length > 1, "all hashes equal — degenerate")
    // independent witness for one doc: recompute from the closed-form pixels
    val id = rows.head.getLong(0)
    val w: Int = (4 + id % 21).toInt
    val h: Int = (3 + id % 14).toInt
    def blk(v: Int, n: Int) = if (v < n / 3) 0 else if (v < 2 * n / 3) 1 else 2
    val bs = Array.fill(9)(0L); val bc = Array.fill(9)(0L)
    for (x <- 0 until w; y <- 0 until h) {
      val g = ((id + 3L * x + 5L * y) % 256 + (2L * id + 7L * x + y) % 256 +
        (5L * id + x + 11L * y) % 256) / 3
      val k = blk(y, h) * 3 + blk(x, w)
      bs(k) += g; bc(k) += 1
    }
    val (ts, tc) = (bs.sum, bc.sum)
    val want = (0 until 9).map(k => if (bs(k) * tc > ts * bc(k)) 1L << k else 0L).sum
    assert(rows.head.getLong(3) == want, "witness hash mismatch")
  }

  test("features: independent pixel-formula replay, clamp range, and topk agreement") {
    // independent witness: recompute the projection for a few ids
    // STRAIGHT from the closed-form pixel formula (no MediaCodec), so a
    // codec regression can't hide inside the featurizer
    def replay(id: Long): Array[Long] = {
      val w = (4 + id % 21).toInt
      val h = (3 + id % 14).toInt
      def blk(v: Int, n: Int) = if (v < n / 3) 0 else if (v < 2 * n / 3) 1 else 2
      val s = Array.fill(27)(0L)
      for (x <- 0 until w; y <- 0 until h) {
        val cell = blk(y, h) * 3 + blk(x, w)
        s(cell) += (id + 3L * x + 5L * y) % 256
        s(9 + cell) += (2L * id + 7L * x + y) % 256
        s(18 + cell) += (5L * id + x + 11L * y) % 256
      }
      Array.tabulate(16) { k =>
        val dt = (0 until 27).map(j =>
          ((1103515245L * (k * 27 + j) + 12345L) % 2001L - 1000L) * s(j)).sum
        val a = math.min(math.abs(dt) / 2097152L, 127L)
        if (dt >= 0) a else -a
      }
    }
    val feats = graft.operators.Pipeline.mmFeatures(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.sortBy(_.getInt(1)).map(_.getLong(2)) }
    assert(feats.nonEmpty)
    feats.foreach { case (_, v) =>
      assert(v.length == 16)
      assert(v.forall(f => f >= -127L && f <= 127L), "feature outside clamp range")
    }
    feats.keys.toSeq.sorted.take(5).foreach { id =>
      assert(feats(id).toSeq == replay(id).toSeq, s"featurizer mismatch for doc $id")
    }
    assert(feats.values.map(_.toSeq).toSet.size > 1, "all feature vectors equal — degenerate")
    // topk agreement: every emitted dot equals the dot of the emitted vectors
    val top = graft.operators.Pipeline.mmFeatTopk(spark, sf).collect()
    assert(top.nonEmpty)
    top.take(50).foreach { r =>
      val (q, d) = (r.getLong(0), r.getLong(2))
      val want = feats(q).zip(feats(d)).map { case (a, b) => a * b }.sum
      assert(r.getLong(3) == want, s"dot mismatch for ($q, $d)")
    }
  }

  test("thumbnail: nearest-neighbor samples are the decoded pixels at floor-mapped coords") {
    val rows = graft.operators.Pipeline.mmThumbnail(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      val w = (4 + id % 21).toInt
      val h = (3 + id % 14).toInt
      assert(r.getLong(1) == w && r.getLong(2) == h)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (tx <- 0 until 4; ty <- 0 until 3) {
        val x = tx * w / 4; val y = ty * h / 3
        sr += (id + 3L * x + 5L * y) % 256
        sg += (2L * id + 7L * x + y) % 256
        sb += (5L * id + x + 11L * y) % 256
      }
      assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((sr, sg, sb)),
        s"sampled sums drift for doc $id")
    }
  }

  test("sobel: kernel witness on a synthetic ramp and the per-doc replay") {
    // hand witness: a pure horizontal ramp gray(x,y)=x has gx=8, gy=0
    // at every interior pixel (Sobel column sums are 1+2+1 on each side,
    // two columns apart)
    val w = 5; val h = 4
    val ramp = Array.tabulate(h, w)((_, x) => x)
    for (y <- 1 until h - 1; x <- 1 until w - 1) {
      val gx = (ramp(y - 1)(x + 1) + 2 * ramp(y)(x + 1) + ramp(y + 1)(x + 1)) -
        (ramp(y - 1)(x - 1) + 2 * ramp(y)(x - 1) + ramp(y + 1)(x - 1))
      val gy = (ramp(y + 1)(x - 1) + 2 * ramp(y + 1)(x) + ramp(y + 1)(x + 1)) -
        (ramp(y - 1)(x - 1) + 2 * ramp(y - 1)(x) + ramp(y - 1)(x + 1))
      assert(gx == 8 && gy == 0, "kernel orientation drift")
    }
    // per-doc replay from the closed-form pixels, through the magnitude sums
    val rows = graft.operators.Pipeline.mmSobel(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      val dw = (4 + id % 21).toInt
      val dh = (3 + id % 14).toInt
      assert(r.getLong(1) == dw && r.getLong(2) == dh)
      assert(r.getLong(3) == (dw - 2).toLong * (dh - 2))
      def g(x: Int, y: Int): Long =
        ((id + 3L * x + 5L * y) % 256 + (2L * id + 7L * x + y) % 256 +
          (5L * id + x + 11L * y) % 256) / 3
      var (sgx, sgy, smag, nEdge) = (0L, 0L, 0L, 0L)
      for (y <- 1 until dh - 1; x <- 1 until dw - 1) {
        val gx = (g(x + 1, y - 1) + 2 * g(x + 1, y) + g(x + 1, y + 1)) -
          (g(x - 1, y - 1) + 2 * g(x - 1, y) + g(x - 1, y + 1))
        val gy = (g(x - 1, y + 1) + 2 * g(x, y + 1) + g(x + 1, y + 1)) -
          (g(x - 1, y - 1) + 2 * g(x, y - 1) + g(x + 1, y - 1))
        sgx += math.abs(gx); sgy += math.abs(gy)
        val m = math.abs(gx) + math.abs(gy)
        smag += m; if (m >= 256) nEdge += 1
      }
      assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
        ((sgx, sgy, smag, nEdge)), s"sobel stats drift for doc $id")
    }
    assert(rows.map(_.getLong(7)).sum > 0, "no edges anywhere — threshold vacuous")
  }

  test("hist-eq: transfer function endpoints and the exact replay") {
    val rows = graft.operators.Pipeline.mmHistEq(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      val dw = (4 + id % 21).toInt
      val dh = (3 + id % 14).toInt
      val hist = Array.fill(256)(0L)
      for (y <- 0 until dh; x <- 0 until dw)
        hist((((id + 3L * x + 5L * y) % 256 + (2L * id + 7L * x + y) % 256 +
          (5L * id + x + 11L * y) % 256) / 3).toInt) += 1
      val n = dw.toLong * dh
      val occupied = hist.zipWithIndex.filter(_._1 > 0)
      val cdfMin = occupied.head._1
      assert(r.getLong(3) == occupied.length.toLong, s"level count drift: $r")
      assert(r.getLong(4) == occupied.head._2.toLong &&
        r.getLong(5) == occupied.last._2.toLong, s"gray range drift: $r")
      var cdf = 0L; var sumEq = 0L
      for (v <- 0 until 256) {
        cdf += hist(v)
        if (hist(v) > 0 && n > cdfMin)
          sumEq += ((cdf - cdfMin) * 255L / (n - cdfMin)) * hist(v)
      }
      assert(r.getLong(6) == sumEq, s"equalized sum drift for doc $id")
      // endpoints: the darkest occupied level maps to 0, the brightest to
      // 255 — the defining property of the transfer function
      if (n > cdfMin) {
        assert((cdfMin - cdfMin) * 255L / (n - cdfMin) == 0L)
        assert((n - cdfMin) * 255L / (n - cdfMin) == 255L)
      }
    }
  }

  test("indexed PNG: round-trip across filters, odd-width pad nibble, palette sums") {
    import graft.multimodal.MediaCodec
    val pal = Array.tabulate(16)(j => (j << 16) | ((15 - j) << 8) | (j * 17))
    // odd width exercises the pad nibble; h=6 cycles filters 0..4 and repeats 0
    val w = 5; val h = 6
    def ix(x: Int, y: Int) = (x + 2 * y) % 16
    val m = MediaCodec.decodePngIndexed(MediaCodec.encodePngIndexed(w, h, pal, ix))
    assert(m.width == w && m.height == h && m.nColors == 16)
    var (si, sr, sg, sb) = (0L, 0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      val i = ix(x, y)
      si += i; sr += (pal(i) >> 16) & 0xff; sg += (pal(i) >> 8) & 0xff; sb += pal(i) & 0xff
    }
    assert((m.sumIdx, m.sumR, m.sumG, m.sumB) == ((si, sr, sg, sb)),
      "indexed round-trip sums drift")
    // a single-pixel image: the degenerate stride-1 edge of every filter
    for (ft <- 0 to 4) {
      val one = MediaCodec.decodePngIndexed(
        MediaCodec.encodePngIndexed(1, 1, pal, (_, _) => 7, _ => ft))
      assert(one.sumIdx == 7L, s"1x1 filter-$ft round-trip failed")
    }
    // the gate plan agrees with a driver replay on real docs
    val rows = graft.operators.Pipeline.mmDecodePngIdx(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.take(30).foreach { r =>
      val id = r.getLong(0)
      val dw = (3 + id % 13).toInt
      val dh = (2 + id % 9).toInt
      assert(r.getLong(1) == dw && r.getLong(2) == dh && r.getLong(3) == 16)
      var (wi, wr, wg, wb) = (0L, 0L, 0L, 0L)
      for (y <- 0 until dh; x <- 0 until dw) {
        val i = ((id + 3L * x + 5L * y) % 16).toInt
        wi += i
        wr += (id + 17L * i) % 256; wg += (2L * id + 29L * i) % 256
        wb += (3L * id + 41L * i) % 256
      }
      assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
        ((wi, wr, wg, wb)), s"indexed PNG stats drift for doc $id")
    }
  }

  test("audio stats: energy/ZCR/peak equal the closed-form sample replay") {
    val rows = graft.operators.Pipeline.mmAudioStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      val n = (50 + id % 300).toInt
      assert(r.getLong(1) == 8000 + (id % 3) * 4000 && r.getLong(2) == n.toLong)
      def v(i: Int): Long = (id * 31 + i * 17L) % 4001L - 2000L
      var energy = 0L; var zc = 0L; var peak = 0L
      for (i <- 0 until n) {
        energy += v(i) * v(i)
        if (i > 0 && v(i - 1) * v(i) < 0) zc += 1
        peak = math.max(peak, math.abs(v(i)))
      }
      assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((energy, zc, peak)),
        s"audio stats drift for doc $id")
    }
    // the signal must actually oscillate or ZCR is vacuous
    assert(rows.map(_.getLong(4)).sum > 0, "no zero crossings anywhere")
  }

  test("QOI round-trip: all six ops appear in the gate's streams and decode inverts encode") {
    // count chunk tags by walking the encoded stream (spec chunk framing)
    def census(b: Array[Byte]): Map[String, Int] = {
      var p = 14
      val c = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
      while (p < b.length - 8) {
        val tag = b(p) & 0xff
        if (tag == 0xfe) { c("rgb") += 1; p += 4 }
        else if (tag == 0xff) { c("rgba") += 1; p += 5 }
        else (tag >> 6) match {
          case 0 => c("index") += 1; p += 1
          case 1 => c("diff") += 1; p += 1
          case 2 => c("luma") += 1; p += 2
          case _ => c("run") += 1; p += 1
        }
      }
      c.toMap
    }
    val total = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    for (id <- 0L until 40L) {
      val w = (1 + id % 17).toInt
      val h = (1 + id % 10).toInt
      val enc = MediaCodec.encodeQoi(w, h, Multimodal.qoiPixel(id))
      val m = MediaCodec.decodeQoi(enc)
      assert(m.width == w && m.height == h)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val p = Multimodal.qoiPixel(id)(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      }
      assert((m.sumR, m.sumG, m.sumB) == ((sr, sg, sb)), s"channel sums at id=$id")
      census(enc).foreach { case (k, n) => total(k) += n }
    }
    Seq("rgb", "index", "diff", "luma", "run").foreach(op =>
      assert(total(op) > 0, s"op $op never exercised — gate weaker than claimed"))
  }

  test("QOI decoder matches hand-assembled byte streams per the public spec") {
    def header(w: Int, h: Int): Array[Byte] =
      Array[Byte]('q', 'o', 'i', 'f',
        (w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte, w.toByte,
        (h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte, h.toByte,
        3, 0)
    val end = Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)
    // 2x2: RGB(10,20,30); RUN(1); DIFF(+1,0,-1); INDEX(hash(10,20,30)=9)
    val v1 = header(2, 2) ++ Array[Byte](0xfe.toByte, 10, 20, 30,
      0xc0.toByte, 0x79.toByte, 0x09.toByte) ++ end
    val m1 = MediaCodec.decodeQoi(v1)
    assert((m1.width, m1.height) == ((2, 2)))
    assert((m1.sumR, m1.sumG, m1.sumB) == ((10L + 10 + 11 + 10, 80L, 30L + 30 + 29 + 30)),
      s"2x2 witness: $m1")
    // 1x1: LUMA dg=+10, dr-dg=-2, db-dg=+3 from the (0,0,0) start pixel
    val v2 = header(1, 1) ++ Array[Byte](0xaa.toByte, 0x6b.toByte) ++ end
    val m2 = MediaCodec.decodeQoi(v2)
    assert((m2.sumR, m2.sumG, m2.sumB) == ((8L, 10L, 13L)), s"luma witness: $m2")
    // 1x2: RGBA(1,2,3,a=4) then INDEX(hash(1,2,3,4)=14) — the alpha op
    // participates in the index hash even though channel sums ignore it
    val v3 = header(1, 2) ++ Array[Byte](0xff.toByte, 1, 2, 3, 4, 0x0e.toByte) ++ end
    val m3 = MediaCodec.decodeQoi(v3)
    assert((m3.sumR, m3.sumG, m3.sumB) == ((2L, 4L, 6L)), s"rgba witness: $m3")
    // corrupted end marker must throw, not read garbage
    val bad = v1.clone(); bad(bad.length - 1) = 0
    intercept[IllegalArgumentException](MediaCodec.decodeQoi(bad))
  }

  test("TGA round-trip: RLE + raw packets, bottom-up origin pinned by the top-left pixel") {
    // constant row → one RLE packet; alternating row → raw packets
    val enc = MediaCodec.encodeTga(4, 2, (x, y) =>
      if (y == 0) 0x112233 else (if (x % 2 == 0) 0x445566 else 0x778899))
    val m = MediaCodec.decodeTga(enc)
    assert(m.width == 4 && m.height == 2)
    // top-left = (0,0) = row y=0 which is stored LAST in a bottom-up file
    assert((m.topLeftR, m.topLeftG, m.topLeftB) == ((0x11, 0x22, 0x33)),
      "bottom-up row order not honored")
    assert(m.sumR == 4L * 0x11 + 2 * 0x44 + 2 * 0x77)
    assert(m.sumB == 4L * 0x33 + 2 * 0x66 + 2 * 0x99)
    // hand-assembled stream: 18-byte header + one RLE packet (2x red)
    val hand = new Array[Byte](18 + 4)
    hand(2) = 10; hand(12) = 2; hand(14) = 1; hand(16) = 24
    hand(18) = 0x81.toByte // RLE, 2 pixels
    hand(19) = 0x00; hand(20) = 0x00; hand(21) = 0xff.toByte // B,G,R = red
    val hm = MediaCodec.decodeTga(hand)
    assert(hm.width == 2 && hm.height == 1 && hm.sumR == 510L && hm.sumG == 0L)
    // a packet crossing the scanline must throw, not wrap silently
    val cross = hand.clone(); cross(18) = 0x82.toByte // 3 pixels on a 2-wide row
    intercept[IllegalArgumentException](MediaCodec.decodeTga(cross))
  }

  test("mu-law companding matches the G.711 spec on published witness values") {
    // 0 encodes to 0xFF (all-ones complement), decodes back to 0
    assert(MediaCodec.mulawEncode(0) == 0xff)
    assert(MediaCodec.mulawDecode(0xff) == 0)
    // quantization error is bounded by half the segment step everywhere
    for (s <- Seq(-32768, -32635, -12345, -100, -1, 0, 1, 33, 100, 8191, 32635, 32767)) {
      val dec = MediaCodec.mulawDecode(MediaCodec.mulawEncode(s))
      val clipped = math.max(-32635, math.min(32635, s))
      val step = {
        val m132 = math.abs(clipped) + 132
        val e = 63 - java.lang.Long.numberOfLeadingZeros(m132 >> 7).toInt
        8 << e
      }
      assert(math.abs(dec - clipped) <= step / 2 + 4,
        s"companding error for $s: decoded $dec (step $step)")
      assert(math.signum(dec) == math.signum(clipped) || dec == 0)
    }
    // monotone: larger magnitude never decodes smaller
    val decs = (0 to 32635 by 97).map(s => MediaCodec.mulawDecode(MediaCodec.mulawEncode(s)))
    assert(decs == decs.sorted, "mu-law expand not monotone")
    // WAV plumbing: fmt code 7, 8-bit, chunk walk
    val wav = MediaCodec.encodeWavMulaw(3, 8000, Seq(0, 1000, -1000))
    val wm = MediaCodec.decodeWavMulaw(wav)
    assert(wm.sampleRate == 8000 && wm.nSamples == 3L)
    val d1000 = MediaCodec.mulawDecode(MediaCodec.mulawEncode(1000)).toLong
    assert(wm.sumAbs == 2 * d1000 && wm.maxAbs == d1000)
  }

  test("IMA ADPCM: state machine matches the spec tables, odd nibble counts, roundtrip error decays") {
    import MediaCodec._
    // single-step witnesses against the published tables: from (pred=0,
    // idx=0, step=7): sample 100 → diff 100 ≥ 7+3+1 ⇒ code 7,
    // dq = 7 + 3 + 1 + 0 (7>>3=0) = 11... recompute: dq = step>>3 (0)
    // + step (7) + step>>1 (3) + step>>2 (1) = 11; index += 8 → 8
    assert(adpcmEncodeStep(100, 0, 0) == ((7, 11, 8)))
    assert(adpcmDecodeStep(7, 0, 0) == ((11, 8)))
    // negative branch: sample -100 → sign bit set, same magnitude path
    assert(adpcmEncodeStep(-100, 0, 0) == ((15, -11, 8)))
    // index clamps at both ends
    assert(adpcmDecodeStep(0, 0, 0)._2 == 0)   // -1 clamped to 0
    assert(adpcmDecodeStep(7, 0, 88)._2 == 88) // +8 clamped to 88
    // WAV roundtrip with an ODD nibble count (n = 4 ⇒ 3 nibbles) and
    // reconstruction tracking: decode equals the encoder's own state
    for (n <- Seq(2, 4, 5, 33)) {
      val samples = (0 until n).map(i => ((i * 997) % 4001) - 2000)
      val wav = encodeWavAdpcm(n, 8000, samples)
      val m = decodeWavAdpcm(wav)
      assert(m.nSamples == n.toLong && m.sampleRate == 8000)
      var pred = samples.head
      var idx = 0
      var sum = math.abs(pred).toLong
      var mx = sum
      for (i <- 1 until n) {
        val (_, p, x) = adpcmEncodeStep(samples(i), pred, idx)
        pred = p; idx = x
        sum += math.abs(p); mx = math.max(mx, math.abs(p))
      }
      assert(m.sumAbs == sum && m.maxAbs == mx && m.finalIndex == idx,
        s"decode diverges from the encoder's tracked reconstruction at n=$n")
    }
    // adaptation works: on a constant signal the reconstruction error
    // decays to within the smallest step after a few samples
    val const = Array.fill(32)(5000)
    var p = const(0); var ix = 0
    // encode a LEADING jump then the constant tail
    p = 0; ix = 0
    val errs = (0 until 31).map { _ =>
      val (_, np, nx) = adpcmEncodeStep(5000, p, ix)
      p = np; ix = nx
      math.abs(5000 - p)
    }
    assert(errs.takeRight(5).max <= errs.take(5).min,
      "adaptive step never converged toward the target")
  }

  test("concatenated-BMP frame walk decodes every frame and rejects torn payloads") {
    // three frames with distinct content AND distinct padding classes
    val frames = Seq((4, 2), (5, 3), (7, 1)).zipWithIndex.map { case ((w, h), i) =>
      MediaCodec.encodeBmp(w, h, (x, y) => ((i * 40 + x) << 16) | (y << 8) | (i & 0xff))
    }
    val payload = frames.reduce(_ ++ _)
    val metas = MediaCodec.decodeBmpFrames(payload)
    assert(metas == frames.map(MediaCodec.decodeBmp),
      "frame walk diverges from decoding each frame alone")
    // a truncated tail must throw, not silently drop the frame
    intercept[IllegalArgumentException](
      MediaCodec.decodeBmpFrames(payload.dropRight(1)))
    // garbage at a frame boundary must throw, not resynchronize
    intercept[IllegalArgumentException](
      MediaCodec.decodeBmpFrames(frames.head ++ Array[Byte](0, 1, 2)))
  }

  test("PPM parser skips comments and demands exact geometry") {
    val enc = MediaCodec.encodePpm(2, 2, (x, y) => (x << 16) | (y << 8) | 7)
    val m = MediaCodec.decodePpm(enc)
    assert(m.width == 2 && m.height == 2 && m.maxval == 255)
    assert(m.sumR == 2L && m.sumG == 2L && m.sumB == 28L)
    // hand-written header variants: extra comments + odd whitespace
    val hand = ("P6\n#c1\n# another comment\n 2\t1\n255\n".getBytes("US-ASCII")
      ++ Array[Byte](1, 2, 3, 4, 5, 6))
    val hm = MediaCodec.decodePpm(hand)
    assert(hm.width == 2 && hm.height == 1)
    assert((hm.sumR, hm.sumG, hm.sumB) == ((5L, 7L, 9L)))
    // truncated raster must throw
    intercept[IllegalArgumentException](MediaCodec.decodePpm(hand.dropRight(1)))
  }
}
