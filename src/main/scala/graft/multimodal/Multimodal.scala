package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decoded-media metadata row (SURVEY §2.6). */
case class MediaMeta(doc_id: Long, byte_len: Long, fp: Long,
                     width: Long, height: Long, n_frames: Long)

/** Multimodal-column plumbing (SURVEY §2.6): media as opaque `binary`
  * payloads + typed metadata, decoded per-partition.
  *
  * The decode slot holds REAL codecs for two formats ([[MediaCodec]]:
  * 24-bit BMP and PCM16 WAV, implemented from the public specs —
  * VERDICT r5 item 4), sniffed by magic bytes, with the deterministic
  * byte-fold hash as the fallback for payloads in no recognized format
  * (such as the synthetic corpus's text bytes — which keeps the
  * original mm_* oracles exact). `mm_decode_bmp` / `mm_decode_wav` gate
  * the real decoders end-to-end on genuine encoded payloads.
  */
object Multimodal {

  /** Fallback decoder for unrecognized payloads: byte-fold hash →
    * deterministic pseudo (width, height, frames). Real formats are
    * sniffed in [[decodeMeta]] before this runs.
    */
  def decodeBytes(bytes: Array[Byte]): (Long, Long, Long, Long) = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc = (acc * 31 + (bytes(i) & 0xffL)) % 1000000007L; i += 1 }
    (acc, 1 + acc % 640, 1 + acc % 480, 1 + acc % 16)
  }

  /** Resize metadata to fit a square box, aspect preserved — integer
    * arithmetic only (oracle-exact): new_d = (d · box) div max(w, h).
    */
  def resizePlan(meta: DataFrame, box: Int = 224): DataFrame =
    meta.select(col("doc_id"), col("width"), col("height"),
      expr(s"(width * $box) div greatest(width, height)").as("new_w"),
      expr(s"(height * $box) div greatest(width, height)").as("new_h"))
      .orderBy(col("doc_id"))

  /** Frame sampling: every ceil(n/4)-th frame index (≤ 4 samples).
    * The sampled indices are emitted as a CSV string, not an array: the
    * driver's comparator can't hash array cells, and a canonical scalar
    * rendering keeps the query oracle-gateable (VERDICT r1 #1).
    */
  def frameSamplePlan(meta: DataFrame): DataFrame =
    meta.select(col("doc_id"), col("n_frames"),
      array_join(
        expr("transform(sequence(0L, n_frames - 1, (n_frames + 3) div 4), x -> CAST(x AS STRING))"),
        ",").as("frame_idx_csv"))
      .orderBy(col("doc_id"))

  /** Audio framing plumbing: treat the payload as PCM samples and
    * compute the frame grid for a window/hop pair (the 25 ms / 10 ms @
    * 16 kHz default → 400/160 samples) — frame count, last frame start,
    * and the tail samples a final partial frame would drop. Pure integer
    * arithmetic on the decoded metadata; a real feature frontend (fbank,
    * MFCC) plugs into exactly this grid.
    */
  def audioWindowPlan(meta: DataFrame, window: Int = 400, hop: Int = 160): DataFrame =
    meta.select(col("doc_id"), col("byte_len").as("n_samples"),
      expr(s"CASE WHEN byte_len >= $window THEN 1 + (byte_len - $window) div $hop" +
        " ELSE CAST(0 AS BIGINT) END").as("n_frames_audio"))
      .withColumn("last_start",
        expr(s"CASE WHEN n_frames_audio > 0 THEN (n_frames_audio - 1) * $hop" +
          " ELSE CAST(0 AS BIGINT) END"))
      .withColumn("tail_samples",
        expr(s"CASE WHEN n_frames_audio > 0 THEN n_samples - (last_start + $window)" +
          " ELSE n_samples END"))
      .orderBy(col("doc_id"))

  /** Feature extraction over the REAL decoded BMP pixels (r11, VERDICT
    * r10 #5 — replaces the fingerprint stub): a pinned-weights random
    * projection of the image's 27 per-channel 3×3 block sums (the
    * mm_phash grid, per channel) into a 16-dim integer feature vector,
    * clamped to ±127 — the ann_sq integer-staging discipline applied to
    * an image featurizer. Weights are a pinned LCG
    * (W(k,j) = (1103515245·(27k+j) + 12345) mod 2001 − 1000, public
    * glibc constants), so both engines recompute them closed-form;
    * |dot| ≤ 27·1000·maxBlockSum < 2³⁰, the ÷2²¹ downscale lands the
    * useful range inside ±127, and the division is SIGN-SPLIT
    * (sign·(|dot| div 2²¹)) because Spark's div truncates while
    * DuckDB's // floors. One narrow encode→decode→project map pass per
    * payload — no shuffle; at 100 TB the projection rides the decode
    * scan for free.
    */
  private[graft] val FeatDim = 16
  private[graft] val FeatScale = 2097152L // 2^21

  private[graft] def featWeight(k: Int, j: Int): Long =
    (1103515245L * (k * 27 + j) + 12345L) % 2001L - 1000L

  /** The featurizer for one synthetic payload id, via the real codec. */
  private[graft] def featVec(id: Long): Array[Long] = {
    val w = (4 + id % 21).toInt
    val h = (3 + id % 14).toInt
    val payload = MediaCodec.encodeBmp(w, h, (x, y) => {
      val r = ((id + 3L * x + 5L * y) % 256).toInt
      val g = ((2L * id + 7L * x + y) % 256).toInt
      val b = ((5L * id + x + 11L * y) % 256).toInt
      (r << 16) | (g << 8) | b
    })
    val s = new Array[Long](27)
    MediaCodec.foreachBmpPixel(payload) { (x, y, r, g, b) =>
      val bx = if (x < w / 3) 0 else if (x < 2 * w / 3) 1 else 2
      val by = if (y < h / 3) 0 else if (y < 2 * h / 3) 1 else 2
      val cell = by * 3 + bx
      s(cell) += r; s(9 + cell) += g; s(18 + cell) += b
    }
    Array.tabulate(FeatDim) { k =>
      var dt = 0L
      var j = 0
      while (j < 27) { dt += featWeight(k, j) * s(j); j += 1 }
      val a = math.min(math.abs(dt) / FeatScale, 127L)
      if (dt >= 0) a else -a
    }
  }

  /** (doc_id, fv array<bigint>[16]) — the featurized corpus. */
  private[graft] def featVecsPlan(docs: DataFrame, fan: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // fan: encode+decode+project per payload is CPU-dense; the top-k
    // consumer (featTopkPlan) asks for the fanOut so the local
    // single-split scan doesn't serialize its heavy join side, while
    // the plain per-cell face (featuresPlan) is cheaper without the
    // exchange at local row counts (identity at scale either way)
    val src = if (fan) graft.Tables.fanOut(docs) else docs
    src.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, featVec(id))))
      .toDF("doc_id", "fv")
  }

  /** Gated face: one row per (doc_id, k) feature cell. */
  def featuresPlan(docs: DataFrame): DataFrame =
    featVecsPlan(docs)
      .select(col("doc_id"), posexplode(col("fv")).as(Seq("k", "feature")))
      .select(col("doc_id"), col("k").cast("int").as("k"), col("feature"))
      .orderBy(col("doc_id"), col("k"))

  /** decode→featurize→brute-top-k, chained end to end (the VERDICT r10
    * #5 integration): per query payload (doc_id % 97 = 0), the top-10
    * corpus payloads by exact integer feature dot product, ties by id.
    * The query side broadcasts; the corpus featurizes in the same
    * narrow map pass — one scan, no shuffle before the per-query top-k.
    */
  def featTopkPlan(docs: DataFrame, k: Int = 10): DataFrame = {
    val fv = featVecsPlan(docs, fan = true)
    val q = fv.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("q_id"), col("fv").as("qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("fdot").desc, col("doc_id"))
    fv.join(broadcast(q), col("doc_id") =!= col("q_id"))
      .select(col("q_id"), col("doc_id"),
        expr("aggregate(zip_with(qv, fv, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
          .as("fdot"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("doc_id"), col("fdot"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** Video scene segmentation over REAL decoded pixels (round 15,
    * VERDICT r14 #3 — the last stub-statistics entry retired): each
    * doc synthesizes a genuine multi-frame payload — n_frames COMPLETE
    * 24-bit BMPs concatenated, the naive video container — and every
    * frame runs the real [[MediaCodec.decodeBmpFrames]] walk (size-
    * field cursor, then per frame the full header / bottom-up rows /
    * 4-byte padding decode). Per-frame brightness is the BT.601
    * integer MEAN over the DECODED channel sums:
    * luma = (299·ΣR + 587·ΣG + 114·ΣB) div (1000·w·h) ∈ [0, 255].
    * Cut detection is unchanged — frame rows → lag over frame order →
    * |Δluma| > tau → per-payload aggregate (frame 0 always opens a
    * scene). Frame pixels are closed-form in (doc_id, frame, x, y), so
    * the oracle replays the identical sums in SQL: any walk or decode
    * bug (frame offsets, padding, channel order) diverges. The decode
    * is one narrow mapPartitions pass emitting frame rows — at scale
    * the shuffle is per-FRAME luma rows (tiny), never pixels.
    */
  def sceneDetectPlan(docs: DataFrame, tau: Int = 48): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val frames = docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val w = (3 + id % 6).toInt
          val h = (2 + id % 5).toInt
          val n = (2 + id % 12).toInt
          val payload = (0 until n).map { i =>
            MediaCodec.encodeBmp(w, h, (x, y) => {
              val r = ((id + 17L * i * i + 3L * x + 5L * y) % 256).toInt
              val g = ((2L * id + 31L * i * i + 7L * x + y) % 256).toInt
              val b = ((3L * id + 47L * i * i + x + 11L * y) % 256).toInt
              (r << 16) | (g << 8) | b
            })
          }.reduce(_ ++ _)
          val metas = MediaCodec.decodeBmpFrames(payload)
          metas.iterator.zipWithIndex.map { case (m, i) =>
            val luma = (299L * m.sumR + 587L * m.sumG + 114L * m.sumB) /
              (1000L * m.width * m.height)
            (id, metas.size.toLong, i.toLong, luma)
          }
        }
      }.toDF("doc_id", "n_frames", "idx", "luma")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("idx"))
    frames
      .withColumn("prev", lag(col("luma"), 1).over(w))
      .withColumn("cut",
        when(col("prev").isNull || abs(col("luma") - col("prev")) > tau, 1L).otherwise(0L))
      .groupBy(col("doc_id"), col("n_frames"))
      .agg(sum(col("cut")).as("n_scenes"),
        max(when(col("cut") === 1L, col("idx"))).as("last_cut"),
        sum(when(col("cut") === 1L, col("idx")).otherwise(0L)).as("cut_checksum"))
      .orderBy(col("doc_id"))
  }

  /** ViT-style patchify plumbing: the ceil-grid patch counts for a
    * `patch`×`patch` tiling, the +1 CLS token, and the sequence-budget
    * truncation a fixed-context vision encoder applies — the numbers a
    * multimodal training pipeline needs to budget image tokens. Pure
    * integer metadata math (pixel work lives in the decode stub's slot).
    */
  def patchifyPlan(meta: DataFrame, patch: Int = 16, maxSeq: Long = 257L): DataFrame =
    meta.select(col("doc_id"), col("width"), col("height"),
      expr(s"(width + ${patch - 1}) div $patch").as("pw"),
      expr(s"(height + ${patch - 1}) div $patch").as("ph"))
      .withColumn("n_patches", col("pw") * col("ph"))
      .withColumn("seq_len", least(col("n_patches") + lit(1L), lit(maxSeq)))
      .withColumn("n_dropped", greatest(col("n_patches") + lit(1L) - maxSeq, lit(0L)))
      .orderBy(col("doc_id"))

  /** Binary payload → typed metadata via mapPartitions (the Scala analog
    * of `mapInPandas` batch decode: one iterator pass per partition, no
    * per-row task overhead, codegen-friendly typed output). Unordered:
    * decode is a narrow map pass — consumers that need a total order
    * sort their own (usually much narrower) output, rather than every
    * downstream plan paying a corpus-wide sort here.
    */
  def decodeMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bin: Dataset[(Long, Array[Byte])] = docs
      .select(col("doc_id").cast("long"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    bin.mapPartitions { it =>
      it.map { case (id, bytes) =>
        if (MediaCodec.isBmp(bytes)) {
          val m = MediaCodec.decodeBmp(bytes)
          val fp = ((m.sumR * 31 + m.sumG) * 31 + m.sumB) % 1000000007L
          MediaMeta(id, bytes.length.toLong, fp, m.width.toLong, m.height.toLong, 1L)
        } else if (MediaCodec.isQoi(bytes)) {
          val m = MediaCodec.decodeQoi(bytes)
          val fp = ((m.sumR * 31 + m.sumG) * 31 + m.sumB) % 1000000007L
          MediaMeta(id, bytes.length.toLong, fp, m.width.toLong, m.height.toLong, 1L)
        } else if (MediaCodec.isPng(bytes)) {
          val m = MediaCodec.decodePng(bytes)
          val fp = ((m.sumR * 31 + m.sumG) * 31 + m.sumB) % 1000000007L
          MediaMeta(id, bytes.length.toLong, fp, m.width.toLong, m.height.toLong, 1L)
        } else if (MediaCodec.isGif(bytes)) {
          val m = MediaCodec.decodeGif(bytes)
          val fp = ((m.sumR * 31 + m.sumG) * 31 + m.sumB) % 1000000007L
          MediaMeta(id, bytes.length.toLong, fp, m.width.toLong, m.height.toLong, 1L)
        } else if (MediaCodec.isWav(bytes)) {
          val m = MediaCodec.decodeWav(bytes)
          val fp = (m.sumAbs * 31 + m.maxAbs) % 1000000007L
          MediaMeta(id, bytes.length.toLong, fp, 0L, 0L, m.nSamples)
        } else {
          val (fp, w, h, f) = decodeBytes(bytes)
          MediaMeta(id, bytes.length.toLong, fp, w, h, f)
        }
      }
    }.toDF()
  }

  /** Real-decoder gate, image path: synthesize a genuine 24-bit BMP per
    * doc (dimensions and pixels pure functions of doc_id — the encode
    * stands in for media bytes arriving from storage), then run the REAL
    * [[MediaCodec.decodeBmp]] and emit geometry + exact per-channel
    * sums. The DuckDB oracle recomputes the sums closed-form from
    * doc_id, so a decoder bug anywhere — header offsets, bottom-up row
    * order, the 4-byte row padding (width varies mod 4 by construction)
    * — breaks the hash. encode+decode run in one mapPartitions pass
    * (narrow, no shuffle; the real-cluster shape for payload columns).
    */
  def decodeBmpPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (4 + id % 21).toInt
        val h = (3 + id % 14).toInt
        val payload = MediaCodec.encodeBmp(w, h, (x, y) => {
          val r = ((id + 3L * x + 5L * y) % 256).toInt
          val g = ((2L * id + 7L * x + y) % 256).toInt
          val b = ((5L * id + x + 11L * y) % 256).toInt
          (r << 16) | (g << 8) | b
        })
        val m = MediaCodec.decodeBmp(payload)
        (id, m.width.toLong, m.height.toLong, m.sumR, m.sumG, m.sumB)
      }
    }.toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
      .orderBy(col("doc_id"))
  }

  /** Perceptual average-hash over the REAL BMP decode path (public
    * aHash scheme, integer-exact form): gray = (r+g+b) div 3 per pixel
    * from [[MediaCodec.foreachBmpPixel]], a 3×3 block grid (block i
    * covers x ∈ [i·w div 3, (i+1)·w div 3) — non-empty because w ≥ 4,
    * h ≥ 3), bit k = by·3+bx set iff blockSum·nPix > totalSum·blockPix
    * — the mean comparison CROSS-MULTIPLIED so there is no division
    * and no float anywhere, which is what lets a perceptual hash gate
    * hash-exact. Same narrow one-pass encode+decode mapPartitions
    * shape as the other decoder gates.
    */
  def phashPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (4 + id % 21).toInt
        val h = (3 + id % 14).toInt
        val payload = MediaCodec.encodeBmp(w, h, (x, y) => {
          val r = ((id + 3L * x + 5L * y) % 256).toInt
          val g = ((2L * id + 7L * x + y) % 256).toInt
          val b = ((5L * id + x + 11L * y) % 256).toInt
          (r << 16) | (g << 8) | b
        })
        val bsum = Array.fill(9)(0L)
        val bcnt = Array.fill(9)(0L)
        def blk(v: Int, n: Int): Int =
          if (v < n / 3) 0 else if (v < 2 * n / 3) 1 else 2
        val (dw, dh) = MediaCodec.foreachBmpPixel(payload) { (x, y, r, g, b) =>
          val k = blk(y, h) * 3 + blk(x, w)
          bsum(k) += (r + g + b) / 3
          bcnt(k) += 1
        }
        val tsum = bsum.sum
        val tcnt = bcnt.sum
        var hash = 0L; var ones = 0L
        var k = 0
        while (k < 9) {
          if (bsum(k) * tcnt > tsum * bcnt(k)) { hash |= 1L << k; ones += 1 }
          k += 1
        }
        (id, dw.toLong, dh.toLong, hash, ones)
      }
    }.toDF("doc_id", "width", "height", "phash", "n_ones")
      .orderBy(col("doc_id"))
  }

  /** Sobel edge statistics over the REAL BMP decode path: gray =
    * (r+g+b) div 3 per decoded pixel, the standard 3×3 Sobel kernels
    * at every interior pixel (w ≥ 4, h ≥ 3 ⇒ interior non-empty), L1
    * gradient magnitude |gx|+|gy| (sqrt-free, so the edge detector
    * gates hash-exact), and an edge count at the fixed threshold 256.
    * The oracle recomputes every tap closed-form from the pixel
    * formula, so a bug anywhere in the decode OR the convolution
    * breaks the hash. Same narrow one-pass encode+decode
    * mapPartitions shape as the other decoder gates — per-image state
    * is one w×h gray grid, embarrassingly parallel, no shuffle.
    */
  /** Integral image (summed-area table) over the synthetic BMP's gray
    * plane — the O(1)-region-sum primitive behind box filters, Haar
    * features, and adaptive thresholding: per doc the SAT corner
    * (= total mass), the midpoint SAT value, one interior block sum
    * recovered by the 4-lookup identity (pinned against the direct sum
    * by construction), and the full-table checksum
    * Σ gray(x,y)·(w−x)·(h−y) — the closed form the oracle recomputes
    * without materializing the DP. Per-row kernel, nothing but the
    * 8-long summary crosses a shuffle.
    */
  def integralPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val payload = MediaCodec.encodeBmp((4 + id % 21).toInt, (3 + id % 14).toInt,
          (x, y) => {
            val r = ((id + 3L * x + 5L * y) % 256).toInt
            val g = ((2L * id + 7L * x + y) % 256).toInt
            val b = ((5L * id + x + 11L * y) % 256).toInt
            (r << 16) | (g << 8) | b
          })
        val probe = Array.ofDim[Int](16, 24)
        val (w, h) = MediaCodec.foreachBmpPixel(payload) { (x, y, r, g, b) =>
          probe(y)(x) = (r + g + b) / 3
        }
        // summed-area DP: sat(x,y) = g + sat(x−1,y) + sat(x,y−1) − sat(x−1,y−1)
        val sat = Array.ofDim[Long](h, w)
        var checksum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val up = if (y > 0) sat(y - 1)(x) else 0L
            val left = if (x > 0) sat(y)(x - 1) else 0L
            val diag = if (y > 0 && x > 0) sat(y - 1)(x - 1) else 0L
            sat(y)(x) = probe(y)(x) + up + left - diag
            checksum += sat(y)(x)
            x += 1
          }
          y += 1
        }
        def look(x: Int, y: Int): Long =
          if (x < 0 || y < 0) 0L else sat(y)(x)
        // block [w/4, 3w/4) × [h/4, 3h/4) via the 4-lookup identity
        val (x0, x1) = (w / 4, 3 * w / 4 - 1)
        val (y0, y1) = (h / 4, 3 * h / 4 - 1)
        val block =
          if (x1 < x0 || y1 < y0) 0L
          else look(x1, y1) - look(x0 - 1, y1) - look(x1, y0 - 1) + look(x0 - 1, y0 - 1)
        (id, w.toLong, h.toLong, sat(h - 1)(w - 1), sat(h / 2)(w / 2), block, checksum)
      }
    }.toDF("doc_id", "width", "height", "total", "mid_sat", "block_sum", "sat_checksum")
      .orderBy(col("doc_id"))
  }

  /** 3×3 box blur (floor mean of the 9-neighborhood) over the synthetic
    * BMP's gray plane — the denoising kernel: per doc the interior
    * count, blurred mass, total absolute change vs the center pixel
    * (how much the filter smooths), and the blurred max. Same per-row
    * kernel economics as [[sobelPlan]].
    */
  def boxBlurPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val payload = MediaCodec.encodeBmp((4 + id % 21).toInt, (3 + id % 14).toInt,
          (x, y) => {
            val r = ((id + 3L * x + 5L * y) % 256).toInt
            val g = ((2L * id + 7L * x + y) % 256).toInt
            val b = ((5L * id + x + 11L * y) % 256).toInt
            (r << 16) | (g << 8) | b
          })
        val gray = Array.ofDim[Int](16, 24)
        val (w, h) = MediaCodec.foreachBmpPixel(payload) { (x, y, r, g, b) =>
          gray(y)(x) = (r + g + b) / 3
        }
        var sBlur = 0L; var sDelta = 0L; var mx = 0L
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            var s = 0
            var dy = -1
            while (dy <= 1) {
              var dx = -1
              while (dx <= 1) { s += gray(y + dy)(x + dx); dx += 1 }
              dy += 1
            }
            val b = s / 9
            sBlur += b
            sDelta += math.abs(b - gray(y)(x))
            if (b > mx) mx = b
            x += 1
          }
          y += 1
        }
        (id, w.toLong, h.toLong, (w - 2).toLong * (h - 2),
          sBlur, sDelta, mx)
      }
    }.toDF("doc_id", "width", "height", "n_interior",
        "sum_blur", "sum_abs_delta", "max_blur")
      .orderBy(col("doc_id"))
  }

  def sobelPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (4 + id % 21).toInt
        val h = (3 + id % 14).toInt
        val payload = MediaCodec.encodeBmp(w, h, (x, y) => {
          val r = ((id + 3L * x + 5L * y) % 256).toInt
          val g = ((2L * id + 7L * x + y) % 256).toInt
          val b = ((5L * id + x + 11L * y) % 256).toInt
          (r << 16) | (g << 8) | b
        })
        val gray = Array.ofDim[Int](h, w)
        val (dw, dh) = MediaCodec.foreachBmpPixel(payload) { (x, y, r, g, b) =>
          gray(y)(x) = (r + g + b) / 3
        }
        var sgx = 0L; var sgy = 0L; var smag = 0L; var nEdge = 0L
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            val gx = (gray(y - 1)(x + 1) + 2 * gray(y)(x + 1) + gray(y + 1)(x + 1)) -
              (gray(y - 1)(x - 1) + 2 * gray(y)(x - 1) + gray(y + 1)(x - 1))
            val gy = (gray(y + 1)(x - 1) + 2 * gray(y + 1)(x) + gray(y + 1)(x + 1)) -
              (gray(y - 1)(x - 1) + 2 * gray(y - 1)(x) + gray(y - 1)(x + 1))
            sgx += math.abs(gx); sgy += math.abs(gy)
            val m = math.abs(gx) + math.abs(gy)
            smag += m
            if (m >= 256) nEdge += 1
            x += 1
          }
          y += 1
        }
        val nInt = (w - 2).toLong * (h - 2).toLong
        (id, dw.toLong, dh.toLong, nInt, sgx, sgy, smag, nEdge)
      }
    }.toDF("doc_id", "width", "height", "n_interior",
        "sum_abs_gx", "sum_abs_gy", "sum_mag", "n_edge")
      .orderBy(col("doc_id"))
  }

  /** Histogram-equalization plan over the REAL BMP decode path: the
    * classic eq(v) = (cdf(v) − cdf_min)·255 div (n − cdf_min) transfer
    * function (cdf_min = count of the darkest occupied level) computed
    * from the decoded gray histogram — emitted as the level count,
    * gray range, and the exact sum of equalized values, the stats a
    * normalization stage checks before re-encoding. All-integer floor
    * division keeps it engine-exact; the degenerate flat image
    * (n = cdf_min) maps to 0 by definition on both sides. One 256-bin
    * histogram per image, no shuffle.
    */
  def histEqPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (4 + id % 21).toInt
        val h = (3 + id % 14).toInt
        val payload = MediaCodec.encodeBmp(w, h, (x, y) => {
          val r = ((id + 3L * x + 5L * y) % 256).toInt
          val g = ((2L * id + 7L * x + y) % 256).toInt
          val b = ((5L * id + x + 11L * y) % 256).toInt
          (r << 16) | (g << 8) | b
        })
        val hist = Array.fill(256)(0L)
        val (dw, dh) = MediaCodec.foreachBmpPixel(payload) { (_, _, r, g, b) =>
          hist((r + g + b) / 3) += 1
        }
        val n = w.toLong * h
        var gmin = -1L; var gmax = -1L; var nLevels = 0L; var cdfMin = 0L
        var cdf = 0L; var sumEq = 0L
        var v = 0
        while (v < 256) {
          val c = hist(v)
          if (c > 0) {
            if (gmin < 0) { gmin = v; cdfMin = c }
            gmax = v; nLevels += 1
          }
          cdf += c
          if (c > 0 && n > cdfMin)
            sumEq += ((cdf - cdfMin) * 255L / (n - cdfMin)) * c
          v += 1
        }
        (id, dw.toLong, dh.toLong, nLevels, gmin, gmax, sumEq)
      }
    }.toDF("doc_id", "width", "height", "n_levels", "gray_min", "gray_max", "sum_eq")
      .orderBy(col("doc_id"))
  }

  /** Real-decoder gate, indexed-color PNG path: synthesize a genuine
    * 4-bit PLTE PNG per doc — palette and index map pure functions of
    * doc_id, widths start at 3 so ODD widths keep the pad-nibble path
    * in play, the per-row filter type cycles all five — then run the
    * REAL [[MediaCodec.decodePngIndexed]] (CRC walk, PLTE parse,
    * inflate, BYTE-granularity unfilter, MSB-first nibble unpack) and
    * emit geometry + exact index and palette-resolved channel sums.
    * The oracle recomputes everything closed-form from the index and
    * palette formulas, so a bug anywhere in the sub-byte path breaks
    * the hash.
    */
  def decodePngIndexedPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (3 + id % 13).toInt
        val h = (2 + id % 9).toInt
        val palette = Array.tabulate(16) { j =>
          val r = ((id + 17L * j) % 256).toInt
          val g = ((2L * id + 29L * j) % 256).toInt
          val b = ((3L * id + 41L * j) % 256).toInt
          (r << 16) | (g << 8) | b
        }
        val payload = MediaCodec.encodePngIndexed(w, h, palette,
          (x, y) => ((id + 3L * x + 5L * y) % 16).toInt)
        val m = MediaCodec.decodePngIndexed(payload)
        (id, m.width.toLong, m.height.toLong, m.nColors.toLong,
          m.sumIdx, m.sumR, m.sumG, m.sumB)
      }
    }.toDF("doc_id", "width", "height", "n_colors",
        "sum_idx", "sum_r", "sum_g", "sum_b")
      .orderBy(col("doc_id"))
  }

  /** Real-decoder gate, compressed-image path: synthesize a genuine
    * 8-bit truecolor PNG per doc (geometry/pixels pure functions of
    * doc_id; the per-row filter type cycles through all five spec
    * filters, and widths start at 1 so the left-pixel-absent edge of
    * Sub/Average/Paeth is always in play), then run the REAL
    * [[MediaCodec.decodePng]] — CRC32 verification, multi-IDAT
    * concatenation, zlib inflate, unfilter — and emit geometry + exact
    * per-channel sums. The oracle recomputes the sums closed-form from
    * doc_id, so a bug anywhere in the inflate/unfilter path breaks the
    * hash. Narrow one-pass mapPartitions, no shuffle.
    */
  def decodePngPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (1 + id % 13).toInt
        val h = (1 + id % 9).toInt
        val payload = MediaCodec.encodePng(w, h, (x, y) => {
          val r = ((id + 2L * x + 3L * y) % 256).toInt
          val g = ((3L * id + 5L * x + y) % 256).toInt
          val b = ((7L * id + x + 4L * y) % 256).toInt
          (r << 16) | (g << 8) | b
        }, y => ((id + y) % 5).toInt)
        val m = MediaCodec.decodePng(payload)
        (id, m.width.toLong, m.height.toLong, m.sumR, m.sumG, m.sumB)
      }
    }.toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
      .orderBy(col("doc_id"))
  }

  /** REAL pixel resize over the decoded-BMP path — the thumbnail stage
    * of an image-ingest pipeline, upgraded from [[resizePlan]]'s
    * geometry math to actual pixel work: decode the genuine BMP
    * ([[decodeBmpPlan]]'s payloads), nearest-neighbor sample to a
    * fixed 4×3 grid (src = (t·dim) div target — the standard floor
    * mapping; monotone-distinct because w ≥ 4, h ≥ 3), and emit the
    * exact channel sums of the 12 sampled pixels, which the oracle
    * recomputes closed-form at the sampled coordinates. Same narrow
    * one-pass encode+decode mapPartitions shape as the decoder gates.
    */
  def thumbnailPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (4 + id % 21).toInt
        val h = (3 + id % 14).toInt
        val payload = MediaCodec.encodeBmp(w, h, (x, y) => {
          val r = ((id + 3L * x + 5L * y) % 256).toInt
          val g = ((2L * id + 7L * x + y) % 256).toInt
          val b = ((5L * id + x + 11L * y) % 256).toInt
          (r << 16) | (g << 8) | b
        })
        val xs = (0 until 4).map(tx => tx * w / 4).toSet
        val ys = (0 until 3).map(ty => ty * h / 3).toSet
        var sr = 0L; var sg = 0L; var sb = 0L
        val (dw, dh) = MediaCodec.foreachBmpPixel(payload) { (x, y, r, g, b) =>
          if (xs(x) && ys(y)) { sr += r; sg += g; sb += b }
        }
        (id, dw.toLong, dh.toLong, sr, sg, sb)
      }
    }.toDF("doc_id", "width", "height", "thumb_sum_r", "thumb_sum_g", "thumb_sum_b")
      .orderBy(col("doc_id"))
  }

  /** Real-decoder gate, run-length/delta path: synthesize a genuine QOI
    * image per doc (qoiformat.org; geometry/pixels pure functions of
    * doc_id) through the REAL general-purpose [[MediaCodec.encodeQoi]],
    * decode with [[MediaCodec.decodeQoi]], emit geometry + exact
    * channel sums; the oracle recomputes the sums closed-form. The
    * pixel pattern forces every chunk op into the stream: constant
    * rows (y≡1 mod 4) drive RUN, two-color alternating rows (y≡3)
    * drive INDEX hits, and the linear-gradient rows exercise
    * DIFF/LUMA/RGB selection with the spec's wraparound differences —
    * pinned op-by-op in MultimodalSpec. Widths start at 1. Narrow
    * one-pass mapPartitions, no shuffle — the payload-column shape.
    */
  def decodeQoiPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (1 + id % 17).toInt
        val h = (1 + id % 10).toInt
        val payload = MediaCodec.encodeQoi(w, h, qoiPixel(id))
        val m = MediaCodec.decodeQoi(payload)
        (id, m.width.toLong, m.height.toLong, m.sumR, m.sumG, m.sumB)
      }
    }.toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
      .orderBy(col("doc_id"))
  }

  /** The QOI gate's pixel function — shared with MultimodalSpec's
    * op-census so the "every op appears" claim tests the shipped
    * pattern, not a copy.
    */
  private[graft] def qoiPixel(id: Long)(x: Int, y: Int): Int =
    if (y % 4 == 1) {
      val v = ((id + 13L * y) % 256).toInt
      (v << 16) | (v << 8) | v
    } else if (y % 4 == 2) {
      // slow +1/+1/+1 gradient — inside DIFF's [−2, 1] op range
      val base = id + x + 2L * y
      val r = (base % 256).toInt
      val g = ((base + 1) % 256).toInt
      val b = ((base + 2) % 256).toInt
      (r << 16) | (g << 8) | b
    } else if (y % 4 == 3) {
      val base = if (x % 2 == 0) id else id + 128
      val r = (base % 256).toInt
      val g = ((base + 1) % 256).toInt
      val b = ((base + 2) % 256).toInt
      (r << 16) | (g << 8) | b
    } else {
      val r = ((id + 3L * x + 5L * y) % 256).toInt
      val g = ((2L * id + 7L * x + y) % 256).toInt
      val b = ((5L * id + x + 11L * y) % 256).toInt
      (r << 16) | (g << 8) | b
    }

  /** Real-decoder gate, palette-image path: synthesize a genuine
    * 16-color GIF89a per doc (palette AND pixel indices pure functions
    * of doc_id), decode with the REAL [[MediaCodec.decodeGif]] —
    * sub-block concatenation, variable-width LZW with clear/EOI and
    * the KwKwK case — and emit geometry + exact palette-resolved
    * channel sums; the oracle resolves the same palette closed-form.
    * With PNG (zlib) this makes two genuinely compressed formats whose
    * decompressors are exercised end-to-end by the gate.
    */
  def decodeGifPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // fanOut: LZW encode+decode per payload is the heaviest codec pass —
    // don't serialize it on the local single-split scan (identity at scale)
    graft.Tables.fanOut(docs).select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (2 + id % 14).toInt
        val h = (2 + id % 11).toInt
        val payload = MediaCodec.encodeGif(w, h,
          i => {
            val r = ((id + 17L * i) % 256).toInt
            val g = ((2L * id + 31L * i) % 256).toInt
            val b = ((3L * id + 47L * i) % 256).toInt
            (r << 16) | (g << 8) | b
          },
          (x, y) => ((id + 3L * x + 7L * y) % 16).toInt)
        val m = MediaCodec.decodeGif(payload)
        (id, m.width.toLong, m.height.toLong, m.sumR, m.sumG, m.sumB)
      }
    }.toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
      .orderBy(col("doc_id"))
  }

  /** Real-decoder gate, lossy-transform path: synthesize a genuine
    * baseline JFIF greyscale JPEG per doc whose 8×8 blocks are flat
    * values derived from doc_id — flat blocks have an EXACT DCT
    * (DC-only), so even through a lossy format the decoded raster is
    * an integer closed form the oracle recomputes. The decode runs the
    * REAL [[MediaCodec.decodeJpeg]]: marker walk, DHT canonical-code
    * rebuild, stuffed-byte entropy decode (DC categories + extend, AC
    * EOB), dequant, full float IDCT, round + clamp — with PNG (zlib)
    * and GIF (LZW) this adds the transform-coded format family to the
    * gate. Narrow one-pass mapPartitions, no shuffle.
    */
  def decodeJpegPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // fanOut: Huffman + dequant + full float IDCT per payload — the
    // other CPU-heavy codec; parallelize the local single-split scan
    graft.Tables.fanOut(docs).select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val wb = (1 + id % 4).toInt
        val hb = (1 + id % 3).toInt
        val payload = MediaCodec.encodeJpegFlat(wb, hb,
          (bx, by) => ((7L * id + 13L * bx + 29L * by) % 256).toInt)
        val m = MediaCodec.decodeJpeg(payload)
        (id, m.width.toLong, m.height.toLong, m.sumLum)
      }
    }.toDF("doc_id", "width", "height", "sum_lum")
      .orderBy(col("doc_id"))
  }

  /** Real-decoder gate, audio path: synthesize a genuine PCM16 mono WAV
    * per doc (rate/length/samples pure functions of doc_id), decode with
    * the REAL chunk-walking [[MediaCodec.decodeWav]], emit format fields
    * + exact amplitude stats; the oracle recomputes them closed-form.
    */
  def decodeWavPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (50 + id % 300).toInt
        val sr = (8000 + (id % 3) * 4000).toInt
        val payload = MediaCodec.encodeWavPcm16(n, sr,
          i => (((id * 31 + i * 17L) % 4001L) - 2000L).toInt)
        val m = MediaCodec.decodeWav(payload)
        (id, m.sampleRate.toLong, m.nSamples, m.sumAbs, m.maxAbs)
      }
    }.toDF("doc_id", "sample_rate", "n_samples", "sum_abs", "max_abs")
      .orderBy(col("doc_id"))
  }

  /** Audio feature statistics over the REAL WAV decode path — the
    * frontend numbers a speech/audio curation pass computes before any
    * model runs: energy (exact sum of squared amplitudes — RMS without
    * the sqrt, so it gates hash-exact), zero-crossing count (sign
    * products < 0 — the cheap voicing/noisiness signal), and peak.
    * Same synthetic PCM16 payload family as [[decodeWavPlan]]
    * (amplitude formula pure in doc_id), decoded by the REAL RIFF
    * walk ([[MediaCodec.foreachWavSample]]); the oracle recomputes
    * every sample closed-form, so a bug in the chunk walk or the
    * sign-extension breaks the hash. One pass, no shuffle.
    */
  def audioStatsPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (50 + id % 300).toInt
        val sr = (8000 + (id % 3) * 4000).toInt
        val payload = MediaCodec.encodeWavPcm16(n, sr,
          i => (((id * 31 + i * 17L) % 4001L) - 2000L).toInt)
        var energy = 0L; var zc = 0L; var peak = 0L
        var prev = 0
        var first = true
        val (dsr, dn) = MediaCodec.foreachWavSample(payload) { v =>
          energy += v.toLong * v
          if (!first && prev.toLong * v < 0) zc += 1
          val a = math.abs(v.toLong); if (a > peak) peak = a
          prev = v; first = false
        }
        (id, dsr.toLong, dn, energy, zc, peak)
      }
    }.toDF("doc_id", "sample_rate", "n_samples", "energy", "zero_crossings", "peak")
      .orderBy(col("doc_id"))
  }

  /** REAL RLE-TGA decode gate ([[MediaCodec.encodeTga]]/decodeTga —
    * Truevision spec, type 10, bottom-up): pixels repeat in runs of
    * 1 + id mod 5 so both RLE and raw packets occur; the emitted
    * TOP-LEFT pixel pins the bottom-up row order (channel sums alone
    * cannot). Same narrow one-pass encode+decode mapPartitions shape
    * as the other codec gates.
    */
  def decodeTgaPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (5 + id % 19).toInt
        val h = (3 + id % 11).toInt
        val rl = (1 + id % 5).toInt
        val payload = MediaCodec.encodeTga(w, h, (x, y) => {
          val cx = x / rl
          val r = ((id + 3L * cx + 5L * y) % 256).toInt
          val g = ((2L * id + 7L * cx + y) % 256).toInt
          val b = ((5L * id + cx + 11L * y) % 256).toInt
          (r << 16) | (g << 8) | b
        })
        val m = MediaCodec.decodeTga(payload)
        (id, m.width.toLong, m.height.toLong, m.sumR, m.sumG, m.sumB,
          m.topLeftR.toLong, m.topLeftG.toLong, m.topLeftB.toLong)
      }
    }.toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b",
      "tl_r", "tl_g", "tl_b")
      .orderBy(col("doc_id"))
  }

  /** REAL G.711 mu-law companding gate ([[MediaCodec.encodeWavMulaw]] /
    * decodeWavMulaw): PCM16 samples compand to 8-bit codes and expand
    * back; the oracle recomputes the FULL compand→expand roundtrip
    * closed-form (segment exponent via bit length, mantissa via
    * shifted floor-div), so a bias/segment/mantissa bug anywhere
    * breaks the hash.
    */
  def decodeMulawPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (20 + id % 50).toInt
        val payload = MediaCodec.encodeWavMulaw(n, 8000,
          i => (((id * 7919L + i * 2741L) % 65536L) - 32768L).toInt)
        val m = MediaCodec.decodeWavMulaw(payload)
        (id, m.sampleRate.toLong, m.nSamples, m.sumAbs, m.maxAbs)
      }
    }.toDF("doc_id", "sample_rate", "n_samples", "sum_abs", "max_abs")
      .orderBy(col("doc_id"))
  }

  /** REAL IMA-ADPCM companding gate ([[MediaCodec.encodeWavAdpcm]] /
    * decodeWavAdpcm — format 0x11 WAV, one block): a genuinely
    * STATEFUL codec — predictor and adaptive step index thread through
    * every 4-bit code, so the oracle must replay the whole encode
    * state machine (31 unrolled SQL steps over the step/index tables).
    * The emitted FINAL step index pins the adaptation path: a single
    * state slip anywhere shifts it. Fixed n = 32 samples per doc
    * (odd-nibble packing is pinned by the byte-level spec instead);
    * sample content varies per doc.
    */
  def decodeAdpcmPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val payload = MediaCodec.encodeWavAdpcm(32, 8000,
          i => (((id * 37L + i.toLong * i * 3) % 8000L) - 4000L).toInt)
        val m = MediaCodec.decodeWavAdpcm(payload)
        (id, m.sampleRate.toLong, m.nSamples, m.sumAbs, m.maxAbs, m.finalIndex.toLong)
      }
    }.toDF("doc_id", "sample_rate", "n_samples", "sum_abs", "max_abs", "final_index")
      .orderBy(col("doc_id"))
  }

  /** REAL Netpbm P6 decode gate ([[MediaCodec.encodePpm]]/decodePpm):
    * ASCII token header with a '#' comment line (the parser must skip
    * it to find the geometry) + raw RGB raster; channel sums recomputed
    * closed-form by the oracle.
    */
  def decodePpmPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (3 + id % 17).toInt
        val h = (2 + id % 13).toInt
        val payload = MediaCodec.encodePpm(w, h, (x, y) => {
          val r = ((3L * id + 2L * x + 7L * y) % 256).toInt
          val g = ((id + 5L * x + 3L * y) % 256).toInt
          val b = ((7L * id + 11L * x + y) % 256).toInt
          (r << 16) | (g << 8) | b
        })
        val m = MediaCodec.decodePpm(payload)
        (id, m.width.toLong, m.height.toLong, m.maxval.toLong,
          m.sumR, m.sumG, m.sumB)
      }
    }.toDF("doc_id", "width", "height", "maxval", "sum_r", "sum_g", "sum_b")
      .orderBy(col("doc_id"))
  }
}
