package graft

import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.operators.Pipeline
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf).cache()
  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("minhash-LSH finds exactly the verified near-dup pairs of brute ngram-jaccard") {
    val lsh = Dedup.minhashLshPairs(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.ngramJaccardPairs(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute, s"LSH missed ${brute -- lsh}, extra ${lsh -- brute}")
    assert(brute.nonEmpty, "expected planted near-dup pairs in the test data")
  }

  test("prefix-filtered ngram-jaccard equals brute force on a hot-shingle corpus") {
    // adversarial shape: every doc shares the same boilerplate run (a
    // df=n shingle), plus per-doc content; naive postings self-join emits
    // O(n²) pairs from the boilerplate alone — prefix filtering must
    // still return exactly the brute-force answer
    import spark.implicits._
    val boiler = "terms of service apply to all users"
    val corpus = (0L until 40L).map { i =>
      val near = if (i % 2 == 1) s"item${i - 1}" else s"item$i" // 20 near-dup pairs
      (i, s"$boiler document $near alpha beta gamma delta epsilon zeta")
    } :+ (99L, s"$boiler $boiler $boiler") // a doc that is pure boilerplate
    val df = corpus.toDF("doc_id", "text")
    val got = Dedup.ngramJaccardPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force in Scala over the same shingle definition
    def sh(t: String): Set[String] =
      t.split("\\s+").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString("_")).toSet
    val mats = corpus.map { case (id, t) => id -> sh(t) }
    val want = (for {
      (a, sa) <- mats; (b, sb) <- mats if a < b
      inter = (sa & sb).size if inter > 0
      j = 1000000L * inter / (sa.size + sb.size - inter) if j >= 500000L
    } yield (a, b, j)).toSet
    assert(want.nonEmpty, "adversarial corpus must contain true near-dups")
    assert(got == want, s"missing ${want -- got}, extra ${got -- want}")
  }

  test("containment pairs equal brute force and catch the doc-inside-doc case jaccard misses") {
    import spark.implicits._
    // doc 1 is a verbatim passage of doc 0 (10 of its 60 tokens):
    // C(0,1) = 1 but J(0,1) ≈ 8/58 — the asymmetric case Jaccard misses.
    // A shared boilerplate run (df = n shingle) rides along so the
    // one-sided prefix scheme is exercised on a hot posting list too.
    val boiler = "terms of service apply"
    val big = (0 until 60).map(i => s"tok$i").mkString(" ")
    val quote = (10 until 20).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(
      (0L, s"$boiler $big"),
      (1L, s"$boiler $quote"),
      (2L, s"$boiler completely different text about other things entirely"),
      (3L, s"$boiler $big trailing extras appended here"))
    val got = Dedup.containmentPairs(corpus.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def sh(t: String): Set[String] =
      t.split("\\s+").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString("_")).toSet
    val mats = corpus.map { case (id, t) => id -> sh(t) }
    val want = (for {
      (a, sa) <- mats; (b, sb) <- mats if a < b
      inter = (sa & sb).size if inter > 0
      c = 1000000L * inter / math.min(sa.size, sb.size) if c >= 800000L
    } yield (a, b, c)).toSet
    assert(got == want, s"missing ${want -- got}, extra ${got -- want}")
    // the contained-quote pair is found, and Jaccard would have missed it
    assert(got.exists(p => p._1 == 0L && p._2 == 1L), "doc-inside-doc pair missed")
    val (s0, s1) = (mats.head._2, mats(1)._2)
    val j01 = 1000000L * (s0 & s1).size / (s0 ++ s1).size
    assert(j01 < 500000L, s"witness not asymmetric enough: J(0,1) = $j01")
  }

  test("minhash containment estimator equals a driver-side replay over the real signatures") {
    import spark.implicits._
    // doc 1 is a verbatim passage of doc 0 (the asymmetric case the
    // estimator exists to surface cheaply); near-identical pairs ride
    // along so several band buckets genuinely cohabit
    val big = (0 until 60).map(i => s"tok$i").mkString(" ")
    val quote = (10 until 40).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(
      (0L, big), (1L, quote), (2L, s"$big tail0"), (3L, s"$big tail1"),
      (4L, "completely different text about other things entirely here"))
    val docs = corpus.toDF("doc_id", "text")
    val exSh = docs.select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("s"))
    val sig = Dedup.sigFromShingles(exSh).localCheckpoint()
    val bands = Dedup.bandsFromSig(sig).localCheckpoint()
    val got = Dedup.containmentMinhashFrom(docs, sig, bands).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet

    // driver-side replay from the SAME signature/band tables
    val sigM = sig.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val bandRows = bands.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val cands = (for {
      (da, ba, ka) <- bandRows; (db, bb, kb) <- bandRows
      if da < db && ba == bb && ka == kb
    } yield (da, db)).toSet
    def sh(t: String): Set[String] =
      t.split("\\s+").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString("_")).toSet
    val mats = corpus.map { case (id, t) => id -> sh(t) }.toMap
    val want = (for {
      (a, b) <- cands
      m = sigM(a).zip(sigM(b)).count { case (x, y) => x == y }.toLong
      (szA, szB) = (mats(a).size.toLong, mats(b).size.toLong)
      cEst = m * (szA + szB) * 1000000L / ((64L + m) * math.min(szA, szB))
      if cEst >= Dedup.ContainmentEstTauX1e6
      cExact = 1000000L * (mats(a) & mats(b)).size / math.min(szA, szB)
    } yield (a, b, szA, szB, m, cEst, cExact)).toSet
    assert(want.nonEmpty, "the synthetic corpus must produce estimator pairs")
    assert(got == want, s"missing ${want -- got}, extra ${got -- want}")
    // the asymmetric quote pair is surfaced and its exact QA confirms it
    val p01 = got.find(p => p._1 == 0L && p._2 == 1L)
    assert(p01.nonEmpty, "estimator missed the doc-inside-doc pair")
    assert(p01.get._7 == 1000000L, s"QA column should show exact containment: $p01")
  }

  test("containment equals brute force on an all-near-identical corpus (salted hot-key path)") {
    // every doc's RAREST shingle is the same key on this corpus, so the
    // full-postings side of one shingle carries every doc — the salted
    // join must still return exactly the brute answer (n² TRUE pairs;
    // the quadratic term is in the data, as with dedup_simhash at sf1)
    import spark.implicits._
    val base = (0 until 12).map(i => s"w$i").mkString(" ")
    val corpus = (0L until 30L).map(i =>
      (i, if (i % 3 == 0) base else s"$base extra$i"))
    val got = Dedup.containmentPairs(corpus.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def sh(t: String): Set[String] =
      t.split("\\s+").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString("_")).toSet
    val mats = corpus.map { case (id, t) => id -> sh(t) }
    val want = (for {
      (a, sa) <- mats; (b, sb) <- mats if a < b
      inter = (sa & sb).size if inter > 0
      c = 1000000L * inter / math.min(sa.size, sb.size) if c >= 800000L
    } yield (a, b, c)).toSet
    assert(want.size > 300, s"adversarial corpus should be near-all-pairs: ${want.size}")
    assert(got == want, s"missing ${want -- got}, extra ${got -- want}")
  }

  test("containment on the live corpus contains every J >= tau_C pair (C >= J)") {
    // C(A,B) = |A∩B|/min ≥ |A∩B|/|A∪B| = J always, so every pair at
    // J ≥ τ_C = 0.8 MUST also clear the containment gate — a lossless-
    // candidate-generation witness on the live corpus (28 such pairs
    // planted at sf0.001)
    val cont = Pipeline.dedupContainment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val jacHigh = Dedup.ngramJaccardPairs(docs).collect()
      .filter(_.getLong(2) >= 800000L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jacHigh.nonEmpty, "expected J >= 0.8 near-dup pairs in the test corpus")
    assert(jacHigh.subsetOf(cont),
      s"J >= tau_C pairs missing from containment: ${jacHigh -- cont}")
  }

  test("MinHashAgg signature equals a scala reference across partitionings") {
    import graft.functions.MinHashAgg
    import spark.implicits._
    val hs = (1L to 500L).map(h => (h % 7, h * h % 999983L))
    val want = hs.groupBy(_._1).map { case (g, rows) =>
      g -> (0 until MinHashAgg.Perms).map { i =>
        rows.map { case (_, h) =>
          (MinHashAgg.permA(i) * h + MinHashAgg.permB(i)) % MinHashAgg.Modulus
        }.min
      }.toSeq
    }
    for (parts <- Seq(1, 3, 8)) {
      val got = hs.toDF("g", "h").repartition(parts).groupBy(col("g"))
        .agg(MinHashAgg.minhashSig(col("h")).as("mh")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(got == want, s"partitioning $parts diverged from the scala reference")
    }
  }

  test("VectorSumAgg equals a scala elementwise sum across partitionings") {
    import graft.functions.VectorSumAgg
    import spark.implicits._
    val dim = 4
    val rows = (1 to 200).map(i => (i % 5, Array.tabulate(dim)(d => (i * (d + 1)).toFloat)))
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      g -> (0 until dim).map(d => rs.map(_._2(d).toDouble).sum)
    }
    for (parts <- Seq(1, 3, 8)) {
      val got = rows.toDF("g", "v").repartition(parts).groupBy(col("g"))
        .agg(VectorSumAgg.vectorSum(col("v"), dim).as("s")).collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toIndexedSeq).toMap
      want.foreach { case (g, w) =>
        got(g).zip(w).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
      }
    }
  }

  test("hot band bucket: salted LSH join is complete on an all-duplicates corpus") {
    // every doc identical → ONE maximally hot (band, key) bucket per band;
    // the salted join must still emit every pair exactly once
    import spark.implicits._
    val dup = (0L until 30L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(dup).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = (for { a <- 0L until 30L; b <- (a + 1) until 30L } yield (a, b)).toSet
    assert(pairs == all, s"missing ${all -- pairs}, extra ${pairs -- all}")
  }

  test("connected components: chains, rings, and singletons label to the component minimum") {
    import spark.implicits._
    // chain 0-1-2-3-4 (diameter 4 forces multiple rounds), ring 10-11-12,
    // pair 20-21, singletons 30 and 31
    val nodes = (Seq(0L, 1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L, 30L, 31L)).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 31L)
    assert(got == want)
  }

  test("connected components on an empty node set returns empty (not NPE)") {
    import spark.implicits._
    val nodes = Seq.empty[Long].toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(nodes, edges).count() == 0)
  }

  test("VectorSumAgg fails loudly on a dimension mismatch") {
    import graft.functions.VectorSumAgg
    import spark.implicits._
    val rows = Seq((1, Array(1f, 2f, 3f)), (1, Array(1f, 2f))).toDF("g", "v")
    val e = intercept[Exception] {
      rows.groupBy(col("g")).agg(VectorSumAgg.vectorSum(col("v"), 3).as("s")).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("got a vector of length 2"), s"unexpected failure:\n$msgs")
  }

  test("connected components refuses to return unconverged labels") {
    import spark.implicits._
    // a 64-node path cannot converge in 3 rounds even with path halving
    // (per-round reach is a small constant factor) → must throw, never
    // silently emit partial labels
    val nodes = (0L until 64L).toDF("id")
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(nodes, edges, maxRounds = 3).collect()
    }
  }

  test("exact clusters partition all docs; representatives are minima") {
    val cl = Dedup.exactClusters(docs).collect()
    assert(cl.length == docs.count())
    cl.foreach(r => assert(r.getLong(2) <= r.getLong(0))) // cluster_id <= doc_id
  }

  test("native WordShingles equals the interpreted HOF rendering") {
    for (n <- Seq(2, 3)) {
      val diff = docs.select(
          Dedup.shingles(col("text"), n).as("a"),
          Dedup.shinglesHof(col("text"), n).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff == 0, s"n=$n shingles diverged from the HOF spec")
    }
    // edge cases: fewer tokens than n, repeated runs, multiple spaces
    import spark.implicits._
    val edge = Seq("", "a", "a b", "a b c", "a  b   c", "x y x y x y", "a_b c d")
      .toDF("text")
    val diff = edge.select(
        Dedup.shingles(col("text")).as("a"), Dedup.shinglesHof(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("native SimHash equals the interpreted HOF rendering bit for bit") {
    val both = docs
      .select(graft.search.Analyzer.tokens(col("text")).as("toks"))
      .select(Dedup.simhashSignature("toks").as("native"),
        Dedup.simhashSignatureInterpreted("toks").as("interp"))
    assert(both.filter(col("native") =!= col("interp")).count() == 0,
      "codegen'd SimHash diverged from the interpreted spec")
  }

  test("simhash pairs are symmetric-free and within hamming bound") {
    val rows = Dedup.simhashPairs(docs).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) <= Dedup.SimHamK)
    }
  }

  test("brute top-k: k rows per query, ranks contiguous, cosine non-increasing") {
    val rows = Pipeline.annBruteTopk(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rs.length))
      val sims = sorted.map(_.getLong(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("split assignment partitions every document with ~80/10/10 shares") {
    val rows = Pipeline.splitAssign(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.documents(spark, sf).count())
    // per-source shares sum to ~1e6 (each of <=3 splits floors < 1)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val sSum = rs.map(_.getLong(3)).sum
      assert(sSum <= 1000000L && sSum > 1000000L - rs.length, s"source $src shares: $sSum")
    }
    // global train share lands near 80% (hash uniformity, wide tolerance)
    val train = rows.filter(_.getString(1) == "train").map(_.getLong(2)).sum
    val share = train.toDouble / total
    assert(share > 0.7 && share < 0.9, s"train share $share out of band")
  }

  test("dq report: clean test tables yield zero violations over true totals") {
    val m = Pipeline.dqReport(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m.keySet == Set("lineitem_orphan_order", "order_orphan_customer",
      "doc_empty_text", "doc_dup_id", "lineitem_nonpositive_qty", "event_null_user"))
    m.values.foreach { case (bad, _) => assert(bad == 0L) }
    assert(m("lineitem_orphan_order")._2 == Tables.lineitem(spark, sf).count())
    assert(m("doc_empty_text")._2 == Tables.documents(spark, sf).count())
    assert(m("event_null_user")._2 == Tables.events(spark, sf).count())
  }

  test("epoch shuffle: per-epoch permutation prefixes differ but are individually deterministic") {
    val a = Pipeline.epochShuffle(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b = Pipeline.epochShuffle(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(a == b, "re-run changed the shuffle order")
    val e1 = (1 to 20).map(p => a((1, p)))
    val e2 = (1 to 20).map(p => a((2, p)))
    assert(e1 != e2, "epochs 1 and 2 produced the same prefix")
    assert(e1.distinct.size == 20 && e2.distinct.size == 20)
  }

  test("rarity: docs made of one repeated common bigram score the corpus minimum") {
    val rows = graft.operators.Text.rarity(spark, sf).collect()
    assert(rows.nonEmpty)
    // rarity_avg is bounded: df <= N so each term >= 1000 div df >= 1000/N;
    // and df >= 1 so each term <= N*1000
    val n = Tables.documents(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(2) >= 1000L / n && r.getLong(2) <= n * 1000L, s"row $r")
      assert(r.getLong(1) >= 1)
    }
  }

  test("modality report partitions the id universe") {
    val rows = Pipeline.mmModality(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    val nDocs = Tables.documents(spark, sf).count()
    val nVecs = Tables.embeddings(spark, sf).count()
    val nBoth = rows.filter(_.getString(1) == "both").map(_.getLong(2)).sum
    // |docs ∪ vecs| = |docs| + |vecs| − |both|
    assert(total == nDocs + nVecs - nBoth)
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(4)))
  }

  test("chunking covers every token with correct stride overlap") {
    val rows = Pipeline.chunk(spark, sf).collect()
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(TextFunctions.rawTokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val n = nTok(doc)
      val sorted = rs.sortBy(_.getInt(1))
      // contiguous chunk indices starting at 0, stride-6 starts
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(1) == i && r.getInt(2) == i * 6)
        assert(r.getLong(3) == math.min(8, n - r.getInt(2)))
        assert(r.getLong(3) >= 1, s"doc $doc empty chunk: $r")
      }
      // last chunk reaches the final token; one more chunk would be redundant
      val last = sorted.last
      assert(last.getInt(2) + last.getLong(3) == n)
    }
    assert(rows.map(_.getLong(0)).toSet == nTok.keySet)
  }

  test("spike detection: flags exactly the windows at >=2x their trailing max") {
    val rows = Pipeline.streamSpike(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getLong(0))
      ordered.zipWithIndex.foreach { case (r, i) =>
        val prev = ordered.slice(math.max(0, i - 6), i).map(_.getLong(2))
        if (prev.isEmpty) {
          assert(r.isNullAt(3) && !r.getBoolean(4))
        } else {
          assert(r.getLong(3) == prev.max)
          assert(r.getBoolean(4) == (r.getLong(2) >= 2 * prev.max))
        }
      }
    }
  }

  test("bpe pairs: weighted pair mass equals the corpus adjacent-pair total") {
    val pairs = graft.operators.Text.bpePairs(spark, sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getString(0).length == 2))
    // sum over pairs of n = sum over corpus tokens of (len - 1)
    val totalFromPairs = pairs.map(_.getLong(1)).sum
    val totalFromTokens = Tables.documents(spark, sf)
      .select(explode(graft.text.TextFunctions.rawTokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .agg(sum(length(col("w")) - 1)).collect()(0).getLong(0)
    assert(totalFromPairs == totalFromTokens)
  }

  test("stream topk emits per-window top-3 matching a window-function reference") {
    val got = Pipeline.streamTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    got.groupBy(_._1).foreach { case (w, rs) => assert(rs.length <= 3, s"window $w emits >3") }
    val full = Pipeline.streamWindowAgg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = full.groupBy(_._1).values.flatMap { rs =>
      rs.sortBy(t => (-t._3, t._2)).take(3)
    }.toSet
    assert(got.toSet == expected)
  }

  test("range search agrees with brute top-k above the radius") {
    val range = Pipeline.annRangeSearch(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // every returned neighbor clears the radius
    assert(range.nonEmpty)
    assert(range.values.forall(_ >= 250000L))
    // brute top-k rows above the radius must ALL appear in the range
    // result with the identical similarity (completeness cross-check)
    Pipeline.annBruteTopk(spark, sf).collect()
      .filter(_.getLong(3) >= 250000L)
      .foreach { r =>
        val key = (r.getLong(0), r.getLong(2))
        assert(range.get(key).contains(r.getLong(3)),
          s"brute hit $key=${r.getLong(3)} missing from range search")
      }
  }

  test("PQ ADC scan: codes in range, distances non-decreasing, measured recall vs brute") {
    val rows = Pipeline.annPqTopk(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rs.length))
      val ds = sorted.map(_.getLong(3))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
      assert(ds.forall(_ >= 0L))
    }
    // L2-ADC neighbors vs cosine brute: different metrics, so recall is
    // informative, not pinned high — but it must beat random (10/500)
    val brute = Pipeline.annBruteTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    info(f"PQ ADC recall@10 vs cosine brute = $recall%.2f (8x16 codebooks, approximate by design)")
    assert(recall > 0.05)
  }

  test("RQ ADC scan: valid ranks, non-decreasing distances, measured recall, error undercuts level 1") {
    val rows = Pipeline.annRqTopk(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rs.length))
      val ds = sorted.map(_.getLong(3))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
    val brute = Pipeline.annBruteTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rq = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & rq).size.toDouble / brute.size
    info(f"RQ ADC recall@10 vs cosine brute = $recall%.2f (16+16 books, approximate by design)")
    assert(recall > 0.05)
    // the ladder claim: adding the residual book must strictly reduce
    // mean reconstruction error vs level-1-only quantization (driver
    // replay of the greedy encode over the pinned literals)
    import graft.similarity.RqModel
    val embs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
    def d2(x: Array[Double], c: Seq[Float], r: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < x.length) { val d = r(j) - c(j); s += d * d; j += 1 }
      s
    }
    var e1Sum = 0.0; var e2Sum = 0.0
    embs.foreach { x =>
      val a1 = RqModel.level1.indices.minBy(k => d2(x, RqModel.level1(k), x))
      val r1 = x.indices.map(j => x(j) - RqModel.level1(a1)(j)).toArray
      e1Sum += r1.map(v => v * v).sum
      val a2 = RqModel.level2.indices.minBy(j => d2(x, RqModel.level2(j), r1))
      e2Sum += r1.indices.map(j => r1(j) - RqModel.level2(a2)(j)).map(v => v * v).sum
    }
    info(f"mean err level-1 only = ${e1Sum / embs.length}%.4f, RQ = ${e2Sum / embs.length}%.4f")
    assert(e2Sum < e1Sum, "residual book failed to reduce reconstruction error")
    // and the gated error query's mean agrees with the replay (x1e6 floor slack)
    val meanGated = Pipeline.annRqError(spark, sf).collect().head.getLong(2)
    val meanReplay = (e2Sum * 1000000 / embs.length).toLong
    assert(math.abs(meanGated - meanReplay) <= embs.length,
      s"gated mean $meanGated vs replay $meanReplay")
  }

  test("SQ int8 scan: ranks valid, dots bounded, measured recall vs brute") {
    val rows = Pipeline.annSqTopk(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rs.length))
      val ds = sorted.map(_.getLong(3))
      assert(ds.zip(ds.tail).forall { case (a, b) => a >= b }, "dot must be non-increasing")
      assert(ds.forall(d => math.abs(d) <= 64L * 127 * 127), "dot outside int8 bound")
    }
    val brute = Pipeline.annBruteTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val sq = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & sq).size.toDouble / brute.size
    info(f"SQ int8 recall@10 vs cosine brute = $recall%.2f (scale=200, approximate by design)")
    assert(recall > 0.5)
  }

  test("levenshtein near-dup pairs match a brute-force blocked recompute") {
    import graft.text.TextFunctions
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextFunctions.normalized(col("text")).as("nt"))
      .collect().map(r => (r.getLong(0), r.getString(1))).filter(_._2.nonEmpty)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = d(0); d(0) = i
        for (j <- 1 to b.length) {
          val cur = d(j)
          d(j) = math.min(math.min(d(j) + 1, d(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      d(b.length)
    }
    val blocked = docs.map { case (id, nt) =>
      (id, nt, nt.split(' ').headOption.getOrElse(""), nt.length / 16, nt.length.toLong)
    }
    val expect = (for {
      a <- blocked; b <- blocked
      if a._1 < b._1 && a._3 == b._3 && a._4 == b._4 && math.abs(a._5 - b._5) <= 20
      d = lev(a._2, b._2)
      ml = math.max(a._5, b._5)
      if d <= 20 && d * 100 <= 20 * ml
    } yield (a._1, b._1, d.toLong, ml, d * 100 / ml)).toSet
    val got = Pipeline.dedupLevenshtein(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expect)
    assert(got.nonEmpty, "corpus should contain blocked near-dup pairs")
  }

  test("LSH ANN returns a subset ranking with measured recall") {
    val brute = Pipeline.annBruteTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Pipeline.annLshTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(lsh.nonEmpty)
    val recall = (brute & lsh).size.toDouble / brute.size
    info(f"LSH ANN recall@10 = $recall%.2f (multi-probe hamming<=1, approximate by design)")
    assert(recall > 0.3)
  }

  test("graph ANN (hnsw): measured recall vs brute and visited-fraction readout") {
    val brute = Pipeline.annBruteTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val hnsw = Pipeline.annHnswTopk(spark, sf).collect()
    assert(hnsw.nonEmpty)
    // ranks contiguous from 1 per query
    val byQ = hnsw.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length),
        s"query $q has non-contiguous ranks")
    }
    val got = hnsw.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    val vs = Pipeline.annHnswVisited(spark, sf).collect()
    val frac = vs.map(_.getLong(3)).max / 1e6
    info(f"graph ANN recall@10 = $recall%.2f, max visited fraction = $frac%.2f " +
      "(M=16 beam=32 rounds=6; uniform synthetic vectors are the documented worst case)")
    assert(recall > 0.5, f"graph ANN recall collapsed: $recall%.2f")
    vs.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "visited more nodes than the corpus holds")
      assert(r.getLong(3) == r.getLong(1) * 1000000L / r.getLong(2), "frac arithmetic drift")
    }
  }

  test("NN-descent: ranks contiguous, monotone lift over init, edges are real neighbors") {
    val rows = Pipeline.annNnDescent(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (s, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length), s"src $s ranks")
      assert(rs.map(_.getLong(2)).distinct.length == rs.length, s"src $s dup nbr")
      assert(rs.forall(_.getLong(2) != s), s"src $s self edge")
    }
    val r = Pipeline.annNnDescentRecall(spark, sf).collect().head
    val (nTruth, hitsInit, hits) = (r.getLong(1), r.getLong(2), r.getLong(4))
    assert(hits >= hitsInit,
      s"descent lost recall vs its init: $hits < $hitsInit")
    assert(hits > 0 && hits <= nTruth)
    info(f"NN-descent recall@${Similarity.NndM} = ${hits.toDouble / nTruth}%.2f " +
      f"(init ${hitsInit.toDouble / nTruth}%.2f; uniform vectors are the worst case " +
      "— no neighbor-of-neighbor correlation to exploit)")
    // arithmetic of the gated row
    assert(r.getLong(3) == hitsInit * 1000000L / nTruth)
    assert(r.getLong(5) == hits * 1000000L / nTruth)
  }

  test("descent-served top-k: ranks contiguous, recall_eval audits it as a 7th method row") {
    val served = Pipeline.annDescentTopk(spark, sf).collect()
    assert(served.nonEmpty)
    served.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length),
        s"query $q has non-contiguous ranks")
      assert(rows.forall(_.getLong(2) != q), s"query $q returned itself")
    }
    val eval = Pipeline.annRecallEval(spark, sf).collect()
    val methods = eval.map(_.getString(0)).toSeq
    assert(methods == methods.sorted && methods.contains("nnd") &&
      methods.length == 7,
      s"recall_eval must carry the 7 method rows incl. nnd, got $methods")
    val nnd = eval.find(_.getString(0) == "nnd").get
    val brute = Pipeline.annBruteTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = served.map(r => (r.getLong(0), r.getLong(2))).toSet
    // the audit row measures exactly the serving face's pair set
    assert(nnd.getLong(3) == (brute & got).size.toLong,
      "nnd hits diverge from the served pair set")
    info(f"descent-served recall@10 = ${nnd.getLong(3).toDouble / nnd.getLong(2)}%.2f " +
      "(same walk params as hnsw; only the graph under it differs)")
    // the visited-fraction readout rides the same memoized walk
    val vs = Pipeline.annDescentVisited(spark, sf).collect()
    assert(vs.nonEmpty)
    vs.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "visited more nodes than the corpus holds")
      assert(r.getLong(3) == r.getLong(1) * 1000000L / r.getLong(2), "frac arithmetic drift")
    }
  }

  test("descent insert: links are valid base edges; recall within 2 points of a full rebuild") {
    val ins = Pipeline.annDescentInsert(spark, sf).collect()
    assert(ins.nonEmpty)
    ins.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(q % Similarity.NndHoldMod == Similarity.NndHoldResidue,
        s"inserted src $q is not a held-out vector")
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length),
        s"insert $q has non-contiguous ranks")
      assert(rows.forall(r => r.getLong(2) % Similarity.NndHoldMod !=
          Similarity.NndHoldResidue && r.getLong(2) != q),
        s"insert $q linked a held-out or self node — links must target the base graph")
    }
    // recall of the inserted adjacency vs the full-rebuild descent
    // graph restricted to the same sources, against the same brute
    // truth — the insert path must not cost more than 2 points
    val truth = Similarity.bruteTopK(Tables.embeddings(spark, sf),
        Similarity.descentHoldPred, Similarity.NndM).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val insSet = ins.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(truth.nonEmpty)
    val rebuildSet = Similarity.nnDescentGraph(spark, sf)
      .filter(col("src") % Similarity.NndHoldMod === Similarity.NndHoldResidue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rIns = (truth & insSet).size.toDouble / truth.size
    val rReb = (truth & rebuildSet).size.toDouble / truth.size
    info(f"insert recall@${Similarity.NndM} = $rIns%.3f vs full rebuild $rReb%.3f")
    assert(rIns >= rReb - 0.02,
      f"search-then-link insert lost more than 2 recall points vs a full rebuild: $rIns%.3f < $rReb%.3f - 0.02")
  }

  test("kmeans training survives unpopulated vec_id residue classes") {
    import spark.implicits._
    // 3 vectors, 8 cells → residues 1,3,5,6,7 start empty; training must
    // seed them from a populated cell instead of crashing
    val tiny = Seq(0L, 2L, 4L)
      .map(i => (i, Array.tabulate(64)(d => (i + d + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(tiny, cells = 8, iters = 2)
    assert(cents.length == 8)
    assert(cents.forall(_.length == 64))
    intercept[IllegalArgumentException] {
      Similarity.kmeansCentroids(tiny.filter(col("vec_id") < 0), cells = 4, iters = 1)
    }
  }

  test("IVF ANN probes nearest cells with measured recall") {
    val brute = Pipeline.annBruteTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Pipeline.annIvfTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivf.nonEmpty)
    val recall = (brute & ivf).size.toDouble / brute.size
    info(f"IVF ANN recall@10 = $recall%.2f (nProbe=3 of 10 cells)")
    assert(recall > 0.2)
  }

  test("IVF-PQ composite: probed subset of the PQ scan, measured recall") {
    val pq = Pipeline.annPqTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val ivfpq = Pipeline.annIvfPqTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(ivfpq.nonEmpty)
    // same codebooks ⇒ identical ADC distance for any (q, v) both scans
    // score; the composite only prunes candidates, never rescores them
    val pqDist = pq.map { case (q, v, d) => (q, v) -> d }.toMap
    ivfpq.foreach { case (q, v, d) =>
      pqDist.get((q, v)).foreach(pd =>
        assert(pd == d, s"ADC distance diverged for ($q,$v)"))
    }
    val brute = Pipeline.annBruteTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & ivfpq.map(t => (t._1, t._2)).toSet).size.toDouble / brute.size
    info(f"IVF-PQ recall@10 vs cosine brute = $recall%.2f (nProbe=3, 8x16 codebooks)")
    assert(recall > 0.05)
  }

  test("Bloom decontamination: no false negatives vs exact, bounded FP rate") {
    val exact = Pipeline.contamination(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bloom = Pipeline.contaminationBloom(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bloom.nonEmpty)
    // a Bloom filter can only over-report: every exact hit count is a
    // lower bound on the bloom hit count for that doc
    exact.foreach { case (id, nHit) =>
      val b = bloom.find(_._1 == id)
      assert(b.exists(_._3 >= nHit), s"doc $id lost exact hits ($nHit) in the bloom path")
    }
    val totalSh = bloom.map(_._2).sum
    val fp = bloom.map(_._3).sum - exact.values.sum
    assert(fp >= 0)
    val fpRate = fp.toDouble / totalSh
    info(f"bloom FP rate = $fpRate%.4f over $totalSh shingle probes (M=65536, K=3)")
    assert(fpRate < 0.02, f"false-positive rate $fpRate%.4f out of bound")
  }

  test("salted join returns exactly the rows of the plain join") {
    import graft.operators.Skew
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_quantity")
    val ord = Tables.orders(spark, sf).select("l_orderkey".replace("l_", "o_"), "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val cols = Seq("l_orderkey", "l_partkey", "l_quantity", "o_totalprice").map(col)
    val plain = li.join(ord, Seq("l_orderkey")).select(cols: _*)
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", 4, col("l_partkey"))
      .select(cols: _*).collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("BottomK aggregate: merge path equals a scala reference across partitionings") {
    import graft.functions.BottomK.bottomK
    val vals = (1L to 1000L).map(i => (i % 7, (i * 37) % 101)) // dups across groups
    import spark.implicits._
    val df = vals.toDF("g", "v")
    val expect = vals.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted.take(5).toSeq).toMap
    for (parts <- Seq(1, 13)) {
      val got = df.repartition(parts).groupBy(col("g"))
        .agg(bottomK(col("v"), 5).as("bk")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got == expect, s"parts=$parts")
    }
  }

  test("sequence packing: per-shard streams are contiguous and budget-aligned") {
    val budget = 256L
    val rows = Pipeline.packSequences(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, nTok, off, first, last) =>
      assert(off >= 0 && off < budget)
      assert(first <= last, "a doc ends at or after the pack it starts in")
      // a doc spanning p packs must carry more than (p-1) budgets of tokens
      assert(nTok > (last - first - 1).max(0) * budget)
    }
    // within a shard the token stream is gapless: next doc's global start
    // (pack_first*budget + offset) is the previous doc's start + n_tok
    rows.groupBy(_._2).values.foreach { shard =>
      val inOrder = shard.sortBy(_._1)
      inOrder.sliding(2).foreach {
        case Array((_, _, nTok, off, first, _), (_, _, _, off2, first2, _)) =>
          assert(first2 * budget + off2 == first * budget + off + nTok, "gap in packed stream")
        case _ => ()
      }
    }
  }

  test("contamination flags exactly the docs sharing a shingle with the benchmark set") {
    import graft.dedup.Dedup
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val bench = sh.filter(_._1 % 97 == 0).values.flatten.toSet
    val expect = sh.filter { case (id, s) => id % 97 != 0 && (s & bench).nonEmpty }
      .map { case (id, s) => id -> (s & bench).size.toLong }
    val got = Pipeline.contamination(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("diversity: Simpson index respects the 1/n_uniq Cauchy-Schwarz lower bound") {
    val rows = operators.Text.diversity(spark, sf).collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val (nTok, nUniq, simpson) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nUniq >= 1 && nUniq <= nTok)
      assert(simpson <= 1000000L)
      assert(simpson >= 1000000L / nUniq - 1, s"below Cauchy-Schwarz bound: $r")
    }
  }

  test("repetition metrics match a brute-force per-doc recount") {
    def toks(t: String): Array[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> toks(r.getString(1))).toMap
    val rows = operators.Text.repetition(spark, sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val tk = texts(r.getLong(0))
      val n = tk.length.toLong
      def topN(g: Int): Long =
        if (tk.length < g) 0L
        else tk.sliding(g).map(_.toList).toSeq.groupBy(identity).values.map(_.size).max.toLong
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == (n - tk.distinct.length) * 1000000L / math.max(n, 1L))
      assert(r.getLong(3) == topN(2), s"top2 mismatch for doc ${r.getLong(0)}")
      assert(r.getLong(5) == topN(3), s"top3 mismatch for doc ${r.getLong(0)}")
    }
  }

  test("span dedup: duplicated-span counts match a brute-force span index") {
    def spans(t: String): Set[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .sliding(8).filter(_.length == 8).map(_.mkString("_")).toSet
    val sp = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> spans(r.getString(1))).toMap
    val docCount = sp.toSeq.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val rows = Pipeline.dedupSpan(spark, sf).collect()
    assert(rows.length == sp.size)
    rows.foreach { r =>
      val ss = sp(r.getLong(0))
      assert(r.getLong(2) == ss.size.toLong)
      val expectDup = ss.count(s => docCount(s) >= 2).toLong
      assert(r.getLong(3) == expectDup, s"n_dup mismatch for doc ${r.getLong(0)}")
    }
  }

  test("ivf-blocked embedding dedup: complete within cells, sound vs brute") {
    val out = Pipeline.dedupEmbeddingIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        graft.similarity.Similarity.nearestCell(col("embedding"),
          graft.similarity.IvfModel.cells).as("cell"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val tau = 400000L
    val brute = collection.mutable.Map.empty[(Long, Long), Long]
    var sameCell = 0
    for (i <- e.indices; j <- i + 1 until e.length) {
      val (ia, va, ca) = e(i); val (ib, vb, cb) = e(j)
      // in-order double folds — the same IEEE result as the engine's dot
      var dot = 0.0; var na = 0.0; var nb = 0.0; var k = 0
      while (k < va.length) {
        dot += va(k).toDouble * vb(k).toDouble
        na += va(k).toDouble * va(k).toDouble
        nb += vb(k).toDouble * vb(k).toDouble
        k += 1
      }
      val cos = math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6).toLong
      if (cos >= tau) {
        val key = if (ia < ib) (ia, ib) else (ib, ia)
        brute(key) = cos
        if (ca == cb) {
          sameCell += 1
          assert(out.contains(key) && out(key) == cos,
            s"within-cell pair $key missing or drifted")
        }
      }
    }
    // soundness: every emitted pair is a genuine >= tau brute pair
    out.foreach { case (key, cos) =>
      assert(brute.get(key).contains(cos), s"emitted pair $key not in brute set")
    }
    assert(out.size == sameCell, "output must be exactly the within-cell brute pairs")
    info(s"recall vs brute: ${out.size}/${brute.size} pairs share a cell")
  }

  test("incremental index merge equals the direct term-stats build") {
    val merged = operators.Text.indexMerge(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = operators.Text.termStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(merged.keySet == direct.keySet)
    merged.foreach { case (term, dfctf) =>
      assert(dfctf == direct(term), s"merge drift on '$term'")
    }
  }

  test("zipf ranking is a dense 1..V permutation with non-increasing ctf") {
    val rows = operators.Text.zipf(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length))
    val ctfs = rows.map(_.getLong(2))
    assert(ctfs.zip(ctfs.tail).forall { case (a, b) => a >= b }, "ctf not sorted")
    rows.foreach(r => assert(r.getLong(3) == r.getLong(0) * r.getLong(2)))
    // shares are floor-exact per term and sum to at most 1e6
    val nTokens = ctfs.sum
    rows.foreach(r => assert(r.getLong(4) == r.getLong(2) * 1000000L / nTokens))
    assert(rows.map(_.getLong(4)).sum <= 1000000L)
    // corpus vocabulary matches term_stats' vocabulary exactly
    assert(rows.length == operators.Text.termStats(spark, sf).count().toInt)
  }

  test("multimodal decode emits one typed row per doc with stable stub values") {
    val rows = Pipeline.mmDecodeMeta(spark, sf).collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      assert(r.getLong(3) >= 1 && r.getLong(3) <= 640) // width
      assert(r.getLong(4) >= 1 && r.getLong(4) <= 480) // height
    }
  }

  test("interleave: virtual times are the WFQ recurrence and the page is the global min") {
    val rows = Pipeline.interleave(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 200)
    // pos is dense 1..k in (vt, source, doc_id) order
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    val key = rows.map(r => (r.getLong(4), r.getString(1), r.getLong(2)))
    assert(key.zip(key.tail).forall { case (x, y) =>
      implicitly[Ordering[(Long, String, Long)]].lt(x, y) }, "page out of order")
    // recompute vt from the weights table
    val w = Pipeline.mixWeights(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(3) * 1000000L / w(r.getString(1)), s"vt: $r")
    }
    // every source with weight w appears roughly ∝ w on the page (sanity, not exact)
    assert(rows.map(_.getString(1)).distinct.length > 1, "page collapsed to one source")
  }

  test("ann recall audit reconciles with the underlying gated top-k sets") {
    val rows = Pipeline.annRecallEval(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("hnsw", "ivf", "lsh", "nnd", "pq", "rq", "sq"))
    val truth = Pipeline.annBruteTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val byName = Map(
      "hnsw" -> Pipeline.annHnswTopk(spark, sf),
      "ivf" -> Pipeline.annIvfTopk(spark, sf), "lsh" -> Pipeline.annLshTopk(spark, sf),
      "nnd" -> Pipeline.annDescentTopk(spark, sf),
      "pq" -> Pipeline.annPqTopk(spark, sf), "rq" -> Pipeline.annRqTopk(spark, sf),
      "sq" -> Pipeline.annSqTopk(spark, sf))
    rows.foreach { r =>
      val pred = byName(r.getString(0)).collect()
        .map(x => (x.getLong(0), x.getLong(2))).toSet
      assert(r.getLong(2) == truth.size.toLong, s"n_truth: $r")
      assert(r.getLong(3) == (truth & pred).size.toLong, s"hits: $r")
      assert(r.getLong(4) == (truth & pred).size.toLong * 1000000L / truth.size, s"recall: $r")
    }
  }

  test("dedup eval: counts reconcile and match the two underlying pair sets") {
    val r = Pipeline.dedupEval(spark, sf).collect().head
    val (nT, nP, tp, fp, fn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nT == tp + fn && nP == tp + fp, s"counts don't reconcile: $r")
    val truth = Pipeline.dedupNgramJaccard(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val pred = Pipeline.dedupSimhash(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(nT == truth.size && nP == pred.size)
    assert(tp == (truth & pred).size)
    if (nP > 0) assert(r.getLong(5) == tp * 1000000L / nP)
    if (nT > 0) assert(r.getLong(6) == tp * 1000000L / nT)
  }

  test("reshard audit: ring movement is bounded and mod movement is catastrophic") {
    val r = Pipeline.reshardAudit(spark, sf).collect().head
    val (n, mMod, mRing) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n > 0 && r.getLong(3) == mMod * 1000000L / n && r.getLong(4) == mRing * 1000000L / n)
    // mod-hash remaps ~16/17 of the corpus; the ring only what the new
    // shard's vnodes capture (~1/17 with vnode variance)
    assert(mMod * 100 / n >= 80, s"mod movement suspiciously low: $r")
    assert(mRing * 100 / n <= 15, s"ring movement too high: $r")
    assert(mRing < mMod, s"ring must beat mod: $r")
  }

  test("kappa equals a driver-side confusion-matrix replay and is above chance") {
    val preds = graft.operators.Text.langId(spark, sf)
      .select("lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = preds.length.toLong
    val agree = preds.count { case (a, p) => a == p }.toLong
    val rowT = preds.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val colT = preds.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val peNum = rowT.keySet.intersect(colT.keySet)
      .map(k => BigInt(rowT(k)) * colT(k)).sum
    val r = graft.operators.Text.kappa(spark, sf).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == agree, s"counts: $r")
    val B18 = BigInt(10).pow(18)
    assert(BigInt(r.getLong(2)) * B18 + r.getLong(3) == peNum, s"pe_num: $r")
    val num = BigInt(agree) * n - peNum
    val kappaAbs = (num.abs * 1000000 / (BigInt(n) * n - peNum)).toLong
    assert(r.getLong(6) == kappaAbs, s"kappa abs: $r")
    assert(r.getInt(7) == num.signum, s"kappa sign: $r")
  }

  test("readability equals a driver-side replay of the FK/ease integer formulas") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.operators.Text.readability(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = texts(r.getLong(0))
      val w = r.getLong(1)
      val sent = math.max("[.!?]+".r.findAllIn(text).length.toLong, 1L)
      val syll = "[aeiouy]+".r.findAllIn(text.toLowerCase).length.toLong
      assert(r.getLong(2) == sent, s"sentences: $r")
      assert(r.getLong(3) == syll, s"syllables: $r")
      assert(r.getLong(4) == 39 * w / sent + 1180 * syll / w - 1559, s"fk: $r")
      assert(r.getLong(5) == 206835 - 1015 * w / sent - 84600 * syll / w, s"ease: $r")
    }
  }

  test("filtered ann: results stay inside the metadata slice and rank by cosine") {
    val en = Tables.documents(spark, sf).filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = Pipeline.annFiltered(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(en.contains(r.getLong(2)), s"candidate outside the slice: $r")
      assert(en.contains(r.getLong(0)), s"query outside the slice: $r")
    }
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val byRank = g.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to g.length))
      val cs = byRank.map(_.getLong(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, "cosine not descending")
    }
    // the filter must actually prune: fewer hits than the unfiltered query grid
    assert(rows.map(_.getLong(0)).distinct.length <
      Tables.embeddings(spark, sf).filter(col("vec_id") % 97 === 0).count())
  }

  test("token budget admission equals a prefix-sum replay in quality order") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map { r =>
        val toks = r.getString(2).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        val nTok = math.max(toks.length.toLong, 1L)
        (r.getLong(0), r.getString(1), nTok, toks.distinct.length.toLong)
      }
    val rows = Pipeline.tokenBudget(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lang = r.getString(0)
      val g = docs.filter(_._2 == lang)
        .map { case (id, _, nTok, nUniq) => (id, nTok, 10000L * nUniq / nTok) }
        .sortBy(t => (-t._3, t._1))
      var cum = 0L; var kept = 0L; var tokKept = 0L
      g.foreach { case (_, nTok, _) =>
        cum += nTok
        if (cum <= 2500L) { kept += 1; tokKept += nTok }
      }
      assert(r.getLong(1) == g.length.toLong && r.getLong(2) == g.map(_._2).sum)
      assert(r.getLong(3) == kept, s"kept count: $r")
      assert(r.getLong(4) == tokKept, s"kept tokens: $r")
      assert(r.getLong(5) == tokKept * 1000000L / 2500L, s"util: $r")
      // the budget genuinely cuts
      assert(kept < g.length, s"budget did not bind for $lang")
    }
  }

  test("dataset diff statuses reconcile with the snapshot membership rules") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rows = Pipeline.datasetDiff(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val statusOf = (id: Long) => {
      val in1 = id % 11 != 3
      val in2 = id % 13 != 5
      if (!in1 && !in2) None
      else if (!in1) Some("added")
      else if (!in2) Some("removed")
      else if (id % 7 == 2) Some("changed")
      else Some("unchanged")
    }
    val want = docs.flatMap { case (id, lang, bytes) =>
      statusOf(id).map(st => (lang, st, bytes))
    }.groupBy(t => (t._1, t._2)).map { case ((lang, st), g) =>
      (lang, st, g.length.toLong, g.map(_._3).sum)
    }.toSeq.sortBy(t => (t._1, t._2))
    assert(rows.toSeq == want, "diff counts diverge from the membership rules")
    // every status class must be exercised
    assert(rows.map(_._2).distinct.sorted.toSeq ==
      Seq("added", "changed", "removed", "unchanged"))
  }

  test("knn classify: prediction is the neighbor-majority label and beats chance") {
    import org.apache.spark.sql.functions.col
    val neighborLabels = graft.similarity.Similarity
      .bruteTopK(Tables.embeddings(spark, sf), col("vec_id") % 97 === 0)
      .join(Tables.embeddings(spark, sf).select(col("vec_id").as("nid"),
        col("label").cast("long").as("nl")), col("vec_id") === col("nid"))
      .select(col("q_id"), col("nl")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = Pipeline.annKnnClassify(spark, sf).collect()
    assert(rows.nonEmpty && rows.length == neighborLabels.size)
    rows.foreach { r =>
      val votes = neighborLabels(r.getLong(0))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val (bestLabel, bestN) = votes.toSeq.minBy { case (l, n) => (-n, l) }
      assert(r.getLong(2) == bestLabel && r.getLong(3) == bestN, s"majority drift: $r")
      assert(r.getBoolean(4) == (r.getLong(1) == r.getLong(2)), s"correct flag: $r")
    }
    // accuracy itself is a property of the test corpus's cluster
    // structure (6 queries at the spec SF), not of the operator —
    // report it, but assert only that the vote is non-degenerate
    val acc = rows.count(_.getBoolean(4)).toDouble / rows.length
    info(f"kNN(10) accuracy = $acc%.2f over ${rows.length} queries")
    assert(rows.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 10), "vote counts out of range")
  }

  test("k-anonymity buckets partition the corpus and honor their k ranges") {
    val classes = Tables.documents(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.expr("n_chars div 100"))
      .count().collect().map(_.getLong(3))
    val rows = Pipeline.qKAnonymity(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == classes.sum, "doc mass lost")
    assert(rows.map(_.getLong(1)).sum == classes.length.toLong, "class count lost")
    val bounds = Map("1_unique" -> (1L, 1L), "2_to_4" -> (2L, 4L),
      "5_to_9" -> (5L, 9L), "10_plus" -> (10L, Long.MaxValue))
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getString(0))
      assert(r.getLong(3) >= lo && r.getLong(4) <= hi, s"k range violated: $r")
      val expected = classes.filter(k => k >= lo && k <= hi)
      assert(r.getLong(1) == expected.length.toLong && r.getLong(2) == expected.sum,
        s"bucket membership drift: $r")
    }
  }

  test("quality curve is monotone non-increasing and anchored at full corpus") {
    val rows = Pipeline.pipeQualityCurve(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 2000L, 4000L, 6000L, 8000L))
    // tau=0 keeps everything
    assert(rows.head.getLong(3) == 1000000L && rows.head.getLong(4) == 1000000L)
    // raising the threshold never keeps more
    Seq(1, 2).foreach { i => // docs_kept, tokens_kept columns
      val vs = rows.map(_.getLong(i))
      assert(vs.zip(vs.tail).forall { case (a, b) => a >= b }, s"col $i not monotone")
    }
    // the sweep must actually discriminate somewhere on this corpus
    assert(rows.map(_.getLong(1)).distinct.length > 1, "all thresholds keep the same set")
  }

  test("bpe training equals a driver-side merge-loop replay and compresses") {
    import org.apache.spark.sql.functions.{col, explode}
    val wf = Tables.documents(spark, sf)
      .select(explode(graft.text.TextFunctions.rawTokens(col("text"))).as("w"))
      .collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // replay: symbol lists per word, 3 leftmost-greedy merge rounds
    var words: Map[Vector[String], Long] =
      wf.map { case (w, f) => w.toVector.map(_.toString) -> f }
    def applyMerge(sym: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < sym.length) {
        if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
          out += s"$a@$b"; i += 2
        } else { out += sym(i); i += 1 }
      }
      out.result()
    }
    val rows = graft.operators.Text.bpeTrain(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    var prevTokens = Long.MaxValue
    rows.foreach { r =>
      val pairCounts = words.toSeq.flatMap { case (sym, f) =>
        sym.zip(sym.tail).map(p => p -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val best = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, s"[$a][$b]") }
      val (a, b) = best._1
      assert(r.getString(1) == s"[$a][$b]" && r.getLong(2) == best._2,
        s"merge decision drift at round ${r.getLong(0)}: $r vs $best")
      words = words.toSeq.map { case (sym, f) => applyMerge(sym, a, b) -> f }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val toks = words.map { case (sym, f) => sym.length * f }.sum
      assert(r.getLong(3) == toks, s"corpus tokens drift: $r vs $toks")
      assert(toks < prevTokens, "merge did not compress the corpus")
      prevTokens = toks
    }
  }

  test("mmr greedy selection equals a driver-side replay and diversifies the head") {
    import org.apache.spark.sql.functions.col
    val rows = Pipeline.annMmr(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 5))
    // replay: brute top-20 for query 0 and all pairwise cosines in Scala
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6).toLong
    }
    val q = emb(0L)
    val cand = emb.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, s) => (-s, id) }.take(20)
    var sel = List(cand.minBy { case (id, s) => (-s, id) })
    for (_ <- 2 to 5) {
      val rem = cand.filterNot(c => sel.exists(_._1 == c._1))
      val next = rem.map { case (id, sq) =>
        val pen = sel.map(s => cos(emb(id), emb(s._1))).max
        (id, sq, pen, sq - pen)
      }.minBy { case (id, _, _, mmr) => (-mmr, id) }
      sel = sel :+ ((next._1, next._2))
      val row = rows(sel.length - 1)
      assert(row.getLong(1) == next._1 && row.getLong(2) == next._2 &&
        row.getLong(3) == next._3 && row.getLong(4) == next._4,
        s"greedy step ${sel.length} drift: $row vs $next")
    }
    assert(rows(0).getLong(1) == cand.head._1 && rows(0).getLong(3) == 0L)
    // diversity: the MMR tail must differ from the plain top-5 (otherwise
    // the re-rank is a no-op and the test is vacuous)
    assert(rows.map(_.getLong(1)).toSet != cand.take(5).map(_._1).toSet,
      "MMR selected exactly the top-5 — no diversification exercised")
  }

  test("oversample balances every language to within one replication step") {
    val docs = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id").cast("long"),
        org.apache.spark.sql.functions.col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = docs.groupBy(_._2)
    val target = byLang.values.map(_.length).max.toLong
    val rows = Pipeline.pipeOversample(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == byLang.keySet)
    val nAfterTotal = rows.map(_.getLong(3)).sum
    rows.foreach { r =>
      val lang = r.getString(0)
      val n = byLang(lang).length.toLong
      val rep = (target + n - 1) / n
      assert(r.getLong(1) == n && r.getLong(2) == rep, s"counts: $r")
      assert(r.getLong(3) == n * rep, s"n_after: $r")
      // balanced: within one replication step of the target, never below
      assert(r.getLong(3) >= target && r.getLong(3) < target + n, s"balance: $r")
      // checksum = Σ doc_id · (1 + 2 + … + rep) proves the explode ran
      val want = byLang(lang).map(_._1).sum * (rep * (rep + 1) / 2)
      assert(r.getLong(4) == want, s"checksum: $r")
      assert(r.getLong(5) == n * 1000000L / docs.length, s"share before: $r")
      assert(r.getLong(6) == r.getLong(3) * 1000000L / nAfterTotal, s"share after: $r")
    }
    // the majority class keeps rep=1 (oversampling never shrinks or inflates it)
    assert(rows.exists(r => r.getLong(2) == 1L && r.getLong(1) == target))
  }

  test("l-diversity buckets equal a QI-class replay and flag homogeneity k cannot") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("source", "n_chars div 100 AS sb", "lang").collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getString(2)))
    val classes = docs.groupBy(_._1).toSeq.map { case (_, v) =>
      (v.length.toLong, v.map(_._2).distinct.length.toLong) }
    def bucket(l: Long) =
      if (l == 1) "1_homogeneous" else if (l == 2) "2_binary" else "3_plus"
    val want = classes.groupBy(t => bucket(t._2)).map { case (b, v) =>
      (b, v.length.toLong, v.map(_._1).sum, v.map(_._2).min, v.map(_._2).max)
    }.toSeq.sortBy(_._1)
    val total = classes.map(_._1).sum
    val got = Pipeline.qLDiversity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == want, "l-diversity profile drift")
    Pipeline.qLDiversity(spark, sf).collect().foreach { r =>
      assert(r.getLong(5) == r.getLong(2) * 1000000L / total, s"ppm: $r")
    }
  }

  test("class balance: shares partition the corpus, weights rebalance to uniform") {
    val rows = Pipeline.pipeClassBalance(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = rows.map(_.getLong(1)).sum
    val k = rows.length.toLong
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) * 1000000L / nDocs, s"docs ppm: $r")
      assert(r.getLong(5) == BigInt(nDocs) * 1000000 / (BigInt(k) * r.getLong(1)),
        s"weight: $r")
    }
    // weighted doc mass is uniform up to div flooring: w*n ~ total/k
    rows.foreach { r =>
      val mass = BigInt(r.getLong(5)) * r.getLong(1)
      val target = BigInt(nDocs) * 1000000 / k
      assert((mass - target).abs <= r.getLong(1), s"rebalanced mass drift: $r")
    }
  }

  test("memoized dedup builds return the SAME table per (session, corpus) and match the direct build") {
    // identity: the second ask is the cached DataFrame, not a rebuild
    assert(Dedup.memoLshPairs(spark, sf) eq Dedup.memoLshPairs(spark, sf))
    assert(Dedup.memoClusters(spark, sf) eq Dedup.memoClusters(spark, sf))
    assert(Dedup.memoSig(spark, sf) eq Dedup.memoSig(spark, sf))
    // equivalence: the shared build is row-identical to the direct one
    val direct = Dedup.nearDupClusters(Tables.documents(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val shared = Dedup.memoClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(shared == direct, "memoized cluster table drifted from the direct build")
  }

  test("incremental cluster merge equals the scratch rebuild (pipe_cluster_merge)") {
    // merge ≡ rebuild is the operator's correctness CONTRACT (the gate
    // proves it vs DuckDB's recursive closure; this pins it in-JVM):
    // contracting existing components to their cluster ids preserves
    // both the partition and the min-doc-id labeling
    val merged = Pipeline.clusterMerge(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rebuilt = Pipeline.dedupCluster(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(merged.length == rebuilt.length)
    assert(merged.sameElements(rebuilt),
      "incremental merge diverged from the scratch rebuild")
    // non-vacuous: the batch really attached to the existing corpus —
    // at least one cluster mixes new (doc_id%10==0) and existing docs
    val mixed = merged.groupBy(_._2).exists { case (_, ms) =>
      ms.exists(_._1 % 10 == 0) && ms.exists(_._1 % 10 != 0)
    }
    assert(mixed, "no cross-batch cluster at this SF - the merge path was vacuous")
  }

  test("cluster merge: a new doc BRIDGING two existing clusters merges them like a rebuild") {
    // the one topology the real corpus may never exercise at the gated
    // SFs: a batch doc that is a near-dup of TWO existing clusters at
    // once, so the merge must FUSE previously-distinct cluster ids.
    // Overlap geometry: n sits across a1's tail and b1's head, so
    // J(n,a1) ≈ J(n,b1) ≈ 0.55 ≥ τ=0.5 while J(a1,b1) ≈ 0.25 < τ.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val m = (1 to 22).map(i => s"m$i")
    val a1 = (m.take(16) ++ (1 to 6).map(i => s"x$i")).mkString(" ")
    val a2 = (m.take(16) ++ (1 to 5).map(i => s"x$i") :+ "x9").mkString(" ")
    val b1 = ((1 to 6).map(i => s"y$i") ++ m.drop(6)).mkString(" ")
    val b2 = ((1 to 5).map(i => s"y$i") :+ "y9") .mkString(" ") + " " + m.drop(6).mkString(" ")
    val n  = m.mkString(" ")
    val iso = "z1 z2 z3 z4 z5 z6 z7 z8"
    // ids: existing ≢ 0 (mod 10), the batch doc ≡ 0
    val docs = Seq(
      (1L, a1), (2L, a2), (21L, b1), (22L, b2), (3L, iso), (30L, n)
    ).toDF("doc_id", "text")
    val isNew = col("doc_id") % 10 === 0
    val tau = 500000L
    val bands = Dedup.bandsFromSig(Dedup.sigFromShingles(
      docs.select(col("doc_id"),
        org.apache.spark.sql.functions.explode(Dedup.shingles(col("text"))).as("s"))))
    val ex = Dedup.existingClustersFrom(docs, bands, isNew, tau)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // precondition: A={1,2} and B={21,22} are DISTINCT existing clusters
    assert(ex(1L) == ex(2L) && ex(21L) == ex(22L) && ex(1L) != ex(21L),
      s"existing topology wrong: $ex")
    val merged = Dedup.clusterMergeFrom(docs, bands, Dedup.existingClustersFrom(
        docs, bands, isNew, tau), isNew, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = merged.map(t => t._1 -> t._2).toMap
    // the bridge fused A, B, and the new doc into ONE cluster labeled
    // by the minimum member id (1), with the isolated doc a singleton
    assert(Seq(1L, 2L, 21L, 22L, 30L).map(byDoc).distinct == Seq(1L),
      s"bridge did not fuse the clusters: $byDoc")
    assert(byDoc(3L) == 3L, "isolated doc must stay a singleton")
    // and merge ≡ rebuild on the union corpus, row for row
    val rebuilt = Dedup.nearDupClusters(docs, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(merged.sorted.sameElements(rebuilt.sorted),
      "synthetic merge diverged from the scratch rebuild")
    // an over-bound batch takes the salted-shuffle fallback instead of
    // a forced broadcast (ADVICE r11 #4) — same rows, different join
    val fallback = Dedup.clusterMergeFrom(docs, bands, Dedup.existingClustersFrom(
        docs, bands, isNew, tau), isNew, tau, maxBroadcastRows = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fallback.sorted.sameElements(merged.sorted),
      "salted fallback path diverged from the broadcast path")
  }

  test("dup-cluster histogram partitions the corpus and matches the cluster table") {
    val clusters = Dedup.nearDupClusters(Tables.documents(spark, sf))
      .select("cluster_id").collect().map(_.getLong(0))
    val sizes = clusters.groupBy(identity).map(_._2.length.toLong).toSeq
    val want = sizes.groupBy(identity).map { case (k, v) =>
      (k, v.length.toLong, k * v.length) }.toSeq.sortBy(_._1)
    val got = Pipeline.pipeDupClusterStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, "cluster-size histogram drift")
    assert(got.map(_._3).sum == clusters.length.toLong)
  }

  test("bigram LM: probabilities are exact conditionals and ranks are total") {
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => r.getString(0).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .sliding(2).filter(_.length == 2).map(a => (a(0), a(1))))
    val cnt = toks.groupBy(identity).map { case (p, v) => p -> v.length.toLong }
    val ctxTotal = cnt.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    val rows = graft.operators.Text.bigramLm(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 60)
    rows.foreach { r =>
      val (ctx, nxt) = (r.getString(0), r.getString(2))
      assert(r.getLong(3) == cnt((ctx, nxt)), s"count: $r")
      assert(r.getLong(4) == ctxTotal(ctx), s"ctx total: $r")
      assert(r.getLong(5) == cnt((ctx, nxt)) * 1000000L / ctxTotal(ctx), s"p: $r")
    }
    rows.groupBy(_.getString(0)).foreach { case (ctx, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length), s"ranks: $ctx")
    }
  }

  test("vocabulary overlap equals the set-intersection replay over lang pairs") {
    val vocab = docs.select("lang", "text").collect()
      .groupBy(_.getString(0)).view.mapValues(_.flatMap(r =>
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)).toSet)
      .toMap
    val langs = vocab.keys.toSeq.sorted
    // read columns by name — the join order rearranges positions
    val byName = graft.operators.Text.vocabOverlap(spark, sf).collect().map { r =>
      (r.getAs[String]("lang_a"), r.getAs[String]("lang_b"),
        r.getAs[Long]("v_a"), r.getAs[Long]("v_b"),
        r.getAs[Long]("n_common"), r.getAs[Long]("jaccard_x1e6"))
    }
    assert(byName.length == langs.length * (langs.length - 1) / 2)
    byName.foreach { case (a, b, va, vb, nc, j) =>
      assert(a < b)
      assert(va == vocab(a).size.toLong && vb == vocab(b).size.toLong,
        s"vocab size drift for ($a,$b)")
      val wantN = (vocab(a) & vocab(b)).size.toLong
      assert(nc == wantN, s"intersection drift for ($a,$b)")
      assert(j == nc * 1000000L / (va + vb - nc), s"jaccard drift for ($a,$b)")
    }
    // the synthetic corpus shares a vocabulary across langs — overlap
    // must be substantial, or the query found the wrong grid
    assert(byName.forall(_._5 > 0), "disjoint vocabularies — check the token grid")
  }

  test("char entropy equals the floor-log2 replay and separates text from noise") {
    val domain = (('a' to 'z') ++ ('0' to '9') :+ ' ').toSet
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.filter(domain)).toMap
    val rows = graft.operators.Text.charEntropy(spark, sf).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val cs = texts(r.getLong(0))
      val cnt = cs.groupBy(identity).view.mapValues(_.length.toLong)
      val n = cs.length.toLong
      assert(r.getLong(1) == n, s"char count drift: $r")
      assert(r.getLong(2) == cnt.size.toLong, s"symbol count drift: $r")
      def bits(x: Long) = 63 - java.lang.Long.numberOfLeadingZeros(x)
      val h = cnt.values.map(c => c * bits(n / c)).sum * 100 / n
      assert(r.getLong(3) == h, s"entropy drift: $r")
      // bounded by log2(37) ~ 5.2; natural text sits below the max
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 520, s"entropy out of range: $r")
    }
  }

  test("t-closeness: total-variation distances equal the exact BigInt replay") {
    val rows0 = docs.select("source", "n_chars", "lang").collect()
      .map(r => ((r.getString(0), r.getLong(1) / 100), r.getString(2)))
    val byClass = rows0.groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.length.toLong).toMap).toMap
    val global = rows0.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = rows0.length.toLong
    def tvd(cls: Map[String, Long]): BigInt = {
      val k = cls.values.sum
      val num = global.map { case (lang, ng) =>
        (BigInt(cls.getOrElse(lang, 0L)) * n - BigInt(ng) * k).abs
      }.sum
      num * 1000000 / (BigInt(2) * n * k)
    }
    val want = byClass.map { case (key, cls) => key -> tvd(cls) }
    val out = Pipeline.qTCloseness(spark, sf).collect()
    assert(out.length == 5)
    out.foreach { r =>
      val key = (r.getString(1), r.getLong(2))
      assert(BigInt(r.getLong(5)) == want(key), s"tvd drift for $key")
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000000, s"tvd out of range: $r")
      assert((r.getInt(6) == 1) == (r.getLong(5) > 200000L), s"breach flag drift: $r")
      assert(r.getLong(3) == byClass(key).values.sum, s"class size drift: $key")
      assert(r.getLong(4) == byClass(key).size.toLong, s"lang count drift: $key")
    }
    // the page really is the worst classes: nothing outside beats rank 5
    val pageMin = out.map(_.getLong(5)).min
    val outsideMax = want.view.filterKeys(k =>
      !out.exists(r => (r.getString(1), r.getLong(2)) == k)).values
      .foldLeft(BigInt(0))(_ max _)
    assert(outsideMax <= pageMin, "a worse class was left off the page")
  }

  test("heaps curve: cumulative quarters replay and vocabulary growth is sublinear") {
    val docTok = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0) % 4,
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq))
    val rows = graft.operators.Text.heaps(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    rows.foreach { r =>
      val k = r.getLong(0)
      val in = docTok.filter(_._1 < k)
      assert(r.getLong(1) == in.length.toLong, s"doc count drift at quarter $k")
      val inst = in.map(_._2.length.toLong).sum
      assert(r.getLong(2) == inst, s"instance count drift at quarter $k")
      val voc = in.flatMap(_._2).distinct.length.toLong
      assert(r.getLong(3) == voc, s"vocabulary drift at quarter $k")
      assert(r.getLong(4) == voc * 10000L / inst, s"density drift at quarter $k")
    }
    // Heaps law: vocabulary grows, but slower than token mass — the
    // per-10k-token density must be non-increasing along the curve
    val dens = rows.map(_.getLong(4))
    assert(dens.zip(dens.tail).forall { case (a, b) => b <= a },
      "vocabulary density increased with corpus size — not a Heaps curve")
    val vocs = rows.map(_.getLong(3))
    assert(vocs.zip(vocs.tail).forall { case (a, b) => b >= a })
  }

  test("PQ quantization error equals the per-subspace argmin distance replay") {
    import graft.similarity.PqModel
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val rows = Pipeline.annPqError(spark, sf).collect()
    assert(rows.length == 20)
    def qerr(v: Array[Float]): Double =
      (0 until PqModel.M).map { m =>
        (0 until PqModel.K).map { k =>
          val c = PqModel.books(m)(k)
          (0 until PqModel.SubDim).map { j =>
            val d = v(m * PqModel.SubDim + j).toDouble - c(j).toDouble
            d * d
          }.sum
        }.min
      }.sum
    // NOTE: the engines compute vv − 2·dot + cc, not Σ(x−c)² — equal in
    // real arithmetic but not bit-for-bit in floats; compare with slack
    // well below the 1e-6 floor granularity times vector count
    val byId = vecs.toMap
    rows.foreach { r =>
      val want = qerr(byId(r.getLong(0)))
      assert(math.abs(r.getLong(1) / 1e6 - want) < 1e-4,
        s"quantization error drift for vec ${r.getLong(0)}")
    }
    // the page is the WORST vectors: every page error >= the corpus mean
    val mean = rows.head.getLong(2)
    assert(rows.forall(_.getLong(1) >= mean),
      "a top-20 worst vector scored below the corpus mean")
    val errs = rows.map(_.getLong(1))
    assert(errs.zip(errs.tail).forall { case (a, b) => a >= b })
  }

  test("probe sweep: recall grows with nprobe and never exceeds the truth set") {
    val rows = Pipeline.annProbeSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L))
    val nTruth = rows.head._2
    rows.foreach { case (_, nt, hits, rec) =>
      assert(nt == nTruth && hits <= nt)
      assert(rec == hits * 1000000L / nt, "recall arithmetic drift")
    }
    val recs = rows.map(_._4)
    assert(recs.zip(recs.tail).forall { case (a, b) => a <= b },
      "recall must be non-decreasing in nprobe (probed cells are nested)")
    // the sweep must show a real tradeoff: probing 4 cells beats 1
    assert(recs.last > recs.head, "nprobe had no effect — sweep vacuous")
    // limit check: probing EVERY cell degenerates to brute force exactly
    val embAll = Tables.embeddings(spark, sf)
    val pred = col("vec_id") % 97 === 0
    val brute = Similarity.bruteTopK(embAll, pred).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val all = Similarity.ivfTopK(embAll, pred, nProbe = 10,
        model = Some(graft.similarity.IvfModel.cells)).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(all == brute, "nprobe=cells must equal brute force exactly")
  }

  test("split leakage equals a driver-side 8-gram decontamination replay") {
    val tagged = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val id = r.getLong(0)
        val h = (id * 2654435761L) % 4294967296L
        val split = if (h < 3435973836L) "train" else if (h < 3865470566L) "val" else "test"
        val tk = r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        val grams = if (tk.length >= 8)
          tk.sliding(8).map(_.mkString("_")).toSet else Set.empty[String]
        (id, split, grams)
      }
    val trainGrams = tagged.filter(_._2 == "train").flatMap(_._3).toSet
    val want = tagged.filter(_._2 != "train").groupBy(_._2).map { case (sp, ds2) =>
      sp -> ((ds2.length.toLong, ds2.count(_._3.exists(trainGrams)).toLong))
    }
    val rows = Pipeline.splitLeakage(spark, sf).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (sp, n, bad) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert((n, bad) == want(sp), s"leakage drift for $sp")
      assert(r.getLong(3) == bad * 1000000L / n, s"ppm drift for $sp")
    }
    // the corpus must actually leak or the audit is vacuous
    assert(rows.map(_.getLong(2)).sum > 0, "no cross-split contamination found")
  }

  test("Kneser-Ney probabilities equal the exact discounted-interpolation replay") {
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => r.getString(0).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .sliding(2).filter(_.length == 2).map(a => (a(0), a(1))))
    val cnt = toks.groupBy(identity).map { case (p, v) => p -> v.length.toLong }
    val ctxTotal = cnt.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    val n1f = cnt.groupBy(_._1._1).map { case (c, m) => c -> m.size.toLong }
    val n1b = cnt.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val tTypes = cnt.size.toLong
    val rows = graft.operators.Text.kneserNey(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 60)
    rows.foreach { r =>
      val (ctx, nxt) = (r.getString(0), r.getString(2))
      val (c, ct, f, b) = (cnt((ctx, nxt)), ctxTotal(ctx), n1f(ctx), n1b(nxt))
      assert(r.getLong(3) == c && r.getLong(4) == ct, s"counts: $r")
      assert(r.getLong(5) == f && r.getLong(6) == b, s"continuation counts: $r")
      val want = (BigInt(math.max(4 * c - 3, 0L)) * tTypes * 1000000 +
        BigInt(3) * f * b * 1000000) / (BigInt(4) * ct * tTypes)
      assert(BigInt(r.getLong(7)) == want, s"pkn: $r")
      // interpolation floor: even a count-1 bigram keeps the backoff mass
      assert(r.getLong(7) > 0, s"smoothed probability vanished: $r")
    }
    rows.groupBy(_.getString(0)).foreach { case (ctx, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length), s"ranks: $ctx")
      // within a context the emitted page is ordered by the SMOOTHED prob
      val ps = rs.sortBy(_.getInt(1)).map(_.getLong(7))
      assert(ps.zip(ps.tail).forall { case (a, b) => a >= b }, s"page order: $ctx")
    }
  }

  test("surprisal bits equal the floor-log2 replay and bound the mean") {
    val docToks = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
    val tf = docToks.flatMap(_._2).groupBy(identity).map { case (t, v) => t -> v.length.toLong }
    val n = tf.values.sum
    def bits(t: String): Long = 63 - java.lang.Long.numberOfLeadingZeros(n / tf(t))
    val rows = graft.operators.Text.surprisal(spark, sf).collect()
    assert(rows.length == docToks.count(_._2.nonEmpty))
    rows.foreach { r =>
      val ts = docToks.toMap.apply(r.getLong(0))
      val total = ts.map(bits).sum
      assert(r.getLong(1) == ts.length.toLong && r.getLong(2) == total, s"bits: $r")
      assert(r.getLong(3) == total * 100 / ts.length, s"mean: $r")
    }
  }

  test("code-detect signals are the exact integer ratios on this prose corpus") {
    val rows = graft.operators.Text.codeDetect(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val t = texts(r.getLong(0))
      val sym = t.count(c => !c.isLetterOrDigit && c != ' ').toLong
      val dig = t.count(_.isDigit).toLong
      assert(r.getLong(3) == sym * 10000 / t.length, s"symbol bp: $r")
      assert(r.getLong(4) == dig * 10000 / t.length, s"digit bp: $r")
      // the synthetic corpus is pure prose: nothing should flag as code
      assert(r.getInt(6) == 0, s"prose flagged as code: $r")
    }
  }

  test("shard skew audit: every doc placed once, shares partition the corpus") {
    val rows = operators.Pipeline.pipeShardSkew(spark, sf).collect()
    assert(rows.length == 16, "one row per shard expected")
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "docs lost or double-placed")
    val totBytes = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) * 10000 / totBytes, "byte share drift")
      // skew is a corpus-level constant ≥ 10000 (max ≥ mean)
      assert(r.getLong(5) >= 10000L)
      assert(r.getLong(5) == rows.head.getLong(5))
    }
  }

  test("dedup rate by source partitions the corpus and agrees with exactKeep") {
    val rows = operators.Pipeline.pipeDedupRateBySource(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    val survivors = rows.map(_.getLong(3)).sum
    val keepCount = graft.dedup.Dedup.exactKeep(Tables.documents(spark, sf)).count()
    assert(survivors == keepCount, "per-source survivors disagree with exactKeep")
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1) && r.getLong(2) <= r.getLong(1))
    }
  }

  test("LSH sweep: candidate mass is monotone in band width and bounded by multiplicity") {
    val rows = operators.Pipeline.dedupLshSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 3)
    rows.foreach { case (b, r, _, mult, cand) =>
      assert(b * r == 64L, "configs must tile the 64-perm signature")
      assert(cand <= mult, "distinct candidates cannot exceed the multiplicity mass")
    }
    // lower S-curve threshold (more bands of fewer rows) ⇒ MORE candidates:
    // (32,2) ≥ (16,4) ≥ (8,8) in distinct pairs on any corpus
    val byBands = rows.sortBy(-_._1).map(_._5)
    assert(byBands.toSeq == byBands.sorted.reverse.toSeq,
      s"candidate counts not monotone in banding: ${rows.toSeq}")
    // the shipped (16,4) config's candidates must appear in the sweep
    assert(rows.exists(t => t._1 == 16 && t._5 > 0), "shipped config finds nothing")
  }

  test("cell purity partitions the corpus and audits the SHIPPED codebook") {
    val rows = operators.Pipeline.annCellPurity(spark, sf).collect()
    assert(rows.nonEmpty)
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nVecs, "vectors lost in cell assignment")
    rows.foreach { r =>
      val (n, nl, mn, p) = (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))
      assert(mn <= n && p == mn * 10000 / n)
      assert(mn * nl >= n, "majority count below the uniform floor")
    }
  }

  test("similarity histogram covers every adjacent pair with cosine in [-1, 1]") {
    val rows = operators.Pipeline.annSimHist(spark, sf).collect()
    assert(rows.nonEmpty)
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nVecs - 1, "pair count != n - 1")
    rows.foreach { r =>
      val (b, mn, mx) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(b >= -10 && b <= 10)
      assert(mn >= b * 100000 && mx < (b + 1) * 100000, s"bucket $b bounds: [$mn, $mx]")
      assert(mn >= -1000000L && mx <= 1000000L)
    }
  }

  test("OOV rate equals a driver-side split replay and type rate >= 0") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def bigrams(t: String): Seq[String] = {
      val toks = t.split(" ").filter(_.nonEmpty)
      if (toks.length < 2) Nil
      else toks.sliding(2).map(_.mkString("_")).toSeq.distinct
    }
    val train = docs.filter(_._1 % 2 == 0).flatMap(d => bigrams(d._2)).toSet
    val valOcc = docs.filter(_._1 % 2 != 0).flatMap(d => bigrams(d._2))
    val row = operators.Text.oovRate(spark, sf).collect().head
    assert(row.getLong(0) == train.size.toLong)
    assert(row.getLong(1) == valOcc.length.toLong)
    assert(row.getLong(3) == valOcc.count(b => !train(b)).toLong, "OOV occurrence drift")
    assert(row.getLong(5) == row.getLong(3) * 1000000L / row.getLong(1))
  }

  test("char trigrams: top-5 per lang, counts match a driver scan") {
    val byLang = Tables.documents(spark, sf).select("lang", "text").collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) =>
        l -> rs.flatMap(r => r.getString(1).toLowerCase.sliding(3).filter(_.length == 3))
          .groupBy(identity).map { case (t, v) => t -> v.size.toLong }
      }
    val rows = operators.Text.charTrigrams(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.length == math.min(5, byLang(lang).size))
      val want = byLang(lang).toSeq.sortBy { case (t, n) => (-n, t) }.take(rs.length)
      val got = rs.sortBy(_.getInt(1)).map(r => (r.getString(2), r.getLong(3))).toSeq
      assert(got == want, s"trigram profile drift for $lang")
    }
  }

  test("tokenizer fertility is >= 1 word-for-word and buckets cover the corpus") {
    val rows = operators.Pipeline.pipeTokenizerFertility(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // every whitespace word yields at least one BPE-ish token
      assert(r.getLong(5) >= 10000L, s"fertility below 1.0: $r")
    }
    val buckets = operators.Pipeline.pipePerplexityBucket(spark, sf).collect()
    assert(buckets.map(_.getLong(1)).sum == Tables.documents(spark, sf).count())
    buckets.foreach { b =>
      assert(b.getLong(0) >= 0 && b.getLong(0) <= 17, s"bucket outside log2 range: $b")
    }
  }

  test("curriculum stages partition the corpus and offsets are exact token prefix sums") {
    val rows = Pipeline.curriculum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    // stages partition the corpus: doc counts sum to |documents|
    assert(rows.map(_._2).sum == docs.count())
    // difficulty ranges respect the fixed band edges and never overlap
    val bands = Map(1L -> (0L, 2499L), 2L -> (2500L, 4999L), 3L -> (5000L, 7499L), 4L -> (7500L, 10000L))
    rows.foreach { case (st, _, _, lo, hi, _) =>
      val (bLo, bHi) = bands(st)
      assert(lo >= bLo && hi <= bHi, s"stage $st difficulty [$lo,$hi] escapes its band")
    }
    // start_tok is the exact prefix sum of earlier stages' token mass
    var cum = 0L
    rows.foreach { case (_, _, nTok, _, _, start) =>
      assert(start == cum, s"start_tok drift: got $start want $cum")
      cum += nTok
    }
  }

  test("temperature weights are exact isqrt shares that upweight low-resource langs") {
    val counts = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def isqrt(n: Long): Long = math.floor(math.sqrt(n.toDouble)).toLong
    val sqrtTotal = counts.values.map(isqrt).sum
    val nTotal = counts.values.sum
    val rows = Pipeline.temperature(spark, sf).collect()
    assert(rows.length == counts.size)
    rows.foreach { r =>
      val (lang, n, sq) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(n == counts(lang) && sq == isqrt(n), s"count/isqrt drift for $lang")
      assert(sq * sq <= n && (sq + 1) * (sq + 1) > n, s"isqrt not exact for $lang")
      assert(r.getLong(3) == n * 1000000L / nTotal, s"share drift for $lang")
      assert(r.getLong(4) == sq * 1000000L / sqrtTotal, s"weight drift for $lang")
      assert(r.getLong(5) == sq * 10000L / sqrtTotal, s"allocation drift for $lang")
    }
    // the defining property of temperature < inf on a skewed domain:
    // the minority langs gain weight vs their proportional share, the
    // majority (en) loses — and the rebalance is actually visible
    val en = rows.find(_.getString(0) == "en").get
    assert(en.getLong(4) < en.getLong(3), "majority lang not downweighted")
    rows.filterNot(_.getString(0) == "en").foreach { r =>
      assert(r.getLong(4) > r.getLong(3),
        s"low-resource lang ${r.getString(0)} not upweighted")
    }
  }

  test("span mask budgets follow the T5 arithmetic and starts are in range") {
    val rows = Pipeline.spanMask(spark, sf).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val (n, masked, spans) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(masked == math.max(1L, n * 15 / 100), s"mask budget drift: $r")
      assert(spans == math.max(1L, masked / 3), s"span count drift: $r")
      assert(r.getLong(4) == n - masked + spans, s"input_len drift: $r")
      assert(r.getLong(5) == masked + spans + 1, s"target_len drift: $r")
      val start = r.getLong(6)
      assert(start >= 0 && start <= math.max(n - masked, 0L), s"first span start out of range: $r")
    }
  }
}
