package graft.tools

import org.apache.spark.sql.functions._

/** Offline trainer for the product-quantization codebooks pinned in
  * [[graft.similarity.PqModel]] — the train/serve split that makes
  * `ann_pq_topk` pure deterministic literal arithmetic at query time
  * (same pattern as [[TrainIvf]] / IvfModel).
  *
  * M subspaces × K centroids, each over dim/M components; per-subspace
  * Lloyd's k-means with the same deterministic init (vec_id mod K
  * residue means) and argmin tie-break (lowest index) the serve side
  * uses. Prints the Scala source of PqModel to stdout.
  *
  * Usage: TrainPq [sfDir] (default /root/testdata/sf0.01)
  */
object TrainPq {
  val M = 8
  val K = 16
  val Iters = 4

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(logLevel = "ERROR")
    val rows = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val dim = rows.head._2.length
    val sub = dim / M

    def dist2(a: Array[Double], b: Array[Double]): Double = {
      // in-order accumulation, same fold the serve-side chains use
      var s = 0.0
      var j = 0
      while (j < a.length) { val d = a(j) - b(j); s += d * d; j += 1 }
      s
    }

    val books = (0 until M).map { m =>
      val vs = rows.map { case (id, e) =>
        (id, (m * sub until (m + 1) * sub).map(j => e(j).toDouble).toArray)
      }
      def meanOf(group: Seq[Array[Double]]): Array[Double] = {
        val acc = new Array[Double](sub)
        group.foreach(v => (0 until sub).foreach(j => acc(j) += v(j)))
        acc.map(_ / group.size)
      }
      var cents: IndexedSeq[Array[Double]] = {
        val byRes = vs.groupBy(t => (t._1 % K).toInt)
        val fallback = meanOf(vs.map(_._2).toSeq)
        (0 until K).map(k => byRes.get(k).map(g => meanOf(g.map(_._2).toSeq)).getOrElse(fallback))
      }
      for (_ <- 1 to Iters) {
        val assigned = vs.map { case (_, v) =>
          var best = 0; var bd = dist2(v, cents(0))
          for (k <- 1 until K) {
            val d = dist2(v, cents(k)); if (d < bd) { bd = d; best = k }
          }
          (best, v)
        }
        val byCell = assigned.groupBy(_._1)
        cents = (0 until K).map(k =>
          byCell.get(k).map(g => meanOf(g.map(_._2).toSeq)).getOrElse(cents(k)))
      }
      cents.map(_.map(_.toFloat).toSeq)
    }

    println("package graft.similarity")
    println()
    println("/** Pinned product-quantization codebooks — trained offline by")
    println(s"  * [[graft.tools.TrainPq]] (M=$M subspaces x K=$K centroids over")
    println(s"  * ${sub}-dim subvectors, Lloyd iters=$Iters, corpus $sfDir).")
    println("  * Serve-side encode/ADC are literal arithmetic over these floats,")
    println("  * so the whole ann_pq_topk plan has an exact DuckDB rendering.")
    println("  */")
    println("object PqModel {")
    println(s"  val M = $M")
    println(s"  val K = $K")
    println(s"  val SubDim = $sub")
    println("  // books(m)(k) = centroid k of subspace m")
    println("  val books: Seq[Seq[Seq[Float]]] = Seq(")
    books.foreach { b =>
      println("    Seq(")
      b.foreach(c => println("      Seq(" + c.map(x => s"${x}f").mkString(", ") + "),"))
      println("    ),")
    }
    println("  )")
    println("}")
  }
}
