package graft.tools

import org.apache.spark.sql.functions._

/** Offline trainer for the two-level residual-quantization codebooks
  * pinned in [[graft.similarity.RqModel]] — the train/serve split that
  * makes `ann_rq_topk` pure deterministic literal arithmetic at query
  * time (same pattern as [[TrainIvf]] / [[TrainPq]]).
  *
  * Level 1: K1 centroids over the FULL dim-d vectors (Lloyd, residue
  * init, L2 argmin with lowest-index ties). Level 2: K2 centroids over
  * the level-1 residuals x − c1[a1(x)] — the classic residual/additive
  * quantizer layout (Chen, Guan & Wang 2010; public literature): where
  * PQ partitions the COORDINATES, RQ refines the APPROXIMATION, so the
  * second book captures structure that spans subspaces. Prints the
  * Scala source of RqModel to stdout.
  *
  * Usage: TrainRq [sfDir] (default /root/testdata/sf0.01)
  */
object TrainRq {
  val K1 = 16
  val K2 = 16
  val Iters = 4

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(logLevel = "ERROR")
    val rows = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    require(rows.nonEmpty, s"empty embeddings corpus at $sfDir — nothing to train on")
    val dim = rows.head._2.length

    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var j = 0
      while (j < a.length) { val d = a(j) - b(j); s += d * d; j += 1 }
      s
    }
    def meanOf(group: Seq[Array[Double]]): Array[Double] = {
      val acc = new Array[Double](dim)
      group.foreach(v => (0 until dim).foreach(j => acc(j) += v(j)))
      acc.map(_ / group.size)
    }
    def lloyd(vs: Array[(Long, Array[Double])], k: Int): IndexedSeq[Array[Double]] = {
      var cents: IndexedSeq[Array[Double]] = {
        val byRes = vs.groupBy(t => (t._1 % k).toInt)
        val fallback = meanOf(vs.map(_._2).toSeq)
        (0 until k).map(c =>
          byRes.get(c).map(g => meanOf(g.map(_._2).toSeq)).getOrElse(fallback))
      }
      for (_ <- 1 to Iters) {
        val assigned = vs.map { case (_, v) =>
          var best = 0; var bd = dist2(v, cents(0))
          for (c <- 1 until k) {
            val d = dist2(v, cents(c)); if (d < bd) { bd = d; best = c }
          }
          (best, v)
        }
        val byCell = assigned.groupBy(_._1)
        cents = (0 until k).map(c =>
          byCell.get(c).map(g => meanOf(g.map(_._2).toSeq)).getOrElse(cents(c)))
      }
      cents
    }

    val level1 = lloyd(rows, K1)
    // level-1 residuals carry the vec_id so residue init stays pinned
    val residuals = rows.map { case (id, v) =>
      var best = 0; var bd = dist2(v, level1(0))
      for (c <- 1 until K1) {
        val d = dist2(v, level1(c)); if (d < bd) { bd = d; best = c }
      }
      (id, (0 until dim).map(j => v(j) - level1(best)(j)).toArray)
    }
    val level2 = lloyd(residuals, K2)

    def emit(name: String, cents: IndexedSeq[Array[Double]]): Unit = {
      println(s"  val $name: Seq[Seq[Float]] = Seq(")
      cents.foreach(c =>
        println("    Seq(" + c.map(x => s"${x.toFloat}f").mkString(", ") + "),"))
      println("  )")
    }
    println("package graft.similarity")
    println()
    println("/** Pinned residual-quantization codebooks — trained offline by")
    println(s"  * [[graft.tools.TrainRq]] (K1=$K1 full-dim level-1 centroids,")
    println(s"  * K2=$K2 centroids over level-1 residuals, Lloyd iters=$Iters,")
    println(s"  * corpus $sfDir). Serve-side encode/ADC are literal arithmetic")
    println("  * over these floats, so ann_rq_topk has an exact DuckDB rendering.")
    println("  */")
    println("object RqModel {")
    println(s"  val K1 = $K1")
    println(s"  val K2 = $K2")
    println(s"  val Dim = $dim")
    emit("level1", level1)
    emit("level2", level2)
    println("}")
  }
}
