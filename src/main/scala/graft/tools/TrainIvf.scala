package graft.tools


/** Offline IVF codebook training — the train side of the train/serve
  * split: Lloyd's k-means over the embeddings table, emitted as Scala
  * source for [[graft.similarity.IvfModel]]. The serving query
  * (`ann_ivf_topk`) embeds the codebook as literals, so assignment and
  * probing are pure deterministic arithmetic (and therefore
  * oracle-gateable); re-run this tool to refresh the model when the
  * corpus distribution shifts.
  */
object TrainIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.local(cpus, logLevel = "ERROR")
    val cents = graft.similarity.Similarity.kmeansCentroids(
      graft.Tables.embeddings(spark, sfDir), cells = 10, iters = 4)
    println(s"// trained on $sfDir (cells=10, iters=4)")
    println("val cells: Seq[Seq[Float]] = Seq(")
    cents.foreach { c =>
      println(c.map(f => f.toString + "f").mkString("  Seq(", ", ", "),"))
    }
    println(")")
    spark.stop()
  }
}
