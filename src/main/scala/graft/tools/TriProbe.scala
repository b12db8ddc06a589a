package graft.tools

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Stage-by-stage probe for q_triangle_count: times each factored stage
  * builder of [[graft.operators.Graph.triangleCounts]] — the SAME code
  * the shipped query runs, so probe numbers can't drift from the real
  * pipeline (ADVICE r5).
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val s = graft.GraftSession.local(logLevel = "ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      val e = t("edges+distinct+ckpt") { Graph.triEdges(s, d) }
      val oriented = t("orient+ckpt") { Graph.triOriented(e) }
      val adj = t("adj+ckpt") { Graph.triAdjacency(oriented) }
      t("closure probe + credits agg") {
        Graph.triCreditRows(s, oriented, adj)
          .groupBy(col("part")).agg(sum(col("c")).as("n_tri"))
          .orderBy(col("part")).count()
      }
      graft.GraftSession.dropDeadBlocks(s)
    }
  }
}
