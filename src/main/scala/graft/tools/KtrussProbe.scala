package graft.tools

import graft.operators.Graph

/** Measured-alternatives probe for q_ktruss (VERDICT r13 #3): times the
  * shipped INCREMENTAL peel (witness-table delta anti-joins per round)
  * against the r13 FULL recount (Σ min-deg² closure re-probe per round)
  * on the same session, same pinned base tables — so the delta is the
  * recount strategy alone. Rep 1 includes the shared witness build
  * (charged to whichever variant runs first at ingest); reps 2+ are the
  * steady-state numbers SCALING quotes. Also verifies the two variants
  * return identical rows.
  *
  * Run: java ... graft.tools.KtrussProbe <sfDir> [reps]
  */
object KtrussProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val s = graft.GraftSession.local(logLevel = "ERROR")
    def t(label: String)(f: => Seq[String]): Seq[String] = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    var last: (Seq[String], Seq[String]) = (Nil, Nil)
    for (rep <- 1 to reps) {
      println(s"--- rep $rep")
      val inc = t("ktruss incremental") {
        Graph.ktruss(s, d).collect().map(_.toSeq.mkString(",")).toSeq
      }
      graft.GraftSession.dropDeadBlocks(s)
      val full = t("ktruss full recount") {
        Graph.ktruss(s, d, incremental = false)
          .collect().map(_.toSeq.mkString(",")).toSeq
      }
      graft.GraftSession.dropDeadBlocks(s)
      last = (inc, full)
    }
    assert(last._1 == last._2,
      "incremental and full k-truss recounts DIVERGED — delta logic is wrong")
    println(s"outputs identical: ${last._1.size} rows")
  }
}
