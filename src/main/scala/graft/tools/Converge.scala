package graft.tools

/** Dev-only convergence probe for the fixed-round iterative graph
  * queries (VERDICT r6 item 8): the gated operators pin R rounds
  * (components R=8, labelProp R=6, kcore R=12) and GraphSpec pins
  * fixpoint only at the small gated SFs — this tool checks, at an
  * ARBITRARY GenData dir, that round R has already reached the
  * fixpoint (R vs R+1 outputs identical), i.e. the unrolled
  * recurrence is still exact as the graph grows. Not part of the
  * driver protocol.
  *
  * Usage: Converge <sfDir> [componentsR] [labelPropR] [kcoreR]
  */
object Converge {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cR = args.lift(1).map(_.toInt).getOrElse(8)
    val lR = args.lift(2).map(_.toInt).getOrElse(6)
    val kR = args.lift(3).map(_.toInt).getOrElse(12)
    val s = graft.GraftSession.local(logLevel = "ERROR")
    def diff(name: String, a: org.apache.spark.sql.DataFrame,
             b: org.apache.spark.sql.DataFrame): Unit = {
      val extra = a.exceptAll(b).count()
      val missing = b.exceptAll(a).count()
      val verdict = if (extra == 0 && missing == 0) "CONVERGED" else "NOT CONVERGED"
      println(f"$name%-12s rows=${a.count()}%-7d R-vs-R+1 diff: +$extra -$missing  $verdict")
    }
    diff(s"components@$cR",
      graft.operators.Graph.components(s, dir, iters = cR),
      graft.operators.Graph.components(s, dir, iters = cR + 1))
    diff(s"labelProp@$lR",
      graft.operators.Graph.labelProp(s, dir, iters = lR),
      graft.operators.Graph.labelProp(s, dir, iters = lR + 1))
    diff(s"kcore@$kR",
      graft.operators.Graph.kcore(s, dir, rounds = kR),
      graft.operators.Graph.kcore(s, dir, rounds = kR + 1))
    s.stop()
  }
}
