package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage probe for q_triangle_count (not shipped as a
  * query; used to locate the wall-time inside the plan).
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
      val li = Tables.fanOut(Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")))
      val e = t("edges+distinct+ckpt") {
        Tables.fanOut(li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .select(col("x.pk").as("a"), col("y.pk").as("b"))
          .distinct()
          .localCheckpoint())
      }
      val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val oriented = e
        .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
        .select(
          when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
            struct(col("a").as("src"), col("b").as("dst")))
            .otherwise(struct(col("b").as("src"), col("a").as("dst"))).as("o"))
        .select(col("o.src").as("src"), col("o.dst").as("dst"))
      val or2 = t("orient+ckpt") { oriented.localCheckpoint() }
      val adj = t("adj+ckpt") {
        or2.groupBy(col("src"))
          .agg(sort_array(collect_set(col("dst"))).as("nbrs")).localCheckpoint()
      }
      val par = s.sparkContext.defaultParallelism
      val witnesses = t("witness join+intersect") {
        or2.repartition(par, col("src"))
          .join(adj.select(col("src"), col("nbrs").as("nu")), "src")
          .repartition(par, col("dst"))
          .join(adj.select(col("src").as("dst"), col("nbrs").as("nv")), "dst")
          .select(col("src"), col("dst"),
            graft.functions.TextExpressionFunctions
              .sortedIntersectLongs(col("nu"), col("nv")).as("ws"))
          .filter(size(col("ws")) > 0)
          .localCheckpoint()
      }
      t("credits agg") {
        val uvCredits = witnesses.select(
            explode(array(col("src"), col("dst"))).as("part"),
            size(col("ws")).cast("long").as("c"))
        val wCredits = witnesses
          .select(explode(col("ws")).as("part"), lit(1L).as("c"))
        uvCredits.unionByName(wCredits)
          .groupBy(col("part")).agg(sum(col("c")).as("n_tri"))
          .orderBy(col("part")).count()
      }
      graft.GraftSession.dropDeadBlocks(s)
    }
  }
}
