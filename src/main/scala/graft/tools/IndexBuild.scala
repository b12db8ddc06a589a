package graft.tools

import graft.GraftSession
import graft.sources.IndexStore

/** Build the catalog of serving indexes over a corpus and persist
  * them as a parquet store (+ manifest) — the ingest-time half of the
  * IndexStore ingest→serve loop. Usage:
  *
  *   graft.tools.IndexBuild <corpusDir> <storeDir> [indexName...]
  *
  * With no names, every catalog index is built. Any session started
  * with SPARK_GRAFT_INDEX_DIR=<storeDir> then serves the persisted
  * tables instead of rebuilding them (build-once/load-many timings:
  * SCALING.md).
  */
object IndexBuild {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: IndexBuild <corpusDir> <storeDir> [indexName...]")
    val Array(corpus, store) = args.take(2)
    val spark = GraftSession.local()
    val t0 = System.nanoTime()
    val entries = IndexStore.save(spark, corpus, store, args.drop(2).toSeq)
    entries.foreach { case (name, rows, sec) =>
      println(f"SAVED $name%-24s $rows%10d rows  $sec%8.2f s")
    }
    println(f"TOTAL ${entries.size} indexes in ${(System.nanoTime() - t0) / 1e9}%.2f s -> $store")
    spark.stop()
  }
}
