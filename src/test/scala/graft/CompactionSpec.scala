package graft

import graft.sources.Compaction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the compaction sink: content identity through the rewrite, the
  * measured-bytes file plan, and clustering preservation under the
  * sorted variant.
  */
class CompactionSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name")
    d.toFile.deleteOnExit()
    d.resolve("data").toString
  }

  test("compaction rewrites a fragmented table to the planned file count, content-identical") {
    val frag = tmp("frag")
    Tables.documents(spark, sf).repartition(64).write.parquet(frag)
    val fragged = spark.read.parquet(frag)
    assert(fragged.inputFiles.length == 64, "fragmentation setup")

    val out = tmp("compact")
    val bytes = Compaction.inputBytes(spark, fragged)
    val target = bytes / 4 + 1
    val planned = Compaction.compact(spark, fragged, out, target)
    assert(planned == Compaction.planFiles(bytes, target))
    assert(planned >= 2 && planned < 64, s"plan $planned should consolidate 64 files")

    val sizes = Compaction.fileSizes(spark, out)
    assert(sizes.length == planned, s"wrote ${sizes.length} files, planned $planned")

    // content identity: same rows, same doc_id multiset
    val a = Tables.documents(spark, sf)
    val b = spark.read.parquet(out)
    assert(b.count() == a.count())
    val ck = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(sum(col("doc_id")).cast("long"), count(lit(1))).collect().head
    assert(ck(b) == ck(a))
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty)
  }

  test("sorted compaction keeps disjoint per-file key ranges for min/max pruning") {
    val frag = tmp("frag2")
    // shuffle the rows so any clustering must come from the compactor
    Tables.documents(spark, sf).repartition(32).write.parquet(frag)
    val out = tmp("sorted")
    val fragged = spark.read.parquet(frag)
    val n = Compaction.compact(spark, fragged, out,
      Compaction.inputBytes(spark, fragged) / 3 + 1, sortCol = Some("doc_id"))
    val envs = spark.read.parquet(out)
      .groupBy(input_file_name())
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    // range partitioning samples its boundaries, so a planned partition
    // can come up empty (and writes no file) — assert the plan as an
    // upper bound, not an exact count
    assert(envs.length >= 2 && envs.length <= n, s"${envs.length} files vs plan $n")
    // ranges must not overlap — that's what makes min/max stats prune
    envs.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap: $hi >= $lo2")
      case _ =>
    }
  }
}
