package graft

import graft.sources.Formats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FormatsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(suffix: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-fmt-$suffix").toString

  test("parquet partitioned write/read roundtrip") {
    val docs = Tables.documents(spark, sf)
    val path = s"${tmp("pq")}/docs"
    Formats.writeParquet(docs, path, partitionBy = Seq("lang"))
    val back = Formats.readParquet(spark, path)
    assert(back.count() == docs.count())
    // partition pruning: a lang filter scans one partition directory
    val pruned = back.filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    assert(pruned.count() == docs.filter(col("lang") === "en").count())
  }

  test("csv and jsonl roundtrip with pinned schemas") {
    val docs = Tables.documents(spark, sf).orderBy("doc_id")
    val csvPath = s"${tmp("csv")}/docs"
    Formats.writeCsv(docs, csvPath)
    val backCsv = Formats.readCsv(spark, csvPath, docs.schema).orderBy("doc_id")
    assert(backCsv.collect().map(_.toSeq).toSeq == docs.collect().map(_.toSeq).toSeq)

    val jsonPath = s"${tmp("json")}/docs"
    Formats.writeJsonl(docs, jsonPath)
    val backJson = Formats.readJsonl(spark, jsonPath, docs.schema).orderBy("doc_id")
    assert(backJson.collect().map(_.toSeq).toSeq == docs.collect().map(_.toSeq).toSeq)
  }
}
