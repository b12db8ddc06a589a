package graft

import graft.text.PorterStemmer
import graft.search.Analyzer
import graft.operators.Metastore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyzerSpec extends AnyFunSuite {
  import SparkTestSession._

  test("Porter stemmer matches canonical vectors") {
    val vectors = Map(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat", "feed" -> "feed",
      "agreed" -> "agre", "plastered" -> "plaster", "motoring" -> "motor",
      "sing" -> "sing", "conflated" -> "conflat", "troubled" -> "troubl",
      "sized" -> "size", "hopping" -> "hop", "tanned" -> "tan",
      "falling" -> "fall", "hissing" -> "hiss", "failing" -> "fail",
      "filing" -> "file", "happy" -> "happi", "relational" -> "relat",
      "conditional" -> "condit", "rational" -> "ration",
      "digitizer" -> "digit", "operator" -> "oper", "feudalism" -> "feudal",
      "adjustment" -> "adjust", "adoption" -> "adopt", "merging" -> "merg",
      "merge" -> "merg", "tables" -> "tabl", "table" -> "tabl",
      "probate" -> "probat", "controllable" -> "control", "rolling" -> "roll")
    vectors.foreach { case (in, out) =>
      assert(PorterStemmer.stem(in) == out, s"stem($in)")
    }
  }

  test("graft SQL functions register and evaluate") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_stem('relational') AS s, graft_poly_hash('ab c') AS h, " +
        "float_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "              array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect()(0)
    assert(r.getString(0) == "relat")
    assert(r.getLong(1) == 2984996L) // matches the HOF fold + DuckDB list_reduce
    assert(r.getDouble(2) == 11.0)
  }

  test("graft SQL sketch/text functions (scalar + aggregate) evaluate") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT word_shingles('a b c a', 2) AS sh, " +
        "word_pairs(array('b','a','b')) AS wp, " +
        "sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS ic")
      .collect()(0)
    assert(r.getSeq[String](0) == Seq("a_b", "b_c", "c_a"))
    assert(r.getSeq[String](1) == Seq("a b"))
    assert(r.getLong(2) == 2L)
    val agg = spark.sql(
      "SELECT bottom_k(h, 3) AS bk, size(minhash_sig(h)) AS ms " +
        "FROM (SELECT CAST(id * 7 % 11 AS BIGINT) AS h FROM range(50))")
      .collect()(0)
    assert(agg.getSeq[Long](0) == Seq(0L, 1L, 2L))
    assert(agg.getInt(1) == 64)
    val vs = spark.sql(
      "SELECT vector_sum(v, 2) AS s FROM (SELECT array(CAST(1.0 AS DOUBLE), " +
        "CAST(2.0 AS DOUBLE)) AS v FROM range(3))")
      .collect()(0)
    assert(vs.getSeq[Double](0) == Seq(3.0, 6.0))
  }

  test("PorterStem codegen path (non-foldable column) equals the scala stemmer") {
    import spark.implicits._
    // a real column projection compiles through doGenCode (a literal
    // argument would constant-fold through eval instead)
    val words = Seq("merging", "relational", "controllable", "rolling", "caresses", "ties")
    val got = words.toDF("w")
      .select(graft.functions.TextExpressionFunctions.porterStem(col("w")).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(got == words.map(PorterStemmer.stem))
  }

  test("stemmed search finds morphological variants exact match misses (test:522-553)") {
    // "merging" stems to "merg", matching docs that contain "merge"
    val stemmed = Metastore.qMatchStemmed(spark, sf).count()
    val exactOnMerge = Tables.datasetIndex(spark, sf)
      .filter(col("findability") === "published")
      .filter(graft.search.SearchEngine.datasets.matchesQ(Seq("merge", "join", "table")))
      .count()
    assert(stemmed > 0)
    // the stemmed match over variants equals the exact match over the base
    // forms present in the corpus (vocab contains only base forms)
    assert(stemmed == math.min(exactOnMerge, 100))
  }

  test("stemmed-match oracle expansion covers the live corpus vocabulary") {
    // the ms_q_match_stemmed DuckDB oracle hardcodes the expansion
    // {merge, join, table}; recompute it here from the REAL index
    // vocabulary + the REAL stemmer so a vocab or stemmer change breaks
    // this spec before it breaks the driver gate
    import graft.search.Analyzer
    val queryStems = Analyzer.analyzeQueryStemmed("merging joined tables").toSet
    val vocab = Tables.datasetIndex(spark, sf)
      .select(explode(array(Seq("title", "owner", "ownerid", "readme")
        .map(f => Analyzer.tokens(col(f))): _*)).as("ts"))
      .select(explode(col("ts")).as("t"))
      .distinct().collect().map(_.getString(0))
    val expansion = vocab.filter(w => queryStems.contains(graft.text.PorterStemmer.stem(w))).toSet
    assert(expansion == Set("merge", "join", "table"),
      s"oracle literal list is stale; live expansion = $expansion")
  }

  test("polyHash column function equals the HOF fingerprint") {
    val df = Tables.documents(spark, sf).limit(50)
    val mismatches = df.select(
        graft.functions.TextExpressionFunctions.polyHash(col("text")).as("a"),
        graft.text.TextFunctions.fingerprint(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatches == 0)
  }
}
