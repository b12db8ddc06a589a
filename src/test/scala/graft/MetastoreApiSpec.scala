package graft

import graft.search.MetastoreApi
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's controller tests (tests/test_controllers.py)
  * against the API facade.
  */
class MetastoreApiSpec extends AnyFunSuite {
  import SparkTestSession._

  test("empty search returns all published docs with totals (test:298-310)") {
    val r = MetastoreApi.search(spark, sf)
    assert(r.error.isEmpty)
    assert(r.total > 0)
    assert(r.totalBytes > 0)
    assert(r.results.count() <= 50) // default page size
  }

  test("json-quoted filter values match exactly (test:312-317)") {
    val r = MetastoreApi.search(spark, sf, args = Map("lang" -> Seq("\"en\"")))
    assert(r.error.isEmpty)
    val langs = r.results.select("lang").distinct().collect().map(_.getString(0))
    assert(langs.sameElements(Array("en")))
  }

  test("bad JSON value returns error envelope, not exception (test:360-365)") {
    val r = MetastoreApi.search(spark, sf, args = Map("lang" -> Seq("str6")))
    assert(r.error.isDefined)
    assert(r.total == 0 && r.totalBytes == 0.0)
  }

  test("nonexistent property returns error envelope (test:367-372)") {
    val r = MetastoreApi.search(spark, sf, args = Map("boxing" -> Seq("\"6\"")))
    assert(r.error.isDefined)
    assert(r.total == 0)
  }

  test("size is capped at 100 and summary counts all matches (test:381-386)") {
    val r = MetastoreApi.search(spark, sf, args = Map("size" -> Seq("105")))
    assert(r.results.count() <= 100)
    assert(r.total > 100)
  }

  test("from offsets the page without changing totals (test:388-393)") {
    val all = MetastoreApi.search(spark, sf, args = Map("size" -> Seq("100")))
    val page = MetastoreApi.search(spark, sf,
      args = Map("size" -> Seq("100"), "from" -> Seq("3")))
    assert(page.total == all.total)
    val a = all.results.collect().map(_.getLong(0)).drop(3)
    val b = page.results.collect().map(_.getLong(0))
    assert(b.take(a.length).sameElements(a))
  }

  test("filters AND across properties, OR across a property's values (test:333-345)") {
    val both = MetastoreApi.search(spark, sf,
      args = Map("lang" -> Seq("\"en\"", "\"fr\""), "source" -> Seq("\"src3\"")))
    assert(both.error.isEmpty && both.total > 0)
    val en = MetastoreApi.search(spark, sf,
      args = Map("lang" -> Seq("\"en\""), "source" -> Seq("\"src3\"")))
    val fr = MetastoreApi.search(spark, sf,
      args = Map("lang" -> Seq("\"fr\""), "source" -> Seq("\"src3\"")))
    assert(both.total == en.total + fr.total) // values OR (languages disjoint)
    val rows = both.results.select("lang", "source").distinct().collect()
    assert(rows.forall(r => Set("en", "fr")(r.getString(0)) && r.getString(1) == "src3"))
  }

  test("analyzed match-mode dataset filter case-folds and ORs value tokens (models.py:97)") {
    import org.apache.spark.sql.functions.col
    val ds = graft.search.SearchEngine.datasets
    val vis = ds.visible(Tables.datasetIndex(spark, sf), None)
    // term mode: 'EN' ≠ 'en' → empty; match mode: the value analyzes to
    // ['en'] and hits every en doc — the ES-5 divergence VERDICT r8 names
    assert(ds.filtered(vis, Map("lang" -> Seq("EN"))).isEmpty)
    val analyzed = ds.analyzedFiltered(vis, Map("lang" -> Seq("EN"))).count()
    assert(analyzed > 0 &&
      analyzed == ds.filtered(vis, Map("lang" -> Seq("en"))).count())
    // a multi-token value ORs its tokens (ES match default operator):
    // 'SRC3 Bogusterm' hits 'Owner src3' through the src3 token alone
    val multi = ds.analyzedFiltered(vis, Map("owner" -> Seq("SRC3 Bogusterm"))).count()
    assert(multi > 0 && multi == vis.filter(col("source") === "src3").count())
  }

  test("q search ranks and respects visibility (test:440-447)") {
    val anon = MetastoreApi.search(spark, sf, args = Map("q" -> Seq("\"merge join\"")))
    val auth = MetastoreApi.search(spark, sf, userid = Some("src5"),
      args = Map("q" -> Seq("\"merge join\"")))
    assert(anon.error.isEmpty && auth.error.isEmpty)
    assert(anon.total > 0)
    assert(auth.total >= anon.total)
  }

  test("auth token: valid HS256 grants owner visibility, invalid is anonymous (blueprint.py:22-28)") {
    import graft.search.AuthToken
    val key = "test-private-key".getBytes("UTF-8")
    val anon = MetastoreApi.search(spark, sf)
    val token = AuthToken.sign("src5", key)
    assert(AuthToken.userid(token, key).contains("src5"))
    val auth = MetastoreApi.searchWithToken(spark, sf, "dataset", Some(token), key, Map.empty)
    val direct = MetastoreApi.search(spark, sf, userid = Some("src5"))
    assert(auth.total == direct.total && auth.total > anon.total)
    // every invalid shape degrades to anonymous, never errors
    val bad = Seq(
      token.dropRight(2) + "xx",                        // broken signature
      AuthToken.sign("src5", "wrong-key".getBytes),     // wrong key
      "not-a-jwt", "", "a.b", "a.b.c.d", "##.##.##")    // malformed
    bad.foreach { t =>
      val r = MetastoreApi.searchWithToken(spark, sf, "dataset", Some(t), key, Map.empty)
      assert(r.error.isEmpty && r.total == anon.total, s"token '$t' must act anonymous")
    }
  }

  test("auth token: exp/nbf registered claims validate like pyjwt defaults") {
    import graft.search.AuthToken
    val key = "test-private-key".getBytes("UTF-8")
    val now = 1700000000L
    def uid(claims: Map[String, Long]): Option[String] =
      AuthToken.userid(AuthToken.sign("src5", key, claims), key, now)
    assert(uid(Map("exp" -> (now + 60))).contains("src5"))
    assert(uid(Map("exp" -> now)).contains("src5"))        // exp < now expires, == is valid
    assert(uid(Map("exp" -> (now - 1))).isEmpty)           // expired ≡ anonymous
    assert(uid(Map("nbf" -> now)).contains("src5"))        // nbf > now defers, == is valid
    assert(uid(Map("nbf" -> (now + 1))).isEmpty)           // not yet valid ≡ anonymous
    assert(uid(Map("nbf" -> (now - 60), "exp" -> (now + 60))).contains("src5"))
    // a well-signed but expired token must act anonymous end to end
    val expired = AuthToken.sign("src5", key, Map("exp" -> 1L))
    assert(AuthToken.userid(expired, key).isEmpty)
  }

  test("auth token: numeric-string exp/nbf claims coerce like pyjwt 1.x int() (ADVICE r3)") {
    import graft.search.AuthToken
    val key = "test-private-key".getBytes("UTF-8")
    val now = 1700000000L
    // hand-roll tokens whose time claims are JSON strings (sign() only
    // emits numeric claims)
    def mk(payload: String): String = {
      import javax.crypto.Mac
      import javax.crypto.spec.SecretKeySpec
      val e = java.util.Base64.getUrlEncoder.withoutPadding()
      val h = e.encodeToString("""{"alg":"HS256","typ":"JWT"}""".getBytes("UTF-8"))
      val p = e.encodeToString(payload.getBytes("UTF-8"))
      val mac = Mac.getInstance("HmacSHA256")
      mac.init(new SecretKeySpec(key, "HmacSHA256"))
      val sig = e.encodeToString(mac.doFinal(s"$h.$p".getBytes("UTF-8")))
      s"$h.$p.$sig"
    }
    def uid(payload: String): Option[String] = AuthToken.userid(mk(payload), key, now)
    assert(uid(s"""{"userid":"src5","exp":"${now + 60}"}""").contains("src5"))
    assert(uid(s"""{"userid":"src5","exp":"${now - 1}"}""").isEmpty)   // string claim still expires
    assert(uid(s"""{"userid":"src5","nbf":"${now - 60}"}""").contains("src5"))
    assert(uid(s"""{"userid":"src5","nbf":"${now + 60}"}""").isEmpty)
    assert(uid(s"""{"userid":"src5","exp":"oops"}""").isEmpty)         // non-coercible ⇒ malformed
  }

  // --- events-kind reference vectors, test_controllers.py:559-590 ------
  // indexSomeEventRecords(10): record i has year 2000+i,
  // entity = flow unless i%3==0 (else login), action = finished unless
  // i%4==0 (else deleted), findability = published unless i%2==0 (else
  // unlisted), ownerid = datahubid — replayed verbatim so the reference
  // counts pin the visibility ∧ filter algebra.
  private def eventFixture: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (0 until 10).map { i =>
      (i.toLong,
        java.time.LocalDateTime.of(2000 + i, 1, 1, 0, 0)
          .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L,
        if (i % 3 != 0) "flow" else "login",
        if (i % 4 != 0) "finished" else "deleted",
        "datahubid",
        if (i % 2 != 0) "published" else "unlisted",
        100.0)
    }.toDF("event_id", "ts_us", "event_entity", "event_action",
      "ownerid", "findability", "value")
  }
  private def eventPage(docs: org.apache.spark.sql.DataFrame,
                        userid: Option[String],
                        filters: Map[String, Seq[String]] = Map.empty) = {
    val eng = graft.search.SearchEngine.events
    eng.sortedPage(docs, graft.search.SearchRequest(
      userid = userid, filters = filters), "ts_us", docs.columns.toSeq)
  }

  test("events: empty index yields empty results and zero summary (test:557-558)") {
    import org.apache.spark.sql.functions.col
    val docs = eventFixture.filter(col("event_id") < 0)
    assert(eventPage(docs, None).count() == 0)
    val sm = graft.search.SearchEngine.events
      .summary(docs, graft.search.SearchRequest()).collect()(0)
    assert(sm.getLong(0) == 0L && sm.get(1).toString.toDouble == 0.0)
  }

  test("events: unlisted rows hidden from anon, visible with owner id (test:560-572)") {
    val docs = eventFixture
    assert(eventPage(docs, None).count() == 5)                   // published only
    assert(eventPage(docs, Some("datahubid")).count() == 10)     // own unlisted too
  }

  test("events: per-dimension filter counts match the reference (test:574-590)") {
    val docs = eventFixture
    val own = Some("datahubid")
    assert(eventPage(docs, own,
      Map("findability" -> Seq("unlisted"))).count() == 5)
    assert(eventPage(docs, own,
      Map("event_action" -> Seq("finished"))).count() == 7)
    assert(eventPage(docs, own,
      Map("event_entity" -> Seq("flow"))).count() == 6)
    assert(eventPage(docs, own,
      Map("event_entity" -> Seq("flow"),
          "event_action" -> Seq("finished"))).count() == 4)
  }

  test("events: fixture page sorts 2009 first desc, 2000 first asc (test:592-599)") {
    val docs = eventFixture
    val eng = graft.search.SearchEngine.events
    def years(asc: Boolean) =
      eng.sortedPage(docs, graft.search.SearchRequest(
          userid = Some("datahubid"), sortAsc = asc), "ts_us", Seq("ts_us"))
        .collect().map(r => java.time.LocalDateTime
          .ofEpochSecond(r.getLong(0) / 1000000L, 0, java.time.ZoneOffset.UTC).getYear)
    val desc = years(asc = false)
    assert(desc.head == 2009 && desc.last == 2000)
    val ascY = years(asc = true)
    assert(ascY.head == 2000 && ascY.last == 2009)
  }

  test("events kind sorts by timestamp desc by default (test:592-599)") {
    val r = MetastoreApi.search(spark, sf, kind = "events", userid = Some("user3"))
    val ts = r.results.select("ts_us").collect().map(_.getLong(0))
    assert(ts.nonEmpty)
    assert(ts.sameElements(ts.sortBy(-(_: Long))))
    val asc = MetastoreApi.search(spark, sf, kind = "events",
      userid = Some("user3"), args = Map("sort" -> Seq("\"asc\"")))
    val ts2 = asc.results.select("ts_us").collect().map(_.getLong(0))
    assert(ts2.sameElements(ts2.sorted))
  }
}
