package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("as-of join: every click keeps the latest purchase at or before it") {
    val rows = Temporal.qAsofJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    // invariant: matched purchase ts <= click ts
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), s"purchase after click: $r")
    }
    // clicks count preserved (left join semantics)
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
    assert(rows.length == ev.filter(col("event_type") === "click").count())
  }

  test("as-of join matches a per-user scala reference on sf0.001") {
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .select("event_id", "user_id", "ts_us", "event_type").collect()
    val purchases = ev.filter(_.getString(3) == "purchase")
      .map(r => (r.getLong(1), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    val expect = ev.filter(_.getString(3) == "click").map { r =>
      val best = purchases.getOrElse(r.getLong(1), Array.empty[Long])
        .filter(_ <= r.getLong(2)).lastOption
      (r.getLong(0), best)
    }.toMap
    val got = Temporal.qAsofJoin(spark, sf).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == expect)
  }
}
