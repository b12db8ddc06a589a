package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("forward as-of: every click keeps the earliest purchase at or after it") {
    val rows = Temporal.qAsofForward(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getLong(3) >= r.getLong(2), s"purchase before click: $r")
    }
  }

  test("sweep-line concurrency invariants: 1 <= peak <= n_events") {
    val rows = Temporal.qConcurrency(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (peak, n) = (r.getLong(1), r.getLong(2))
      assert(peak >= 1L && peak <= n, s"peak $peak outside [1, $n]: $r")
    }
  }

  test("retention invariants: day-1/day-7 returners are subsets of the cohort") {
    val rows = Temporal.qRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) <= r.getLong(1),
        s"returners exceed cohort: $r")
    }
  }

  test("paths: every path has <=3 steps from the event alphabet; counts cover no more than all users") {
    val rows = Temporal.qPaths(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val types = Set("click", "view", "purchase", "signup", "error")
    rows.foreach { r =>
      val steps = r.getString(0).split(">")
      assert(steps.length <= 3 && steps.forall(types.contains), s"bad path: ${r.getString(0)}")
    }
    val nUsers = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum <= nUsers)
    // counts non-increasing in emitted order
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("cohort matrix: offset-0 retention is 1000 per mille and matches qRetention at day 1/7") {
    val m = Temporal.qCohortMatrix(spark, sf).collect()
    assert(m.nonEmpty)
    m.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getLong(2) == r.getLong(3) && r.getLong(4) == 1000L, s"offset-0 row: $r")
    }
    val byKey = m.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    Temporal.qRetention(spark, sf).collect().foreach { r =>
      val c = r.getLong(0)
      assert(byKey.getOrElse((c, 1L), 0L) == r.getLong(2), s"day-1 mismatch cohort $c")
      assert(byKey.getOrElse((c, 7L), 0L) == r.getLong(3), s"day-7 mismatch cohort $c")
    }
  }

  test("ab arms partition users and rates are the exact scaled ratios") {
    val rows = Temporal.qAbLift(spark, sf).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L))
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
    assert(rows.map(_.getLong(1)).sum == ev.select("user_id").distinct().count())
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) * 10000 / r.getLong(1))
      assert(r.getLong(5) == r.getLong(3) / r.getLong(1))
      // arms should be roughly balanced (hash uniformity, wide band)
      assert(r.getLong(1) > 0)
    }
  }

  test("streaks match a brute-force recompute over each user's day set") {
    val rows = Temporal.qStreaks(spark, sf).collect()
    assert(rows.nonEmpty)
    val dayRows = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byUser = dayRows.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    assert(rows.length == byUser.size)
    rows.foreach { r =>
      val days = byUser(r.getLong(0))
      val runs = days.foldLeft(Vector.empty[Long] -> Option.empty[Long]) {
        case ((acc, Some(prev)), d) if d == prev + 1 =>
          (acc.init :+ (acc.last + 1), Some(d))
        case ((acc, _), d) => (acc :+ 1L, Some(d))
      }._1
      assert(r.getLong(1) == days.length, s"n_active_days: $r")
      assert(r.getLong(2) == runs.length, s"n_islands: $r")
      assert(r.getLong(3) == runs.max, s"longest_streak: $r")
    }
  }

  test("changepoint cusum telescopes to zero and flags the peak day(s)") {
    val rows = Temporal.qChangepoint(spark, sf).collect()
    assert(rows.nonEmpty)
    // n·Σx − n·S telescopes: the last cusum is exactly zero
    val sorted = rows.sortBy(_.getLong(0))
    assert(sorted.last.getLong(2) == 0L)
    val peak = rows.map(r => math.abs(r.getLong(2))).max
    rows.foreach { r =>
      assert(r.getBoolean(3) == (math.abs(r.getLong(2)) == peak))
    }
    assert(rows.exists(_.getBoolean(3)))
  }

  test("3-step funnel timestamps are ordered and steps count the non-null chain") {
    val rows = Temporal.qFunnel3(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getLong(1)
      val c = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val p = if (r.isNullAt(3)) None else Some(r.getLong(3))
      // chain order and no purchase without click
      c.foreach(ct => assert(ct >= v))
      p.foreach { pt => assert(c.isDefined && pt >= c.get) }
      assert(r.getInt(4) == 1 + c.size + p.size)
    }
  }

  test("interval coverage is bounded by span and at least one lease length") {
    val rows = Temporal.qIntervalCoverage(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .groupBy(col("event_type"))
      .agg(min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    rows.foreach { r =>
      val (lo, hi, n) = ev(r.getString(0))
      val covered = r.getLong(1)
      // union of n one-hour leases: >= one lease, <= span+lease, <= n leases
      assert(covered >= 3600000000L)
      assert(covered <= (hi - lo) + 3600000000L)
      assert(covered <= n * 3600000000L)
    }
  }

  test("markov transitions: probabilities per from-state sum to ~1e6 and counts match raw pairs") {
    val rows = Temporal.qMarkov(spark, sf).collect()
    assert(rows.nonEmpty)
    // per-from rows: sum(p_x1e6) in (1e6 - n_states, 1e6] (each div floors by < 1)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val pSum = rs.map(_.getLong(3)).sum
      assert(pSum <= 1000000L && pSum > 1000000L - rs.length,
        s"from=$from probabilities sum to $pSum over ${rs.length} states")
    }
    // total transition count = total events - number of users with >=1 event
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == nEvents - nUsers)
  }

  test("seq pairs equal a driver-side first-occurrence replay") {
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .select("user_id", "ts_us", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val firsts = ev.groupBy(e => (e._1, e._4)).map { case ((u, t), rows) =>
      val m = rows.minBy(e => (e._2, e._3)); (u, t, m._2, m._3)
    }.toSeq
    val nUsers = firsts.map(_._1).distinct.size.toLong
    val typeN = firsts.groupBy(_._2).map { case (t, r) => t -> r.size.toLong }
    val sup = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    firsts.groupBy(_._1).values.foreach { fs =>
      for (x <- fs; y <- fs
           if x._2 != y._2 && (x._3 < y._3 || (x._3 == y._3 && x._4 < y._4)))
        sup((x._2, y._2)) += 1
    }
    val want = sup.toSeq.map { case ((a, b), s) =>
      val na = typeN(a); val nb = typeN(b)
      (a, b, s, na, nb, s * 1000000L / na,
        (BigInt(s) * nUsers * 1000000L / (BigInt(na) * nb)).toLong)
    }.toSet
    val got = Temporal.qSeqPairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == want, "seq-pair support/conf/lift diverge from the replay")
    assert(got.nonEmpty)
    // support is bounded by both marginals by construction
    got.foreach { case (a, b, s, na, nb, _, _) =>
      assert(s <= math.min(na, nb), s"support $s exceeds marginals for ($a,$b)")
    }
  }

  test("scd2 segments: half-open, non-overlapping, exactly one open segment per user") {
    val rows = Temporal.qScd2(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (user, rs) =>
      val sorted = rs.sortBy(_.getLong(2))
      // chained: each segment's valid_to equals the next segment's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(3) && a.getLong(3) == b.getLong(2),
            s"user $user segments not chained: $a -> $b")
          // consecutive segments must differ in state (else not a change)
          assert(a.getString(1) != b.getString(1),
            s"user $user adjacent segments share state: $a -> $b")
        case _ => ()
      }
      // exactly the last segment is open/current
      assert(sorted.init.forall(!_.getBoolean(4)) && sorted.last.getBoolean(4),
        s"user $user open-segment invariant broken")
    }
  }

  test("gap-fill output is a dense contiguous calendar") {
    val days = operators.Relational.qGapFill(spark, sf).collect()
      .map(r => java.time.LocalDate.parse(r.getString(0)))
    assert(days.nonEmpty)
    days.sliding(2).foreach {
      case Array(a, b) => assert(b == a.plusDays(1), s"calendar gap between $a and $b")
      case _ => ()
    }
  }

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

  test("bucketed range join equals the naive inequality join, boundaries inclusive") {
    import spark.implicits._
    // points at bin edges, an interval spanning many bins, overlaps
    val pts = Seq(0L, 5L, 10L, 15L, 99L, 100L, 101L, 250L).toDF("p")
    val ivs = Seq((1L, 0L, 10L), (2L, 10L, 100L), (3L, 90L, 260L), (4L, 300L, 310L))
      .toDF("iv_id", "lo", "hi")
    val got = Temporal.rangeJoinByBucket(pts, ivs, "p", "lo", "hi", 7L)
      .select("iv_id", "p").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = pts.crossJoin(ivs)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("iv_id", "p").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == want.toSet)
    assert(want.toSet.contains((1L, 0L)) && want.toSet.contains((1L, 10L)),
      "boundaries must be inclusive")
    assert(got.length == got.toSet.size, "no duplicate matches from multi-bin intervals")
  }

  test("rolling mode matches a brute-force prefix recount with lexicographic ties") {
    val evs = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2, t._3))
    val got = Temporal.qModeRolling(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    assert(got.length == evs.length)
    val expect = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.inits.toSeq.reverse.drop(1).map { prefix =>
        val counts = prefix.groupBy(_._4).view.mapValues(_.length.toLong)
        val (mode, n) = counts.toSeq.minBy { case (t, c) => (-c, t) }
        val last = prefix.last
        (last._1, last._2, last._3, mode, n)
      }
    }.sortBy(t => (t._1, t._2, t._3))
    assert(got.toSeq == expect)
  }

  test("sessionize matches a brute-force 30-minute-gap split per user") {
    val evs = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .select(col("user_id"), col("ts_us"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = Temporal.qSessionize(spark, sf).collect()
    val byUser = evs.groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3))).toMap
    assert(got.length == byUser.size)
    val gap = 1800L * 1000000L
    got.foreach { r =>
      val ts = byUser(r.getLong(0)).map(_._2)
      val sessions = ts.tail.foldLeft(Vector(Vector(ts.head))) { (acc, t) =>
        if (t - acc.last.last > gap) acc :+ Vector(t) else acc.init :+ (acc.last :+ t)
      }
      assert(r.getLong(1) == sessions.length, s"n_sessions: $r")
      assert(r.getLong(2) == ts.length, s"n_events: $r")
      assert(r.getLong(3) == sessions.map(_.length).max, s"max_session_events: $r")
      assert(r.getLong(4) == sessions.map(s => s.last - s.head).max / 1000000L,
        s"longest_session_s: $r")
      assert(r.getLong(5) == ts.length.toLong * 100 / sessions.length, s"eps_x100: $r")
    }
  }

  test("dau/mau sweep-line equals the naive rolling-30-day distinct count") {
    val ud = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = Temporal.qDauMau(spark, sf).collect()
    val byDay = ud.groupBy(_._2)
    val gotDays = got.map(_.getLong(0)).toSet
    assert(gotDays == byDay.keySet, "output grid must be exactly the active days")
    got.foreach { r =>
      val day = r.getLong(0)
      val dau = byDay(day).map(_._1).distinct.length.toLong
      val mau = ud.filter(t => t._2 <= day && t._2 >= day - 29).map(_._1).distinct.length.toLong
      assert(r.getLong(1) == dau, s"dau day $day")
      assert(r.getLong(2) == mau, s"mau day $day")
      assert(r.getLong(3) == dau * 10000 / mau, s"stickiness day $day")
    }
  }

  test("welch t-test components match a BigInt brute-force recompute") {
    val pu = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).otherwise(0L)).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val arms = pu.groupBy { case (u, _) => ((u * 2654435761L) % 4294967296L) / 2147483648L }
    val r = Temporal.qTtest(spark, sf).collect().head
    def stats(a: Long) = {
      val cs = arms(a).map(_._2.toLong)
      (BigInt(cs.length), cs.map(BigInt(_)).sum, cs.map(c => BigInt(c) * c).sum)
    }
    val (na, sa, ssa) = stats(0); val (nb, sb, ssb) = stats(1)
    assert(BigInt(r.getLong(0)) == na && BigInt(r.getLong(1)) == nb)
    assert(BigInt(r.getLong(2)) == sa && BigInt(r.getLong(3)) == sb)
    val B18 = BigInt(10).pow(18)
    assert(BigInt(r.getLong(4)) * B18 + r.getLong(5) == ssa, s"ssq_a: $r")
    assert(BigInt(r.getLong(6)) * B18 + r.getLong(7) == ssb, s"ssq_b: $r")
    val diff = sa * 10000 / na - sb * 10000 / nb
    assert(BigInt(r.getLong(8)) == diff)
    val se2 = (na * ssa - sa * sa) * 1000000 / (na * (na - 1) * na) +
      (nb * ssb - sb * sb) * 1000000 / (nb * (nb - 1) * nb)
    assert(BigInt(r.getLong(9)) == se2)
    val se = BigInt(math.floor(math.sqrt(se2.toDouble)).toLong)
    assert(BigInt(r.getLong(10)) == se)
    assert(BigInt(r.getLong(11)) == diff.abs * 100 / se)
    assert(r.getInt(12) == diff.signum)
  }

  test("ks d statistic matches a brute-force ecdf max-gap") {
    val pu = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).otherwise(0L)).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val withArm = pu.map { case (u, c) => (((u * 2654435761L) % 4294967296L) / 2147483648L, c) }
    val a = withArm.filter(_._1 == 0L).map(_._2).sorted
    val b = withArm.filter(_._1 == 1L).map(_._2).sorted
    val r = Temporal.qKsTest(spark, sf).collect().head
    assert(r.getLong(0) == a.length.toLong && r.getLong(1) == b.length.toLong)
    val dNum = (a ++ b).distinct.map { v =>
      math.abs(a.count(_ <= v).toLong * b.length - b.count(_ <= v).toLong * a.length)
    }.max
    assert(r.getLong(2) == dNum)
    assert(r.getLong(3) == dNum * 1000000L / (a.length.toLong * b.length))
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
  }

  test("xcorr lags match a brute-force daily-series replay") {
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .selectExpr("ts_us div 86400000000 AS day", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val d0 = ev.map(_._1).min; val d1 = ev.map(_._1).max
    def series(t: String) = (d0 to d1).map(d => ev.count(e => e._1 == d && e._2 == t).toLong)
    val (xs, ys) = (series("click"), series("purchase"))
    val got = Temporal.qXcorr(spark, sf).collect()
    assert(got.map(_.getInt(0)).toSeq == (-3 to 3))
    got.foreach { r =>
      val lag = r.getInt(0)
      val pairs = xs.indices.flatMap { i =>
        val j = i + lag
        if (j >= 0 && j < ys.length) Some((xs(i), ys(j))) else None
      }
      assert(r.getLong(1) == pairs.length.toLong, s"n_days: $r")
      assert(r.getLong(2) == pairs.map(_._1).sum, s"sum_x: $r")
      assert(r.getLong(3) == pairs.map(_._2).sum, s"sum_y: $r")
      assert(r.getLong(4) == pairs.map(p => p._1 * p._2).sum, s"sum_xy: $r")
      assert(r.getLong(5) == pairs.length * pairs.map(p => p._1 * p._2).sum -
        pairs.map(_._1).sum * pairs.map(_._2).sum, s"cov_num: $r")
    }
  }

  test("mann-whitney u matches a brute-force tie-averaged rank computation") {
    val pu = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).otherwise(0L)).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val withArm = pu.map { case (u, c) => (((u * 2654435761L) % 4294967296L) / 2147483648L, c) }
    val all = withArm.map(_._2).sorted
    // tie-averaged rank ×2 for a value v: ranks occupied are
    // [idxFirst+1, idxFirst+cnt], so 2·avg = 2·idxFirst + cnt + 1
    val rankX2 = all.groupBy(identity).map { case (v, occ) =>
      v -> (2L * all.indexOf(v) + occ.length + 1)
    }
    val a = withArm.filter(_._1 == 0L).map(_._2)
    val b = withArm.filter(_._1 == 1L).map(_._2)
    val r1x2 = a.map(rankX2).sum
    val r = Temporal.qMannWhitney(spark, sf).collect().head
    assert(r.getLong(0) == a.length.toLong && r.getLong(1) == b.length.toLong)
    assert(r.getLong(2) == r1x2, "rank sum")
    val u1x2 = r1x2 - a.length.toLong * (a.length + 1)
    assert(r.getLong(3) == u1x2)
    assert(r.getLong(4) == 2L * a.length * b.length - u1x2)
    assert(r.getLong(5) == a.length.toLong * b.length)
    assert(r.getInt(6) == java.lang.Long.signum(u1x2 - a.length.toLong * b.length))
    // U1 + U2 = 2·n_a·n_b is the classic identity
    assert(r.getLong(3) + r.getLong(4) == 2L * a.length * b.length)
  }

  test("nearest as-of equals a brute-force min-|dt| scan with ties to the earlier purchase") {
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type")).collect()
    val purchases = ev.filter(_.getString(3) == "purchase").toSeq
      .groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(2))).toMap
    val got = Temporal.qAsofNearest(spark, sf).collect()
    assert(got.length == ev.count(_.getString(3) == "click"))
    got.foreach { r =>
      val ts = r.getLong(2)
      purchases.get(r.getLong(1)) match {
        case None => assert(r.isNullAt(3) && r.isNullAt(4), s"expected no purchase: $r")
        case Some(ps) =>
          val want = ps.minBy(p => (math.abs(p - ts), p))
          assert(r.getLong(3) == want, s"nearest mismatch: $r")
          assert(r.getLong(4) == math.abs(want - ts), s"dist mismatch: $r")
      }
    }
  }

  test("windowed funnel: steps match a brute-force per-user replay of the attribution windows") {
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .select(col("user_id"), col("ts_us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = ev.groupBy(_._1)
    val got = Temporal.qFunnelWindow(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSet == byUser.filter(_._2.exists(_._3 == "view")).keySet)
    got.foreach { r =>
      val rows = byUser(r.getLong(0))
      val v = rows.filter(_._3 == "view").map(_._2).min
      val c = rows.filter(t => t._3 == "click" && t._2 >= v && t._2 <= v + 3600000000L)
        .map(_._2).minOption
      val p = c.flatMap(ct => rows.filter(t => t._3 == "purchase" && t._2 >= ct &&
        t._2 <= ct + 86400000000L).map(_._2).minOption)
      assert(r.getLong(1) == v, s"v_ts: $r")
      assert((if (r.isNullAt(2)) None else Some(r.getLong(2))) == c, s"c_ts: $r")
      assert((if (r.isNullAt(3)) None else Some(r.getLong(3))) == p, s"p_ts: $r")
      assert(r.getInt(4) == 1 + c.size + p.size, s"steps: $r")
    }
  }

  test("runs test equals a driver-side replay of the sign/run recurrence") {
    val daily = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .filter(col("event_type") === "purchase")
      .select(expr("ts_us div 86400000000").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("day").agg(sum("cents").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val xs = daily.map(_._2)
    val med = xs.sorted.apply(((xs.length + 1) / 2) - 1)
    val signs = daily.filter(_._2 != med).map(d => if (d._2 > med) 1 else -1)
    val n1 = signs.count(_ == 1).toLong
    val n2 = signs.count(_ == -1).toLong
    val runs = if (signs.isEmpty) 0L
      else 1L + signs.zip(signs.tail).count { case (a, b) => a != b }
    val r = Temporal.qRunsTest(spark, sf).collect().head
    assert(r.getLong(0) == n1 && r.getLong(1) == n2 && r.getLong(2) == runs, s"replay mismatch: $r")
    assert(r.getLong(3) == (2 * n1 * n2 * 1000000L) / (n1 + n2) + 1000000L, s"mu: $r")
    // z decomposition is internally consistent
    val (muX, sd, zAbs) = (r.getLong(3), r.getLong(5), r.getLong(6))
    assert(zAbs == math.abs(runs * 1000000L - muX) * 1000L / sd, s"z: $r")
  }

  test("bootstrap replicates equal a driver-side weighted replay") {
    val pu = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).otherwise(0L)).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = Temporal.qBootstrap(spark, sf).collect()
    assert(rows.length == 32)
    val means = rows.map(r => r.getInt(0) -> r.getLong(3)).toMap
    rows.foreach { r =>
      val b = r.getInt(0)
      val ws = pu.map { case (u, c) => ((u * 2654435761L + b * 2246822519L) % 4294967296L % 3, c) }
      val nEff = ws.map(_._1).sum
      val wC = ws.map { case (w, c) => w * c }.sum
      assert(r.getLong(1) == nEff && r.getLong(2) == wC, s"weights at $b: $r")
      assert(r.getLong(3) == wC * 100 / nEff, s"mean at $b: $r")
      val rk = 1 + means.count { case (b2, m2) =>
        m2 < means(b) || (m2 == means(b) && b2 < b) }
      assert(r.getInt(4) == rk, s"rank at $b: $r")
    }
    // the replicate spread must be non-degenerate (weights actually vary)
    assert(means.values.toSet.size > 1, "all replicate means identical")
  }

  test("attribution equals a driver-side multi-touch replay") {
    val ev = graft.streaming.EventStreams.normalizeProps(Tables.events(spark, sf))
      .selectExpr("user_id", "ts_us", "event_id", "event_type",
        "CAST(get_json_object(props, '$.k') AS BIGINT) % 8 AS channel")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val clicks = ev.filter(_._4 == "click").groupBy(_._1)
    val purchases = ev.filter(_._4 == "purchase")
    case class Acc(var touches: Long = 0, var first: Long = 0, var last: Long = 0, var credit: Long = 0)
    val acc = scala.collection.mutable.Map.empty[Long, Acc]
    var attributedPurchases = 0L
    purchases.foreach { p =>
      val cs = clicks.getOrElse(p._1, Array.empty)
        .filter(c => c._2 <= p._2 && c._2 >= p._2 - 86400000000L)
        .sortBy(c => (c._2, c._3))
      if (cs.nonEmpty) {
        attributedPurchases += 1
        cs.foreach { c =>
          val a = acc.getOrElseUpdate(c._5, Acc())
          a.touches += 1; a.credit += 1000000L / cs.length
        }
        acc(cs.head._5).first += 1
        acc(cs.last._5).last += 1
      }
    }
    val rows = Temporal.qAttribution(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = acc(r.getLong(0))
      assert(r.getLong(1) == a.touches && r.getLong(2) == a.first &&
        r.getLong(3) == a.last && r.getLong(4) == a.credit, s"channel replay: $r")
    }
    assert(rows.map(_.getLong(0)).toSet == acc.keySet)
    // first/last totals both count each attributed purchase exactly once
    assert(rows.map(_.getLong(2)).sum == attributedPurchases)
    assert(rows.map(_.getLong(3)).sum == attributedPurchases)
  }

  test("survival table equals a driver-side risk-set replay") {
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .select("user_id", "ts_us", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val horizon = ev.map(_._2).max
    val signup = ev.filter(_._3 == "signup").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2).min }
    val exits = signup.toSeq.map { case (u, sTs) =>
      val p = ev.filter(e => e._1 == u && e._3 == "purchase" && e._2 >= sTs)
        .map(_._2).minOption
      p match {
        case Some(pTs) => ((pTs - sTs) / 3600000000L, true)
        case None      => ((horizon - sTs) / 3600000000L, false)
      }
    }
    val n = exits.length.toLong
    val rows = Temporal.qSurvival(spark, sf).collect()
    assert(rows.nonEmpty)
    var cum = 0L
    rows.foreach { r =>
      val t = r.getLong(0)
      val nRisk = exits.count(_._1 >= t).toLong
      val d = exits.count(e => e._1 == t && e._2).toLong
      assert(r.getLong(1) == nRisk && r.getLong(2) == d, s"risk set at $t: $r")
      assert(d > 0, s"non-event hour emitted: $r")
      val hz = d * 1000000L / nRisk
      cum += hz
      assert(r.getLong(3) == hz && r.getLong(4) == cum, s"hazard at $t: $r")
    }
    // every event hour is present
    val eventHours = exits.filter(_._2).map(_._1).distinct.sorted
    assert(rows.map(_.getLong(0)).toSeq == eventHours)
    assert(rows.head.getLong(1) <= n)
  }

  test("rolling median equals a driver-side sorted-window replay") {
    val rows = Temporal.qRollingMedian(spark, sf).collect()
    assert(rows.nonEmpty)
    val series = rows.map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    series.indices.foreach { i =>
      val win = series.slice(math.max(0, i - 6), i + 1).map(_._2).sorted
      val med = win((win.length + 1) / 2 - 1)
      val r = rows(i)
      assert(r.getLong(2) == med, s"median at ${r.getLong(0)}: $r")
      assert(r.getInt(3) == win.length, s"window size: $r")
      assert(r.getLong(4) == r.getLong(1) - med, s"dev: $r")
    }
  }

  test("locf: filled days carry the bucket's previous observed value forward") {
    val rows = Temporal.qLocf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, bs) =>
      var carried: Option[Long] = None
      bs.sortBy(_.getLong(1)).foreach { r =>
        val raw = if (r.isNullAt(2)) None else Some(r.getLong(2))
        if (raw.isDefined) carried = raw
        val locf = if (r.isNullAt(3)) None else Some(r.getLong(3))
        assert(locf == carried, s"locf drift: $r")
        assert(r.getInt(4) == (if (raw.isEmpty && carried.isDefined) 1 else 0),
          s"filled flag: $r")
      }
    }
    // the series must actually exercise the fill path
    assert(rows.exists(_.getInt(4) == 1), "no filled day — grid not sparse")
  }

  test("ewma equals a driver-side dyadic-weight replay per type series") {
    val rows = Temporal.qEwma(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, ts) =>
      val series = ts.sortBy(_.getLong(1)).map(_.getLong(2))
      ts.sortBy(_.getLong(1)).zipWithIndex.foreach { case (r, i) =>
        val terms = (0 to 7).flatMap { j =>
          if (i - j >= 0) Some((series(i - j), 1L << (7 - j))) else None
        }
        val num = terms.map { case (x, w) => x * w }.sum
        val den = terms.map(_._2).sum
        assert(r.getLong(3) == num * 100 / den, s"ewma at $r")
      }
      // the head renormalizes: day 0 EWMA is the raw value ×100
      val h = ts.minBy(_.getLong(1))
      assert(h.getLong(3) == h.getLong(2) * 100, s"head not renormalized: $h")
    }
  }

  test("twap equals a driver-side interval-weighted replay") {
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rows = Temporal.qTwap(spark, sf).collect()
    assert(rows.nonEmpty)
    val byUser = ev.groupBy(_._1)
    rows.foreach { r =>
      val tl = byUser(r.getLong(0)).sortBy(e => (e._2, e._3))
      val ivs = tl.zip(tl.tail).map { case (a, b) => (a._4, b._2 - a._2) }
      val durTot = ivs.map(_._2).sum
      val cd = ivs.map { case (c, d) => BigInt(c) * d }.sum
      assert(r.getLong(1) == ivs.length && r.getLong(2) == durTot, s"intervals: $r")
      assert(BigInt(r.getLong(3)) == cd * 100 / durTot, s"twap: $r")
    }
    // users with < 2 events carry no interval and must be absent
    assert(rows.length == byUser.count(_._2.length >= 2))
  }

  test("theil-sen equals a driver-side pairwise-slope median replay") {
    val daily = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .filter(col("event_type") === "purchase")
      .select(expr("ts_us div 86400000000").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("day").agg(sum("cents").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- i + 1 until daily.length
    } yield {
      val num = (daily(j)._2 - daily(i)._2) * 1000L
      val den = daily(j)._1 - daily(i)._1
      Math.floorDiv(num, den)
    }).sorted
    val r = Temporal.qTheilSen(spark, sf).collect().head
    assert(r.getLong(0) == slopes.length.toLong, s"n_pairs: $r")
    assert(r.getLong(1) == slopes.head && r.getLong(3) == slopes.last, s"extremes: $r")
    assert(r.getLong(2) == slopes((slopes.length * 50 + 99) / 100 - 1), s"median: $r")
  }

  test("cusum closed form equals the clamped recursion replay") {
    val daily = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .filter(col("event_type") === "purchase")
      .select(expr("ts_us div 86400000000").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("day").agg(sum("cents").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    val tot = daily.map(_._2).sum
    val ssq = daily.map(x => BigInt(x._2) * x._2).sum
    val mean = tot * 100L / n
    val sd = math.sqrt(((BigInt(n) * ssq - BigInt(tot) * tot) * 10000 /
      (BigInt(n) * (n - 1))).toDouble).toLong
    val k = sd / 2
    var sPos = 0L; var sNeg = 0L
    val rows = Temporal.qCusum(spark, sf).collect()
    assert(rows.length == daily.length)
    rows.sortBy(_.getLong(0)).zip(daily).foreach { case (r, (day, c)) =>
      val y = c * 100L - mean
      sPos = math.max(0L, sPos + y - k)
      sNeg = math.max(0L, sNeg - y - k)
      assert(r.getLong(0) == day && r.getLong(1) == c)
      assert(r.getLong(2) == sPos, s"s_pos recursion drift at day $day: $r")
      assert(r.getLong(3) == sNeg, s"s_neg recursion drift at day $day: $r")
      assert(r.getLong(4) == 4 * sd)
      assert(r.getInt(5) == (if (sPos > 4 * sd) 1 else 0))
      assert(r.getInt(6) == (if (sNeg > 4 * sd) 1 else 0))
    }
  }

  test("control chart limits equal the c-chart formula and breaches reconcile") {
    val rows = Temporal.qControlChart(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val ns = daily(r.getString(0))
      val mean = ns.sum * 100L / ns.length
      val s100 = math.sqrt((mean * 100L).toDouble).toLong
      assert(r.getLong(1) == ns.length.toLong && r.getLong(2) == mean, s"mean: $r")
      assert(r.getLong(3) == mean + 3 * s100, s"ucl: $r")
      assert(r.getLong(4) == math.max(mean - 3 * s100, 0L), s"lcl: $r")
      assert(r.getLong(5) == ns.count(_ * 100L > r.getLong(3)).toLong, s"hi: $r")
      assert(r.getLong(6) == ns.count(_ * 100L < r.getLong(4)).toLong, s"lo: $r")
    }
  }

  // the zero-filled daily (click count, purchase cents) series the
  // rank-correlation family runs on, replayed independently in Scala
  private def dailyXySeries(): Array[(Long, Long, Long)] = {
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .select(expr("ts_us div 86400000000").as("day"), col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byDay = ev.groupBy(_._1)
    val (d0, d1) = (ev.map(_._1).min, ev.map(_._1).max)
    (d0 to d1).map { day =>
      val rows = byDay.getOrElse(day, Array.empty[(Long, String, Long)])
      (day, rows.count(_._2 == "click").toLong,
        rows.filter(_._2 == "purchase").map(_._3).sum)
    }.toArray
  }

  // tie-averaged rank ×2 of each value in vs (2·rank_first + cnt − 1)
  private def rank2(vs: Array[Long]): Array[Long] = {
    val sorted = vs.sorted
    val firstRank = sorted.zipWithIndex.reverse.toMap.map { case (v, i) => v -> (i + 1L) }
    val cnt = vs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    vs.map(v => 2 * firstRank(v) + cnt(v) - 1)
  }

  test("spearman equals a driver-side tie-averaged rank replay") {
    val xy = dailyXySeries()
    val (rx, ry) = (rank2(xy.map(_._2)), rank2(xy.map(_._3)))
    val n = xy.length.toLong
    def mom(a: Array[Long], b: Array[Long]) =
      n * a.zip(b).map { case (u, v) => u * v }.sum - a.sum * b.sum
    val (sxy, sxx, syy) = (mom(rx, ry), mom(rx, rx), mom(ry, ry))
    val r = Temporal.qSpearman(spark, sf).collect()(0)
    assert(r.getLong(0) == n && r.getLong(1) == sxy &&
      r.getLong(2) == sxx && r.getLong(3) == syy, s"moment drift: $r")
    val denom = math.sqrt(sxx.toDouble).floor.toLong * math.sqrt(syy.toDouble).floor.toLong
    assert(r.getLong(4) == (BigInt(sxy.abs) * 1000000 / denom).toLong, s"rho: $r")
    assert(r.getInt(5) == sxy.sign.toInt)
    // ×2 tie-averaged ranks of n values must sum to n(n+1) exactly
    assert(rx.sum == n * (n + 1) && ry.sum == n * (n + 1))
  }

  test("kendall tau-b equals a brute-force concordant/discordant count") {
    val xy = dailyXySeries()
    var (c, dd, n1, n2) = (0L, 0L, 0L, 0L)
    for (i <- xy.indices; j <- (i + 1) until xy.length) {
      val (xi, yi, xj, yj) = (xy(i)._2, xy(i)._3, xy(j)._2, xy(j)._3)
      if ((xi < xj && yi < yj) || (xi > xj && yi > yj)) c += 1
      else if ((xi < xj && yi > yj) || (xi > xj && yi < yj)) dd += 1
      if (xi == xj) n1 += 1
      if (yi == yj) n2 += 1
    }
    val n0 = xy.length.toLong * (xy.length - 1) / 2
    val r = Temporal.qKendall(spark, sf).collect()(0)
    assert(r.getLong(0) == n0 && r.getLong(1) == c && r.getLong(2) == dd &&
      r.getLong(3) == n1 && r.getLong(4) == n2, s"pair-count drift: $r")
    val denom = math.sqrt(((n0 - n1) * (n0 - n2)).toDouble).floor.toLong
    assert(r.getLong(5) == (c - dd).abs * 1000000 / denom, s"tau: $r")
    assert(r.getInt(6) == (c - dd).sign.toInt)
  }

  test("autocorrelation equals a per-lag Pearson replay on daily dollars") {
    val daily = dailyXySeries().map { case (day, _, cents) => day -> cents / 100 }.toMap
    val rows = Temporal.qAutocorr(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 7L))
    rows.foreach { r =>
      val k = r.getLong(0)
      val pairs = daily.toSeq.sortBy(_._1).flatMap { case (day, x) =>
        daily.get(day + k).map(y => (x, y)) }
      val n = pairs.length.toLong
      val sxy = n * pairs.map { case (x, y) => x * y }.sum -
        pairs.map(_._1).sum * pairs.map(_._2).sum
      assert(r.getLong(1) == n && r.getLong(2) == sxy, s"lag $k moments: $r")
      def ss(vs: Seq[Long]) = n * vs.map(v => v * v).sum - vs.sum * vs.sum
      val denom = math.sqrt(ss(pairs.map(_._1)).toDouble).floor.toLong *
        math.sqrt(ss(pairs.map(_._2)).toDouble).floor.toLong
      assert(r.getLong(3) == (BigInt(sxy.abs) * 1000000 / denom).toLong, s"lag $k r: $r")
      assert(r.getInt(4) == sxy.sign.toInt, s"lag $k sign: $r")
    }
  }

  test("cohort ltv: cumulative curves replay and are monotone per cohort") {
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .select(col("user_id"), expr("(ts_us div 86400000000) div 7").as("week"),
        col("event_type"), expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val cohort = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = ev.filter(_._3 == "purchase")
      .groupBy(e => (cohort(e._1), e._2 - cohort(e._1)))
      .view.mapValues(_.map(_._4).sum).toMap
    val rows = Temporal.qCohortLtv(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (cw, rs) =>
      val ordered = rs.sortBy(_.getLong(1))
      var cum = 0L
      ordered.foreach { r =>
        assert(r.getLong(2) == cells((cw, r.getLong(1))), s"cell cents: $r")
        cum += r.getLong(2)
        assert(r.getLong(3) == cum, s"cumulative: $r")
        assert(r.getLong(4) == sizes(cw), s"cohort size: $r")
        assert(r.getLong(5) == cum * 100 / sizes(cw), s"ltv: $r")
      }
      // LTV curve is non-decreasing by construction (cents >= 0)
      val ltv = ordered.map(_.getLong(5))
      assert(ltv.zip(ltv.tail).forall { case (x, y) => x <= y })
    }
  }

  test("seasonal-naive backtest equals a driver-side lag-7 scoring replay") {
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .select(expr("ts_us div 86400000000").as("day"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (d0, d1) = (ev.map(_._1).min, ev.map(_._1).max)
    val counts = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = Temporal.qForecastNaive(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == ev.map(_._2).toSet)
    rows.foreach { r =>
      val t = r.getString(0)
      val series = (d0 to d1).map(day => counts.getOrElse((day, t), 0L))
      val scored = series.drop(7).zip(series.dropRight(7)) // (actual, fc)
      val absErr = scored.map { case (a, f) => (a - f).abs }
      assert(r.getLong(1) == scored.length.toLong, s"n_days: $r")
      assert(r.getLong(2) == scored.map(_._1).sum && r.getLong(3) == absErr.sum,
        s"totals: $r")
      assert(r.getLong(4) == absErr.sum * 10000 / scored.map(_._1).sum, s"wape: $r")
      val pos = scored.filter(_._1 > 0)
      val mapeNum = pos.map { case (a, f) => (a - f).abs * 10000 / a }.sum
      assert(r.getLong(5) == pos.length.toLong &&
        r.getLong(6) == mapeNum / pos.length, s"mape: $r")
    }
  }

  test("bollinger bands equal a driver-side trailing-moment replay") {
    // the query's base: purchase days only, dollars at day grain
    val series = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .filter(col("event_type") === "purchase")
      .select(expr("ts_us div 86400000000").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("day").agg(sum(col("cents")).as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 100)).sortBy(_._1)
    val rows = Temporal.qBollinger(spark, sf).collect()
    assert(rows.length == series.length)
    rows.zipWithIndex.foreach { case (r, i) =>
      val w = series.slice(math.max(0, i - 19), i + 1).map(_._2)
      val n = w.length.toLong
      val (sx, sxx) = (w.sum, w.map(v => v * v).sum)
      val mean = sx * 100 / n
      val sd = math.floor(math.sqrt(((n * sxx - sx * sx) * 10000 / (n * n)).toDouble)).toLong
      assert(r.getLong(1) == series(i)._2 && r.getLong(2) == n, s"window at $i: $r")
      assert(r.getLong(3) == mean && r.getLong(4) == sd, s"moments at $i: $r")
      assert(r.getLong(5) == mean + 2 * sd && r.getLong(6) == mean - 2 * sd)
      val x100 = series(i)._2 * 100
      val breach = if (x100 > mean + 2 * sd) 1 else if (x100 < mean - 2 * sd) -1 else 0
      assert(r.getInt(7) == breach, s"breach flag at $i: $r")
    }
  }

  test("event regex matches equal a driver-side scala-regex replay") {
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ini"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val seqs = ev.groupBy(_._1).map { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4).mkString.take(40)
    }.toSeq
    val rows = Temporal.qEventRegex(spark, sf).collect()
    val pats = Seq("v.*c.*p", "^s", "cc", "v[vc]*p", "e.*e.*e")
    assert(rows.map(_.getString(0)).sorted.toSeq == pats.sorted)
    rows.foreach { r =>
      val re = r.getString(0).r
      val want = seqs.count(s => re.findFirstIn(s).isDefined).toLong
      assert(r.getLong(1) == want, s"match count drift for ${r.getString(0)}")
      assert(r.getLong(2) == seqs.length.toLong)
      assert(r.getLong(3) == want * 1000000L / seqs.length)
    }
    // at least one pattern must be non-trivially selective (matches some
    // but not all users) or the regex path is vacuous on this corpus
    assert(rows.exists(r => r.getLong(1) > 0 && r.getLong(1) < r.getLong(2)))
  }

  test("wow growth: prev is last week's cents and the growth formula holds") {
    val rows = Temporal.qWowGrowth(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val ordered = rs.sortBy(_.getLong(1))
      assert(ordered.head.isNullAt(3), s"first week of $t has a prev")
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(3) == a.getLong(2), s"prev != last cents: $b")
          val delta = b.getLong(2) - b.getLong(3)
          assert(b.getLong(4) == delta, s"delta: $b")
          assert(b.getLong(5) == delta.abs * 10000 / b.getLong(3), s"growth: $b")
          assert(b.getInt(6) == delta.sign.toInt, s"sign: $b")
        case _ =>
      }
    }
  }

  test("seasonality indices n-weight-average to 1e6 per type") {
    val rows = Temporal.qSeasonality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dow = r.getLong(1)
      assert(dow >= 1 && dow <= 7, s"dow out of range: $r")
    }
    rows.groupBy(_.getString(0)).foreach { case (t, ds) =>
      // idx = (cents/n) / (cents_tot/n_tot) ×1e6: the n-weighted mean of
      // idx must sit at 1e6 up to the per-cell floor (< 7 units of slack)
      val nTot = ds.map(_.getLong(2)).sum
      val wsum = ds.map(r => BigInt(r.getLong(2)) * r.getLong(4)).sum
      val mean = wsum / nTot
      assert((mean - BigInt(1000000)).abs <= 7, s"type $t weighted mean $mean")
    }
  }

  test("growth accounting satisfies the activation identities on a replay") {
    val uw = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .selectExpr("user_id", "ts_us div 604800000000 AS wk")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byWeek = uw.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val firstWk = uw.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val rows = Temporal.qGrowthAccounting(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val wk = r.getLong(0)
      val active = byWeek(wk)
      val nNew = active.count(u => firstWk(u) == wk).toLong
      val prev = byWeek.getOrElse(wk - 1, Set.empty[Long])
      val nRet = active.count(u => firstWk(u) != wk && prev(u)).toLong
      val nRes = active.count(u => firstWk(u) != wk && !prev(u)).toLong
      val nChu = prev.count(u => !active(u)).toLong
      assert(r.getLong(1) == nNew && r.getLong(2) == nRet &&
        r.getLong(3) == nRes && r.getLong(4) == nChu, s"counts: $r")
      // the accounting identity: active = new + retained + resurrected
      assert(nNew + nRet + nRes == active.size.toLong, s"identity: $r")
      if (nChu > 0)
        assert(r.getLong(5) == (nNew + nRes) * 100 / nChu, s"quick ratio: $r")
      else assert(r.isNullAt(5))
    }
  }

  test("rolling correlation equals a BigInt windowed Pearson replay") {
    val xy = Temporal.qRollingCorr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(xy.nonEmpty)
    // rebuild the full daily series (the query emits only full windows)
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .selectExpr("ts_us div 86400000000 AS day", "event_type",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val d0 = ev.map(_._1).min; val d1 = ev.map(_._1).max
    val series = (d0 to d1).map { d =>
      val rows = ev.filter(_._1 == d)
      (d, rows.count(_._2 == "click").toLong,
        rows.filter(_._2 == "purchase").map(_._3).sum)
    }
    val byDay = series.map(t => t._1 -> t).toMap
    xy.foreach { case (day, x, y, r2, sgn) =>
      val win = (day - 13 to day).map(byDay)
      assert(win.exists(_._1 == day) && byDay(day)._2 == x && byDay(day)._3 == y)
      val n = BigInt(win.length)
      val sx = win.map(t => BigInt(t._2)).sum; val sy = win.map(t => BigInt(t._3)).sum
      val sxx = win.map(t => BigInt(t._2) * t._2).sum
      val syy = win.map(t => BigInt(t._3) * t._3).sum
      val sxy = win.map(t => BigInt(t._2) * t._3).sum
      val num = n * sxy - sx * sy
      val sxxC = n * sxx - sx * sx
      val syyC = n * syy - sy * sy
      // r9 common-downscale replay (the sf1 overflow fix): all three
      // terms floor-divided by sc = max/1e9 + 1, then one floor ratio
      val sc = (num.abs.max(sxxC.max(syyC)) / 1000000000L) + 1
      val (n2, sx2, sy2) = (num.abs / sc, sxxC / sc, syyC / sc)
      val want = if (sx2 > 0 && sy2 > 0) (n2 * n2 * 1000000 / (sx2 * sy2)).toLong else 0L
      assert(r2 == want && sgn == num.signum, s"day $day: got ($r2, $sgn) want ($want, ${num.signum})")
      assert(r2 <= 1000000L, s"r2 above 1 at day $day")
    }
  }

  test("holt double smoothing equals a per-type kernel replay") {
    val rows = Temporal.qHolt(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    def kernel(ys: Seq[Long]): Seq[Long] = ys.indices.map { i =>
      val terms = (0 to 7).flatMap { j =>
        if (i - j >= 0) Some((ys(i - j), 1L << (7 - j))) else None
      }
      // caller scales the numerator; here the plain kernel
      terms.map(t => t._1 * t._2).sum / terms.map(_._2).sum
    }
    def kernelX100(ys: Seq[Long]): Seq[Long] = ys.indices.map { i =>
      val terms = (0 to 7).flatMap { j =>
        if (i - j >= 0) Some((ys(i - j), 1L << (7 - j))) else None
      }
      terms.map(t => t._1 * t._2).sum * 100 / terms.map(_._2).sum
    }
    rows.groupBy(_._1).foreach { case (et, rs) =>
      val sorted = rs.sortBy(_._2)
      val s1 = kernelX100(sorted.map(_._3).toSeq)
      val s2 = kernel(s1)
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r._4 == s1(i) && r._5 == s2(i), s"$et day ${r._2}: s1/s2 drift")
        assert(r._6 == 2 * s1(i) - s2(i) && r._7 == s1(i) - s2(i) &&
          r._8 == 3 * s1(i) - 2 * s2(i), s"$et day ${r._2}: derived cols")
      }
    }
  }

  test("dow anomalies exceed 3x MAD and match the lower-median replay") {
    val daily = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .filter(col("event_type") === "purchase")
      .selectExpr("ts_us div 86400000000 AS day",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def lowerMedian(xs: Seq[(Long, Long)]): Long = {
      // order by (value, day), pick rank (n+1) div 2 — the query's rule
      val sorted = xs.sortBy(t => (t._2, t._1))
      sorted(((sorted.length + 1) / 2 - 1).max(0))._2
    }
    val med = daily.groupBy(t => ((t._1 + 3) % 7) + 1).view
      .mapValues(v => lowerMedian(v.toSeq)).toMap
    val resid = daily.map { case (d, c) =>
      (d, c - med(((d + 3) % 7) + 1)) }
    val mad = lowerMedian(resid.map(t => (t._1, t._2.abs)).toSeq.sortBy(identity))
    val want = resid.filter(t => t._2.abs > 3 * mad).map(_._1).toSet
    val got = Temporal.qAnomalyDow(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSet == want, "anomalous day set drift")
    got.foreach { r =>
      assert(r.getLong(6) == mad && r.getLong(4) > 3 * mad, s"threshold: $r")
      assert(r.getLong(4) == (r.getLong(2) - r.getLong(3)).abs, s"resid: $r")
    }
  }

  test("calendar grid partitions the event count with one peak per weekday") {
    val rows = Temporal.qCalendarGrid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_._3).sum == total, "cells must partition all events")
    rows.groupBy(_._1).foreach { case (dow, cells) =>
      val peaks = cells.filter(_._5 == 1)
      assert(peaks.length == 1, s"dow $dow: ${peaks.length} peaks")
      val best = cells.map(c => (-c._3, c._2)).min
      assert((-peaks.head._3, peaks.head._2) == best, s"dow $dow: wrong peak")
    }
    assert(rows.forall(t => t._1 >= 1 && t._1 <= 7 && t._2 >= 0 && t._2 <= 23))
  }

  test("moving min/max channel brackets the series and flags are consistent") {
    val rows = operators.Temporal.qMovingMinmax(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getInt(6), r.getInt(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, rev, mn, mx, rng, hi, lo) =>
      assert(mn <= rev && rev <= mx, "series escapes its own channel")
      assert(rng == mx - mn)
      assert((hi == 1) == (rev == mx) && (lo == 1) == (rev == mn))
    }
    // windowed replay per type
    rows.groupBy(_._1).foreach { case (_, ts) =>
      val sorted = ts.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, _, _, mn, mx, _, _, _), i) =>
        val win = sorted.slice(math.max(0, i - 6), i + 1).map(_._3)
        assert(mn == win.min && mx == win.max, "rolling bounds drift from a slice replay")
      }
    }
  }

  test("linear interpolation fills every day, labels sources, and anchors exactly") {
    val daily = operators.Temporal.qMovingMinmax(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rows = operators.Temporal.qInterpLinear(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, ts) =>
      val days = ts.map(_._2).sorted
      assert(days.toSeq == (days.min to days.max).toSeq, "grid not dense")
    }
    rows.foreach { case (t, day, v, src) =>
      daily.get((t, day)) match {
        case Some(actual) => assert(src == "actual" && v == actual, s"anchor drift at ($t, $day)")
        case None =>
          assert(Set("interp", "locf", "bocf")(src), s"missing day mislabeled at ($t, $day)")
          // an interpolated value lies within [min(prev,next), max(prev,next)]
          if (src == "interp") {
            val known = daily.collect { case ((tt, dd), vv) if tt == t => dd -> vv }
            val pv = known.filter(_._1 < day).maxBy(_._1)._2
            val nv = known.filter(_._1 > day).minBy(_._1)._2
            assert(v >= math.min(pv, nv) && v <= math.max(pv, nv), "interp outside anchors")
          }
      }
    }
  }

  test("cumulative uniques: monotone, ends at total distinct, DAU bounds new users") {
    val rows = operators.Temporal.qCumulativeUniques(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(rows.nonEmpty)
    val totalUsers = graft.streaming.EventStreams
      .normalize(Tables.events(spark, sf)).select("user_id").distinct().count()
    assert(rows.last._4 == totalUsers, "curve must end at the total distinct count")
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted, "cum not monotone")
    assert(rows.map(_._2).sum == totalUsers, "every user first-seen exactly once")
    rows.foreach { case (_, nw, dau, _) =>
      assert(nw <= dau, "more first-seen users than active users on a day")
    }
  }

  test("order gaps: buckets partition the positive gaps, new/returning partitions orders") {
    val gaps = operators.Temporal.qOrderGapStats(spark, sf).collect()
    assert(gaps.nonEmpty)
    gaps.foreach { r =>
      val (b, mn, mx) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(mn >= (1L << (b - 1).toInt) && mx < (1L << b.toInt),
        s"bucket $b bounds violated: [$mn, $mx]")
    }
    val nvr = operators.Temporal.qNewVsReturning(spark, sf).collect()
    assert(nvr.nonEmpty)
    assert(nvr.map(_.getLong(1)).sum == Tables.orders(spark, sf).count())
    nvr.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == r.getLong(1), "new + returning != orders")
    }
    // every customer is new exactly once
    val nCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(nvr.map(_.getLong(4)).sum == nCust)
  }

  test("two-proportion z-squared equals a driver-side recompute of the pooled formula") {
    val Seq((n1, x1, n2, x2)) = {
      val e = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type"), col("value")).collect()
      val c = e.filter(_.getString(0) == "click")
      val v = e.filter(_.getString(0) == "view")
      Seq((c.length.toLong, c.count(_.getDouble(1) >= 100.0).toLong,
        v.length.toLong, v.count(_.getDouble(1) >= 100.0).toLong))
    }
    val row = operators.Temporal.qPropZtest(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) == ((n1, x1, n2, x2)))
    val num = BigInt(x1 * n2 - x2 * n1)
    val want = num * num * (n1 + n2) * 1000000 /
      (BigInt(n1) * n2 * (x1 + x2) * (n1 + n2 - x1 - x2))
    assert(row.getLong(4) == want.toLong, "z^2 formula drift")
    assert((row.getInt(7) == 1) == (want.toLong > 3841459L))
  }

  test("seasonal decomposition reconstructs exactly and components replay") {
    val daily = graft.streaming.EventStreams.normalize(
        Tables.events(SparkTestSession.spark, SparkTestSession.sf))
      .select("ts_us").collect().map(_.getLong(0) / 86400000000L)
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    val days = daily.map(_._1); val ns = daily.map(_._2)
    val trend = days.indices.map { i =>
      val w = (math.max(0, i - 3) to math.min(days.length - 1, i + 3)).map(ns)
      w.sum * 100 / w.length
    }
    val detr = days.indices.map(i => ns(i) * 100 - trend(i))
    val seas = days.indices.groupBy(i => days(i) % 7).view.mapValues { is =>
      val s0 = is.map(detr).sum
      s0.sign * (s0.abs / is.length)
    }.toMap
    val rows = Temporal.qSeasonalDecompose(SparkTestSession.spark, SparkTestSession.sf)
      .collect()
    assert(rows.length == days.length)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == days(i) && r.getLong(1) == ns(i))
      assert(r.getLong(2) == trend(i), s"trend drift at day ${days(i)}")
      assert(r.getLong(3) == seas(days(i) % 7), s"seasonal drift at day ${days(i)}")
      // the defining identity: actual*100 = trend + seasonal + residual
      assert(r.getLong(1) * 100 == r.getLong(2) + r.getLong(3) + r.getLong(4),
        "decomposition does not reconstruct")
    }
    // the seasonal component must be centered-ish and non-constant
    assert(rows.map(_.getLong(3)).distinct.length > 1, "flat seasonal — vacuous")
  }

  test("max gap: day-decomposed gaps equal the straight consecutive-scan replay") {
    val evs = graft.streaming.EventStreams.normalize(
        Tables.events(SparkTestSession.spark, SparkTestSession.sf))
      .select("event_type", "ts_us", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = Temporal.qMaxGap(SparkTestSession.spark, SparkTestSession.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val typ = r.getString(0)
      val ts = evs.filter(_._1 == typ).sortBy(e => (e._2, e._3)).map(_._2)
      // the union of intra-day and boundary gaps IS the plain
      // consecutive-event gap sequence — the decomposition must lose
      // nothing (ties inside a day order by event_id; a day boundary
      // only ever separates sorted timestamps)
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      assert(r.getLong(1) == ts.length.toLong, s"event count drift: $r")
      assert(r.getLong(2) == gaps.length.toLong, s"gap count drift: $r")
      assert(r.getLong(3) == gaps.max, s"max gap drift: $r")
      assert(r.getLong(4) == gaps.count(_ > 3600000000L).toLong, s"1h-gap count drift: $r")
    }
    // gaps over an hour exist on this corpus or the monitor is vacuous
    assert(rows.map(_.getLong(4)).sum > 0, "no gap ever exceeded an hour")
  }

  test("rate limit: quota drops equal the per-day replay and are non-vacuous") {
    val perDay = graft.streaming.EventStreams.normalize(
        Tables.events(SparkTestSession.spark, SparkTestSession.sf))
      .select("user_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 86400000000L))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case ((u, d), n) => (u, d, n) }
    val byUser = perDay.groupBy(_._1)
    val want = byUser.view.mapValues { ds2 =>
      val ns = ds2.map(_._3)
      (ns.length.toLong, ns.sum, ns.max,
        ns.map(n => math.max(0L, n - 5)).sum, ns.count(_ > 5).toLong)
    }.toMap
    val rows = Temporal.qRateLimit(SparkTestSession.spark, SparkTestSession.sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val u = r.getLong(0)
      val (nd, ne, peak, dropped, over) = want(u)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
        ((nd, ne, peak, dropped, over)), s"quota audit drift for user $u")
      assert(r.getLong(6) == dropped * 1000000L / ne, s"drop ppm drift for user $u")
    }
    // the page is ordered by drops and the quota actually bites somewhere
    val drops = rows.map(_.getLong(4))
    assert(drops.zip(drops.tail).forall { case (a, b) => a >= b })
    assert(drops.head > 0, "no user ever exceeded the quota — audit vacuous")
  }

  test("error budget: burn and cumulative consumption equal the daily replay") {
    val evs = graft.streaming.EventStreams.normalize(
        Tables.events(SparkTestSession.spark, SparkTestSession.sf))
      .select("ts_us", "event_type").collect()
      .map(r => (r.getLong(0) / 86400000000L, r.getString(1) == "error"))
    val daily = evs.groupBy(_._1).view.mapValues(ds2 =>
      (ds2.length.toLong, ds2.count(_._2).toLong)).toMap
    val nTot = evs.length.toLong
    val rows = Temporal.qErrorBudget(SparkTestSession.spark, SparkTestSession.sf).collect()
    assert(rows.length == daily.size)
    var cum = 0L
    rows.foreach { r =>
      val (n, e) = daily(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == e, s"grid drift: $r")
      val rate = e * 1000000L / n
      assert(r.getLong(3) == rate && r.getLong(4) == rate / 100, s"burn drift: $r")
      cum += e
      assert(r.getLong(5) == cum, s"cumulative drift: $r")
      assert(r.getLong(6) == cum * 1000000L / (nTot / 100), s"budget share drift: $r")
    }
    // the corpus carries real errors or the whole audit is vacuous
    assert(cum > 0, "no error events in corpus")
  }

  test("dispersion: Fano factors equal the exact daily-count replay") {
    val daily = graft.streaming.EventStreams.normalize(
        Tables.events(SparkTestSession.spark, SparkTestSession.sf))
      .select("event_type", "ts_us").collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000L))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case ((t, d), x) => (t, d, x) }
    val rows = Temporal.qDispersion(SparkTestSession.spark, SparkTestSession.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val xs = daily.filter(_._1 == r.getString(0)).map(_._3)
      val (nd, ne) = (xs.length.toLong, xs.sum)
      assert(r.getLong(1) == nd && r.getLong(2) == ne, s"grid drift: $r")
      assert(r.getLong(3) == ne * 100 / nd, s"mean drift: $r")
      val sx2 = xs.map(x => BigInt(x) * x).sum
      val fano = (BigInt(nd) * sx2 - BigInt(ne) * ne) * 1000000 / (BigInt(nd) * ne)
      assert(BigInt(r.getLong(4)) == fano, s"fano drift: $r")
      assert((r.getInt(5) == 1) == (fano > 1000000), s"flag drift: $r")
      assert(fano >= 0, "variance cannot be negative")
    }
  }

  test("difference-in-differences equals the four-cell driver replay") {
    val evs = graft.streaming.EventStreams.normalize(
        Tables.events(SparkTestSession.spark, SparkTestSession.sf))
      .select("user_id", "ts_us", "value").collect()
      .map(r => (r.getLong(0) % 2 == 1, r.getLong(1) / 86400000000L >= 19738L,
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    def cell(t: Boolean, p: Boolean) = {
      val xs = evs.filter(e => e._1 == t && e._2 == p)
      (xs.length.toLong, xs.map(_._3).sum)
    }
    val (ntpre, stpre) = cell(t = true, p = false)
    val (ntpost, stpost) = cell(t = true, p = true)
    val (ncpre, scpre) = cell(t = false, p = false)
    val (ncpost, scpost) = cell(t = false, p = true)
    // every cell must be populated or the design is degenerate
    assert(Seq(ntpre, ntpost, ncpre, ncpost).forall(_ > 0), "empty DiD cell")
    val row = Temporal.qDid(SparkTestSession.spark, SparkTestSession.sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((ntpre, ntpost, ncpre, ncpost)), "cell counts drift")
    val ms2 = Seq(stpre * 100 / ntpre, stpost * 100 / ntpost,
      scpre * 100 / ncpre, scpost * 100 / ncpost)
    assert((4 to 7).map(row.getLong).toSeq == ms2, "cell means drift")
    val did = (ms2(1) - ms2(0)) - (ms2(3) - ms2(2))
    assert(row.getLong(8) == math.abs(did) && row.getInt(9) == did.sign.toInt)
  }

  test("SRM: healthy parity split passes, broken mod-5 split is flagged") {
    val users = graft.streaming.EventStreams.normalize(
        Tables.events(SparkTestSession.spark, SparkTestSession.sf))
      .select("user_id").distinct().collect().map(_.getLong(0))
    def chi(b: Long) = {
      val a = users.length - b
      (a - b) * (a - b) * 1000000L / users.length
    }
    val rows = Temporal.qSrm(SparkTestSession.spark, SparkTestSession.sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))))
      .toMap
    val b2 = users.count(_ % 2 == 1).toLong
    val b5 = users.count(_ % 5 == 0).toLong
    assert(rows("mod2") == ((users.length - b2, b2, chi(b2), if (chi(b2) > 3841000L) 1 else 0)))
    assert(rows("mod5") == ((users.length - b5, b5, chi(b5), if (chi(b5) > 3841000L) 1 else 0)))
    // the audit must exercise BOTH outcomes on this corpus
    assert(rows("mod2")._4 == 0, "healthy split flagged — corpus parity broken")
    assert(rows("mod5")._4 == 1, "broken split not flagged — check imbalance")
  }

  test("granger lagged regression equals a BigInt normal-equation replay") {
    val ev = graft.streaming.EventStreams.normalize(Tables.events(spark, sf))
      .selectExpr("ts_us div 86400000000 AS day", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val d0 = ev.map(_._1).min; val d1 = ev.map(_._1).max
    val f = (d0 to d1).map { d =>
      val rows = ev.filter(_._1 == d)
      (d, rows.count(_._2 == "click").toLong, rows.count(_._2 == "purchase").toLong)
    }
    val byDay = f.map(t => t._1 -> t).toMap
    val lagged = f.filter(t => byDay.contains(t._1 - 1)).map { t =>
      val p = byDay(t._1 - 1); (t._3, p._3, p._2) // (y, u = y_prev, v = x_prev)
    }
    val n = BigInt(lagged.length)
    def S(g: ((Long, Long, Long)) => BigInt) = lagged.map(g).sum
    val (su, sv, sy) = (S(t => BigInt(t._2)), S(t => BigInt(t._3)), S(t => BigInt(t._1)))
    val suu = S(t => BigInt(t._2) * t._2); val suv = S(t => BigInt(t._2) * t._3)
    val suy = S(t => BigInt(t._2) * t._1); val svv = S(t => BigInt(t._3) * t._3)
    val svy = S(t => BigInt(t._3) * t._1); val syy = S(t => BigInt(t._1) * t._1)
    val cuu = n * suu - su * su; val cuv = n * suv - su * sv
    val cuy = n * suy - su * sy; val cvv = n * svv - sv * sv
    val cvy = n * svy - sv * sy; val cyy = n * syy - sy * sy
    def carry(a: BigInt, b: BigInt): Long =
      ((a / b) * 1000000 + (a % b) * 1000000 / b).toLong
    val (ar, br) = (cuy * cuy, cuu * cyy)
    val det = cuu * cvv - cuv * cuv
    val nf = (cuy * cvv - cvy * cuv) * cuy + (cuu * cvy - cuv * cuy) * cvy
    val df = det * cyy
    val wantR = if (br > 0) carry(ar, br) else 0L
    val wantF = if (df > 0) carry(nf, df) else 0L
    val row = Temporal.qGranger(spark, sf).collect().head
    assert(row.getLong(0) == lagged.length.toLong)
    assert(row.getLong(1) == wantR && row.getLong(2) == wantF,
      s"granger drift: got (${row.getLong(1)}, ${row.getLong(2)}) want ($wantR, $wantF)")
    assert(row.getLong(3) == wantF - wantR)
    // the full model must explain at least as much (floor slack <= 1 ppm)
    assert(wantF >= wantR - 1)
  }

  test("earth mover's distance equals a BigInt CDF-gap replay and is metric-sane") {
    val vals = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .selectExpr("event_type", "CAST(floor(value / 10) AS BIGINT) AS bin")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bins = vals.map(_._2).distinct.sorted
    val na = BigInt(vals.count(_._1 == "click"))
    val nb = BigInt(vals.count(_._1 == "purchase"))
    var (ca, cb) = (BigInt(0), BigInt(0))
    var num = BigInt(0)
    bins.foreach { b =>
      ca += vals.count(t => t._1 == "click" && t._2 == b)
      cb += vals.count(t => t._1 == "purchase" && t._2 == b)
      num += (ca * nb - cb * na).abs
    }
    val den = na * nb
    val want = ((num / den) * 1000000 + (num % den) * 1000000 / den).toLong
    val row = Temporal.qEmd(spark, sf).collect().head
    assert(row.getLong(0) == na.toLong && row.getLong(1) == nb.toLong)
    assert(row.getLong(2) == bins.length.toLong)
    assert(row.getLong(3) == want, s"emd drift: got ${row.getLong(3)} want $want")
    // identical distributions would give 0; these two genuinely differ
    assert(want >= 0)
  }

  test("audience overlap equals a driver-side set replay") {
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def users(t: String) = ev.filter(_._2 == t).map(_._1).toSet
    val (c, v, p) = (users("click"), users("view"), users("purchase"))
    val want = Map(
      ("click", "view") -> (c & v, c | v),
      ("click", "purchase") -> (c & p, c | p),
      ("view", "purchase") -> (v & p, v | p))
    Temporal.qAudienceOverlap(spark, sf).collect().foreach { r =>
      val (i, u) = want((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == i.size.toLong && r.getLong(3) == u.size.toLong,
        s"overlap drift at ${r.getString(0)}/${r.getString(1)}")
      assert(r.getLong(4) == i.size.toLong * 1000000 / u.size, "jaccard drift")
    }
  }
}
