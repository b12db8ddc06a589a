package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // ≥3 in-JVM passes per query: the box has ±40% same-day noise and the
    // first sf-scale pass can still be 2× its warm time (JIT), so only
    // the per-query MEDIAN is comparable round-over-round
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // full per-query detail goes to a sidecar FILE — the stdout line is
    // tail-truncated by downstream log capture, which in round 4/5 lost
    // half the per-query numbers; a file can't be truncated from the front
    // optional subset: `Bench q1 q2 …` times only the named queries
    // (ad-hoc perf probes). The driver's no-arg call is unchanged; a
    // subset run redirects the detail sidecar so it can never clobber
    // the full-suite BENCH_DETAIL.json with partial data.
    val subset = args.toSet
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      if (subset.isEmpty) "/root/repo/BENCH_DETAIL.json"
      else "/tmp/bench_subset.json")
    val spark = GraftSession.local()
    val jobs = new AtomicLong; val stages = new AtomicLong; val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    // drop dead localCheckpoint blocks after each query: finished queries'
    // intermediates otherwise accumulate in storage memory for the whole
    // full query sweep and turn into GC pressure on the later (heavier) ones
    def dropDeadBlocks(): Unit = GraftSession.dropDeadBlocks(spark)
    // JIT/codegen warm-up at the smallest SF so timings measure
    // steady-state throughput, not first-call Janino compilation
    val selected =
      if (subset.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(subset).toMap
    // The warm-up pass is UNTIMED, so it can exploit guide §2.6
    // (overlap independent jobs): at sf0.001 each query is a handful of
    // tiny tasks that leave a 32-core box ~95% idle, and running the
    // 444 warm-ups serially cost ~7 min of the bench's wall — more than
    // a third of the whole run, all of it scheduler idle time. A small
    // driver-side pool back-fills those gaps; the TIMED sweep below is
    // untouched (same serial per-query warm rep + reps methodology).
    // Per-query dropDeadBlocks is skipped inside the pool (a concurrent
    // unpersist could yank another thread's in-flight lazy checkpoint);
    // one sweep after the pool drains reclaims the sf0.001 blocks.
    // phase timestamps to STDERR (the stdout contract stays one JSON
    // line): the r15 driver 32-cpu run died on a wall-clock timeout
    // with no way to tell which phase ate the budget
    def phase(msg: String): Unit =
      Console.err.println(s"[bench-phase] ${java.time.Instant.now()} $msg")
    phase("warmup start")
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val cdl = new java.util.concurrent.CountDownLatch(selected.size)
      selected.foreach { case (_, fn) =>
        pool.execute(() => {
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
          finally cdl.countDown()
        })
      }
      cdl.await()
      pool.shutdown()
      dropDeadBlocks()
    }
    phase("warmup done, timed sweep start")
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // calibration control (VERDICT r13 #4): the shared fixed-work CPU
    // probe (GraftSession.calibSec), timed at sweep start/mid/end and
    // written into the detail sidecar as calib_sec, so round-over-round
    // comparisons can quote calib-normalized ratios instead of
    // re-litigating host day-band drift (the two-round q_triangle_count
    // saga would have been a one-line readout).
    def calibSec(): Double = GraftSession.calibSec(spark)
    // the listener bus is async: wait until the counters stop moving so
    // one query's straggler events don't bleed into the next query's counts
    def settle(): Unit = {
      // 25 ms poll: at 444 queries the old 100 ms poll put ≥2 sleeps
      // (0.2 s) of pure wait between every query — ~90 s of idle wall
      // across a full sweep for a bus that settles in a few ms
      var prev = -1L
      var cur = jobs.get + stages.get + tasks.get
      while (cur != prev) {
        Thread.sleep(25)
        prev = cur
        cur = jobs.get + stages.get + tasks.get
      }
    }
    calibSec() // untimed probe warm-up: start/mid/end must be JIT-comparable
    val calibStart = calibSec()
    var calibMid = -1.0
    val ordered = selected.toSeq
    var qIdx = 0
    val results = ordered.map { case (name, fn) =>
      qIdx += 1
      if (calibMid < 0 && qIdx > ordered.size / 2) calibMid = calibSec()
      // ONE untimed warm rep at the TARGET sf before the timed reps
      // (VERDICT r8 #3): shared pinned index builds (tokCorpus, the
      // graph tables, the dedup signature/pair/cluster tables) are
      // session-lifetime artifacts — at 100 TB they are persisted at
      // ingest, so charging their one-time build to whichever query
      // happens to run first made that query's median a phantom
      // (q_avg_nbr_deg 4.43 s median vs 1.28 s steady state in r8).
      // The warm rep also absorbs sf-scale JIT, so timed reps measure
      // steady-state throughput only.
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      dropDeadBlocks()
      jobs.set(0); stages.set(0); tasks.set(0)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        dropDeadBlocks()
        dt
      }
      settle()
      val median = times.sorted.apply(times.size / 2)
      name -> ((times, median, jobs.get / reps, stages.get / reps, tasks.get / reps))
    }
    phase("timed sweep done")
    val calibEnd = calibSec()
    if (calibMid < 0) calibMid = calibEnd
    val total = results.map(_._2._2).sum
    // min + a contention flag ride along with the median (VERDICT r7
    // #5): a median of 3 reps does not defend against SUSTAINED load —
    // r7's mm_decode_gif ran 16.0/14.2/2.4 s and the 14.2 median entered
    // the round comparison unmarked. Spread > 3× marks the entry so the
    // round-over-round read uses min (noise floor) instead.
    val detail = results.map { case (name, (times, median, j, st, tk)) =>
      val mn = times.min
      // relative AND absolute spread: the flag exists to catch the
      // multi-second in-sweep phantom spikes (r7 mm_decode_gif
      // 16.0/14.2/2.4), not a 70 ms scheduler wobble on a 33 ms
      // pinned-table read (r12 dedup_containment [0.102, 0.031, 0.033]
      // — 3.1× relative but pure noise floor). 0.25 s absolute is far
      // below any real spike and far above per-rep scheduler jitter.
      val noisy = mn > 0 && times.max / mn > 3.0 && times.max - mn > 0.25
      s"""  "$name": {"times": [${times.map(ms).mkString(", ")}], "median": ${ms(median)}, "min": ${ms(mn)}, "noisy": $noisy, "jobs": $j, "stages": $st, "tasks": $tk}"""
    }.mkString(",\n")
    // box load at sweep end — the ±40% day-band context for the reader
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // self-labeling contention flag (VERDICT r14 #7): the fixed-work
    // probe degrading >2x mid-sweep means the wall numbers are host
    // weather, not plans (r14's driver regeneration: calib 0.118→0.447,
    // total 191.9 s vs 128.1 s idle for identical code). Consumers must
    // not read a contended artifact as a round-over-round number.
    val calibRatio = if (calibStart > 0) math.max(calibMid, calibEnd) / calibStart else 1.0
    val contended = calibRatio > 2.0
    val detailJson =
      s"""{
         |"sf": "$sfDir", "reps": $reps, "n_queries": ${results.size},
         |"total_median": ${ms(total)}, "unit": "sec", "load_avg": ${ms(loadAvg)},
         |"calib_sec": {"start": ${ms(calibStart)}, "mid": ${ms(calibMid)}, "end": ${ms(calibEnd)}},
         |"calib_ratio": ${ms(calibRatio)}, "contended": $contended,
         |"queries": {
         |$detail
         |}
         |}""".stripMargin
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
        detailJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    // stdout carries ONLY the summary fields (VERDICT r9 #4: the
    // 413-entry per-query map overflowed the driver's captured log tail
    // and left BENCH_r09.json with parsed:null) — the full per-query
    // map lives in the detail sidecar, which cannot be truncated
    println(s"""{"sf":"$sfDir","reps":$reps,"detail":"$detailPath","n_queries":${results.size},"metric":"total","value":${ms(total)},"unit":"sec","calib_ratio":${ms(calibRatio)},"contended":$contended}""")
    spark.stop()
  }
}
