package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Dev-only bench profiler: runs named SparkEntry queries N times at a
  * given SF dir and prints wall time + Spark job/stage/task counts per
  * run — fixed-cost (scheduling, checkpoint-job) overhead shows up as a
  * high job count on a tiny input. Not part of the driver protocol.
  *
  * Usage: Profile <sfDir> <repeats> <query> [query ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = graft.GraftSession.local(logLevel = "ERROR")
    val jobs = new AtomicLong; val stages = new AtomicLong; val tasks = new AtomicLong
    // SPARK_GRAFT_PROFILE_JOBS=1: print each job's call site — the
    // fastest way to see WHICH operator a 40-job query spends them on
    val traceJobs = sys.env.get("SPARK_GRAFT_PROFILE_JOBS").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (traceJobs) {
          val eid = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.sql.execution.id"))).getOrElse("-")
          val names = j.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
          println(f"  job ${j.jobId}%-4d exec=$eid%-4s stages=${j.stageInfos.size} ${names.mkString(" | ")}")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    def drop(): Unit = graft.GraftSession.dropDeadBlocks(spark)
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      for (r <- 1 to reps) {
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        drop()
        // the listener bus is async: wait until the counters stop moving
        // (two consecutive identical reads 200 ms apart) so a slow drain
        // neither undercounts this run nor bleeds into the next
        var prev = -1L
        var cur = jobs.get + stages.get + tasks.get
        while (cur != prev) {
          Thread.sleep(200)
          prev = cur
          cur = jobs.get + stages.get + tasks.get
        }
        println(f"$name%-24s run$r%d  ${dt}%6.2f s  rows=$n%-7d jobs=${jobs.get}%-4d stages=${stages.get}%-4d tasks=${tasks.get}%d")
      }
    }
    spark.stop()
  }
}
