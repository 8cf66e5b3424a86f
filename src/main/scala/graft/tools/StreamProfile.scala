package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.{Scratch, SparkEntry, Tables}

/** Dev profiler for the streaming gates: runs the named gates once with
  * a listener dumping each micro-batch's durationMs breakdown
  * (triggerExecution = total; addBatch / queryPlanning / walCommit /
  * commitOffsets / getBatch / latestOffset the slices), so floor work
  * targets the measured slice instead of a guess.
  *
  *   sbt "runMain graft.tools.StreamProfile stream_sessions_30m"
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Scratch.sparkLocalDir)
      .config("spark.sql.warehouse.dir",
        s"${Scratch.dir}/graft_warehouse_${Scratch.runToken}")
      .config("spark.sql.streaming.stateStore.maintenanceInterval",
        sys.env.getOrElse("PROF_MAINT", "60s"))
      .config("spark.sql.streaming.minBatchesToRetain",
        sys.env.getOrElse("PROF_RETAIN", "100"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.names.foreach { t =>
      try Tables(spark, sfDir, t).schema catch { case _: Throwable => }
    }
    // job/task accounting between batch boundaries: how much of addBatch
    // is actual task work vs scheduling/commit machinery
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          if (t.taskMetrics != null)
            taskMs.addAndGet(t.taskMetrics.executorRunTime)
        }
      })
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[prof] start ${e.id} at ${System.nanoTime() / 1000000}ms")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        println(s"[prof] batch=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${d.get("triggerExecution")} " +
          s"addBatch=${d.get("addBatch")} plan=${d.get("queryPlanning")} " +
          s"wal=${d.get("walCommit")} offsets=${d.get("commitOffsets")} " +
          s"getBatch=${d.get("getBatch")} latest=${d.get("latestOffset")} " +
          s"jobs=${jobs.getAndSet(0)} tasks=${tasks.getAndSet(0)} " +
          s"taskMs=${taskMs.getAndSet(0)}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[prof] end ${e.id} at ${System.nanoTime() / 1000000}ms")
    })
    args.foreach { name =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        graft.CacheTracker.releaseAll()
        println(f"[prof] $name rep$rep total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
