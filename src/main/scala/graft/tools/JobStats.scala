package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev tool: run named registered queries once (after one untimed warm
  * rep) and report wall seconds + Spark job/stage/task counts + summed
  * task time — separates job-scheduling-floor-bound gates (many tiny
  * jobs, task time ≪ jobs × floor) from compute-bound ones.
  *
  * Usage: runMain graft.tools.JobStats <sfDir> <q1> [q2 ...]
  */
object JobStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratch.sparkLocalDir)
    // A/B hook: SPARK_GRAFT_EXTRA_CONFS="k=v;k=v" applied at session build
    val spark = sys.env.get("SPARK_GRAFT_EXTRA_CONFS")
      .map(_.split(";").filter(_.contains("=")))
      .getOrElse(Array.empty)
      .foldLeft(b0) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val deserMs = new AtomicLong(0L)
    val runMs = new AtomicLong(0L)
    val gcMs = new AtomicLong(0L)
    val cpuNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
        if (t.taskMetrics != null) {
          deserMs.addAndGet(t.taskMetrics.executorDeserializeTime)
          runMs.addAndGet(t.taskMetrics.executorRunTime)
          gcMs.addAndGet(t.taskMetrics.jvmGCTime)
          cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
        }
        ()
      }
    })
    println(f"${"query"}%-34s ${"sec"}%8s ${"jobs"}%6s ${"stages"}%7s ${"tasks"}%7s ${"taskSec"}%8s ${"deser"}%7s ${"run"}%7s ${"cpu"}%7s ${"gc"}%6s")
    // synthetic floor anchors: "__floor" = N no-shuffle 1-row jobs,
    // "__floorshuffle" = N one-exchange tiny aggregations, "__floorckpt"
    // = N localCheckpoints of a tiny frame — the per-job driver costs the
    // loop-gate ledger multiplies by its job count
    def floorBody(name: String): Option[Int => Unit] = name match {
      case "__floor" => Some { i =>
        spark.range(1).selectExpr(s"id + $i AS x").count(); ()
      }
      case "__floorshuffle" => Some { i =>
        spark.range(100).selectExpr(s"id % 7 AS k", s"id + $i AS v")
          .groupBy("k").sum("v").count(); ()
      }
      case "__floorckpt" => Some { i =>
        spark.range(100).selectExpr(s"id + $i AS x")
          .localCheckpoint(true).count(); ()
      }
      case _ => None
    }
    names.foreach { name =>
      floorBody(name) match {
        case Some(body) =>
          (1 to 5).foreach(body) // warm
          jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
          deserMs.set(0L); runMs.set(0L); gcMs.set(0L); cpuNs.set(0L)
          val t0 = System.nanoTime()
          (1 to 40).foreach(body)
          val sec = (System.nanoTime() - t0) / 1e9
          Thread.sleep(200)
          println(f"$name%-34s $sec%8.3f ${jobs.get}%6d ${stages.get}%7d ${tasks.get}%7d ${taskMs.get / 1000.0}%8.1f ${deserMs.get / 1000.0}%7.1f ${runMs.get / 1000.0}%7.1f ${cpuNs.get / 1e9}%7.1f ${gcMs.get / 1000.0}%6.1f")
        case None =>
      try {
        // warm rep: memoized artifacts/codegen off the measured rep
        graft.Queries.queries(name)(spark, sfDir).count()
        graft.CacheTracker.releaseAll()
        Thread.sleep(200)
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
        deserMs.set(0L); runMs.set(0L); gcMs.set(0L); cpuNs.set(0L)
        val t0 = System.nanoTime()
        graft.Queries.queries(name)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.CacheTracker.releaseAll()
        Thread.sleep(200) // let listener events drain
        println(f"$name%-34s $sec%8.3f ${jobs.get}%6d ${stages.get}%7d ${tasks.get}%7d ${taskMs.get / 1000.0}%8.1f ${deserMs.get / 1000.0}%7.1f ${runMs.get / 1000.0}%7.1f ${cpuNs.get / 1e9}%7.1f ${gcMs.get / 1000.0}%6.1f")
      } catch {
        case e: Throwable => System.err.println(s"[jobstats] $name FAILED: ${e.getMessage}")
      }
      }
    }
    spark.stop()
  }
}
