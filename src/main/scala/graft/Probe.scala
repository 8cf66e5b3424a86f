package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Dev profiling harness: runs one registered query at a given SF dir
  * and prints per-stage wall/run times + task counts — the tool that
  * separates "slow kernel" from "serial stage" from "scheduling fixed
  * cost" (e.g. it exposed the 1-partition cache serializing the PQ
  * training rounds). Usage:
  *   sbt "runMain graft.Probe <queryName> [sfDir]"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "sim_pq_adc_knn"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", Scratch.dir)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val stages = ArrayBuffer[(Int, Long, Long, String)]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        stages.synchronized { stages += ((i.stageId,
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          i.taskMetrics.executorRunTime,
          i.numTasks + "t " + i.details.split("\n")
            .find(_.contains("graft")).getOrElse(i.name).take(80))) }
      }
    })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warm")(Tables(s, dir, "lineitem").count())
    stages.synchronized(stages.clear())
    for (i <- 1 to 2)
      t(s"${name}_run$i")(Queries.queries(name)(s, dir).collect())
    Thread.sleep(500) // listener bus drain heuristic (bus API is private)
    val snap = stages.synchronized(stages.toVector)
    println("PROBE total wall over stages (ms): " + snap.map(_._2).sum)
    snap.sortBy(_._1).foreach { case (id, wall, run, n) =>
      println(f"PROBE stage $id%4d wall=$wall%6d ms run=$run%6d ms  $n")
    }
    graft.CacheTracker.releaseAll()
    s.stop()
  }
}
