package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the EXECUTED physical plan of one registered query
  * (post-AQE, after materialization) — what PlanSpec asserts against.
  * Usage: sbt "runMain graft.PlanDump <queryName> [sfDir]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q1_pricing_summary"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", Scratch.dir)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = Queries.queries(name)(s, dir)
    df.collect()
    println("=== EXECUTED PLAN: " + name + " ===")
    println(df.queryExecution.executedPlan.toString)
    graft.CacheTracker.releaseAll()
    s.stop()
  }
}
