package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` output for named registered
  * queries to files — the optimization-round plan evidence
  * (`plans/r16/<query>_<suffix>.txt`).
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> <q1> [q2 ...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratch.sparkLocalDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = graft.Queries.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[explain] wrote $outDir/${name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[explain] $name FAILED: ${e.getMessage}")
      } finally graft.CacheTracker.releaseAll()
    }
    spark.stop()
  }
}
