package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // shuffle/spill on tmpfs: this host's disk stalls under iowait and
      // was adding 10x noise to shuffle-heavy query timings
      .config("spark.local.dir", Scratch.sparkLocalDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup so the first measured query doesn't pay one-time
    // JVM/codegen/scheduler costs; also primes each table's footer/schema
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.names.foreach { t =>
      try Tables(spark, sfDir, t).schema catch { case _: Throwable => }
    }
    val errors = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      } finally CacheTracker.releaseAll()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
