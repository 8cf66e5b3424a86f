package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev-only subset of [[Verify]]: runs just the queries whose names start
  * with one of the given prefixes, so a new query can be oracle-checked in
  * seconds instead of re-running all of them.
  *
  * Usage: runMain graft.DevVerify <sfDir> <outDir> <prefix> [prefix...]
  * Then:  python3 scripts/check_oracle.py <sfDir> <outDir>
  */
object DevVerify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val prefixes = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Scratch.sparkLocalDir)
      .config("spark.sql.warehouse.dir",
        s"${Scratch.dir}/graft_warehouse_${Scratch.runToken}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = new java.io.File(outDir)
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).getOrElse(Array.empty).foreach(rm); x.delete(); ()
    }
    if (out.exists()) rm(out)
    out.mkdirs()
    val sel = SparkEntry.queries.filter { case (n, _) => prefixes.exists(n.startsWith) }
    sel.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[dev-verify] $name failed: ${e.getMessage}")
      }
      finally CacheTracker.releaseAll()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter { case (k, _) => sel.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
