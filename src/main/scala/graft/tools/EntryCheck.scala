package graft.tools

/** Driver-contract smoke check (dev tool): SparkEntry.entry must return
  * rows on sf0.001 — the exact probe the round driver runs.
  */
object EntryCheck {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratch.sparkLocalDir)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(s).count()
    println(s"[entry] rows=$n")
    require(n > 0, "entry() returned no rows")
    s.stop()
  }
}
