package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver's read-only parquet corpus (TESTDATA.md).
  *
  * Plain `spark.read.parquet` so Catalyst gets the parquet footer schema and
  * can push filters/prune columns into the scan — at 100 TB the scan is the
  * dominant cost and pushdown/pruning is what keeps it proportional to the
  * query, not the table.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every query loads its tables through here, so this is the one
    // choke point where the custom function surface is guaranteed
    // registered before any plan that references it is analyzed
    graft.functions.Registry.registerAll(spark)
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's timestamp type
    * (µs) cannot represent directly ([PARQUET_TYPE_ILLEGAL]). Read the
    * column as raw nanos and truncate to µs — exactly what µs-native
    * engines (DuckDB included) do when reading the same file, so oracle
    * comparisons agree.
    *
    * Truncation uses integer `div`, not `/`: nanosecond epochs (~1.7e18)
    * exceed double's 53-bit mantissa, so float division would round by up
    * to ±1 µs near boundaries and diverge from DuckDB's exact result.
    *
    * The `nanosAsLong` legacy flag is restored after the eager schema read
    * so it does not leak into unrelated parquet reads on the shared session.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val df = spark.read.parquet(s"$dir/events.parquet")
      df.schema // force schema resolution while the flag is set
      // timestamp_ntz: wall-clock equals the file's naive nanos (session is
      // UTC), and parquet dumps stay NTZ so oracle engines read them naive
      // rather than as UTC-adjusted instants.
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
