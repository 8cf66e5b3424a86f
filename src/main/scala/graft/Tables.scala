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

  /** `events.ts` has shipped as two parquet physical types across corpus
    * generations: TIMESTAMP(MICROS) (read natively) and TIMESTAMP(NANOS),
    * which Spark's µs timestamp type cannot represent directly
    * ([PARQUET_TYPE_ILLEGAL]). For the nanos generation, read the column as
    * raw nanos and truncate to µs — exactly what µs-native engines (DuckDB
    * included) do when reading the same file, so oracle comparisons agree.
    *
    * Truncation uses integer `div`, not `/`: nanosecond epochs (~1.7e18)
    * exceed double's 53-bit mantissa, so float division would round by up
    * to ±1 µs near boundaries and diverge from DuckDB's exact result.
    *
    * The `nanosAsLong` legacy flag is restored after the eager schema read
    * so it does not leak into unrelated parquet reads on the shared session.
    * Either way the result is timestamp_ntz: wall-clock equals the file's
    * naive value (session is UTC), and parquet dumps stay NTZ so oracle
    * engines read them naive rather than as UTC-adjusted instants.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val df = spark.read.parquet(s"$dir/events.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // nanos generation
          df.withColumn(
            "ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        case _ => // µs generation: already a timestamp; just normalize to NTZ
          df.withColumn("ts", col("ts").cast("timestamp_ntz"))
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
