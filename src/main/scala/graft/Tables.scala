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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's timestamp type
    * (µs) cannot represent directly ([PARQUET_TYPE_ILLEGAL]). Read the
    * column as raw nanos and truncate to µs — exactly what µs-native
    * engines (DuckDB included) do when reading the same file, so oracle
    * comparisons agree.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
  }
}
