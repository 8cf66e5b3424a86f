package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    spark.read.parquet(s"$dir/$name.parquet")
}
