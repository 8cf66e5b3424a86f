package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Data-lake layout: hive-style partitioned writes and partition-pruned
  * reads — with bucketing (BucketingSpec), the two write-time layouts
  * that turn full scans into targeted reads at 100 TB.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy month writes a pruned-readable layout") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_orders_by_month"
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    orders.withColumn("month", date_format($"o_orderdate", "yyyy-MM"))
      .write.partitionBy("month").mode("overwrite").parquet(out)

    val pruned = spark.read.parquet(out).filter($"month" === "1996-03")
    val plan = pruned.queryExecution.executedPlan.toString

    // the month predicate must land in PartitionFilters (directory
    // pruning), not in the row-level data filters
    assert(plan.contains("PartitionFilters: [isnotnull(month"), plan)
    assert(plan.contains("(month"), plan)

    val expected = orders
      .filter(date_format($"o_orderdate", "yyyy-MM") === "1996-03").count()
    assert(pruned.count() == expected && expected > 0)
  }
}
