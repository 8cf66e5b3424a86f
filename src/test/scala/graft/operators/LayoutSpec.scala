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

  test("compaction collapses small files per partition, rows invariant") {
    import java.nio.file.Paths
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_events_compact"
    // Tables() handles the nanos-timestamp conversion a raw read rejects
    val events = graft.Tables(spark, sf0001, "events")
    // fragment: 16 tiny files per event_type partition
    events.repartition(16)
      .write.partitionBy("event_type").mode("overwrite").parquet(out)

    // exact-decimal sum: a double sum is order-sensitive and the
    // rewrite reorders rows across files
    def stamp() = spark.read.parquet(out)
      .agg(count(lit(1)), graft.functions.Exact.dsum($"value")).collect()(0)
    val beforeRows = stamp()
    val parts = Compaction.partitionDirs(Paths.get(out))
    assert(parts.nonEmpty)
    assert(parts.forall(p => Compaction.dataFiles(p).size == 16),
      "fixture must start fragmented")

    // generous target: every partition's bytes fit one file -> k = 1
    val (before, after) =
      Compaction.compactPartitioned(spark, out, targetBytes = 1L << 30)
    assert(before == 16 * parts.size, s"counted $before files before")
    assert(after == parts.size, s"expected 1 file/partition, got $after")
    assert(parts.forall(p => Compaction.dataFiles(p).size == 1))

    // values invariant under the rewrite
    assert(stamp() == beforeRows)

    // partitions already at target are left alone: recompacting moves
    // nothing (same file names survive)
    val names = parts.map(p => Compaction.dataFiles(p).map(_.getFileName.toString))
    Compaction.compactPartitioned(spark, out, targetBytes = 1L << 30)
    assert(parts.map(p => Compaction.dataFiles(p).map(_.getFileName.toString)) == names,
      "already-compact partitions must not be rewritten")
  }
}
