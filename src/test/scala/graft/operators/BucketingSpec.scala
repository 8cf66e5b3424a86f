package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def resetTable(name: String): Unit =
    Bucketing.resetTable(spark, name)

  /** At sf0.001 the planner rightly prefers a broadcast join and skips
    * the bucketed layout entirely; pin the configuration that models the
    * at-scale case (both sides too big to broadcast) so the test asserts
    * the layout the bucketing exists for.
    */
  private def withBucketedScan[A](body: => A): A = {
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.sources.bucketing.autoBucketedScan.enabled")
      .map(k => k -> conf.getOption(k))
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try body finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  private def orders = spark.read.parquet(s"$sf0001/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_totalprice")
  private def lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select("l_orderkey", "l_quantity")
    .withColumnRenamed("l_orderkey", "o_orderkey")

  /** Each test provisions its own tables so they run in isolation. */
  private def writeTables(): Unit = {
    resetTable("b_orders"); resetTable("b_lineitem")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 4)
  }

  test("join of co-bucketed tables plans without any exchange") {
    writeTables()
    withBucketedScan {
      val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      // and the result matches the plain (shuffling) join
      val expected = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() == expected)
    }
  }

  test("bucket pruning: an equality filter on the bucket key reads one bucket") {
    if (!spark.catalog.tableExists("b_orders")) writeTables()
    withBucketedScan {
      val joined = spark.table("b_orders").filter($"o_orderkey" === 7)
      // selected bucket count appears in the scan description
      val scan = joined.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 4"), scan)
    }
  }
}
