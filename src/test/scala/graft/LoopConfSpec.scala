package graft

class LoopConfSpec extends SparkSpec {

  test("width derives from state size: floor 4, linear growth, core cap") {
    val cores = spark.sparkContext.defaultParallelism
    assert(LoopConf.width(spark, 0L) === 4)
    assert(LoopConf.width(spark, 5000L) === 4, "gate-scale state stays tiny")
    assert(LoopConf.width(spark, 1000000L) === 11,
      "one partition per ~100k state rows")
    assert(LoopConf.width(spark, Long.MaxValue / 2) === cores * 8,
      "huge state caps at 8x cores")
  }

  test("tight scopes AQE/partitions to the body and restores after") {
    val aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
    val sp0 = spark.conf.get("spark.sql.shuffle.partitions")
    LoopConf.tight(spark, 5000L) {
      assert(spark.conf.get("spark.sql.adaptive.enabled") === "false")
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "4")
      // the eager-loop contract: work INSIDE the body sees the width
      val parts = spark.range(100).selectExpr("id % 7 AS k")
        .groupBy("k").count().rdd.getNumPartitions
      assert(parts === 4)
    }
    assert(spark.conf.get("spark.sql.adaptive.enabled") === aqe0)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === sp0)
  }

  test("tight restores on exception (the Confs contract)") {
    val aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
    intercept[RuntimeException] {
      LoopConf.tight(spark, 5000L) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get("spark.sql.adaptive.enabled") === aqe0)
  }
}
