package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JVM-local flag the poisoned partition flips before throwing, so the
  * spec can assert the failure actually fired (accumulator updates from
  * failed tasks are discarded, a static works in local mode).
  */
object RetryProbe {
  @volatile var injected = false
}

/** Task-retry determinism — the last unpinned seam in the 100-TB
  * hash-stability argument (SURVEY §9, r11 VERDICT #6): on a real
  * cluster tasks fail and re-run (and speculation double-runs them), so
  * every gate's output must be identical whether or not any partition's
  * first attempt died. Partition-count invariance is pinned elsewhere;
  * this injects a FIRST-ATTEMPT-ONLY failure (TaskContext.attemptNumber
  * == 0 → throw) into representative plan shapes — the exact-decimal
  * aggregate, the decimal-detour shuffle agg, and the window top-k —
  * and asserts the retried run collects value-identical rows. The
  * shared test master is `local[4, 2]` (maxFailures 2) so the retry
  * actually happens instead of failing the job.
  */
class RetryDeterminismSpec extends SparkSpec {
  import spark.implicits._

  /** Re-emits `df` with partition 0's first attempt throwing. The RDD
    * round-trip is the injection seam, not part of the shape under
    * test — retry semantics, not plan shape, are the subject here.
    */
  private def poison(df: DataFrame): DataFrame = {
    val st = df.schema
    val rdd = df.rdd.mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
        RetryProbe.injected = true
        throw new RuntimeException("injected first-attempt task failure")
      }
      it
    }
    spark.createDataFrame(rdd, st)
  }

  private def runBoth(shape: DataFrame => DataFrame, input: DataFrame):
      (Seq[String], Seq[String]) = {
    val base = shape(input).collect().map(_.toString).toSeq
    RetryProbe.injected = false
    val retried = shape(poison(input)).collect().map(_.toString).toSeq
    assert(RetryProbe.injected, "the injected failure never fired")
    (base, retried)
  }

  test("exact-decimal kernel aggregate is value-stable under task retry") {
    val emb = Tables(spark, sf0001, "embeddings")
      .select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("v"))
    val (base, retried) = runBoth(df => df
      .select(($"vec_id" % 7).as("g"),
        expr("dot_exact_dec(v, v)").as("nsq"))
      .groupBy($"g")
      .agg(sum($"nsq".cast("decimal(30,15)")).cast("double").as("s"),
        count(lit(1)).as("n"))
      .orderBy($"g"), emb)
    assert(retried == base, "retry changed the decimal aggregate")
  }

  test("decimal-detour shuffle aggregate is value-stable under task retry") {
    import graft.functions.Exact._
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
    val (base, retried) = runBoth(df => df
      .groupBy($"l_returnflag")
      .agg(dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag"), li)
    assert(retried == base, "retry changed the dsum aggregate")
  }

  test("window top-k is value-stable under task retry") {
    import org.apache.spark.sql.expressions.Window
    val ord = Tables(spark, sf0001, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val (base, retried) = runBoth(df => df
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .orderBy($"o_custkey", $"rk"), ord)
    assert(retried == base, "retry changed the window top-k")
  }
}
