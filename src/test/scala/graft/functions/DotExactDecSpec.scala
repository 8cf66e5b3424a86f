package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.vector.VectorOps

class DotExactDecSpec extends SparkSpec {

  test("native dot_exact_dec equals the HOF decimal kernel on doubles and floats") {
    import spark.implicits._
    val doubles = Seq(
      (Seq(1.25, -2.5, 3.75), Seq(0.5, 4.0, -1.0)),
      (Seq(1e-7, 2e-7, 3e-7), Seq(1e7, 2e7, 3e7)),
      (Seq(0.1, 0.2, 0.3), Seq(0.3, 0.2, 0.1))
    ).toDF("a", "b")
    doubles.select(
      VectorOps.dotExact($"a", $"b").as("n"),
      VectorOps.dotExactHof($"a", $"b").as("h")
    ).collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1)))

    val floats = Seq((Seq(1.5f, -0.25f, 0.125f), Seq(2.0f, 4.0f, -8.0f)))
      .toDF("a", "b")
    floats.select(
      VectorOps.dotExact($"a", $"b").as("n"),
      VectorOps.dotExactHof($"a", $"b").as("h")
    ).collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null element and length mismatch null the result, like the HOF kernel") {
    import spark.implicits._
    val df = Seq(1).toDF("x").select(
      VectorOps.dotExact(
        array(lit(1.0), lit(null).cast("double")), array(lit(2.0), lit(3.0))).as("n1"),
      VectorOps.dotExactHof(
        array(lit(1.0), lit(null).cast("double")), array(lit(2.0), lit(3.0))).as("h1"),
      VectorOps.dotExact(
        array(lit(1.0)), array(lit(2.0), lit(3.0))).as("n2"),
      VectorOps.dotExactHof(
        array(lit(1.0)), array(lit(2.0), lit(3.0))).as("h2"))
    val r = df.head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("partition-order independence (the property the decimal detour buys)") {
    import spark.implicits._
    val df = spark.range(200).select($"id",
      transform(sequence(lit(1), lit(64)),
        d => sin($"id" * d.cast("double"))).as("v"))
    val a = df.select($"id", VectorOps.dotExact($"v", $"v").as("d"))
      .as[(Long, Double)].collect().toMap
    val b = df.repartition(13).select($"id", VectorOps.dotExact($"v", $"v").as("d"))
      .as[(Long, Double)].collect().toMap
    assert(a == b)
  }
}
