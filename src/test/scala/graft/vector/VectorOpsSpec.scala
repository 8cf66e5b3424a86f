package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkSpec
import VectorOps._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private val a = array(Seq(1.0f, 2.0f, 3.0f).map(lit(_)): _*)
  private val b = array(Seq(4.0f, -5.0f, 6.0f).map(lit(_)): _*)

  test("dotExact computes the exact dot product") {
    val got = spark.range(1).select(dotExact(a, b)).as[Double].collect().head
    assert(got == 1.0 * 4 - 2 * 5 + 3 * 6)
  }

  test("cosine: self-similarity is 1, orthogonal is 0") {
    val x = array(lit(3.0f), lit(0.0f))
    val y = array(lit(0.0f), lit(7.0f))
    val got = spark.range(1)
      .select(cosine(x, x).as("self"), cosine(x, y).as("orth"))
      .as[(Double, Double)].collect().head
    assert(got._1 == 1.0)
    assert(got._2 == 0.0)
  }

  test("cosineFast tracks the exact cosine within 1e-12") {
    val vs = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(16)(d => ((i * 31 + d * 7) % 13 - 6) / 6.0f)))
    val df = vs.toDF("id", "v")
    val got = df.as("x").crossJoin(df.as("y"))
      .where($"x.id" < $"y.id")
      .select(cosine($"x.v", $"y.v").as("exact"),
        cosineFast($"x.v", $"y.v").as("fast"))
      .as[(Double, Double)].collect()
    got.foreach { case (e, f) => assert(math.abs(e - f) < 1e-12) }
  }

  test("signBucket is deterministic and stable under tiny perturbation for most vectors") {
    val vs = (0 until 100).map(i =>
      (i.toLong, Array.tabulate(32)(d => ((i * 17 + d * 3) % 19 - 9) / 9.0f)))
    val df = vs.toDF("id", "v")
    val b1 = df.select($"id", signBucket($"v", 6).as("b")).as[(Long, String)].collect().toMap
    val b2 = df.repartition(7).select($"id", signBucket($"v", 6).as("b"))
      .as[(Long, String)].collect().toMap
    assert(b1 == b2) // partition-count independent
    assert(b1.values.forall(s => s.length == 6 && s.forall(c => c == '0' || c == '1')))
    // perturbing one dim slightly keeps the bucket for the large majority
    val perturbed = df.select($"id",
        transform($"v", (x, d) => when(d === 0, x + lit(0.01f)).otherwise(x)).as("v"))
      .select($"id", signBucket($"v", 6).as("b")).as[(Long, String)].collect().toMap
    val kept = b1.count { case (id, bk) => perturbed(id) == bk }
    assert(kept >= 90)
  }
}
