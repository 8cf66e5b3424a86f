package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.NearDup

class MinHashMd5Spec extends SparkSpec {

  test("native minhash_md5 equals the HOF formulation value-for-value") {
    import spark.implicits._
    MinHashMd5.register(spark)
    val docs = Seq(
      Seq("the quick brown", "quick brown fox", "brown fox jumps"),
      Seq("lorem ipsum dolor", "ipsum dolor sit"),
      Seq("single shingle")
    ).toDF("sh")
    val both = docs.select(
      expr("minhash_md5(sh, 8)").as("native"),
      NearDup.minhashes($"sh", 8).as("hof"))
    both.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("empty shingle set yields k nulls (array_min-of-empty semantics)") {
    import spark.implicits._
    MinHashMd5.register(spark)
    val out = Seq(Seq.empty[String]).toDF("sh")
      .select(expr("minhash_md5(sh, 4)")).as[Seq[String]].head()
    assert(out == Seq(null, null, null, null))
  }

  test("null elements are skipped like array_min skips them") {
    import spark.implicits._
    MinHashMd5.register(spark)
    val withNull = Seq((1, Seq("a", "b"))).toDF("id", "sh")
      .select(expr("minhash_md5(array(sh[0], CAST(NULL AS STRING), sh[1]), 3)").as("n"),
        NearDup.minhashes(array($"sh"(0), $"sh"(1)), 3).as("h"))
    val r = withNull.head()
    assert(r.getSeq[String](0) == r.getSeq[String](1))
  }
}
