package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SignBitsSpec extends SparkSpec {

  private def refBits(v: Seq[Double], h: Int): String =
    (0 until h).map { j =>
      val p = v.indices.map { d0 =>
        // independent md5 weight: first 4 hex chars of
        // md5("signw" ++ (j*1000 + d)) mod 97, minus 48
        val key = s"signw${j * 1000 + d0 + 1}"
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(key.getBytes("UTF-8"))
          .take(2).map("%02x".format(_)).mkString
        val w = (Integer.parseInt(hex, 16) % 97) - 48
        w.toLong * math.floor(v(d0) * 1048576.0).toLong
      }.sum
      if (p >= 0) '1' else '0'
    }.mkString

  test("matches an independent Scala reimplementation of the formula") {
    import spark.implicits._
    SignBits.register(spark)
    val vecs = Seq(
      Seq.tabulate(64)(d => math.sin(d + 1.0)),
      Seq.tabulate(64)(d => -0.5 + 0.03 * d),
      Seq.fill(64)(0.0))
    val out = vecs.toDF("v").select(expr("sign_bits(v, 24)")).as[String].collect()
    assert(out.toSeq == vecs.map(refBits(_, 24)))
  }

  test("deterministic across partitionings") {
    import spark.implicits._
    SignBits.register(spark)
    val df = spark.range(100).select($"id",
      transform(sequence(lit(1), lit(64)),
        d => sin($"id" * d.cast("double"))).as("v"))
    val a = df.select($"id", expr("sign_bits(v, 18)").as("s"))
      .as[(Long, String)].collect().toMap
    val b = df.repartition(7).select($"id", expr("sign_bits(v, 18)").as("s"))
      .as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("float input produces the same signature as its double widening") {
    import spark.implicits._
    SignBits.register(spark)
    val f = Seq(Seq.tabulate(64)(d => (0.1f * d - 2.5f))).toDF("vf")
    val both = f.select(
      expr("sign_bits(vf, 12)").as("from_float"),
      expr("sign_bits(transform(vf, x -> CAST(x AS DOUBLE)), 12)").as("from_double"))
    val r = both.head()
    assert(r.getString(0) == r.getString(1))
  }
}
