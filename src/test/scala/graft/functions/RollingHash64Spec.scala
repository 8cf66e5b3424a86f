package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RollingHash64Spec extends SparkSpec {

  private def reference(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 2147483647L)

  test("matches the reference fold, including empty string") {
    val s = spark
    import s.implicits._
    RollingHash64.register(s)
    val inputs = Seq("", "a", "abc", "the quick brown fox", "x" * 1000)
    val got = inputs.toDF("s")
      .select(expr("rolling_hash64(s)").as("h"))
      .as[Long].collect().toSeq
    assert(got == inputs.map(reference))
  }

  test("null in, null out") {
    val s = spark
    import s.implicits._
    RollingHash64.register(s)
    val got = Seq[Option[String]](None, Some("abc")).toDF("s")
      .select(expr("rolling_hash64(s)")).collect()
    assert(got(0).isNullAt(0) && got(1).getLong(0) == reference("abc"))
  }

  test("codegen and interpreted paths agree") {
    val s = spark
    import s.implicits._
    RollingHash64.register(s)
    val df = Seq("graft", "spark", "").toDF("s")
    val withCodegen = df.select(expr("rolling_hash64(s)")).collect().map(_.getLong(0))
    // interpreted: eval the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interpreted = Seq("graft", "spark", "").map { v =>
      RollingHash64(Literal(v)).eval(null).asInstanceOf[Long]
    }
    assert(withCodegen.toSeq == interpreted)
  }

  test("is resolvable through SQL after registration") {
    val s = spark
    RollingHash64.register(s)
    val r = s.sql("SELECT rolling_hash64('abc') AS h").collect()(0).getLong(0)
    assert(r == reference("abc"))
  }
}
