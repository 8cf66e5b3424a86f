package graft.sources

import graft.SparkSpec

class GenSpec extends SparkSpec {
  import spark.implicits._

  lazy val gen = Gen.locations(spark, 2000).cache()

  test("row count and key uniqueness (reference keys are unique by construction)") {
    assert(gen.count() === 2000)
    assert(gen.select("locid").distinct().count() === 2000)
  }

  test("locid follows the reference's LOC%012d format") {
    val ids = gen.select("locid").as[String].collect()
    assert(ids.forall(_.matches("LOC\\d{12}")))
    assert(ids.contains("LOC000000000001"))
    assert(ids.contains("LOC000000002000"))
  }

  test("dictionary membership matches the reference's dictionaries") {
    val tz = gen.select("loctimezone").distinct().as[String].collect().toSet
    assert(tz.subsetOf(Gen.timezones.toSet))
    val c = gen.select("country").distinct().as[String].collect().toSet
    assert(c.subsetOf(Gen.countries.toSet))
    val ln = gen.select("locname").as[String].collect()
    assert(ln.forall(n => Gen.locnames.exists(b => n.matches(s"${b}_\\d{1,3}"))))
    val bz = gen.select("business").as[String].collect()
    assert(bz.forall(n => Gen.businesses.exists(b => n.matches(s"${b}_\\d{1,3}"))))
  }

  test("deterministic: two invocations produce identical data") {
    val again = Gen.locations(spark, 2000)
    assert(gen.exceptAll(again).count() === 0)
    assert(again.exceptAll(gen).count() === 0)
  }
}
