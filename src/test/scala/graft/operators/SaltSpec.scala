package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on heavily skewed data") {
    // 90% of fact rows share one hot key; the rest spread over 2..8
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 2 + i % 7 else 1, i.toLong))
      .toDF("k", "rid")
    val small = Seq((1, "hot"), (2, "a"), (3, "b"), (4, "c"), (5, "d"), (6, "e"),
      (7, "f"), (8, "g")).toDF("k", "v")
    val salted = Salt.saltedJoin(big, small, "k", $"rid", 8)
      .select("k", "rid", "v").as[(Int, Long, String)].collect().toSet
    val plain = big.join(small, "k")
      .select("k", "rid", "v").as[(Int, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == 1) == 900)
  }

  test("salting spreads a hot key over multiple join partitions") {
    val big = (1 to 400).map(i => (1, i.toLong)).toDF("k", "rid")
    val salts = big.withColumn("__salt", pmod(hash($"rid"), lit(8)))
      .select("__salt").distinct().count()
    assert(salts == 8) // all sub-keys materialize
  }
}
