package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("lastWins keeps the highest-seq row per key (intra-batch duplicates)") {
    val df = Seq(
      ("k1", "old", 1L), ("k1", "new", 2L),
      ("k2", "only", 1L),
      ("k3", "a", 5L), ("k3", "b", 3L), ("k3", "c", 4L)
    ).toDF("k", "v", "seq")
    val got = Upsert.lastWins(df, Seq("k"), col("seq"))
      .orderBy("k").select("k", "v").as[(String, String)].collect().toSeq
    assert(got === Seq(("k1", "new"), ("k2", "only"), ("k3", "a")))
  }

  test("upsert: incoming wins per key, existing rows without match survive") {
    val existing = Seq(("k1", "e1"), ("k2", "e2")).toDF("k", "v")
    val incoming = Seq(("k2", "i2"), ("k3", "i3")).toDF("k", "v")
    val got = Upsert.upsert(existing, incoming, Seq("k"), lit(0L))
      .orderBy("k").as[(String, String)].collect().toSeq
    assert(got === Seq(("k1", "e1"), ("k2", "i2"), ("k3", "i3")))
  }

  test("upsert is idempotent: re-applying the same incoming changes nothing") {
    val existing = Seq(("k1", "e1"), ("k2", "e2")).toDF("k", "v")
    val incoming = Seq(("k2", "i2"), ("k3", "i3")).toDF("k", "v")
    val once = Upsert.upsert(existing, incoming, Seq("k"), lit(0L))
    val twice = Upsert.upsert(once, incoming, Seq("k"), lit(0L))
    assert(twice.orderBy("k").collect().toSeq === once.orderBy("k").collect().toSeq)
  }

  test("within incoming, the higher incomingSeq wins deterministically") {
    val existing = Seq(("k1", "e1")).toDF("k", "v").withColumn("s", lit(0L))
    val incoming = Seq(("k1", "first", 1L), ("k1", "second", 2L))
      .toDF("k", "v", "s")
    val merged = Upsert.lastWins(existing.unionByName(incoming), Seq("k"), col("s"))
    assert(merged.select("v").as[String].collect().toSeq === Seq("second"))
  }
}
