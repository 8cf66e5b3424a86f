package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SharedSpark

/** Randomized lock on HashRank's claim: the two-phase bucketed rank —
  * leading-hash-byte buckets, per-bucket histogram offsets, bounded
  * within-bucket windows — must equal the naive single-window
  * `row_number` rank EXACTLY, for arbitrary group layouts including
  * groups that land entirely in one bucket and groups spread thin.
  */
object HashRankProps extends Properties("hashRank") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val layout = for {
    n <- Gen.choose(0, 120)
    groups <- Gen.listOfN(n, Gen.choose(0, 3))
  } yield groups.zipWithIndex.map { case (g, i) => (g, i.toLong) }

  property("bucketed two-phase rank equals the single-window rank") =
    forAll(layout) { rows =>
      val df = rows.toDF("g", "id")
      val got = HashRank.rank(df, "g", "id", "hr|")
        .select($"g", $"id", $"rk")
        .as[(Int, Long, Long)].collect().toSet
      val naive = df.withColumn("rk",
          row_number().over(Window.partitionBy($"g")
            .orderBy(md5(concat(lit("hr|"), $"id".cast("string"))), $"id"))
            .cast("long"))
        .as[(Int, Long, Long)].collect().toSet
      got == naive
    }
}
