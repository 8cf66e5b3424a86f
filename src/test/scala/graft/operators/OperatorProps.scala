package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SharedSpark
import graft.sources.{Gen => GGen}

/** Property-based checks of the algebraic laws the engine's merge and
  * pagination operators rely on (SURVEY.md §5 point 3).
  */
object OperatorProps extends Properties("operators") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(String, Int, Long)]] =
    Gen.listOfN(40, for {
      k <- Gen.choose(0, 12)
      v <- Gen.choose(0, 999)
      s <- Gen.choose(0L, 9L)
    } yield (s"k$k", v, s))

  private def winners(rows: List[(String, Int, Long)]): Set[(String, Int, Long)] =
    Upsert.lastWins(rows.toDF("k", "v", "s"), Seq("k"), col("s"))
      .as[(String, Int, Long)].collect().toSet

  property("lastWins is idempotent") = forAll(rowsGen) { rows =>
    val once = winners(rows)
    winners(once.toList) == once
  }

  property("lastWins ignores input duplication") = forAll(rowsGen) { rows =>
    winners(rows ++ rows) == winners(rows)
  }

  property("lastWins merges associatively across batches") =
    forAll(rowsGen, rowsGen) { (a, b) =>
      winners(a ++ b) == winners((winners(a) ++ winners(b)).toList)
    }

  property("lastWins keeps exactly one row per key, the max-seq one") =
    forAll(rowsGen) { rows =>
      val got = winners(rows)
      val byKey = rows.groupBy(_._1)
      got.size == byKey.size && got.forall { case (k, _, s) =>
        s == byKey(k).map(_._3).max
      }
    }

  property("pagination tiles the sorted table exactly once") =
    forAll(Gen.choose(1, 13)) { pageSize =>
      val table = GGen.locations(spark, 37)
      val total = 37
      val pages = (0 until (total + pageSize - 1) / pageSize).map { p =>
        Relational.page(table, Seq(col("locid")), pageSize, p * pageSize)
          .select("locid").as[String].collect().toSeq
      }
      val flat = pages.flatten
      flat == table.orderBy("locid").select("locid").as[String].collect().toSeq &&
        pages.init.forall(_.size == pageSize)
    }
}
