package graft.text

import graft.{Queries, SparkSpec, Tables}

/** Definition pin for dedup_edit_distance at sf0.001: every emitted
  * candidate pair's `edit_dist` must equal a plain-Scala classic
  * Levenshtein DP over the same length-capped ASCII-normalized texts
  * (the oracle hash pins Spark == DuckDB; this pins both == the
  * textbook definition), and the planted micro-edit pairs
  * (d, d + 60000) that the LSH bands recover must overwhelmingly pass
  * the 10% relative-distance verdict.
  */
class EditDistanceSpec extends SparkSpec {

  private def norm(toks: Array[String]): String =
    toks.mkString(" ").replaceAll("[^a-z0-9 ]", "").take(240)

  private def lev(a: String, b: String): Int = {
    val prev = Array.range(0, b.length + 1)
    val cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + cost)
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      i += 1
    }
    prev(b.length)
  }

  test("edit distances match a plain-Scala Levenshtein DP; planted pairs verify") {
    import spark.implicits._
    val rows = Queries.queries("dedup_edit_distance")(spark, sf0001).collect()
    val base = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        (id, t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1))
      }
      .filter(_._2.length >= 15)
    graft.CacheTracker.releaseAll()
    assert(rows.nonEmpty)

    val texts: Map[Long, String] = base.flatMap { case (id, toks) =>
      // variant: token 7 replaced by token 12, token 10 deleted (1-based)
      val variant = toks.slice(0, 6) ++ Array(toks(11)) ++
        toks.slice(7, 9) ++ toks.slice(10, toks.length)
      Seq(id -> norm(toks), (id + 60000L) -> norm(variant))
    }.toMap

    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (sa, sb) = (texts(a), texts(b))
      assert(r.getAs[Int]("len_a") == sa.length, s"($a,$b)")
      assert(r.getAs[Int]("len_b") == sb.length, s"($a,$b)")
      assert(r.getAs[Int]("edit_dist") == lev(sa, sb),
        s"DP mismatch on ($a,$b)")
    }

    val planted = rows.filter { r =>
      r.getAs[Long]("doc_b") == r.getAs[Long]("doc_a") + 60000L
    }
    assert(planted.length * 10 >= base.length * 9,
      s"bands recovered only ${planted.length}/${base.length} planted pairs")
    val dup = planted.count(_.getAs[String]("verdict") == "dup")
    assert(dup * 10 >= planted.length * 8,
      s"only $dup/${planted.length} planted pairs pass the 10% verdict")
  }
}
