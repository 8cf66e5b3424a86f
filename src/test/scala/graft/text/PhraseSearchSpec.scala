package graft.text

import graft.{Queries, SparkSpec, Tables}

/** Independent plain-Scala recompute of text_phrase_search at sf0.001:
  * the phrase lift (hash bucket < 2, positions 10–12), the positional
  * scan, and the (n_occ, first_pos) rollup are re-derived with a
  * straightforward in-memory scan and must agree row-for-row — the
  * oracle hash says "both engines agree"; this pin says "and they agree
  * with the phrase-query definition" (every start where all 3 tokens
  * line up, nothing else).
  */
class PhraseSearchSpec extends SparkSpec {

  private def bucket100(salt: String, key: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((salt + key.toString)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    Integer.parseInt(hex.substring(0, 4), 16) % 100
  }

  test("phrase search matches a plain-Scala positional-scan recompute") {
    import spark.implicits._
    val rows = Queries.queries("text_phrase_search")(spark, sf0001).collect()
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        (id, t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1))
      }
    graft.CacheTracker.releaseAll()
    assert(rows.nonEmpty)

    val phrases = docs.collect {
      case (id, toks) if bucket100("phrase|", id) < 2 && toks.length >= 20 =>
        toks.slice(9, 12).mkString(" ")
    }.toSet
    assert(phrases.nonEmpty, "the hash-selected phrase set is empty at sf0.001")

    // scan every doc position once, accumulate (phrase, doc) -> hits
    val hits = scala.collection.mutable.Map
      .empty[(String, Long), (Long, Int)] // -> (n_occ, first_pos)
    docs.foreach { case (id, toks) =>
      var p = 0
      while (p + 2 < toks.length) {
        val tri = s"${toks(p)} ${toks(p + 1)} ${toks(p + 2)}"
        if (phrases(tri)) {
          val cur = hits.getOrElse((tri, id), (0L, p))
          hits((tri, id)) = (cur._1 + 1, math.min(cur._2, p))
        }
        p += 1
      }
    }

    assert(rows.length == hits.size,
      s"gate rows ${rows.length} != recompute ${hits.size}")
    rows.foreach { r =>
      val key = (r.getAs[String]("phrase"), r.getAs[Long]("doc_id"))
      val exp = hits.getOrElse(key, sys.error(s"unexpected gate row $key"))
      assert(r.getAs[Long]("n_occ") == exp._1, key)
      assert(r.getAs[Int]("first_pos") == exp._2, key)
    }
    // every lifted phrase recovers its source occurrence at position 9
    phrases.foreach { ph =>
      assert(hits.keys.exists(k => k._1 == ph),
        s"phrase '$ph' found no doc (source lift lost)")
    }
  }
}
