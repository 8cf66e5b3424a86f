package graft.text

import graft.{Queries, SparkSpec, Tables}

/** Pins `dedup_substring_spans` two ways: a plain-Scala recompute of
  * the WHOLE gate at sf0.001 (tokenize → planted variants → k-gram
  * occurrence map → cap filter → pairwise diagonal islands → top-100),
  * and the SHIFTED-OFFSET property that is the point of span-level
  * dedup — the planted passage sits at different positions in source
  * and variant (diagonal 1), the case fixed-offset fingerprints and
  * doc-level MinHash both miss.
  */
class SubstringSpansSpec extends SparkSpec {

  private val K = 8
  private val OccCap = 16

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket100(salt: String, key: Long): Long =
    java.lang.Long.parseLong(md5hex(salt + key.toString).take(4), 16) % 100

  private def norm(text: String): String =
    text.toLowerCase.replaceAll("\\s+", " ").trim

  /** The gate's corpus, rebuilt independently: base docs (≥15 tokens)
    * plus +50000 variants of hash-selected long docs carrying tokens
    * [8, 8+L) (1-based) of the source at variant position 6 (0-based),
    * L = 16 + doc_id % 12.
    */
  private lazy val corpus: Seq[(Long, Array[String])] = {
    val docs = Tables(spark, sf0001, "documents")
      .select("doc_id", "text").collect().toSeq
      .map(r => (r.getLong(0), norm(r.getString(1)).split(" ")))
      .filter(_._2.length >= 15)
    val lifted = docs
      .filter { case (id, t) => bucket100("span|", id) < 10 && t.length >= 40 }
      .map { case (id, t) =>
        val l = (16 + id % 12).toInt
        (id + 50000L, t.slice(30, 36) ++ t.slice(7, 7 + l) ++ t.slice(36, 40))
      }
    docs ++ lifted
  }

  /** Brute-force reference: every maximal shared k-gram run per
    * (doc pair, diagonal), over grams shared by ≥2 docs with ≤ OccCap
    * total occurrences; top-100 by (len desc, ids, starts).
    */
  private def expected(): Seq[(Long, Long, Long, Long, Long)] = {
    val occ = scala.collection.mutable.HashMap[String,
      scala.collection.mutable.ArrayBuffer[(Long, Long)]]()
    corpus.foreach { case (id, t) =>
      (0 to t.length - K).foreach { p =>
        occ.getOrElseUpdate(t.slice(p, p + K).mkString(" "),
          scala.collection.mutable.ArrayBuffer.empty) += ((id, p.toLong))
      }
    }
    val diag = scala.collection.mutable.HashMap[(Long, Long, Long),
      scala.collection.mutable.ArrayBuffer[Long]]()
    occ.values
      .filter(v => v.map(_._1).distinct.size >= 2 && v.size <= OccCap)
      .foreach { v =>
        for ((da, pa) <- v; (db, pb) <- v if da < db)
          diag.getOrElseUpdate((da, db, pa - pb),
            scala.collection.mutable.ArrayBuffer.empty) += pa
      }
    val spans = diag.toSeq.flatMap { case ((da, db, d), pas) =>
      val runs = pas.sorted.foldLeft(List.empty[List[Long]]) {
        case (acc @ (run :: rest), p) =>
          if (run.head == p - 1) (p :: run) :: rest else List(p) :: acc
        case (Nil, p) => List(List(p))
      }
      runs.map { run =>
        val (hi, lo) = (run.head, run.last) // runs are built reversed
        (da, db, lo, lo - d, hi - lo + K)
      }
    }
    spans.sortBy { case (da, db, sa, sb, len) => (-len, da, db, sa, sb) }
      .take(100)
  }

  private lazy val gateRows: Seq[(Long, Long, Long, Long, Long)] = {
    val rows = Queries.queries("dedup_substring_spans")(spark, sf0001)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    graft.CacheTracker.releaseAll()
    rows
  }

  test("gate output equals the plain-Scala recompute at sf0.001, in order") {
    val exp = expected()
    assert(exp.nonEmpty, "reference recompute produced no spans")
    assert(gateRows == exp,
      s"first diff: ${gateRows.zipAll(exp, null, null).find(p => p._1 != p._2)}")
  }

  test("every planted shifted-offset passage is recovered as a mapped span") {
    val planted = corpus.collect {
      case (id, _) if id < 50000 && bucket100("span|", id) < 10 &&
        corpus.exists(_._1 == id + 50000) => id
    }
    assert(planted.nonEmpty, "no planted variants at sf0.001 — corpus drifted")
    planted.foreach { id =>
      val l = 16 + id % 12
      val hit = gateRows.exists { case (da, db, sa, sb, len) =>
        da == id && db == id + 50000 &&
          sa - sb == 1 && sa <= 7 && sa + len >= 7 + l
      }
      assert(hit, s"planted span of doc $id (len $l, diagonal 1) not mapped")
    }
  }
}
