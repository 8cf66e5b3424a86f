package graft.text

import graft.{Queries, SparkSpec, Tables}

/** Pins `dedup_cdc_chunks` two ways: a plain-Scala recompute of the
  * whole gate at sf0.001 (normalize → gear candidates → greedy min-16
  * → md5 group → top-20), and the REALIGNMENT property that is the
  * point of content-defined chunking — an insertion perturbs only a
  * bounded prefix of the chunk sequence, after which boundaries
  * re-align exactly.
  */
class CdcSpec extends SparkSpec {

  private def norm(text: String): String =
    text.toLowerCase.replaceAll("\\s+", " ").trim

  private def gear(c: Int): Long = (c.toLong * 2654435761L) % 8191L

  /** Candidate boundary positions (1-based, excluding the final
    * position): the mod-64 hash of the 6 code points ending at i.
    */
  private def candidates(cp: Array[Int]): Seq[Int] =
    (6 to cp.length - 1).filter { i =>
      val wh = (0 to 5).map(j => (32L >> j) * gear(cp(i - 1 - (5 - j)))).sum
      wh % 64 == 0
    }

  private def chunksOf(s: String): Seq[String] = {
    val cp = s.codePoints().toArray
    var last = 0
    val bs = scala.collection.mutable.ArrayBuffer[Int]()
    candidates(cp).foreach { c => if (c - last >= 16) { bs += c; last = c } }
    bs += cp.length
    var prev = 0
    bs.toSeq.map { b =>
      val chunk = new String(cp, prev, b - prev)
      prev = b
      chunk
    }
  }

  test("gate output matches a plain-Scala recompute of the full pipeline") {
    import spark.implicits._
    val rows = Queries.queries("dedup_cdc_chunks")(spark, sf0001).collect()
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    graft.CacheTracker.releaseAll()
    assert(rows.length == 20)
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val all = docs.flatMap { case (id, text) =>
      val n = norm(text)
      if (n.nonEmpty) chunksOf(n).map(c => (id, md5hex(c), c.codePointCount(0, c.length).toLong))
      else Seq.empty
    }
    val byH = all.groupBy(_._2)
    val want = byH.toSeq.map { case (h, xs) =>
      (h, xs.map(_._3).max, xs.map(_._1).distinct.length.toLong, xs.length.toLong)
    }.sortBy { case (h, _, nd, no) => (-nd, -no, h) }.take(20)
    val got = rows.map(r => (r.getAs[String]("h"), r.getAs[Long]("clen"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("n_occ"))).toSeq
    assert(got == want, s"top-20 chunk table diverged:\n got $got\nwant $want")
    // the corpus must actually contain cross-document duplicate chunks,
    // or the gate is only exercising the degenerate n_docs=1 tail
    assert(want.head._3 >= 2, "no chunk is shared by 2+ docs — gate untested")
  }

  test("an insertion perturbs a bounded prefix; chunks re-align after") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "wanders far beyond the river bend where tall grass hides the " +
      "burrow entrance from passing hawks circling in the afternoon heat"
    val a = chunksOf(norm(base))
    val b = chunksOf(norm("XYZQ " + base))
    assert(a.length >= 3, s"fixture too short to chunk: ${a.length}")
    // the gear window spans 6 code points and min-length 16 bounds how
    // far a prefix edit can move any later boundary: once both streams
    // pass the edit by a full chunk, boundaries coincide again — the
    // suffix chunk sequences must share a long common tail
    val tail = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }
    assert(tail.nonEmpty && tail.length >= a.length - 2,
      s"chunks failed to re-align after a prefix edit: ${a.length} vs kept ${tail.length}")
  }
}
