package graft.text

import graft.SparkSpec

/** Pins the WordPiece encoder's DEFINITION with a plain-Scala recompute
  * (the oracle pins cross-engine agreement; this pins what both engines
  * agree ON): positional piece counting (bare at word start, ##
  * continuation elsewhere), top-K vocabulary by (count desc, piece),
  * greedy longest-match-first, whole-word [UNK] on any miss.
  */
class WordpieceSpec extends SparkSpec {

  private val MaxPiece = 4
  private val WpVocab = 200

  private def buildVocab(vocab: Seq[(String, Long)],
      cap: Int = WpVocab): Set[String] = {
    val occ = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    vocab.foreach { case (w, f) =>
      for (i <- 0 until w.length; l <- 1 to math.min(MaxPiece, w.length - i)) {
        val p = w.substring(i, i + l)
        occ(if (i == 0) p else "##" + p) += f
      }
    }
    occ.toSeq.sortBy { case (p, c) => (-c, p) }.take(cap).map(_._1).toSet
  }

  /** Reference greedy: longest vocab piece at each position, [UNK] on
    * any miss.
    */
  private def encode(w: String, vocab: Set[String]): (String, Int) = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var pos = 0
    while (pos < w.length) {
      val cand = (math.min(MaxPiece, w.length - pos) to 1 by -1).iterator
        .map { l =>
          val sub = w.substring(pos, pos + l)
          if (pos == 0) sub else "##" + sub
        }
        .find(vocab.contains)
      cand match {
        case Some(p) =>
          out += p
          pos += p.stripPrefix("##").length
        case None => return ("[UNK]", 1)
      }
    }
    (out.mkString(" "), out.length)
  }

  test("greedy encode matches a plain-Scala recompute on a planted vocabulary") {
    import spark.implicits._
    val vocab = Seq(
      ("streaming", 40L), ("stream", 35L), ("steam", 20L), ("string", 18L),
      ("ingest", 15L), ("rest", 12L), ("ring", 11L), ("sting", 9L),
      ("tea", 7L), ("team", 6L), ("in", 5L), ("it", 3L), ("zq", 2L))
    val got = WordpieceQueries.encodeOn(spark, vocab.toDF("w", "freq"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .toSeq
    val pieces = buildVocab(vocab)
    val want = vocab.map { case (w, f) =>
      val (wp, np) = encode(w, pieces)
      (w, f, wp, np)
    }.sortBy { case (w, f, _, _) => (-f, w) }
    assert(got == want,
      s"encoder drifted from the definition:\n got=$got\nwant=$want")
  }

  test("capped vocabulary forces whole-word [UNK], never a partial encoding") {
    import spark.implicits._
    // cap below single-char coverage: 'zq'/'qz' lose their pieces to the
    // high-frequency a/b mass and must fall to [UNK] as WHOLE words
    val vocab = Seq(("aaaa", 500L), ("abab", 400L), ("bbbb", 300L),
      ("zqzq", 1L), ("qz", 1L))
    val rows = WordpieceQueries.encodeOn(spark, vocab.toDF("w", "freq"))
      .collect()
      .map(r => (r.getString(0), r.getString(2), r.getInt(3))).toSeq
    val pieces = buildVocab(vocab, cap = 20)
    // sanity on the PLANT itself: the reference vocab at the production
    // cap keeps every piece (small corpus), so [UNK] is exercised via
    // the reference encode under a tight cap instead
    vocab.foreach { case (w, _) =>
      val (wp, np) = encode(w, pieces)
      if (w.contains("q")) assert(wp == "[UNK]" && np == 1,
        s"$w must be [UNK] under the capped vocab, got '$wp'")
      else assert(wp.replace("##", "").replace(" ", "") == w)
    }
    // production-path invariants: pieces reassemble or are [UNK]
    rows.foreach { case (w, wp, np) =>
      if (wp == "[UNK]") assert(np == 1)
      else {
        assert(wp.replace("##", "").replace(" ", "") == w,
          s"pieces of $w do not reassemble: '$wp'")
        assert(np == wp.split(" ").length)
        // greedy = longest-match-first: the first piece is the longest
        // vocab prefix of w
        val first = wp.split(" ").head
        val longer = (first.length + 1 to math.min(MaxPiece, w.length))
          .map(l => w.substring(0, l))
        assert(!longer.exists(buildVocab(vocab).contains),
          s"$w: first piece '$first' is not the longest vocab prefix")
      }
    }
  }
}
