package graft.text

import graft.SparkSpec

/** Pins the unigram trainer's DEFINITION with a plain-Scala hard-EM
  * recompute (the oracle pins cross-engine agreement; this pins what
  * both engines agree ON): seed substring counts, Viterbi under the
  * exact lexicographic objective (min pieces, max Σcnt, lex path),
  * usage recount, prune, re-Viterbi.
  */
class UnigramSpec extends SparkSpec {

  private val MaxPiece = 4
  private val SeedPieces = 200

  /** Reference Viterbi: returns (nPieces, score, path) under `cnt`. */
  private def viterbi(w: String, cnt: Map[String, Long])
      : (Int, Long, String) = {
    // dp(i) = best (pieces, negScore, path) for prefix of length i
    val dp = Array.fill[Option[(Int, Long, String)]](w.length + 1)(None)
    dp(0) = Some((0, 0L, ""))
    for (j <- 1 to w.length) {
      val cands = for {
        i <- math.max(0, j - MaxPiece) until j
        prev <- dp(i).toSeq
        piece = w.substring(i, j)
        c <- cnt.get(piece).toSeq
      } yield (prev._1 + 1, prev._2 - c,
        if (prev._3.isEmpty) piece else prev._3 + " " + piece)
      if (cands.nonEmpty) dp(j) = Some(cands.min)
    }
    val (k, neg, path) = dp(w.length).get
    (k, -neg, path)
  }

  private def referenceTrain(vocab: Seq[(String, Long)])
      : Seq[(String, Long, String, Int, Long)] = {
    // seed: all substring occurrences of length 1..4, freq-weighted
    val occ = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    vocab.foreach { case (w, f) =>
      for (i <- 0 until w.length; l <- 1 to math.min(MaxPiece, w.length - i))
        occ(w.substring(i, i + l)) += f
    }
    val ranked = occ.toSeq.sortBy { case (p, c) => (-c, p) }
    val kept = ranked.zipWithIndex.collect {
      case ((p, c), rk) if rk < SeedPieces || p.length == 1 => p -> c
    }.toMap
    // E-step under seed counts, M-step usage, prune, final pass
    val usage = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    vocab.foreach { case (w, f) =>
      viterbi(w, kept)._3.split(" ").foreach(p => usage(p) += f)
    }
    val trained = kept.collect {
      case (p, _) if p.length == 1 || usage(p) > 0 => p -> usage(p)
    }
    vocab.map { case (w, f) =>
      val (k, sc, path) = viterbi(w, trained)
      (w, f, path, k, sc)
    }.sortBy { case (w, f, _, _, _) => (-f, w) }
  }

  test("hard-EM matches a plain-Scala recompute on a planted vocabulary") {
    import spark.implicits._
    val vocab = Seq(
      ("streaming", 40L), ("stream", 35L), ("steam", 20L), ("string", 18L),
      ("ingest", 15L), ("rest", 12L), ("ring", 11L), ("sting", 9L),
      ("tea", 7L), ("team", 6L), ("in", 5L), ("it", 3L))
    val got = UnigramQueries.trainOn(spark, vocab.toDF("w", "freq"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getInt(3), r.getLong(4)))
      .toSeq
    val want = referenceTrain(vocab)
    assert(got == want,
      s"trainer drifted from the definition:\n got=$got\nwant=$want")
  }

  test("every word segments (single-char floor) and scores are consistent") {
    import spark.implicits._
    val vocab = Seq(("zqxjkv", 2L), ("aa", 50L), ("ab", 1L))
    val rows = UnigramQueries.trainOn(spark, vocab.toDF("w", "freq")).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val w = r.getString(0); val pieces = r.getString(2)
      assert(pieces.replace(" ", "") == w,
        s"pieces of $w do not reassemble: '$pieces'")
      assert(r.getInt(3) == pieces.split(" ").length)
    }
  }
}
