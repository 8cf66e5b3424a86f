package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for the round-9 retrieval gates: binary-signature Hamming kNN,
  * its recall report against exact cosine, BM25 lexical top-k, and the
  * Markov transition matrix. Each pin is a property the oracle hash
  * alone cannot localize when it breaks.
  */
class RetrievalGatesSpec extends SparkSpec {

  test("hamming dist from packed longs equals the char-wise signature distance") {
    import spark.implicits._
    // independent in-engine recompute: char compare on the raw sig
    // strings, the same formulation the DuckDB oracle uses
    val sigs = graft.Tables(spark, sf0001, "embeddings")
      .select($"vec_id", expr("sign_bits(embedding, 64)").as("sig"))
    val q = sigs.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"sig".as("qs"))
    val charDist = sigs.crossJoin(q).filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        aggregate(zip_with(split($"sig", ""), split($"qs", ""),
            (a, b) => when(a === b, 0).otherwise(1)),
          lit(0), (acc, x) => acc + x).as("cd"))
    val gate = graft.Queries.queries("sim_hamming_knn")(spark, sf0001)
    val joined = gate.join(charDist, Seq("q_id", "vec_id"))
    assert(joined.count() === gate.count())
    assert(joined.filter($"dist" =!= $"cd").count() === 0,
      "packed XOR+popcount distance diverged from the char-wise spec")
    graft.CacheTracker.releaseAll()
  }

  test("hamming recall report is consistent and nonzero on this corpus") {
    import spark.implicits._
    val rep = graft.Queries.queries("sim_hamming_recall")(spark, sf0001)
      .collect()
    assert(rep.length === 5)
    rep.foreach { r =>
      val hits = r.getAs[Long]("hits")
      assert(hits >= 0 && hits <= 10)
      assert(r.getAs[Long]("recall_pct") === hits * 10)
    }
    // 64 sign bits preserve enough cosine structure that the binary tier
    // must recover a nontrivial share of the exact top-10 overall
    assert(rep.map(_.getAs[Long]("hits")).sum >= 10,
      "binary-signature recall collapsed vs exact cosine top-10")
    graft.CacheTracker.releaseAll()
  }

  test("pq recall report is consistent and nonzero on this corpus") {
    val rep = graft.Queries.queries("sim_pq_recall_report")(spark, sf0001)
      .collect()
    assert(rep.length === 5)
    rep.foreach { r =>
      val hits = r.getAs[Long]("hits")
      assert(hits >= 0 && hits <= 5)
      assert(r.getAs[Long]("recall_pct") === hits * 20)
    }
    // 16-byte PQ codes keep enough inner-product structure to recover a
    // nontrivial share of the exact top-5 (measured ~0.5 recall here)
    assert(rep.map(_.getAs[Long]("hits")).sum >= 5,
      "PQ ADC recall collapsed vs exact cosine top-5")
    graft.CacheTracker.releaseAll()
  }

  test("bm25 ranks by score with doc_id tiebreak and only returns matching docs") {
    import spark.implicits._
    val top = graft.Queries.queries("text_bm25_topk")(spark, sf0001).collect()
    assert(top.length === 20)
    top.sliding(2).foreach { case Array(a, b) =>
      val (sa, sb) = (a.getAs[Double]("score"), b.getAs[Double]("score"))
      assert(sa > sb || (sa == sb &&
        a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
      case _ => ()
    }
    top.foreach { r =>
      val nh = r.getAs[Long]("n_hit")
      assert(nh >= 1 && nh <= 4, s"n_hit out of query-term range: $nh")
    }
    // every returned doc really contains at least one query term
    val ids = top.map(_.getAs[Long]("doc_id")).toSeq
    val withTerm = graft.Tables(spark, sf0001, "documents")
      .filter($"doc_id".isin(ids: _*))
      .filter(Seq("spark", "hash", "window", "merge")
        .map(t => array_contains(split(lower($"text"), " "), t))
        .reduce(_ || _))
    assert(withTerm.count() === 20)
    graft.CacheTracker.releaseAll()
  }

  test("markov transition ppm rows floor-sum to a million per prev type") {
    import spark.implicits._
    val m = graft.Queries.queries("events_markov_transitions")(spark, sf0001)
      .collect()
    assert(m.nonEmpty)
    m.groupBy(_.getAs[String]("prev_type")).foreach { case (_, rows) =>
      val ppm = rows.map(_.getAs[Long]("ppm")).sum
      // each cell floors cnt*1e6/total, so the sum can undershoot by at
      // most one unit per cell and can never overshoot
      assert(ppm <= 1000000L && ppm > 1000000L - rows.length)
    }
    // total transition count = events - one per user with any events
    val ev = graft.Tables(spark, sf0001, "events")
    val expected = ev.count() - ev.select($"user_id").distinct().count()
    assert(m.map(_.getAs[Long]("cnt")).sum === expected)
    graft.CacheTracker.releaseAll()
  }
}
