package graft.vector

import graft.SparkSpec

/** Measured quality of the approximate paths against exact ground truth
  * on the fixed sf0.001 corpus (deterministic data + deterministic
  * hashing ⇒ these are constants, not flaky statistics).
  */
class AnnRecallSpec extends SparkSpec {

  private def pairs(name: String): Set[(Long, Long)] =
    graft.Queries.queries(name)(spark, sf0001)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("banded ANN only returns vectors the exact top-10 ranks highly, with nonzero recall") {
    val exact = pairs("sim_knn_brute")   // top-10 per query, ground truth
    val approx = pairs("sim_ann_lsh")    // top-5 within banded candidates
    graft.CacheTracker.releaseAll()
    assert(approx.nonEmpty, "banding must produce candidates on this corpus")
    val hits = approx.intersect(exact).size.toDouble
    // 3 bands × 6 bits at background bit-agreement ~0.8 ⇒ expect a
    // meaningful minority of true neighbors to share a band
    assert(hits / exact.size > 0.05,
      s"recall vs exact top-10 collapsed: $hits/${exact.size}")
  }

  test("IVF probe search recalls >=0.9 of the exact top-5 at 4 probes") {
    val exact = graft.Queries.queries("sim_knn_brute")(spark, sf0001)
      .select("q_id", "vec_id", "rank").collect()
      .filter(_.getInt(2) <= 5)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = pairs("sim_ivf_search") // top-5 within the probed cells
    graft.CacheTracker.releaseAll()
    assert(ivf.nonEmpty, "probing must produce candidates on this corpus")
    val hits = ivf.intersect(exact).size.toDouble
    // Lloyd-trained cells + replicas=2 indexing: measured 0.92 on this
    // corpus (deterministic), up from 0.76 with single-assignment
    // label-mean cells — see the IvfProbes histogram note
    assert(hits / exact.size >= 0.9,
      s"IVF recall vs exact top-5 collapsed: $hits/${exact.size}")
  }

  test("int8 scalar quantization holds recall@10 >= 0.9 on every query") {
    val rows = graft.Queries.queries("sim_sq8_recall")(spark, sf0001)
      .collect()
    graft.CacheTracker.releaseAll()
    assert(rows.length == 5, "one report row per standard query")
    rows.foreach { r =>
      // symmetric per-tensor int8 on unit-normalized vectors: measured
      // 100% at sf0.001/0.01 and 90-100% at sf0.1 — a drop below 0.9
      // means the quantizer (scale, shift-before-div) regressed
      assert(r.getLong(2) >= 90,
        s"sq8 recall collapsed for q=${r.getLong(0)}: ${r.getLong(2)}%")
    }
  }

  test("pq distortion: nonnegative, identity-consistent, full-corpus per subspace") {
    val rows = graft.Queries.queries("sim_pq_distortion")(spark, sf0001)
      .collect()
    val n = graft.Tables(spark, sf0001, "embeddings").count()
    graft.CacheTracker.releaseAll()
    assert(rows.length == 16, "one row per subspace")
    rows.foreach { r =>
      val (xx, xd, cc, d) = (r.getAs[Double]("sum_xx"),
        r.getAs[Double]("sum_dot"), r.getAs[Double]("sum_cc"),
        r.getAs[Double]("distortion"))
      assert(r.getAs[Long]("n_vecs") == n, "every vector encoded")
      assert(d >= -1e-9, s"subspace ${r.getAs[Int]("m")}: negative distortion $d")
      assert(math.abs(d - (xx - 2 * xd + cc)) < 4e-9,
        s"subspace ${r.getAs[Int]("m")}: identity broke")
      assert(d <= xx + 1e-9,
        "nearest-code distortion can't exceed the zero-code bound when " +
          s"codebooks are data means: $d vs $xx")
    }
  }

  test("cell stats: populations partition the corpus, index holds replicas x corpus") {
    val rows = graft.Queries.queries("sim_ivf_cell_stats")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Int]("c_label"), r.getAs[Long]("n_primary"),
        r.getAs[Long]("n_indexed"), r.getAs[Long]("share_ppm")))
    val n = graft.Tables(spark, sf0001, "embeddings").count()
    graft.CacheTracker.releaseAll()
    assert(rows.length == 10, "one row per trained cell")
    assert(rows.map(_._2).sum == n,
      "primary assignment must partition the corpus")
    assert(rows.map(_._3).sum == graft.Tuning.ivfReplicas * n,
      "replicated index must hold exactly replicas x corpus entries")
    rows.foreach { case (c, p, i, share) =>
      assert(i >= p, s"cell $c: replicated index can't be under primary")
      assert(share == 1000000L * p / n, s"cell $c share_ppm")
    }
  }

  test("nprobe sweep: recall and cost strictly widen with the probe count") {
    val rows = graft.Queries.queries("sim_ivf_nprobe_sweep")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Int]("nprobe"), r.getAs[Long]("q_id"),
        r.getAs[Long]("n_cand"), r.getAs[Long]("hits")))
    graft.CacheTracker.releaseAll()
    val byQ = rows.groupBy(_._2)
    assert(byQ.nonEmpty && rows.length == byQ.size * 4)
    byQ.foreach { case (q, rs) =>
      val ordered = rs.sortBy(_._1)
      // widening the probe set can only ADD candidates, and the exact
      // top-10 over a superset can only gain ground-truth hits... the
      // hit count itself is monotone because candidates are ranked by
      // the same exact cosine at every level
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 <= b._3, s"q $q: candidates shrank ${a._1}->${b._1}")
          assert(a._4 <= b._4, s"q $q: hits shrank ${a._1}->${b._1}")
        case _ =>
      }
      assert(ordered.last._4 >= 5,
        s"q $q: probing 8 of 10 cells must recover most of the top-10")
    }
  }

  test("PQ-ADC ranking recalls the exact top-5 from 16 one-byte codes") {
    val exact = graft.Queries.queries("sim_knn_brute")(spark, sf0001)
      .select("q_id", "vec_id", "rank").collect()
      .filter(_.getInt(2) <= 5)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = pairs("sim_pq_adc_knn") // top-5 by compressed-domain dot
    graft.CacheTracker.releaseAll()
    assert(pq.nonEmpty)
    val hits = pq.intersect(exact).size.toDouble
    // 16 subspaces × 40 codes, 2 Lloyd iterations, inner-product ADC:
    // measured 0.52 on this corpus (see the PQ sizing sweep note in
    // SimilarityQueries); 0.4 is the regression floor
    assert(hits / exact.size >= 0.4,
      s"PQ recall vs exact top-5 collapsed: $hits/${exact.size}")
  }

  test("OPQ-permuted PQ holds its own recall floor on the same byte budget") {
    val exact = graft.Queries.queries("sim_knn_brute")(spark, sf0001)
      .select("q_id", "vec_id", "rank").collect()
      .filter(_.getInt(2) <= 5)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val opq = pairs("sim_opq_adc_knn")
    graft.CacheTracker.releaseAll()
    assert(opq.nonEmpty)
    val hits = opq.intersect(exact).size.toDouble
    // variance-balanced re-dealing measured 0.44 here vs plain PQ's
    // 0.52 — this corpus's storage order already groups correlated
    // dims (see the opqPerm scaladoc for why the operator still
    // matters); 0.35 fences the permuted path's own regressions
    assert(hits / exact.size >= 0.35,
      s"OPQ recall vs exact top-5 collapsed: $hits/${exact.size}")
  }

  test("composed IVF-PQ read path recalls >=0.85 of the exact top-5 at 4 probes") {
    val exact = graft.Queries.queries("sim_knn_brute")(spark, sf0001)
      .select("q_id", "vec_id", "rank").collect()
      .filter(_.getInt(2) <= 5)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = pairs("sim_ivfpq_search") // probe → ADC shortlist → rescore
    graft.CacheTracker.releaseAll()
    assert(ivfpq.nonEmpty, "the composed path must produce results")
    val hits = ivfpq.intersect(exact).size.toDouble
    // composition loses recall only where BOTH prunings miss: a true
    // neighbor outside every probed cell (IVF alone: 0.92) or outside
    // the ADC top-ivfpqRerank of the probed candidates (sweep: 0.76 at
    // depth 25, 0.80 at 40, passes at the default 50) — the rerank
    // budget recovers the compressed-domain ranking error
    info(f"IVF-PQ composed recall@5: ${hits / exact.size}%.2f")
    assert(hits / exact.size >= 0.85,
      s"IVF-PQ recall vs exact top-5 collapsed: $hits/${exact.size}")
  }

  test("residual IVF-PQ recalls at least as much as the raw-vector composition") {
    val exact = graft.Queries.queries("sim_knn_brute")(spark, sf0001)
      .select("q_id", "vec_id", "rank").collect()
      .filter(_.getInt(2) <= 5)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val raw = pairs("sim_ivfpq_search")
    val res = pairs("sim_ivfpq_residual")
    graft.CacheTracker.releaseAll()
    assert(res.nonEmpty, "the residual path must produce results")
    val rawR = raw.intersect(exact).size.toDouble / exact.size
    val resR = res.intersect(exact).size.toDouble / exact.size
    // residual codes spend the same 16-byte budget on the part the
    // coarse quantizer didn't explain — the compressed-domain shortlist
    // can only get tighter, so the rescored recall must not regress
    // (both paths share probes/rerank; deterministic on this corpus)
    info(f"raw recall@5: $rawR%.2f, residual recall@5: $resR%.2f")
    assert(resR >= rawR,
      f"residual encoding must not lose recall: $resR%.2f < $rawR%.2f")
    assert(resR >= 0.85, f"residual IVF-PQ recall collapsed: $resR%.2f")
  }

  test("NNG beam search: recall floor, displacement theorem, degree contract") {
    val exact = pairs("sim_knn_brute") // exact top-10 per query
    val emitted = pairs("sim_nng_beam") // beam top-10 per query
    val fullBeam = SimilarityQueries.nngBeamResults(spark, sf0001)
      .select("q_id", "node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edges = SimilarityQueries.nngEdges(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    graft.CacheTracker.releaseAll()
    // NN-descent-refined graph + 12-round beam: measured 49/50 on this
    // corpus (deterministic); 0.8 is the regression floor
    val hits = emitted.intersect(exact).size.toDouble
    assert(hits / exact.size >= 0.8,
      s"NNG beam recall collapsed: $hits/${exact.size}")
    // GT-membership displacement pin: a ground-truth member inside the
    // final beam can only be pushed past rank 10 by strictly-better
    // nodes, and anything better than a GT member is itself GT — so the
    // emitted top-10 must contain min(10, |beam ∩ GT|) GT members per q
    emitted.map(_._1).foreach { q =>
      val inBeam = fullBeam.count(p => p._1 == q && exact.contains(p))
      val inTop = emitted.count(p => p._1 == q && exact.contains(p))
      assert(inTop == math.min(10, inBeam),
        s"q $q: displacement theorem broke ($inTop emitted vs $inBeam in beam)")
    }
    // graph contract: no self-edges, distinct edges, out-degree <= K
    assert(edges.forall(e => e._1 != e._2), "self-edge in the k-NN graph")
    assert(edges.distinct.length == edges.length, "duplicate edge")
    val maxDeg = edges.groupBy(_._1).map(_._2.length).max
    assert(maxDeg <= 12, s"out-degree $maxDeg exceeds K=12")
  }

  test("post-delete graph: tombstones clean, repair keeps beam recall") {
    val edges = SimilarityQueries.nngDeleteEdges(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // tombstone contract: no deleted endpoint survives, no self/dup edges
    assert(edges.forall(e => e._1 % 10 != 7 && e._2 % 10 != 7),
      "edge touching a deleted node survived the tombstone")
    assert(edges.forall(e => e._1 != e._2), "self-edge after repair")
    assert(edges.distinct.length == edges.length, "duplicate edge after repair")
    assert(edges.groupBy(_._1).map(_._2.length).max <= 12,
      "repair pushed an out-degree past K=12")
    // recall floor over SURVIVORS: plain-Scala exact ground truth (the
    // definitional pin), beam over the repaired graph
    val corpus = graft.Tables(spark, sf0001, "embeddings")
      .filter(org.apache.spark.sql.functions.expr("vec_id % 10 <> 7"))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val exact = (0L to 4L).flatMap { q =>
      val qv = corpus.find(_._1 == q).get._2
      corpus.filter(_._1 != q)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10)
        .map { case (id, _) => (q, id) }
    }.toSet
    val emitted = SimilarityQueries.nngDeleteBeam(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("rk") <= 10)
      .select("q_id", "node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheTracker.releaseAll()
    val hits = emitted.intersect(exact).size.toDouble
    // pre-delete beam measures 49/50 on this corpus; the repaired graph
    // must stay in the same quality class — 0.8 is the regression floor
    assert(hits / exact.size >= 0.8,
      s"post-delete beam recall collapsed: $hits/${exact.size}")
  }

  test("compaction restores the degree invariant without inventing edges") {
    val before = SimilarityQueries.nngInsertEdges(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val after = SimilarityQueries.nngCompactEdges(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    graft.CacheTracker.releaseAll()
    val beforeSet = before.toSet
    // compaction only DROPS edges — every kept edge existed
    assert(after.forall(beforeSet.contains), "compaction invented an edge")
    assert(after.distinct.length == after.length, "duplicate edge")
    // degree invariant restored: nobody above K; over-K nodes land
    // EXACTLY at K (they had >= K candidates to keep by definition)
    val degB = before.groupBy(_._1).view.mapValues(_.length).toMap
    val degA = after.groupBy(_._1).view.mapValues(_.length).toMap
    assert(degA.values.max <= 12, s"degree ${degA.values.max} survived")
    assert(degB.exists(_._2 > 12), "fixture lost its over-degree cohort")
    degB.filter(_._2 > 12).keys.foreach { n =>
      assert(degA(n) == 12, s"over-K node $n compacted to ${degA(n)}")
    }
    // untouched nodes keep their exact edge set
    degB.filter(_._2 <= 12).keys.foreach { n =>
      assert(before.filter(_._1 == n).toSet == after.filter(_._1 == n).toSet,
        s"node $n at/under K must be untouched")
    }
  }

  test("minhash Jaccard estimate tracks exact Jaccard within sketch error") {
    val rows = graft.Queries.queries("dedup_minhash_estimate")(spark, sf0001)
      .collect()
    graft.CacheTracker.releaseAll()
    assert(rows.nonEmpty)
    val errs = rows.map(r => math.abs(r.getDouble(1) - r.getDouble(2)))
    // K=16 sketch: per-pair std-error ~ sqrt(J(1-J)/16) <= 0.125; the
    // MEAN abs error across docs must sit well inside it
    assert(errs.sum / errs.length < 0.15,
      f"mean |est-exact| = ${errs.sum / errs.length}%.3f")
  }
}
