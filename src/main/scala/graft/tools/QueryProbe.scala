package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-attribution harness for single queries: times named sub-plans
  * of the >2.5×-oracle single-pass queries so optimization targets the
  * measured cost, not the guessed one (the r10 A/B discipline).
  *
  * Usage: runMain graft.tools.QueryProbe <sfDir> <probe> [reps]
  */
object QueryProbe {

  private def timed(name: String, reps: Int)(f: => Long): Unit = {
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val n = f
      graft.CacheTracker.releaseAll()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val med = ts.map(_._1).sorted.apply(ts.size / 2)
    println(f"[probe] $name%-32s ${med}%8.3f s  (rows=${ts.head._2})")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val probe = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratch.sparkLocalDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    probe match {
      case "heavy_hitters" => heavyHitters(spark, sfDir, reps)
      case "countmin" => countmin(spark, sfDir, reps)
      case "hybrid" => hybrid(spark, sfDir, reps)
      case "hot_cell" => hotCell(spark, sfDir, reps)
      case "graph" => graph(spark, sfDir, reps)
      case "kcoreab" => kcoreAb(spark, sfDir, reps)
      case "sqltwin" => sqlTwin(spark, sfDir, reps)
      case "rrf" => rrf(spark, sfDir, reps)
      case "ppl_buckets" => pplBuckets(spark, sfDir, reps)
      case "ivfpq" =>
        graft.vector.SimilarityQueries.ivfpqProbeStages(spark, sfDir)
          .foreach { case (name, f) => timed(name, reps)(f()) }
      case "hitsab" => hitsAb(spark, sfDir, reps)
      case "knnrep" => knnRep(spark, sfDir, reps)
      case "dbscan" => dbscanAb(spark, sfDir, reps)
      case "kcenterab" => kcenterAb(spark, sfDir, reps)
      case "freqpairs" => freqPairsAb(spark, sfDir, reps)
      case other => sys.error(s"unknown probe $other")
    }
    spark.stop()
  }

  private def heavyHitters(s: SparkSession, dir: String, reps: Int): Unit = {
    import s.implicits._
    import graft.text.TextAnalysis.tokens
    def toks = graft.Tables(s, dir, "documents")
      .select(explode(tokens($"text")).as("w"))
      .withColumn("wt",
        when(graft.functions.KeyHash.bucket100("hh|", $"w") < 10, lit(41L))
          .otherwise(lit(1L)))
    timed("tokenize+weight (count)", reps)(toks.count())
    timed("persist weighted stream", reps) {
      val tr = graft.CacheTracker.persistTracked(toks)
      tr.count()
    }
    timed("persist + MG sketch", reps) {
      val tr = graft.CacheTracker.persistTracked(toks)
      tr.as[(String, Long)].groupByKey(_ => 0)
        .agg(new graft.operators.MisraGries(16).toColumn.name("mg"))
        .toDF("g", "mg").select(explode($"mg.words").as("w")).count()
    }
    timed("full gate", reps)(
      graft.Queries.queries("text_heavy_hitters")(s, dir).count())
  }

  private def countmin(s: SparkSession, dir: String, reps: Int): Unit = {
    import s.implicits._
    import graft.text.TextAnalysis
    def toks = graft.Tables(s, dir, "documents")
      .select(explode(TextAnalysis.tokens($"text")).as("term"))
      .filter(length($"term") > 1)
    timed("tokenize (count)", reps)(toks.count())
    timed("persist toks", reps) {
      val tr = graft.CacheTracker.persistTracked(toks)
      tr.count()
    }
    val W = 512
    def bucketCols(term: org.apache.spark.sql.Column) =
      explode(array((0 until 4).map(r =>
        struct(lit(r).as("r"),
          graft.functions.KeyHash.bucketRow("cm|", term, r, W).as("b"))): _*))
    timed("persist + sketch build", reps) {
      val tr = graft.CacheTracker.persistTracked(toks)
      tr.select(bucketCols($"term").as("x"))
        .groupBy($"x.r".as("r"), $"x.b".as("b")).agg(count(lit(1)).as("cnt"))
        .count()
    }
    timed("persist + exact top-10 probes", reps) {
      val tr = graft.CacheTracker.persistTracked(toks)
      tr.groupBy($"term").agg(count(lit(1)).as("exact"))
        .orderBy($"exact".desc, $"term").limit(10).count()
    }
    timed("sketch, digest projected once", reps) {
      val tr = graft.CacheTracker.persistTracked(toks)
      tr.select(md5(concat(lit("cm|"), $"term".cast("string"))).as("dg"))
        .select(explode(array((0 until 4).map(r =>
          struct(lit(r).as("r"),
            (conv(substring($"dg", 1 + 4 * r, 4), 16, 10).cast("long") % W)
              .as("b"))): _*)).as("x"))
        .groupBy($"x.r", $"x.b").agg(count(lit(1)).as("cnt")).count()
    }
    timed("sketch, repartitioned docs + 1 digest", reps) {
      val cpus = s.sparkContext.defaultParallelism
      val tr = graft.CacheTracker.persistTracked(
        graft.Tables(s, dir, "documents").repartition(cpus)
          .select(explode(TextAnalysis.tokens($"text")).as("term"))
          .filter(length($"term") > 1))
      tr.select(md5(concat(lit("cm|"), $"term".cast("string"))).as("dg"))
        .select(explode(array((0 until 4).map(r =>
          struct(lit(r).as("r"),
            (conv(substring($"dg", 1 + 4 * r, 4), 16, 10).cast("long") % W)
              .as("b"))): _*)).as("x"))
        .groupBy($"x.r", $"x.b").agg(count(lit(1)).as("cnt")).count()
    }
    timed("sketch, no md5 (explode+agg only)", reps) {
      val tr = graft.CacheTracker.persistTracked(toks)
      tr.select(explode(array((0 until 4).map(r =>
          struct(lit(r).as("r"),
            ((length($"term") * (r + 1)) % W).cast("long").as("b"))): _*))
          .as("x"))
        .groupBy($"x.r", $"x.b").agg(count(lit(1)).as("cnt")).count()
    }
    timed("full gate", reps)(
      graft.Queries.queries("agg_countmin_probe")(s, dir).count())
  }

  private def hybrid(s: SparkSession, dir: String, reps: Int): Unit = {
    import s.implicits._
    import graft.text.TextAnalysis
    def base = graft.Tables(s, dir, "documents")
      .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
      .filter(size($"toks") >= 2)
      .select($"doc_id", transform(sequence(lit(1), size($"toks") - 1),
        i => concat_ws(" ", element_at($"toks", i),
          element_at($"toks", i + 1))).as("bg"))
    timed("bigrams (count)", reps)(base.count())
    timed("persist base + terms groupBy", reps) {
      val b = graft.CacheTracker.persistTracked(base)
      b.select($"doc_id", explode($"bg").as("t"))
        .groupBy($"doc_id", $"t").agg(count(lit(1)).as("tf")).count()
    }
    timed("vector half (3q exact scan)", reps) {
      import graft.vector.VectorOps._
      val emb = graft.Tables(s, dir, "embeddings")
        .select($"vec_id", $"embedding", normExact($"embedding").as("xn"))
      val qEmb = broadcast(emb.filter($"vec_id".isin(3L, 57L, 201L))
        .select($"vec_id".as("q_id"), $"embedding".as("q_emb"),
          $"xn".as("qxn")))
      emb.crossJoin(qEmb).filter($"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id",
          (dotExact($"embedding", $"q_emb") / ($"xn" * $"qxn")).as("cosine"))
        .count()
    }
    timed("full gate", reps)(
      graft.Queries.queries("sim_hybrid_search")(s, dir).count())
  }

  private def rrf(s: SparkSession, dir: String, reps: Int): Unit = {
    import s.implicits._
    import graft.text.TextAnalysis
    def base = graft.Tables(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
      .filter(size($"toks") >= 2)
      .select($"doc_id", transform(sequence(lit(1), size($"toks") - 1),
        i => concat_ws(" ", element_at($"toks", i),
          element_at($"toks", i + 1))).as("bg"))
    timed("lex side (postings+window)", reps) {
      import org.apache.spark.sql.expressions.Window
      val b = graft.CacheTracker.persistTracked(base)
      val exploded = b.select($"doc_id", explode($"bg").as("t"))
      val qTerms = exploded.filter($"doc_id".isin(3L, 57L, 201L))
        .select($"doc_id".as("q_id"), $"t").distinct()
      val posting = exploded
        .join(broadcast(qTerms.select($"t").distinct()), "t")
        .groupBy($"doc_id", $"t").agg(count(lit(1)).as("tf"))
      val lex = qTerms.join(posting, "t").filter($"doc_id" =!= $"q_id")
        .groupBy($"q_id", $"doc_id")
        .agg(count(lit(1)).as("mt"), sum($"tf").as("stf"))
      val wl = Window.partitionBy($"q_id")
        .orderBy($"mt".desc, $"stf".desc, $"doc_id")
      lex.withColumn("lex_rank", row_number().over(wl))
        .filter($"lex_rank" <= 100).count()
    }
    timed("vec side (cosines+window)", reps) {
      import org.apache.spark.sql.expressions.Window
      import graft.vector.VectorOps._
      val emb = graft.Tables(s, dir, "embeddings")
        .select($"vec_id", $"embedding")
      val qEmb = broadcast(emb.filter($"vec_id".isin(3L, 57L, 201L))
        .select($"vec_id".as("q_id"), $"embedding".as("q_emb")))
      val wv = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
      emb.crossJoin(qEmb).filter($"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id", cosine($"embedding", $"q_emb").as("cos"))
        .withColumn("vec_rank", row_number().over(wv))
        .filter($"vec_rank" <= 100).count()
    }
    timed("full gate", reps)(
      graft.Queries.queries("sim_rrf_fusion")(s, dir).count())
  }

  private def pplBuckets(s: SparkSession, dir: String, reps: Int): Unit = {
    import s.implicits._
    import graft.text.TextAnalysis.tokens
    def tr = graft.Tables(s, dir, "documents")
      .select($"doc_id", $"lang", tokens($"text").as("toks"))
      .filter(size($"toks") >= 2)
    def bigramsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"lang",
        explode(transform(sequence(lit(1), size($"toks") - 1),
          i => concat_ws(" ", element_at($"toks", i),
            element_at($"toks", i + 1)))).as("bg"))
    timed("persist tr (tokenize)", reps) {
      graft.CacheTracker.persistTracked(tr).count()
    }
    timed("LM counts (uni+big)", reps) {
      val t = graft.CacheTracker.persistTracked(tr)
      t.select($"lang", explode($"toks").as("w"))
        .groupBy($"lang", $"w").agg(count(lit(1))).count()
      bigramsOf(t).groupBy($"lang", $"bg").agg(count(lit(1))).count()
    }
    timed("per-doc score joins", reps) {
      val t = graft.CacheTracker.persistTracked(tr)
      val uni = t.select($"lang", explode($"toks").as("w"))
        .groupBy($"lang", $"w").agg(count(lit(1)).as("c1"))
      val big = bigramsOf(t).groupBy($"lang", $"bg")
        .agg(count(lit(1)).as("c2"))
      bigramsOf(t)
        .withColumn("prev", split($"bg", " ").getItem(0))
        .join(big, Seq("lang", "bg"), "left")
        .join(uni.withColumnRenamed("lang", "ulang"),
          $"lang" === $"ulang" && $"prev" === $"w", "left")
        .groupBy($"doc_id").agg(count(lit(1))).count()
    }
    timed("full gate", reps)(
      graft.Queries.queries("text_perplexity_buckets")(s, dir).count())
  }

  private def graph(s: SparkSession, dir: String, reps: Int): Unit = {
    import s.implicits._
    import graft.pipeline.CurationQueries
    timed("linkGraph build+read", reps) {
      val (docs, adj, _) = CurationQueries.linkGraph(s, dir)
      docs.count() + adj.count()
    }
    timed("frontierBfs 1-src (16r cap)", reps) {
      val (docs, adj, _) = CurationQueries.linkGraph(s, dir)
      CurationQueries.frontierBfs(docs, adj, Seq((0L, 0)), 16).count()
    }
    timed("frontierBfs 4-src (16r cap)", reps) {
      val (docs, adj, n) = CurationQueries.linkGraph(s, dir)
      CurationQueries.frontierBfs(docs, adj,
        Seq(0L, n / 3, (2 * n) / 3, n - 1).zipWithIndex, 16).count()
    }
    timed("kcoreLoop (10r cap)", reps) {
      val (docs, adj, _) = CurationQueries.linkGraph(s, dir)
      CurationQueries.kcoreLoop(docs, adj, 10).count()
    }
    timed("gate graph_bfs_layers", reps)(
      graft.Queries.queries("graph_bfs_layers")(s, dir).count())
    timed("gate graph_kcore", reps)(
      graft.Queries.queries("graph_kcore")(s, dir).count())
    timed("gate graph_closeness", reps)(
      graft.Queries.queries("graph_closeness_landmarks")(s, dir).count())
  }

  /** A/B the k-core loop formulations (r15, the verdict's top item):
    * the r13 window form reconstructed here vs the fixed-round
    * histogram fold batched 2/5 per checkpoint (the r14 dirty-delta
    * lost pairwise in every rep — 4.52 vs 3.16 s median — and was
    * removed; receipts in BENCH_NOTES r15). Alternating reps in one
    * session; checksum (Σ coreness) required identical across variants.
    */
  /** r16 A/B: graph_hits edge sourcing — the r15 per-query build (docs
    * scan + count + generator + distinct + checkpoint) vs the
    * linkDirected artifact read + eager checkpoints. Alternating reps,
    * checksum-required-identical.
    */
  /** agg_frequent_pairs distinct-shape A/B (r17, verdict item 6): the
    * r16 shape ran the (orderkey, partkey) distinct's partial agg on
    * the one-file scan's single partition and exchanged on the pair of
    * keys; the r17 shape repartitions on l_orderkey first so the
    * distinct completes partition-locally in parallel. The join side
    * broadcasts in BOTH shapes (plan-verified), so this isolates the
    * distinct. Alternating reps, checksum-required-identical.
    */
  private def freqPairsAb(s: SparkSession, dir: String, reps: Int): Unit = {
    import s.implicits._
    def oldStyle(): DataFrame = {
      val items = graft.CacheTracker.persistTracked(
        graft.Tables(s, dir, "lineitem")
          .select($"l_orderkey", $"l_partkey").distinct())
      items.alias("a").join(items.alias("b"), Seq("l_orderkey"))
        .where($"a.l_partkey" < $"b.l_partkey")
        .groupBy($"a.l_partkey".as("part_a"), $"b.l_partkey".as("part_b"))
        .agg(count(lit(1)).as("support"))
        .filter($"support" >= 2)
        .orderBy($"support".desc, $"part_a", $"part_b").limit(100)
    }
    def newStyle(): DataFrame =
      graft.Queries.queries("agg_frequent_pairs")(s, dir)
    def checksum(df: DataFrame): Long =
      df.agg(sum($"part_a" + $"part_b" + $"support")).head.getLong(0)
    val variants: Seq[(String, () => DataFrame)] =
      Seq(("scan-local distinct (r16)", () => oldStyle()),
        ("orderkey-clustered (r17)", () => newStyle()))
    val sums = variants.map { case (nm, f) =>
      val v = nm -> checksum(f()); graft.CacheTracker.releaseAll(); v
    }.toMap
    require(sums.values.toSet.size == 1, s"checksums diverged: $sums")
    val ts = (1 to reps).flatMap { _ =>
      variants.map { case (nm, f) =>
        val t0 = System.nanoTime(); f().count()
        graft.CacheTracker.releaseAll()
        (nm, (System.nanoTime() - t0) / 1e9)
      }
    }
    variants.foreach { case (nm, _) =>
      val xs = ts.filter(_._1 == nm).map(_._2).sorted
      println(f"[probe] freqpairs:$nm%-26s median ${xs(xs.size / 2)}%6.3f s  all ${xs.map(x => f"$x%.2f").mkString(",")}")
    }
  }

  /** curate_kcenter_diverse loop-shape A/B (r17, verdict item 5): the
    * r16 loop re-joined the persisted embeddings on vec_id every round
    * (hand-copied below); the r17 loop carries (v, xn) in the
    * checkpointed state so the update is a map-only
    * crossJoin(broadcast(pick)) projection. Alternating reps,
    * checksum-required-identical.
    */
  private def kcenterAb(s: SparkSession, dir: String, reps: Int): Unit = {
    import s.implicits._
    import graft.vector.VectorOps.{dotExact, normExact}
    def oldStyle(): DataFrame = {
      val emb = graft.CacheTracker.persistTracked(
        graft.Tables(s, dir, "embeddings")
          .select($"vec_id",
            transform($"embedding", x => x.cast("double")).as("v"))
          .withColumn("xn", normExact($"v")))
      graft.LoopConf.tight(s, emb.count()) {
        val first = emb.select($"vec_id", dotExact($"v", $"v").as("nsq"))
          .orderBy($"nsq".desc, $"vec_id").limit(1)
          .select($"vec_id".as("c_id"), lit(1).as("round"),
            lit(2.0).as("picked_dist"))
        var pickDfs = List(first)
        var state = emb.select($"vec_id", lit(2.0).as("mind"))
          .localCheckpoint(true)
        for (t <- 2 to 8) {
          val cvec = pickDfs.head
            .join(emb.select($"vec_id".as("c_id"), $"v".as("cv"),
              $"xn".as("cn")), "c_id")
            .select($"cv", $"cn")
          state = state
            .join(emb, "vec_id")
            .crossJoin(broadcast(cvec))
            .select($"vec_id",
              least($"mind",
                lit(1.0) - dotExact($"v", $"cv") / ($"xn" * $"cn")).as("mind"))
            .localCheckpoint(true)
          val pick = state.orderBy($"mind".desc, $"vec_id").limit(1)
            .select($"vec_id".as("c_id"), lit(t).as("round"),
              round($"mind", 9).as("picked_dist"))
          pickDfs ::= pick
        }
        pickDfs.reverse.reduce(_ unionByName _)
          .select($"round", $"c_id", $"picked_dist").orderBy($"round")
      }
    }
    def newStyle(): DataFrame =
      graft.Queries.queries("curate_kcenter_diverse")(s, dir)
    def checksum(df: DataFrame): Long =
      df.agg(sum($"c_id" * $"round")).head.getLong(0)
    val variants: Seq[(String, () => DataFrame)] =
      Seq(("emb-join loop (r16)", () => oldStyle()),
        ("state-carried v (r17)", () => newStyle()))
    val sums = variants.map { case (nm, f) =>
      val v = nm -> checksum(f()); graft.CacheTracker.releaseAll(); v
    }.toMap
    require(sums.values.toSet.size == 1, s"checksums diverged: $sums")
    val ts = (1 to reps).flatMap { _ =>
      variants.map { case (nm, f) =>
        val t0 = System.nanoTime(); f().count()
        graft.CacheTracker.releaseAll()
        (nm, (System.nanoTime() - t0) / 1e9)
      }
    }
    variants.foreach { case (nm, _) =>
      val xs = ts.filter(_._1 == nm).map(_._2).sorted
      println(f"[probe] kcenter:$nm%-22s median ${xs(xs.size / 2)}%6.3f s  all ${xs.map(x => f"$x%.2f").mkString(",")}")
    }
  }

  /** sim_dbscan_cluster attribution + assembly A/B (r17, verdict item
    * 4): times the pair-artifact read and the full gate, and A/Bs the
    * r16 three-left-join output assembly (hand-copied below) against
    * the r17 union+single-groupBy assembly, alternating reps with a
    * checksum requirement.
    */
  private def dbscanAb(s: SparkSession, dir: String, reps: Int): Unit = {
    import s.implicits._
    import graft.vector.SimilarityQueries
    timed("pair artifact read+filter", reps)(
      SimilarityQueries.plantedPairs(s, dir)
        .filter($"cosine" >= 0.98).count())
    def oldStyle(): DataFrame = {
      val ids = SimilarityQueries.plantedRaw(s, dir).select($"vec_id")
      val edges = graft.CacheTracker.persistTracked(
        SimilarityQueries.plantedPairs(s, dir)
          .filter($"cosine" >= 0.98).select($"va", $"vb"))
      val und = edges.select($"va".as("node"), $"vb".as("nbr"))
        .unionByName(edges.select($"vb".as("node"), $"va".as("nbr")))
      val deg = graft.CacheTracker.persistTracked(
        und.groupBy($"node").agg(count(lit(1)).as("deg")))
      val core = deg.filter($"deg" >= 3).select($"node")
      val cedges = edges
        .join(core.withColumnRenamed("node", "va"), Seq("va"), "left_semi")
        .join(core.withColumnRenamed("node", "vb"), Seq("vb"), "left_semi")
        .localCheckpoint(true)
      val comp = graft.operators.ConnectedComponents.run(cedges, "va", "vb")
      val coreCl = graft.CacheTracker.persistTracked(
        core.join(comp, Seq("node"), "left")
          .select($"node", coalesce($"comp", $"node").as("cluster")))
      val borderCl = und
        .join(coreCl.select($"node".as("nbr"), $"cluster"), "nbr")
        .join(core, Seq("node"), "left_anti")
        .groupBy($"node").agg(min($"cluster").as("cluster"))
      ids
        .join(deg.toDF("vec_id", "deg"), Seq("vec_id"), "left")
        .join(coreCl.toDF("vec_id", "core_cl"), Seq("vec_id"), "left")
        .join(borderCl.toDF("vec_id", "border_cl"), Seq("vec_id"), "left")
        .select($"vec_id",
          coalesce($"deg", lit(0L)).as("deg"),
          when($"core_cl".isNotNull, "core")
            .when($"border_cl".isNotNull, "border")
            .otherwise("noise").as("role"),
          coalesce($"core_cl", $"border_cl", lit(-1L)).as("cluster"))
        .orderBy($"vec_id")
    }
    def newStyle(): DataFrame =
      graft.Queries.queries("sim_dbscan_cluster")(s, dir)
    def checksum(df: DataFrame): Long =
      df.agg(sum($"cluster" + $"deg")).head.getLong(0)
    val variants: Seq[(String, () => DataFrame)] =
      Seq(("3-left-join assembly (r16)", () => oldStyle()),
        ("union+groupBy assembly (r17)", () => newStyle()))
    val sums = variants.map { case (nm, f) =>
      val v = nm -> checksum(f()); graft.CacheTracker.releaseAll(); v
    }.toMap
    require(sums.values.toSet.size == 1, s"checksums diverged: $sums")
    val ts = (1 to reps).flatMap { _ =>
      variants.map { case (nm, f) =>
        val t0 = System.nanoTime(); f().count()
        graft.CacheTracker.releaseAll()
        (nm, (System.nanoTime() - t0) / 1e9)
      }
    }
    variants.foreach { case (nm, _) =>
      val xs = ts.filter(_._1 == nm).map(_._2).sorted
      println(f"[probe] dbscan:$nm%-28s median ${xs(xs.size / 2)}%6.3f s  all ${xs.map(x => f"$x%.2f").mkString(",")}")
    }
  }

  /** A/B the r17 repartition-before-kernel on the brute-force kNN pair
    * (sim_knn_brute / sim_knn_topk_agg): the one-file embeddings scan
    * runs the 10k exact-decimal dots on ONE core without the spread.
    * "old" is the hand-copied pre-r17 shape (no repartition);
    * alternating reps, row-count-required-identical.
    */
  private def knnRep(s: SparkSession, dir: String, reps: Int): Unit = {
    import s.implicits._
    import graft.vector.VectorOps.{dotExact, normExact}
    def oldKnn(): DataFrame = {
      val emb = graft.Tables(s, dir, "embeddings")
        .select($"vec_id", $"embedding", normExact($"embedding").as("xn"))
      val queries = emb.filter($"vec_id" < 5)
        .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"xn".as("qxn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
      emb.crossJoin(broadcast(queries))
        .filter($"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id",
          (dotExact($"embedding", $"q_emb") / ($"xn" * $"qxn")).as("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 10)
        .withColumn("cosine", round($"cosine", 9))
        .orderBy($"q_id", $"rank")
    }
    def newKnn(): DataFrame = graft.Queries.queries("sim_knn_brute")(s, dir)
    val variants: Seq[(String, () => DataFrame)] =
      Seq(("single-partition (old)", () => oldKnn()),
        ("repartitioned (r17)", () => newKnn()))
    val counts = variants.map { case (nm, f) => nm -> f().count() }.toMap
    require(counts.values.toSet.size == 1, s"row counts diverged: $counts")
    val ts = (1 to reps).flatMap { _ =>
      variants.map { case (nm, f) =>
        val t0 = System.nanoTime(); f().count()
        (nm, (System.nanoTime() - t0) / 1e9)
      }
    }
    variants.foreach { case (nm, _) =>
      val xs = ts.filter(_._1 == nm).map(_._2).sorted
      println(f"[probe] knn:$nm%-24s median ${xs(xs.size / 2)}%6.3f s  all ${xs.map(x => f"$x%.2f").mkString(",")}")
    }
  }

  private def hitsAb(s: SparkSession, dir: String, reps: Int): Unit = {
    import s.implicits._
    import graft.pipeline.CurationQueries
    // warm the artifact path outside timing
    CurationQueries.linkDirected(s, dir)
    // r17 A/B: both variants read the artifact (the r16-settled edge
    // build); what differs is the LOOP shape — the r16 AQE-reuse loop
    // (round-end checkpoints, contribution exchange reused only by
    // AQE's stage materialization) vs the r17 per-half-step
    // contribution checkpoint under LoopConf.tight.
    def oldStyle(): DataFrame = {
      val (docsA, edgesA, n) = CurationQueries.linkDirected(s, dir)
      val edges = edgesA.localCheckpoint(true)
      val nodes = docsA.select($"doc_id".as("node")).localCheckpoint(true)
      hitsLoopOn(s, nodes, edges, n)
    }
    def newStyle(): DataFrame =
      graft.Queries.queries("graph_hits")(s, dir)
    def checksum(df: DataFrame): Long =
      df.agg(sum($"authority")).head.getLong(0)
    val variants: Seq[(String, () => DataFrame)] =
      Seq(("aqe-reuse loop (r16)", () => oldStyle()),
        ("ckpt-contrib tight (r17)", () => newStyle()))
    val sums = variants.map { case (nm, f) => nm -> checksum(f()) }.toMap
    require(sums.values.toSet.size == 1, s"checksums diverged: $sums")
    val ts = (1 to reps).flatMap { _ =>
      variants.map { case (nm, f) =>
        val t0 = System.nanoTime(); f().count()
        (nm, (System.nanoTime() - t0) / 1e9)
      }
    }
    variants.foreach { case (nm, _) =>
      val xs = ts.filter(_._1 == nm).map(_._2).sorted
      println(f"[probe] hits:$nm%-22s median ${xs(xs.size / 2)}%6.3f s  all ${xs.map(x => f"$x%.2f").mkString(",")}")
    }
  }

  private def hitsLoopOn(s: SparkSession, nodes: DataFrame,
      edges: DataFrame, n: Long): DataFrame = {
    import s.implicits._
    def authOf(hub: DataFrame): DataFrame = {
      val a0 = edges.join(hub, $"src" === $"node")
        .groupBy($"dst").agg(sum($"h").as("v"))
      val at = a0.agg(sum($"v").as("t"))
      nodes.join(a0, $"node" === $"dst", "left")
        .crossJoin(broadcast(at))
        .select($"node",
          expr("(coalesce(v, 0L) * 100000) div (t div 10000000)").as("a"))
    }
    def hubOf(auth: DataFrame): DataFrame = {
      val h0 = edges.join(auth, $"dst" === $"node")
        .groupBy($"src").agg(sum($"a").as("v"))
      val ht = h0.agg(sum($"v").as("t"))
      nodes.join(h0, $"node" === $"src", "left")
        .crossJoin(broadcast(ht))
        .select($"node",
          expr("(coalesce(v, 0L) * 100000) div (t div 10000000)").as("h"))
    }
    var hub = nodes.select($"node", lit(1000000000000L / n).as("h"))
      .localCheckpoint(true)
    for (_ <- 1 to 3) hub = hubOf(authOf(hub)).localCheckpoint(true)
    val auth = authOf(hub).localCheckpoint(true)
    hub = hubOf(auth).localCheckpoint(true)
    auth.join(hub, "node")
      .select($"node", $"a".as("authority"), $"h".as("hub_score"))
      .orderBy($"authority".desc, $"node").limit(50)
  }

  private def kcoreAb(s: SparkSession, dir: String, reps: Int): Unit = {
    import s.implicits._
    import graft.pipeline.CurationQueries
    val (docs, adj, _) = CurationQueries.linkGraph(s, dir)
    docs.count(); adj.count()  // warm the shared artifact outside timing
    def windowB2(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val wC = Window.partitionBy($"src").orderBy($"c".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def step(e: DataFrame): DataFrame = {
        val h = adj.join(e.select($"node".as("dst"), $"c"), "dst")
          .groupBy($"src", $"c").agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum($"cnt").over(wC))
          .groupBy($"src").agg(max(least($"c", $"cum")).as("hc"))
        docs.join(h, $"doc_id" === $"src", "left")
          .select($"doc_id".as("node"), coalesce($"hc", lit(0L)).as("c"))
      }
      var est = docs
        .join(adj.groupBy($"src").agg(count(lit(1)).as("c")),
          $"doc_id" === $"src", "left")
        .select($"doc_id".as("node"), coalesce($"c", lit(0L)).as("c"))
        .localCheckpoint(true)
      var r = 0
      while (r < 10) {
        est = (1 to 2).foldLeft(est)((e, _) => step(e)).localCheckpoint(true)
        r += 2
      }
      est
    }
    def checksum(df: DataFrame): Long =
      df.agg(sum($"c")).head.getLong(0)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("window b2 (r13)", () => windowB2()),
      ("hist-fixed b2", () => CurationQueries.kcoreLoop(docs, adj, 10, 2)),
      ("hist-fixed b5", () => CurationQueries.kcoreLoop(docs, adj, 10, 5)),
      // r16: the loop is EAGER (per-batch localCheckpoint), so scoped
      // conf overrides are sound; AQE off collapses the ~11 per-
      // checkpoint stage-materialization jobs into one job per batch
      ("hist b2 aqe-off", () => graft.Confs.withConf(s,
        "spark.sql.adaptive.enabled" -> "false") {
        CurationQueries.kcoreLoop(docs, adj, 10, 2)
      }),
      ("hist b2 aqe-off sp4", () => graft.Confs.withConf(s,
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "4") {
        CurationQueries.kcoreLoop(docs, adj, 10, 2)
      }),
      ("hist b5 aqe-off sp4", () => graft.Confs.withConf(s,
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "4") {
        CurationQueries.kcoreLoop(docs, adj, 10, 5)
      }))
    val sums = variants.map { case (n, f) => n -> checksum(f()) }.toMap
    require(sums.values.toSet.size == 1, s"variant checksums diverged: $sums")
    val ts = (1 to reps).flatMap { _ =>
      variants.map { case (n, f) =>
        val t0 = System.nanoTime(); f().count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
    }
    variants.foreach { case (n, _) =>
      val xs = ts.filter(_._1 == n).map(_._2).sorted
      println(f"[probe] kcore:$n%-20s median ${xs(xs.size / 2)}%6.3f s  all ${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    timed("gate graph_kcore", reps)(
      graft.Queries.queries("graph_kcore")(s, dir).count())
  }

  /** A/B the sql_dedup_minhash formulation change, alternating reps in
    * one session so host-load bursts hit both variants equally. r14:
    * DISTRIBUTE BY vs plain (null — the inlined chain re-evaluated
    * shingles regardless). r17: the gate now materializes the shingle
    * stage through a persist hook + REPARTITION hint (verdict item 3);
    * the hand-copied "inlined" variant below is the OLD single-statement
    * formulation, kept verbatim as the A/B baseline.
    *
    * MAINTENANCE: the inlined variant is a hand-copied twin of the old
    * gate SQL (initializing SqlQueries here trips a cross-object init
    * cycle, so the text cannot be derived from it) — the row-count
    * `require` in the loop catches result-changing drift.
    */
  private def sqlTwin(s: SparkSession, dir: String, reps: Int): Unit = {
    graft.functions.Registry.registerAll(s)
    // through the registry, not SqlQueries directly — initializing the
    // SqlQueries object before Queries trips a cross-object init cycle
    val withD = graft.Queries.queries("sql_dedup_minhash")
    def run() = withD(s, dir).count()
    val (k, cap) = (graft.Tuning.minhashK, graft.Tuning.lshBandCap)
    val noDist = {
      val q: graft.Queries.Q = (ss, dd) => {
        graft.Tables(ss, dd, "documents").createOrReplaceTempView("graft_documents")
        ss.sql(
          s"""WITH docs AS (
             |  SELECT doc_id,
             |    split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ') AS toks
             |  FROM graft_documents),
             |base AS (SELECT * FROM docs WHERE size(toks) >= 15),
             |corpus AS (
             |  SELECT doc_id, toks FROM base
             |  UNION ALL
             |  SELECT doc_id + 10000, slice(toks, 1, size(toks) - 5) FROM base),
             |shingled AS (SELECT doc_id, word_shingles(toks, 3) AS sh FROM corpus),
             |sig AS (SELECT doc_id, posexplode(minhash_md5(sh, $k)) AS (i, h)
             |        FROM shingled),
             |bandt AS (
             |  SELECT doc_id, CAST(floor(i / 2) AS INT) AS band,
             |    array_join(transform(array_sort(collect_list(struct(i, h))),
             |      st -> st.h), '|') AS mh
             |  FROM sig GROUP BY doc_id, CAST(floor(i / 2) AS INT)),
             |sized AS (
             |  SELECT doc_id, band, mh,
             |    COUNT(*) OVER (PARTITION BY band, mh) AS gsz FROM bandt),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             |  FROM sized a JOIN sized b ON a.band = b.band AND a.mh = b.mh
             |  WHERE a.gsz <= $cap AND a.doc_id < b.doc_id),
             |j AS (
             |  SELECT doc_a, doc_b,
             |    CAST(size(array_intersect(sa.sh, sb.sh)) AS DOUBLE) /
             |      CAST(size(array_union(sa.sh, sb.sh)) AS DOUBLE) AS jaccard
             |  FROM cand JOIN shingled sa ON cand.doc_a = sa.doc_id
             |            JOIN shingled sb ON cand.doc_b = sb.doc_id)
             |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.4
             |ORDER BY doc_a, doc_b""".stripMargin)
      }
      () => q(s, dir).count()
    }
    val ts = (1 to reps).flatMap { _ =>
      val t0 = System.nanoTime(); val na = run(); val a = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); val nb = noDist(); val b = (System.nanoTime() - t1) / 1e9
      require(na == nb, s"variant row counts diverged: $na vs $nb")
      Seq(("persist-hook", a), ("inlined-old", b))
    }
    Seq("persist-hook", "inlined-old").foreach { v =>
      val xs = ts.filter(_._1 == v).map(_._2).sorted
      println(f"[probe] sqltwin:$v%-12s median ${xs(xs.size / 2)}%6.3f s  all ${xs.map(x => f"$x%.2f").mkString(",")}")
    }
  }

  private def hotCell(s: SparkSession, dir: String, reps: Int): Unit = {
    import graft.vector.SimilarityQueries
    timed("ivfStructure codebook read", reps) {
      val (c, _, _) = SimilarityQueries.ivfStructure(s, dir)
      c.count()
    }
    timed("hot corpus build (count)", reps)(
      SimilarityQueries.hotCellCorpus(s, dir).count())
    timed("corpus + semRanked", reps) {
      val (cent, _, _) = SimilarityQueries.ivfStructure(s, dir)
      val corpus = graft.CacheTracker.persistTracked(
        SimilarityQueries.hotCellCorpus(s, dir))
      SimilarityQueries.semRanked(corpus, cent).count()
    }
    timed("ranked + windowCandidates+screen", reps) {
      import s.implicits._
      import graft.vector.VectorOps._
      val (cent, _, _) = SimilarityQueries.ivfStructure(s, dir)
      val corpus = graft.CacheTracker.persistTracked(
        SimilarityQueries.hotCellCorpus(s, dir))
      val ranked = graft.CacheTracker.persistTracked(
        SimilarityQueries.semRanked(corpus, cent))
      SimilarityQueries.windowCandidates(ranked, 64)
        .filter(dotFast($"ua", $"ub") / ($"fa" * $"fb") >= 0.9)
        .count()
    }
    timed("full gate", reps)(
      graft.Queries.queries("dedup_semantic_hot_cell")(s, dir).count())
  }
}
