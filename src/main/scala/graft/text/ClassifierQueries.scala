package graft.text

import org.apache.spark.sql.functions._

import graft.{Queries, Tables}
import TextAnalysis._

/** Trained quality classifier — the model-based filtering layer that
  * sits above the heuristic gates (`text_quality_score`) in a
  * production pipeline (the fastText-classifier role in CCNet-style
  * curation), expressed as full-batch logistic regression trained
  * INSIDE the engine. No driver arithmetic touches a data value: the
  * weights live in a 1-row DataFrame, each of the 6 gradient-descent
  * rounds is a broadcast cross-join + decimal-detoured mean-gradient
  * aggregate, and the oracle replays the identical trajectory as
  * unrolled CTEs.
  *
  * Training set: originals (label 1) ∪ their deterministic junk twins
  * (label 0, every token replaced by an out-of-vocabulary 'zzqN'
  * string — the [[TextQueries.lmPerplexity]] corpus). Features are the
  * cheap per-doc heuristics (stopword ratio, distinct-token ratio,
  * alphabetic purity, saturating length credit), each a fixed
  * association order of IEEE ops — bit-identical on any engine.
  *
  * Determinism discipline (the BPE/k-means template, one step
  * further): σ = 1/(1+exp(−z)) is the one libm call — its ≤1-ulp
  * per-row divergence is absorbed by the DECIMAL(22,6) gradient sum
  * (a flip needs a per-row term within ~1e-16 of a 0.5e-6 rounding
  * boundary), and the weight update re-quantizes through
  * `round(w + 4·ḡ, 6)` in BOTH engines, so each round starts from
  * identical doubles and divergence cannot compound across rounds.
  * Predictions compare z > 0 — a sign test on bit-identical doubles,
  * no threshold noise.
  *
  * Scale shape: the feature pass is scan-local; each GD round is one
  * partial-aggregated reduction to 5 numbers against a broadcast 1-row
  * weight table (no shuffle of the corpus, ever); rounds are
  * lineage-cut with eager localCheckpoint per the iterative-loop rule.
  * At 100 TB this is exactly distributed full-batch logistic
  * regression: cost = rounds × one scan of the (persisted) feature
  * matrix.
  *
  * Measured on sf0.01 (2000 rows, balanced): the 6-round model
  * separates the classes through stop/uniq/alpha weights; the gate
  * hashes the full confusion matrix plus the trained weights, so a
  * drift anywhere in the trajectory fails loudly.
  */
object ClassifierQueries {
  import Queries.Q

  private val rounds = 6
  private val lr = 4.0

  val qualityClassifier: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.Exact._
    val stop = langStopwords.head._2
    val tr = Tables(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id", tokensOnce($"text").as("toks"))
      .filter(size($"toks") >= 1)
    // originals (y=1) ∪ deterministic junk twins (y=0)
    val labeled = tr.select(explode(array(
        struct($"doc_id", $"toks", lit(1.0).as("y")),
        struct(($"doc_id" + 30000).as("doc_id"),
          transform($"toks", (_, j) =>
            concat(lit("zzq"),
              ((($"doc_id" + 30000) * 31 + j) % 97).cast("string")))
            .as("toks"),
          lit(0.0).as("y")))).as("r"))
      .select($"r.doc_id", $"r.toks", $"r.y")
    // norm re-derived from toks so both classes share one definition;
    // explode(array(…)) keeps it evaluated once per row
    val withNorm = labeled.select($"doc_id", $"y", $"toks",
      explode(array(concat_ws(" ", $"toks"))).as("norm"))
    val nt = size($"toks").cast("double")
    val feats = graft.CacheTracker.persistTracked(withNorm.select(
      $"doc_id", $"y",
      (tokenHits($"toks", stop).cast("double") / nt).as("x_stop"),
      (size(array_distinct($"toks")).cast("double") / nt).as("x_uniq"),
      (length(regexp_replace($"norm", "[^a-z]", "")).cast("double") /
        length($"norm").cast("double")).as("x_alpha"),
      least(lit(1.0), length($"norm").cast("double") / lit(500.0))
        .as("x_len")))

    def zOf(b: org.apache.spark.sql.Column*) =
      (((b(0) + b(1) * $"x_stop") + b(2) * $"x_uniq") +
        b(3) * $"x_alpha") + b(4) * $"x_len"

    var w = Seq((0.0, 0.0, 0.0, 0.0, 0.0))
      .toDF("b", "ws", "wu", "wa", "wl")
    // r17: LoopConf.tight around the gradient rounds — each round is
    // one global aggregate over the persisted features + a 1-row
    // checkpoint, the pprLoop-flat shape the r16 trainer A/Bs showed
    // winning under {AQE off, state-sized width} (whole-JVM
    // LOOPCONF=0/1 alternation receipts in OPTIMIZATION_r17.md)
    graft.LoopConf.tight(s, 10000L) {
      for (_ <- 1 to rounds) {
        val scoredRound = feats.crossJoin(broadcast(w))
          .withColumn("sig", lit(1.0) / (lit(1.0) +
            exp(-zOf($"b", $"ws", $"wu", $"wa", $"wl"))))
        w = scoredRound.agg(
            round(max($"b") + lit(lr) * davg($"y" - $"sig"), 6).as("b"),
            round(max($"ws") + lit(lr) * davg(($"y" - $"sig") * $"x_stop"), 6)
              .as("ws"),
            round(max($"wu") + lit(lr) * davg(($"y" - $"sig") * $"x_uniq"), 6)
              .as("wu"),
            round(max($"wa") + lit(lr) * davg(($"y" - $"sig") * $"x_alpha"), 6)
              .as("wa"),
            round(max($"wl") + lit(lr) * davg(($"y" - $"sig") * $"x_len"), 6)
              .as("wl"))
          .localCheckpoint(true)
      }
    }

    feats.crossJoin(broadcast(w))
      .withColumn("pred",
        (zOf($"b", $"ws", $"wu", $"wa", $"wl") > 0.0).cast("long"))
      .agg(
        max($"b").as("w_bias"), max($"ws").as("w_stop"),
        max($"wu").as("w_uniq"), max($"wa").as("w_alpha"),
        max($"wl").as("w_len"),
        count(lit(1)).as("n_total"),
        sum((($"y" === 1.0).cast("long") === $"pred").cast("long"))
          .as("n_correct"),
        sum(($"pred" === 1L && $"y" === 1.0).cast("long")).as("tp"),
        sum(($"pred" === 0L && $"y" === 0.0).cast("long")).as("tn"),
        sum(($"pred" === 1L && $"y" === 0.0).cast("long")).as("fp"),
        sum(($"pred" === 0L && $"y" === 1.0).cast("long")).as("fn"))
      .orderBy($"n_total")
  }

  val qualityClassifierSql: String = {
    import graft.functions.Exact.sqlDavg
    val stop = langStopwords.head._2.mkString("('", "', '", "')")
    val z = "((((w.b + w.ws * x_stop) + w.wu * x_uniq) + " +
      "w.wa * x_alpha) + w.wl * x_len)"
    val iters = (1 to rounds).map { i =>
      s"""s$i AS (
         |  SELECT f.*, w.b, w.ws, w.wu, w.wa, w.wl,
         |    1.0 / (1.0 + exp(-$z)) AS sig
         |  FROM f CROSS JOIN w${i - 1} w),
         |w$i AS (
         |  SELECT
         |    round(max(b) + 4.0 * ${sqlDavg("(y - sig)")}, 6) AS b,
         |    round(max(ws) + 4.0 * ${sqlDavg("(y - sig) * x_stop")}, 6) AS ws,
         |    round(max(wu) + 4.0 * ${sqlDavg("(y - sig) * x_uniq")}, 6) AS wu,
         |    round(max(wa) + 4.0 * ${sqlDavg("(y - sig) * x_alpha")}, 6) AS wa,
         |    round(max(wl) + 4.0 * ${sqlDavg("(y - sig) * x_len")}, 6) AS wl
         |  FROM s$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents),
       |tr AS (SELECT * FROM base WHERE len(toks) >= 1),
       |labeled AS (
       |  SELECT doc_id, toks, 1.0 AS y FROM tr
       |  UNION ALL
       |  SELECT doc_id + 30000,
       |    list_transform(range(1, len(toks) + 1),
       |      j -> 'zzq' || CAST(((doc_id + 30000) * 31 + (j - 1)) % 97
       |        AS VARCHAR)),
       |    0.0
       |  FROM tr),
       |f AS (
       |  SELECT doc_id, y,
       |    CAST(len(list_filter(toks, t -> t IN $stop)) AS DOUBLE) /
       |      CAST(len(toks) AS DOUBLE) AS x_stop,
       |    CAST(len(list_distinct(toks)) AS DOUBLE) /
       |      CAST(len(toks) AS DOUBLE) AS x_uniq,
       |    CAST(length(regexp_replace(array_to_string(toks, ' '),
       |        '[^a-z]', '', 'g')) AS DOUBLE) /
       |      CAST(length(array_to_string(toks, ' ')) AS DOUBLE) AS x_alpha,
       |    least(1.0, CAST(length(array_to_string(toks, ' ')) AS DOUBLE)
       |      / 500.0) AS x_len
       |  FROM labeled),
       |w0 AS (SELECT CAST(0 AS DOUBLE) AS b, CAST(0 AS DOUBLE) AS ws,
       |  CAST(0 AS DOUBLE) AS wu, CAST(0 AS DOUBLE) AS wa,
       |  CAST(0 AS DOUBLE) AS wl),
       |$iters,
       |scored AS (
       |  SELECT f.y, w.b, w.ws, w.wu, w.wa, w.wl,
       |    CASE WHEN $z > 0.0 THEN 1 ELSE 0 END AS pred
       |  FROM f CROSS JOIN w$rounds w)
       |SELECT max(b) AS w_bias, max(ws) AS w_stop, max(wu) AS w_uniq,
       |  max(wa) AS w_alpha, max(wl) AS w_len,
       |  COUNT(*) AS n_total,
       |  CAST(SUM(CASE WHEN (CASE WHEN y = 1.0 THEN 1 ELSE 0 END) = pred
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |  CAST(SUM(CASE WHEN pred = 1 AND y = 1.0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS tp,
       |  CAST(SUM(CASE WHEN pred = 0 AND y = 0.0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS tn,
       |  CAST(SUM(CASE WHEN pred = 1 AND y = 0.0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS fp,
       |  CAST(SUM(CASE WHEN pred = 0 AND y = 1.0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS fn
       |FROM scored ORDER BY n_total""".stripMargin
  }

  val all: Map[String, (Q, Option[String])] = Map(
    "text_quality_classifier" -> (qualityClassifier, Some(qualityClassifierSql)))
}
