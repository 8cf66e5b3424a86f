package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Queries, Tables}

/** Unigram-LM tokenizer — TRAINED with hard-EM (Viterbi-EM), the
  * SentencePiece-family sibling of [[BpeQueries]]: where BPE grows a
  * vocabulary bottom-up by merging, the unigram model starts from an
  * OVER-complete seed vocabulary of substrings, segments every word by
  * Viterbi under the current piece scores (E-step), re-estimates piece
  * scores from the segmentations (M-step), prunes pieces the corpus
  * stopped using, and re-segments under the trained scores.
  *
  * Determinism redesign (the float hazard): the reference algorithm
  * maximizes Σ log p(piece) — libm territory no hash gate survives.
  * This trainer uses the EXACT lexicographic surrogate
  * (min #pieces, max Σ count(piece), lexicographically smallest piece
  * sequence) — pure integer arithmetic, identical in any engine, and
  * the same "few, frequent pieces" preference the likelihood encodes.
  * Each Viterbi DP state is one fixed-width ASCII string
  * `KK | lpad(10^12 − Σcnt, 13) | pieces` so the whole order is a
  * string MIN — the window-ARGMIN encoding (CLAUDE.md r10).
  *
  * Scale shape: training runs on the DISTINCT-word frequency table
  * (vocabulary scale, ≤[[SeedWords]] rows — never corpus scale); the
  * per-word DP is ONE whole-stage-codegen `aggregate` expression over
  * positions (no per-position job, no row explosion). Encoding unseen
  * text at 100 TB is the same scan-local expression with the trained
  * piece map broadcast.
  *
  * The DuckDB oracle replays training exactly: seed substring counts as
  * CTEs, each Viterbi pass as a recursive CTE that carries the DP
  * vector as a LIST (the recursive term may only see the previous
  * iteration, so dp[0..j] rides along in one row per word), usage
  * recount, prune, second pass.
  */
object UnigramQueries {
  import Queries.Q

  /** Training words: top-N corpus words by (freq desc, word). */
  // the seed vocabulary IS [[BpeQueries.vocabOf]]'s output (the Spark
  // trainer calls it directly), so the oracle's LIMIT must be THE SAME
  // constant — an independently tuned copy would silently train the
  // two engines on different vocabularies
  private val SeedWords = BpeQueries.BpeVocab
  /** Seed vocabulary cap: top substrings by (count desc, piece). */
  private val SeedPieces = 200
  /** Longest candidate piece. */
  private val MaxPiece = 4

  /** DP state strings: 2-digit piece count, 13-digit (10^12 − Σcnt)
    * so MIN-string = (min pieces, max score, lex path). 10^12 bounds
    * any Σcnt this corpus can produce (≤ 12 pieces × Σfreq).
    */
  private val Big = 1000000000000L

  private def initState: Column =
    concat(lit("00"), lpad(lit(Big.toString), 13, "0"))

  /** One Viterbi pass: segment every (w, freq) row under the piece→cnt
    * map in `pm` (a 1-row broadcast frame with a `pm` map column).
    * The DP over positions 0..len(w) runs inside a single `aggregate`
    * expression: acc = the dp-state array so far (element i+1 = state
    * at position i), each step appends dp[j] = MIN over i ∈ [j−4, j−1]
    * of extend(dp[i], w[i+1..j]) — null when no piece applies.
    */
  private def viterbi(words: DataFrame, pm: DataFrame): DataFrame = {
    val withMap = words.crossJoin(broadcast(pm))
    val L = length(col("w"))
    val dp = aggregate(
      sequence(lit(1), L),
      array(initState),
      (acc: Column, j: Column) => concat(acc, array(array_min(
        transform(sequence(greatest(lit(0), j - MaxPiece), j - 1), i => {
          val piece = col("w").substr(i + 1, j - i)
          val prev = element_at(acc, (i + 1).cast("int"))
          val cnt = element_at(col("pm"), piece)
          when(prev.isNotNull && cnt.isNotNull,
            concat(
              lpad((substring(prev, 1, 2).cast("int") + 1).cast("string"),
                2, "0"),
              lpad((substring(prev, 3, 13).cast("bigint") - cnt)
                .cast("string"), 13, "0"),
              when(length(prev) > 15,
                concat(substring(prev, 16, 1000000), lit(" ")))
                .otherwise(lit("")),
              piece))
        })))))
    withMap
      .withColumn("st", element_at(dp, (L + 1).cast("int")))
      .select(col("w"), col("freq"),
        substring(col("st"), 1, 2).cast("int").as("n_pieces"),
        (lit(Big) - substring(col("st"), 3, 13).cast("bigint")).as("score"),
        substring(col("st"), 16, 1000000).as("pieces"))
  }

  /** (piece, cnt) rows → a 1-row frame with map column `pm`. */
  private def asMap(pieces: DataFrame): DataFrame =
    pieces.agg(map_from_entries(
      collect_list(struct(col("piece"), col("cnt")))).as("pm"))

  val unigramTrain: Q = (s, dir) =>
    // training words: the BPE trainer's exact vocabulary definition, so
    // the two tokenizer families are directly comparable on one corpus
    trainOn(s, BpeQueries.vocabOf(Tables(s, dir, "documents")))

  /** The hard-EM loop over a (w, freq) vocabulary — split out so
    * UnigramSpec can feed a hand-computable corpus through the
    * identical production path.
    */
  private[graft] def trainOn(s: SparkSession, base: DataFrame): DataFrame = {
    import s.implicits._
    // r16: LoopConf.tight (was bare AQE-off) — EM state is vocab-sized
    graft.LoopConf.tight(s, SeedPieces.toLong) {
      val words = base.localCheckpoint(true)
      // seed vocabulary: every substring occurrence of length 1..4,
      // weighted by word frequency; top-SeedPieces by (cnt desc, piece),
      // plus ALL single characters (segmentability floor — they are what
      // guarantees every word has at least one segmentation)
      val occs = words.select($"freq", explode(flatten(
          transform(sequence(lit(1), length($"w")), i =>
            transform(sequence(lit(1),
              least(lit(MaxPiece), length($"w") - i + 1)), l =>
              $"w".substr(i, l))))).as("piece"))
      val counted = occs.groupBy($"piece").agg(sum($"freq").as("cnt"))
      val seed = counted
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy($"cnt".desc, $"piece")))
        .filter($"rk" <= SeedPieces || length($"piece") === 1)
        .select($"piece", $"cnt")
        .localCheckpoint(true)
      // E-step: Viterbi under seed counts
      val seg1 = viterbi(words, asMap(seed)).localCheckpoint(true)
      // M-step: piece usage across the segmentations, freq-weighted
      val usage = seg1
        .select($"freq", explode(split($"pieces", " ")).as("piece"))
        .groupBy($"piece").agg(sum($"freq").as("u"))
      // prune: drop multi-char pieces the corpus stopped using; keep
      // every single char (count = trained usage, 0 if unused)
      val trained = seed.join(usage, Seq("piece"), "left")
        .filter(length($"piece") === 1 || $"u".isNotNull)
        .select($"piece", coalesce($"u", lit(0L)).as("cnt"))
        .localCheckpoint(true)
      // final segmentation under the TRAINED scores
      viterbi(words, asMap(trained))
        .select($"w", $"freq", $"pieces", $"n_pieces", $"score")
        .orderBy($"freq".desc, $"w").limit(50)
    }
  }

  /** The recursive-CTE Viterbi replay: dp vector carried as a LIST in
    * one row per word (the recursive term can only reference the
    * previous iteration). `pieces` names the piece-count CTE to score
    * against; `tag` disambiguates the two passes' CTE names.
    *
    * The per-position candidate set (start i, piece, cnt) is
    * PRE-GROUPED into a list column (`wps_tag`) before the recursion
    * and consumed with `list_transform` + `list_aggregate('min')` —
    * a correlated subquery joining the piece CTE inside the recursive
    * term mis-binds in DuckDB 1.0 (it silently scored every candidate
    * with the wrong count; measured r13), and CLAUDE.md already bans
    * subqueries inside lambdas. A column referenced in a lambda
    * (d.dps) is the documented-safe form.
    */
  private def sqlViterbi(tag: String, pieces: String): String =
    // NOTE: this fragment is interpolated into a template that calls
    // .stripMargin AFTER interpolation, so no line here may START with
    // a `|` once this local stripMargin ran — string concats live at
    // line ENDS (a leading `||` would lose a pipe and bind as bit-or)
    s"""wps_$tag AS MATERIALIZED (
       |  SELECT w, jn, list(struct_pack(i := i, piece := piece, cnt := cnt)) AS cands
       |  FROM (
       |    SELECT wo.w, t.i, t.i + u.l AS jn, pc.piece, pc.cnt
       |    FROM words wo
       |    CROSS JOIN range(0, 12) t(i) CROSS JOIN range(1, ${MaxPiece + 1}) u(l)
       |    JOIN $pieces pc ON pc.piece = substr(wo.w, CAST(t.i + 1 AS INT),
       |                                         CAST(u.l AS INT))
       |    WHERE t.i + u.l <= length(wo.w))
       |  GROUP BY w, jn),
       |dp_$tag AS (
       |  SELECT w, freq, 0 AS j,
       |    ['00' || lpad('$Big', 13, '0')] AS dps
       |  FROM words
       |  UNION ALL
       |  SELECT d.w, d.freq, d.j + 1,
       |    list_append(d.dps, list_aggregate(list_transform(c.cands, x ->
       |      CASE WHEN d.dps[CAST(x.i + 1 AS INT)] IS NOT NULL THEN
       |        lpad(CAST(CAST(substr(d.dps[CAST(x.i + 1 AS INT)], 1, 2) AS INT) + 1 AS VARCHAR), 2, '0') ||
       |        lpad(CAST(CAST(substr(d.dps[CAST(x.i + 1 AS INT)], 3, 13) AS BIGINT) - x.cnt AS VARCHAR), 13, '0') ||
       |        CASE WHEN length(d.dps[CAST(x.i + 1 AS INT)]) > 15
       |             THEN substr(d.dps[CAST(x.i + 1 AS INT)], 16) || ' ' ELSE '' END ||
       |        x.piece END), 'min'))
       |  FROM dp_$tag d JOIN wps_$tag c ON c.w = d.w AND c.jn = d.j + 1
       |  WHERE d.j < length(d.w)),
       |seg_$tag AS (
       |  SELECT w, freq,
       |    CAST(substr(dps[CAST(length(w) + 1 AS INT)], 1, 2) AS INT) AS n_pieces,
       |    $Big - CAST(substr(dps[CAST(length(w) + 1 AS INT)], 3, 13) AS BIGINT) AS score,
       |    substr(dps[CAST(length(w) + 1 AS INT)], 16) AS pieces
       |  FROM dp_$tag WHERE j = length(w))""".stripMargin

  val unigramTrainSql: String =
    s"""WITH RECURSIVE words AS MATERIALIZED (
       |  SELECT w, COUNT(*) AS freq FROM (
       |    SELECT unnest(${TextAnalysis.sqlTokens("text")}) AS w FROM documents)
       |  WHERE length(w) BETWEEN 2 AND 12
       |    AND length(regexp_replace(w, '[a-z]', '', 'g')) = 0
       |  GROUP BY w ORDER BY freq DESC, w LIMIT $SeedWords),
       |occs AS (
       |  SELECT freq, substr(w, CAST(i AS INT), CAST(l AS INT)) AS piece
       |  FROM words
       |  CROSS JOIN range(1, 13) t(i) CROSS JOIN range(1, ${MaxPiece + 1}) u(l)
       |  WHERE i + l - 1 <= length(w)),
       |counted AS (
       |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM occs GROUP BY piece),
       |seed AS MATERIALIZED (
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt,
       |      row_number() OVER (ORDER BY cnt DESC, piece) AS rk
       |    FROM counted)
       |  WHERE rk <= $SeedPieces OR length(piece) = 1),
       |${sqlViterbi("a", "seed")},
       |usage AS (
       |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS u
       |  FROM (SELECT freq, unnest(string_split(pieces, ' ')) AS piece
       |        FROM seg_a)
       |  GROUP BY piece),
       |trained AS MATERIALIZED (
       |  SELECT s.piece, COALESCE(u.u, 0) AS cnt
       |  FROM seed s LEFT JOIN usage u ON s.piece = u.piece
       |  WHERE length(s.piece) = 1 OR u.u IS NOT NULL),
       |${sqlViterbi("b", "trained")}
       |SELECT w, freq, pieces, n_pieces, score
       |FROM seg_b ORDER BY freq DESC, w LIMIT 50""".stripMargin

  val all: Map[String, (Q, Option[String])] = Map(
    "text_unigram_train" -> (unigramTrain, Some(unigramTrainSql)))
}
