package graft.text

import org.apache.spark.sql.functions._

import graft.{Queries, Tables}

/** WordPiece tokenizer — the greedy longest-match-first encoder of the
  * BERT family, completing the production tokenizer trio beside
  * [[BpeQueries]] (bottom-up merges) and [[UnigramQueries]] (Viterbi
  * under piece scores). Two semantics distinguish WordPiece from both
  * siblings and are pinned here exactly:
  *
  *  - pieces are POSITIONAL: a piece matched at word start is the bare
  *    string, anywhere else it is the `##`-prefixed continuation form,
  *    and the two are separate vocabulary entries with separate counts;
  *  - encoding is GREEDY longest-match-first (not optimal): at each
  *    position take the longest vocab piece that matches, and if NO
  *    piece matches the whole word becomes `[UNK]` (BERT's whole-word
  *    fallback — never a partial encoding).
  *
  * The vocabulary is derived deterministically from the corpus: the
  * [[BpeQueries.vocabOf]] word-frequency table (the shared trainer
  * input, so all three tokenizer families are comparable on one
  * corpus), every positional substring occurrence of length
  * 1..[[MaxPiece]] weighted by word frequency, top-[[WpVocab]] by
  * (count desc, piece). Deliberately NO single-character floor — unlike
  * the unigram seed, WordPiece practice caps the vocabulary and lets
  * rare words fall to `[UNK]`, which is exactly the path the gates must
  * exercise.
  *
  * The greedy loop is ONE whole-stage-codegen `aggregate` expression
  * over `sequence(1, length(w))` (greedy consumes ≥1 char per step, so
  * length(w) iterations always suffice; exhausted rows no-op) — the
  * [[UnigramQueries]] DP discipline: no per-position jobs, no row
  * explosion, state as a fixed-prefix ASCII string `PP|pieces` (2-digit
  * consumed count, `FF` = failed; the word class is capped at 12 chars
  * so the pad never truncates). Everything is integer/string — no
  * floats anywhere — so the DuckDB oracle replays the greedy walk with
  * a recursive CTE carrying (pos, pieces) per word, candidates
  * PRE-GROUPED into a list column before the recursion (the r13
  * correlated-subquery-misbind trap) and the longest match picked by
  * `list_aggregate('max')` over `l || piece` strings (for a fixed word
  * and position the substring of length l is unique, so max = longest).
  * Vocabulary and greedy-walk SQL are emitted by shared builders so the
  * two gates' oracles cannot drift apart (the house one-definition,
  * two-dialects rule).
  *
  * Two gates: [[wordpieceEncode]] segments the training vocabulary
  * (pieces visible, the tokenizer-QA view); [[wordpieceTokens]] APPLIES
  * the tokenizer corpus-wide — encode each DISTINCT word once
  * (vocabulary scale), broadcast the encoded table back onto the token
  * stream, aggregate per language. That second shape is the 100 TB
  * story: per-token cost is one broadcast-hash probe, the greedy
  * expression itself runs |distinct words| times, never |tokens| times.
  */
object WordpieceQueries {
  import Queries.Q

  /** Vocabulary cap: top positional pieces by (weighted count desc,
    * piece). Both dialects are generated from this constant.
    */
  private val WpVocab = 200
  /** Longest candidate piece (characters, excluding the ## marker). */
  private val MaxPiece = 4

  /** The positional piece vocabulary of a (w, freq) frame as a 1-row
    * broadcastable map frame (`pm`: piece → count). The global rank
    * window is vocabulary-scale (≤ |words|·12·4 candidate pieces) —
    * bounded input, the documented safe shape for an unpartitioned
    * rank.
    */
  private def pieceVocab(
      words: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val occ = words.select(col("freq"), explode(flatten(
        transform(sequence(lit(1), length(col("w"))), i =>
          transform(sequence(lit(1),
            least(lit(MaxPiece), length(col("w")) - i + 1)), l =>
            when(i === 1, col("w").substr(i, l))
              .otherwise(concat(lit("##"), col("w").substr(i, l)))))))
        .as("piece"))
    occ.groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("piece"))))
      .filter(col("rk") <= WpVocab)
      .agg(map_from_entries(
        collect_list(struct(col("piece"), col("cnt")))).as("pm"))
  }

  /** The greedy longest-match-first walk as one `aggregate` expression;
    * expects columns `w` and `pm` in scope. State: "PP|p1 p2 ..." —
    * PP = 2-digit chars consumed, FF = failed (whole word → [UNK]).
    */
  private def greedyEnc: org.apache.spark.sql.Column = {
    val L = length(col("w"))
    aggregate(
      sequence(lit(1), L),
      lit("00|"),
      (acc: org.apache.spark.sql.Column, _: org.apache.spark.sql.Column) => {
        val pos = substring(acc, 1, 2)
        val p = pos.cast("int")
        def tryLen(l: Int) = {
          val sub = col("w").substr(p + 1, lit(l))
          val key = when(p === 0, sub).otherwise(concat(lit("##"), sub))
          when(L - p >= l && element_at(col("pm"), key).isNotNull,
            concat(lpad((p + l).cast("string"), 2, "0"), lit("|"),
              when(length(acc) > 3,
                concat(substring(acc, 4, 1000000), lit(" ")))
                .otherwise(lit("")),
              key))
        }
        when(pos === "FF" || p >= L, acc)
          .otherwise(coalesce(
            tryLen(4), tryLen(3), tryLen(2), tryLen(1), lit("FF|")))
      })
  }

  private def stFailed = substring(col("st"), 1, 2) === "FF"
  private def stPieces = substring(col("st"), 4, 1000000)

  val wordpieceEncode: Q = (s, dir) =>
    encodeOn(s, BpeQueries.vocabOf(Tables(s, dir, "documents")))

  /** Vocabulary derivation + greedy encode over a (w, freq) frame —
    * split out so WordpieceSpec can feed a hand-computable planted
    * vocabulary through the identical production path.
    */
  private[graft] def encodeOn(s: org.apache.spark.sql.SparkSession,
      base: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val words = base.localCheckpoint(true)
    words.crossJoin(broadcast(pieceVocab(words)))
      .withColumn("st", greedyEnc)
      .select($"w", $"freq",
        when(stFailed, "[UNK]").otherwise(stPieces).as("wp"),
        when(stFailed, 1)
          .otherwise(size(split(stPieces, " "))).as("n_pieces"))
      .orderBy($"freq".desc, $"w").limit(50)
  }

  /** Corpus-wide tokenizer APPLICATION: per-language token statistics
    * under the trained WordPiece vocabulary. The encode expression runs
    * once per DISTINCT word (encodable class [a-z]{2,12} — the same
    * class the vocabulary trains on, and what keeps the 2-digit DP pad
    * exact); the encoded word table broadcast-joins back onto the
    * corpus token stream. One corpus-scale shuffle (the per-lang
    * aggregate), everything else scan-local — the shape a 100 TB
    * tokenize-and-count pass must have.
    */
  val wordpieceTokens: Q = (s, dir) => {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
    val toks = graft.CacheTracker.persistTracked(
      docs.select($"lang", explode(TextAnalysis.tokens($"text")).as("w"))
        .filter(length($"w").between(2, 12) &&
          length(regexp_replace($"w", "[a-z]", "")) === 0))
    // r16: the vocabulary is the SAME filtered token stream aggregated —
    // deriving it from the persisted `toks` (identical filter class,
    // count is lang-blind) instead of BpeQueries.vocabOf's fresh scan
    // drops a second full-corpus tokenize+explode pass per rep
    val pm = pieceVocab(
      toks.groupBy($"w").agg(count(lit(1)).as("freq"))
        .orderBy($"freq".desc, $"w").limit(BpeQueries.BpeVocab)
        .localCheckpoint(true))
    val encW = toks.select($"w").distinct()
      .crossJoin(broadcast(pm))
      .withColumn("st", greedyEnc)
      .select($"w",
        when(stFailed, 1L)
          .otherwise(size(split(stPieces, " ")).cast("long")).as("np"),
        stFailed.as("unk"))
    toks.join(broadcast(encW), "w")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum($"np").as("total_pieces"),
        sum($"unk".cast("long")).as("n_unk"),
        max($"np").as("max_pieces"))
      .orderBy($"lang")
  }

  /** Shared oracle fragments — ONE builder per dialect-shared concept so
    * the two gates' oracles replay the identical vocabulary and greedy
    * walk.
    */
  private def sqlVocabCtes: String =
    s"""words AS MATERIALIZED (
       |  SELECT w, COUNT(*) AS freq FROM (
       |    SELECT unnest(${TextAnalysis.sqlTokens("text")}) AS w FROM documents)
       |  WHERE length(w) BETWEEN 2 AND 12
       |    AND length(regexp_replace(w, '[a-z]', '', 'g')) = 0
       |  GROUP BY w ORDER BY freq DESC, w LIMIT ${BpeQueries.BpeVocab}),
       |occ AS (
       |  SELECT freq,
       |    CASE WHEN i = 1 THEN sub ELSE '##' || sub END AS piece
       |  FROM (
       |    SELECT freq, t.i, substr(w, CAST(t.i AS INT), CAST(u.l AS INT)) AS sub
       |    FROM words
       |    CROSS JOIN range(1, 13) t(i) CROSS JOIN range(1, ${MaxPiece + 1}) u(l)
       |    WHERE t.i + u.l - 1 <= length(w))),
       |vocab AS MATERIALIZED (
       |  SELECT piece FROM (
       |    SELECT piece, row_number() OVER (
       |      ORDER BY SUM(freq) DESC, piece) AS rk
       |    FROM occ GROUP BY piece)
       |  WHERE rk <= $WpVocab)""".stripMargin

  /** The greedy recursive walk over `$wordsCte` (a CTE with a `w`
    * column): emits `cands_$tag`, `dp_$tag`, and `term_$tag` — one
    * terminal row per word with (w, pieces, failed, np).
    */
  private def sqlGreedy(tag: String, wordsCte: String): String =
    s"""cands_$tag AS MATERIALIZED (
       |  SELECT o.w, o.pos, list(struct_pack(l := o.l, piece := o.piece)) AS cs
       |  FROM (
       |    SELECT wo.w, t.i - 1 AS pos, u.l,
       |      CASE WHEN t.i = 1
       |           THEN substr(wo.w, CAST(t.i AS INT), CAST(u.l AS INT))
       |           ELSE '##' || substr(wo.w, CAST(t.i AS INT), CAST(u.l AS INT))
       |      END AS piece
       |    FROM $wordsCte wo
       |    CROSS JOIN range(1, 13) t(i) CROSS JOIN range(1, ${MaxPiece + 1}) u(l)
       |    WHERE t.i + u.l - 1 <= length(wo.w)) o
       |  JOIN vocab v ON v.piece = o.piece
       |  GROUP BY o.w, o.pos),
       |dp_$tag AS (
       |  SELECT w, 0 AS pos, '' AS pieces, FALSE AS failed, 0 AS np
       |  FROM $wordsCte
       |  UNION ALL
       |  SELECT w,
       |    CASE WHEN best IS NULL THEN pos
       |         ELSE pos + CAST(substr(best, 1, 1) AS INT) END,
       |    CASE WHEN best IS NULL THEN pieces
       |         WHEN pieces = '' THEN substr(best, 2)
       |         ELSE pieces || ' ' || substr(best, 2) END,
       |    best IS NULL,
       |    np + 1
       |  FROM (
       |    SELECT d.w, d.pos, d.pieces, d.np,
       |      list_aggregate(list_transform(c.cs,
       |        x -> CAST(x.l AS VARCHAR) || x.piece), 'max') AS best
       |    FROM dp_$tag d LEFT JOIN cands_$tag c ON c.w = d.w AND c.pos = d.pos
       |    WHERE NOT d.failed AND d.pos < length(d.w))),
       |term_$tag AS (
       |  SELECT w, pieces, failed, np FROM dp_$tag
       |  WHERE failed OR pos = length(w))""".stripMargin

  val wordpieceEncodeSql: String =
    s"""WITH RECURSIVE $sqlVocabCtes,
       |${sqlGreedy("a", "words")}
       |SELECT t.w, wo.freq,
       |  CASE WHEN t.failed THEN '[UNK]' ELSE t.pieces END AS wp,
       |  CAST(CASE WHEN t.failed THEN 1 ELSE t.np END AS INT) AS n_pieces
       |FROM term_a t JOIN words wo ON wo.w = t.w
       |ORDER BY wo.freq DESC, t.w LIMIT 50""".stripMargin

  val wordpieceTokensSql: String =
    s"""WITH RECURSIVE $sqlVocabCtes,
       |ctoks AS MATERIALIZED (
       |  SELECT lang, w FROM (
       |    SELECT lang, unnest(${TextAnalysis.sqlTokens("text")}) AS w
       |    FROM documents)
       |  WHERE length(w) BETWEEN 2 AND 12
       |    AND length(regexp_replace(w, '[a-z]', '', 'g')) = 0),
       |cwords AS MATERIALIZED (SELECT DISTINCT w FROM ctoks),
       |${sqlGreedy("c", "cwords")},
       |enc AS (
       |  SELECT w, CAST(CASE WHEN failed THEN 1 ELSE np END AS BIGINT) AS np,
       |    failed
       |  FROM term_c)
       |SELECT lang, COUNT(*) AS n_tokens,
       |  CAST(SUM(e.np) AS BIGINT) AS total_pieces,
       |  CAST(SUM(CASE WHEN e.failed THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
       |  CAST(MAX(e.np) AS BIGINT) AS max_pieces
       |FROM ctoks t JOIN enc e ON t.w = e.w
       |GROUP BY lang ORDER BY lang""".stripMargin

  val all: Map[String, (Q, Option[String])] = Map(
    "text_wordpiece_encode" -> (wordpieceEncode, Some(wordpieceEncodeSql)),
    "text_wordpiece_tokens" -> (wordpieceTokens, Some(wordpieceTokensSql)))
}
