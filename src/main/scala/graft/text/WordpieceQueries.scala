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
  * rare words fall to `[UNK]`, which is exactly the path the gate must
  * exercise.
  *
  * The greedy loop is ONE whole-stage-codegen `aggregate` expression
  * over `sequence(1, length(w))` (greedy consumes ≥1 char per step, so
  * length(w) iterations always suffice; exhausted rows no-op) — the
  * [[UnigramQueries]] DP discipline: no per-position jobs, no row
  * explosion, state as a fixed-prefix ASCII string `PP|pieces` (2-digit
  * consumed count, `FF` = failed). Everything is integer/string — no
  * floats anywhere — so the DuckDB oracle replays the greedy walk with
  * a recursive CTE carrying (pos, pieces) per word, candidates
  * PRE-GROUPED into a list column before the recursion (the r13
  * correlated-subquery-misbind trap) and the longest match picked by
  * `list_aggregate('max')` over `l || piece` strings (for a fixed word
  * and position the substring of length l is unique, so max = longest).
  *
  * Scale shape: vocabulary construction and encoding both run on the
  * DISTINCT-word frequency table (vocabulary scale, ≤300 rows — never
  * corpus scale); encoding unseen text at 100 TB is the same
  * scan-local expression with the piece map broadcast, zero shuffles
  * per row.
  */
object WordpieceQueries {
  import Queries.Q

  /** Vocabulary cap: top positional pieces by (weighted count desc,
    * piece). Both dialects are generated from this constant.
    */
  private val WpVocab = 200
  /** Longest candidate piece (characters, excluding the ## marker). */
  private val MaxPiece = 4

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
    // positional piece occurrences: substr at i=1 is word-initial (bare),
    // i>1 is a continuation (##-prefixed) — separate entries by design
    val occ = words.select($"freq", explode(flatten(
        transform(sequence(lit(1), length($"w")), i =>
          transform(sequence(lit(1),
            least(lit(MaxPiece), length($"w") - i + 1)), l =>
            when(i === 1, $"w".substr(i, l))
              .otherwise(concat(lit("##"), $"w".substr(i, l)))))))
        .as("piece"))
    // vocabulary-scale global window (≤ |words|·12·4 candidate pieces):
    // bounded input, the documented safe shape for an unpartitioned rank
    val vocab = occ.groupBy($"piece").agg(sum($"freq").as("cnt"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"cnt".desc, $"piece")))
      .filter($"rk" <= WpVocab)
      .select($"piece", $"cnt")
    val pm = vocab.agg(map_from_entries(
      collect_list(struct($"piece", $"cnt"))).as("pm"))
    val L = length($"w")
    // state: "PP|p1 p2 ..." — PP = 2-digit chars consumed, FF = failed
    val enc = aggregate(
      sequence(lit(1), L),
      lit("00|"),
      (acc: org.apache.spark.sql.Column, _: org.apache.spark.sql.Column) => {
        val pos = substring(acc, 1, 2)
        val p = pos.cast("int")
        def tryLen(l: Int) = {
          val sub = $"w".substr(p + 1, lit(l))
          val key = when(p === 0, sub).otherwise(concat(lit("##"), sub))
          when(L - p >= l && element_at($"pm", key).isNotNull,
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
    words.crossJoin(broadcast(pm))
      .withColumn("st", enc)
      .select($"w", $"freq",
        when(substring($"st", 1, 2) === "FF", "[UNK]")
          .otherwise(substring($"st", 4, 1000000)).as("wp"),
        when(substring($"st", 1, 2) === "FF", 1)
          .otherwise(size(split(substring($"st", 4, 1000000), " ")))
          .as("n_pieces"))
      .orderBy($"freq".desc, $"w").limit(50)
  }

  val wordpieceEncodeSql: String =
    s"""WITH RECURSIVE words AS MATERIALIZED (
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
       |  WHERE rk <= $WpVocab),
       |cands AS MATERIALIZED (
       |  SELECT o.w, o.pos, list(struct_pack(l := o.l, piece := o.piece)) AS cs
       |  FROM (
       |    SELECT wo.w, t.i - 1 AS pos, u.l,
       |      CASE WHEN t.i = 1
       |           THEN substr(wo.w, CAST(t.i AS INT), CAST(u.l AS INT))
       |           ELSE '##' || substr(wo.w, CAST(t.i AS INT), CAST(u.l AS INT))
       |      END AS piece
       |    FROM words wo
       |    CROSS JOIN range(1, 13) t(i) CROSS JOIN range(1, ${MaxPiece + 1}) u(l)
       |    WHERE t.i + u.l - 1 <= length(wo.w)) o
       |  JOIN vocab v ON v.piece = o.piece
       |  GROUP BY o.w, o.pos),
       |dp AS (
       |  SELECT w, freq, 0 AS pos, '' AS pieces, FALSE AS failed,
       |    0 AS np
       |  FROM words
       |  UNION ALL
       |  SELECT w, freq,
       |    CASE WHEN best IS NULL THEN pos
       |         ELSE pos + CAST(substr(best, 1, 1) AS INT) END,
       |    CASE WHEN best IS NULL THEN pieces
       |         WHEN pieces = '' THEN substr(best, 2)
       |         ELSE pieces || ' ' || substr(best, 2) END,
       |    best IS NULL,
       |    np + 1
       |  FROM (
       |    SELECT d.w, d.freq, d.pos, d.pieces, d.np,
       |      list_aggregate(list_transform(c.cs,
       |        x -> CAST(x.l AS VARCHAR) || x.piece), 'max') AS best
       |    FROM dp d LEFT JOIN cands c ON c.w = d.w AND c.pos = d.pos
       |    WHERE NOT d.failed AND d.pos < length(d.w)))
       |SELECT w, freq,
       |  CASE WHEN failed THEN '[UNK]' ELSE pieces END AS wp,
       |  CAST(CASE WHEN failed THEN 1 ELSE np END AS INT) AS n_pieces
       |FROM dp
       |WHERE failed OR pos = length(w)
       |ORDER BY freq DESC, w LIMIT 50""".stripMargin

  val all: Map[String, (Q, Option[String])] = Map(
    "text_wordpiece_encode" -> (wordpieceEncode, Some(wordpieceEncodeSql)))
}
