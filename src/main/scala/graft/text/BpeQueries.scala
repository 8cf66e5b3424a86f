package graft.text

import org.apache.spark.sql.functions._

import graft.{Queries, Tables}
import TextAnalysis._

/** Byte-pair encoding — TRAINED, not just counted: the tokenizer-side
  * operator a training-data pipeline actually runs (the BPE-ish regex in
  * [[TextAnalysis.nBpeTokens]] only approximates a learned vocabulary).
  *
  * Training is the classic frequency-weighted merge loop over the corpus
  * word-frequency table: each round counts adjacent symbol pairs
  * (weighted by word frequency), picks the globally most frequent pair
  * (ties by pair string — total order), and merges every non-overlapping
  * occurrence corpus-wide; after [[BpeMerges]] rounds the vocabulary
  * rows carry their encoded symbol sequences. Everything is integer
  * counts and exact string surgery — no floats anywhere — so the DuckDB
  * oracle replays training round-for-round from a generated CTE chain.
  *
  * Representation: a word's symbol sequence is a single string of
  * bracket-wrapped symbols ("<h> <e> <l> <l> <o>"). Merging pair
  * ("<l>", "<l>") is then `replace(s, '<l> <l>', '<ll>')` — and BOTH
  * engines' `replace` scans leftmost, non-overlapping, which IS the
  * greedy merge order BPE specifies. Brackets make a pair pattern
  * unable to match inside a longer symbol.
  *
  * Scale shape: training runs on the DISTINCT-word frequency table
  * (bounded at [[BpeVocab]] rows — vocabulary, not corpus, scale), one
  * tiny aggregate + 1-row broadcast per round, each round's plan cut
  * with an eager localCheckpoint (the iterative-loop template).
  * Encoding unseen text at 100 TB is a scan-local replay of the learned
  * merge list per row.
  */
object BpeQueries {
  import Queries.Q

  /** Merge rounds; both dialects are generated from the same constant. */
  private val BpeMerges = 10
  /** Training vocabulary cap (top word frequencies, total order). */
  private[text] val BpeVocab = 300

  /** The training vocabulary of a docs frame: lowercase ascii-alpha
    * words, 2..12 chars, top-[[BpeVocab]] by (freq desc, word) —
    * deterministic in any engine. Split out so ScaleStressSpec can feed
    * a replicated corpus through the identical production path.
    */
  private[graft] def vocabOf(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")).between(2, 12) &&
        length(regexp_replace(col("w"), "[a-z]", "")) === 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(BpeVocab)

  val bpeTrainEncode: Q = (s, dir) =>
    trainOn(s, vocabOf(Tables(s, dir, "documents")))

  /** The frequency-weighted merge loop over a (w, freq) vocabulary. */
  private[graft] def trainOn(s: org.apache.spark.sql.SparkSession,
      base: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // r16: LoopConf.tight (was bare AQE-off) — the merge loop's state is
    // vocabulary-sized, so its stages get the state-derived width too
    graft.LoopConf.tight(s, BpeVocab.toLong) {
      var vocab = base
        .withColumn("s", trim(regexp_replace($"w", "(.)", "<$1> ")))
        .localCheckpoint(true)
      // NOTE: if a round found NO adjacent pairs (fully merged vocab)
      // the 1-row top frame would be empty and the cross join would
      // empty the vocabulary — in BOTH engines identically, so the
      // oracle would hash-match an empty result and hide the bug. The
      // post-loop require below turns that silent match into a loud
      // failure: once emptied the vocab stays empty, so one check
      // covers every round at the cost of a single take(1) job.
      for (_ <- 1 to BpeMerges) {
        val sp = split($"s", " ")
        val top = vocab
          .select($"freq", explode(arrays_zip(
            slice(sp, lit(1), size(sp) - 1),
            slice(sp, lit(2), size(sp) - 1))).as("p"))
          .select($"freq", concat_ws(" ",
            col("p").getField("0"), col("p").getField("1")).as("pair"))
          .groupBy($"pair").agg(sum($"freq").as("cnt"))
          .orderBy($"cnt".desc, $"pair").limit(1)
          .select($"pair", expr("replace(pair, '> <', '')").as("merged"))
        vocab = vocab.crossJoin(broadcast(top))
          .select($"w", $"freq", expr("replace(s, pair, merged)").as("s"))
          .localCheckpoint(true)
      }
      require(!vocab.isEmpty,
        "BPE merge loop emptied the vocabulary: a round found no " +
          "adjacent pairs (fully merged vocab) and the 1-row top frame " +
          "came back empty — lower BpeMerges or raise BpeVocab")
      vocab
        .select($"w", $"freq", $"s".as("bpe"),
          (length($"s") - length(expr("replace(s, '<', '')"))).as("n_symbols"))
        .orderBy($"freq".desc, $"w").limit(50)
    }
  }

  val bpeTrainEncodeSql: String = {
    def round(i: Int): String =
      s"""p$i AS (
         |  SELECT concat(struct_extract(u, 1), ' ', struct_extract(u, 2)) AS pair,
         |    SUM(freq) AS cnt
         |  FROM (
         |    SELECT freq, unnest(list_zip(l[1:len(l) - 1], l[2:len(l)])) AS u
         |    FROM (SELECT freq, string_split(s, ' ') AS l FROM v${i - 1}))
         |  GROUP BY pair),
         |t$i AS (
         |  SELECT pair, replace(pair, '> <', '') AS merged
         |  FROM p$i ORDER BY cnt DESC, pair LIMIT 1),
         |v$i AS (
         |  SELECT w, freq, replace(s, pair, merged) AS s
         |  FROM v${i - 1} CROSS JOIN t$i),""".stripMargin
    s"""WITH vocab AS (
       |  SELECT w, COUNT(*) AS freq FROM (
       |    SELECT unnest(${sqlTokens("text")}) AS w FROM documents)
       |  WHERE length(w) BETWEEN 2 AND 12
       |    AND length(regexp_replace(w, '[a-z]', '', 'g')) = 0
       |  GROUP BY w ORDER BY freq DESC, w LIMIT $BpeVocab),
       |v0 AS (
       |  SELECT w, freq,
       |    trim(regexp_replace(w, '(.)', '<\\1> ', 'g')) AS s
       |  FROM vocab),
       |${(1 to BpeMerges).map(round).mkString("\n").stripSuffix(",")}
       |SELECT w, freq, s AS bpe,
       |  CAST(length(s) - length(replace(s, '<', '')) AS INT) AS n_symbols
       |FROM v$BpeMerges ORDER BY freq DESC, w LIMIT 50""".stripMargin
  }

  val all: Map[String, (Q, Option[String])] = Map(
    "text_bpe_train_encode" -> (bpeTrainEncode, Some(bpeTrainEncodeSql)))
}
