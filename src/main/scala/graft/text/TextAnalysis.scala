package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis primitives for large-scale training-data
  * pipelines: tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything here is a composition of codegen'd built-in expressions —
  * no UDFs — so the whole pipeline stays inside WholeStageCodegen and
  * scales linearly with the scan: per-row work, no shuffle, no state.
  * Each primitive has an exact ANSI-SQL mirror (the `sql*` builders) used
  * by the DuckDB oracle, which doubles as documentation of the semantics.
  */
object TextAnalysis {

  /** Canonical text normalization for dedup/fingerprinting: lowercase,
    * collapse whitespace runs, trim. Two documents equal under this are
    * "exact" duplicates for pipeline purposes.
    */
  def normText(c: Column): Column = trim(regexp_replace(lower(c), "\\s+", " "))
  def sqlNormText(e: String): String = s"trim(regexp_replace(lower($e), '\\s+', ' ', 'g'))"

  /** Whitespace tokens of already-normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")
  def sqlTokens(e: String): String = s"string_split(${sqlNormText(e)}, ' ')"

  /** [[tokens]] behind the zero-cost `explode(array(…))` Generate
    * barrier. Use when a `size($"toks") >= k` filter follows the
    * projection: without the barrier Catalyst pushes that filter below
    * any repartition and substitutes the tokenize INTO the filter, so
    * the regex+split runs TWICE — once of it single-threaded on the
    * one-file scan partition (r17 finding, visible in 8 gates'
    * before-plans as `Filter (size(split(trim(regexp_replace(...)`
    * under the exchange). The barrier keeps the filter above the
    * Generate (its condition references the generator output), one
    * evaluation, still whole-stage-codegen'd, no row multiplication.
    */
  def tokensOnce(c: Column): Column = explode(array(tokens(c)))

  def nTokens(c: Column): Column = size(tokens(c))
  def sqlNTokens(e: String): String = s"CAST(len(${sqlTokens(e)}) AS INT)"

  def nUniqTokens(c: Column): Column = size(array_distinct(tokens(c)))
  def sqlNUniqTokens(e: String): String =
    s"CAST(len(list_distinct(${sqlTokens(e)})) AS INT)"

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * other non-space symbols — the standard pre-tokenizer regex shape.
    */
  val bpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def nBpeTokens(c: Column): Column = size(regexp_extract_all(c, lit(bpePattern), lit(0)))
  def sqlNBpeTokens(e: String): String =
    s"CAST(len(regexp_extract_all($e, '$bpePattern')) AS INT)"

  /** Occurrences of any of `words` as whole tokens (case-insensitive via
    * normalization). Token membership, not regex `\b`: Java regex and
    * DuckDB's RE2 disagree on word boundaries around non-ASCII (CJK)
    * characters, while token equality is engine-exact for any script the
    * whitespace tokenizer can split.
    */
  def wordHits(c: Column, words: Seq[String]): Column =
    tokenHits(tokens(c), words)

  /** [[wordHits]] over an already-tokenized array column — the form hot
    * paths should use: project `tokens(text)` ONCE behind a
    * materialization barrier (`explode(array(…))` — a Generate node
    * CollapseProject cannot re-inline through) and derive every
    * per-language hit count from the same array, instead of paying the
    * regexp+split tokenizer per feature.
    */
  def tokenHits(toks: Column, words: Seq[String]): Column = {
    val set = words.map(_.toLowerCase)
    size(filter(toks, t => t.isin(set: _*)))
  }
  def sqlWordHits(e: String, words: Seq[String]): String = {
    val set = words.map(w => s"'${w.toLowerCase}'").mkString("(", ", ", ")")
    s"CAST(len(list_filter(${sqlTokens(e)}, t -> t IN $set)) AS INT)"
  }

  /** Tiny per-language stopword inventories for the n-gram-free heuristic
    * language ID. Ordered map: argmax ties resolve in this fixed order.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "de", "y", "que", "los", "una"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和"))

  /** Heuristic language ID: stopword-hit rate per language, argmax with
    * deterministic tie-breaking in [[langStopwords]] order. Returns
    * (scores..., best) columns; callers project what they need.
    */
  def langScores(c: Column): Seq[(String, Column)] =
    langStopwords.map { case (lang, words) => lang -> wordHits(c, words) }

  /** [[langScores]] over an already-tokenized array column. */
  def langScoresFrom(toks: Column): Seq[(String, Column)] =
    langStopwords.map { case (lang, words) => lang -> tokenHits(toks, words) }

  def langBest(c: Column): Column = langBestFromScores(langScores(c))

  /** Argmax over precomputed per-language score columns — callers that
    * materialized the hit counts (behind a barrier) pass the bound
    * attributes so the fold duplicates cheap int comparisons, not
    * tokenizer trees.
    */
  def langBestFromScores(scores: Seq[(String, Column)]): Column = {
    // argmax, first-wins on ties, 'und' (undetermined) when all zero
    val allZero = scores.map(_._2 === 0).reduce(_ && _)
    val best = scores.foldLeft[Option[Column]](None) {
      case (None, (lang, sc)) => Some(struct(sc.as("s"), lit(lang).as("l")))
      case (Some(acc), (lang, sc)) =>
        Some(when(sc > acc.getField("s"), struct(sc.as("s"), lit(lang).as("l")))
          .otherwise(acc))
    }.get
    when(allZero, lit("und")).otherwise(best.getField("l"))
  }

  def sqlLangBest(e: String): String = {
    val scores = langStopwords.map { case (lang, words) =>
      lang -> sqlWordHits(e, words)
    }
    val allZero = scores.map { case (_, s) => s"$s = 0" }.mkString(" AND ")
    // mirror of langBest's fold: strictly-greater replaces, so first
    // language in inventory order wins ties
    val best = scores.tail.foldLeft(
      s"{'s': ${scores.head._2}, 'l': '${scores.head._1}'}") {
      case (acc, (lang, s)) =>
        s"(CASE WHEN $s > struct_extract($acc, 's') THEN {'s': $s, 'l': '$lang'} ELSE $acc END)"
    }
    s"(CASE WHEN $allZero THEN 'und' ELSE struct_extract($best, 'l') END)"
  }

  /** Content fingerprint: md5 of the normalized text — identical across
    * engines, usable as an exact-dedup key and a shard-stable bucket id.
    */
  def fingerprint(c: Column): Column = md5(normText(c).cast("binary"))
  def sqlFingerprint(e: String): String = s"md5(${sqlNormText(e)})"
}
