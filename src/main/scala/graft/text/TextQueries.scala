package graft.text

import org.apache.spark.sql.functions._

import graft.{Queries, Tables}
import TextAnalysis._

/** Oracle-checked text-analysis queries over the `documents` table —
  * the text half of the training-data-pipeline surface (token stats,
  * quality scoring, language ID, fingerprint dedup).
  *
  * All are narrow per-row transforms + one aggregation at most: at 100 TB
  * they are scan-bound and embarrassingly parallel (no shuffle except the
  * final dedup group-by, which shuffles only on the 32-char fingerprint).
  */
object TextQueries {
  import Queries.Q

  /** Token statistics: whitespace tokens, distinct tokens, BPE-ish
    * subword count, and mean token length — the core length/fertility
    * metrics used for corpus filtering.
    */
  val tokenStats: Q = (s, dir) => {
    import s.implicits._
    val norm = normText($"text")
    val nt = nTokens($"text")
    Tables(s, dir, "documents")
      .select(
        $"doc_id",
        nt.as("n_tokens"),
        nUniqTokens($"text").as("n_uniq_tokens"),
        nBpeTokens($"text").as("n_bpe_tokens"),
        $"n_chars",
        ((length(norm) - nt + 1).cast("double") / nt.cast("double"))
          .as("avg_token_len"))
      .orderBy($"doc_id")
  }

  val tokenStatsSql: String = {
    val nt = sqlNTokens("text")
    s"""SELECT doc_id,
       |  $nt AS n_tokens,
       |  ${sqlNUniqTokens("text")} AS n_uniq_tokens,
       |  ${sqlNBpeTokens("text")} AS n_bpe_tokens,
       |  n_chars,
       |  CAST(length(${sqlNormText("text")}) - $nt + 1 AS DOUBLE)
       |    / CAST($nt AS DOUBLE) AS avg_token_len
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Quality score: weighted blend of stopword rate, token diversity,
    * alphabetic purity, and a saturating length credit — the standard
    * cheap-heuristics layer before model-based filtering. Arithmetic is
    * written in one fixed association order so every engine produces
    * bit-identical doubles.
    */
  val qualityScore: Q = (s, dir) => {
    import s.implicits._
    // tokenize-once: each explode(array(…)) is a Generate node that
    // CollapseProject cannot re-inline through, so the normalizer regexp,
    // the split, and each feature are evaluated ONCE per row — the naive
    // single-select form re-evaluates the tokenizer per feature reference
    // (~12x on this query) and array HOFs are interpreted, not codegen'd.
    val normed = Tables(s, dir, "documents")
      .select($"doc_id", $"n_chars",
        explode(array(normText($"text"))).as("norm"))
    val toked = normed
      .select($"doc_id", $"n_chars", $"norm",
        explode(array(split($"norm", " "))).as("toks"))
    val nt = size($"toks").cast("double")
    val feats = toked
      .select($"doc_id",
        explode(array(struct(
          (tokenHits($"toks", langStopwords.head._2).cast("double") / nt)
            .as("stop_ratio"),
          (size(array_distinct($"toks")).cast("double") / nt).as("uniq_ratio"),
          (length(regexp_replace($"norm", "[^a-z]", "")).cast("double") /
            length($"norm").cast("double")).as("alpha_ratio"),
          least(lit(1.0), $"n_chars".cast("double") / lit(500.0))
            .as("len_score")))).as("f"))
    feats
      .select(
        $"doc_id",
        $"f.stop_ratio".as("stop_ratio"),
        $"f.uniq_ratio".as("uniq_ratio"),
        $"f.alpha_ratio".as("alpha_ratio"),
        $"f.len_score".as("len_score"),
        (((lit(0.3) * $"f.stop_ratio" + lit(0.3) * $"f.uniq_ratio")
          + lit(0.2) * $"f.alpha_ratio")
          + lit(0.2) * $"f.len_score").as("quality"))
      .orderBy($"doc_id")
  }

  val qualityScoreSql: String = {
    val nt = s"CAST(${sqlNTokens("text")} AS DOUBLE)"
    val stop = s"(CAST(${sqlWordHits("text", langStopwords.head._2)} AS DOUBLE) / $nt)"
    val uniq = s"(CAST(${sqlNUniqTokens("text")} AS DOUBLE) / $nt)"
    val alpha = s"(CAST(length(regexp_replace(${sqlNormText("text")}, '[^a-z]', '', 'g')) AS DOUBLE)" +
      s" / CAST(length(${sqlNormText("text")}) AS DOUBLE))"
    val len = "least(CAST(1.0 AS DOUBLE), CAST(n_chars AS DOUBLE) / CAST(500.0 AS DOUBLE))"
    s"""SELECT doc_id,
       |  $stop AS stop_ratio,
       |  $uniq AS uniq_ratio,
       |  $alpha AS alpha_ratio,
       |  $len AS len_score,
       |  ((CAST(0.3 AS DOUBLE) * $stop + CAST(0.3 AS DOUBLE) * $uniq)
       |    + CAST(0.2 AS DOUBLE) * $alpha) + CAST(0.2 AS DOUBLE) * $len AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Heuristic language ID: per-language stopword hit counts + argmax
    * (deterministic tie-break), compared against the table's claimed
    * `lang` label.
    */
  val langId: Q = (s, dir) => {
    import s.implicits._
    // tokenize-once (see qualityScore): one Generate barrier materializes
    // the token array, a second materializes the five hit counts, so the
    // tokenizer runs once per row and the argmax fold duplicates only
    // cheap int comparisons over bound attributes.
    val toked = Tables(s, dir, "documents")
      .select($"doc_id", $"lang", explode(array(tokens($"text"))).as("toks"))
    val scored = toked
      .select($"doc_id", $"lang",
        explode(array(struct(langScoresFrom($"toks").map {
          case (l, c) => c.as(s"hits_$l")
        }: _*))).as("h"))
    val hitCols = langStopwords.map { case (l, _) =>
      l -> col(s"h.hits_$l")
    }
    scored
      .select(($"doc_id" +: $"lang" +:
        hitCols.map { case (l, c) => c.as(s"hits_$l") } :+
        langBestFromScores(hitCols).as("lang_pred")): _*)
      .withColumn("agrees", ($"lang" === $"lang_pred").cast("int"))
      .orderBy($"doc_id")
  }

  val langIdSql: String = {
    val scored = langStopwords.map { case (l, _) =>
      s"${sqlWordHits("text", langStopwords.toMap.apply(l))} AS hits_$l"
    }.mkString(",\n  ")
    s"""SELECT doc_id, lang,
       |  $scored,
       |  ${sqlLangBest("text")} AS lang_pred,
       |  CAST(lang = ${sqlLangBest("text")} AS INT) AS agrees
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Exact dedup via content fingerprint: the corpus is doubled with
    * case/whitespace-mutated copies, then collapsed by md5(normalized
    * text) — each group keeps its smallest doc_id as the canonical
    * survivor. At scale this is THE cheap first dedup pass: one shuffle
    * on a 32-char key, perfectly balanced by the hash itself.
    */
  val fingerprintDedup: Q = (s, dir) => {
    import s.implicits._
    val docs = Tables(s, dir, "documents").select($"doc_id", $"text")
    val mutated = docs.select(($"doc_id" + 10000).as("doc_id"),
      concat(upper($"text"), lit("  ")).as("text"))
    docs.unionByName(mutated)
      .groupBy(fingerprint($"text").as("fp"))
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("canonical_doc"))
      .orderBy($"fp")
  }

  val fingerprintDedupSql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 10000, upper(text) || '  ' FROM documents)
       |SELECT ${sqlFingerprint("text")} AS fp,
       |  COUNT(*) AS n_copies, MIN(doc_id) AS canonical_doc
       |FROM corpus GROUP BY 1 ORDER BY fp""".stripMargin

  /** Content fingerprint via the native [[graft.functions.RollingHash64]]
    * Catalyst expression (codegen'd per-row loop, no UDF) + the 64-way
    * shard bucket a fingerprint-partitioned store would route on.
    */
  val rollingFingerprint: Q = (s, dir) => {
    import s.implicits._
    // ASCII projection before hashing: the native expression folds UTF-8
    // BYTES while the SQL mirror folds code points — they agree only on
    // ASCII, so anything outside printable ASCII is stripped identically
    // on both sides instead of silently diverging on non-ASCII input.
    Tables(s, dir, "documents")
      .select($"doc_id",
        regexp_replace(normText($"text"), "[^ -~]", "").as("norm"))
      .select($"doc_id", expr("rolling_hash64(norm)").as("fp64"))
      .withColumn("shard", ($"fp64" % 64).cast("int"))
      .orderBy($"doc_id")
  }

  val rollingFingerprintSql: String = {
    val h = graft.functions.RollingHash64.sql("norm")
    s"""WITH n AS (SELECT doc_id,
       |  regexp_replace(${sqlNormText("text")}, '[^ -~]', '', 'g') AS norm
       |  FROM documents)
       |SELECT doc_id, $h AS fp64, CAST($h % 64 AS INT) AS shard
       |FROM n ORDER BY doc_id""".stripMargin
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003,
    * the MOSS algorithm) — the fingerprint DENSITY-bounded document
    * signature a plagiarism/overlap pipeline stores instead of every
    * k-gram: positional 4-gram md5 keys, and from every window of 5
    * consecutive hashes the (hash, position)-minimum is selected
    * (leftmost tie — encoded as the lexicographic min of
    * `hash|zero-padded-pos` so both engines pick the identical gram
    * with ONE string min, no struct-window support needed). The
    * guarantee: any shared token run of length ≥ w+k−1 = 8 yields a
    * shared fingerprint; expected density is 2/(w+1) of windows.
    * Report per document: gram/window/selected counts, exact ppm
    * density, and the md5 digest of the sorted selected set (the
    * signature itself, fully pinned).
    *
    * Scale shape: grams and windows are per-document (one doc-keyed
    * window shuffle, reducer-bounded by doc length); the report is one
    * rollup on the same key. The selected-set size — what a deployment
    * would SHUFFLE for cross-doc matching — is ~2/(w+1) of the corpus'
    * grams, the point of winnowing.
    */
  val winnowingFingerprint: Q = (s, dir) => {
    import s.implicits._
    winnowingOn(Tables(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id", tokensOnce($"text").as("toks")))
  }

  /** [[winnowingFingerprint]] over any (doc_id, toks) frame — split out
    * so the 10× planted-run scale stress drives the same code.
    */
  private[graft] def winnowingOn(
      docsToks: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val s = docsToks.sparkSession
    import s.implicits._
    val w = 5
    val sel = winnowingSelected(docsToks, w)
      .groupBy($"doc_id", $"n_grams")
      .agg(countDistinct($"m").as("n_selected"),
        md5(concat_ws(",", array_sort(collect_set($"m"))).cast("binary"))
          .as("fp_digest"))
    sel.select($"doc_id", $"n_grams",
        ($"n_grams" - (w - 1)).as("n_windows"), $"n_selected",
        expr(s"(1000000 * n_selected) div (n_grams - ${w - 1})")
          .as("density_ppm"),
        $"fp_digest")
      .orderBy($"doc_id")
  }

  /** The winnowing SELECTION itself — (doc_id, n_grams, p, m) rows, one
    * per full window, m = the window's `hash|pos`-minimum. Split from
    * the report so the scale stress can assert the detection guarantee
    * (a shared ≥ w+k−1 run ⇒ a shared selected HASH) on the operator's
    * own output, not a test-side recompute.
    */
  private[graft] def winnowingSelected(
      docsToks: org.apache.spark.sql.DataFrame,
      w: Int): org.apache.spark.sql.DataFrame = {
    val s = docsToks.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val grams = docsToks
      .filter(size($"toks") >= 4 + w - 1)
      .select($"doc_id",
        posexplode(NearDup.posGramKeys($"toks", 4)).as(Seq("p", "g")))
      .select($"doc_id", $"p",
        concat($"g", lit("|"), lpad($"p".cast("string"), 6, "0")).as("pg"))
    val wf = Window.partitionBy($"doc_id").orderBy($"p")
      .rowsBetween(Window.currentRow, w - 1)
    val cnt = Window.partitionBy($"doc_id")
    grams
      .withColumn("n_grams", count(lit(1)).over(cnt))
      .withColumn("m", min($"pg").over(wf))
      .filter($"p" <= $"n_grams" - w) // full windows only
      .select($"doc_id", $"n_grams", $"p", $"m")
  }

  val winnowingFingerprintSql: String = {
    val pgs = NearDup.sqlPosGramStructs("toks", 4)
    s"""WITH docs AS (
       |  SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents),
       |eligible AS (SELECT * FROM docs WHERE len(toks) >= 8),
       |grams AS (
       |  SELECT doc_id, struct_extract(u, 'p') AS p,
       |    struct_extract(u, 'g') || '|' ||
       |      lpad(CAST(struct_extract(u, 'p') AS VARCHAR), 6, '0') AS pg
       |  FROM (SELECT doc_id, unnest($pgs) AS u FROM eligible)),
       |sized AS (
       |  SELECT doc_id, p, pg,
       |    COUNT(*) OVER (PARTITION BY doc_id) AS n_grams,
       |    MIN(pg) OVER (PARTITION BY doc_id ORDER BY p
       |      ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS m
       |  FROM grams),
       |sel AS (
       |  SELECT doc_id, n_grams, COUNT(DISTINCT m) AS n_selected,
       |    md5(array_to_string(list_sort(list(DISTINCT m)), ',')) AS fp_digest
       |  FROM sized WHERE p <= n_grams - 5
       |  GROUP BY doc_id, n_grams)
       |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       |  CAST(n_grams - 4 AS BIGINT) AS n_windows,
       |  CAST(n_selected AS BIGINT) AS n_selected,
       |  CAST((1000000 * n_selected) // (n_grams - 4) AS BIGINT)
       |    AS density_ppm,
       |  fp_digest
       |FROM sel ORDER BY doc_id""".stripMargin
  }

  /** Corpus term frequencies: explode tokens, drop stopwords/one-char
    * tokens, top-20. The canonical explode → partial-agg shape: the
    * shuffle carries |vocabulary| rows, not |tokens|.
    */
  val topTerms: Q = (s, dir) => {
    import s.implicits._
    val stop = langStopwords.head._2
    Tables(s, dir, "documents")
      .select(explode(tokens($"text")).as("term"))
      .filter(length($"term") > 1 && !$"term".isin(stop: _*))
      .groupBy($"term").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"term").limit(20)
  }

  val topTermsSql: String = {
    val stop = langStopwords.head._2.mkString("('", "', '", "')")
    s"""WITH t AS (SELECT unnest(${sqlTokens("text")}) AS term FROM documents)
       |SELECT term, COUNT(*) AS n FROM t
       |WHERE length(term) > 1 AND term NOT IN $stop
       |GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin
  }

  /** TF-IDF: term frequency × smoothed inverse document frequency, top-3
    * terms per document (doc_id < 50). Integer counts feed one ln() and a
    * few double ops in fixed order; output rounds to 9 to absorb libm
    * last-ulp differences. Ranking uses the unrounded score with a term
    * tiebreak.
    */
  val tfidfTop: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir, "documents")
    val terms = docs.select($"doc_id", explode(array_distinct(tokens($"text"))).as("term"))
    val tf = docs.select($"doc_id", explode(tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = terms.groupBy($"term").agg(count(lit(1)).as("df"))
    val total = docs.select(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")
    tf.join(df, "term").crossJoin(broadcast(total))
      .filter($"doc_id" < 50)
      .withColumn("score",
        $"tf".cast("double") *
          log(($"n_docs".cast("double") + 1.0) / ($"df".cast("double") + 1.0)))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"doc_id", $"term", $"tf", $"df", round($"score", 9).as("tfidf"), $"rk")
      .orderBy($"doc_id", $"rk")
  }

  val tfidfTopSql: String =
    s"""WITH toks AS (SELECT doc_id, ${sqlTokens("text")} AS t FROM documents),
       |tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
       |  GROUP BY doc_id, term),
       |df AS (
       |  SELECT term, COUNT(*) AS df
       |  FROM (SELECT doc_id, unnest(list_distinct(t)) AS term FROM toks)
       |  GROUP BY term),
       |total AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
       |scored AS (
       |  SELECT doc_id, term, tf, df,
       |    CAST(tf AS DOUBLE) * ln((n_docs + CAST(1.0 AS DOUBLE)) /
       |      (CAST(df AS DOUBLE) + CAST(1.0 AS DOUBLE))) AS score
       |  FROM tf JOIN df USING (term) CROSS JOIN total
       |  WHERE doc_id < 50),
       |ranked AS (SELECT *, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, term) AS rk FROM scored)
       |SELECT doc_id, term, tf, df, round(score, 9) AS tfidf, CAST(rk AS INTEGER) AS rk
       |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** Repetition-based quality metrics (the Gopher-rules family): the
    * most-frequent-token fraction, the most-frequent-2-gram fraction,
    * and the fraction of 2-gram occurrences belonging to a repeated
    * 2-gram — the signals that catch boilerplate/spam/degenerate
    * generations that length and stopword ratios miss. All integer
    * counts and exact integer-ratio divisions — engine-identical with
    * no rounding. Shape: two explode → partial-agg passes keyed on
    * (doc, term), joined on doc_id — scan-bound, no corpus-wide state.
    */
  val repetitionQuality: Q = (s, dir) => {
    import s.implicits._
    val base = Tables(s, dir, "documents")
      .select($"doc_id", tokensOnce($"text").as("toks"))
      .filter(size($"toks") >= 2)
    val tokStats = base.select($"doc_id", explode($"toks").as("t"))
      .groupBy($"doc_id", $"t").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(max($"c").as("top_tok"), sum($"c").as("n_tok"))
    val bigrams = transform(sequence(lit(1), size($"toks") - 1),
      i => concat_ws(" ", element_at($"toks", i), element_at($"toks", i + 1)))
    val biStats = base.select($"doc_id", explode(bigrams).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(max($"c").as("top_bi"), sum($"c").as("n_bi"),
        sum(when($"c" >= 2, $"c").otherwise(0L)).as("dup_bi"))
    tokStats.join(biStats, "doc_id")
      .select($"doc_id", $"n_tok",
        ($"top_tok" / $"n_tok").as("top_token_frac"),
        ($"top_bi" / $"n_bi").as("top_bigram_frac"),
        ($"dup_bi" / $"n_bi").as("dup_bigram_frac"))
      .orderBy($"doc_id")
  }

  val repetitionQualitySql: String =
    s"""WITH base AS (
       |  SELECT doc_id, toks FROM (
       |    SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents)
       |  WHERE len(toks) >= 2),
       |tc AS (
       |  SELECT doc_id, t, COUNT(*) AS c
       |  FROM (SELECT doc_id, unnest(toks) AS t FROM base)
       |  GROUP BY doc_id, t),
       |ts AS (
       |  SELECT doc_id, MAX(c) AS top_tok, CAST(SUM(c) AS BIGINT) AS n_tok
       |  FROM tc GROUP BY doc_id),
       |bc AS (
       |  SELECT doc_id, g, COUNT(*) AS c
       |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |    i -> toks[i] || ' ' || toks[i + 1])) AS g FROM base)
       |  GROUP BY doc_id, g),
       |bs AS (
       |  SELECT doc_id, MAX(c) AS top_bi, CAST(SUM(c) AS BIGINT) AS n_bi,
       |    CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_bi
       |  FROM bc GROUP BY doc_id)
       |SELECT doc_id, n_tok,
       |  top_tok / n_tok AS top_token_frac,
       |  top_bi / n_bi AS top_bigram_frac,
       |  dup_bi / n_bi AS dup_bigram_frac
       |FROM ts JOIN bs USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** RAG chunking — overlapping token windows (size 64, stride 48) per
    * document, the retrieval-prep step between curation and embedding:
    * each chunk carries its offset, length, and content fingerprint
    * (md5 — the dedup/index key downstream). Pure per-row explode:
    * ceil(len/stride) rows per doc, scan-bound at any scale. The final
    * short window is kept (RAG chunkers keep the tail; it holds the
    * document's end).
    */
  val chunkWindows: Q = (s, dir) => {
    import s.implicits._
    val size64 = 64
    val stride = 48
    val base = Tables(s, dir, "documents")
      .select($"doc_id", tokensOnce($"text").as("toks"))
      .filter(size($"toks") >= 1)
    base
      .select($"doc_id", $"toks",
        posexplode(transform(
          sequence(lit(0), expr(s"(size(toks) - 1) div $stride").cast("int")),
          k => slice($"toks", k * stride + 1, lit(size64)))))
      .toDF("doc_id", "toks", "chunk_idx", "chunk")
      .select($"doc_id", $"chunk_idx",
        ($"chunk_idx" * stride).cast("long").as("tok_offset"),
        size($"chunk").as("n_tokens"),
        md5(array_join($"chunk", " ").cast("binary")).as("chunk_md5"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  val chunkWindowsSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, toks FROM (
       |    SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents)
       |  WHERE len(toks) >= 1),
       |idx AS (
       |  -- scalar range() list + unnest: per-row bound, no hard cap
       |  -- (table-function range() only takes constants in DuckDB 1.0)
       |  SELECT doc_id, toks,
       |    unnest(range(0, (len(toks) - 1) // 48 + 1)) AS k
       |  FROM base),
       |chunks AS (
       |  SELECT doc_id, k AS chunk_idx, k * 48 AS tok_offset,
       |    list_slice(toks, k * 48 + 1, k * 48 + 64) AS chunk
       |  FROM idx)
       |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       |  CAST(tok_offset AS BIGINT) AS tok_offset,
       |  CAST(len(chunk) AS INT) AS n_tokens,
       |  md5(array_to_string(chunk, ' ')) AS chunk_md5
       |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin

  /** Bigram-LM perplexity quality filter — the CCNet/Gopher-style
    * signal the heuristic gates (`text_quality_score`,
    * `text_repetition_quality`) don't cover: score each document by the
    * mean log-probability of its bigrams under an add-one-smoothed
    * bigram LM trained on the corpus itself, and filter the docs whose
    * token order the model finds implausible, plus the OOV rate the
    * production filter (CCNet) pairs it with. The gate corpus is
    * originals ∪ OOV-junk copies (doc_id+30000, every token replaced
    * by a deterministic out-of-vocabulary string — the mojibake/binary/
    * wrong-language class these filters exist to kill).
    *
    * Measured honesty note (sf0.01): the synthetic corpus draws tokens
    * iid from a 31-word vocabulary, so EVERY class's avg_logprob
    * converges to −ln V ≈ −3.43 (originals −3.63..−3.28, junk exactly
    * −3.434) — with random token order and heavy smoothing the bigram
    * signal carries no information BY CONSTRUCTION of the corpus, and
    * token-reversed copies score identically (tried, measured, same
    * range). The gate therefore keys its verdict on the OOV-rate
    * column — 0.0 vs 1.0 here, an exact integer ratio with no float
    * threshold to sit near — while avg_logprob stays hash-gated to 9
    * decimals as the score a natural-language corpus WOULD separate
    * on. The mechanism (count tables → smoothed per-bigram logprob →
    * decimal-detoured per-doc mean) is the production shape either
    * way.
    *
    * Scale shape: unigram/V stats broadcast (vocabulary-bounded), the
    * bigram-count join shuffles on the term key exactly like the BM25
    * posting join (never broadcast — corpus-scale), per-doc mean rides
    * the decimal detour.
    *
    * ln() determinism (measured at sf0.1): `round(davg(lp), 9)` is NOT
    * safe here even with identical decimal sums — a decimal(22,6) sum
    * divided by a 2^a·5^b bigram count terminates BEYOND scale 9, and
    * doc 2146 landed exactly on a half-point (−272.658869 / 80 =
    * −3.4082358625): the double division then sits 1 ulp below the
    * half, Spark's shortest-repr HALF_UP rounds down while DuckDB's
    * `x·1e9` re-rounds ONTO the half and away from zero — a guaranteed
    * flip wherever the exact mean ties. Two-part fix: (1) each
    * bigram's logprob is quantized to the 1e-6 grid so both engines
    * sum identical decimals; (2) the 9-rounded mean is computed in
    * EXACT INTEGER arithmetic — micro-unit sum → half-away-from-zero
    * integer division `(2·|m|·1000 + n) div (2·n)` → nano-units as
    * double — so ties break identically by construction, no double in
    * the decision path.
    */
  val lmPerplexity: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.Exact._
    val tr = graft.CacheTracker.persistTracked(
      Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", tokensOnce($"text").as("toks"))
        .filter(size($"toks") >= 2))
    def bigramsOf(df: org.apache.spark.sql.DataFrame) = df.select($"doc_id",
      explode(transform(sequence(lit(1), size($"toks") - 1),
        i => concat_ws(" ", element_at($"toks", i),
          element_at($"toks", i + 1)))).as("bg"))
    val uni = tr.select(explode($"toks").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c1"))
    val big = bigramsOf(tr).groupBy($"bg").agg(count(lit(1)).as("c2"))
    val vstats = broadcast(uni.agg(count(lit(1)).as("v")))
    val scored = tr.select(explode(array(
        struct($"doc_id", $"toks"),
        struct(($"doc_id" + 30000).as("doc_id"),
          transform($"toks", (_, j) =>
            concat(lit("zzq"),
              ((($"doc_id" + 30000) * 31 + j) % 97).cast("string")))
            .as("toks")))).as("r"))
      .select($"r.doc_id", $"r.toks")
    bigramsOf(scored)
      .withColumn("prev", split($"bg", " ").getItem(0))
      .join(big, Seq("bg"), "left")
      // uni is VOCABULARY-sized (corpus-scaling, like `big` above) — no
      // broadcast hint; AQE converts at runtime when it is actually
      // small, and a 100 TB vocabulary joins shuffled instead of
      // failing a forced build
      .join(uni, $"prev" === $"w", "left")
      .crossJoin(vstats)
      .select($"doc_id",
        round(log((coalesce($"c2", lit(0L)) + lit(1.0)) /
          (coalesce($"c1", lit(0L)) + $"v")), 6).as("lp"),
        $"c1".isNull.cast("long").as("oov"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum($"lp".cast("decimal(22,6)")).as("sdec"),
        round(sum($"oov") / count(lit(1)), 9).as("oov_rate"))
      // exact-integer 9-round of the mean: micro-unit total, then
      // half-away-from-zero division to nano-units
      .withColumn("m", ($"sdec" * 1000000).cast("long"))
      .withColumn("r9", expr(
        "(2 * abs(m) * 1000 + n_bigrams) div (2 * n_bigrams)"))
      .select($"doc_id", $"n_bigrams",
        (when($"m" < 0, -$"r9").otherwise($"r9")).cast("double")
          ./(lit(1e9)).as("avg_logprob"),
        $"oov_rate",
        when($"oov_rate" > 0.5, lit("filter")).otherwise(lit("keep"))
          .as("verdict"))
      .orderBy($"doc_id")
  }

  val lmPerplexitySql: String =
    s"""WITH base AS (
       |  SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents),
       |tr AS (SELECT * FROM base WHERE len(toks) >= 2),
       |uni AS (
       |  SELECT w, COUNT(*) AS c1
       |  FROM (SELECT unnest(toks) AS w FROM tr) GROUP BY w),
       |vstats AS (SELECT COUNT(*) AS v FROM uni),
       |trbg AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |    i -> toks[i] || ' ' || toks[i + 1])) AS bg
       |  FROM tr),
       |big AS (SELECT bg, COUNT(*) AS c2 FROM trbg GROUP BY bg),
       |scored AS (
       |  SELECT doc_id, toks FROM tr
       |  UNION ALL
       |  SELECT doc_id + 30000,
       |    list_transform(range(1, len(toks) + 1),
       |      j -> 'zzq' || CAST(((doc_id + 30000) * 31 + (j - 1)) % 97 AS VARCHAR))
       |  FROM tr),
       |sbg AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |    i -> toks[i] || ' ' || toks[i + 1])) AS bg
       |  FROM scored),
       |lp AS (
       |  SELECT s.doc_id,
       |    round(ln((COALESCE(b.c2, 0) + 1.0) / (COALESCE(u.c1, 0) + v.v)), 6) AS lp,
       |    CASE WHEN u.c1 IS NULL THEN 1 ELSE 0 END AS oov
       |  FROM sbg s LEFT JOIN big b USING (bg)
       |  LEFT JOIN uni u ON string_split(s.bg, ' ')[1] = u.w
       |  CROSS JOIN vstats v),
       |agg AS (
       |  SELECT doc_id, COUNT(*) AS n_bigrams,
       |    CAST(SUM(CAST(lp AS DECIMAL(22,6))) * 1000000 AS BIGINT) AS m,
       |    round(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 9) AS oov_rate
       |  FROM lp GROUP BY doc_id)
       |SELECT doc_id, n_bigrams,
       |  CAST(CASE WHEN m < 0
       |    THEN -((2 * abs(m) * 1000 + n_bigrams) // (2 * n_bigrams))
       |    ELSE (2 * abs(m) * 1000 + n_bigrams) // (2 * n_bigrams) END
       |    AS DOUBLE) / 1e9 AS avg_logprob,
       |  oov_rate,
       |  CASE WHEN oov_rate > 0.5 THEN 'filter' ELSE 'keep' END AS verdict
       |FROM agg ORDER BY doc_id""".stripMargin

  /** CCNet-style perplexity bucketing — the corpus-curation step that
    * made the CommonCrawl pipelines famous: score every document with a
    * per-LANGUAGE smoothed bigram LM and split each language into
    * head / middle / tail terciles by perplexity (head = lowest
    * perplexity = keep-first; tail = candidates for dropping or
    * down-weighting). The LM is per-language (CCNet trains one LM per
    * language — a zh document must not be scored against an en model),
    * trained in-engine on the same corpus it scores, which is exactly
    * the self-scored bucketing CCNet's quality split does.
    *
    * Determinism: per-bigram logprob quantized to the 1e-6 grid, the
    * per-doc mean 9-rounded in EXACT INTEGER arithmetic (the
    * [[lmPerplexity]] half-away-from-zero template — no double in the
    * tie decision), and the tercile split orders by that exact
    * nano-integer with doc_id ties, so bucket membership cannot flip
    * between engines. ntile semantics (first `n mod 3` tiles get the
    * extra row) agree across engines.
    *
    * Scale shape: LM counts shuffle on the (lang, term) key like the
    * BM25 posting join; per-language vocab sizes broadcast; the
    * bucket split is one window over (lang) — at 100 TB the window is
    * the sort-within-language a real CCNet shard split pays, and the
    * output is the per-(lang, bucket) summary a curation report reads.
    */
  val perplexityBuckets: Q = (s, dir) => {
    import s.implicits._
    val tr = graft.CacheTracker.persistTracked(
      Tables(s, dir, "documents")
        // the one-file scan would tokenize on ONE core (the r12
        // single-partition lesson) — spread before the per-row work
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", $"lang", tokensOnce($"text").as("toks"))
        .filter(size($"toks") >= 2))
    // the bigram stream feeds BOTH the LM count table and the per-doc
    // scoring pass — build it once
    val trbg = graft.CacheTracker.persistTracked(
      tr.select($"doc_id", $"lang",
        explode(transform(sequence(lit(1), size($"toks") - 1),
          i => concat_ws(" ", element_at($"toks", i),
            element_at($"toks", i + 1)))).as("bg")))
    val uni = tr.select($"lang", explode($"toks").as("w"))
      .groupBy($"lang", $"w").agg(count(lit(1)).as("c1"))
    val big = trbg.groupBy($"lang", $"bg").agg(count(lit(1)).as("c2"))
    val vstats = broadcast(uni.groupBy($"lang").agg(count(lit(1)).as("v"))
      .withColumnRenamed("lang", "vlang"))
    val perDoc = trbg
      .withColumn("prev", split($"bg", " ").getItem(0))
      .join(big, Seq("lang", "bg"), "left")
      .join(uni.withColumnRenamed("lang", "ulang"),
        $"lang" === $"ulang" && $"prev" === $"w", "left")
      .join(vstats, $"lang" === $"vlang")
      .select($"doc_id",
        round(log((coalesce($"c2", lit(0L)) + lit(1.0)) /
          (coalesce($"c1", lit(0L)) + $"v")), 6).as("lp"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum($"lp".cast("decimal(22,6)")).as("sdec"))
      .withColumn("m", ($"sdec" * 1000000).cast("long"))
      .withColumn("r9", expr(
        "(2 * abs(m) * 1000 + n_bigrams) div (2 * n_bigrams)"))
      .select($"doc_id", $"n_bigrams",
        when($"m" < 0, -$"r9").otherwise($"r9").as("nano"))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"nano".desc, $"doc_id")
    perDoc.join(tr.select($"doc_id", $"lang"), "doc_id")
      .withColumn("bucket", ntile(3).over(wb))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_bigrams").as("n_bigrams"),
        (max($"nano").cast("double") / lit(1e9)).as("lp_hi"),
        (min($"nano").cast("double") / lit(1e9)).as("lp_lo"))
      .withColumn("band", when($"bucket" === 1, "head")
        .when($"bucket" === 2, "middle").otherwise("tail"))
      .select($"lang", $"bucket", $"band", $"n_docs", $"n_bigrams",
        $"lp_hi", $"lp_lo")
      .orderBy($"lang", $"bucket")
  }

  val perplexityBucketsSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, lang, ${sqlTokens("text")} AS toks FROM documents),
       |tr AS MATERIALIZED (SELECT * FROM base WHERE len(toks) >= 2),
       |uni AS (
       |  SELECT lang, w, COUNT(*) AS c1
       |  FROM (SELECT lang, unnest(toks) AS w FROM tr) GROUP BY lang, w),
       |vstats AS (SELECT lang, COUNT(*) AS v FROM uni GROUP BY lang),
       |trbg AS MATERIALIZED (
       |  SELECT doc_id, lang, unnest(list_transform(range(1, len(toks)),
       |    i -> toks[i] || ' ' || toks[i + 1])) AS bg
       |  FROM tr),
       |big AS (SELECT lang, bg, COUNT(*) AS c2 FROM trbg GROUP BY lang, bg),
       |lp AS (
       |  SELECT t.doc_id,
       |    round(ln((COALESCE(b.c2, 0) + 1.0) / (COALESCE(u.c1, 0) + v.v)), 6) AS lp
       |  FROM trbg t
       |  LEFT JOIN big b ON t.lang = b.lang AND t.bg = b.bg
       |  LEFT JOIN uni u ON t.lang = u.lang AND string_split(t.bg, ' ')[1] = u.w
       |  JOIN vstats v ON t.lang = v.lang),
       |agg AS (
       |  SELECT doc_id, COUNT(*) AS n_bigrams,
       |    CAST(SUM(CAST(lp AS DECIMAL(22,6))) * 1000000 AS BIGINT) AS m
       |  FROM lp GROUP BY doc_id),
       |nano AS (
       |  SELECT doc_id, n_bigrams,
       |    CASE WHEN m < 0
       |      THEN -((2 * abs(m) * 1000 + n_bigrams) // (2 * n_bigrams))
       |      ELSE (2 * abs(m) * 1000 + n_bigrams) // (2 * n_bigrams) END AS nano
       |  FROM agg),
       |bucketed AS (
       |  SELECT t.lang, n.doc_id, n.n_bigrams, n.nano,
       |    ntile(3) OVER (PARTITION BY t.lang
       |      ORDER BY n.nano DESC, n.doc_id) AS bucket
       |  FROM nano n JOIN tr t USING (doc_id))
       |SELECT lang, CAST(bucket AS INTEGER) AS bucket,
       |  CASE WHEN bucket = 1 THEN 'head'
       |       WHEN bucket = 2 THEN 'middle' ELSE 'tail' END AS band,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
       |  CAST(MAX(nano) AS DOUBLE) / 1e9 AS lp_hi,
       |  CAST(MIN(nano) AS DOUBLE) / 1e9 AS lp_lo
       |FROM bucketed GROUP BY lang, bucket
       |ORDER BY lang, bucket""".stripMargin

  /** Two-pass heavy hitters: a bounded-memory Misra-Gries sketch
    * ([[graft.operators.MisraGries]], capacity 16) proposes the
    * candidate set, then an exact count pass over ONLY the candidates
    * (broadcast ≤16-row join) picks the tokens whose true frequency
    * exceeds n/16 — integer arithmetic (`cnt·16 > n`), no float
    * threshold. The corpus vocabulary is near-uniform (31 words at
    * ~3%), so the gate PLANTS the skew it detects, the
    * `dedup_lsh_hot_band` discipline: tokens whose md5 bucket < 10
    * ('part' and 'window' on this corpus) are replicated ×41 in the
    * stream, making them ~37% each while everything else drops below
    * 1%. The oracle knows nothing about the sketch — it exact-counts
    * the same planted stream and applies the same threshold — which is
    * precisely the claim: the MG guarantee (every token with true
    * freq > n/(m+1) survives ANY partitioning/combine tree, error
    * ≤ n/(m+1)) makes the two-pass output equal the exact answer. A
    * missed candidate in the sketch would drop a row and fail the
    * hash. Guarantee property-tested under random repartitionings in
    * HeavyHittersSpec.
    *
    * Scale shape: pass 1 reduces each scan partition to one ≤16-entry
    * summary (map-side partial agg, shuffle moves ≤16 rows per
    * partition); pass 2 is a broadcast semi-join + group-by on ≤16
    * keys — the plan that survives a 100 TB token stream where the
    * exact full-vocabulary group-by (`text_top_terms`) would shuffle
    * the whole term universe.
    */
  val heavyHitters: Q = (s, dir) => {
    import s.implicits._
    val m = 16
    // the planted ×41 replication rides as a WEIGHT column instead of
    // 41 materialized rows (r12, measured: the explode doubled the
    // stream to ~1M rows at sf0.1 and the sketch paid per-row): a
    // weight-k MG update is k unit inserts for the guarantee, and the
    // exact pass counts with sum(wt) — output identical, half the rows
    // repartition the one-file scan before the per-row work (the
    // agg_countmin_probe lesson): tokenize + md5 otherwise run on the
    // scan's single input partition. The OUTPUT is partition-invariant
    // by the MG guarantee (HeavyHittersSpec), so only wall-clock moves.
    val toks = Tables(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select(explode(tokens($"text")).as("w"))
      .withColumn("wt",
        when(graft.functions.KeyHash.bucket100("hh|", $"w") < 10, lit(41L))
          .otherwise(lit(1L)))
    val tr = graft.CacheTracker.persistTracked(toks)
    // one global group: map-side partials still reduce each partition
    // to a single ≤m-entry summary before the 1-group merge
    val cand = tr.as[(String, Long)].groupByKey(_ => 0)
      .agg(new graft.operators.MisraGries(m).toColumn.name("mg"))
      .toDF("g", "mg")
      .select(explode($"mg.words").as("w"))
    val tot = tr.agg(sum($"wt").as("n_total"))
    tr.join(broadcast(cand), Seq("w"))
      .groupBy($"w").agg(sum($"wt").as("cnt"))
      .crossJoin(broadcast(tot))
      .filter($"cnt" * m > $"n_total")
      .select($"w", $"cnt", $"n_total")
      .orderBy($"cnt".desc, $"w")
  }

  val heavyHittersSql: String =
    s"""WITH toks AS (
       |  SELECT unnest(${sqlTokens("text")}) AS w FROM documents),
       |b AS (
       |  SELECT w, unnest(range(0, CASE
       |    WHEN ${graft.functions.KeyHash.sqlBucket100("hh|", "w")} < 10
       |    THEN 41 ELSE 1 END)) AS i
       |  FROM toks),
       |counts AS (SELECT w, COUNT(*) AS cnt FROM b GROUP BY w),
       |tot AS (SELECT COUNT(*) AS n_total FROM b)
       |SELECT w, cnt, n_total FROM counts CROSS JOIN tot
       |WHERE cnt * 16 > n_total ORDER BY cnt DESC, w""".stripMargin

  /** Line-level boilerplate removal (the CCNet/C4 pass): hash every
    * "line", count how many DOCS each line appears in across the whole
    * corpus, and drop lines above the document-frequency threshold —
    * navigation chrome, license blocks, cookie banners fall out while
    * each doc's unique prose survives. Differs from
    * [[DedupQueries.exactSubstring]] in unit and verdict: fixed
    * segmentation (no positional overlap) and a GLOBAL df threshold
    * (df ≥ 3), vs positional grams and any-cross-doc duplication.
    *
    * The corpus has no newlines, so the "line" segmenter is fixed
    * 10-token chunks (the same stand-in [[chunkWindows]] uses); the
    * boilerplate is planted — a 10-token header prepended to the
    * [[KeyHash]]-selected ~30% of docs, which lands exactly on chunk 0
    * and must be the one chunk dropped (df ≈ 150 ≫ 3) while every
    * other chunk's df stays 1.
    *
    * Scale shape: chunk hashes are scan-local; ONE shuffle on the
    * 32-char hash builds the df table; the join back rides the same
    * hash partitioning (exchange reuse), and the per-doc rollup is the
    * only other exchange. No pairs, no windows — cost is chunks, which
    * is tokens/10.
    */
  private val LineHeader =
    "this document is provided as is without warranty of any"

  val lineDedup: Q = (s, dir) => {
    import s.implicits._
    val base = Tables(s, dir, "documents")
      .select($"doc_id", tokens($"text").as("t0"))
      .withColumn("toks",
        when(graft.functions.KeyHash.bucket100("hdr|", $"doc_id") < 30,
          concat(split(lit(LineHeader), " "), $"t0")).otherwise($"t0"))
    val chunks = graft.CacheTracker.persistTracked(base
      .select($"doc_id", posexplode(
        // Guard the degenerate size=0 case: sequence(0,-1) would yield the
        // DESCENDING [0,-1] (two phantom chunks) where DuckDB's range(0,0)
        // yields none. split() never returns an empty array today, but
        // corpora regenerate with drift (CLAUDE.md) — same guard class as
        // NearDup.posGramKeys.
        transform(
          when(size($"toks") >= 1,
            sequence(lit(0), expr("(size(toks) + 9) div 10 - 1")))
            .otherwise(array().cast("array<int>")),
          i => struct(
            md5(array_join(slice($"toks", i * 10 + 1, lit(10)), " ")
              .cast("binary")).as("h"),
            least(lit(10), size($"toks") - i * 10).as("sz")))))
      .select($"doc_id", $"col.h".as("h"), $"col.sz".as("sz")))
    val freq = chunks.groupBy($"h").agg(count_distinct($"doc_id").as("df"))
    chunks.join(freq, "h")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"df" >= 3, 1L).otherwise(0L)).as("n_dropped"),
        sum(when($"df" < 3, $"sz".cast("long")).otherwise(0L)).as("kept_tokens"))
      .orderBy($"doc_id")
  }

  val lineDedupSql: String = {
    val b = graft.functions.KeyHash.sqlBucket100("hdr|", "doc_id")
    s"""WITH docs AS (
       |  SELECT doc_id, ${sqlTokens("text")} AS t0 FROM documents),
       |base AS (SELECT doc_id,
       |  CASE WHEN $b < 30 THEN list_cat(string_split('$LineHeader', ' '), t0)
       |       ELSE t0 END AS toks
       |  FROM docs),
       |ch AS (SELECT doc_id, unnest(list_transform(range(0, (len(toks) + 9) // 10),
       |    i -> {'h': md5(array_to_string(list_slice(toks, i * 10 + 1, i * 10 + 10), ' ')),
       |          'sz': least(10, len(toks) - i * 10)})) AS u
       |  FROM base),
       |chunks AS (
       |  SELECT doc_id, struct_extract(u, 'h') AS h, struct_extract(u, 'sz') AS sz
       |  FROM ch),
       |freq AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM chunks GROUP BY h)
       |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |  CAST(SUM(CASE WHEN f.df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  CAST(SUM(CASE WHEN f.df < 3 THEN c.sz ELSE 0 END) AS BIGINT) AS kept_tokens
       |FROM chunks c JOIN freq f ON c.h = f.h
       |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin
  }

  /** Term co-occurrence graph — the bipartite doc↔term projection that
    * feeds collocation mining, topic seeds, and taxonomy induction:
    * each document contributes only its TOP-5 content terms (by
    * in-doc count, term tiebreak), and the edge weight of (a, b) is
    * the number of documents whose top sets contain both.
    *
    * Scale discipline: projecting a bipartite graph is quadratic in
    * per-doc degree, so the degree is CAPPED before the self-join —
    * ≤ C(5,2) = 10 pairs per document regardless of document length
    * (the LSH-band-cap principle applied to graph projection; an
    * uncapped projection of a 10⁵-term document would emit 10¹⁰
    * pairs). Shape: tokenize scan-local → one shuffle on (doc, term)
    * with map-side combine → per-DOC top-5 window (high-cardinality
    * key) → self-join co-partitioned on doc_id (the top table is
    * persisted — a self-join evaluates both sides) → one pair-key
    * aggregation.
    */
  val cooccurrence: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val stop = langStopwords.head._2
    val tc = Tables(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id", explode(tokens($"text")).as("term"))
      .filter(length($"term") > 1 && !$"term".isin(stop: _*))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tn"))
    val w = Window.partitionBy($"doc_id").orderBy($"tn".desc, $"term")
    val top = graft.CacheTracker.persistTracked(
      tc.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
        .select($"doc_id", $"term"))
    top.select($"doc_id", $"term".as("term_a"))
      .join(top.select($"doc_id", $"term".as("term_b")), "doc_id")
      .filter($"term_a" < $"term_b")
      .groupBy($"term_a", $"term_b").agg(count(lit(1)).as("n_docs"))
      .orderBy($"n_docs".desc, $"term_a", $"term_b").limit(20)
  }

  val cooccurrenceSql: String = {
    val stop = langStopwords.head._2.mkString("('", "', '", "')")
    s"""WITH tc AS (
       |  SELECT doc_id, term, COUNT(*) AS tn FROM (
       |    SELECT doc_id, unnest(${sqlTokens("text")}) AS term FROM documents)
       |  WHERE length(term) > 1 AND term NOT IN $stop
       |  GROUP BY doc_id, term),
       |top AS MATERIALIZED (
       |  SELECT doc_id, term FROM (
       |    SELECT doc_id, term, row_number() OVER (
       |      PARTITION BY doc_id ORDER BY tn DESC, term) AS rk FROM tc)
       |  WHERE rk <= 5)
       |SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS n_docs
       |FROM top a JOIN top b ON a.doc_id = b.doc_id AND a.term < b.term
       |GROUP BY 1, 2 ORDER BY n_docs DESC, term_a, term_b LIMIT 20""".stripMargin
  }

  /** Fixed query terms for the BM25 retrieval gate — mid-frequency
    * members of the synthetic vocabulary, so tf and df both vary.
    */
  private val Bm25Terms = Seq("spark", "hash", "window", "merge")

  /** BM25 retrieval (k1 = 1.2, b = 0.75): top-20 documents for a fixed
    * multi-term query — the classic lexical ranking every search/RAG
    * retrieval stack keeps next to its vector index (and the scoring
    * side of a hybrid-search fusion; `sim_hybrid_search` gates the
    * fusion shape). idf = ln(1 + (N − df + ½)/(df + ½)), the standard
    * "plus-one" form that stays positive at any df.
    *
    * Determinism: per-term scores are single IEEE expression trees
    * written identically in both dialects (the `text_tfidf_top`
    * precedent); the ACROSS-term sum — the only order-dependent step —
    * runs through the decimal detour ([[graft.functions.Exact.dsum]]),
    * so the ranking key is a 1e-6-grid value no partial-agg order can
    * perturb. Top-20 via orderBy+limit (TakeOrderedAndProject — no
    * global sort materializes at corpus scale); the 20-row rank window
    * runs on the already-limited result.
    *
    * Scale shape: tf is one explode filtered to |query| terms before
    * the group-by (the filter prunes the shuffle to matching tokens
    * only); df and the corpus stats are broadcast; nothing all-pairs.
    */
  val bm25Topk: Q = (s, dir) => bm25On(Tables(s, dir, "documents"))

  /** [[bm25Topk]] over an explicit (doc_id, text) frame — the gate
    * reads the corpus table; the 10× scale stress feeds a replicated
    * corpus through the identical plan.
    */
  private[graft] def bm25On(raw: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    val s = raw.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Exact.dsum
    // persisted: one tokenization pass feeds both the corpus stats
    // aggregate and the tf explode — without the barrier the regex
    // tokenizer would run twice over the corpus (tokenize-once
    // invariant, cf. text_lang_id / text_quality_score).
    val docs = graft.CacheTracker.persistTracked(raw
      .select($"doc_id", tokens($"text").as("toks"))
      .select($"doc_id", $"toks", size($"toks").as("dl")))
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sdl"))
    val tf = docs.select($"doc_id", $"dl", explode($"toks").as("term"))
      .filter($"term".isin(Bm25Terms: _*))
      .groupBy($"doc_id", $"dl", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val byDoc = tf.join(broadcast(df), "term").crossJoin(broadcast(stats))
      .withColumn("ts",
        log(lit(1.0) + ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5))) *
          ($"tf" * lit(2.2)) /
          ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / ($"sdl" / $"n_docs"))))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_hit"), dsum($"ts").as("score"))
      .orderBy($"score".desc, $"doc_id").limit(20)
    byDoc
      .withColumn("rank",
        row_number().over(Window.orderBy($"score".desc, $"doc_id")))
      .select($"doc_id", $"n_hit", $"score", $"rank")
      .orderBy($"rank")
  }

  val bm25TopkSql: String = {
    import graft.functions.Exact.sqlDsum
    val terms = Bm25Terms.mkString("('", "', '", "')")
    s"""WITH d AS (
       |  SELECT doc_id, toks, CAST(len(toks) AS INT) AS dl FROM (
       |    SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents)),
       |stats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(dl) AS BIGINT) AS sdl FROM d),
       |tf AS (
       |  SELECT doc_id, dl, term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
       |  WHERE term IN $terms
       |  GROUP BY doc_id, dl, term),
       |dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT doc_id,
       |    ln(CAST(1.0 AS DOUBLE) +
       |        (n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))) *
       |      (tf * CAST(2.2 AS DOUBLE)) /
       |      (tf + CAST(1.2 AS DOUBLE) *
       |        (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / (sdl / n_docs))) AS ts
       |  FROM tf JOIN dfx USING (term) CROSS JOIN stats),
       |byd AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit, ${sqlDsum("ts")} AS score
       |  FROM scored GROUP BY doc_id
       |  ORDER BY score DESC, doc_id LIMIT 20)
       |SELECT doc_id, n_hit, score,
       |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank
       |FROM byd ORDER BY rank""".stripMargin
  }

  /** The dataset card — the per-language datasheet a corpus release
    * ships with, computed as one scan + two keyed aggregations: volume
    * (docs, distinct sources, total whitespace tokens), the mean token
    * budget as exact integer ppm (`total·10⁶ div n` — no float), the
    * short-document fraction (< 20 tokens, the C4-style floor), and
    * the exact-duplicate share (docs whose normalized-text md5
    * fingerprint appears more than once WITHIN the language). Every
    * column is an integer or an md5-derived count, so the card is
    * hash-stable by construction. At 100 TB: one corpus scan, a
    * (lang, fp)-keyed partial aggregation, and a |langs|-row result.
    */
  val datasetCard: Q = (s, dir) => {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
      .select($"doc_id", $"lang", $"source",
        nTokens($"text").as("nt"), fingerprint($"text").as("fp"))
      .transform(graft.CacheTracker.persistTracked)
    val dup = docs.groupBy($"lang", $"fp")
      .agg(count(lit(1)).as("c"))
      .groupBy($"lang")
      .agg(sum(when($"c" >= 2, $"c").otherwise(0L)).as("n_dup_docs"))
    docs.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"source").as("n_sources"),
        sum($"nt".cast("long")).as("total_tokens"),
        sum(when($"nt" < 20, 1L).otherwise(0L)).as("n_short"))
      .join(dup, Seq("lang"))
      .select($"lang", $"n_docs", $"n_sources", $"total_tokens",
        expr("(total_tokens * 1000000) div n_docs").as("mean_tokens_ppm"),
        $"n_short", $"n_dup_docs",
        expr("(n_dup_docs * 1000000) div n_docs").as("dup_rate_ppm"))
      .orderBy($"lang")
  }

  val datasetCardSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang, source, ${sqlNTokens("text")} AS nt,
       |    ${sqlFingerprint("text")} AS fp
       |  FROM documents),
       |dup AS (
       |  SELECT lang, CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
       |      AS n_dup_docs
       |  FROM (SELECT lang, fp, COUNT(*) AS c FROM d GROUP BY lang, fp)
       |  GROUP BY lang),
       |card AS (
       |  SELECT lang, COUNT(*) AS n_docs,
       |    COUNT(DISTINCT source) AS n_sources,
       |    CAST(SUM(nt) AS BIGINT) AS total_tokens,
       |    CAST(SUM(CASE WHEN nt < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
       |  FROM d GROUP BY lang)
       |SELECT lang, n_docs, n_sources, total_tokens,
       |  (total_tokens * 1000000) // n_docs AS mean_tokens_ppm,
       |  n_short, n_dup_docs,
       |  (n_dup_docs * 1000000) // n_docs AS dup_rate_ppm
       |FROM card JOIN dup USING (lang) ORDER BY lang""".stripMargin

  /** Vocabulary-shift report between two corpus slices (doc_id parity
    * stands in for "yesterday's batch vs today's") — the drift check a
    * training pipeline runs before mixing a new ingestion batch: top-K
    * vocabulary overlap (Jaccard over the two top-100 term sets) and
    * each side's out-of-vocabulary token mass against the OTHER side's
    * top vocabulary, as exact ppm. A collapsing overlap or an OOV spike
    * means the tokenizer/vocab trained on the old corpus underfits the
    * new one. All counts and ratios are pure int64 — nothing floating
    * anywhere.
    *
    * Scale shape: one tokenize per side feeding a (term)-keyed partial
    * aggregation (persisted — each side's counts feed top-K, OOV mass,
    * and total mass); top-K via orderBy+limit = TakeOrderedAndProject
    * (per-partition top-k + K-row merge — never a vocab-wide sort on
    * one reducer); the ≤K-row top sets broadcast into the anti joins.
    * The report is one row.
    */
  val vocabShift: Q = (s, dir) =>
    vocabShiftOn(Tables(s, dir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")))

  /** [[vocabShift]] over an explicit (doc_id, text) frame — the gate
    * reads the corpus table; the scale stress feeds a replicated corpus
    * through the identical plan (uniform replication leaves every
    * report column except nothing — even the ppm columns — unchanged:
    * numerators and denominators scale together and integer `div` of
    * `(10a·10⁶) / (10b)` equals `(a·10⁶) / b` exactly).
    */
  private[graft] def vocabShiftOn(raw: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    val s = raw.sparkSession
    import s.implicits._
    val K = 100
    val docs = raw
    def counts(par: Int) = graft.CacheTracker.persistTracked(
      docs.filter($"doc_id" % 2 === par)
        .select(explode(tokens($"text")).as("term"))
        .groupBy($"term").agg(count(lit(1)).as("cnt")))
    val ca = counts(0)
    val cb = counts(1)
    def top(c: org.apache.spark.sql.DataFrame) =
      graft.CacheTracker.persistTracked(
        c.orderBy($"cnt".desc, $"term").limit(K).select($"term"))
    val ta = top(ca)
    val tb = top(cb)
    val ov = ta.join(tb, "term").agg(count(lit(1)).as("overlap"))
    val na = ta.agg(count(lit(1)).as("n_top_a"))
    val nb = tb.agg(count(lit(1)).as("n_top_b"))
    def oov(c: org.apache.spark.sql.DataFrame,
        other: org.apache.spark.sql.DataFrame, out: String) =
      c.join(broadcast(other), Seq("term"), "left_anti")
        .agg(coalesce(sum($"cnt"), lit(0L)).as(out))
    def tot(c: org.apache.spark.sql.DataFrame, out: String) =
      c.agg(sum($"cnt").as(out))
    ov.crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .crossJoin(broadcast(oov(ca, tb, "oov_a")))
      .crossJoin(broadcast(oov(cb, ta, "oov_b")))
      .crossJoin(broadcast(tot(ca, "tot_a")))
      .crossJoin(broadcast(tot(cb, "tot_b")))
      .select(lit(K).as("k"), $"n_top_a", $"n_top_b", $"overlap",
        expr("(overlap * 1000000) div (n_top_a + n_top_b - overlap)")
          .as("jaccard_ppm"),
        expr("(oov_a * 1000000) div tot_a").as("oov_a_ppm"),
        expr("(oov_b * 1000000) div tot_b").as("oov_b_ppm"))
  }

  val vocabShiftSql: String =
    s"""WITH tok AS MATERIALIZED (
       |  SELECT doc_id, unnest(${sqlTokens("text")}) AS term FROM documents),
       |ca AS MATERIALIZED (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok
       |  WHERE doc_id % 2 = 0 GROUP BY term),
       |cb AS MATERIALIZED (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok
       |  WHERE doc_id % 2 = 1 GROUP BY term),
       |ta AS MATERIALIZED (
       |  SELECT term FROM ca ORDER BY cnt DESC, term LIMIT 100),
       |tb AS MATERIALIZED (
       |  SELECT term FROM cb ORDER BY cnt DESC, term LIMIT 100),
       |ov AS (SELECT CAST(COUNT(*) AS BIGINT) AS overlap
       |       FROM ta JOIN tb USING (term)),
       |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_top_a FROM ta),
       |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_top_b FROM tb),
       |oa AS (SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS oov_a
       |       FROM ca WHERE term NOT IN (SELECT term FROM tb)),
       |ob AS (SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS oov_b
       |       FROM cb WHERE term NOT IN (SELECT term FROM ta)),
       |sa AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot_a FROM ca),
       |sb AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot_b FROM cb)
       |SELECT CAST(100 AS INTEGER) AS k, n_top_a, n_top_b, overlap,
       |  (overlap * 1000000) // (n_top_a + n_top_b - overlap) AS jaccard_ppm,
       |  (oov_a * 1000000) // tot_a AS oov_a_ppm,
       |  (oov_b * 1000000) // tot_b AS oov_b_ppm
       |FROM ov, na, nb, oa, ob, sa, sb""".stripMargin

  /** RAKE's stoplist is domain-tuned by design: generic English function
    * words plus this corpus' high-frequency low-content modifiers
    * (fast/slow/big/small run at full vocabulary frequency and carry no
    * topical signal — exactly what a practitioner prunes).
    */
  private val rakeStop = Seq("the", "a", "and", "of", "to", "in", "is",
    "on", "for", "with", "fast", "slow", "big", "small")

  /** RAKE keyword extraction (degree-scored) — the unsupervised
    * keyphrase pass a corpus-exploration pipeline runs before any
    * model: candidate phrases are maximal stopword-free token runs
    * (capped at 3 words, RAKE's standard cut), each word scores by its
    * corpus-wide DEGREE (Σ of the lengths of phrases containing it —
    * co-occurrence mass), and a phrase scores the sum of its words'
    * degrees. Degree is the integer-exact member of RAKE's metric
    * family (deg, freq, deg/freq), so no ratio ever nears the hash.
    *
    * Scale shape: posexplode is map-side; the island window and the
    * phrase group-by ride ONE shuffle keyed on doc_id (per-doc
    * partitions, reducer-bounded by doc length); word stats are
    * vocabulary-sized and broadcast back into the phrase scoring; the
    * report is a top-50 TakeOrderedAndProject with a total order.
    */
  val rakeKeywords: Q = (s, dir) => {
    import s.implicits._
    rakeOn(Tables(s, dir, "documents")
      .select($"doc_id", tokens($"text").as("toks")))
  }

  /** [[rakeKeywords]] over any (doc_id, toks) frame — split out so the
    * 10×-replication scale stress drives the same code.
    */
  private[graft] def rakeOn(
      docsToks: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val s = docsToks.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val pos = docsToks
      .select($"doc_id", posexplode($"toks").as(Seq("p", "t")))
    val ns = pos.filter(!$"t".isInCollection(rakeStop))
    val isl = ns.withColumn("g",
      $"p" - row_number().over(Window.partitionBy($"doc_id").orderBy($"p")))
    val ph = isl.groupBy($"doc_id", $"g")
      .agg(array_join(transform(array_sort(collect_list(struct($"p", $"t"))),
          x => x.getField("t")), " ").as("phrase"),
        count(lit(1)).as("len"))
    // read twice: word-degree stats and the distinct-phrase table
    val kept = graft.CacheTracker.persistTracked(
      ph.filter($"len" <= 3).select($"phrase", $"len"))
    val wstat = kept
      .select(explode(split($"phrase", " ")).as("w"), $"len")
      .groupBy($"w").agg(sum($"len").as("deg"))
    val pu = kept.groupBy($"phrase").agg(count(lit(1)).as("n_occ"))
    pu.select($"phrase", $"n_occ", explode(split($"phrase", " ")).as("w"))
      .join(wstat, "w")
      .groupBy($"phrase", $"n_occ").agg(sum($"deg").as("score"))
      .orderBy($"score".desc, $"phrase").limit(50)
  }

  val rakeKeywordsSql: String = {
    val stoplist = rakeStop.map(w => s"'$w'").mkString(", ")
    s"""WITH docs AS (
       |  SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents),
       |pos AS (
       |  SELECT doc_id, struct_extract(u, 'p') AS p,
       |    struct_extract(u, 't') AS t
       |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
       |        i -> {'p': i, 't': toks[i]})) AS u FROM docs)),
       |ns AS (SELECT * FROM pos WHERE t NOT IN ($stoplist)),
       |isl AS (
       |  SELECT doc_id, p, t,
       |    p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS g
       |  FROM ns),
       |ph AS (
       |  SELECT doc_id, g, array_to_string(list(t ORDER BY p), ' ') AS phrase,
       |    COUNT(*) AS len
       |  FROM isl GROUP BY doc_id, g),
       |kept AS (SELECT phrase, len FROM ph WHERE len <= 3),
       |wstat AS (
       |  SELECT w, CAST(SUM(len) AS BIGINT) AS deg
       |  FROM (SELECT unnest(string_split(phrase, ' ')) AS w, len FROM kept)
       |  GROUP BY w),
       |pu AS (SELECT phrase, COUNT(*) AS n_occ FROM kept GROUP BY phrase),
       |pw AS (
       |  SELECT phrase, n_occ, unnest(string_split(phrase, ' ')) AS w
       |  FROM pu)
       |SELECT pw.phrase, pw.n_occ, CAST(SUM(ws.deg) AS BIGINT) AS score
       |FROM pw JOIN wstat ws ON pw.w = ws.w
       |GROUP BY pw.phrase, pw.n_occ
       |ORDER BY score DESC, pw.phrase LIMIT 50""".stripMargin
  }

  /** Gopher-style intra-document repetition filters (Rae et al. 2021
    * §A1.1 — the repetition family of quality signals, the one
    * dimension `text_quality_score`'s length/punct/stopword ratios do
    * not cover): per document, (a) the fraction of "lines" that belong
    * to a duplicated line value, (b) the character mass of the single
    * most frequent word 2-gram, (c) the character mass of all word
    * 5-grams occurring twice or more. The corpus has no newlines, so
    * "line" is the fixed 10-token chunk every other line-based gate
    * uses; the corpus also has no natural repetition, so the gate
    * PLANTS it md5-deterministically (the drift-gate discipline): docs
    * in bucket < 20 get their first 10 tokens PREPENDED twice — two
    * identical leading lines, a surge of duplicated 2/5-grams — and
    * must come out 'filter' while the rest stay 'keep'.
    *
    * Everything the hash sees is an INTEGER (counts and char masses;
    * the thresholds are cross-multiplied, never divided) — the ratio
    * rule from CLAUDE.md. Char mass counts every occurrence
    * (Σ cnt·len(gram)), the standard practical approximation of
    * coverage; the metric is pinned by definition in both engines.
    *
    * Scale shape: scan-linear — tokenize once (repartitioned off the
    * one-file scan), three per-(doc, gram) aggregations whose keys are
    * bounded by document length, one broadcast-size join back per
    * metric. No pairs, no windows over the corpus.
    */
  val gopherRepetition: Q = (s, dir) => {
    import s.implicits._
    val b = graft.CacheTracker.persistTracked(
      Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", tokens($"text").as("t0"))
        .filter(size($"t0") >= 15)
        .withColumn("toks",
          when(graft.functions.KeyHash.bucket100("rep|", $"doc_id") < 20,
            concat(slice($"t0", 1, 10), slice($"t0", 1, 10), $"t0"))
            .otherwise($"t0"))
        .select($"doc_id", $"toks",
          length(array_join($"toks", " ")).cast("long").as("total_chars")))
    val lines = b.select($"doc_id",
      explode(expr("transform(sequence(0, (size(toks) div 10) - 1), " +
        "j -> array_join(slice(toks, j * 10 + 1, 10), ' '))")).as("line"))
    val lineStats = lines.groupBy($"doc_id", $"line")
      .agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_lines"),
        sum(when($"c" >= 2, $"c").otherwise(0L)).as("n_dup_lines"))
    def grams(n: Int) = b.select($"doc_id",
      explode(expr(s"transform(sequence(1, size(toks) - ${n - 1}), " +
        s"i -> array_join(slice(toks, i, $n), ' '))")).as("g"))
    val top2 = grams(2).groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"c".desc, $"g")))
      .filter($"rk" === 1)
      .select($"doc_id", (length($"g").cast("long") * $"c").as("top2_chars"))
    val dup5 = grams(5).groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
      .filter($"c" >= 2)
      .groupBy($"doc_id")
      .agg(sum(length($"g").cast("long") * $"c").as("dup5_chars"))
    b.select($"doc_id", $"total_chars")
      .join(lineStats, "doc_id")
      .join(top2, "doc_id")
      .join(dup5, Seq("doc_id"), "left")
      .withColumn("dup5_chars", coalesce($"dup5_chars", lit(0L)))
      .select($"doc_id", $"n_lines", $"n_dup_lines", $"total_chars",
        $"top2_chars", $"dup5_chars",
        when($"n_dup_lines" * 100 > $"n_lines" * 30 ||
          $"top2_chars" * 100 > $"total_chars" * 20 ||
          $"dup5_chars" * 100 > $"total_chars" * 15, lit("filter"))
          .otherwise(lit("keep")).as("verdict"))
      .orderBy($"doc_id")
  }

  val gopherRepetitionSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, ${sqlTokens("text")} AS t0 FROM documents),
       |base AS (
       |  SELECT doc_id,
       |    CASE WHEN ${graft.functions.KeyHash.sqlBucket100("rep|", "doc_id")} < 20
       |      THEN list_cat(list_cat(t0[1:10], t0[1:10]), t0)
       |      ELSE t0 END AS toks
       |  FROM docs WHERE len(t0) >= 15),
       |bb AS MATERIALIZED (
       |  SELECT doc_id, toks,
       |    CAST(length(array_to_string(toks, ' ')) AS BIGINT) AS total_chars
       |  FROM base),
       |lines AS (
       |  SELECT doc_id, array_to_string(
       |      list_slice(toks, j * 10 + 1, j * 10 + 10), ' ') AS line
       |  FROM (SELECT doc_id, toks,
       |          unnest(range(0, CAST(len(toks) // 10 AS BIGINT))) AS j
       |        FROM bb)),
       |lc AS (SELECT doc_id, line, COUNT(*) AS c FROM lines GROUP BY 1, 2),
       |lstats AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_lines,
       |    CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
       |      AS n_dup_lines
       |  FROM lc GROUP BY 1),
       |g2 AS (
       |  SELECT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS g
       |  FROM (SELECT doc_id, toks,
       |          unnest(range(1, CAST(len(toks) AS BIGINT))) AS i FROM bb)),
       |g2c AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
       |top2 AS (
       |  SELECT doc_id, CAST(length(g) * c AS BIGINT) AS top2_chars
       |  FROM (SELECT doc_id, g, c, row_number() OVER (
       |          PARTITION BY doc_id ORDER BY c DESC, g) AS rk FROM g2c)
       |  WHERE rk = 1),
       |g5 AS (
       |  SELECT doc_id, array_to_string(list_slice(toks, i, i + 4), ' ') AS g
       |  FROM (SELECT doc_id, toks,
       |          unnest(range(1, CAST(len(toks) - 3 AS BIGINT))) AS i FROM bb)),
       |g5c AS (SELECT doc_id, g, COUNT(*) AS c FROM g5 GROUP BY 1, 2),
       |dup5 AS (
       |  SELECT doc_id, CAST(SUM(length(g) * c) AS BIGINT) AS dup5_chars
       |  FROM g5c WHERE c >= 2 GROUP BY 1)
       |SELECT b.doc_id, l.n_lines, l.n_dup_lines, b.total_chars,
       |  t.top2_chars, COALESCE(d.dup5_chars, 0) AS dup5_chars,
       |  CASE WHEN l.n_dup_lines * 100 > l.n_lines * 30
       |         OR t.top2_chars * 100 > b.total_chars * 20
       |         OR COALESCE(d.dup5_chars, 0) * 100 > b.total_chars * 15
       |       THEN 'filter' ELSE 'keep' END AS verdict
       |FROM bb b JOIN lstats l USING (doc_id) JOIN top2 t USING (doc_id)
       |LEFT JOIN dup5 d USING (doc_id)
       |ORDER BY b.doc_id""".stripMargin

  /** Kneser-Ney smoothed bigram probabilities (absolute discount
    * D = 3/4, the interpolated form of Kneser & Ney 1995) — the
    * standard n-gram LM smoothing whose continuation counts are the
    * piece every naive add-one LM gets wrong. For context u and word w:
    *
    *   p(w|u) = max(c(u,w) − D, 0)/c(u)
    *          + (D·N1+(u,·)/c(u)) · (N1+(·,w)/N)
    *
    * with N1+(u,·) = distinct continuations of u, N1+(·,w) = distinct
    * left-contexts of w, N = distinct bigram types. D = 3/4 makes the
    * probability an EXACT RATIONAL: multiplying through by 4·c(u)·N
    * gives num = max(4·c(u,w) − 3, 0)·N + 3·N1+(u,·)·N1+(·,w) and
    * den = 4·c(u)·N — all int64 (headroom: counts ≤ ~1e5 and N ≤ ~1e6
    * keep num/den ≤ ~4e11), so the gate emits the exact (num, den)
    * pair and no float ever nears the hash (the house ratio-statistics
    * rule). Output: top-3 continuations per context for the 20 most
    * frequent contexts; within one u the denominator is constant, so
    * ranking by num IS ranking by probability.
    *
    * Scale shape: one shuffle to bigram counts, vocabulary-sized
    * aggregates for the continuation counts, the global top-20 via
    * orderBy+limit (TakeOrderedAndProject — never a corpus on one
    * reducer), then a broadcast semi-join back; the per-u rank window
    * covers only the 20 survivors' continuation lists.
    */
  val kneserNeyBigram: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val tr = Tables(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select(tokensOnce($"text").as("toks"))
      .filter(size($"toks") >= 2)
    val bg = graft.CacheTracker.persistTracked(
      tr.select(explode(transform(sequence(lit(1), size($"toks") - 1),
          i => struct(element_at($"toks", i).as("u"),
            element_at($"toks", i + 1).as("w")))).as("b"))
        .groupBy($"b.u".as("u"), $"b.w".as("w"))
        .agg(count(lit(1)).as("cuw")))
    val cu = bg.groupBy($"u")
      .agg(sum($"cuw").as("cu"), count(lit(1)).as("n1u"))
    val n1w = bg.groupBy($"w").agg(count(lit(1)).as("n1w"))
    val nn = broadcast(bg.agg(count(lit(1)).as("nn")))
    val topU = broadcast(cu.orderBy($"cu".desc, $"u").limit(20))
    val scored = bg.join(topU, "u")
      .join(n1w, "w")
      .crossJoin(nn)
      .select($"u", $"w", $"cuw",
        (greatest(lit(4L) * $"cuw" - 3L, lit(0L)) * $"nn" +
          lit(3L) * $"n1u" * $"n1w").as("num"),
        (lit(4L) * $"cu" * $"nn").as("den"))
    val wR = Window.partitionBy($"u").orderBy($"num".desc, $"w")
    scored.withColumn("rk", row_number().over(wR))
      .filter($"rk" <= 3)
      .select($"u", $"w", $"cuw", $"num", $"den", $"rk")
      .orderBy($"u", $"rk")
  }

  val kneserNeyBigramSql: String =
    s"""WITH base AS (
       |  SELECT ${sqlTokens("text")} AS toks FROM documents),
       |tr AS (SELECT * FROM base WHERE len(toks) >= 2),
       |trbg AS (
       |  SELECT unnest(list_transform(range(1, len(toks)),
       |    i -> toks[i] || ' ' || toks[i + 1])) AS bgs
       |  FROM tr),
       |bg AS (
       |  SELECT string_split(bgs, ' ')[1] AS u, string_split(bgs, ' ')[2] AS w,
       |    COUNT(*) AS cuw
       |  FROM trbg GROUP BY 1, 2),
       |cu AS (SELECT u, CAST(SUM(cuw) AS BIGINT) AS cu, COUNT(*) AS n1u
       |       FROM bg GROUP BY u),
       |n1w AS (SELECT w, COUNT(*) AS n1w FROM bg GROUP BY w),
       |nn AS (SELECT COUNT(*) AS nn FROM bg),
       |topu AS (SELECT u, cu, n1u FROM cu ORDER BY cu DESC, u LIMIT 20),
       |scored AS (
       |  SELECT b.u, b.w, b.cuw,
       |    GREATEST(4 * b.cuw - 3, 0) * n.nn + 3 * t.n1u * w2.n1w AS num,
       |    4 * t.cu * n.nn AS den
       |  FROM bg b JOIN topu t USING (u) JOIN n1w w2 USING (w)
       |  CROSS JOIN nn n),
       |r AS (SELECT *, CAST(row_number() OVER (
       |    PARTITION BY u ORDER BY num DESC, w) AS INT) AS rk FROM scored)
       |SELECT u, w, cuw, num, den, rk FROM r WHERE rk <= 3
       |ORDER BY u, rk""".stripMargin

  /** Exact multi-token PHRASE search — the positional-inverted-index
    * primitive (Zobel & Moffat 2006 §4's phrase-query evaluation) the
    * surface's BM25 bag-of-words gate cannot express: a phrase matches
    * at start position p0 iff token p0+j equals phrase term j for ALL j.
    * Query phrases are 3-token passages lifted from a hash-selected ~2%
    * of docs (positions 10–12), so every phrase has a known source
    * occurrence plus whatever organic repeats the corpus carries.
    *
    * Spark shape (the r12 query-anchored discipline + the substring-span
    * diagonal trick): the phrase-term table is query-sized and
    * BROADCAST; the corpus token stream semi-joins it BEFORE any
    * aggregation — only tokens that appear in some phrase survive the
    * scan, so the full corpus vocabulary never shuffles. A surviving
    * (doc, p, term) hit aligned to phrase term j votes for start
    * p − j; a start with all 3 distinct j votes IS a match (the
    * diagonal-alignment grouping — no per-term self-join chain, one
    * shuffle keyed (doc, phrase, start) regardless of phrase length).
    */
  val phraseSearch: Q = (s, dir) => {
    import s.implicits._
    // r16: persist the tokenized corpus — the phrase-lift branch and the
    // token-stream branch both read it, and without the cache each rep
    // ran the normText regex + split over every doc TWICE (tokenize was
    // the measured bulk of the gate's 29 CPU-s).
    val base = graft.CacheTracker.persistTracked(
      Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", tokens($"text").as("toks")))
    val phrases = base
      .filter(graft.functions.KeyHash.bucket100("phrase|", $"doc_id") < 2 &&
        size($"toks") >= 20)
      .select(slice($"toks", 10, 3).as("pt")).distinct()
    val terms = phrases.select(array_join($"pt", " ").as("phrase"),
      posexplode($"pt")).toDF("phrase", "j", "term")
    val toks = base.select($"doc_id", posexplode($"toks").as(Seq("p", "term")))
    // all-3-j's-present via a j-bitmask (j ∈ {0,1,2}, and (doc, phrase,
    // start, j) is unique since p = start + j): bit_or(1 << j) == 7 is
    // value-identical to count_distinct(j) == 3 but a single-pass
    // aggregate — no distinct-aggregation Expand on the hit stream
    toks.join(broadcast(terms), "term")
      .groupBy($"doc_id", $"phrase", ($"p" - $"j").as("start"))
      .agg(bit_or(expr("shiftleft(1, j)")).as("jmask"))
      .filter($"jmask" === 7)
      .groupBy($"phrase", $"doc_id")
      .agg(count(lit(1)).as("n_occ"), min($"start").as("first_pos"))
      .orderBy($"phrase", $"doc_id")
  }

  val phraseSearchSql: String = {
    val b = graft.functions.KeyHash.sqlBucket100("phrase|", "doc_id")
    s"""WITH docs AS (
       |  SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents),
       |ph AS (
       |  SELECT DISTINCT list_slice(toks, 10, 12) AS pt
       |  FROM docs WHERE $b < 2 AND len(toks) >= 20),
       |terms AS (
       |  SELECT array_to_string(pt, ' ') AS phrase, j, pt[j + 1] AS term
       |  FROM ph CROSS JOIN range(0, 3) t(j)),
       |toks AS (
       |  SELECT doc_id, struct_extract(u, 'p') AS p,
       |    struct_extract(u, 't') AS term
       |  FROM (SELECT doc_id,
       |          unnest(list_transform(range(1, len(toks) + 1),
       |            i -> {'p': i - 1, 't': toks[i]})) AS u
       |        FROM docs)),
       |starts AS (
       |  SELECT doc_id, phrase, p - j AS start
       |  FROM toks JOIN terms USING (term)
       |  GROUP BY doc_id, phrase, p - j
       |  HAVING COUNT(DISTINCT j) = 3)
       |SELECT phrase, doc_id, COUNT(*) AS n_occ,
       |  CAST(MIN(start) AS INTEGER) AS first_pos
       |FROM starts GROUP BY phrase, doc_id
       |ORDER BY phrase, doc_id""".stripMargin
  }

  val all: Map[String, (Q, Option[String])] = Map(
    "text_phrase_search" -> (phraseSearch, Some(phraseSearchSql)),
    "text_kneser_ney_bigram" -> (kneserNeyBigram, Some(kneserNeyBigramSql)),
    "text_gopher_repetition" ->
      (gopherRepetition, Some(gopherRepetitionSql)),
    "text_winnowing_fingerprint" ->
      (winnowingFingerprint, Some(winnowingFingerprintSql)),
    "text_rake_keywords" -> (rakeKeywords, Some(rakeKeywordsSql)),
    "text_vocab_shift" -> (vocabShift, Some(vocabShiftSql)),
    "curate_dataset_card" -> (datasetCard, Some(datasetCardSql)),
    "text_bm25_topk" -> (bm25Topk, Some(bm25TopkSql)),
    "graph_term_cooccurrence" -> (cooccurrence, Some(cooccurrenceSql)),
    "text_line_dedup" -> (lineDedup, Some(lineDedupSql)),
    "text_heavy_hitters" -> (heavyHitters, Some(heavyHittersSql)),
    "text_lm_perplexity" -> (lmPerplexity, Some(lmPerplexitySql)),
    "text_perplexity_buckets" ->
      (perplexityBuckets, Some(perplexityBucketsSql)),
    "text_chunk_windows" -> (chunkWindows, Some(chunkWindowsSql)),
    "text_repetition_quality" -> (repetitionQuality, Some(repetitionQualitySql)),
    "text_token_stats" -> (tokenStats, Some(tokenStatsSql)),
    "text_tfidf_top" -> (tfidfTop, Some(tfidfTopSql)),
    "text_top_terms" -> (topTerms, Some(topTermsSql)),
    "text_rolling_fingerprint" -> (rollingFingerprint, Some(rollingFingerprintSql)),
    "text_quality_score" -> (qualityScore, Some(qualityScoreSql)),
    "text_lang_id" -> (langId, Some(langIdSql)),
    "text_fingerprint_dedup" -> (fingerprintDedup, Some(fingerprintDedupSql))
  )
}
