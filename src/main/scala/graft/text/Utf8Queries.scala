package graft.text

import org.apache.spark.sql.functions._

import graft.Queries
import TextAnalysis._

/** Non-ASCII correctness gates for the text surface: every other text
  * gate runs on the all-ASCII `documents` corpus, so nothing proved the
  * tokenizer / fingerprint / lang-id mirrors agree across engines on
  * CJK, diacritics, Cyrillic, Greek, or emoji — the assumption a
  * multilingual 100 TB dedup pipeline rests on. The fixture is ONE
  * in-code literal corpus rendered to both dialects (Spark DataFrame +
  * SQL VALUES), so the gate is pure cross-engine string semantics: no
  * files, no staging, nothing to drift.
  *
  * Traps measured while building it (avoid in any fixture extension):
  *   - Java lowercasing is FULL Unicode casing (contextual): trailing
  *     'Σ' → final sigma 'ς', 'İ' → "i"+combining dot; DuckDB's
  *     utf8proc does SIMPLE 1:1 mapping ('Σ' → 'σ', 'İ' → 'i').
  *     1:1-safe cases (Latin diacritics, Cyrillic, non-final Greek,
  *     CJK pass-through, ß) are engine-identical — those are covered.
  *   - Java upper() maps 'ß' → "SS" (length change); utf8proc does not
  *     — the dedup mutation here only varies whitespace, never case;
  *     case-variant dedup is covered by the É/é doc pair instead.
  *   - `\s` is ASCII-only in BOTH Java and RE2 (U+3000 matches neither)
  *     and `length()` counts code points in both — so multi-code-point
  *     grapheme clusters are SAFE for every shape gated here (rows
  *     13-15): both engines count 👩‍💻 as 3 code points, 🇺🇸 as 2,
  *     👋🏽 as 2, 👨‍👩‍👧‍👦 as 7, and the whitespace tokenizer keeps each
  *     cluster one opaque token (ZWJ U+200D and regional indicators
  *     are not `\s`). Grapheme SEGMENTATION — user-perceived character
  *     counts, where DuckDB's `length_grapheme` returns 1 for each of
  *     the above — had no Spark-side mirror (Spark ships no grapheme
  *     function) until the native [[graft.functions.GraphemeCount]]
  *     expression closed it (r10): JDK `\X` and utf8proc both
  *     implement UAX #29 extended clusters and probe-agree on every
  *     shape here including conjuncts; `text_utf8_grapheme_stats`
  *     gates it. Queries not wanting cluster semantics still pick the
  *     code-point convention explicitly, as n_chars_norm does.
  */
object Utf8Queries {
  import Queries.Q

  /** (doc_id, text, lang): spaced CJK (tokenizable), unspaced CJK (one
    * opaque token), Latin diacritics incl. a case/whitespace duplicate
    * pair, Cyrillic, Greek, Hangul, emoji, and mixed-script rows.
    */
  val docs: Seq[(Long, String, String)] = Seq(
    (1L, "的 是 了 在 我 有 和 机器 学习 模型", "zh"),
    (2L, "机器学习模型训练数据没有空格", "zh"),
    (3L, "der Müller übt während die Straße naß ist und nicht ein", "de"),
    (4L, "le café est très chaud et les élèves étudient un été", "fr"),
    (5L, "el niño y la niña de España que los jóvenes una mañana", "es"),
    (6L, "the quick brown fox 😀 jumps over a lazy dog and the fox is happy", "en"),
    (7L, "the 模型 is trained auf Deutsch et en français 🚀", "en"),
    (8L, "Élève Déjà  Vu   Café", "fr"),
    (9L, "élève déjà vu café", "fr"),
    (10L, "το μοντέλο обучение данных μάθηση", "el"),
    (11L, "データ の 処理 と 学習 모델 학습", "ja"),
    (12L, "😀 🎉 🚀 ✨", "und"),
    // grapheme clusters: ZWJ profession (3 cp), ZWJ family (7 cp),
    // skin-tone modifier (2 cp), regional-indicator flags (2 cp each)
    (13L, "the 👩‍💻 and the 👨‍👩‍👧‍👦 wave 👋🏽 at a dog", "en"),
    (14L, "🇺🇸 🇫🇷 🇯🇵", "und"))

  private def fixture(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    // these queries never touch Tables(), the usual registration choke
    // point, so make sure the native expressions resolve (guarded)
    graft.functions.Registry.registerAll(s)
    docs.toDF("doc_id", "text", "lang")
  }

  /** Rows as a DuckDB VALUES CTE. Single quotes are doubled so a future
    * fixture row with an apostrophe (l'élève, don't) renders valid SQL
    * instead of silently breaking the oracle.
    */
  private def valuesCte(name: String, rows: Seq[(Long, String, String)]): String =
    s"$name(doc_id, text, lang) AS (VALUES\n    " +
      rows.map { case (i, t, l) =>
        s"(CAST($i AS BIGINT), '${t.replace("'", "''")}', '$l')"
      }.mkString(",\n    ") + ")"

  private val sqlFixture: String = valuesCte("utf8_docs", docs)

  /** The fixture CTE for other modules' oracles (the SQL-parity gate
    * reuses this corpus to prove the native functions under the parser).
    */
  private[graft] def sqlDocsCte: String = sqlFixture

  /** [[TextQueries.tokenStats]] shape over the UTF-8 fixture, plus the
    * md5 content fingerprint — proving normalization, both tokenizers,
    * code-point length, and the fingerprint agree beyond ASCII.
    */
  val utf8TokenStats: Q = (s, _) => {
    import s.implicits._
    val norm = normText($"text")
    fixture(s).select(
      $"doc_id",
      nTokens($"text").as("n_tokens"),
      nUniqTokens($"text").as("n_uniq_tokens"),
      nBpeTokens($"text").as("n_bpe_tokens"),
      length(norm).as("n_chars_norm"),
      fingerprint($"text").as("fp"))
      .orderBy($"doc_id")
  }

  val utf8TokenStatsSql: String =
    s"""WITH $sqlFixture
       |SELECT doc_id,
       |  ${sqlNTokens("text")} AS n_tokens,
       |  ${sqlNUniqTokens("text")} AS n_uniq_tokens,
       |  ${sqlNBpeTokens("text")} AS n_bpe_tokens,
       |  CAST(length(${sqlNormText("text")}) AS INT) AS n_chars_norm,
       |  ${sqlFingerprint("text")} AS fp
       |FROM utf8_docs ORDER BY doc_id""".stripMargin

  /** [[TextQueries.langId]] shape over the UTF-8 fixture: per-language
    * stopword hits (token membership — the reason `\b` was banned) and
    * the argmax, including the zh inventory's CJK tokens. Unspaced CJK
    * rows are single opaque tokens and must predict 'und' in BOTH
    * engines — that agreement is the point, not the prediction.
    */
  val utf8LangId: Q = (s, _) => {
    import s.implicits._
    val toked = fixture(s)
      .select($"doc_id", $"lang", explode(array(tokens($"text"))).as("toks"))
    val scored = toked
      .select($"doc_id", $"lang",
        explode(array(struct(langScoresFrom($"toks").map {
          case (l, c) => c.as(s"hits_$l")
        }: _*))).as("h"))
    val hitCols = langStopwords.map { case (l, _) => l -> col(s"h.hits_$l") }
    scored
      .select(($"doc_id" +: $"lang" +:
        hitCols.map { case (l, c) => c.as(s"hits_$l") } :+
        langBestFromScores(hitCols).as("lang_pred")): _*)
      .withColumn("agrees", ($"lang" === $"lang_pred").cast("int"))
      .orderBy($"doc_id")
  }

  val utf8LangIdSql: String = {
    val scored = langStopwords.map { case (l, _) =>
      s"${sqlWordHits("text", langStopwords.toMap.apply(l))} AS hits_$l"
    }.mkString(",\n  ")
    s"""WITH $sqlFixture
       |SELECT doc_id, lang,
       |  $scored,
       |  ${sqlLangBest("text")} AS lang_pred,
       |  CAST(lang = ${sqlLangBest("text")} AS INT) AS agrees
       |FROM utf8_docs ORDER BY doc_id""".stripMargin
  }

  /** [[TextQueries.fingerprintDedup]] shape over the UTF-8 fixture: the
    * corpus doubled with whitespace-mutated copies (leading/trailing/
    * internal runs — never case, see the ß trap above), collapsed by
    * md5(normalized text). The É/é pair (docs 8/9) additionally proves
    * Unicode case-folding dedup: they fingerprint identically, so their
    * group carries 4 copies and canonical doc_id 8.
    */
  val utf8FingerprintDedup: Q = (s, _) => {
    import s.implicits._
    val base = fixture(s).select($"doc_id", $"text")
    val mutated = base.select(($"doc_id" + 100L).as("doc_id"),
      concat(lit("  "), $"text", lit("\t \t")).as("text"))
    base.unionByName(mutated)
      .groupBy(fingerprint($"text").as("fp"))
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("canonical_id"))
      .orderBy($"fp")
  }

  val utf8FingerprintDedupSql: String =
    s"""WITH $sqlFixture,
       |all_docs AS (
       |  SELECT doc_id, text FROM utf8_docs
       |  UNION ALL
       |  SELECT doc_id + 100, '  ' || text || chr(9) || ' ' || chr(9)
       |  FROM utf8_docs)
       |SELECT ${sqlFingerprint("text")} AS fp,
       |  COUNT(*) AS n_copies, MIN(doc_id) AS canonical_id
       |FROM all_docs GROUP BY 1 ORDER BY fp""".stripMargin

  /** [[TextQueries.rollingFingerprint]] shape over the UTF-8 fixture:
    * the native `rolling_hash64` folds UTF-8 BYTES while the SQL mirror
    * folds code points — they agree only on ASCII, which is why the
    * query ASCII-projects first. This gate proves the PROJECTION ITSELF
    * (Java vs RE2 `[^ -~]` on CJK/emoji input, and the hash on what
    * survives — including rows projected to all-spaces or empty) is
    * engine-exact, closing the loop the all-ASCII corpus left open.
    */
  val utf8RollingFingerprint: Q = (s, _) => {
    import s.implicits._
    fixture(s)
      .select($"doc_id",
        regexp_replace(normText($"text"), "[^ -~]", "").as("norm"))
      .select($"doc_id", expr("rolling_hash64(norm)").as("fp64"))
      .withColumn("shard", ($"fp64" % 64).cast("int"))
      .orderBy($"doc_id")
  }

  val utf8RollingFingerprintSql: String = {
    val h = graft.functions.RollingHash64.sql("norm")
    s"""WITH $sqlFixture,
       |n AS (SELECT doc_id,
       |  regexp_replace(${sqlNormText("text")}, '[^ -~]', '', 'g') AS norm
       |  FROM utf8_docs)
       |SELECT doc_id, $h AS fp64, CAST($h % 64 AS INT) AS shard
       |FROM n ORDER BY doc_id""".stripMargin
  }

  /** NFC-equivalence stress rows (kept OUT of [[docs]] so the other
    * utf8 gates' outputs don't churn), written as \\u escapes because
    * composed-vs-decomposed source literals are visually identical.
    * Each group is one NFC equivalence class with byte-distinct
    * members — the dedup class a raw fingerprint misses:
    *   - 201/202: é composed (U+00E9) vs e + COMBINING ACUTE;
    *   - 203/204/205: Å letter vs A + RING vs ANGSTROM SIGN (singleton
    *     decomposition);
    *   - 206/207: precomposed Hangul syllable vs conjoining jamo;
    *   - 208/209/210: ṩ fully composed vs two mark ORDERINGS of
    *     s + dot-below + dot-above (canonical reordering);
    *   - 211/212: DEVANAGARI QA — a composition EXCLUSION: NFC leaves
    *     both as the decomposed pair, so they unify downward;
    *   - 213/214: full composed vs fully decomposed French sentence;
    *   - 215: SMP emoji pass-through (its own singleton class).
    * Yezidi multi-mark clusters (U+10EAB/U+10EAC) are deliberately
    * absent — the one probe-measured Java/utf8proc divergence (see
    * [[graft.functions.NfcNormalize]]).
    */
  private val nfcDocs: Seq[(Long, String, String)] = Seq(
    (201L, "caf\u00e9", "composed"),
    (202L, "cafe\u0301", "decomposed"),
    (203L, "\u00c5ngstr\u00f6m", "composed"),
    (204L, "A\u030angstro\u0308m", "decomposed"),
    (205L, "\u212bngstr\u00f6m", "angstrom-sign"),
    (206L, "\uac01 \ud55c\uae00", "hangul-composed"),
    (207L, "\u1100\u1161\u11a8 \u1112\u1161\u11ab\u1100\u1173\u11af", "hangul-jamo"),
    (208L, "\u1e69", "composed"),
    (209L, "s\u0323\u0307", "marks-below-first"),
    (210L, "\u1e61\u0323", "marks-above-first"),
    (211L, "\u0958", "qa-precomposed"),
    (212L, "\u0915\u093c", "qa-decomposed"),
    (213L, "r\u00e9sum\u00e9 d\u00e9j\u00e0 vu", "composed"),
    (214L, "re\u0301sume\u0301 de\u0301ja\u0300 vu", "decomposed"),
    (215L, "\ud83d\ude00 ok", "emoji"))

  /** NFC-equivalence dedup: md5 over [[graft.functions.NfcNormalize]]
    * output groups composed/decomposed/reordered renderings of the same
    * text into one class (n_raw_forms counts the byte-distinct members a
    * raw fingerprint would have kept as separate "documents"), while the
    * ASCII/CJK base corpus passes through as singleton classes. This is
    * the canonicalization step that runs BEFORE any exact-dedup
    * fingerprint in a multilingual pipeline — macOS-origin uploads (NFD)
    * and web content (NFC) otherwise never collide. Map-only per row +
    * one hash-keyed aggregation: the [[graft.text.DedupQueries]] exact
    * template, scan-local at any scale.
    */
  val utf8NfcDedup: Q = (s, _) => {
    import s.implicits._
    val rows = fixture(s).select($"doc_id", $"text")
      .unionByName((nfcDocs.toDF("doc_id", "text", "lang"))
        .select($"doc_id", $"text"))
    rows
      .groupBy(md5(expr("nfc_normalize(text)")).as("nfc_fp"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(md5($"text")).as("n_raw_forms"),
        min($"doc_id").as("canonical_id"))
      .orderBy($"nfc_fp")
  }

  val utf8NfcDedupSql: String =
    s"""WITH $sqlFixture,
       |${valuesCte("nfc_docs", nfcDocs)},
       |all_docs AS (
       |  SELECT doc_id, text FROM utf8_docs
       |  UNION ALL SELECT doc_id, text FROM nfc_docs)
       |SELECT md5(nfc_normalize(text)) AS nfc_fp,
       |  COUNT(*) AS n_copies,
       |  COUNT(DISTINCT md5(text)) AS n_raw_forms,
       |  MIN(doc_id) AS canonical_id
       |FROM all_docs GROUP BY 1 ORDER BY nfc_fp""".stripMargin

  /** Extra segmentation-stress rows the grapheme gate appends to the
    * shared fixture (kept OUT of [[docs]] so the other utf8 gates'
    * outputs don't churn): Devanagari virama conjuncts, NFD combining
    * marks, conjoining-jamo Hangul next to precomposed syllables.
    */
  private val graphemeExtra: Seq[(Long, String, String)] = Seq(
    (15L, "क्षेत्र की कक्षा में विद्यार्थी", "hi"),
    (16L, "café déjà vu résumé", "fr"),
    (17L, "각 한글 가냐 텍스트", "ko"))

  /** User-perceived character stats — the "characters as a user sees
    * them" surface that was the last documented un-mirrorable text hole
    * (see the object Scaladoc): the native `grapheme_count` expression
    * (JDK `\X`, UAX #29 extended clusters) against DuckDB's
    * `length_grapheme` (utf8proc), over the fixture plus dedicated
    * conjunct/NFD/jamo stress rows. `n_cp − n_graphemes` is the
    * cluster excess (0 for ASCII/NFC-precomposed rows, positive
    * wherever multi-code-point clusters appear), integer-only end to
    * end so the hash has no float anywhere.
    */
  val utf8GraphemeStats: Q = (s, _) => {
    import s.implicits._
    graft.functions.Registry.registerAll(s)
    val rows = (docs ++ graphemeExtra).toDF("doc_id", "text", "lang")
    rows.select(
      $"doc_id",
      length($"text").as("n_cp"),
      expr("grapheme_count(text)").as("n_graphemes"),
      (length($"text") - expr("grapheme_count(text)")).as("cluster_excess"),
      (length($"text") =!= expr("grapheme_count(text)")).cast("int")
        .as("has_clusters"))
      .orderBy($"doc_id")
  }

  val utf8GraphemeStatsSql: String = {
    val g = graft.functions.GraphemeCount.sql("text")
    s"""WITH ${valuesCte("grapheme_docs", docs ++ graphemeExtra)}
       |SELECT doc_id,
       |  CAST(length(text) AS INTEGER) AS n_cp,
       |  $g AS n_graphemes,
       |  CAST(length(text) AS INTEGER) - $g AS cluster_excess,
       |  CAST(length(text) <> length_grapheme(text) AS INT) AS has_clusters
       |FROM grapheme_docs ORDER BY doc_id""".stripMargin
  }

  /** Unicode-script classes as inclusive code-point ranges — ONE Scala
    * definition rendered to both dialects, so the classification cannot
    * drift between engines. Letter classes first (the dominant-script
    * candidates, in the fixed tie-break priority the CASE chains use),
    * then digits and emoji/symbols; anything unmatched (ASCII punct,
    * whitespace, combining marks) counts as other. Ranges are disjoint;
    * the Latin block excludes × (U+00D7) and ÷ (U+00F7).
    */
  private val letterClasses: Seq[(String, Seq[(Int, Int)])] = Seq(
    "latin" -> Seq((0x41, 0x5A), (0x61, 0x7A), (0xC0, 0xD6), (0xD8, 0xF6),
      (0xF8, 0x24F)),
    "cyrillic" -> Seq((0x400, 0x4FF)),
    "greek" -> Seq((0x370, 0x3FF), (0x1F00, 0x1FFF)),
    "devanagari" -> Seq((0x900, 0x97F)),
    "hangul" -> Seq((0x1100, 0x11FF), (0x3130, 0x318F), (0xAC00, 0xD7AF)),
    "kana" -> Seq((0x3040, 0x309F), (0x30A0, 0x30FF)),
    "cjk" -> Seq((0x3400, 0x4DBF), (0x4E00, 0x9FFF)))

  private val otherClasses: Seq[(String, Seq[(Int, Int)])] = Seq(
    "digit" -> Seq((0x30, 0x39)),
    "emoji" -> Seq((0x200D, 0x200D), (0x2600, 0x27BF), (0xFE00, 0xFE0F),
      (0x1F000, 0x1FAFF)))

  private def rangePred(c: org.apache.spark.sql.Column,
                        ranges: Seq[(Int, Int)]): org.apache.spark.sql.Column =
    ranges.map { case (a, b) => c >= lit(a) && c <= lit(b) }.reduce(_ || _)

  private def sqlRangePred(c: String, ranges: Seq[(Int, Int)]): String =
    ranges.map { case (a, b) => s"($c >= $a AND $c <= $b)" }.mkString(" OR ")

  /** Script-mix report — the multilingual-curation heuristic that
    * catches mixed-script spam, mojibake, and wrong-language routing
    * before any model sees the text: per document, the code-point count
    * per Unicode script class, the dominant letter script (max count,
    * ties broken by the fixed class order), how many letter scripts
    * appear, and a mixed-script flag. Rides the native `codepoints`
    * expression (surrogate-safe — `split(s, '')` would halve every
    * emoji) behind the tokenize-once Generate barrier so the array is
    * built once per row; classification is pure integer-range HOF
    * arithmetic after that, scan-local with no shuffle — a map-only op
    * at any corpus size.
    */
  val utf8ScriptMix: Q = (s, _) => {
    import s.implicits._
    graft.functions.Registry.registerAll(s)
    val classes = letterClasses ++ otherClasses
    val counted = (docs ++ graphemeExtra).toDF("doc_id", "text", "lang")
      .select($"doc_id",
        explode(array(expr("codepoints(text)"))).as("cps"))
      .select(($"doc_id" +: size($"cps").as("n_cp") +:
        classes.map { case (name, rs) =>
          size(filter($"cps", c => rangePred(c, rs))).as(s"n_$name")
        }): _*)
    val letters = letterClasses.map { case (n, _) => col(s"n_$n") }
    val nLetter = letters.reduce(_ + _).as("n_letter")
    val nScripts = letters.map(c => (c > 0).cast("int")).reduce(_ + _)
    val m = greatest(letters: _*)
    val dominant = letterClasses.foldRight(lit("none")) {
      case ((name, _), rest) =>
        when(col(s"n_$name") === m, lit(name)).otherwise(rest)
    }
    counted
      .withColumn("n_other",
        $"n_cp" - (letters ++ otherClasses.map { case (n, _) => col(s"n_$n") })
          .reduce(_ + _))
      .withColumn("n_letter", nLetter)
      .withColumn("n_scripts", nScripts)
      .withColumn("dominant_script",
        when($"n_letter" === 0, lit("none")).otherwise(dominant))
      .withColumn("mixed_script", ($"n_scripts" >= 2).cast("int"))
      .orderBy($"doc_id")
  }

  val utf8ScriptMixSql: String = {
    val classes = letterClasses ++ otherClasses
    val cnt = classes.map { case (name, rs) =>
      s"CAST(len(list_filter(cps, c -> ${sqlRangePred("c", rs)})) AS INTEGER) AS n_$name"
    }.mkString(",\n    ")
    val letters = letterClasses.map { case (n, _) => s"n_$n" }
    val sumLetters = letters.mkString(" + ")
    val sumAll = classes.map { case (n, _) => s"n_$n" }.mkString(" + ")
    val nScripts = letters.map(n => s"CAST($n > 0 AS INT)").mkString(" + ")
    val m = s"greatest(${letters.mkString(", ")})"
    val dominant = letterClasses.map { case (name, _) =>
      s"WHEN n_$name = $m THEN '$name'"
    }.mkString(" ")
    s"""WITH ${valuesCte("script_docs", docs ++ graphemeExtra)},
       |cp AS (
       |  SELECT doc_id, ${graft.functions.Codepoints.sql("text")} AS cps
       |  FROM script_docs),
       |counted AS (
       |  SELECT doc_id, CAST(len(cps) AS INTEGER) AS n_cp,
       |    $cnt
       |  FROM cp)
       |SELECT doc_id, n_cp, ${classes.map { case (n, _) => s"n_$n" }.mkString(", ")},
       |  n_cp - ($sumAll) AS n_other,
       |  $sumLetters AS n_letter,
       |  $nScripts AS n_scripts,
       |  CASE WHEN $sumLetters = 0 THEN 'none' $dominant END AS dominant_script,
       |  CAST(($nScripts) >= 2 AS INT) AS mixed_script
       |FROM counted ORDER BY doc_id""".stripMargin
  }

  val all: Map[String, (Q, Option[String])] = Map(
    "text_utf8_script_mix" -> (utf8ScriptMix, Some(utf8ScriptMixSql)),
    "text_utf8_grapheme_stats" ->
      (utf8GraphemeStats, Some(utf8GraphemeStatsSql)),
    "text_utf8_rolling_fingerprint" ->
      (utf8RollingFingerprint, Some(utf8RollingFingerprintSql)),
    "text_utf8_token_stats" -> (utf8TokenStats, Some(utf8TokenStatsSql)),
    "text_utf8_lang_id" -> (utf8LangId, Some(utf8LangIdSql)),
    "text_utf8_fingerprint_dedup" ->
      (utf8FingerprintDedup, Some(utf8FingerprintDedupSql)),
    "text_utf8_nfc_dedup" -> (utf8NfcDedup, Some(utf8NfcDedupSql)))
}
