package graft.text

import org.apache.spark.sql.functions._

import graft.Queries

/** HTML → text extraction — the boilerplate-removal step every web-crawl
  * corpus runs before any quality/dedup gate (the trafilatura/jusText
  * role, expressed as deterministic regex passes both engines share):
  * drop script/style/comment BLOCKS (content and all), strip remaining
  * tags, decode the frequent entities, collapse whitespace. The fixture
  * is an in-code literal corpus rendered to both dialects (the
  * [[Utf8Queries]] pattern) covering the traps a strip pipeline meets:
  * uppercase tags, attributes, script bodies containing `<` and fake
  * tags, style blocks, comments hiding markup, numeric and named
  * entities, nested inline tags, and void elements.
  *
  * Known shared limitation (documented, not hidden): the tag regex
  * `<[^>]*>` splits an attribute value containing a literal '>' —
  * BOTH engines split it identically (same RE2-compatible pattern), so
  * the gate stays engine-exact; a production extractor would lex. All
  * four regexes are RE2-safe: no backreferences, no lookaround, lazy
  * quantifiers only inside (?s)/(?i) groups, both supported by Java
  * regex and RE2.
  *
  * Scale shape: map-only per row (four regex passes + fixed replaces),
  * then one ORDER BY on doc_id — scan-local at any corpus size.
  */
object HtmlQueries {
  import Queries.Q

  /** (doc_id, html) fixture. Single quotes are doubled when rendered to
    * SQL by [[sqlDocsCte]].
    */
  val docs: Seq[(Long, String)] = Seq(
    (1L, "<html><head><title>Fast Data</title>" +
      "<script>if (a < b) { document.write(\"<p>fake</p>\"); }</script>" +
      "<style>p { color: red; } .x > .y { margin: 0; }</style></head>" +
      "<body><h1>Fast Data</h1><p>The quick engine ships &amp; scales.</p>" +
      "<a href=\"https://example.com/a\">first link</a></body></html>"),
    (2L, "<HTML><BODY><P>UPPERCASE tags &lt;work&gt; too</P>" +
      "<!-- a comment hiding <p>markup</p> and text -->" +
      "<A HREF='https://example.com/b'>second link</A>" +
      "<BR><IMG SRC='x.png'></BODY></HTML>"),
    (3L, "plain text with no markup at all"),
    (4L, "<div><p>nested <b>bold <i>italic</i></b> text</p>" +
      "<p>entities: &quot;quoted&quot; &#39;apos&#39; a&nbsp;b 5 &gt; 3</p>" +
      "<ul><li>alpha</li><li>beta</li></ul></div>"),
    (5L, "<body><script type='text/javascript'>var x = '</span>';" +
      "</script>after script<style>@media (max-width: 10px) {}</style>" +
      "<a href='/rel'>rel link</a><a name='anchor'>not a link</a></body>"),
    (6L, "<p>unclosed paragraph <em>emphasis trails"))

  private[graft] def sqlDocsCte: String =
    "html_docs(doc_id, html) AS (VALUES\n    " +
      docs.map { case (i, h) =>
        s"(CAST($i AS BIGINT), '${h.replace("'", "''")}')"
      }.mkString(",\n    ") + ")"

  /** The four passes, shared column-side. Order matters: blocks before
    * tags (a stripped `<script>` tag would leak its body), tags before
    * entities (so `&lt;p&gt;` decodes to a literal that can no longer
    * be mistaken for markup), whitespace last.
    */
  private def extract(html: org.apache.spark.sql.Column) = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>|<!--.*?-->", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Same passes, DuckDB dialect (RE2; 'g' for global replace). */
  private def sqlExtract(html: String): String = {
    val noBlocks = s"regexp_replace($html, " +
      "'(?is)<(script|style)[^>]*>.*?</(script|style)>|<!--.*?-->', ' ', 'g')"
    val noTags = s"regexp_replace($noBlocks, '<[^>]*>', ' ', 'g')"
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) =>
        s"regexp_replace($c, '$e', '$r', 'g')" }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  /** Per document: the extracted text, its title, the hyperlink count
    * (href-carrying anchors only), code-point length, and the md5 the
    * downstream dedup would fingerprint.
    */
  val htmlExtract: Q = (s, _) => {
    import s.implicits._
    docs.toDF("doc_id", "html")
      .select($"doc_id",
        extract($"html").as("text"),
        regexp_extract($"html", "(?is)<title[^>]*>(.*?)</title>", 1)
          .as("title"),
        size(regexp_extract_all($"html", lit("(?is)<a[^>]*href[^>]*>"), lit(0)))
          .as("n_links"),
        length(extract($"html")).as("n_chars"),
        md5(extract($"html").cast("binary")).as("fp"))
      .orderBy($"doc_id")
  }

  val htmlExtractSql: String = {
    val ex = sqlExtract("html")
    s"""WITH $sqlDocsCte
       |SELECT doc_id, $ex AS text,
       |  coalesce(regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1), '')
       |    AS title,
       |  CAST(len(regexp_extract_all(html, '(?is)<a[^>]*href[^>]*>'))
       |    AS INTEGER) AS n_links,
       |  CAST(length($ex) AS INTEGER) AS n_chars,
       |  md5($ex) AS fp
       |FROM html_docs ORDER BY doc_id""".stripMargin
  }

  val all: Map[String, (Q, Option[String])] = Map(
    "text_html_extract" -> (htmlExtract, Some(htmlExtractSql)))
}
