package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.{Queries, SparkSpec, Tables}

/** Independent recompute of curate_span_corruption at sf0.001: the md5
  * position masks, consecutive-run span merging, sentinel numbering,
  * and both assembled sequences are re-derived in plain Scala (only the
  * tokenizer is reused from the engine) and must agree string-for-
  * string — the oracle hash says "both engines agree"; this pins the
  * T5 span-corruption definition itself.
  */
class SpanCorruptionSpec extends SparkSpec {

  private def bucket100(salt: String, key: String): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest((salt + key).getBytes("UTF-8"))
    val hex = d.take(2).map(b => f"$b%02x").mkString
    Integer.parseInt(hex, 16) % 100
  }

  test("span corruption matches a plain-Scala recompute") {
    import spark.implicits._
    val rows = Queries.queries("curate_span_corruption")(spark, sf0001)
      .collect()
    val toks = Tables(spark, sf0001, "documents")
      .select($"doc_id",
        slice(graft.text.TextAnalysis.tokens($"text"), 1, 48).as("toks"))
      .filter(size($"toks") >= 2)
      .as[(Long, Seq[String])].collect().toMap
    graft.CacheTracker.releaseAll()
    assert(rows.length == toks.size)
    rows.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val ts = toks(docId)
      val masked = ts.indices.map(p => bucket100("t5mask", s"$docId|$p") < 15)
      val firstSpan = ts.indices.map(p => masked(p) && (p == 0 || !masked(p - 1)))
      var k = -1
      val (ip, tp) = ts.indices.map { p =>
        if (firstSpan(p)) k += 1
        val s = s"<X_$k>"
        if (!masked(p)) (Some(ts(p)), None)
        else if (firstSpan(p)) (Some(s), Some(s"$s ${ts(p)}"))
        else (None, Some(ts(p)))
      }.unzip
      assert(r.getAs[Long]("n_tokens") == ts.length, s"doc $docId")
      assert(r.getAs[Long]("n_masked") == masked.count(identity), s"doc $docId")
      assert(r.getAs[Long]("n_spans") == firstSpan.count(identity), s"doc $docId")
      assert(r.getAs[String]("input_text") == ip.flatten.mkString(" "),
        s"doc $docId input")
      assert(r.getAs[String]("target_text") == tp.flatten.mkString(" "),
        s"doc $docId target")
    }
  }
}
