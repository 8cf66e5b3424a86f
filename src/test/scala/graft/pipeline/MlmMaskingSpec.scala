package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.{Queries, SparkSpec, Tables}

/** Independent recompute of curate_mlm_masking at sf0.001: the 15%
  * selection, the 80/10/10 mask/random/keep split, the ring-offset
  * random replacement (never the original slot), and both assembled
  * outputs are re-derived in plain Scala from the md5 recipes and must
  * agree string-for-string.
  */
class MlmMaskingSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def bucket100(salt: String, key: String): Int =
    Integer.parseInt(md5hex(salt + key).substring(0, 4), 16) % 100

  private def hash48(salt: String, key: String): Long =
    java.lang.Long.parseLong(md5hex(salt + key).substring(0, 12), 16)

  test("MLM masking matches a plain-Scala recompute") {
    import spark.implicits._
    val rows = Queries.queries("curate_mlm_masking")(spark, sf0001)
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
      val n = ts.length
      val pieces = ts.indices.map { p =>
        val key = s"$docId|$p"
        val sel = bucket100("mlmsel", key) < 15
        val act = bucket100("mlmact", key)
        val piece =
          if (!sel) ts(p)
          else if (act < 80) "[MASK]"
          else if (act < 90)
            ts((((p + 1 + hash48("mlmrep", key) % (n - 1)) % n)).toInt)
          else ts(p)
        val label = if (sel) Some(s"$p:${ts(p)}") else None
        (sel, act, piece, label)
      }
      assert(r.getAs[Long]("n_tokens") == n, s"doc $docId")
      assert(r.getAs[Long]("n_selected") == pieces.count(_._1), s"doc $docId")
      assert(r.getAs[Long]("n_masked") ==
        pieces.count(x => x._1 && x._2 < 80), s"doc $docId")
      assert(r.getAs[Long]("n_random") ==
        pieces.count(x => x._1 && x._2 >= 80 && x._2 < 90), s"doc $docId")
      assert(r.getAs[String]("masked_text") ==
        pieces.map(_._3).mkString(" "), s"doc $docId text")
      assert(r.getAs[String]("labels") ==
        pieces.flatMap(_._4).mkString(" "), s"doc $docId labels")
    }
  }
}
