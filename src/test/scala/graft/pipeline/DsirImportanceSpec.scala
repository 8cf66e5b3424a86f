package graft.pipeline

import graft.{Queries, SparkSpec}

/** Pins the curate_dsir_importance selection contract at sf0.001: the
  * report partitions the corpus (totals = all docs), exactly top-k docs
  * are selected across languages, and the target language ('en') ends
  * up ENRICHED — its share of the selected set strictly exceeds its
  * share of the corpus (the measured property the scaladoc's honesty
  * note records; deterministic, not a statistical assertion).
  */
class DsirImportanceSpec extends SparkSpec {

  test("top-100 selection is exact and enriches the target language") {
    val rows = Queries.queries("curate_dsir_importance")(spark, sf0001)
      .collect()
    graft.CacheTracker.releaseAll()
    assert(rows.map(_.getAs[String]("lang")).distinct.length == rows.length)
    val nTotal = rows.map(_.getAs[Long]("n_total")).sum
    val nSel = rows.map(_.getAs[Long]("n_selected")).sum
    assert(nSel == math.min(100L, nTotal), s"selected $nSel of $nTotal")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_total"),
        r.getAs[String]("lang"))
    }
    val en = rows.find(_.getAs[String]("lang") == "en").get
    // selection share vs corpus share, cross-multiplied in integers
    assert(en.getAs[Long]("n_selected") * nTotal >
      en.getAs[Long]("n_total") * nSel,
      "target language not enriched by the importance weights")
  }
}
