package graft.pipeline

import graft.{Queries, SparkSpec, Tables}

/** Definition pin for curate_length_batching at sf0.001: the two-phase
  * distributed rank (per-length windows + histogram offsets) must
  * reproduce the naive global (n_toks DESC, doc_id) sort bit-for-bit —
  * re-derived here with an in-memory sort and the same 32-doc packing.
  */
class LengthBatchingSpec extends SparkSpec {

  test("length batching matches a plain-Scala sort-and-pack recompute") {
    import spark.implicits._
    val rows = Queries.queries("curate_length_batching")(spark, sf0001)
      .collect()
    val lens = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        (id, t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1).length)
      }
    graft.CacheTracker.releaseAll()
    assert(rows.nonEmpty)

    val batches = lens.sortBy { case (id, n) => (-n, id) }
      .grouped(32).zipWithIndex.map { case (b, i) =>
        val ns = b.map(_._2)
        (i.toLong, (b.length.toLong, ns.max, ns.min, ns.map(_.toLong).sum))
      }.toMap

    assert(rows.length == batches.size)
    rows.foreach { r =>
      val (nd, mx, mn, sm) = batches(r.getAs[Long]("batch_id"))
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Int]("max_len") == mx)
      assert(r.getAs[Int]("min_len") == mn)
      assert(r.getAs[Long]("sum_tokens") == sm)
      assert(r.getAs[Long]("pad_waste") == mx.toLong * nd - sm)
    }
    // every batch except possibly the last is full
    val full = rows.init.forall(_.getAs[Long]("n_docs") == 32L)
    assert(full, "only the final batch may be short")
  }
}
