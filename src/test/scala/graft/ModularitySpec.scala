package graft

/** Independent plain-Scala recompute of graph_modularity at sf0.001:
  * the 3-out link graph, FIVE synchronous LPA rounds (most-frequent
  * neighbor label, ties to the smallest), and the per-community
  * Newman-Girvan integers (internal edges, degree mass,
  * num = 4m·L − d²) are re-derived from scratch and must match the
  * gate's top-50 exactly — pinning both the modularity arithmetic and
  * the LPA loop it scores.
  */
class ModularitySpec extends SparkSpec {

  test("assortativity gate matches a plain-Scala recompute of the cleared-mean sums") {
    import spark.implicits._
    val row = Queries.queries("graph_assortativity")(spark, sf0001)
      .collect().head
    val ids = Tables(spark, sf0001, "documents")
      .select($"doc_id").as[Long].collect().sorted
    graft.CacheTracker.releaseAll()
    val n = ids.length.toLong
    val und = ids.flatMap(i => Seq((i * 7 + 1) % n, (i * 13 + 2) % n,
        (i * 29 + 3) % n).filter(_ != i)
      .map(j => (math.min(i, j), math.max(i, j)))).toSet
    val dir = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = dir.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val xs = dir.map { case (a, _) => BigInt(deg(a)) }
    val ys = dir.map { case (_, b) => BigInt(deg(b)) }
    val m = BigInt(dir.size)
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val syy = ys.map(y => y * y).sum
    assert(BigInt(row.getAs[Long]("m_edges")) == m)
    assert(BigInt(row.getAs[Long]("sx")) == sx)
    assert(BigInt(row.getAs[Long]("sy")) == sy)
    assert(BigInt(row.getAs[Long]("num")) == m * sxy - sx * sy)
    assert(BigInt(row.getAs[Long]("den_x")) == m * sxx - sx * sx)
    assert(BigInt(row.getAs[Long]("den_y")) == m * syy - sy * sy)
    // both orientations included => the two denominators must coincide
    assert(row.getAs[Long]("den_x") == row.getAs[Long]("den_y"))
  }

  test("modularity gate matches a plain-Scala recompute of LPA + Newman-Girvan") {
    import spark.implicits._
    val rows = Queries.queries("graph_modularity")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Long]("community"), r.getAs[Long]("size"),
        r.getAs[Long]("internal_edges"), r.getAs[Long]("degree_sum"),
        r.getAs[Long]("mod_num"), r.getAs[Long]("mod_den")))
    val ids = Tables(spark, sf0001, "documents")
      .select($"doc_id").as[Long].collect().sorted
    graft.CacheTracker.releaseAll()
    val n = ids.length.toLong

    val und = ids.flatMap(i => Seq((i * 7 + 1) % n, (i * 13 + 2) % n,
        (i * 29 + 3) % n).filter(_ != i)
      .map(j => (math.min(i, j), math.max(i, j)))).toSet
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab = ids.map(i => i -> i).toMap
    for (_ <- 1 to 5) {
      val next = ids.map { v =>
        val nb = adj.getOrElse(v, Nil).map(lab)
        if (nb.isEmpty) v -> lab(v)
        else v -> nb.groupBy(identity).view.mapValues(_.size).toSeq
          .maxBy { case (l, c) => (c, -l) }._1
      }.toMap
      lab = next
    }
    val m = und.size.toLong
    val sizes = ids.groupBy(lab).view.mapValues(_.length.toLong)
    val intra = und.toSeq.filter { case (a, b) => lab(a) == lab(b) }
      .groupBy(p => lab(p._1)).view.mapValues(_.size.toLong)
    val degs = und.toSeq.flatMap { case (a, b) => Seq(lab(a), lab(b)) }
      .groupBy(identity).view.mapValues(_.size.toLong)
    val expected = sizes.toSeq.map { case (c, sz) =>
      val l = intra.getOrElse(c, 0L)
      val d = degs.getOrElse(c, 0L)
      (c, sz, l, d, 4L * m * l - d * d, 4L * m * m)
    }.sortBy { case (c, sz, _, _, _, _) => (-sz, c) }.take(50)

    assert(rows.toSeq == expected)
  }
}
