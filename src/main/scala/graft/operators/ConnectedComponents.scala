package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list:
  * min-label propagation with pointer jumping, run to a
  * convergence-checked fixpoint. Each round is a constant number of
  * shuffles of the (node, label) table; the shortcut step
  * (label(v) ← label(label(v))) collapses label trees geometrically, so
  * rounds grow with log₂(graph diameter) rather than the diameter
  * itself. Near-dup graphs have tiny diameters (bounded by cluster
  * size), so the loop ends after a handful of rounds at any corpus
  * scale.
  *
  * Iteration mechanics (measured, see DedupQueries.dedupClusters):
  * every generation is cut with an EAGER localCheckpoint — a plain
  * persist leaves the self-join doubling the logical plan per round and
  * the optimizer re-analyzing an exponentially growing tree; the
  * caller must hand in a MATERIALIZED edge frame for the same reason.
  */
object ConnectedComponents {

  /** @param edges materialized (cached/checkpointed) two-column frame of
    *              undirected edges; each pair should appear once — both
    *              directions are derived here.
    * @return (node, comp) where comp is the component's minimum node id.
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 12): DataFrame = {
    val und = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .localCheckpoint(true)
    var labels = und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("comp"))
      .localCheckpoint(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val prop = und.join(labels, col("src") === col("node"))
        .groupBy(col("dst")).agg(min(col("comp")).as("nbr"))
      // eager checkpoint: materialized once before the self-join below
      // reads it twice, and the plan resets to a leaf
      val m1 = labels.select(col("node"), col("comp"))
        .join(prop, col("node") === col("dst"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      val next = m1.toDF("node", "c1")
        .join(m1.toDF("c1", "c2"), Seq("c1"), "left")
        .select(col("node"),
          least(col("c1"), coalesce(col("c2"), col("c1"))).as("comp"))
        .localCheckpoint(true)
      changed = next.toDF("node", "next_comp")
        .join(labels.toDF("node", "prev_comp"), "node")
        .filter(col("next_comp") =!= col("prev_comp")).count()
      labels = next
      rounds += 1
    }
    require(changed == 0,
      s"connected components did not converge in $maxRounds rounds")
    labels
  }
}
