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
      maxRounds: Int = 12): DataFrame =
    runCounted(edges, srcCol, dstCol, maxRounds)._1

  /** As [[run]], also returning the number of propagation rounds — used
    * by the spec to pin the jobs-per-round budget (3: two checkpoint
    * materializations + one convergence scan).
    */
  def runCounted(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 12): (DataFrame, Int) = {
    val und = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .localCheckpoint(true)
    // one cheap columnar count over the just-written checkpoint blocks
    // sizes the loop's shuffle width (graft.LoopConf — r16: AQE's
    // per-exchange jobs dominated every CC-riding gate at gate scale)
    val stateRows = und.count()
    graft.LoopConf.tight(edges.sparkSession, stateRows) {
    var labels = und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("comp"))
      .localCheckpoint(true)
    var changed = true
    var rounds = 0
    while (changed && rounds < maxRounds) {
      val prop = und.join(labels, col("src") === col("node"))
        .groupBy(col("dst")).agg(min(col("comp")).as("nbr"))
      // eager checkpoint: materialized once before the self-join below
      // reads it twice, and the plan resets to a leaf. The round's
      // previous label rides along so convergence needs no extra join.
      val m1 = labels.select(col("node"), col("comp").as("prev"),
          col("comp"))
        .join(prop, col("node") === col("dst"), "left")
        .select(col("node"), col("prev"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("c1"))
        .localCheckpoint(true)
      val next = m1
        .join(m1.select(col("node").as("jn"), col("c1").as("c2")),
          col("c1") === col("jn"), "left")
        .select(col("node"), col("prev"),
          least(col("c1"), coalesce(col("c2"), col("c1"))).as("comp"))
        .select(col("node"), col("comp"),
          (col("comp") =!= col("prev")).as("chg"))
        .localCheckpoint(true)
      // convergence folded into the round: a columnar scan of the blocks
      // the checkpoint just wrote — no join-vs-previous, no second
      // evaluation of the propagation (was a full join+count job/round)
      changed = next.agg(coalesce(max(col("chg")), lit(false)))
        .head.getBoolean(0)
      labels = next.select(col("node"), col("comp"))
      rounds += 1
    }
    require(!changed,
      s"connected components did not converge in $maxRounds rounds")
    (labels, rounds)
    }
  }
}
