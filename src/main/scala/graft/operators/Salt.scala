package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins.
  *
  * A shuffle join sends every row of a hot key to ONE reducer; at 100 TB a
  * single celebrity key can hold the whole stage hostage. Salting splits
  * each hot key into `salts` sub-keys: the big side appends a
  * deterministic salt derived from a per-row column, the small side is
  * replicated once per salt value, and the join runs on (key, salt) — the
  * hot key's rows now spread over `salts` reducers. Join semantics are
  * unchanged: every big-side row still meets exactly one copy of its
  * small-side match.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) does this adaptively for sort-merge joins by splitting
  * oversized partitions; explicit salting remains the tool when the skew
  * is known ahead of time, the join is broadcast-incompatible, and the
  * optimizer must not be trusted to notice.
  */
object Salt {

  /** `big ⋈ small` on `key`, with `big`'s rows salted by `saltFrom` (any
    * roughly-uniform per-row expression — an id, a hash of the payload)
    * and `small` replicated `salts` ways.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFrom: Column, salts: Int): DataFrame = {
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin: inputs must not already carry a __salt column")
    val salted = big.withColumn("__salt", pmod(hash(saltFrom), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
