package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic keyed hash buckets — the selection primitive behind
  * splits, quotas, sampling, and batch selection. Both engines take md5
  * over the UTF-8 bytes of the same `salt || key` string and parse the
  * same 16-bit prefix, so buckets agree bit-for-bit on any engine and
  * any partitioning, and assignments are stable under corpus growth.
  * One definition, two dialects: a drift in either side alone would
  * silently desynchronize every gate built on it.
  */
object KeyHash {

  /** Hash bucket in [0,100): first 4 hex chars of md5(salt || key). */
  def bucket100(salt: String, key: Column): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 4), 16, 10)
      .cast("long") % 100

  /** DuckDB mirror of [[bucket100]]. */
  def sqlBucket100(salt: String, key: String): String =
    s"CAST(('0x' || substr(md5('$salt' || CAST($key AS VARCHAR)), 1, 4)) AS INTEGER) % 100"
}
