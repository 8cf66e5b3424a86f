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

  /** Hash bucket in [0,n): first 4 hex chars of md5(salt || key) mod n.
    * With n = 65536 this is the raw 16-bit value (no modulo bias) — the
    * bloom-bit-position case.
    */
  def bucket(salt: String, key: Column, n: Int): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 4), 16, 10)
      .cast("long") % n

  /** DuckDB mirror of [[bucket]]. */
  def sqlBucket(salt: String, key: String, n: Int): String =
    s"CAST(('0x' || substr(md5('$salt' || CAST($key AS VARCHAR)), 1, 4)) AS INTEGER) % $n"

  /** Hash bucket in [0,100): the split/quota/sampling workhorse. */
  def bucket100(salt: String, key: Column): Column = bucket(salt, key, 100)

  /** DuckDB mirror of [[bucket100]]. */
  def sqlBucket100(salt: String, key: String): String = sqlBucket(salt, key, 100)

  /** Sketch hash family: row `r`'s bucket reads the DISJOINT 16-bit
    * hex slice [1+4r, 4+4r] of ONE md5(salt || key) — d rows cost one
    * digest per element instead of d salted digests (at 100 TB the
    * digest IS the sketch build's hot loop, and Spark's subexpression
    * elimination collapses the d identical md5 calls to one). Slices
    * of a strong hash are independent uniform; requires 4(r+1) ≤ 32.
    */
  def bucketRow(salt: String, key: Column, r: Int, n: Int): Column =
    bucketRowOfDigest(md5(concat(lit(salt), key.cast("string"))), r, n)

  /** Row `r`'s bucket from an ALREADY-COMPUTED md5 digest column.
    * Project the digest once and slice d times when the d calls sit
    * under a Generate: subexpression elimination does NOT reach into
    * generator input expressions (r12 measured: the count-min build
    * paid 4 digests/element through `explode(array(...))` despite the
    * CSE note above — projecting the digest first restored
    * 1 digest/element).
    */
  def bucketRowOfDigest(dg: Column, r: Int, n: Int): Column =
    conv(substring(dg, 1 + 4 * r, 4), 16, 10).cast("long") % n

  /** DuckDB mirror of [[bucketRow]] with the row index as an EXPRESSION
    * (the oracle unrolls rows via `range(0, d) t(j)`).
    */
  def sqlBucketRow(salt: String, key: String, rExpr: String, n: Int): String =
    s"CAST(('0x' || substr(md5('$salt' || CAST($key AS VARCHAR)), " +
      s"1 + 4 * ($rExpr), 4)) AS INTEGER) % $n"

  /** Raw 48-bit hash value (first 12 hex chars) — the uniform-variate
    * source when a query needs more than a bucket (weighted sampling,
    * noise generation). Fits a BIGINT exactly; [0, 2^48).
    */
  def hash48(salt: String, key: Column): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 12), 16, 10)
      .cast("long")

  /** DuckDB mirror of [[hash48]]. */
  def sqlHash48(salt: String, key: String): String =
    s"CAST(('0x' || substr(md5('$salt' || CAST($key AS VARCHAR)), 1, 12)) AS BIGINT)"
}
