package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-located joins: the storage-level answer to "this join
  * shuffles every time".
  *
  * A join between two tables bucketed into the same number of buckets on
  * the join key needs NO exchange — each task reads matching bucket files
  * from both sides. For a 100 TB fact table joined repeatedly on the same
  * key (the upsert merge key, a user id, a document id), paying one
  * bucketed write amortizes every subsequent join's shuffle away. This is
  * the Spark-native analogue of the reference's Postgres-side b-tree
  * indexes (`internal/db/db.go:97-103`): layout paid at write time to
  * make reads cheap.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets, so
    * sort-merge joins skip the sort too).
    */
  /** Drop `table` and delete its warehouse location. saveAsTable's
    * overwrite only covers tables the CATALOG knows; a location left by
    * a previous JVM (the in-memory catalog forgets, the filesystem
    * doesn't) fails the write with LOCATION_ALREADY_EXISTS unless
    * cleared first.
    */
  def resetTable(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      val st = java.nio.file.Files.walk(loc)
      try st.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally st.close()
    }
  }

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Inner-join two same-bucketing tables on their bucket key — plans
    * with zero Exchange nodes (asserted in BucketingSpec).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
