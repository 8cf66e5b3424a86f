package graft.functions

import org.apache.spark.sql.SparkSession

/** One-stop imperative registration of the engine's custom expression
  * surface (the `SparkSessionExtensions` path in [[GraftExtensions]] is
  * the deployment-grade alternative; this covers ad-hoc sessions).
  * Registration is idempotent — re-registering replaces the same entry.
  */
object Registry {
  def registerAll(spark: SparkSession): Unit = {
    RollingHash64.register(spark)
    MinHashMd5.register(spark)
    SignBits.register(spark)
    DotExactDec.register(spark)
  }
}
