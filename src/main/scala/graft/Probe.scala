package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val ev = Tables(s, "/root/testdata/sf0.001", "events")
    ev.printSchema()
    ev.select($"event_id", $"ts", window($"ts", "10 minutes")("start").as("w")).show(3, false)
    ev.select(min($"ts"), max($"ts")).show(false)
  }
}
