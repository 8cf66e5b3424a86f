package graft.tools

import org.apache.spark.sql.functions._

/** Phase attribution for lake_partition_evolution (dev probe, not part
  * of the query surface): times the two commits and the two-layout
  * read separately at sf0.1 so the gate's cost is attributed, not
  * guessed.
  */
object PeProbe {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratch.sparkLocalDir)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.Registry.registerAll(s)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pe] $n%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 3).foreach { i =>
      val root = s"${graft.Scratch.dir}/pe_probe_$i"
      import s.implicits._
      val base = graft.Tables(s, dir, "orders")
        .filter($"o_orderkey" % 2 === 0)
        .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
        .repartition($"o_orderstatus")
      t("commit1(status)")(
        graft.operators.Snapshots.commit(s, root, base, "o_orderstatus"))
      val delta = graft.Tables(s, dir, "orders")
        .filter($"o_orderkey" % 2 === 1)
        .select($"o_orderkey", $"o_totalprice", $"o_orderstatus",
          expr("(year(o_orderdate) * 100 + month(o_orderdate))")
            .as("o_month"))
        .repartition($"o_month")
      t("commit2(month)")(graft.operators.Snapshots.commit(
        s, root, delta, "o_month", carry = _ => true))
      t("read+agg")(graft.operators.Snapshots.read(s, root, 2)
        .groupBy($"o_orderstatus",
          when($"o_month".isNull, "a").otherwise("b"))
        .agg(count(lit(1))).collect())
    }
    s.stop()
  }
}
