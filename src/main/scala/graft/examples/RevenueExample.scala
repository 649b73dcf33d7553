package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.index.UWheelBuilder

/** Derived-expression measures end to end — the TPC-H revenue shape: a
  * wheel over `l_extendedprice * (1 - l_discount)` (plus typed-family
  * twins: exact revenue variance, revenue p90, a Count-Min supplier
  * frequency) built in ONE fused scan, then every query below answers
  * from a plan-time LocalRelation instead of scanning — range totals,
  * monthly buckets, keyed residuals, and the sketch forms alike.
  *
  * Run: `sbt "runMain graft.examples.RevenueExample"`
  */
object RevenueExample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)

    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val path = s"$sfDir/lineitem.parquet"
    val rev = "l_extendedprice * (1 - l_discount)"

    UWheelBuilder("l_shipdate", Seq("l_quantity"))
      .withExprWheel(rev, scale = 4)                       // 2-dec × 2-dec ⇒ 4 decimals
      .withKeyedExprWheel(rev, "l_returnflag = 'R'", scale = 4)
      .withMomentWheel(rev)                                // exact revenue variance
      .withQuantileWheel(rev)                              // revenue p90 sketch
      .withFreqWheel("l_suppkey")                          // supplier line frequency
      .build(spark, path)
    spark.read.parquet(path).createOrReplaceTempView("lineitem")

    val range =
      "l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'"
    def show(title: String, sql: String): Unit = {
      val df = spark.sql(sql)
      val local = df.queryExecution.optimizedPlan.collectFirst {
        case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      }.getOrElse(false)
      println(s"== $title (rewritten: $local)")
      df.show(5, truncate = false)
    }

    show("1996 revenue, one O(1) read",
      s"""SELECT CAST(sum(CAST($rev AS DECIMAL(18,4))) AS DOUBLE) AS revenue, count(*) AS cnt
         |FROM lineitem WHERE $range""".stripMargin)
    show("monthly revenue buckets",
      s"""SELECT date_trunc('month', l_shipdate) AS m,
         |       CAST(sum(CAST($rev AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         |FROM lineitem WHERE $range GROUP BY 1 ORDER BY 1""".stripMargin)
    show("returned-line revenue (keyed expression wheel)",
      s"""SELECT CAST(sum(CAST($rev AS DECIMAL(18,4))) AS DOUBLE) AS revenue_returned
         |FROM lineitem WHERE $range AND l_returnflag = 'R'""".stripMargin)
    show("exact revenue variance + p90 sketch, same LocalRelation",
      s"""SELECT wheel_var_samp(CAST($rev AS DECIMAL(18,2))) AS var,
         |       hdr_quantile($rev, 0.9) AS p90
         |FROM lineitem WHERE $range""".stripMargin)
    show("supplier 1's line frequency (Count-Min, never under-counts)",
      s"SELECT cms_freq(l_suppkey, 1) AS lines_supp1 FROM lineitem WHERE $range")

    spark.stop()
  }
}
