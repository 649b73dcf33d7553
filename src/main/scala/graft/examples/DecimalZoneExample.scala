package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.UWheelBuilder

/** Round-7 surfaces in one walkthrough: DECIMAL measure columns (the type
  * real TPC-H dumps use) indexed at the column's own scale — SUM/AVG answer
  * from exact scaled-long arithmetic, MIN/MAX under the double-image
  * round-trip proof — and coarse `date_trunc`/`to_date`/`year` group-bys
  * rewriting under a FIXED-OFFSET session zone (Asia/Kolkata): wheel slots
  * are epoch-aligned, and a zone whose rules never transition across the
  * indexed span truncates as a constant shift of those slots.
  *
  * Run: `sbt "runMain graft.examples.DecimalZoneExample"`
  */
object DecimalZoneExample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enable(spark)

    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"

    // Derive a DECIMAL(12,2)-typed lineitem (the corpus stores doubles;
    // real dumps store DECIMAL already) and index it: the builder reads the
    // column type and picks scale 2 for the wheel automatically.
    val dir = java.nio.file.Files.createTempDirectory("graft-deczone").toString
    val p = s"$dir/lineitem_dec.parquet"
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_shipdate"),
        col("l_quantity").cast("decimal(12,2)").as("l_quantity"))
      .write.mode("overwrite").parquet(p)
    UWheelBuilder("l_shipdate", Seq("l_quantity")).build(spark, p)
    spark.read.parquet(p).createOrReplaceTempView("li")

    val dec = spark.sql(
      """SELECT count(*) AS cnt, sum(l_quantity) AS total,
        |       avg(l_quantity) AS mean, min(l_quantity) AS mn, max(l_quantity) AS mx
        |FROM li
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |""".stripMargin)
    println("decimal aggregates (plan-time, exact decimal arithmetic):")
    println("  plan: " + dec.queryExecution.optimizedPlan.nodeName)
    dec.show()

    // Fixed-offset zone: Kolkata (+05:30, no transition since 1945) —
    // local-day buckets are epoch day slots shifted by 19 800 s, composed
    // exactly from minute slots; a DST zone would fall through to the scan.
    // (events.ts is a true TIMESTAMP; lineitem's NTZ dates are wall-clock
    // and rewrite in any zone already.)
    graft.Tables.registerAll(spark, sfDir)
    UWheelBuilder("ts", Seq("value")).build(spark, s"$sfDir/events.parquet")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try {
      val byDay = spark.sql(
        """SELECT date_trunc('day', ts) AS d, count(*) AS cnt
          |FROM events
          |WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-12'
          |GROUP BY 1 ORDER BY 1""".stripMargin)
      println("Kolkata local-day buckets (plan-time):")
      println("  plan: " + byDay.queryExecution.optimizedPlan.nodeName)
      byDay.show(false)
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")

    spark.stop()
  }
}
