package graft.examples

import org.apache.spark.sql.SparkSession

import graft.{Graft, Tables}
import graft.index.{IndexBuilder, UWheelBuilder, WheelRegistry}

/** End-to-end parquet example — the Spark re-expression of
  * `/root/reference/examples/nyc_taxi/src/main.rs`: index a parquet events
  * table (count + min/max + keyed SUM wheels in one scan), run indexed
  * temporal aggregates and a pruned `SELECT *`, and print plan shapes,
  * timings, and the retained index size.
  *
  * Run: `sbt "runMain graft.examples.ParquetExample [sfDir]"`
  */
object ParquetExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Graft.enable(spark)
    val path = s"$sfDir/events.parquet"
    val t0 = System.nanoTime()
    UWheelBuilder("ts", Seq("value"))
      .withKeyedWheel(IndexBuilder("value", Some("event_type = 'click'")))
      .build(spark, path)
    println(f"index build: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      f"retained: ${WheelRegistry.lookup(path).get.indexUsageBytes / 1024.0 / 1024.0}%.1f MiB")
    Tables.registerAll(spark, sfDir)

    def timed(label: String, sql: String): Unit = {
      val df = spark.sql(sql)
      val t = System.nanoTime()
      val rows = df.collect()
      println(f"$label%-28s ${(System.nanoTime() - t) / 1e6}%7.1f ms, " +
        s"${rows.length} row(s), plan=${df.queryExecution.optimizedPlan.nodeName}")
    }
    val range = "ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'"
    timed("COUNT(*) over range", s"SELECT count(*) AS c FROM events WHERE $range")
    timed("keyed SUM over range",
      s"SELECT CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s FROM events WHERE $range AND event_type = 'click'")
    timed("GROUP BY hour",
      s"SELECT date_trunc('hour', ts) AS h, count(*) AS c FROM events WHERE $range GROUP BY 1 ORDER BY 1")
    timed("pruned SELECT * (2030)",
      "SELECT * FROM events WHERE ts >= TIMESTAMP '2030-01-01 00:00:00' AND ts < TIMESTAMP '2030-02-01 00:00:00'")
    spark.stop()
  }
}
