package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Graft
import graft.index.{UWheelBuilder, UWheelIndex, WheelRegistry}

/** Incremental-maintenance walkthrough: index a copy of the events table,
  * append a day of new part-files (the daily-ingest shape), show the
  * staleness gate going inert, then [[UWheelIndex.refresh]] scanning ONLY
  * the delta and the same query rewriting again — against a 100 TB table
  * this is a one-partition touch instead of a full rescan. (The reference
  * keeps wheels keyed forever with no invalidation, `lib.rs:154-239`;
  * staleness + refresh is this build's operational completion of that.)
  *
  * Run: `sbt "runMain graft.examples.RefreshExample [sfDir]"`
  */
object RefreshExample {
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

    // a writable copy of events (µs-timestamp projection), split in two:
    // the "historical" table and a "new day" of data to append later
    graft.Tables.ensureNanosConf(spark)
    val all = graft.Tables.events(spark, sfDir)
    val cut = all.agg(expr("percentile(CAST(ts AS DOUBLE), 0.9)")).head().getDouble(0)
    val dir = java.nio.file.Files.createTempDirectory("graft-refresh-ex").toString
    val path = s"$dir/events.parquet"
    all.where(col("ts").cast("double") < cut)
      .select("ts", "value", "event_type").write.parquet(path)

    val t0 = System.nanoTime()
    UWheelBuilder("ts", Seq("value")).build(spark, path)
    println(f"initial build: ${(System.nanoTime() - t0) / 1e9}%.2f s over " +
      s"${spark.read.parquet(path).inputFiles.length} file(s)")

    def q() = {
      spark.read.parquet(path).createOrReplaceTempView("ev")
      spark.sql("""SELECT count(*) AS c FROM ev
                  |WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-10'
                  |""".stripMargin)
    }
    def show(label: String): Unit = {
      val d = q()
      println(f"$label%-22s plan=${d.queryExecution.optimizedPlan.nodeName}%-15s " +
        s"count=${d.head().getLong(0)}")
    }
    show("fresh index:")

    // the daily append: new part-files only, existing files untouched
    all.where(col("ts").cast("double") >= cut)
      .select("ts", "value", "event_type").write.mode("append").parquet(path)
    show("after append (stale):")

    val t1 = System.nanoTime()
    val outcome = UWheelIndex.refresh(spark, path)
    println(f"refresh: $outcome in ${(System.nanoTime() - t1) / 1e9}%.2f s " +
      f"(retained ${WheelRegistry.lookup(path).get.indexUsageBytes / 1024.0}%.0f KiB)")
    show("after refresh:")
    spark.stop()
  }
}
