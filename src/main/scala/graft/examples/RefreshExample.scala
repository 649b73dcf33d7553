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
    // instant-typed ts regardless of corpus layout (NTZ cannot cast to
    // DOUBLE, and this walkthrough splits on an epoch-seconds percentile);
    // identical values under this UTC session
    val all = graft.Tables.events(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
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

/** The steady-state SERVICE story the manual walkthrough above leads to: a
  * Structured Streaming ingester appends part-files to the indexed table
  * while [[UWheelIndex.scheduleRefresh]] ticks in the background — no
  * query-path or ingest-path involvement — and after every ingest cycle the
  * indexed query (a) still rewrites to the wheel and (b) answers exactly
  * what a rule-disabled scan answers, over data that arrived after the
  * initial build. Exits nonzero if either ever fails.
  *
  * Run: `sbt "runMain graft.examples.ScheduledRefreshExample [sfDir]"`
  */
object ScheduledRefreshExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)
    import spark.implicits._

    // the table under ingest: seeded with the oldest 60% of events, indexed
    graft.Tables.ensureNanosConf(spark)
    // instant-typed ts regardless of corpus layout (getTimestamp below
    // would see a LocalDateTime for an NTZ column); identical values
    // under this UTC session
    val all = graft.Tables.events(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select(col("ts"), col("value")).orderBy("ts").collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1)))
    val seedN = (all.length * 6) / 10
    val dir = java.nio.file.Files.createTempDirectory("graft-sched-refresh").toString
    val path = s"$dir/events.parquet"
    all.take(seedN).toSeq.toDF("ts", "value").write.parquet(path)
    UWheelBuilder("ts", Seq("value")).build(spark, path)

    // the service tick: refreshAll every 200 ms on a daemon thread
    val tick = UWheelIndex.scheduleRefresh(spark, intervalMs = 200L)

    // the ingester: a real streaming query appending part-files per batch
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Double)]
    val ingest = input.toDF().toDF("ts", "value").writeStream
      .queryName("ingest")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(path); ()
      }
      .start()

    def indexedCount(): (String, Long) = {
      spark.read.parquet(path).createOrReplaceTempView("ev")
      val d = spark.sql(
        "SELECT count(*) AS c FROM ev WHERE ts >= TIMESTAMP '2024-01-01'")
      (d.queryExecution.optimizedPlan.nodeName, d.head().getLong(0))
    }

    try {
      // four ingest cycles of ~10% of the table each
      val cycles = all.drop(seedN).grouped(math.max(1, (all.length - seedN) / 4)).toSeq
      var ingested = seedN.toLong
      cycles.zipWithIndex.foreach { case (slice, i) =>
        input.addData(slice.toSeq: _*)
        ingest.processAllAvailable()
        ingested += slice.length
        // the tick is asynchronous by design: poll (bounded) until the
        // refreshed index serves the post-append answer from the wheel
        val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
        var st = indexedCount()
        while ((st._1 != "LocalRelation" || st._2 != ingested)
            && System.nanoTime() < deadline) {
          Thread.sleep(50)
          st = indexedCount()
        }
        println(s"cycle ${i + 1}: +${slice.length} rows -> " +
          s"plan=${st._1} count=${st._2} (expect $ingested)")
        require(st._1 == "LocalRelation",
          s"cycle ${i + 1}: query stopped rewriting after append")
        require(st._2 == ingested,
          s"cycle ${i + 1}: indexed answer ${st._2} != ingested $ingested")
      }
      // final exactness check vs a rule-disabled scan on a sub-range
      Graft.rewritesEnabled = false
      val scan =
        try spark.sql(
          """SELECT count(*) AS c, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s
            |FROM ev WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-10'
            |""".stripMargin).head()
        finally Graft.rewritesEnabled = true
      val idx = spark.sql(
        """SELECT count(*) AS c, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s
          |FROM ev WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-10'
          |""".stripMargin).head()
      require(idx == scan, s"indexed $idx != scan $scan")
      println(s"steady state: indexed sub-range answer $idx == rule-disabled scan")
    } finally {
      tick.close() // waits out an in-flight tick before the session stops
      ingest.stop()
      spark.stop()
    }
  }
}
