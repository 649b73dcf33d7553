package graft.examples

import org.apache.spark.sql.SparkSession

import graft.streaming.StreamingTypedWheel

/** Live sketch service walkthrough: four continuously-maintained typed
  * wheels — HLL distinct users, HDR value quantiles, Count-Min per-user
  * frequencies, heavy-hitter top-k users — ingest the events table replayed as a file stream and
  * PUBLISH freeze-on-read snapshots into the optimizer registry after
  * every micro-batch. Batch SQL (`hll_distinct`, `hdr_quantile`,
  * `cms_freq`) over time ranges of the same table then answers AT PLAN
  * TIME from the streams' watermark-consistent state — an ops dashboard
  * ("distinct users last hour, p99 value, how active is user 42") served
  * with zero scans while ingestion continues. Each answer is checked
  * against running the same aggregate over the raw rows (bit-identical by
  * construction: the stream folds the same native aggregates).
  *
  * Run: `sbt "runMain graft.examples.SketchServiceExample [sfDir]"`
  */
object SketchServiceExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enable(spark)

    // stage the corpus as a streaming source directory; batch SQL reads the
    // ORIGINAL parquet path — the one the streams register under
    graft.Tables.ensureNanosConf(spark)
    val path = s"$sfDir/events.parquet"
    val all = graft.Tables.events(spark, sfDir).select("ts", "user_id", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-sketch-ex").toString + "/in"
    all.repartition(4).write.parquet(dir)
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)

    val hll = new StreamingTypedWheel[Long, Array[Byte], Long]("ts",
      org.apache.spark.sql.functions.col("user_id"),
      new graft.wheel.WheelAggregators.HllDistinct(), _.getLong(1))
    val hdr = StreamingTypedWheel.quantiles("ts", "value")
    val cms = StreamingTypedWheel.freq("ts", "user_id")
    val hot = StreamingTypedWheel.topTalkers("ts", "user_id")
    val qs = Seq(
      hll.attach(stream.select("ts", "user_id"), "sketch-ex-hll"),
      hdr.attach(stream.select("ts", "value"), "sketch-ex-hdr"),
      cms.attach(stream.select("ts", "user_id"), "sketch-ex-cms"),
      hot.attach(stream.select("ts", "user_id"), "sketch-ex-topk"))
    try {
      hll.register(path, "user_id")
      hdr.register(path, "value")
      cms.register(path, "user_id")
      hot.register(path, "user_id")
      qs.foreach(_.processAllAvailable())

      graft.Tables.registerAll(spark, sfDir)
      val sql =
        """SELECT hll_distinct(user_id) AS live_users,
          |       hdr_quantile(value, 0.99) AS live_p99,
          |       cms_freq(user_id, 42) AS live_u42
          |FROM events
          |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
          |  AND ts < TIMESTAMP '2024-01-12 00:00:00'""".stripMargin
      val df = spark.sql(sql)
      val plan = df.queryExecution.optimizedPlan
      val planTime = plan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.nonEmpty
      val live = df.collect()(0)
      graft.Graft.rewritesEnabled = false
      val scan = try spark.sql(sql).collect()(0)
      finally graft.Graft.rewritesEnabled = true
      println(s"answered at plan time: $planTime")
      println(s"live:  $live")
      println(s"scan:  $scan")
      assert(planTime, "expected the sketch service to answer at plan time")
      assert(live == scan, "live sketch answers must bit-equal the scan aggregates")
      println("live sketch service ≡ scan aggregates")

      // the fourth family has no SQL aggregate — its live service is the
      // index API: certified-exact top-k users over the same range
      val s0 = java.time.Instant.parse("2024-01-05T00:00:00Z").getEpochSecond
      val e0 = java.time.Instant.parse("2024-01-12T00:00:00Z").getEpochSecond
      val topk = graft.index.WheelRegistry.lookup(path).get
        .topKWheel("user_id").get.topK(s0, e0, 5)
      val gt = spark.sql(
        """SELECT user_id, count(*) AS cnt FROM events
          |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
          |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
          |GROUP BY 1 ORDER BY cnt DESC, user_id LIMIT 5""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      println(s"live top-5 users: $topk")
      assert(topk.contains(gt), "certified top-k must equal the scan's top-5")
      println("live top-k service ≡ scan top-5")
    } finally {
      qs.foreach(_.stop())
      hll.deregister(); hdr.deregister(); cms.deregister(); hot.deregister()
    }
    spark.stop()
  }
}
