package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Q

/** Randomized-latency bench families, mirroring the reference bench's
  * 1,000-random-range HdrHistogram runs
  * (`benchmarks/nyc_taxi_bench/src/main.rs:232-305,504-518`): COUNT(*),
  * keyed SUM, min/max-pruned SELECT *, GROUP BY date_trunc, sliding window(),
  * and certified heavy-hitter top-k over random second- or
  * minute-aligned ranges of the events table, rule-ON vs rule-OFF,
  * reported as p50/p99/p99.9 — so BASELINE.md's latency rows compare to a
  * distribution, not a single-query median.
  *
  * Rule-ON runs N ranges; rule-OFF runs N/5 (each off-range pays a full
  * scan — at sf0.1 that is ~100-300 ms per query, and 1,000 of them would
  * dominate the round's wall-clock without changing the distribution
  * shape; p99.9 for the off side is therefore labeled `max`).
  *
  * Two extra families time the RAW wheel reads (no Spark session in the
  * loop): the reference's µs numbers measure exactly this layer, while
  * end-to-end SQL latency sits on the JVM's ~4-6 ms plan/session floor
  * regardless of how fast the wheel answers.
  *
  * Writes one JSON object to BENCH_pcts_r11.json (args(0) overrides) and
  * prints it.
  */
object BenchPcts {

  /** Derives an events corpus `xf`× the source's rows (same time span, so
    * random ranges are comparable) by unioning `xf` copies with remapped
    * event ids; the other tables symlink to the source. This is the
    * second-scale-factor datapoint of BASELINE.md target #1: at `xf`× the
    * data the rule-OFF scan must grow ~`xf`× while the rule-ON latency
    * stays flat (the wheel read is row-count-independent). */
  private[tools] def deriveScaled(spark: SparkSession, sfDir: String, xf: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-sfx$xf").toString
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val n = ev.count()
    // one explode per row instead of an xf-way union: a reduce(unionAll)
    // tree is xf nodes deep (Catalyst recursion breaks around ~2000) and
    // re-scans the source xf times; the generator shape scans once and
    // scales to any xf
    ev.withColumn("copy", explode(sequence(lit(0), lit(xf - 1))))
      .withColumn("event_id", col("event_id") + col("copy") * lit(n))
      .drop("copy")
      .repartition(64)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // the other corpus tables symlink through — Q.ctx registers all views
    val src = java.nio.file.Paths.get(sfDir)
    java.nio.file.Files.list(src).forEach { p =>
      val name = p.getFileName.toString
      if (name != "events.parquet")
        java.nio.file.Files.createSymbolicLink(
          java.nio.file.Paths.get(dir, name), p.toAbsolutePath)
    }
    dir
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // round-aware default like the other bench tools (SPARK_GRAFT_ROUND
    // pins it; see [[BenchRound]] for the inference's run-order assumption)
    val outPath = args.headOption.getOrElse(new java.io.File(
      BenchRound.repoRoot, s"BENCH_pcts_r${BenchRound.current}.json").getPath)
    val n = sys.env.get("SPARK_GRAFT_PCTS_N").map(_.toInt).getOrElse(1000)
    // SPARK_GRAFT_PCTS_FAMS=count,groupby_hour restricts the SQL families
    // (the off-side of a scaled corpus pays a full scan per range — all six
    // families at 10× would cost ~an hour without changing the conclusion)
    val famFilter = sys.env.get("SPARK_GRAFT_PCTS_FAMS")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_SCALE_X=10 derives and measures a 10× events corpus
    val sfDir = sys.env.get("SPARK_GRAFT_SCALE_X").map(_.toInt) match {
      case Some(xf) if xf > 1 => deriveScaled(spark, baseDir, xf)
      case _ => baseDir
    }
    Q.ctx(spark, sfDir)

    val hw = graft.index.WheelRegistry.lookup(s"$sfDir/events.parquet")
      .flatMap(_.countWheel).getOrElse(sys.error("no count wheel")).wheel
    val startSec = hw.startSec
    val endSec = hw.endSec
    val span = endSec - startSec

    val rnd = new scala.util.Random(0x20260814L)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    def tsOf(sec: Long): String = fmt.format(java.time.Instant.ofEpochSecond(sec))

    /** Random [a, b) seconds inside the data span; start second- or
      * minute-aligned with equal probability (the reference's two
      * alignment families), width uniform in [1 min, full span]. */
    def randRange(): (Long, Long) = {
      val align = if (rnd.nextBoolean()) 60L else 1L
      val w = 60L + (rnd.nextDouble() * (span - 60L)).toLong
      val s0 = startSec + (rnd.nextDouble() * (span - w)).toLong
      val s = s0 / align * align
      (s, math.min(s + w, endSec))
    }

    def pcts(xs: Array[Double]): Map[String, Double] = {
      val a = xs.sorted
      def at(q: Double) = a(math.min(a.length - 1, (q * a.length).toInt))
      Map("n" -> a.length.toDouble, "p50_ms" -> at(0.50), "p99_ms" -> at(0.99),
        "p999_ms" -> at(0.999), "max_ms" -> a.last,
        "mean_ms" -> a.sum / a.length)
    }

    def sqlOf(fam: String, a: Long, b: Long): String = fam match {
      case "count" =>
        s"SELECT count(*) AS cnt FROM events WHERE ts >= TIMESTAMP '${tsOf(a)}' AND ts < TIMESTAMP '${tsOf(b)}'"
      case "keyed_sum" =>
        "SELECT CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s FROM events " +
          s"WHERE ts >= TIMESTAMP '${tsOf(a)}' AND ts < TIMESTAMP '${tsOf(b)}' AND event_type = 'purchase'"
      case "minmax_prune" =>
        // value's domain tops out far below 100000: the min/max wheel must
        // prove emptiness and prune the scan entirely
        s"SELECT event_id FROM events WHERE ts >= TIMESTAMP '${tsOf(a)}' AND ts < TIMESTAMP '${tsOf(b)}' AND value > 100000.0"
      // the multi-row rewrite families (round-10 task 7: the reference
      // bench has no analogue — GROUP BY date_trunc and window() live only
      // here), same contract shapes as uw_groupby_hour / uw_window_sliding
      case "groupby_hour" =>
        "SELECT date_trunc('hour', ts) AS bucket, count(*) AS cnt, min(value) AS mn, max(value) AS mx " +
          s"FROM events WHERE ts >= TIMESTAMP '${tsOf(a)}' AND ts < TIMESTAMP '${tsOf(b)}' GROUP BY 1 ORDER BY 1"
      case "window_sliding" =>
        "SELECT window.start AS ws, count(*) AS cnt FROM events " +
          s"WHERE ts >= TIMESTAMP '${tsOf(a)}' AND ts < TIMESTAMP '${tsOf(b)}' " +
          "GROUP BY window(ts, '2 days', '1 day') ORDER BY 1"
      // this round's heavy-hitter arm: certified exact top-5 keys
      case "topk" =>
        "SELECT user_id, count(*) AS cnt FROM events " +
          s"WHERE ts >= TIMESTAMP '${tsOf(a)}' AND ts < TIMESTAMP '${tsOf(b)}' " +
          "GROUP BY 1 ORDER BY cnt DESC, user_id LIMIT 5"
    }

    def runFam(fam: String, ranges: Int): Array[Double] = {
      (1 to 20).foreach { _ => val (a, b) = randRange(); spark.sql(sqlOf(fam, a, b)).collect() }
      Array.fill(ranges) {
        val (a, b) = randRange()
        val q = sqlOf(fam, a, b)
        val t = System.nanoTime()
        spark.sql(q).collect()
        (System.nanoTime() - t) / 1e6
      }
    }

    val out = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Double]]
    // multi-row families run n/2 ON ranges (each rewrite materializes up to
    // hundreds of buckets — the distribution converges well before 1,000)
    val famRanges = Map("groupby_hour" -> n / 2, "window_sliding" -> n / 2)
    Seq("count", "keyed_sum", "minmax_prune", "groupby_hour", "window_sliding",
        "topk").filter(f => famFilter.forall(_.contains(f))).foreach { fam =>
      val fn = famRanges.getOrElse(fam, n)
      graft.Graft.rewritesEnabled = true
      out(s"${fam}_on") = pcts(runFam(fam, fn))
      graft.Graft.rewritesEnabled = false
      out(s"${fam}_off") = pcts(runFam(fam, math.max(50, fn / 5)))
      graft.Graft.rewritesEnabled = true
    }

    // raw wheel reads (the layer the reference's µs numbers measure):
    // COUNT via the prefix/directory path, full multi-agg (count+sum+
    // min/max via the block tree)
    val rawN = n
    def rawPcts(f: (Long, Long) => Unit): Map[String, Double] = {
      (1 to 100).foreach { _ => val (a, b) = randRange(); f(a, b) }
      val xs = Array.fill(rawN) {
        val (a, b) = randRange()
        val t = System.nanoTime()
        f(a, b)
        (System.nanoTime() - t) / 1e3 // µs
      }
      val a = xs.sorted
      def at(q: Double) = a(math.min(a.length - 1, (q * a.length).toInt))
      Map("n" -> a.length.toDouble, "p50_us" -> at(0.50), "p99_us" -> at(0.99),
        "p999_us" -> at(0.999), "max_us" -> a.last, "mean_us" -> a.sum / a.length)
    }
    out("wheel_count_raw") = rawPcts((a, b) => { hw.countRange(a, b); () })
    val vw = graft.index.WheelRegistry.lookup(s"$sfDir/events.parquet")
      .flatMap(_.minMaxWheel("value")).map(_.wheel)
    vw.foreach { w => out("wheel_multiagg_raw") = rawPcts((a, b) => { w.range(a, b); () }) }
    // certified heavy-hitter read via the coarse-first descend path (this
    // round's sublinear rework; the per-second fold it replaced was linear
    // in active slots — ~290 ms for the contract week at sf0.1)
    graft.index.WheelRegistry.lookup(s"$sfDir/events.parquet")
      .flatMap(_.topKWheel("user_id")).foreach { tw =>
        out("wheel_topk_raw") = rawPcts((a, b) => { tw.topK(a, b, 5); () })
      }

    def j(m: Map[String, Double]): String =
      m.map { case (k, v) => s""""$k":${f"$v%.4f"}""" }.mkString("{", ",", "}")
    val scaleX = sys.env.getOrElse("SPARK_GRAFT_SCALE_X", "1")
    val json = out.map { case (k, v) => s""""$k":${j(v)}""" }
      .mkString(s"""{"sf":"$baseDir","scale_x":$scaleX,"ranges":$n,""", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath), json.getBytes)
    println(json)
    spark.stop()
    // a derived corpus is gigabytes at large xf — don't leak it into /tmp
    if (sfDir != baseDir) {
      import java.nio.file.{Files, Paths}
      import scala.jdk.CollectionConverters._
      val root = Paths.get(sfDir)
      Files.walk(root).iterator().asScala.toSeq.reverseIterator
        .foreach(p => try Files.deleteIfExists(p) catch { case _: Throwable => () })
    }
  }
}
