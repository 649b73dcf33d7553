package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{UWheelBuilder, UWheelIndex}
import graft.index.UWheelIndex.RefreshOutcome

/** Millisecond bottom-level wheels (`UWheelBuilder.withMillisWheels`) —
  * beyond the reference, whose finest wheel level is the second
  * (`/root/reference/datafusion-uwheel/src/index/mod.rs:168-181`):
  * sub-second `window(ts, …)` group-bys rewrite to O(1) per-bucket reads
  * over a HawWheel whose tick unit is the epoch MILLISECOND, instead of
  * paying the scan's Expand row multiplication. The corpus here carries a
  * sub-MILLISECOND (µs) component on every row, so bucket membership
  * genuinely exercises the µs→ms floor, and every comparison against the
  * rule-disabled scan is bit-for-bit (sums go through DECIMAL).
  */
class MsWheelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic µs-precision corpus: 4000 rows over ~52 minutes, every
    * row with a nonzero sub-ms component (i*137 mod 997 µs ≠ 0 for i > 0 is
    * not guaranteed — but ≥ 99.7 % of rows carry one, which is what the
    * floor test needs). Values are exact at scale 2 (k/100 doubles
    * round-trip through DECIMAL), so SUM/plain-double paths stay exact. */
  private def mkRows(n: Int, baseUs: Long) = (0 until n).map { i =>
    val us = baseUs + i.toLong * 777111L + (i * 137 % 997)
    (us, (i % 7).toDouble + (i % 100).toDouble / 100.0,
      if (i % 3 == 0) "click" else "view", (i % 50).toLong)
  }

  private def writeUs(p: String, rows: Seq[(Long, Double, String, Long)],
      append: Boolean = false): Unit = {
    import spark.implicits._
    rows.toDF("us", "value", "event_type", "user_id")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("value"), col("event_type"), col("user_id"))
      .repartition(2)
      .write.mode(if (append) "append" else "overwrite").parquet(p)
  }

  val baseUs = 1704708000000000L // 2024-01-08 10:00:00 UTC, µs

  lazy val basePath: String = {
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-ms").toString
    val p = s"$dir/events_us.parquet"
    writeUs(p, mkRows(4000, baseUs))
    UWheelBuilder("ts", Seq("value")).withMillisWheels("value").build(spark, p)
    p
  }
  def ev: DataFrame = spark.read.parquet(basePath)

  /** Second-aligned WHERE range inside the data span. */
  def ranged(df: DataFrame): DataFrame =
    df.filter(col("ts") >= lit("2024-01-08 10:10:00").cast("timestamp_ntz") &&
      col("ts") < lit("2024-01-08 10:40:00").cast("timestamp_ntz"))

  def assertRewritten(df: DataFrame): Unit = {
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collect { case l: LocalRelation => l }.nonEmpty, s"no LocalRelation in:\n$opt")
    assert(opt.collect { case r: LogicalRelation => r }.isEmpty, s"scan survived in:\n$opt")
  }
  def assertNotRewritten(df: DataFrame): Unit = {
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collect { case r: LogicalRelation => r }.nonEmpty, s"expected scan in:\n$opt")
  }
  def groundTruth[T](q: => T): T = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cs.experimental.extraOptimizations
    cs.experimental.extraOptimizations = Nil
    try q finally cs.experimental.extraOptimizations = saved
  }
  def rows(df: DataFrame): Seq[String] = df.collect().map(_.toString).toSeq.sorted

  /** count + decimal-exact sum + min/max under the given window args. */
  private def wq(df: DataFrame, len: String, slide: String): DataFrame =
    df.groupBy(window(col("ts"), len, slide))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).as("s"),
        min("value").as("mn"), max("value").as("mx"))
      .select(col("window.start").as("ws"), col("cnt"), col("s"), col("mn"), col("mx"))

  test("sub-second sliding window rewrites from the ms wheel, bit-exactly") {
    basePath
    val q = wq(ranged(ev), "1 second", "500 milliseconds")
    assertRewritten(q)
    assert(rows(q) === groundTruth(rows(wq(ranged(ev), "1 second", "500 milliseconds"))))
  }

  test("sub-second tumbling window (unaligned 250 ms) rewrites, bit-exactly") {
    basePath
    val q = wq(ranged(ev), "250 milliseconds", "250 milliseconds")
    assertRewritten(q)
    assert(rows(q) ===
      groundTruth(rows(wq(ranged(ev), "250 milliseconds", "250 milliseconds"))))
  }

  test("non-exact cover (len not a slide multiple) consumes the trim, exactly") {
    basePath
    // 1100 ms members over a 500 ms stride: the analyzer emits 3 Expand
    // copies plus the trimming filter; the arm reads [b, b+1100ms) per
    // bucket — all whole-ms, so the ms wheel serves it
    val q = wq(ranged(ev), "1100 milliseconds", "500 milliseconds")
    assertRewritten(q)
    assert(rows(q) ===
      groundTruth(rows(wq(ranged(ev), "1100 milliseconds", "500 milliseconds"))))
  }

  test("whole-range (no WHERE) sub-second window rewrites over the wheel extent") {
    basePath
    val q = wq(ev, "500 milliseconds", "500 milliseconds")
    assertRewritten(q)
    assert(rows(q) ===
      groundTruth(rows(wq(ev, "500 milliseconds", "500 milliseconds"))))
  }

  test("sub-MILLISECOND strides decline: the ms level is the bottom") {
    basePath
    assertNotRewritten(wq(ranged(ev), "500 microseconds", "500 microseconds"))
  }

  test("residual predicates decline: ms wheels are unfiltered") {
    basePath
    val q = wq(ranged(ev).filter(col("event_type") === "click"),
      "500 milliseconds", "500 milliseconds")
    assertNotRewritten(q)
  }

  test("hll_distinct declines in the ms domain: no ms register wheels") {
    basePath
    val q = ranged(ev)
      .groupBy(window(col("ts"), "500 milliseconds"))
      .agg(expr("hll_distinct(user_id)").as("du"))
    assertNotRewritten(q)
  }

  test("a table built WITHOUT ms wheels declines sub-second windows") {
    basePath
    val dir = java.nio.file.Files.createTempDirectory("graft-ms-none").toString
    val p = s"$dir/events_us.parquet"
    writeUs(p, mkRows(500, baseUs))
    UWheelBuilder("ts", Seq("value")).build(spark, p)
    val df = spark.read.parquet(p)
    assertNotRewritten(wq(df, "500 milliseconds", "500 milliseconds"))
    // …while second-aligned windows still rewrite from the second wheels
    assertRewritten(wq(df, "2 seconds", "1 second"))
  }

  test("instant (TimestampType) columns get ms wheels too") {
    basePath
    val dir = java.nio.file.Files.createTempDirectory("graft-ms-inst").toString
    val p = s"$dir/events_inst.parquet"
    import spark.implicits._
    mkRows(2000, baseUs).toDF("us", "value", "event_type", "user_id")
      .select(timestamp_micros(col("us")).as("ts"), col("value"))
      .write.mode("overwrite").parquet(p)
    UWheelBuilder("ts", Seq("value")).withMillisWheels("value").build(spark, p)
    val df = spark.read.parquet(p)
    val q = wq(df, "1 second", "500 milliseconds")
    assertRewritten(q)
    assert(rows(q) === groundTruth(rows(wq(df, "1 second", "500 milliseconds"))))
  }

  test("refresh append-merges ms wheels; the merged index answers exactly") {
    basePath
    val dir = java.nio.file.Files.createTempDirectory("graft-ms-ref").toString
    val p = s"$dir/events_us.parquet"
    writeUs(p, mkRows(1500, baseUs))
    UWheelBuilder("ts", Seq("value")).withMillisWheels("value").build(spark, p)
    // append ~19 minutes of later rows, then refresh
    writeUs(p, mkRows(1500, baseUs + 1500L * 777111L), append = true)
    val out = UWheelIndex.refresh(spark, p)
    assert(out.isInstanceOf[RefreshOutcome.Appended])
    val df = spark.read.parquet(p)
    val q = wq(df, "500 milliseconds", "500 milliseconds")
    assertRewritten(q)
    assert(rows(q) === groundTruth(rows(wq(df, "500 milliseconds", "500 milliseconds"))))
  }

  test("scalar aggregates over ms-aligned WHERE bounds rewrite from the ms wheel") {
    basePath
    def q(df: DataFrame): DataFrame = df.filter(
      col("ts") >= lit("2024-01-08 10:10:00.25").cast("timestamp_ntz") &&
        col("ts") < lit("2024-01-08 10:40:00.75").cast("timestamp_ntz"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).as("s"),
        min("value").as("mn"), max("value").as("mx"))
    assertRewritten(q(ev))
    assert(rows(q(ev)) === groundTruth(rows(q(ev))))
  }

  test("strict operators are µs-exact: ts > '…499999' lands ms-aligned and rewrites") {
    basePath
    // ts > a ⇔ ts >= a+1µs; .499999 + 1µs = .5 — exact at the ms tick
    def q(df: DataFrame): DataFrame = df.filter(
      col("ts") > lit("2024-01-08 10:10:00.499999").cast("timestamp_ntz") &&
        col("ts") <= lit("2024-01-08 10:40:00.249999").cast("timestamp_ntz"))
      .agg(count(lit(1)).as("cnt"), min("value").as("mn"))
    assertRewritten(q(ev))
    assert(rows(q(ev)) === groundTruth(rows(q(ev))))
  }

  test("OR of ms-aligned windows merges additively in the ms domain") {
    basePath
    def q(df: DataFrame): DataFrame = df.filter(
      (col("ts") >= lit("2024-01-08 10:05:00.5").cast("timestamp_ntz") &&
        col("ts") < lit("2024-01-08 10:15:00.5").cast("timestamp_ntz")) ||
        (col("ts") >= lit("2024-01-08 10:30:00.25").cast("timestamp_ntz") &&
          col("ts") < lit("2024-01-08 10:45:00").cast("timestamp_ntz")))
      .agg(count(lit(1)).as("cnt"), max("value").as("mx"))
    assertRewritten(q(ev))
    assert(rows(q(ev)) === groundTruth(rows(q(ev))))
  }

  test("the ms scalar retry is scalar-only: grouped queries with ms bounds decline") {
    basePath
    val q = ev.filter(
      col("ts") >= lit("2024-01-08 10:10:00.25").cast("timestamp_ntz") &&
        col("ts") < lit("2024-01-08 10:40:00").cast("timestamp_ntz"))
      .groupBy(date_trunc("minute", col("ts")).as("m"))
      .agg(count(lit(1)).as("cnt"))
    assertNotRewritten(q)
  }

  test("sub-ms (µs) WHERE bounds decline even with ms wheels present") {
    basePath
    val q = ev.filter(
      col("ts") >= lit("2024-01-08 10:10:00.0005").cast("timestamp_ntz") &&
        col("ts") < lit("2024-01-08 10:40:00").cast("timestamp_ntz"))
      .agg(count(lit(1)).as("cnt"))
    assertNotRewritten(q)
  }

  test("indexUsageBytes counts the ms family once despite the shared count alias") {
    basePath
    val t = graft.index.WheelRegistry.lookup(basePath).get
    assert(t.allMsWheels.nonEmpty)
    // count wheel aliases the value wheel's HawWheel — distinct-counted
    val msBytes = t.allMsWheels.map(_.wheel).distinct.map(_.sizeBytes).sum
    assert(msBytes > 0)
    assert(t.indexUsageBytes >= msBytes)
  }

  test("per-family byte attribution partitions the total, shared wheels under numeric") {
    basePath
    val t = graft.index.WheelRegistry.lookup(basePath).get
    val byFam = t.indexUsageBytesByFamily
    // the split is a PARTITION of the measured total (no double counting,
    // nothing dropped) — the property the bench's index_mib_events_<family>
    // rows rely on to attribute round-over-round growth
    assert(byFam.values.sum === t.indexUsageBytes)
    assert(byFam.values.forall(_ >= 0L))
    assert(byFam("numeric") > 0L)
    // a HawWheel serving both a numeric wheel and an ms registration counts
    // once, under numeric: the ms entry prices only ms-ONLY wheels
    val numericSet = t.allWheels.map(_.wheel).toSet
    val msShared = t.allMsWheels.map(_.wheel).filter(numericSet.contains)
    if (msShared.nonEmpty) {
      val msOnlyBytes = t.allMsWheels.map(_.wheel).distinct
        .filterNot(numericSet.contains).map(_.sizeBytes).sum
      assert(byFam("ms") === msOnlyBytes)
    }
  }
}
