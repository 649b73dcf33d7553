package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, Tables}
import graft.index.UWheelBuilder
import graft.wheel.WheelAggregators

/** `hll_distinct` SQL surface: the native aggregate's flat fold must be
  * bit-identical to [[WheelAggregators.HllDistinct]], and the
  * [[graft.rules.UWheelRule]] rewrite must return exactly what running the
  * aggregate would — the contract that makes `uw_distinct_users` sound
  * without a DuckDB oracle (DuckDB can't evaluate our sketch). */
class HllSqlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  val path = s"$dir/events.parquet"

  lazy val setup: Unit = {
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)
    Tables.registerAll(spark, dir)
    // this suite's decline tests assume a MINIMAL registration (only the
    // 'purchase'-keyed family); batch builds LAYER over a same-fingerprint
    // entry since round 11, so explicitly withdraw whatever a richer suite
    // registered first — deregister + rebuild is the documented way to
    // narrow a registration
    graft.index.WheelRegistry.deregister(path)
    UWheelBuilder("ts", Seq("value"))
      .withDistinctWheel("user_id")
      .withKeyedDistinctWheel("user_id", "event_type = 'purchase'")
      .build(spark, path)
  }

  /** Runs `sql` with the rewrite rule on, then off; returns both results. */
  def onOff(sql: String): (Array[Row], Array[Row]) = {
    val on = spark.sql(sql).collect()
    Graft.rewritesEnabled = false
    val off = try spark.sql(sql).collect() finally Graft.rewritesEnabled = true
    (on, off)
  }

  def assertRewritten(df: DataFrame): Unit = {
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collect { case l: LocalRelation => l }.nonEmpty, s"no LocalRelation in:\n$opt")
    assert(opt.collect { case r: LogicalRelation => r }.isEmpty, s"scan survived in:\n$opt")
  }

  def assertNotRewritten(df: DataFrame): Unit = {
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collect { case r: LogicalRelation => r }.nonEmpty, s"expected scan in:\n$opt")
  }

  val range = "ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'"

  test("flat SQL fold is bit-identical to the library aggregator") {
    setup
    Graft.rewritesEnabled = false
    val got =
      try spark.sql("SELECT hll_distinct(user_id) AS du FROM events").collect()(0).getLong(0)
      finally Graft.rewritesEnabled = true
    val hll = new WheelAggregators.HllDistinct(11)
    val expected = hll.lower(
      Tables.events(spark, dir).select("user_id").where("user_id IS NOT NULL")
        .collect().map(_.getLong(0))
        .foldLeft(hll.identity)((acc, v) => hll.accumulate(acc, v)))
    assert(got === expected)
  }

  test("estimate is deterministic under repartitioning") {
    setup
    Graft.rewritesEnabled = false
    try {
      val e = Tables.events(spark, dir)
      val a = e.repartition(7).selectExpr("hll_distinct(user_id) AS du").collect()(0).getLong(0)
      val b = e.coalesce(1).selectExpr("hll_distinct(user_id) AS du").collect()(0).getLong(0)
      assert(a === b)
    } finally Graft.rewritesEnabled = true
  }

  test("range query rewrites to LocalRelation and bit-equals the scan") {
    setup
    val sql = s"SELECT hll_distinct(user_id) AS du FROM events WHERE $range"
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("GROUP BY date_trunc(day) rewrites and bit-equals the scan") {
    setup
    val sql =
      s"""SELECT date_trunc('day', ts) AS d, hll_distinct(user_id) AS du, count(*) AS cnt
         |FROM events WHERE $range GROUP BY 1 ORDER BY 1""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("sliding window x hll_distinct: trailing-window distinct users bit-equal the scan") {
    setup
    // THE dashboard shape: distinct users over a trailing 2-day window,
    // daily — per-bucket register merges clipped to the window's member
    // span, where the scan pays the Expand row multiplication
    val sql =
      s"""SELECT window.start AS ws, hll_distinct(user_id) AS du, count(*) AS cnt
         |FROM events WHERE $range
         |GROUP BY window(ts, '2 days', '1 day') ORDER BY 1""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
    // tumbling 6-hour buckets, same bit-equality
    val sql2 =
      s"""SELECT window.start AS ws, hll_distinct(user_id) AS du
         |FROM events WHERE $range
         |GROUP BY window(ts, '6 hours') ORDER BY 1""".stripMargin
    assertRewritten(spark.sql(sql2))
    val (on2, off2) = onOff(sql2)
    assert(on2.toSeq === off2.toSeq)
  }

  test("OR of disjoint windows merges registers exactly") {
    setup
    val sql =
      """SELECT hll_distinct(user_id) AS du FROM events
        |WHERE (ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-07 00:00:00')
        |   OR (ts >= TIMESTAMP '2024-02-01 00:00:00' AND ts < TIMESTAMP '2024-02-03 00:00:00')""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("calendar GROUP BY month buckets read per-bucket register unions") {
    setup
    val sql =
      """SELECT date_trunc('month', ts) AS m, hll_distinct(user_id) AS du
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("precision mismatch does NOT rewrite (different registers, different estimate)") {
    setup
    val q = spark.sql(s"SELECT hll_distinct(user_id, 12) AS du FROM events WHERE $range")
    assertNotRewritten(q)
    assert(q.collect()(0).getLong(0) > 0)
  }

  test("residual predicate without a keyed distinct wheel does NOT rewrite") {
    setup
    val q = spark.sql(
      s"SELECT hll_distinct(user_id) AS du FROM events WHERE $range AND event_type = 'click'")
    assertNotRewritten(q)
  }

  test("keyed distinct wheel: residual predicate routes to its registers") {
    setup
    val sql =
      s"""SELECT hll_distinct(user_id) AS du FROM events
         |WHERE $range AND event_type = 'purchase'""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
    // keyed group-by composes too: buckets enumerate from the keyed
    // numeric wheel set? none here — the Nil-group path is the contract;
    // conjunct order must not matter for the canonical key
    val sql2 =
      s"""SELECT hll_distinct(user_id) AS du FROM events
         |WHERE event_type = 'purchase' AND $range""".stripMargin
    assertRewritten(spark.sql(sql2))
    val (on2, off2) = onOff(sql2)
    assert(on2.toSeq === off2.toSeq)
  }

  test("span-coarsened distinct wheel only serves span-aligned bounds") {
    setup
    import spark.implicits._
    // own table: a coarse build on the shared events path would replace its
    // per-second index for the rest of the suite
    val tmp = java.nio.file.Files.createTempDirectory("graft-hll-span").toString + "/t.parquet"
    def row(s: String, u: Long) = (java.sql.Timestamp.valueOf(s), u, 1.0)
    (Seq(row("2024-04-01 00:00:10", 1), row("2024-04-01 00:00:50", 2),
      row("2024-04-01 00:01:10", 3), row("2024-04-01 00:02:40", 4),
      row("2024-04-01 00:03:20", 1))).toDF("ts", "uid", "value")
      .write.mode("overwrite").parquet(tmp)
    UWheelBuilder("ts", Seq("value")).withSlotSpan(60L).withDistinctWheel("uid")
      .build(spark, tmp)
    spark.read.parquet(tmp).createOrReplaceTempView("hll_span_t")
    // minute-aligned: rewrites and bit-equals the scan
    val aligned =
      """SELECT hll_distinct(uid) AS du FROM hll_span_t
        |WHERE ts >= TIMESTAMP '2024-04-01 00:01:00'
        |  AND ts < TIMESTAMP '2024-04-01 00:03:00'""".stripMargin
    assertRewritten(spark.sql(aligned))
    val (on, off) = onOff(aligned)
    assert(on.toSeq === off.toSeq)
    // sub-minute bound: the coarse register slots cannot answer it exactly
    // — must fall back to the scan (registers are minute-combined; an
    // unaligned clip would include/exclude whole slots of users)
    val unaligned =
      """SELECT hll_distinct(uid) AS du FROM hll_span_t
        |WHERE ts >= TIMESTAMP '2024-04-01 00:00:30'
        |  AND ts < TIMESTAMP '2024-04-01 00:03:00'""".stripMargin
    assertNotRewritten(spark.sql(unaligned))
    val (on2, off2) = onOff(unaligned)
    assert(on2.toSeq === off2.toSeq)
  }

  test("non-integral input is rejected at analysis") {
    setup
    val e = intercept[Exception] {
      spark.sql("SELECT hll_distinct(event_type) FROM events").collect()
    }
    assert(e.getMessage.toLowerCase.contains("integral") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"))
  }

  test("mixed hll_distinct + COUNT + SUM rewrites as one local row") {
    setup
    val sql =
      s"""SELECT hll_distinct(user_id) AS du, count(*) AS cnt,
         |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
         |FROM events WHERE $range""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("GROUP BY bucket × key: hll_distinct answers from per-value keyed distinct wheels") {
    setup
    // the complete per-value set the multi-column arm requires: keyed
    // numeric wheels (for the counting proof) + keyed distinct wheels
    // (for the per-(bucket, value) register reads)
    val ets = Seq("click", "error", "purchase", "signup", "view")
    ets.foldLeft(
      ets.foldLeft(UWheelBuilder("ts", Seq("value"))) { (b, et) =>
        b.withKeyedWheel(graft.index.IndexBuilder("value", Some(s"event_type = '$et'")))
      }.withDistinctWheel("user_id")) { (b, et) =>
        b.withKeyedDistinctWheel("user_id", s"event_type = '$et'")
      }.build(spark, path)
    val sql =
      s"""SELECT date_trunc('day', ts) AS d, event_type AS et,
         |       hll_distinct(user_id) AS du, count(*) AS cnt
         |FROM events WHERE $range GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
    assert(on.length > 5, "expected multiple (day, event_type) groups")
  }

  test("GROUP BY key only: hll_distinct per value bit-equals the scan") {
    setup
    // same complete per-value fixture as the bucket × key test (suite
    // order guarantees it exists; rebuilding is idempotent)
    val ets = Seq("click", "error", "purchase", "signup", "view")
    ets.foldLeft(
      ets.foldLeft(UWheelBuilder("ts", Seq("value"))) { (b, et) =>
        b.withKeyedWheel(graft.index.IndexBuilder("value", Some(s"event_type = '$et'")))
      }.withDistinctWheel("user_id")) { (b, et) =>
        b.withKeyedDistinctWheel("user_id", s"event_type = '$et'")
      }.build(spark, path)
    val sql =
      s"""SELECT event_type, hll_distinct(user_id) AS du, count(*) AS cnt
         |FROM events WHERE $range GROUP BY 1 ORDER BY 1""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
    assert(on.length === 5)
  }
}
