package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, Tables}
import graft.index.UWheelBuilder
import graft.wheel.WheelAggregators

/** `hdr_quantile` SQL surface: the native aggregate's fold must produce the
  * same (bucket → count) content as [[WheelAggregators.HdrQuantile]] — and
  * therefore the same quantile — and the [[graft.rules.UWheelRule]] rewrite
  * must return exactly what running the aggregate would. That equality is
  * the soundness contract behind the `uw_quantile_*` contract entries,
  * which are rows-only (DuckDB cannot evaluate our sketch). */
class HdrSqlSpec extends AnyFunSuite {

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
      .withQuantileWheel("value")
      .withKeyedQuantileWheel("value", "event_type = 'purchase'")
      .build(spark, path)
  }

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

  test("flat SQL fold equals the library aggregator's arithmetic") {
    setup
    Graft.rewritesEnabled = false
    val got = try spark.sql(
      s"SELECT hdr_quantile(value, 0.95) AS p FROM events WHERE $range")
      .collect()(0).getDouble(0)
    finally Graft.rewritesEnabled = true
    val hdr = new WheelAggregators.HdrQuantile(7)
    val vals = spark.sql(s"SELECT value FROM events WHERE $range")
      .collect().map(_.getDouble(0))
    val part = vals.map(hdr.lift).reduce(hdr.combine)
    assert(got === hdr.quantileOf(part, 0.95).get)
    // ...which is the bucket floor of the exact nearest-rank quantile
    val sorted = vals.sorted
    val r = math.max(1, math.min(vals.length, math.ceil(0.95 * vals.length).toInt))
    assert(got === hdr.valueOf(hdr.bucketOf(sorted(r - 1))))
  }

  test("estimate is deterministic under repartitioning") {
    setup
    Graft.rewritesEnabled = false
    try {
      val base = Tables.events(spark, dir)
      val a = base.repartition(1).selectExpr("hdr_quantile(value, 0.5) AS p").collect()(0)
      val b = base.repartition(7).selectExpr("hdr_quantile(value, 0.5) AS p").collect()(0)
      assert(a === b)
    } finally Graft.rewritesEnabled = true
  }

  test("range query rewrites to LocalRelation and equals the scan") {
    setup
    val sql = s"SELECT hdr_quantile(value, 0.95) AS p95, hdr_quantile(value, 0.5) AS p50 FROM events WHERE $range"
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("mixed hdr_quantile + COUNT + SUM rewrites as one local row") {
    setup
    val sql =
      s"""SELECT hdr_quantile(value, 0.99) AS p99, count(*) AS cnt,
         |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
         |FROM events WHERE $range""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("GROUP BY date_trunc(day) rewrites and equals the scan") {
    setup
    val sql =
      s"""SELECT date_trunc('day', ts) AS d, hdr_quantile(value, 0.9) AS p90, count(*) AS cnt
         |FROM events WHERE $range GROUP BY 1 ORDER BY 1""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
    assert(on.length === 7)
  }

  test("GROUP BY window(): tumbling buckets read clipped bin merges") {
    setup
    val sql =
      s"""SELECT window.start AS ws, hdr_quantile(value, 0.5) AS p50
         |FROM events WHERE $range
         |GROUP BY window(ts, '1 day') ORDER BY 1""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("OR of disjoint windows merges bins additively") {
    setup
    val sql =
      """SELECT hdr_quantile(value, 0.75) AS p
        |FROM events
        |WHERE (ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-07 00:00:00')
        |   OR (ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00')""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("keyed residual routes to the keyed quantile wheel") {
    setup
    val sql =
      s"SELECT hdr_quantile(value, 0.9) AS p FROM events WHERE $range AND event_type = 'purchase'"
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
    // a residual with no keyed wheel scans
    assertNotRewritten(spark.sql(
      s"SELECT hdr_quantile(value, 0.9) AS p FROM events WHERE $range AND event_type = 'click'"))
  }

  test("resolution mismatch does NOT rewrite (different buckets, different answer)") {
    setup
    assertNotRewritten(spark.sql(
      s"SELECT hdr_quantile(value, 0.9, 9) AS p FROM events WHERE $range"))
  }

  test("empty range lowers to NULL like the aggregate over no rows") {
    setup
    val sql = "SELECT hdr_quantile(value, 0.5) AS p FROM events " +
      "WHERE ts >= TIMESTAMP '2030-01-01 00:00:00' AND ts < TIMESTAMP '2030-02-01 00:00:00'"
    val q = spark.sql(sql)
    assertRewritten(q)
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
    assert(on(0).isNullAt(0))
  }

  test("GROUP BY bucket × key and key-only route to per-value keyed quantile wheels") {
    setup
    val ets = Seq("click", "error", "purchase", "signup", "view")
    ets.foldLeft(
      ets.foldLeft(UWheelBuilder("ts", Seq("value"))) { (b, et) =>
        b.withKeyedWheel(graft.index.IndexBuilder("value", Some(s"event_type = '$et'")))
      }.withQuantileWheel("value")) { (b, et) =>
        b.withKeyedQuantileWheel("value", s"event_type = '$et'")
      }.build(spark, path)
    val bucketed =
      s"""SELECT date_trunc('day', ts) AS d, event_type AS et,
         |       hdr_quantile(value, 0.9) AS p90, count(*) AS cnt
         |FROM events WHERE $range GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    assertRewritten(spark.sql(bucketed))
    val (on, off) = onOff(bucketed)
    assert(on.toSeq === off.toSeq)
    val keyOnly =
      s"""SELECT event_type, hdr_quantile(value, 0.5) AS p50, count(*) AS cnt
         |FROM events WHERE $range GROUP BY 1 ORDER BY 1""".stripMargin
    assertRewritten(spark.sql(keyOnly))
    val (on2, off2) = onOff(keyOnly)
    assert(on2.toSeq === off2.toSeq)
    assert(on2.length === 5)
  }
}
