package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, Tables}
import graft.index.UWheelBuilder
import graft.wheel.WheelAggregators

/** `wheel_var_samp` / `wheel_var_pop` / `wheel_stddev_samp` /
  * `wheel_stddev_pop` SQL surface: the native aggregate's fold must produce
  * the same exact (n, Σx, Σx²) content as
  * [[WheelAggregators.MomentStats]] — and therefore the same stat, bit for
  * bit — and the [[graft.rules.UWheelRule]] rewrite must return exactly
  * what running the aggregate would. Moments are exact integers, so unlike
  * the sketch families these ARE oracle-checkable: the `uw_var_*` /
  * `uw_std_*` contract entries carry exact DuckDB integer-arithmetic
  * oracles. */
class MomentSqlSpec extends AnyFunSuite {

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
      .withMomentWheel("value")
      .withKeyedMomentWheel("value", "event_type = 'purchase'")
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
  val vcast = "CAST(value AS DECIMAL(18,2))"

  test("flat SQL fold equals the exact integer-moment formula") {
    setup
    Graft.rewritesEnabled = false
    val got = try spark.sql(
      s"""SELECT wheel_var_samp($vcast) AS vs, wheel_var_pop($vcast) AS vp,
         |       wheel_stddev_samp($vcast) AS ss, wheel_stddev_pop($vcast) AS sp
         |FROM events WHERE $range""".stripMargin).collect()(0)
    finally Graft.rewritesEnabled = true
    // independent exact computation: unscaled cents from the same cast
    val cents = spark.sql(s"SELECT CAST($vcast * 100 AS BIGINT) FROM events WHERE $range")
      .collect().map(_.getLong(0)).map(BigInt(_))
    val n = cents.length
    val sx = cents.sum
    val sxx = cents.map(c => c * c).sum
    val num = BigInt(n) * sxx - sx * sx
    val vs = num.doubleValue / (n.toLong * (n - 1L)).toDouble / 1e4
    val vp = num.doubleValue / (n.toLong * n.toLong).toDouble / 1e4
    assert(got.getDouble(0) === vs)
    assert(got.getDouble(1) === vp)
    assert(got.getDouble(2) === math.sqrt(vs))
    assert(got.getDouble(3) === math.sqrt(vp))
  }

  test("result is deterministic under repartitioning (exact moments are order-free)") {
    setup
    Graft.rewritesEnabled = false
    try {
      val base = Tables.events(spark, dir)
      val a = base.repartition(1).selectExpr(s"wheel_var_samp($vcast) AS v").collect()(0)
      val b = base.repartition(7).selectExpr(s"wheel_var_samp($vcast) AS v").collect()(0)
      assert(a === b)
    } finally Graft.rewritesEnabled = true
  }

  test("range query rewrites to LocalRelation and equals the scan, all four stats") {
    setup
    val sql =
      s"""SELECT wheel_var_samp($vcast) AS vs, wheel_var_pop($vcast) AS vp,
         |       wheel_stddev_samp($vcast) AS ss, wheel_stddev_pop($vcast) AS sp
         |FROM events WHERE $range""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("mixed wheel_var + COUNT + SUM rewrites as one local row") {
    setup
    val sql =
      s"""SELECT wheel_stddev_samp($vcast) AS sd, count(*) AS cnt,
         |       CAST(sum($vcast) AS DOUBLE) AS sv
         |FROM events WHERE $range""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("GROUP BY date_trunc(day) rewrites and equals the scan") {
    setup
    val sql =
      s"""SELECT date_trunc('day', ts) AS d, wheel_var_samp($vcast) AS v, count(*) AS cnt
         |FROM events WHERE $range GROUP BY 1 ORDER BY 1""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
    assert(on.length === 7)
  }

  test("GROUP BY window(): tumbling buckets read clipped moment merges") {
    setup
    val sql =
      s"""SELECT window.start AS ws, wheel_stddev_pop($vcast) AS sd
         |FROM events WHERE $range
         |GROUP BY window(ts, '1 day') ORDER BY 1""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("OR of disjoint windows merges moments additively") {
    setup
    val sql =
      s"""SELECT wheel_var_pop($vcast) AS v
         |FROM events
         |WHERE (ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-07 00:00:00')
         |   OR (ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00')""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("keyed residual routes to the keyed moment wheel") {
    setup
    val sql =
      s"SELECT wheel_var_samp($vcast) AS v FROM events WHERE $range AND event_type = 'purchase'"
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
    // a residual with no keyed wheel scans
    assertNotRewritten(spark.sql(
      s"SELECT wheel_var_samp($vcast) AS v FROM events WHERE $range AND event_type = 'click'"))
  }

  test("scale mismatch does NOT rewrite (different fixed-point, different rounding)") {
    setup
    val sql = s"SELECT wheel_var_samp(CAST(value AS DECIMAL(18,3))) AS v FROM events WHERE $range"
    assertNotRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq) // scan answers it either way
  }

  test("empty range lowers to NULL; single-row range to NULL var_samp but 0 var_pop") {
    setup
    val sqlEmpty = s"SELECT wheel_var_samp($vcast) AS v FROM events " +
      "WHERE ts >= TIMESTAMP '2030-01-01 00:00:00' AND ts < TIMESTAMP '2030-02-01 00:00:00'"
    val q = spark.sql(sqlEmpty)
    assertRewritten(q)
    val (on, off) = onOff(sqlEmpty)
    assert(on.toSeq === off.toSeq)
    assert(on(0).isNullAt(0))
    // exactly one row: find a single event's second and query just it
    val one = spark.sql(
      "SELECT CAST(date_trunc('second', ts) AS STRING) AS s FROM events ORDER BY ts LIMIT 1")
      .collect()(0).getString(0)
    val sqlOne =
      s"""SELECT wheel_var_samp($vcast) AS vs, wheel_var_pop($vcast) AS vp, count(*) AS c
         |FROM events WHERE ts >= TIMESTAMP '$one' AND ts < TIMESTAMP '$one' + INTERVAL 1 SECOND""".stripMargin
    val (on1, off1) = onOff(sqlOne)
    assert(on1.toSeq === off1.toSeq)
    if (on1(0).getLong(2) == 1L) {
      assert(on1(0).isNullAt(0))
      assert(on1(0).getDouble(1) === 0.0)
    }
  }

  test("DECIMAL source column: bare-column aggregate rewrites at the column's own scale") {
    setup
    // a decimal-typed twin of lineitem, moment wheel at the column scale
    val tmp = java.nio.file.Files.createTempDirectory("graft-moment-dec").toString
    val p = s"$tmp/li_dec.parquet"
    spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_shipdate", "CAST(l_quantity AS DECIMAL(12,2)) AS qty")
      .write.mode("overwrite").parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("li_mdec")
    UWheelBuilder("l_shipdate", Seq("qty")).withMomentWheel("qty").build(spark, p)
    val sql =
      """SELECT wheel_var_samp(qty) AS v, wheel_stddev_pop(qty) AS sd
        |FROM li_mdec
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("NaN in the column poisons the wheel (castFail) — never rewrites") {
    setup
    val tmp = java.nio.file.Files.createTempDirectory("graft-moment-nan").toString
    val p = s"$tmp/nan.parquet"
    spark.sql(
      """SELECT TIMESTAMP '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts,
        |       CASE WHEN id = 7 THEN CAST('NaN' AS DOUBLE) ELSE CAST(id AS DOUBLE) END AS v
        |FROM range(20)""".stripMargin)
      .write.mode("overwrite").parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("nan_t")
    UWheelBuilder("ts", Seq("v")).withMomentWheel("v").build(spark, p)
    assertNotRewritten(spark.sql(
      """SELECT wheel_var_samp(CAST(v AS DECIMAL(18,2))) AS x FROM nan_t
        |WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-01 00:01:00'""".stripMargin))
  }

  test("cast precision the absMax cannot prove safe does NOT rewrite") {
    setup
    // events values reach ~490: DECIMAL(4,2) holds < 100 — ANSI could throw
    assertNotRewritten(spark.sql(
      s"SELECT wheel_var_samp(CAST(value AS DECIMAL(4,2))) AS v FROM events WHERE $range"))
    // DECIMAL(7,2) holds < 100000 — provably safe, rewrites
    assertRewritten(spark.sql(
      s"SELECT wheel_var_samp(CAST(value AS DECIMAL(7,2))) AS v FROM events WHERE $range"))
  }

  test("GROUP BY bucket × key and key-only route to per-value keyed moment wheels") {
    setup
    val ets = Seq("click", "error", "purchase", "signup", "view")
    ets.foldLeft(
      ets.foldLeft(UWheelBuilder("ts", Seq("value"))) { (b, et) =>
        b.withKeyedWheel(graft.index.IndexBuilder("value", Some(s"event_type = '$et'")))
      }.withMomentWheel("value")) { (b, et) =>
        b.withKeyedMomentWheel("value", s"event_type = '$et'")
      }.build(spark, path)
    val bucketed =
      s"""SELECT date_trunc('day', ts) AS d, event_type AS et,
         |       wheel_var_samp($vcast) AS v, count(*) AS cnt
         |FROM events WHERE $range GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    assertRewritten(spark.sql(bucketed))
    val (on, off) = onOff(bucketed)
    assert(on.toSeq === off.toSeq)
    val keyOnly =
      s"""SELECT event_type, wheel_stddev_samp($vcast) AS sd, count(*) AS cnt
         |FROM events WHERE $range GROUP BY 1 ORDER BY 1""".stripMargin
    assertRewritten(spark.sql(keyOnly))
    val (on2, off2) = onOff(keyOnly)
    assert(on2.toSeq === off2.toSeq)
    assert(on2.length === 5)
  }

  test("randomized range sweep: rewrite equals scan on 25 random windows") {
    setup
    val rnd = new scala.util.Random(20260814L)
    val day0 = java.time.LocalDate.of(2024, 1, 1)
    (1 to 25).foreach { _ =>
      val a = rnd.nextInt(27)
      val b = a + 1 + rnd.nextInt(27 - a.min(26))
      val (h1, h2) = (rnd.nextInt(24), rnd.nextInt(24))
      val lo = s"${day0.plusDays(a)} ${"%02d".format(h1)}:00:00"
      val hi = s"${day0.plusDays(b)} ${"%02d".format(h2)}:00:00"
      val sql =
        s"""SELECT wheel_var_samp($vcast) AS v, wheel_stddev_pop($vcast) AS sd
           |FROM events WHERE ts >= TIMESTAMP '$lo' AND ts < TIMESTAMP '$hi'""".stripMargin
      val (on, off) = onOff(sql)
      assert(on.toSeq === off.toSeq, s"mismatch for [$lo, $hi)")
    }
  }
}
