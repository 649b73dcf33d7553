package graft.rules

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, Tables}
import graft.index.{IndexBuilder, UWheelBuilder}

/** FILTER (WHERE p) clauses and `CASE WHEN p THEN x [ELSE NULL]` aggregate
  * children route to KEYED wheels — the multi-metric dashboard row
  * ("clicks, views, purchases in ONE query") answered from per-predicate
  * wheels at plan time. The per-need key is the WHERE residual merged with
  * the aggregate's own predicate, in the same canonical form the build
  * side registers; unmatched predicates decline to the scan. */
class FilterAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  val path = s"$dir/events.parquet"
  val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  lazy val setup: Unit = {
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)
    Tables.registerAll(spark, dir)
    val numeric = eventTypes.foldLeft(UWheelBuilder("ts", Seq("value"))) { (b, et) =>
      b.withKeyedWheel(IndexBuilder("value", Some(s"event_type = '$et'")))
    }
    eventTypes.foldLeft(
      eventTypes.foldLeft(
        numeric.withDistinctWheel("user_id").withQuantileWheel("value")
          .withMomentWheel("value")) { (b, et) =>
        b.withKeyedDistinctWheel("user_id", s"event_type = '$et'")
          .withKeyedMomentWheel("value", s"event_type = '$et'")
      }) { (b, et) =>
      b.withKeyedQuantileWheel("value", s"event_type = '$et'")
    }.build(spark, path)
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

  test("multi-metric dashboard row: counts per FILTER predicate in one query") {
    setup
    val sql =
      s"""SELECT count(*) FILTER (WHERE event_type = 'click') AS clicks,
         |       count(*) FILTER (WHERE event_type = 'view') AS views,
         |       count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
         |       count(*) AS total
         |FROM events WHERE $range""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
    val r = on(0)
    assert(r.getLong(3) >= r.getLong(0) + r.getLong(1) + r.getLong(2))
  }

  test("FILTER composes every keyed family: sum, min/max, hll, hdr, moments") {
    setup
    val sql =
      s"""SELECT CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS s,
         |       min(value) FILTER (WHERE event_type = 'click') AS mn,
         |       max(value) FILTER (WHERE event_type = 'click') AS mx,
         |       hll_distinct(user_id) FILTER (WHERE event_type = 'click') AS du,
         |       hdr_quantile(value, 0.9) FILTER (WHERE event_type = 'click') AS p90,
         |       wheel_var_samp(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'click') AS vs
         |FROM events WHERE $range""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("CASE WHEN p THEN x inside SUM/COUNT routes like FILTER") {
    setup
    val sql =
      s"""SELECT CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s,
         |       count(CASE WHEN event_type = 'view' THEN 1 END) AS views,
         |       count(*) AS total
         |FROM events WHERE $range""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("CASE WHEN with a non-null ELSE stays on the scan (different zero-match semantics)") {
    setup
    val sql =
      s"""SELECT CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2))
         |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS s
         |FROM events WHERE $range""".stripMargin
    assertNotRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("GROUP BY hour + FILTER: buckets with zero matching rows read as empty") {
    setup
    // ~3 purchases/hour at sf0.001 — some hour buckets hold none; those
    // rows must show count 0 / sum NULL, exactly like the scan
    val sql =
      s"""SELECT date_trunc('hour', ts) AS h,
         |       count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
         |       count(*) AS total
         |FROM events WHERE $range GROUP BY 1 ORDER BY 1""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
    assert(on.exists(_.getLong(1) == 0L), "fixture should include an empty purchase hour")
  }

  test("WHERE residual + FILTER on the same predicate collapses to one key") {
    setup
    val sql =
      s"""SELECT count(*) FILTER (WHERE event_type = 'click') AS c, count(*) AS t
         |FROM events WHERE $range AND event_type = 'click'""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
    assert(on(0).getLong(0) === on(0).getLong(1))
  }

  test("unindexed FILTER predicates decline to the scan, equal either way") {
    setup
    for (sql <- Seq(
      s"SELECT count(*) FILTER (WHERE value > 10.0) AS c FROM events WHERE $range",
      s"SELECT count(*) FILTER (WHERE event_type = 'click' AND value > 10.0) AS c FROM events WHERE $range",
      // residual + DIFFERENT filter pred: would need a (q AND p) wheel
      s"SELECT count(*) FILTER (WHERE event_type = 'click') AS c FROM events WHERE $range AND event_type = 'view'")) {
      assertNotRewritten(spark.sql(sql))
      val (on, off) = onOff(sql)
      assert(on.toSeq === off.toSeq, sql)
    }
  }

  test("count(DISTINCT) with FILTER declines") {
    setup
    val sql =
      s"SELECT count(DISTINCT user_id) FILTER (WHERE event_type = 'click') AS d FROM events WHERE $range"
    assertNotRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }

  test("window() buckets + FILTER sum equals the scan") {
    setup
    val sql =
      s"""SELECT window.start AS ws,
         |       CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'error') AS DOUBLE) AS errs,
         |       count(*) AS total
         |FROM events WHERE $range GROUP BY window(ts, '12 hours') ORDER BY 1""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on.toSeq === off.toSeq)
  }
}
