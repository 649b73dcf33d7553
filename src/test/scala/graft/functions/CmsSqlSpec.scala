package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Graft
import graft.index.{UWheelBuilder, UWheelIndex}
import graft.index.UWheelIndex.RefreshOutcome
import graft.wheel.WheelAggregators

/** `cms_freq(key, target)` — the Count-Min point-frequency aggregate and
  * its frequency-sketch wheel rewrite arms. Every comparison is
  * bit-for-bit against the UN-rewritten aggregate over the same rows
  * (they share hashing, additive merges, and the min-lowering — identical
  * content by construction), plus declines for mismatched parameters and
  * unbuilt wheels. Runs on its own temp corpus so no other suite's index
  * registration interferes. */
class CmsSqlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** ~69 hours of per-50s events; user ids skewed (user u appears ∝ its
    * id class), event types cycling — so keyed and per-value routing have
    * real residual structure. */
  private def mkRows(n: Int, i0: Int = 0) = (i0 until i0 + n).map { i =>
    (1704067200L + i.toLong * 50L,
      (i % 97).toLong + (if (i % 3 == 0) 0L else 1000L),
      if (i % 4 == 0) "click" else "view")
  }

  private def write(p: String, rows: Seq[(Long, Long, String)], append: Boolean = false): Unit = {
    import spark.implicits._
    rows.toDF("sec", "user_id", "event_type")
      .select(timestamp_seconds(col("sec")).as("ts"), col("user_id"), col("event_type"))
      .repartition(3)
      .write.mode(if (append) "append" else "overwrite").parquet(p)
  }

  lazy val path: String = {
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-cms").toString
    val p = s"$dir/clicks.parquet"
    write(p, mkRows(5000))
    UWheelBuilder("ts")
      .withFreqWheel("user_id")
      .withKeyedFreqWheel("user_id", "event_type = 'click'")
      .build(spark, p)
    p
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

  private def view(): Unit = {
    path
    spark.read.parquet(path).createOrReplaceTempView("clicks")
  }

  def onOff(sql: String): (Seq[Row], Seq[Row]) = {
    val on = spark.sql(sql).collect().toSeq
    Graft.rewritesEnabled = false
    val off = try spark.sql(sql).collect().toSeq finally Graft.rewritesEnabled = true
    (on, off)
  }

  val range = "ts >= TIMESTAMP '2024-01-01 08:00:00' AND ts < TIMESTAMP '2024-01-03 16:00:00'"

  test("flat SQL fold equals the library aggregator's arithmetic, and bounds the truth") {
    view()
    Graft.rewritesEnabled = false
    try {
      val got = spark.sql(s"SELECT cms_freq(user_id, 42) AS f FROM clicks WHERE $range")
        .collect()(0).getLong(0)
      val cms = new WheelAggregators.CmsFreq(4, 12)
      val keys = spark.sql(s"SELECT user_id FROM clicks WHERE $range")
        .collect().map(_.getLong(0))
      val part = keys.foldLeft(cms.identity)((p, x) => cms.combine(p, cms.lift(x)))
      assert(got === cms.freqOf(part, 42L))
      assert(got >= keys.count(_ == 42L).toLong) // one-sided error
    } finally Graft.rewritesEnabled = true
  }

  test("range query rewrites to LocalRelation and equals the scan") {
    view()
    val sql = s"SELECT cms_freq(user_id, 42) AS f42, cms_freq(user_id, 1007) AS f1007, count(*) AS cnt FROM clicks WHERE $range"
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on === off)
  }

  test("GROUP BY date_trunc(day) rewrites and equals the scan") {
    view()
    val sql =
      s"""SELECT date_trunc('day', ts) AS d, cms_freq(user_id, 42) AS f, count(*) AS cnt
         |FROM clicks WHERE $range GROUP BY 1 ORDER BY 1""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on === off)
  }

  test("window() tumbling buckets rewrite and equal the scan") {
    view()
    val sql =
      s"""SELECT window.start AS ws, cms_freq(user_id, 7) AS f
         |FROM clicks WHERE $range GROUP BY window(ts, '6 hours') ORDER BY 1""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on === off)
  }

  test("keyed residual routes to the keyed frequency wheel") {
    view()
    val sql = s"SELECT cms_freq(user_id, 12) AS f FROM clicks WHERE $range AND event_type = 'click'"
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on === off)
  }

  test("OR-union of disjoint ranges merges counter reads additively") {
    view()
    val sql =
      """SELECT cms_freq(user_id, 42) AS f FROM clicks
        |WHERE (ts >= TIMESTAMP '2024-01-01 02:00:00' AND ts < TIMESTAMP '2024-01-01 10:00:00')
        |   OR (ts >= TIMESTAMP '2024-01-02 00:00:00' AND ts < TIMESTAMP '2024-01-02 06:00:00')""".stripMargin
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on === off)
  }

  test("mismatched counter matrix or unbuilt residual declines") {
    view()
    // wheel is (logW=12, d=4): other parameters must scan
    assertNotRewritten(spark.sql(
      s"SELECT cms_freq(user_id, 42, 10) AS f FROM clicks WHERE $range"))
    assertNotRewritten(spark.sql(
      s"SELECT cms_freq(user_id, 42, 12, 2) AS f FROM clicks WHERE $range"))
    // no keyed wheel for this residual
    assertNotRewritten(spark.sql(
      s"SELECT cms_freq(user_id, 42) AS f FROM clicks WHERE $range AND event_type = 'view'"))
    // the declined forms still answer correctly through the scan
    val (on, off) = onOff(
      s"SELECT cms_freq(user_id, 42, 10) AS f FROM clicks WHERE $range")
    assert(on === off)
  }

  test("per-value routing: bucket x key and key-only group-bys read keyed counter wheels") {
    // the multi-column arms route cms_freq per key value when EVERY value
    // has a keyed counter wheel (keyEq-matched), under the same counting
    // proof as the numeric per-value sets — so build per-value numeric
    // wheels (proof anchors + bucket enumeration) AND per-value cms wheels
    val dir = java.nio.file.Files.createTempDirectory("graft-cms-pv").toString
    val p = s"$dir/clicks.parquet"
    write(p, mkRows(4000))
    Seq("click", "view").foldLeft(
      graft.index.UWheelBuilder("ts").withFreqWheel("user_id")) { (b, et) =>
      b.withKeyedWheel(graft.index.IndexBuilder("user_id", Some(s"event_type = '$et'")))
        .withKeyedFreqWheel("user_id", s"event_type = '$et'")
    }.build(spark, p)
    spark.read.parquet(p).createOrReplaceTempView("clicks_pv")
    def check(sql: String): Unit = {
      assertRewritten(spark.sql(sql))
      val (on, off) = onOff(sql)
      assert(on === off, sql)
    }
    check(
      s"""SELECT date_trunc('day', ts) AS d, event_type AS et,
         |       cms_freq(user_id, 42) AS f, count(*) AS cnt
         |FROM clicks_pv WHERE $range GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    check(
      s"""SELECT event_type AS et, cms_freq(user_id, 42) AS f, count(*) AS cnt
         |FROM clicks_pv WHERE $range GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  test("incremental refresh append-merges the counter wheels, bit-identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cms-ref").toString
    val p = s"$dir/clicks.parquet"
    write(p, mkRows(3000))
    UWheelBuilder("ts")
      .withFreqWheel("user_id")
      .withKeyedFreqWheel("user_id", "event_type = 'click'")
      .build(spark, p)
    write(p, mkRows(1500, i0 = 3000), append = true)
    assert(UWheelIndex.refresh(spark, p).isInstanceOf[RefreshOutcome.Appended])
    spark.read.parquet(p).createOrReplaceTempView("clicks_ref")
    val sql = s"SELECT cms_freq(user_id, 42) AS f, cms_freq(user_id, 1033) AS g FROM clicks_ref WHERE $range"
    assertRewritten(spark.sql(sql))
    val (on, off) = onOff(sql)
    assert(on === off)
    val keyed = s"SELECT cms_freq(user_id, 42) AS f FROM clicks_ref WHERE $range AND event_type = 'click'"
    assertRewritten(spark.sql(keyed))
    val (kon, koff) = onOff(keyed)
    assert(kon === koff)
  }
}
