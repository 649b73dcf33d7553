package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{UWheelBuilder, UWheelIndex}
import graft.index.UWheelIndex.RefreshOutcome

/** Derived-EXPRESSION measure wheels (`UWheelBuilder.withExprWheel`) —
  * beyond the reference, which only indexes bare numeric columns
  * (`/root/reference/datafusion-uwheel/src/index/mod.rs:42-182`): the TPC-H
  * revenue shape `sum(l_extendedprice * (1 - l_discount))` answers from one
  * O(1) wheel read. The wheel registers under the expression's canonical
  * Catalyst form, so a query's aggregate child routes to it through the
  * same machinery as named columns — every bucket arm, keyed residuals,
  * OR unions, and the exactness gates included. */
class ExprWheelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 2-dec price × 2-dec discount corpus over ~125 days (multi-month so
    * calendar buckets are plural). The product has exactly 4 decimals as a
    * rational; `value` is engineered so value/3.0 is NOT representable at
    * any decimal scale (the decline probe). */
  private def mkRows(n: Int, i0: Int = 0) = (i0 until i0 + n).map { i =>
    val sec = 1704067200L + i.toLong * 2700 // 2024-01-01 + i*45min
    ((1000 + i * 7 % 9000).toDouble / 100.0, // price: 10.00 .. 99.93
      (i % 11).toDouble / 100.0,             // disc: 0.00 .. 0.10
      if (i % 4 == 0) "R" else "N",
      (i % 50).toDouble,                     // qty: integer-valued
      1.0,                                   // value: 1/3 is non-terminating
      (i % 37).toLong,                       // uid: integral key
      sec)
  }

  private def write(p: String,
      rows: Seq[(Double, Double, String, Double, Double, Long, Long)],
      append: Boolean = false): Unit = {
    import spark.implicits._
    rows.toDF("price", "disc", "flag", "qty", "value", "uid", "sec")
      .select(timestamp_seconds(col("sec")).as("ts"),
        col("price"), col("disc"), col("flag"), col("qty"), col("value"), col("uid"))
      .repartition(2)
      .write.mode(if (append) "append" else "overwrite").parquet(p)
  }

  val rev = "price * (1 - disc)"

  lazy val path: String = {
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-expr").toString
    val p = s"$dir/sales.parquet"
    write(p, mkRows(4000))
    UWheelBuilder("ts", Seq("qty"))
      .withExprWheel(rev, scale = 4)
      .withExprWheel("qty * 2", scale = 4)
      .withExprWheel("value / 3", scale = 4)
      .withKeyedExprWheel(rev, "flag = 'R'", scale = 4)
      // every typed family accepts derived expressions too (column-or-
      // expression contract): sketch/moment wheels keyed by canonical form
      .withDistinctWheel("uid % 10")
      .withFreqWheel("uid % 10")
      .withQuantileWheel(rev)
      .withMomentWheel(rev)
      .build(spark, p)
    p
  }
  def t: DataFrame = spark.read.parquet(path)

  def ranged(df: DataFrame): DataFrame =
    df.filter(col("ts") >= lit("2024-02-01").cast("timestamp") &&
      col("ts") < lit("2024-04-01").cast("timestamp"))

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

  private def revSumDec(df: DataFrame): DataFrame =
    df.agg(sum(expr(rev).cast("decimal(18,4)")).as("revenue"),
      count(lit(1)).as("cnt"))

  test("decimal-cast SUM over the expression rewrites, digit-exactly") {
    path
    val q = revSumDec(ranged(t))
    assertRewritten(q)
    assert(rows(q) === groundTruth(rows(revSumDec(ranged(t)))))
  }

  test("MIN/MAX over the raw double expression rewrite, bit-exactly") {
    path
    def q(df: DataFrame) = df.agg(min(expr(rev)).as("mn"), max(expr(rev)).as("mx"))
    assertRewritten(q(ranged(t)))
    assert(rows(q(ranged(t))) === groundTruth(rows(q(ranged(t)))))
  }

  test("plain double SUM serves when every expression value is exact at scale") {
    path
    // qty * 2 is integer-valued: representable at scale 4, so the
    // valuesExactAtScale gate passes and the plain-double sum rewrites
    def q(df: DataFrame) = df.agg(sum(expr("qty * 2")).as("s"))
    assertRewritten(q(ranged(t)))
    assert(rows(q(ranged(t))) === groundTruth(rows(q(ranged(t)))))
  }

  test("plain double SUM declines when values are inexact at the wheel scale") {
    path
    // value/3 = 0.333… never round-trips through DECIMAL(38,4): the wheel
    // exists but its valuesExactAtScale gate refuses the rounded answer
    val q = ranged(t).agg(sum(expr("value / 3")).as("s"))
    assertNotRewritten(q)
    // min/max of the SAME wheel still serve (gate-exempt: they store the
    // double image itself)
    val mm = ranged(t).agg(min(expr("value / 3")).as("mn"))
    assertRewritten(mm)
    assert(rows(mm) === groundTruth(rows(ranged(t).agg(min(expr("value / 3")).as("mn")))))
  }

  test("AVG via the decimal-cast form rewrites, digit-exactly") {
    path
    def q(df: DataFrame) = df.agg(avg(expr(rev).cast("decimal(18,4)")).as("a"))
    assertRewritten(q(ranged(t)))
    assert(rows(q(ranged(t))) === groundTruth(rows(q(ranged(t)))))
  }

  test("COUNT(expr) serves via the NULL-free proof") {
    path
    def q(df: DataFrame) = df.agg(count(expr(rev)).as("c"), count(lit(1)).as("n"))
    assertRewritten(q(ranged(t)))
    assert(rows(q(ranged(t))) === groundTruth(rows(q(ranged(t)))))
  }

  test("calendar GROUP BY buckets read the expression wheel per month") {
    path
    def q(df: DataFrame) = df
      .groupBy(date_trunc("month", col("ts")).as("m"))
      .agg(sum(expr(rev).cast("decimal(18,4)")).as("revenue"),
        min(expr(rev)).as("mn"), count(lit(1)).as("cnt"))
      .orderBy("m")
    assertRewritten(q(ranged(t)))
    assert(rows(q(ranged(t))) === groundTruth(rows(q(ranged(t)))))
  }

  test("window() tumbling buckets read the expression wheel") {
    path
    def q(df: DataFrame) = df
      .groupBy(window(col("ts"), "6 hours"))
      .agg(sum(expr(rev).cast("decimal(18,4)")).as("revenue"))
      .select(col("window.start").as("ws"), col("revenue"))
      .orderBy("ws")
    assertRewritten(q(ranged(t)))
    assert(rows(q(ranged(t))) === groundTruth(rows(q(ranged(t)))))
  }

  test("keyed expression wheel routes the residual predicate") {
    path
    def q(df: DataFrame) = df.filter(col("flag") === "R")
      .agg(sum(expr(rev).cast("decimal(18,4)")).as("rev_r"))
    assertRewritten(q(ranged(t)))
    assert(rows(q(ranged(t))) === groundTruth(rows(q(ranged(t)))))
  }

  test("OR-union of disjoint time ranges merges expression-wheel reads") {
    path
    def q(df: DataFrame) = df.filter(
      (col("ts") >= lit("2024-01-10").cast("timestamp") &&
        col("ts") < lit("2024-01-20").cast("timestamp")) ||
      (col("ts") >= lit("2024-03-01").cast("timestamp") &&
        col("ts") < lit("2024-03-05").cast("timestamp")))
      .agg(sum(expr(rev).cast("decimal(18,4)")).as("revenue"))
    assertRewritten(q(t))
    assert(rows(q(t)) === groundTruth(rows(q(t))))
  }

  test("sketch and moment families serve derived expressions too") {
    path
    spark.read.parquet(path).createOrReplaceTempView("sales_expr")
    def onOff(sql: String): Unit = {
      val df = spark.sql(sql)
      assertRewritten(df)
      val on = rows(df)
      Graft.rewritesEnabled = false
      val off = try rows(spark.sql(sql)) finally Graft.rewritesEnabled = true
      assert(on === off, sql)
    }
    val range = "ts >= TIMESTAMP '2024-02-01' AND ts < TIMESTAMP '2024-04-01'"
    // hll over an integral expression — bit-equal registers by construction
    onOff(s"SELECT hll_distinct(uid % 10) AS du FROM sales_expr WHERE $range")
    // cms point frequency over the same derived key
    onOff(s"SELECT cms_freq(uid % 10, 3) AS f FROM sales_expr WHERE $range")
    // hdr quantile over the revenue expression (same double image)
    onOff(s"SELECT hdr_quantile($rev, 0.9) AS p90 FROM sales_expr WHERE $range")
    // exact moments over the revenue expression at the builder scale (2)
    onOff(s"SELECT wheel_var_samp(CAST($rev AS DECIMAL(18,2))) AS vs FROM sales_expr WHERE $range")
    // bucketed composition: one LocalRelation with sketch + numeric needs
    onOff(
      s"""SELECT date_trunc('month', ts) AS m, hll_distinct(uid % 10) AS du,
         |       hdr_quantile($rev, 0.5) AS p50, count(*) AS cnt
         |FROM sales_expr WHERE $range GROUP BY 1 ORDER BY 1""".stripMargin)
    // a different expression (or different params) has no wheel: scan
    assertNotRewritten(spark.sql(
      s"SELECT hll_distinct(uid % 7) AS du FROM sales_expr WHERE $range"))
    assertNotRewritten(spark.sql(
      s"SELECT hdr_quantile($rev, 0.9, 9) AS p FROM sales_expr WHERE $range"))
  }

  test("an UNREGISTERED expression stays on the scan") {
    path
    assertNotRewritten(ranged(t).agg(sum(expr("price + disc").cast("decimal(18,4)")).as("s")))
    // scale mismatch: wheel is scale 4, a scale-2 cast must decline
    assertNotRewritten(ranged(t).agg(sum(expr(rev).cast("decimal(18,2)")).as("s")))
  }

  test("non-deterministic and aggregate expressions are refused at build") {
    path
    val dir = java.nio.file.Files.createTempDirectory("graft-expr-bad").toString
    val p = s"$dir/bad.parquet"
    write(p, mkRows(10))
    intercept[IllegalArgumentException] {
      UWheelBuilder("ts").withExprWheel("price * rand()").build(spark, p)
    }
    intercept[IllegalArgumentException] {
      UWheelBuilder("ts").withExprWheel("1 + 2").build(spark, p)
    }
  }

  test("incremental refresh append-merges the expression wheels, bit-identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-expr-ref").toString
    val p = s"$dir/sales.parquet"
    write(p, mkRows(2000))
    UWheelBuilder("ts", Seq("qty"))
      .withExprWheel(rev, scale = 4)
      .withKeyedExprWheel(rev, "flag = 'R'", scale = 4)
      .build(spark, p)
    write(p, mkRows(1000, i0 = 2000), append = true)
    assert(UWheelIndex.refresh(spark, p).isInstanceOf[RefreshOutcome.Appended])
    val df = spark.read.parquet(p)
    val q = revSumDec(ranged(df))
    assertRewritten(q)
    assert(rows(q) === groundTruth(rows(revSumDec(ranged(df)))))
    val keyed = ranged(df).filter(col("flag") === "R")
      .agg(sum(expr(rev).cast("decimal(18,4)")).as("rev_r"))
    assertRewritten(keyed)
    assert(rows(keyed) === groundTruth(rows(ranged(df).filter(col("flag") === "R")
      .agg(sum(expr(rev).cast("decimal(18,4)")).as("rev_r")))))
  }
}
