package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Slot-span coarsening: a minute/hour-slotted wheel answers span-aligned
  * queries exactly at a fraction of the memory, declines unaligned rewrites,
  * and still prunes empty ranges for ANY bounds (outward alignment is a
  * sound superset). This is the driver-heap guard for always-active
  * multi-year tables — a decade of dense seconds is 315M slots, of dense
  * minutes 5.3M.
  */
class WheelSpanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeData(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-span").toString
    val p = s"$dir/t.parquet"
    val base = java.sql.Timestamp.valueOf("2024-04-01 00:00:00").getTime
    // ~3 days at one row every ~7 s: dense at second granularity, so minute
    // slots actually compact (the scenario coarsening exists for)
    (0 until 37000).map { i =>
      (new java.sql.Timestamp(base + i.toLong * 7 * 1000 + (i % 5) * 1000), (i % 89) / 4.0)
    }.toDF("ts", "value").write.mode("overwrite").parquet(p)
    p
  }

  private def assertRewritten(df: DataFrame): Unit = {
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collect { case l: LocalRelation => l }.nonEmpty, s"no LocalRelation in:\n$opt")
    assert(opt.collect { case r: LogicalRelation => r }.isEmpty, s"scan survived in:\n$opt")
  }

  private def assertNotRewritten(df: DataFrame): Unit =
    assert(df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r
    }.nonEmpty, "expected the scan to survive")

  private def groundTruth[T](q: => T): T = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cs.experimental.extraOptimizations
    cs.experimental.extraOptimizations = Nil
    try q finally cs.experimental.extraOptimizations = saved
  }

  test("minute-slotted wheel: aligned exact, unaligned falls through, pruning stays sound") {
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enable(spark)
    val p = writeData()
    val t1 = UWheelBuilder("ts", Seq("value")).build(spark, p)
    val size1 = t1.indexUsageBytes
    val t60 = UWheelBuilder("ts", Seq("value")).withSlotSpan(60).build(spark, p)
    assert(t60.countWheel.get.wheel.slotSpan === 60L)
    // memory drops by roughly the slot-compaction factor
    assert(t60.indexUsageBytes * 2 < size1,
      s"span-60 ${t60.indexUsageBytes}B vs span-1 ${size1}B")

    def q(lo: String, hi: String): DataFrame = spark.read.parquet(p)
      .filter(col("ts") >= lit(lo).cast("timestamp") && col("ts") < lit(hi).cast("timestamp"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).as("s"),
        min("value").as("mn"), max("value").as("mx"))

    // minute-aligned: rewritten, bit-equal to the rule-disabled scan
    val aligned = q("2024-04-01 10:15:00", "2024-04-03 22:41:00")
    assertRewritten(aligned)
    assert(aligned.collect().map(_.toString).toSeq ===
      groundTruth(aligned.collect().map(_.toString).toSeq))

    // second-aligned but NOT minute-aligned: must fall through to the scan
    val unaligned = q("2024-04-01 10:15:30", "2024-04-03 22:41:00")
    assertNotRewritten(unaligned)
    assert(unaligned.collect().map(_.toString).toSeq ===
      groundTruth(unaligned.collect().map(_.toString).toSeq))

    // hour group-by tiles minute slots exactly; second group-by cannot
    val byHour = spark.read.parquet(p)
      .filter(col("ts") >= lit("2024-04-02 00:00:00").cast("timestamp") &&
              col("ts") < lit("2024-04-04 00:00:00").cast("timestamp"))
      .groupBy(date_trunc("hour", col("ts")).as("b"))
      .agg(count(lit(1)).as("cnt"), max("value").as("mx")).orderBy("b")
    assertRewritten(byHour)
    assert(byHour.collect().map(_.toString).toSeq ===
      groundTruth(byHour.collect().map(_.toString).toSeq))
    assertNotRewritten(spark.read.parquet(p)
      .groupBy(date_trunc("second", col("ts")).as("b")).agg(count(lit(1)).as("c")))

    // emptiness pruning works even with unaligned bounds (superset check)
    val empty = spark.read.parquet(p)
      .filter(col("ts") >= lit("2031-01-01 00:00:30").cast("timestamp") &&
              col("ts") < lit("2031-02-01 00:00:30").cast("timestamp"))
    assertRewritten(empty)
    assert(empty.count() === 0)
  }

  test("slot budget auto-coarsens to the finest span that fits") {
    graft.Graft.enable(spark)
    val p = writeData()
    // ~3 days ≈ 260k possible seconds / 4.3k minutes / 72 hours
    val t = UWheelBuilder("ts", Seq("value")).withSlotBudget(1000).build(spark, p)
    assert(t.countWheel.get.wheel.slotSpan === 3600L)
    val q = spark.read.parquet(p)
      .filter(col("ts") >= lit("2024-04-01 03:00:00").cast("timestamp") &&
              col("ts") < lit("2024-04-03 17:00:00").cast("timestamp"))
      .agg(count(lit(1)).as("cnt"))
    assertRewritten(q)
    assert(q.collect()(0).getLong(0) === groundTruth(q.collect()(0).getLong(0)))
  }
}
