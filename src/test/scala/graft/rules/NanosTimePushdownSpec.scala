package graft.rules

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

import graft.Graft

class NanosTimePushdownSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** A raw INT64-nanoseconds table: the layout parquet TIMESTAMP(NANOS)
    * files surface as under `spark.sql.legacy.parquet.nanosAsLong` (the
    * synthetic corpus now ships micros, so the spec writes its own
    * specimen). ~42 days from 2024-01-01, one row every 731 s. */
  lazy val nanosPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ns").toString
    val p = s"$dir/events_ns.parquet"
    spark.range(0, 5000)
      .selectExpr(
        "id AS event_id",
        "1704067200000000000 + id * 731000000000 AS ts",
        "id % 97 AS user_id")
      .write.mode("overwrite").parquet(p)
    p
  }

  /** The derived-timestamp view `graft.Tables` builds over nanos files. */
  def nsEvents: DataFrame =
    spark.read.parquet(nanosPath)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  private def pushedFilters(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.filter(_.contains("PushedFilters")).mkString(";")

  test("time range on the derived ts column reaches the parquet scan") {
    Graft.enable(spark)
    val df = nsEvents.where(
      "ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'")
      .selectExpr("sum(user_id) AS s") // not wheel-covered -> stays a scan
    val pf = pushedFilters(df)
    assert(pf.contains("GreaterThanOrEqual(ts,1704412800000000000)"), pf)
    assert(pf.contains("LessThan(ts,1705017600000000000)"), pf)
  }

  test("> and <= operators use the +1µs algebra; results match an unpushed scan") {
    Graft.enable(spark)
    val cond = "ts > TIMESTAMP '2024-01-05 00:00:00' AND ts <= TIMESTAMP '2024-01-12 00:00:00'"
    val pf = pushedFilters(nsEvents.where(cond).selectExpr("sum(user_id) AS s"))
    assert(pf.contains("GreaterThanOrEqual(ts,1704412800000001000)"), pf)
    assert(pf.contains("LessThan(ts,1705017600000001000)"), pf)
    val n = nsEvents.where(cond).count()
    // semantically identical unpushable predicate (modulo-written) as ground truth
    val m = nsEvents.filter(org.apache.spark.sql.functions.expr(
      s"NOT ($cond) = false AND ($cond)")).count()
    assert(n === m)
  }

  test("idempotent: rule applied twice adds no duplicate conjuncts") {
    val plan = nsEvents.where(
      "ts >= TIMESTAMP '2024-01-05 00:00:00'").queryExecution.optimizedPlan
    val once = NanosTimePushdown(plan)
    val twice = NanosTimePushdown(once)
    assert(once.toString === twice.toString)
  }
}
