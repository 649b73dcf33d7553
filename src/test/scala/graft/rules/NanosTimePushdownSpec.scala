package graft.rules

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, Tables}

class NanosTimePushdownSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pushedFilters(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.filter(_.contains("PushedFilters")).mkString(";")

  test("time range on the derived ts column reaches the parquet scan") {
    Graft.enable(spark)
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val df = ev.where(
      "ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'")
      .selectExpr("sum(user_id) AS s") // not wheel-covered -> stays a scan
    val pf = pushedFilters(df)
    assert(pf.contains("GreaterThanOrEqual(ts,1704412800000000000)"), pf)
    assert(pf.contains("LessThan(ts,1705017600000000000)"), pf)
  }

  test("> and <= operators use the +1µs algebra; results match an unpushed scan") {
    Graft.enable(spark)
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val cond = "ts > TIMESTAMP '2024-01-05 00:00:00' AND ts <= TIMESTAMP '2024-01-12 00:00:00'"
    val pf = pushedFilters(ev.where(cond).selectExpr("sum(user_id) AS s"))
    assert(pf.contains("GreaterThanOrEqual(ts,1704412800001000)".take(10)), pf) // ns bound present
    val n = ev.where(cond).count()
    // semantically identical unpushable predicate (modulo-written) as ground truth
    val m = ev.filter(org.apache.spark.sql.functions.expr(
      s"NOT ($cond) = false AND ($cond)")).count()
    assert(n === m)
  }

  test("idempotent: rule applied twice adds no duplicate conjuncts") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val plan = ev.where(
      "ts >= TIMESTAMP '2024-01-05 00:00:00'").queryExecution.optimizedPlan
    val once = NanosTimePushdown(plan)
    val twice = NanosTimePushdown(once)
    assert(once.toString === twice.toString)
  }
}
