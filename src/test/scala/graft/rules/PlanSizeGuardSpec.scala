package graft.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Graft
import graft.index.{IndexBuilder, UWheelBuilder}

/** The shared plan-size pre-guard (round-13 verdict task 1): EVERY
  * bucket-serving arm — the plain `GROUP BY date_trunc(...)` fixed-span /
  * calendar arms and the keyed two-column arm, not just the window() arms —
  * must DECLINE to the distributed scan when the estimated bucket count
  * exceeds [[Graft.planSizeBudget]], BEFORE materializing a single
  * LocalRelation row on the planner thread. At 100 TB a
  * `GROUP BY date_trunc('second', ts)` over a multi-year dense corpus is
  * ~1e8 buckets; built as a LocalRelation that is a driver stall/OOM, while
  * the scan streams the same answer. The guard estimate is
  * `min(grid positions, active bottom-level slots)` per disjoint range —
  * both true upper bounds on the bucket count.
  */
class PlanSizeGuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // dense fine-grain corpus: one row per second across ~5000 consecutive
  // seconds (every second active, so the activeSlots estimate term is
  // exactly the second-level bucket count)
  lazy val path: String = {
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-psg").toString
    val p = s"$dir/dense.parquet"
    spark.range(5000)
      .select(
        timestamp_seconds(col("id") + 1704067200L).as("ts"),
        (col("id") % 7).cast("double").as("value"),
        when(col("id") % 2 === 0, "a").otherwise("b").as("k"))
      .write.mode("overwrite").parquet(p)
    UWheelBuilder("ts", Seq("value"))
      .withKeyedWheel(IndexBuilder("value", Some("k = 'a'")))
      .withKeyedWheel(IndexBuilder("value", Some("k = 'b'")))
      .build(spark, p)
    p
  }

  private def isRewritten(sql: String): Boolean =
    spark.sql(sql).queryExecution.optimizedPlan.collectFirst {
      case l: LocalRelation => l
    }.isDefined

  private def assertSameOnOff(sql: String): Unit = {
    val on = spark.sql(sql).collect().map(_.toString).sorted.toSeq
    Graft.rewritesEnabled = false
    val off =
      try spark.sql(sql).collect().map(_.toString).sorted.toSeq
      finally Graft.rewritesEnabled = true
    assert(on === off, s"on/off mismatch for: $sql")
  }

  private def withBudget[A](b: Long)(f: => A): A = {
    val saved = Graft.planSizeBudget
    Graft.planSizeBudget = b
    try f finally Graft.planSizeBudget = saved
  }

  private val secondGroupBy =
    s"SELECT date_trunc('second', ts) AS s, count(*) AS cnt, max(value) AS mx " +
      "FROM parquet.`%s` WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' " +
      "GROUP BY 1 ORDER BY 1"

  test("date_trunc('second') group-by DECLINES past the budget, answer unchanged") {
    val sql = secondGroupBy.format(path)
    // sanity: within budget the arm serves (5000 buckets < default 2M)
    assert(isRewritten(sql), "arm did not fire within budget — spec setup drifted")
    withBudget(1000L) {
      assert(!isRewritten(sql),
        "5000 estimated buckets > budget 1000 must decline to the scan")
      assertSameOnOff(sql)
    }
  }

  test("coarser grouping still rewrites under the same tight budget") {
    // ~2 hour buckets — far under budget 1000; the guard must not
    // over-decline coarse groupings on the same dense corpus
    val sql = ("SELECT date_trunc('hour', ts) AS h, count(*) AS cnt " +
      "FROM parquet.`%s` GROUP BY 1 ORDER BY 1").format(path)
    withBudget(1000L) {
      assert(isRewritten(sql), "hour grouping (~2 buckets) must still serve")
      assertSameOnOff(sql)
    }
  }

  test("calendar arm (date_trunc('month')) respects the budget gate") {
    val sql = ("SELECT date_trunc('month', ts) AS m, count(*) AS cnt " +
      "FROM parquet.`%s` GROUP BY 1 ORDER BY 1").format(path)
    // one month bucket; grid estimate by the arm's DAY fine span is tiny
    withBudget(1000L) {
      assert(isRewritten(sql), "month grouping (1 bucket) must still serve")
      assertSameOnOff(sql)
    }
    // budget 0 declines EVERYTHING bucket-served (the guard's floor)
    withBudget(0L) {
      assert(!isRewritten(sql), "budget 0 must decline every grouped arm")
      assertSameOnOff(sql)
    }
  }

  test("keyed two-column grouped arm shares the guard") {
    val sql = ("SELECT date_trunc('second', ts) AS s, k, count(*) AS cnt " +
      "FROM parquet.`%s` GROUP BY 1, 2 ORDER BY 1, 2").format(path)
    assert(isRewritten(sql), "keyed arm did not fire within budget — setup drifted")
    withBudget(1000L) {
      assert(!isRewritten(sql), "keyed grouped arm must share the plan-size guard")
      assertSameOnOff(sql)
    }
  }

  test("keyed arm bounds the PRODUCT buckets × values, not buckets per wheel") {
    // 5000 second-buckets × 2 key values = 10000 LocalRelation rows. At
    // budget 6000 each wheel's own bucket estimate (≤ 5000) passes, but
    // the materialized product does not — the guard must divide the budget
    // by the value count and decline (review finding: a per-wheel bound
    // admits values× the budget onto the planner thread).
    val keyed = ("SELECT date_trunc('second', ts) AS s, k, count(*) AS cnt " +
      "FROM parquet.`%s` GROUP BY 1, 2 ORDER BY 1, 2").format(path)
    val unkeyed = secondGroupBy.format(path)
    withBudget(6000L) {
      assert(isRewritten(unkeyed), "5000 buckets must serve under budget 6000")
      assert(!isRewritten(keyed),
        "5000 buckets × 2 values = 10000 rows must decline under budget 6000")
      assertSameOnOff(keyed)
    }
  }

  test("IN-union grouped path divides the budget by the union size") {
    // k IN ('a','b') over per-value keyed wheels: each wheel covers ~2500
    // alternating seconds, the merged union ~5000 buckets. At budget 4500
    // each wheel passes a per-wheel bound (2500 <= 4500) but the union
    // merge would put ~5000 rows on the planner thread — the guard must
    // divide the budget by the union size and decline (review finding:
    // the IN-list length is query-controlled, so the per-wheel bound
    // alone admits IN-length × the budget).
    val sql = ("SELECT date_trunc('second', ts) AS s, sum(value) AS sv " +
      "FROM parquet.`%s` WHERE k IN ('a', 'b') GROUP BY 1 ORDER BY 1").format(path)
    assert(isRewritten(sql), "IN-union arm did not fire within budget — setup drifted")
    withBudget(4500L) {
      assert(!isRewritten(sql),
        "union of two ~2500-bucket wheels must decline at budget 4500")
      assertSameOnOff(sql)
    }
  }

  test("to_date grouping shares the guard via the same chokepoint") {
    val sql = ("SELECT to_date(ts) AS d, count(*) AS cnt " +
      "FROM parquet.`%s` GROUP BY 1 ORDER BY 1").format(path)
    withBudget(1000L) {
      assert(isRewritten(sql), "1 day bucket must serve under budget 1000")
    }
    withBudget(0L) {
      assert(!isRewritten(sql))
      assertSameOnOff(sql)
    }
  }
}
