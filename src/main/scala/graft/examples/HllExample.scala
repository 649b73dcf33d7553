package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.index.{TypedWheelBuild, UWheelBuilder}
import graft.wheel.WheelAggregators.HllDistinct

/** Distinct-users-per-time-range via the HLL wheel — the sketch aggregate
  * no exact wheel can carry (exact distinct partials grow with
  * cardinality; HLL partials are a fixed 2^p bytes per active second).
  * Executors fold their partitions into typed wheels and tree-merge; the
  * driver receives ONE wheel and answers any range without touching the
  * table again. The SQL route does the same through the optimizer:
  * `withDistinctWheel` + `hll_distinct(col)` rewrites to a LocalRelation.
  *
  * Run: `sbt "runMain graft.examples.HllExample"`
  */
object HllExample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sfDir)
    val hll = new HllDistinct(p = 11) // 2 KiB registers, stderr ~2.3 %

    val w = TypedWheelBuild.build(ev, "ts", col("user_id"), hll, _.getLong(1))
    println(s"wheel covers [${w.startSec}, ${w.endSec}) — ${w.numSecs} active seconds")

    val day = 86400L
    val ranges = Seq(
      ("first day", w.startSec, w.startSec + day),
      ("first week", w.startSec, w.startSec + 7 * day),
      ("all time", w.startSec, w.endSec))
    for ((name, s, e) <- ranges) {
      val est = w.range(s, e)
      val exact = ev
        .where(expr(s"unix_micros(cast(ts as timestamp)) div 1000000 >= $s" +
          s" AND unix_micros(cast(ts as timestamp)) div 1000000 < $e"))
        .agg(countDistinct("user_id")).head().getLong(0)
      val err = if (exact == 0) 0.0 else math.abs(est - exact).toDouble / exact
      println(f"$name%-12s distinct users: est=$est%5d exact=$exact%5d relErr=${err * 100}%.2f%%")
    }

    // the same capability from SQL: the distinct wheel fuses into the one
    // build scan and the optimizer answers hll_distinct from it
    graft.Graft.enable(spark)
    UWheelBuilder("ts", Seq("value")).withDistinctWheel("user_id")
      .build(spark, s"$sfDir/events.parquet")
    Tables.registerAll(spark, sfDir)
    val q = spark.sql(
      """SELECT date_trunc('day', ts) AS d, hll_distinct(user_id) AS distinct_users
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-12'
        |GROUP BY 1 ORDER BY 1""".stripMargin)
    val rewritten = q.queryExecution.optimizedPlan
      .collectFirst { case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true }
      .getOrElse(false)
    println(s"SQL per-day distinct users (rewritten=$rewritten):")
    q.show(7, truncate = false)
    spark.stop()
  }
}
