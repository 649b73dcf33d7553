package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.scalatest.funsuite.AnyFunSuite

/** `Q.ctxViewsOnly` is the tool-facing registration path
  * ([[graft.tools.BenchDedupScale]]): it must register the corpus views
  * AND mark the (session, dir) prepared so later `Q.ctx` calls from inside
  * query functions skip the wheel builds — while queries stay CORRECT
  * through the scan path. A private corpus copy keeps the shared-path
  * registry state of other suites untouched. */
class CtxViewsOnlySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("views registered, wheel builds skipped, queries answer via scans") {
    spark.sparkContext.setLogLevel("WARN")
    // private corpus: symlink every table into a fresh dir
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-viewsonly")
    java.nio.file.Files.list(src).forEach(p =>
      java.nio.file.Files.createSymbolicLink(dir.resolve(p.getFileName), p.toAbsolutePath))
    val sfDir = dir.toString

    Q.ctxViewsOnly(spark, sfDir)
    // views are queryable...
    assert(spark.table("documents").count() > 0)
    assert(spark.table("events").count() > 0)
    // ...but no index was built for this dir's tables
    assert(graft.index.WheelRegistry.lookup(s"$sfDir/events.parquet").isEmpty,
      "ctxViewsOnly must not build wheel indexes")

    // a later Q.ctx call (what every query function does) must NOT trigger
    // the build either — the empty prepared marker satisfies the heal check
    Q.ctx(spark, sfDir)
    assert(graft.index.WheelRegistry.lookup(s"$sfDir/events.parquet").isEmpty,
      "the prepared marker must keep Q.ctx from building")

    // and a wheel-shaped query still answers, via the scan, correctly
    val q = spark.sql(
      """SELECT count(*) AS cnt FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-12 00:00:00'""".stripMargin)
    assert(q.queryExecution.optimizedPlan
      .collect { case r: LogicalRelation => r }.nonEmpty, "expected the scan path")
    assert(q.collect()(0).getLong(0) === 253L) // the corpus's known range count
  }
}
