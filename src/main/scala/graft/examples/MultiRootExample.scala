package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Graft
import graft.index.{UWheelBuilder, UWheelIndex, WheelRegistry}

/** Multi-directory table walkthrough (round 15): data lakes commonly split
  * one logical table across several directories — per-year drops, a
  * hot/cold tier pair — and read them as `spark.read.parquet(dirA, dirB)`.
  * One [[UWheelBuilder.build]] over the root SET indexes the combined
  * relation in a single fused scan, registers under the canonical sorted
  * root-set key (so `parquet(a, b)` and `parquet(b, a)` both resolve),
  * and serves it at plan time; appending to ONE member directory gates
  * the index stale (scans stay correct), and [[UWheelIndex.refresh]]
  * through the same key scans only the delta files — grouped per owning
  * root — to serve again.
  *
  * Run: `sbt "runMain graft.examples.MultiRootExample [sfDir]"`
  */
object MultiRootExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)

    // split the events corpus into two "yearly drop" directories on the
    // median timestamp — the per-period layout multi-root reads serve
    graft.Tables.ensureNanosConf(spark)
    val all = graft.Tables.events(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("ts", "value", "event_type")
    val cut = all.agg(expr("percentile(CAST(ts AS DOUBLE), 0.5)")).head().getDouble(0)
    val dir = java.nio.file.Files.createTempDirectory("graft-mroot-ex").toString
    val (early, late) = (s"$dir/drop1.parquet", s"$dir/drop2.parquet")
    all.where(col("ts").cast("double") < cut).write.parquet(early)
    all.where(col("ts").cast("double") >= cut).write.parquet(late)

    // ONE build over the root set — one fused scan, one registry entry
    UWheelBuilder("ts", Seq("value")).build(spark, Seq(early, late))
    println(s"registered: ${WheelRegistry.registeredPaths.filter(_.contains("drop")).mkString(" + ")}")

    def q(a: String, b: String) = spark.read.parquet(a, b)
      .where("ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-12'")
      .agg(count(lit(1)).as("cnt"), sum("value").as("sv"))
    def isRewritten(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.isDefined

    val served = q(early, late)
    println(s"multi-root rewrite: ${isRewritten(served)}")
    val flipped = q(late, early)
    println(s"flipped-order rewrite: ${isRewritten(flipped)} (same sorted key)")
    // the count is exact; the DOUBLE sum matches to float-accumulation-
    // order ulps (the wheel folds scale-2 fixed point — deterministic —
    // while the scan's float sum varies with partition order)
    def close(a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row): Boolean =
      a.getLong(0) == b.getLong(0) &&
        math.abs(a.getDouble(1) - b.getDouble(1)) <=
          1e-9 * math.max(1.0, math.abs(b.getDouble(1)))
    val answer = served.head()
    Graft.rewritesEnabled = false
    val scan = try q(early, late).head() finally { Graft.rewritesEnabled = true; () }
    println(s"served = $answer  scan = $scan")
    require(close(answer, scan), "served answer must equal the scan")

    // daily ingest lands in ONE member directory → stale (correct scans),
    // then refresh touches only the delta files of that root
    all.limit(500).write.mode("append").parquet(late)
    println(s"after append, rewrite: ${isRewritten(q(early, late))} (stale → scan, still correct)")
    val key = WheelRegistry.rootSetKey(Seq(early, late))
    println(s"refresh: ${UWheelIndex.refresh(spark, key)}")
    val again = q(early, late)
    println(s"after refresh, rewrite: ${isRewritten(again)}")
    val a2 = again.head()
    Graft.rewritesEnabled = false
    val s2 = try q(early, late).head() finally { Graft.rewritesEnabled = true; () }
    require(close(a2, s2), "refreshed served answer must equal the scan")
    println(s"refreshed served = $a2  scan = $s2")

    spark.stop()
  }
}
