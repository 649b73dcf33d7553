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

  test("index built over BOTH roots serves the multi-root relation (round-14 task 4)") {
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)
    val base = java.nio.file.Files.createTempDirectory("graft-mroot2").toString
    val (pA, pB) = (s"$base/a.parquet", s"$base/b.parquet")
    def gen(off: Long) = spark.range(100)
      .select(timestamp_seconds(col("id") * 60 + 1704067200L + off).as("ts"),
        (col("id") + off / 1000000L).cast("double").as("value"))
    gen(0L).write.mode("overwrite").parquet(pA)
    gen(1000000L).write.mode("overwrite").parquet(pB)
    // the round-15 shape: ONE index over the combined root set, registered
    // under the canonical sorted root-set key
    UWheelBuilder("ts", Seq("value")).build(spark, Seq(pA, pB))

    def q(first: String, second: String) = spark.read.parquet(first, second)
      .where("ts >= TIMESTAMP '2024-01-01 00:00:00'")
      .groupBy().agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
    val multi = q(pA, pB)
    assert(multi.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined, "a root-set-registered multi-root relation must REWRITE, " +
      "not soundly decline — plan shows no LocalRelation")
    // …and the served answer must equal the scan's
    val scanned = {
      Graft.rewritesEnabled = false
      try q(pA, pB).collect().head finally Graft.rewritesEnabled = true
    }
    val served = multi.collect().head
    assert(served.getLong(0) === 200L)
    assert(served.getLong(0) === scanned.getLong(0))
    assert(served.getDouble(1) === scanned.getDouble(1))

    // root ORDER must not matter: the key is the sorted root set
    val flipped = q(pB, pA)
    assert(flipped.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined, "root order must not affect the root-set key")
    assert(flipped.collect().head.getLong(0) === 200L)

    // a SINGLE member root is a different (smaller) table: it must NOT
    // serve from the root-set index (its key differs; nothing registered
    // under pA alone), and the answer stays the correct 100-row scan
    val justA = spark.read.parquet(pA)
      .where("ts >= TIMESTAMP '2024-01-01 00:00:00'")
      .groupBy().agg(count(lit(1)).as("cnt"))
    assert(justA.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isEmpty, "a member root alone must not serve from the root-set index")
    assert(justA.collect().head.getLong(0) === 100L)

    // staleness: appending a file to ONE root must gate the root-set index
    gen(2000000L).write.mode("append").parquet(pA)
    val grown = q(pA, pB)
    assert(grown.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isEmpty, "fingerprint gate must decline after a member root grows")
    assert(grown.collect().head.getLong(0) === 300L)
    graft.index.WheelRegistry.deregister(
      graft.index.WheelRegistry.rootSetKey(Seq(pA, pB)))
  }

  test("multi-root refresh: append to ONE member root, refresh, serve again") {
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)
    val base = java.nio.file.Files.createTempDirectory("graft-mroot-rf").toString
    val (pA, pB) = (s"$base/a.parquet", s"$base/b.parquet")
    def gen(off: Long) = spark.range(100)
      .select(timestamp_seconds(col("id") * 60 + 1704067200L + off).as("ts"),
        col("id").cast("double").as("value"))
    gen(0L).write.mode("overwrite").parquet(pA)
    gen(1000000L).write.mode("overwrite").parquet(pB)
    UWheelBuilder("ts", Seq("value")).build(spark, Seq(pA, pB))
    val key = graft.index.WheelRegistry.rootSetKey(Seq(pA, pB))
    try {
      def q() = spark.read.parquet(pA, pB)
        .where("ts >= TIMESTAMP '2024-01-01 00:00:00'")
        .groupBy().agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
      assert(q().collect().head.getLong(0) === 200L)

      // grow ONE member root: the combined listing changes, the index
      // gates stale (pinned in the serve test above) — refresh through
      // the root-set key must re-read ALL roots and serve again
      gen(2000000L).write.mode("append").parquet(pA)
      graft.index.UWheelIndex.refresh(spark, key) match {
        case graft.index.UWheelIndex.RefreshOutcome.NoChange =>
          fail("a grown member root must be detected as a change")
        case _ => () // Appended or Rebuilt both acceptable; answers decide
      }
      val served = q()
      assert(served.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.isDefined, "refreshed root-set index must serve the grown relation")
      val scanned = {
        Graft.rewritesEnabled = false
        try q().collect().head finally Graft.rewritesEnabled = true
      }
      val s = served.collect().head
      assert(s.getLong(0) === 300L)
      assert(s.getLong(0) === scanned.getLong(0))
      assert(s.getDouble(1) === scanned.getDouble(1))

      // refreshAll walks the registry — the joined key must round-trip
      // through registeredPaths -> rootsOfKey without error
      val outcomes = graft.index.UWheelIndex.refreshAll(spark)
      assert(outcomes.get(key).contains(graft.index.UWheelIndex.RefreshOutcome.NoChange),
        s"just-refreshed root set must report NoChange, got ${outcomes.get(key)}")
      // the Seq overload resolves to the same key
      assert(graft.index.UWheelIndex.refresh(spark, Seq(pB, pA)) ===
        graft.index.UWheelIndex.RefreshOutcome.NoChange)

      // ad-hoc keyed wheel over the root set: same lock/fingerprint path
      val before = graft.index.WheelRegistry.lookup(key).get.allWheels.size
      graft.index.UWheelIndex.buildIndex(spark, Seq(pA, pB),
        graft.index.IndexBuilder("value", Some("value >= 50")))
      assert(graft.index.WheelRegistry.lookup(key).get.allWheels.size === before + 1,
        "multi-root buildIndex must add its keyed wheel to the root-set index")

      // persistence round-trip: the joined key must survive save/load and
      // the freshness probe must read THROUGH it (a bare read.parquet of
      // the key is not a path — it would report every load stale/inert)
      val saved = s"$base/mroot.idx"
      graft.index.WheelIndexIO.save(graft.index.WheelRegistry.lookup(key).get, saved)
      graft.index.WheelRegistry.deregister(key)
      val (loaded, fresh) = graft.index.WheelIndexIO.load(spark, saved)
      assert(fresh, "unchanged multi-root listing must load FRESH, not inert")
      graft.index.WheelRegistry.register(loaded)
      val reloaded = q()
      assert(reloaded.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.isDefined, "a freshly-loaded multi-root index must serve")
      assert(reloaded.collect().head.getLong(0) === 300L)
    } finally graft.index.WheelRegistry.deregister(key)
  }

  test("member-root fallback excludes fingerprint-0 indexes (stream snapshots)") {
    // A streaming publish registers under its path with fingerprint 0 and
    // passes the staleness gate UNCONDITIONALLY — sound for its own root,
    // but a multi-root relation served from it would silently drop every
    // OTHER root's rows. The per-member-root fallback must skip it.
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-mroot0").toString
    val (pA, pB) = (s"$base/a.parquet", s"$base/b.parquet")
    def gen(off: Long) = spark.range(100)
      .select(timestamp_seconds(col("id") * 60 + 1704067200L + off).as("ts"),
        col("id").cast("double").as("value"))
    gen(0L).write.mode("overwrite").parquet(pA)
    gen(1000000L).write.mode("overwrite").parquet(pB)

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Double)]
    val idx = new graft.streaming.StreamingWheelIndex("ts", Some("value"))
    val q = idx.attach(input.toDF().toDF("ts", "value"), "mroot0-pub")
    try {
      // stream the EXACT contents of pB, then publish under pB's path —
      // the fingerprint-0 service StreamingWheelSpec pins for single-root
      input.addData(spark.read.parquet(pB)
        .as[(java.sql.Timestamp, Double)].collect().toIndexedSeq: _*)
      q.processAllAvailable()
      idx.register(pB)
      assert(graft.index.WheelRegistry.lookup(pB).exists(_.fingerprint == 0L),
        "test wiring: the streaming publish must register fingerprint-0 under pB")

      // single-root pB: the snapshot serves (the sound, intended case)
      val single = spark.read.parquet(pB)
        .where("ts >= TIMESTAMP '2024-01-01 00:00:00'")
        .groupBy().agg(count(lit(1)).as("cnt"))
      assert(single.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.isDefined, "fingerprint-0 snapshot must still serve its own root")
      assert(single.collect().head.getLong(0) === 100L)

      // multi-root (pA, pB): MUST NOT serve from pB's snapshot — the scan
      // answer covers both roots
      val multi = spark.read.parquet(pA, pB)
        .where("ts >= TIMESTAMP '2024-01-01 00:00:00'")
        .groupBy().agg(count(lit(1)).as("cnt"))
      assert(multi.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.isEmpty,
        "a fingerprint-0 member-root index must not serve a multi-root relation")
      assert(multi.collect().head.getLong(0) === 200L)
    } finally {
      q.stop()
      idx.deregister()
      graft.index.WheelRegistry.deregister(pB)
    }
  }
}
