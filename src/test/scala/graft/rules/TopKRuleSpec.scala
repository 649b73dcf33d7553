package graft.rules

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Graft
import graft.index.{UWheelBuilder, WheelRegistry}

/** The heavy-hitter optimizer arm (round-10 verdict, task 2): plain SQL
  * `GROUP BY key ORDER BY cnt DESC LIMIT n` over a column with a top-k
  * wheel serves the certified exact answer as a LocalRelation — no scan —
  * and declines (scan runs, answer still right) whenever the certificate
  * cannot hold: dense slots past the cap, NULL keys the summary cannot
  * represent, residual predicates, or an order that isn't the top-k shape.
  * Also pins the batch registration LAYERING contract (task 1): a narrower
  * rebuild over the same files must not withdraw the top-k family. */
class TopKRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val base = 1704067200L // 2024-01-01 00:00:00 UTC

  /** Sparse corpus: ≤ 3 rows per second, skewed keys — every slot stays
    * under the cap, so every range certifies. */
  lazy val sparsePath: String = {
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-topkrule").toString
    val p = s"$dir/t.parquet"
    spark.range(30000)
      .select(timestamp_seconds(col("id") % 20000 + base).as("ts"),
        (when(col("id") % 3 === 0, col("id") % 7)
          .otherwise(col("id") % 97)).cast("long").as("uid"),
        (col("id") % 5).cast("double").as("value"))
      .repartition(5)
      .write.mode("overwrite").parquet(p)
    UWheelBuilder("ts").withTopKWheel("uid", cap = 64).build(spark, p)
    spark.read.parquet(p).createOrReplaceTempView("topk_t")
    p
  }

  def assertRewritten(df: DataFrame): Unit = {
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collect { case l: LocalRelation => l }.nonEmpty, s"no LocalRelation in:\n$opt")
    assert(opt.collect { case r: LogicalRelation => r }.isEmpty, s"scan survived in:\n$opt")
  }

  def assertNotRewritten(df: DataFrame): Unit = {
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collect { case r: LogicalRelation => r }.nonEmpty, s"expected scan in:\n$opt")
  }

  /** Runs `q` with the rule disabled to get the ground-truth answer. */
  def groundTruth[T](q: => T): T = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cs.experimental.extraOptimizations
    cs.experimental.extraOptimizations = Nil
    try q finally cs.experimental.extraOptimizations = saved
  }

  private def rangeSql(s: Long, e: Long): String =
    s"ts >= timestamp_seconds($s) AND ts < timestamp_seconds($e)"

  test("certified top-k SQL serves from the wheel: LocalRelation, no scan") {
    sparsePath
    val q = spark.sql(
      s"""SELECT uid, count(*) AS cnt FROM topk_t
         |WHERE ${rangeSql(base + 500, base + 9000)}
         |GROUP BY uid ORDER BY cnt DESC, uid LIMIT 5""".stripMargin)
    assertRewritten(q)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = groundTruth {
      spark.sql(
        s"""SELECT uid, count(*) AS cnt FROM topk_t
           |WHERE ${rangeSql(base + 500, base + 9000)}
           |GROUP BY uid ORDER BY cnt DESC, uid LIMIT 5""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(got == want)
  }

  test("count-desc-only sort serves too (key-asc tiebreak is a valid answer)") {
    sparsePath
    val q = spark.sql(
      s"""SELECT uid, count(1) AS c FROM topk_t
         |WHERE ${rangeSql(base, base + 20000)}
         |GROUP BY uid ORDER BY c DESC LIMIT 3""".stripMargin)
    assertRewritten(q)
    // counts must equal the true top-3 counts (keys may tie-break anywhere)
    val got = q.collect().map(_.getLong(1)).toSeq
    val want = groundTruth {
      spark.sql(
        s"""SELECT uid, count(1) AS c FROM topk_t
           |WHERE ${rangeSql(base, base + 20000)}
           |GROUP BY uid ORDER BY c DESC LIMIT 3""".stripMargin)
        .collect().map(_.getLong(1)).toSeq
    }
    assert(got == want)
  }

  test("count(key) and reversed output order serve") {
    sparsePath
    val q = spark.sql(
      s"""SELECT count(uid) AS cnt, uid FROM topk_t
         |WHERE ${rangeSql(base, base + 5000)}
         |GROUP BY uid ORDER BY cnt DESC, uid LIMIT 4""".stripMargin)
    assertRewritten(q)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = groundTruth {
      spark.sql(
        s"""SELECT count(uid) AS cnt, uid FROM topk_t
           |WHERE ${rangeSql(base, base + 5000)}
           |GROUP BY uid ORDER BY cnt DESC, uid LIMIT 4""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(got == want)
  }

  test("uncertified range declines: dense slots past the cap keep the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-topkrule-dense").toString
    val p = s"$dir/t.parquet"
    // every second holds 4 distinct keys > cap=2: freeze compacts, slack > 0
    spark.range(4000)
      .select(timestamp_seconds(col("id") % 1000 + base).as("ts"),
        (floor(col("id") / 1000) + (col("id") % 1000) * 10).cast("long").as("uid"))
      .write.mode("overwrite").parquet(p)
    UWheelBuilder("ts").withTopKWheel("uid", cap = 2).build(spark, p)
    spark.read.parquet(p).createOrReplaceTempView("topk_dense")
    val sql =
      s"""SELECT uid, count(*) AS cnt FROM topk_dense
         |WHERE ${rangeSql(base, base + 1000)}
         |GROUP BY uid ORDER BY cnt DESC, uid LIMIT 5""".stripMargin
    val q = spark.sql(sql)
    assertNotRewritten(q)
    assert(q.collect().length == 5) // the scan still answers
  }

  test("NULL keys decline unless the query filters them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-topkrule-null").toString
    val p = s"$dir/t.parquet"
    spark.range(3000)
      .select(timestamp_seconds(col("id") % 2500 + base).as("ts"),
        when(col("id") % 100 === 0, lit(null).cast("long"))
          .otherwise(col("id") % 13).as("uid"))
      .write.mode("overwrite").parquet(p)
    UWheelBuilder("ts").withTopKWheel("uid").build(spark, p)
    assert(WheelRegistry.lookup(p).get.topKWheel("uid").get.keyNullCount == 30L)
    spark.read.parquet(p).createOrReplaceTempView("topk_null")
    val bare =
      s"""SELECT uid, count(*) AS cnt FROM topk_null
         |WHERE ${rangeSql(base, base + 2500)}
         |GROUP BY uid ORDER BY cnt DESC, uid LIMIT 3""".stripMargin
    assertNotRewritten(spark.sql(bare)) // the NULL group is invisible to the wheel
    val filtered = spark.sql(
      s"""SELECT uid, count(*) AS cnt FROM topk_null
         |WHERE ${rangeSql(base, base + 2500)} AND uid IS NOT NULL
         |GROUP BY uid ORDER BY cnt DESC, uid LIMIT 3""".stripMargin)
    assertRewritten(filtered)
    val got = filtered.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = groundTruth {
      spark.sql(
        s"""SELECT uid, count(*) AS cnt FROM topk_null
           |WHERE ${rangeSql(base, base + 2500)} AND uid IS NOT NULL
           |GROUP BY uid ORDER BY cnt DESC, uid LIMIT 3""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(got == want)
  }

  test("keyed residual routes to the keyed top-k wheel") {
    val dir = java.nio.file.Files.createTempDirectory("graft-topkrule-keyed").toString
    val p = s"$dir/t.parquet"
    spark.range(20000)
      .select(timestamp_seconds(col("id") % 15000 + base).as("ts"),
        (when(col("id") % 3 === 0, col("id") % 5)
          .otherwise(col("id") % 41)).cast("long").as("uid"),
        when(col("id") % 4 === 0, lit("purchase")).otherwise(lit("view")).as("etype"))
      .write.mode("overwrite").parquet(p)
    UWheelBuilder("ts").withTopKWheel("uid")
      .withKeyedTopKWheel("uid", "etype = 'purchase'").build(spark, p)
    spark.read.parquet(p).createOrReplaceTempView("topk_keyed")
    val sql =
      s"""SELECT uid, count(*) AS cnt FROM topk_keyed
         |WHERE ${rangeSql(base, base + 15000)} AND etype = 'purchase'
         |GROUP BY uid ORDER BY cnt DESC, uid LIMIT 5""".stripMargin
    val q = spark.sql(sql)
    assertRewritten(q)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = groundTruth {
      spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(got == want)
    // a residual with no keyed wheel still declines
    assertNotRewritten(spark.sql(
      s"""SELECT uid, count(*) AS cnt FROM topk_keyed
         |WHERE ${rangeSql(base, base + 15000)} AND etype = 'view'
         |GROUP BY uid ORDER BY cnt DESC, uid LIMIT 5""".stripMargin))
    // and the unfiltered shape still routes to the unfiltered wheel
    assertRewritten(spark.sql(
      s"""SELECT uid, count(*) AS cnt FROM topk_keyed
         |WHERE ${rangeSql(base, base + 15000)}
         |GROUP BY uid ORDER BY cnt DESC, uid LIMIT 5""".stripMargin))
  }

  test("foreign residual and wrong sort shapes decline") {
    sparsePath
    assertNotRewritten(spark.sql(
      s"""SELECT uid, count(*) AS cnt FROM topk_t
         |WHERE ${rangeSql(base, base + 5000)} AND value > 1.0
         |GROUP BY uid ORDER BY cnt DESC, uid LIMIT 3""".stripMargin))
    assertNotRewritten(spark.sql(
      s"""SELECT uid, count(*) AS cnt FROM topk_t
         |WHERE ${rangeSql(base, base + 5000)}
         |GROUP BY uid ORDER BY cnt ASC, uid LIMIT 3""".stripMargin))
    assertNotRewritten(spark.sql(
      s"""SELECT uid, count(*) AS cnt FROM topk_t
         |WHERE ${rangeSql(base, base + 5000)}
         |GROUP BY uid ORDER BY uid, cnt DESC LIMIT 3""".stripMargin))
  }

  test("batch rebuild LAYERS: a narrower build preserves the top-k family") {
    val p = sparsePath
    val before = WheelRegistry.lookup(p).get
    assert(before.topKWheel("uid").isDefined)
    // the round-10 red flag: this used to clobber the whole registration
    UWheelBuilder("ts", Seq("value")).build(spark, p)
    val after = WheelRegistry.lookup(p).get
    assert(after.topKWheel("uid").isDefined,
      "narrower rebuild over the same files silently withdrew the top-k family")
    assert(after.minMaxWheel("value").isDefined, "the fresh build's own family must register")
    // and the rule still serves from the carried family
    assertRewritten(spark.sql(
      s"""SELECT uid, count(*) AS cnt FROM topk_t
         |WHERE ${rangeSql(base, base + 9000)}
         |GROUP BY uid ORDER BY cnt DESC, uid LIMIT 5""".stripMargin))
  }

  test("contract corpus: uw_topk_users' plain SQL serves scan-free and exact") {
    graft.queries.Q.ctx(spark, "/root/testdata/sf0.001")
    val sql =
      """SELECT user_id, count(*) AS cnt FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |GROUP BY 1 ORDER BY cnt DESC, user_id LIMIT 5""".stripMargin
    val q = spark.sql(sql)
    assertRewritten(q)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = groundTruth {
      spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(got == want)
  }

  test("changed files do NOT layer: stale families are replaced wholesale") {
    val dir = java.nio.file.Files.createTempDirectory("graft-topkrule-stale").toString
    val p = s"$dir/t.parquet"
    spark.range(1000)
      .select(timestamp_seconds(col("id") % 900 + base).as("ts"),
        (col("id") % 7).as("uid"), col("id").cast("double").as("value"))
      .write.mode("overwrite").parquet(p)
    UWheelBuilder("ts").withTopKWheel("uid").build(spark, p)
    // data changes: the old top-k summaries are stale
    spark.range(500)
      .select(timestamp_seconds(col("id") % 400 + base + 1000L).as("ts"),
        (col("id") % 3).as("uid"), col("id").cast("double").as("value"))
      .write.mode("append").parquet(p)
    UWheelBuilder("ts", Seq("value")).build(spark, p)
    val t = WheelRegistry.lookup(p).get
    assert(t.topKWheel("uid").isEmpty,
      "a build over CHANGED files must not carry stale families forward")
  }
}
