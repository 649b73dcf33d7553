package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{IndexBuilder, UWheelBuilder, UWheelIndex, WheelRegistry}

class UWheelRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val path = "/root/testdata/sf0.001/events.parquet"

  lazy val setup: Unit = {
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)
    UWheelBuilder("ts", Seq("value")).build(spark, path)
    UWheelIndex.buildIndex(spark, path, IndexBuilder("value", Some("event_type = 'click'")))
  }

  def events: DataFrame = Tables.events(spark, "/root/testdata/sf0.001")

  /** Instant-typed (TimestampType) twin of the events table. The corpus
    * ships `ts` as TIMESTAMP_NTZ (wall clock, zone-free), but the
    * session-zone composition arms — shifted slots under a fixed offset,
    * piecewise transition-split under DST — exist for instant columns,
    * where `date_trunc` is genuinely zone-dependent. The twin is written
    * under this suite's UTC session, so wall values equal instants and the
    * data is bit-identical to the corpus. */
  lazy val instantsPath: String = {
    setup
    val dir = java.nio.file.Files.createTempDirectory("graft-instants").toString
    val p = s"$dir/events_instants.parquet"
    events.withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(p)
    UWheelBuilder("ts", Seq("value")).build(spark, p)
    p
  }
  def ievents: DataFrame = spark.read.parquet(instantsPath)
  def iranged: DataFrame =
    ievents.filter(col("ts") >= lit(lo).cast("timestamp") && col("ts") < lit(hi).cast("timestamp"))

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

  val lo = "2024-01-05 00:00:00"
  val hi = "2024-01-12 00:00:00"
  def ranged: DataFrame =
    events.filter(col("ts") >= lit(lo).cast("timestamp") && col("ts") < lit(hi).cast("timestamp"))

  test("R1: COUNT(*) over time range rewrites and is exact") {
    setup
    val q = ranged.agg(count(lit(1)).as("cnt"))
    assertRewritten(q)
    val expected = groundTruth(ranged.count())
    assert(q.collect()(0).getLong(0) === expected)
    assert(expected > 0)
  }

  test("R2: SUM/MIN/MAX/AVG over time range rewrite and are exact") {
    setup
    val q = ranged.agg(
      sum(col("value")).as("s"), min(col("value")).as("mn"),
      max(col("value")).as("mx"), avg(col("value")).as("av"))
    assertRewritten(q)
    val got = q.collect()(0)
    val exp = groundTruth {
      ranged.agg(sum("value"), min("value"), max("value"), avg("value")).collect()(0)
    }
    assert(math.abs(got.getDouble(0) - exp.getDouble(0)) < 1e-6)
    assert(got.getDouble(1) === exp.getDouble(1))
    assert(got.getDouble(2) === exp.getDouble(2))
    assert(math.abs(got.getDouble(3) - exp.getDouble(3)) < 1e-9)
  }

  test("R2 keyed: SUM with residual predicate matching a keyed wheel") {
    setup
    val q = ranged.filter(col("event_type") === "click").agg(sum("value").as("s"))
    assertRewritten(q)
    val exp = groundTruth(
      ranged.filter(col("event_type") === "click").agg(sum("value")).collect()(0).getDouble(0))
    assert(math.abs(q.collect()(0).getDouble(0) - exp) < 1e-6)
  }

  test("R2 keyed: multi-conjunct residual matches regardless of conjunct order") {
    setup
    UWheelIndex.buildIndex(spark, path,
      IndexBuilder("value", Some("event_type = 'click' AND user_id > 10")))
    val q1 = ranged.filter(col("event_type") === "click" && col("user_id") > 10)
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("s"))
    val q2 = ranged.filter(col("user_id") > 10 && col("event_type") === "click")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("s"))
    assertRewritten(q1)
    assertRewritten(q2)
    val exp = groundTruth(q1.collect()(0).getDouble(0))
    assert(q1.collect()(0).getDouble(0) === exp)
    assert(q2.collect()(0).getDouble(0) === exp)
  }

  test("R2 keyed: unknown residual predicate does NOT rewrite") {
    setup
    val q = ranged.filter(col("event_type") === "view").agg(sum("value").as("s"))
    assertNotRewritten(q)
  }

  test("decimal-exact SUM rewrite (sum over CAST(value AS DECIMAL))") {
    setup
    val q = ranged.agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("s"))
    assertRewritten(q)
    val exp = groundTruth(
      ranged.agg(sum(col("value").cast("decimal(18,2)")).cast("double")).collect()(0).getDouble(0))
    assert(q.collect()(0).getDouble(0) === exp)
  }

  test("R3: GROUP BY date_trunc(hour) rewrites and matches") {
    setup
    val q = ranged
      .groupBy(date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("cnt"), min("value").as("mn"), max("value").as("mx"))
      .orderBy("bucket")
    assertRewritten(q)
    val got = q.collect()
    val exp = groundTruth {
      ranged.groupBy(date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("cnt"), min("value").as("mn"), max("value").as("mx"))
        .orderBy("bucket").collect()
    }
    assert(got.length === exp.length)
    got.zip(exp).foreach { case (g, e) =>
      assert(g.getTimestamp(0) === e.getTimestamp(0))
      assert(g.getLong(1) === e.getLong(1))
      assert(g.getDouble(2) === e.getDouble(2))
      assert(g.getDouble(3) === e.getDouble(3))
    }
  }

  test("R3: GROUP BY date_trunc(week) is Monday-anchored like Spark") {
    setup
    val q = events
      .filter(col("ts") >= lit("2024-01-01 00:00:00").cast("timestamp") &&
              col("ts") < lit("2024-01-29 00:00:00").cast("timestamp"))
      .groupBy(date_trunc("week", col("ts")).as("wk")).agg(count(lit(1)).as("cnt"))
      .orderBy("wk")
    assertRewritten(q)
    val got = q.collect()
    val exp = groundTruth {
      events.filter(col("ts") >= lit("2024-01-01 00:00:00").cast("timestamp") &&
                    col("ts") < lit("2024-01-29 00:00:00").cast("timestamp"))
        .groupBy(date_trunc("week", col("ts")).as("wk")).agg(count(lit(1)).as("cnt"))
        .orderBy("wk").collect()
    }
    assert(got.map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq ===
           exp.map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq)
  }

  test("R4/R5: landmark multi-aggregate with no WHERE") {
    setup
    val q = events.agg(count(lit(1)).as("cnt"), sum("value").as("s"))
    assertRewritten(q)
    val got = q.collect()(0)
    val exp = groundTruth(events.agg(count(lit(1)), sum("value")).collect()(0))
    assert(got.getLong(0) === exp.getLong(0))
    assert(math.abs(got.getDouble(1) - exp.getDouble(1)) < 1e-4)
  }

  test("R6: zero-count range prunes to empty without scan") {
    setup
    val q = events.filter(
      col("ts") >= lit("2030-01-01 00:00:00").cast("timestamp") &&
      col("ts") < lit("2030-02-01 00:00:00").cast("timestamp"))
    assertRewritten(q)
    assert(q.count() === 0)
  }

  test("R7: min/max contradiction prunes to empty") {
    setup
    val q = ranged.filter(col("value") > lit(1e6))
    assertRewritten(q)
    assert(q.count() === 0)
  }

  test("R7 negative: satisfiable min/max predicate does not prune") {
    setup
    val q = ranged.filter(col("value") > lit(1.0))
    assertNotRewritten(q)
    assert(q.count() > 0)
  }

  test("sub-slot bound does not rewrite aggregates (exactness gate)") {
    setup
    // 500 µs: finer than ANY wheel level — the second wheels decline it and
    // so does the ms bottom level (another suite sharing this JVM may have
    // registered ms wheels for this path via the contract build, and a
    // 500 MILLISECOND literal would then legitimately rewrite)
    val q = events.filter(
      col("ts") >= lit("2024-01-05 00:00:00.0005").cast("timestamp") &&
      col("ts") < lit(hi).cast("timestamp")).agg(count(lit(1)).as("cnt"))
    assertNotRewritten(q)
  }

  test("equality arms: date_trunc/to_date/year equality predicates") {
    setup
    def check(q: DataFrame): Unit = {
      assertRewritten(q)
      val got = q.collect().map(_.toString).toSeq
      val exp = groundTruth(q.collect().map(_.toString).toSeq)
      assert(got === exp)
    }
    // aligned trunc equalities: exact unit ranges (day / month / week —
    // 2024-01-08 is a Monday, so it is week-aligned too)
    val day = events.filter(
      date_trunc("day", col("ts")) === lit("2024-01-08 00:00:00").cast("timestamp"))
      .agg(count(lit(1)).as("cnt"), min("value").as("mn"))
    check(day)
    assert(day.collect()(0).getLong(0) > 0)
    check(events.filter(
      date_trunc("month", col("ts")) === lit("2024-01-01 00:00:00").cast("timestamp"))
      .agg(count(lit(1)).as("cnt")))
    check(events.filter(
      date_trunc("week", col("ts")) === lit("2024-01-08 00:00:00").cast("timestamp"))
      .agg(count(lit(1)).as("cnt")))
    // to_date / year equalities: whole-day and whole-year ranges
    check(events.filter(to_date(col("ts")) === lit("2024-01-08").cast("date"))
      .agg(count(lit(1)).as("cnt")))
    check(events.filter(year(col("ts")) === 2024).agg(count(lit(1)).as("cnt")))
    // unit-unaligned trunc equality is unsatisfiable: empty at plan time
    val empty = events.filter(
      date_trunc("month", col("ts")) === lit("2024-01-15 00:00:00").cast("timestamp"))
      .select("event_id")
    assertRewritten(empty)
    assert(empty.count() === 0)
    // point timestamp equality: a one-second superset, inexact — aggregates
    // over a NON-empty second fall through to the scan (an empty second is
    // instead pruned, which the 2030 case below exercises). Use a second
    // that provably holds an event: any event's ts floored to its second.
    val busySec = groundTruth(
      events.select(date_trunc("second", col("ts")).as("s")).limit(1).collect()(0)
        .getTimestamp(0))
    assertNotRewritten(events.filter(col("ts") === lit(busySec))
      .agg(count(lit(1)).as("cnt")))
    // ...but a point inside a provably-empty second prunes rows at plan time
    val p = events.filter(col("ts") === lit("2030-06-01 12:00:00").cast("timestamp"))
      .select("event_id")
    assertRewritten(p)
    assert(p.count() === 0)
    // calendar-view INEQUALITIES are exact for every operator — including
    // unit-unaligned literals (day-trunc < a noon literal rounds to the
    // next day boundary, which is what the trunc comparison means)
    check(events.filter(
      date_trunc("day", col("ts")) >= lit("2024-01-06 00:00:00").cast("timestamp") &&
      date_trunc("day", col("ts")) < lit("2024-01-09 12:00:00").cast("timestamp"))
      .agg(count(lit(1)).as("cnt")))
    check(events.filter(
      to_date(col("ts")) > lit("2024-01-06").cast("date") &&
      to_date(col("ts")) <= lit("2024-01-09").cast("date"))
      .agg(count(lit(1)).as("cnt")))
    check(events.filter(year(col("ts")) <= 2024).agg(count(lit(1)).as("cnt")))
  }

  test("scalar subqueries rewrite: the wheel answer inlines as a LocalRelation") {
    setup
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val q = spark.sql(
      """SELECT user_id, count(*) AS n FROM events
        |GROUP BY user_id
        |HAVING count(*) > CAST((SELECT count(*) FROM events
        |                        WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |                          AND ts < TIMESTAMP '2024-01-12 00:00:00') AS DOUBLE) / 20.0
        |ORDER BY user_id""".stripMargin)
    val subPlans = q.queryExecution.optimizedPlan.subqueriesAll
    assert(subPlans.nonEmpty)
    assert(subPlans.forall(_.collect { case l: LocalRelation => l }.nonEmpty),
      s"subquery not wheel-answered:\n${subPlans.mkString("\n")}")
    val got = q.collect().map(_.toString).toSeq
    assert(got === groundTruth(q.collect().map(_.toString).toSeq))
    assert(got.nonEmpty)
  }

  test("GROUP BY year(ts): integer year keys from calendar buckets") {
    setup
    def q = events.groupBy(year(col("ts")).as("y"))
      .agg(count(lit(1)).as("cnt"), max("value").as("mx")).orderBy("y")
    assertRewritten(q)
    assert(q.collect().map(_.toString).toSeq ===
      groundTruth(q.collect().map(_.toString).toSeq))
    // year() of a TIMESTAMP goes through a session-zone date cast: under a
    // DST zone the piecewise composition still rewrites it, exactly
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      def qz = events.groupBy(year(col("ts")).as("y")).agg(count(lit(1)).as("c"))
      assertRewritten(qz)
      assert(qz.collect().map(_.toString).sorted.toSeq ===
        groundTruth(qz.collect().map(_.toString).sorted.toSeq))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("multi-range: OR of time windows and IN lists rewrite additively") {
    setup
    def check(q: DataFrame): Unit = {
      assertRewritten(q)
      val got = q.collect().map(_.toString).toSeq
      val exp = groundTruth(q.collect().map(_.toString).toSeq)
      assert(got === exp)
    }
    def ts(s: String) = lit(s).cast("timestamp")
    val or2 = events.filter(
      (col("ts") >= ts("2024-01-05 00:00:00") && col("ts") < ts("2024-01-07 00:00:00")) ||
      (col("ts") >= ts("2024-01-10 00:00:00") && col("ts") < ts("2024-01-11 00:00:00")))
    val full = or2.agg(count(lit(1)).as("cnt"),
      sum(col("value").cast("decimal(18,2)")).as("s"),
      min("value").as("mn"), max("value").as("mx"))
    check(full)
    assert(full.collect()(0).getLong(0) > 0)
    // overlapping windows normalize to one range — no double counting
    check(events.filter(
      (col("ts") >= ts("2024-01-05 00:00:00") && col("ts") < ts("2024-01-08 00:00:00")) ||
      (col("ts") >= ts("2024-01-07 00:00:00") && col("ts") < ts("2024-01-09 00:00:00")))
      .agg(count(lit(1)).as("cnt")))
    // group-by across the union; same-day split windows merge within bucket
    check(or2.groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("c")).orderBy("d"))
    check(events.filter(
      (col("ts") >= ts("2024-01-05 02:00:00") && col("ts") < ts("2024-01-05 04:00:00")) ||
      (col("ts") >= ts("2024-01-05 10:00:00") && col("ts") < ts("2024-01-05 12:00:00")))
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("c")).orderBy("d"))
    // keyed residual composes with the OR range set
    check(or2.filter(col("event_type") === "click")
      .agg(sum(col("value").cast("decimal(18,2)")).as("s")))
    // a non-time disjunct keeps the whole OR residual: no rewrite
    assertNotRewritten(events.filter(
      (col("ts") >= ts("2024-01-05 00:00:00") && col("ts") < ts("2024-01-07 00:00:00")) ||
      col("user_id") === 5)
      .agg(count(lit(1)).as("cnt")))
    // OR of two provably-empty future windows prunes rows at plan time
    val p = events.filter(
      (col("ts") >= ts("2030-01-01 00:00:00") && col("ts") < ts("2030-02-01 00:00:00")) ||
      (col("ts") >= ts("2031-01-01 00:00:00") && col("ts") < ts("2031-02-01 00:00:00")))
      .select("event_id")
    assertRewritten(p)
    assert(p.count() === 0)
  }

  test("unindexed table is untouched") {
    setup
    // supplier is never indexed by any suite (lineitem may be, via the
    // contract-query context built in other specs sharing this JVM)
    val s = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    assertNotRewritten(s.agg(count(lit(1))))
  }

  test("DST session zone: coarse date_trunc group-bys rewrite piecewise, exactly") {
    setup
    instantsPath // force the twin build while the session is still UTC
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val q = iranged.groupBy(date_trunc("hour", col("ts")).as("b"))
        .agg(count(lit(1)).as("c")).orderBy("b")
      assertRewritten(q)
      assert(q.collect().map(_.toString).toSeq ===
        groundTruth(q.collect().map(_.toString).toSeq))
      val q2 = iranged.groupBy(date_trunc("second", col("ts")).as("b"))
        .agg(count(lit(1)).as("c"))
      assertRewritten(q2)
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("non-UTC sessions: every zone rewrites coarse group-bys exactly; WHERE-side calendar predicates stay offset-gated") {
    setup
    instantsPath // force the twin build while the session is still UTC
    // a half-hour fixed-offset zone (constant +05:30 across the data span:
    // the shifted-slot composition), a :45 offset (Asia/Kathmandu:
    // minute-level composition for day buckets), and a DST zone
    // (America/New_York: the piecewise transition-split composition).
    // Group-bys rewrite in ALL of them now; `fixed` only gates the
    // WHERE-side calendar predicates, which still require a constant
    // offset (declining under DST — falling through, never wrong).
    for ((tz, fixed) <- Seq("Asia/Kolkata" -> true, "Asia/Kathmandu" -> true,
                            "America/New_York" -> false)) {
      spark.conf.set("spark.sql.session.timeZone", tz)
      try {
        for (unit <- Seq("minute", "hour", "day", "week", "month", "quarter", "year")) {
          val q = iranged.groupBy(date_trunc(unit, col("ts")).as("b"))
            .agg(count(lit(1)).as("c"), min("value").as("mn")).orderBy("b")
          assertRewritten(q)
          val got = q.collect().map(_.toString).toSeq
          val exp = groundTruth(q.collect().map(_.toString).toSeq)
          assert(got === exp, s"$tz / $unit")
        }
        // to_date and year() compose the same way: local-day/local-year
        // buckets (shifted slots under a constant offset, piecewise under
        // DST)
        val qd = iranged.groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("c"))
        assertRewritten(qd)
        assert(qd.collect().map(_.toString).sorted.toSeq ===
          groundTruth(qd.collect().map(_.toString).sorted.toSeq), s"$tz / to_date")
        val qy = ievents.groupBy(year(col("ts")).as("y")).agg(count(lit(1)).as("c"))
        assertRewritten(qy)
        assert(qy.collect().map(_.toString).sorted.toSeq ===
          groundTruth(qy.collect().map(_.toString).sorted.toSeq), s"$tz / year")
        // WHERE-side calendar predicates: date-path views (to_date, year,
        // date_trunc of day and coarser) compose in EVERY zone — constant
        // shift under a fixed offset, per-boundary rule resolution under
        // DST. Sub-day trunc EQUALITY resolves per constant-offset piece
        // under DST (inequality comparisons on sub-day views still
        // decline there — offset-retaining values order non-monotonically).
        for (pred <- Seq(
            "date_trunc('day', ts) = TIMESTAMP '2024-01-08 00:00:00'",
            "to_date(ts) = DATE '2024-01-08'",
            "to_date(ts) BETWEEN DATE '2024-01-06' AND DATE '2024-01-09'",
            "year(ts) = 2024")) {
          val qw = ievents.filter(expr(pred))
            .agg(count(lit(1)).as("c"), min("value").as("mn"))
          assertRewritten(qw)
          assert(qw.collect().map(_.toString).toSeq ===
            groundTruth(qw.collect().map(_.toString).toSeq), s"$tz / WHERE $pred")
        }
        // sub-day trunc EQUALITY now rewrites under DST too (round-7
        // verdict): away from transitions it is a plain hour range; at
        // transitions the per-piece resolution takes over (DstZoneSpec
        // covers the repeated/skipped hours)
        val qh = ievents.filter(
            expr("date_trunc('hour', ts) = TIMESTAMP '2024-01-08 05:00:00'"))
          .agg(count(lit(1)).as("c"))
        assertRewritten(qh)
        assert(qh.collect().map(_.toString).toSeq ===
          groundTruth(qh.collect().map(_.toString).toSeq), s"$tz / WHERE hour-eq")
        // 'second' truncation is timezone-invariant: stays rewritten + exact
        val qs = iranged.groupBy(date_trunc("second", col("ts")).as("b"))
          .agg(count(lit(1)).as("c")).orderBy("b")
        assertRewritten(qs)
        assert(qs.collect().map(_.toString).toSeq ===
          groundTruth(qs.collect().map(_.toString).toSeq), s"$tz / second")
      } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
  }

  test("month/quarter/year group-by composes calendar spans exactly") {
    setup
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cal").toString
    val p = s"$dir/t.parquet"
    // 500 irregular timestamps spanning Mar 2023 .. Feb 2024 (covers a
    // leap-February and month-length changes)
    val base = java.sql.Timestamp.valueOf("2023-03-05 07:11:13").getTime
    val rows = (0 until 500).map { i =>
      (new java.sql.Timestamp(base + i.toLong * 59123 * 1000), (i % 97) / 4.0)
    }
    rows.toDF("ts", "value").write.mode("overwrite").parquet(p)
    UWheelBuilder("ts", Seq("value")).build(spark, p)
    for (unit <- Seq("month", "quarter", "year")) {
      val q = spark.read.parquet(p)
        .groupBy(date_trunc(unit, col("ts")).as("b"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,2)")).as("s"),
          min("value").as("mn"), max("value").as("mx"))
        .orderBy("b")
      assertRewritten(q)
      val got = q.collect()
      val exp = groundTruth(q.collect())
      assert(got.length === exp.length, s"unit=$unit")
      got.zip(exp).foreach { case (g, e) =>
        assert(g.getTimestamp(0) === e.getTimestamp(0), s"unit=$unit")
        assert(g.getLong(1) === e.getLong(1), s"unit=$unit")
        assert(g.getDecimal(2) === e.getDecimal(2), s"unit=$unit")
        assert(g.getDouble(3) === e.getDouble(3), s"unit=$unit")
        assert(g.getDouble(4) === e.getDouble(4), s"unit=$unit")
      }
    }
  }

  test("time-range-restricted wheel only answers queries inside its coverage") {
    setup
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cov").toString
    val p = s"$dir/t.parquet"
    val base = java.sql.Timestamp.valueOf("2024-06-01 00:00:00").getTime
    (0 until 200).map(i => (new java.sql.Timestamp(base + i * 60000L), i.toDouble))
      .toDF("ts", "value").write.mode("overwrite").parquet(p)
    val covLo = base / 1000 + 1800            // coverage [t+30min, t+90min)
    val covHi = base / 1000 + 5400
    UWheelBuilder("ts", Seq("value")).withTimeRange(covLo, covHi).build(spark, p)
    def q(a: String, b: String) = spark.read.parquet(p)
      .filter(col("ts") >= lit(a).cast("timestamp") && col("ts") < lit(b).cast("timestamp"))
      .agg(count(lit(1)).as("c"))
    // inside coverage: rewrites and matches ground truth
    val inside = q("2024-06-01 00:40:00", "2024-06-01 01:20:00")
    assertRewritten(inside)
    assert(inside.collect()(0).getLong(0) === groundTruth(
      q("2024-06-01 00:40:00", "2024-06-01 01:20:00").collect()(0).getLong(0)))
    // straddling the coverage edge: must NOT rewrite (wheel is partial there)
    assertNotRewritten(q("2024-06-01 00:00:00", "2024-06-01 01:00:00"))
    // fully outside: must NOT rewrite
    assertNotRewritten(q("2024-06-01 02:00:00", "2024-06-01 03:00:00"))
  }

  test("NaN/Infinity values survive the build and disable plain-SUM rewrites") {
    setup
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-nan").toString
    val p = s"$dir/t.parquet"
    Seq(
      (java.sql.Timestamp.valueOf("2024-07-01 00:00:00"), 1.5),
      (java.sql.Timestamp.valueOf("2024-07-01 00:00:01"), Double.NaN),
      (java.sql.Timestamp.valueOf("2024-07-01 00:00:02"), 2.5))
      .toDF("ts", "value").write.mode("overwrite").parquet(p)
    // must not throw (ANSI double->decimal of NaN would); wheel marks inexact
    UWheelBuilder("ts", Seq("value")).build(spark, p)
    def ranged = spark.read.parquet(p).filter(
      col("ts") >= lit("2024-07-01 00:00:00").cast("timestamp") &&
      col("ts") < lit("2024-07-02 00:00:00").cast("timestamp"))
    val c = ranged.agg(count(lit(1)).as("c"))
    assertRewritten(c) // counts stay exact
    assert(c.collect()(0).getLong(0) === 3L)
    assertNotRewritten(ranged.agg(sum("value").as("s"))) // sums are not
    // MIN/MAX are NaN-blind in the wheel while Spark orders NaN greatest:
    // they must fall back, and the scan's NaN answer must come through
    val mx = ranged.agg(max("value").as("mx"))
    assertNotRewritten(mx)
    assert(mx.collect()(0).getDouble(0).isNaN)
    // min/max pruning must not fire either: value > 3.0 matches the NaN row
    val f = ranged.filter(col("value") > lit(3.0))
    assertNotRewritten(f)
    assert(f.count() === 1L)
  }

  test("non-UTC session: NTZ range aggregates fall back to the scan") {
    setup
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz").toString
    val p = s"$dir/t.parquet"
    // sub-day timestamps so a zone shift actually moves rows across bounds
    Seq("2024-07-01 03:30:00", "2024-07-01 10:00:00", "2024-07-01 23:30:00")
      .map(s => Tuple1(java.time.LocalDateTime.parse(s.replace(' ', 'T'))))
      .toDF("ts").withColumn("value", lit(1.0))
      .write.mode("overwrite").parquet(p)
    val dt = spark.read.parquet(p).schema("ts").dataType
    assert(dt === org.apache.spark.sql.types.TimestampNTZType)
    UWheelBuilder("ts", Seq("value")).build(spark, p)
    def q = spark.read.parquet(p)
      .filter(col("ts") >= lit("2024-07-01 05:00:00").cast("timestamp") &&
              col("ts") < lit("2024-07-02 00:00:00").cast("timestamp"))
      .agg(count(lit(1)).as("c"))
    assertRewritten(q)
    assert(q.collect()(0).getLong(0) === 2L)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      // Spark unwraps the session-zone cast into a pure NTZ wall-clock
      // comparison during optimization, so the rewrite stays sound in any
      // zone; assert it fires AND equals the rule-disabled scan. (A
      // non-unwrapped NTZ→LTZ cast in a non-UTC zone is rejected by
      // Extract.isTime as defense-in-depth.)
      assertRewritten(q)
      assert(q.collect()(0).getLong(0) === groundTruth(q.collect()(0).getLong(0)))
      assert(q.collect()(0).getLong(0) === 2L)
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("DateType time column: build, exact inclusive bounds, group-bys, zone-freedom") {
    setup
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-date").toString
    val p = s"$dir/t.parquet"
    // 400 days spanning 2023-11-15 .. 2024-12-18 (crosses a year boundary
    // and a leap February), several rows per day
    val d0 = java.time.LocalDate.parse("2023-11-15")
    val rows = (0 until 1200).map { i =>
      (java.sql.Date.valueOf(d0.plusDays(i % 400)), (i % 53) / 2.0)
    }
    rows.toDF("d", "value").write.mode("overwrite").parquet(p)
    assert(spark.read.parquet(p).schema("d").dataType ===
      org.apache.spark.sql.types.DateType)
    UWheelBuilder("d", Seq("value")).build(spark, p)

    def t = spark.read.parquet(p)
    def check(q: DataFrame): Unit = {
      assertRewritten(q)
      val got = q.collect().map(_.toString).toSeq
      val exp = groundTruth(q.collect().map(_.toString).toSeq)
      assert(got === exp)
    }
    // inclusive upper bound and strict lower bound are whole-day-exact
    check(t.filter(col("d") >= lit("2024-01-01").cast("date") &&
                   col("d") <= lit("2024-03-31").cast("date"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).as("s"),
        min("value").as("mn"), max("value").as("mx")))
    check(t.filter(col("d") > lit("2024-02-28").cast("date") &&
                   col("d") < lit("2024-04-01").cast("date"))
      .agg(count(lit(1)).as("cnt")))
    // GROUP BY the bare date column (day buckets, DATE keys)
    check(t.filter(col("d") >= lit("2024-02-01").cast("date") &&
                   col("d") < lit("2024-03-05").cast("date"))
      .groupBy(col("d")).agg(count(lit(1)).as("cnt"), max("value").as("mx"))
      .orderBy("d"))
    // trunc(date, unit): DATE-in/DATE-out calendar group-bys
    for (unit <- Seq("week", "month", "quarter", "year"))
      check(t.groupBy(trunc(col("d"), unit).as("b"))
        .agg(count(lit(1)).as("cnt"), sum(col("value").cast("decimal(18,2)")).as("s"))
        .orderBy("b"))
    // date_trunc through the timestamp cast works under UTC too
    check(t.groupBy(date_trunc("month", col("d")).as("b"))
      .agg(count(lit(1)).as("cnt")).orderBy("b"))
    // emptiness pruning from date bounds
    val pruned = t.filter(col("d") >= lit("2031-01-01").cast("date") &&
                          col("d") < lit("2031-06-01").cast("date"))
    assertRewritten(pruned)
    assert(pruned.count() === 0)

    // equality arms on DATE columns: whole-day, trunc-month, year — all
    // calendar-exact; an unaligned trunc equality is empty at plan time
    check(t.filter(col("d") === lit("2024-02-29").cast("date"))
      .agg(count(lit(1)).as("cnt"), max("value").as("mx")))
    check(t.filter(trunc(col("d"), "month") === lit("2024-02-01").cast("date"))
      .agg(count(lit(1)).as("cnt")))
    check(t.filter(year(col("d")) === 2024).agg(count(lit(1)).as("cnt")))
    // GROUP BY year(dateCol): two calendar years in this fixture
    check(t.groupBy(year(col("d")).as("y")).agg(count(lit(1)).as("cnt")).orderBy("y"))
    val eqEmpty = t.filter(trunc(col("d"), "month") === lit("2024-02-02").cast("date"))
    assertRewritten(eqEmpty)
    assert(eqEmpty.count() === 0)

    // trunc-date inequality with an unaligned literal rounds to the next
    // month boundary (what the trunc comparison means), staying exact
    check(t.filter(trunc(col("d"), "month") >= lit("2024-02-15").cast("date"))
      .agg(count(lit(1)).as("cnt")))

    // date IN lists: the short form stays In, the long form becomes InSet
    // via OptimizeIn — both must extract to a union of day ranges
    def dates(ss: String*) = ss.map(java.sql.Date.valueOf)
    check(t.filter(col("d").isInCollection(dates("2024-02-29", "2024-03-01", "2024-06-15")))
      .agg(count(lit(1)).as("cnt"), max("value").as("mx")))
    val manyDates = dates(
      "2024-01-01", "2024-01-05", "2024-01-09", "2024-02-02", "2024-02-12",
      "2024-02-29", "2024-03-07", "2024-03-21", "2024-04-04", "2024-05-05",
      "2024-06-15", "2024-07-04")
    check(t.filter(col("d").isInCollection(manyDates))
      .agg(count(lit(1)).as("cnt")))

    // zone-freedom: DATE vs DATE is calendar arithmetic — rewrites must
    // stay correct (and on) in any session zone; the timestamp-cast
    // group-by must fall through instead of silently differing
    spark.conf.set("spark.sql.session.timeZone", "Australia/Eucla") // +08:45
    try {
      check(t.filter(col("d") >= lit("2024-01-01").cast("date") &&
                     col("d") <= lit("2024-03-31").cast("date"))
        .agg(count(lit(1)).as("cnt")))
      check(t.filter(col("d") >= lit("2024-02-01").cast("date") &&
                     col("d") < lit("2024-03-05").cast("date"))
        .groupBy(col("d")).agg(count(lit(1)).as("cnt")).orderBy("d"))
      check(t.groupBy(trunc(col("d"), "month").as("b"))
        .agg(count(lit(1)).as("cnt")).orderBy("b"))
      assertNotRewritten(t.groupBy(date_trunc("month", col("d")).as("b"))
        .agg(count(lit(1)).as("cnt")))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("randomized range parity: rewritten answers equal the scan on 60 random ranges") {
    setup
    val rnd = new scala.util.Random(20240812L)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    for (_ <- 0 until 60) {
      val s = base + rnd.nextInt(35 * 86400)
      val e = s + 1 + rnd.nextInt(20 * 86400)
      def fmt(sec: Long) = new java.sql.Timestamp(sec * 1000).toString
      // a def, not a val: a Dataset memoizes its QueryExecution, so the
      // groundTruth evaluation must plan a FRESH query with the rule off
      def q = events.filter(
          col("ts") >= lit(fmt(s)).cast("timestamp") && col("ts") < lit(fmt(e)).cast("timestamp"))
        .agg(count(lit(1)).as("c"),
          sum(col("value").cast("decimal(18,2)")).as("sd"),
          min("value").as("mn"), max("value").as("mx"))
      // whole-second literals over an indexed table: every one must rewrite
      assertRewritten(q)
      val got = q.collect()(0).toString
      val exp = groundTruth {
        val scan = q
        assertNotRewritten(scan)
        scan.collect()(0).toString
      }
      assert(got === exp, s"range [${fmt(s)}, ${fmt(e)})")
    }
  }

  test("randomized fixed-offset-zone parity: group-bys and calendar filters match the scan") {
    setup
    instantsPath // force the twin build while the session is still UTC
    val rnd = new scala.util.Random(70082026L)
    // whole-hour, half-hour, and :45 offsets — every shifted-slot
    // composition granularity (hour / minute fine levels)
    val zones = Seq("Asia/Kolkata", "Asia/Kathmandu", "Australia/Eucla", "Asia/Tokyo")
    val units = Seq("minute", "hour", "day", "week", "month", "year")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    def fmt(sec: Long) = new java.sql.Timestamp(sec * 1000).toString
    for (i <- 0 until 30) {
      val tz = zones(i % zones.length)
      spark.conf.set("spark.sql.session.timeZone", tz)
      try {
        val s = base + rnd.nextInt(20 * 86400)
        val e = s + 3600 + rnd.nextInt(12 * 86400)
        val unit = units(rnd.nextInt(units.length))
        def q = ievents.filter(
            col("ts") >= lit(fmt(s)).cast("timestamp") &&
              col("ts") < lit(fmt(e)).cast("timestamp"))
          .groupBy(date_trunc(unit, col("ts")).as("b"))
          .agg(count(lit(1)).as("c"), min("value").as("mn"))
          .orderBy("b")
        assertRewritten(q)
        val got = q.collect().map(_.toString).toSeq
        assert(got === groundTruth(q.collect().map(_.toString).toSeq),
          s"$tz / $unit / [${fmt(s)}, ${fmt(e)})")
        // a day-equality filter in the same zone (literal parsed locally:
        // always day-aligned in the session zone, so it must rewrite)
        val day = fmt(base + 86400L * rnd.nextInt(25)).take(10)
        def qe = ievents.filter(expr(s"date_trunc('day', ts) = TIMESTAMP '$day 00:00:00'"))
          .agg(count(lit(1)).as("c"))
        assertRewritten(qe)
        assert(qe.collect()(0).getLong(0) ===
          groundTruth(qe.collect()(0).getLong(0)), s"$tz / eq $day")
      } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
  }

  test("randomized OR-range parity: unions of 2-3 random windows match the scan") {
    setup
    val rnd = new scala.util.Random(51072026L)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    def fmt(sec: Long) = new java.sql.Timestamp(sec * 1000).toString
    for (_ <- 0 until 40) {
      // random windows that may overlap, nest, touch, or be disjoint
      val n = 2 + rnd.nextInt(2)
      val windows = Seq.fill(n) {
        val s = base + rnd.nextInt(35 * 86400)
        (s, s + 1 + rnd.nextInt(10 * 86400))
      }
      def cond = windows.map { case (s, e) =>
        col("ts") >= lit(fmt(s)).cast("timestamp") &&
          col("ts") < lit(fmt(e)).cast("timestamp")
      }.reduce(_ || _)
      def q = events.filter(cond)
        .agg(count(lit(1)).as("c"),
          sum(col("value").cast("decimal(18,2)")).as("sd"),
          min("value").as("mn"), max("value").as("mx"))
      assertRewritten(q)
      val got = q.collect()(0).toString
      val exp = groundTruth {
        val scan = q
        assertNotRewritten(scan)
        scan.collect()(0).toString
      }
      assert(got === exp, windows.map { case (s, e) => s"[${fmt(s)}, ${fmt(e)})" }.mkString(" OR "))
    }
  }

  test("multi-column GROUP BY: time bucket x complete keyed-wheel set rewrites") {
    setup
    // one equality wheel per event_type value: the complete per-value set
    // the two-column arm routes on (the click wheel exists from setup)
    Seq("error", "purchase", "signup", "view").foreach { et =>
      UWheelIndex.buildIndex(spark, path,
        IndexBuilder("value", Some(s"event_type = '$et'")))
    }
    def q = ranged
      .groupBy(date_trunc("day", col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .orderBy("d", "event_type")
    assertRewritten(q)
    val got = q.collect().map(_.toString).toSeq
    val exp = groundTruth {
      assertNotRewritten(q)
      q.collect().map(_.toString).toSeq
    }
    assert(got === exp)
    assert(got.nonEmpty)

    // key column with no equality wheels: falls back to the scan
    val neg = ranged.groupBy(date_trunc("day", col("ts")), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    assertNotRewritten(neg)

    // residual predicate does not compose with per-value routing
    val neg2 = ranged.filter(col("user_id") > 10)
      .groupBy(date_trunc("day", col("ts")), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assertNotRewritten(neg2)
  }

  test("multi-column GROUP BY composes with a non-UTC session over the NTZ column") {
    setup
    // per-value wheels from the multi-column test above (suite order);
    // under a session zone the bucket arm is the NTZ constant-offset fast
    // path (January corpus, New York: months from either transition) and
    // the per-value routing must compose with its instant keys
    Seq("click", "error", "purchase", "signup", "view").foreach { et =>
      UWheelIndex.buildIndex(spark, path,
        IndexBuilder("value", Some(s"event_type = '$et'")))
    }
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      def q = ranged
        .groupBy(date_trunc("day", col("ts")).as("d"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
        .orderBy("d", "event_type")
      assertRewritten(q)
      assert(q.collect().map(_.toString).toSeq ===
        groundTruth(q.collect().map(_.toString).toSeq))
      assert(q.collect().nonEmpty)
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("GROUP BY key only (no time bucket) rewrites from the per-value set") {
    setup
    Seq("error", "purchase", "signup", "view").foreach { et =>
      UWheelIndex.buildIndex(spark, path,
        IndexBuilder("value", Some(s"event_type = '$et'")))
    }
    // the everyday "top event types last week" shape: range filter, key
    // grouping, multiple aggregates — one row per value, no bucket arm
    def q = ranged
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"),
        min("value").as("mn"), max("value").as("mx"))
      .orderBy(col("cnt").desc, col("event_type"))
    assertRewritten(q)
    val got = q.collect().map(_.toString).toSeq
    val exp = groundTruth {
      assertNotRewritten(q)
      q.collect().map(_.toString).toSeq
    }
    assert(got === exp)
    assert(got.nonEmpty)
    // ... and composes downstream: ORDER BY cnt LIMIT k over the
    // LocalRelation is the top-k over the range, still scan-free
    val topk = q.limit(2)
    assertRewritten(topk)
    assert(topk.collect().map(_.toString).toSeq ===
      groundTruth(topk.collect().map(_.toString).toSeq))
    // landmark form (no WHERE): the proof runs over the wheel extent
    def ql = events.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")
    assertRewritten(ql)
    assert(ql.collect().map(_.toString).toSeq ===
      groundTruth(ql.collect().map(_.toString).toSeq))
    // no per-value wheels for this column: scan
    assertNotRewritten(ranged.groupBy(col("user_id")).agg(count(lit(1)).as("cnt")))
    // residuals do not compose with per-value routing
    assertNotRewritten(ranged.filter(col("user_id") > 10)
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt")))
  }

  test("GROUP BY key only declines on an INCOMPLETE set or NULL keys") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-keyonly").toString
    val p = s"$dir/t.parquet"
    def row(s: String, v: Double, k: String) = (java.sql.Timestamp.valueOf(s), v, k)
    Seq(row("2024-02-01 00:00:00", 1.0, "a"), row("2024-02-01 00:00:01", 2.0, "b"),
      row("2024-02-02 00:00:00", 4.0, "a")).toDF("ts", "value", "k")
      .write.mode("overwrite").parquet(p)
    UWheelBuilder("ts", Seq("value"))
      .withKeyedWheel(IndexBuilder("value", Some("k = 'a'"))) // no 'b' wheel
      .build(spark, p)
    val q = spark.read.parquet(p)
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
    assertNotRewritten(q) // counting proof fails: 'b' rows are uncovered
    assert(q.collect().length === 2)

    // NULL keys: complete value wheels but null rows break the proof
    val p2 = s"$dir/t2.parquet"
    Seq((java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 1.0, "a"),
      (java.sql.Timestamp.valueOf("2024-02-01 00:00:01"), 2.0, null))
      .toDF("ts", "value", "k").write.mode("overwrite").parquet(p2)
    UWheelBuilder("ts", Seq("value"))
      .withKeyedWheel(IndexBuilder("value", Some("k = 'a'")))
      .build(spark, p2)
    val q2 = spark.read.parquet(p2).groupBy(col("k")).agg(count(lit(1)).as("cnt"))
    assertNotRewritten(q2)
    assert(q2.collect().length === 2) // 'a' and the NULL group
  }

  test("multi-column GROUP BY declines on an INCOMPLETE keyed-wheel set") {
    // a table of its own: wheels for only one of two key values — the
    // plan-time counting proof must reject the rewrite (missing value rows
    // would silently vanish from the result otherwise)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-partial").toString
    val p = s"$dir/t.parquet"
    def row(s: String, v: Double, k: String) = (java.sql.Timestamp.valueOf(s), v, k)
    Seq(row("2024-02-01 00:00:00", 1.0, "a"), row("2024-02-01 00:00:01", 2.0, "b"),
      row("2024-02-02 00:00:00", 4.0, "a")).toDF("ts", "value", "k")
      .write.mode("overwrite").parquet(p)
    UWheelBuilder("ts", Seq("value"))
      .withKeyedWheel(IndexBuilder("value", Some("k = 'a'"))) // no 'b' wheel
      .build(spark, p)
    val df = spark.read.parquet(p)
      .filter(col("ts") >= lit("2024-02-01 00:00:00").cast("timestamp") &&
              col("ts") < lit("2024-02-03 00:00:00").cast("timestamp"))
      .groupBy(date_trunc("day", col("ts")), col("k"))
      .agg(count(lit(1)).as("cnt"))
    assertNotRewritten(df)
    assert(df.collect().length === 3)
  }

  test("exact COUNT(DISTINCT key): complete keyed set rewrites, scalar and bucketed") {
    setup
    Seq("error", "purchase", "signup", "view").foreach { et =>
      UWheelIndex.buildIndex(spark, path,
        IndexBuilder("value", Some(s"event_type = '$et'")))
    }
    // scalar, mixed with plain wheel aggregates
    def q = ranged.agg(countDistinct(col("event_type")).as("dt"),
      count(lit(1)).as("cnt"), min("value").as("mn"))
    assertRewritten(q)
    assert(q.collect()(0).toString === groundTruth(q.collect()(0).toString))
    assert(q.collect()(0).getLong(0) === 5L)
    // per-day buckets: per-bucket nonzero-count enumeration
    def qd = ranged.groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(countDistinct("event_type").as("dt"), count(lit(1)).as("cnt"))
      .orderBy("d")
    assertRewritten(qd)
    assert(qd.collect().map(_.toString).toSeq ===
      groundTruth(qd.collect().map(_.toString).toSeq))
    // residual filters don't compose with per-value routing
    assertNotRewritten(ranged.filter(col("user_id") > 10)
      .agg(countDistinct("event_type").as("dt")))
    // distinct over a column with no keyed wheels falls back
    val qu = ranged.agg(countDistinct("user_id").as("du"))
    assertNotRewritten(qu)
    assert(qu.collect()(0).getLong(0) === groundTruth(qu.collect()(0).getLong(0)))
  }

  test("exact COUNT(DISTINCT): NULL keys and uncovered values fail the counting proof") {
    setup
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cntdist").toString
    def row(s: String, v: Double, k: String) = (java.sql.Timestamp.valueOf(s), v, k)
    def win(df: DataFrame) = df.filter(
      col("ts") >= lit("2024-02-01 00:00:00").cast("timestamp") &&
      col("ts") < lit("2024-02-04 00:00:00").cast("timestamp"))

    // per-bucket variation: day 1 has both values, days 2 and 3 one each
    val p1 = s"$dir/t1.parquet"
    Seq(row("2024-02-01 00:00:00", 1.0, "a"), row("2024-02-01 00:10:00", 2.0, "b"),
      row("2024-02-02 00:00:00", 3.0, "a"),
      row("2024-02-03 00:00:00", 4.0, "b"), row("2024-02-03 00:00:02", 5.0, "b"))
      .toDF("ts", "value", "k").write.mode("overwrite").parquet(p1)
    UWheelBuilder("ts", Seq("value"))
      .withKeyedWheel(IndexBuilder("value", Some("k = 'a'")))
      .withKeyedWheel(IndexBuilder("value", Some("k = 'b'")))
      .build(spark, p1)
    val q1 = win(spark.read.parquet(p1))
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(countDistinct("k").as("dk")).orderBy("d")
    assertRewritten(q1)
    assert(q1.collect().map(_.getLong(1)).toSeq === Seq(2L, 1L, 1L))

    // NULL keys: COUNT(DISTINCT) ignores them but the base count includes
    // them — per-value sums come up short and the proof declines
    val p2 = s"$dir/t2.parquet"
    Seq((java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 1.0, Some("a")),
      (java.sql.Timestamp.valueOf("2024-02-01 00:00:01"), 2.0, Option.empty[String]))
      .toDF("ts", "value", "k").write.mode("overwrite").parquet(p2)
    UWheelBuilder("ts", Seq("value"))
      .withKeyedWheel(IndexBuilder("value", Some("k = 'a'")))
      .build(spark, p2)
    val q2 = win(spark.read.parquet(p2)).agg(countDistinct("k").as("dk"))
    assertNotRewritten(q2)
    assert(q2.collect()(0).getLong(0) === 1L)

    // a live value with no wheel: sums come up short, proof declines
    val p3 = s"$dir/t3.parquet"
    Seq(row("2024-02-01 00:00:00", 1.0, "a"), row("2024-02-01 00:00:01", 2.0, "b"))
      .toDF("ts", "value", "k").write.mode("overwrite").parquet(p3)
    UWheelBuilder("ts", Seq("value"))
      .withKeyedWheel(IndexBuilder("value", Some("k = 'a'")))
      .build(spark, p3)
    val q3 = win(spark.read.parquet(p3)).agg(countDistinct("k").as("dk"))
    assertNotRewritten(q3)
    assert(q3.collect()(0).getLong(0) === 2L)
  }

  test("keyed IN union: key IN (v1..vk) answers from the per-value wheel union") {
    setup
    Seq("error", "purchase", "signup", "view").foreach { et =>
      UWheelIndex.buildIndex(spark, path,
        IndexBuilder("value", Some(s"event_type = '$et'")))
    }
    def agged(df: DataFrame) = df.agg(count(lit(1)).as("cnt"),
      sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"),
      min("value").as("mn"), max("value").as("mx"))
    // IN over indexed values
    def q = agged(ranged.filter(col("event_type").isin("click", "purchase", "signup")))
    assertRewritten(q)
    assert(q.collect()(0).toString === groundTruth(q.collect()(0).toString))
    // plain double AVG: exact up to the scan's float accumulation order
    def qa = ranged.filter(col("event_type").isin("click", "purchase", "signup"))
      .agg(avg("value").as("av"))
    assertRewritten(qa)
    assert(math.abs(qa.collect()(0).getDouble(0) -
      groundTruth(qa.collect()(0).getDouble(0))) < 1e-9)
    // the equivalent OR-of-equalities normalizes to the same union
    def qor = agged(ranged.filter(
      col("event_type") === "click" || col("event_type") === "purchase"))
    assertRewritten(qor)
    assert(qor.collect()(0).toString === groundTruth(qor.collect()(0).toString))
    // a value with NO wheel could hold rows no wheel sees: decline
    assertNotRewritten(
      agged(ranged.filter(col("event_type").isin("click", "bogus"))))
    // the GROUPED twin: per-bucket aggregates under the IN residual merge
    // the per-value wheels' bucket partials additively, and the buckets
    // enumerate from the union itself (no single wheel covers the residual)
    def qg = ranged.filter(col("event_type").isin("click", "purchase"))
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"),
        min("value").as("mn")).orderBy("d")
    assertRewritten(qg)
    assert(qg.collect().map(_.toString).toSeq ===
      groundTruth(qg.collect().map(_.toString).toSeq))
    // window() buckets compose with the union the same way
    def qw = ranged.filter(col("event_type").isin("view", "signup"))
      .groupBy(window(col("ts"), "12 hours"))
      .agg(count(lit(1)).as("cnt"), max("value").as("mx"))
      .select(col("window.start").as("ws"), col("cnt"), col("mx")).orderBy("ws")
    assertRewritten(qw)
    assert(qw.collect().map(_.toString).toSeq ===
      groundTruth(qw.collect().map(_.toString).toSeq))
    // grouped decline: a value with NO wheel could hold rows no wheel sees
    def qbad = ranged.filter(col("event_type").isin("click", "bogus"))
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt")).orderBy("d")
    assertNotRewritten(qbad)
    assert(qbad.collect().map(_.toString).toSeq ===
      groundTruth(qbad.collect().map(_.toString).toSeq))
    // GROUP BY the key itself under the IN residual: the per-value wheels
    // cover the residual by construction, so no completeness proof is
    // needed — one row per IN value with rows in range
    def qk = ranged.filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .orderBy("event_type")
    assertRewritten(qk)
    assert(qk.collect().map(_.toString).toSeq ===
      groundTruth(qk.collect().map(_.toString).toSeq))
    // ...but an IN value with no wheel, or a residual on another column,
    // still declines
    def qkbad = ranged.filter(col("event_type").isin("click", "bogus"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    assertNotRewritten(qkbad)
    assert(qkbad.collect().map(_.toString).toSeq ===
      groundTruth(qkbad.collect().map(_.toString).toSeq))
    def qother = ranged.filter(col("user_id") === 3L)
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    assertNotRewritten(qother)
  }

  test("dim-join folding: aggregate over a small plan-time dim join rewrites") {
    setup
    import spark.implicits._
    Seq("error", "purchase", "signup", "view").foreach { et =>
      UWheelIndex.buildIndex(spark, path,
        IndexBuilder("value", Some(s"event_type = '$et'")))
    }
    val dim = Seq(("click", "engagement"), ("purchase", "revenue")).toDF("et", "family")
    def q = ranged.join(dim, col("event_type") === col("et"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"),
        min("value").as("mn"))
    assertRewritten(q)
    assert(q.collect()(0).toString === groundTruth(q.collect()(0).toString))
    assert(q.collect()(0).getLong(0) > 0)
    // SQL inline-table form (the shape a dashboard generates)
    Tables.events(spark, "/root/testdata/sf0.001").createOrReplaceTempView("ev_dimjoin")
    def qsql = spark.sql(
      """SELECT count(*) AS cnt FROM ev_dimjoin
        |JOIN (SELECT * FROM VALUES ('click'), ('purchase') AS t(et)) dim
        |  ON ev_dimjoin.event_type = dim.et
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-12 00:00:00'""".stripMargin)
    assertRewritten(qsql)
    assert(qsql.collect()(0).getLong(0) === groundTruth(qsql.collect()(0).getLong(0)))
    // duplicate dim keys multiply matched fact rows: decline, stay correct
    val dup = Seq("click", "click").toDF("et")
    def qdup = ranged.join(dup, col("event_type") === col("et"))
      .agg(count(lit(1)).as("cnt"))
    assertNotRewritten(qdup)
    assert(qdup.collect()(0).getLong(0) === groundTruth(qdup.collect()(0).getLong(0)))
    // aggregates referencing the dim side need real join output: decline
    val dim2 = Seq(("click", 2.0), ("purchase", 3.0)).toDF("et", "w")
    assertNotRewritten(ranged.join(dim2, col("event_type") === col("et"))
      .agg(sum(col("w")).as("sw")))
    // oversized dim relations decline (> 64 keys)
    val big = (0 until 80).map(i => s"t$i").toDF("et")
    assertNotRewritten(ranged.join(big, col("event_type") === col("et"))
      .agg(count(lit(1)).as("cnt")))
    // non-inner joins are untouched
    assertNotRewritten(ranged.join(dim, col("event_type") === col("et"), "left")
      .agg(count(lit(1)).as("cnt")))
  }

  test("GROUP BY window(): tumbling and sliding rewrite from wheel range reads") {
    setup
    // tumbling: day-aligned, sub-day, and a stride no date_trunc can express
    for (len <- Seq("1 day", "6 hours", "90 seconds")) {
      def q = ranged.groupBy(window(col("ts"), len))
        .agg(count(lit(1)).as("c"), min("value").as("mn"), max("value").as("mx"))
        .orderBy("window")
      assertRewritten(q)
      assert(q.collect().map(_.toString).toSeq ===
        groundTruth(q.collect().map(_.toString).toSeq), s"tumbling $len")
    }
    // 7-day stride: window() anchors to the epoch (1970-01-01, a Thursday),
    // NOT the wheel's Monday-anchored week slots — regression for the
    // alignDown anchor mismatch
    def q7 = events.groupBy(window(col("ts"), "7 days"))
      .agg(count(lit(1)).as("c"), min("value").as("mn")).orderBy("window")
    assertRewritten(q7)
    assert(q7.collect().map(_.toString).toSeq ===
      groundTruth(q7.collect().map(_.toString).toSeq), "tumbling 7 days")
    // tumbling with a startTime offset
    def qo = ranged.groupBy(window(col("ts"), "1 day", "1 day", "6 hours"))
      .agg(count(lit(1)).as("c")).orderBy("window")
    assertRewritten(qo)
    assert(qo.collect().map(_.toString).toSeq ===
      groundTruth(qo.collect().map(_.toString).toSeq), "offset tumbling")
    // sliding: 2-day windows every day — one O(1) range read per bucket
    // where the scan pays a 2x Expand row multiplication
    def qs = ranged.groupBy(window(col("ts"), "2 days", "1 day"))
      .agg(count(lit(1)).as("c"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("s"))
      .orderBy("window")
    assertRewritten(qs)
    assert(qs.collect().map(_.toString).toSeq ===
      groundTruth(qs.collect().map(_.toString).toSeq), "sliding 2d/1d")
    // non-exact cover (len not a multiple of slide): the analyzer emits
    // ceil(len/slide) copies plus a trimming filter — consumed, because
    // trimmed membership is exactly [start, start+len), the member span
    // the arm reads anyway
    def qn = ranged.groupBy(window(col("ts"), "36 hours", "1 day"))
      .agg(count(lit(1)).as("c"), min("value").as("mn")).orderBy("window")
    assertRewritten(qn)
    assert(qn.collect().map(_.toString).toSeq ===
      groundTruth(qn.collect().map(_.toString).toSeq), "36h/1d")
    // sub-second slide: wheel slots are second-granular — declines
    assertNotRewritten(
      ranged.groupBy(window(col("ts"), "1 second", "500 milliseconds"))
        .agg(count(lit(1)).as("c")))
    // tumbling window x key column through the per-value counting proof
    Seq("error", "purchase", "signup", "view").foreach { et =>
      UWheelIndex.buildIndex(spark, path,
        IndexBuilder("value", Some(s"event_type = '$et'")))
    }
    def q2 = ranged.groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("c")).orderBy(col("window"), col("event_type"))
    assertRewritten(q2)
    assert(q2.collect().map(_.toString).toSeq ===
      groundTruth(q2.collect().map(_.toString).toSeq), "window x key")
    // exact COUNT(DISTINCT key) per sliding window — per-bucket counting
    // proof over the overlapping member ranges
    def q3 = ranged.groupBy(window(col("ts"), "2 days", "1 day"))
      .agg(countDistinct("event_type").as("dt"), count(lit(1)).as("c"))
      .orderBy("window")
    assertRewritten(q3)
    assert(q3.collect().map(_.toString).toSeq ===
      groundTruth(q3.collect().map(_.toString).toSeq), "sliding x countDistinct")
    // a window over a DIFFERENT timestamp expression must not be answered
    // from the ts-keyed wheels (review finding: the sliding path lacked
    // the tumbling arm's time-column gate)
    def qx = ranged.withColumn("ts2", col("ts") + expr("INTERVAL 37 MINUTES"))
      .groupBy(window(col("ts2"), "2 days", "1 day"))
      .agg(count(lit(1)).as("c")).orderBy("window")
    assertNotRewritten(qx)
    assert(qx.collect().map(_.toString).toSeq ===
      groundTruth(qx.collect().map(_.toString).toSeq), "sliding window over ts2")
    // keyed residual routes to the keyed wheel, buckets from ITS slots —
    // tumbling and sliding alike
    for ((len, slide) <- Seq(("1 day", "1 day"), ("2 days", "1 day"))) {
      def qk = ranged.filter(col("event_type") === "click")
        .groupBy(window(col("ts"), len, slide))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("s"),
          count(lit(1)).as("c")).orderBy("window")
      assertRewritten(qk)
      assert(qk.collect().map(_.toString).toSeq ===
        groundTruth(qk.collect().map(_.toString).toSeq), s"keyed x window $len/$slide")
    }
  }

  test("randomized window() parity: random len/slide/offset windows match the scan") {
    setup
    // seeded sweep over stride geometry: random second-aligned lengths,
    // slides (exact covers, trimmed non-exact covers, tumbling), and
    // startTime offsets, over random sub-ranges — every rewritten plan
    // must equal the rule-disabled scan bit-for-bit
    val rnd = new scala.util.Random(0x57171217L)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    var rewritten = 0
    for (i <- 0 until 25) {
      val slide = Seq(60L, 300L, 3600L, 7200L, 21600L, 86400L)(rnd.nextInt(6))
      val mult = 1 + rnd.nextInt(4)
      val len = // exact cover, trimmed cover, or tumbling
        rnd.nextInt(3) match {
          case 0 => slide * mult
          case 1 => slide * mult + (slide / 2 / 60 * 60).max(60L).min(slide - 60)
          case _ => slide
        }
      val off = Seq(0L, 60L, 1800L, 3600L)(rnd.nextInt(4)) % slide
      val qs = base + rnd.nextInt(14 * 86400)
      val qe = qs + 86400 + rnd.nextInt(7 * 86400)
      def q = events.filter(
          col("ts") >= lit(new java.sql.Timestamp(qs * 1000L)) &&
            col("ts") < lit(new java.sql.Timestamp(qe * 1000L)))
        .groupBy(window(col("ts"), s"$len seconds", s"$slide seconds",
          s"$off seconds"))
        .agg(count(lit(1)).as("c"), min("value").as("mn"), max("value").as("mx"))
        .orderBy("window")
      val opt = q.queryExecution.optimizedPlan
      if (opt.collect { case r: LogicalRelation => r }.isEmpty) rewritten += 1
      assert(q.collect().map(_.toString).toSeq ===
        groundTruth(q.collect().map(_.toString).toSeq),
        s"#$i window($len s, $slide s, $off s) over [$qs,$qe)")
    }
    assert(rewritten >= 20, s"only $rewritten/25 window shapes rewrote")
  }

  test("coarsened wheels only serve window() buckets their slots tile") {
    // day-coarsened slots: '2 days'/'1 day' bucket edges are day-aligned
    // and rewrite; '36 hours'/'1 day' member ENDS fall mid-slot — a
    // straddled slot would be attributed whole (counts silently doubled),
    // so the arm must decline (review finding on the fineSpan gate)
    setup
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-winspan").toString
    val p = s"$dir/t.parquet"
    (0 until 96).map(h =>
      (java.sql.Timestamp.valueOf(f"2024-02-0${1 + h / 24} ${h % 24}%02d:00:00"),
        (h % 11).toDouble))
      .toDF("ts", "value").write.mode("overwrite").parquet(p)
    UWheelBuilder("ts", Seq("value")).withSlotSpan(86400L).build(spark, p)
    def win(len: String, slide: String) = spark.read.parquet(p)
      .filter(col("ts") >= lit("2024-02-01 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-02-05 00:00:00").cast("timestamp"))
      .groupBy(window(col("ts"), len, slide))
      .agg(count(lit(1)).as("c"), min("value").as("mn")).orderBy("window")
    val ok = win("2 days", "1 day")
    assertRewritten(ok)
    assert(ok.collect().map(_.toString).toSeq ===
      groundTruth(ok.collect().map(_.toString).toSeq), "2d/1d on day slots")
    val bad = win("36 hours", "1 day")
    assertNotRewritten(bad)
    assert(bad.collect().map(_.toString).toSeq ===
      groundTruth(bad.collect().map(_.toString).toSeq), "36h/1d on day slots")
  }

  test("multi-range sum overflow degrades to the scan, never aborts or wraps") {
    // two disjoint ranges whose individual scaled sums fit in a Long but
    // whose union does not: RangeAgg.merge's addExact throws, the rule's
    // catch falls back to the scan, and the answer still matches it
    setup
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-overflow").toString
    val p = s"$dir/t.parquet"
    val big = 9.0e15 // exactly representable double; 9e17 at scale 2
    val rows =
      (0 until 6).map(i => (java.sql.Timestamp.valueOf(s"2024-05-01 00:00:0$i"), big)) ++
      (0 until 6).map(i => (java.sql.Timestamp.valueOf(s"2024-05-03 00:00:0$i"), big))
    rows.toDF("ts", "value").write.mode("overwrite").parquet(p)
    UWheelBuilder("ts", Seq("value")).build(spark, p)
    spark.read.parquet(p).createOrReplaceTempView("overflow_t")
    def q = spark.sql(
      """SELECT CAST(sum(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS sv, count(*) AS cnt
        |FROM overflow_t
        |WHERE (ts >= TIMESTAMP '2024-05-01 00:00:00' AND ts < TIMESTAMP '2024-05-02 00:00:00')
        |   OR (ts >= TIMESTAMP '2024-05-03 00:00:00' AND ts < TIMESTAMP '2024-05-04 00:00:00')""".stripMargin)
    // single range (5.4e18 scaled, fits): still rewrites
    val single = spark.sql(
      """SELECT CAST(sum(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS sv FROM overflow_t
        |WHERE ts >= TIMESTAMP '2024-05-01 00:00:00' AND ts < TIMESTAMP '2024-05-02 00:00:00'""".stripMargin)
    assertRewritten(single)
    assert(single.collect()(0).getDouble(0) === 6 * big)
    // union (1.08e19 scaled, overflows): falls back and matches the scan
    assertNotRewritten(q)
    val got = q.collect()(0)
    val exp = groundTruth(q.collect()(0))
    assert(got === exp)
    assert(got.getLong(1) === 12L)
  }

  test("stale index: file change after build disables rewrites") {
    setup
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stale").toString
    val p = s"$dir/t.parquet"
    def row(s: String, v: Double) = (java.sql.Timestamp.valueOf(s), v)
    Seq(row("2024-01-01 00:00:00", 1.0)).toDF("ts", "value")
      .write.mode("overwrite").parquet(p)
    UWheelBuilder("ts", Seq("value")).build(spark, p)
    def q = spark.read.parquet(p)
      .filter(col("ts") >= lit("2024-01-01 00:00:00").cast("timestamp") &&
              col("ts") < lit("2024-01-02 00:00:00").cast("timestamp"))
      .agg(count(lit(1)).as("c"))
    assertRewritten(q)
    assert(q.collect()(0).getLong(0) === 1L)
    Seq(row("2024-01-01 00:00:00", 1.0), row("2024-01-01 00:00:01", 2.0))
      .toDF("ts", "value").write.mode("overwrite").parquet(p)
    assertNotRewritten(q)
    assert(q.collect()(0).getLong(0) === 2L)
  }

  test("rewriteStats counts served agg and prune arms") {
    // counters are JVM-global and other suites may rewrite concurrently, so
    // assertions are strict-growth on the arm each query exercises — the
    // declines-count-nothing property is structural (increment only on a
    // Some from the arm) and plan-asserted by every assertNotRewritten test
    setup
    val stats = Graft.rewriteStats
    val a0 = stats.snapshot
    ranged.agg(count(lit(1)).as("c")).collect()
    assert(stats.snapshot("agg") > a0("agg"), s"$a0 -> ${stats.snapshot}")
    val p0 = stats.snapshot
    events.filter(col("ts") >= lit("2030-01-01 00:00:00").cast("timestamp_ntz") &&
        col("ts") < lit("2030-02-01 00:00:00").cast("timestamp_ntz"))
      .select(col("event_id")).collect()
    val after = stats.snapshot
    assert(after("prune") > p0("prune"), s"$p0 -> $after")
    assert(after("plans") > a0("plans"))
    stats.reset() // reset surface exercised; a racing increment is harmless
    assert(stats.snapshot.values.forall(_ >= 0L))
  }
}
