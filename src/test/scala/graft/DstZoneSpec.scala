package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.UWheelBuilder

/** DST-zone group-by rewrites: the piecewise transition-split composition
  * (`UWheelRule.piecewiseArm`) must reproduce Spark's own calendar
  * semantics bit-for-bit ON the hard instants —
  *
  *  - America/New_York: whole-hour DST, spring-forward gap 2024-03-10
  *    02:00→03:00, fall-back overlap 2024-11-03 (the 01:xx hour occurs
  *    twice; `date_trunc('hour')` keeps each pass's own offset, so the
  *    repeated local hour yields TWO output rows);
  *  - Australia/Lord_Howe: THIRTY-MINUTE DST shift (+10:30↔+11:00,
  *    transitions 2024-04-07 and 2024-10-06) — bucket shifts change at
  *    minute granularity;
  *  - America/Santiago: transitions at local MIDNIGHT (2024-04-07
  *    fall-back, 2024-09-08 spring-forward) — the spring-forward day has
  *    no local 00:00, so its `date_trunc('day')` value is the gap-shifted
  *    01:00.
  *
  * Ground truth is the rule-disabled scan on the same session — the exact
  * semantics the rewrite must match. Data is engineered dense (20 s grid)
  * through every transition's surrounding hours, so gap and overlap
  * buckets are populated on both sides.
  */
class DstZoneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val dir =
    java.nio.file.Files.createTempDirectory("graft-dst").toString
  private lazy val path = s"$dir/t.parquet"

  // 2024 transition instants (UTC seconds) of the three zones under test.
  private val transitions: Seq[Long] = Seq(
    "America/New_York", "Australia/Lord_Howe", "America/Santiago").flatMap { z =>
    val rules = java.time.ZoneId.of(z).getRules
    Iterator.iterate(rules.nextTransition(
        java.time.Instant.parse("2024-01-01T00:00:00Z")))(t =>
        rules.nextTransition(t.getInstant))
      .takeWhile(t => t != null && t.getInstant.isBefore(
        java.time.Instant.parse("2025-01-01T00:00:00Z")))
      .map(_.getInstant.getEpochSecond).toSeq
  }

  lazy val setup: Unit = {
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)
    import spark.implicits._
    // sparse 6-hour backbone across 2024 + dense 20 s grid for ±2 h around
    // every transition (covers both passes of fall-back overlaps and the
    // approaches to every gap)
    val backbone = {
      val start = java.time.Instant.parse("2024-01-01T00:11:07Z").getEpochSecond
      (0 until 1464).map(i => start + i.toLong * 21600)
    }
    val dense = transitions.flatMap(t => (-360 to 359).map(i => t + i * 20L))
    val secs = (backbone ++ dense).distinct.sorted
    secs.zipWithIndex.map { case (s, i) =>
      (new java.sql.Timestamp(s * 1000), (i % 89) / 4.0, (i % 53).toLong)
    }.toDF("ts", "value", "uid").write.mode("overwrite").parquet(path)
    UWheelBuilder("ts", Seq("value")).withDistinctWheel("uid").build(spark, path)
  }

  def df: DataFrame = spark.read.parquet(path)

  def assertRewritten(q: DataFrame): Unit = {
    val opt = q.queryExecution.optimizedPlan
    assert(opt.collect { case l: LocalRelation => l }.nonEmpty, s"no LocalRelation in:\n$opt")
    assert(opt.collect { case r: LogicalRelation => r }.isEmpty, s"scan survived in:\n$opt")
  }

  /** Runs `q` with the rule disabled to get the ground-truth answer. */
  def groundTruth[T](q: => T): T = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cs.experimental.extraOptimizations
    cs.experimental.extraOptimizations = Nil
    try q finally cs.experimental.extraOptimizations = saved
  }

  private def inZone[T](tz: String)(body: => T): T = {
    spark.conf.set("spark.sql.session.timeZone", tz)
    try body finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  private def checkParity(q: => DataFrame, label: String): Unit = {
    assertRewritten(q)
    val got = q.collect().map(_.toString).toSeq
    val exp = groundTruth(q.collect().map(_.toString).toSeq)
    assert(got === exp, label)
    assert(got.nonEmpty, s"$label produced no rows — vacuous parity")
  }

  private val zones = Seq("America/New_York", "Australia/Lord_Howe", "America/Santiago")

  test("every unit's group-by matches the scan across all 2024 transitions") {
    setup
    for (tz <- zones; unit <- Seq("minute", "hour", "day", "week", "month", "quarter", "year"))
      inZone(tz) {
        checkParity(
          df.groupBy(date_trunc(unit, col("ts")).as("b"))
            .agg(count(lit(1)).as("c"),
              sum(col("value").cast("decimal(18,2)")).as("s"),
              min("value").as("mn"), max("value").as("mx"))
            .orderBy("b"),
          s"$tz / $unit")
      }
  }

  test("to_date and year() group-bys match the scan") {
    setup
    for (tz <- zones) inZone(tz) {
      checkParity(
        df.groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("c")).orderBy("d"),
        s"$tz / to_date")
      checkParity(
        df.groupBy(year(col("ts")).as("y")).agg(count(lit(1)).as("c")).orderBy("y"),
        s"$tz / year")
    }
  }

  test("fall-back overlap: the repeated local hour yields two rows, matching the scan") {
    setup
    // New York 2024-11-03: instants 05:00Z..07:00Z both render local 01:xx;
    // date_trunc('hour') retains each pass's own offset (EDT then EST)
    inZone("America/New_York") {
      def q = df.filter(
          col("ts") >= lit("2024-11-03 00:00:00").cast("timestamp") &&
            col("ts") < lit("2024-11-03 04:00:00").cast("timestamp"))
        .groupBy(date_trunc("hour", col("ts")).as("b"))
        .agg(count(lit(1)).as("c")).orderBy("b")
      checkParity(q, "NY fall-back hours")
      // the local-01:00 hour must appear twice — as the two pass instants
      // 05:00Z (01:00 EDT) and 06:00Z (01:00 EST)
      val keys = q.collect().map(_.getTimestamp(0).toInstant.toString).toSeq
      assert(keys.contains("2024-11-03T05:00:00Z") &&
        keys.contains("2024-11-03T06:00:00Z"),
        s"expected both 01:00 passes, got $keys")
    }
  }

  test("spring-forward gap: the gap day truncates to the shifted first instant") {
    setup
    // Santiago 2024-09-08: local midnight does not exist; the day's
    // date_trunc value is 01:00 local — delegated to Catalyst eval, so
    // parity with the scan proves the shifted key
    inZone("America/Santiago") {
      def q = df.filter(
          col("ts") >= lit("2024-09-06 00:00:00").cast("timestamp") &&
            col("ts") < lit("2024-09-10 00:00:00").cast("timestamp"))
        .groupBy(date_trunc("day", col("ts")).as("b"))
        .agg(count(lit(1)).as("c"), min("value").as("mn")).orderBy("b")
      checkParity(q, "Santiago gap days")
      // 2024-09-08's local midnight is in the gap: its day key is the
      // shifted first instant 01:00(-3) = 04:00Z, while the -4 days before
      // start at 04:00Z and the -3 day after starts at 03:00Z
      val keys = q.collect().map(_.getTimestamp(0).toInstant.toString).toSeq
      assert(keys.contains("2024-09-08T04:00:00Z"),
        s"gap day should truncate to 01:00 local (04:00Z), got $keys")
      assert(keys.contains("2024-09-09T03:00:00Z"), s"post-DST day start, got $keys")
    }
  }

  test("range-restricted group-bys crossing a transition match the scan") {
    setup
    val fmt = java.time.format.DateTimeFormatter.ISO_INSTANT
    for (tz <- zones; t <- transitions.take(6)) inZone(tz) {
      val lo = java.time.Instant.ofEpochSecond(t - 7200)
      val hi = java.time.Instant.ofEpochSecond(t + 7200)
      checkParity(
        df.filter(col("ts") >= lit(fmt.format(lo)).cast("timestamp") &&
            col("ts") < lit(fmt.format(hi)).cast("timestamp"))
          .groupBy(date_trunc("hour", col("ts")).as("b"))
          .agg(count(lit(1)).as("c"), max("value").as("mx")).orderBy("b"),
        s"$tz / window@$t")
    }
  }

  test("WHERE-side date-path calendar predicates compose under DST") {
    setup
    // the 25-hour fall-back day, the 23-hour gap day, plain days, a
    // BETWEEN spanning a transition, and year equality — each must
    // rewrite AND match the rule-disabled scan
    val cases = Seq(
      "America/New_York"  -> "to_date(ts) = DATE '2024-11-03'",
      "America/New_York"  -> "to_date(ts) BETWEEN DATE '2024-11-01' AND DATE '2024-11-05'",
      "America/New_York"  -> "date_trunc('day', ts) = TIMESTAMP '2024-03-10 00:00:00'",
      "America/New_York"  -> "year(ts) = 2024",
      "America/Santiago"  -> "to_date(ts) = DATE '2024-09-08'",
      "America/Santiago"  -> "date_trunc('day', ts) = TIMESTAMP '2024-09-08 00:00:00'",
      "America/Santiago"  -> "to_date(ts) >= DATE '2024-09-08' AND to_date(ts) < DATE '2024-09-10'",
      "Australia/Lord_Howe" -> "to_date(ts) = DATE '2024-10-06'",
      "Australia/Lord_Howe" -> "date_trunc('month', ts) = TIMESTAMP '2024-10-01 00:00:00'")
    for ((tz, pred) <- cases) inZone(tz) {
      def q = df.filter(expr(pred))
        .agg(count(lit(1)).as("c"), min("value").as("mn"), max("value").as("mx"))
      assertRewritten(q)
      val got = q.collect().map(_.toString).toSeq
      val exp = groundTruth(q.collect().map(_.toString).toSeq)
      assert(got === exp, s"$tz / WHERE $pred")
      assert(q.collect()(0).getLong(0) > 0, s"$tz / WHERE $pred matched no rows — vacuous")
    }
    // the gap-day literal parsed in-session resolves to the SHIFTED first
    // instant, which IS the day's date_trunc value — so the equality above
    // matched the whole 23-hour day; sanity-check the count equals to_date's
    inZone("America/Santiago") {
      val a = df.filter(expr("date_trunc('day', ts) = TIMESTAMP '2024-09-08 00:00:00'")).count()
      val b = df.filter(expr("to_date(ts) = DATE '2024-09-08'")).count()
      assert(a === b && a > 0)
    }
    // sub-day truncation EQUALITY now resolves under DST (round-7 verdict,
    // previously a decline): the literal parses to the EARLIER-offset
    // instant of the repeated 01:xx hour (ofLocal), and the matching rows
    // are exactly the FIRST pass (rows of the second pass retain their EST
    // offset at the still-valid 01:00 local and truncate to a different
    // instant). Must rewrite AND equal the scan, and must be non-vacuous —
    // the dense ±2 h grid around the transition populates both passes.
    inZone("America/New_York") {
      def q = df.filter(expr("date_trunc('hour', ts) = TIMESTAMP '2024-11-03 01:00:00'"))
        .agg(count(lit(1)).as("c"), min("value").as("mn"), max("value").as("mx"))
      assertRewritten(q)
      val got = q.collect().map(_.toString).toSeq
      val exp = groundTruth(q.collect().map(_.toString).toSeq)
      assert(got === exp, "NY fall-back hour-trunc equality")
      val firstPass = q.collect()(0).getLong(0)
      assert(firstPass > 0, "fall-back hour equality matched no rows — vacuous")
      // the repeated hour's SECOND pass is a different bucket: its rows are
      // the 01:xx EST instants (06:00Z–07:00Z), disjoint from the first
      // pass (05:00Z–06:00Z); instants written as epoch seconds so the
      // session zone cannot reinterpret them
      def q2 = df.filter(
        expr("date_trunc('hour', ts) = timestamp_seconds(1730613600)")) // 06:00Z
        .agg(count(lit(1)).as("c"))
      val both = df.filter(
        expr("ts >= timestamp_seconds(1730610000) AND ts < timestamp_seconds(1730617200)"))
        .count()
      assert(q2.collect()(0).getLong(0) === groundTruth(q2.collect()(0).getLong(0)))
      assert(firstPass + q2.collect()(0).getLong(0) === both,
        "first + second pass must tile the two repeated wall-clock hours")
    }
    // minute-trunc equality inside the Lord Howe 30-minute fall-back
    // overlap (offsets +11 / +10:30): both passes of the repeated half
    // hour truncate to DIFFERENT instants; each equality must resolve to
    // its own pass and match the scan
    inZone("Australia/Lord_Howe") {
      // 2024-04-07 02:00 +11 → 01:30 +10:30; repeated local [01:30, 02:00)
      def q = df.filter(expr(
        "date_trunc('minute', ts) = TIMESTAMP '2024-04-07 01:45:00'"))
        .agg(count(lit(1)).as("c"))
      assertRewritten(q)
      assert(q.collect()(0).getLong(0) === groundTruth(q.collect()(0).getLong(0)))
      assert(q.collect()(0).getLong(0) > 0, "LH overlap minute equality vacuous")
    }
  }

  test("sub-day WHERE inequalities under DST compose per piece (previously declined)") {
    setup
    // normalizeZoneCalendar: K(t) = trunc_Z(t) is monotone within each
    // constant-offset stretch, so inequality preimages are per-piece
    // bisected instant intervals (an OR union across a transition). Every
    // case must rewrite AND equal the rule-disabled scan, through the
    // offset-retention subtleties: across a fall-back the same local
    // threshold is reached twice (both passes' buckets order by instant),
    // across a gap the 02:xx buckets never exist.
    val cases = Seq(
      ("America/New_York", "date_trunc('minute', ts) >= TIMESTAMP '2024-11-03 01:30:00'",
        "2024-11-03 00:00:00", "2024-11-03 04:00:00"),
      ("America/New_York", "date_trunc('hour', ts) < TIMESTAMP '2024-03-10 03:00:00'",
        "2024-03-09 22:00:00", "2024-03-10 06:00:00"),
      ("America/New_York", "date_trunc('minute', ts) > TIMESTAMP '2024-03-10 01:59:00'",
        "2024-03-09 22:00:00", "2024-03-10 06:00:00"),
      ("Australia/Lord_Howe", "date_trunc('minute', ts) >= TIMESTAMP '2024-04-07 01:40:00'",
        "2024-04-07 00:00:00", "2024-04-07 04:00:00"),
      ("America/Santiago", "date_trunc('hour', ts) <= TIMESTAMP '2024-09-08 01:00:00'",
        "2024-09-07 20:00:00", "2024-09-08 04:00:00"))
    for ((tz, pred, s, e) <- cases) inZone(tz) {
      def q = df.filter(
          col("ts") >= lit(s).cast("timestamp") && col("ts") < lit(e).cast("timestamp"))
        .filter(expr(pred))
        .agg(count(lit(1)).as("c"), min("value").as("mn"), max("value").as("mx"))
      assertRewritten(q)
      val got = q.collect().map(_.toString).toSeq
      val exp = groundTruth(q.collect().map(_.toString).toSeq)
      assert(got === exp, s"$tz / WHERE $pred")
      assert(q.collect()(0).getLong(0) > 0, s"$tz / WHERE $pred vacuous")
    }
  }

  test("randomized DST parity: group-bys and date-path filters match the scan") {
    setup
    // seeded sweep over (zone × window × shape): windows anchored half on
    // transition instants, half uniform over 2024; every case must equal
    // the rule-disabled scan bit-for-bit. Group-bys must rewrite (the
    // piecewise arm covers every unit); WHERE-side date-path predicates may
    // legitimately decline (ambiguous boundary), so they are parity-checked
    // unconditionally and the rewrite RATE is asserted instead.
    val rnd = new scala.util.Random(0x6f7a2024L)
    val t0 = java.time.Instant.parse("2024-01-10T00:00:00Z").getEpochSecond
    val t1 = java.time.Instant.parse("2024-12-20T00:00:00Z").getEpochSecond
    var whereCases = 0
    var whereRewrites = 0
    var populated = 0
    for (i <- 0 until 36) {
      val tz = zones(rnd.nextInt(zones.length))
      inZone(tz) {
        val anchor =
          if (rnd.nextBoolean()) transitions(rnd.nextInt(transitions.length))
          else t0 + (rnd.nextDouble() * (t1 - t0)).toLong
        val s = anchor - 43200 - rnd.nextInt(8 * 86400)
        val e = anchor + 43200 + rnd.nextInt(8 * 86400)
        def win = df.filter(
          col("ts") >= lit(new java.sql.Timestamp(s * 1000L)) &&
            col("ts") < lit(new java.sql.Timestamp(e * 1000L)))
        val localDate = java.time.Instant.ofEpochSecond(anchor)
          .atZone(java.time.ZoneId.of(tz)).toLocalDate
        rnd.nextInt(6) match {
          case 0 =>
            val unit = Seq("minute", "hour", "day", "week", "month")(rnd.nextInt(5))
            def q = win.groupBy(date_trunc(unit, col("ts")).as("b"))
              .agg(count(lit(1)).as("c"), min("value").as("mn"), max("value").as("mx"))
              .orderBy("b")
            assertRewritten(q)
            val got = q.collect().map(_.toString).toSeq
            assert(got === groundTruth(q.collect().map(_.toString).toSeq),
              s"#$i $tz group-by $unit [$s,$e)")
            if (got.nonEmpty) populated += 1
          case 1 =>
            def q = win.groupBy(to_date(col("ts")).as("d"))
              .agg(count(lit(1)).as("c")).orderBy("d")
            assertRewritten(q)
            val got = q.collect().map(_.toString).toSeq
            assert(got === groundTruth(q.collect().map(_.toString).toSeq),
              s"#$i $tz group-by to_date [$s,$e)")
            if (got.nonEmpty) populated += 1
          case n =>
            val pred = n match {
              case 2 => s"to_date(ts) = DATE '$localDate'"
              case 3 =>
                val d2 = localDate.plusDays(1L + rnd.nextInt(4))
                s"to_date(ts) >= DATE '$localDate' AND to_date(ts) < DATE '$d2'"
              case 4 => s"date_trunc('day', ts) = TIMESTAMP '$localDate 00:00:00'"
              case _ =>
                // sub-day trunc equality at an hour near the anchor — when
                // anchored on a transition this lands in/next to the
                // repeated or skipped hour (round-7 verdict: resolved
                // per-pass now, no longer a blanket decline)
                val lh = java.time.Instant.ofEpochSecond(anchor)
                  .atZone(java.time.ZoneId.of(tz)).toLocalDateTime
                  .truncatedTo(java.time.temporal.ChronoUnit.HOURS)
                s"date_trunc('hour', ts) = TIMESTAMP '${lh.toLocalDate} ${lh.toLocalTime}:00'"
            }
            whereCases += 1
            def q = win.filter(expr(pred))
              .agg(count(lit(1)).as("c"), max("value").as("mx"))
            if (q.queryExecution.optimizedPlan
                .collect { case r: LogicalRelation => r }.isEmpty) whereRewrites += 1
            val got = q.collect().map(_.toString).toSeq
            assert(got === groundTruth(q.collect().map(_.toString).toSeq),
              s"#$i $tz WHERE $pred [$s,$e)")
        }
      }
    }
    assert(populated > 5, s"group-by cases mostly empty ($populated) — vacuous sweep")
    assert(whereCases == 0 || whereRewrites * 3 >= whereCases * 2,
      s"date-path WHERE rewrites fired only $whereRewrites/$whereCases")
  }

  test("gap straddling the unit start: bucket VALUE differs from its row-range start (Toronto 1919)") {
    setup
    // America/Toronto 1919-03-31: the DST gap runs 23:30→00:30 LOCAL,
    // strictly straddling midnight. Spark resolves the day's date_trunc
    // VALUE via ofLocal (gap-shifted to 05:00Z) while the day's ROWS begin
    // at the 04:30Z transition — the two must be computed separately
    // (review finding: conflating them returned empty for the true value
    // and mis-bounded every comparison).
    import spark.implicits._
    val dir2 = java.nio.file.Files.createTempDirectory("graft-1919").toString
    val p = s"$dir2/t.parquet"
    val s0 = java.time.Instant.parse("1919-03-29T00:00:00Z").getEpochSecond
    val e0 = java.time.Instant.parse("1919-04-02T00:00:00Z").getEpochSecond
    (s0 until e0 by 600L).map(s =>
      (new java.sql.Timestamp(s * 1000), (s % 97).toDouble))
      .toDF("ts", "value").write.mode("overwrite").parquet(p)
    UWheelBuilder("ts", Seq("value")).build(spark, p)
    val t = spark.read.parquet(p)
    inZone("America/Toronto") {
      for (pred <- Seq(
          "date_trunc('day', ts) = TIMESTAMP '1919-03-31 00:00:00'",
          "date_trunc('day', ts) >= TIMESTAMP '1919-03-31 00:00:00'",
          "date_trunc('day', ts) <= TIMESTAMP '1919-03-31 00:00:00'",
          "date_trunc('day', ts) > TIMESTAMP '1919-03-30 12:00:00'",
          "to_date(ts) = DATE '1919-03-31'",
          "date_trunc('week', ts) = TIMESTAMP '1919-03-31 00:00:00'")) {
        def q = t.filter(expr(pred))
          .agg(count(lit(1)).as("c"), min("value").as("mn"))
        assert(q.collect()(0).toString === groundTruth(q.collect()(0).toString),
          s"Toronto 1919 / $pred")
      }
      // the in-session literal parses to the gap-shifted TRUE value, so the
      // equality is non-vacuous and agrees with the local-date row set
      val dayEq = t.filter(
        expr("date_trunc('day', ts) = TIMESTAMP '1919-03-31 00:00:00'")).count()
      val dateEq = t.filter(expr("to_date(ts) = DATE '1919-03-31'")).count()
      assert(dayEq > 0 && dayEq === dateEq, s"dayEq=$dayEq dateEq=$dateEq")
    }
  }

  test("hll_distinct composes under DST zones via per-key register intervals") {
    setup
    // sanity: the distinct wheel serves this shape under UTC…
    val utcq = df.groupBy(date_trunc("day", col("ts")).as("b"))
      .agg(expr("hll_distinct(uid)").as("d"))
    assertRewritten(utcq)
    // …and now under DST zones too (previously a decline): the piecewise
    // arm's hllReads enumeration supplies each evaluated bucket key's
    // instant intervals, so register merges clip exactly — bit-equal to
    // running the aggregate over the scan, transition days included
    for (tz <- zones) inZone(tz) {
      checkParity(
        df.groupBy(date_trunc("day", col("ts")).as("b"))
          .agg(expr("hll_distinct(uid)").as("d"), count(lit(1)).as("c"))
          .orderBy("b"),
        s"$tz / hll day group-by")
      checkParity(
        df.groupBy(date_trunc("hour", col("ts")).as("b"))
          .agg(expr("hll_distinct(uid)").as("d"))
          .orderBy("b"),
        s"$tz / hll hour group-by")
    }
  }
}
