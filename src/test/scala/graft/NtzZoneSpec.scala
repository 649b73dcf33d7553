package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{IndexBuilder, UWheelBuilder}

/** NTZ-column group-bys under NON-UTC sessions
  * (`UWheelRule.ntzPiecewiseArm`): `date_trunc(unit, ntzCol)` analyzes to
  * `trunc_Z(CAST(ntz AS TIMESTAMP))` with the session zone Z, a
  * composition the wheel serves from WALL-second slots split at each
  * transition's wall images. Unlike the instant-column DST suite
  * ([[DstZoneSpec]]), the hard cases here live on the WALL axis:
  *
  *  - wall times inside a spring-forward gap EXIST as NTZ data (no instant
  *    carries them) — the cast shifts them forward by the gap, so a gap
  *    hour's rows land in the NEXT hour's bucket, merging with its rows;
  *  - a fall-back's repeated local hour is a SINGLE wall value in NTZ —
  *    the cast resolves it to the earlier offset, so (unlike the instant
  *    column) there is ONE bucket row, not two;
  *  - Australia/Lord_Howe moves by 30 minutes, so hour buckets are cut
  *    mid-block; America/Santiago transitions at local midnight, so the
  *    gap day's `date_trunc('day')` bucket start is itself a nonexistent
  *    wall time.
  *
  * Ground truth is the rule-disabled scan on the same session — Spark's
  * own semantics for every one of those conventions. Data is dense (20 s
  * wall grid) through ±2 h around every transition's wall images, plus a
  * 6-hour backbone across 2024.
  */
class NtzZoneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val dir =
    java.nio.file.Files.createTempDirectory("graft-ntzdst").toString
  private lazy val path = s"$dir/t.parquet"

  private val zones = Seq("America/New_York", "Australia/Lord_Howe", "America/Santiago")

  // 2024 transition WALL images (T + offsetBefore, T + offsetAfter) of the
  // zones under test: the wall-axis neighborhoods where cast_Z is nontrivial.
  private val wallImages: Seq[Long] = zones.flatMap { z =>
    val rules = java.time.ZoneId.of(z).getRules
    Iterator.iterate(rules.nextTransition(
        java.time.Instant.parse("2024-01-01T00:00:00Z")))(t =>
        rules.nextTransition(t.getInstant))
      .takeWhile(t => t != null && t.getInstant.isBefore(
        java.time.Instant.parse("2025-01-01T00:00:00Z")))
      .flatMap(t => Seq(
        t.getInstant.getEpochSecond + t.getOffsetBefore.getTotalSeconds,
        t.getInstant.getEpochSecond + t.getOffsetAfter.getTotalSeconds))
      .toSeq
  }

  lazy val setup: Unit = {
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)
    import spark.implicits._
    val backbone = {
      val start = java.time.Instant.parse("2024-01-01T00:11:07Z").getEpochSecond
      (0 until 1464).map(i => start + i.toLong * 21600)
    }
    // dense 20 s WALL grid ±2 h around every image: populates gap interiors
    // (wall values no instant carries) and both approaches to each cut
    val dense = wallImages.flatMap(w => (-360 to 359).map(i => w + i * 20L))
    val secs = (backbone ++ dense).distinct.sorted
    secs.zipWithIndex.map { case (s, i) =>
      (java.time.LocalDateTime.ofEpochSecond(s, 0, java.time.ZoneOffset.UTC),
        (i % 89) / 4.0, (i % 53).toLong, Seq("a", "b", "c")(i % 3))
    }.toDF("ts", "value", "uid", "etype").write.mode("overwrite").parquet(path)
    assert(spark.read.parquet(path).schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    // per-value keyed wheels (numeric + distinct) for the COMPLETE etype
    // set: the bucket x key arm and its hll routing need them
    Seq("a", "b", "c").foldLeft(
        UWheelBuilder("ts", Seq("value")).withDistinctWheel("uid")) { (b, et) =>
      b.withKeyedWheel(IndexBuilder("value", Some(s"etype = '$et'")))
        .withKeyedDistinctWheel("uid", s"etype = '$et'")
    }.build(spark, path)
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

  test("every unit's group-by matches the scan across all 2024 transitions") {
    setup
    for (tz <- zones ++ Seq("Asia/Kolkata", "Asia/Kathmandu");
         unit <- Seq("minute", "hour", "day", "week", "month", "quarter", "year"))
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

  test("WHERE-bounded group-bys crossing a transition match the scan") {
    setup
    // NTZ range filters are wall-clock and zone-free; each window brackets
    // one transition's wall neighborhood in its zone
    val windows = Seq(
      ("America/New_York", "2024-03-09 12:00:00", "2024-03-11 12:00:00"),
      ("America/New_York", "2024-11-02 12:00:00", "2024-11-04 12:00:00"),
      ("Australia/Lord_Howe", "2024-10-05 12:00:00", "2024-10-07 12:00:00"),
      ("America/Santiago", "2024-09-07 12:00:00", "2024-09-09 12:00:00"))
    for ((tz, s, e) <- windows; unit <- Seq("minute", "hour", "day"))
      inZone(tz) {
        checkParity(
          df.filter(col("ts") >= lit(s).cast("timestamp_ntz") &&
              col("ts") < lit(e).cast("timestamp_ntz"))
            .groupBy(date_trunc(unit, col("ts")).as("b"))
            .agg(count(lit(1)).as("c"), min("value").as("mn"))
            .orderBy("b"),
          s"$tz / $unit / [$s, $e)")
      }
  }

  test("WHERE-side calendar predicates over the NTZ column compose in every zone") {
    setup
    // trunc_Z(CAST(ntz)) OP literal → wall-range preimage via binary search
    // (normalizeNtzZoneCalendar); aggregate-only queries so a rewrite is a
    // LocalRelation. Literals parse in the session zone.
    for (tz <- zones) inZone(tz) {
      for (pred <- Seq(
          "date_trunc('day', ts) = TIMESTAMP '2024-03-10 00:00:00'",
          "date_trunc('hour', ts) = TIMESTAMP '2024-03-10 03:00:00'",
          "date_trunc('day', ts) >= TIMESTAMP '2024-03-01 00:00:00' AND " +
            "date_trunc('day', ts) < TIMESTAMP '2024-04-01 00:00:00'",
          "date_trunc('month', ts) = TIMESTAMP '2024-11-01 00:00:00'",
          "date_trunc('minute', ts) <= TIMESTAMP '2024-06-01 12:34:00'",
          "TIMESTAMP '2024-09-01 00:00:00' > date_trunc('week', ts)")) {
        checkParity(
          df.filter(expr(pred)).agg(count(lit(1)).as("c"), min("value").as("mn")),
          s"$tz / WHERE $pred")
      }
      // a gap-straddling equality: New York's 2024-03-10 has no 02:xx hour,
      // so this literal (parsed locally) can only be a bucket value in
      // zones where it exists — either way the scan is the ground truth
      checkParity(
        df.filter(expr("date_trunc('hour', ts) = TIMESTAMP '2024-03-10 02:00:00'"))
          .agg(count(lit(1)).as("c")),
        s"$tz / WHERE gap-hour equality")
    }
  }

  test("WHERE preimages split by a spring-forward gap: union-of-intervals, not one range") {
    setup
    // Review finding: K(w) = trunc_Z(cast_Z(w)) is NOT globally monotone —
    // New York's skipped wall hour [02:00, 03:00) on 2024-03-10 truncates
    // into the 03:xx buckets, so these predicates' row sets are UNIONS of
    // two disjoint wall intervals (e.g. >= 03:30 local also holds for wall
    // [02:30, 03:00)). A single binary-searched range silently mis-answers;
    // the per-piece preimage must match the scan exactly.
    inZone("America/New_York") {
      val win = df.filter(
        col("ts") >= lit("2024-03-10 00:00:00").cast("timestamp_ntz") &&
          col("ts") < lit("2024-03-10 06:00:00").cast("timestamp_ntz"))
      for (pred <- Seq(
          "date_trunc('minute', ts) >= TIMESTAMP '2024-03-10 03:30:00'",
          "date_trunc('minute', ts) = TIMESTAMP '2024-03-10 03:45:00'",
          "date_trunc('hour', ts) = TIMESTAMP '2024-03-10 03:00:00'",
          "date_trunc('minute', ts) < TIMESTAMP '2024-03-10 03:30:00'")) {
        checkParity(
          win.filter(expr(pred)).agg(count(lit(1)).as("c"), min("value").as("mn")),
          s"NY gap / WHERE $pred")
      }
      // the equality preimage is genuinely two intervals: wall 02:45 (gap,
      // shifted forward) and wall 03:45 both truncate to local 03:45
      val q = win.filter(expr("date_trunc('minute', ts) = TIMESTAMP '2024-03-10 03:45:00'"))
        .agg(count(lit(1)).as("c"))
      val scanC = groundTruth(q.collect()(0).getLong(0))
      assert(q.collect()(0).getLong(0) === scanC)
      assert(scanC >= 6L, s"expected both 02:45 and 03:45 wall minutes populated, got $scanC")
    }
    // Lord Howe's 30-minute gap (2024-10-06, 02:00→02:30): same shape at
    // half-hour granularity
    inZone("Australia/Lord_Howe") {
      val win = df.filter(
        col("ts") >= lit("2024-10-06 00:00:00").cast("timestamp_ntz") &&
          col("ts") < lit("2024-10-06 05:00:00").cast("timestamp_ntz"))
      for (pred <- Seq(
          "date_trunc('minute', ts) >= TIMESTAMP '2024-10-06 02:40:00'",
          "date_trunc('hour', ts) = TIMESTAMP '2024-10-06 02:00:00'")) {
        checkParity(
          win.filter(expr(pred)).agg(count(lit(1)).as("c"), min("value").as("mn")),
          s"LH gap / WHERE $pred")
      }
    }
  }

  test("calendar IN lists compose under non-UTC sessions, gap buckets included") {
    setup
    inZone("America/New_York") {
      // spans the spring-forward day: the 03:00 member's preimage is the
      // two-hour wall union (gap hour + real hour); the 02:00 member is a
      // bucket that does not exist (no rows) — both exact vs the scan
      for (pred <- Seq(
          "date_trunc('hour', ts) IN (TIMESTAMP '2024-03-10 03:00:00', TIMESTAMP '2024-03-10 05:00:00')",
          "date_trunc('hour', ts) IN (TIMESTAMP '2024-03-10 02:00:00', TIMESTAMP '2024-03-10 01:00:00')",
          "date_trunc('day', ts) IN (TIMESTAMP '2024-03-10 00:00:00', TIMESTAMP '2024-11-03 00:00:00')")) {
        checkParity(
          df.filter(expr(pred)).agg(count(lit(1)).as("c"), min("value").as("mn")),
          s"NY / WHERE $pred")
      }
      // > 10 members: the optimizer converts In to InSet — must still compose
      val manyDays = (1 to 12).map(d => f"TIMESTAMP '2024-03-$d%02d 00:00:00'").mkString(", ")
      checkParity(
        df.filter(expr(s"date_trunc('day', ts) IN ($manyDays)"))
          .agg(count(lit(1)).as("c"), min("value").as("mn")),
        "NY / WHERE 12-member day IN (InSet)")
    }
  }

  test("sub-second truncation units decline the WHERE normalization") {
    setup
    // millisecond/microsecond views are finer than the wheel's wall-second
    // probes; the conjunct must stay residual and the query stay a scan
    inZone("America/New_York") {
      def q = df.filter(expr(
          "date_trunc('millisecond', ts) >= TIMESTAMP '2024-01-10 00:00:00'"))
        .agg(count(lit(1)).as("c"))
      val opt = q.queryExecution.optimizedPlan
      assert(opt.collect { case r: LogicalRelation => r }.nonEmpty, s"expected scan in:\n$opt")
      assert(q.collect()(0).getLong(0) === groundTruth(q.collect()(0).getLong(0)))
    }
  }

  test("randomized WHERE inequalities match the scan across zones and units") {
    setup
    val rnd = new scala.util.Random(90082026L)
    val units = Seq("minute", "hour", "day", "week", "month", "quarter", "year")
    val ops = Seq(">=", ">", "<", "<=")
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    for (i <- 0 until 30) {
      val tz = (zones ++ Seq("Asia/Kolkata"))(i % 4)
      inZone(tz) {
        val unit = units(rnd.nextInt(units.length))
        val op = ops(rnd.nextInt(ops.length))
        // arbitrary (mostly unaligned) local literal anywhere in 2024
        val sec = base + rnd.nextLong(365L * 86400)
        val s = java.time.LocalDateTime
          .ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC).toString.replace('T', ' ')
        val pred = s"date_trunc('$unit', ts) $op TIMESTAMP '$s'"
        checkParity(
          df.filter(expr(pred)).agg(count(lit(1)).as("c"), min("value").as("mn")),
          s"$tz / WHERE $pred")
      }
    }
  }

  test("randomized WHERE equalities on real bucket values match the scan") {
    setup
    // literals are the SCAN's own date_trunc values at data seconds biased
    // toward transition wall neighborhoods — every equality is non-vacuous
    // and lands on genuine (possibly gap-merged) buckets
    val rnd = new scala.util.Random(91082026L)
    val units = Seq("minute", "hour", "day")
    for (i <- 0 until 18) {
      val tz = zones(i % zones.length)
      inZone(tz) {
        val unit = units(rnd.nextInt(units.length))
        // a wall second near a random transition image (±90 min)
        val w = wallImages(rnd.nextInt(wallImages.length)) + rnd.nextInt(10800) - 5400
        val litRow = spark.sql(
          s"""SELECT CAST(date_trunc('$unit',
             |  CAST(TIMESTAMP_NTZ '${java.time.LocalDateTime
                  .ofEpochSecond(w, 0, java.time.ZoneOffset.UTC).toString.replace('T', ' ')}'
             |    AS TIMESTAMP)) AS STRING)""".stripMargin).first.getString(0)
        def q = df.filter(expr(s"date_trunc('$unit', ts) = TIMESTAMP '$litRow'"))
          .agg(count(lit(1)).as("c"), min("value").as("mn"))
        checkParity(q, s"$tz / $unit = $litRow (wall $w)")
        assert(q.collect()(0).getLong(0) > 0, s"$tz / $unit = $litRow vacuous")
      }
    }
  }

  test("constant-offset spans: hll_distinct and every unit compose under a DST zone") {
    setup
    // January-only NTZ data under America/New_York: months from either
    // 2024 transition, so the unit-scaled constant-offset gate
    // (ntzWallConstantOffset) qualifies and buckets are plain wall blocks
    // with instant keys — which restores hll_distinct (register reads need
    // an instant bucket end the piecewise path cannot supply)
    import spark.implicits._
    val d2 = java.nio.file.Files.createTempDirectory("graft-ntzjan").toString
    val p = s"$d2/jan.parquet"
    val start = java.time.Instant.parse("2024-01-03T00:00:00Z").getEpochSecond
    (0 until 20000).map { i =>
      (java.time.LocalDateTime.ofEpochSecond(start + i * 97L, 0, java.time.ZoneOffset.UTC),
        (i % 89) / 4.0, (i % 53).toLong)
    }.toDF("ts", "value", "uid").write.mode("overwrite").parquet(p)
    assert(spark.read.parquet(p).schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    graft.index.UWheelBuilder("ts", Seq("value")).withDistinctWheel("uid")
      .build(spark, p)
    def t = spark.read.parquet(p)
    inZone("America/New_York") {
      // hll bucket group-by: bit-equal to running the aggregate (groundTruth)
      checkParity(
        t.groupBy(date_trunc("day", col("ts")).as("d"))
          .agg(expr("hll_distinct(uid)").as("du"), count(lit(1)).as("c"))
          .orderBy("d"),
        "NY Jan hll day group-by")
      for (unit <- Seq("minute", "hour", "day", "week", "month", "quarter", "year"))
        checkParity(
          t.groupBy(date_trunc(unit, col("ts")).as("b"))
            .agg(count(lit(1)).as("c"), min("value").as("mn")).orderBy("b"),
          s"NY Jan $unit")
    }
  }

  test("randomized NTZ group-by parity: zone x window x unit across transitions") {
    setup
    // seeded sweep mirroring DstZoneSpec's: windows anchored half on
    // transition wall images, half uniform over 2024; group-bys must
    // rewrite in every case (the NTZ arm covers every unit in every zone)
    // and equal the rule-disabled scan bit-for-bit
    val rnd = new scala.util.Random(0x9e7a2026L)
    val units = Seq("minute", "hour", "day", "week", "month", "quarter", "year")
    val t0 = java.time.Instant.parse("2024-01-10T00:00:00Z").getEpochSecond
    val t1 = java.time.Instant.parse("2024-12-20T00:00:00Z").getEpochSecond
    var populated = 0
    for (i <- 0 until 24) {
      val tz = (zones ++ Seq("Asia/Kathmandu"))(i % 4)
      inZone(tz) {
        val anchor =
          if (rnd.nextBoolean()) wallImages(rnd.nextInt(wallImages.length))
          else t0 + (rnd.nextDouble() * (t1 - t0)).toLong
        val s = anchor - 43200 - rnd.nextInt(8 * 86400)
        val e = anchor + 43200 + rnd.nextInt(8 * 86400)
        val unit = units(rnd.nextInt(units.length))
        def fmt(sec: Long) = java.time.LocalDateTime
          .ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC).toString.replace('T', ' ')
        def q = df.filter(
            col("ts") >= lit(fmt(s)).cast("timestamp_ntz") &&
              col("ts") < lit(fmt(e)).cast("timestamp_ntz"))
          .groupBy(date_trunc(unit, col("ts")).as("b"))
          .agg(count(lit(1)).as("c"), min("value").as("mn"), max("value").as("mx"))
          .orderBy("b")
        assertRewritten(q)
        val got = q.collect().map(_.toString).toSeq
        assert(got === groundTruth(q.collect().map(_.toString).toSeq),
          s"$tz / $unit / [${fmt(s)}, ${fmt(e)})")
        if (got.nonEmpty) populated += 1
      }
    }
    assert(populated >= 20, s"only $populated/24 sweep cases had rows — data too sparse")
  }

  test("hll_distinct composes across transitions via per-key wall intervals") {
    setup
    // windows straddling a spring-forward: the gap hour's wall rows merge
    // into the post-gap bucket, so that bucket's register read is a UNION
    // of two wall intervals — must bit-equal running the aggregate
    val wins = Seq(
      ("America/New_York", "2024-03-09 12:00:00", "2024-03-10 12:00:00"),
      ("Australia/Lord_Howe", "2024-10-05 12:00:00", "2024-10-06 12:00:00"),
      ("America/Santiago", "2024-09-07 12:00:00", "2024-09-08 12:00:00"))
    for ((tz, s, e) <- wins) inZone(tz) {
      checkParity(
        df.filter(col("ts") >= lit(s).cast("timestamp_ntz") &&
            col("ts") < lit(e).cast("timestamp_ntz"))
          .groupBy(date_trunc("hour", col("ts")).as("b"))
          .agg(expr("hll_distinct(uid)").as("d"), count(lit(1)).as("c"))
          .orderBy("b"),
        s"$tz / hll hour across transition")
    }
  }

  test("bucket x key hll_distinct composes across transitions") {
    setup
    // the 2-column arm routes hll to per-value KEYED distinct wheels; its
    // piecewise register intervals come from the base wheel's walk, so a
    // gap-merged bucket's per-value distincts must also bit-equal the scan
    val wins = Seq(
      ("America/New_York", "2024-03-09 12:00:00", "2024-03-10 12:00:00", "hour"),
      ("Australia/Lord_Howe", "2024-10-05 12:00:00", "2024-10-06 12:00:00", "hour"),
      ("America/Santiago", "2024-09-07 00:00:00", "2024-09-09 00:00:00", "day"))
    for ((tz, s, e, unit) <- wins) inZone(tz) {
      checkParity(
        df.filter(col("ts") >= lit(s).cast("timestamp_ntz") &&
            col("ts") < lit(e).cast("timestamp_ntz"))
          .groupBy(date_trunc(unit, col("ts")).as("b"), col("etype"))
          .agg(expr("hll_distinct(uid)").as("d"), count(lit(1)).as("c"))
          .orderBy("b", "etype"),
        s"$tz / hll $unit x etype across transition")
    }
  }

  test("gap wall-times merge into the post-gap bucket, as the cast dictates") {
    setup
    // New York 2024-03-10: wall 02:00–03:00 does not exist locally; NTZ rows
    // carrying those wall values cast to 03:00-offset instants, so the hour
    // group-by has NO 02:00 bucket and the 03:00 bucket absorbs both hours'
    // rows. Assert against the scan AND structurally.
    inZone("America/New_York") {
      def q = df.filter(col("ts") >= lit("2024-03-10 00:00:00").cast("timestamp_ntz") &&
          col("ts") < lit("2024-03-10 05:00:00").cast("timestamp_ntz"))
        .groupBy(date_trunc("hour", col("ts")).as("b"))
        .agg(count(lit(1)).as("c")).orderBy("b")
      checkParity(q, "NY spring-forward hours")
      // date_format renders in the SESSION zone (getTimestamp.toString would
      // use the JVM default zone and misread the local bucket labels)
      val rows = q.select(date_format(col("b"), "yyyy-MM-dd HH:mm:ss").as("b"), col("c"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(!rows.keySet.exists(_.startsWith("2024-03-10 02:")), rows.toString)
      // dense grid puts 180 rows in each of the 02:xx and 03:xx wall hours
      assert(rows("2024-03-10 03:00:00") >= 360L, rows.toString)
    }
  }

  test("fall-back repeated hour is a single wall value: one bucket, earlier offset") {
    setup
    // Instant columns yield TWO 01:xx rows here (DstZoneSpec); the NTZ cast
    // collapses the ambiguity to the earlier offset, so exactly ONE row
    inZone("America/New_York") {
      def q = df.filter(col("ts") >= lit("2024-11-03 00:00:00").cast("timestamp_ntz") &&
          col("ts") < lit("2024-11-03 04:00:00").cast("timestamp_ntz"))
        .groupBy(date_trunc("hour", col("ts")).as("b"))
        .agg(count(lit(1)).as("c")).orderBy("b")
      checkParity(q, "NY fall-back hours")
      val hours = q.select(date_format(col("b"), "yyyy-MM-dd HH:mm:ss").as("b"))
        .collect().map(_.getString(0)).filter(_.startsWith("2024-11-03 01:"))
      assert(hours.length === 1, hours.toSeq.toString)
    }
  }
}
