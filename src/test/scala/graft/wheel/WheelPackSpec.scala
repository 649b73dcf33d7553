package graft.wheel

import org.scalatest.funsuite.AnyFunSuite

/** The packed min/max hierarchy ([[HawWheel.fromSecondPartials]] with
  * `packLevels`) must be INVISIBLE except in footprint: every read — range,
  * groupBy, landmark, slotPartials, refresh merges — returns answers
  * bit-identical to the raw wheel's, the codecs round-trip every Double
  * bit pattern, and sizeBytes actually drops. */
class WheelPackSpec extends AnyFunSuite {

  private def rawBits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  test("XorDoubleCodec round-trips every bit pattern exactly") {
    val rnd = new scala.util.Random(11)
    val specials = Array(
      0.0, -0.0, Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, Double.MinValue,
      java.lang.Double.longBitsToDouble(0x7ff8000000abcdefL)) // NaN payload
    val smooth = Array.iterate(100.0, 500)(_ + 0.25)
    val noisy = Array.fill(500)(java.lang.Double.longBitsToDouble(rnd.nextLong()))
    for (arr <- Seq(specials, smooth, noisy, Array.empty[Double])) {
      val back = XorDoubleCodec.decode(XorDoubleCodec.encode(arr))
      assert(back.length === arr.length)
      arr.indices.foreach(i => assert(rawBits(back(i)) === rawBits(arr(i))))
    }
    // repeated values cost ~1 byte each
    val flat = Array.fill(128)(42.5)
    assert(XorDoubleCodec.encode(flat).length <= flat.length + 8)
  }

  /** Partials over ~3 days: bursty seconds, values with repetition and
    * drift (the shape packing is for), a NaN and an infinity mixed in. */
  private def mkPartials(seed: Int, n: Int): Seq[(Long, Long, Long, Double, Double)] = {
    val rnd = new scala.util.Random(seed)
    val base = 1709251200L // 2024-03-01 00:00:00 UTC
    (0 until n).map { i =>
      val sec = base + i * (1 + rnd.nextInt(40)).toLong + rnd.nextInt(3)
      val v = if (i % 251 == 250) Double.NaN
        else if (i % 509 == 508) Double.PositiveInfinity
        else (rnd.nextInt(2000) - 1000) / 8.0
      val hi = v + rnd.nextInt(5)
      (sec, 1L + rnd.nextInt(5), rnd.nextLong(20000) - 10000, math.min(v, hi), math.max(v, hi))
    }
  }

  private def assertSameAgg(a: RangeAgg, b: RangeAgg, ctx: String): Unit = {
    assert(a.count === b.count, ctx)
    assert(a.sumScaled === b.sumScaled, ctx)
    assert(rawBits(a.min) === rawBits(b.min), s"$ctx min ${a.min} vs ${b.min}")
    assert(rawBits(a.max) === rawBits(b.max), s"$ctx max ${a.max} vs ${b.max}")
  }

  test("packed wheel answers are bit-identical to raw, at every slot span") {
    val parts = mkPartials(7, 6000)
    for (span <- Seq(1L, 60L, 3600L)) {
      val raw = HawWheel.fromSecondPartials(parts.iterator, 2, hasValues = true, span)
      val packed = HawWheel.fromSecondPartials(parts.iterator, 2, hasValues = true, span,
        packLevels = true)
      assert(packed.isPacked && !raw.isPacked)
      assertSameAgg(packed.landmark, raw.landmark, s"landmark span=$span")
      val rnd = new scala.util.Random(13)
      val lo0 = raw.startSec - 3600
      val hi0 = raw.endSec + 3600
      (0 until 300).foreach { k =>
        val a = lo0 + math.abs(rnd.nextLong()) % (hi0 - lo0)
        val b = lo0 + math.abs(rnd.nextLong()) % (hi0 - lo0)
        val (s, e) = (math.min(a, b), math.max(a, b))
        assert(packed.countRange(s, e) === raw.countRange(s, e))
        assertSameAgg(packed.range(s, e), raw.range(s, e), s"range #$k span=$span [$s,$e)")
      }
      // group-by at each level + calendar months
      for (li <- 0 until HawWheel.Spans.length) {
        val g1 = packed.groupBy(raw.startSec, raw.endSec, li)
        val g2 = raw.groupBy(raw.startSec, raw.endSec, li)
        assert(g1.map(_._1) === g2.map(_._1), s"groupBy level $li keys")
        g1.zip(g2).foreach { case ((_, x), (_, y)) => assertSameAgg(x, y, s"groupBy $li") }
      }
      val c1 = packed.groupByCalendar(raw.startSec, raw.endSec, 1)
      val c2 = raw.groupByCalendar(raw.startSec, raw.endSec, 1)
      assert(c1.map(_._1) === c2.map(_._1))
      c1.zip(c2).foreach { case ((_, x), (_, y)) => assertSameAgg(x, y, "cal") }
    }
  }

  test("packed slotPartials equal raw, and packed merge ≡ packed rebuild") {
    val a = mkPartials(3, 4000)
    val b = mkPartials(4, 1500)
    val rawA = HawWheel.fromSecondPartials(a.iterator, 2, hasValues = true)
    val packA = HawWheel.fromSecondPartials(a.iterator, 2, hasValues = true, packLevels = true)
    assert(packA.slotPartials.toSeq.map { case (s, c, su, mn, mx) =>
        (s, c, su, rawBits(mn), rawBits(mx)) } ===
      rawA.slotPartials.toSeq.map { case (s, c, su, mn, mx) =>
        (s, c, su, rawBits(mn), rawBits(mx)) })
    // incremental merge of packed wheels ≡ one packed build over everything
    val packB = HawWheel.fromSecondPartials(b.iterator, 2, hasValues = true, packLevels = true)
    val merged = HawWheel.fromSecondPartials(
      packA.slotPartials ++ packB.slotPartials, 2, hasValues = true, 1L, packLevels = true)
    val rebuilt = HawWheel.fromSecondPartials(
      (a ++ b).iterator, 2, hasValues = true, 1L, packLevels = true)
    assert(merged.isPacked && rebuilt.isPacked)
    // compare Doubles by raw bits: NaN partials are legitimate and == -false
    def bits(s: Seq[(Long, Long, Long, Double, Double)]) =
      s.map { case (sec, c, su, mn, mx) => (sec, c, su, rawBits(mn), rawBits(mx)) }
    assert(bits(merged.slotPartials.toSeq) === bits(rebuilt.slotPartials.toSeq))
    assertSameAgg(merged.landmark, rebuilt.landmark, "merged landmark")
  }

  test("packing shrinks the wheel and survives serialization") {
    // the series packing is FOR: per-second min/max of a real metric repeats
    // and drifts in quantized steps (the random-values series above is the
    // adversarial case, where the codec stores ~raw size + 1 byte/slot —
    // bounded overhead, never wrong; covered by the bit-identity test)
    val rnd = new scala.util.Random(9)
    val base = 1709251200L
    val parts = {
      var v = 50.0
      (0 until 20000).map { i =>
        if (i % 16 == 0) v = math.rint((v + (rnd.nextInt(9) - 4) * 0.25) * 4) / 4
        (base + i.toLong, 1L + rnd.nextInt(4), rnd.nextLong(2000), v, v + 0.5)
      }
    }
    val raw = HawWheel.fromSecondPartials(parts.iterator, 2, hasValues = true)
    val packed = HawWheel.fromSecondPartials(parts.iterator, 2, hasValues = true,
      packLevels = true)
    info(s"raw ${raw.sizeBytes} B, packed ${packed.sizeBytes} B " +
      f"(${packed.sizeBytes.toDouble / raw.sizeBytes}%.2fx)")
    assert(packed.sizeBytes < raw.sizeBytes)

    // java-serialization round trip (the WheelIndexIO path): transient
    // memos must rebuild, answers must stay identical
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(packed)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)).readObject().asInstanceOf[HawWheel]
    assert(back.isPacked)
    assertSameAgg(back.landmark, raw.landmark, "deserialized landmark")
    assertSameAgg(back.range(raw.startSec + 5000, raw.endSec - 5000),
      raw.range(raw.startSec + 5000, raw.endSec - 5000), "deserialized range")
  }

  test("withPackedLevels end-to-end: same rewrites, smaller index, refresh keeps packing") {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enable(spark)
    import spark.implicits._

    def rows(from: Int, n: Int) = {
      val rnd = new scala.util.Random(21 + from) // deterministic per slice
      var v = 50.0
      (from until from + n).map { i =>
        if (i % 8 == 0) v = math.rint((v + (rnd.nextInt(9) - 4) * 0.25) * 4) / 4
        (new java.sql.Timestamp(1709251200000L + i.toLong * 1000), v)
      }
    }
    val dirRaw = java.nio.file.Files.createTempDirectory("graft-pack-raw").toString + "/t.parquet"
    val dirPack = java.nio.file.Files.createTempDirectory("graft-pack-c").toString + "/t.parquet"
    rows(0, 30000).toDF("ts", "value").write.parquet(dirRaw)
    rows(0, 30000).toDF("ts", "value").write.parquet(dirPack)
    val tRaw = graft.index.UWheelBuilder("ts", Seq("value")).build(spark, dirRaw)
    val tPack = graft.index.UWheelBuilder("ts", Seq("value")).withPackedLevels()
      .build(spark, dirPack)
    assert(tPack.allWheels.forall(_.wheel.isPacked))
    assert(tPack.indexUsageBytes < tRaw.indexUsageBytes,
      s"packed ${tPack.indexUsageBytes} !< raw ${tRaw.indexUsageBytes}")

    def agg(path: String) = {
      spark.read.parquet(path).createOrReplaceTempView("tp")
      spark.sql(
        """SELECT count(*) AS c, min(value) AS mn, max(value) AS mx,
          |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s FROM tp
          |WHERE ts >= TIMESTAMP '2024-03-01 01:00:00'
          |  AND ts < TIMESTAMP '2024-03-01 06:30:00'""".stripMargin)
    }
    val qp = agg(dirPack)
    assert(qp.queryExecution.optimizedPlan.nodeName === "LocalRelation",
      "packed index must still rewrite")
    assert(qp.head() === agg(dirRaw).head())

    // append + refresh: packing survives the slot-wise merge, answers exact
    rows(30000, 5000).toDF("ts", "value").write.mode("append").parquet(dirPack)
    assert(graft.index.UWheelIndex.refresh(spark, dirPack)
      .isInstanceOf[graft.index.UWheelIndex.RefreshOutcome.Appended])
    val after = graft.index.WheelRegistry.lookup(dirPack).get
    assert(after.allWheels.forall(_.wheel.isPacked), "refresh must keep packing")
    val q2 = agg(dirPack)
    assert(q2.queryExecution.optimizedPlan.nodeName === "LocalRelation")
    graft.Graft.rewritesEnabled = false
    val scanRow = try agg(dirPack).head() finally graft.Graft.rewritesEnabled = true
    assert(q2.head() === scanRow)
  }

  test("packedness intent survives an EMPTY initial build (field, not inference)") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enable(spark)
    import spark.implicits._
    // empty seed table: wheels are empty, hence necessarily unpacked — an
    // inference from the wheels would silently drop the user's opt-in here
    val dir = java.nio.file.Files.createTempDirectory("graft-pack-empty").toString + "/t.parquet"
    Seq.empty[(java.sql.Timestamp, Double)].toDF("ts", "value").write.parquet(dir)
    val t = graft.index.UWheelBuilder("ts", Seq("value")).withPackedLevels()
      .build(spark, dir)
    assert(t.packLevels)
    assert(t.allWheels.forall(!_.wheel.isPacked)) // nothing to pack yet
    // first real data arrives: the refresh must honor the recorded intent
    (0 until 3000).map(i => (new java.sql.Timestamp(1709251200000L + i * 1000L), i / 7.0))
      .toDF("ts", "value").write.mode("append").parquet(dir)
    graft.index.UWheelIndex.refresh(spark, dir)
    val after = graft.index.WheelRegistry.lookup(dir).get
    assert(after.packLevels)
    assert(after.allWheels.forall(_.wheel.isPacked),
      "post-refresh wheels must be packed: the opt-in was recorded on the index")
    assert(after.countWheel.get.wheel.landmark.count === 3000)
  }

  test("count-only wheels ignore packLevels (no payload to compress)") {
    val parts = mkPartials(5, 1000).map(p => (p._1, p._2, 0L,
      Double.PositiveInfinity, Double.NegativeInfinity))
    val w = HawWheel.fromSecondPartials(parts.iterator, 2, hasValues = false,
      packLevels = true)
    assert(!w.isPacked)
    assert(w.landmark.count === parts.map(_._2).sum)
  }
}
