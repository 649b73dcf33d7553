package graft.wheel

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: the wheel must agree with a brute-force reference model on
  * arbitrary data and arbitrary (aligned, unaligned, empty, out-of-domain)
  * query ranges, and a partitioned build must equal a single build —
  * the invariant that makes the distributed/streaming ingest correct.
  */
class HawWheelPropSpec extends AnyFunSuite {

  /** Runs a ScalaCheck property (200 cases) and fails the suite on the
    * first counterexample. */
  private def check(prop: Prop): Unit = {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(200)
    val res = SCTest.check(params, prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  private val t0 = 1715299200L // 2024-05-10T00:00:00Z

  private case class Model(rows: List[(Long, Double)]) {
    def range(s: Long, e: Long): (Long, BigDecimal, Option[Double], Option[Double]) = {
      val in = rows.filter(r => r._1 >= s && r._1 < e)
      val sum = in.map(r => BigDecimal(r._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      (in.size.toLong, sum,
        if (in.isEmpty) None else Some(in.map(_._2).min),
        if (in.isEmpty) None else Some(in.map(_._2).max))
    }
  }

  // values on a 2-decimal grid (the wheel's exactness domain, scale=2)
  private val genRow: Gen[(Long, Double)] = for {
    off <- Gen.chooseNum(0L, 3 * 86400L + 7200L) // ~3 days span
    cents <- Gen.chooseNum(-500000L, 500000L)
  } yield (t0 + off, cents / 100.0)

  private val genRows: Gen[List[(Long, Double)]] = Gen.listOf(genRow)

  private val genRange: Gen[(Long, Long)] = for {
    s <- Gen.chooseNum(t0 - 86400L, t0 + 4 * 86400L)
    len <- Gen.chooseNum(0L, 5 * 86400L)
  } yield (s, s + len)

  /** Sorted ingest with watermark progression (the write-ahead window now
    * rotates with in-order inserts on its own; the explicit advanceTo keeps
    * the test exercising both progression paths — as a real stream would). */
  private def feed(rw: RwWheel, rows: List[(Long, Double)]): RwWheel = {
    rows.sortBy(_._1).foreach { case (sec, v) =>
      rw.advanceTo(sec * 1000L)
      rw.insert(sec * 1000L, v)
    }
    rw
  }

  private def build(rows: List[(Long, Double)]): HawWheel =
    feed(new RwWheel(scale = 2, hasValues = true), rows).freeze()

  test("sparse year-span data: range/groupBy equal brute force across big gaps") {
    // stresses the sparse layout: few rows scattered over ~400 days, ranges
    // that straddle multi-week empty gaps
    val genSparseRows: Gen[List[(Long, Double)]] = Gen.listOf(for {
      off <- Gen.chooseNum(0L, 400L * 86400L)
      cents <- Gen.chooseNum(-500000L, 500000L)
    } yield (t0 + off, cents / 100.0))
    val genWideRange: Gen[(Long, Long)] = for {
      s <- Gen.chooseNum(t0 - 86400L, t0 + 401L * 86400L)
      len <- Gen.chooseNum(0L, 420L * 86400L)
    } yield (s, s + len)
    check(Prop.forAll(genSparseRows, genWideRange, Gen.chooseNum(0, 4)) { (rows, r, lvl) =>
      val (s, e) = r
      val w = build(rows)
      val m = Model(rows)
      val ra = w.range(s, e)
      val (c, sum, mn, mx) = m.range(s, e)
      val rangeOk = ra.count == c &&
        (c == 0L || ra.sumDecimal.get == sum.bigDecimal.setScale(2)) &&
        ra.minOpt == mn && ra.maxOpt == mx
      val groups = w.groupBy(s, e, lvl)
      rangeOk && groups.map(_._2.count).sum == c
    })
  }

  test("range aggregates equal brute force on arbitrary data and ranges") {
    check(Prop.forAll(genRows, genRange) { (rows, r) =>
      val (s, e) = r
      val w = build(rows)
      val ra = w.range(s, e)
      val (c, sum, mn, mx) = Model(rows).range(s, e)
      ra.count == c &&
        (c == 0L || ra.sumDecimal.get == sum.bigDecimal.setScale(2)) &&
        ra.minOpt == mn && ra.maxOpt == mx
    })
  }

  test("groupBy at every granularity partitions the range exactly") {
    check(Prop.forAll(genRows, genRange, Gen.chooseNum(0, 4)) { (rows, r, lvl) =>
      val (s, e) = r
      val w = build(rows)
      val m = Model(rows)
      val groups = w.groupBy(s, e, lvl)
      val span = HawWheel.Spans(lvl)
      // every reported group equals brute force over its clipped slot...
      val groupsOk = groups.forall { case (gs, ra) =>
        val (c, sum, mn, mx) = m.range(math.max(gs, s), math.min(gs + span, e))
        ra.count == c && (c == 0L || ra.sumDecimal.get == sum.bigDecimal.setScale(2)) &&
          ra.minOpt == mn && ra.maxOpt == mx
      }
      // ...slot keys are aligned and within range, and counts total correctly
      val keysOk = groups.forall { case (gs, _) =>
        HawWheel.alignDown(gs, span) == gs && gs < e && gs + span > s
      }
      groupsOk && keysOk && groups.map(_._2.count).sum == m.range(s, e)._1
    })
  }

  test("any partition split + merge equals a single build") {
    check(Prop.forAll(genRows, Gen.chooseNum(0, 100)) { (rows, pct) =>
      val (a, b) = rows.splitAt(rows.size * pct / 100)
      val wa = feed(new RwWheel(2, hasValues = true), a)
      val wb = feed(new RwWheel(2, hasValues = true), b)
      val merged = wa.merge(wb).freeze()
      val single = build(rows)
      val ra = merged.range(t0 - 86400L, t0 + 5 * 86400L)
      val rb = single.range(t0 - 86400L, t0 + 5 * 86400L)
      ra.count == rb.count && ra.sumScaled == rb.sumScaled &&
        ra.min == rb.min && ra.max == rb.max
    })
  }

  test("mergePartial-fed wheel equals row-insert wheel") {
    check(Prop.forAll(genRows) { rows =>
      val byRow = build(rows)
      val partial = new RwWheel(2, hasValues = true)
      rows.groupBy(_._1).foreach { case (sec, rs) =>
        val scaled = rs.map(r => math.rint(r._2 * 100).toLong).sum
        partial.mergePartial(sec, rs.size.toLong, scaled, rs.map(_._2).min, rs.map(_._2).max)
      }
      val a = partial.freeze().landmark
      val b = byRow.landmark
      a.count == b.count && a.sumScaled == b.sumScaled && a.min == b.min && a.max == b.max
    })
  }
}
