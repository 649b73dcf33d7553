package graft.wheel

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The sparse bucketized read ([[HawWheel.bucketize]]) must equal the naive
  * per-grid-position [[HawWheel.range]] sweep on arbitrary data, strides,
  * offsets and member widths (member = n·stride, the exact-cover contract),
  * raw and packed, at slot spans 1 and >1 — it replaced that sweep as the
  * tumbling/sliding window() read (round-9 verdict task 1), so any
  * divergence is a silent wrong answer on a window group-by. */
class BucketizeSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(300)
    val res = SCTest.check(params, prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  private val t0 = 1715299200L // 2024-05-10T00:00:00Z

  private def feed(rows: List[(Long, Double)]): RwWheel = {
    val rw = new RwWheel(scale = 2, hasValues = true)
    rows.sortBy(_._1).foreach { case (sec, v) =>
      rw.advanceTo(sec * 1000L); rw.insert(sec * 1000L, v)
    }
    rw
  }

  /** Naive model: enumerate every aligned grid position overlapping [s, e)
    * and read it with the independently-tested range(). */
  private def naive(hw: HawWheel, s: Long, e: Long, stride: Long, offset: Long,
      member: Long): IndexedSeq[(Long, RangeAgg)] = {
    val lo = math.max(s, hw.startSec)
    val hi = math.min(e, hw.endSec)
    if (lo >= hi) return Vector.empty
    var b = Math.floorDiv(lo - member + 1 - offset, stride) * stride + offset
    while (b + member <= lo) b += stride
    val out = Vector.newBuilder[(Long, RangeAgg)]
    while (b < hi) {
      val ra = hw.range(math.max(b, s), math.min(b + member, e))
      if (ra.count > 0) out += ((b, ra))
      b += stride
    }
    out.result()
  }

  private val genRows: Gen[List[(Long, Double)]] = Gen.listOf(for {
    off <- Gen.chooseNum(0L, 3 * 3600L) // ~3h span, second ticks
    cents <- Gen.chooseNum(-500000L, 500000L)
  } yield (t0 + off, cents / 100.0))

  private val genShape: Gen[(Long, Long, Long, Long, Long)] = for {
    s <- Gen.chooseNum(t0 - 3600L, t0 + 4 * 3600L)
    len <- Gen.chooseNum(0L, 4 * 3600L)
    stride <- Gen.chooseNum(1L, 900L)
    n <- Gen.chooseNum(1L, 8L)
    offRaw <- Gen.chooseNum(0L, 900L)
  } yield (s, s + len, stride, offRaw % stride, n * stride)

  test("bucketize equals the naive grid sweep (raw, slotSpan 1)") {
    check(Prop.forAll(genRows, genShape) { (rows, shape) =>
      val (s, e, stride, off, member) = shape
      val hw = feed(rows).freeze()
      hw.bucketize(s, e, stride, off, member) == naive(hw, s, e, stride, off, member)
    })
  }

  test("bucketize equals the naive grid sweep (packed levels)") {
    check(Prop.forAll(genRows, genShape) { (rows, shape) =>
      val (s, e, stride, off, member) = shape
      val hw = feed(rows).freeze(1L, packLevels = true)
      hw.bucketize(s, e, stride, off, member) == naive(hw, s, e, stride, off, member)
    })
  }

  test("bucketize equals the naive grid sweep (slotSpan 60, stride multiple)") {
    // coarse wheels serve window() only when the stride is a slot multiple;
    // generate minute-aligned shapes against a minute-span wheel
    val genCoarseShape: Gen[(Long, Long, Long, Long, Long)] = for {
      s <- Gen.chooseNum(t0 - 3600L, t0 + 4 * 3600L)
      len <- Gen.chooseNum(0L, 4 * 3600L)
      strideM <- Gen.chooseNum(1L, 15L)
      n <- Gen.chooseNum(1L, 6L)
    } yield (s, s + len, strideM * 60L, 0L, n * strideM * 60L)
    check(Prop.forAll(genRows, genCoarseShape) { (rows, shape) =>
      val (s, e, stride, off, member) = shape
      val hw = feed(rows).freeze(60L)
      hw.bucketize(s, e, stride, off, member) == naive(hw, s, e, stride, off, member)
    })
  }

  test("sparse data: empty grid stretches are jumped, results still exact") {
    // few rows over ~400 days with second strides: the naive sweep would
    // visit ~35M positions — run it only over each row's neighborhood, and
    // assert bucketize's TOTAL bucket count matches the union
    val rows = List(0L, 86400L * 97 + 3, 86400L * 211 + 9999, 86400L * 399)
      .map(o => (t0 + o, (o % 71).toDouble))
    val hw = feed(rows).freeze()
    val stride = 30L
    val member = 90L
    val got = hw.bucketize(t0 - 10, t0 + 86400L * 400, stride, 0L, member)
    val exp = rows.flatMap { case (sec, _) =>
      naive(hw, sec - member, sec + member, stride, 0L, member)
    }.distinct.sortBy(_._1)
    assert(got == exp)
    assert(got.forall(_._2.count > 0))
  }

  test("degenerate: empty wheel and zero-length range") {
    val hw = feed(Nil).freeze()
    assert(hw.bucketize(t0, t0 + 100, 10, 0, 10).isEmpty)
    val hw2 = feed(List((t0, 1.0))).freeze()
    assert(hw2.bucketize(t0 + 50, t0 + 50, 10, 0, 10).isEmpty)
  }
}
