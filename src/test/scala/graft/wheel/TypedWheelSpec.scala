package graft.wheel

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import WheelAggregators._

/** The typed extension surface must agree with brute force for both the
  * prefix (invertible) and hierarchy-decomposition (non-invertible) paths,
  * and custom user aggregators must plug in unchanged. */
class TypedWheelSpec extends AnyFunSuite {

  private val t0 = 1715299200L

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(150), prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  private val genRows: Gen[List[(Long, Double)]] = Gen.listOf(for {
    off <- Gen.chooseNum(0L, 2 * 86400L)
    v <- Gen.chooseNum(-10000, 10000).map(_ / 100.0)
  } yield (t0 + off, v))

  private val genRange: Gen[(Long, Long)] = for {
    s <- Gen.chooseNum(t0 - 3600L, t0 + 3 * 86400L)
    len <- Gen.chooseNum(0L, 3 * 86400L)
  } yield (s, s + len)

  private def wheelOf[P: scala.reflect.ClassTag, O](
      agg: WheelAggregator[Double, P, O], rows: List[(Long, Double)]): TypedHawWheel[P, O] = {
    val rw = new TypedRwWheel(agg)
    rows.sortBy(_._1).foreach { case (sec, v) => rw.insert(sec * 1000L, v) }
    rw.freeze()
  }

  test("invertible sum (prefix path) equals brute force") {
    check(Prop.forAll(genRows, genRange) { (rows, r) =>
      val (s, e) = r
      val got = wheelOf(DoubleSum, rows).range(s, e)
      val exp = rows.filter(x => x._1 >= s && x._1 < e).map(_._2).sum
      math.abs(got - exp) < 1e-6
    })
  }

  test("non-invertible min/max (hierarchy path) equals brute force") {
    check(Prop.forAll(genRows, genRange) { (rows, r) =>
      val (s, e) = r
      val in = rows.filter(x => x._1 >= s && x._1 < e).map(_._2)
      val mn = wheelOf(DoubleMin, rows).range(s, e)
      val mx = wheelOf(DoubleMax, rows).range(s, e)
      (if (in.isEmpty) mn.isPosInfinity else mn == in.min) &&
        (if (in.isEmpty) mx.isNegInfinity else mx == in.max)
    })
  }

  test("avg pair aggregator lowers to the mean; merge equals single build") {
    check(Prop.forAll(genRows, Gen.chooseNum(0, 100)) { (rows, pct) =>
      val (a, b) = rows.splitAt(rows.size * pct / 100)
      val wa = new TypedRwWheel(DoubleAvg)
      val wb = new TypedRwWheel(DoubleAvg)
      a.sortBy(_._1).foreach { case (sec, v) => wa.insert(sec * 1000L, v) }
      b.sortBy(_._1).foreach { case (sec, v) => wb.insert(sec * 1000L, v) }
      val merged = wa.merge(wb).freeze().landmark
      val exp = if (rows.isEmpty) Double.NaN else rows.map(_._2).sum / rows.size
      (merged.isNaN && exp.isNaN) || math.abs(merged - exp) < 1e-9
    })
  }

  test("slot codec roundtrips exactly, including wrap-around deltas") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) { xs =>
      val a = xs.toArray
      ZigZagDeltaLongCodec.decode(ZigZagDeltaLongCodec.encode(a)).sameElements(a)
    })
  }

  test("codec-compressed hierarchy wheel ≡ uncompressed, at smaller storage") {
    // same semantics as LongMax minus the codec
    object PlainLongMax extends WheelAggregator[Long, Long, Long] {
      val identity = Long.MinValue
      def lift(in: Long): Long = in
      def combine(a: Long, b: Long): Long = math.max(a, b)
      def lower(p: Long): Long = p
    }
    def feed[O](agg: WheelAggregator[Long, Long, O]): TypedHawWheel[Long, O] = {
      val rw = new TypedRwWheel(agg)
      // smooth-ish monotone values over ~2000 distinct seconds
      (0 until 6000).foreach { i =>
        rw.insert((t0 + (i % 2000).toLong * 3) * 1000L, 1000000L + i.toLong * 7)
      }
      rw.freeze()
    }
    val comp = feed(LongMax)
    val plain = feed(PlainLongMax)
    val ranges = Seq((t0, t0 + 6000L), (t0 + 100, t0 + 101), (t0 + 33, t0 + 4321),
      (t0 - 50, t0 + 9999), (t0 + 5999, t0 + 6000))
    for ((s, e) <- ranges)
      assert(comp.range(s, e) === plain.range(s, e), s"range($s,$e)")
    assert(comp.partialStoreBytes * 2 < plain.partialStoreBytes,
      s"compressed ${comp.partialStoreBytes}B vs raw ${plain.partialStoreBytes}B")
  }

  test("custom user aggregator (wrapping int sum) plugs in with exact inverse") {
    val rw = new TypedRwWheel(WrappingIntSum)
    rw.insert(t0 * 1000L, 10)
    rw.insert((t0 + 1) * 1000L, Int.MaxValue) // wraps in the prefix...
    rw.insert((t0 + 2) * 1000L, 5)
    val w = rw.freeze()
    assert(w.range(t0, t0 + 1) === 10)
    assert(w.range(t0 + 1, t0 + 2) === Int.MaxValue)
    assert(w.range(t0 + 2, t0 + 3) === 5) // ...but every range is still exact
    assert(w.landmark === 10 + Int.MaxValue + 5) // wrapped, as 32-bit algebra dictates
  }
}
