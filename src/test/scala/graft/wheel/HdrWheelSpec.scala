package graft.wheel

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** [[WheelAggregators.HdrQuantile]] — the log-bucketed quantile sketch:
  * monotone bucketing with bounded RELATIVE bucket width, canonical
  * additive partials, and the key exactness property the rewrite rule
  * relies on: the sketch's quantile is exactly `bucketFloor(nearest-rank
  * quantile)` of the underlying multiset, because the bucketing is
  * monotone — so the selected bucket IS the bucket of the true ranked
  * value, and the estimate's relative error is bounded by the bucket
  * width 2^−s, never by the data distribution. */
class HdrWheelSpec extends AnyFunSuite {

  val hdr = new WheelAggregators.HdrQuantile(7)
  val rnd = new Random(42)

  def randomValues(n: Int): Array[Double] = Array.fill(n) {
    rnd.nextInt(6) match {
      case 0 => rnd.nextDouble() * 1e-8
      case 1 => rnd.nextDouble()
      case 2 => rnd.nextDouble() * 1e6
      case 3 => -rnd.nextDouble() * 1e3
      case 4 => rnd.nextInt(100).toDouble
      case _ => rnd.nextGaussian() * 1e9
    }
  }

  test("bucketing is monotone and relative bucket width is bounded by 2^-s") {
    val vs = randomValues(5000).sorted
    var i = 1
    while (i < vs.length) {
      assert(hdr.bucketOf(vs(i - 1)) <= hdr.bucketOf(vs(i)),
        s"buckets not monotone at ${vs(i - 1)} vs ${vs(i)}")
      i += 1
    }
    vs.filter(v => v != 0.0 && !v.isInfinite).foreach { v =>
      val rep = hdr.valueOf(hdr.bucketOf(v))
      // representative is the bucket's value-order lower edge
      assert(rep <= v || math.abs(rep - v) == 0.0, s"rep $rep above $v")
      assert(math.abs(rep - v) <= math.abs(v) * math.pow(2, -7) * 1.0001,
        s"relative error too big: v=$v rep=$rep")
    }
  }

  test("special values: -0.0 folds to 0.0, NaN sorts greatest, infinities bucket") {
    assert(hdr.bucketOf(-0.0) === hdr.bucketOf(0.0))
    assert(hdr.bucketOf(Double.NaN) === hdr.NanBucket)
    assert(hdr.bucketOf(Double.NaN) > hdr.bucketOf(Double.PositiveInfinity))
    assert(hdr.bucketOf(Double.PositiveInfinity) > hdr.bucketOf(Double.MaxValue))
    assert(hdr.bucketOf(Double.NegativeInfinity) < hdr.bucketOf(-Double.MaxValue))
  }

  test("combine is associative, commutative, and canonical") {
    val parts = Array.fill(30)(randomValues(20).map(hdr.lift).reduce(hdr.combine))
    val leftFold = parts.reduce(hdr.combine)
    val rightFold = parts.reverse.reduce((a, b) => hdr.combine(b, a))
    assert(java.util.Arrays.equals(leftFold, rightFold))
    val shuffled = rnd.shuffle(parts.toSeq).reduce(hdr.combine)
    assert(java.util.Arrays.equals(leftFold, shuffled))
  }

  test("sketch quantile equals bucketFloor(nearest-rank quantile), exactly") {
    val vs = randomValues(4000)
    val part = vs.map(hdr.lift).reduce(hdr.combine)
    val sorted = vs.sorted
    for (q <- Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.95, 0.99, 1.0)) {
      val r = math.max(1, math.min(vs.length, math.ceil(q * vs.length).toInt))
      val expected = hdr.valueOf(hdr.bucketOf(sorted(r - 1)))
      val got = hdr.quantileOf(part, q).get
      assert(got === expected, s"q=$q")
    }
    assert(hdr.quantileOf(hdr.identity, 0.5).isEmpty)
  }

  test("wheel decomposition bit-equals the flat fold (additive over disjoint slots)") {
    // per-second partials over 2h; a range read must combine to exactly
    // the flat fold over the covered seconds
    val base = 1700000000L
    val perSec = (0 until 7200).map { i =>
      (base + i, randomValues(3).map(hdr.lift).reduce(hdr.combine))
    }
    val wheel = TypedHawWheel.fromSecondPartials(perSec.iterator, hdr)
    for ((s, e) <- Seq((base + 10, base + 3671), (base, base + 7200),
                       (base + 59, base + 60), (base + 3600, base + 7195))) {
      val flat = perSec.filter(p => p._1 >= s && p._1 < e).map(_._2)
        .foldLeft(hdr.identity)(hdr.combine)
      assert(java.util.Arrays.equals(wheel.combineRange(s, e), flat), s"range [$s,$e)")
    }
  }

  test("counts survive encode/decode round-trips at scale") {
    val vs = randomValues(1000)
    val part = vs.map(hdr.lift).reduce(hdr.combine)
    assert(hdr.totalCount(part) === vs.length.toLong)
    val (idxs, cnts) = hdr.decode(part)
    assert(java.util.Arrays.equals(hdr.encodeSorted(idxs, cnts), part))
    assert(idxs.sorted.toSeq === idxs.toSeq)
  }
}
