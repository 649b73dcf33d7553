package graft.wheel

import org.scalatest.funsuite.AnyFunSuite

/** [[WheelAggregators.CmsFreq]] — Count-Min frequency sketch, the fourth
  * sketch-family instance of the custom-aggregator trait (reference trait:
  * `/root/reference/datafusion-uwheel/src/aggregator/mod.rs:8-34`).
  * Properties proven here are what the rewrite rule relies on: canonical
  * bytes (equal content ⇒ equal encoding), associative/commutative
  * additive merges, the one-sided error guarantee (never an
  * under-estimate; zero ⟺ provably absent), and bit-for-bit equality of
  * a wheel's disjoint range decomposition with a flat fold. */
class CmsWheelSpec extends AnyFunSuite {

  val cms = new WheelAggregators.CmsFreq(4, 12)

  private def sketchOf(xs: Seq[Long]): Array[Byte] =
    xs.foldLeft(cms.identity)((p, x) => cms.combine(p, cms.lift(x)))

  test("lift produces d strictly-ascending row-major slots") {
    for (x <- Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue)) {
      val slots = cms.slotsOf(x)
      assert(slots.length === 4)
      assert(slots.sliding(2).forall(p => p(0) < p(1)))
      slots.zipWithIndex.foreach { case (s, i) =>
        assert(s >= i * 4096 && s < (i + 1) * 4096, s"slot $s outside row $i")
      }
    }
  }

  test("freq is never an under-estimate, and 0 means provably absent") {
    val xs = (0L until 500L).flatMap(i => Seq.fill((i % 5).toInt + 1)(i))
    val p = sketchOf(xs)
    val trueCount = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    trueCount.foreach { case (x, c) =>
      assert(cms.freqOf(p, x) >= c, s"under-estimate for $x")
    }
    // a value with freq 0 was definitely never ingested
    (10000L until 11000L).foreach { y =>
      if (cms.freqOf(p, y) == 0L) assert(!trueCount.contains(y))
    }
    assert(cms.totalCount(p) === xs.length.toLong)
  }

  test("sparse corpora estimate exactly (no collisions at low fill)") {
    val xs = (0L until 50L).flatMap(i => Seq.fill(3)(i))
    val p = sketchOf(xs)
    // 50 keys in 4096 counters: min-of-4-rows collisions are vanishingly
    // unlikely at this fill and this fixed hash — assert exactness, which
    // also pins the hash function (a changed hash would break wheels
    // persisted by earlier builds)
    (0L until 50L).foreach(x => assert(cms.freqOf(p, x) === 3L))
    (100L until 150L).foreach(x => assert(cms.freqOf(p, x) === 0L))
  }

  test("combine is associative, commutative, and canonical") {
    val a = sketchOf((0L until 40L))
    val b = sketchOf((20L until 60L).map(_ * 7L))
    val c = sketchOf((5L until 45L).map(_ * 13L))
    def eq(x: Array[Byte], y: Array[Byte]) = x.sameElements(y)
    assert(eq(cms.combine(a, b), cms.combine(b, a)))
    assert(eq(cms.combine(cms.combine(a, b), c), cms.combine(a, cms.combine(b, c))))
    assert(eq(cms.combine(a, cms.identity), a))
  }

  test("wheel decomposition equals a flat fold, bit for bit") {
    // values spread over ~3 hours of seconds so the range read crosses
    // second/minute/hour levels of the decomposition
    val rows: Seq[(Long, Long)] = (0 until 5000).map { i =>
      (1704067200L + i * 2L, (i % 137).toLong)
    }
    val w = new TypedRwWheel[Long, Array[Byte], Array[Byte]](cms)
    rows.foreach { case (sec, v) => w.mergePartial(sec, cms.lift(v)) }
    val frozen = w.freeze()
    val (lo, hi) = (1704067200L + 600L, 1704067200L + 9000L)
    val wheelRead = frozen.combineRange(lo, hi)
    val flat = sketchOf(rows.filter { case (s, _) => s >= lo && s < hi }.map(_._2))
    assert(wheelRead.sameElements(flat))
    (0L until 137L).foreach { x =>
      assert(cms.freqOf(wheelRead, x) === cms.freqOf(flat, x))
    }
  }

  test("parameter validation") {
    intercept[IllegalArgumentException](new WheelAggregators.CmsFreq(0, 12))
    intercept[IllegalArgumentException](new WheelAggregators.CmsFreq(4, 25))
  }
}
