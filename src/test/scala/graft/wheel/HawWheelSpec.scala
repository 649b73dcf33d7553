package graft.wheel

import org.scalatest.funsuite.AnyFunSuite

/** Wheel-level tests mirroring the reference's 10-row fixture
  * (`/root/reference/datafusion-uwheel/src/lib.rs:1290-1318`): rows at
  * 2024-05-10T00:00:00Z + i seconds, values 1..10. */
class HawWheelSpec extends AnyFunSuite {
  val t0: Long = 1715299200L // 2024-05-10T00:00:00Z epoch sec

  def fixture: HawWheel = {
    val rw = new RwWheel(scale = 2, hasValues = true)
    (0 until 10).foreach(i => rw.insert((t0 + i) * 1000L, (i + 1).toDouble))
    rw.freeze()
  }

  test("count/sum/avg/min/max over full range (reference exec tests)") {
    val w = fixture
    val ra = w.range(t0, t0 + 10)
    assert(ra.count === 10)
    assert(ra.sum === Some(55.0))
    assert(ra.avg === Some(5.5))
    assert(ra.minOpt === Some(1.0))
    assert(ra.maxOpt === Some(10.0))
  }

  test("partial ranges are exact") {
    val w = fixture
    assert(w.countRange(t0 + 2, t0 + 5) === 3)
    assert(w.range(t0 + 2, t0 + 5).sum === Some(3.0 + 4.0 + 5.0))
    assert(w.range(t0 + 2, t0 + 5).minOpt === Some(3.0))
    assert(w.range(t0 + 9, t0 + 100).maxOpt === Some(10.0))
  }

  test("empty range yields count 0 / NULL aggregates") {
    val w = fixture
    val ra = w.range(t0 + 100, t0 + 200)
    assert(ra.count === 0)
    assert(ra.sum === None)
    assert(ra.minOpt === None)
  }

  test("landmark covers lifetime (reference landmark test: sum=55)") {
    assert(fixture.landmark.sum === Some(55.0))
  }

  test("group by day yields single key at day boundary (reference: key=1715299200000)") {
    val w = fixture
    val g = w.groupBy(t0, t0 + 10, levelIdx = 3)
    assert(g.length === 1)
    assert(g.head._1 === t0) // 2024-05-10 is a day boundary
    assert(g.head._2.count === 10)
  }

  test("group by second yields 10 groups") {
    val g = fixture.groupBy(t0, t0 + 10, levelIdx = 0)
    assert(g.length === 10)
    assert(g.map(_._2.count).sum === 10)
    assert(g(3)._2.sum === Some(4.0))
  }

  test("week alignment is Monday-anchored") {
    // 2024-01-01 (epoch 1704067200) is a Monday.
    val monday = 1704067200L
    assert(HawWheel.alignDown(monday, HawWheel.WEEK) === monday)
    assert(HawWheel.alignDown(monday + 6 * 86400 + 3600, HawWheel.WEEK) === monday)
    assert(HawWheel.alignDown(monday - 1, HawWheel.WEEK) === monday - 7 * 86400)
  }

  test("unaligned group-by range clips edge groups exactly") {
    val w = fixture
    // minute-level grouping over [t0+2, t0+7): one partial minute group
    val g = w.groupBy(t0 + 2, t0 + 7, levelIdx = 1)
    assert(g.length === 1)
    assert(g.head._2.count === 5)
    assert(g.head._2.sum === Some(3.0 + 4.0 + 5.0 + 6.0 + 7.0))
  }

  test("merge of two partition wheels equals single build") {
    val a = new RwWheel(2, hasValues = true)
    val b = new RwWheel(2, hasValues = true)
    (0 until 5).foreach(i => a.insert((t0 + i) * 1000L, (i + 1).toDouble))
    (5 until 10).foreach(i => b.insert((t0 + i) * 1000L, (i + 1).toDouble))
    val merged = a.merge(b).freeze()
    assert(merged.range(t0, t0 + 10).sum === Some(55.0))
    assert(merged.range(t0, t0 + 10).count === 10)
  }

  test("out-of-order within same second accumulates") {
    val rw = new RwWheel(2, hasValues = true)
    rw.insert(t0 * 1000L + 500, 2.0)
    rw.insert(t0 * 1000L + 100, 3.0)
    val w = rw.freeze()
    assert(w.range(t0, t0 + 1).sum === Some(5.0))
    assert(w.range(t0, t0 + 1).count === 2)
  }

  test("count-only wheel: same counts, no value payload, smaller footprint") {
    def build(hasValues: Boolean): HawWheel = {
      val rw = new RwWheel(2, hasValues)
      (0 until 500).foreach(i => rw.insert((t0 + i * 7) * 1000L, (i + 1).toDouble))
      rw.freeze()
    }
    val co = build(hasValues = false)
    val full = build(hasValues = true)
    assert(co.countRange(t0, t0 + 3500) === full.countRange(t0, t0 + 3500))
    assert(co.countRange(t0 + 70, t0 + 700) === full.countRange(t0 + 70, t0 + 700))
    assert(co.groupBy(t0, t0 + 3500, 1).map { case (k, a) => (k, a.count) } ===
           full.groupBy(t0, t0 + 3500, 1).map { case (k, a) => (k, a.count) })
    val ra = co.range(t0, t0 + 3500)
    assert(ra.sumScaled === 0L && ra.min.isPosInfinity && ra.max.isNegInfinity)
    // dropped arrays: scaled sum + min/max per second (24B) + sum prefix +
    // per-slot min/max in the levels — comfortably under half the footprint
    assert(co.sizeBytes * 2 < full.sizeBytes,
      s"count-only ${co.sizeBytes}B vs full ${full.sizeBytes}B")
  }

  test("tryMergePartial drops beyond-horizon partials, counts them, accepts late ones") {
    val rw = new RwWheel(2, hasValues = true)
    assert(rw.tryMergePartial(t0, 1L, 100L, 1.0, 1.0)) // anchors the horizon
    assert(!rw.tryMergePartial(t0 + RwWheel.DefaultWriteAheadSlots + 5, 1L, 0L, 0.0, 0.0))
    assert(rw.droppedBeyondHorizon === 1L)
    assert(rw.tryMergePartial(t0 - 100, 1L, 50L, 0.5, 0.5)) // late: accepted
    assert(rw.freeze().landmark.count === 2L)
  }

  test("maxFutureSkewSec rejects the corrupt far-future row, not the good ones after it") {
    val rw = new RwWheel(2, hasValues = true, maxFutureSkewSec = Some(3600L))
    rw.insert(t0 * 1000L, 1.0)
    rw.insert((t0 + 1800) * 1000L, 2.0) // within skew: fine
    // a year-3000-style corrupt timestamp fails ITSELF instead of rotating
    // the window and poisoning every subsequent in-order insert
    intercept[IllegalArgumentException](rw.insert((t0 + 100000) * 1000L, 9.0))
    rw.insert((t0 + 2400) * 1000L, 3.0) // ingest continues unharmed
    assert(rw.freeze().landmark.count === 3)
  }

  test("write-ahead window rotates: monotone inserts never throw, stale lates rejected") {
    val rw = new RwWheel(2, hasValues = true)
    rw.insert(t0 * 1000L, 1.0)
    // a far-ahead in-order insert rotates the window forward instead of
    // throwing (a monotone bulk loader needs no interleaved advanceTo)
    val farMs = (t0 + RwWheel.DefaultWriteAheadSlots + 10) * 1000L
    rw.insert(farMs, 2.0)
    // t0 is now more than writeAheadSlots behind the newest write: late
    intercept[IllegalArgumentException](rw.insert(t0 * 1000L, 9.0))
    // the trailing edge of the rotated window is still writable
    rw.insert(farMs - RwWheel.DefaultWriteAheadSlots * 1000L, 3.0)
    val w = rw.freeze()
    assert(w.landmark.count === 3)
    assert(w.landmark.sum === Some(6.0))
  }
}
