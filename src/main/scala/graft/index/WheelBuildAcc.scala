package graft.index

import org.apache.spark.sql.Row

import graft.wheel.RwWheel

/** Executor-side accumulator for the distributed index build: one [[RwWheel]]
  * per requested wheel spec plus the exactness metadata the optimizer rule
  * gates rewrites on. Partitions of the per-second aggregate fold their rows
  * in with [[add]]; [[merge]] combines two accumulators (associatively, via
  * `RwWheel.merge`), so `treeAggregate` can reduce the whole build to a
  * single object shipped to the driver — in contrast to the reference, which
  * materializes every ROW in one process (`datafusion-uwheel/src/lib.rs:1130-1158`),
  * and to a flat `collect()` of per-second Rows, whose driver heap cost grows
  * with active seconds × Row overhead.
  *
  * Row layout (produced by `UWheelIndex.buildWheels`): column 0 is the epoch
  * second (null when the source timestamp was NULL); then per spec `i`, at
  * offset `1 + 7*i`: rowCount, valueCount, sum(DECIMAL(38,scale)), min, max,
  * nonRepresentableCount, nanCount.
  */
private[index] final class WheelBuildAcc(
    scales: Array[Int],
    hasVals: Array[Boolean]) extends Serializable {

  private val n = scales.length
  val wheels: Array[RwWheel] =
    Array.tabulate(n)(i => new RwWheel(scales(i), hasVals(i)))
  val allNonNull: Array[Boolean] = Array.fill(n)(true)
  val badRep: Array[Long] = new Array[Long](n)
  val nanCount: Array[Long] = new Array[Long](n)
  val sawNullTs: Array[Boolean] = new Array[Boolean](n)

  def add(r: Row): Unit = {
    val nullSec = r.isNullAt(0)
    val sec = if (nullSec) 0L else r.getLong(0)
    var i = 0
    while (i < n) {
      val o = 1 + i * 7
      val c = r.getLong(o)
      if (c > 0) {
        if (nullSec) sawNullTs(i) = true
        else {
          if (r.getLong(o + 1) != c) allNonNull(i) = false
          badRep(i) += r.getLong(o + 5)
          nanCount(i) += r.getLong(o + 6)
          val sumScaled =
            if (r.isNullAt(o + 2)) 0L
            else r.getDecimal(o + 2).movePointRight(scales(i)).longValueExact()
          val mn = if (r.isNullAt(o + 3)) Double.PositiveInfinity else r.getDouble(o + 3)
          val mx = if (r.isNullAt(o + 4)) Double.NegativeInfinity else r.getDouble(o + 4)
          wheels(i).mergePartial(sec, c, sumScaled, mn, mx)
        }
      }
      i += 1
    }
  }

  def merge(o: WheelBuildAcc): WheelBuildAcc = {
    var i = 0
    while (i < n) {
      wheels(i).merge(o.wheels(i))
      allNonNull(i) &= o.allNonNull(i)
      badRep(i) += o.badRep(i)
      nanCount(i) += o.nanCount(i)
      sawNullTs(i) |= o.sawNullTs(i)
      i += 1
    }
    this
  }
}
