package graft.wheel

import scala.collection.mutable

/** Read-write wheel: the streaming ingestion surface of the reference's
  * µWheel (`RwWheel::insert` / `advance_to`,
  * `/root/reference/datafusion-uwheel/src/lib.rs:1005-1010,1075-1080`).
  *
  * Inserts are accepted at millisecond timestamps at or ahead of the
  * watermark, buffered in per-second partials, and sealed into an immutable
  * [[HawWheel]] by [[freeze]] (the reference's `ReaderWheel` conversion with
  * SIMD/prefix finalization, `lib.rs:1082-1087`). Out-of-order inserts behind
  * the watermark are rejected, mirroring µWheel's write-ahead semantics
  * (write-ahead ring of 65,536 slots ≈ here an unbounded sorted map — the
  * driver-side build has no backpressure concern).
  *
  * Two wheels built from the same rows merge associatively ([[merge]]), which
  * is what makes a distributed per-partition build correct.
  */
final class RwWheel(val scale: Int, val hasValues: Boolean) extends Serializable {
  private val slots = mutable.LongMap.empty[Array[Double]] // sec -> [count, sumScaled, min, max]
  private var watermarkMs: Long = Long.MinValue
  private val scaleFactor = math.pow(10, scale)

  def watermark: Long = watermarkMs

  /** Insert one row. `value` ignored for count-only wheels. */
  def insert(tsMs: Long, value: Double): Unit = {
    require(tsMs >= watermarkMs, s"insert at $tsMs behind watermark $watermarkMs")
    val sec = Math.floorDiv(tsMs, 1000L)
    val slot = slots.getOrElseUpdate(sec, Array(0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity))
    slot(0) += 1
    if (hasValues) {
      slot(1) += math.rint(value * scaleFactor)
      if (value < slot(2)) slot(2) = value
      if (value > slot(3)) slot(3) = value
    }
  }

  /** Event-time progression; inserts behind the new watermark are rejected. */
  def advanceTo(tsMs: Long): Unit = if (tsMs > watermarkMs) watermarkMs = tsMs

  def merge(other: RwWheel): RwWheel = {
    require(other.scale == scale && other.hasValues == hasValues)
    other.slots.foreach { case (sec, o) =>
      val slot = slots.getOrElseUpdate(sec, Array(0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity))
      slot(0) += o(0); slot(1) += o(1)
      if (o(2) < slot(2)) slot(2) = o(2)
      if (o(3) > slot(3)) slot(3) = o(3)
    }
    if (other.watermarkMs > watermarkMs) watermarkMs = other.watermarkMs
    this
  }

  def freeze(): HawWheel =
    HawWheel.fromSecondPartials(
      slots.iterator.map { case (sec, a) => (sec, a(0).toLong, a(1).toLong, a(2), a(3)) },
      scale, hasValues)
}
