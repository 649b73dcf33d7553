package graft.wheel

/** Hierarchical Aggregation Wheel (HAW) — a Spark-first re-expression of the
  * µWheel index used by the reference optimizer
  * (`/root/reference/datafusion-uwheel/src/lib.rs`, `wheels.rs:19-37`).
  *
  * Layout: one dense array of partial aggregates per granularity
  * (second / minute / hour / day / week), all slots retained (the reference's
  * `RetentionPolicy::Keep`, `/root/reference/datafusion-uwheel/src/builder.rs:99-112`).
  * Counts and sums additionally keep prefix arrays so any `[start,end)` range
  * is answered in O(1) (the reference's `to_prefix_wheels()`,
  * `lib.rs:1122-1124`); min/max are not invertible and use greedy
  * calendar decomposition across granularities (O(slots-per-level), ≤ ~240
  * combines for any range plus one slot per week spanned).
  *
  * Exactness contract (stricter than the reference, which silently truncates
  * sub-second bounds — `expr.rs:219-222`): all query ranges are in *whole
  * epoch seconds*; the optimizer rule only rewrites when predicate bounds are
  * exactly second-aligned, so a rewritten answer equals the full scan answer
  * bit-for-bit. Sums are kept as scaled longs ("cents" at `scale` decimal
  * digits) so range sums are exact integer arithmetic, not float accumulation.
  *
  * Scale story (100 TB design point): the wheel is built from *per-second
  * partial aggregates* computed by a distributed `groupBy(second)` — the data
  * collected to the driver is bounded by the time span (one row per distinct
  * second), independent of table row count. A year of data is ~31.5M seconds
  * regardless of whether the table has 1M or 1T rows.
  */
object HawWheel {
  final val SECOND = 1L
  final val MINUTE = 60L
  final val HOUR   = 3600L
  final val DAY    = 86400L
  final val WEEK   = 604800L

  /** Spans of the granularity levels, smallest first. */
  final val Spans = Array(SECOND, MINUTE, HOUR, DAY, WEEK)

  /** Epoch second of Monday 1969-12-29: `date_trunc('week', ts)` in both
    * Spark and DuckDB is Monday-anchored, while epoch day 0 is a Thursday.
    * All week slots are aligned to this offset so group-by-week keys equal
    * `date_trunc('week', ts)` exactly. */
  final val WeekOffset = -3L * DAY

  private def offsetOf(span: Long): Long = if (span == WEEK) WeekOffset else 0L

  def alignDown(sec: Long, span: Long): Long = {
    val off = offsetOf(span)
    Math.floorDiv(sec - off, span) * span + off
  }

  def levelIndexOf(unit: String): Option[Int] = unit.toLowerCase match {
    case "second" => Some(0)
    case "minute" => Some(1)
    case "hour"   => Some(2)
    case "day" | "dd" => Some(3)
    case "week"   => Some(4)
    case _        => None
  }

  /** Calendar (non-uniform-span) group-by units, as a month stride.
    * The reference explicitly rejects these
    * (`/root/reference/datafusion-uwheel/src/lib.rs:357`); we compose them
    * exactly from day slots. UTC-only — callers gate on the session TZ. */
  def monthStrideOf(unit: String): Option[Int] = unit.toLowerCase match {
    case "month" | "mon" | "mm"  => Some(1)
    case "quarter"               => Some(3)
    case "year" | "yyyy" | "yy"  => Some(12)
    case _                       => None
  }

  /** Builds a wheel from per-second partial aggregates.
    *
    * @param partials iterator of (epochSec, count, sumScaled, min, max);
    *                 at most one entry per distinct second. For count-only
    *                 wheels pass sumScaled=0, min=+Inf, max=-Inf.
    * @param scale    decimal digits of the scaled sum (2 => cents)
    */
  def fromSecondPartials(partials: Iterator[(Long, Long, Long, Double, Double)],
                         scale: Int,
                         hasValues: Boolean): HawWheel = {
    val buf = partials.toArray
    if (buf.isEmpty) return empty(scale, hasValues)
    var minSec = Long.MaxValue
    var maxSec = Long.MinValue
    buf.foreach { p =>
      if (p._1 < minSec) minSec = p._1
      if (p._1 > maxSec) maxSec = p._1
    }
    val n = (maxSec - minSec + 1).toInt
    require(n > 0 && (maxSec - minSec + 1) <= Int.MaxValue, s"second span too large: ${maxSec - minSec}")
    val counts = new Array[Long](n)
    val sums   = new Array[Long](n)
    val mins   = Array.fill(n)(Double.PositiveInfinity)
    val maxs   = Array.fill(n)(Double.NegativeInfinity)
    buf.foreach { case (sec, c, s, mn, mx) =>
      val i = (sec - minSec).toInt
      counts(i) += c
      sums(i) += s
      if (mn < mins(i)) mins(i) = mn
      if (mx > maxs(i)) maxs(i) = mx
    }
    new HawWheel(minSec, n, scale, hasValues, counts, sums, mins, maxs)
  }

  def empty(scale: Int, hasValues: Boolean): HawWheel =
    new HawWheel(0L, 0, scale, hasValues, Array.emptyLongArray, Array.emptyLongArray,
      Array.emptyDoubleArray, Array.emptyDoubleArray)

  /** One granularity level of the min/max hierarchy. */
  private[wheel] final class Level(val span: Long, val baseSec: Long,
                                   val mins: Array[Double], val maxs: Array[Double])
}

/** Aggregate result for a range; `count == 0` means SQL aggregates over the
  * range are NULL (sum/avg/min/max) and 0 (count). */
final case class RangeAgg(count: Long, sumScaled: Long, min: Double, max: Double, scale: Int) {
  def sum: Option[Double] = if (count == 0) None else Some(sumScaled / math.pow(10, scale))
  /** Exact scaled sum as java BigDecimal (matches SUM(CAST(x AS DECIMAL))). */
  def sumDecimal: Option[java.math.BigDecimal] =
    if (count == 0) None
    else Some(new java.math.BigDecimal(java.math.BigInteger.valueOf(sumScaled), scale))
  def avg: Option[Double] = if (count == 0) None else Some((sumScaled / math.pow(10, scale)) / count)
  def minOpt: Option[Double] = if (count == 0) None else Some(min)
  def maxOpt: Option[Double] = if (count == 0) None else Some(max)
}

final class HawWheel private (
    val startSec: Long,
    val numSecs: Int,
    val scale: Int,
    val hasValues: Boolean,
    counts: Array[Long],
    sums: Array[Long],
    secMins: Array[Double],
    secMaxs: Array[Double]) extends Serializable {
  import HawWheel._

  val endSec: Long = startSec + numSecs // exclusive

  // Prefix arrays: O(1) count/sum for any second range (invertible aggs only,
  // mirroring the reference's prefix wheels).
  private val prefCount: Array[Long] = {
    val p = new Array[Long](numSecs + 1)
    var i = 0
    while (i < numSecs) { p(i + 1) = p(i) + counts(i); i += 1 }
    p
  }
  private val prefSum: Array[Long] = {
    val p = new Array[Long](numSecs + 1)
    var i = 0
    while (i < numSecs) { p(i + 1) = p(i) + sums(i); i += 1 }
    p
  }

  // Coarser min/max levels (minute/hour/day/week), each covering the data
  // span, built by rolling up the next-finer level.
  private val levels: Array[HawWheel.Level] = {
    if (numSecs == 0) Array.empty
    else {
      val out = new Array[HawWheel.Level](Spans.length)
      out(0) = new HawWheel.Level(SECOND, startSec, secMins, secMaxs)
      var li = 1
      while (li < Spans.length) {
        val span = Spans(li)
        val base = alignDown(startSec, span)
        val nSlots = ((alignDown(endSec - 1, span) - base) / span + 1).toInt
        val mins = Array.fill(nSlots)(Double.PositiveInfinity)
        val maxs = Array.fill(nSlots)(Double.NegativeInfinity)
        val child = out(li - 1)
        var ci = 0
        while (ci < child.mins.length) {
          val childSec = child.baseSec + ci * child.span
          val slot = ((alignDown(childSec, span) - base) / span).toInt
          if (child.mins(ci) < mins(slot)) mins(slot) = child.mins(ci)
          if (child.maxs(ci) > maxs(slot)) maxs(slot) = child.maxs(ci)
          ci += 1
        }
        out(li) = new HawWheel.Level(span, base, mins, maxs)
        li += 1
      }
      out
    }
  }

  /** Exact count of rows with timestamp second in [s, e). O(1). */
  def countRange(s: Long, e: Long): Long = {
    val lo = math.max(s, startSec)
    val hi = math.min(e, endSec)
    if (lo >= hi) 0L
    else prefCount((hi - startSec).toInt) - prefCount((lo - startSec).toInt)
  }

  /** Exact scaled sum over [s, e). O(1). Meaningless if count==0. */
  def sumScaledRange(s: Long, e: Long): Long = {
    val lo = math.max(s, startSec)
    val hi = math.min(e, endSec)
    if (lo >= hi) 0L
    else prefSum((hi - startSec).toInt) - prefSum((lo - startSec).toInt)
  }

  /** Full aggregate over [s, e) seconds. min/max via greedy calendar
    * decomposition: repeatedly take the largest aligned slot that fits. */
  def range(s: Long, e: Long): RangeAgg = {
    val lo = math.max(s, startSec)
    val hi = math.min(e, endSec)
    val c = countRange(s, e)
    if (c == 0) return RangeAgg(0L, 0L, Double.PositiveInfinity, Double.NegativeInfinity, scale)
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var cur = lo
    while (cur < hi) {
      // largest level aligned at cur and fitting within hi
      var li = Spans.length - 1
      while (li > 0 && !(alignDown(cur, Spans(li)) == cur && cur + Spans(li) <= hi)) li -= 1
      val lvl = levels(li)
      val slot = ((cur - lvl.baseSec) / lvl.span).toInt
      if (slot >= 0 && slot < lvl.mins.length) {
        if (lvl.mins(slot) < mn) mn = lvl.mins(slot)
        if (lvl.maxs(slot) > mx) mx = lvl.maxs(slot)
      }
      cur += Spans(li)
    }
    RangeAgg(c, sumScaledRange(s, e), mn, mx, scale)
  }

  /** Aggregate over the wheel's full lifetime (the reference's `landmark()`,
    * `lib.rs:696-711`). */
  def landmark: RangeAgg = range(startSec, endSec)

  /** Per-interval aggregates within [s, e) — the reference's
    * `group_by(WheelRange, Duration)` (`lib.rs:396-467`) generalized to
    * unaligned edges. Returns (slotStartSec, agg) for each interval slot with
    * count > 0, ascending — identical to SQL
    * `GROUP BY date_trunc(unit, ts) ... WHERE ts in range`. */
  def groupBy(s: Long, e: Long, levelIdx: Int): IndexedSeq[(Long, RangeAgg)] = {
    val span = Spans(levelIdx)
    val lo = math.max(s, startSec)
    val hi = math.min(e, endSec)
    if (lo >= hi) return Vector.empty
    val out = Vector.newBuilder[(Long, RangeAgg)]
    var gs = alignDown(lo, span)
    while (gs < hi) {
      val a = range(math.max(gs, lo), math.min(gs + span, hi))
      if (a.count > 0) out += ((gs, a))
      gs += span
    }
    out.result()
  }

  /** Calendar group-by at month granularity multiples (1 = month,
    * 3 = quarter, 12 = year), UTC boundaries. Buckets are non-uniform spans
    * composed exactly from the underlying slots; identical to SQL
    * `GROUP BY date_trunc(unit, ts)` under an UTC session. */
  def groupByCalendar(s: Long, e: Long, monthStride: Int): IndexedSeq[(Long, RangeAgg)] = {
    import java.time.{Instant, LocalDate, ZoneOffset}
    val lo = math.max(s, startSec)
    val hi = math.min(e, endSec)
    if (lo >= hi) return Vector.empty
    def monthStart(sec: Long): LocalDate = {
      val d = Instant.ofEpochSecond(sec).atZone(ZoneOffset.UTC).toLocalDate
      val m0 = ((d.getMonthValue - 1) / monthStride) * monthStride + 1
      LocalDate.of(d.getYear, m0, 1)
    }
    def toSec(d: LocalDate): Long = d.atStartOfDay(ZoneOffset.UTC).toEpochSecond
    val out = Vector.newBuilder[(Long, RangeAgg)]
    var bucket = monthStart(lo)
    while (toSec(bucket) < hi) {
      val bs = toSec(bucket)
      val be = toSec(bucket.plusMonths(monthStride.toLong))
      val a = range(math.max(bs, lo), math.min(be, hi))
      if (a.count > 0) out += ((bs, a))
      bucket = bucket.plusMonths(monthStride.toLong)
    }
    out.result()
  }

  /** Approximate retained-index footprint in bytes (reference:
    * `index_usage_bytes`, `lib.rs:143-151`). */
  def sizeBytes: Long = {
    val secArrays = numSecs.toLong * (8 + 8 + 8 + 8) + (numSecs + 1).toLong * 16
    val lvlArrays = levels.drop(1).map(l => l.mins.length.toLong * 16).sum
    secArrays + lvlArrays
  }
}
