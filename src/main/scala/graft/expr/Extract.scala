package graft.expr

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst ports of the reference's predicate analysis
  * (`/root/reference/datafusion-uwheel/src/expr.rs`). */
object Canon {

  /** Canonical string form of a residual predicate, used as the wheel
    * registry key (reference keys wheels by stringified expr,
    * `lib.rs:310-320,782-787`). Qualifiers are stripped so `t.col` and `col`
    * match; conjuncts are sorted so order never matters; foldable
    * sub-expressions are evaluated so the analyzed build side
    * (`CAST(100 AS BIGINT)`) and the optimized query side (`100L`) agree. */
  def canonExpr(e: Expression): String =
    e.transformUp {
      case a: AttributeReference => a.withQualifier(Nil).withExprId(ExprId(0))
      case f if f.foldable && !f.isInstanceOf[Literal] && f.references.isEmpty =>
        scala.util.Try(Literal.create(f.eval(null), f.dataType)).getOrElse(f)
    }.sql

  def canonFilterKey(conjuncts: Seq[Expression]): String =
    joinParts(canonParts(conjuncts))

  /** Per-conjunct canonical forms — kept as a LIST so callers can merge
    * key parts from different predicate sites (the WHERE residual and an
    * aggregate's FILTER clause) before joining; joining first and
    * re-splitting on " AND " would corrupt conjuncts whose canonical SQL
    * contains that substring (nested boolean expressions). */
  def canonParts(conjuncts: Seq[Expression]): Seq[String] =
    conjuncts.map(canonExpr)

  def joinParts(parts: Seq[String]): String =
    parts.distinct.sorted.mkString(" AND ")

  /** Canonical key from an analyzed `df.filter(...)` — used at index-build
    * time so build-side and query-side keys agree. */
  def canonFilterKey(filtered: DataFrame): String = {
    val conds = filtered.queryExecution.analyzed.collect {
      case f: Filter => splitConjuncts(f.condition)
    }.flatten
    canonFilterKey(conds)
  }

  def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }
}

/** Extracted second-aligned time range (reference `WheelRange`,
  * `expr.rs:37-57`). `startSec`/`endSec` are epoch TICKS — seconds under
  * the default extraction tick, epoch MILLISECONDS when extracted for the
  * ms bottom-level wheels (`splitTimeRange`'s `tickUs`); None = unbounded
  * on that side. `exact` is false when a bound had to be rounded outward
  * (a sub-tick literal) — exact rewrites require `exact`; emptiness
  * pruning (R6/R7) only needs the conservative superset. */
final case class SecRange(startSec: Option[Long], endSec: Option[Long], exact: Boolean) {
  def isBounded: Boolean = startSec.isDefined || endSec.isDefined
}

/** A `col OP literal` comparison usable for min/max pruning (reference
  * `MinMaxPredicate`, `expr.rs:27-35`). */
final case class MinMaxPred(column: String, op: String, value: Double)

object Extract {
  private val MicrosPerSec = 1000000L
  private val MicrosPerDay = 86400L * MicrosPerSec

  private def litMicros(e: Expression): Option[Long] = e match {
    case Literal(v: Long, TimestampType) => Some(v)
    // NTZ literals carry wall-clock micros — the same scale the wheel is
    // built on for NTZ columns (build pins the epoch extraction to UTC)
    case Literal(v: Long, TimestampNTZType) => Some(v)
    // DATE literals are epoch days — timezone-free; the wheel stores a
    // DateType column at days × 86400 s (the reference's Date32 arm copies
    // day counts as ms, `lib.rs:1250-1258` — a unit bug we do not inherit)
    case Literal(d: Int, DateType) => Some(d.toLong * MicrosPerDay)
    case Cast(child, TimestampType, _, _) => litMicros(child)
    case _ => None
  }

  /** DATE literal value in micros, for the whole-day-exact comparison arms. */
  private def litDateMicros(e: Expression): Option[Long] = e match {
    case Literal(d: Int, DateType) => Some(d.toLong * MicrosPerDay)
    case _ => None
  }

  private def isDateAttr(e: Expression, timeCol: String): Boolean = e match {
    case a: AttributeReference => a.name == timeCol && a.dataType == DateType
    case _ => false
  }

  /** Does `e` denote the time column as a calendar DATE value, zone-free?
    * Accepts the bare DateType column and `to_date`/`CAST(… AS DATE)` of the
    * timestamp column — the cast truncates in its zone, so TimestampType
    * requires that zone to be UTC (wheel slots are epoch-aligned); NTZ is
    * wall-clock and exempt. */
  def isTimeAsDate(e: Expression, timeCol: String): Boolean = e match {
    case a: AttributeReference => a.name == timeCol && a.dataType == DateType
    case Cast(t, DateType, tzId, _) =>
      (t.dataType == TimestampNTZType || tzId.exists(isUtcZone)) && isTime(t, timeCol)
    case _ => false
  }

  /** How a session zone's calendar views compose with instant-keyed wheels;
    * resolved per zone id by the caller (the rule knows the indexed span). */
  sealed trait ZoneSpec
  /** The offset is CONSTANT across the indexed span (UTC, fixed-offset
    * zones, or region zones with no transition over span + margin): every
    * local calendar bound is the same constant shift of an instant. */
  final case class FixedZone(offsetSec: Long) extends ZoneSpec
  /** Rule-varying (DST) zone. Only DATE-PATH calendar views — `to_date`,
    * `year()`, `date_trunc` of day and coarser — compose: their value
    * depends on the LOCAL DATE alone, so each local boundary resolves to
    * one instant through the zone rules ([[Extract.boundaryInstantUs]]).
    * Sub-day truncations (minute/hour) keep each offset pass's own value
    * (`ZonedDateTime.truncatedTo` offset retention) and decline here. */
  final case class RuleZone(rules: java.time.zone.ZoneRules) extends ZoneSpec

  /** The instant (epoch micros) at which the local calendar reaches
    * `localUs` (a day-aligned local value, micros since local epoch):
    *  - unique local time → `localUs − offset`;
    *  - inside a spring-forward GAP → the transition instant (the calendar
    *    jumps over the boundary there — the instant set with local date ≥
    *    the boundary still starts exactly at the transition);
    *  - inside a fall-back OVERLAP → None (the local boundary occurs
    *    twice, so "local ≥ boundary" can be a non-contiguous instant set —
    *    decline rather than guess). */
  private[graft] def boundaryInstantUs(rules: java.time.zone.ZoneRules,
      localUs: Long): Option[Long] = {
    val sec = Math.floorDiv(localUs, MicrosPerSec)
    val subUs = localUs - sec * MicrosPerSec
    val ldt = java.time.LocalDateTime.ofEpochSecond(sec, subUs.toInt * 1000,
      java.time.ZoneOffset.UTC)
    val offs = rules.getValidOffsets(ldt)
    if (offs.size == 1) Some(localUs - offs.get(0).getTotalSeconds * MicrosPerSec)
    else if (offs.isEmpty) {
      val t = rules.getTransition(ldt)
      if (t == null) None
      else Some(t.getInstant.getEpochSecond * MicrosPerSec)
    } else None
  }

  /** The zone's offset (micros) at an instant (micros). */
  private[graft] def offsetAtUs(rules: java.time.zone.ZoneRules, us: Long): Long =
    rules.getOffset(java.time.Instant.ofEpochSecond(Math.floorDiv(us, MicrosPerSec)))
      .getTotalSeconds * MicrosPerSec

  /** The instant Spark's own local→instant resolution produces for a local
    * time (`ZonedDateTime.ofLocal`, which backs `date_trunc`'s coarse
    * units): unique → `local − offset`; inside a spring-forward GAP →
    * shifted forward by the gap length (`transition + (local − gapStart)`),
    * which DIFFERS from [[boundaryInstantUs]] whenever a gap strictly
    * straddles the unit start (e.g. America/Toronto 1919-03-31, gap
    * 23:30→00:30: the day's `date_trunc` VALUE is 05:00Z while its rows
    * begin at the 04:30Z transition); fall-back OVERLAP → None (the value
    * depends on which pass the row is in — no single bucket value). */
  private[graft] def valueInstantUs(rules: java.time.zone.ZoneRules,
      localUs: Long): Option[Long] = {
    val sec = Math.floorDiv(localUs, MicrosPerSec)
    val subUs = localUs - sec * MicrosPerSec
    val ldt = java.time.LocalDateTime.ofEpochSecond(sec, subUs.toInt * 1000,
      java.time.ZoneOffset.UTC)
    val offs = rules.getValidOffsets(ldt)
    if (offs.size == 1) Some(localUs - offs.get(0).getTotalSeconds * MicrosPerSec)
    else if (offs.isEmpty) {
      val t = rules.getTransition(ldt)
      if (t == null) None
      else {
        val gapStartLocalUs = t.getDateTimeBefore.toEpochSecond(
          java.time.ZoneOffset.UTC) * MicrosPerSec +
          t.getDateTimeBefore.getNano / 1000L
        Some(t.getInstant.getEpochSecond * MicrosPerSec +
          (localUs - gapStartLocalUs))
      }
    } else None
  }

  /** The instant a coarse `date_trunc(unit)` VALUE resolves to for a local
    * unit start, per Spark's own per-unit lowering: 'day' truncates the
    * ZonedDateTime (`ofLocal` — a straddling gap shifts the value PAST the
    * gap, offset-retained), while week/month/quarter/year go through
    * `daysToMicros`/`LocalDate.atStartOfDay` (a straddling gap resolves to
    * the gap END = the transition instant). Empirically split: Toronto
    * 1919-03-31 (gap 23:30→00:30) has day-value 05:00Z but week-value
    * 04:30Z. Overlapped local starts decline (None). */
  private[graft] def truncValueInstantUs(rules: java.time.zone.ZoneRules,
      unit: String, localUs: Long): Option[Long] =
    if (unit == "day") valueInstantUs(rules, localUs)
    else boundaryInstantUs(rules, localUs)

  private[graft] def isDayOrCoarser(unit: String): Boolean =
    unit == "day" || unit == "week" || unit == "month" ||
      unit == "quarter" || unit == "year"

  /** Total `ZonedDateTime.ofLocal` resolution of a local time: unique →
    * `local − offset`; fall-back overlap → the EARLIER valid offset
    * (`getValidOffsets` lists it first); spring-forward gap → shifted
    * forward by the gap length. Unlike [[valueInstantUs]] this never
    * declines — callers that must distinguish retention-dependent values
    * (day buckets whose midnight sits inside an overlap) must gate before
    * calling. */
  private[graft] def ofLocalInstantUs(rules: java.time.zone.ZoneRules,
      localUs: Long): Long = {
    val sec = Math.floorDiv(localUs, MicrosPerSec)
    val subUs = localUs - sec * MicrosPerSec
    val ldt = java.time.LocalDateTime.ofEpochSecond(sec, subUs.toInt * 1000,
      java.time.ZoneOffset.UTC)
    val offs = rules.getValidOffsets(ldt)
    if (offs.size >= 1) localUs - offs.get(0).getTotalSeconds * MicrosPerSec
    else {
      val t = rules.getTransition(ldt)
      val gapStartLocalUs = t.getDateTimeBefore.toEpochSecond(
        java.time.ZoneOffset.UTC) * MicrosPerSec + t.getDateTimeBefore.getNano / 1000L
      t.getInstant.getEpochSecond * MicrosPerSec + (localUs - gapStartLocalUs)
    }
  }

  /** Constant-offset pieces `(startUs, endUs, offsetUs)` covering the
    * instant window `[s, e)`, split at the zone's rule transitions. */
  private[graft] def constantOffsetPieces(rules: java.time.zone.ZoneRules,
      s: Long, e: Long): Seq[(Long, Long, Long)] = {
    val out = Vector.newBuilder[(Long, Long, Long)]
    var cur = s
    var guard = 0
    while (cur < e && guard < 1000) {
      val off = offsetAtUs(rules, cur)
      val next = Option(rules.nextTransition(
        java.time.Instant.ofEpochSecond(Math.floorDiv(cur, MicrosPerSec))))
        .map(_.getInstant.getEpochSecond * MicrosPerSec)
        .filter(t => t > cur && t < e)
        .getOrElse(e)
      out += ((cur, next, off))
      cur = next
      guard += 1
    }
    out.result()
  }

  /** Matching instant range of `date_trunc(unit ∈ {minute, hour}, ts) = v`
    * under a rule-varying (DST) zone — the round-7 verdict's fall-back
    * resolution. Catalyst truncates on the LOCAL clock and converts back
    * RETAINING the row's offset when it is still valid at the truncated
    * local time (`ZonedDateTime.truncatedTo`), else resolving like
    * `ofLocal` (earlier offset in overlaps, forward-shift in gaps). The
    * matching set is therefore assembled per constant-offset piece: rows
    * of a piece with offset `o` in local bucket `[b, b+u)` take value
    * `b − o` when `o` is valid at `b`, else `ofLocal(b)`. Returns the
    * union when it merges to ONE contiguous range (every whole-unit
    * transition does), the empty range `(0, 0)` when unsatisfiable, and
    * None when genuinely non-contiguous (stays residual — scan answers). */
  private[graft] def subDayTruncEqRangeUs(rules: java.time.zone.ZoneRules,
      unitUs: Long, v: Long): Option[(Long, Long)] = {
    val pieces = constantOffsetPieces(rules, v - MicrosPerDay, v + unitUs + MicrosPerDay)
    // candidate local buckets that could take value v: one per piece offset
    // (retained / earlier-offset resolutions have b = v + o), plus the
    // gap-shifted solution per spring-forward transition in the window
    val gapB = pieces.iterator.flatMap { case (ps, _, _) =>
      val t = rules.nextTransition(
        java.time.Instant.ofEpochSecond(Math.floorDiv(ps, MicrosPerSec) - 1))
      if (t != null && t.isGap) {
        val transUs = t.getInstant.getEpochSecond * MicrosPerSec
        val gapStartLocalUs = t.getDateTimeBefore.toEpochSecond(
          java.time.ZoneOffset.UTC) * MicrosPerSec
        val gapEndLocalUs = t.getDateTimeAfter.toEpochSecond(
          java.time.ZoneOffset.UTC) * MicrosPerSec
        val b = gapStartLocalUs + (v - transUs)
        if (b >= gapStartLocalUs && b < gapEndLocalUs) Some(b) else None
      } else None
    }.toSeq
    val candB = (pieces.map(_._3).distinct.map(o => v + o) ++ gapB)
      .filter(b => Math.floorMod(b, unitUs) == 0L).distinct
    def validOffsUs(b: Long): Seq[Long] = {
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(b, MicrosPerSec), ((b - Math.floorDiv(b, MicrosPerSec) *
          MicrosPerSec).toInt * 1000), java.time.ZoneOffset.UTC)
      import scala.jdk.CollectionConverters._
      rules.getValidOffsets(ldt).asScala.toSeq.map(_.getTotalSeconds * MicrosPerSec)
    }
    val hits = Vector.newBuilder[(Long, Long)]
    pieces.foreach { case (ps, pe, off) =>
      candB.foreach { b =>
        val valueHere =
          if (validOffsUs(b).contains(off)) b - off // retained
          else ofLocalInstantUs(rules, b)           // earlier / gap-shifted
        if (valueHere == v) {
          val lo = math.max(ps, b - off)
          val hi = math.min(pe, b + unitUs - off)
          if (lo < hi) hits += ((lo, hi))
        }
      }
    }
    val merged = hits.result().sortBy(_._1)
      .foldLeft(Vector.empty[(Long, Long)]) {
        case (acc :+ ((s0, e0)), (s1, e1)) if s1 <= e0 =>
          acc :+ ((s0, math.max(e0, e1)))
        case (acc, r) => acc :+ r
      }
    merged match {
      case Vector()  => Some((0L, 0L)) // unsatisfiable literal → empty range
      case Vector(r) => Some(r)
      case _         => None // non-contiguous: decline, the scan answers
    }
  }

  /** Canonical calendar unit of a `date_trunc`/`trunc` format string, or
    * None for unsupported (sub-second, millennium, …) units. */
  private[graft] def truncUnitOf(fmt: String): Option[String] = {
    import graft.wheel.HawWheel
    val u = fmt.toLowerCase
    HawWheel.levelIndexOf(u).map(Vector("second", "minute", "hour", "day", "week"))
      .orElse(HawWheel.monthStrideOf(u).map {
        case 1 => "month"
        case 3 => "quarter"
        case _ => "year"
      })
  }

  /** UTC truncation of an epoch-micros instant to a calendar unit. Week is
    * Monday-anchored (epoch day 0 is a Thursday) to match Spark and DuckDB;
    * month/quarter/year use proleptic-Gregorian calendar arithmetic. */
  private[graft] def truncUtcMicros(us: Long, unit: String): Long = unit match {
    case "second" => Math.floorDiv(us, MicrosPerSec) * MicrosPerSec
    case "minute" => Math.floorDiv(us, 60L * MicrosPerSec) * (60L * MicrosPerSec)
    case "hour"   => Math.floorDiv(us, 3600L * MicrosPerSec) * (3600L * MicrosPerSec)
    case "day"    => Math.floorDiv(us, MicrosPerDay) * MicrosPerDay
    case "week"   =>
      val anchor = -3L * MicrosPerDay // Monday 1969-12-29
      Math.floorDiv(us - anchor, 7L * MicrosPerDay) * (7L * MicrosPerDay) + anchor
    case _ =>
      val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(us, MicrosPerDay))
      val t = unit match {
        case "month"   => d.withDayOfMonth(1)
        case "quarter" => java.time.LocalDate.of(d.getYear, (d.getMonthValue - 1) / 3 * 3 + 1, 1)
        case _         => java.time.LocalDate.of(d.getYear, 1, 1)
      }
      t.toEpochDay * MicrosPerDay
  }

  /** The next unit boundary after an already-aligned instant. */
  private[graft] def nextBoundaryMicros(alignedUs: Long, unit: String): Long = unit match {
    case "second" => alignedUs + MicrosPerSec
    case "minute" => alignedUs + 60L * MicrosPerSec
    case "hour"   => alignedUs + 3600L * MicrosPerSec
    case "day"    => alignedUs + MicrosPerDay
    case "week"   => alignedUs + 7L * MicrosPerDay
    case _ =>
      val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(alignedUs, MicrosPerDay))
      val n = unit match {
        case "month"   => d.plusMonths(1)
        case "quarter" => d.plusMonths(3)
        case _         => d.plusYears(1)
      }
      n.toEpochDay * MicrosPerDay
  }

  /** Does `e` denote the indexed time column as an absolute (timezone-free)
    * instant? Accepts the bare TimestampType column, a timestamp→timestamp
    * cast of it, and the `timestamp_micros(col div 1000)` pattern produced by
    * [[graft.Tables]] for nanosecond-Long columns. Date/string casts are
    * rejected — their timestamp value depends on the session time zone.
    */
  def isUtcZone(tz: String): Boolean =
    scala.util.Try(java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC)
      .getOrElse(false)

  def isTime(e: Expression, timeCol: String): Boolean = e match {
    case a: AttributeReference =>
      a.name == timeCol &&
        (a.dataType == TimestampType || a.dataType == TimestampNTZType ||
          a.dataType == DateType)
    // An NTZ column coerced to TIMESTAMP shifts wall clock by the CAST's
    // zone; the wheel stores wall-clock (UTC-equivalent) seconds, so the
    // comparison only means what the wheel thinks it means when that zone
    // is UTC. (Found in review: day-aligned corpus data masked this.)
    case Cast(child, _: TimestampType, tzId, _)
        if child.dataType == TimestampNTZType =>
      tzId.exists(isUtcZone) && isTime(child, timeCol)
    // Same for DATE→TIMESTAMP promotion: the cast yields midnight in the
    // CAST's zone, while the wheel slot is midnight UTC (days × 86400).
    case Cast(child, _: TimestampType, tzId, _)
        if child.dataType == DateType =>
      tzId.exists(isUtcZone) && isTime(child, timeCol)
    case Cast(child, _: TimestampType, _, _) => isTime(child, timeCol)
    case m: MicrosToTimestamp => m.child match {
      case d: IntegralDivide =>
        (d.left match {
          case a: AttributeReference => a.name == timeCol && a.dataType == LongType
          case _ => false
        }) && d.right.foldable && d.right.eval() == 1000L
      case _ => false
    }
    case _ => false
  }

  /** Splits conjuncts into (time range, residual conjuncts).
    *
    * Mirrors `extract_filter_expr` (`expr.rs:146-167`) + the comparison
    * handling of `handle_comparison_operator` (`expr.rs:209-241`), except
    * that where the reference silently truncates sub-second bounds to wheel
    * granularity, we track exactness: `>= lit` / `< lit` on second-aligned
    * literals are exact; `>` / `<=` and unaligned literals round outward and
    * mark the range inexact (still a valid superset for pruning).
    *
    * `IsNotNull(timeCol)` conjuncts are consumed (implied by any time bound);
    * `IsNotNull(c)` implied by another null-intolerant residual conjunct on
    * `c` is dropped, since Spark's InferFiltersFromConstraints adds those
    * after the index was keyed on the user's original filter. */
  def splitTimeRange(conjuncts: Seq[Expression], timeCol: String,
      zoneSpec: String => Option[ZoneSpec] = _ => None,
      /** µs per output tick: 1e6 (default) yields epoch-second ranges; 1000
        * yields epoch-MILLISECOND ranges for the ms bottom-level wheels —
        * bounds are accumulated in µs regardless, only the final outward
        * rounding (and its exactness marking) changes. */
      tickUs: Long = MicrosPerSec): (SecRange, Seq[Expression]) = {
    var lo: Option[Long] = None // micros, inclusive
    var hi: Option[Long] = None // micros, exclusive
    var exact = true
    val residual = Vector.newBuilder[Expression]

    def mergeLo(us: Long): Unit = lo = Some(lo.fold(us)(math.max(_, us)))
    def mergeHi(us: Long): Unit = hi = Some(hi.fold(us)(math.min(_, us)))
    // rows with rawNs >= ns have derived µs >= floor(ns/1000) (exact iff aligned)
    def mergeLoNs(ns: Long): Unit = {
      if (ns % 1000 != 0) exact = false
      mergeLo(Math.floorDiv(ns, 1000))
    }
    // rows with rawNs < ns have derived µs < ceil(ns/1000) (exact iff aligned)
    def mergeHiNs(ns: Long): Unit = {
      if (ns % 1000 != 0) { exact = false; mergeHi(Math.floorDiv(ns - 1, 1000) + 1) }
      else mergeHi(ns / 1000)
    }

    def isNanosCol(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == timeCol && a.dataType == LongType
      case _ => false
    }
    object NsL { def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }}
    // normalized "rawNs >= ns" / "rawNs < ns" bounds from any orientation
    object NsGe { def unapply(e: Expression): Option[Long] = e match {
      case GreaterThanOrEqual(c, NsL(v)) if isNanosCol(c) => Some(v)
      case GreaterThan(c, NsL(v)) if isNanosCol(c) && v < Long.MaxValue => Some(v + 1)
      case LessThanOrEqual(NsL(v), c) if isNanosCol(c) => Some(v)
      case LessThan(NsL(v), c) if isNanosCol(c) && v < Long.MaxValue => Some(v + 1)
      case _ => None
    }}
    object NsLt { def unapply(e: Expression): Option[Long] = e match {
      case LessThan(c, NsL(v)) if isNanosCol(c) => Some(v)
      case LessThanOrEqual(c, NsL(v)) if isNanosCol(c) && v < Long.MaxValue => Some(v + 1)
      case GreaterThan(NsL(v), c) if isNanosCol(c) => Some(v)
      case GreaterThanOrEqual(NsL(v), c) if isNanosCol(c) && v < Long.MaxValue => Some(v + 1)
      case _ => None
    }}

    // Zone composition of a session-zone calendar view of the time column:
    // FixedZone(0) when the view is zone-free (NTZ wall clock, 'second'
    // truncation, bare DATE columns) or the zone is UTC; the caller's
    // ZoneSpec otherwise (FixedZone for constant-offset spans, RuleZone
    // for DST zones — accepted only by the DATE-PATH arms); None declines.
    def zoneOf(tzId: Option[String], zoneFree: Boolean): Option[ZoneSpec] =
      if (zoneFree) Some(FixedZone(0L))
      else tzId.flatMap(z =>
        if (isUtcZone(z)) Some(FixedZone(0L)) else zoneSpec(z))
    // A DAY-ALIGNED local calendar bound -> the instant where the local
    // calendar reaches it (constant shift, or rule-resolved for DST).
    def localBoundToInstant(zs: ZoneSpec, localUs: Long): Option[Long] = zs match {
      case FixedZone(o)    => Some(localUs - o * MicrosPerSec)
      case RuleZone(rules) => boundaryInstantUs(rules, localUs)
    }
    // year()'s / to_date()'s date-typed child: bare DATE columns are
    // zone-free; a session-zone TIMESTAMP→DATE cast composes per ZoneSpec
    def yearArmZone(t: Expression): Option[ZoneSpec] = t match {
      case a: AttributeReference if a.name == timeCol && a.dataType == DateType =>
        Some(FixedZone(0L))
      case Cast(inner, DateType, tzId, _) if isTime(inner, timeCol) =>
        zoneOf(tzId, inner.dataType == TimestampNTZType)
      case _ => None
    }

    // `time = literal` equality family → a half-open micros range. The
    // reference has no equality arm at all (`expr.rs:209-241` handles only
    // >,>=,<,<=); these are the patterns real dashboards emit ("this exact
    // day/month/year"). Truncated-time equalities are exact unit ranges when
    // the literal is unit-aligned and UNSATISFIABLE otherwise — the latter
    // collapses to the empty range [0, 0), which downstream merging
    // (max-lo / min-hi) can never widen back open.
    def eqRangeUs(x: Expression, l: Expression): Option[(Long, Long)] = x match {
      // dateCol = DATE 'd' / to_date(ts) = DATE 'd' (zone-free/UTC forms):
      // the whole day, exact
      case _ if isTimeAsDate(x, timeCol) && litDateMicros(l).isDefined =>
        val d = litDateMicros(l).get
        Some((d, d + MicrosPerDay))
      // to_date(ts) = DATE 'd': the LOCAL day as an instant range —
      // constant shift under a fixed offset, rule-resolved boundaries
      // under DST (to_date depends only on the local date, so both local
      // midnights resolve through localBoundToInstant; an ambiguous
      // midnight declines)
      case Cast(t, DateType, tzId, _)
          if isTime(t, timeCol) && litDateMicros(l).isDefined =>
        for {
          zs <- zoneOf(tzId, t.dataType == TimestampNTZType)
          d = litDateMicros(l).get
          lo <- localBoundToInstant(zs, d)
          hi <- localBoundToInstant(zs, d + MicrosPerDay)
        } yield (lo, hi)
      // date_trunc(unit, ts) = TIMESTAMP 't': unit range when the literal
      // is a truncation fixed point. Coarse units truncate in the
      // expression's zone (NTZ: wall clock) — alignment is tested on the
      // LOCAL value and the range shifts back. Under DST, day-and-coarser
      // units compose via the date path: the bucket's value is the
      // instant at which the local calendar reaches the unit start (the
      // spring-forward day's value is the gap-shifted transition instant,
      // which localBoundToInstant reproduces), so `v` matches exactly
      // when it IS that instant, and the qualifying rows are the instants
      // between the two boundary resolutions. Sub-day units decline under
      // DST (offset-retaining values). A non-fixed-point literal is
      // UNSATISFIABLE → the empty range.
      case TruncTimestamp(Literal(fmt: UTF8String, StringType), t, tzId)
          if isTime(t, timeCol) =>
        for {
          unit <- truncUnitOf(fmt.toString)
          zs <- zoneOf(tzId, unit == "second" || t.dataType == TimestampNTZType)
          v <- litMicros(l)
          r <- zs match {
            case FixedZone(oSec) =>
              val o = oSec * MicrosPerSec
              val vL = v + o
              Some(
                if (truncUtcMicros(vL, unit) == vL) (v, nextBoundaryMicros(vL, unit) - o)
                else (0L, 0L))
            case RuleZone(rules) if isDayOrCoarser(unit) =>
              // the bucket's VALUE follows Spark's ofLocal resolution
              // (gap-shifted past a straddling gap), while its ROW RANGE
              // begins where the local calendar reaches the unit start —
              // the transition instant. The two differ whenever a gap
              // strictly straddles the unit start (review finding,
              // America/Toronto 1919-03-31), so they are computed
              // separately: a literal that is not the value is
              // unsatisfiable; a matching literal's rows span the full
              // boundary-to-boundary instant range.
              val a = truncUtcMicros(v + offsetAtUs(rules, v), unit)
              truncValueInstantUs(rules, unit, a).flatMap { value =>
                if (value != v) Some((0L, 0L))
                else for {
                  start <- boundaryInstantUs(rules, a)
                  end <- boundaryInstantUs(rules, nextBoundaryMicros(a, unit))
                } yield (start, end)
              }
            // sub-day truncation under DST (minute/hour — second composes
            // as fixed): offset-retaining values, resolved per
            // constant-offset piece incl. fall-back overlaps (round-7
            // verdict; previously declined as ambiguous)
            case RuleZone(rules) if unit == "minute" || unit == "hour" =>
              val unitUs = if (unit == "minute") 60L * MicrosPerSec
                           else 3600L * MicrosPerSec
              subDayTruncEqRangeUs(rules, unitUs, v)
            case _ => None
          }
        } yield r
      // trunc(dateCol, unit) = DATE 'd': DATE in, DATE out, zone-free
      // (TruncDate never consults the session zone). Spark's trunc() yields
      // NULL for units finer than week, so those stay residual.
      case TruncDate(t, Literal(fmt: UTF8String, StringType))
          if isDateAttr(t, timeCol) =>
        for {
          unit <- truncUnitOf(fmt.toString)
          if unit == "week" || unit == "month" || unit == "quarter" || unit == "year"
          d <- litDateMicros(l)
        } yield
          if (truncUtcMicros(d, unit) == d) (d, nextBoundaryMicros(d, unit))
          else (0L, 0L)
      // year(ts) = N: the calendar year as a range (month/day-of-year
      // equalities are recurring, not contiguous, so only year extracts);
      // the year is read off the LOCAL date, so the two local New Year
      // midnights resolve through the ZoneSpec like the other date-path
      // views (rule-resolved under DST)
      case Year(t) =>
        for {
          zs <- yearArmZone(t)
          r <- l match {
            case Literal(y: Int, IntegerType) if y >= 1 && y <= 9998 =>
              val loL = java.time.LocalDate.of(y, 1, 1).toEpochDay * MicrosPerDay
              val hiL = java.time.LocalDate.of(y + 1, 1, 1).toEpochDay * MicrosPerDay
              for {
                lo <- localBoundToInstant(zs, loL)
                hi <- localBoundToInstant(zs, hiL)
              } yield (lo, hi)
            case _ => None
          }
        } yield r
      // ts = TIMESTAMP 't': a single microsecond — the final
      // seconds-rounding marks it inexact (a one-second superset), which
      // still powers R6/R7 pruning
      case _ if isTime(x, timeCol) && litMicros(l).isDefined =>
        val v = litMicros(l).get
        Some((v, v + 1))
      case _ => None
    }
    object TimeEq {
      def unapply(e: Expression): Option[(Long, Long)] = e match {
        // <=> with a non-null literal matches exactly the = rows
        case EqualTo(a, b)       => eqRangeUs(a, b).orElse(eqRangeUs(b, a))
        case EqualNullSafe(a, b) => eqRangeUs(a, b).orElse(eqRangeUs(b, a))
        case _ => None
      }
    }

    // Comparisons on CALENDAR-VALUED views of the time column —
    // `date_trunc(u, ts) OP lit`, `trunc(dateCol, u) OP lit`,
    // `to_date(ts) OP lit`, `year(ts) OP n` — are all EXACT for every
    // operator, because the view only takes unit-start values: with
    // a = trunc(lit) and next = the boundary after a,
    //   view >= lit ⇔ ts >= (lit aligned ? lit : next)   [ceilInstant]
    //   view >  lit ⇔ ts >= next                          [nextInstant]
    //   view <  lit ⇔ ts <  (lit aligned ? lit : next)   [ceilInstant]
    //   view <= lit ⇔ ts <  next                          [nextInstant]
    // Bound arithmetic runs on the LOCAL calendar value; `toInstant`
    // resolves the final local bound to an instant — a constant shift
    // under FixedZone, rule-resolved per bound under DST (date-path units
    // only; an ambiguous boundary declines the arm, leaving the conjunct
    // residual). For instant-valued views (date_trunc of a TIMESTAMP) the
    // alignment test compares resolved instants, so a DST gap day's
    // shifted value still counts as aligned.
    final case class CalView(unit: String, litLocalUs: Long,
        toInstant: Long => Option[Long], toValue: Long => Option[Long],
        litInstant: Option[Long])
    def calBounds(x: Expression, l: Expression): Option[CalView] = x match {
      case TruncTimestamp(Literal(fmt: UTF8String, StringType), t, tzId)
          if isTime(t, timeCol) =>
        for {
          unit <- truncUnitOf(fmt.toString)
          zs <- zoneOf(tzId, unit == "second" || t.dataType == TimestampNTZType)
          v <- litMicros(l) // an instant
          cv <- zs match {
            case FixedZone(oSec) =>
              val o = oSec * MicrosPerSec
              Some(CalView(unit, v + o, b => Some(b - o), b => Some(b - o), Some(v)))
            case RuleZone(rules) if isDayOrCoarser(unit) =>
              // bounds resolve to the boundary (transition) instant; the
              // bucket VALUE follows Spark's ofLocal resolution — they
              // differ under a gap straddling the unit start
              Some(CalView(unit, v + offsetAtUs(rules, v),
                b => boundaryInstantUs(rules, b),
                b => truncValueInstantUs(rules, unit, b), Some(v)))
            case _ => None
          }
        } yield cv
      case TruncDate(t, Literal(fmt: UTF8String, StringType))
          if isDateAttr(t, timeCol) =>
        for {
          unit <- truncUnitOf(fmt.toString)
          if unit == "week" || unit == "month" || unit == "quarter" || unit == "year"
          d <- litDateMicros(l)
        } yield CalView(unit, d, b => Some(b), b => Some(b), None)
      case Cast(t, DateType, tzId, _) if isTime(t, timeCol) =>
        for {
          zs <- zoneOf(tzId, t.dataType == TimestampNTZType)
          d <- litDateMicros(l) // a DATE literal IS a local calendar value
        } yield CalView("day", d, b => localBoundToInstant(zs, b),
          b => Some(b), None)
      case Year(t) =>
        for {
          zs <- yearArmZone(t)
          v <- l match {
            case Literal(y: Int, IntegerType) if y >= 1 && y <= 9998 =>
              Some(java.time.LocalDate.of(y, 1, 1).toEpochDay * MicrosPerDay)
            case _ => None
          }
        } yield CalView("year", v, b => localBoundToInstant(zs, b),
          b => Some(b), None)
      case _ => None
    }
    // view >= lit ⇔ ts >= rows-start of the FIRST bucket whose VALUE >= lit
    // (bucket values are strictly increasing in bucket order, each lying
    // inside its own boundary-to-boundary instant span, so the qualifying
    // buckets form a suffix). For an instant-valued view this is a genuine
    // comparison, not an alignment test: under a gap straddling the unit
    // start, the bucket lit's local falls in can have a VALUE exceeding an
    // unaligned literal (review finding, America/Toronto 1919-03-31) — the
    // old aligned/unaligned dichotomy would skip that bucket. An
    // unresolvable (ambiguous-overlap) value declines the arm.
    def ceilInstant(cv: CalView): Option[Long] = {
      val a = truncUtcMicros(cv.litLocalUs, cv.unit)
      cv.litInstant match {
        case Some(vLit) =>
          cv.toValue(a).flatMap(va =>
            cv.toInstant(if (va >= vLit) a else nextBoundaryMicros(a, cv.unit)))
        case None => // local-valued literal: value(a) == a <= lit always
          cv.toInstant(if (a == cv.litLocalUs) a else nextBoundaryMicros(a, cv.unit))
      }
    }
    // view > lit ⇔ ts >= rows-start of the FIRST bucket whose VALUE > lit
    def nextInstant(cv: CalView): Option[Long] = {
      val a = truncUtcMicros(cv.litLocalUs, cv.unit)
      cv.litInstant match {
        case Some(vLit) =>
          cv.toValue(a).flatMap(va =>
            cv.toInstant(if (va > vLit) a else nextBoundaryMicros(a, cv.unit)))
        case None => cv.toInstant(nextBoundaryMicros(a, cv.unit))
      }
    }
    object CalCmp {
      /** Left(lo) / Right(hi) contribution in micros; literal-first
        * orientations flip the operator. */
      def unapply(e: Expression): Option[scala.Either[Long, Long]] = e match {
        case GreaterThanOrEqual(a, b) =>
          calBounds(a, b).flatMap(cv => ceilInstant(cv).map(scala.Left(_)))
            .orElse(calBounds(b, a).flatMap(cv => nextInstant(cv).map(scala.Right(_))))
        case GreaterThan(a, b) =>
          calBounds(a, b).flatMap(cv => nextInstant(cv).map(scala.Left(_)))
            .orElse(calBounds(b, a).flatMap(cv => ceilInstant(cv).map(scala.Right(_))))
        case LessThan(a, b) =>
          calBounds(a, b).flatMap(cv => ceilInstant(cv).map(scala.Right(_)))
            .orElse(calBounds(b, a).flatMap(cv => nextInstant(cv).map(scala.Left(_))))
        case LessThanOrEqual(a, b) =>
          calBounds(a, b).flatMap(cv => nextInstant(cv).map(scala.Right(_)))
            .orElse(calBounds(b, a).flatMap(cv => ceilInstant(cv).map(scala.Left(_))))
        case _ => None
      }
    }

    conjuncts.foreach {
      case TimeEq((lo0, hi0)) =>
        mergeLo(lo0); mergeHi(hi0)
      case CalCmp(bound) =>
        bound.fold(mergeLo, mergeHi)
      // DATE-column vs DATE-literal comparisons first: day slots make every
      // operator exact (`d <= lit` ⇔ `d < lit + 1 day`, `d > lit` ⇔
      // `d >= lit + 1 day`), where the generic timestamp arms below must
      // round outward and drop exactness.
      case LessThanOrEqual(t, l) if isDateAttr(t, timeCol) && litDateMicros(l).isDefined =>
        mergeHi(litDateMicros(l).get + MicrosPerDay)
      case GreaterThanOrEqual(l, t) if isDateAttr(t, timeCol) && litDateMicros(l).isDefined =>
        mergeHi(litDateMicros(l).get + MicrosPerDay)
      case GreaterThan(t, l) if isDateAttr(t, timeCol) && litDateMicros(l).isDefined =>
        mergeLo(litDateMicros(l).get + MicrosPerDay)
      case LessThan(l, t) if isDateAttr(t, timeCol) && litDateMicros(l).isDefined =>
        mergeLo(litDateMicros(l).get + MicrosPerDay)
      case GreaterThanOrEqual(t, l) if isTime(t, timeCol) && litMicros(l).isDefined =>
        mergeLo(litMicros(l).get)
      case LessThanOrEqual(l, t) if isTime(t, timeCol) && litMicros(l).isDefined =>
        mergeLo(litMicros(l).get)
      case LessThan(t, l) if isTime(t, timeCol) && litMicros(l).isDefined =>
        mergeHi(litMicros(l).get)
      case GreaterThan(l, t) if isTime(t, timeCol) && litMicros(l).isDefined =>
        mergeHi(litMicros(l).get)
      // Strict / closed-upper operators are EXACT at µs granularity: every
      // time expression here evaluates to integral epoch MICROSECONDS
      // (Spark's timestamp precision), so `ts > a` ⇔ `ts >= a + 1µs` and
      // `ts <= b` ⇔ `ts < b + 1µs` over exactly the same row set. The
      // final tick rounding below still marks the RANGE inexact unless the
      // shifted bound lands tick-aligned — e.g. `ts > '…23:59:59.999999'`
      // is now the exact second-aligned range [next-second, ∞). (The +1
      // guard only degrades the pathological Long.MaxValue-µs literal to
      // the old outward-rounded superset.)
      case GreaterThan(t, l) if isTime(t, timeCol) && litMicros(l).isDefined =>
        val us = litMicros(l).get
        if (us < Long.MaxValue) mergeLo(us + 1) else { mergeLo(us); exact = false }
      case LessThan(l, t) if isTime(t, timeCol) && litMicros(l).isDefined =>
        val us = litMicros(l).get
        if (us < Long.MaxValue) mergeLo(us + 1) else { mergeLo(us); exact = false }
      case LessThanOrEqual(t, l) if isTime(t, timeCol) && litMicros(l).isDefined =>
        val us = litMicros(l).get
        if (us < Long.MaxValue) mergeHi(us + 1) else exact = false
      case GreaterThanOrEqual(l, t) if isTime(t, timeCol) && litMicros(l).isDefined =>
        val us = litMicros(l).get
        if (us < Long.MaxValue) mergeHi(us + 1) else exact = false
      case IsNotNull(a: AttributeReference) if a.name == timeCol =>
        () // the time column itself (incl. its raw underlying column in
           // derived-time tables) — implied by any time bound; harmless to
           // drop even without bounds (the wheel indexes non-null times)
      case IsNotNull(e) if isTime(e, timeCol) =>
        () // not-null on a DERIVED time expression — e.g. the window()
           // lowering's own isnotnull(ts) filter. The wheel only indexes
           // rows whose time value is non-null, so every arm already
           // answers over exactly the rows this conjunct retains.
      // Raw-nanosecond bounds on a Long time column (as injected by
      // NanosTimePushdown, or written directly by a user): `c >= L` in ns is
      // the µs bound L/1000 — exact when L is µs-aligned, else outward.
      case NsGe(ns) => mergeLoNs(ns)
      case NsLt(ns) => mergeHiNs(ns)
      case other => residual += other
    }

    // ticks (seconds by default, ms for the ms-wheel path), rounding
    // outward; track whether rounding changed anything
    val loSec = lo.map { us =>
      if (us % tickUs != 0) exact = false
      Math.floorDiv(us, tickUs)
    }
    val hiSec = hi.map { us =>
      if (us % tickUs != 0) { exact = false; Math.floorDiv(us, tickUs) + 1 }
      else Math.floorDiv(us, tickUs)
    }
    (SecRange(loSec, hiSec, exact), residual.result())
  }

  private def splitDisjuncts(e: Expression): Seq[Expression] = e match {
    case Or(l, r) => splitDisjuncts(l) ++ splitDisjuncts(r)
    case other    => Seq(other)
  }

  /** Intersection of two ranges; None when provably empty. A superset
    * (inexact) member with an empty intersection is still provably empty —
    * the true row set is a subset of the superset. */
  private def intersectRanges(a: SecRange, b: SecRange): Option[SecRange] = {
    val lo = (a.startSec.toSeq ++ b.startSec.toSeq).reduceOption(math.max(_: Long, _: Long))
    val hi = (a.endSec.toSeq ++ b.endSec.toSeq).reduceOption(math.min(_: Long, _: Long))
    (lo, hi) match {
      case (Some(l), Some(h)) if l >= h => None
      case _ => Some(SecRange(lo, hi, a.exact && b.exact))
    }
  }

  /** Sorts and merges overlapping/adjacent ranges into a disjoint ascending
    * cover of the same point set — required before treating per-range
    * aggregates as additive. Merging is a set union, so exactness survives
    * only when both members are exact. */
  private def normalizeRanges(rs: Seq[SecRange]): Seq[SecRange] = {
    if (rs.isEmpty) return Nil
    val sorted = rs.sortBy(_.startSec.getOrElse(Long.MinValue))
    val out = scala.collection.mutable.ArrayBuffer(sorted.head)
    sorted.tail.foreach { r =>
      val cur = out.last
      val touches = cur.endSec match {
        case None    => true // cur is right-unbounded: absorbs everything after
        case Some(h) => r.startSec.forall(_ <= h)
      }
      if (touches) {
        val hi = (cur.endSec, r.endSec) match {
          case (Some(a), Some(b)) => Some(math.max(a, b))
          case _ => None
        }
        out(out.length - 1) = SecRange(cur.startSec, hi, cur.exact && r.exact)
      } else out += r
    }
    out.toSeq
  }

  /** Multi-range extraction: [[splitTimeRange]] extended to consume ONE
    * pure-time disjunctive conjunct — an `OR` whose every disjunct is a
    * residual-free time range, or an `IN`/`InSet` over the time column —
    * into a UNION of ranges, intersected with the conjunctive bounds from
    * the remaining conjuncts and normalized to disjoint ascending order
    * (so per-range aggregates are additive). The reference extracts single
    * conjunctive ranges only (`expr.rs:146-167`); "this window OR that
    * window" and `day IN (…)` are everyday dashboard shapes.
    *
    * Returns (ranges, residual). An EMPTY ranges list is a proof of
    * emptiness (every disjunct contradicted the conjunctive bounds); a
    * lone unbounded range means no time constraint, as before. */
  def splitTimeRangeSet(conjuncts: Seq[Expression], timeCol: String,
      zoneSpec: String => Option[ZoneSpec] = _ => None,
      tickUs: Long = MicrosPerSec): (Seq[SecRange], Seq[Expression]) = {
    def rangeOfPureTime(conjs: Seq[Expression]): Option[SecRange] = {
      val (r, resid) = splitTimeRange(conjs, timeCol, zoneSpec, tickUs)
      if (resid.isEmpty && r.isBounded) Some(r) else None
    }
    def disjunctRanges(e: Expression): Option[Seq[SecRange]] = e match {
      case o: Or =>
        val rs = splitDisjuncts(o).map(d => rangeOfPureTime(Canon.splitConjuncts(d)))
        if (rs.forall(_.isDefined)) Some(rs.map(_.get)) else None
      case In(x, list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        val rs = list.map(l => rangeOfPureTime(Seq(EqualTo(x, l))))
        if (rs.forall(_.isDefined)) Some(rs.map(_.get)) else None
      // the optimizer turns long IN lists into InSet over internal values;
      // re-wrap each as a Literal of the child's type for the equality arm
      case InSet(x, hset) if hset.nonEmpty =>
        val rs = hset.toSeq.map(v => rangeOfPureTime(Seq(EqualTo(x, Literal(v, x.dataType)))))
        if (rs.forall(_.isDefined)) Some(rs.map(_.get)) else None
      case _ => None
    }
    var union: Option[Seq[SecRange]] = None
    val rest = Vector.newBuilder[Expression]
    conjuncts.foreach { c =>
      if (union.isEmpty) disjunctRanges(c) match {
        case some @ Some(_) => union = some
        case None           => rest += c
      } else rest += c
    }
    val (base, residual) = splitTimeRange(rest.result(), timeCol, zoneSpec, tickUs)
    union match {
      case None     => (Seq(base), residual)
      case Some(rs) => (normalizeRanges(rs.flatMap(intersectRanges(_, base))), residual)
    }
  }

  /** Drops IsNotNull(c) conjuncts implied by another null-intolerant conjunct
    * referencing c (see splitTimeRange doc). Returns the cleaned residual. */
  def dropImpliedNotNull(residual: Seq[Expression]): Seq[Expression] =
    residual.filterNot {
      case IsNotNull(a: AttributeReference) =>
        residual.exists {
          case IsNotNull(_) => false
          case other => other.references.contains(a) && nullIntolerant(other)
        }
      case _ => false
    }

  private def nullIntolerant(e: Expression): Boolean = e match {
    case _: BinaryComparison => true
    case _: In => true
    case InSet(_: AttributeReference, _) => true
    case _ => false
  }

  private def litDouble(e: Expression): Option[Double] = e match {
    case Literal(v, dt) if v != null => dt match {
      case DoubleType  => Some(v.asInstanceOf[Double])
      case FloatType   => Some(v.asInstanceOf[Float].toDouble)
      case IntegerType => Some(v.asInstanceOf[Int].toDouble)
      case LongType    => Some(v.asInstanceOf[Long].toDouble)
      case ShortType   => Some(v.asInstanceOf[Short].toDouble)
      case _: DecimalType => Some(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)
      case _ => None
    }
    case Cast(child, _: NumericType, _, _) => litDouble(child)
    case _ => None
  }

  private def colName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case Cast(child, _: NumericType, _, _) => colName(child)
    case _ => None
  }

  /** Extracts `col OP literal` comparisons for min/max pruning (reference
    * `extract_min_max_predicate`, `expr.rs:108-144`). Handles the literal on
    * either side (flipping the operator). */
  def minMaxPreds(conjuncts: Seq[Expression]): Seq[MinMaxPred] = {
    def opName(b: BinaryComparison): Option[String] = b match {
      case _: GreaterThan => Some(">")
      case _: GreaterThanOrEqual => Some(">=")
      case _: LessThan => Some("<")
      case _: LessThanOrEqual => Some("<=")
      case _ => None
    }
    def flip(op: String): String = op match {
      case ">" => "<"
      case ">=" => "<="
      case "<" => ">"
      case "<=" => ">="
    }
    conjuncts.flatMap {
      case b: BinaryComparison =>
        opName(b).flatMap { op =>
          (for (n <- colName(b.left); v <- litDouble(b.right)) yield MinMaxPred(n, op, v))
            .orElse(for (n <- colName(b.right); v <- litDouble(b.left)) yield MinMaxPred(n, flip(op), v))
        }
      case _ => None
    }
  }

  /** The reference's emptiness decision table (`is_empty_range`,
    * `lib.rs:807-814`): given the indexed min/max over the time range, can
    * `col OP v` match any row? */
  def provesEmpty(p: MinMaxPred, min: Double, max: Double): Boolean = p.op match {
    case ">"  => max <= p.value
    case ">=" => max < p.value
    case "<"  => min >= p.value
    case "<=" => min > p.value
    case _    => false
  }
}
