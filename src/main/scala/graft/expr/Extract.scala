package graft.expr

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.types._

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
    conjuncts.map(canonExpr).distinct.sorted.mkString(" AND ")

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
  * `expr.rs:37-57`). `startSec`/`endSec` are epoch seconds; None = unbounded
  * on that side. `exact` is false when a bound had to be rounded outward
  * (sub-second literal or `>`/`<=` operator) — exact rewrites require
  * `exact`; emptiness pruning (R6/R7) only needs the conservative superset. */
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
  def splitTimeRange(conjuncts: Seq[Expression], timeCol: String): (SecRange, Seq[Expression]) = {
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

    conjuncts.foreach {
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
      case GreaterThan(t, l) if isTime(t, timeCol) && litMicros(l).isDefined =>
        // ts > a: rows in (a, ∞) — not slot-exact; superset [a, ∞)
        mergeLo(litMicros(l).get); exact = false
      case LessThan(l, t) if isTime(t, timeCol) && litMicros(l).isDefined =>
        mergeLo(litMicros(l).get); exact = false
      case LessThanOrEqual(t, l) if isTime(t, timeCol) && litMicros(l).isDefined =>
        // ts <= b: superset [-∞, b + 1µs)
        mergeHi(litMicros(l).get + 1); exact = false
      case GreaterThanOrEqual(l, t) if isTime(t, timeCol) && litMicros(l).isDefined =>
        mergeHi(litMicros(l).get + 1); exact = false
      case IsNotNull(a: AttributeReference) if a.name == timeCol =>
        () // implied by any time bound; harmless to drop even without bounds
           // only when bounds exist — caller checks
      // Raw-nanosecond bounds on a Long time column (as injected by
      // NanosTimePushdown, or written directly by a user): `c >= L` in ns is
      // the µs bound L/1000 — exact when L is µs-aligned, else outward.
      case NsGe(ns) => mergeLoNs(ns)
      case NsLt(ns) => mergeHiNs(ns)
      case other => residual += other
    }

    // seconds, rounding outward; track whether rounding changed anything
    val loSec = lo.map { us =>
      if (us % MicrosPerSec != 0) exact = false
      Math.floorDiv(us, MicrosPerSec)
    }
    val hiSec = hi.map { us =>
      if (us % MicrosPerSec != 0) { exact = false; Math.floorDiv(us, MicrosPerSec) + 1 }
      else Math.floorDiv(us, MicrosPerSec)
    }
    (SecRange(loSec, hiSec, exact), residual.result())
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
