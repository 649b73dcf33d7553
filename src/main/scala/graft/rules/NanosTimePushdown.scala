package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.expr.Canon

/** Makes time predicates over nanosecond-Long columns pushable to parquet.
  *
  * `graft.Tables` surfaces parquet TIMESTAMP(NANOS) columns as
  * `timestamp_micros(col div 1000)`; a filter on that derived timestamp is an
  * opaque expression to the datasource, so the scan reads every row group.
  * This rule appends the *equivalent* comparison on the raw Long column
  * (`timestamp_micros(c div 1000) >= T  ⟺  c >= micros(T) * 1000`, exact
  * integer algebra for every comparison operator), which FileSourceStrategy
  * then pushes down to parquet min/max row-group pruning — the scan-path
  * complement of the wheel rule's plan-time pruning.
  *
  * Runs after [[UWheelRule]]: plans the wheel answered are already gone, and
  * [[graft.expr.Extract.splitTimeRange]] also recognizes the raw-nanos form,
  * so rewrites keep matching either way.
  */
object NanosTimePushdown extends Rule[LogicalPlan] {

  private val MaxSafeMicros = Long.MaxValue / 1000 - 1

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val conjs = Canon.splitConjuncts(cond)
      val implied = conjs.flatMap(impliedNanos)
        .filterNot(i => conjs.exists(_.semanticEquals(i)))
      if (implied.isEmpty) f
      else Filter((conjs ++ implied).reduce(And), child)
  }

  /** The raw Long column under `timestamp_micros(col div 1000)`. */
  private object DerivedTs {
    def unapply(e: Expression): Option[AttributeReference] = e match {
      case m: MicrosToTimestamp => m.child match {
        case d: IntegralDivide => d.left match {
          case a: AttributeReference
              if a.dataType == LongType && d.right.foldable && d.right.eval() == 1000L =>
            Some(a)
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }
  }

  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      // non-negative only: `div` truncates toward zero while the µs↔ns
      // algebra below assumes floor, so pre-1970 bounds would be (slightly)
      // stronger than the original predicate and could drop matching rows
      case Literal(v: Long, TimestampType) if v >= 0 && v < MaxSafeMicros => Some(v)
      case _ => None
    }
  }

  // For positive-epoch data, u = c div 1000 (floor). Each comparison on u has
  // an exact integer-equivalent on c:
  //   u >= L  ⟺  c >= L*1000          u <  L  ⟺  c < L*1000
  //   u >  L  ⟺  c >= (L+1)*1000      u <= L  ⟺  c < (L+1)*1000
  // `div` truncates toward zero, so for c in [-999, -1] u is 0, not -1:
  // a lower bound of c >= 0 would wrongly drop those rows when L == 0.
  // geBound therefore requires a strictly positive ns bound; ltBound is
  // sound for any L >= 0 (c < 0 <= L*1000 trivially satisfies it).
  private def impliedNanos(e: Expression): Option[Expression] = e match {
    case GreaterThanOrEqual(DerivedTs(a), TsLit(us)) => geBound(a, us * 1000)
    case GreaterThan(DerivedTs(a), TsLit(us))        => geBound(a, (us + 1) * 1000)
    case LessThan(DerivedTs(a), TsLit(us))           => Some(LessThan(a, lit(us * 1000)))
    case LessThanOrEqual(DerivedTs(a), TsLit(us))    => Some(LessThan(a, lit((us + 1) * 1000)))
    case GreaterThanOrEqual(TsLit(us), DerivedTs(a)) => Some(LessThan(a, lit((us + 1) * 1000)))
    case GreaterThan(TsLit(us), DerivedTs(a))        => Some(LessThan(a, lit(us * 1000)))
    case LessThan(TsLit(us), DerivedTs(a))           => geBound(a, (us + 1) * 1000)
    case LessThanOrEqual(TsLit(us), DerivedTs(a))    => geBound(a, us * 1000)
    case _ => None
  }

  private def geBound(a: Expression, ns: Long): Option[Expression] =
    if (ns >= 1000) Some(GreaterThanOrEqual(a, lit(ns))) else None

  private def lit(ns: Long): Literal = Literal(ns, LongType)
}
