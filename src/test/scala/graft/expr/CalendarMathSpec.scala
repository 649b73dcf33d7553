package graft.expr

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the calendar arithmetic behind the equality /
  * inequality / multi-range rewrite arms: every exactness claim in
  * [[Extract.splitTimeRange]]'s calendar cases reduces to these three
  * invariants of `truncUtcMicros` / `nextBoundaryMicros`:
  *
  *  - floor: trunc(x) <= x < next(trunc(x))
  *  - idempotence: trunc(trunc(x)) == trunc(x)
  *  - boundary: next(a) is itself aligned and strictly after a
  *
  * plus the calendar anchors Spark and DuckDB agree on (Monday weeks,
  * month/quarter/year starting on day one, UTC). Instants range over
  * 1965–2100 — negative epochs included, where floorMod/floorDiv mistakes
  * would first show.
  */
class CalendarMathSpec extends AnyFunSuite {

  private val units =
    Seq("second", "minute", "hour", "day", "week", "month", "quarter", "year")
  private val MicrosPerDay = 86400L * 1000000L

  private val genUs: Gen[Long] =
    Gen.chooseNum(-150L * 365 * MicrosPerDay / 100, 130L * 365 * MicrosPerDay)
  private val genUnit: Gen[String] = Gen.oneOf(units)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  test("floor + idempotence + boundary invariants for every unit") {
    check(Prop.forAll(genUs, genUnit) { (us, u) =>
      val a = Extract.truncUtcMicros(us, u)
      val n = Extract.nextBoundaryMicros(a, u)
      a <= us && us < n &&
        Extract.truncUtcMicros(a, u) == a &&
        Extract.truncUtcMicros(n, u) == n &&
        n > a
    })
  }

  test("calendar anchors: Monday weeks, first-of-month/quarter/year starts") {
    check(Prop.forAll(genUs) { us =>
      val wk = Extract.truncUtcMicros(us, "week")
      val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(wk, MicrosPerDay))
      val mo = java.time.LocalDate.ofEpochDay(
        Math.floorDiv(Extract.truncUtcMicros(us, "month"), MicrosPerDay))
      val q = java.time.LocalDate.ofEpochDay(
        Math.floorDiv(Extract.truncUtcMicros(us, "quarter"), MicrosPerDay))
      val y = java.time.LocalDate.ofEpochDay(
        Math.floorDiv(Extract.truncUtcMicros(us, "year"), MicrosPerDay))
      wk % MicrosPerDay == 0 &&
        d.getDayOfWeek == java.time.DayOfWeek.MONDAY &&
        mo.getDayOfMonth == 1 &&
        q.getDayOfMonth == 1 && (q.getMonthValue - 1) % 3 == 0 &&
        y.getDayOfYear == 1
    })
  }

  test("unit aliases resolve like the wheel's own tables") {
    assert(Extract.truncUnitOf("DD") === Some("day"))
    assert(Extract.truncUnitOf("mon") === Some("month"))
    assert(Extract.truncUnitOf("YYYY") === Some("year"))
    assert(Extract.truncUnitOf("quarter") === Some("quarter"))
    assert(Extract.truncUnitOf("millisecond") === None)
    assert(Extract.truncUnitOf("millennium") === None)
  }
}
