package graft

/** S2 period vocabulary (reference fetch_and_store.py:223-231): day,
  * calendar-month/year, ytd, and max slices against a daily fixture
  * starting 2020-01-01.
  */
class PeriodSliceSpec extends SparkSpec {

  // 800 consecutive days: 2020-01-01 .. 2022-03-10
  private lazy val daily = bars("AA", Seq.tabulate(800)(i => 10.0 + (i % 5)))

  private def n(asOf: String, period: String): Long =
    Tables.periodSlice(daily, asOf, period).count()

  test("'<n>d' is day arithmetic (exclusive lower bound)") {
    assert(n("2020-03-01", "5d") == 5) // Feb 26 .. Mar 1
  }

  test("'<n>mo' is calendar arithmetic with end-of-month clamping") {
    // add_months(2020-03-31, -1) = 2020-02-29 → March 1..31
    assert(n("2020-03-31", "1mo") == 31)
    // 6mo back from 2020-07-01 → Jan 2 .. Jul 1
    assert(n("2020-07-01", "6mo") == 182)
  }

  test("'<n>y' spans whole calendar years") {
    // lower 2020-01-01 exclusive → Jan 2 2020 .. Jan 1 2021 in a leap year
    assert(n("2021-01-01", "1y") == 366)
  }

  test("'ytd' slices from Jan 1 of the as-of year") {
    assert(n("2020-06-15", "ytd") == 167) // Jan 1 .. Jun 15, leap year
  }

  test("'max' keeps all history up to the as-of date") {
    assert(n("2099-01-01", "max") == 800)
    assert(n("2020-01-10", "max") == 10)
  }

  test("unknown periods fail fast") {
    val e = intercept[IllegalArgumentException](n("2020-01-01", "fortnight"))
    assert(e.getMessage.contains("Unsupported period"))
  }

  test("integer-day overload agrees with the '<n>d' string form") {
    assert(Tables.periodSlice(daily, "2020-03-01", 5).count() == n("2020-03-01", "5d"))
  }
}
