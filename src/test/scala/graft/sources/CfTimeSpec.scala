package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.NetcdfClassic.{NcAttr, NcVar, NC_CHAR, NC_DOUBLE}

/** CF time-units conversion against udunits/num2date ground truth —
  * the spellings below are the ones the checked-in field granules and
  * common archives actually use.
  */
class CfTimeSpec extends AnyFunSuite {

  private def conv(units: String): Double => Double =
    CfTime.fromUnits(units).getOrElse(fail(s"units not parsed: $units"))

  test("seconds since a date-time base (AVHRR/MUR spelling)") {
    // num2date(x, 'seconds since 1981-01-01 00:00:00'):
    // 1981-01-01 is epoch 347155200
    val f = conv("seconds since 1981-01-01 00:00:00")
    assert(f(0) === 347155200.0)
    assert(f(1114905600.0) === 1462060800.0) // the AVHRR fixture epoch
  }

  test("hours since a base (CCMP spelling)") {
    // CCMP: 'hours since 1987-01-01 00:00:00' = epoch 536457600
    val f = conv("hours since 1987-01-01 00:00:0.0")
    assert(f(0) === 536457600.0)
    assert(f(254208.0) === 1451606400.0) // the CCMP fixture epoch
  }

  test("days since a bare date, fractional values") {
    val f = conv("days since 1990-01-01")
    assert(f(0) === 631152000.0)
    assert(f(0.5) === 631152000.0 + 43200.0)
  }

  test("milliseconds and minutes variants") {
    assert(conv("milliseconds since 1970-01-01")(1500.0) === 1.5)
    assert(conv("minutes since 1970-01-01 00:00")(90.0) === 5400.0)
  }

  test("zone spellings: Z, UTC, +0:00, explicit offsets") {
    assert(conv("seconds since 1970-01-01T00:00:00Z")(7.0) === 7.0)
    assert(conv("seconds since 1970-01-01 00:00:00 UTC")(7.0) === 7.0)
    assert(conv("seconds since 1970-01-01 00:00:00 0:00")(7.0) === 7.0)
    // a +02:00 base is two hours EARLIER in UTC
    assert(conv("seconds since 1970-01-01 00:00:00 +02:00")(0.0) === -7200.0)
    assert(conv("seconds since 1970-01-01 00:00:00 -0330")(0.0) === 12600.0)
  }

  test("fractional-second bases parse") {
    val f = conv("seconds since 2015-03-31 00:00:00.0")
    assert(f(0) === 1427760000.0)
  }

  test("non-CF units fall through to the start-day base") {
    assert(CfTime.fromUnits("UTC seconds of day").isEmpty) // SMAP spelling
    assert(CfTime.fromUnits("").isEmpty)
    val tv = NcVar("row_time", Seq("d0"), NC_DOUBLE,
      Seq(NcAttr("units", NC_CHAR, text = "UTC seconds of day")),
      Array(60162.0))
    val c = CfTime.converter(Some(tv), startDayEpoch = Some(1427760000L))
    assert(c(60162.0) === 1427820162L) // the SMAP fixture pin
    // an unconvertible units attribute with NO escape hatch fails
    // LOUDLY — raw day counts stored as epoch seconds would corrupt
    // every ingested time silently (reference: num2date raises)
    val e = intercept[RuntimeException](CfTime.converter(Some(tv), None))
    assert(e.getMessage.contains("not convertible"))
    // only a time variable with no units attribute passes through raw
    val bare = tv.copy(attrs = Nil)
    assert(CfTime.converter(Some(bare), None)(60162.0) === 60162L)
  }

  test("unpadded udunits date components parse (2000-1-1)") {
    val f = conv("days since 2000-1-1")
    assert(f(0) === 946684800.0)
    assert(conv("seconds since 1981-1-1 0:0:0")(0.0) === 347155200.0)
    // STRICT resolution: an impossible date must FAIL the parse, not
    // smart-adjust to Feb 29 and shift every timestamp by days
    assert(CfTime.fromUnits("days since 2000-2-31").isEmpty)
    assert(CfTime.fromUnits("days since 2000-13-01").isEmpty)
  }

  test("day-of-year attribute pattern (SMAP REV_START_TIME)") {
    assert(CfTime.dayStart("2015-090T16:31:44.000",
      "yyyy-DDD'T'HH:mm:ss.SSS") === Some(1427760000L)) // 2015-03-31T00:00Z
    assert(CfTime.dayStart("garbage", "yyyy-DDD'T'HH:mm:ss.SSS").isEmpty)
    // month-day pattern resolves through the calendar field path
    assert(CfTime.dayStart("2016-05-01 12:00:00",
      "yyyy-MM-dd HH:mm:ss") === Some(1462060800L))
  }

  private def conv(units: String, cal: String): Double => Double =
    CfTime.fromUnits(units, Some(cal))
      .getOrElse(fail(s"units not parsed: $units [$cal]"))

  test("360_day calendar: 30-day months, hand-computed epochs") {
    // 1970-01-01..2000-01-01 in 360_day = 30*360 = 10800 days
    val f = conv("days since 2000-01-01", "360_day")
    assert(f(0) === 10800.0 * 86400)            // 933120000
    assert(f(30) === 10800.0 * 86400 + 2592000) // +1 month = exactly 30 d
    assert(f(360) === 10800.0 * 86400 + 360.0 * 86400) // +1 year
    // Feb 30 EXISTS in 360_day (every month has 30 days)
    val g = conv("days since 2000-2-30", "360_day")
    assert(g(0) === (10800.0 + 30 + 29) * 86400)
    // ... but Feb 31 does not
    assert(CfTime.fromUnits("days since 2000-2-31", Some("360_day")).isEmpty)
  }

  test("noleap/365_day calendar: no Feb 29, ever") {
    // 30 years x 365 = 10950 days (real gregorian has 7 leap days more)
    val f = conv("days since 2000-01-01", "noleap")
    assert(f(0) === 10950.0 * 86400) // 946080000 = 946684800 - 7*86400
    assert(f(59) === (10950.0 + 59) * 86400) // Feb 28 -> Mar 1 next day
    assert(conv("days since 2000-01-01", "365_day")(0) === f(0))
    // Feb 29 is not a valid base in noleap — even in a leap-numbered year
    assert(CfTime.fromUnits("days since 2000-02-29", Some("noleap")).isEmpty)
    assert(conv("hours since 2000-3-1 12:00", "noleap")(0) ===
      (10950.0 + 59) * 86400 + 43200)
  }

  test("all_leap/366_day calendar: Feb 29 every year") {
    val f = conv("days since 2000-01-01", "all_leap")
    assert(f(0) === 10980.0 * 86400) // 30*366
    assert(conv("days since 1971-02-29", "366_day")(0) ===
      (366.0 + 31 + 28) * 86400)
  }

  test("standard calendar is the real mixed timeline before 1582") {
    // Julian 1582-10-04 is followed by Gregorian 1582-10-15: one
    // elapsed day. JDN(Julian 1582-10-04)=2299160, 1970-01-01=2440588.
    val f = conv("days since 1582-10-04", "standard")
    assert(f(0) === (2299160.0 - 2440588) * 86400)
    assert(f(1) ===
      java.time.LocalDate.of(1582, 10, 15).toEpochDay * 86400.0)
    // the ten dropped labels are not dates in the mixed calendar
    assert(CfTime.fromUnits("days since 1582-10-10", Some("standard")).isEmpty)
    // post-reform standard == proleptic (all real archives live here)
    assert(conv("days since 2000-1-1", "gregorian")(0) === 946684800.0)
    assert(conv("days since 2000-1-1", "proleptic_gregorian")(0) ===
      946684800.0)
    // Julian leap rule pre-reform: year 1500 HAS Feb 29 in the mixed
    // calendar (divisible by 4 — the century rule is Gregorian-only)
    assert(CfTime.fromUnits("days since 1500-02-29", Some("standard")).nonEmpty)
    assert(CfTime.fromUnits("days since 1500-02-29",
      Some("proleptic_gregorian")).isEmpty)
  }

  test("unsupported calendars fail loudly, never convert wrong") {
    val e = intercept[RuntimeException](
      CfTime.fromUnits("days since 2000-01-01", Some("julian")))
    assert(e.getMessage.contains("unsupported CF calendar 'julian'"))
    intercept[RuntimeException](
      CfTime.fromUnits("days since 2000-01-01", Some("lunar")))
    // case-insensitive: NOLEAP is noleap
    assert(conv("days since 2000-01-01", "NOLEAP")(0) === 10950.0 * 86400)
  }

  test("non-CF units keep their start-day fallback whatever the calendar says") {
    // the calendar gate must fire only for axes we WOULD convert: a
    // unit outside the CF set falls through to start_day exactly like
    // the reference (num2date raises, start_day catches) even when the
    // calendar attribute is unsupported
    assert(CfTime.fromUnits("UTC seconds of day", Some("julian")).isEmpty)
    assert(CfTime.fromUnits("months since 2000-01-01", Some("julian")).isEmpty)
    val tv = NcVar("row_time", Seq("d0"), NC_DOUBLE,
      Seq(NcAttr("units", NC_CHAR, text = "UTC seconds of day"),
        NcAttr("calendar", NC_CHAR, text = "julian")),
      Array(60162.0))
    val c = CfTime.converter(Some(tv), startDayEpoch = Some(1427760000L))
    assert(c(60162.0) === 1427820162L)
    // but a recognized unit + unsupported calendar is loud even with a
    // fallback available: converting it with the WRONG arithmetic or
    // the day-base would both be silent corruption
    val bad = NcVar("time", Seq("t"), NC_DOUBLE,
      Seq(NcAttr("units", NC_CHAR, text = "days since 2000-01-01"),
        NcAttr("calendar", NC_CHAR, text = "julian")), Array(0.0))
    val e = intercept[RuntimeException](
      CfTime.converter(Some(bad), startDayEpoch = Some(0L)))
    assert(e.getMessage.contains("unsupported CF calendar"))
  }

  test("converter reads the variable's calendar attribute") {
    def tv(cal: String) = NcVar("time", Seq("t"), NC_DOUBLE,
      Seq(NcAttr("units", NC_CHAR, text = "days since 2000-01-01"),
        NcAttr("calendar", NC_CHAR, text = cal)), Array(0.0))
    assert(CfTime.converter(Some(tv("360_day")))(30.0) ===
      10800L * 86400 + 2592000)
    assert(CfTime.converter(Some(tv("standard")))(0.0) === 946684800L)
    val e = intercept[RuntimeException](CfTime.converter(Some(tv("julian"))))
    assert(e.getMessage.contains("unsupported CF calendar"))
  }

  test("calendar day-count properties: successive days differ by 86400") {
    // brute-force property over whole years, including leap/month/year
    // boundaries: for every supported calendar, day k+1's epoch is
    // exactly one day after day k's, and year lengths match the
    // calendar's rule. Catches any off-by-one in the month tables or
    // the mixed-calendar reform arithmetic.
    def daysInYear(cal: String, y: Int): Int = cal match {
      case "360_day" => 360
      case "noleap" => 365
      case "all_leap" => 366
      case "proleptic_gregorian" =>
        if ((y % 4 == 0 && y % 100 != 0) || y % 400 == 0) 366 else 365
      case _ => 0
    }
    def monthLen(cal: String, y: Int, m: Int): Int = cal match {
      case "360_day" => 30
      case "noleap" => Seq(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)(m - 1)
      case "all_leap" => Seq(31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)(m - 1)
      case "proleptic_gregorian" =>
        java.time.YearMonth.of(y, m).lengthOfMonth()
    }
    for (cal <- Seq("proleptic_gregorian", "360_day", "noleap", "all_leap");
         y <- Seq(1999, 2000, 2001, 2100)) {
      var prev = Option.empty[Double]
      var count = 0
      for (m <- 1 to 12; d <- 1 to monthLen(cal, y, m)) {
        val e = CfTime.fromUnits(s"days since $y-$m-$d", Some(cal))
          .getOrElse(fail(s"$cal $y-$m-$d did not parse"))(0.0)
        prev.foreach(p => assert(e - p === 86400.0, s"$cal $y-$m-$d"))
        prev = Some(e)
        count += 1
      }
      assert(count === daysInYear(cal, y), s"$cal $y")
    }
    // the mixed calendar crosses the 1582 reform with exactly one day
    // between Oct 4 (Julian) and Oct 15 (Gregorian), and its 1582 has
    // 355 day-labels
    val oct4 = conv("days since 1582-10-04", "standard")(0.0)
    val oct15 = conv("days since 1582-10-15", "standard")(0.0)
    assert(oct15 - oct4 === 86400.0)
    var labels = 0
    for (m <- 1 to 12; d <- 1 to 31) {
      if (CfTime.fromUnits(s"days since 1582-$m-$d", Some("standard")).nonEmpty)
        labels += 1
    }
    assert(labels === 355) // 365 minus the ten dropped labels
  }

  test("truncation matches the reference's long(total_seconds())") {
    val tv = NcVar("time", Seq("t"), NC_DOUBLE,
      Seq(NcAttr("units", NC_CHAR,
        text = "days since 1970-01-01")), Array(0.0))
    val c = CfTime.converter(Some(tv))
    assert(c(0.000011574) === 0L) // ~1 second and change truncates down
    assert(c(1.9999) === 172791L)
  }
}
