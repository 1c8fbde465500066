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

  test("truncation matches the reference's long(total_seconds())") {
    val tv = NcVar("time", Seq("t"), NC_DOUBLE,
      Seq(NcAttr("units", NC_CHAR,
        text = "days since 1970-01-01")), Array(0.0))
    val c = CfTime.converter(Some(tv))
    assert(c(0.000011574) === 0L) // ~1 second and change truncates down
    assert(c(1.9999) === 172791L)
  }
}
