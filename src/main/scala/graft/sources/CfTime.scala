package graft.sources

import java.time.{LocalDate, LocalDateTime, LocalTime, ZoneOffset}
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField

import graft.sources.NetcdfClassic.NcVar

/** CF time-coordinate conversion: a time variable's raw numbers plus
  * its `units` attribute ("<unit> since <datetime>") become Unix epoch
  * seconds — the normalization the reference applies to every granule
  * time axis before tiling (`tilereadingprocessor.py:95-111`,
  * `num2date(value, units)` then seconds-since-1970, truncated to a
  * whole second). Files whose time axis is NOT CF-expressible (e.g.
  * "UTC seconds of day") fall back to a START-DAY base parsed from a
  * named global attribute — midnight of that date plus the raw value
  * in seconds — matching the reference's `GLBLATTR_DAY` escape hatch
  * (`tilereadingprocessor.py:38-39,99-101`).
  */
object CfTime {

  private val UnitsRe = """(?i)\s*(\w+)\s+since\s+(.+?)\s*""".r

  private val secondsPer: Map[String, Double] = Map(
    "second" -> 1.0, "seconds" -> 1.0, "sec" -> 1.0, "secs" -> 1.0, "s" -> 1.0,
    "millisecond" -> 1e-3, "milliseconds" -> 1e-3, "msec" -> 1e-3, "ms" -> 1e-3,
    "microsecond" -> 1e-6, "microseconds" -> 1e-6,
    "minute" -> 60.0, "minutes" -> 60.0, "min" -> 60.0, "mins" -> 60.0,
    "hour" -> 3600.0, "hours" -> 3600.0, "hr" -> 3600.0, "hrs" -> 3600.0,
    "h" -> 3600.0,
    "day" -> 86400.0, "days" -> 86400.0, "d" -> 86400.0,
    "week" -> 604800.0, "weeks" -> 604800.0)

  /** Epoch seconds of a CF base datetime. Accepts the spellings real
    * archives use: `1981-01-01`, `1981-01-01 00:00:00`,
    * `1990-01-01T00:00:00Z`, fractional seconds, and a trailing UTC
    * marker (`Z`, `UTC`, `+0:00`, `0:00`, `+00:00`). Non-UTC offsets
    * are honored numerically.
    */
  private val timeFmt = new DateTimeFormatterBuilder()
    // seconds (and fraction) optional: "00:00" and "0:0:0" occur
    .appendValue(ChronoField.HOUR_OF_DAY)
    .appendLiteral(':').appendValue(ChronoField.MINUTE_OF_HOUR)
    .optionalStart().appendLiteral(':')
    .appendValue(ChronoField.SECOND_OF_MINUTE)
    .optionalStart().appendFraction(
      ChronoField.NANO_OF_SECOND, 1, 9, true).optionalEnd()
    .optionalEnd()
    .toFormatter

  // udunits accepts unpadded components ("2000-1-1"); strict
  // ISO_LOCAL_DATE does not — appendValue without width parses 1+
  // digits per field, literals keep the fields apart. STRICT resolver:
  // the builder default (SMART) would quietly turn 2000-2-31 into
  // 2000-02-29 and shift every ingested timestamp by days — an invalid
  // base must fail the parse (and, via converter, fail loudly)
  private val dateFmt = new DateTimeFormatterBuilder()
    .appendValue(ChronoField.YEAR)
    .appendLiteral('-').appendValue(ChronoField.MONTH_OF_YEAR)
    .appendLiteral('-').appendValue(ChronoField.DAY_OF_MONTH)
    .toFormatter
    .withResolverStyle(java.time.format.ResolverStyle.STRICT)

  /** CF `calendar` attribute → days-from-Unix-origin function for a
    * base date (y, m, d), or None when the date is invalid IN THAT
    * calendar. Supported calendars are pure arithmetic — the same set
    * the reference honors through `num2date(value, units, calendar)`
    * (`callncra.py:24-25`, default "standard"):
    *
    *  - standard / gregorian: the REAL mixed timeline — Gregorian from
    *    1582-10-15, Julian through 1582-10-04, the ten labels between
    *    nonexistent. Results are elapsed real seconds since the Unix
    *    epoch, so post-1582 archives are identical to proleptic.
    *  - proleptic_gregorian: java.time arithmetic (STRICT resolver).
    *  - 360_day: twelve 30-day months, 360-day years.
    *  - noleap / 365_day: no Feb 29, ever; 365-day years.
    *  - all_leap / 366_day: Feb 29 every year; 366-day years.
    *
    * For the model calendars the "epoch" is seconds since 1970-01-01
    * OF THAT CALENDAR counted with that calendar's year length —
    * exactly `cftime.date2num(dt, "seconds since 1970-01-01",
    * calendar)` — which keeps every axis monotone and self-consistent.
    * `julian` (and anything unrecognized) has NO entry here; the
    * converter fails loudly rather than silently applying Gregorian
    * arithmetic to a Julian axis.
    */
  private val dateRe = """(-?\d{1,9})-(\d{1,2})-(\d{1,2})""".r

  private def gregorianDays(tok: String): Option[Long] =
    try Some(LocalDate.parse(tok, dateFmt).toEpochDay)
    catch { case _: Exception => None }

  // Julian-calendar date -> Julian Day Number (Fliegel-Van Flandern
  // style; public-domain astronomical algorithm). 1970-01-01 Gregorian
  // is JDN 2440588.
  private def julianCalDays(y0: Int, m0: Int, d: Int): Long = {
    val a = (14 - m0) / 12
    val y = y0 + 4800 - a
    val m = m0 + 12 * a - 3
    val jdn = d.toLong + (153L * m + 2) / 5 + 365L * y + y / 4 - 32083L
    jdn - 2440588L
  }

  private def mixedDays(tok: String): Option[Long] = tok match {
    case dateRe(ys, ms, ds) =>
      val (y, m, d) = (ys.toInt, ms.toInt, ds.toInt)
      // on/after the reform date the two calendars' labels agree with
      // proleptic-Gregorian; strictly before 1582-10-05 the label is
      // Julian; the ten dropped labels do not exist on the timeline.
      // key = y*10000+m*100+d is lexicographic-monotone (m*100+d<10000)
      val key = y.toLong * 10000 + m * 100 + d
      if (key >= 15821015L) gregorianDays(tok)
      else if (key <= 15821004L) {
        if (m >= 1 && m <= 12 && d >= 1 && d <= julianMonthLen(y, m))
          Some(julianCalDays(y, m, d))
        else None
      } else None
    // NO gregorianDays fallback for spellings dateRe rejects: the
    // variable-width parser would accept e.g. "1500-012-01" and apply
    // proleptic arithmetic to a pre-reform date — the silent-shift
    // class this module fails loudly on
    case _ => None
  }

  private def julianMonthLen(y: Int, m: Int): Int =
    if (m == 2) { if (y % 4 == 0) 29 else 28 } else monLen365(m - 1)

  private val monLen365 = Array(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
  private val cum365 = monLen365.scanLeft(0)(_ + _)
  private val monLen366 = monLen365.updated(1, 29)
  private val cum366 = monLen366.scanLeft(0)(_ + _)

  private def fixedYearDays(yearLen: Int, cum: Array[Int],
                            monLen: Array[Int])(tok: String): Option[Long] =
    tok match {
      case dateRe(ys, ms, ds) =>
        val (y, m, d) = (ys.toInt, ms.toInt, ds.toInt)
        if (m >= 1 && m <= 12 && d >= 1 && d <= monLen(m - 1))
          Some((y - 1970).toLong * yearLen + cum(m - 1) + (d - 1))
        else None
      case _ => None
    }

  private val calendarDays: Map[String, String => Option[Long]] = Map(
    "standard" -> mixedDays _,
    "gregorian" -> mixedDays _,
    "proleptic_gregorian" -> (gregorianDays _),
    "360_day" -> fixedYearDays(360, Array.tabulate(13)(_ * 30),
      Array.fill(12)(30)) _,
    "noleap" -> fixedYearDays(365, cum365, monLen365) _,
    "365_day" -> fixedYearDays(365, cum365, monLen365) _,
    "all_leap" -> fixedYearDays(366, cum366, monLen366) _,
    "366_day" -> fixedYearDays(366, cum366, monLen366) _)

  private[sources] def parseBase(s: String): Option[Double] =
    parseBase(s, gregorianDays)

  private[sources] def parseBase(
      s: String, dateToDays: String => Option[Long]): Option[Double] = {
    // only the ISO date-time separator 'T' (digit-T-digit) becomes a
    // space — a blanket replace would mangle a trailing "UTC" marker
    val t0 = s.trim.replaceAll("(?<=\\d)T(?=\\d)", " ")
    // a candidate parses ONLY as "<date> [<time>]" — extra tokens fail
    // it, so a trailing zone can never be silently ignored
    def attempt(t: String, offsetSec: Double): Option[Double] = {
      val parts = t.trim.split("\\s+").toList
      if (parts.isEmpty || parts.length > 2) None
      else try {
        val days = dateToDays(parts.head).getOrElse(return None)
        val time = parts.drop(1).headOption
          .map(LocalTime.parse(_, timeFmt)).getOrElse(LocalTime.MIDNIGHT)
        Some(days * 86400.0 + time.toSecondOfDay +
          time.getNano / 1e9 - offsetSec)
      } catch { case _: Exception => None }
    }
    // try the raw spelling FIRST: stripping eagerly would eat "-01"
    // off a bare "1990-01-01". Only when that fails, peel one trailing
    // zone token: Z / UTC / [+-]H[:MM] / H:MM / [+-]HHMM
    attempt(t0, 0.0).orElse {
      val zoneRe =
        """^(.*?)(?:\s+|(?<=\d))(Z|UTC|[+-]?\d{1,2}:\d{2}|[+-]\d{1,2}|[+-]\d{4})$""".r
      t0 match {
        case zoneRe(rest, z) =>
          val zz = z.toUpperCase
          val offsetSec =
            if (zz == "Z" || zz == "UTC") 0.0
            else {
              val sign = if (zz.startsWith("-")) -1 else 1
              val digits = zz.dropWhile(c => c == '+' || c == '-')
              val (hh, mm) =
                if (digits.contains(":")) {
                  val Array(a, b) = digits.split(":"); (a.toInt, b.toInt)
                } else if (digits.length == 4)
                  (digits.take(2).toInt, digits.drop(2).toInt)
                else (digits.toInt, 0)
              sign * (hh * 3600.0 + mm * 60.0)
            }
          attempt(rest, offsetSec)
        case _ => None
      }
    }
  }

  /** `units` attribute → raw-value-to-epoch-seconds function, when the
    * attribute is CF-parseable. `calendar` is the variable's CF
    * `calendar` attribute; absent means "standard" (the reference's
    * default, `callncra.py:24`). An unsupported calendar (e.g.
    * `julian`) THROWS rather than returning None: None routes the
    * caller to the start-day/raw fallbacks, which would silently
    * convert a Julian axis with the wrong arithmetic.
    */
  def fromUnits(units: String,
                calendar: Option[String] = None): Option[Double => Double] = {
    val cal = calendar.map(_.trim.toLowerCase).filter(_.nonEmpty)
      .getOrElse("standard")
    units match {
      case UnitsRe(unit, base) =>
        for {
          factor <- secondsPer.get(unit.toLowerCase)
          // the calendar gate fires only once the UNIT is recognized:
          // a non-CF unit string ("months since…", "UTC seconds of
          // day") must keep falling through to the start-day fallback
          // exactly as before — in the reference num2date raises there
          // and start_day catches it — whatever the calendar attribute
          // says. Only an axis we WOULD convert refuses loudly.
          dateToDays = calendarDays.getOrElse(cal,
            sys.error(s"unsupported CF calendar '$cal' — supported: " +
              calendarDays.keys.toSeq.sorted.mkString(", ") +
              "; refusing to convert this time axis with Gregorian " +
              "arithmetic"))
          epoch0 <- parseBase(base, dateToDays)
        } yield (v: Double) => epoch0 + v * factor
      case _ => None
    }
  }

  /** Midnight (UTC) of the date carried by a granule-level attribute
    * like `REV_START_TIME = "2015-090T16:31:44.000"` — the reference's
    * `GLBLATTR_DAY` (day-of-year spellings included via `pattern`, a
    * java DateTimeFormatter pattern such as `yyyy-DDD'T'HH:mm:ss.SSS`).
    */
  def dayStart(value: String, pattern: String): Option[Long] =
    try {
      val fmt = DateTimeFormatter.ofPattern(pattern)
      val parsed = fmt.parse(value.trim)
      val date =
        if (parsed.isSupported(ChronoField.DAY_OF_YEAR) &&
          !parsed.isSupported(ChronoField.MONTH_OF_YEAR))
          LocalDate.ofYearDay(parsed.get(ChronoField.YEAR),
            parsed.get(ChronoField.DAY_OF_YEAR))
        else LocalDate.from(parsed)
      Some(date.atStartOfDay.toEpochSecond(ZoneOffset.UTC))
    } catch { case _: Exception => None }

  /** The converter a decode path applies to every raw time value:
    * CF units when present and parseable; else start-day base plus
    * raw seconds. A units attribute that EXISTS but cannot be
    * converted and has no start-day escape hatch fails LOUDLY —
    * silently passing raw day counts through as epoch seconds would
    * corrupt every ingested time (this mirrors the reference, where
    * `num2date` raises and only `start_day` catches it,
    * `tilereadingprocessor.py:96-101`). Only a time variable with NO
    * units attribute passes through raw (synthetic/already-epoch
    * axes). The result truncates to whole seconds like the
    * reference's `long(total_seconds())`.
    */
  def converter(timeVar: Option[NcVar],
                startDayEpoch: Option[Long] = None): Double => Long = {
    val unitsText = timeVar.flatMap(_.attr("units"))
      .map(a => a.text).filter(_.nonEmpty)
    val calText = timeVar.flatMap(_.attr("calendar"))
      .map(_.text).filter(_.nonEmpty)
    unitsText.flatMap(fromUnits(_, calText)) match {
      case Some(f) => v => f(v).toLong
      case None => (startDayEpoch, unitsText) match {
        case (Some(day0), _) => v => day0 + v.toLong
        case (None, Some(u)) =>
          sys.error(s"time units '$u' are not convertible to epoch " +
            "seconds and no start-day attribute is configured — " +
            "refusing to pass raw values through as timestamps")
        case (None, None) => v => v.toLong
      }
    }
  }
}
