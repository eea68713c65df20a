package graft.cdc

import java.time.{LocalDateTime, ZoneId, ZoneOffset}

/** Partial-segment datetime value — the engine's counterpart of the
  * reference's segment-bitmask DateTime (ref: formats/internal/record/
  * value/DateTime.java:36-52): a database temporal value is not always
  * a full date+time. MySQL TIME is time-only (and ranges past 24 h),
  * DATE is date-only, YEAR is a bare year, PostgreSQL `timestamptz`
  * carries an explicit zone, and Oracle can ship era-qualified (BC)
  * values. The `segments` bitmask records exactly which parts are
  * present, and rendering/parsing honor only those parts, so a
  * time-only value never invents a date and a date-only value never
  * invents midnight-as-data.
  *
  * Rendering mirrors the reference's `toJdbcString` (DateTime.java):
  * 4-padded year, 2-padded month/day/hour/minute/second, fractional
  * seconds as nanos with trailing zeros trimmed (min one digit), then
  * " zone" and " era" suffixes, with a leading '-' when the negative
  * flag is set. Parsing mirrors `parseJdbcDatetime`: era suffix first,
  * then a reverse scan for a zone suffix, then a digit-run sweep that
  * upscales a fractional run of n digits by 10^(9-n).
  */
final case class DtsDateTime(
    segments: Int,
    year: Int = 0, month: Int = 0, day: Int = 0,
    hour: Int = 0, minute: Int = 0, second: Int = 0, nanos: Int = 0,
    timeZone: String = null, commonEra: String = null) {
  import DtsDateTime._

  def isSet(seg: Int): Boolean = (segments & seg) != 0
  def isNegative: Boolean = isSet(SegNegative)

  /** JDBC-style rendering of the segments present. */
  def toJdbcString: String = render(segments)

  /** Render only the intersection of `segs` with what's set. */
  def render(segs: Int): String = {
    val eff = segs & segments
    val b = new java.lang.StringBuilder(32)
    def pad2(v: Int): Unit = {
      val a = math.abs(v)
      if (a < 10) b.append('0')
      b.append(a)
    }
    if ((eff & SegYear) != 0) {
      val a = math.abs(year)
      val s = a.toString
      if (a < 1000) b.append("0000".substring(0, 4 - s.length))
      b.append(s)
    }
    if ((eff & SegMonth) != 0) { b.append('-'); pad2(month) }
    if ((eff & SegDay) != 0) {
      if (b.length > 0) b.append('-')
      pad2(day)
    }
    if ((eff & SegHour) != 0) {
      if (b.length > 0) b.append(' ')
      pad2(hour)
    }
    if ((eff & SegMinute) != 0) { b.append(':'); pad2(minute) }
    if ((eff & SegSecond) != 0) { b.append(':'); pad2(second) }
    if ((eff & SegNanos) != 0) {
      val a = math.abs(nanos)
      var s = a.toString
      s = "000000000".substring(0, 9 - s.length) + s
      var trunc = 8
      while (trunc > 0 && s.charAt(trunc) == '0') trunc -= 1
      b.append('.').append(s, 0, trunc + 1)
    }
    if ((eff & SegTimezone) != 0 && timeZone != null)
      b.append(' ').append(timeZone)
    if ((eff & SegCommonEra) != 0 && commonEra != null)
      b.append(' ').append(commonEra)
    if ((eff & SegNegative) != 0) "-" + b.toString else b.toString
  }

  /** Epoch micros for date-carrying values; micros SINCE MIDNIGHT for
    * time-only values (which can exceed a day — MySQL TIME ranges to
    * ±838 h — and carry the negative flag). A zone-carrying value is
    * interpreted as wall time IN that zone and converted to the epoch
    * (the semantic the reference's toUnixTimestamp implements for the
    * zoned path; we use java.time instead of SimpleDateFormat, and we
    * do not replicate its extra rawOffset subtraction — that shifts a
    * correctly zone-parsed instant a second time). An era-qualified BC
    * value maps year y to ISO year 1−y (proleptic Gregorian). */
  def toMicros: Long = {
    if (!isSet(SegYear) && !isSet(SegMonth) && !isSet(SegDay)) {
      // time-only: duration from midnight; hours may exceed 23
      val us = math.abs(hour) * 3600000000L +
        math.abs(minute) * 60000000L + math.abs(second) * 1000000L +
        math.abs(nanos) / 1000L
      return if (isNegative) -us else us
    }
    val isoYear =
      if (isSet(SegCommonEra) && commonEra != null &&
        commonEra.trim.equalsIgnoreCase("BC")) 1 - math.abs(year)
      else math.abs(year)
    val ldt = LocalDateTime.of(
      isoYear, math.max(1, math.abs(month)), math.max(1, math.abs(day)),
      math.abs(hour), math.abs(minute), math.abs(second),
      math.abs(nanos))
    val zone: ZoneId =
      if (isSet(SegTimezone) && timeZone != null)
        ZoneId.of(normalizeZone(timeZone))
      else ZoneOffset.UTC
    val odt = ldt.atZone(zone)
    odt.toEpochSecond * 1000000L + odt.getNano / 1000L
  }
}

object DtsDateTime {
  // bit layout mirrors DateTime.java:36-47 exactly
  val SegNegative = 0x1
  val SegYear = 0x2
  val SegMonth = 0x4
  val SegDay = 0x8
  val SegHour = 0x10
  val SegMinute = 0x20
  val SegSecond = 0x40
  val SegNanos = 0x80
  val SegTimezone = 0x100
  val SegCommonEra = 0x200

  val SegTime: Int = SegHour | SegMinute | SegSecond
  val SegTimeNanos: Int = SegTime | SegNanos
  val SegDate: Int = SegYear | SegMonth | SegDay
  val SegDateTime: Int = SegDate | SegTime
  val SegDateTimeNanos: Int = SegDateTime | SegNanos
  val SegDateTimeNanosTz: Int = SegDateTimeNanos | SegTimezone

  private val EraNames = Set("AD", "ad", "bc", "BC")

  /** "GMT+0:00" → "GMT+00:00", "+0:00" → "+00:00" (the reference's
    * single-digit-hour normalizations), so ZoneId.of accepts the
    * offset spellings MySQL/PostgreSQL emit. */
  def normalizeZone(tz: String): String = {
    var z = tz.trim
    if (z.startsWith("GMT") && z.length == 8) z = "GMT+0" + z.substring(4)
    if (z.length == 5 && (z.charAt(0) == '+' || z.charAt(0) == '-'))
      z = z.charAt(0) + "0" + z.substring(1)
    z
  }

  /** Zone-suffix validity (ref DateTime.isEffectiveTimeZone): GMT/UTC
    * prefixed, signed numeric offsets, or a known region/alias id —
    * via java.time's public tables, not sun.* internals. */
  def isEffectiveTimeZone(tz: String): Boolean = {
    if (tz == null || tz.isEmpty) false
    else if (tz.startsWith("GMT") || tz.startsWith("UTC")) true
    else {
      val c = tz.charAt(0)
      if (c == '-' || c == '+')
        tz.substring(1).forall(ch => (ch >= '0' && ch <= '9') || ch == ':')
      else zoneNames.contains(tz.toLowerCase)
    }
  }

  private lazy val zoneNames: Set[String] = {
    import scala.jdk.CollectionConverters._
    (ZoneId.getAvailableZoneIds.asScala.toSet ++
      ZoneId.SHORT_IDS.keySet.asScala).map(_.toLowerCase)
  }

  /** Parse a JDBC-style rendering under a declared segment mask —
    * the inverse of [[DtsDateTime.render]] for values the mask can
    * express (ref DateTime.parseJdbcDatetime). The mask says which
    * digit runs mean what: `parse("07:05:09", SegTime)` is a
    * time-only value, not a mangled date. */
  def parse(jdbc: String, segments: Int): DtsDateTime = {
    require(jdbc != null && jdbc.trim.nonEmpty, "datetime is null or empty")
    var s = jdbc
    var era: String = null
    var tz: String = null
    if ((segments & SegCommonEra) != 0 && s.length > 2) {
      val tail = s.substring(s.length - 2)
      if (EraNames.contains(tail)) {
        era = tail
        s = s.substring(0, s.length - 2).trim
      }
    }
    if ((segments & SegTimezone) != 0) {
      // reverse scan for the zone boundary: ' ', '+' or '-' not
      // preceded by a letter (letters belong to region-id words)
      var idx = -1
      var i = s.length - 1
      while (i >= 0 && idx < 0) {
        val c = s.charAt(i)
        if (c == ' ' || c == '+' || c == '-') {
          val prevLetter = i > 1 && {
            val lc = s.charAt(i - 1)
            (lc >= 'a' && lc <= 'z') || (lc >= 'A' && lc <= 'Z')
          }
          if (!prevLetter) idx = i
        }
        i -= 1
      }
      if (idx >= 0) {
        val cand = s.substring(idx)
        if (isEffectiveTimeZone(cand.trim)) {
          tz = cand.trim
          s = s.substring(0, s.length - cand.length).trim
        }
      }
    }
    // digit-run sweep; a run following '.' is fractional and upscales
    // to nanos
    val ret = new Array[Int](7)
    var j = 0; var m = 0; var n = 0
    var microMode = false
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length && j < ret.length) {
      val c = bytes(i)
      if (c >= '0' && c <= '9') {
        m = m * 10 + (c - '0'); n += 1
      } else if (n != 0) {
        ret(j) = if (microMode) upToNanos(m, 9 - n) else m
        m = 0; n = 0; j += 1
        microMode = c == '.'
      }
      i += 1
    }
    if (n != 0 && j < ret.length)
      ret(j) = if (microMode) upToNanos(m, 9 - n) else m
    var idx2 = 0
    def take(seg: Int): Int =
      if ((segments & seg) != 0) { val v = ret(idx2); idx2 += 1; v } else 0
    val yr = take(SegYear); val mo = take(SegMonth); val dy = take(SegDay)
    val hh = take(SegHour); val mi = take(SegMinute); val ss = take(SegSecond)
    val na = take(SegNanos)
    var segs = segments
    if (bytes.nonEmpty && bytes(0) == '-') segs |= SegNegative
    if (era == null) segs &= ~SegCommonEra
    if (tz == null) segs &= ~SegTimezone
    DtsDateTime(segs, yr, mo, dy, hh, mi, ss, na, tz, era)
  }

  private def upToNanos(v: Int, shift: Int): Int = {
    var r = v
    var i = 0
    while (i < shift) { r *= 10; i += 1 }
    r
  }
}
