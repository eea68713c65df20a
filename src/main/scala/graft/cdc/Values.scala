package graft.cdc

import java.math.{BigDecimal => JBigDecimal}
import java.nio.charset.{Charset, StandardCharsets}
import java.time.{LocalDateTime, ZoneOffset}
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField

/** Typed conversions for stringified row-image values — the engine's
  * counterpart of the reference's value type system (ref:
  * formats/internal/record/value/ValueType.java: BIT, INTEGER_NUMERIC,
  * FLOAT_NUMERIC, DECIMAL_NUMERIC, SPECIAL_NUMERIC, STRING, DATETIME,
  * UNIX_TIMESTAMP, TEXT/BINARY_ENCODING_OBJECT, WKT/WKB geometry) and
  * of its charset bridge (ref: common/JDKCharsetMapper.java).
  */
object Values {

  // ---------------------------------------------------------- numerics

  /** Unsigned-safe integer parse (ref: IntegerNumeric.java — MySQL
    * BIGINT UNSIGNED can exceed Long.MaxValue). */
  def parseIntegerNumeric(s: String): JBigDecimal = new JBigDecimal(s.trim)

  def parseDecimal(s: String): JBigDecimal = new JBigDecimal(s.trim)

  /** Float with the reference's "special numeric" spellings (ref:
    * SpecialNumeric.java: NaN / Infinity markers). */
  def parseFloat(s: String): Double = s.trim match {
    case "NaN"                       => Double.NaN
    case "Infinity" | "+Infinity"    => Double.PositiveInfinity
    case "-Infinity"                 => Double.NegativeInfinity
    case other                       => other.toDouble
  }

  // ------------------------------------------------------------- BIT

  /** BIT(n) big-endian bytes → long (ref: BitValue.java). */
  def bitToLong(bytes: Array[Byte]): Long =
    bytes.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))

  // -------------------------------------------------------- datetimes

  private val dtFormatter: DateTimeFormatter = new DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd[ HH:mm:ss]")
    .appendFraction(ChronoField.MICRO_OF_SECOND, 0, 6, true)
    .parseDefaulting(ChronoField.HOUR_OF_DAY, 0)
    .parseDefaulting(ChronoField.MINUTE_OF_HOUR, 0)
    .parseDefaulting(ChronoField.SECOND_OF_MINUTE, 0)
    .toFormatter

  /** "yyyy-MM-dd[ HH:mm:ss[.ffffff]]" → epoch micros, UTC (ref:
    * DateTime.java segment parse with fractional seconds). */
  def dateTimeToMicros(s: String): Long = {
    val ldt = LocalDateTime.parse(s.trim, dtFormatter)
    ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
  }

  def microsToDateTime(us: Long): String = {
    val ldt = LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
      ZoneOffset.UTC)
    ldt.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
  }

  /** Unix seconds + micro remainder → epoch micros (ref:
    * UnixTimestamp.java). */
  def unixTimestampToMicros(seconds: Long, micros: Int): Long =
    seconds * 1000000L + micros

  // ---------------------------------------------------------- strings

  /** MySQL charset name → JDK charset name, the reference's full alias
    * table (ref: JDKCharsetMapper.java MYSQL_JDK_ENCODINGS). Note
    * latin1 → windows-1252 (MySQL's latin1 is Cp1252, which assigns
    * printable characters in 0x80–0x9F where ISO-8859-1 has control
    * codes). */
  private val MysqlJdkCharsets: Map[String, String] = Map(
    "armscii8" -> "windows-1252", "ascii" -> "US-ASCII",
    "big5" -> "Big5", "binary" -> "ISO-8859-1",
    "cp1250" -> "windows-1250", "cp1251" -> "windows-1251",
    "cp1256" -> "windows-1256", "cp1257" -> "windows-1257",
    "cp850" -> "IBM850", "cp852" -> "IBM852", "cp866" -> "IBM866",
    "cp932" -> "windows-31j", "dec8" -> "windows-1252",
    "eucjpms" -> "x-eucJP-Open", "euckr" -> "EUC-KR",
    "gb2312" -> "GB2312", "gbk" -> "GBK",
    "geostd8" -> "windows-1252", "greek" -> "ISO-8859-7",
    "hebrew" -> "ISO-8859-8", "hp8" -> "windows-1252",
    "keybcs2" -> "IBM852", "koi8r" -> "KOI8-R", "koi8u" -> "KOI8-R",
    "latin1" -> "windows-1252", "latin2" -> "ISO-8859-2",
    "latin5" -> "ISO-8859-9", "latin7" -> "ISO-8859-13",
    "macce" -> "x-MacCentralEurope", "macroman" -> "x-MacRoman",
    "sjis" -> "Shift_JIS", "swe7" -> "windows-1252",
    "tis620" -> "TIS-620", "ujis" -> "EUC-JP",
    "utf16" -> "UTF-16", "utf16le" -> "UTF-16LE",
    "utf32" -> "UTF-32", "utf8" -> "UTF-8", "utf8mb4" -> "UTF-8",
    "utf8mb3" -> "UTF-8", "ucs2" -> "UTF-16")

  /** Source-charset name → JDK charset (ref: JDKCharsetMapper.java). */
  def charsetFor(name: String): Charset = {
    val lower = name.toLowerCase
    Charset.forName(MysqlJdkCharsets.getOrElse(lower, name))
  }

  def decodeString(bytes: Array[Byte], charsetName: String): String =
    new String(bytes, charsetFor(charsetName))

  // --------------------------------------------------------- geometry

  /** Minimal WKT point codec (ref: WKTGeometry.java / GeometryUtil —
    * geometry values travel as text; only POINT gets structure here).
    */
  private val PointRe = """(?i)\s*POINT\s*\(\s*(\S+)\s+(\S+)\s*\)\s*""".r

  def parsePointWkt(wkt: String): Option[(Double, Double)] = wkt match {
    case PointRe(x, y) =>
      try Some((x.toDouble, y.toDouble)) catch { case _: NumberFormatException => None }
    case _ => None
  }

  def pointToWkt(x: Double, y: Double): String = s"POINT ($x $y)"

  /** WKB point decode (ref: WKBGeometry.java:10, GeometryUtil.java —
    * the reference carries geometry as WKB bytes beside WKT text).
    * Layout: u8 byteOrder (0=BE, 1=LE), u32 geomType, f64 x, f64 y.
    * Accepts an optional 4-byte SRID prefix (MySQL's internal format
    * prepends it). Returns None for non-point types or short input. */
  def parsePointWkb(bytes: Array[Byte]): Option[(Double, Double)] = {
    if (bytes == null) return None
    // MySQL internal geometry = 4-byte SRID, then standard WKB
    val off = if (bytes.length == 25) 4 else 0
    if (bytes.length - off < 21) return None
    val buf = java.nio.ByteBuffer.wrap(bytes, off, bytes.length - off)
    val bo = buf.get()
    buf.order(if (bo == 1) java.nio.ByteOrder.LITTLE_ENDIAN
              else java.nio.ByteOrder.BIG_ENDIAN)
    val geomType = buf.getInt() & 0xffff // mask Z/M/SRID flag bits
    if (geomType != 1) None // 1 = POINT
    else Some((buf.getDouble(), buf.getDouble()))
  }

  /** WKB point encode (little-endian, standard 21-byte form). */
  def pointToWkb(x: Double, y: Double): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(21)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    buf.array()
  }

  // ---------------------------------------------- full WKB → WKT decode

  /** ANY-geometry WKB → WKT text, the reference's full contract (ref:
    * GeometryUtil.java:14 feeds arbitrary WKB through a WKB reader and
    * emits WKT; r4 decoded POINT only). Pure-JVM parse — all 7 OGC
    * type codes (POINT, LINESTRING, POLYGON, MULTIPOINT,
    * MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION), per-geometry
    * byte order (each nested geometry carries its own, as WKB
    * specifies), the EWKB embedded-SRID flag (0x20000000), and MySQL's
    * internal 4-byte SRID prefix. Zero-element inputs render as
    * `<TYPE> EMPTY`. Returns None on malformed input. */
  def wkbToWkt(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 5) return None
    // a parse only counts if it consumes the WHOLE buffer: MySQL's
    // internal form (4-byte SRID + WKB) with SRID low byte 0 or 1 —
    // including the default SRID 0 — also LOOKS like a standard-WKB
    // byte-order marker, but the misread geometry never spans the
    // full input, so full-consumption disambiguates the two layouts
    def parseAt(off: Int): Option[String] =
      try {
        val buf = java.nio.ByteBuffer.wrap(bytes, off, bytes.length - off)
        val wkt = readGeometry(buf, 0)
        if (buf.hasRemaining) None else Some(wkt)
      } catch { case _: Exception => None }
    // Both layouts can fully consume the same buffer, and the
    // ambiguity is REAL in both directions: SRID 0 + LE empty-ring
    // polygon reads at offset 0 as a standard POINT with denormal
    // ~1e-294 coordinates, and the INVERSE bytes exist too (a
    // standard LE POINT whose x mantissa encodes a type word and
    // whose y = 0.0 supplies zero ring counts re-parses at offset 4
    // as SRID + BE polygon). No byte-level rule can tell them apart —
    // the tie-break is a DOMAIN PRIOR OF THIS DECODER, not reference
    // behavior (ref GeometryUtil.java:18 hands the buffer to JTS
    // WKBReader at offset 0 — standard WKB only, no SRID handling —
    // ADVICE r7 corrected the earlier misattribution): this decoder
    // ALSO accepts the MySQL internal form (4-byte SRID + WKB) that
    // MySQL binlog geometry columns actually carry, and when both
    // parses fully consume, the MySQL (offset-4) form wins — sources
    // that emit that layout outnumber degenerate standard shapes in
    // the CDC context this decoder serves.
    // The cost is the constructible-but-degenerate standard shape
    // above (a point at 1e-294 with y exactly +0.0) — pinned in
    // ValuesSpec as chosen behavior, not an accident.
    val std =
      if (bytes(0) == 0 || bytes(0) == 1) parseAt(0) else None
    val mysql = if (bytes.length >= 9) parseAt(4) else None
    mysql.orElse(std)
  }

  private val WktNames = Map(
    1 -> "POINT", 2 -> "LINESTRING", 3 -> "POLYGON", 4 -> "MULTIPOINT",
    5 -> "MULTILINESTRING", 6 -> "MULTIPOLYGON", 7 -> "GEOMETRYCOLLECTION")

  /** One geometry (byte-order byte + type word + payload) → full WKT.
    * `depth` bounds GEOMETRYCOLLECTION recursion so hostile input
    * can't overflow the stack. */
  private def readGeometry(buf: java.nio.ByteBuffer, depth: Int): String = {
    require(depth < 32, "wkb nesting too deep")
    val (gtype, body) = readTyped(buf, depth, expect = 0)
    s"${WktNames(gtype)} $body"
  }

  /** Parses one geometry and returns (type code, parenthesized body).
    * `expect` != 0 restricts the allowed type (multi-geometry members
    * must be the declared member type). */
  private def readTyped(
      buf: java.nio.ByteBuffer, depth: Int, expect: Int): (Int, String) = {
    val bo = buf.get()
    require(bo == 0 || bo == 1, s"bad wkb byte order $bo")
    buf.order(if (bo == 1) java.nio.ByteOrder.LITTLE_ENDIAN
              else java.nio.ByteOrder.BIG_ENDIAN)
    val typeWord = buf.getInt()
    if ((typeWord & 0x20000000) != 0) buf.getInt() // EWKB embedded SRID
    val gtype = typeWord & 0xffff
    require(WktNames.contains(gtype), s"unknown wkb geometry type $gtype")
    require(expect == 0 || gtype == expect,
      s"wkb member type $gtype where $expect required")
    def coord(): String = s"${buf.getDouble()} ${buf.getDouble()}"
    def seqOf(one: () => String): String = {
      val n = buf.getInt()
      require(n >= 0 && n <= buf.remaining(), s"bad wkb element count $n")
      if (n == 0) "EMPTY"
      else (0 until n).map(_ => one()).mkString("(", ", ", ")")
    }
    def ring(): String = seqOf(coord _)
    // nested members carry their own byte-order byte; readTyped resets
    // the buffer order per member
    def member(t: Int): String = {
      val order = buf.order() // restore for the count reads that follow
      val s = readTyped(buf, depth + 1, t)._2
      buf.order(order)
      s
    }
    val body = gtype match {
      case 1 => s"(${coord()})"
      case 2 => ring()
      case 3 => seqOf(ring _)
      case 4 => seqOf(() => member(1))
      case 5 => seqOf(() => member(2))
      case 6 => seqOf(() => member(3))
      case 7 =>
        val n = buf.getInt()
        require(n >= 0 && n <= buf.remaining(), s"bad wkb element count $n")
        if (n == 0) "EMPTY"
        else (0 until n).map { _ =>
          val order = buf.order()
          val s = readGeometry(buf, depth + 1)
          buf.order(order)
          s
        }.mkString("(", ", ", ")")
    }
    (gtype, body)
  }
}
