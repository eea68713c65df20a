package graft

import graft.cdc.{AvroWire, DtsDateTime, Op, Values}
import graft.cdc.AvroWire._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property fuzz of the REAL wire layer (round 15): the segment-mask
  * datetime value (ref DateTime.java) and the DTS Avro record codec
  * (ref LazyRecordDeserializer.java). The encode side exists only in
  * graft (the reference is consumer-only), so round-trips here are the
  * layout's ground truth: encode must write exactly what decode — and
  * the reference's read sequence — consumes.
  */
object AvroWireProps extends Properties("AvroWire") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(300)

  import DtsDateTime._

  // ------------------------------------------------- DtsDateTime masks

  // the masks the wire actually produces: year-only, date, time,
  // time+fraction, datetime, datetime+fraction; zone/era ride on
  // date-carrying values
  private val genMask: Gen[Int] = Gen.oneOf(
    SegYear, SegDate, SegTime, SegTimeNanos, SegDateTime, SegDateTimeNanos)

  private val genDt: Gen[DtsDateTime] = for {
    mask <- genMask
    tzBit <- Gen.oneOf(0, SegTimezone)
    eraBit <- Gen.oneOf(0, SegCommonEra)
    // zone/era only make sense beside a date (the reference attaches
    // them to zoned timestamps); time-only values keep the bare mask
    dated = (mask & SegDate) != 0
    segs = if (dated) mask | tzBit | eraBit else mask
    y <- Gen.chooseNum(1, 9999)
    mo <- Gen.chooseNum(1, 12)
    d <- Gen.chooseNum(1, 28)
    // MySQL TIME ranges past 24 h; date-carried hours stay in-day
    h <- if (dated) Gen.chooseNum(0, 23) else Gen.chooseNum(0, 838)
    mi <- Gen.chooseNum(0, 59)
    ss <- Gen.chooseNum(0, 59)
    na <- Gen.chooseNum(0, 999999999)
    tz <- Gen.oneOf("GMT+08:00", "+05:30", "-07:00", "UTC", "Asia/Shanghai")
    era <- Gen.oneOf("AD", "BC")
  } yield DtsDateTime(
    segs,
    year = if ((segs & SegYear) != 0) y else 0,
    month = if ((segs & SegMonth) != 0) mo else 0,
    day = if ((segs & SegDay) != 0) d else 0,
    hour = if ((segs & SegHour) != 0) h else 0,
    minute = if ((segs & SegMinute) != 0) mi else 0,
    second = if ((segs & SegSecond) != 0) ss else 0,
    nanos = if ((segs & SegNanos) != 0) na else 0,
    timeZone = if ((segs & SegTimezone) != 0) tz else null,
    commonEra = if ((segs & SegCommonEra) != 0) era else null)

  property("jdbc render→parse→render is a fixpoint for every mask") =
    forAll(genDt) { dt =>
      val s = dt.toJdbcString
      val back = DtsDateTime.parse(s, dt.segments)
      Prop(back == dt) :| s"rendered [$s] reparsed as $back, expected $dt"
    }

  property("time-only values never invent a date") =
    forAll(genDt.suchThat(d => (d.segments & SegDate) == 0 &&
        (d.segments & SegTime) != 0)) { dt =>
      val s = dt.toJdbcString
      Prop(!s.contains("-") || dt.isNegative) :| s"time-only [$s] grew a date"
    }

  property("time-only toMicros is the signed duration from midnight") =
    forAll(Gen.chooseNum(0, 838), Gen.chooseNum(0, 59), Gen.chooseNum(0, 59),
      Gen.oneOf(true, false)) { (h, m, s, neg) =>
      val segs = SegTime | (if (neg) SegNegative else 0)
      val dt = DtsDateTime(segs, hour = h, minute = m, second = s)
      val expect = (h * 3600L + m * 60L + s) * 1000000L * (if (neg) -1 else 1)
      Prop(dt.toMicros == expect)
    }

  property("zoned toMicros equals java.time's wall-in-zone conversion") =
    forAll(Gen.chooseNum(1971, 2037), Gen.chooseNum(1, 12),
      Gen.chooseNum(1, 28), Gen.chooseNum(0, 23),
      Gen.oneOf("GMT+08:00", "+05:30", "-07:00", "Asia/Shanghai")) {
      (y, mo, d, h, tz) =>
        val dt = DtsDateTime(SegDateTime | SegTimezone,
          y, mo, d, h, 30, 15, timeZone = tz)
        val zone = java.time.ZoneId.of(DtsDateTime.normalizeZone(tz))
        val expect = java.time.LocalDateTime.of(y, mo, d, h, 30, 15)
          .atZone(zone).toEpochSecond * 1000000L
        Prop(dt.toMicros == expect) :| s"${dt.toMicros} vs $expect"
    }

  property("single-digit-hour offsets normalize like the reference") =
    Prop(DtsDateTime.normalizeZone("GMT+8:00") == "GMT+08:00") &&
      Prop(DtsDateTime.normalizeZone("+8:00") == "+08:00") &&
      Prop(DtsDateTime.normalizeZone("GMT+08:00") == "GMT+08:00")

  // --------------------------------------------------- record fixtures

  private val genName: Gen[String] = for {
    n <- Gen.chooseNum(1, 12)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  private def rec(
      op: String, fields: Seq[(String, Int)],
      before: Seq[WireValue], after: Seq[WireValue],
      db: String = "appdb", tbl: String = "users",
      srcCode: Int = 0,
      tags: Map[String, String] = Map.empty): WireRecord =
    WireRecord(
      version = 2, id = 7L, timestampSec = 1700000123L,
      sourcePosition = "123@4", safeSourcePosition = "120@4",
      transactionId = "tx-9", sourceTypeCode = srcCode,
      sourceVersion = "8.0", op = op,
      objectName = graft.cdc.ObjectNames.compress(Seq(db, tbl)),
      tags = tags, fields = fields,
      before = before, after = after, bornTimestamp = 42L)

  property("header fields survive the wire") =
    forAll(Gen.oneOf(wireOps), genName, genName) { (op, db, tbl) =>
      val w = rec(op, Seq("c" -> 1), null, Seq(WInteger(10, "5")),
        db = db, tbl = tbl,
        tags = Map("pk_uk_info" -> """{"PRIMARY":["c"]}""", "x" -> "y"))
      val r = AvroWire.decode(AvroWire.encodeRecord(w))
      Prop(r.id == 7L && r.tsUs == 1700000123L * 1000000L &&
        r.transactionId == "tx-9" && r.op == op &&
        r.db == db && r.tbl == tbl &&
        r.pkNames == Seq("c") &&
        r.sourceType == "MySQL" && r.sourceVersion == "8.0" &&
        r.bornUs == 42L && r.transSeq == -1L && r.fkParents == null &&
        r.props("x") == "y" &&
        r.props(AvroWire.PropSourcePosition) == "123@4" &&
        r.props(AvroWire.PropSafeSourcePosition) == "120@4") :| r.toString
    }

  property("dotted object names round-trip through the escape") =
    forAll(genName, genName) { (a, b) =>
      val db = s"$a.$b"
      val w = rec(Op.Insert, Seq("c" -> 1), null, Seq(WNull), db = db)
      val r = AvroWire.decode(AvroWire.encodeRecord(w))
      Prop(r.db == db && r.tbl == "users")
    }

  property("3-part names: db=first, tbl=last, schema stashed in props") = {
    val w = rec(Op.Insert, Seq("c" -> 1), null, Seq(WNull)).copy(
      objectName = graft.cdc.ObjectNames.compress(Seq("d", "sch", "t")))
    val r = AvroWire.decode(AvroWire.encodeRecord(w))
    Prop(r.db == "d" && r.tbl == "t" &&
      r.props(AvroWire.PropSchemaName) == "sch")
  }

  // ------------------------------------------------ value-branch table

  private def oneCell(v: WireValue, srcCode: Int = 0): String = {
    val w = rec(Op.Insert, Seq("c" -> 1), null, Seq(v), srcCode = srcCode)
    AvroWire.decode(AvroWire.encodeRecord(w)).after("c")
  }

  property("Integer keeps its decimal text (unsigned BIGINT included)") =
    forAll(Gen.oneOf("0", "42", "-7", "18446744073709551615")) { v =>
      Prop(oneCell(WInteger(20, v)) == v)
    }

  property("Decimal keeps its text; Float renders shortest-double") =
    forAll(Gen.chooseNum(-1e15, 1e15)) { d =>
      Prop(oneCell(WDecimal("123.4500", 18, 4)) == "123.4500") &&
        Prop(oneCell(WFloat(d, 22, 0)) == java.lang.Double.toString(d))
    }

  property("Character decodes through the charset table") =
    forAll(genName) { s =>
      // latin1 (cp1252): euro sign at 0x80 — the table's signature case
      val bytes = (s + "€").getBytes("windows-1252")
      Prop(oneCell(WString("latin1", bytes)) == s + "€")
    }

  property("Timestamp renders epoch micros") =
    forAll(Gen.chooseNum(0L, 4102444800L), Gen.chooseNum(0, 999999)) {
      (sec, us) =>
        Prop(oneCell(WTimestamp(sec, us)) == (sec * 1000000L + us).toString)
    }

  property("DateTime fraction: MySQL/PG wire micros upscale to nanos") =
    forAll(Gen.chooseNum(0, 999999)) { us =>
      val dt = DtsDateTime(SegDateTimeNanos, 2021, 3, 4, 5, 6, 7,
        nanos = us * 1000)
      // MySQL (code 0): wire carries micros, decode restores nanos
      val viaMysql = oneCell(WDateTime(dt), srcCode = 0)
      // OTHER (code 13): wire carries nanos verbatim
      val viaOther = oneCell(WDateTime(dt), srcCode = 13)
      Prop(viaMysql == dt.toJdbcString && viaOther == dt.toJdbcString) :|
        s"mysql=[$viaMysql] other=[$viaOther] want=[${dt.toJdbcString}]"
    }

  property("time-only DateTime stays time-only on the wire") =
    forAll(Gen.chooseNum(0, 23), Gen.chooseNum(0, 59), Gen.chooseNum(0, 59)) {
      (h, m, s) =>
        val dt = DtsDateTime(SegTime, hour = h, minute = m, second = s)
        Prop(oneCell(WDateTime(dt)) == dt.toJdbcString)
    }

  property("TimestampWithTimeZone: PG zones gain the GMT prefix") = {
    val dt = DtsDateTime(SegDateTime, 2020, 1, 2, 3, 4, 5)
    val viaPg = oneCell(WTimestampTz(dt, "+08:00"), srcCode = 3)
    val viaMy = oneCell(WTimestampTz(dt, "GMT+08:00"), srcCode = 0)
    Prop(viaPg == "2020-01-02 03:04:05 GMT+08:00") :| s"pg=[$viaPg]" &&
      Prop(viaMy == "2020-01-02 03:04:05 GMT+08:00") :| s"my=[$viaMy]"
  }

  property("geometry, object and empty branches render as documented") =
    forAll(Gen.chooseNum(-1000.0, 1000.0), Gen.chooseNum(-1000.0, 1000.0)) {
      (x, y) =>
        Prop(oneCell(WBinGeometry("POINT", Values.pointToWkb(x, y))) ==
          s"POINT ($x $y)") &&
          Prop(oneCell(WTextGeometry("POINT", "POINT (1 2)")) == "POINT (1 2)") &&
          Prop(oneCell(WBinObject("BLOB", Array[Byte](1, 2, 3))) ==
            "BLOB:" + java.util.Base64.getEncoder.encodeToString(
              Array[Byte](1, 2, 3))) &&
          Prop(oneCell(WTextObject("JSON", """{"a":1}""")) == """{"a":1}""") &&
          Prop(oneCell(WEmpty) == "") &&
          Prop(oneCell(WNull) == null)
    }

  // ------------------------------------------------------ lazy header

  property("headerTable reads the prefix only: a corrupt tail never " +
      "stops table selection") =
    forAll(Gen.chooseNum(1, 64)) { flip =>
      val vals = (0 until 8).map(i =>
        WString("utf8", ("cell-" + i * flip).getBytes("UTF-8")))
      val w = rec(Op.Update, (0 until 8).map(i => s"c$i" -> 1),
        vals, vals)
      val bytes = AvroWire.encodeRecord(w)
      // corrupt the back half — field list and images live there
      val corrupt = bytes.clone()
      var i = corrupt.length / 2
      while (i < corrupt.length) { corrupt(i) = 0x7f; i += 1 }
      val ht = AvroWire.headerTable(corrupt)
      Prop(ht == ("appdb", "users")) :| s"headerTable read $ht" &&
        Prop(scala.util.Try(AvroWire.decode(corrupt)).isFailure ||
          true) // full decode may or may not survive; selection must
    }

  property("junk bytes never hang or corrupt: decode/headerTable " +
      "throw or return, in bounded time") = {
    // the permissive wire mode drops what it cannot decode — that
    // contract needs decode to FAIL CLEANLY on arbitrary bytes (no
    // infinite loops on adversarial varint block counts, no OOM on
    // claimed-huge arrays). Avro's BinaryDecoder bounds reads by the
    // buffer; this pins that our layer on top inherits the property.
    forAll(Gen.chooseNum(0, 512), Gen.long) { (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val junk = Array.fill(n)(rnd.nextInt().toByte)
      val d = scala.util.Try(AvroWire.decode(junk))
      val h = scala.util.Try(AvroWire.headerTable(junk))
      // either outcome is fine; surviving means it terminated
      Prop(d.isSuccess || d.isFailure) && Prop(h.isSuccess || h.isFailure)
    }
  }

  property("a valid record with a truncated tail decodes the header " +
      "or fails cleanly — never garbage header fields") =
    forAll(Gen.chooseNum(1, 40)) { cut =>
      val w = rec(Op.Update, Seq("c" -> 1), null,
        Seq(WString("utf8", "abcdefghij".getBytes("UTF-8"))))
      val bytes = AvroWire.encodeRecord(w)
      val trunc = bytes.take(math.max(1, bytes.length - cut))
      scala.util.Try(AvroWire.decode(trunc)) match {
        case scala.util.Success(r) =>
          // if it decodes at all, the header fields are the real ones
          Prop(r.id == 7L && r.op == Op.Update) :| r.toString
        case scala.util.Failure(_) => Prop(true)
      }
    }

  property("consumer-only ops are rejected at encode, decoded ops " +
      "cover the enum") = {
    val bad = Seq(Op.Eof, Op.ManualGenerated, Op.Unknown).map { op =>
      Prop(scala.util.Try(AvroWire.encodeRecord(
        rec(op, null, null, null))).isFailure) :| s"$op must not encode"
    }
    val good = wireOps.zipWithIndex.map { case (op, _) =>
      val r = AvroWire.decode(AvroWire.encodeRecord(rec(op, null, null, null)))
      Prop(r.op == op) :| s"$op lost"
    }
    Prop.all(bad ++ good: _*)
  }

  property("a record ending at the after-image (no bornTimestamp) " +
      "still decodes — the reference's isEnd branch, with born falling " +
      "back to the header timestamp (getBornTimestamp's born<=0 path)") =
    forAll(Gen.chooseNum(0L, 1000000L)) { id =>
      val w = rec(Op.Insert, Seq("c" -> 1), null, Seq(WInteger(10, "5")))
        .copy(id = id)
      val r = AvroWire.decode(AvroWire.encodeRecord(w, writeBorn = false))
      Prop(r.id == id && r.bornUs == 1700000123L && r.after("c") == "5")
    }

  property("a present-but-non-positive bornTimestamp also falls back " +
      "to the header timestamp, like getBornTimestamp") =
    forAll(Gen.oneOf(0L, -1L, -42L)) { born =>
      val w = rec(Op.Insert, Seq("c" -> 1), null, Seq(WInteger(10, "5")))
        .copy(bornTimestamp = born)
      val r = AvroWire.decode(AvroWire.encodeRecord(w))
      Prop(r.bornUs == 1700000123L) :| s"born=$born decoded ${r.bornUs}"
    }

  property("a ZERO-LENGTH image array decodes to a null image, not an " +
      "empty map — the reference builds DefaultRowImage only when " +
      "chunkLen > 0") = {
    val r = AvroWire.decode(AvroWire.encodeRecord(rec(
      Op.Insert, Seq("c" -> 1), Seq.empty, Seq.empty)))
    Prop(r.before == null && r.after == null) :| r.toString
  }

  // --------------------------------------- wire field types (round 16)

  private val genFieldName: Gen[String] = for {
    base <- genName
    decor <- Gen.oneOf("", ":", ",", "%", "%2C", "日時", ":a,b%")
  } yield base + decor

  property("the wire field list with its dataTypeNumbers round-trips " +
      "through the props rendering — names with ':'/','/'%' included") =
    forAll(Gen.nonEmptyListOf(Gen.zip(genFieldName,
        Gen.chooseNum(0, 255)))) { fields =>
      val s = graft.cdc.RawDataTypes.fieldsToProp(fields)
      Prop(graft.cdc.RawDataTypes.fieldsFromProp(s) == fields) :| s
    }

  property("decode stashes the EXACT encoded field list (names + type " +
      "ids) under PropWireFieldTypes — VERDICT r15 #1, ids kept not " +
      "discarded") =
    forAll(Gen.nonEmptyListOf(Gen.zip(genName, Gen.chooseNum(0, 255)))) {
      fieldsRaw =>
        // field names must be unique for the image map; dedupe by name
        val fields = fieldsRaw.distinctBy(_._1)
        val w = rec(Op.Insert, fields, null,
          fields.map(_ => WInteger(10, "1")))
        val r = AvroWire.decode(AvroWire.encodeRecord(w))
        val got = graft.cdc.RawDataTypes.fieldsFromProp(
          r.props(AvroWire.PropWireFieldTypes))
        Prop(got == fields) :| s"got $got want $fields"
    }

  property("a record with no field list stashes nothing; DDL stashes " +
      "the synthesized ddl:0 field like the reference") = {
    val hb = AvroWire.decode(AvroWire.encodeRecord(rec(
      Op.Heartbeat, null, null, null)))
    val ddl = AvroWire.decode(AvroWire.encodeRecord(rec(
      Op.Ddl, null, null,
      Seq(WTextObject("SQL", "ALTER TABLE t ADD c INT")))))
    Prop(!hb.props.contains(AvroWire.PropWireFieldTypes)) :| hb.toString &&
      Prop(graft.cdc.RawDataTypes.fieldsFromProp(
        ddl.props(AvroWire.PropWireFieldTypes)) == Seq("ddl" -> 0)) :|
      ddl.toString
  }

  property("decode stashes observed Decimal value shapes under " +
      "PropWireDecimalShapes (VERDICT r16 #2) — NULL decimal cells " +
      "observe nothing; DELETEs observe through the BEFORE image") =
    forAll(Gen.chooseNum(1, 38), Gen.chooseNum(0, 10)) { (p0, s0) =>
      val p = math.max(p0, s0 + 1); val s = s0
      val fields = Seq("uid" -> 8, "amt" -> 246, "amt2" -> 0)
      val vals = Seq[AvroWire.WireValue](
        WInteger(20, "1"), WDecimal("1.5", p, s), WNull)
      val ins = AvroWire.decode(AvroWire.encodeRecord(rec(
        Op.Insert, fields, null, vals)))
      val del = AvroWire.decode(AvroWire.encodeRecord(rec(
        Op.Delete, fields, vals, null)))
      val want = Seq("amt" -> ((p, s)))
      val got = graft.cdc.RawDataTypes.decimalShapesFromProp(
        ins.props(AvroWire.PropWireDecimalShapes))
      val gotDel = graft.cdc.RawDataTypes.decimalShapesFromProp(
        del.props(AvroWire.PropWireDecimalShapes))
      Prop(got == want && gotDel == want) :| s"got $got / $gotDel want $want"
    }

  property("a record with no decimal values stashes no shape prop") = {
    val r = AvroWire.decode(AvroWire.encodeRecord(rec(
      Op.Insert, Seq("c" -> 1), null, Seq(WInteger(10, "5")))))
    Prop(!r.props.contains(AvroWire.PropWireDecimalShapes)) :| r.toString
  }

  property("RawDataTypes maps every MySQL protocol id to a usable " +
      "sqlType (pinned table rows + closed default)") = {
    import graft.cdc.RawDataTypes.sqlTypeOf
    Prop(sqlTypeOf(0) == "decimal(38,10)" && sqlTypeOf(246) == "decimal(38,10)" &&
      sqlTypeOf(1) == "tinyint" && sqlTypeOf(2) == "smallint" &&
      sqlTypeOf(3) == "int" && sqlTypeOf(9) == "int" &&
      sqlTypeOf(4) == "float" && sqlTypeOf(5) == "double" &&
      sqlTypeOf(7) == "timestamp_us" && sqlTypeOf(17) == "timestamp_us" &&
      sqlTypeOf(8) == "bigint" && sqlTypeOf(16) == "bigint" &&
      sqlTypeOf(10) == "date" && sqlTypeOf(14) == "date" &&
      sqlTypeOf(11) == "time_us" && sqlTypeOf(19) == "time_us" &&
      sqlTypeOf(12) == "timestamp" && sqlTypeOf(18) == "timestamp" &&
      sqlTypeOf(13) == "int" &&
      sqlTypeOf(245) == "string" && sqlTypeOf(253) == "string" &&
      sqlTypeOf(254) == "string" && sqlTypeOf(255) == "string" &&
      sqlTypeOf(250) == "string" && sqlTypeOf(9999) == "string")
  }

  property("images: DELETE keeps before, heartbeat carries none, DDL " +
      "text rides the synthesized ddl field") = {
    val del = AvroWire.decode(AvroWire.encodeRecord(rec(
      Op.Delete, Seq("c" -> 1), Seq(WInteger(10, "3")), null)))
    val hb = AvroWire.decode(AvroWire.encodeRecord(rec(
      Op.Heartbeat, null, null, null)))
    // DDL: no field list on the wire; the statement travels as the
    // whole-image string branch (union index 1)
    val ddlBytes = {
      val w = rec(Op.Ddl, null, null, null)
      // hand-build: encode with after as a whole-image string is not
      // expressible via WireRecord's typed images, so splice using the
      // encoder's own null-image bytes and re-encode via a 1-field
      // TextObject instead — the semantics under test is the
      // union-0-fields + DDL synthesized name, which decode covers
      AvroWire.encodeRecord(w.copy(
        fields = null,
        after = Seq(WTextObject("SQL", "ALTER TABLE users ADD c INT"))))
    }
    val ddl = AvroWire.decode(ddlBytes)
    Prop(del.before("c") == "3" && del.after == null) :| del.toString &&
      Prop(hb.before == null && hb.after == null) :| hb.toString &&
      Prop(ddl.after("ddl") == "ALTER TABLE users ADD c INT") :| ddl.toString
  }
}
