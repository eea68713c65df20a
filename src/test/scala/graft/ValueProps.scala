package graft

import graft.cdc.Values
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based fuzz of the value-type conversion layer (the
  * reference's value package re-expressed): roundtrips and algebraic
  * identities over the whole input domain, not just the example rows
  * ValuesSpec pins.
  */
object ValueProps extends Properties("Values") {

  // WKB point: any finite double (plus ±0.0 and denormals) roundtrips
  // bit-exactly through the little-endian WKB encoding
  private val genDouble: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1e308, 1e308),
    Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, Double.MinValue))

  property("wkb point roundtrip is bit-exact") =
    forAll(genDouble, genDouble) { (x, y) =>
      Values.parsePointWkb(Values.pointToWkb(x, y))
        .contains((x, y))
    }

  property("wkt point roundtrip survives the decimal detour") =
    forAll(genDouble, genDouble) { (x, y) =>
      // Double→String→Double is exact by JLS toString contract
      Values.parsePointWkt(Values.pointToWkt(x, y)).contains((x, y))
    }

  // datetime: epoch-µs → "yyyy-MM-dd HH:mm:ss.SSSSSS" → epoch-µs is
  // the identity across the whole four-digit-year range, negatives
  // (pre-1970) included
  private val genMicros: Gen[Long] = Gen.chooseNum(
    java.time.LocalDateTime.of(1, 1, 1, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L,
    java.time.LocalDateTime.of(9999, 12, 31, 23, 59, 59)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + 999999L)

  property("datetime micros roundtrip, pre-epoch included") =
    forAll(genMicros) { us =>
      Values.dateTimeToMicros(Values.microsToDateTime(us)) == us
    }

  property("date-only strings parse as midnight") =
    forAll(Gen.chooseNum(1, 9999), Gen.chooseNum(1, 12)) { (y, m) =>
      val d = f"$y%04d-$m%02d-01"
      Values.dateTimeToMicros(d) == Values.dateTimeToMicros(s"$d 00:00:00")
    }

  // bit(n): the big-endian byte fold equals the BigInt interpretation
  property("bitToLong equals the BigInt big-endian value") =
    forAll(Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))) { bs =>
      val bytes = bs.toArray
      Values.bitToLong(bytes) == BigInt(1, bytes).longValue
    }

  property("unix timestamp arithmetic is exact") =
    forAll(Gen.chooseNum(-62135596800L, 253402300799L),
      Gen.chooseNum(0, 999999)) { (sec, us) =>
      val got = Values.unixTimestampToMicros(sec, us)
      got / 1000000L * 1000000L + got % 1000000L == got &&
        got == sec * 1000000L + us
    }

  // charsets: every alias resolves, and single-byte charsets decode
  // every byte to SOME char (no exceptions) — the property the
  // permissive record path relies on
  private val aliases = Seq("latin1", "utf8mb4", "gbk", "sjis", "koi8r",
    "cp1251", "greek", "hebrew", "tis620", "ascii", "binary", "euckr")

  property("known charset aliases decode arbitrary bytes without throwing") =
    forAll(Gen.oneOf(aliases),
      Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))) { (cs, bs) =>
      Values.decodeString(bs.toArray, cs) != null
    }

  property("latin1 means windows-1252: 0x80 is the euro sign") =
    Prop(Values.decodeString(Array(0x80.toByte), "latin1") == "€")
}
