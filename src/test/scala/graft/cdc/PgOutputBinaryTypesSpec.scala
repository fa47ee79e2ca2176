package graft.cdc

import graft.cdc.PgOutput._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.ByteBuffer

/** Binary-format ('b') value decode breadth: the date/time family,
  * numeric, interval, bytea, and arrays decode to the exact Postgres
  * `*_out` text renderings. Wire bytes are hand-assembled per the
  * documented send formats (date_send/time_send/numeric_send/
  * interval_send/array_send), so the decoder is checked against the wire
  * layout, not an encoder of our own. The reference decodes only
  * bool/jsonb/timestamp/text/uuid/bytea and crashes on the rest
  * (decoder.ex:256-280); its oid catalog names the full space
  * (oid_database.ex:36-170) — this covers that gap. */
class PgOutputBinaryTypesSpec extends AnyFunSuite {

  private def i16(v: Int) = ByteBuffer.allocate(2).putShort(v.toShort).array()
  private def i32(v: Int) = ByteBuffer.allocate(4).putInt(v).array()
  private def i64(v: Long) = ByteBuffer.allocate(8).putLong(v).array()
  private def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray

  // ------------------------------------------------------------------- date

  test("date: int32 days since 2000-01-01") {
    assert(decodeBinaryValue("date", i32(0)) == "2000-01-01")
    assert(decodeBinaryValue("date", i32(366)) == "2001-01-01") // 2000 is leap
    assert(decodeBinaryValue("date", i32(-1)) == "1999-12-31")
    assert(decodeBinaryValue("date", i32(9131)) == "2024-12-31")
  }

  // ------------------------------------------------------------------- time

  test("time: micros since midnight, fraction trimmed like time_out") {
    assert(decodeBinaryValue("time", i64(0L)) == "00:00:00")
    val t = ((13L * 3600 + 30 * 60 + 25) * 1000000L) + 123450L
    assert(decodeBinaryValue("time", i64(t)) == "13:30:25.12345")
    assert(decodeBinaryValue("time", i64(1L)) == "00:00:00.000001")
  }

  test("timetz: zone stored seconds-west; displayed offset is east") {
    val noon = i64(12L * 3600 * 1000000L)
    assert(decodeBinaryValue("timetz", cat(noon, i32(-7200))) == "12:00:00+02")
    assert(decodeBinaryValue("timetz", cat(noon, i32(-19800))) == "12:00:00+05:30")
    assert(decodeBinaryValue("timetz", cat(noon, i32(18000))) == "12:00:00-05")
    assert(decodeBinaryValue("timetz", cat(noon, i32(0))) == "12:00:00+00")
  }

  test("timetz: seconds component of the offset survives (EncodeTimezone)") {
    val noon = i64(12L * 3600 * 1000000L)
    // +05:30:30 east = 19830 s east = -19830 stored (seconds west)
    assert(decodeBinaryValue("timetz", cat(noon, i32(-19830))) ==
      "12:00:00+05:30:30")
    // seconds with zero minutes still forces the minutes field: +05:00:30
    assert(decodeBinaryValue("timetz", cat(noon, i32(-18030))) ==
      "12:00:00+05:00:30")
    assert(decodeBinaryValue("timetz", cat(noon, i32(19830))) ==
      "12:00:00-05:30:30")
  }

  // ---------------------------------------------------------------- numeric

  private def numeric(digits: Seq[Int], weight: Int, sign: Int,
      dscale: Int): Array[Byte] =
    cat(Seq(i16(digits.size), i16(weight), i16(sign), i16(dscale)) ++
      digits.map(i16): _*)

  test("numeric: base-10000 digits to exact decimal text") {
    // 1234567.8901 = 123·10000¹ + 4567·10000⁰ + 8901·10000⁻¹
    assert(decodeBinaryValue("numeric",
      numeric(Seq(123, 4567, 8901), 1, 0x0000, 4)) == "1234567.8901")
    assert(decodeBinaryValue("numeric",
      numeric(Seq(123, 4567, 8901), 1, 0x4000, 4)) == "-1234567.8901")
    assert(decodeBinaryValue("numeric",
      numeric(Seq(1), -1, 0x0000, 4)) == "0.0001")
    assert(decodeBinaryValue("numeric", numeric(Nil, 0, 0x0000, 0)) == "0")
    assert(decodeBinaryValue("numeric", numeric(Nil, 0, 0x0000, 2)) == "0.00")
    assert(decodeBinaryValue("numeric",
      numeric(Seq(42), 0, 0x0000, 0)) == "42")
  }

  test("numeric specials: NaN and infinities") {
    assert(decodeBinaryValue("numeric", numeric(Nil, 0, 0xC000, 0)) == "NaN")
    assert(decodeBinaryValue("numeric", numeric(Nil, 0, 0xD000, 0)) == "Infinity")
    assert(decodeBinaryValue("numeric", numeric(Nil, 0, 0xF000, 0)) == "-Infinity")
  }

  // ---------------------------------------------------------------- interval

  private def interval(micros: Long, days: Int, months: Int) =
    cat(i64(micros), i32(days), i32(months))

  test("interval: postgres-style text with zero parts omitted") {
    val t = (4L * 3600 + 5 * 60 + 6) * 1000000L
    assert(decodeBinaryValue("interval", interval(t, 3, 14)) ==
      "1 year 2 mons 3 days 04:05:06")
    assert(decodeBinaryValue("interval", interval(0, 0, 0)) == "00:00:00")
    assert(decodeBinaryValue("interval", interval(0, 1, 0)) == "1 day")
    assert(decodeBinaryValue("interval", interval(4500000L, 0, 0)) ==
      "00:00:04.5")
    // negative units pluralize like interval_out (n != 1 → plural)
    assert(decodeBinaryValue("interval", interval(0, 0, -14)) ==
      "-1 years -2 mons")
    assert(decodeBinaryValue("interval", interval(-1000000L, 0, 0)) ==
      "-00:00:01")
  }

  // ------------------------------------------------------------------ bytea

  test("bytea: \\x-prefixed lowercase hex (bytea_out)") {
    assert(decodeBinaryValue("bytea",
      Array(0xde.toByte, 0xad.toByte, 0x01.toByte)) == "\\xdead01")
    assert(decodeBinaryValue("bytea", Array.emptyByteArray) == "\\x")
  }

  // ------------------------------------------------------------------ arrays

  private def arr(elemOid: Int, hasNull: Boolean,
      elems: Seq[Option[Array[Byte]]]): Array[Byte] =
    cat(Seq(i32(1), i32(if (hasNull) 1 else 0), i32(elemOid),
      i32(elems.size), i32(1)) ++
      elems.map {
        case Some(b) => cat(i32(b.length), b)
        case None => i32(-1)
      }: _*)

  test("_int4 array: {1,2,3}; NULL elements render as NULL") {
    assert(decodeBinaryValue("_int4",
      arr(23, hasNull = false, Seq(Some(i32(1)), Some(i32(2)), Some(i32(3)))))
      == "{1,2,3}")
    assert(decodeBinaryValue("_int4",
      arr(23, hasNull = true, Seq(Some(i32(7)), None))) == "{7,NULL}")
  }

  test("_text array: array_out quoting for spaces, quotes, empties, NULL-lookalikes") {
    def t(s: String) = Some(s.getBytes("UTF-8"))
    assert(decodeBinaryValue("_text",
      arr(25, hasNull = false,
        Seq(t("plain"), t("a b"), t(""), t("null"), t("""say "hi"""")))) ==
      """{plain,"a b","","null","say \"hi\""}""")
  }

  test("_numeric array: elements decode via their own oid") {
    val n = numeric(Seq(1, 5000), 0, 0x0000, 4)
    assert(decodeBinaryValue("_numeric",
      arr(1700, hasNull = false, Seq(Some(n)))) == "{1.5000}")
  }

  test("2-dim array nests braces row-major") {
    val data = cat(i32(2), i32(0), i32(23),
      i32(2), i32(1), i32(2), i32(1), // dims: 2 x 2
      cat(i32(4), i32(1)), cat(i32(4), i32(2)),
      cat(i32(4), i32(3)), cat(i32(4), i32(4)))
    assert(decodeBinaryValue("_int4", data) == "{{1,2},{3,4}}")
  }

  test("empty array (ndim 0) renders {}") {
    assert(decodeBinaryValue("_int4", cat(i32(0), i32(0), i32(23))) == "{}")
  }

  // --------------------------------------------- full pipeline with TBinary

  test("binary tuples flow through the decode pipeline typed") {
    val rel = RelationMeta(9, "public", "typed", "d", Seq(
      RelColumn("d", "date", isKey = false),
      RelColumn("n", "numeric", isKey = false),
      RelColumn("iv", "interval", isKey = false),
      RelColumn("xs", "_int8", isKey = false)))
    val out = decodeIterator(Iterator(
      (0L, encodeRelation(rel)),
      (1L, encodeBegin(1L, 1700000000000000L, 1)),
      (2L, encodeInsert(9, Seq(
        TBinary(i32(366)),
        TBinary(numeric(Seq(3, 1416), 0, 0x0000, 4)),
        TBinary(interval(0, 2, 0)),
        TBinary(cat(i32(1), i32(0), i32(20),
          i32(2), i32(1), cat(i32(8), i64(10L)), cat(i32(8), i64(20L))))))))
    ).toSeq
    assert(out.last.record == Map(
      "d" -> "2001-01-01", "n" -> "3.1416", "iv" -> "2 days",
      "xs" -> "{10,20}"))
  }

  test("unknown binary type falls back to visibly-opaque hex, not garbage") {
    assert(decodeBinaryValue("point", Array(1.toByte, 2.toByte)) == "\\x0102")
  }

  test("oid catalog: complete reference map, bijective, round-trips") {
    // the full built-in basic-type catalog (oid_database.ex:36-170):
    // every entry the reference names, same `_`-prefix array convention
    assert(TypeOids.size == 137)
    // one spot-check per region of the oid space
    assert(TypeOids("int2vector") == 22 && TypeOids("oidvector") == 30)
    assert(TypeOids("xml") == 142 && TypeOids("point") == 600)
    assert(TypeOids("cidr") == 650 && TypeOids("macaddr8") == 774)
    assert(TypeOids("money") == 790 && TypeOids("inet") == 869)
    assert(TypeOids("_polygon") == 1027 && TypeOids("aclitem") == 1033)
    assert(TypeOids("bit") == 1560 && TypeOids("varbit") == 1562)
    assert(TypeOids("refcursor") == 1790 && TypeOids("regclass") == 2205)
    assert(TypeOids("pg_lsn") == 3220 && TypeOids("tsvector") == 3614)
    assert(TypeOids("_int8range") == 3927 && TypeOids("regrole") == 4096)
    // bijective: no two names share an oid (the reverse lookup the
    // Relation decode path uses is well-defined)
    assert(TypeOids.values.toSet.size == TypeOids.size)
    // a Relation message carrying the NEW catalog regions round-trips
    // through encode→parse with the symbolic names intact
    val rel = RelationMeta(11, "public", "wide", "d", Seq(
      RelColumn("a", "inet", isKey = false),
      RelColumn("b", "tsvector", isKey = false),
      RelColumn("c", "_int4range", isKey = false),
      RelColumn("d", "money", isKey = false),
      RelColumn("e", "pg_lsn", isKey = true)))
    val parsed = parseRelation(encodeRelation(rel)).get
    assert(parsed.columns.map(_.typeName) ==
      Seq("inet", "tsvector", "_int4range", "money", "pg_lsn"))
    assert(parsed.columns.last.isKey)
    // and a genuinely unknown oid stays an explicit in-band marker
    // (extension types have no stable oid — the reference falls through
    // to the numeric id; `oid$N` is the same information, greppable)
    val unknown = RelationMeta(12, "public", "ext", "d",
      Seq(RelColumn("g", "oid54321", isKey = false)))
    // encodeRelation maps unknown names to text's oid (25) — build the
    // raw bytes by hand so the wire really carries 54321
    val raw = {
      val head = Array('R'.toByte) ++ i32(12) ++
        "public".getBytes("UTF-8") ++ Array(0.toByte) ++
        "ext".getBytes("UTF-8") ++ Array(0.toByte) ++
        Array('d'.toByte) ++ i16(1)
      head ++ Array(0.toByte) ++ "g".getBytes("UTF-8") ++ Array(0.toByte) ++
        i32(54321) ++ i32(-1)
    }
    assert(parseRelation(raw).get.columns.map(_.typeName) ==
      unknown.columns.map(_.typeName))
  }
}
