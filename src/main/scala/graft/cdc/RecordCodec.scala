package graft.cdc

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.unsafe.types.UTF8String

/** Binary codec for [[ChangeRecord]] with a fixed-offset header so the
  * hot fields (id, timestamps, operation) are readable WITHOUT parsing
  * the variable-length tail — the Spark-native analogue of the
  * reference's direct-from-bytes lazy deserialization (ref:
  * formats/internal/record/impl/LazyParseRecordImpl.java,
  * LazyRecordDeserializer.java: "deserialize binary bytes to DtsRecord
  * without going through a generic avro record").
  *
  * Layout (little-endian):
  * {{{
  *   0  u8   magic 'G'      1  u8   version (1-4)
  *   2  i64  id             10 i64  tsUs
  *   18 i64  bornUs         26 u8   opCode
  *   27 ...  varlen tail: txId, db, tbl, pkNames, before, after
  *   v2 adds: props map, sourceType str, sourceVersion str
  *   v3 adds: ukNames (i32 count, -1 = none declared, + str*) — the
  *     first unique-key index (ref RecordSchema.getUniqueIndexInfo)
  *   v4 adds: transSeq i64 (ref DtsRecord.getTransSeq, −1 = not
  *     carried) + fkParents (i32 count, -1 = none; per entry:
  *     str parentSchema, str parentDb, str parentTbl, i32 nCols +
  *     (str parentCol, str childCol)* sorted by parentCol — the
  *     reference's TreeMap order, ForeignKeyIndexInfo.java:12)
  * }}}
  * str := i32 byteLen (-1 = null) + utf8; map := i32 n + (str,str)*.
  * Version evolution: the header is fixed across versions (lazy
  * header reads never care), new fields append to the tail, and the
  * decoder branches on the version byte — v1 segments written in
  * round 1 stay readable (ref: the reference's lazy record carries a
  * version for the same reason, LazyParseRecordImpl.java).
  */
object RecordCodec {

  val Magic: Byte = 'G'
  val Version: Byte = 4
  val HeaderLen: Int = 27

  // ------------------------------------------------------------ encode

  def encode(r: ChangeRecord): Array[Byte] = encode(r, Version)

  /** Version-explicit encode (v1 kept for wire-compat tests). */
  private[graft] def encode(r: ChangeRecord, version: Byte): Array[Byte] = {
    val bos = new ByteArrayOutputStream(256)
    val out = new DataOutputStream(bos)
    // header, little-endian via ByteBuffer for the fixed block
    val head = ByteBuffer.allocate(HeaderLen).order(ByteOrder.LITTLE_ENDIAN)
    head.put(Magic).put(version)
    head.putLong(r.id).putLong(r.tsUs).putLong(r.bornUs)
    head.put(Op.code(r.op))
    out.write(head.array())
    writeStr(out, r.transactionId)
    writeStr(out, r.db)
    writeStr(out, r.tbl)
    writeI32(out, r.pkNames.length)
    r.pkNames.foreach(writeStr(out, _))
    writeMap(out, r.before)
    writeMap(out, r.after)
    if (version >= 2) {
      writeMap(out, r.props)
      writeStr(out, r.sourceType)
      writeStr(out, r.sourceVersion)
    }
    if (version >= 3) {
      if (r.ukNames == null) writeI32(out, -1)
      else {
        writeI32(out, r.ukNames.length)
        r.ukNames.foreach(writeStr(out, _))
      }
    }
    if (version >= 4) {
      writeI64(out, r.transSeq)
      if (r.fkParents == null) writeI32(out, -1)
      else {
        writeI32(out, r.fkParents.length)
        r.fkParents.foreach { fk =>
          writeStr(out, fk.parentSchema)
          writeStr(out, fk.parentDb)
          writeStr(out, fk.parentTbl)
          // canonical pair order = sorted by parent column (the
          // reference keeps referencedColumn in a TreeMap)
          val pairs = fk.parentCols.zip(fk.childCols).sortBy(_._1)
          writeI32(out, pairs.length)
          pairs.foreach { case (p, c) => writeStr(out, p); writeStr(out, c) }
        }
      }
    }
    bos.toByteArray
  }

  private def writeI64(out: DataOutputStream, v: Long): Unit = {
    writeI32(out, (v & 0xffffffffL).toInt)
    writeI32(out, (v >>> 32).toInt)
  }

  private def writeI32(out: DataOutputStream, v: Int): Unit = {
    // little-endian i32
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  private def writeStr(out: DataOutputStream, s: String): Unit =
    if (s == null) writeI32(out, -1)
    else {
      val b = s.getBytes(StandardCharsets.UTF_8)
      writeI32(out, b.length); out.write(b)
    }

  private def writeMap(out: DataOutputStream, m: Map[String, String]): Unit = {
    if (m == null) { writeI32(out, -1); return }
    writeI32(out, m.size)
    // sorted keys => canonical bytes (stable across Map implementations)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      writeStr(out, k); writeStr(out, v)
    }
  }

  // ---------------------------------------------------- lazy header gets

  /** Hot-path reads: no allocation, no tail parse. */
  def headerId(bytes: Array[Byte]): Long = getLongLE(bytes, 2)
  def headerTsUs(bytes: Array[Byte]): Long = getLongLE(bytes, 10)
  def headerBornUs(bytes: Array[Byte]): Long = getLongLE(bytes, 18)
  def headerOp(bytes: Array[Byte]): String = Op.fromCode(bytes(26))
  def headerOpCode(bytes: Array[Byte]): Int = bytes(26).toInt

  private def getLongLE(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  /** Prefix-only (db, tbl) read for per-table subscription filtering
    * (ref: DTSSubscribeTableSourceFactory.java `table.name`): skips
    * txId by length and stops before pkNames/before/after — a record
    * for a non-selected table never has its tail parsed. */
  def headerTable(bytes: Array[Byte]): (String, String) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(HeaderLen)
    skipStr(buf) // txId
    val db = readStr(buf)
    val tbl = readStr(buf)
    (db, tbl)
  }

  private def skipStr(buf: ByteBuffer): Unit = {
    val n = buf.getInt
    if (n > 0) buf.position(buf.position() + n)
  }

  /** Test-observable count of FULL record decodes (tail included) —
    * lets specs prove that table-filtered or ts-skipped records never
    * paid the tail parse. Monotone; compare deltas. */
  val fullDecodes = new java.util.concurrent.atomic.AtomicLong(0L)

  // ------------------------------------------------------------ decode

  def decode(bytes: Array[Byte]): ChangeRecord = {
    fullDecodes.incrementAndGet()
    require(bytes.length >= HeaderLen && bytes(0) == Magic,
      s"not a graft cdc record (${bytes.length} bytes)")
    val version = bytes(1)
    require(version >= 1 && version <= Version,
      s"unsupported codec version $version")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(2)
    val id = buf.getLong; val ts = buf.getLong; val born = buf.getLong
    val op = Op.fromCode(buf.get)
    val tx = readStr(buf); val db = readStr(buf); val tbl = readStr(buf)
    val nPk = buf.getInt
    val pks = (0 until nPk).map(_ => readStr(buf))
    val before = readMap(buf)
    val after = readMap(buf)
    val (props, srcType, srcVer) =
      if (version >= 2) (readMap(buf), readStr(buf), readStr(buf))
      else (null, null, null)
    val uks =
      if (version < 3) null
      else {
        val n = buf.getInt
        if (n < 0) null else (0 until n).map(_ => readStr(buf))
      }
    val (transSeq, fks) =
      if (version < 4) (-1L, null)
      else {
        val seq = buf.getLong
        val n = buf.getInt
        val fk =
          if (n < 0) null
          else (0 until n).map { _ =>
            val ps = readStr(buf); val pd = readStr(buf); val pt = readStr(buf)
            val nc = buf.getInt
            val pairs = (0 until nc).map(_ => (readStr(buf), readStr(buf)))
            FkParent(ps, pd, pt, pairs.map(_._1), pairs.map(_._2))
          }
        (seq, fk)
      }
    ChangeRecord(id, tx, ts, born, op, db, tbl, pks, before, after,
      props, srcType, srcVer, uks, transSeq, fks)
  }

  // ----------------------------------------------- direct-to-row decode

  /** Column-pruned decode plan: `ordinals(i)` = source-schema ordinal
    * of output column i (CdcSource.schema order: 0 id, 1 txId, 2 tsUs,
    * 3 bornUs, 4 op, 5 db, 6 tbl, 7 pkNames, 8 before, 9 after,
    * 10 props, 11 sourceType, 12 sourceVersion, 13 ukNames,
    * 14 transSeq, 15 fkParents). Precomputed once per
    * scan so the per-record loop allocates nothing extra. */
  final class RowProjection(val ordinals: Array[Int]) extends Serializable {
    val need: Array[Int] = Array.fill(16)(-1)
    ordinals.zipWithIndex.foreach { case (src, i) => need(src) = i }
    /** Wire order of the variable-length tail sections. */
    val wire: Array[Int] = Array(1, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    /** Index into [[wire]] of the last section we must parse; -1 if
      * the header alone satisfies the projection. */
    val lastWire: Int = {
      var last = -1
      var i = 0
      while (i < wire.length) { if (need(wire(i)) >= 0) last = i; i += 1 }
      last
    }
    /** Does this projection ever parse past the (db, tbl) prefix? */
    val parsesTail: Boolean = lastWire >= 3
  }

  /** Decode ONLY the projected columns ([[RowProjection]]): Catalyst's
    * column pruning reaching the binary wire format — a query that
    * touches just header-ish fields (op stats, ts windows, per-table
    * routing) never parses row images at all, the lazy-parse claim as
    * an automatic optimizer outcome rather than a hand-written fast
    * path. Sections before the last needed one are SKIPPED by length
    * (no allocation); parsing stops at the last needed section. */
  def decodeProjected(
      bytes: Array[Byte], proj: RowProjection): GenericInternalRow = {
    if (proj.parsesTail) fullDecodes.incrementAndGet()
    require(bytes.length >= HeaderLen && bytes(0) == Magic,
      s"not a graft cdc record (${bytes.length} bytes)")
    val version = bytes(1)
    require(version >= 1 && version <= Version,
      s"unsupported codec version $version")
    val out = new Array[Any](proj.ordinals.length)
    val need = proj.need
    if (need(0) >= 0) out(need(0)) = headerId(bytes)
    if (need(2) >= 0) out(need(2)) = headerTsUs(bytes)
    if (need(3) >= 0) out(need(3)) = headerBornUs(bytes)
    if (need(4) >= 0) {
      val c = bytes(26) & 0xff
      out(need(4)) = if (c < OpUtf8.length) OpUtf8(c) else UnknownUtf8
    }
    if (proj.lastWire >= 0) {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      buf.position(HeaderLen)
      var w = 0
      while (w <= proj.lastWire) {
        val ord = proj.wire(w)
        val absent = (version < 2 && ord >= 10) ||
          (version < 3 && ord >= 13) || (version < 4 && ord >= 14)
        val slot = need(ord)
        if (absent) {
          // a missing transSeq surfaces as its −1 sentinel (the
          // column is non-null, matching the model's default)
          if (slot >= 0) out(slot) = if (ord == 14) -1L else null
        } else ord match {
          case 1 | 5 | 6 | 11 | 12 =>
            if (slot >= 0) out(slot) = readUtf8(bytes, buf) else skipStr(buf)
          case 7 | 13 =>
            val n = buf.getInt
            if (slot >= 0) {
              if (n < 0) out(slot) = null
              else {
                val arr = new Array[Any](n)
                var i = 0
                while (i < n) { arr(i) = readUtf8(bytes, buf); i += 1 }
                out(slot) =
                  new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
              }
            } else {
              var i = 0
              while (i < n) { skipStr(buf); i += 1 }
            }
          case 14 =>
            if (slot >= 0) out(slot) = buf.getLong
            else buf.position(buf.position() + 8)
          case 15 =>
            val n = buf.getInt
            if (slot >= 0 && n >= 0) {
              val arr = new Array[Any](n)
              var i = 0
              while (i < n) {
                val ps = readUtf8(bytes, buf)
                val pd = readUtf8(bytes, buf)
                val pt = readUtf8(bytes, buf)
                val nc = buf.getInt
                val pc = new Array[Any](nc)
                val cc = new Array[Any](nc)
                var j = 0
                while (j < nc) {
                  pc(j) = readUtf8(bytes, buf)
                  cc(j) = readUtf8(bytes, buf)
                  j += 1
                }
                arr(i) = new GenericInternalRow(Array[Any](ps, pd, pt,
                  new org.apache.spark.sql.catalyst.util.GenericArrayData(pc),
                  new org.apache.spark.sql.catalyst.util.GenericArrayData(cc)))
                i += 1
              }
              out(slot) =
                new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
            } else if (n >= 0) {
              var i = 0
              while (i < n) {
                skipStr(buf); skipStr(buf); skipStr(buf)
                val nc = buf.getInt
                var j = 0
                while (j < nc) { skipStr(buf); skipStr(buf); j += 1 }
                i += 1
              }
            } else if (slot >= 0) out(slot) = null
          case _ => // 8, 9, 10: the maps
            if (slot >= 0) out(slot) = readMapData(bytes, buf)
            else skipMap(buf)
        }
        w += 1
      }
    }
    new GenericInternalRow(out)
  }

  // interned op strings (tiny fixed vocabulary — one allocation ever)
  private val OpUtf8: IndexedSeq[UTF8String] =
    Op.all.map(UTF8String.fromString)
  private val UnknownUtf8: UTF8String = UTF8String.fromString(Op.Unknown)

  /** UTF8String slice over the record's own bytes — no charset decode,
    * no java.lang.String. */
  private def readUtf8(bytes: Array[Byte], buf: ByteBuffer): UTF8String = {
    val n = buf.getInt
    if (n < 0) null
    else {
      val off = buf.position()
      buf.position(off + n)
      UTF8String.fromBytes(bytes, off, n)
    }
  }

  /** Map kept in its canonical encoded (sorted-key) order — no re-sort. */
  private def readMapData(
      bytes: Array[Byte], buf: ByteBuffer): ArrayBasedMapData = {
    val n = buf.getInt
    if (n < 0) null
    else {
      val ks = new Array[Any](n)
      val vs = new Array[Any](n)
      var i = 0
      while (i < n) {
        ks(i) = readUtf8(bytes, buf)
        vs(i) = readUtf8(bytes, buf)
        i += 1
      }
      new ArrayBasedMapData(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(ks),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(vs))
    }
  }

  private def skipMap(buf: ByteBuffer): Unit = {
    val n = buf.getInt
    var i = 0
    while (i < n) { skipStr(buf); skipStr(buf); i += 1 }
  }

  private def readStr(buf: ByteBuffer): String = {
    val n = buf.getInt
    if (n < 0) null
    else {
      val b = new Array[Byte](n); buf.get(b)
      new String(b, StandardCharsets.UTF_8)
    }
  }

  private def readMap(buf: ByteBuffer): Map[String, String] = {
    val n = buf.getInt
    if (n < 0) null
    else (0 until n).map(_ => (readStr(buf), readStr(buf))).toMap
  }
}
