package graft.sources

import graft.cdc.{ChangeRecord, RecordCodec}
import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}

/** Chunk file format for the graft-cdc source: an append-only segment
  * of length-prefixed codec records with a stats footer, playing the
  * role of a Kafka log segment in the reference's fetch pipeline (ref:
  * internal/DtsKafkaConsumerThread.java) while staying a plain file a
  * 1000-executor cluster can split work over.
  *
  * {{{
  *   chunk  := record* footer
  *   record := i32 len, bytes[len]          (codec payload)
  *   footer := i64 minTsUs, i64 maxTsUs, i32 nRecords, i32 magic
  * }}}
  *
  * The footer gives O(1) min/max event-time per chunk — the source
  * prunes whole chunks on timestamp reposition without reading records
  * (the parquet-footer-stats play, SURVEY §5).
  */
object CdcChunkFile {

  val FooterMagic: Int = 0x47434443 // "GCDC"
  val FooterLen: Int = 8 + 8 + 4 + 4
  val Extension: String = ".gcl"

  def write(path: String, records: Seq[ChangeRecord]): Unit = {
    val out = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(path)))
    try {
      var minTs = Long.MaxValue
      var maxTs = Long.MinValue
      records.foreach { r =>
        val b = RecordCodec.encode(r)
        writeI32(out, b.length)
        out.write(b)
        if (r.tsUs < minTs) minTs = r.tsUs
        if (r.tsUs > maxTs) maxTs = r.tsUs
      }
      if (records.isEmpty) { minTs = 0L; maxTs = 0L }
      val foot = ByteBuffer.allocate(FooterLen).order(ByteOrder.LITTLE_ENDIAN)
      foot.putLong(minTs).putLong(maxTs)
      foot.putInt(records.length).putInt(FooterMagic)
      out.write(foot.array())
    } finally out.close()
  }

  final case class Footer(minTsUs: Long, maxTsUs: Long, nRecords: Int)

  /** O(1) stats read: footer only, never the records. */
  def readFooter(path: String): Footer = {
    val p = Paths.get(path)
    val size = Files.size(p)
    require(size >= FooterLen, s"$path too small for a cdc chunk")
    val ch = Files.newByteChannel(p)
    try {
      ch.position(size - FooterLen)
      val buf = ByteBuffer.allocate(FooterLen).order(ByteOrder.LITTLE_ENDIAN)
      while (buf.hasRemaining && ch.read(buf) >= 0) {}
      buf.flip()
      val minTs = buf.getLong; val maxTs = buf.getLong
      val n = buf.getInt; val magic = buf.getInt
      require(magic == FooterMagic, s"$path: bad footer magic")
      Footer(minTs, maxTs, n)
    } finally ch.close()
  }

  /** Iterate raw record payloads (caller decodes lazily or fully). */
  def readRawRecords(path: String): Iterator[Array[Byte]] = {
    val all = Files.readAllBytes(Paths.get(path))
    val end = all.length - FooterLen
    new Iterator[Array[Byte]] {
      private var pos = 0
      override def hasNext: Boolean = pos < end
      override def next(): Array[Byte] = {
        val len = ((all(pos) & 0xff)) | ((all(pos + 1) & 0xff) << 8) |
          ((all(pos + 2) & 0xff) << 16) | ((all(pos + 3) & 0xff) << 24)
        val b = java.util.Arrays.copyOfRange(all, pos + 4, pos + 4 + len)
        pos += 4 + len
        b
      }
    }
  }

  def readRecords(path: String): Iterator[ChangeRecord] =
    readRawRecords(path).map(RecordCodec.decode)

  /** Sorted chunk listing for a directory (name order = time order,
    * the writer names chunks monotonically). */
  def listChunks(dir: String): Seq[String] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    import scala.jdk.CollectionConverters._
    // Files.list holds a directory fd until closed; the micro-batch
    // source lists on every trigger, so close eagerly (not at GC)
    val stream = Files.list(d)
    try stream.iterator().asScala
      .filter(_.toString.endsWith(Extension))
      .map(_.toString).toSeq.sorted
    finally stream.close()
  }

  private def writeI32(out: DataOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
}
