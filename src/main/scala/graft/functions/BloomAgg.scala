package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom-filter BUILD as a one-pass native aggregate: folds a column
  * of 60-bit key hashes ([[graft.OracleSafe.hash60]]) into a
  * fixed-size bitmap (`ARRAY<BIGINT>` words). The membership sketch a
  * streaming-ingest pipeline holds its seen-set in: the state is
  * [[BloomBitsAgg.Bits]] BITS regardless of how many keys went in
  * (an exact seen-set of 10¹⁰ URLs is ~80 GB of hashes; the sketch is
  * whatever false-positive budget you size it to), updates are
  * k = [[BloomBitsAgg.K]] bit-sets, and merge is elementwise OR —
  * commutative/associative/idempotent, so map-side partial
  * aggregation ships one 8 KB bitmap per task and ANY merge order
  * yields the identical sketch (what lets dd12's oracle replay it).
  *
  * Probe positions use Kirsch-Mitzenmacher double hashing —
  * pos_i = (h mod B + i · (1 + (h div B) mod (B−1))) mod B — pure
  * integer math, so the probe side stays declarative (codegen'd
  * bit tests against the broadcast bitmap) and the oracle computes
  * the same positions exactly.
  */
case class BloomBitsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import BloomBitsAgg._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_bits takes a BIGINT hash column (OracleSafe.hash60), " +
        s"got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // mask to the declared 60-bit domain: hash60 inputs are already
      // non-negative, but the injected bloom_bits SQL function accepts
      // any BIGINT (e.g. Spark's hash(), which goes negative) — an
      // unmasked negative h makes h % Bits negative and indexes out of
      // bounds. The probe expressions apply the same mask.
      val h = v.asInstanceOf[Long] & Mask60
      val h1 = h % Bits
      val h2 = 1L + (h / Bits) % (Bits - 1)
      var i = 0
      while (i < K) {
        val pos = ((h1 + i * h2) % Bits).toInt
        buf(pos >> 6) |= 1L << (pos & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Words) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * Words)
    var i = 0
    while (i < Words) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](Words)
    var i = 0
    while (i < Words) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): BloomBitsAgg =
    copy(child = c)
}

object BloomBitsAgg {
  /** 2^16 bits = 8 KB. Sized for the gate corpora (n_seen ≤ ~25k at
    * sf0.1 ⇒ kn/B ≤ 1.5, fp ≤ ~3%); a production seen-set scales B to
    * its fp budget — the state is the knob, not the algorithm. */
  val Bits = 65536L
  val Words: Int = (Bits / 64).toInt
  val K = 4
  /** Declared input domain (60-bit hash60 values); update() and the
    * probe expression both mask with this so garbage inputs degrade
    * to wrong-bucket lookups instead of crashes. */
  val Mask60: Long = (1L << 60) - 1

  /** The probe-side SQL expression over hash column `h` and bitmap
    * array column `bitmapCol` — THE single definition of the
    * Kirsch-Mitzenmacher position math, kept in lock-step with
    * [[BloomBitsAgg.update]] (dd12's query and the streaming
    * admission gate both build from here; a drift between build and
    * probe would silently break the no-false-negative guarantee). */
  def probeHitExpr(bitmapCol: String, h: String = "h"): String = {
    val m = s"($h & $Mask60)"
    def pos(i: Int) =
      s"($m % $Bits + $i * (1L + ($m div $Bits) % ${Bits - 1})) % $Bits"
    (0 until K).map { i =>
      s"(element_at($bitmapCol, CAST(${pos(i)} div 64 AS INT) + 1) & " +
        s"shiftleft(1L, CAST(${pos(i)} % 64 AS INT))) != 0L"
    }.mkString("(", ") AND (", ")")
  }
}
