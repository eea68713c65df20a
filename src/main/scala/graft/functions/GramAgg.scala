package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** One-pass Gram/covariance statistics over an `ARRAY<DOUBLE>` column
  * — the corpus-wide moment pass a PCA/whitening stage (emb04) needs
  * at 100 TB: count, per-dimension sums, and the upper-triangular sum
  * of component products, in a single aggregation whose state is
  * O(d²) longs (d=64 → ~34 KB), so ONE buffer per task crosses the
  * exchange and ONE row reaches the driver.
  *
  * Accumulation is INTEGER, like [[VecLongSumAgg]] and tx09: each
  * component is quantized once to `round(x · 2^16)` and every
  * downstream sum is exact integer arithmetic — associative and
  * commutative, so the result is bit-identical under any partitioning
  * or merge order (double sums would drift by partition layout, and a
  * moment matrix that flaps by ulps yields eigenvectors that flap by
  * much more). At |x| ≤ 4 the 2^-16 quantization step sits below
  * float32 input noise; the bias is a property of the DATA ingest, not
  * of the partitioning.
  *
  * Width: a quantized component is ≤ ~2^18, a product ≤ ~2^36; the
  * product cells accumulate in 128-bit (hi, lo) pairs — overflow-free
  * past 2^90 rows — because a single-long cell would cap a task at
  * ~2^27 rows and, worse, the MERGE of many task partials overflows
  * first. Per-dimension sums stay single longs (≤ 2^18·n: safe past
  * 2^45 rows — beyond any real corpus; guarded with addExact so a
  * violation fails loudly instead of wrapping).
  *
  * Layout of the buffer (longs): [d, n, msum(d), (hi,lo)·d(d+1)/2],
  * sized lazily from the first row. eval() returns ARRAY<DOUBLE>
  * [d, n, msum…, gram…] — one deterministic int→double conversion at
  * the very edge.
  */
case class GramMatrixAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import GramMatrixAgg._

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gram_matrix"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_matrix requires ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val xs = v.asInstanceOf[ArrayData]
    val d = xs.numElements()
    val b = if (buf.isEmpty) {
      val nb = new Array[Long](2 + d + d * (d + 1))
      nb(0) = d
      nb
    } else {
      require(buf(0) == d,
        s"gram_matrix: ragged input — saw dim ${buf(0)}, row has $d")
      buf
    }
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      // null elements quantize as 0 (the VecLongSumAgg convention)
      q(i) = if (xs.isNullAt(i)) 0L else Math.round(xs.getDouble(i) * Scale)
      i += 1
    }
    b(1) += 1
    i = 0
    while (i < d) {
      b(2 + i) = Math.addExact(b(2 + i), q(i))
      i += 1
    }
    var cell = 2 + d
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        add128(b, cell, q(i) * q(j))
        cell += 2
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other
    require(buf(0) == other(0),
      s"gram_matrix: merging dims ${buf(0)} and ${other(0)}")
    val d = buf(0).toInt
    buf(1) += other(1)
    var i = 0
    while (i < d) {
      buf(2 + i) = Math.addExact(buf(2 + i), other(2 + i))
      i += 1
    }
    var cell = 2 + d
    val cells = d * (d + 1) / 2
    var c = 0
    while (c < cells) {
      add128pair(buf, cell, other(cell), other(cell + 1))
      cell += 2
      c += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf.isEmpty) return null
    val d = buf(0).toInt
    val cells = d * (d + 1) / 2
    val out = new Array[Double](2 + d + cells)
    out(0) = d.toDouble
    out(1) = buf(1).toDouble
    var i = 0
    while (i < d) { out(2 + i) = buf(2 + i).toDouble; i += 1 }
    var c = 0
    while (c < cells) {
      out(2 + d + c) = toDouble128(buf(2 + d + 2 * c), buf(2 + d + 2 * c + 1))
      c += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): GramMatrixAgg =
    copy(child = c)
}

object GramMatrixAgg {
  /** Fixed-point scale for input quantization: 2^16. */
  val Scale: Double = 65536.0

  /** 128-bit (hi, lo) += signed 64-bit v, two's complement. The carry
    * out of the unsigned low-word add is `(a&b | (a|b)&~r) >>> 63`;
    * the sign extension of v contributes `v >> 63` to the high word.
    * Property-checked against BigInteger in NumericProps. */
  private[graft] def add128(s: Array[Long], idx: Int, v: Long): Unit = {
    val lo = s(idx + 1)
    val r = lo + v
    val carry = ((lo & v) | ((lo | v) & ~r)) >>> 63
    s(idx) = s(idx) + (v >> 63) + carry
    s(idx + 1) = r
  }

  /** 128-bit (hi, lo) += 128-bit (ohi, olo). */
  private[graft] def add128pair(
      s: Array[Long], idx: Int, ohi: Long, olo: Long): Unit = {
    val lo = s(idx + 1)
    val r = lo + olo
    val carry = ((lo & olo) | ((lo | olo) & ~r)) >>> 63
    s(idx) = s(idx) + ohi + carry
    s(idx + 1) = r
  }

  /** Signed 128-bit (hi, lo) → double with ONE correctly-rounded
    * conversion (BigInteger.doubleValue). Summing the two words in
    * double arithmetic instead would cancel catastrophically whenever
    * hi is a small sign extension (-1·2^64 + (2^64−x) rounds the
    * large intermediate to a 2^11 multiple before the cancellation) —
    * values that fit a long must convert EXACTLY. Called once per
    * cell per GROUP, off the hot path. */
  private[graft] def toDouble128(hi: Long, lo: Long): Double =
    ((BigInt(hi) << 64) + (BigInt(lo) & ((BigInt(1) << 64) - 1))).doubleValue
}
