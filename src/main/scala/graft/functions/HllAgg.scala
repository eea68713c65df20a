package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Deterministic HyperLogLog over 60-bit key hashes — the mergeable
  * approximate-distinct sketch (Flajolet et al. 2007), built so a
  * second engine can replay it EXACTLY (ref: the reference's
  * approx-distinct surface; Spark's own approx_count_distinct carries
  * engine-private sketch state, which is why q20 was stuck rows-only
  * through round 6).
  *
  * Input: a LongType column of [[graft.OracleSafe.hash60]] hashes
  * (60-bit md5 prefix — both engines hash the same string rendering).
  * m = 256 registers (p = 8): bucket = top 8 of the 60 bits, rho =
  * leading-zero count of the remaining 52-bit window + 1 ∈ [1, 53],
  * register = max rho. State is 256 bytes per group; merge is
  * elementwise max — commutative, associative, idempotent, so ANY
  * partitioning/merge order yields the identical sketch (the property
  * that makes the estimate reproducible across engines AND across a
  * 1000-executor shuffle; map-side partial aggregation ships 256
  * bytes per group per task).
  *
  * Estimate: raw HLL, E = alpha_m · m² / Σ 2^(-M[j]). The sum runs
  * over EXACT integers (Σ 2^(53-M[j]) ≤ 2^61 scaled by 2^53), so the
  * only floating-point ops are one constant chain, one cast and one
  * division — bit-identical in any IEEE engine evaluating the same
  * chain. No small-range linear-counting correction: that needs ln()
  * (libm results differ across engines); raw HLL is accurate for
  * n ≳ 3m ≈ 770 and the declared domain is large-cardinality columns.
  * Result: floor(E + 0.5) as BIGINT (ROUND spelled engine-neutrally).
  */
case class HllEstimateAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HllEstimateAgg._

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_estimate takes a BIGINT hash column (OracleSafe.hash60), " +
        s"got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      // mask to the declared 60-bit domain, like BloomBitsAgg.update:
      // hash60 inputs are already in range, but the injected
      // hll_estimate SQL function accepts any BIGINT (e.g. Spark's
      // hash(), which goes negative) — unmasked, a negative h would
      // silently skew bucket selection; masked, out-of-domain inputs
      // degrade to a well-defined re-hash of their low 60 bits
      // (ADVICE r7)
      val h = v.asInstanceOf[Long] & BloomBitsAgg.Mask60
      val bucket = (h >>> (60 - P)).toInt & (M - 1)
      val w = h & WindowMask
      val rho =
        if (w == 0L) (WindowBits + 1).toByte
        else (java.lang.Long.numberOfLeadingZeros(w) - (64 - WindowBits)
          + 1).toByte
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    // Z scaled by 2^WindowBits stays an exact integer: 256 terms, each
    // 2^(53-rho) ≤ 2^53, sum ≤ 2^61
    var z = 0L
    var i = 0
    while (i < M) { z += 1L << (WindowBits + 1 - buf(i)); i += 1 }
    math.floor(Numerator / z.toDouble + 0.5).toLong
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllEstimateAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllEstimateAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): HllEstimateAgg =
    copy(child = c)
}

object HllEstimateAgg {
  val P = 8
  val M: Int = 1 << P // 256 registers
  val WindowBits: Int = 60 - P // 52-bit rho window
  val WindowMask: Long = (1L << WindowBits) - 1
  /** alpha_m · m² · 2^53 — the exact constant chain q20's oracle SQL
    * repeats verbatim (every step is IEEE-identical: /256 and ×2^k are
    * exact scalings, the two roundings are shared). */
  val Numerator: Double =
    0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 9007199254740992.0

  /** [[Numerator]] spelled for the oracle (identical op chain). */
  val NumeratorSql: String =
    "0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 9007199254740992.0"
}
