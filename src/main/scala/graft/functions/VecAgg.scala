package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Elementwise SUM over an `ARRAY<BIGINT>` column — the native
  * aggregate a label-centroid / feature-sum pass needs at 100 TB.
  *
  * The declarative alternative (`posexplode` → `groupBy(key, idx)` →
  * `sum`) multiplies every row by the vector dimensionality BEFORE the
  * exchange: a 10⁹-row × 64-dim corpus shuffles 6.4×10¹⁰ rows. This
  * aggregate keeps the fold inside the partition — Spark's partial
  * aggregation means each task ships ONE length-d long array per group,
  * and integer addition is associative/commutative so the result is
  * bit-identical under any partitioning or merge order (the reason the
  * oracle can hash-match it; double sums would not be).
  *
  * Null semantics: null arrays are skipped (SQL SUM convention); null
  * elements count as 0; ragged lengths fold over the common prefix and
  * keep the longest length seen (callers quantizing fixed-d embeddings
  * never hit either case — codified in PipelineSpec).
  */
case class VecLongSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_lsum"

  /** Analysis-time gate: [[addInto]]'s `getLong` reads 8-byte slots of
    * the unsafe array — an ARRAY<INT> (4-byte packing) would misread
    * memory into garbage sums, so anything but ARRAY<BIGINT> must be
    * rejected before execution (ADVICE r4). */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_lsum requires ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def addInto(buf: Array[Long], xs: ArrayData): Array[Long] = {
    val n = xs.numElements()
    val out = if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) out(i) += xs.getLong(i)
      i += 1
    }
    out
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else addInto(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    val (long, short) = if (buf.length >= other.length) (buf, other) else (other, buf)
    var i = 0
    while (i < short.length) { long(i) += short(i); i += 1 }
    long
  }

  /** Empty group (every input null) → NULL, matching SUM. */
  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

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

  override def withNewMutableAggBufferOffset(offset: Int): VecLongSumAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecLongSumAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): VecLongSumAgg =
    copy(child = c)
}
