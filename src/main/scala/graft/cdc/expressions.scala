package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expressions for the codec's lazy header reads —
  * they stay inside whole-stage codegen (doGenCode emits a direct
  * static call, no UDF boxing), so filtering a billion raw records on
  * header timestamp never materializes the record tail. Mirrors the
  * reference's lazy-parse hot path (ref: LazyParseRecordImpl.java
  * getTimestamp/getOperationType before full parse).
  */
abstract class CdcHeaderExpression extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  protected def staticCall: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.RecordCodec.$staticCall($c)")
}

/** Record id from raw bytes, no tail parse. */
case class CdcHeaderId(child: Expression) extends CdcHeaderExpression {
  override def dataType: DataType = LongType
  override protected def staticCall: String = "headerId"
  override protected def nullSafeEval(v: Any): Any =
    RecordCodec.headerId(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): CdcHeaderId = copy(c)
}

/** Commit timestamp (epoch µs) from raw bytes. */
case class CdcHeaderTsUs(child: Expression) extends CdcHeaderExpression {
  override def dataType: DataType = LongType
  override protected def staticCall: String = "headerTsUs"
  override protected def nullSafeEval(v: Any): Any =
    RecordCodec.headerTsUs(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): CdcHeaderTsUs = copy(c)
}

/** Operation code from raw bytes (join with [[Op.all]] for the name). */
case class CdcHeaderOpCode(child: Expression) extends CdcHeaderExpression {
  override def dataType: DataType = IntegerType
  override protected def staticCall: String = "headerOpCode"
  override protected def nullSafeEval(v: Any): Any =
    RecordCodec.headerOpCode(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): CdcHeaderOpCode = copy(c)
}

/** Column-level API (ExpressionUtils bridges Column <-> Expression in
  * Spark 4's classic API). */
object CdcFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def cdc_header_id(c: Column): Column = column(CdcHeaderId(expression(c)))
  def cdc_header_ts_us(c: Column): Column = column(CdcHeaderTsUs(expression(c)))
  def cdc_header_op_code(c: Column): Column = column(CdcHeaderOpCode(expression(c)))
}
