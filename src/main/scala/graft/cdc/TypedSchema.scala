package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declared per-table schema applied to a `graft-cdc` frame's string
  * row images — the engine's analogue of the reference's
  * RecordSchema/RecordField + row-data deserialization (ref:
  * formats/internal/record/RecordSchema.java:18,
  * DTSSubscribeRowDataDeserializationSchema.java): a subscription
  * declares the table's fields and SQL types once, and every record's
  * `before`/`after` map is projected into typed columns.
  *
  * Conversions ride Catalyst casts (codegen'd, null-safe — a missing
  * map key or malformed value yields NULL, matching the reference's
  * lenient value conversion) with the [[Values]] rules for the
  * non-cast shapes (micros timestamps, bit fields).
  */
object TypedSchema {

  /** One declared field: name in the row image + target SQL type.
    * `sqlType` is any Spark cast target (`bigint`, `double`,
    * `decimal(18,4)`, `date`, …) or the extensions:
    * `timestamp_us` (string epoch-micros → TimestampType),
    * `bit(n)` (integer string → low n bits as bigint),
    * `time_us` (round 15: a TIME-only JDBC string — the
    * [[DtsDateTime]] time-only rendering the real wire delivers for
    * MySQL TIME columns, sign and >24 h hours included — → BIGINT
    * micros since midnight; Spark has no TIME type, so the micros
    * integer is the lossless, comparable carrier). */
  final case class RecordField(name: String, sqlType: String)

  /** Declared table schema (db/tbl select which records it applies to,
    * ref RecordSchema's database/table/fields/pk). */
  final case class TableSchema(
      db: String, tbl: String, pkNames: Seq[String],
      fields: Seq[RecordField])

  private val BitRe = """bit\((\d+)\)""".r

  private def convert(raw: Column, sqlType: String): Column = sqlType match {
    case "timestamp_us" => timestamp_micros(raw.cast("long"))
    case BitRe(n)       => raw.cast("long").bitwiseAND(lit((1L << n.toInt) - 1))
    case "time_us"      =>
      // "[-]H+:mm:ss[.frac]" → signed micros since midnight, pure
      // Catalyst (codegen'd): split on ':', hours unbounded (MySQL
      // TIME reaches ±838), fractional seconds ride a decimal cast.
      // The rlike guard makes malformed input NULL under ANSI mode
      // too (CaseWhen only evaluates the parse on matching rows —
      // unguarded element_at/cast would THROW on junk instead of
      // honoring the lenient-conversion contract)
      val ok = raw.rlike("^-?\\d+:\\d{1,2}:\\d{1,2}(\\.\\d{1,6})?$")
      val sign = when(raw.startsWith("-"), lit(-1L)).otherwise(lit(1L))
      val parts = split(regexp_replace(raw, "^-", ""), ":")
      val h = element_at(parts, 1).cast("long")
      val m = element_at(parts, 2).cast("long")
      val secUs = (element_at(parts, 3).cast("decimal(16,6)") *
        lit(1000000)).cast("long")
      when(ok, sign * ((h * 3600L + m * 60L) * 1000000L + secUs))
        .otherwise(lit(null).cast("long"))
    case t              => raw.cast(t)
  }

  private val AddColRe =
    """(?i)\s*ALTER\s+TABLE\s+(\S+)\s+ADD\s+COLUMN\s+(\w+)\s+(\S+)\s*""".r
  private val DropColRe =
    """(?i)\s*ALTER\s+TABLE\s+(\S+)\s+DROP\s+COLUMN\s+(\w+)\s*""".r

  /** Evolve a declared schema by one DDL statement from the control
    * stream ([[graft.streaming.CdcStreaming.ddlEvents]]) — the
    * consumer-side reaction to in-band schema changes (ref:
    * OperationType.java DDL; the reference delivers the statement
    * text, reacting is the subscriber's job). Supported shapes:
    * `ALTER TABLE t ADD COLUMN name type` (type may be any
    * [[RecordField]] sqlType) and `ALTER TABLE t DROP COLUMN name`.
    * Statements for other tables or unrecognized DDL leave the schema
    * unchanged (a consumer must never crash on an unknown DDL — the
    * record already carries it for audit). */
  def applyDdl(schema: TableSchema, statement: String): TableSchema =
    statement match {
      case AddColRe(t, name, tpe)
          if tableMatches(schema, t) &&
            !schema.fields.exists(_.name == name) =>
        schema.copy(fields = schema.fields :+ RecordField(name, tpe))
      case DropColRe(t, name) if tableMatches(schema, t) =>
        schema.copy(fields = schema.fields.filterNot(_.name == name))
      case _ => schema
    }

  private def tableMatches(schema: TableSchema, t: String): Boolean =
    t == schema.tbl || t == s"${schema.db}.${schema.tbl}"

  /** Project the chosen image (`after` or `before`) of `schema`'s
    * table into typed columns, keeping record metadata as
    * `record_id`/`record_ts_us`/`record_op` (prefixed so declared
    * field names — e.g. a table's own `id` or `op` column — can never
    * collide; the reference exposes the same values as METADATA
    * columns). Rows of other tables are filtered out (pair with the
    * source's `table` option to skip their decode entirely). */
  def project(
      df: DataFrame, schema: TableSchema, image: String = "after"): DataFrame = {
    require(image == "after" || image == "before", s"bad image '$image'")
    val typed = schema.fields.map(f =>
      convert(element_at(col(image), f.name), f.sqlType).as(f.name))
    val meta = Seq(col("id").as("record_id"), col("tsUs").as("record_ts_us"),
      col("op").as("record_op")) ++
      // a watermarked event-time column (e.g. from withHeartbeatWatermark)
      // must survive the projection or downstream windows lose it
      (if (df.columns.contains("ts")) Seq(col("ts")) else Nil)
    df.filter(col("db") === schema.db && col("tbl") === schema.tbl)
      .select(meta ++ typed: _*)
  }
}
