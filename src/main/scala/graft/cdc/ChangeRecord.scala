package graft.cdc

/** The engine's change-record model — the Spark-native counterpart of
  * the reference's record interface (ref: src/main/java/com/alibaba/
  * flink/connectors/dts/formats/internal/record/DtsRecord.java:10):
  * record id, transaction id, commit + born timestamps, operation,
  * schema coordinates, before/after row images, extended properties
  * (ref getExtendedProperty — tag info, not row data) and the source
  * engine's type+version (ref getSourceTypeAndVersion).
  *
  * Row images are Map[column -> stringified value]; [[Values]] owns the
  * typed conversions (the reference's value package type system). A null
  * map value models a SQL NULL column. The trailing fields default to
  * null: codec v1 records (round 1) decode into them losslessly.
  */
final case class ChangeRecord(
    id: Long,
    transactionId: String,
    tsUs: Long,
    bornUs: Long,
    op: String,
    db: String,
    tbl: String,
    pkNames: Seq[String],
    before: Map[String, String],
    after: Map[String, String],
    props: Map[String, String] = null,
    sourceType: String = null,
    sourceVersion: String = null,
    /** First unique-key index columns (ref RecordSchema
      * getUniqueIndexInfo / RecordIndexInfo.isFirstUniqueIndex):
      * pk-less tables key on their unique index downstream. null =
      * none declared; codec v1/v2 records decode into null. */
    ukNames: Seq[String] = null)

/** Operation vocabulary (ref: OperationType.java — the subset with
  * data-plane meaning plus the control records the fetcher surfaces).
  */
object Op {
  val Insert = "INSERT"
  val Update = "UPDATE"
  val Delete = "DELETE"
  val Ddl = "DDL"
  val Begin = "BEGIN"
  val Commit = "COMMIT"
  val Heartbeat = "HEARTBEAT"
  val Checkpoint = "CHECKPOINT"
  val Unknown = "UNKNOWN"

  /** Stable wire codes for the binary codec. */
  val all: IndexedSeq[String] = IndexedSeq(
    Insert, Update, Delete, Ddl, Begin, Commit, Heartbeat, Checkpoint,
    Unknown)
  private val index: Map[String, Int] = all.zipWithIndex.toMap
  def code(op: String): Byte = index.getOrElse(op, index(Unknown)).toByte
  def fromCode(c: Byte): String =
    if (c >= 0 && c < all.length) all(c) else Unknown

  /** Data-changing operations (what a materializer consumes). */
  def isDml(op: String): Boolean =
    op == Insert || op == Update || op == Delete
}
