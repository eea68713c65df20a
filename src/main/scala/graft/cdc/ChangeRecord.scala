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
    /** Born timestamp, UNIT-OPAQUE on the Avro wire path (ADVICE
      * r16): a present wire bornTimestamp passes through UNSCALED
      * (micros in graft fixtures, whatever the producer wrote in
      * general — the reference's getBornTimestamp applies no unit
      * conversion), while an absent/non-positive born falls back to
      * the header timestamp in wire SECONDS
      * (LazyParseRecordImpl.java:259-266). Do NOT compute lags like
      * `tsUs - bornUs` across both cases; graft's own codec
      * ([[RecordCodec]]) always carries micros. */
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
    ukNames: Seq[String] = null,
    /** Intra-transaction sequence (ref DtsRecord.getTransSeq:
      * DtsRecord.java:88): the wire-guaranteed statement order WITHIN
      * a transaction — multi-statement transactions touching the same
      * key apply in this order, not in record-id order (record ids
      * are a transport artifact). −1 = not carried; codec v1-v3
      * records decode into −1. */
    transSeq: Long = -1L,
    /** Foreign-key index metadata (ref RecordSchema
      * getForeignIndexInfo / ForeignKeyIndexInfo.java:8-30): the
      * parent tables this record's table references, so a consumer
      * can order applies by referential dependency (parents before
      * children). null = none declared / not carried (v1-v3). */
    fkParents: Seq[FkParent] = null)

/** One foreign-key constraint of the record's table (ref:
  * ForeignKeyIndexInfo.java — parentSchema/parentDatabase/parentTable
  * plus the referenced-column map). `parentCols(i)` is referenced by
  * this table's `childCols(i)`; the reference keeps the map sorted by
  * parent column (a TreeMap), so the codec canonicalizes pair order
  * the same way on encode. */
final case class FkParent(
    parentSchema: String,
    parentDb: String,
    parentTbl: String,
    parentCols: Seq[String],
    childCols: Seq[String]) {
  require(parentCols.length == childCols.length,
    "fk parent/child column lists must align positionally")
}

/** Operation vocabulary (ref: OperationType.java — complete since
  * round 15, when COMMAND landed as the last enum member graft still
  * folded to UNKNOWN): the data-plane subset, the transaction-boundary records
  * (ROLLBACK/ABORT first-class because a transactional consumer MUST
  * see them — a rolled-back transaction's records contribute nothing,
  * OperationType.java:11-12), and the fetch-protocol markers the
  * fetcher surfaces — FILL/FINISH/CONTROL/RDB/NOOP/INIT/EOF/
  * MANUAL_GENERATED. Markers carry no row data, but a
  * protocol-correct consumer USES them: INIT/EOF (or FINISH)
  * delimit a fetch session — data from a session that never closed
  * is a torn fetch and must quarantine, not apply (cdc31 gates
  * this); FILL/NOOP are keepalives (liveness without data, the
  * HEARTBEAT family); CONTROL/RDB/MANUAL_GENERATED pass through
  * counted. Folding them to UNKNOWN (rounds ≤13) lost the
  * completeness signal.
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
  val Rollback = "ROLLBACK"
  val Abort = "ABORT"
  val Fill = "FILL"
  val Finish = "FINISH"
  val Control = "CONTROL"
  val Rdb = "RDB"
  val Noop = "NOOP"
  val Init = "INIT"
  val Eof = "EOF"
  val ManualGenerated = "MANUAL_GENERATED"
  /** Source-issued command record (ref OperationType.COMMAND — e.g.
    * a replicated administrative statement). Not a marker (it is a
    * statement, not fetch-protocol liveness) and not DML (it changes
    * no row images); consumers count it the way they count DDL. */
  val Command = "COMMAND"

  /** Stable wire codes for the binary codec: positions are the codes,
    * so new ops APPEND (Rollback=9, Abort=10 in round 14's first
    * tranche; the fetch markers take 11-18; COMMAND=19 in round 15)
    * — v1-v4 bytes decode unchanged. */
  val all: IndexedSeq[String] = IndexedSeq(
    Insert, Update, Delete, Ddl, Begin, Commit, Heartbeat, Checkpoint,
    Unknown, Rollback, Abort,
    Fill, Finish, Control, Rdb, Noop, Init, Eof, ManualGenerated,
    Command)
  private val index: Map[String, Int] = all.zipWithIndex.toMap
  def code(op: String): Byte = index.getOrElse(op, index(Unknown)).toByte
  def fromCode(c: Byte): String =
    if (c >= 0 && c < all.length) all(c) else Unknown

  /** Data-changing operations (what a materializer consumes). */
  def isDml(op: String): Boolean =
    op == Insert || op == Update || op == Delete

  /** Transaction-discarding closers: a transaction whose boundary
    * record carries one of these contributes NOTHING to applied
    * state (ref OperationType ROLLBACK/ABORT). */
  def discardsTxn(op: String): Boolean = op == Rollback || op == Abort

  /** Fetch-protocol markers (no row payload; ref OperationType FILL/
    * FINISH/CONTROL/RDB/NOOP/INIT/EOF/MANUAL_GENERATED). COMMAND is
    * NOT a marker: it is a replicated statement, like DDL. */
  val markers: Seq[String] =
    Seq(Fill, Finish, Control, Rdb, Noop, Init, Eof, ManualGenerated)
  def isMarker(op: String): Boolean = markers.contains(op)
}
