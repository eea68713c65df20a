package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util

/** `graft-kafka-sim`: an in-process Kafka-PROTOCOL-SHAPED endpoint for
  * exercising [[CdcSubscription.toKafkaOptions]] end to end without a
  * broker (VERDICT r14 #7 — no Kafka client jars ship in this
  * environment, so an embedded broker is impossible; what CAN be
  * tested is the contract the option map encodes). The provider
  * accepts the EXACT option vocabulary `spark-sql-kafka-0-10` reads —
  * `kafka.bootstrap.servers`, `subscribe`, `kafka.group.id`,
  * `startingTimestamp` (epoch-MS), `kafka.security.protocol`,
  * `kafka.sasl.mechanism`, `kafka.sasl.jaas.config` — validates them
  * the way a broker session would (unknown server/topic and bad SASL
  * credentials FAIL; the jaas config is actually parsed, escapes
  * included), and serves the kafka reader's output schema (key, value,
  * topic, partition, offset, timestamp, timestampType) from an
  * in-memory per-partition log.
  *
  * Seek semantics mirror Kafka's `offsetsForTimes` + consume-suffix
  * contract (ref: DtsKafkaConsumerThread.java's seek path /
  * searchOffsetByTimestamp): per PARTITION, find the earliest offset
  * whose timestamp ≥ startingTimestamp, then serve EVERY later offset
  * — including ones whose own timestamp is older (a seek positions a
  * cursor; it is not a row filter). The spec pins exactly that
  * distinction. One partition = one Spark input partition, like the
  * real source. */
object KafkaSimBroker {

  /** One stored message: Kafka's (partition, offset) coordinates plus
    * log-append time (ms) and the payload. */
  final case class Msg(partition: Int, offset: Long, timestampMs: Long,
      key: Array[Byte], value: Array[Byte])

  private final case class Broker(
      topics: Map[String, IndexedSeq[Msg]],
      creds: Option[(String, String)])

  private val brokers =
    new java.util.concurrent.ConcurrentHashMap[String, Broker]()

  /** Register a broker at `servers` with its topics and optional
    * SASL/PLAIN credentials. Messages are sorted per partition by
    * offset (the log order). */
  def register(servers: String, topics: Map[String, Seq[Msg]],
      creds: Option[(String, String)] = None): Unit =
    brokers.put(servers, Broker(
      topics.map { case (t, ms) => t -> ms.sortBy(m => (m.partition, m.offset)).toIndexedSeq },
      creds))

  def clear(): Unit = brokers.clear()

  /** Session handshake: what a consumer's first fetch would verify.
    * Returns the per-partition message suffixes after the seek. */
  private[sources] def fetch(
      servers: String, topic: String,
      startingTimestampMs: Option[Long],
      auth: Option[(String, String)]): Map[Int, IndexedSeq[Msg]] = {
    val broker = Option(brokers.get(servers)).getOrElse(
      throw new IllegalArgumentException(
        s"kafka-sim: no broker at bootstrap servers '$servers'"))
    (broker.creds, auth) match {
      case (Some(expect), got) if !got.contains(expect) =>
        throw new SecurityException(
          "kafka-sim: SASL authentication failed for " +
            got.map(_._1).getOrElse("<anonymous>"))
      case _ =>
    }
    val log = broker.topics.getOrElse(topic,
      throw new IllegalArgumentException(s"kafka-sim: unknown topic '$topic'"))
    log.groupBy(_.partition).map { case (p, ms) =>
      val suffix = startingTimestampMs match {
        case Some(ts) =>
          // offsetsForTimes: earliest offset with timestamp >= ts,
          // then the WHOLE suffix (cursor, not filter)
          val i = ms.indexWhere(_.timestampMs >= ts)
          if (i < 0) IndexedSeq.empty else ms.drop(i)
        case None => ms
      }
      p -> suffix
    }
  }

  /** Parse a SASL/PLAIN jaas config line back into (user, password) —
    * the inverse of toKafkaOptions' rendering, unescaping \" and \\.
    * A broker does this inside the PlainLoginModule; doing it here is
    * what makes the jaas ESCAPING testable. */
  private[sources] def parseJaas(jaas: String): (String, String) = {
    def field(name: String): String = {
      val re = (name + "=\"((?:[^\"\\\\]|\\\\.)*)\"").r
      re.findFirstMatchIn(jaas).map(_.group(1)).getOrElse(
        throw new IllegalArgumentException(
          s"kafka-sim: jaas config missing $name"))
    }
    def unescape(s: String): String = {
      val b = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '\\' && i + 1 < s.length) { b += s.charAt(i + 1); i += 2 }
        else { b += s.charAt(i); i += 1 }
      }
      b.toString
    }
    (unescape(field("username")), unescape(field("password")))
  }

  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))
}

class KafkaSimProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka-sim"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaSimBroker.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    def opt(k: String): Option[String] = Option(properties.get(k))
    val servers = opt("kafka.bootstrap.servers").getOrElse(
      throw new IllegalArgumentException(
        "kafka-sim: kafka.bootstrap.servers is required"))
    val topic = opt("subscribe").getOrElse(
      throw new IllegalArgumentException("kafka-sim: subscribe is required"))
    val proto = opt("kafka.security.protocol").getOrElse("PLAINTEXT")
    val auth = proto match {
      case "PLAINTEXT" => None
      case "SASL_PLAINTEXT" =>
        require(opt("kafka.sasl.mechanism").contains("PLAIN"),
          "kafka-sim: only SASL/PLAIN is modeled")
        Some(KafkaSimBroker.parseJaas(opt("kafka.sasl.jaas.config").getOrElse(
          throw new IllegalArgumentException(
            "kafka-sim: SASL_PLAINTEXT needs kafka.sasl.jaas.config"))))
      case other => throw new IllegalArgumentException(
        s"kafka-sim: unsupported security protocol '$other'")
    }
    // handshake NOW (option errors and auth failures surface at
    // getTable, like the real source's driver-side validation)
    val parts = KafkaSimBroker.fetch(
      servers, topic, opt("startingTimestamp").map(_.toLong), auth)
    new KafkaSimTable(topic, parts,
      opt("maxOffsetsPerTrigger").map(_.toLong))
  }
}

/** Streaming offset: messages admitted so far, counted in the
  * canonical (partition, offset) flattened order — the log is a fixed
  * post-seek snapshot, so one cursor suffices (the real source tracks
  * per-partition offsets because its log grows; a growing sim would
  * too). */
private case class KafkaSimOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class KafkaSimTable(
    topic: String,
    parts: Map[Int, IndexedSeq[KafkaSimBroker.Msg]],
    maxOffsetsPerTrigger: Option[Long] = None)
    extends Table with SupportsRead {
  override def name(): String = s"kafka-sim:$topic"
  override def schema(): StructType = KafkaSimBroker.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  private def flat: IndexedSeq[KafkaSimBroker.Msg] =
    parts.toSeq.sortBy(_._1).flatMap(_._2).toIndexedSeq

  private def toPartitions(
      msgs: Seq[KafkaSimBroker.Msg]): Array[InputPartition] =
    msgs.groupBy(_.partition).toSeq.sortBy(_._1)
      .map { case (p, ms) => KafkaSimPartition(topic, p, ms.toArray) }
      .toArray[InputPartition]

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = KafkaSimBroker.schema
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          toPartitions(flat)
        override def createReaderFactory(): PartitionReaderFactory =
          new KafkaSimReaderFactory
      }
      /** Streaming read with the kafka source's admission option:
        * `maxOffsetsPerTrigger` caps RECORDS per micro-batch (the
        * option `toKafkaOptions` emits), via the same
        * SupportsAdmissionControl end-offset capping the graft-cdc
        * source uses — capped at latestOffset, never at planning. */
      override def toMicroBatchStream(
          checkpointLocation: String): MicroBatchStream =
        new MicroBatchStream with SupportsAdmissionControl {
          private val all = flat
          override def initialOffset(): Offset = KafkaSimOffset(0L)
          override def deserializeOffset(json: String): Offset =
            KafkaSimOffset(json.toLong)
          override def latestOffset(): Offset =
            KafkaSimOffset(all.length.toLong)
          override def getDefaultReadLimit: ReadLimit =
            maxOffsetsPerTrigger.map(ReadLimit.maxRows)
              .getOrElse(ReadLimit.allAvailable())
          override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
            val s = start.asInstanceOf[KafkaSimOffset].n
            limit match {
              case mr: ReadMaxRows =>
                KafkaSimOffset(math.min(all.length.toLong, s + mr.maxRows))
              case _ => KafkaSimOffset(all.length.toLong)
            }
          }
          override def reportLatestOffset(): Offset = latestOffset()
          override def planInputPartitions(
              start: Offset, end: Offset): Array[InputPartition] = {
            val s = start.asInstanceOf[KafkaSimOffset].n.toInt
            val e = end.asInstanceOf[KafkaSimOffset].n.toInt
            toPartitions(all.slice(s, e))
          }
          override def createReaderFactory(): PartitionReaderFactory =
            new KafkaSimReaderFactory
          override def commit(end: Offset): Unit = ()
          override def stop(): Unit = ()
        }
    }
}

case class KafkaSimPartition(
    topic: String, partition: Int,
    msgs: Array[KafkaSimBroker.Msg]) extends InputPartition

class KafkaSimReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kp = p.asInstanceOf[KafkaSimPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < kp.msgs.length }
      override def get(): InternalRow = {
        val m = kp.msgs(i)
        InternalRow(
          m.key, m.value, UTF8String.fromString(kp.topic),
          m.partition, m.offset, m.timestampMs * 1000L, 0)
      }
      override def close(): Unit = ()
    }
  }
}
