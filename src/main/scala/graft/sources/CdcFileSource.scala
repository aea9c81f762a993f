package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1/S10/A4 — the CDC stream source as a first-class DataSource-v2
  * `MicroBatchStream` (SURVEY.md §2.1: reference
  * `driver/mysql/binlog/binlog_reader.go:282-414` connect /
  * `959-1036` DataStreamEvents loop; offsets there are GTID sets, here
  * a monotone sequence number — same contract: resumable, exclusive
  * start, inclusive end).
  *
  * The transport is a directory of immutable segment files
  * `<firstSeq>-<lastSeq>.jsonl`, one JSON change event per line — the
  * file-system stand-in for a binlog/relay stream (the container has no
  * MySQL; the reference's relay-to-disk mode, `binlog_reader.go:291-386`,
  * is exactly this shape). Each micro-batch:
  *
  *  - `latestOffset` = max lastSeq over segment files (cheap name scan,
  *    no file reads — the segment naming carries the index);
  *  - `planInputPartitions(start, end)` = one partition per overlapping
  *    segment, so reads scale with segment count, not stream length;
  *  - readers parse lines and emit rows with `start < seq <= end` —
  *    replays after failure re-read only uncommitted ranges
  *    (exactly-once with a checkpointed offset log + idempotent sink).
  *
  * `maxOffsetsPerTrigger` backpressure (reference memory gate,
  * `binlog_reader.go:259-260`) comes via `SupportsAdmissionControl`.
  */
object CdcFileSource {
  val schema: StructType = StructType(Seq(
    StructField("db", StringType),
    StructField("table", StringType),
    StructField("op", StringType),
    StructField("key", StringType),
    StructField("before", StringType), // JSON object or null — schema-on-read
    StructField("after", StringType),
    StructField("ts_ms", LongType),
    StructField("gtid", StringType),
    StructField("seq", LongType),
    StructField("last_committed", LongType),
    StructField("origin_server_id", StringType)
  ))

  private[sources] val segmentName = "(\\d+)-(\\d+)\\.jsonl".r

  private[sources] def listSegments(path: String): Seq[(Long, Long, String)] = {
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
    files.toSeq.flatMap { f =>
      f.getName match {
        case segmentName(lo, hi) => Some((lo.toLong, hi.toLong, f.getAbsolutePath))
        case _ => None
      }
    }.sortBy(_._1)
  }

  /** The source frame as a typed [[graft.model.ChangeEvent]] stream —
    * image JSON strings parse back to maps; the inverse of
    * [[eventToJson]] and the input shape
    * [[graft.streaming.CdcPipeline.assembleTransactions]] wants.
    */
  def asChangeEvents(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[graft.model.ChangeEvent] = {
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val mt = MapType(StringType, StringType)
    df.select(
      col("db"), col("table"), col("op"), col("key"),
      coalesce(from_json(col("before"), mt), map().cast(mt)).as("before"),
      coalesce(from_json(col("after"), mt), map().cast(mt)).as("after"),
      col("ts_ms").as("tsMillis"), col("gtid"), col("seq"),
      col("last_committed").as("lastCommitted"),
      col("origin_server_id").as("originServerId")
    ).as[graft.model.ChangeEvent]
  }

  private lazy val lineMapper = new ObjectMapper()

  /** One [[graft.model.ChangeEvent]] as the source's jsonl line:
    * before/after serialize as embedded JSON-object strings (null when
    * the image side is absent), everything else as typed fields.
    */
  def eventToJson(e: graft.model.ChangeEvent): String = {
    val root = lineMapper.createObjectNode()
    root.put("db", e.db); root.put("table", e.table)
    root.put("op", e.op); root.put("key", e.key)
    def image(m: Map[String, String]): String = {
      val o = lineMapper.createObjectNode()
      m.foreach { case (k, v) => o.put(k, v) }
      lineMapper.writeValueAsString(o)
    }
    if (e.before.isEmpty) root.putNull("before") else root.put("before", image(e.before))
    if (e.after.isEmpty) root.putNull("after") else root.put("after", image(e.after))
    root.put("ts_ms", e.tsMillis); root.put("gtid", e.gtid); root.put("seq", e.seq)
    root.put("last_committed", e.lastCommitted)
    root.put("origin_server_id", e.originServerId)
    lineMapper.writeValueAsString(root)
  }

  /** Stage a decoded event batch as one segment — the producer bridge
    * from [[BinlogParser.readBinlogFile]] (raw binlog bytes) into the
    * stream directory a [[CdcFileSource]] reader tails.
    */
  def writeEvents(path: String, events: Seq[graft.model.ChangeEvent]): Unit =
    if (events.nonEmpty) {
      val seqs = events.map(_.seq)
      writeSegment(path, events.map(eventToJson), seqs.min, seqs.max)
    }

  /** Writes one segment file atomically (tmp + rename) — the producer
    * side used by tests and by [[graft.JobRunner]] replay staging.
    */
  def writeSegment(path: String, events: Seq[String], firstSeq: Long, lastSeq: Long): Unit = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    val tmp = java.io.File.createTempFile("seg", ".tmp", dir)
    val w = new java.io.PrintWriter(tmp, "UTF-8")
    try events.foreach(w.println) finally w.close()
    val target = new java.io.File(dir, s"$firstSeq-$lastSeq.jsonl")
    if (!tmp.renameTo(target)) throw new java.io.IOException(s"rename to $target failed")
  }
}

class CdcFileSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = CdcFileSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val maxRows = Option(properties.get("maxOffsetsPerTrigger")).map(_.toLong)
    val startSeq = Option(properties.get("startSeq")).map(_.toLong).getOrElse(-1L)
    val permissive = "permissive".equalsIgnoreCase(properties.getOrDefault("mode", "failfast"))
    new CdcFileTable(properties.get("path"), maxRows, startSeq, permissive)
  }
  override def supportsExternalMetadata(): Boolean = false
}

class CdcFileTable(path: String, maxRowsPerTrigger: Option[Long] = None,
    startSeq: Long = -1L, permissive: Boolean = false) extends Table with SupportsRead {
  require(path != null, "graft CDC source requires .option(\"path\", dir)")
  override def name(): String = s"graft-cdc($path)"
  override def schema(): StructType = CdcFileSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new CdcFileScan(path, maxRowsPerTrigger, startSeq, permissive)
    }
}

class CdcFileScan(path: String, maxRowsPerTrigger: Option[Long] = None,
    startSeq: Long = -1L, permissive: Boolean = false) extends Scan {
  override def readSchema(): StructType = CdcFileSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CdcMicroBatchStream(path, maxRowsPerTrigger, startSeq, permissive)
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      CdcFileSource.listSegments(path)
        .map { case (_, _, f) => CdcInputPartition(f, Long.MinValue, Long.MaxValue, permissive) }
        .toArray[InputPartition]
    override def createReaderFactory(): PartitionReaderFactory = new CdcReaderFactory
  }
}

case class CdcOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

class CdcMicroBatchStream(path: String, maxRowsPerTrigger: Option[Long] = None,
    startSeq: Long = -1L, permissive: Boolean = false)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  /** S5 — the snapshot->stream handoff: a fresh query (no checkpoint)
    * starts at the recorded snapshot watermark instead of the epoch
    * (reference `extractor.go:301-316`: binlog reader starts at the
    * snapshot coordinates). Checkpointed restarts ignore this and
    * resume from the offset log.
    */
  override def initialOffset(): Offset = CdcOffset(startSeq)

  // Trigger.AvailableNow: pin the stream end at start-of-query so the
  // bounded run drains exactly what existed, in rate-limited batches.
  private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(scanLatest)

  private def scanLatest: Long = {
    val segs = CdcFileSource.listSegments(path)
    if (segs.isEmpty) -1L else segs.map(_._2).max
  }

  override def latestOffset(): Offset =
    CdcOffset(availableNowCap.getOrElse(scanLatest))

  /** Rate limiting: admit at most `maxOffsetsPerTrigger` sequence
    * numbers per batch (reference backpressure `binlog_reader.go:959-998`).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val hi = latestOffset().asInstanceOf[CdcOffset].seq
    val lo = start.asInstanceOf[CdcOffset].seq
    limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        CdcOffset(math.min(hi, lo + r.maxRows()))
      case _ => CdcOffset(hi)
    }
  }

  override def getDefaultReadLimit: ReadLimit =
    maxRowsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[CdcOffset].seq
    val hi = end.asInstanceOf[CdcOffset].seq
    CdcFileSource.listSegments(path)
      .filter { case (fLo, fHi, _) => fHi > lo && fLo <= hi }
      .map { case (_, _, f) => CdcInputPartition(f, lo, hi, permissive) }
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = new CdcReaderFactory
  override def deserializeOffset(json: String): Offset = CdcOffset(json.toLong)
  override def commit(end: Offset): Unit = () // segments are immutable; GC is external
  override def stop(): Unit = ()
}

case class CdcInputPartition(file: String, startExclusive: Long, endInclusive: Long,
    permissive: Boolean = false) extends InputPartition

class CdcReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcInputPartition]
    new CdcPartitionReader(p.file, p.startExclusive, p.endInclusive, p.permissive)
  }
}

/** `permissive` skips malformed lines instead of failing the task —
  * the reference logs-and-continues on unparseable redo SQL
  * (`log_miner.go` parse error paths); fail-fast is the default so
  * corruption is loud unless the operator opts in.
  */
class CdcPartitionReader(file: String, startExclusive: Long, endInclusive: Long,
    permissive: Boolean = false) extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val lines = scala.io.Source.fromFile(file, "UTF-8")
  private val it = lines.getLines()
  private var row: InternalRow = _

  override def next(): Boolean = {
    row = null
    while (row == null && it.hasNext) {
      val line = it.next()
      if (line.nonEmpty) {
        try {
          val n = mapper.readTree(line)
          val seq = n.get("seq").asLong()
          if (seq > startExclusive && seq <= endInclusive) row = toRow(n)
        } catch {
          case e: Exception if permissive => () // skip malformed line
        }
      }
    }
    row != null
  }

  private def str(n: JsonNode, f: String): UTF8String = {
    val v = n.get(f)
    if (v == null || v.isNull) null
    else UTF8String.fromString(if (v.isTextual) v.asText() else v.toString)
  }

  private def toRow(n: JsonNode): InternalRow =
    InternalRow(
      str(n, "db"), str(n, "table"), str(n, "op"), str(n, "key"),
      str(n, "before"), str(n, "after"),
      if (n.has("ts_ms")) n.get("ts_ms").asLong() else 0L,
      str(n, "gtid"),
      n.get("seq").asLong(),
      if (n.has("last_committed")) n.get("last_committed").asLong() else -1L,
      str(n, "origin_server_id"))

  override def get(): InternalRow = row
  override def close(): Unit = lines.close()
}
