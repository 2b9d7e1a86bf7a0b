package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-docs`: a DataSource V2 connector generating a deterministic
  * synthetic document corpus — the engine's "bring your own source"
  * surface, built only on the public `org.apache.spark.sql.connector`
  * API.
  *
  * Two read paths:
  *  - **batch**: `spark.read.format("graft-docs").option("rows", n)
  *    .option("partitions", p).load()` — planInputPartitions splits the
  *    id range into `p` independent slices, so the scan parallelizes
  *    exactly like a parquet directory would at 100 TB (no driver-side
  *    row generation, each executor materializes only its slice);
  *  - **micro-batch streaming**: `spark.readStream.format("graft-docs")
  *    .option("rowsPerBatch", k)` — a monotone long offset advances by
  *    `k` per batch (capped by optional `rows`), mirroring the
  *    reference's offset-tracked-source contract: offsets are JSON in
  *    the checkpoint WAL, restart resumes from the last committed
  *    offset, and each (start, end] range re-plans to the same rows —
  *    deterministic replay, the property an offset ledger needs.
  *
  * Column pruning is honored ([[DocsScanBuilder.pruneColumns]]): a
  * `select("doc_id")` never materializes the text payload — the same
  * contract parquet's vectorized reader gives, asserted in SourcesSpec.
  *
  * Row content is pure arithmetic on the row id (no RNG state), so any
  * slice can be regenerated anywhere — task retries and speculative
  * copies are safe by construction.
  */
class DocsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = DocsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DocsTable(new CaseInsensitiveStringMap(properties))
}

object DocsSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val Langs = Array("en", "de", "fr", "es", "pt")

  /** Deterministic row content: a keyed multiplicative hash drives word
    * choice, so content is stable under re-planning and retries.
    * `textOnce` is the row's text payload, computed ONCE by the reader
    * when any of `text`/`n_chars` is projected — both fields derive
    * from this single value, so the two can never diverge (and the
    * expensive generator never runs twice per row). */
  def gen(id: Long, field: String, textOnce: String): Any = field match {
    case "doc_id" => id
    case "lang" => UTF8String.fromString(Langs((((id % 5) + 5) % 5).toInt))
    case "text" => UTF8String.fromString(textOnce)
    case "n_chars" => textOnce.length.toLong
  }

  def text(id: Long): String = {
    val n = 5 + (mix(id, 0) % 20).toInt // 5..24 words
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append("w").append(java.lang.Long.toHexString(mix(id, i + 1) % 4096))
      i += 1
    }
    sb.toString
  }

  private def mix(id: Long, k: Int): Long = {
    var h = id * 0x9E3779B97F4A7C15L + k * 0xC2B2AE3D27D4EB4FL
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
    h & Long.MaxValue
  }

  /** `startingOffset` option → initial stream position. Two accepted
    * shapes, both the reference's: a plain long (row position), or the
    * ledger's Kafka-shaped resume JSON `{"topic":{"0":N}}` as emitted
    * by [[graft.streaming.KafkaSource.startingOffsetsJson]] (and fed
    * through `clampToRange` first by a careful caller). graft-docs is a
    * single logical topic-partition (its offset is ONE monotone row
    * position — the `partitions` option only fans out each admitted
    * (start, end] range for parallel read), so the JSON form must carry
    * exactly one topic with exactly one partition; anything else is a
    * config error worth failing loudly at stream construction. */
  def parseStartingOffset(s: String): Long = {
    val t = s.trim
    if (t.startsWith("{")) {
      val topics = graft.streaming.KafkaSource.parseStartingOffsetsJson(t)
      require(topics.size == 1,
        s"graft-docs takes exactly one topic in startingOffset, got ${topics.keySet}")
      val parts = topics.head._2
      require(parts.size == 1,
        s"graft-docs is single-partition; startingOffset carried partitions ${parts.keySet}")
      parts.head._2
    } else t.toLong
  }
}

private[sources] class DocsTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft-docs"
  override def schema(): StructType = DocsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    // table properties carry the .option(...)s on the read path; merge
    // with any scan-time options (scan-time wins)
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ opts.asScala).asJava)
    new DocsScanBuilder(merged)
  }
}

private[sources] class DocsScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = DocsSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty prune (e.g. count(*)) keeps an empty struct: readers then
    // emit zero-field rows, never the text payload
    required = requiredSchema
  override def build(): Scan = new DocsScan(options, required)
}

private[sources] class DocsScan(options: CaseInsensitiveStringMap, required: StructType)
    extends Scan {
  private val rows = options.getLong("rows", 1000L)
  private val partitions = math.max(1, options.getInt("partitions", 4))
  private val rowsPerBatch = options.getLong("rowsPerBatch", 100L)
  // Ledger-positioned start (streaming only). Parsed EAGERLY at scan
  // build so a malformed resume JSON fails at query construction, not
  // in the first micro-batch. Clamped into [0, rows]: the external
  // clampToRange handles broker-range drift; this bound is the
  // source's own "don't start past the end" invariant.
  private val startingOffset = math.min(rows, math.max(0L,
    Option(options.get("startingOffset")).map(DocsSource.parseStartingOffset).getOrElse(0L)))

  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-docs rows=$rows partitions=$partitions readSchema=${required.simpleString}"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      DocsScan.slices(0L, rows, partitions)
    override def createReaderFactory(): PartitionReaderFactory =
      new DocsReaderFactory(required.fieldNames)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new DocsMicroBatchStream(rows, rowsPerBatch, partitions, required.fieldNames,
      startingOffset)
}

private[sources] object DocsScan {
  /** Contiguous id ranges, one per partition — the planning shape a
    * file source gets from its splits. */
  def slices(start: Long, end: Long, parts: Int): Array[InputPartition] = {
    val total = math.max(0L, end - start)
    (0 until parts).iterator.map { i =>
      val lo = start + i * total / parts
      val hi = start + (i + 1) * total / parts
      DocsRange(lo, hi)
    }.filter(r => r.end > r.start).toArray[InputPartition]
  }
}

private[sources] case class DocsRange(start: Long, end: Long) extends InputPartition

private[sources] class DocsReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val DocsRange(start, end) = partition
    // text(id) is the expensive generator; when both `text` and
    // `n_chars` are projected, compute it once per row and derive both.
    val needsText = fields.exists(f => f == "text" || f == "n_chars")
    // hoist the field view out of the row loop: fields.toIndexedSeq per
    // row was a fresh wrapper + boxed map allocation on the scan's hot
    // path (r12 review)
    val fieldSeq = fields.toIndexedSeq
    new PartitionReader[InternalRow] {
      private var cur = start - 1
      override def next(): Boolean = { cur += 1; cur < end }
      override def get(): InternalRow = {
        val t = if (needsText) DocsSource.text(cur) else null
        InternalRow.fromSeq(fieldSeq.map(DocsSource.gen(cur, _, t)))
      }
      override def close(): Unit = ()
    }
  }
}

/** Monotone long offset: `json()` is the row position — human-readable
  * in the checkpoint WAL, trivially diffable against an external
  * ledger (the reference stored exactly this shape per partition). */
private[sources] case class DocsOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

private[sources] class DocsMicroBatchStream(
    totalRows: Long, rowsPerBatch: Long, partitions: Int, fields: Array[String],
    startingOffset: Long = 0L)
    extends MicroBatchStream with SupportsAdmissionControl {

  /** Consulted by MicroBatchExecution ONLY when the checkpoint WAL is
    * empty — a fresh query starts at the ledger-supplied position, a
    * recovered query resumes from its WAL regardless of the option.
    * This is exactly Kafka's `startingOffsets` contract, and the half
    * of the reference pattern (external-store positioning) that the
    * WAL does not subsume. */
  override def initialOffset(): Offset = DocsOffset(startingOffset)
  override def deserializeOffset(json: String): Offset = DocsOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()

  /** Admission-controlled advance: the ENGINE-SUPPLIED limit past the
    * checkpointed start, never past totalRows. Honoring the limit (not
    * assuming our own default) matters for Trigger.Once/AvailableNow,
    * where MicroBatchExecution passes allAvailable / a captured target
    * and an implementation that blindly stepped rowsPerBatch would
    * silently under-drain the single batch (r12 review). Driving
    * progression off the engine-supplied start offset (not an
    * in-memory cursor) is what makes restart correct: a recovered
    * query resumes exactly at the WAL offset. */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[DocsOffset].pos
    def stepOf(l: ReadLimit): Long = l match {
      case r: ReadMaxRows => r.maxRows()
      case _: ReadAllAvailable => totalRows - s
      case c: CompositeReadLimit =>
        val steps = c.getReadLimits.toSeq.map(stepOf)
        if (steps.isEmpty) rowsPerBatch else steps.min
      case _ => rowsPerBatch // min-rows etc.: our default batch size
    }
    DocsOffset(math.min(totalRows, s + math.max(0L, stepOf(limit))))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used for admission control")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    DocsScan.slices(start.asInstanceOf[DocsOffset].pos,
      end.asInstanceOf[DocsOffset].pos, partitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new DocsReaderFactory(fields)

  override def stop(): Unit = ()
}
