package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 streaming source with EXACT row-level admission
  * control: at most `rowsPerTrigger` CSV rows enter each micro-batch.
  *
  * This is the faithful Spark re-expression of the reference's
  * rate-limited dataset source (`J/source/GridFSCsvSource.java:98-128`
  * — a parallelism-1 source that sleeps `1000/maxReadRate` ms per
  * row, `J/Constants.java:36` caps it at 4 rows/s). The reference
  * enforces rate by wall-clock sleeps inside the emit loop; here the
  * same budget is declarative: `rowsPerTrigger` rows admitted per
  * trigger, so `rowsPerTrigger = 4` with a 1 s `ProcessingTime`
  * trigger IS 4 rows/s — but replayable from checkpointed offsets,
  * and it composes with `Trigger.AvailableNow` (drain everything at
  * the admitted batch size, then stop — the reference's EOF-sentinel
  * protocol for free).
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft-rate-csv")
  *   .option("path", file).option("rowsPerTrigger", "4")
  *   .option("sep", "\t").option("header", "true")
  *   .load()
  * }}}
  * All columns are strings (the reference emits raw CSV fields and
  * parses downstream); the schema comes from the header row or
  * `c0..cN`, or a user-supplied all-string schema. Quoting is not
  * interpreted (split on the separator) — same as the reference's
  * line split.
  *
  * NOTE: `header` defaults to TRUE (the reference's dataset documents
  * always carry a header row — `J/source/GridFSCsvSource.java:104`),
  * which is the opposite of `spark.read.csv`'s default. Pass
  * `.option("header", "false")` for headerless files.
  */
class RateLimitedCsvProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-rate-csv"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RateLimitedCsv.schemaFor(options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(schema.fields.forall(_.dataType == StringType),
      s"graft-rate-csv emits raw CSV fields: all columns must be string, got $schema")
    new RateLimitedCsvTable(schema,
      new CaseInsensitiveStringMap(properties))
  }
}

private[sources] object RateLimitedCsv {
  def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-rate-csv requires option 'path'")
    p
  }
  def sep(options: CaseInsensitiveStringMap): String =
    Option(options.get("sep")).getOrElse(",")
  def header(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("header")).forall(_.toBoolean)
  def rowsPerTrigger(options: CaseInsensitiveStringMap): Int = {
    val n = Option(options.get("rowsPerTrigger")).map(_.toInt).getOrElse(4)
    require(n > 0, s"rowsPerTrigger must be positive, got $n")
    n
  }
  def indexEvery(options: CaseInsensitiveStringMap): Int = {
    val n = Option(options.get("indexEvery")).map(_.toInt).getOrElse(1024)
    require(n > 0, s"indexEvery must be positive, got $n")
    n
  }

  /** Driver-side index of the file's DATA lines: total count plus the
    * byte offset of every `blockSize`-th line start. Bounded driver
    * memory (8 bytes per `blockSize` lines — a billion-line file at
    * the default granularity indexes in ~8 MB) no matter the file
    * size; the line CONTENT never lives on the driver — executors
    * read their own byte ranges. Line terminators are `\n`, `\r\n`,
    * or lone `\r` (exactly `BufferedReader.readLine`'s rule, so the
    * index agrees with the executor-side reader byte for byte; UTF-8
    * multibyte sequences never contain those bytes, so every recorded
    * offset is a character boundary). */
  final case class LineIndex(count: Long, blockSize: Int, blockOffsets: Array[Long])

  def buildIndex(options: CaseInsensitiveStringMap): LineIndex = {
    val blockSize = indexEvery(options)
    val headerLines = if (header(options)) 1L else 0L
    val in = new java.io.BufferedInputStream(
      new java.io.FileInputStream(path(options)), 1 << 16)
    try {
      val offsets = scala.collection.mutable.ArrayBuffer.empty[Long]
      var dataCount = 0L
      var lineNo = 0L
      var pos = 0L
      var atLineStart = true
      var c = in.read()
      while (c != -1) {
        if (atLineStart) {
          val dataIdx = lineNo - headerLines
          if (dataIdx >= 0) {
            if (dataIdx % blockSize == 0) offsets += pos
            dataCount = dataIdx + 1
          }
          atLineStart = false
        }
        if (c == '\n') {
          lineNo += 1; atLineStart = true; pos += 1; c = in.read()
        } else if (c == '\r') {
          lineNo += 1; atLineStart = true; pos += 1
          c = in.read()
          if (c == '\n') { pos += 1; c = in.read() } // \r\n = one terminator
        } else {
          pos += 1; c = in.read()
        }
      }
      LineIndex(dataCount, blockSize, offsets.toArray)
    } finally in.close()
  }

  def schemaFor(options: CaseInsensitiveStringMap): StructType = {
    // only the header line is read — never the whole file
    val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
      new java.io.FileInputStream(path(options)),
      java.nio.charset.StandardCharsets.UTF_8))
    val first =
      try reader.readLine()
      finally reader.close()
    require(first != null, s"empty csv: ${path(options)}")
    val cols = first.split(java.util.regex.Pattern.quote(sep(options)), -1)
    val names =
      if (header(options)) cols.toSeq
      else cols.indices.map(i => s"c$i")
    StructType(names.map(n => StructField(n, StringType, nullable = true)))
  }
}

private[sources] class RateLimitedCsvTable(
    tableSchema: StructType, options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  override def name(): String = s"graft-rate-csv:${RateLimitedCsv.path(options)}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new RateLimitedCsvStream(tableSchema, options)
        override def toBatch: Batch =
          throw new UnsupportedOperationException(
            "graft-rate-csv is a streaming source (batch CSV reads use spark.read.csv)")
      }
    }
}

/** Offset = number of data rows fully admitted so far. */
private[sources] case class RowCountOffset(rows: Long) extends Offset {
  override def json(): String = rows.toString
}

private[sources] class RateLimitedCsvStream(
    schema: StructType, options: CaseInsensitiveStringMap)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  private val sep = RateLimitedCsv.sep(options)
  private val perTrigger = RateLimitedCsv.rowsPerTrigger(options)
  // built once per stream: counts + sparse byte offsets ONLY — the
  // file content itself never enters the driver heap, so a multi-GB
  // dataset replay costs the driver ~8 bytes per `indexEvery` lines
  private lazy val index = RateLimitedCsv.buildIndex(options)
  // end fence for Trigger.AvailableNow: drain up to the rows present
  // when the trigger started, still rowsPerTrigger per batch
  @volatile private var fence: Long = Long.MaxValue

  override def initialOffset(): Offset = RowCountOffset(0L)

  override def deserializeOffset(json: String): Offset =
    RowCountOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(perTrigger)

  override def prepareForTriggerAvailableNow(): Unit =
    fence = index.count

  /** Row budget of an engine-passed ReadLimit. The engine normally
    * echoes back [[getDefaultReadLimit]] (maxRows = rowsPerTrigger),
    * but honor whatever it actually asks for. Inside a composite,
    * only row-bounding members (maxRows; allAvailable = unbounded)
    * participate in the min — a non-row member such as minRows
    * imposes NO row bound, so a composite like (minRows, maxRows=N)
    * honors N rather than collapsing to perTrigger. Only when no
    * member bounds rows at all does the budget fall back to
    * perTrigger. */
  private[sources] def rowBudget(limit: ReadLimit): Long = limit match {
    case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows => m.maxRows()
    case _: org.apache.spark.sql.connector.read.streaming.ReadAllAvailable => Long.MaxValue
    case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
      val bounds = c.getReadLimits.collect {
        case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows => m.maxRows()
        case _: org.apache.spark.sql.connector.read.streaming.ReadAllAvailable => Long.MaxValue
      }
      if (bounds.isEmpty) perTrigger.toLong else bounds.min
    case _ => perTrigger.toLong
  }

  /** Admission control: at most the ReadLimit's row budget past
    * `start` — the engine calls this once per trigger, so the
    * per-trigger budget is exact under any trigger (ProcessingTime or
    * AvailableNow). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[RowCountOffset].rows
    val avail = math.min(index.count, fence)
    val budget = rowBudget(limit)
    val to = if (budget >= avail - from) avail else from + budget
    RowCountOffset(math.min(avail, math.max(from, to)))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset = RowCountOffset(index.count)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[RowCountOffset].rows
    val to = end.asInstanceOf[RowCountOffset].rows
    if (to <= from) return Array.empty
    // a micro-batch is <= rowsPerTrigger rows by construction: one
    // partition (the reference source is parallelism-1 by design;
    // parallelism comes from downstream stages). The partition carries
    // a BYTE RANGE recipe, not content: seek to the nearest indexed
    // block start at or before `from`, skip the remainder line-wise.
    val blockIdx = (from / index.blockSize).toInt
    Array(CsvRangePartition(
      RateLimitedCsv.path(options), sep, schema.length,
      index.blockOffsets(blockIdx),
      from - blockIdx.toLong * index.blockSize,
      to - from))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    CsvSliceReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** A byte-range read recipe: seek `startOffset`, skip `skipLines`
  * lines, serve `numRows` lines. The path must be visible to the
  * executor (local FS in tests; any shared mount / distributed FS in
  * production — the same contract as every file-based source). */
private[sources] case class CsvRangePartition(
    path: String, sep: String, nCols: Int,
    startOffset: Long, skipLines: Long, numRows: Long) extends InputPartition

private[sources] object CsvSliceReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CsvRangePartition]
    new PartitionReader[InternalRow] {
      // quoted separator is multi-char source text, so String.split's
      // single-char fast path never applies — compile once per reader
      private val sepPattern =
        java.util.regex.Pattern.compile(java.util.regex.Pattern.quote(p.sep))
      private val reader = {
        val in = new java.io.FileInputStream(p.path)
        var toSkip = p.startOffset
        while (toSkip > 0) {
          val s = in.skip(toSkip)
          require(s > 0, s"seek to ${p.startOffset} failed in ${p.path}")
          toSkip -= s
        }
        val r = new java.io.BufferedReader(new java.io.InputStreamReader(
          in, java.nio.charset.StandardCharsets.UTF_8))
        var i = 0L
        while (i < p.skipLines) { r.readLine(); i += 1 }
        r
      }
      private var served = 0L
      private var line: String = _
      override def next(): Boolean = {
        if (served >= p.numRows) false
        else {
          line = reader.readLine()
          served += 1
          line != null
        }
      }
      override def get(): InternalRow = {
        val fields = sepPattern.split(line, -1)
        val out = new Array[Any](p.nCols)
        var j = 0
        while (j < p.nCols) {
          out(j) = if (j < fields.length) UTF8String.fromString(fields(j)) else null
          j += 1
        }
        new GenericInternalRow(out)
      }
      override def close(): Unit = reader.close()
    }
  }
}
