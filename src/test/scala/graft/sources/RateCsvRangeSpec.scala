package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The byte-range internals of graft-rate-csv: the driver holds only a
  * sparse line-offset index (bounded memory at any file size) and the
  * executor-side reader serves exact [from, to) slices across index
  * block boundaries; plus the ReadLimit budget arithmetic. Lives in
  * graft.sources to reach the private[sources] stream. */
class RateCsvRangeSpec extends graft.SparkSpec {

  private def writeCsv(rows: Int, eol: String = "\n",
      trailingEol: Boolean = true): String = {
    val f = Files.createTempFile("graft-range", ".csv")
    val body = ("id\ttext" +: (0 until rows).map(i => s"$i\trow $i"))
      .mkString("", eol, if (trailingEol) eol else "")
    Files.writeString(f, body)
    f.toString
  }

  private def opts(kv: (String, String)*): CaseInsensitiveStringMap = {
    val m = new java.util.HashMap[String, String]()
    kv.foreach { case (k, v) => m.put(k, v) }
    new CaseInsensitiveStringMap(m)
  }

  test("line index counts data lines and records block starts (LF, CRLF, no trailing EOL)") {
    for ((eol, trailing) <- Seq(("\n", true), ("\n", false),
        ("\r\n", true), ("\r\n", false))) {
      val path = writeCsv(10, eol, trailing)
      val idx = RateLimitedCsv.buildIndex(opts(
        "path" -> path, "sep" -> "\t", "indexEvery" -> "4"))
      assert(idx.count === 10, s"eol=${eol.length} trailing=$trailing")
      // blocks start at data lines 0, 4, 8
      assert(idx.blockOffsets.length === 3)
    }
  }

  test("slices are exact across index block boundaries") {
    val s = spark
    import s.implicits._
    // 300 rows, tiny index blocks (7) and a trigger size (13) that is
    // coprime with it, so nearly every batch crosses a block boundary
    val path = writeCsv(300)
    val q = s.readStream.format("graft-rate-csv")
      .option("path", path).option("sep", "\t")
      .option("rowsPerTrigger", "13")
      .option("indexEvery", "7")
      .load()
      .writeStream.format("memory").queryName("rate_csv_blocks")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val got = s.table("rate_csv_blocks").select($"id").as[String]
        .collect().map(_.toInt).sorted
      assert(got === (0 until 300).toArray)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.forall(_.numInputRows <= 13))
    } finally q.stop()
  }

  test("CRLF files stream the same rows as LF files") {
    val s = spark
    import s.implicits._
    val path = writeCsv(25, eol = "\r\n")
    val q = s.readStream.format("graft-rate-csv")
      .option("path", path).option("sep", "\t")
      .option("rowsPerTrigger", "8").option("indexEvery", "5")
      .load()
      .writeStream.format("memory").queryName("rate_csv_crlf")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val rows = s.table("rate_csv_crlf")
        .select($"id", $"text").as[(String, String)].collect()
      assert(rows.map(_._1.toInt).sorted === (0 until 25).toArray)
      // no CR bleeds into the last column
      assert(rows.forall { case (_, t) => !t.contains("\r") })
    } finally q.stop()
  }

  test("composite ReadLimit honors the row bound and ignores non-row members") {
    val path = writeCsv(50)
    val o = opts("path" -> path, "sep" -> "\t", "rowsPerTrigger" -> "5")
    val stream = new RateLimitedCsvStream(RateLimitedCsv.schemaFor(o), o)
    def to(limit: ReadLimit): Long =
      stream.latestOffset(RowCountOffset(0L), limit)
        .asInstanceOf[RowCountOffset].rows
    // plain maxRows: the engine's echo of the default
    assert(to(ReadLimit.maxRows(5)) === 5)
    // composite (minRows, maxRows): minRows imposes NO row bound — the
    // budget is the composite's maxRows, not perTrigger
    assert(to(ReadLimit.compositeLimit(Array(
      ReadLimit.minRows(1, 10000), ReadLimit.maxRows(17)))) === 17)
    // composite (minRows, allAvailable): drains
    assert(to(ReadLimit.compositeLimit(Array(
      ReadLimit.minRows(1, 10000), ReadLimit.allAvailable()))) === 50)
    // composite with no row-bounding member: falls back to perTrigger
    assert(to(ReadLimit.compositeLimit(Array(
      ReadLimit.minRows(1, 10000)))) === 5)
    // allAvailable alone: drains
    assert(to(ReadLimit.allAvailable()) === 50)
  }
}
