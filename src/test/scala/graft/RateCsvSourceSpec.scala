package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger

/** The DSv2 rate-limited CSV source (graft-rate-csv): exact row-level
  * admission per micro-batch — the reference's 4 rows/s dataset cap
  * (`J/source/GridFSCsvSource.java:98-128`, `J/Constants.java:36`)
  * re-expressed as declarative, checkpoint-replayable admission
  * control. */
class RateCsvSourceSpec extends SparkSpec {

  private def writeCsv(rows: Int): String = {
    val f = Files.createTempFile("graft-rate", ".csv")
    val body = "id\ttext" +: (0 until rows).map(i => s"$i\trow $i")
    Files.writeString(f, body.mkString("\n"))
    f.toString
  }

  test("admits exactly rowsPerTrigger rows per micro-batch and drains under AvailableNow") {
    val s = spark
    import s.implicits._
    val path = writeCsv(10)
    val q = s.readStream.format("graft-rate-csv")
      .option("path", path).option("sep", "\t")
      .option("rowsPerTrigger", "4")
      .load()
      .writeStream.format("memory").queryName("rate_csv_drain")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val out = s.table("rate_csv_drain")
      assert(out.count() === 10)
      assert(out.columns.toSeq === Seq("id", "text"))
      assert(out.select($"id").as[String].collect().map(_.toInt).sorted
        === (0 until 10).toArray)
      // 10 rows at 4/trigger = batches of 4, 4, 2 — never more than 4
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length === 3, batches.map(_.numInputRows).mkString(","))
      assert(batches.forall(_.numInputRows <= 4))
      assert(batches.map(_.numInputRows).sum === 10)
    } finally q.stop()
  }

  test("resumes from checkpointed offsets without re-admitting rows") {
    val s = spark
    import s.implicits._
    val path = writeCsv(6)
    val ckpt = Files.createTempDirectory("graft-rate-ckpt").toString
    val outDir = Files.createTempDirectory("graft-rate-out").toString
    def outRows(): Set[Int] =
      try s.read.parquet(outDir).select($"id").as[String]
        .collect().map(_.toInt).toSet
      catch { case _: Throwable => Set.empty }
    def start() = s.readStream.format("graft-rate-csv")
      .option("path", path).option("sep", "\t")
      .option("rowsPerTrigger", "2")
      .load()
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    val q1 = start()
    try {
      // wait until at least one non-empty batch committed, then kill
      val deadline = System.currentTimeMillis() + 60000
      while (System.currentTimeMillis() < deadline &&
        !q1.recentProgress.exists(_.numInputRows > 0)) Thread.sleep(25)
      assert(q1.recentProgress.exists(_.numInputRows > 0))
    } finally q1.stop()
    val q2 = start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (System.currentTimeMillis() < deadline && outRows().size < 6)
        Thread.sleep(25)
      // the file sink's transaction log + checkpointed offsets mean
      // every row is admitted exactly once across the restart
      assert(outRows() === (0 until 6).toSet)
      val dupes = s.read.parquet(outDir).groupBy($"id").count()
        .filter($"count" > 1).count()
      assert(dupes === 0, "restart re-admitted rows")
    } finally q2.stop()
  }

  test("streams the reference's own tweets.csv fixture at the reference's rate shape") {
    val s = spark
    import s.implicits._
    val fixture = "/root/reference/src/main/resources/tweets.csv"
    org.scalatest.Assertions.assume(
      java.nio.file.Files.exists(java.nio.file.Paths.get(fixture)))
    // reference dataset mode: GridFS CSV at a row-rate cap, drained to
    // completion. 177 data rows at 64/trigger = 3 admitted batches.
    val q = s.readStream.format("graft-rate-csv")
      .option("path", fixture).option("sep", "\t")
      .option("rowsPerTrigger", "64")
      .load()
      .writeStream.format("memory").queryName("rate_csv_fixture")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val out = s.table("rate_csv_fixture")
      assert(out.count() === 177)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length === 3 && batches.forall(_.numInputRows <= 64))
      // same rows the raw line split yields (the reference's own
      // parse-then-drop happens downstream, reference #12)
      val expected = scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(java.nio.file.Paths.get(fixture)))
        .asScala.drop(1).map(_.split("\t", -1)(0)).toSeq.sorted
      val got = out.select($"id").as[String].collect().toSeq.sorted
      assert(got === expected)
    } finally q.stop()
  }

  test("schema inference from the header, c0..cN without") {
    val s = spark
    val path = writeCsv(2)
    val withHeader = s.readStream.format("graft-rate-csv")
      .option("path", path).option("sep", "\t").load()
    assert(withHeader.columns.toSeq === Seq("id", "text"))
    val noHeader = s.readStream.format("graft-rate-csv")
      .option("path", path).option("sep", "\t")
      .option("header", "false").load()
    assert(noHeader.columns.toSeq === Seq("c0", "c1"))
  }
}
