package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Checkpoint-recovery semantics: a streaming query killed mid-replay
  * and restarted from the same checkpoint must neither lose nor
  * duplicate rows — the offset log + file-sink manifest (and, for the
  * stateful form, the recovered state store) give exactly-once
  * output. This is the production property the staged-file replays
  * (q75/q77/q78) rely on implicitly; here it is exercised across a
  * real stop/restart boundary.
  *
  * The mid-replay cut is DETERMINISTIC: the input is staged in two
  * phases, and phase B's files only appear in the source directory
  * after the first incarnation has stopped. However slow or bursty
  * the machine, incarnation 1 cannot have consumed rows it never saw
  * — so "the crash happened before the replay finished" holds by
  * construction, not by a trigger-cadence race.
  */
class RecoverySpec extends SparkSpec {

  /** Move `from`'s staged parquet part-files into `to` (simulates new
    * data landing between the crash and the restart). */
  private def appendFiles(from: String, to: String): Unit = {
    for (f <- new java.io.File(from).listFiles()
         if f.getName.endsWith(".parquet"))
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(to, f.getName))
    Fs.deleteRecursively(from)
  }

  test("stateless stream restarted from checkpoint is exactly-once") {
    val s = spark
    val docs = Tables.documents(s, sf)
      .select(col("doc_id"), md5(col("text")).as("content_md5"))
    val total = docs.count()
    val stage = java.nio.file.Files
      .createTempDirectory("graft-recovery-stage").toString
    val pending = java.nio.file.Files
      .createTempDirectory("graft-recovery-pending").toString
    docs.where(col("doc_id") % 2 === 0)
      .repartition(4).write.mode("overwrite").parquet(stage)
    docs.where(col("doc_id") % 2 === 1)
      .repartition(4).write.mode("overwrite").parquet(pending)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-recovery-ckpt").toString
    val sink = java.nio.file.Files
      .createTempDirectory("graft-recovery-sink").toString
    val schema = s.read.parquet(stage).schema
    def build(trigger: Trigger) = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
      .select(col("doc_id"), col("content_md5"))
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(trigger)
      .start()
    // first incarnation: stop after at least one batch has committed.
    // Phase B is not yet visible, so this incarnation CANNOT finish
    // the full replay regardless of how many batches it drains.
    val q1 = build(Trigger.ProcessingTime(250))
    val deadline = System.currentTimeMillis() + 120000
    while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(10)
    q1.stop()
    val afterCrash = s.read.parquet(sink).count()
    assert(afterCrash < total, "first incarnation consumed everything; " +
      "the restart would prove nothing")
    // the rest of the data lands, then the second incarnation resumes
    // from the same checkpoint and runs to completion
    appendFiles(pending, stage)
    val q2 = build(Trigger.AvailableNow())
    assert(q2.awaitTermination(120000), "recovery run timed out")
    val out = s.read.parquet(sink)
    assert(out.count() === total)           // nothing lost, nothing doubled
    assert(out.select(col("doc_id")).distinct().count() === total)
    for (p <- Seq(stage, ckpt, sink)) Fs.deleteRecursively(p)
  }

  test("stateful dedup restarted from checkpoint recovers its state") {
    val s = spark
    // phase A: every document once; phase B (landing only after the
    // restart): a full duplicate of every document. Every phase-B row
    // must be dropped by state RECOVERED from the checkpoint — digests
    // emitted before the crash are only deduped after it if the store
    // survived the restart.
    val docs = Tables.documents(s, sf)
      .select(col("doc_id"), md5(col("text")).as("content_md5"))
    def withTs(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id")))
    val distinctDigests = docs.select(col("content_md5")).distinct().count()
    val stage = java.nio.file.Files
      .createTempDirectory("graft-recovery2-stage").toString
    val pending = java.nio.file.Files
      .createTempDirectory("graft-recovery2-pending").toString
    withTs(docs).repartition(4).write.mode("overwrite").parquet(stage)
    withTs(docs.withColumn("doc_id", col("doc_id") + 1000000))
      .repartition(4).write.mode("overwrite").parquet(pending)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-recovery2-ckpt").toString
    val sink = java.nio.file.Files
      .createTempDirectory("graft-recovery2-sink").toString
    val schema = s.read.parquet(stage).schema
    def build(trigger: Trigger) = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
      .withWatermark("ts", "3000000 seconds")
      .dropDuplicatesWithinWatermark("content_md5")
      .select(col("content_md5"))
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(trigger)
      .start()
    val q1 = build(Trigger.ProcessingTime(250))
    val deadline = System.currentTimeMillis() + 120000
    while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(10)
    q1.stop()
    appendFiles(pending, stage)
    val q2 = build(Trigger.AvailableNow())
    assert(q2.awaitTermination(120000), "stateful recovery timed out")
    val out = s.read.parquet(sink)
    // recovered state must dedup across the restart boundary: every
    // digest exactly once, despite each appearing twice in the input
    assert(out.count() === distinctDigests)
    assert(out.distinct().count() === distinctDigests)
    for (p <- Seq(stage, ckpt, sink)) Fs.deleteRecursively(p)
  }
}
