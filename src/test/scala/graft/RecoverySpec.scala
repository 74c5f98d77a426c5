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
  */
class RecoverySpec extends SparkSpec {

  private def stageDocs(files: Int): (String, Long) = {
    val s = spark
    val docs = Tables.documents(s, sf)
      .select(col("doc_id"), md5(col("text")).as("content_md5"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-recovery-stage").toString
    docs.repartition(files).write.mode("overwrite").parquet(dir)
    (dir, docs.count())
  }

  test("stateless stream restarted from checkpoint is exactly-once") {
    val s = spark
    val (stage, total) = stageDocs(files = 8)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-recovery-ckpt").toString
    val sink = java.nio.file.Files
      .createTempDirectory("graft-recovery-sink").toString
    val schema = s.read.parquet(stage).schema
    def startQuery() = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
      .select(col("doc_id"), col("content_md5"))
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(250))
      .start()
    // first incarnation: stop after at least one batch has committed
    // but before the replay finishes — a mid-stream crash. The 250 ms
    // cadence spaces the 8 single-file batches ~2 s apart in total so
    // the stop below reliably lands mid-replay
    val q1 = startQuery()
    val deadline = System.currentTimeMillis() + 120000
    while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(10)
    q1.stop()
    val afterCrash = s.read.parquet(sink).count()
    assert(afterCrash < total, "first incarnation consumed everything; " +
      "the restart would prove nothing")
    // second incarnation: same checkpoint, runs to completion
    val q2 = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
      .select(col("doc_id"), col("content_md5"))
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q2.awaitTermination(120000), "recovery run timed out")
    val out = s.read.parquet(sink)
    assert(out.count() === total)           // nothing lost, nothing doubled
    assert(out.select(col("doc_id")).distinct().count() === total)
    for (p <- Seq(stage, ckpt, sink)) Fs.deleteRecursively(p)
  }

  test("stateful dedup restarted from checkpoint recovers its state") {
    val s = spark
    // duplicate every document so dedup state matters across batches
    val docs = Tables.documents(s, sf)
      .select(col("doc_id"), md5(col("text")).as("content_md5"))
    val doubled = docs.union(docs.withColumn("doc_id", col("doc_id") + 1000000))
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id")))
    val stage = java.nio.file.Files
      .createTempDirectory("graft-recovery2-stage").toString
    doubled.repartition(8).write.mode("overwrite").parquet(stage)
    val distinctDigests = docs.select(col("content_md5")).distinct().count()
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
