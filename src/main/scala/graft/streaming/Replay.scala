package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Shared staged-file replay harness for the driver-gated streaming
  * queries (q75/q77/q78): stage a batch frame as `files` parquet
  * files, stream them back one file per micro-batch under
  * Trigger.AvailableNow, apply the streaming transform, collect the
  * appended output in a memory sink, and hand the sink table back for
  * batch post-processing. The staging dir is deleted on EVERY exit
  * path (a failed replay must not leak a full table copy in /tmp).
  *
  * `stateParts`: stateful queries pin their state-partition count at
  * the FIRST run from spark.sql.shuffle.partitions and then pay a
  * state-store commit per partition per micro-batch — scoping the
  * replay to ~the file count cuts that overhead with identical
  * semantics. The override must outlive start() (the stream thread
  * clones the session conf asynchronously while planning batch 0), so
  * it is restored only after the replay is fully consumed.
  *
  * `afterStage` runs between staging and stream start — q77 uses it to
  * append its sentinel file with a bumped mtime so the sentinel
  * arrives in the LAST micro-batch (FileStreamSource orders by
  * modification time).
  */
object Replay {

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  def run(s: SparkSession, frame: DataFrame, files: Int,
      stateParts: Option[Int] = None,
      afterStage: String => Unit = _ => ())(
      build: DataFrame => DataFrame): DataFrame = {
    // staging through graft.Fs: local tmpdir in local mode, or a
    // shared FS via spark.graft.stagingDir on a cluster
    val dir = graft.Fs.createStagingDir(s, "graft-replay")
    try {
      frame.repartition(files).write.mode("overwrite").parquet(dir)
      afterStage(dir)
      val stream = s.readStream.schema(frame.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val name = s"replay_${seq.incrementAndGet()}"
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      stateParts.foreach(p =>
        s.conf.set("spark.sql.shuffle.partitions", p.toString))
      try {
        val q = build(stream).writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        try require(q.awaitTermination(300000), s"replay $name timed out")
        finally q.stop()
      } finally stateParts.foreach(_ =>
        s.conf.set("spark.sql.shuffle.partitions", prevParts))
      s.table(name)
    } finally graft.Fs.deleteRecursively(dir,
      s.sparkContext.hadoopConfiguration)
  }
}
