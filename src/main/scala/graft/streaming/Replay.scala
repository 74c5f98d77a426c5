package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Shared staged-file replay harness for the driver-gated streaming
  * queries (q75/q77/q78): stage a batch frame as `files` parquet
  * files, stream them back one file per micro-batch under
  * Trigger.AvailableNow, apply the streaming transform, collect the
  * appended output in a memory sink, and hand the materialized result
  * back for batch post-processing. The sink's temp view is dropped
  * before returning (a bench sweep re-runs each replay query several
  * times — an undropped memory sink would accumulate every run's rows
  * in driver memory for the session's lifetime).
  *
  * Staging is the replay's fixed cost (write the corpus + read it
  * back per run). [[stageOnce]] memoizes the staged directory per
  * (session, key) — a bench sweep stages each replay corpus ONCE and
  * replays it on every run, the way a production pipeline reads one
  * landed dataset many times. Memoized dirs are reclaimed by
  * [[clearStaged]] or a JVM shutdown hook; un-keyed runs stage into a
  * private dir deleted on every exit path (a failed replay must not
  * leak a full table copy in /tmp).
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
  * modification time). Under stageOnce it runs once, at staging time.
  */
object Replay {

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  private val staged = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  // ONE shutdown hook for every staged dir, registered lazily on first
  // staging: a per-dir hook would accumulate unboundedly in a
  // long-lived session and outlive clearStaged (running later against
  // dirs already reclaimed). The hook snapshots the live map at JVM
  // exit; delete is best-effort (the Hadoop conf may already be
  // stopped, in which case the temp dir dies with the host).
  private lazy val exitHook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => {
      val it = staged.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        try graft.Fs.deleteRecursively(e.getValue,
          e.getKey._1.sparkContext.hadoopConfiguration)
        catch { case _: Throwable => () }
      }
    }))

  /** Stage `frame` as `files` parquet files exactly once per
    * (session, key); later calls reuse the directory. */
  def stageOnce(s: SparkSession, key: String, frame: => DataFrame,
      files: Int, afterStage: String => Unit = _ => ()): String =
    staged.computeIfAbsent((s, key), _ => {
      exitHook
      val dir = graft.Fs.createStagingDir(s, "graft-replay")
      // a failed staging write must not leave a memoized half-staged
      // dir (computeIfAbsent discards the mapping on throw, but the
      // partial files would leak without this cleanup)
      try {
        frame.repartition(files).write.mode("overwrite").parquet(dir)
        afterStage(dir)
      } catch { case t: Throwable =>
        graft.Fs.deleteRecursively(dir, s.sparkContext.hadoopConfiguration)
        throw t
      }
      dir
    })

  /** The far-future WATERMARK-FLUSH SENTINEL as a shared `afterStage`
    * hook: append `rows` as one parquet file whose mtime is bumped a
    * minute ahead, so FileStreamSource (which orders files by
    * modification time) delivers them in the FINAL micro-batch.
    *
    * Why it exists: a keyed APPEND-mode stateful query (windowed agg,
    * session_window, left-outer stream-stream join) only emits a
    * state entry once the watermark proves it closed, and a bounded
    * replay's last real row leaves the watermark short of the final
    * windows — the state would simply never flush. A production
    * pipeline solves this with a watermark heartbeat; the replay twin
    * is sentinel rows whose event time lies past every real row
    * (caller's contract: strictly greater than max(event time) +
    * watermark delay + widest window/gap), filtered back out of the
    * output by their marker key. Shared by q77/q51s/q102b;
    * SentinelFlushSpec property-tests that an arbitrary keyed
    * append-mode aggregation drains completely under it.
    *
    * I/O goes through the Hadoop FileSystem API, so the trick works
    * against hdfs:// staging unchanged. Under [[stageOnce]] keyed
    * staging it runs once, at staging time. */
  def sentinelAfterStage(s: SparkSession,
      rows: Seq[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType): String => Unit =
    dir => {
      val hconf = s.sparkContext.hadoopConfiguration
      def files: Set[String] = graft.Fs
        .listDataFiles(dir, hconf).map(_.getPath.toString).toSet
      val before = files
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .coalesce(1).write.mode("append").parquet(dir)
      // a minute ahead so the ordering holds even on a coarse-mtime
      // filesystem
      val bumped = System.currentTimeMillis() + 60000
      (files -- before).foreach(graft.Fs.setMTime(_, hconf, bumped))
    }

  /** Replay OUTPUT cuts handed to callers ([[replayStream]]'s
    * materialized memory-sink rows). The cut severs lineage, so
    * `Dataset.unpersist` can't reach its blocks and the ContextCleaner
    * only reclaims them after a full driver GC notices the dead RDD —
    * under a bench sweep that ran ~10 replay queries back-to-back the
    * un-reclaimed block storage plus lingering state-store maps showed
    * up as monotone cross-sweep degradation on q84/q84b (r12 sweeps
    * [3.50, 7.19, 8.23]). The harness calls [[releaseOutputs]] after
    * each consumed query; sessions that never call it just fall back
    * to GC-time reclamation (the old behavior). */
  private val liveOutputs =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Release every replay output cut handed out since the last call.
    * Callers contract that those frames are fully consumed (written /
    * collected) — a truncated-lineage checkpoint cannot recompute
    * freed blocks. */
  def releaseOutputs(): Unit = {
    var df = liveOutputs.poll()
    while (df != null) {
      graft.Materialize.release(df)
      df = liveOutputs.poll()
    }
  }

  /** Unload every lingering state-store provider. A stopped streaming
    * query's providers stay in the executor-side registry (holding the
    * last ~2 versions of each partition's state map — corpus-sized for
    * the dedup replays, native memory for RocksDB) until the 60 s
    * maintenance tick notices the query is gone; a replay harness runs
    * many short-lived queries per minute, so it unloads eagerly. Safe
    * against concurrent streams: an unloaded provider reloads from its
    * checkpoint on next access. */
  private def unloadStateStores(): Unit =
    try org.apache.spark.sql.GraftSqlBridge.unloadStateStores()
    catch { case _: Throwable => () }

  /** Drop all memoized staged directories (bench/test hygiene). */
  def clearStaged(): Unit = {
    val it = staged.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      graft.Fs.deleteRecursively(e.getValue,
        e.getKey._1.sparkContext.hadoopConfiguration)
      it.remove()
    }
  }

  def run(s: SparkSession, frame: DataFrame, files: Int,
      stateParts: Option[Int] = None,
      afterStage: String => Unit = _ => (),
      stageKey: Option[String] = None)(
      build: DataFrame => DataFrame): DataFrame = {
    // un-keyed staging happens INSIDE the try below, so a failure
    // during the staging write itself (not just the replay) still
    // deletes the private dir — the docstring's "deleted on every exit
    // path" guarantee.
    val dir = stageKey match {
      case Some(k) => stageOnce(s, k, frame, files, afterStage)
      case None => graft.Fs.createStagingDir(s, "graft-replay")
    }
    try {
      if (stageKey.isEmpty) {
        frame.repartition(files).write.mode("overwrite").parquet(dir)
        afterStage(dir)
      }
      replayStream(s, dir, frame.schema, stateParts)(build)
    } finally if (stageKey.isEmpty) graft.Fs.deleteRecursively(dir,
      s.sparkContext.hadoopConfiguration)
  }

  /** Like [[run]], but stages ONE file per value of `batchCol`
    * (1..batches) with strictly increasing modification times, so the
    * replay's micro-batch ORDER equals the batch column:
    * FileStreamSource orders files by mtime and maxFilesPerTrigger=1
    * serializes one file per trigger. This is the harness for
    * TTL-sensitive queries (q84b), where WHICH micro-batch a row
    * arrives in is part of the modeled semantics. The one-file-per-
    * batch coalesce is the replay's determinism device, not a
    * production shape — a firehose lands many files per interval and
    * batch membership comes from landing time. */
  def runBatched(s: SparkSession, frame: DataFrame, batchCol: String,
      batches: Int, stateParts: Option[Int] = None,
      stageKey: Option[String] = None)(
      build: DataFrame => DataFrame): DataFrame = {
    val dir = batchedDir(s, frame, batchCol, batches, stageKey)
    try {
      if (stageKey.isEmpty) stageBatchedInto(s, frame, batchCol, batches, dir)
      replayStream(s, dir, frame.schema, stateParts)(build)
    } finally if (stageKey.isEmpty) graft.Fs.deleteRecursively(dir,
      s.sparkContext.hadoopConfiguration)
  }

  /** Like [[runBatched]], but the per-micro-batch consumer is a
    * DRIVER-side `foreachBatch` callback instead of a streaming
    * transform — the harness for lifecycle operators that MUTATE an
    * external artifact per arriving batch (the q103s streaming ingest
    * loop admits against, then appends into, the persisted LSH index
    * inside each callback). Same staging/ordering contract: one file
    * per `batchCol` value, strictly increasing mtimes,
    * maxFilesPerTrigger = 1, so callback order equals the batch
    * column. */
  def runBatchedForeach(s: SparkSession, frame: DataFrame, batchCol: String,
      batches: Int, stageKey: Option[String] = None)(
      handle: DataFrame => Unit): Unit = {
    val dir = batchedDir(s, frame, batchCol, batches, stageKey)
    try {
      if (stageKey.isEmpty) stageBatchedInto(s, frame, batchCol, batches, dir)
      val stream = s.readStream.schema(frame.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val q = stream.writeStream
        .foreachBatch((df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) => handle(df))
        .trigger(Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(300000), "foreach replay timed out")
      finally { q.stop(); unloadStateStores() }
    } finally if (stageKey.isEmpty) graft.Fs.deleteRecursively(dir,
      s.sparkContext.hadoopConfiguration)
  }

  /** One staged file per `batchCol` value (1..batches), mtime-ordered;
    * memoized under `stageKey` like [[stageOnce]]. */
  private def batchedDir(s: SparkSession, frame: DataFrame, batchCol: String,
      batches: Int, stageKey: Option[String]): String =
    stageKey match {
      case Some(k) => staged.computeIfAbsent((s, k), _ => {
        exitHook
        val d = graft.Fs.createStagingDir(s, "graft-replay")
        try stageBatchedInto(s, frame, batchCol, batches, d)
        catch { case t: Throwable =>
          graft.Fs.deleteRecursively(d, s.sparkContext.hadoopConfiguration)
          throw t
        }
        d
      })
      case None => graft.Fs.createStagingDir(s, "graft-replay")
    }

  private def stageBatchedInto(s: SparkSession, frame: DataFrame,
      batchCol: String, batches: Int, dir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), s.sparkContext.hadoopConfiguration)
    val base = System.currentTimeMillis()
    for (b <- 1 to batches) {
      val tmp = graft.Fs.createStagingDir(s, "graft-replay-batch")
      try {
        frame.where(col(batchCol) === b)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
          .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
        val dest = new org.apache.hadoop.fs.Path(s"$dir/b$b.parquet")
        fs.rename(part, dest)
        fs.setTimes(dest, base + b * 2000L, -1)
      } finally graft.Fs.deleteRecursively(tmp,
        s.sparkContext.hadoopConfiguration)
    }
  }

  /** The shared replay body: stream the staged dir one file per
    * micro-batch, apply `build`, drain into a memory sink, return the
    * materialized appended rows. */
  private def replayStream(s: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      stateParts: Option[Int])(
      build: DataFrame => DataFrame): DataFrame = {
    val stream = s.readStream.schema(schema)
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
      finally { q.stop(); unloadStateStores() }
    } finally stateParts.foreach(_ =>
      s.conf.set("spark.sql.shuffle.partitions", prevParts))
    // materialize the sink rows, then release the sink itself
    val out = graft.Materialize.cut(s.table(name))
    liveOutputs.add(out)
    s.catalog.dropTempView(name)
    out
  }
}
