package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Eager materialization + lineage cut for relations that feed iterative
  * loops or several downstream queries (minhash signatures, near-dup edge
  * lists, propagation labels).
  *
  * Strategy is selected per session via `spark.graft.materialize`:
  *
  *  - `"local"` (default) — `localCheckpoint(eager)`. Fastest, but the
  *    truncated lineage lives only in executor block storage: on a real
  *    cluster an executor loss makes the data unrecoverable and fails the
  *    job. The right choice for local[...] bench/verify runs.
  *  - `"reliable"` — `checkpoint(eager)` under the configured checkpoint
  *    dir (`spark.graft.checkpointDir`, else a temp dir is set once).
  *    Survives executor loss; the cluster-mode setting for 100 TB runs.
  *  - `"persist"` — `persist(DISK_ONLY)` forced with a count. Keeps full
  *    lineage (recomputable after loss) but does not truncate it, so plan
  *    analysis grows with iteration depth; sensible only for shallow
  *    pipelines. Callers that persist per-round state should
  *    [[release]] superseded frames to avoid unbounded disk usage.
  */
object Materialize {
  def apply(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.get("spark.graft.materialize", "local") match {
      case "reliable" => reliable(df)
      case "persist" =>
        val p = df.persist(StorageLevel.DISK_ONLY)
        p.count()
        p
      case _ => df.localCheckpoint(eager = true)
    }
  }

  /** Materialization that is guaranteed to CUT LINEAGE — required inside
    * iterative loops, where each round's plan embeds the previous
    * round's twice: without a cut the logical plan doubles per round and
    * Catalyst analysis alone exhausts the heap. `persist` cannot cut
    * (it substitutes InMemoryRelation at planning but keeps the growing
    * logical plan), so under that strategy loop-internal frames escalate
    * to a reliable checkpoint. */
  def cut(df: DataFrame): DataFrame =
    df.sparkSession.conf.get("spark.graft.materialize", "local") match {
      case "reliable" | "persist" => reliable(df)
      case _ => df.localCheckpoint(eager = true)
    }

  private def reliable(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val sc = s.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      s.conf.getOption("spark.graft.checkpointDir") match {
        case Some(dir) => sc.setCheckpointDir(dir)
        case None =>
          // Spark does not remove checkpoint data on stop()
          // (cleanCheckpoints is off by default), so a temp dir WE
          // minted is ours to reclaim at JVM exit; a user-configured
          // dir is left alone.
          val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
          Runtime.getRuntime.addShutdownHook(
            new Thread(() => Fs.deleteRecursively(tmp)))
          sc.setCheckpointDir(tmp)
      }
    }
    df.checkpoint(eager = true)
  }

  /** Drop a frame previously materialized here, freeing its storage
    * NOW instead of at session end. The caller contracts the frame is
    * dead — a truncated-lineage checkpoint cannot recompute freed
    * blocks. `"local"` mode reaches through the plan's LogicalRDD
    * (`Dataset.unpersist` cannot see checkpoint blocks; leaking them
    * across bench sweeps until a full GC measured as 2x sweep-to-sweep
    * variance on the dedup suite). `"reliable"` checkpoint files are
    * reclaimed by the shutdown hook when under a temp dir this object
    * minted; user-configured checkpoint dirs are the user's to
    * manage. */
  def release(df: DataFrame): Unit =
    df.sparkSession.conf.get("spark.graft.materialize", "local") match {
      case "persist" => df.unpersist(blocking = false)
      case "reliable" => ()
      case _ => org.apache.spark.sql.GraftSqlBridge.unpersistLocalCheckpoint(df)
    }
}
