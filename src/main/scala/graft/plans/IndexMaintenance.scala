package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Shared maintenance passes for the persisted-index family
  * ([[MinHashIndex]], [[Bm25Index]], [[IvfTopK]], [[PqIndex]]): every
  * append lifecycle accumulates one small file per touched partition
  * per ingest batch, so after N batches the serve scan pays N× the
  * per-file open/footer cost — the lakehouse small-file problem,
  * applied to index artifacts. Each index exposes a `compact` built
  * from these helpers; the layout-preserving rewrite here is the
  * shared core.
  */
object IndexMaintenance {

  /** Rewrite a parquet dataset partitioned by `partitionCols` into
    * `destDir` with ONE file per partition directory: a single shuffle
    * by the partition key — each key hashes to exactly one task, so
    * each partition directory gets exactly one writer — preserving the
    * directory layout that file-level pruning reads as partition
    * filters (a flat [[graft.sinks.Compact]] rewrite would destroy
    * it). Rows are untouched. Returns the output data-file count. */
  def compactPartitioned(s: SparkSession, srcDir: String, destDir: String,
      partitionCols: Seq[String], sortCols: Seq[String] = Nil): Int = {
    require(partitionCols.nonEmpty, "use sinks.Compact for flat datasets")
    ManifestIO.readDir(s, srcDir)
      .repartition(partitionCols.map(col): _*)
      // layouts that keep rows sorted inside each partition for
      // row-group min/max tightness (Z-order's `z`) re-sort here;
      // plain bucketed indexes pass Nil
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*)
      .parquet(destDir)
    graft.Fs.listDataFiles(destDir, s.sparkContext.hadoopConfiguration).size
  }

  /** Partition-local PHYSICAL delete from a partitioned parquet
    * dataset: rows whose `matchCol` is in `ids` are removed by
    * rewriting ONLY the partitions that hold them. The touched set
    * comes from a semi-join (bounded by the partition space, never the
    * delete size), the pruned scan anti-joins the ids, and the
    * surviving rows are written ONCE into a temp sibling tree whose
    * touched partition dirs swap into place
    * ([[swapTouchedPartitions]] — partitions emptied entirely simply
    * have no replacement and are deleted). Returns the number of rows
    * removed. */
  def deletePartitioned(s: SparkSession, dataDir: String,
      partitionCols: Seq[String], matchCol: String,
      ids: DataFrame, sortCols: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.broadcast
    require(partitionCols.nonEmpty)
    requireUncommitted(s, dataDir, "deletePartitioned")
    val data = ManifestIO.readDir(s, dataDir)
    requireIntegralPartitions(data, partitionCols, "deletePartitioned")
    val keys = ids.select(col(matchCol)).distinct()
    val touched = partitionValues(
      data.join(broadcast(keys), Seq(matchCol), "left_semi"), partitionCols)
    if (touched.isEmpty) return 0L
    val pruned = data.where(partitionPredicate(touched, partitionCols))
    val nRemoved = pruned
      .join(broadcast(keys), Seq(matchCol), "left_semi").count()
    val remaining = pruned.join(broadcast(keys), Seq(matchCol), "left_anti")
    swapTouchedPartitions(s, remaining, dataDir, partitionCols, sortCols,
      touched)
    nRemoved
  }

  /** Partition-local UPSERT into a partitioned parquet dataset — the
    * MERGE-INTO shape every incrementally-maintained state table needs
    * (q110s's cluster-label table is the first consumer): rows in
    * `updates` REPLACE resident rows with the same `keyCol` value and
    * new keys are inserted, by rewriting ONLY the partitions that hold
    * a replaced key or receive a row. The touched set comes from a
    * broadcast semi-join (bounded by the partition space, never the
    * table size), so at 100 TB a batch that remaps a handful of
    * clusters rewrites a handful of partition directories, never the
    * table. `updates` must carry the dataset's full schema including
    * the partition columns (an update may MOVE a row between
    * partitions; a source partition emptied that way is removed by
    * the swap, as in [[deletePartitioned]]). The merged rows are
    * written ONCE into a temp sibling tree whose touched partition
    * dirs swap into place ([[swapTouchedPartitions]]). Returns the
    * number of rows written.
    *
    * `partitionFromKey = true` declares the partition columns a PURE
    * FUNCTION of `keyCol` (a resident row with an updated key lives in
    * exactly the partition its replacement row carries), so the
    * touched set derives from the update rows alone and the
    * resident-side semi-join scan is skipped entirely — the common
    * hash-bucketed-state-table case (q110s's label table). Leave it
    * false when an update may MOVE a row between partitions.
    */
  def upsertPartitioned(s: SparkSession, dataDir: String,
      partitionCols: Seq[String], keyCol: String,
      updates: DataFrame, sortCols: Seq[String] = Nil,
      partitionFromKey: Boolean = false): Long = {
    import org.apache.spark.sql.functions.broadcast
    require(partitionCols.nonEmpty)
    requireUncommitted(s, dataDir, "upsertPartitioned")
    val data = ManifestIO.readDir(s, dataDir)
    requireIntegralPartitions(data, partitionCols, "upsertPartitioned")
    // the update relation feeds three consumers (key set, touched
    // partitions, merged rows) — compute its pipeline once
    val ups = graft.Materialize(updates.select(data.columns.toSeq.map(col): _*))
    try {
      val keys = ups.select(col(keyCol)).distinct()
      val touched = (
        (if (partitionFromKey) Nil
         else partitionValues(
           data.join(broadcast(keys), Seq(keyCol), "left_semi"),
           partitionCols))
        ++ partitionValues(ups, partitionCols)).distinct
      if (touched.isEmpty) return 0L
      val pruned = data.where(partitionPredicate(touched, partitionCols))
      // upsert semantics: resident rows with an updated key drop out,
      // `updates` supplies their replacements (and the inserts)
      val merged = pruned.join(broadcast(keys), Seq(keyCol), "left_anti")
        .unionByName(ups)
      swapTouchedPartitions(s, merged, dataDir, partitionCols, sortCols,
        touched)
    } finally graft.Materialize.release(ups)
  }

  /** [[upsertPartitioned]] under SNAPSHOT ISOLATION — the MERGE-INTO
    * for a manifest-committed STATE TABLE (q135's cluster-lineage
    * question: which cluster was a doc in AS OF version N — the
    * reproducibility record a training run needs about its own dedup
    * decisions). Same touched-partition derivation and merge as the
    * in-place form, but the merged partitions land as NEW SIBLING
    * files and the next manifest selects [untouched partitions'
    * version-v files + the merged files]
    * ([[Snapshots.commitReplacing]] with the touched partition dirs as
    * drop prefixes) — a reader pinned to version v keeps the pre-merge
    * state byte-identical, and partitions a merge empties simply drop
    * from the new manifest (their files stay for older versions; no
    * directory cleanup, [[Snapshots.expire]] reclaims). Requires a
    * committed dataset; `partitionFromKey` contract as in the in-place
    * form. Returns the committed version. */
  def upsertPartitionedCommit(s: SparkSession, dataDir: String,
      partitionCols: Seq[String], keyCol: String,
      updates: DataFrame, sortCols: Seq[String] = Nil,
      partitionFromKey: Boolean = false): Int = {
    import org.apache.spark.sql.functions.broadcast
    require(partitionCols.nonEmpty)
    val v = Snapshots.current(s, dataDir).getOrElse(
      throw new IllegalStateException(
        s"upsertPartitionedCommit: no committed version under $dataDir"))
    val data = Snapshots.read(s, dataDir, v)
    requireIntegralPartitions(data, partitionCols, "upsertPartitionedCommit")
    val ups = graft.Materialize(updates.select(data.columns.toSeq.map(col): _*))
    try {
      val keys = ups.select(col(keyCol)).distinct()
      val touched = (
        (if (partitionFromKey) Nil
         else partitionValues(
           data.join(broadcast(keys), Seq(keyCol), "left_semi"),
           partitionCols))
        ++ partitionValues(ups, partitionCols)).distinct
      if (touched.isEmpty) return v
      val pruned = data.where(partitionPredicate(touched, partitionCols))
      val merged = graft.Materialize.cut(
        pruned.join(broadcast(keys), Seq(keyCol), "left_anti")
          .unionByName(ups))
      merged
        .repartition(partitionCols.map(col): _*)
        .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
        .write.mode("append").partitionBy(partitionCols: _*)
        .parquet(dataDir)
      graft.Materialize.release(merged)
      Snapshots.commitReplacing(s, dataDir, v,
        touched.map(vs => partitionCols.zip(vs)
          .map { case (c, value) => s"$c=$value" }.mkString("/")))
    } finally graft.Materialize.release(ups)
  }

  /** Threshold-triggered PARTITION-LOCAL compaction — the maintenance
    * policy a continuously-ingesting index needs. Every append adds a
    * file per touched partition, so file counts grow linearly with
    * arrival batches; but a full-table rewrite per batch
    * ([[compactPartitioned]]) is quadratic total writing. This
    * rewrites ONLY partitions whose data-file count exceeds
    * `maxFiles` (one file per directory afterwards) and leaves every
    * other partition byte-identical — write amplification is bounded
    * by where the arriving data actually landed, never the table
    * size. File counts come from the directory listing (the local-FS
    * nio fast path), no data scan. Integral partition keys only (the
    * values are parsed back out of the `c=v` path segments, same
    * contract as the emptied-dir cleanup). Returns the number of
    * partitions rewritten. */
  def compactIfFragmented(s: SparkSession, dataDir: String,
      partitionCols: Seq[String], maxFiles: Int,
      sortCols: Seq[String] = Nil): Int = {
    require(partitionCols.nonEmpty && maxFiles >= 1)
    requireUncommitted(s, dataDir, "compactIfFragmented")
    val data = ManifestIO.readDir(s, dataDir)
    requireIntegralPartitions(data, partitionCols, "compactIfFragmented")
    val conf = s.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(dataDir).toUri.getPath
    val byPart = graft.Fs.listDataFiles(dataDir, conf).groupBy { f =>
      val segs = f.getPath.toUri.getPath.stripPrefix(base)
        .stripPrefix("/").split('/').dropRight(1)
      partitionCols.map { c =>
        segs.find(_.startsWith(c + "="))
          .map(_.substring(c.length + 1).toLong)
          .getOrElse(throw new IllegalStateException(
            s"compactIfFragmented: no $c= segment under $dataDir for " +
              f.getPath))
      }
    }
    val frag: Seq[Seq[Any]] = byPart.collect {
      case (vs, files) if files.size > maxFiles => vs: Seq[Any]
    }.toSeq
    if (frag.isEmpty) return 0
    swapTouchedPartitions(s,
      data.where(partitionPredicate(frag, partitionCols)),
      dataDir, partitionCols, sortCols, frag)
    frag.size
  }

  /** An IN-PLACE rewrite on a manifest-committed dataset deletes files
    * every committed version still references — the reader holding
    * version N would fail (or silently mis-read) through no fault of
    * its own. Refuse loudly: committed datasets mutate through the
    * snapshot-preserving variants ([[Snapshots.compactCommit]],
    * [[upsertPartitionedCommit]], the index families' *Commit forms).
    * One manifest-dir existence check. */
  private def requireUncommitted(s: SparkSession, dataDir: String,
      op: String): Unit =
    require(Snapshots.current(s, dataDir).isEmpty,
      s"$op: $dataDir is manifest-committed — an in-place rewrite would " +
        "dangle every committed version; use the snapshot-preserving " +
        "variant (compactCommit / upsertPartitionedCommit / the index's " +
        "*Commit form) instead")

  /** The emptied-partition cleanup reconstructs directory names as
    * "$c=$v" verbatim — correct for the integral partition keys every
    * current index layout uses (band_id/kbucket/cid/zbucket/dbucket),
    * WRONG for string/date/null values, which Hive path-escapes
    * (%-encoding, __HIVE_DEFAULT_PARTITION__). Refuse non-integral
    * layouts loudly instead of silently leaving emptied dirs behind to
    * resurrect on a later append. */
  private def requireIntegralPartitions(data: DataFrame,
      partitionCols: Seq[String], op: String): Unit =
    for (c <- partitionCols) {
      import org.apache.spark.sql.types._
      val ok = data.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok,
        s"$op: partition column $c is " +
          s"${data.schema(c).dataType} — the emptied-dir cleanup only " +
          "builds unescaped integral partition paths (string/date/null " +
          "values need Hive path escaping)")
    }

  /** Distinct partition-column tuples present in `df` — a driver-side
    * collect bounded by the partition space, never the row count. */
  private def partitionValues(df: DataFrame,
      partitionCols: Seq[String]): Seq[Seq[Any]] =
    df.select(partitionCols.map(col): _*).distinct().collect()
      .toSeq.map(r => partitionCols.indices.map(r.get))

  private def partitionPredicate(touched: Seq[Seq[Any]],
      partitionCols: Seq[String]) =
    touched.map { vs =>
      partitionCols.zip(vs).map { case (c, v) => col(c) === v }
        .reduce(_ && _)
    }.reduce(_ || _)

  /** The shared rewrite core of the in-place maintenance passes: write
    * `rows` partitioned by `partitionCols` into a FRESH SIBLING temp
    * dir, then swap each `touched` partition directory into place with
    * driver-side renames. The merged rows are computed and written
    * exactly ONCE — the previous shape checkpointed them to executor
    * storage, counted them, re-wrote them through dynamic partition
    * overwrite and collected their partition values: two full writes
    * and three reads of the same data per maintenance call. Emptied
    * partitions fall out naturally (a touched dir with no replacement
    * in the temp tree is simply deleted — dynamic overwrite needed an
    * explicit cleanup pass for those). The row count rides the write
    * job as an `observe` metric, so no second scan prices the return
    * value. Same non-atomicity contract as the dynamic overwrite it
    * replaces: in-place maintenance on an UNCOMMITTED dataset (the
    * committed lifecycles go through the snapshot-preserving forms). */
  private def swapTouchedPartitions(s: SparkSession, rows: DataFrame,
      dataDir: String, partitionCols: Seq[String], sortCols: Seq[String],
      touched: Seq[Seq[Any]]): Long = {
    val conf = s.sparkContext.hadoopConfiguration
    val tmp = dataDir.stripSuffix("/") + "-swap-" +
      java.util.UUID.randomUUID().toString.take(8)
    val obs = new org.apache.spark.sql.Observation()
    try {
      rows
        .observe(obs, org.apache.spark.sql.functions
          .count(org.apache.spark.sql.functions.lit(1)).as("n"))
        .repartition(partitionCols.map(col): _*)
        // sorted layouts (Z-order) keep their within-partition order
        // through the rewrite
        .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
        .write.mode("overwrite").partitionBy(partitionCols: _*)
        .parquet(tmp)
      val (fs, _) = graft.Fs.resolve(dataDir, conf)
      for (vs <- touched) {
        val sub = partitionCols.zip(vs)
          .map { case (c, v) => s"$c=$v" }.mkString("/")
        val dest = new org.apache.hadoop.fs.Path(s"$dataDir/$sub")
        val src = new org.apache.hadoop.fs.Path(s"$tmp/$sub")
        if (fs.exists(dest)) require(fs.delete(dest, true),
          s"swapTouchedPartitions: could not clear $dest")
        if (fs.exists(src)) {
          fs.mkdirs(dest.getParent)
          require(fs.rename(src, dest),
            s"swapTouchedPartitions: rename $src -> $dest failed")
        }
      }
      obs.get("n") match {
        case n: java.lang.Long => n.longValue()
        case other => sys.error(s"unexpected observe metric: $other")
      }
    } finally graft.Fs.deleteRecursively(tmp, conf)
  }

  /** Byte-copy a small side artifact (meta / stats / terms /
    * centroids) into the compacted index's directory tree. */
  def copyDir(s: SparkSession, srcDir: String, destDir: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val (srcFs, srcPath) = graft.Fs.resolve(srcDir, conf)
    val (dstFs, dstPath) = graft.Fs.resolve(destDir, conf)
    require(org.apache.hadoop.fs.FileUtil.copy(
      srcFs, srcPath, dstFs, dstPath, false, conf),
      s"artifact copy $srcDir -> $destDir failed")
  }
}
