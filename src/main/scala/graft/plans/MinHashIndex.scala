package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Persisted MinHash-LSH dedup index — the DEDUP lifecycle twin of
  * [[PqIndex]]/[[IvfTopK]]/[[Bm25Index]]: sketch the resident corpus
  * ONCE per version, persist the banded index, and dup-check every
  * INCOMING batch against it without re-sketching (or even re-reading)
  * a single resident document. This is the shape a 100 TB ingestion
  * pipeline actually runs: all-pairs dedup (q31) happens once per
  * corpus version; every arriving crawl shard afterwards is a small
  * probe against the standing index.
  *
  * Artifact layout under `indexDir`:
  *   - `bands/` — the melted index rows (doc_id, sig, bk0, band_key),
  *     one row per (doc, band), PARTITIONED by (band_id, kbucket =
  *     band_key mod [[KBuckets]]): a probe batch's collected
  *     (band_id, kbucket) set — bounded by Bands × KBuckets values,
  *     never data-sized — prunes the scan at the FILE level, so a
  *     small batch opens a sliver of the index instead of all of it.
  *     Each row carries the full K-long signature (est-Jaccard
  *     verification happens inside the same join — no second
  *     corpus-sized lookup) and the band-0 key (the
  *     first-collision-band gate for the band-1 leg — a filter, not a
  *     distinct shuffle). ~2×(8+8+8+K×8) bytes per document: orders
  *     of magnitude under the text it indexes.
  *   - `meta/`  — one row naming the resident documents path.
  *   - `bands/deletes/` — MANIFEST-COMMITTED indexes only: the
  *     tombstone list [[deleteCommit]] appends (inside the manifested
  *     tree, so one version pins rows + applicable deletes together);
  *     version-aware readers anti-join it, [[purgeCommit]] folds it
  *     into a partition-local physical purge.
  *
  * `serve` probes a batch: the batch is sketched map-side with the
  * exact q31 kernel, BROADCAST (the incremental contract is
  * batch ≪ corpus), and hash-joined against the pruned scan — no
  * shuffle of index rows at all. Hot band keys (boilerplate / empty
  * documents sharing one signature) cost candidate VOLUME here, not a
  * single-reducer stall: the broadcast join fans the hot bucket out
  * across the scan's file partitions, unlike the self-join case that
  * needs [[Dedup]]'s salted-triangle guard.
  */
object MinHashIndex {

  // the first-collision-band gate in serveFrom/admit ("band 0, or the
  // band-0 keys differ") deduplicates multi-band collisions correctly
  // only for a 2-band scheme: with 3+ bands a pair colliding on two
  // NON-zero bands would be counted twice. Fail loudly at first use
  // if Bands is ever raised without generalizing the gate to carry
  // all band keys ("count at the minimum colliding band").
  require(Dedup.Bands == 2,
    s"MinHashIndex's first-collision-band gate assumes Dedup.Bands == 2 " +
      s"(got ${Dedup.Bands}) — generalize the gate before raising Bands")

  /** Band-key hash-partition count for the persisted index. */
  val KBuckets = 64

  final case class Handle(docsPath: String, bandsPath: String)

  private def kbucket(c: Column) = pmod(c, lit(KBuckets)).cast("int")

  private def withBucket(rows: DataFrame): DataFrame =
    rows.withColumn("kbucket", kbucket(col("band_key")))

  /** The OCC append's LANDING step, writer-exact: sketch `docs`' band
    * rows into a private staging subdir and move them into the live
    * (band_id, kbucket) layout ([[Snapshots.landStaged]]), returning
    * the bands-relative paths this writer — and only this writer —
    * landed. Test-visible so the interleaved-landing race (writer B
    * landing between writer A's landing and A's commit) can be staged
    * deterministically. */
  private[graft] def landBands(s: SparkSession, bands: String,
      docs: DataFrame): Seq[String] =
    Snapshots.landStaged(s, bands) { stage =>
      withBucket(Dedup.indexBandRows(docs))
        .repartition(col("band_id"), col("kbucket"))
        .write.mode("append").partitionBy("band_id", "kbucket")
        .parquet(stage)
    }

  /** Sketch `residentDocs` ((doc_id, text)) and persist the banded
    * index under `indexDir` — the one-off indexing job. `docsPath`
    * names the source for [[load]]'s meta. */
  def save(s: SparkSession, residentDocs: DataFrame, docsPath: String,
      indexDir: String): Handle = {
    val base = IvfTopK.qualify(s, indexDir)
    withBucket(Dedup.indexBandRows(residentDocs))
      // write-sized-for-read: one shuffle by the partition key so each
      // (band_id, kbucket) directory gets ONE file — without it every
      // sketch task writes a sliver into every directory (32 tasks ×
      // 128 dirs ≈ 4k files) and the serve path's pruned scan pays the
      // per-file open cost the partitioning was meant to save
      .repartition(col("band_id"), col("kbucket"))
      .write.mode("overwrite").partitionBy("band_id", "kbucket")
      .parquet(s"$base/bands")
    import s.implicits._
    Seq(docsPath).toDF("docs_path")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/meta")
    Handle(docsPath, s"$base/bands")
  }

  private val savedDirs = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Handle]()

  /** [[save]] exactly once per (session, indexDir) — the oracle-gated
    * serve query (q99) goes through this so bench sweeps and repeated
    * verify runs probe the artifacts instead of re-indexing per
    * invocation. */
  def ensureSaved(s: SparkSession, residentDocs: => DataFrame,
      docsPath: String, indexDir: String): Handle =
    savedDirs.computeIfAbsent((s, IvfTopK.qualify(s, indexDir)),
      _ => save(s, residentDocs, docsPath, indexDir))

  /** Incremental maintenance: a batch that passed the dup-check is
    * admitted to the corpus by appending its band rows — a
    * dynamic-partition append touching only the (band_id, kbucket)
    * partitions the batch's keys land in; the resident index is never
    * rewritten. Fresh doc_ids are the caller's contract. Returns the
    * appended document count. */
  def append(s: SparkSession, indexDir: String, newDocs: DataFrame): Long = {
    val base = IvfTopK.qualify(s, indexDir)
    val staged = graft.Materialize.cut(newDocs)
    requireNotTombstoned(s, s"$base/bands",
      staged.select(col("doc_id")).distinct(), "append")
    withBucket(Dedup.indexBandRows(staged))
      .repartition(col("band_id"), col("kbucket"))
      .write.mode("append").partitionBy("band_id", "kbucket")
      .parquet(s"$base/bands")
    staged.count()
  }

  /** RE-INGEST RULE for a committed, tombstoned index (the
    * [[Bm25Index.append]] contract's band-index twin): a tombstoned
    * id's PHYSICAL band rows are still on disk — appending it again
    * would leave duplicate rows that RESURRECT the moment
    * [[purgeCommit]] drops the tombstone list. Tombstone-×-batch-sized
    * broadcast check; no-op for uncommitted or tombstone-free indexes
    * (one manifest-dir stat). */
  private def requireNotTombstoned(s: SparkSession, bands: String,
      ids: DataFrame, op: String): Unit =
    for (v <- Snapshots.current(s, bands)) {
      val tombF = manifestPieces(s, bands, v)._2
      if (tombF.nonEmpty) {
        val clash = ids.join(broadcast(s.read.parquet(tombF: _*)),
          Seq("doc_id"), "left_semi").count()
        require(clash == 0L,
          s"$op: $clash doc_id(s) are tombstoned as of v$v under $bands " +
            "— re-ingest of a deleted id requires a purgeCommit first")
      }
    }

  /** DELETION — the retention/right-to-erasure pass that completes
    * the lifecycle (save → append → compact → DELETE): remove the
    * given doc_ids' band rows by rewriting ONLY the (band_id, kbucket)
    * partitions that hold them. The touched-partition set is derived
    * from a semi-join (bounded: ≤ Bands × [[KBuckets]] values
    * regardless of delete size), the pruned scan anti-joins the id
    * set, and the rewrite goes through DYNAMIC partition overwrite so
    * untouched partitions' files are never rewritten — at 100 TB a
    * deletion batch costs the partitions it lands in, not an index
    * rewrite. Partitions emptied entirely are removed explicitly
    * (dynamic overwrite only replaces partitions it writes). The
    * remaining rows are materialized before the in-place overwrite
    * (Spark cannot overwrite a path it is still reading); a warehouse
    * deployment writes to a fresh dir + pointer-flips instead, as with
    * compact(). Returns the number of index rows removed. */
  def delete(s: SparkSession, indexDir: String, deleteIds: DataFrame): Long =
    IndexMaintenance.deletePartitioned(s,
      s"${IvfTopK.qualify(s, indexDir)}/bands",
      Seq("band_id", "kbucket"), "doc_id", deleteIds)

  /** COMPACTION — the maintenance pass the append lifecycle needs at
    * scale: every [[append]] adds one small file per touched
    * (band_id, kbucket) partition, so after N ingest batches a
    * partition holds N+1 files and the serve scan's per-file
    * open/footer cost grows linearly with ingest history. Rewrite the
    * bands into `destDir` with ONE file per partition — a single
    * shuffle by the partition key (each key hashes to exactly one
    * task, so each partition directory gets exactly one writer) —
    * preserving the (band_id, kbucket) layout the serve path's
    * file-level pruning depends on ([[Compact.compactParquet]]'s flat
    * rewrite would destroy it). Rows are identical, so serve/admit
    * results are unchanged by construction — and q103b proves it
    * end-to-end under the oracle gate. Writes to a NEW directory; the
    * atomic swap is the caller's pointer flip, as with the flat
    * compactor. Returns the output file count. */
  def compact(s: SparkSession, srcDir: String, destDir: String): Int = {
    val src = IvfTopK.qualify(s, srcDir)
    val dest = IvfTopK.qualify(s, destDir)
    val n = IndexMaintenance.compactPartitioned(s,
      s"$src/bands", s"$dest/bands", Seq("band_id", "kbucket"))
    IndexMaintenance.copyDir(s, s"$src/meta", s"$dest/meta")
    n
  }

  /** Threshold-triggered partition-local compaction IN PLACE — the
    * auto-maintenance policy under continuous ingest (q112): only
    * (band_id, kbucket) directories whose data-file count exceeds
    * `maxFiles` are rewritten (one file each afterwards), everything
    * else stays byte-identical, so write amplification tracks where
    * arrivals actually landed instead of the index size. Rows are
    * unchanged, so serve/admit results are unaffected by
    * construction. Returns the number of partitions rewritten. */
  def compactInPlaceIfFragmented(s: SparkSession, indexDir: String,
      maxFiles: Int): Int =
    IndexMaintenance.compactIfFragmented(s,
      s"${IvfTopK.qualify(s, indexDir)}/bands",
      Seq("band_id", "kbucket"), maxFiles)

  /** Snapshot-PRESERVING compaction for a manifest-committed index
    * ([[Snapshots.compactCommit]] over the bands dir): fragmented
    * (band_id, kbucket) partitions of the CURRENT version merge into
    * new sibling files and the merged layout commits as the next
    * version, while every older version keeps serving its own file
    * set — time travel and compaction coexist (q113). Tombstoned
    * indexes compact through [[purgeCommit]] (which also merges
    * fragmented partitions) — the generic pass cannot carry the
    * tombstone list. Returns (newVersion, partitionsRewritten). */
  def compactCommitSnapshot(s: SparkSession, indexDir: String,
      maxFiles: Int = 1): (Int, Int) = {
    val bands = s"${IvfTopK.qualify(s, indexDir)}/bands"
    for (v <- Snapshots.current(s, bands))
      require(manifestPieces(s, bands, v)._2.isEmpty,
        "compactCommitSnapshot: tombstones present — use purgeCommit " +
          "(it merges fragmented partitions AND purges tombstoned rows)")
    Snapshots.compactCommit(s, bands, Seq("band_id", "kbucket"), maxFiles)
  }

  /** Version `v`'s manifested files split into (band files, tombstone
    * files) — the tombstone list lives under `bands/deletes/` INSIDE
    * the manifested tree, so one version number pins the index rows
    * and the deletes that apply to them consistently. */
  private def manifestPieces(s: SparkSession, bands: String,
      v: Int): (Seq[String], Seq[String]) =
    Snapshots.files(s, bands, v)
      .partition(f => !f.startsWith(s"$bands/deletes/"))

  /** Version `v`'s effective bands RELATION: the manifested band files
    * (basePath keeps (band_id, kbucket) pruning) with that version's
    * tombstones anti-joined out (broadcast — tombstones are
    * delete-sized, never corpus-sized). */
  private def versionRelation(s: SparkSession, bands: String,
      v: Int): DataFrame = {
    val (bandF, tombF) = manifestPieces(s, bands, v)
    val rel =
      if (bandF.isEmpty)
        throw new IllegalStateException(
          s"snapshot v$v under $bands references no band files")
      else ManifestIO.read(s, bands, bandF)
    if (tombF.isEmpty) rel
    else rel.join(broadcast(s.read.parquet(tombF: _*)),
      Seq("doc_id"), "left_anti")
  }

  /** Row-level DELETE under snapshot isolation — the tombstone +
    * purge-compaction shape ([[Bm25Index.deleteCommit]]'s lexical
    * form) generalized to the band index, closing the committed
    * index's erasure gap (the in-place [[delete]] is refused on a
    * committed dataset because its dynamic-partition overwrite would
    * dangle every older manifest): the doc_ids APPEND as a tombstone
    * file under the manifested tree and ONE commit pins them, so
    * readers of version v-and-later anti-join them out (broadcast)
    * while readers pinned to older versions never see them —
    * byte-identical time travel through the delete. [[purgeCommit]]
    * later rewrites exactly the partitions holding tombstoned rows and
    * drops the list. Ids already tombstoned as of the current version
    * are refused loudly (a double delete is a caller bug; silently
    * re-appending the tombstone would bloat every later anti-join).
    * Returns the committed version. */
  def deleteCommit(s: SparkSession, indexDir: String,
      deleteIds: DataFrame): Int = {
    val bands = s"${IvfTopK.qualify(s, indexDir)}/bands"
    val v = Snapshots.current(s, bands).getOrElse(
      throw new IllegalStateException(
        s"deleteCommit: no committed snapshot under $bands — the " +
          "in-place lifecycle deletes via delete()"))
    val staged = graft.Materialize.cut(
      deleteIds.select(col("doc_id")).distinct())
    val tombF = manifestPieces(s, bands, v)._2
    if (tombF.nonEmpty) {
      val clash = staged
        .join(broadcast(s.read.parquet(tombF: _*)), Seq("doc_id"), "left_semi")
        .count()
      require(clash == 0L,
        s"deleteCommit: $clash doc_id(s) are already tombstoned as of " +
          s"v$v — a repeated delete is a caller bug")
    }
    staged.coalesce(1).write.mode("append").parquet(s"$bands/deletes")
    graft.Materialize.release(staged)
    Snapshots.commitReplacing(s, bands, v, Nil)
  }

  /** COPY-ON-WRITE tombstone-purge compaction for a committed index,
    * PARTITION-LOCAL: only (band_id, kbucket) partitions that hold a
    * tombstoned row (derived from a bounded probe of the (doc_id,
    * band_id, kbucket) columns against the broadcast tombstone list)
    * or exceed `maxFiles` data files rewrite their surviving rows as
    * NEW sibling files; every other partition's files carry VERBATIM
    * into the next manifest, which also drops the tombstone list.
    * Write amplification tracks where the deleted docs' band rows sit
    * (≤ Bands × [[KBuckets]] partitions by construction — a deleted
    * doc has exactly [[Dedup.Bands]] rows, so unlike BM25's
    * term-scattered postings the purge here is naturally narrow) plus
    * where appends fragmented. Older versions keep time-traveling over
    * their own files until [[Snapshots.expire]]. Returns the committed
    * version (unchanged when there is nothing to purge or merge). */
  def purgeCommit(s: SparkSession, indexDir: String,
      maxFiles: Int = 1): Int = {
    val bands = s"${IvfTopK.qualify(s, indexDir)}/bands"
    val v = Snapshots.current(s, bands).getOrElse(
      throw new IllegalStateException(
        s"purgeCommit: no committed snapshot under $bands"))
    val (bandF, tombF) = manifestPieces(s, bands, v)
    def partOf(f: String): (Int, Int) = {
      val segs = f.split('/')
      def seg(c: String) = segs.find(_.startsWith(c + "="))
        .map(_.drop(c.length + 1).toInt)
        .getOrElse(throw new IllegalStateException(
          s"purgeCommit: no $c= segment in $f"))
      (seg("band_id"), seg("kbucket"))
    }
    val fragged: Set[(Int, Int)] = bandF.groupBy(partOf)
      .collect { case (p, fl) if fl.size > maxFiles => p }.toSet
    val tombed: Set[(Int, Int)] =
      if (tombF.isEmpty) Set.empty
      else ManifestIO.read(s, bands, bandF)
        .join(broadcast(s.read.parquet(tombF: _*)), Seq("doc_id"), "left_semi")
        .select(col("band_id"), col("kbucket")).distinct()
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val touched = fragged ++ tombed
    if (touched.isEmpty && tombF.isEmpty) return v
    if (touched.nonEmpty) {
      val files = bandF.filter(f => touched(partOf(f)))
      val cur = ManifestIO.read(s, bands, files)
      val purged =
        if (tombF.isEmpty) cur
        else cur.join(broadcast(s.read.parquet(tombF: _*)),
          Seq("doc_id"), "left_anti")
      val merged = graft.Materialize.cut(purged)
      merged.repartition(col("band_id"), col("kbucket"))
        .write.mode("append").partitionBy("band_id", "kbucket")
        .parquet(bands)
      graft.Materialize.release(merged)
    }
    Snapshots.commitReplacing(s, bands, v,
      touched.toSeq.sorted.map { case (b, k) => s"band_id=$b/kbucket=$k" }
        :+ "deletes")
  }

  /** OPTIMISTIC-CONCURRENCY append for a COMMITTED index — the q141
    * re-derive protocol ([[Bm25Index.appendCommitRetrying]]) applied
    * to the band family, where the df-free shape makes every landed
    * artifact ADDITIVE: a doc's band rows are self-contained (there is
    * no corpus-level stats sibling to re-derive), so the landing
    * happens exactly once and only the COMMIT retries. Each attempt
    * SELECTS this writer's tracked files on top of the version it
    * validated against ([[Snapshots.commitSelectingExpecting]] — a
    * concurrent writer's half-landed batch is never swept in), and a
    * lost race re-VALIDATES the one base-dependent rule — the
    * re-ingest guard — against the new current before retrying: a
    * concurrent [[deleteCommit]] may have tombstoned one of this
    * batch's ids mid-flight, and a blind retry would land physical
    * rows that resurrect on the next [[purgeCommit]]. A retry that
    * fails re-validation leaves the landed band files unreferenced —
    * [[Snapshots.expire]] reclaims them, the standard orphan sweep.
    * File tracking is WRITER-EXACT: the batch lands in a private
    * staging subdir and its files move into place
    * ([[Snapshots.landStaged]]), so a concurrent writer's part files
    * landing mid-write are never claimed — and
    * [[Snapshots.commitSelectingExpecting]] additionally refuses a
    * claim that re-selects an already-selected file, converting any
    * residual mis-claim into a loud conflict instead of duplicated
    * band rows. `expected` is the base version the caller read (None =
    * read current at entry). Returns (committedVersion,
    * conflictsObserved). */
  def appendCommitRetrying(s: SparkSession, indexDir: String,
      newDocs: DataFrame, expected: Option[Int] = None,
      maxRetries: Int = 5): (Int, Int) = {
    val bands = s"${IvfTopK.qualify(s, indexDir)}/bands"
    var v = expected.orElse(Snapshots.current(s, bands)).getOrElse(
      throw new IllegalStateException(
        s"appendCommitRetrying: no committed snapshot under $bands"))
    val staged = graft.Materialize.cut(newDocs)
    val ids = staged.select(col("doc_id")).distinct()
    def checkTombstones(w: Int): Unit = {
      val tombF = manifestPieces(s, bands, w)._2
      if (tombF.nonEmpty) {
        val clash = ids.join(broadcast(s.read.parquet(tombF: _*)),
          Seq("doc_id"), "left_semi").count()
        require(clash == 0L,
          s"appendCommitRetrying: $clash doc_id(s) are tombstoned as " +
            s"of v$w — a purgeCommit must land first (landed band rows " +
            "are unreferenced; expire() reclaims them)")
      }
    }
    // `staged` must stay materialized through the retry loop — every
    // re-validation's `ids` derives from it (releasing it after the
    // landing would make a retry recompute a truncated-lineage
    // checkpoint)
    try {
      checkTombstones(v)
      // the additive landing, exactly once — order-independent between
      // concurrent writers (parquet append never mutates existing
      // files), claimed writer-exactly via the private staging move
      val mine = landBands(s, bands, staged)
      var conflicts = 0
      while (true) {
        try return (Snapshots.commitSelectingExpecting(s, bands, v,
          _ => false, mine), conflicts)
        catch { case e: Snapshots.SnapshotConflictException =>
          conflicts += 1
          if (conflicts > maxRetries)
            throw new Snapshots.SnapshotConflictException(
              s"appendCommitRetrying: still conflicting after " +
                s"$maxRetries retries under $bands — last: ${e.getMessage}")
          v = Snapshots.current(s, bands).getOrElse(
            throw new IllegalStateException(
              s"appendCommitRetrying: snapshots vanished under $bands"))
          checkTombstones(v)
        }
      }
      throw new IllegalStateException("unreachable")
    } finally graft.Materialize.release(staged)
  }

  /** File-level copy of a saved index (bands + meta). Mutation-testing
    * convenience: a re-runnable query that APPENDS (the ingest-loop
    * forms q103/q103b) clones the resident index per invocation so
    * the shared saved artifact is never mutated — a production
    * pipeline appends in place and doesn't need this. */
  def copyTo(s: SparkSession, srcDir: String, destDir: String): Unit =
    IndexMaintenance.copyDir(s, IvfTopK.qualify(s, srcDir),
      IvfTopK.qualify(s, destDir))

  /** Reconstruct a handle from saved artifacts — one meta row read on
    * the driver, the index stays on disk for the probe scan. */
  def load(s: SparkSession, indexDir: String): Handle = {
    val base = IvfTopK.qualify(s, indexDir)
    val docsPath = s.read.parquet(s"$base/meta").head().getString(0)
    Handle(docsPath, s"$base/bands")
  }

  /** Near-dup pairs of `probeDocs` ((doc_id, text)) against the SAVED
    * index: (probe_doc, corpus_doc, est_jaccard) at est ≥ the q31
    * threshold, unordered. The probe is sketched with the exact
    * resident kernel, its (band_id, kbucket) set is collected (≤
    * Bands × [[KBuckets]] values) into a static partition predicate —
    * file-level pruning — and the batch rides a broadcast hash join
    * against the pruned scan. doc_id disjointness between batch and
    * corpus is the caller's contract (an admitted batch has fresh
    * ids); a probe doc already in the index would match itself at
    * est = 1. */
  def serve(s: SparkSession, h: Handle, probeDocs: DataFrame): DataFrame =
    serveFrom(s, h, localizeProbe(s, probeDocs))

  /** Sketch the probe batch ONCE (one distributed job) and land the
    * band rows as a driver-local relation. The batch is ≪ corpus by
    * contract and rides a `broadcast()` join either way — broadcast
    * collects to the driver regardless — so localizing adds no driver
    * cost, lets the touched-bucket set be computed without a second
    * job, and leaves NOTHING cached: the previous `Materialize.cut`
    * here leaked one localCheckpoint per serve/admit call in any
    * long-lived session (the bench's between-sweep blanket unpersist
    * was hiding it). */
  private def localizeProbe(s: SparkSession, probeDocs: DataFrame): DataFrame = {
    val bandRows = Dedup.indexBandRows(probeDocs)
    val rows = bandRows.collect()
    s.createDataFrame(java.util.Arrays.asList(rows: _*), bandRows.schema)
  }

  /** Public sketch-and-localize for callers that reuse ONE probe
    * sketch across several lifecycle steps (the q103 ingest loop
    * slices one localized sketch into its arrival batches instead of
    * re-scanning the corpus per batch). */
  def localize(s: SparkSession, probeDocs: DataFrame): DataFrame =
    localizeProbe(s, probeDocs)

  /** [[append]] from ALREADY-SKETCHED band rows (doc_id, sig, bk0,
    * band_id, band_key) — no re-sketch, no corpus scan; a local
    * probe-batch relation writes one file per touched partition.
    * Returns the appended document count. */
  def appendRows(s: SparkSession, indexDir: String,
      bandRows: DataFrame): Long = {
    val base = IvfTopK.qualify(s, indexDir)
    requireNotTombstoned(s, s"$base/bands",
      bandRows.select(col("doc_id")).distinct(), "appendRows")
    withBucket(bandRows)
      .repartition(col("band_id"), col("kbucket"))
      .write.mode("append").partitionBy("band_id", "kbucket")
      .parquet(s"$base/bands")
    bandRows.select(col("doc_id")).distinct().count()
  }

  /** est-Jaccard over two melted sig columns — the shared verification
    * expression of the serve and admission joins. */
  private def estOf(sigA: Column, sigB: Column): Column = {
    val k = Dedup.K
    (0 until k).map(i =>
      when(element_at(sigA, i + 1) === element_at(sigB, i + 1), 1)
        .otherwise(0))
      .reduce(_ + _).cast("double") / lit(k.toDouble)
  }

  /** [[serve]] AS OF a committed snapshot version
    * ([[Snapshots.commit]] over the bands dir): the index relation is
    * exactly the manifested file set, read with `basePath` so the
    * (band_id, kbucket) partition pruning survives the explicit
    * listing — a reader pinned to version N sees byte-identical
    * results no matter how many appends commit after it. */
  def serveAsOf(s: SparkSession, indexDir: String, version: Int,
      probeDocs: DataFrame): DataFrame =
    serveRowsAsOf(s, indexDir, version, localizeProbe(s, probeDocs))

  /** [[serveAsOf]] over ALREADY-SKETCHED probe band rows (one probe
    * sketch shared across several as-of reads — the q109 form). The
    * relation is the version's manifested band files with ITS
    * tombstones anti-joined ([[versionRelation]]) — a version
    * committed before a [[deleteCommit]] still sees the deleted docs,
    * one committed after does not. */
  def serveRowsAsOf(s: SparkSession, indexDir: String, version: Int,
      probeRows: DataFrame): DataFrame = {
    val base = IvfTopK.qualify(s, indexDir)
    serveOn(versionRelation(s, s"$base/bands", version), probeRows)
  }

  /** [[serve]] over ALREADY-SKETCHED probe band rows (callers that
    * reuse one probe sketch across several legs — q110 feeds the same
    * sketch to the corpus serve and the within-batch pair join). */
  def serveRows(s: SparkSession, h: Handle, probeRows: DataFrame): DataFrame =
    serveFrom(s, h, probeRows)

  /** [[serve]] body over pre-materialized probe band rows, so the
    * admission verdict can reuse one probe sketch for both its legs. */
  private def serveFrom(s: SparkSession, h: Handle,
      probeRows: DataFrame): DataFrame =
    serveOn(bandsRelation(s, h.bandsPath), probeRows)

  /** The LIVE bands relation of an index dir. For an uncommitted index
    * this is a plain directory read; for a MANIFEST-COMMITTED index
    * ([[Snapshots]]) it is the CURRENT version's exact file set — a
    * direct directory read would silently DOUBLE-COUNT rows after a
    * copy-on-write compaction ([[compactCommitSnapshot]]), because the
    * merged files land as siblings of the files older versions still
    * reference and both stay on disk until [[Snapshots.expire]]. One
    * manifest-dir existence check on the happy path. */
  private def bandsRelation(s: SparkSession, bandsPath: String): DataFrame =
    Snapshots.current(s, bandsPath) match {
      case Some(v) => versionRelation(s, bandsPath, v)
      case None => ManifestIO.readDir(s, bandsPath)
    }

  /** The serve join against an arbitrary bands RELATION (live dir or
    * a snapshot file set) — bucket-set pruning, broadcast probe,
    * first-collision-band gate. */
  private def serveOn(idxRel: DataFrame, probeRows: DataFrame): DataFrame = {
    val probe = probeRows.select(
      col("doc_id").as("probe_doc"), col("sig").as("sig_a"),
      col("bk0").as("probe_bk0"), col("band_id"), col("band_key"))
    // bounded driver read: the distinct (band_id, kbucket) pairs the
    // batch can touch — at most Bands × KBuckets rows by construction
    val touched = probe
      .select(col("band_id"), kbucket(col("band_key")).as("kbucket"))
      .distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val pruned = touched
      .map { case (b, kb) => col("band_id") === b && col("kbucket") === kb }
      .reduceOption(_ || _).getOrElse(lit(false))
    val idx = idxRel.where(pruned)
      .select(col("doc_id").as("corpus_doc"), col("sig").as("sig_b"),
        col("bk0").as("corpus_bk0"), col("band_id"), col("band_key"))
    idx.join(broadcast(probe), Seq("band_id", "band_key"))
      // first-collision-band gate: a pair colliding on both bands is
      // counted only at band 0 — the filter twin of the oracle's
      // DISTINCT, with no extra shuffle
      .where(col("band_id") === 0 || col("probe_bk0") =!= col("corpus_bk0"))
      .withColumn("est_jaccard", estOf(col("sig_a"), col("sig_b")))
      .where(col("est_jaccard") >= Dedup.EstThreshold)
      .select(col("probe_doc"), col("corpus_doc"), col("est_jaccard"))
  }

  /** The full ADMISSION VERDICT for an incoming batch — what an
    * ingestion pipeline actually decides per arriving document: near-
    * dup of the resident corpus (the [[serve]] leg) OR of a LOWER-id
    * batch-mate (the id-minimal representative of a new dup cluster is
    * admitted, its copies are not — q30/q76's canonical-id rule).
    * Returns (doc_id, n_corpus_hits, n_batch_hits, admitted). One
    * probe sketch feeds both legs; the within-batch leg is the q31
    * band self-join at batch size — batch ≪ corpus by contract, so it
    * needs no skew guard (a hot band key costs at most batch² pairs,
    * and only (ids, sig) rows ride the join). */
  def admit(s: SparkSession, h: Handle, probeDocs: DataFrame): DataFrame =
    admitRows(s, h, localizeProbe(s, probeDocs))

  /** [[admit]] over ALREADY-SKETCHED probe band rows. The verdict's
    * per-doc spine comes from the sketch itself (every doc carries
    * exactly Bands rows, so `distinct doc_id` over the local relation
    * is the batch's id set) — no second scan of the probe documents. */
  def admitRows(s: SparkSession, h: Handle, probe: DataFrame): DataFrame = {
    val corpusHits = serveFrom(s, h, probe)
      .groupBy(col("probe_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_corpus_hits"))
    def side(p: String) = probe.select(
      col("doc_id").as(s"doc_$p"), col("sig").as(s"sig_$p"),
      col("bk0").as(s"bk0_$p"), col("band_id"), col("band_key"))
    val batchHits = side("a").join(side("b"), Seq("band_id", "band_key"))
      .where(col("doc_a") < col("doc_b"))
      .where(col("band_id") === 0 || col("bk0_a") =!= col("bk0_b"))
      .where(estOf(col("sig_a"), col("sig_b")) >= Dedup.EstThreshold)
      .groupBy(col("doc_b").as("doc_id"))
      .agg(count(lit(1)).as("n_batch_hits"))
    probe.select(col("doc_id")).distinct()
      .join(corpusHits, Seq("doc_id"), "left")
      .join(batchHits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_corpus_hits"), lit(0L)).as("n_corpus_hits"),
        coalesce(col("n_batch_hits"), lit(0L)).as("n_batch_hits"),
        (col("n_corpus_hits").isNull && col("n_batch_hits").isNull)
          .as("admitted"))
  }
}
