package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PER-FILE COLUMN BOUNDS for driver-side scan planning — the second
  * half of what a lakehouse manifest carries (Iceberg's per-file
  * column stats; Delta's add-file minValues/maxValues), layered onto
  * the [[Snapshots]] manifest the same way the delta manifests were:
  * as append-only segments folded into planning, never a rewrite.
  *
  * WHY, at 100 TB: partition pruning covers the partition key and the
  * Z-order layout covers its two clustered dimensions, but a range
  * predicate on any OTHER column still plans a scan over every file
  * of the version. Parquet row-group statistics eventually skip the
  * bytes — but only after the scan has OPENED every footer, which at
  * 10⁶ files is 10⁶ metadata round-trips before the first row task
  * launches (on an object store, minutes of pure latency). File-level
  * bounds held OUTSIDE the data files let the driver drop
  * non-intersecting files from the scan plan for free, exactly like
  * a manifest resolution: pruning cost is one tiny stats read, not
  * O(files) footer fetches.
  *
  * MECHANICS:
  *  - Stats live under `dataDir/_filestats/` (the `_` prefix keeps
  *    them out of data listings and manifests, same as `_manifests`).
  *  - [[recordFor]] appends ONE segment covering exactly the files of
  *    version v that no earlier segment covers — O(new files) scan
  *    work per commit, the same incremental discipline as the delta
  *    manifests. Values canonicalize to three typed lanes (integral →
  *    long, covering int/long/date/timestamp; fractional → double;
  *    string → 16-char TRUNCATED bounds, Iceberg-style — see [[lane]])
  *    so one narrow schema serves every column.
  *  - [[prunedFiles]] keeps a file when its recorded range intersects
  *    [lo, hi], when it has NO stats row (conservative: unknown =
  *    keep), and drops it when its bounds miss or the column is
  *    all-null in that file (a range predicate cannot match null).
  *    Pruning is therefore SAFE by construction — the exact predicate
  *    still runs on what remains; stats only shrink the file list.
  *
  * Boundaries, stated: files under snapshot isolation are immutable
  * (every lifecycle here is copy-on-write and part names carry write
  * UUIDs), so a stats row can never describe stale content; rows for
  * expired files are dead weight until the segment fold and are
  * ignored by the version intersection. DecimalType is refused loudly
  * rather than rounded through double (a rounded bound could wrongly
  * exclude a file). Single writer per dataset, like [[Snapshots]].
  */
object FileStats {

  private def statsDir(dataDir: String) = s"$dataDir/_filestats"

  /** String bounds are TRUNCATED to this many chars (Iceberg's
    * write.metadata.metrics truncate(16) default): full values would
    * put whole documents into the stats relation; a 16-char prefix
    * bound prunes just as well on the id/url/lang columns pruning is
    * for. */
  val StrTrunc = 16

  /** Canonical lane of a column: its kind tag plus the per-file
    * (lower, upper) BOUND aggregates. Integral family → exact long
    * bounds; fractional → exact double bounds (monotonic casts only —
    * bounds computed on the canonical value equal canonicalized raw
    * bounds). Strings → truncated bounds, Iceberg-style: the LOWER
    * bound is min over the 16-char truncations (a prefix never sorts
    * above what it prefixes, so it lower-bounds every value); the
    * UPPER bound is max over per-row upper bounds — the row itself
    * when it fits 16 chars, else its truncation with the last char
    * incremented, which sorts strictly above every string sharing the
    * prefix. A long row whose 16th char is outside plain ASCII cannot
    * be incremented portably (SQL chr() wraps at 256), so such a file
    * records a NULL = UNKNOWN upper bound and pruning keeps it —
    * conservative, never wrong. */
  private def lane(dt: DataType, c: String)
      : (String, Column, Column) = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      val e = col(c).cast(LongType); ("i", min(e), max(e))
    case DateType =>
      val e = datediff(col(c), to_date(lit("1970-01-01"))).cast(LongType)
      ("i", min(e), max(e))
    case TimestampType =>
      val e = unix_micros(col(c)); ("i", min(e), max(e))
    case FloatType | DoubleType =>
      val e = col(c).cast(DoubleType); ("f", min(e), max(e))
    case StringType =>
      val t = col(c)
      val needsInc = length(t) > StrTrunc
      val lastC = ascii(substring(t, StrTrunc, 1))
      val incOk = lastC.between(1, 126)
      val ub = when(!needsInc, t).otherwise(concat(
        substring(t, 1, StrTrunc - 1), call_function("chr", lastC + lit(1))))
      // one non-incrementable long row poisons the file's upper bound
      // to NULL/unknown (max() would silently IGNORE a null ub and
      // report a bound that misses that row — wrong exclusions)
      val poisoned = max(when(needsInc && !incOk, lit(1)).otherwise(lit(0)))
      val maxAgg = when(poisoned === 1, lit(null).cast(StringType))
        .otherwise(max(ub))
      ("s", min(substring(t, 1, StrTrunc)), maxAgg)
    case other => throw new IllegalArgumentException(
      s"FileStats: column '$c' has unsupported type $other — integral, " +
        "date, timestamp, float, double and string columns carry " +
        "canonical bounds; decimals would round through double and a " +
        "rounded bound can wrongly exclude a file")
  }

  /** dataDir-relative path of a scanned file, as an expression over
    * `input_file_name()` (which reports scheme-qualified URIs — the
    * anchor is the dir's scheme-free URI PATH, so file:/ vs file:///
    * spelling differences don't break the match). */
  private def relExpr(dataDir: String): Column = {
    val dirPath = new Path(dataDir).toUri.getPath
    regexp_extract(input_file_name(),
      java.util.regex.Pattern.quote(dirPath) + "/(.*)$", 1)
  }

  private def rel(dataDir: String, file: String): String = {
    val dn = new Path(dataDir).toUri.getPath
    val fn = new Path(file).toUri.getPath
    require(fn.startsWith(dn + "/"), s"$file is not under $dataDir")
    fn.drop(dn.length + 1)
  }

  /** The set of relative paths any existing stats segment covers. */
  private def covered(s: SparkSession, dataDir: String): Set[String] = {
    val conf = s.sparkContext.hadoopConfiguration
    val segs = graft.Fs.listDataFiles(statsDir(dataDir), conf)
      .map(_.getPath.toString)
    if (segs.isEmpty) Set.empty
    else s.read.parquet(segs: _*).select(col("file")).distinct()
      .collect().map(_.getString(0)).toSet
  }

  /** Record bounds of `cols` for every file of version `v` that no
    * earlier segment covers — one columnar scan of exactly the NEW
    * files (never the resident table), landed as one appended segment.
    * Call after each [[Snapshots]] commit; a fresh dataset's first
    * call scans everything once. Returns the number of files newly
    * covered. */
  def recordFor(s: SparkSession, dataDir: String, v: Int,
      cols: Seq[String], skip: String => Boolean = _ => false): Int = {
    require(cols.nonEmpty, "FileStats.recordFor: no columns given")
    val done = covered(s, dataDir)
    // `skip` (over dataDir-relative paths) exempts manifested
    // NON-DATA files from the bounds scan — a SnapshotTable version
    // pins its tombstone list inside the manifested tree, and reading
    // it alongside the data files would fail on the missing columns;
    // skipped files stay uncovered, which pruning already treats
    // conservatively (unknown = keep)
    val fresh = Snapshots.files(s, dataDir, v)
      .filterNot(f => { val r = rel(dataDir, f); done(r) || skip(r) })
    if (fresh.isEmpty) return 0
    val df = ManifestIO.read(s, dataDir, fresh)
    val lanes = cols.map(c => c -> lane(df.schema(c).dataType, c))
    // one grouped aggregate keyed by the producing file: 2 bounds per
    // column per file ride the shuffle, never rows
    val aggs = lanes.flatMap { case (c, (_, mi, ma)) =>
      Seq(mi.as(s"__min_$c"), ma.as(s"__max_$c")) }
    val wide = df.groupBy(relExpr(dataDir).as("file"))
      .agg(aggs.head, aggs.tail: _*)
    // melt to the narrow stats schema: one row per (file, col), typed
    // lane filled, the other lanes null
    val narrow = lanes.map { case (c, (k, _, _)) =>
      val (mi, ma) = (col(s"__min_$c"), col(s"__max_$c"))
      wide.select(col("file"), lit(c).as("col"), lit(k).as("kind"),
        (if (k == "i") mi else lit(null).cast(LongType)).as("min_i"),
        (if (k == "i") ma else lit(null).cast(LongType)).as("max_i"),
        (if (k == "f") mi else lit(null).cast(DoubleType)).as("min_f"),
        (if (k == "f") ma else lit(null).cast(DoubleType)).as("max_f"),
        (if (k == "s") mi else lit(null).cast(StringType)).as("min_s"),
        (if (k == "s") ma else lit(null).cast(StringType)).as("max_s"))
    }.reduce(_ unionByName _)
    // O(batch·cols) rows — the coalesce(1) funnels a tiny relation,
    // same as the manifest/tombstone writers
    narrow.coalesce(1).write.mode("append").parquet(statsDir(dataDir))
    fresh.size
  }

  private def segments(s: SparkSession, dataDir: String): Seq[String] =
    graft.Fs.listDataFiles(statsDir(dataDir),
      s.sparkContext.hadoopConfiguration).map(_.getPath.toString)

  /** Version `v`'s files (absolute, sorted) with every file whose
    * recorded `column` bounds cannot intersect [lo, hi] dropped:
    * unknown files stay (conservative), all-null files drop (a range
    * predicate never matches null). `lo`/`hi` are in the column's
    * canonical lane — raw value for integral columns, epoch DAYS for
    * dates, epoch MICROS for timestamps. */
  def prunedFiles(s: SparkSession, dataDir: String, v: Int,
      column: String, lo: Long, hi: Long): Seq[String] =
    pruneList(s, dataDir, Snapshots.files(s, dataDir, v), column, lo, hi)

  /** Fractional-lane twin of [[prunedFiles]]. */
  def prunedFilesDouble(s: SparkSession, dataDir: String, v: Int,
      column: String, lo: Double, hi: Double): Seq[String] =
    pruneList2(s, dataDir, Snapshots.files(s, dataDir, v), column, "f",
      r => !(r.isNullAt(0) || r.getDouble(1) < lo || r.getDouble(0) > hi))

  /** Prune an EXPLICIT absolute file list by the recorded long-lane
    * bounds — the hook for serve paths that must prune only a SUBSET
    * of a version's files ([[SnapshotTable.readAsOfPruned]] prunes the
    * data files, never the pinned tombstone list). Same semantics as
    * [[prunedFiles]]: unknown files stay, all-null files drop. */
  def pruneList(s: SparkSession, dataDir: String, files: Seq[String],
      column: String, lo: Long, hi: Long): Seq[String] =
    pruneList2(s, dataDir, files, column, "i",
      r => !(r.isNullAt(0) || r.getLong(1) < lo || r.getLong(0) > hi))

  /** Fractional-lane twin of [[pruneList]]. */
  def pruneListDouble(s: SparkSession, dataDir: String,
      files: Seq[String], column: String, lo: Double, hi: Double)
      : Seq[String] =
    pruneList2(s, dataDir, files, column, "f",
      r => !(r.isNullAt(0) || r.getDouble(1) < lo || r.getDouble(0) > hi))

  /** CODE-POINT order comparison — the same total order Spark's
    * UTF8String min/max used to COMPUTE the recorded bounds (UTF-8
    * byte order ≡ code-point order), and the order the exact
    * predicate's string comparison applies. Java's `String` compares
    * by UTF-16 code UNIT, which disagrees for supplementary-plane
    * chars (surrogate units 0xD800-0xDFFF) vs U+E000..U+FFFF — and a
    * bound compared in a different order than it was computed in can
    * wrongly PRUNE a file containing matching rows. */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** String-lane pruning over an explicit file list: bounds are the
    * TRUNCATED prefixes [[lane]] recorded, so the comparison is still
    * exact — `min_s > hi` can only hold when every value in the file
    * sorts above `hi`, and a NULL `max_s` (unknown upper) keeps the
    * file. `lo`/`hi` are raw predicate strings, untruncated; bounds
    * compare in code-point order ([[cpCompare]]), the order they were
    * computed in. */
  def pruneListString(s: SparkSession, dataDir: String,
      files: Seq[String], column: String, lo: String, hi: String)
      : Seq[String] =
    pruneList2(s, dataDir, files, column, "s", { r =>
      val minN = r.isNullAt(0); val maxN = r.isNullAt(1)
      if (minN && maxN) false // all-null column: a range never matches
      else (minN || cpCompare(r.getString(0), hi) <= 0) &&
        (maxN || cpCompare(r.getString(1), lo) >= 0)
    })

  private def pruneList2(s: SparkSession, dataDir: String,
      files: Seq[String], column: String, kind: String,
      keep: org.apache.spark.sql.Row => Boolean): Seq[String] = {
    val segs = segments(s, dataDir)
    if (segs.isEmpty) return files
    // the stats relation is O(files·cols) TINY rows — the collect is
    // the same driver-side footprint as the manifest listing itself,
    // filtered to the one probed column before it moves
    val known = s.read.parquet(segs: _*)
      .where(col("col") === column && col("kind") === kind)
      .select(col("min_" + kind), col("max_" + kind), col("file"))
      .collect()
      .map(r => r.getString(2) -> keep(r)).toMap
    files.filter(f => known.getOrElse(rel(dataDir, f), true))
  }

  /** FOLD the stats segments: rewrite every accumulated segment as
    * ONE netted segment holding only rows for files some LIVE version
    * still references, then drop the old segments — the same
    * fold-at-retention discipline as the delta manifests and the BM25
    * df-delta segments, run after [[Snapshots.expire]] so rows for
    * vacuumed files don't accumulate forever. Crash-safe by ordering:
    * the netted segment lands first (duplicate rows are harmless —
    * stats of an immutable file are deterministic, so every consumer
    * map-dedups to identical values), old segments are deleted after.
    * Returns the number of dead rows dropped. */
  def compactStats(s: SparkSession, dataDir: String): Long = {
    val conf = s.sparkContext.hadoopConfiguration
    val old = segments(s, dataDir)
    if (old.isEmpty) return 0L
    val live: Set[String] = Snapshots.versions(s, dataDir)
      .flatMap(v => Snapshots.files(s, dataDir, v))
      .map(rel(dataDir, _)).toSet
    val all = s.read.parquet(old: _*)
    val total = all.count()
    // live-file filter as a JOIN, not an In-literal: at 10⁶ files the
    // literal list would sink codegen; the relation form broadcasts
    import s.implicits._
    val liveRel = live.toSeq.toDF("file")
    val kept = all.join(
        org.apache.spark.sql.functions.broadcast(liveRel), Seq("file"),
        "left_semi")
      .dropDuplicates("file", "col")
    val nKept = kept.count()
    if (nKept == total && old.size <= 1) return 0L
    kept.coalesce(1).write.mode("append").parquet(statsDir(dataDir))
    val (f, _) = graft.Fs.resolve(dataDir, conf)
    for (p <- old) f.delete(new Path(p), false)
    total - nKept
  }

  /** [[Snapshots.read]] with the scan plan pre-pruned by the recorded
    * bounds: reads exactly version `v`'s intersecting files (basePath
    * keeps partition columns). The caller still applies the exact
    * predicate — stats only shrink the file list, never the rows. An
    * all-files-pruned version yields an empty frame with the live
    * schema. */
  def readPruned(s: SparkSession, dataDir: String, v: Int,
      column: String, lo: Long, hi: Long): DataFrame = {
    val fl = prunedFiles(s, dataDir, v, column, lo, hi)
    if (fl.isEmpty) {
      val any = Snapshots.files(s, dataDir, v)
      require(any.nonEmpty,
        s"readPruned: snapshot v$v under $dataDir has no files")
      ManifestIO.read(s, dataDir, Seq(any.head)).limit(0)
    } else ManifestIO.read(s, dataDir, fl)
  }
}
