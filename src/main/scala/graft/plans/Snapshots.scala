package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SNAPSHOT ISOLATION for the persisted-index family, lakehouse-style:
  * a version is an immutable MANIFEST (text file listing the data
  * files that constitute it), committed by atomic rename. Writers add
  * data files (parquet `append` never mutates existing files) and then
  * [[commit]] the new listing; readers resolve a version's manifest to
  * its exact file set and read THOSE files — so a reader holding
  * version N is unaffected by any later append, and a crashed writer
  * leaves only unreferenced files (invisible to every reader,
  * reclaimed by [[expire]]). This is the general answer to the
  * in-place caveats documented on the index maintenance passes: the
  * pointer flip is the manifest rename, and "as-of" reads fall out for
  * free (Iceberg/Delta's core idea, reduced to what a file-listing
  * manifest can carry — single writer, no schema evolution, no
  * row-level deletes).
  *
  * Contract boundaries, stated rather than hidden:
  *  - SINGLE WRITER: commits are not coordinated; two concurrent
  *    commits can both succeed with the later one's version number
  *    colliding (rename-over fails on HDFS, silently overwrites on
  *    some local FS). An ingest pipeline serializes its maintenance.
  *  - Rewriting passes (compactPartitioned / deletePartitioned)
  *    REPLACE files in place, so manifests older than the rewrite
  *    dangle — run [[expire]] up to the rewrite's commit first. The
  *    append lifecycle (the hot path) never rewrites.
  *
  * Versions are defined by the manifest files themselves
  * (`_manifests/v{N}.manifest`); there is no mutable CURRENT pointer
  * to corrupt — [[current]] is max N. Manifest writes go through a
  * temp file + rename (atomic per path on HDFS and local FS), so a
  * version either exists completely or not at all.
  */
object Snapshots {

  private def manifestDir(dataDir: String) = s"$dataDir/_manifests"

  private val ManifestName = """v(\d+)\.manifest""".r

  private def fs(s: SparkSession, dataDir: String) =
    graft.Fs.resolve(dataDir, s.sparkContext.hadoopConfiguration)._1

  /** List a dataset's versions (ascending). */
  def versions(s: SparkSession, dataDir: String): Seq[Int] = {
    val f = fs(s, dataDir)
    val dir = new Path(manifestDir(dataDir))
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.flatMap(_.getPath.getName match {
      case ManifestName(n) => Some(n.toInt)
      case _ => None
    }).sorted
  }

  /** The newest committed version, if any. */
  def current(s: SparkSession, dataDir: String): Option[Int] =
    versions(s, dataDir).lastOption

  /** Snapshot the CURRENT file listing of `dataDir` as the next
    * version and return its number. Call after every completed batch
    * of data-file additions (save, append). The listing excludes the
    * manifest dir itself and any `_`/`.`-prefixed bookkeeping files
    * (Spark's own convention for non-data files). */
  def commit(s: SparkSession, dataDir: String): Int = {
    val f = fs(s, dataDir)
    val conf = s.sparkContext.hadoopConfiguration
    val dataFiles = graft.Fs.listDataFiles(dataDir, conf)
      .map(_.getPath.toString)
      .filterNot(_.contains("/_manifests/"))
      .map(rel(dataDir, _))
      .sorted
    val v = current(s, dataDir).getOrElse(0) + 1
    val dir = new Path(manifestDir(dataDir))
    if (!f.exists(dir)) f.mkdirs(dir)
    val tmp = new Path(dir, s"v$v.manifest.tmp")
    val out = f.create(tmp, true)
    try out.write(dataFiles.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val fin = new Path(dir, s"v$v.manifest")
    require(f.rename(tmp, fin), s"snapshot commit: rename $tmp -> $fin failed")
    v
  }

  /** The data files of version `v` (absolute paths). */
  def files(s: SparkSession, dataDir: String, v: Int): Seq[String] = {
    val f = fs(s, dataDir)
    val p = new Path(manifestDir(dataDir), s"v$v.manifest")
    require(f.exists(p), s"snapshot v$v not found under ${manifestDir(dataDir)}")
    val in = f.open(p)
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 65536, false)
      buf.toString("UTF-8")
    } finally in.close()
    text.linesIterator.filter(_.nonEmpty).map(l => s"$dataDir/$l").toSeq
  }

  /** Read version `v` AS OF its commit: exactly the manifested files,
    * with `basePath` set so Hive-partition columns (and therefore
    * partition PRUNING) survive the explicit file listing — a
    * partition-column predicate on this frame still prunes at the
    * file level, same as a directory read. An empty version yields an
    * empty frame with the schema read from any live file set — the
    * caller supplies `emptySchema` for the zero-file case. */
  def read(s: SparkSession, dataDir: String, v: Int,
      emptySchema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val fl = files(s, dataDir, v)
    if (fl.isEmpty) {
      val sch = emptySchema.getOrElse(throw new IllegalArgumentException(
        s"snapshot v$v is empty and no emptySchema was supplied"))
      s.createDataFrame(java.util.Collections.emptyList[
        org.apache.spark.sql.Row](), sch)
    } else s.read.option("basePath", dataDir).parquet(fl: _*)
  }

  /** Retention: drop every manifest OLDER than `keepFrom`, then delete
    * any data file referenced by NO surviving manifest — which also
    * reclaims orphans from crashed writers (files that never made it
    * into a manifest). Returns the number of data files deleted. */
  def expire(s: SparkSession, dataDir: String, keepFrom: Int): Int = {
    val f = fs(s, dataDir)
    val conf = s.sparkContext.hadoopConfiguration
    for (v <- versions(s, dataDir) if v < keepFrom)
      f.delete(new Path(manifestDir(dataDir), s"v$v.manifest"), false)
    val live: Set[String] = versions(s, dataDir)
      .flatMap(v => files(s, dataDir, v)).toSet
    val all = graft.Fs.listDataFiles(dataDir, conf)
      .map(_.getPath.toString)
      .filterNot(_.contains("/_manifests/"))
    var n = 0
    for (p <- all if !live.contains(s"$dataDir/${rel(dataDir, p)}")) {
      f.delete(new Path(p), false)
      n += 1
    }
    n
  }

  /** Path of `file` relative to `dataDir`, tolerant of scheme
    * differences (file:/ vs bare paths) between the listing and the
    * configured dir. */
  private def rel(dataDir: String, file: String): String = {
    val dn = new Path(dataDir).toUri.getPath
    val fn = new Path(file).toUri.getPath
    require(fn.startsWith(dn + "/"),
      s"data file $file is not under $dataDir")
    fn.drop(dn.length + 1)
  }
}
