// Bridge into Spark's file-source internals: InMemoryFileIndex,
// FileStatusCache and HadoopFsRelation are private[sql] /
// datasources-internal surface in Spark 4, so this one object lives in
// the org.apache.spark.sql.execution.datasources package (the same
// convention as GraftSqlBridge). No Spark internals are modified — it
// re-assembles exactly the relation spark.read.parquet(paths) builds,
// with one substitution: the file STATUSES are supplied by the caller
// (the snapshot layer's manifests already know every referenced file),
// so planning launches no listing pass at all — no "Listing leaf files
// and directories for N paths" Spark job, no per-file driver stats.
// Everything downstream (partition inference from the basePath option,
// schema inference, partition pruning, the vectorized reader) is the
// same code path a listing-based read takes.
package org.apache.spark.sql.execution.datasources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.classic.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

object GraftManifestReadBridge {

  /** A FileStatusCache pre-populated with the caller's statuses: every
    * root path (each one a data FILE under the manifested table) hits
    * the cache, so InMemoryFileIndex's refresh finds nothing left to
    * list. Read-only — the index's put-back of what it "listed" is a
    * no-op, and nothing is shared across reads. */
  private final class Prefed(m: java.util.HashMap[Path, Array[FileStatus]])
    extends FileStatusCache {
    override def getLeafFiles(path: Path): Option[Array[FileStatus]] =
      Option(m.get(path))
    override def putLeafFiles(path: Path, files: Array[FileStatus]): Unit = ()
    override def invalidateAll(): Unit = ()
  }

  /** The relation-assembly half of DataSource.resolveRelation for a
    * parquet read of explicit file paths, minus the listing: partition
    * spec inferred by PartitioningAwareFileIndex from the supplied
    * statuses + the `basePath` option, data schema by
    * ParquetFileFormat.inferSchema over the same files (mergeSchema
    * honored from `options`), HadoopFsRelation built from both —
    * byte-identical planning inputs to the listing-based read. */
  def read(s: org.apache.spark.sql.SparkSession,
      options: Map[String, String],
      statuses: Seq[FileStatus]): DataFrame = {
    val cs = s.asInstanceOf[SparkSession]
    val opts = CaseInsensitiveMap(options)
    val m = new java.util.HashMap[Path, Array[FileStatus]](statuses.size * 2)
    statuses.foreach(st => m.put(st.getPath, Array(st)))
    val index = new InMemoryFileIndex(cs, statuses.map(_.getPath),
      opts, None, new Prefed(m))
    val format = new ParquetFileFormat
    val dataSchema = format.inferSchema(cs, opts, index.allFiles())
      .getOrElse(throw new IllegalArgumentException(
        "GraftManifestReadBridge: unable to infer parquet schema over " +
          s"${statuses.size} manifested files"))
    val rel = HadoopFsRelation(index, index.partitionSchema,
      dataSchema.asNullable, None, format, opts)(cs)
    cs.baseRelationToDataFrame(rel)
  }
}
