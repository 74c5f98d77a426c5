package graft.plans

import org.apache.spark.sql.SparkSession
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
    s.read.parquet(srcDir)
      .repartition(partitionCols.map(col): _*)
      // layouts that keep rows sorted inside each partition for
      // row-group min/max tightness (Z-order's `z`) re-sort here;
      // plain bucketed indexes pass Nil
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*)
      .parquet(destDir)
    graft.Fs.listDataFiles(destDir, s.sparkContext.hadoopConfiguration).size
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
