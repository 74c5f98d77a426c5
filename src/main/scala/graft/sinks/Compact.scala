package graft.sinks

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance pass every 100 TB
  * parquet lake needs: streaming sinks and fine-grained partitioned
  * writes accumulate KB-scale files whose per-file open/footer cost
  * eventually dominates scans (and whose count blows up the driver's
  * file index). Compaction rewrites a dataset into ~`targetBytes`
  * files sized for the scan path (`spark.sql.files.maxPartitionBytes`
  * is the natural target, 128 MB default).
  *
  * The rewrite is a plain scan → `repartition(n)` → write: one round
  * robin shuffle, fully parallel, no driver-side file juggling. It
  * writes to a NEW directory — at lake scale the atomic "swap" is a
  * metastore/table-format pointer flip (or a rename), which stays the
  * caller's one-line responsibility instead of a fake in-place
  * rewrite here.
  *
  * File sizing and counting go through the Hadoop `FileSystem` API
  * ([[graft.Fs]]) with a RECURSIVE listing, so the same code runs on
  * hdfs://-or-s3a:// paths and sizes hive-partitioned sources (part
  * files nested under key=value dirs) correctly instead of summing
  * zero bytes and funneling the whole dataset into one file.
  */
object Compact {

  /** Rewrite `srcDir` (parquet) into `destDir` with ~`targetBytes`
    * files; returns the output file count. */
  def compactParquet(s: SparkSession, srcDir: String, destDir: String,
      targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0)
    val conf = s.sparkContext.hadoopConfiguration
    val totalBytes = graft.Fs.listDataFiles(srcDir, conf).map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    s.read.parquet(srcDir)
      .repartition(n)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(destDir)
    graft.Fs.listDataFiles(destDir, conf).size
  }
}
