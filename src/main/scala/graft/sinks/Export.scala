package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Single-file export writers — the Spark re-expression of the
  * reference's GridFS/CSV sinks (SURVEY.md §2.2 #9/#10:
  * `J/GridFSOutputFormat.java:157-214`, `J/TwitterStreamDump.java:68-70`,
  * `J/ExportResultsJob.java:162-172`).
  *
  * The reference forces parallelism 1 because its sink is a single
  * GridFS upload stream. Here `coalesce(1)` is confined to these
  * EXPORT-ONLY writers (human-consumable artifacts, bounded size by
  * construction); dataset-scale output goes through the normal
  * partitioned writers. GridFS itself is a storage adapter outside
  * query semantics — these write to any Hadoop-compatible filesystem.
  */
object Export {

  /** Tab-separated single file with optional header (reference tsv /
    * twitter-neel-challenge / twitter-neel-dataset formats). */
  def writeSingleTsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", header.toString)
      .option("emptyValue", "")
      .csv(path)

  /** JSON-lines single file (reference json format #37). */
  def writeSingleJson(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).json(path)

  /** Partitioned parquet for dataset-scale results (the path the
    * 100 TB deployment uses; partition count follows the plan). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
}
