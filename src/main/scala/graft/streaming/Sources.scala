package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Streaming sources — the Spark re-expression of the reference's
  * rate-limited dataset source (SURVEY.md §2.1 #2:
  * `J/source/GridFSCsvSource.java:98-128`, 4 rows/s sleep loop) and
  * its Kafka consumers (#3).
  *
  * The reference throttles by sleeping `1000/maxReadRate` ms per row
  * inside a parallelism-1 source. Spark's equivalent intent is
  * source-side admission control per micro-batch: `maxFilesPerTrigger`
  * / `maxBytesPerTrigger` for files, `maxOffsetsPerTrigger` for Kafka
  * — declarative, parallel, and replayable instead of wall-clock
  * sleeps. For EXACT row-level admission (the reference's 4 rows/s),
  * [[graft.sources.RateLimitedCsvProvider]] is a full DataSource V2
  * `MicroBatchStream` with `SupportsAdmissionControl`:
  * `format("graft-rate-csv").option("rowsPerTrigger", "4")` admits
  * exactly 4 rows per trigger from checkpointable offsets.
  *
  * The reference's EOF-sentinel protocol (empty map then idle) is
  * subsumed by Spark's `Trigger.AvailableNow` (process everything,
  * then stop) — see Progress for the completion signal.
  */
object Sources {

  /** Rate-limited CSV dataset stream: at most `maxFilesPerTrigger`
    * files per micro-batch (reference: 4 rows/s cap; here the cap is
    * per-trigger admission, the scalable form of the same knob). */
  def csvDatasetStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 1, sep: String = "\t",
      header: Boolean = true): DataFrame =
    spark.readStream
      .schema(schema)
      .option("sep", sep)
      .option("header", header.toString)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(dir)

  /** Kafka response-topic stream (reference #3). Requires the Kafka
    * connector on the classpath; value is the JSON payload string. */
  def kafkaJsonStream(spark: SparkSession, bootstrap: String,
      topic: String, maxOffsetsPerTrigger: Long = 10000): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
}
