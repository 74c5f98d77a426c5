package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed GLOBAL total order without the single-partition window.
  *
  * `row_number() OVER (ORDER BY …)` plans `Exchange SinglePartition` +
  * a one-partition WindowExec — the whole corpus through ONE task. The
  * scalable decomposition, shared by q124 (curriculum rank) and q126
  * (epoch shuffle):
  *
  *  1. every row carries an integer BUCKET that is MONOTONE in the
  *     target order's leading key (the caller's contract — e.g. the
  *     bounded difficulty value itself, a fixed-width range of a
  *     continuous key, or the leading byte of a uniform hash);
  *  2. ONE bounded driver aggregate — count per (group, bucket) — is
  *     prefix-summed into exclusive offsets (O(buckets) driver work,
  *     never O(rows)) and broadcast back;
  *  3. the within-bucket rank runs as an ordinary PARTITIONED window,
  *     parallel across buckets; global rank = offset + local rank.
  *
  * Skew: a hot bucket serializes its own rows only; the histogram is
  * driver-visible at step 2, so a production caller re-splits hot
  * buckets (finer ranges, or tie-key quantiles computed over just the
  * hot buckets) before ranking — the observed max bucket is recorded
  * via [[graft.SkewStats]] so a scale rehearsal reports the pressure
  * instead of arguing it. */
object GlobalOrder {

  /** Append `rankName` = the 1-based global rank within each
    * `groupCols` combination (empty = one corpus-wide order), ordered
    * by (`bucketCol` ascending, then `orderCols`). `bucketCol` must be
    * integral and monotone in the order's leading key. */
  def globalRank(df: DataFrame, groupCols: Seq[String], bucketCol: String,
                 orderCols: Seq[Column], rankName: String,
                 skewSite: String): DataFrame = {
    val s = df.sparkSession
    val keyCols = groupCols :+ bucketCol
    val hist = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("c"))
    val rows = hist.collect()
    graft.SkewStats.record(skewSite,
      if (rows.isEmpty) 0L else rows.map(_.getAs[Long]("c")).max, 100000)
    val outRows: Seq[Row] = rows
      .groupBy(r => groupCols.map(g => r.getAs[Any](g)))
      .values.flatMap { grp =>
        var acc = 0L
        grp.sortBy(_.getAs[Number](bucketCol).longValue).map { r =>
          val base = acc
          acc += r.getAs[Long]("c")
          Row.fromSeq(keyCols.map(k => r.getAs[Any](k)) :+ base)
        }
      }.toSeq
    val schema = StructType(
      keyCols.map(n => hist.schema(n)) :+ StructField("base", LongType))
    val offs = s.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(outRows).asJava), schema)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    df.join(broadcast(offs), keyCols)
      .withColumn(rankName,
        col("base") + row_number().over(w).cast("long"))
      .drop("base")
  }
}
