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
                 skewSite: String): DataFrame =
    prefixed(df, groupCols, bucketCol, lit(1L), skewSite) { (in, w, base) =>
      in.withColumn(base.rankOut,
        col(base.baseCol) + row_number().over(w.orderBy(orderCols: _*))
          .cast("long"))
    }.withColumnRenamed("__go_out", rankName)

  /** Append `sumName` = the INCLUSIVE global running sum of
    * `weightCol` within each `groupCols` combination, in
    * (`bucketCol`, `orderCols`) order — the weighted generalization
    * of [[globalRank]] (rank is the weight-1 instance). The driver
    * prefix-sums per-bucket WEIGHT TOTALS instead of counts; the
    * within-bucket running sum is an ordinary partitioned window.
    * Powers offset-based packing (q128): pack = start-offset div
    * budget, where start = running sum − own weight. */
  def globalRunningSum(df: DataFrame, groupCols: Seq[String],
                       bucketCol: String, orderCols: Seq[Column],
                       weightCol: String, sumName: String,
                       skewSite: String): DataFrame =
    prefixed(df, groupCols, bucketCol, col(weightCol).cast("long"),
        skewSite) { (in, w, base) =>
      in.withColumn(base.rankOut,
        col(base.baseCol) + sum(col(weightCol).cast("long"))
          .over(w.orderBy(orderCols: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }.withColumnRenamed("__go_out", sumName)

  private case class Base(baseCol: String, rankOut: String)

  /** Shared machinery: bounded (group, bucket) histogram of
    * `weightExpr` → driver prefix sum → broadcast exclusive offsets →
    * caller builds the within-bucket window expression. */
  private def prefixed(df: DataFrame, groupCols: Seq[String],
                       bucketCol: String, weightExpr: Column,
                       skewSite: String)(
      build: (DataFrame, org.apache.spark.sql.expressions.WindowSpec,
              Base) => DataFrame): DataFrame = {
    val s = df.sparkSession
    val keyCols = groupCols :+ bucketCol
    val hist = df.groupBy(keyCols.map(col): _*)
      .agg(sum(weightExpr).as("c"))
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
      keyCols.map(n => hist.schema(n)) :+ StructField("__go_base", LongType))
    val offs = s.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(outRows).asJava), schema)
    val w = Window.partitionBy(keyCols.map(col): _*)
    build(df.join(broadcast(offs), keyCols), w,
        Base("__go_base", "__go_out"))
      .drop("__go_base")
  }
}
