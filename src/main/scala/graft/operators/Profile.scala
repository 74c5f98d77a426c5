package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data profiling — the first pass any training-data pipeline runs on
  * a new corpus: per-column row/null/distinct counts and value bounds,
  * computed in ONE scan (all columns profiled in a single aggregate
  * projection, then unpivoted; no per-column jobs, no driver loop).
  *
  * Values are compared as strings for a uniform output schema;
  * numeric min/max are therefore lexicographic — fine for profiling,
  * and deterministic across engines.
  */
object Profile {

  /** One row per profiled column: (column, n_rows, n_nulls,
    * n_distinct, min_s, max_s). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      val sc = col(c).cast("string")
      Seq(
        count(lit(1)).as(s"${c}__rows"),
        sum(when(col(c).isNull, 1).otherwise(0)).as(s"${c}__nulls"),
        countDistinct(sc).as(s"${c}__distinct"),
        min(sc).as(s"${c}__min"),
        max(sc).as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row with stack() — ONE aggregate in the
    // plan by construction (the former union-of-selects shape leaned
    // on exchange reuse to stay one-scan, which AQE need not grant)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__rows`, `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    wide.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
      "(column_name, n_rows, n_nulls, n_distinct, min_s, max_s)")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q58_profile" -> { (s, d) =>
      profile(Tables.documents(s, d),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
        .orderBy(col("column_name"))
    },
  )

  def oracle: Map[String, String] = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val parts = cols.map { c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT CAST($c AS VARCHAR)) AS n_distinct,
         |  min(CAST($c AS VARCHAR)) AS min_s, max(CAST($c AS VARCHAR)) AS max_s
         |FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n")
    Map("q58_profile" -> s"SELECT * FROM (\n$parts\n) ORDER BY column_name")
  }
}
