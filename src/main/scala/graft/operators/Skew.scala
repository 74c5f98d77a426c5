package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities: salted shuffle join and salted two-phase
  * aggregation.
  *
  * AQE's skew-join splitting (on by default) handles moderate skew at
  * runtime; these are the explicit forms for adversarial key
  * distributions — the "one user id owns 10% of the stream" case —
  * where the planner must be TOLD to spread a hot key.
  *
  *   - [[saltedJoin]]: the build side replicates `salts`× (bounded,
  *     explicit blow-up); the probe side scatters each hot key across
  *     `salts` partitions via a deterministic row hash. Output is
  *     set-identical to the plain inner join.
  *   - [[saltedSum]]: aggregation skew doesn't need replication at
  *     all — partial-aggregate on (key, salt), then final on key.
  *     Spark's map-side partial aggregation already does this
  *     implicitly; the explicit salt matters when upstream
  *     partitioning funnels one key into few map tasks.
  */
object Skew {

  /** Inner equi-join where `left` is large with skewed `key`s and
    * `right` is the moderate-size build side. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    // deterministic per-row scatter: hash of ALL left columns mod salts
    val scatter = pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salts))
    val l = left.withColumn("__salt", scatter)
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    l.join(r, l(key) === r(key) && l("__salt") === r("__salt"))
      .drop("__salt").drop(r(key))
  }

  /** Two-phase sum/count over a skewed grouping key. */
  def saltedSum(df: DataFrame, key: String, valueCol: Column,
      salts: Int): DataFrame = {
    require(salts > 0)
    df.withColumn("__salt", pmod(hash(valueCol), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("sum_value"), sum(col("__n")).as("n"))
  }
}
