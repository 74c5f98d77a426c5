package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

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
    // salt from ALL row columns, not the aggregated value: a hot key
    // whose rows share one value (the common adversarial case) would
    // otherwise hash to a single salt and defeat the spread entirely
    val scatter = pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts))
    df.withColumn("__salt", scatter)
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("sum_value"), sum(col("__n")).as("n"))
  }

  /** Driver-gated queries: each salted form must be SET-IDENTICAL to
    * the plain join/aggregation the oracle runs — the salt is a
    * physical-layout device, never a semantic one. Sums go through
    * DECIMAL(12,2) so the two-phase reduction is order-exact against
    * the oracle's single-phase sum (the q01 convention). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Salted skewed join: lineitem (large, skewed probe) x orders
    // (moderate build side, replicated salts x). At 100 TB this is the
    // explicit form for the key distributions AQE's runtime skew
    // splitting can't fix — a single key too hot for ONE task even
    // after split, spread across `salts` partitions by a deterministic
    // row hash. Output aggregated per priority so the gate checks the
    // full join product without hashing 6M rows.
    "q68_salted_join" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("okey"),
          col("l_extendedprice").cast("decimal(12,2)").as("price"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      saltedJoin(li, ord, "okey", salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("price")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    },

    // Salted two-phase aggregation: 6M lineitem rows funneled into 3
    // grouping keys — the adversarial case where every row of a key
    // would otherwise meet in one reduce task. Partial-agg on
    // (key, salt), final on key.
    "q69_salted_agg" -> { (s, d) =>
      saltedSum(
        Tables.lineitem(s, d).where(col("l_returnflag").isNotNull),
        "l_returnflag", col("l_quantity").cast("decimal(12,2)"),
        salts = 16)
        .select(col("l_returnflag"),
          col("sum_value").cast("double").as("sum_qty"), col("n"))
        .orderBy(col("l_returnflag"))
    },
  )

  def oracle: Map[String, String] = Map(
    "q68_salted_join" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q69_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem WHERE l_returnflag IS NOT NULL
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
