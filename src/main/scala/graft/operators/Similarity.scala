package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exactness baseline, a
  * hyperplane-LSH-bucketed variant as the scale path, and blocked
  * embedding-cosine near-dup pairs.
  *
  * All vector math is pure column expressions (`transform` /
  * `zip_with` / `aggregate`), fully inside WholeStageCodegen — no
  * UDFs, no collect-and-loop. Floats are widened to double before any
  * arithmetic; cosines are rounded to 6 decimals so results are
  * hash-stable against the oracle regardless of summation order.
  *
  * Scale design:
  *   - brute-force top-k is a broadcast of ONE query row against a
  *     narrow scan + `orderBy.limit` (Spark plans TakeOrderedAndProject
  *     — per-partition top-k then a k-row merge on the driver, no full
  *     sort, no shuffle of the corpus);
  *   - the LSH path buckets vectors by the sign pattern of the first
  *     [[Planes]] dims (axis-aligned random-hyperplane LSH); the probe
  *     touches a single bucket — at 100 TB the bucket column is a
  *     partition key, so the scan prunes to ~1/2^planes of the corpus;
  *   - near-dup pair generation blocks on `label` (or any coarse
  *     cluster id) — sum-of-squares over blocks, never a global
  *     cross join.
  */
object Similarity {

  /** Hyperplane count for the LSH bucket (2^Planes buckets). */
  val Planes = 4

  /** Widen float vec to double and precompute the L2 norm. */
  private def withVec(e: DataFrame): DataFrame =
    e.withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", expr("sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))"))

  private val vecSql =
    "list_transform(embedding, x -> CAST(x AS DOUBLE))"
  private val nrmSql =
    "sqrt(list_sum(list_transform(v, x -> x * x)))"

  /** Sign-pattern LSH bucket over the first [[Planes]] dims. */
  private def bucketCol: Column =
    (0 until Planes).map(j =>
      when(expr(s"v[$j]") > 0, lit(1 << j)).otherwise(lit(0))).reduce(_ + _)

  private def bucketSql(v: String): String =
    (0 until Planes).map(j =>
      s"CASE WHEN $v[${j + 1}] > 0 THEN ${1 << j} ELSE 0 END").mkString(" + ")

  /** cosine(a, b) rounded to 6 decimals, as a SQL expr over columns
    * `va`/`vb` with norms `na`/`nb`. */
  private val cosExpr =
    "round(aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, p) -> acc + p) / (na * nb), 6)"
  private def cosSql(va: String, vb: String, na: String, nb: String) =
    s"round(list_sum(list_transform(range(1, 65), i -> $va[i] * $vb[i])) / ($na * $nb), 6)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-k for the query vector (vec_id = 0).
    // Plans as broadcast-nested-loop of 1 row + TakeOrderedAndProject.
    "q36_knn_brute" -> { (s, d) =>
      val e = withVec(Tables.embeddings(s, d))
      val q = e.where(col("vec_id") === 0)
        .select(col("v").as("vb"), col("nrm").as("nb"))
      e.where(col("vec_id") =!= 0)
        .select(col("vec_id"), col("label"), col("v").as("va"), col("nrm").as("na"))
        .crossJoin(broadcast(q))
        .withColumn("cos", expr(cosExpr))
        .select(col("vec_id"), col("label"), col("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(10)
    },

    // ANN: same top-k but probing only the query's LSH bucket.
    "q37_ann_lsh" -> { (s, d) =>
      val e = withVec(Tables.embeddings(s, d)).withColumn("bucket", bucketCol)
      val q = e.where(col("vec_id") === 0)
        .select(col("v").as("vb"), col("nrm").as("nb"), col("bucket"))
      e.where(col("vec_id") =!= 0)
        .select(col("vec_id"), col("label"), col("bucket"),
          col("v").as("va"), col("nrm").as("na"))
        .join(broadcast(q), Seq("bucket"))
        .withColumn("cos", expr(cosExpr))
        .select(col("vec_id"), col("label"), col("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(10)
    },

    // Embedding-cosine near-dup pairs, blocked by label.
    "q38_embed_neardup" -> { (s, d) =>
      val e = withVec(Tables.embeddings(s, d))
        .select(col("vec_id"), col("label"), col("v"), col("nrm"))
      val a = e.select(col("vec_id").as("vec_a"), col("label"),
        col("v").as("va"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("vec_b"), col("label"),
        col("v").as("vb"), col("nrm").as("nb"))
      a.join(b, Seq("label"))
        .where(col("vec_a") < col("vec_b"))
        .withColumn("cos", expr(cosExpr))
        .where(col("cos") >= 0.4)
        .select(col("vec_a"), col("vec_b"), col("label"), col("cos"))
        .orderBy(col("vec_a"), col("vec_b"))
    },
  )

  def oracle: Map[String, String] = {
    val base =
      s"""WITH e AS (
         |  SELECT vec_id, label, $vecSql AS v FROM embeddings),
         |n AS (SELECT vec_id, label, v, $nrmSql AS nrm FROM e)""".stripMargin
    Map(
      "q36_knn_brute" ->
        s"""$base
           |SELECT a.vec_id, a.label,
           |  ${cosSql("a.v", "q.v", "a.nrm", "q.nrm")} AS cos
           |FROM n a CROSS JOIN (SELECT v, nrm FROM n WHERE vec_id = 0) q
           |WHERE a.vec_id <> 0
           |ORDER BY cos DESC, a.vec_id ASC LIMIT 10""".stripMargin,
      "q37_ann_lsh" ->
        s"""$base,
           |bk AS (SELECT *, ${bucketSql("v")} AS bucket FROM n)
           |SELECT a.vec_id, a.label,
           |  ${cosSql("a.v", "q.v", "a.nrm", "q.nrm")} AS cos
           |FROM bk a JOIN (SELECT v, nrm, bucket FROM bk WHERE vec_id = 0) q
           |  ON a.bucket = q.bucket
           |WHERE a.vec_id <> 0
           |ORDER BY cos DESC, a.vec_id ASC LIMIT 10""".stripMargin,
      "q38_embed_neardup" ->
        s"""$base
           |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
           |  ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} AS cos
           |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
           |WHERE ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} >= 0.4
           |ORDER BY vec_a, vec_b""".stripMargin,
    )
  }
}
