package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exactness baseline, a
  * hyperplane-LSH-bucketed variant as the scale path, and blocked
  * embedding-cosine near-dup pairs.
  *
  * The cosine kernel is the native codegen'd Catalyst expression
  * [[graft.functions.CosineSimilarity]] (one fused pass over the raw
  * float arrays — no per-element interpreted lambdas, no
  * float→double array materialization). Results are rounded to 6
  * decimals so they are hash-stable against the oracle regardless of
  * summation association.
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

  private def cos6(a: Column, b: Column): Column =
    round(VectorFunctions.cosine(a, b), 6)

  /** Sign-pattern LSH bucket over the first [[Planes]] dims. */
  private def bucketCol: Column =
    (0 until Planes).map(j =>
      when(expr(s"embedding[$j]") > 0, lit(1 << j)).otherwise(lit(0))).reduce(_ + _)

  private def bucketSql(v: String): String =
    (0 until Planes).map(j =>
      s"CASE WHEN $v[${j + 1}] > 0 THEN ${1 << j} ELSE 0 END").mkString(" + ")

  private val vecSql = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
  private val nrmSql = "sqrt(list_sum(list_transform(v, x -> x * x)))"
  private def cosSql(va: String, vb: String, na: String, nb: String) =
    s"round(list_sum(list_transform(range(1, 65), i -> $va[i] * $vb[i])) / ($na * $nb), 6)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-k for the query vector (vec_id = 0).
    // Plans as broadcast-nested-loop of 1 row + TakeOrderedAndProject.
    "q36_knn_brute" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val q = e.where(col("vec_id") === 0)
        .select(col("embedding").as("q_embedding"))
      e.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          cos6(col("embedding"), col("q_embedding")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(10)
    },

    // ANN: same top-k but probing only the query's LSH bucket.
    "q37_ann_lsh" -> { (s, d) =>
      val e = Tables.embeddings(s, d).withColumn("bucket", bucketCol)
      val q = e.where(col("vec_id") === 0)
        .select(col("embedding").as("q_embedding"), col("bucket"))
      e.where(col("vec_id") =!= 0)
        .join(broadcast(q), Seq("bucket"))
        .select(col("vec_id"), col("label"),
          cos6(col("embedding"), col("q_embedding")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(10)
    },

    // IVF-style ANN: coarse centroids (per-label mean vectors, dims
    // rounded to 6 so they are reduction-order stable), probe the
    // nprobe=2 nearest centroids, exact top-k within those cells. At
    // 100 TB the cell id is a partition key — the probe prunes the
    // scan to nprobe/ncells of the corpus, like the LSH bucket path.
    "q39_ann_ivf" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
        .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      val cents = e.groupBy(col("label")).agg(
        array((0 until 64).map(i => round(avg(expr(s"v[$i]")), 6)): _*).as("cv"))
      val q = e.where(col("vec_id") === 0)
        .select(col("v").as("qv"), col("embedding").as("q_embedding"))
      val scored = cents.crossJoin(broadcast(q))
        .withColumn("c_cos", expr(
          "aggregate(zip_with(cv, qv, (x, y) -> x * y), 0D, (acc, p) -> acc + p)" +
            " / (sqrt(aggregate(cv, 0D, (acc, x) -> acc + x * x))" +
            " * sqrt(aggregate(qv, 0D, (acc, x) -> acc + x * x)))"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("c_cos").desc, col("label").asc)
      val probed = scored
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 2)
        .select(col("label"))
      Tables.embeddings(s, d)
        .join(broadcast(probed), Seq("label"))
        .where(col("vec_id") =!= 0)
        .crossJoin(broadcast(q.select(col("q_embedding"))))
        .select(col("vec_id"), col("label"),
          cos6(col("embedding"), col("q_embedding")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(10)
    },

    // Embedding-cosine near-dup pairs, blocked by label.
    "q38_embed_neardup" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val a = e.select(col("vec_id").as("vec_a"), col("label"),
        col("embedding").as("emb_a"))
      val b = e.select(col("vec_id").as("vec_b"), col("label"),
        col("embedding").as("emb_b"))
      a.join(b, Seq("label"))
        .where(col("vec_a") < col("vec_b"))
        .withColumn("cos", cos6(col("emb_a"), col("emb_b")))
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
      "q39_ann_ivf" -> {
        val centDims = (1 to 64).map(i => s"round(avg(v[$i]), 6)").mkString(", ")
        s"""$base,
           |cents AS (SELECT label, [$centDims] AS cv FROM n GROUP BY label),
           |q AS (SELECT v AS qv, nrm AS qnrm FROM n WHERE vec_id = 0),
           |scored AS (
           |  SELECT label,
           |    list_sum(list_transform(range(1, 65), i -> cv[i] * qv[i]))
           |      / (sqrt(list_sum(list_transform(cv, x -> x * x)))
           |         * sqrt(list_sum(list_transform(qv, x -> x * x)))) AS c_cos
           |  FROM cents CROSS JOIN q),
           |probed AS (
           |  SELECT label FROM (
           |    SELECT label, row_number() OVER (ORDER BY c_cos DESC, label ASC) AS rnk
           |    FROM scored) WHERE rnk <= 2)
           |SELECT a.vec_id, a.label,
           |  ${cosSql("a.v", "q2.v", "a.nrm", "q2.nrm")} AS cos
           |FROM n a
           |JOIN probed p ON a.label = p.label
           |CROSS JOIN (SELECT v, nrm FROM n WHERE vec_id = 0) q2
           |WHERE a.vec_id <> 0
           |ORDER BY cos DESC, a.vec_id ASC LIMIT 10""".stripMargin
      },
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
