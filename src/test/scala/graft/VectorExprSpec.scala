package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** The native codegen'd cosine expression: bit-identical to the
  * higher-order-function formulation, usable from SQL after
  * registration, and surviving both codegen and interpreted paths. */
class VectorExprSpec extends SparkSpec {

  test("native cosine equals the HOF formulation bit-for-bit") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, sf).limit(50)
    val q = e.where($"vec_id" === 0)
      .select($"embedding".as("qe"))
    val hof = e.crossJoin(broadcast(q))
      .withColumn("va", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("vb", expr("transform(qe, x -> CAST(x AS DOUBLE))"))
      .select($"vec_id",
        (expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, p) -> acc + p)") /
          (expr("sqrt(aggregate(va, 0D, (acc, x) -> acc + x * x))") *
            expr("sqrt(aggregate(vb, 0D, (acc, x) -> acc + x * x))"))).as("cos"))
      .as[(Long, Double)].collect().toMap
    val native = e.crossJoin(broadcast(q))
      .select($"vec_id", VectorFunctions.cosine($"embedding", $"qe").as("cos"))
      .as[(Long, Double)].collect().toMap
    assert(native.keySet === hof.keySet)
    native.foreach { case (id, c) =>
      assert(java.lang.Double.doubleToLongBits(c) ===
        java.lang.Double.doubleToLongBits(hof(id)), s"vec $id differs")
    }
  }

  test("native l2sq equals the HOF formulation bit-for-bit and works from SQL") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, sf).limit(50)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    val q = e.where($"vec_id" === 0).select($"v".as("qv"))
    val hof = e.crossJoin(broadcast(q))
      .select($"vec_id", expr(
        "aggregate(zip_with(v, qv, (x, y) -> (x - y) * (x - y)), 0D, (acc, p) -> acc + p)").as("d"))
      .as[(Long, Double)].collect().toMap
    val native = e.crossJoin(broadcast(q))
      .select($"vec_id", VectorFunctions.l2sq($"v", $"qv").as("d"))
      .as[(Long, Double)].collect().toMap
    assert(native.keySet === hof.keySet)
    native.foreach { case (id, d) =>
      assert(java.lang.Double.doubleToLongBits(d) ===
        java.lang.Double.doubleToLongBits(hof(id)), s"vec $id differs")
    }
    VectorFunctions.register(s)
    e.limit(3).createOrReplaceTempView("emb_l2_tmp")
    val self = s.sql("SELECT graft_l2sq(v, v) FROM emb_l2_tmp LIMIT 1")
      .collect().head.getDouble(0)
    assert(self === 0.0)
  }

  test("graft_cosine is callable from SQL after registration") {
    val s = spark
    VectorFunctions.register(s)
    Tables.embeddings(s, sf).limit(5).createOrReplaceTempView("emb_tmp")
    val n = s.sql(
      """SELECT a.vec_id, graft_cosine(a.embedding, b.embedding) AS c
        |FROM emb_tmp a JOIN emb_tmp b ON a.vec_id <= b.vec_id""".stripMargin)
      .count()
    assert(n === 15)
    // self-similarity is exactly 1.0
    val self = s.sql(
      "SELECT graft_cosine(embedding, embedding) FROM emb_tmp LIMIT 1")
      .collect().head.getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("interpreted fallback matches codegen") {
    val s = spark
    import s.implicits._
    // force the interpreted path by disabling whole-stage codegen
    val e = Tables.embeddings(s, sf).limit(20)
    val q = e.where($"vec_id" === 1).select($"embedding".as("qe"))
    def run(): Map[Long, Double] =
      e.crossJoin(broadcast(q))
        .select($"vec_id", VectorFunctions.cosine($"embedding", $"qe").as("c"))
        .as[(Long, Double)].collect().toMap
    val withCodegen = run()
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = run()
      assert(withCodegen === interpreted)
    } finally {
      s.conf.set("spark.sql.codegen.wholeStage", "true")
      s.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
