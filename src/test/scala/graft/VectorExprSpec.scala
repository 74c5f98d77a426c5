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

  test("native simhash16 equals the declarative 17-lambda formulation") {
    val s = spark
    import s.implicits._
    val toks = Tables.documents(s, sf).limit(200)
      .select($"doc_id", split(lower($"text"), "\\s+").as("toks"))
    val tokval = (0 until 4).map { j =>
      s"(instr('0123456789abcdef', substr(md5(t), ${j + 1}, 1)) - 1) * ${1 << (4 * j)}"
    }.mkString(" + ")
    val withBits = (0 until 16).foldLeft(
        toks.withColumn("tv", expr(s"transform(toks, t -> $tokval)"))) { (df, b) =>
      df.withColumn(s"w$b", expr(
        s"aggregate(tv, 0, (acc, x) -> acc + (CASE WHEN ((shiftright(x, $b)) & 1) = 1 THEN 1 ELSE -1 END))"))
    }
    val declarative = withBits.withColumn("fp",
      (0 until 16).map(b => when(col(s"w$b") > 0, lit(1 << b)).otherwise(lit(0)))
        .reduce(_ + _).cast("int"))
      .select($"doc_id", $"fp").as[(Long, Int)].collect().toMap
    val native = toks
      .select($"doc_id", VectorFunctions.simhash16($"toks").as("fp"))
      .as[(Long, Int)].collect().toMap
    assert(native === declarative)
    // edge semantics: empty array → 0, NULL array → NULL, NULL token
    // counts as -1 per bit (same as the SQL CASE)
    VectorFunctions.register(s)
    val r = s.sql(
      """SELECT graft_simhash16(CAST(array() AS ARRAY<STRING>)) AS empty,
        |  graft_simhash16(CAST(NULL AS ARRAY<STRING>)) AS nul,
        |  graft_simhash16(array('a', NULL)) AS withnull,
        |  graft_simhash16(array('a')) AS single""".stripMargin)
      .collect().head
    assert(r.getInt(0) === 0)
    assert(r.isNullAt(1))
    // 'a' vs ('a', NULL): the NULL token's -1 cancels the single +1 on
    // every bit 'a' has set (2*ones = n is NOT > n), so the pair
    // fingerprint must be 0 while the singleton keeps a's bits
    assert(r.getInt(2) === 0)
    assert(r.getInt(3) !== 0)
  }

  test("native minhash16 equals the declarative slice-min formulation") {
    val s = spark
    import s.implicits._
    val toks = Tables.documents(s, sf).limit(200)
      .select($"doc_id",
        array_distinct(split(lower($"text"), "\\s+")).as("tokset"))
    // declarative twin: per position, lexicographic min of the
    // 8-hex-char digest slice, then an INDEPENDENT hex->long decode
    // (conv, not the kernel's byte math) — proves value and order
    // agreement end to end
    val declarative = (0 until 16).foldLeft(toks) { (df, i) =>
      df.withColumn(s"sig$i", expr(
        s"CAST(conv(array_min(transform(tokset, t -> " +
          s"substring(md5(concat('$i:', t)), 1, 8))), 16, 10) AS BIGINT)"))
    }.select($"doc_id",
        array((0 until 16).map(i => col(s"sig$i")): _*).as("sig"))
      .as[(Long, Seq[java.lang.Long])].collect().toMap
    val native = toks
      .select($"doc_id", VectorFunctions.minhash16($"tokset").as("sig"))
      .as[(Long, Seq[java.lang.Long])].collect().toMap
    assert(native === declarative)
    // empty token set → all 16 positions NULL (array_min of empty)
    VectorFunctions.register(s)
    val empty = s.sql(
      "SELECT graft_minhash16(CAST(array() AS ARRAY<STRING>)) AS sig")
      .collect().head.getSeq[java.lang.Long](0)
    assert(empty.size === 16 && empty.forall(_ == null))
  }

  test("native shingle kernels equal the declarative formulations") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, sf).limit(200)
      .withColumn("toks", expr(operators.Tokens.toksExpr))
      .withColumn("lt", lower($"text"))
    // token shingles, distinct and with multiplicity
    val declDistinct = docs.select($"doc_id", expr(
      "CASE WHEN size(toks) >= 5 THEN array_distinct(transform(" +
        "sequence(1, size(toks) - 4), i -> concat_ws(' ', slice(toks, i, 5)))) " +
        "ELSE CAST(array() AS ARRAY<STRING>) END").as("g"))
      .as[(Long, Seq[String])].collect().toMap
    val natDistinct = docs.select($"doc_id",
      VectorFunctions.shingles($"toks", 5, distinct = true).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(natDistinct === declDistinct)
    val declMulti = docs.select($"doc_id", expr(
      "CASE WHEN size(toks) >= 3 THEN transform(" +
        "sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3))) " +
        "ELSE CAST(array() AS ARRAY<STRING>) END").as("g"))
      .as[(Long, Seq[String])].collect().toMap
    val natMulti = docs.select($"doc_id",
      VectorFunctions.shingles($"toks", 3, distinct = false).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(natMulti === declMulti)
    // char n-grams
    val declChar = docs.select($"doc_id", expr(
      "CASE WHEN length(lt) >= 3 THEN array_distinct(transform(" +
        "sequence(1, length(lt) - 2), i -> substring(lt, i, 3))) " +
        "ELSE CAST(array() AS ARRAY<STRING>) END").as("g"))
      .as[(Long, Seq[String])].collect().toMap
    val natChar = docs.select($"doc_id",
      VectorFunctions.charNgrams($"lt", 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(natChar === declChar)
    // min-md5 winnowing (nullable when below 5 tokens)
    val declMin = docs.select($"doc_id", expr(
      "CASE WHEN size(toks) >= 5 THEN array_min(transform(" +
        "sequence(1, size(toks) - 4), i -> md5(concat_ws(' ', slice(toks, i, 5))))) END").as("m"))
      .as[(Long, Option[String])].collect().toMap
    val natMin = docs.select($"doc_id",
      VectorFunctions.minMd5(VectorFunctions.shingles($"toks", 5, distinct = false)).as("m"))
      .as[(Long, Option[String])].collect().toMap
    assert(natMin === declMin)
  }

  test("q76 and q39 consume one quantizer: retraining keeps them in lockstep") {
    val s = spark
    import s.implicits._
    import graft.operators.Similarity
    // (a) semantic dedup's cid column IS the shared model's assignment
    val assigned = Similarity.ivfModel(s, sf)._2
      .select($"vec_id", $"cid".cast("long")).as[(Long, Long)].collect().toMap
    val q76cid = Similarity.queries("q76_semantic_dedup")(s, sf)
      .select($"vec_id", $"cid").as[(Long, Long)].collect().toMap
    assert(q76cid === assigned)
    // (b) retraining from scratch (memo evicted) reproduces the exact
    // same assignment — so a quantizer tweak can never move q39 (ANN
    // recall) without moving q76 (dedup keeps) identically, and both
    // re-derive deterministically
    Similarity.clearMemos()
    val retrained = Similarity.ivfModel(s, sf)._2
      .select($"vec_id", $"cid".cast("long")).as[(Long, Long)].collect().toMap
    assert(retrained === assigned)
    // (c) q39's answers all come from cells of that same assignment —
    // every returned neighbor's cid is one of the probed cells
    val resultCids = Similarity.queries("q39_ann_ivf")(s, sf)
      .select($"vec_id").as[Long].collect().toSet.map(assigned)
    assert(resultCids.size <= Similarity.NProbe,
      s"q39 results span ${resultCids.size} cells > NProbe=${Similarity.NProbe}")
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
