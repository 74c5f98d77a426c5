package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, Temporal, TextAnalysis}

/** Semantics + plan-shape checks for the dedup / similarity / text /
  * temporal modules. */
class OperatorsSpec extends SparkSpec {

  test("exact dedup partitions the corpus (copies sum to row count)") {
    val s = spark
    import s.implicits._
    val total = Tables.documents(s, sf).count()
    val agg = Dedup.queries("q30_dedup_exact")(s, sf)
      .agg(sum($"n_copies")).as[Long].head()
    assert(agg === total)
  }

  test("q123: char-level verify separates exact copies from token-set-equal scrambles") {
    val s = spark
    import s.implicits._
    // MinHash scores token SETS: a reversed-token rewrite of a document
    // has est_jaccard = 1.0 (identical distinct-token set → identical
    // signature) yet is a different document character-wise. The verify
    // stage must confirm the exact copy and REJECT the scramble — the
    // two-signal contract q123 exists for.
    val toks = (0 until 24).map(i => s"tok$i%02d".format(i))
    val base = toks.mkString(" ")
    val scrambled = toks.reverse.mkString(" ")
    val staging = java.nio.file.Files.createTempDirectory("q123_verify").toString
    try {
      Seq(
        (1L, base, "en", "crawl-a", base.length.toLong),
        (2L, scrambled, "en", "crawl-a", scrambled.length.toLong),
        (3L, base, "en", "crawl-b", base.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$staging/documents.parquet")
      val out = operators.Dedup.queries("q123_editdist_verify")(s, staging)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          (r.getDouble(2), r.getLong(3), r.getBoolean(5)))).toMap
      assert(out.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)),
        s"candidate set: ${out.keySet}")
      // every pair is token-set identical → est 1.0 (all are candidates)
      assert(out.values.forall(_._1 === 1.0))
      // exact copy: zero edits, confirmed
      assert(out((1L, 3L))._2 === 0L && out((1L, 3L))._3 === true)
      // scramble: far beyond the banded cutoff (a distance past
      // LevBand can never reach the sim bar) → sentinel -1, rejected
      assert(out((1L, 2L))._2 === -1L && out((1L, 2L))._3 === false)
      assert(out((2L, 3L))._3 === false)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(staging))
    }
  }

  test("q123 regime agreement: direct and contracted DP paths give identical verdicts") {
    val s = spark
    val conf = "spark.graft.editVerifyCloneFactor"
    def run(): Array[String] =
      operators.Dedup.queries("q123_editdist_verify")(s, sf)
        .collect().map(_.mkString("|")).sorted
    val prev = s.conf.getOption(conf)
    try {
      s.conf.set(conf, "1e9") // force DIRECT
      val direct = run()
      s.conf.set(conf, "0")   // force CONTRACTED
      val contracted = run()
      assert(direct.nonEmpty, "no candidate pairs — fixture rot?")
      assert(direct.sameElements(contracted),
        s"regime outputs differ: direct=${direct.length} rows, " +
          s"contracted=${contracted.length} rows")
    } finally {
      prev match {
        case Some(v) => s.conf.set(conf, v)
        case None => s.conf.unset(conf)
      }
    }
  }

  test("q108: near-dup cluster members never straddle splits, ~80/10/10 over clusters") {
    val s = spark
    import s.implicits._
    // force duplicate content under DIFFERENT ids (the sf0.001 fixture
    // has none): q85's content-hash split would keep these together
    // too, but q108's claim is stronger — whole NEAR-dup components
    // share a split — and the forced est=1.0 cliques exercise exactly
    // the cluster-inheritance path
    val staging = java.nio.file.Files.createTempDirectory("q108_split").toString
    try {
      val docs = Tables.documents(s, sf)
      docs.union(docs.withColumn("doc_id", $"doc_id" + 1000000L))
        .write.parquet(s"$staging/documents.parquet")
      val out = Dedup.queries("q108_cluster_split")(s, staging).cache()
      try {
        val multi = out.groupBy($"cluster_id").count().where($"count" > 1)
        assert(multi.count() > 0, "no multi-member clusters — fixture rot?")
        val straddling = out.groupBy($"cluster_id")
          .agg(countDistinct($"split").as("n_splits"))
          .where($"n_splits" > 1).count()
        assert(straddling === 0, "near-dup cluster straddles splits")
        // the byte thresholds target 80/10/10 of the CLUSTER mass
        val byCluster = out.select($"cluster_id", $"split").distinct()
        val n = byCluster.count().toDouble
        val frac = byCluster.groupBy($"split").count()
          .collect().map(r => r.getString(0) -> r.getLong(1) / n).toMap
        assert(frac("train") > 0.70 && frac("train") < 0.90, s"train $frac")
        assert(frac.getOrElse("val", 0.0) > 0.03 && frac("val") < 0.18, s"val $frac")
        assert(frac.getOrElse("test", 0.0) > 0.03 && frac("test") < 0.18, s"test $frac")
      } finally out.unpersist()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(staging))
  }

  test("q110: batch doc lowers and merges resident labels (quotient remap path)") {
    val s = spark
    import s.implicits._
    // constructed corpus: resident cluster {11, 21} (text A), resident
    // cluster {13, 23} (text B), singletons 30/12; batch doc 10 is an
    // exact copy of A, so the component {10, 11, 21} must relabel the
    // RESIDENT cluster to the batch id 10 — the broadcast-remap path —
    // while B's cluster and the singletons stay untouched
    val A = "alpha beta gamma delta epsilon zeta eta theta"
    val B = "one two three four five six seven eight"
    val C = "red green blue yellow purple orange black white"
    val D = "north south east west up down left right"
    val staging = java.nio.file.Files.createTempDirectory("q110_remap").toString
    try {
      Seq((11L, A), (21L, A), (13L, B), (23L, B), (30L, C), (12L, D),
          (10L, A))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length($"text").cast("long"))
        .write.parquet(s"$staging/documents.parquet")
      val out = Dedup.queries("q110_incremental_clusters")(s, staging)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === Map(10L -> 10L, 11L -> 10L, 21L -> 10L,
        13L -> 13L, 23L -> 13L, 30L -> 30L, 12L -> 12L), s"got $out")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(staging))
  }

  test("q117: feed-applied keep-list — merged cluster relabels to the batch id, " +
      "stale label excluded, untouched clusters pass through") {
    val s = spark
    import s.implicits._
    // q110's constructed corpus: the batch is {10, 30} (doc_id%10==0).
    // Batch doc 10 (copy of A) merges the resident cluster {11,21}
    // under the new label 10; batch doc 30 inserts as a touched
    // singleton. The consumer's keep-list must carry cluster 10
    // (3 members, touched), must NOT carry a stale row for the
    // merged-away label 11, and must pass the resident clusters 13/12
    // through untouched from the pre-batch state.
    val A = "alpha beta gamma delta epsilon zeta eta theta"
    val B = "one two three four five six seven eight"
    val C = "red green blue yellow purple orange black white"
    val D = "north south east west up down left right"
    val staging = java.nio.file.Files.createTempDirectory("q117_apply").toString
    try {
      Seq((11L, A), (21L, A), (13L, B), (23L, B), (30L, C), (12L, D),
          (10L, A))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length($"text").cast("long"))
        .write.parquet(s"$staging/documents.parquet")
      val out = Dedup.queries("q117_changefeed_apply")(s, staging)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getBoolean(3)))).toMap
      assert(out === Map(
        10L -> ((10L, 3L, true)),
        13L -> ((13L, 2L, false)),
        30L -> ((30L, 1L, true)),
        12L -> ((12L, 1L, false))), s"got $out")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(staging))
  }

  test("minhash estimates are within [0,1] and pairs are canonical") {
    val s = spark
    import s.implicits._
    val rows = Dedup.queries("q31_minhash_pairs")(s, sf)
      .select($"doc_a", $"doc_b", $"est_jaccard").as[(Long, Long, Double)]
      .collect()
    assert(rows.forall { case (a, b, e) => a < b && e >= 0.75 && e <= 1.0 })
  }

  test("int8 quantization reconstructs within half a scale step") {
    val s = spark
    import s.implicits._
    val bad = Tables.embeddings(s, sf)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("amax",
        expr("aggregate(v, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(x)))"))
      .withColumn("scale", $"amax" / lit(127.0))
      .withColumn("q", expr(
        "transform(v, x -> CAST(floor(CASE WHEN scale = 0.0 THEN 0.0 " +
          "ELSE x / scale END + 0.5) AS INT))"))
      .withColumn("max_err", expr(
        "aggregate(zip_with(v, q, (x, qq) -> abs(x - qq * scale)), " +
          "CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, x))"))
      .where($"max_err" > $"scale" * 0.5000001).count()
    assert(bad === 0)
  }

  test("simhash fingerprints are 16-bit") {
    val s = spark
    import s.implicits._
    val bad = Dedup.queries("q32_simhash")(s, sf)
      .filter($"simhash" < 0 || $"simhash" > 0xFFFF).count()
    assert(bad === 0)
  }

  test("ANN top-1 never beats brute-force top-1") {
    val s = spark
    import s.implicits._
    val brute = Similarity.queries("q36_knn_brute")(s, sf)
      .select($"cos").as[Double].collect()
    val ann = Similarity.queries("q37_ann_lsh")(s, sf)
      .select($"cos").as[Double].collect()
    assert(ann.nonEmpty && brute.nonEmpty)
    assert(ann.max <= brute.max + 1e-9)
    // every ANN hit is a real corpus vector the brute-force ranking knows
    assert(ann.forall(c => c <= brute.max))
  }

  test("ANN recall@10 vs brute force is >= 0.7 for both LSH and IVF") {
    val s = spark
    import s.implicits._
    val brute = Similarity.queries("q36_knn_brute")(s, sf)
      .select($"vec_id").as[Long].collect().toSet
    for (q <- Seq("q37_ann_lsh", "q39_ann_ivf", "q88_ann_ivf_hier")) {
      val ann = Similarity.queries(q)(s, sf)
        .select($"vec_id").as[Long].collect().toSet
      val recall = (ann & brute).size.toDouble / brute.size
      info(s"$q recall@10 = $recall")
      assert(recall >= 0.7, s"$q recall@10 $recall < 0.7")
    }
  }

  test("q89 PQ: ADC top-10 overlaps exact L2 top-10; reconstruction error sane") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, sf)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    val q = e.where($"vec_id" === 0).select($"v".as("qv"))
    val exact = e.where($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id",
        graft.functions.VectorFunctions.l2sq($"v", $"qv").as("d"))
      .orderBy($"d", $"vec_id").limit(10)
      .select($"vec_id").as[Long].collect().toSet
    val adc = Similarity.queries("q89b_pq_adc_topk")(s, sf)
      .select($"vec_id").as[Long].collect().toSet
    val recall = (adc & exact).size / 10.0
    info(s"PQ ADC recall@10 vs exact L2 = $recall")
    // 8-bit PQ with no residual refinement on near-random synthetic
    // vectors — the coarsest ANN tier; IVF-PQ/OPQ raise this in a
    // real lake, the gate here is "the approximation is real, not
    // noise" (random top-10 overlap would be ~0.02)
    assert(recall >= 0.4, s"PQ ADC recall@10 $recall < 0.4")
    val enc = Similarity.queries("q89_pq_encode")(s, sf)
    assert(enc.where($"recon_err" < 0).count() === 0)
    // 8-bit codes: both halves fit in 32 bits
    assert(enc.where($"pq_code_lo" < 0 || $"pq_code_lo" > 4294967295L ||
      $"pq_code_hi" < 0 || $"pq_code_hi" > 4294967295L).count() === 0)
  }

  test("q91 IVF-PQ: residual encoding beats raw PQ; ADC recall at least matches") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, sf)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    val q = e.where($"vec_id" === 0).select($"v".as("qv"))
    val exact = e.where($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id",
        graft.functions.VectorFunctions.l2sq($"v", $"qv").as("d"))
      .orderBy($"d", $"vec_id").limit(10)
      .select($"vec_id").as[Long].collect().toSet
    val ivfpq = Similarity.queries("q91_ivfpq_adc_topk")(s, sf)
      .select($"vec_id").as[Long].collect().toSet
    val recall = (ivfpq & exact).size / 10.0
    info(s"IVF-PQ ADC recall@10 vs exact L2 = $recall")
    assert(recall >= 0.4, s"IVF-PQ ADC recall@10 $recall < 0.4")
    // the reason residual PQ exists: the same codebook budget spent
    // on residuals (concentrated near the origin) reconstructs
    // strictly better than on raw vectors, corpus-wide
    val rawErr = Similarity.queries("q89_pq_encode")(s, sf)
      .agg(sum($"recon_err")).as[Double].head()
    val (_, encoded) = Similarity.ivfPqModel(s, sf)
    val residErr = encoded
      .agg(sum($"dist".cast("decimal(18,6)")).cast("double")).as[Double].head()
    info(s"total recon err: raw PQ $rawErr, IVF-PQ residual $residErr")
    assert(residErr >= 0, "negative residual reconstruction error")
    assert(residErr < rawErr,
      s"residual PQ ($residErr) should beat raw PQ ($rawErr)")
  }

  test("as-of join only matches at-or-before timestamps, same user") {
    val s = spark
    import s.implicits._
    val out = Temporal.queries("q52_asof_join")(s, sf)
    val bad = out.filter($"asof_ts".isNotNull && $"asof_ts" > $"ts").count()
    assert(bad === 0)
    // every click row is preserved (left join semantics)
    val clicks = Tables.events(s, sf).filter($"event_type" === "click").count()
    assert(out.count() === clicks)
  }

  test("as-of join plan has no cartesian/broadcast-nested-loop") {
    val plan = Temporal.queries("q52_asof_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian in as-of plan")
    assert(!plan.contains("BroadcastNestedLoop"), "BNLJ in as-of plan")
  }

  test("range join is a binned equi-join: no cartesian/BNLJ, matches are in-interval") {
    val s = spark
    import s.implicits._
    val q = Temporal.queries("q67_range_join")(s, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian in range-join plan")
    // the corpus-side join must be hash on the bucket key; the only
    // nested-loop allowed is the 1-row bounds broadcast
    assert(plan.contains("BroadcastHashJoin"), "bucket equi-join missing")
    // every event matches >= 1 campaign except possibly boundary rows,
    // and no event matches more than the 2 overlapping windows + 1
    val perEvent = q.groupBy($"event_id").count()
    assert(perEvent.filter($"count" > 3).count() === 0)
    assert(q.count() > Tables.events(s, sf).count(),
      "overlapping windows should multiply matches")
  }

  test("sessionization covers every event exactly once") {
    val s = spark
    import s.implicits._
    val total = Tables.events(s, sf).count()
    val inSessions = Temporal.queries("q51_sessionize")(s, sf)
      .agg(sum($"n_events")).as[Long].head()
    assert(inSessions === total)
    val negDur = Temporal.queries("q51_sessionize")(s, sf)
      .filter($"duration_sec" < 0).count()
    assert(negDur === 0)
  }

  test("window aggregation counts cover every event") {
    val s = spark
    import s.implicits._
    val total = Tables.events(s, sf).count()
    val inWindows = Temporal.queries("q50_window_agg")(s, sf)
      .agg(sum($"n")).as[Long].head()
    assert(inWindows === total)
  }

  test("every minhash near-dup pair lands in one duplicate cluster") {
    val s = spark
    import s.implicits._
    val cluster = Dedup.queries("q35_dup_clusters")(s, sf)
      .as[(Long, Long)].collect().toMap
    val pairs = Dedup.queries("q31_minhash_pairs")(s, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(cluster(a) === cluster(b), s"pair ($a,$b) split across clusters")
    }
    // labels are component minima: never above the doc id
    cluster.foreach { case (doc, c) => assert(c <= doc) }
  }

  test("ngram jaccard is within [0,1] on canonical pairs") {
    val s = spark
    import s.implicits._
    val rows = Dedup.queries("q34_ngram_jaccard")(s, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.forall { case (a, b, j) => a < b && j >= 0.0 && j <= 1.0 })
  }

  test("stratified sampling respects per-language keep rates") {
    val s = spark
    import s.implicits._
    val totals = Tables.documents(s, sf).groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val kept = operators.Relational.queries("q19_stratified_sample")(s, sf)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val expected = Map("en" -> 0.80, "de" -> 0.50, "es" -> 0.25,
      "fr" -> 0.25, "zh" -> 0.10)
    expected.foreach { case (lang, rate) =>
      val n = totals(lang)
      val k = kept.getOrElse(lang, 0L).toDouble
      // ±4σ binomial tolerance at these sample sizes
      val tol = 4 * math.sqrt(n * rate * (1 - rate)) + 1
      assert(math.abs(k - n * rate) <= tol,
        s"$lang keep rate ${k / n} vs target $rate (n=$n)")
    }
  }

  test("sliding windows count every event exactly twice") {
    val s = spark
    import s.implicits._
    val total = Tables.events(s, sf).count()
    val inWindows = Temporal.queries("q53_sliding_window")(s, sf)
      .agg(sum($"n")).as[Long].head()
    assert(inWindows === 2 * total)
  }

  test("lag analytics preserves rows and orders gaps non-negatively") {
    val s = spark
    import s.implicits._
    val out = Temporal.queries("q54_lag_analytics")(s, sf)
    assert(out.count() === Tables.events(s, sf).count())
    assert(out.filter($"gap_sec" < 0).count() === 0)
  }

  test("sketch stats track exact percentiles and distincts") {
    val s = spark
    import s.implicits._
    // exact order-statistic brackets per type: the sampled estimators
    // are order statistics of a fixed ~25% subset, so bound them by
    // exact quantile ranges rather than distances (robust at the tiny
    // test SF where the per-group sample is ~50 rows)
    val brackets = Tables.events(s, sf).groupBy($"event_type")
      .agg(expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.75)").as("p75"),
        expr("percentile(value, 0.9)").as("p90"),
        org.apache.spark.sql.functions.max($"value").as("vmax"),
        countDistinct($"user_id").as("nd"))
      .as[(String, Double, Double, Double, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    val sketch = Temporal.queries("q55b_sketch_stats")(s, sf)
      .select($"event_type", $"p50_est", $"p99_est", $"users_est", $"n_sample", $"n")
      .as[(String, Double, Double, Long, Long, Long)].collect()
    assert(sketch.nonEmpty)
    sketch.foreach { case (t, p50e, p99e, usersEst, nSample, n) =>
      val (_, p25, p75, p90, vmax, nd) = brackets(t)
      assert(p50e >= p25 && p50e <= p75, s"$t p50_est=$p50e not in [$p25,$p75]")
      assert(p99e >= p90 && p99e <= vmax, s"$t p99_est=$p99e not in [$p90,$vmax]")
      // KMV k=64: ~13% std error above k distinct; exact below k
      assert(math.abs(usersEst - nd).toDouble / nd <= 0.4,
        s"$t users_est=$usersEst exact=$nd")
      assert(nSample > 0 && nSample < n, s"$t sample $nSample of $n")
    }
    // the engine-native sketches (approx_percentile + HLL) remain the
    // production one-liners; their error is engine-specific and not
    // oracle-expressible, so it is bounded here instead
    val native = Tables.events(s, sf).groupBy($"event_type")
      .agg(expr("approx_percentile(value, 0.5, 10000)").as("p50a"),
        approx_count_distinct($"user_id").as("ua"))
      .as[(String, Double, Long)].collect()
    native.foreach { case (t, p50a, ua) =>
      val (_, p25, p75, _, _, nd) = brackets(t)
      assert(p50a >= p25 && p50a <= p75, s"$t native p50=$p50a")
      assert(math.abs(ua - nd).toDouble / nd <= 0.1, s"$t native users=$ua exact=$nd")
    }
  }

  test("pagerank mass stays positive and bounded") {
    val s = spark
    import s.implicits._
    val pr = Dedup.queries("q37g_pagerank")(s, sf)
      .select($"pr").as[Double].collect()
    assert(pr.forall(p => p > 0 && p < 1.0))
    // total mass can leak via isolated nodes but never exceeds 1 + eps
    assert(pr.sum <= 1.0 + 1e-6, s"mass=${pr.sum}")
  }

  test("bm25 results are rank-ordered and every hit matched a term") {
    val s = spark
    import s.implicits._
    val rows = TextAnalysis.queries("q48_bm25_search")(s, sf)
      .select($"bm25", $"n_matched").as[(Double, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.sliding(2).forall {
      case Array(a, b) => a._1 >= b._1; case _ => true })
    assert(rows.forall(_._2 >= 1))
  }

  test("funnel stages are consistent with their timestamps") {
    val s = spark
    import s.implicits._
    val rows = Temporal.queries("q59_funnel")(s, sf).collect()
    rows.foreach { r =>
      val stage = r.getInt(4)
      val tClick = Option(r.getTimestamp(2))
      val tPurch = Option(r.getTimestamp(3))
      assert((stage >= 2) === tClick.isDefined, s"row $r")
      assert((stage == 3) === tPurch.isDefined, s"row $r")
      for (c <- tClick) assert(c.after(r.getTimestamp(1)))
      for (p <- tPurch; c <- tClick) assert(p.after(c))
    }
  }

  test("tf-idf of a corpus-universal term is zero") {
    val s = spark
    import s.implicits._
    // any term present in EVERY doc has idf = ln(1) = 0
    val universal = TextAnalysis.queries("q47_tfidf")(s, sf)
      .groupBy($"term").agg(
        org.apache.spark.sql.functions.countDistinct($"doc_id").as("nd"),
        org.apache.spark.sql.functions.max($"tfidf").as("mx"))
      .join(Tables.documents(s, sf).agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n")))
      .where($"nd" === $"n")
    assert(universal.where($"mx" =!= 0.0).count() === 0)
  }

  test("language ID always predicts a profile language") {
    val s = spark
    import s.implicits._
    val langs = TextAnalysis.profiles.map(_._1).toSet
    val preds = TextAnalysis.queries("q40_lang_id")(s, sf)
      .select($"predicted_lang").distinct().as[String].collect().toSet
    assert(preds.subsetOf(langs), s"unexpected predictions: ${preds.diff(langs)}")
  }

  test("quality score stays in [0,1]") {
    val s = spark
    import s.implicits._
    val bad = TextAnalysis.queries("q41_quality")(s, sf)
      .filter($"quality" < 0 || $"quality" > 1).count()
    assert(bad === 0)
  }

  test("fingerprint digests are md5-shaped and stable across runs") {
    val s = spark
    import s.implicits._
    val fp1 = TextAnalysis.queries("q43_fingerprint")(s, sf).collect()
    val fp2 = TextAnalysis.queries("q43_fingerprint")(s, sf).collect()
    assert(fp1.sameElements(fp2))
    assert(fp1.forall(r => r.getString(1).length == 32 && r.getString(2).length == 32))
  }

  test("q96 hard negatives: labels always differ, ranks contiguous, no same-label leak-through") {
    val s = spark
    import s.implicits._
    val rows = Similarity.queries("q96_hard_negatives")(s, sf)
      .select($"vec_id", $"label", $"hn_rank", $"neg_id", $"neg_label", $"cos")
      .as[(Long, Int, Int, Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, l, _, _, nl, _) => l != nl },
      "a hard negative shares its anchor's label")
    // per anchor: ranks are 1..n with cos non-increasing
    rows.groupBy(_._1).foreach { case (anchor, rs) =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to rs.length),
        s"anchor $anchor ranks not contiguous")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._6 >= b._6
        case _ => true
      }, s"anchor $anchor cos not non-increasing by rank")
    }
  }

  test("q98 chunk near-dup: pairs are cross-doc canonical, est at-or-above threshold") {
    val s = spark
    import s.implicits._
    val rows = Dedup.queries("q98_chunk_neardup")(s, sf)
      .select($"doc_a", $"chunk_a", $"doc_b", $"chunk_b", $"est_jaccard")
      .as[(Long, Int, Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, _, b, _, _) => a < b },
      "pair not canonical or not cross-document")
    assert(rows.forall { case (_, ca, _, cb, e) =>
      ca >= 0 && cb >= 0 && e >= Dedup.EstThreshold && e <= 1.0 })
    // no pair is reported twice (the first-collision-band rule, not
    // a distinct, is what dedups the band legs)
    val keys = rows.map(r => (r._1, r._2, r._3, r._4))
    assert(keys.distinct.length == keys.length, "band legs double-report a pair")
  }

  test("q97 hybrid search: rrf recomputes from ranks, at least one leg per row, sorted") {
    val s = spark
    import s.implicits._
    val rows = Similarity.queries("q97_hybrid_search")(s, sf)
      .select($"doc_id", $"bm25_rank", $"cos_rank", $"rrf")
      .as[(Long, Option[Int], Option[Int], Double)].collect()
    assert(rows.nonEmpty && rows.length <= Similarity.HybridK)
    rows.foreach { case (id, bm, cs, rrf) =>
      assert(bm.isDefined || cs.isDefined, s"doc $id matched neither leg")
      val expect = BigDecimal(
        bm.map(r => 1.0 / (Similarity.RrfC + r)).getOrElse(0.0) +
          cs.map(r => 1.0 / (Similarity.RrfC + r)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rrf - expect) < 1e-9, s"doc $id rrf $rrf != $expect")
      bm.foreach(r => assert(r >= 1 && r <= Similarity.HybridM))
      cs.foreach(r => assert(r >= 1 && r <= Similarity.HybridM))
    }
    assert(rows.map(_._4).toSeq == rows.map(_._4).sortBy(-_).toSeq,
      "fused list not sorted by rrf desc")
  }

  test("events loader is physical-layout invariant (nanos long / µs NTZ / µs UTC)") {
    // The driver has shipped two physical encodings of events.ts so
    // far (TIMESTAMP(NANOS) → long under nanosAsLong; TIMESTAMP(MICROS)
    // NTZ); normalizeEvents must make them — and the plain UTC micros
    // layout — indistinguishable downstream. Write the SAME logical
    // rows in all three layouts and require q50's windowed aggregation
    // to be row-identical across them.
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("events_layouts")
    val base = Tables.events(s, sf).limit(500)
      .select($"event_id", $"ts_ns", $"user_id", $"event_type", $"value", $"props")
    // (a) nanos-as-long: what the legacy nanosAsLong read path yields
    base.withColumnRenamed("ts_ns", "ts")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$tmp/nanos/events.parquet")
    // (b) µs NTZ: the current driver layout (isAdjustedToUTC=false)
    base.withColumn("ts",
        expr("CAST(timestamp_micros(ts_ns DIV 1000) AS TIMESTAMP_NTZ)"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$tmp/ntz/events.parquet")
    // (c) µs UTC-adjusted: the third plausible future layout
    base.withColumn("ts", expr("timestamp_micros(ts_ns DIV 1000)"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$tmp/utc/events.parquet")
    def agg(dir: String): Seq[(java.sql.Timestamp, String, Long, String)] =
      Tables.events(s, s"$tmp/$dir")
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        // decimal sum: 500 ns-epoch longs overflow a LongType sum
        .agg(count(lit(1)).as("n"),
          sum($"ts_ns".cast("decimal(38,0)")).cast("string").as("sum_ns"))
        .select($"w.start", $"event_type", $"n", $"sum_ns")
        .as[(java.sql.Timestamp, String, Long, String)]
        .collect().sortBy(r => (r._1.getTime, r._2)).toSeq
    val (a, b, c) = (agg("nanos"), agg("ntz"), agg("utc"))
    assert(a.nonEmpty && a == b && b == c,
      s"layout-dependent results: nanos=${a.take(2)} ntz=${b.take(2)} utc=${c.take(2)}")
    Fs.deleteRecursively(tmp.toString)
  }

  test("minLabelComponents: local union-find and distributed loop agree " +
      "on the same graph (regime boundary)") {
    val s = spark
    import s.implicits._
    // chains (diameter > 1), a clique, isolated nodes, and a
    // cross-component bridge — every structural case the two regimes
    // could diverge on
    val pairs = Seq(
      (5L, 3L), (3L, 9L), (9L, 7L),           // chain: min 3
      (20L, 21L), (21L, 22L), (20L, 22L),     // clique: min 20
      (40L, 41L), (41L, 30L),                 // bridge lowers 40s to 30
      (100L, 50L)).toDF("pa", "pb")
    val nodes = ((1L to 9L) ++ Seq(20L, 21L, 22L, 30L, 40L, 41L, 50L, 100L)
      ).toDF("node")
    def run(): Map[Long, Long] = {
      val out = graft.operators.Dedup.minLabelComponents(pairs, nodes)
      val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.Materialize.release(out)
      got
    }
    val local = run() // 9 pairs — far under the default threshold
    s.conf.set("spark.graft.localComponentsMaxPairs", "0")
    val looped = try run()
      finally s.conf.unset("spark.graft.localComponentsMaxPairs")
    assert(local === looped,
      s"regimes disagree: local=$local loop=$looped")
    assert(local(5L) == 3L && local(7L) == 3L && local(22L) == 20L &&
      local(40L) == 30L && local(41L) == 30L && local(100L) == 50L &&
      local(1L) == 1L && local(2L) == 2L,
      s"wrong labeling: $local")
  }

  test("q111s: cross-batch double-touch — a cluster losing members in two " +
      "micro-batches (min in the later one) composes to the one-shot retire") {
    val s = spark
    import s.implicits._
    // residents; retention slice is %17 == 3, batch = doc_id%3 + 1:
    //  {29, 46} text A — untouched cluster 29
    //  {37, 39, 54, 56} text B, label 37 — 54 retires in batch 1
    //    (cluster keeps min 37), then 37 retires in batch 2 (the
    //    CURRENT min leaves a cluster already re-solved once →
    //    survivors {39, 56} must relabel to 39)
    //  {71} text D singleton — retires in batch 3, vanishes
    val A = "alpha beta gamma delta epsilon zeta eta theta"
    val B = "one two three four five six seven eight"
    val D = "north south east west up down left right"
    val staging = java.nio.file.Files.createTempDirectory("q111s_ret").toString
    try {
      Seq((29L, A), (46L, A), (37L, B), (39L, B), (54L, B), (56L, B),
          (71L, D))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length($"text").cast("long"))
        .write.parquet(s"$staging/documents.parquet")
      val out = Dedup.queries("q111s_stream_retire")(s, staging)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === Map(29L -> 29L, 46L -> 29L, 39L -> 39L, 56L -> 39L),
        s"got $out")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(staging))
  }

  test("q111: retiring a cluster's min member relabels survivors; " +
      "retired docs and retired singletons leave the state") {
    val s = spark
    import s.implicits._
    // residents (%10 != 0); the retention slice is %17 == 3:
    //  {29, 46} text A — no retired member, cluster 29 untouched
    //  {37, 39, 56} text B — 37 (%17==3) retires AND was the min, so
    //    survivors {39, 56} must relabel to 39
    //  {105} text C singleton — retires, vanishes entirely
    val A = "alpha beta gamma delta epsilon zeta eta theta"
    val B = "one two three four five six seven eight"
    val C = "north south east west up down left right"
    val staging = java.nio.file.Files.createTempDirectory("q111_ret").toString
    try {
      Seq((29L, A), (46L, A), (37L, B), (39L, B), (56L, B), (105L, C))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length($"text").cast("long"))
        .write.parquet(s"$staging/documents.parquet")
      val out = Dedup.queries("q111_cluster_retire")(s, staging)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === Map(29L -> 29L, 46L -> 29L, 39L -> 39L, 56L -> 39L),
        s"got $out")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(staging))
  }

  test("q111 survivor restriction: broadcast and shuffle semi-join " +
      "regimes agree on the same retire (regime boundary)") {
    // the retire path's survivor set is usually batch-sized (broadcast
    // regime), but a mega-cluster retirement makes it cluster-sized —
    // survivorPairs then degrades to shuffle semi-joins instead of an
    // unconditional driver-OOM broadcast hint. Force both regimes on
    // one fixture and assert identical labelings.
    val s = spark
    import s.implicits._
    val A = "alpha beta gamma delta epsilon zeta eta theta"
    val B = "one two three four five six seven eight"
    val C = "north south east west up down left right"
    val staging = java.nio.file.Files.createTempDirectory("q111_reg").toString
    try {
      Seq((29L, A), (46L, A), (37L, B), (39L, B), (56L, B), (105L, C))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length($"text").cast("long"))
        .write.parquet(s"$staging/documents.parquet")
      def run(): Map[Long, Long] =
        Dedup.queries("q111_cluster_retire")(s, staging)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaBroadcast = run() // 4 survivors — far under the default bound
      s.conf.set("spark.graft.survivorBroadcastMaxRows", "0")
      val viaShuffle = try run()
        finally s.conf.unset("spark.graft.survivorBroadcastMaxRows")
      assert(viaBroadcast === viaShuffle,
        s"regimes disagree: broadcast=$viaBroadcast shuffle=$viaShuffle")
      assert(viaBroadcast === Map(29L -> 29L, 46L -> 29L, 39L -> 39L,
        56L -> 39L), s"got $viaBroadcast")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(staging))
  }
}
