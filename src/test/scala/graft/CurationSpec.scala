package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the corpus-curation operators (q63-q66) beyond
  * the DuckDB oracle: invariants that must hold on ANY corpus, not
  * just value-equality on this one. */
class CurationSpec extends SparkSpec {

  private def run(name: String) =
    operators.Curation.queries(name)(spark, sf)

  test("q63: benchmark docs are excluded and an exact duplicate of a benchmark doc is contaminated") {
    val s = spark
    import s.implicits._
    val out = run("q63_decontaminate").cache()
    try {
      // no benchmark doc leaks into the scored set
      assert(out.where($"doc_id" % operators.Curation.BenchmarkMod === 0).count() === 0)
      // a train doc with text identical to a benchmark doc must share
      // all its shingles — if such a pair exists, it must be flagged
      val docs = Tables.documents(s, sf)
      val benchTexts = docs
        .where($"doc_id" % operators.Curation.BenchmarkMod === 0)
        .select($"text").distinct()
      val dupTrainIds = docs
        .where($"doc_id" % operators.Curation.BenchmarkMod =!= 0)
        .join(benchTexts, Seq("text"))
        // only docs long enough to have 5-gram shingles at all
        .where(size(split(trim($"text"), "\\s+")) >= 5)
        .select($"doc_id").as[Long].collect().toSet
      if (dupTrainIds.nonEmpty) {
        val flagged = out.where($"contaminated")
          .select($"doc_id").as[Long].collect().toSet
        assert(dupTrainIds.subsetOf(flagged),
          s"exact benchmark duplicates not flagged: ${dupTrainIds -- flagged}")
      }
    } finally out.unpersist()
  }

  test("q64: scrubbed text contains no residual PII and counts match injections") {
    val s = spark
    import s.implicits._
    val out = run("q64_pii_scrub").cache()
    try {
      val residual = out.where(
        regexp_count($"scrubbed", lit("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}")) > 0 ||
        regexp_count($"scrubbed", lit("\\+1-555-[0-9]{4}")) > 0 ||
        regexp_count($"scrubbed",
          lit("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}")) > 0 ||
        regexp_count($"scrubbed", lit("[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}")) > 0 ||
        regexp_count($"scrubbed", lit("[A-Z]{2}[0-9]{2}[A-Z0-9]{12}")) > 0).count()
      assert(residual === 0)
      // each injection slice got exactly its own PII kind, once
      assert(out.where($"doc_id" % 7 === 0 && ($"n_emails" =!= 1 || $"n_phones" =!= 1)).count() === 0)
      assert(out.where($"doc_id" % 7 === 3 && ($"n_emails" =!= 1 || $"n_phones" =!= 0)).count() === 0)
      assert(out.where($"doc_id" % 7 === 1 && $"n_ips" =!= 1).count() === 0)
      assert(out.where($"doc_id" % 7 === 5 && $"n_cards" =!= 1).count() === 0)
      assert(out.where($"doc_id" % 7 === 2 && $"n_ibans" =!= 1).count() === 0)
      // clean slices stay clean (no pattern cross-fires on corpus text)
      assert(out.where($"doc_id" % 7 === 4 &&
        ($"n_emails" + $"n_phones" + $"n_ips" + $"n_cards" + $"n_ibans") =!= 0)
        .count() === 0)
    } finally out.unpersist()
  }

  test("q85: split is leakage-safe (digest-keyed) with ~80/10/10 mass") {
    val s = spark
    import s.implicits._
    // force exact duplicates under DIFFERENT ids (the sf0.001 fixture
    // has none): an id-keyed split would scatter them across splits
    val docs = Tables.documents(s, sf).select($"doc_id", $"text")
    val dup = docs.union(docs.select($"doc_id" + 1000000, $"text"))
    val out = operators.Curation.splitAssign(dup).cache()
    try {
      val dupDigests = out.groupBy($"digest").count().where($"count" > 1)
      assert(dupDigests.count() > 0, "fixture has no duplicate content")
      // every digest lands in exactly one split: duplicated content
      // can never straddle train and eval
      val straddling = out.groupBy($"digest")
        .agg(countDistinct($"split").as("n_splits"))
        .where($"n_splits" > 1).count()
      assert(straddling === 0, "duplicate content straddles splits")
      // hash thresholds put ~80/10/10 of the DISTINCT content mass
      val byDigest = out.select($"digest", $"split").distinct()
      val n = byDigest.count().toDouble
      val frac = byDigest.groupBy($"split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1) / n).toMap
      assert(frac("train") > 0.72 && frac("train") < 0.88, s"train ${frac("train")}")
      assert(frac.getOrElse("val", 0.0) > 0.04 && frac("val") < 0.16, s"val ${frac.get("val")}")
      assert(frac.getOrElse("test", 0.0) > 0.04 && frac("test") < 0.16, s"test ${frac.get("test")}")
    } finally out.unpersist()
  }

  test("q65: fractions are in [0,1] and a constant-token doc maxes out") {
    val s = spark
    import s.implicits._
    val out = run("q65_repetition")
    val bad = out.where(
      $"frac_dup_tokens" < 0 || $"frac_dup_tokens" > 1 ||
      $"frac_dup_3grams" < 0 || $"frac_dup_3grams" > 1).count()
    assert(bad === 0)
    // synthetic corpus has heavy vocab reuse — some docs must be repetitive
    assert(out.where($"repetitive").count() > 0)
  }

  test("q63/q66 plan shape: benchmark grams and weights join broadcast, never shuffle the corpus by key") {
    def physical(name: String): String =
      run(name).queryExecution.executedPlan.toString
    val p63 = physical("q63_decontaminate")
    assert(p63.contains("BroadcastHashJoin"),
      "q63 must broadcast the benchmark gram set")
    assert(!p63.contains("SortMergeJoin"),
      "q63 must not sort-merge the corpus by shingle")
    val p66 = physical("q66_domain_mix")
    assert(p66.contains("BroadcastHashJoin"),
      "q66 must broadcast the per-source weight table")
    assert(!p66.contains("SortMergeJoin"),
      "q66 must not shuffle-join the corpus against 20 weight rows")
  }

  test("streaming decontamination: stream-static gram join equals batch q63 hits") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // static side: the benchmark shingle set, exactly as q63 builds it
    val toksE = operators.Tokens.toksExpr
    val docs = Tables.documents(s, sf)
      .withColumn("toks", expr(toksE))
      .withColumn("grams", operators.Curation.grams5(col("toks")))
    val bench = docs
      .where($"doc_id" % operators.Curation.BenchmarkMod === 0)
      .select(explode($"grams").as("gram")).distinct()
    // stream side: the train documents arrive as a stream (the 100 TB
    // streaming-ingest guise: stream-static broadcast join against the
    // eval set, per-doc aggregation in update-free complete mode)
    val mem = MemoryStream[(Long, String)]
    val hits = mem.toDS().toDF("doc_id", "text")
      .withColumn("toks", expr(toksE))
      .withColumn("grams", operators.Curation.grams5(col("toks")))
      .select($"doc_id", explode($"grams").as("gram"))
      .join(broadcast(bench), Seq("gram"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_hits"))
    val q = hits.writeStream.format("memory").queryName("deco_stream")
      .outputMode("complete").start()
    try {
      val train = docs.where($"doc_id" % operators.Curation.BenchmarkMod =!= 0)
        .select($"doc_id", $"text").as[(Long, String)].collect()
      // feed in two batches to cross a trigger boundary
      val (a, b) = train.splitAt(train.length / 2)
      mem.addData(a.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(b.toIndexedSeq)
      q.processAllAvailable()
      val streamed = s.table("deco_stream")
        .as[(Long, Long)].collect().toMap
      val batch = run("q63_decontaminate")
        .where($"n_hits" > 0)
        .select($"doc_id", $"n_hits").as[(Long, Long)].collect().toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("q84: the streaming curation pipeline keeps exactly the batch q81 set") {
    val s = spark
    import s.implicits._
    val streamed = operators.Curation.queries("q84_stream_curation")(s, sf)
      .as[(String, Long, Double, Double)].collect().toSet
    // q81 keys by doc_id; rekey its kept rows by content digest — the
    // unit the stream deduplicates on
    val batch = operators.Curation.queries("q81_curation_pipeline")(s, sf)
      .join(Tables.documents(s, sf).select($"doc_id", md5($"text").as("digest")),
        Seq("doc_id"))
      .select($"digest", $"n_toks", $"quality", $"frac_dup_3grams")
      .distinct()
      .as[(String, Long, Double, Double)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("q82: surprisal is positive, z-keep drops only outliers, empty docs dropped") {
    val s = spark
    import s.implicits._
    val out = run("q82_surprisal_filter").cache()
    try {
      assert(out.count() === Tables.documents(s, sf).count())
      // per-token negative logprob is > 0 (every term's corpus
      // probability < 1), so the per-doc mean must be too
      assert(out.where($"avg_surprisal".isNotNull &&
        $"avg_surprisal" <= 0).count() === 0)
      // a 2-sigma band keeps the vast majority — the filter flags the
      // tails, it doesn't decimate the corpus
      val n = out.count().toDouble
      val kept = out.where($"keep").count().toDouble
      assert(kept / n >= 0.75, s"z-keep kept only ${kept / n} of the corpus")
      assert(kept < n, "z-keep flagged nothing — degenerate on this corpus")
      // tokenless docs are never kept (no signal to judge them on)
      assert(out.where($"n_toks" === 0 && $"keep").count() === 0)
    } finally out.unpersist()
  }

  test("q83: substring-dup counts are bounded by windows and symmetric") {
    val s = spark
    import s.implicits._
    val out = operators.Dedup.queries("q83_substring_dup")(s, sf).cache()
    try {
      assert(out.count() === Tables.documents(s, sf).count())
      // shared windows can never exceed the doc's distinct window count
      assert(out.where($"n_shared" > $"n_windows").count() === 0)
      assert(out.where($"has_dup" =!= ($"n_shared" > 0)).count() === 0)
      // sharing is symmetric: a shared window implies >= 2 flagged docs
      val dups = out.where($"has_dup").count()
      assert(dups != 1, "exactly one doc flagged — sharing must be mutual")
    } finally out.unpersist()
  }

  test("q66: weights are in (0,1], every source appears once, kept <= docs") {
    val s = spark
    import s.implicits._
    val out = run("q66_domain_mix").cache()
    try {
      assert(out.where($"weight" <= 0 || $"weight" > 1).count() === 0)
      assert(out.select($"source").distinct().count() === out.count())
      assert(out.where($"n_kept" > $"n_docs").count() === 0)
      // the uniform target downsamples at least the most over-represented source
      val nSources = out.count()
      if (nSources > 1) assert(out.agg(min($"weight")).head.getDouble(0) <= 1.0)
    } finally out.unpersist()
  }
}
