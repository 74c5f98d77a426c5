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

  test("minhash estimates are within [0,1] and pairs are canonical") {
    val s = spark
    import s.implicits._
    val rows = Dedup.queries("q31_minhash_pairs")(s, sf)
      .select($"doc_a", $"doc_b", $"est_jaccard").as[(Long, Long, Double)]
      .collect()
    assert(rows.forall { case (a, b, e) => a < b && e >= 0.75 && e <= 1.0 })
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
}
