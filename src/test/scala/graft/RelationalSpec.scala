package graft

import graft.operators.{Neel, Relational}

/** Plan-quality and semantics checks for the relational surface. */
class RelationalSpec extends SparkSpec {

  test("all queries run and return rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
      // every query except anti-join should be non-empty at sf0.001
      if (name != "q07_anti_join") assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has an oracle entry with matching column names expected") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle without query: ${os.diff(qs)}")
  }

  test("q02 pushes filter and projection into the parquet scan") {
    val plan = Relational.queries("q02_filter_project")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), "no pushed filters in scan")
    assert(plan.contains("l_returnflag"), "filter column missing from scan")
    // projection pruning: unneeded wide columns must not be read
    assert(!plan.contains("l_extendedprice"),
      "scan reads columns the query never uses")
  }

  test("q03 plans a broadcast hash join") {
    val plan = Relational.queries("q03_broadcast_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("q01 uses partial (map-side) aggregation") {
    val plan = Relational.queries("q01_pricing_summary")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan.take(500))
  }

  test("NER entity values equal the dictionary terms (substring backfill)") {
    val s = spark
    import s.implicits._
    val bad = Neel.resolved(s, Neel.ingest(Neel.syntheticTweets(s, sf)))
      .filter($"value" =!= $"term")
    assert(bad.count() === 0)
  }

  test("ingest drops retweets and empty texts") {
    val s = spark
    import s.implicits._
    val in = Neel.syntheticTweets(s, sf)
    val out = Neel.ingest(in)
    assert(out.filter($"is_retweet").count() === 0)
    assert(out.filter(length($"text") === 0).count() === 0)
    val kept = Neel.ingest(in, skipRetweets = false)
    assert(kept.count() >= out.count())
  }

  private def length(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.length(c)
}
