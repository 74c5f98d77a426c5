package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sinks.Export

/** The SURVEY §7.2 minimum slice over the reference's OWN fixture
  * (`/root/reference/src/main/resources/tweets.csv`, produced by its
  * `TwitterStreamDump` job). The fixture is genuinely dirty — several
  * rows lost their tab separators (space-joined id+text) — which makes
  * it a real-data exercise of the reference's #12 semantics: malformed
  * rows are silently dropped, valid rows flow through. */
class ReferenceFixtureSpec extends SparkSpec {

  private val fixture = "/root/reference/src/main/resources/tweets.csv"

  private def parsed = {
    val s = spark
    s.read.option("sep", "\t").option("header", "true").csv(fixture)
      .select(expr("try_cast(id AS LONG)").as("tweet_id"), col("text"),
        expr("try_cast(user__id AS LONG)").as("user_id"),
        col("user__screen_name").as("screen_name"))
  }

  test("dump slice: valid fixture rows project and export; dirty rows drop") {
    assume(Files.exists(Paths.get(fixture)))
    val s = spark
    val all = parsed
    assert(all.count() === 177) // 178 lines - header
    // #12 semantics: silently drop rows that failed to parse
    val valid = all.where(col("tweet_id").isNotNull && col("text").isNotNull &&
      col("screen_name").isNotNull)
    val dropped = all.count() - valid.count()
    assert(valid.count() > 150, s"only ${valid.count()} valid rows")
    assert(dropped > 0, "fixture is known to contain malformed rows")
    // the dump projection (J/TwitterStreamDump.java:50-66) + export
    val dump = valid.select(col("tweet_id"),
      regexp_replace(col("text"), "[\\n\\r]", " ").as("text"),
      col("user_id"), col("screen_name"))
    val out = Files.createTempDirectory("dump_out").toString
    Export.writeSingleTsv(dump, out, header = true)
    val back = s.read.option("sep", "\t").option("header", "true").csv(out)
    assert(back.count() === valid.count())
    val a = dump.select(col("tweet_id")).collect().map(_.getLong(0)).sorted
    val b = back.select(expr("try_cast(tweet_id AS LONG)")).collect()
      .map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("NEEL ingest + NER run over the real fixture tweets") {
    assume(Files.exists(Paths.get(fixture)))
    val s = spark
    val in = parsed
      .where(col("tweet_id").isNotNull && col("text").isNotNull &&
        col("screen_name").isNotNull)
      .select(col("tweet_id"), col("text"), col("user_id"),
        lit("u").as("user_name"), col("screen_name"),
        lit(null).cast("string").as("user_location"),
        col("text").startsWith("RT @").as("is_retweet"))
    val valid = operators.Neel.ingest(in)
    assert(valid.count() > 0)
    assert(valid.count() < in.count()) // fixture contains retweets
    // the NER/NEL stages run over real tweet text without error
    val linked = operators.Neel.nelLinked(operators.Neel.nerEntities(s, valid))
    assert(linked.count() >= 0)
  }
}
