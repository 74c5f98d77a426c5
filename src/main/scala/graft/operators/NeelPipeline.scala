package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The end-to-end NEEL pipeline as ONE composition: raw tweet-JSON
  * strings in, analysis-result JSON events out — the library entry
  * point a user of the reference switches to
  * (`J/TwitterStreamJob.java:211-376` end to end).
  *
  * Works identically on a batch DataFrame and a streaming DataFrame
  * (Kafka `value` column or file stream): every stage is a pure
  * column-expression transform.
  */
object NeelPipeline {

  /** The twitter4j subset the reference actually consumes
    * (SURVEY.md §7.3 step 1: fields read at
    * `J/NeelProcessedTweetWindowFunction.java:41-54`). */
  val tweetSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("retweeted", BooleanType),
    StructField("user", StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("screen_name", StringType),
      StructField("location", StringType))))))

  /** #12: permissive JSON parse + validity filter + retweet skip.
    * Invalid JSON yields a null struct -> silently dropped, exactly
    * like the reference's catch-and-skip flatMap. */
  def parseTweets(raw: DataFrame, jsonCol: String = "value",
      skipRetweets: Boolean = true): DataFrame = {
    val parsed = raw
      .withColumn("t", from_json(col(jsonCol), tweetSchema))
      .where(col("t").isNotNull && col("t.id") > 0 &&
        length(col("t.text")) > 0)
      .select(
        col("t.id").as("tweet_id"),
        col("t.text").as("text"),
        col("t.user.id").as("user_id"),
        col("t.user.name").as("user_name"),
        col("t.user.screen_name").as("screen_name"),
        col("t.user.location").as("user_location"),
        coalesce(col("t.retweeted"), lit(false)).as("is_retweet"))
    if (skipRetweets) parsed.where(!col("is_retweet")) else parsed
  }

  /** #30: wrap assembled per-tweet results as
    * `AnalysisResultProducedEvent` JSON (processDate is a parameter,
    * not `now()`, so outputs are replayable/idempotent — documented
    * divergence from the reference's wall-clock stamp). */
  def resultEvents(processed: DataFrame, analysisId: String,
      processDate: String): DataFrame =
    processed
      .groupBy(col("tweet_id"))
      .agg(sort_array(collect_list(struct(
        col("pos_start").as("start"), col("pos_end").as("end"),
        when(col("is_nil"), col("nil_cluster")).otherwise(col("link")).as("uri"),
        col("confidence").as("confidence"),
        col("category").as("category")))).as("entities"))
      .select(col("tweet_id"), to_json(struct(
        lit(analysisId).as("analysisId"),
        lit(processDate).as("processDate"),
        struct(col("tweet_id").as("statusId"), col("entities")).as("payload")))
        .as("event_json"))

  /** Raw tweet JSON -> assembled result events, batch or streaming. */
  def run(s: SparkSession, rawTweets: DataFrame, analysisId: String,
      processDate: String): DataFrame = {
    val valid = parseTweets(rawTweets)
    val enriched = Neel.resolved(s, valid)
    resultEvents(enriched, analysisId, processDate)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The whole pipeline over JSON-serialized synthetic tweets:
    // to_json -> from_json (real #12 parse) -> NER/NEL/resolve ->
    // result events.
    "q28_pipeline_e2e" -> { (s, d) =>
      val raw = Neel.syntheticTweets(s, d).select(to_json(struct(
        col("tweet_id").as("id"), col("text"),
        col("is_retweet").as("retweeted"),
        struct(col("user_id").as("id"), col("user_name").as("name"),
          col("screen_name").as("screen_name"),
          col("user_location").as("location")).as("user"))).as("value"))
      run(s, raw, analysisId = "a1", processDate = "2026-01-01T00:00:00Z")
        .orderBy(col("tweet_id"))
    },
  )

  def oracle: Map[String, String] = Map(
    "q28_pipeline_e2e" -> (Neel.sqlPrefix +
      """, ents AS (
        |  SELECT tweet_id,
        |    list_sort(list(struct_pack(
        |      "start" := pos_start, "end" := pos_end,
        |      uri := CASE WHEN is_nil THEN nil_cluster ELSE link END,
        |      confidence := confidence, category := category))) AS entities
        |  FROM nel GROUP BY tweet_id)
        |SELECT tweet_id,
        |  to_json(struct_pack(analysisId := 'a1',
        |    processDate := '2026-01-01T00:00:00Z',
        |    payload := struct_pack(statusId := tweet_id, entities := entities)))
        |    AS event_json
        |FROM ents ORDER BY tweet_id""".stripMargin),
  )
}
