package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's RPC/export serialization surface re-expressed
  * relationally (SURVEY.md §2.5 #23-28, §2.7 #33-34/#37):
  * micro-batch request building with chunking, challenge-format TSV
  * line rendering, and the nested JSON result export.
  *
  * The reference batches requests in parallelism-1 processing-time
  * windows (`timeWindowAll(3s)`) and chunks geo requests at 15
  * items (`J/request/AbstractRequestMessageBuilder.java:32-42`,
  * `J/TwitterStreamJob.java:300`). Here batching is expressed over a
  * deterministic key order so it is oracle-checkable; the numbering
  * uses range partitioning + per-partition offsets (the zipWithIndex
  * shape), so no single-partition window exists even in the batch
  * guise. In streaming deployment the same transform runs per
  * micro-batch (the micro-batch IS the 3 s window — SURVEY §2 #23).
  */
object Requests {

  /** Reference geo-chunking constant (15 items per request). */
  val MaxItemsPerRequest = 15

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // #23/#24/#27: batch NER requests, chunked at 15 tweets each, one
    // JSON request payload per chunk.
    "q60_request_batches" -> { (s, d) =>
      import s.implicits._
      val valid = Neel.ingest(Neel.syntheticTweets(s, d))
        .select(col("tweet_id"), col("text"))
      // Scalable deterministic numbering (the zipWithIndex shape):
      // range-partition by the order key, rank within each partition,
      // then add per-partition offsets. Range partitioning preserves
      // global order across partitions, so offset + local rank EQUALS
      // a global `row_number() OVER (ORDER BY tweet_id)` — without
      // funneling the whole relation through a single partition. The
      // offsets pass collects one count per partition (exactly what
      // RDD.zipWithIndex does). The frame is MATERIALIZED once and
      // both jobs (counts, numbering) read the same blocks: a
      // re-executed repartitionByRange draws its boundary sample with
      // a seed derived from the per-execution rdd id, so pids would
      // NOT be stable across two separate executions once the sampler
      // actually subsamples (large partitions) — RDD.zipWithIndex
      // avoids that by running both passes on one RDD, and the
      // materialization restores exactly that property here.
      val parts = graft.Materialize.cut(
        valid.repartitionByRange(col("tweet_id"))
          .withColumn("pid", spark_partition_id()))
      val localW = Window.partitionBy(col("pid")).orderBy(col("tweet_id"))
      val counts = parts.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("pid"))
        .as[(Int, Long)].collect()
      var acc = 0L
      val offsets = counts.map { case (pid, cnt) =>
        val o = (pid, acc); acc += cnt; o
      }.toSeq
      parts
        .join(broadcast(offsets.toDF("pid", "offset")), Seq("pid"))
        .withColumn("chunk",
          floor((col("offset") + row_number().over(localW) - 1) / MaxItemsPerRequest)
            .cast("long"))
        .groupBy(col("chunk"))
        .agg(count(lit(1)).as("n_items"),
          to_json(sort_array(collect_list(
            struct(col("tweet_id").as("tag"), col("text").as("text")))))
            .as("payload_json"))
        .withColumn("request_id", concat(lit("req-"), col("chunk")))
        .select(col("chunk"), col("request_id"), col("n_items"), col("payload_json"))
        .orderBy(col("chunk"))
    },

    // #33/#34: challenge rows rendered as TSV lines.
    "q61_challenge_tsv" -> { (s, d) =>
      Neel.queries("q23_neel_challenge")(s, d)
        .select(concat_ws("\t",
          col("tweet_id"), col("pos_start"), col("pos_end"),
          col("resource_uri"),
          format_string("%.3f", col("confidence")),
          col("category")).as("line"))
        .orderBy(col("line"))
    },

    // #21 re-nest + #37: per-tweet nested JSON result payload
    // (entities re-aggregated into an ordered array).
    "q62_json_export" -> { (s, d) =>
      Neel.queries("q23_neel_challenge")(s, d)
        .groupBy(col("tweet_id"))
        .agg(to_json(struct(
          col("tweet_id").as("id"),
          sort_array(collect_list(struct(
            col("pos_start").as("start"), col("pos_end").as("end"),
            col("resource_uri").as("uri")))).as("entities")))
          .as("payload_json"))
        .select(col("tweet_id"), col("payload_json"))
        .orderBy(col("tweet_id"))
    },
  )

  def oracle: Map[String, String] = Map(
    "q60_request_batches" -> (Neel.sqlPrefix +
      s""", numbered AS (
         |  SELECT tweet_id, text,
         |    CAST(floor((row_number() OVER (ORDER BY tweet_id) - 1) / $MaxItemsPerRequest.0) AS BIGINT) AS chunk
         |  FROM valid)
         |SELECT chunk, 'req-' || chunk AS request_id,
         |  count(*) AS n_items,
         |  to_json(list_sort(list(struct_pack(tag := tweet_id, text := text)))) AS payload_json
         |FROM numbered GROUP BY chunk ORDER BY chunk""".stripMargin),
    "q61_challenge_tsv" -> (Neel.sqlPrefix +
      """SELECT concat_ws(chr(9), tweet_id, pos_start, pos_end,
        |  CASE WHEN is_nil THEN nil_cluster ELSE link END,
        |  printf('%.3f', confidence), category) AS line
        |FROM nel ORDER BY line""".stripMargin),
    "q62_json_export" -> (Neel.sqlPrefix +
      """, ch AS (
        |  SELECT tweet_id, pos_start, pos_end,
        |    CASE WHEN is_nil THEN nil_cluster ELSE link END AS resource_uri
        |  FROM nel)
        |SELECT tweet_id,
        |  to_json(struct_pack(id := tweet_id,
        |    entities := list_sort(list(struct_pack(
        |      "start" := pos_start, "end" := pos_end, uri := resource_uri)))))
        |    AS payload_json
        |FROM ch GROUP BY tweet_id ORDER BY tweet_id""".stripMargin),
  )
}
