package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Neel
import graft.streaming.Payloads

/** Kafka payload contract tests for the four RPC service legs.
  *
  * No broker exists in this environment, so each leg's exact topic
  * payload JSON is round-tripped through a `MemoryStream[String]` —
  * the same `value: STRING` shape `Sources.kafkaJsonStream` delivers —
  * and the assertion is builder→parser identity: every field of every
  * item survives serialize → stream → parse → explode. With these
  * green, the only untested Kafka surface is connector configuration
  * itself. */
class PayloadContractSpec extends SparkSpec {

  private var n = 0

  /** Stream `jsons` through MemoryStream, apply `transform` (parse +
    * explode), return the collected result. */
  private def streamed(jsons: Seq[String])(transform: DataFrame => DataFrame): DataFrame = {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    n += 1
    val name = s"payload_rt_$n"
    val ms = MemoryStream[String]
    ms.addData(jsons: _*)
    val q = transform(ms.toDF().withColumnRenamed("value", "raw"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    s.table(name)
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def valid40 = {
    val s = spark
    import s.implicits._
    Neel.ingest(Neel.syntheticTweets(s, sf))
      .orderBy($"tweet_id").limit(40)
  }

  test("payload JSON survives adversarial text (quotes, newlines, controls, unicode)") {
    val s = spark
    import s.implicits._
    val nasty = Seq(
      ("1", "quote \" backslash \\ slash /"),
      ("2", "newline\nand\r\ncarriage"),
      ("3", "tab\tand controls "),
      ("4", "unicode 漢字 emoji 😀 accents éüñ"),
      ("5", """json-ish {"tag": [1,2]} trailing"""),
      ("6", ""),
    ).toDF("tag", "text")
    val json = nasty
      .agg(sort_array(collect_list(struct($"tag", $"text"))).as("texts"))
      .select(Payloads.nerRequestJson(lit("r"), lit("t"), lit(1L),
        lit("d"), $"texts").as("j"))
      .as[String].collect().toSeq
    val back = streamed(json) { df =>
      df.select(Payloads.parseNerRequest(col("raw")).as("m"))
        .select(explode(col("m.texts")).as("t"))
        .select(col("t.tag"), col("t.text"))
    }
    assert(rows(back) === rows(nasty))
  }

  test("NER leg: request and response payloads round-trip exactly") {
    val s = spark
    import s.implicits._
    val texts = valid40.select($"tweet_id".cast("string").as("tag"), $"text")
    val reqJson = texts
      .agg(sort_array(collect_list(struct($"tag", $"text"))).as("texts"))
      .select(Payloads.nerRequestJson(lit("req-0"), lit("ner-resp"),
        lit(1000L), lit("default"), $"texts").as("j"))
      .as[String].collect().toSeq
    val back = streamed(reqJson) { df =>
      df.select(Payloads.parseNerRequest(col("raw")).as("m"))
        .select(col("m.requestId"), col("m.recognizer"),
          explode(col("m.texts")).as("t"))
        .select(col("requestId"), col("recognizer"),
          col("t.tag"), col("t.text"))
    }
    assert(back.select("tag", "text").collect().toSet ===
      texts.collect().toSet)
    assert(rows(back.select("requestId", "recognizer").distinct()) ===
      Set("[req-0,default]"))

    // response: the service's texts:[{tag,text,entities}] message,
    // fabricated from the in-engine NER stage, must parse+explode back
    // to exactly that stage's rows.
    val ents = Neel.nerEntities(s, valid40)
      .select($"tweet_id".cast("string").as("tag"), $"text",
        $"term".as("value"), $"category", $"pos_start", $"pos_end")
    val respJson = ents
      .groupBy($"tag", $"text")
      .agg(sort_array(collect_list(struct($"value", $"category",
        $"pos_start", $"pos_end"))).as("entities"))
      .agg(sort_array(collect_list(struct($"tag", $"text", $"entities"))).as("texts"))
      .select(to_json(struct(lit("req-0").as("requestId"), $"texts")).as("j"))
      .as[String].collect().toSeq
    val backResp = streamed(respJson) { df =>
      df.select(Payloads.parseNerResponse(col("raw")).as("m"))
        .select(explode(col("m.texts")).as("t"))
        .select(col("t.tag"), col("t.text"), explode(col("t.entities")).as("e"))
        .select(col("tag"), col("text"), col("e.value"), col("e.category"),
          col("e.pos_start"), col("e.pos_end"))
    }
    assert(rows(backResp) === rows(ents))
  }

  test("NEL leg: request and response payloads round-trip exactly") {
    val s = spark
    import s.implicits._
    val recognized = Neel.nerEntities(s, valid40)
      .select($"tweet_id".cast("string").as("tag"), $"text",
        $"term".as("value"), $"category", $"pos_start", $"pos_end")
      .groupBy($"tag", $"text")
      .agg(sort_array(collect_list(struct($"value", $"category",
        $"pos_start", $"pos_end"))).as("entities"))
    val reqJson = recognized
      .agg(sort_array(collect_list(struct($"tag", $"text", $"entities"))).as("texts"))
      .select(Payloads.nelRequestJson(lit("req-1"), lit("nel-resp"),
        lit(1000L), lit("default"), $"texts").as("j"))
      .as[String].collect().toSeq
    val back = streamed(reqJson) { df =>
      df.select(Payloads.parseNelRequest(col("raw")).as("m"))
        .select(col("m.linker"), explode(col("m.texts")).as("t"))
        .select(col("linker"), col("t.tag"), col("t.text"), col("t.entities"))
    }
    assert(rows(back.drop("linker")) === rows(recognized))

    val linked = Neel.nelLinked(Neel.nerEntities(s, valid40))
      .select($"tweet_id".cast("string").as("tag"),
        $"term".as("value"), $"link", $"is_nil", $"nil_cluster",
        $"confidence", $"category", $"pos_start", $"pos_end")
    val respJson = linked
      .groupBy($"tag")
      .agg(sort_array(collect_list(struct($"value", $"link", $"is_nil",
        $"nil_cluster", $"confidence", $"category",
        $"pos_start", $"pos_end"))).as("entities"))
      .agg(sort_array(collect_list(struct($"tag", $"entities"))).as("texts"))
      .select(to_json(struct(lit("req-1").as("requestId"), $"texts")).as("j"))
      .as[String].collect().toSeq
    val backResp = streamed(respJson) { df =>
      df.select(Payloads.parseNelResponse(col("raw")).as("m"))
        .select(explode(col("m.texts")).as("t"))
        .select(col("t.tag"), explode(col("t.entities")).as("e"))
        .select(col("tag"), col("e.value"), col("e.link"), col("e.is_nil"),
          col("e.nil_cluster"), col("e.confidence"), col("e.category"),
          col("e.pos_start"), col("e.pos_end"))
    }
    assert(rows(backResp) === rows(linked))
  }

  test("link resolver leg: request and response payloads round-trip exactly") {
    val s = spark
    import s.implicits._
    val links = Neel.nelLinked(Neel.nerEntities(s, valid40))
      .where(!$"is_nil")
      .select($"link", $"tweet_id".cast("string").as("tag")).distinct()
    val reqJson = links
      .agg(sort_array(collect_list(struct($"link", $"tag"))).as("links"))
      .select(Payloads.linkResolverRequestJson(lit("req-2"), lit("lr-resp"),
        lit(1000L), map(lit("includeThumb"), lit("true")), $"links").as("j"))
      .as[String].collect().toSeq
    val back = streamed(reqJson) { df =>
      df.select(Payloads.parseLinkResolverRequest(col("raw")).as("m"))
        .select(col("m.extraFields")("includeThumb").as("thumbOpt"),
          explode(col("m.links")).as("l"))
        .select(col("thumbOpt"), col("l.link"), col("l.tag"))
    }
    assert(rows(back.select("link", "tag")) === rows(links))
    assert(back.select("thumbOpt").distinct().as[String].collect().toSeq === Seq("true"))

    // response: resources carry the requesting tag; the reference
    // parser regroups them per tag — assert the exploded rows match
    // the engine-side resource join exactly.
    val resources = links.join(Neel.kbResources(s), $"link" === $"url")
      .select($"tag", $"url", $"name", $"thumb")
    val respJson = resources
      .agg(sort_array(collect_list(struct($"tag", $"url", $"name", $"thumb")))
        .as("resources"))
      .select(to_json(struct(lit("req-2").as("requestId"), $"resources")).as("j"))
      .as[String].collect().toSeq
    val backResp = streamed(respJson) { df =>
      df.select(Payloads.parseLinkResolverResponse(col("raw")).as("m"))
        .select(explode(col("m.resources")).as("r"))
        .select(col("r.tag"), col("r.url"), col("r.name"), col("r.thumb"))
    }
    assert(rows(backResp) === rows(resources))
  }

  test("geo leg: chunked request and response payloads round-trip exactly") {
    val s = spark
    import s.implicits._
    val locs = valid40.where($"user_location".isNotNull)
      .select($"tweet_id".cast("string").as("tag"),
        $"user_location".as("address"))
    // reference chunks geo requests at 15 items
    // (J/TwitterStreamJob.java:300); chunk in-test over the tiny input
    val w = org.apache.spark.sql.expressions.Window.orderBy($"tag")
    val chunked = locs
      .withColumn("chunk", floor((row_number().over(w) - 1) /
        graft.operators.Requests.MaxItemsPerRequest))
    val reqJson = chunked
      .groupBy($"chunk")
      .agg(sort_array(collect_list(struct($"tag", $"address"))).as("locations"))
      .select(Payloads.geoRequestJson(
        concat(lit("req-geo-"), $"chunk"), lit("geo-resp"),
        lit(1000L), lit("default"), $"locations").as("j"))
      .as[String].collect().toSeq
    assert(reqJson.size > 1, "chunking must produce multiple requests")
    val back = streamed(reqJson) { df =>
      df.select(Payloads.parseGeoRequest(col("raw")).as("m"))
        .select(col("m.requestId"), size(col("m.locations")).as("n"),
          explode(col("m.locations")).as("l"))
        .select(col("requestId"), col("n"), col("l.tag"), col("l.address"))
    }
    assert(rows(back.select("tag", "address")) === rows(locs))
    assert(back.select("n").as[Int].collect()
      .forall(_ <= graft.operators.Requests.MaxItemsPerRequest))

    val decoded = Neel.geoDecoded(valid40)
      .select($"tweet_id".cast("string").as("tag"), $"latitude", $"longitude")
    val respJson = decoded
      .agg(sort_array(collect_list(struct($"tag",
        struct($"latitude", $"longitude").as("coordinates")))).as("locations"))
      .select(to_json(struct(lit("req-geo").as("requestId"), $"locations")).as("j"))
      .as[String].collect().toSeq
    val backResp = streamed(respJson) { df =>
      df.select(Payloads.parseGeoResponse(col("raw")).as("m"))
        .select(explode(col("m.locations")).as("l"))
        .select(col("l.tag"), col("l.coordinates.latitude").as("latitude"),
          col("l.coordinates.longitude").as("longitude"))
    }
    assert(rows(backResp) === rows(decoded))
  }
}
