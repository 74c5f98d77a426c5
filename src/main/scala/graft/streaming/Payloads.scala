package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka payload contracts for the four RPC service legs (NER, NEL,
  * link resolver, geo decoder) — the exact JSON message shapes the
  * reference exchanges over its request/response topics, re-expressed
  * as codegen'd `to_json` / `from_json` column expressions so the
  * engine can produce and consume the same payloads from any
  * Kafka-shaped `value: STRING` stream (`Sources.kafkaJsonStream`, or
  * a MemoryStream in tests — the contract is identical).
  *
  * Field shapes follow the reference builders/parsers:
  *   - common request envelope: requestId, outputTopic, expiration
  *     (`J/request/AbstractRequestMessageBuilder.java:45-51`);
  *     requestId here is caller-supplied and deterministic, where the
  *     reference draws Random.nextLong (documented divergence — a
  *     replayable pipeline must not mint random ids per attempt)
  *   - NER: request {recognizer, texts:[{tag,text}]}
  *     (`J/request/NerRequestMessageBuilder.java:38-46`); response
  *     texts:[{tag,text,entities:[...]}] exploded one row per text
  *     (`J/response/NerResponseMessageParser.java:32-40`)
  *   - NEL: request {linker, texts:[recognized]}
  *     (`J/request/NelRequestMessageBuilder.java:38-46`); response
  *     texts:[{tag,entities:[linked]}]
  *     (`J/response/NelResponseMessageParser.java:32-40`)
  *   - link resolver: request {links:[{link,tag}], extraFields}
  *     (`J/request/LinkResolverRequestMessageBuilder.java:36-52`);
  *     response resources:[{tag,url,name,thumb}] regrouped per tag
  *     (`J/response/LinkResolverResponseMessageParser.java:37-56`)
  *   - geo: request {decoder, locations:[{tag,address}]} chunked at 15
  *     (`J/request/GeoDecoderRequestMessageBuilder.java` +
  *     `J/TwitterStreamJob.java:300`); response
  *     locations:[{tag,coordinates:{latitude,longitude}}]
  *     (`J/response/GeoDecoderResponseMessageParser.java:30-40`)
  */
object Payloads {

  // ---------------------------------------------------------------- DTOs

  val plainText: StructType = StructType(Seq(
    StructField("tag", StringType), StructField("text", StringType)))

  val namedEntity: StructType = StructType(Seq(
    StructField("value", StringType), StructField("category", StringType),
    StructField("pos_start", IntegerType), StructField("pos_end", IntegerType)))

  val recognizedText: StructType = StructType(Seq(
    StructField("tag", StringType), StructField("text", StringType),
    StructField("entities", ArrayType(namedEntity))))

  val linkedEntity: StructType = StructType(Seq(
    StructField("value", StringType), StructField("link", StringType),
    StructField("is_nil", BooleanType), StructField("nil_cluster", StringType),
    StructField("confidence", DoubleType), StructField("category", StringType),
    StructField("pos_start", IntegerType), StructField("pos_end", IntegerType)))

  val linkedText: StructType = StructType(Seq(
    StructField("tag", StringType),
    StructField("entities", ArrayType(linkedEntity))))

  val linkDto: StructType = StructType(Seq(
    StructField("link", StringType), StructField("tag", StringType)))

  val resourceDto: StructType = StructType(Seq(
    StructField("tag", StringType), StructField("url", StringType),
    StructField("name", StringType), StructField("thumb", StringType)))

  val locationDto: StructType = StructType(Seq(
    StructField("tag", StringType), StructField("address", StringType)))

  val decodedLocation: StructType = StructType(Seq(
    StructField("tag", StringType),
    StructField("coordinates", StructType(Seq(
      StructField("latitude", DoubleType),
      StructField("longitude", DoubleType))))))

  // ------------------------------------------------------- envelopes

  private def envelope(payloadField: String, payloadType: DataType,
      extras: (String, DataType)*): StructType =
    StructType(
      Seq(StructField("requestId", StringType),
        StructField("outputTopic", StringType),
        StructField("expiration", LongType)) ++
      extras.map { case (n, t) => StructField(n, t) } :+
      StructField(payloadField, ArrayType(payloadType)))

  val nerRequest: StructType =
    envelope("texts", plainText, "recognizer" -> StringType)
  val nelRequest: StructType =
    envelope("texts", recognizedText, "linker" -> StringType)
  val linkResolverRequest: StructType =
    envelope("links", linkDto,
      "extraFields" -> MapType(StringType, StringType))
  val geoRequest: StructType =
    envelope("locations", locationDto, "decoder" -> StringType)

  val nerResponse: StructType = StructType(Seq(
    StructField("requestId", StringType),
    StructField("texts", ArrayType(recognizedText))))
  val nelResponse: StructType = StructType(Seq(
    StructField("requestId", StringType),
    StructField("texts", ArrayType(linkedText))))
  val linkResolverResponse: StructType = StructType(Seq(
    StructField("requestId", StringType),
    StructField("resources", ArrayType(resourceDto))))
  val geoResponse: StructType = StructType(Seq(
    StructField("requestId", StringType),
    StructField("locations", ArrayType(decodedLocation))))

  // -------------------------------------------------------- builders

  private def requestJson(requestId: Column, outputTopic: Column,
      expiration: Column, extra: (String, Column), payload: (String, Column)): Column =
    to_json(struct(
      requestId.as("requestId"), outputTopic.as("outputTopic"),
      expiration.as("expiration"), extra._2.as(extra._1),
      payload._2.as(payload._1)))

  /** texts: array<struct<tag,text>> (e.g. from collect_list). */
  def nerRequestJson(requestId: Column, outputTopic: Column,
      expiration: Column, recognizer: Column, texts: Column): Column =
    requestJson(requestId, outputTopic, expiration,
      "recognizer" -> recognizer, "texts" -> texts)

  def nelRequestJson(requestId: Column, outputTopic: Column,
      expiration: Column, linker: Column, texts: Column): Column =
    requestJson(requestId, outputTopic, expiration,
      "linker" -> linker, "texts" -> texts)

  def linkResolverRequestJson(requestId: Column, outputTopic: Column,
      expiration: Column, extraFields: Column, links: Column): Column =
    requestJson(requestId, outputTopic, expiration,
      "extraFields" -> extraFields, "links" -> links)

  def geoRequestJson(requestId: Column, outputTopic: Column,
      expiration: Column, decoder: Column, locations: Column): Column =
    requestJson(requestId, outputTopic, expiration,
      "decoder" -> decoder, "locations" -> locations)

  // --------------------------------------------------------- parsers

  /** Parse a request payload back to its envelope struct (the service
    * side of each leg; also the engine's own round-trip check). */
  def parseNerRequest(json: Column): Column = from_json(json, nerRequest)
  def parseNelRequest(json: Column): Column = from_json(json, nelRequest)
  def parseLinkResolverRequest(json: Column): Column =
    from_json(json, linkResolverRequest)
  def parseGeoRequest(json: Column): Column = from_json(json, geoRequest)

  /** Response parsers: `value` is the raw Kafka message string; each
    * returns the parsed struct whose payload array the caller explodes
    * one row per item, like the reference's FlatMapFunction parsers. */
  def parseNerResponse(json: Column): Column = from_json(json, nerResponse)
  def parseNelResponse(json: Column): Column = from_json(json, nelResponse)
  def parseLinkResolverResponse(json: Column): Column =
    from_json(json, linkResolverResponse)
  def parseGeoResponse(json: Column): Column = from_json(json, geoResponse)
}
