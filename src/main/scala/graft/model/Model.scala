package graft.model

/** Case-class domain model for the NEEL (Named Entity Extraction and
  * Linking) pipeline — the Spark-native re-expression of the
  * reference's DTO surface (FIXTURES.md §2-4; reference
  * `J/NeelProcessedTweetWindowFunction.java:27-99`,
  * `J/TwitterNeelResultRow.java:5-76`).
  *
  * Encoded via `Encoders.product`; nested structs map to Spark
  * `StructType`s, `Seq` to `ArrayType`, `Option` to nullable.
  */
final case class Coordinates(latitude: Double, longitude: Double)

final case class TweetUser(
    id: Long,
    name: String,
    screenName: String,
    location: Option[String])

final case class TweetStatus(
    id: Long,
    text: String,
    coordinates: Option[Coordinates],
    isRetweet: Boolean,
    user: TweetUser)

final case class EntityPosition(start: Int, end: Int)

final case class Resource(
    url: String,
    name: String,
    thumb: String)

final case class LinkedEntity(
    position: EntityPosition,
    value: String,
    link: Option[String],
    isNil: Boolean,
    nilCluster: Option[String],
    confidence: Double,
    category: String,
    resource: Option[Resource])

/** One assembled result per tweet (reference: NeelProcessedTweetDTO). */
final case class ProcessedTweet(
    status: TweetStatus,
    entities: Seq[LinkedEntity],
    location: Option[Coordinates])

/** Tagged-union row for the 4-way fan-in (SURVEY.md §1.4, §2.4 #20):
  * exactly one payload column is non-null per row, discriminated by
  * `kind` ∈ {status, linkedTweet, resource, decodedLocation}. */
final case class TaggedPartial(
    tag: String,
    kind: String,
    status: Option[TweetStatus],
    entities: Option[Seq[LinkedEntity]],
    resources: Option[Seq[Resource]],
    location: Option[Coordinates])

object StreamKinds {
  val Status = "status"
  val LinkedTweet = "linkedTweet"
  val ResourceKind = "resource"
  val DecodedLocation = "decodedLocation"
  val all: Set[String] = Set(Status, LinkedTweet, ResourceKind, DecodedLocation)
}
