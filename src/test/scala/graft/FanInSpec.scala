package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.model._
import graft.streaming.FanIn

import scala.util.Random

/** The fan-in state machine (SURVEY.md §2.4 #20/#21, risk register
  * §7.5#1): arrival-order insensitivity, fire-only-with-status,
  * silent purge of orphan partials, timeout partial emission. */
class FanInSpec extends SparkSpec {

  private val status = TaggedPartial("1", StreamKinds.Status,
    Some(TweetStatus(1L, "big spark join", None, isRetweet = false,
      TweetUser(1L, "user_1", "u1", Some("city_1")))), None, None, None)
  private val entities = Seq(
    LinkedEntity(EntityPosition(4, 9), null, Some("http://kb/r/spark"),
      isNil = false, None, 0.5, "ORG", None),
    LinkedEntity(EntityPosition(10, 14), null, None,
      isNil = true, Some("nil-join"), 0.25, "ACTION", None))
  private val linked = TaggedPartial("1", StreamKinds.LinkedTweet,
    None, Some(entities), None, None)
  private val resources = TaggedPartial("1", StreamKinds.ResourceKind,
    None, None,
    Some(Seq(Resource("http://kb/r/spark", "res-spark", "http://kb/thumb/spark"))),
    None)
  private val location = TaggedPartial("1", StreamKinds.DecodedLocation,
    None, None, None, Some(Coordinates(11.5, -2.5)))
  private val all4 = Seq(status, linked, resources, location)

  test("assemble is arrival-order insensitive") {
    val expected = FanIn.assemble(all4)
    assert(expected.isDefined)
    for (_ <- 1 to 20) {
      val shuffled = Random.shuffle(all4)
      assert(FanIn.assemble(shuffled) === expected)
    }
  }

  test("assemble joins resources and backfills entity values") {
    val out = FanIn.assemble(all4).get
    assert(out.entities.map(_.value) === Seq("spark", "join"))
    assert(out.entities.head.resource.map(_.name) === Some("res-spark"))
    assert(out.entities(1).resource.isEmpty)
    assert(out.location === Some(Coordinates(11.5, -2.5)))
  }

  test("assemble without status emits nothing (silent purge)") {
    assert(FanIn.assemble(Seq(linked, resources, location)).isEmpty)
    assert(FanIn.assemble(Nil).isEmpty)
  }

  test("assemble ignores out-of-bounds entity spans") {
    val bad = linked.copy(entities = Some(Seq(
      LinkedEntity(EntityPosition(10, 99), null, None, isNil = true,
        Some("nil-x"), 0.1, "X", None))))
    val out = FanIn.assemble(Seq(status, bad)).get
    assert(out.entities.head.value === null) // untouched, like the reference
  }

  // NOTE: `processAllAvailable` is unusable with ProcessingTimeTimeout —
  // Spark keeps scheduling no-data batches for timeout processing, so
  // the "no new data" signal never fires. Poll the sink/progress instead.
  private def awaitTrue(timeoutMs: Long = 60000)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline && !cond) Thread.sleep(50)
    cond
  }

  private def inputRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.map(_.numInputRows).sum

  test("streaming fan-in emits when all 4 kinds arrive across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[TaggedPartial]
    val q = FanIn.fanInStream(mem.toDS(), timeoutMs = 600000)
      .writeStream.format("memory").queryName("fanin_ok")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      mem.addData(linked, resources) // partial only — nothing yet
      assert(awaitTrue()(inputRows(q) >= 2))
      assert(s.table("fanin_ok").count() === 0)
      mem.addData(status, location) // completes the key
      assert(awaitTrue()(s.table("fanin_ok").count() === 1))
    } finally q.stop()
  }

  test("streaming fan-in times out: status present → partial result") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[TaggedPartial]
    val q = FanIn.fanInStream(mem.toDS(), timeoutMs = 300)
      .writeStream.format("memory").queryName("fanin_to")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      mem.addData(status, linked) // no resources/location → waits
      // timeout batches run on their own; key "1" fires a partial result
      assert(awaitTrue()(s.table("fanin_to").count() === 1))
      val row = s.table("fanin_to").collect().head
      assert(row.getStruct(0).getLong(0) === 1L) // status.id
    } finally q.stop()
  }

  test("streaming fan-in times out: no status → silent purge") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[TaggedPartial]
    val q = FanIn.fanInStream(mem.toDS(), timeoutMs = 300)
      .writeStream.format("memory").queryName("fanin_purge")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      mem.addData(linked, resources, location) // orphans, no status
      assert(awaitTrue()(inputRows(q) >= 3))
      // wait well past the timeout so the purge definitely processed
      Thread.sleep(2000)
      assert(s.table("fanin_purge").count() === 0)
    } finally q.stop()
  }

  test("END-TO-END: streaming NEEL fan-in over sf0.001 equals batch result") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val parts = FanIn.taggedPartials(s, sf).collect().toSeq
    val expected = FanIn.fanInBatch(FanIn.taggedPartials(s, sf))
      .collect().map(p => (p.status.id, p.entities.length, p.location.map(_.latitude))).sorted
    // feed the partials out of order, across several micro-batches
    val shuffled = new Random(42).shuffle(parts)
    val chunks = shuffled.grouped(math.max(1, shuffled.size / 3)).toSeq
    val mem = MemoryStream[TaggedPartial]
    val q = FanIn.fanInStream(mem.toDS(), timeoutMs = 600000)
      .writeStream.format("memory").queryName("fanin_e2e")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      chunks.foreach(c => mem.addData(c))
      val deadline = System.currentTimeMillis() + 120000
      while (System.currentTimeMillis() < deadline &&
        s.table("fanin_e2e").count() < expected.length) Thread.sleep(200)
      val got = s.table("fanin_e2e").as[ProcessedTweet]
        .collect().map(p => (p.status.id, p.entities.length, p.location.map(_.latitude))).sorted
      assert(got.toSeq === expected.toSeq)
    } finally q.stop()
  }

  test("batch fan-in equals relational formulation row-for-row") {
    val s = spark
    import s.implicits._
    val stateful = streaming.FanIn.queries("q27_fanin_stateful")(s, sf)
      .collect().toSeq
    val relational = operators.Neel.queries("q23_neel_challenge")(s, sf)
      .collect().toSeq
    assert(stateful === relational)
  }
}
