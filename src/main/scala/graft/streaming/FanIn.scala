package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model._
import graft.operators.Neel

/** The per-tweet 4-way fan-in — the one genuinely custom stateful
  * operator in the engine (SURVEY.md §2.4 #20/#21; reference
  * `J/TwitterStreamTypeWindowTrigger.java:38-96` +
  * `J/NeelProcessedTweetWindowFunction.java:26-106`).
  *
  * Semantics reproduced exactly:
  *   - partials for one tweet arrive tagged by tweet id in any order;
  *   - when all 4 kinds (status, linkedTweet, resource,
  *     decodedLocation) have arrived → emit the assembled result and
  *     clear state (FIRE_AND_PURGE);
  *   - on processing-time timeout → emit a partial result if a status
  *     arrived, else silently purge (late/orphan partials are dropped);
  *   - assembly: concat entity lists, hash-join entity.link →
  *     resource.url, backfill entity.value from the status text
  *     (out-of-bounds spans ignored), keep the decoded location.
  *
  * The same `assemble` core runs in three guises:
  *   1. [[fanInStream]] — Structured Streaming
  *      `flatMapGroupsWithState(ProcessingTimeTimeout)`; state is the
  *      buffered partial list, bounded by the timeout (15-30 s of
  *      in-flight keys — scale-safe on any executor count since keys
  *      hash-partition).
  *   2. [[fanInBatch]] — the same flatMapGroupsWithState invoked on a
  *      bounded Dataset (Spark runs the function once per key).
  *   3. the pure relational formulation in [[Neel.resolved]] (explode +
  *      broadcast join), which the DuckDB oracle checks; q27 asserts
  *      the stateful path produces byte-identical results to it.
  */
object FanIn {

  /** Buffered state for one tweet key. */
  final case class FanInBuffer(parts: Seq[TaggedPartial])

  /** Pure assembly of buffered partials (reference window function
    * semantics). Returns None when no status partial is present. */
  def assemble(parts: Seq[TaggedPartial]): Option[ProcessedTweet] = {
    val status = parts.flatMap(_.status).headOption
    status.map { st =>
      val entities = parts.flatMap(_.entities).flatten
      val resources: Map[String, Resource] =
        parts.flatMap(_.resources).flatten.map(r => r.url -> r).toMap
      val location = parts.flatMap(_.location).headOption
      val enriched = entities.map { e =>
        val withRes = e.link.flatMap(resources.get) match {
          case some @ Some(_) => e.copy(resource = some)
          case None => e
        }
        // value backfill: substring(text, start, end).trim, ignoring
        // out-of-bounds spans (J/NeelProcessedTweetWindowFunction.java:87-89)
        val s = withRes.position.start
        val t = withRes.position.end
        if (s >= 0 && t >= s && t <= st.text.length)
          withRes.copy(value = st.text.substring(s, t).trim)
        else withRes
      }.sortBy(e => (e.position.start, e.category))
      ProcessedTweet(st, enriched, location)
    }
  }

  private def stateFn(timeoutMs: Long)(
      tag: String, rows: Iterator[TaggedPartial],
      state: GroupState[FanInBuffer]): Iterator[ProcessedTweet] = {
    if (state.hasTimedOut) {
      val buffered = state.getOption.map(_.parts).getOrElse(Seq.empty)
      state.remove()
      // fire only if a status arrived; else silently purge
      assemble(buffered).iterator
    } else {
      val buffered = state.getOption.map(_.parts).getOrElse(Seq.empty) ++ rows
      val kinds = buffered.map(_.kind).toSet
      if (StreamKinds.all.subsetOf(kinds)) {
        state.remove()
        assemble(buffered).iterator
      } else {
        state.update(FanInBuffer(buffered))
        // batch execution has no timers; guard so the same function
        // body runs in both modes
        try state.setTimeoutDuration(timeoutMs)
        catch { case _: UnsupportedOperationException => }
        Iterator.empty
      }
    }
  }

  /** Streaming fan-in with the reference's processing-time timeout. */
  def fanInStream(parts: Dataset[TaggedPartial],
      timeoutMs: Long = 15000): Dataset[ProcessedTweet] = {
    import parts.sparkSession.implicits._
    parts.groupByKey(_.tag)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(stateFn(timeoutMs))
  }

  /** Batch fan-in through the identical stateful operator. */
  def fanInBatch(parts: Dataset[TaggedPartial]): Dataset[ProcessedTweet] = {
    import parts.sparkSession.implicits._
    parts.groupByKey(_.tag)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(stateFn(Long.MaxValue))
  }

  // ---------------------------------------------------------------------
  // Tagged-partial builders (#18 tagged-tuple mappers + empty
  // synthesizers) from the deterministic NEEL stages
  // ---------------------------------------------------------------------

  final case class TweetRow(tweet_id: Long, text: String,
      user_id: Long, user_name: String, screen_name: String,
      user_location: Option[String])

  final case class EntityRow(tweet_id: Long, pos_start: Int,
      pos_end: Int, link: Option[String], is_nil: Boolean,
      nil_cluster: Option[String], confidence: Double, category: String)

  final case class GeoRow(tweet_id: Long,
      latitude: Option[Double], longitude: Option[Double])

  /** Build the unioned 4-kind tagged stream from the testdata-derived
    * tweet pipeline (every valid tweet gets all 4 kinds, with empty
    * synthesizers for no-entity / no-location tweets, like reference
    * `J/TwitterStreamJob.java:309-343`). */
  def taggedPartials(s: SparkSession, d: String): Dataset[TaggedPartial] = {
    import s.implicits._
    val valid = Neel.ingest(Neel.syntheticTweets(s, d))
    val tweets = valid.select($"tweet_id", $"text", $"user_id",
      $"user_name", $"screen_name", $"user_location").as[TweetRow]

    val statusParts = tweets.map { r =>
      TaggedPartial(r.tweet_id.toString, StreamKinds.Status,
        Some(TweetStatus(r.tweet_id, r.text, None, isRetweet = false,
          TweetUser(r.user_id, r.user_name, r.screen_name, r.user_location))),
        None, None, None)
    }

    val entRows = Neel.nelLinked(Neel.nerEntities(s, valid))
      .select($"tweet_id", $"pos_start", $"pos_end", $"link", $"is_nil",
        $"nil_cluster", $"confidence", $"category").as[EntityRow]
    // one shuffle on tweet_id produces BOTH the linkedTweet and the
    // resource partial for each key (the reference computes them on
    // separate legs; semantics are per-key so one grouping suffices)
    // sc.broadcast, NOT a closure capture: a captured map ships with
    // every task; the broadcast ships once per executor — the stateful
    // leg's twin of the relational leg's `broadcast(...)` join
    // (`Neel.scala` link-resolver), so both scale the same way when
    // the KB outgrows the test dictionary.
    val kbB = s.sparkContext.broadcast(
      Neel.kbResources(s).as[Resource].collect().map(r => r.url -> r).toMap)
    val entParts = entRows.groupByKey(_.tweet_id).flatMapGroups { (id, it) =>
      val rows = it.toSeq
      val ents = rows.map { r =>
        LinkedEntity(EntityPosition(r.pos_start, r.pos_end), value = null,
          r.link, r.is_nil, r.nil_cluster, r.confidence, r.category,
          resource = None)
      }.sortBy(e => (e.position.start, e.category))
      val res = rows.flatMap(_.link).distinct.sorted.flatMap(kbB.value.get)
      Iterator(
        TaggedPartial(id.toString, StreamKinds.LinkedTweet, None, Some(ents),
          None, None),
        TaggedPartial(id.toString, StreamKinds.ResourceKind, None, None,
          Some(res), None))
    }
    // empty-entities + empty-resources synthesizers for tweets the NER
    // found nothing in (one anti join, two partials per key)
    val empties = valid.join(entRows.toDF().select($"tweet_id").distinct(),
        Seq("tweet_id"), "left_anti")
      .select($"tweet_id").as[Long].flatMap { id =>
        Iterator(
          TaggedPartial(id.toString, StreamKinds.LinkedTweet, None,
            Some(Seq.empty[LinkedEntity]), None, None),
          TaggedPartial(id.toString, StreamKinds.ResourceKind, None, None,
            Some(Seq.empty[Resource]), None))
      }

    val geo = valid.join(Neel.geoDecoded(valid)
        .withColumnRenamed("tweet_id", "g_id"),
        $"tweet_id" === $"g_id", "left")
      .select($"tweet_id", $"latitude", $"longitude").as[GeoRow]
    val locationParts = geo.map { r =>
      val loc = for (la <- r.latitude; lo <- r.longitude)
        yield Coordinates(la, lo)
      TaggedPartial(r.tweet_id.toString, StreamKinds.DecodedLocation,
        None, None, None, loc)
    }

    statusParts.union(entParts).union(empties).union(locationParts)
  }

  /** Flatten assembled tweets to challenge rows (shared by the batch
    * and streaming guises — both must equal the relational q23
    * oracle). */
  private def challengeRows(out: Dataset[ProcessedTweet]): DataFrame = {
    import out.sparkSession.implicits._
    out.flatMap { p =>
        p.entities.map { e =>
          (p.status.id, e.position.start, e.position.end,
            if (e.isNil) e.nilCluster.orNull else e.link.orNull,
            e.confidence, e.category)
        }
      }
      .toDF("tweet_id", "pos_start", "pos_end", "resource_uri",
        "confidence", "category")
      .orderBy($"tweet_id", $"pos_start", $"resource_uri")
  }

  private val replaySeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** q27: the stateful fan-in flattened to challenge rows — must equal
    * the relational q23 oracle exactly. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_fanin_stateful" -> { (s, d) =>
      challengeRows(fanInBatch(taggedPartials(s, d)))
    },

    // q27s: the SAME oracle, but through the real Structured Streaming
    // operator — the tagged partials are staged as many small files
    // and replayed with maxFilesPerTrigger=1 under a ProcessingTime
    // trigger (polled to completion below — a ProcessingTimeTimeout
    // query cannot self-terminate), so partials of one tweet arrive
    // across DIFFERENT micro-batches and the flatMapGroupsWithState
    // state store genuinely buffers between triggers (reference
    // runtime shape: J/TwitterStreamTypeWindowTrigger.java:38-96).
    // Driver-visible proof that the streaming guise equals the
    // relational semantics.
    "q27s_fanin_stream_replay" -> { (s, d) =>
      import s.implicits._
      val parts = taggedPartials(s, d)
      // 4 staged files → 5 serialized micro-batches: still genuinely
      // multi-batch (partials of one tweet cross batch boundaries, the
      // state store buffers between triggers), at half the per-batch
      // commit cost of the previous 8-file staging. Staged ONCE per
      // (session, sf dir) — a bench sweep replays the same landed
      // corpus instead of re-writing it every run.
      val dir = graft.streaming.Replay.stageOnce(
        s, s"q27s:$d", parts.toDF(), files = 4)
      val expected = s.read.parquet(dir).count()
      val stream = s.readStream.schema(parts.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
        .as[TaggedPartial]
      val name = s"fanin_replay_${replaySeq.incrementAndGet()}"
      // the state-partition count is fixed at the query's FIRST run
      // from spark.sql.shuffle.partitions; every micro-batch then pays
      // a state-store commit per partition, so scope the replay to 8
      // (the file count) instead of the session-wide 32 — same
      // semantics, a quarter of the per-batch commit overhead
      // The shuffle-partition override must outlive start(): the
      // stream thread clones the session conf asynchronously while
      // planning batch 0, so restoring immediately after start() races
      // it and the 8-partition scoping could silently not apply.
      // Restore only after the replay is fully consumed and stopped —
      // the replay runs alone in this session during those seconds.
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        // ProcessingTime(0): next micro-batch starts as soon as the
        // previous commits — the batches are serialized anyway, so a
        // non-zero cadence is a pure floor on replay latency
        val q = fanInStream(stream, timeoutMs = 600000)
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
          .start()
        // A ProcessingTimeTimeout stateful query never self-terminates
        // (shouldRunAnotherBatch keeps scheduling batches to fire
        // future timers), so poll until every partial's batch has
        // COMMITTED — progress events post after commit, so at that
        // point the full output is in the sink — then stop explicitly.
        // Input rows are accumulated per batchId because
        // recentProgress is a bounded ring the idle timer batches
        // would otherwise evict from.
        try {
          val deadline = System.currentTimeMillis() + 300000
          var consumed = 0L
          var seen = Set.empty[Long]
          while (System.currentTimeMillis() < deadline && consumed < expected) {
            for (p <- q.recentProgress if !seen.contains(p.batchId)) {
              seen += p.batchId
              consumed += p.numInputRows
            }
            if (consumed < expected) Thread.sleep(50)
          }
          assert(consumed >= expected,
            s"replay timed out: consumed $consumed of $expected partials")
        } finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      // materialize the sink rows, then release the sink (a bench
      // sweep re-runs this — undropped memory sinks accumulate)
      val out = graft.Materialize.cut(
        challengeRows(s.table(name).as[ProcessedTweet]).toDF())
      s.catalog.dropTempView(name)
      out
    },
  )

  def oracle: Map[String, String] = Map(
    // identical semantics to the relational q23 formulation — for the
    // batch guise AND the streaming replay
    "q27_fanin_stateful" -> Neel.oracle("q23_neel_challenge"),
    "q27s_fanin_stream_replay" -> Neel.oracle("q23_neel_challenge"),
  )
}
