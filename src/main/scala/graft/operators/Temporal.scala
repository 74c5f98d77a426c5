package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import scala.jdk.CollectionConverters._

/** Temporal operators over the `events` table: tumbling-window
  * aggregation, gap-based sessionization, and a scalable as-of join.
  * The same transforms run unchanged on a streaming DataFrame (the
  * batch/stream duality of SURVEY.md §7.1); watermarked streaming
  * variants are exercised in StreamingSpec.
  *
  * Scale design:
  *   - window aggregation is one hash shuffle on (window, type) with
  *     map-side partial aggregation; sums use DECIMAL so results are
  *     order-independent (exact) at any parallelism;
  *   - sessionization uses Spark's native `session_window` (state-store
  *     backed in streaming; sort-merge per key in batch);
  *   - the as-of join is the union + sorted carry-forward formulation:
  *     ONE shuffle on the join key, a per-partition sort, then a
  *     running `last(_, ignoreNulls)` — no range cross-product, no
  *     per-row probe; this is the 100 TB-safe shape (DuckDB's native
  *     ASOF JOIN is the oracle).
  */
object Temporal {

  private def decSum(c: String) =
    sum(col(c).cast(DecimalType(18, 6))).cast("double")

  /** KMV (bottom-k / theta) sketch size for q55b: k = 64 gives a
    * ~1/sqrt(k-2) ≈ 13% standard error on the distinct-count estimate
    * while staying below the per-group distinct-user count at every
    * test scale factor (so the estimator path actually runs). */
  val KmvK = 64

  /** Fraction of rows (out of 256 md5-byte values) kept by q55b's
    * deterministic Bernoulli sample: 64/256 = 25%. */
  val SampleByte = 64

  /** Dialect-neutral 48-bit fold of the first 12 md5 hex digits — see
    * [[Tokens.hex48]]; widened from the sampling byte so k-minimum
    * order statistics are collision-free in practice. */
  private def hex48(h: String): String = Tokens.hex48(h)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour windows per event type.
    "q50_window_agg" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), decSum("value").as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    },

    // q50's aggregation through the REAL watermarked streaming
    // operator: events replay from staged files (3 files → serialized
    // micro-batches), the aggregation runs under
    // withWatermark + window() in APPEND mode — the only mode that
    // scales (complete mode re-emits the whole result every trigger) —
    // and a sentinel event past every real window advances the final
    // watermark so the state store flushes closed windows (the
    // "watermark heartbeat" a production pipeline emits for exactly
    // this purpose). The delay is sized past the corpus's full time
    // span, so cross-file arrival order cannot drop a late row; the
    // oracle is q50's batch SQL verbatim — driver-visible proof that
    // streaming ≡ batch for windowed aggregation.
    "q77_stream_window_agg" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("ts"), col("event_type"), col("value"))
      val maxRow = ev.agg(max(col("ts"))).head()
      if (maxRow.isNullAt(0)) {
        // empty input: the batch form's empty result, same schema
        queries("q50_window_agg")(s, d)
          .select(col("window_start"), col("event_type"),
            col("n"), col("sum_value")).limit(0)
      } else {
        val maxTs = maxRow.getTimestamp(0)
        // watermark-flush sentinel: one event 400 days out (past span
        // + the 365-day delay) in the last micro-batch — the shared
        // Replay primitive
        val sentinelTs = new java.sql.Timestamp(
          maxTs.getTime + 400L * 24 * 3600 * 1000)
        graft.streaming.Replay.run(s, ev, files = 3,
          stateParts = Some(4),
          afterStage = graft.streaming.Replay.sentinelAfterStage(s,
            Seq(org.apache.spark.sql.Row(sentinelTs, "__sentinel", 0.0)),
            ev.schema),
          stageKey = Some(s"q77:$d")) { stream =>
          stream
            .withWatermark("ts", "365 days")
            .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
            .agg(count(lit(1)).as("n"), decSum("value").as("sum_value"))
            .select(col("w.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))
        }
          // null-safe: a NULL event_type group is real data and must
          // survive the sentinel filter (plain =!= would null it out)
          .where(!col("event_type").eqNullSafe("__sentinel"))
          .orderBy(col("window_start"), col("event_type"))
      }
    },

    // Gap-based sessions (30 min) per user.
    "q51_sessionize" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), decSum("value").as("sum_value"),
          min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
        .select(col("user_id"), col("session_start"), col("n_events"),
          col("sum_value"),
          ((unix_micros(col("session_end")) - unix_micros(col("session_start")))
            .cast("double") / lit(1e6)).as("duration_sec"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // q51's sessionization through the REAL streaming `session_window`
    // operator — the stateful temporal op most sensitive to watermark
    // semantics (sessions MERGE in state as late rows bridge gaps, and
    // only close when the watermark passes the gap past their end).
    // Same harness as q77: staged-file replay in APPEND mode, a
    // sentinel event (user_id = -1) 400 days out arriving in the last
    // micro-batch advances the final watermark so the state store
    // flushes every real session; the 365-day delay exceeds the
    // corpus's span so cross-file arrival order cannot drop a late
    // row. Oracle = q51's batch SQL verbatim — driver-visible proof
    // that streaming ≡ batch for gap-based sessionization.
    "q51s_stream_sessionize" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("ts"), col("user_id"), col("value"))
      val maxRow = ev.agg(max(col("ts"))).head()
      if (maxRow.isNullAt(0)) {
        queries("q51_sessionize")(s, d).limit(0)
      } else {
        val maxTs = maxRow.getTimestamp(0)
        val sentinelTs = new java.sql.Timestamp(
          maxTs.getTime + 400L * 24 * 3600 * 1000)
        graft.streaming.Replay.run(s, ev, files = 3,
          stateParts = Some(4),
          afterStage = graft.streaming.Replay.sentinelAfterStage(s,
            Seq(org.apache.spark.sql.Row(sentinelTs, -1L, 0.0)),
            ev.schema),
          stageKey = Some(s"q51s:$d")) { stream =>
          stream
            .withWatermark("ts", "365 days")
            .groupBy(col("user_id"),
              session_window(col("ts"), "30 minutes").as("w"))
            .agg(count(lit(1)).as("n_events"), decSum("value").as("sum_value"),
              min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
            .select(col("user_id"), col("session_start"), col("n_events"),
              col("sum_value"),
              ((unix_micros(col("session_end")) - unix_micros(col("session_start")))
                .cast("double") / lit(1e6)).as("duration_sec"))
        }
          // null-safe: a NULL user_id group is real data and must
          // survive the sentinel filter
          .where(!col("user_id").eqNullSafe(lit(-1L)))
          .orderBy(col("user_id"), col("session_start"))
      }
    },

    // Sliding windows (2 h window, 1 h slide): each event lands in two
    // overlapping windows — Spark's window() generates both
    // assignments; the oracle unions the two shifted bucketings.
    "q53_sliding_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), decSum("value").as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    },

    // Ordered analytics per user: lag/lead + 3-event moving average
    // over event time (the analytic-window surface the reference
    // lacks; one shuffle on user_id, per-partition sort).
    "q54_lag_analytics" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wAvg = w.rowsBetween(-2, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_value", lead(col("value"), 1).over(w))
        .withColumn("gap_sec",
          ((unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
            .cast("double") / lit(1e6)))
        .withColumn("mov_avg3", round(avg(col("value")).over(wAvg), 6))
        .select(col("user_id"), col("event_id"), col("value"),
          col("prev_value"), col("next_value"), col("gap_sec"), col("mov_avg3"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // Exact interpolated percentiles per event type (order statistics
    // need a per-group sort — at scale prefer approx_percentile
    // sketches; this is the exact baseline they are validated against).
    "q55_percentiles" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // Fixed-width histogram of event values per type (10 bins over
    // [0, 500); floor-based binning is exact in both engines).
    "q56_histogram" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("bin",
          least(floor(col("value") / 50.0).cast("int"), lit(9)))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("bin"))
    },

    // Correlation / covariance aggregates per event type (rounded —
    // the sums of products are reduction-order sensitive).
    "q57_corr_stats" -> { (s, d) =>
      val k = get_json_object(col("props"), "$.k").cast("double")
      Tables.events(s, d)
        .withColumn("k", k)
        .groupBy(col("event_type"))
        .agg(
          round(corr(col("value"), col("k")), 6).as("corr_vk"),
          round(covar_samp(col("value"), col("k")), 4).as("covar_vk"),
          round(stddev_samp(col("value")), 6).as("sd_value"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // Funnel analysis: earliest view -> first click after it -> first
    // purchase after that, per user; stage = how far the user got.
    // Three bounded aggregations + two key joins — no per-user
    // sequence materialization, so it scales with users, not events.
    "q59_funnel" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val c = ev.where(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .where(col("ts") > col("t_view"))
        .groupBy(col("user_id"), col("t_view"))
        .agg(min(col("ts")).as("t_click"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c.select(col("user_id"), col("t_click")), Seq("user_id"))
        .where(col("ts") > col("t_click"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("t_purchase"))
      v.join(c.select(col("user_id"), col("t_click")), Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .withColumn("stage", lit(1) +
          when(col("t_click").isNotNull, 1).otherwise(0) +
          when(col("t_purchase").isNotNull, 1).otherwise(0))
        .select(col("user_id"), col("t_view"), col("t_click"),
          col("t_purchase"), col("stage"))
        .orderBy(col("user_id"))
    },

    // Sketch aggregates — the 100 TB form of q55/q09, in a
    // DETERMINISTIC formulation both engines can hash-check:
    //   - p50/p99 from a fixed-fraction Bernoulli sample (md5 byte of
    //     event_id < 64 keeps exactly the same ~25% of rows in both
    //     engines) — a reservoir-sample percentile sketch with the
    //     randomness replaced by a content hash;
    //   - distinct users per type from a KMV (bottom-k / theta)
    //     sketch: take the k-th smallest distinct 48-bit md5-derived
    //     hash h_k and estimate (k-1) * 2^48 div h_k — pure integer
    //     arithmetic, bit-equal across engines; groups with fewer
    //     than k distinct hashes fall back to the exact count (the
    //     standard KMV small-cardinality case).
    // Spark's native approx_percentile / approx_count_distinct remain
    // the production one-liners; their (engine-specific, non-oracle-
    // expressible) error is bounded in OperatorsSpec instead.
    // Scale shape: the sample aggregate is one map-side-combined
    // shuffle on event_type; the KMV leg shuffles only DISTINCT
    // (event_type, 8-byte hash) rows — per-group state is bounded by
    // the distinct-hash count, and at 100 TB the bottom-k could
    // further prune with a per-partition top-k before the shuffle.
    "q55b_sketch_stats" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val samp = ev
        .withColumn("in_samp", expr(Tokens.mdByteExpr("event_id")) < SampleByte)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(CASE WHEN in_samp THEN value END, 0.5)"), 6)
            .as("p50_est"),
          round(expr("percentile(CASE WHEN in_samp THEN value END, 0.99)"), 6)
            .as("p99_est"),
          count(when(col("in_samp"), 1)).as("n_sample"),
          count(lit(1)).as("n"))
      val hashes = ev
        .select(col("event_type"),
          md5(concat(lit("u:"), col("user_id").cast("string"))).as("hx"))
        .select(col("event_type"), expr(hex48("hx")).as("h"))
        .distinct()
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      val kmv = hashes
        .withColumn("rn", row_number().over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("nd"),
          max(when(col("rn") === KmvK, col("h"))).as("h_k"))
        .select(col("event_type"),
          coalesce(expr(s"(${KmvK - 1} * 281474976710656) div h_k"), col("nd"))
            .cast("long").as("users_est"))
      samp.join(kmv, Seq("event_type"))
        .select(col("event_type"), col("p50_est"), col("p99_est"),
          col("users_est"), col("n_sample"), col("n"))
        .orderBy(col("event_type"))
    },

    // As-of join: each 'click' event picks the most recent 'purchase'
    // (same user, at-or-before its timestamp) via union + sorted
    // carry-forward — one shuffle, no range cross-product.
    "q52_asof_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val left = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      // right side deduped to one row per (user, ts) for a total order
      val right = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("r_event_id"), max(col("value")).as("r_value"))
      val u = left.select(col("user_id"), col("ts"), lit(1).as("is_left"),
          col("event_id"), col("value"),
          lit(null).cast("long").as("r_event_id"),
          lit(null).cast("double").as("r_value"),
          lit(null).cast("timestamp").as("r_ts"))
        .unionByName(right.select(col("user_id"), col("ts"), lit(0).as("is_left"),
          lit(null).cast("long").as("event_id"),
          lit(null).cast("double").as("value"),
          col("r_event_id"), col("r_value"), col("ts").as("r_ts")))
      // rights sort before lefts at equal ts => "at or before" inclusive
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("asof_event_id", last(col("r_event_id"), ignoreNulls = true).over(w))
        .withColumn("asof_value", last(col("r_value"), ignoreNulls = true).over(w))
        .withColumn("asof_ts", last(col("r_ts"), ignoreNulls = true).over(w))
        .where(col("is_left") === 1)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("asof_ts"), col("asof_event_id"), col("asof_value"))
        .orderBy(col("event_id"))
    },

    // Binned RANGE (interval) join: events × overlapping campaign
    // windows derived from the event time span. The scale-safe
    // formulation — both sides carry a bucket key (bucket width = the
    // campaign step, so each campaign covers exactly 2 buckets) and
    // the join is an EQUI-join on bucket with the range predicate as
    // residual, never a nested-loop/cartesian over the corpus. All
    // boundary math is integer microseconds (`div`), bit-stable
    // across engines. At 100 TB both sides shuffle-partition by
    // bucket; here the 80-row campaign leg simply broadcasts.
    "q67_range_join" -> { (s, d) =>
      val nCamp = 40
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("t"))
      val bounds = ev.agg(min(col("t")).as("tmin"), max(col("t")).as("tmax"))
        .withColumn("step", expr(s"greatest((tmax - tmin) div $nCamp, 1L)"))
      val camp = bounds
        .select(explode(expr(s"sequence(0L, ${nCamp - 1}L)")).as("campaign_id"),
          col("tmin"), col("step"))
        .withColumn("start_us", expr("tmin + campaign_id * step"))
        .withColumn("end_us", expr("start_us + 2 * step"))
      // half-open [start, end): campaign c covers buckets c and c+1
      val campBuckets = camp
        .select(col("campaign_id"), col("start_us"), col("end_us"),
          explode(expr("array(campaign_id, campaign_id + 1)")).as("bucket"))
      val evBuckets = ev.crossJoin(broadcast(bounds.select(col("tmin"), col("step"))))
        .withColumn("bucket", expr("(t - tmin) div step"))
      evBuckets
        .join(broadcast(campBuckets),
          evBuckets("bucket") === campBuckets("bucket") &&
            col("t") >= col("start_us") && col("t") < col("end_us"))
        .select(col("event_id"), col("campaign_id"), col("user_id"))
        .orderBy(col("campaign_id"), col("event_id"))
    },

    // Z-ORDER CLUSTERED RANGE QUERY — the data-layout lifecycle
    // ([[graft.plans.ZOrderLayout]]): the events table is rewritten
    // ONCE per version into a Morton-interleaved layout partitioned by
    // the coarse (user_id, value) cell, and a 2-D box query is served
    // by enumerating the intersecting cells driver-side (two ≤ 8-value
    // ranges — no data touched) into a static partition predicate plus
    // the exact residual filter. At 100 TB the unmatched cells' files
    // are never opened — for boxes AND single-dimension ranges, which
    // a plain single-column sort cannot give both of. Oracle = the
    // plain range SQL over the original table: driver-gated proof the
    // clustered layout answers exactly what the unclustered scan does.
    "q101_zorder_range" -> { (s, d) =>
      val h = graft.plans.ZOrderLayout.ensureSaved(s,
        Tables.events(s, d).select(col("event_id"), col("user_id"),
          col("event_type"), col("value")),
        zorderDir(s, d))
      graft.plans.ZOrderLayout.serve(s, h, 3L, 7L, 50.0, 150.0)
        .orderBy(col("event_id"))
    },

    // The FULL Z-order maintenance lifecycle under the oracle gate:
    // cluster half the table, APPEND the other half (quantized under
    // the saved grid — an append must not shift the residents'
    // layout), COMPACT the fragmented zbuckets back to one z-sorted
    // file each, and serve the box from the compacted layout. Same
    // oracle as q101 — the driver gate proves save → append → compact
    // → serve loses and invents nothing. Each invocation builds its
    // own layout (the mutation IS the operator); q101 stays the
    // serve-only path over the shared artifact.
    "q101b_zorder_lifecycle" -> { (s, d) =>
      val rows = Tables.events(s, d).select(col("event_id"),
        col("user_id"), col("event_type"), col("value"))
      val staging = graft.Fs.createStagingDir(s, "graft-zorder-life")
      try {
        val src = s"$staging/layout"
        graft.plans.ZOrderLayout.save(s,
          rows.where(col("event_id") % 2 === 0), src)
        graft.plans.ZOrderLayout.append(s, src,
          rows.where(col("event_id") % 2 === 1))
        val dest = s"$staging/layout_c"
        graft.plans.ZOrderLayout.compact(s, src, dest)
        val h = graft.plans.ZOrderLayout.load(s, dest)
        // materialized before the finally reclaims the layout files
        graft.Materialize.cut(
            graft.plans.ZOrderLayout.serve(s, h, 3L, 7L, 50.0, 150.0))
          .orderBy(col("event_id"))
      } finally graft.Fs.deleteRecursively(staging,
        s.sparkContext.hadoopConfiguration)
    },

    // Z-ORDER LAYOUT TIME TRAVEL — the TABLE layout joins the
    // snapshot families (it was the one lifecycle with no manifest
    // commits, r15 verdict #2: every index derived from the table had
    // time travel while the biggest artifact of all did not): the even
    // half clusters and commits v1, the odd half APPENDS under the
    // saved grid (v2), the % 7 = 0 slice tombstones (v3 — one appended
    // file inside the manifested tree, nothing rewritten), and a COW
    // purge rewrites ONLY the zbuckets holding tombstoned rows,
    // re-z-sorted (v4, row-identical to v3). The SAME box query serves
    // as-of all four versions; oracle = q101's range SQL per version
    // population. Scale: every leg keeps the zbucket partition pruning
    // through the manifest listing (basePath), tombstones ride a
    // broadcast anti-join, and the purge touches the tombstoned
    // buckets, never the table.
    "q142_zorder_timetravel" -> { (s, d) =>
      import graft.plans.ZOrderLayout
      val rows = Tables.events(s, d).select(col("event_id"),
        col("user_id"), col("event_type"), col("value"))
      val staging = graft.Fs.createStagingDir(s, "graft-zorder-snap")
      try {
        val dir = s"$staging/layout"
        val (_, v1) = ZOrderLayout.saveCommit(s,
          rows.where(col("event_id") % 2 === 0), dir)
        val v2 = ZOrderLayout.appendCommit(s, dir,
          rows.where(col("event_id") % 2 === 1))
        val v3 = ZOrderLayout.deleteCommit(s, dir,
          rows.where(col("event_id") % 7 === 0).select(col("event_id")))
        val v4 = ZOrderLayout.purgeCommit(s, dir)
        def leg(v: Int, tag: Int) =
          ZOrderLayout.serveAsOf(s, dir, v, 3L, 7L, 50.0, 150.0)
            .withColumn("version", lit(tag))
        // materialized before the finally reclaims the layout files
        graft.Materialize.cut(leg(v1, 1).unionByName(leg(v2, 2))
            .unionByName(leg(v3, 3)).unionByName(leg(v4, 4)))
          .select(col("version"), col("event_id"), col("user_id"),
            col("event_type"), col("value"))
          .orderBy(col("version"), col("event_id"))
      } finally graft.Fs.deleteRecursively(staging,
        s.sparkContext.hadoopConfiguration)
    },

    // WATERMARKED STREAM-STREAM INTERVAL JOIN — the one core
    // Structured Streaming join type the suite didn't yet exercise:
    // every click joined to the same user's purchases within the next
    // 30 minutes, both sides streaming. Inner interval joins emit
    // eagerly as matches arrive (no sentinel needed), and the
    // watermark + time-bound condition is what lets the engine EVICT
    // buffered rows once they can no longer match — the state-bounding
    // contract an unbounded firehose needs. The replay derives the
    // delay from the corpus span (staged files arrive in arbitrary
    // event-time order, so a production-sized delay would silently
    // drop cross-file "late" rows — the q78 move); production uses a
    // real delay and pays the documented late-drop trade. Oracle =
    // the batch interval join SQL.
    "q102_stream_stream_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"))
      val spanRow = ev.agg(min(col("ts")), max(col("ts"))).head()
      if (spanRow.isNullAt(0)) {
        ev.select(col("event_id").as("click_id"),
          col("event_id").as("purchase_id"), col("user_id")).limit(0)
      } else {
        val spanSec = (spanRow.getTimestamp(1).getTime -
          spanRow.getTimestamp(0).getTime) / 1000 + 3600
        graft.streaming.Replay.run(s, ev, files = 3, stateParts = Some(4),
          stageKey = Some(s"q102:$d")) { stream =>
          val clicks = stream.where(col("event_type") === "click")
            .select(col("event_id").as("click_id"), col("user_id"),
              col("ts").as("c_ts"))
            .withWatermark("c_ts", s"$spanSec seconds")
          val purchases = stream.where(col("event_type") === "purchase")
            .select(col("event_id").as("purchase_id"),
              col("user_id").as("p_user"), col("ts").as("p_ts"))
            .withWatermark("p_ts", s"$spanSec seconds")
          clicks.join(purchases,
            col("user_id") === col("p_user") &&
              col("p_ts") >= col("c_ts") &&
              col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
            .select(col("click_id"), col("purchase_id"), col("user_id"))
        }.orderBy(col("click_id"), col("purchase_id"))
      }
    },

    // LEFT-OUTER stream-stream interval join — the state-TIMEOUT
    // side of q102: a click with no purchase inside its 30-minute
    // window must still emit (with a null purchase), and streaming
    // can only emit it once the GLOBAL watermark proves no matching
    // purchase can still arrive. That needs both branches' watermarks
    // pushed past the data: two far-future sentinel rows (one per
    // event_type, disjoint synthetic users so they can't match each
    // other), appended after the data files with bumped mtimes so
    // they land in the LAST micro-batch (the q77 sentinel move), then
    // filtered from the output by their negative ids. Oracle = the
    // batch LEFT JOIN interval SQL.
    "q102b_stream_stream_left" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"))
      val spanRow = ev.agg(min(col("ts")), max(col("ts"))).head()
      if (spanRow.isNullAt(0)) {
        ev.select(col("event_id").as("click_id"),
          col("event_id").as("purchase_id"), col("user_id")).limit(0)
      } else {
        val minTs = spanRow.getTimestamp(0)
        val maxTs = spanRow.getTimestamp(1)
        val spanSec = (maxTs.getTime - minTs.getTime) / 1000 + 3600
        val farTs = new java.sql.Timestamp(
          maxTs.getTime + (2 * spanSec + 172800) * 1000L)
        graft.streaming.Replay.run(s, ev, files = 3, stateParts = Some(4),
          afterStage = graft.streaming.Replay.sentinelAfterStage(s,
            Seq(org.apache.spark.sql.Row(-1L, -1L, farTs, "click"),
              org.apache.spark.sql.Row(-2L, -2L, farTs, "purchase")),
            ev.schema),
          stageKey = Some(s"q102b:$d")) { stream =>
          val clicks = stream.where(col("event_type") === "click")
            .select(col("event_id").as("click_id"), col("user_id"),
              col("ts").as("c_ts"))
            .withWatermark("c_ts", s"$spanSec seconds")
          val purchases = stream.where(col("event_type") === "purchase")
            .select(col("event_id").as("purchase_id"),
              col("user_id").as("p_user"), col("ts").as("p_ts"))
            .withWatermark("p_ts", s"$spanSec seconds")
          clicks.join(purchases,
              col("user_id") === col("p_user") &&
                col("p_ts") >= col("c_ts") &&
                col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
              "leftOuter")
            .select(col("click_id"), col("purchase_id"), col("user_id"))
        }
          .where(col("click_id") >= 0)
          .orderBy(col("click_id"), col("purchase_id"))
      }
    },

    // MANIFEST-LEVEL FILE STATISTICS — driver-side scan planning from
    // per-file column bounds (Iceberg's per-file stats / Delta's
    // add-file minValues, layered on the snapshot manifests): the
    // events table lands range-clustered by ts and committed, one
    // stats segment records each file's (ts, value) bounds, and the
    // 3-day range read plans over ONLY the intersecting files — at
    // 10⁶ files the non-intersecting ones are never even opened for
    // their footers, which is the latency that kills object-store
    // scans before the first task launches. Pruning is conservative
    // (unknown files stay, the exact predicate still runs), so the
    // oracle is simply the plain range SQL; the files-opened proof
    // lives in ScaleShapeSpec.
    "q145_stats_skipping" -> { (s, d) =>
      import graft.plans.{FileStats, Snapshots}
      val dir = s"${statsTableDir(s, d)}/data"
      val v = Snapshots.current(s, dir).get
      // canonical-lane bounds derived by the SAME function the stats
      // were recorded with (unix_micros), so session-timezone handling
      // cancels out instead of having to be reasoned about twice
      val b = s.sql(
        "SELECT unix_micros(TIMESTAMP'2024-01-10 00:00:00'), " +
          "unix_micros(TIMESTAMP'2024-01-13 00:00:00')").head()
      FileStats.readPruned(s, dir, v, "ts", b.getLong(0), b.getLong(1))
        .where(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-13 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(min(col("value")), 6).as("min_value"),
          round(max(col("value")), 6).as("max_value"))
        .orderBy(col("event_type"))
    },

    // PARTITIONED-TABLE ROW-LEVEL DML — the q146 tombstone/COW-purge
    // lifecycle with DECLARED hive partitioning (a plain
    // date-partitioned corpus table that is neither Z-ordered nor
    // indexed finally has an erasure path): the events table lands
    // day-sprayed and committed, the even ids of a 2-day slice are
    // tombstoned (v2 — merge-on-read, nothing rewritten; a strict
    // subset, so the purge has survivors to re-spray), and the COW purge
    // re-sprays ONLY the files holding tombstoned rows back into
    // their own day dirs (v3 ≡ v2 rows; the touched set is confined
    // to the 2 tombstoned days by the day clustering — partition-
    // local erasure, proven in ScaleShapeSpec). Oracle = the events
    // population per version.
    "q148_partitioned_delete" -> { (s, d) =>
      import graft.plans.SnapshotTable
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("event_type"),
          col("value"))
        .withColumn("day", to_date(col("ts")))
      val staging = graft.Fs.createStagingDir(s, "graft-part-delete")
      try {
        val dir = s"$staging/events"
        val v1 = SnapshotTable.saveCommit(s,
          ev.repartition(col("day")), dir, partitionCols = Seq("day"))
        val dels = ev.where(
          col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
            col("ts") < lit("2024-01-12 00:00:00").cast("timestamp") &&
            col("event_id") % 2 === 0)
          .select(col("event_id"))
        val v2 = SnapshotTable.deleteCommit(s, dir, dels, "event_id",
          partitionCols = Seq("day"))
        val v3 = SnapshotTable.purgeCommit(s, dir, "event_id",
          partitionCols = Seq("day"))
        def leg(v: Int, tag: Int) =
          SnapshotTable.readAsOf(s, dir, v, "event_id")
            .withColumn("version", lit(tag))
        // materialized before the finally reclaims the staging dir
        graft.Materialize.cut(leg(v1, 1).unionByName(leg(v2, 2))
            .unionByName(leg(v3, 3)))
          .select(col("version"), col("event_id"), col("event_type"))
          .orderBy(col("version"), col("event_id"))
      } finally graft.Fs.deleteRecursively(staging,
        s.sparkContext.hadoopConfiguration)
    },

    // PARTITIONED-TABLE COMPACTION — the OPTIMIZE leg q151 gave flat
    // tables, on the q148 day-sprayed corpus: the per-appendCommit
    // ingest cadence leaves one file per batch per partition (three
    // appends into one hot day = three small files there), a delete
    // tombstones a thin id slice (the pass must keep it PINNED — it is
    // purely physical), and compactCommit(partitionCols) merges each
    // fragmented day to ONE file inside its own dir while untouched
    // days carry byte-identical (proven in ScaleShapeSpec; here the
    // oracle proves the rows). Legs: v1 = pre-hot-day population,
    // v2 = all rows after the appends, v3 = merge-on-read survivors,
    // v4 = post-compaction ≡ v3.
    "q152_partitioned_compact" -> { (s, d) =>
      import graft.plans.SnapshotTable
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("event_type"),
          col("value"))
        .withColumn("day", to_date(col("ts")))
      val hot = ev.where(col("day") === lit("2024-01-10").cast("date"))
      val staging = graft.Fs.createStagingDir(s, "graft-part-compact")
      try {
        val dir = s"$staging/events"
        val v1 = SnapshotTable.saveCommit(s,
          ev.where(col("day") =!= lit("2024-01-10").cast("date"))
            .repartition(col("day")), dir, partitionCols = Seq("day"))
        var v2 = v1
        for (i <- 0 to 2)
          v2 = SnapshotTable.appendCommit(s, dir,
            hot.where(pmod(col("event_id"), lit(3)) === i), "event_id",
            partitionCols = Seq("day"))
        val dels = ev.where(col("event_id") % 97 === 0)
          .select(col("event_id"))
        val v3 = SnapshotTable.deleteCommit(s, dir, dels, "event_id",
          partitionCols = Seq("day"))
        val v4 = SnapshotTable.compactCommit(s, dir, maxFiles = 1,
          partitionCols = Seq("day"))
        def leg(v: Int, tag: Int) =
          SnapshotTable.readAsOf(s, dir, v, "event_id")
            .withColumn("version", lit(tag))
        graft.Materialize.cut(leg(v1, 1).unionByName(leg(v2, 2))
            .unionByName(leg(v3, 3)).unionByName(leg(v4, 4)))
          .select(col("version"), col("event_id"), col("event_type"))
          .orderBy(col("version"), col("event_id"))
      } finally graft.Fs.deleteRecursively(staging,
        s.sparkContext.hadoopConfiguration)
    },

    // PARTITION-LEVEL RETENTION — the erasure q148's row-level form is
    // NOT for: "drop days older than X" on a day-sprayed corpus is a
    // pure manifest selection swap (dropPartitionsCommit — no file
    // read, written, or deleted; one manifest delta however many
    // terabytes the dropped days hold), the erasure unit being the
    // partition itself, no tombstones involved. v1 keeps serving the
    // dropped days until expire — retention and time travel coexist,
    // which an rm -rf of the day dirs can never give. Oracle = the
    // population per version: v1 everything, v2 = days >= the cutoff.
    "q154_partition_drop" -> { (s, d) =>
      import graft.plans.SnapshotTable
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("event_type"))
        .withColumn("day", to_date(col("ts")))
      val staging = graft.Fs.createStagingDir(s, "graft-part-drop")
      try {
        val dir = s"$staging/events"
        val v1 = SnapshotTable.saveCommit(s,
          ev.repartition(col("day")), dir, partitionCols = Seq("day"))
        // ISO day values compare lexicographically in hive spelling
        val v2 = SnapshotTable.dropPartitionsCommit(s, dir, Seq("day"),
          kv => kv("day") < "2024-01-03")
        def leg(v: Int, tag: Int) =
          SnapshotTable.readAsOf(s, dir, v, "event_id")
            .withColumn("version", lit(tag))
        graft.Materialize.cut(leg(v1, 1).unionByName(leg(v2, 2)))
          .select(col("version"), col("event_id"), col("event_type"))
          .orderBy(col("version"), col("event_id"))
      } finally graft.Fs.deleteRecursively(staging,
        s.sparkContext.hadoopConfiguration)
    },
  )

  private val statsTableMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  /** Session-scoped committed events table for q145, range-clustered
    * by ts (repartitionByRange gives each file a tight disjoint ts
    * band — the layout stats skipping exists for) with one recorded
    * stats segment; built once per (session, sfDir). */
  private def statsTableDir(s: SparkSession, d: String): String =
    statsTableMemo.computeIfAbsent((s, d), _ => {
      val dir = graft.Fs.createStagingDir(s, "graft-filestats")
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        graft.Fs.deleteRecursively(dir)))
      Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .repartitionByRange(24, col("ts"))
        .sortWithinPartitions(col("ts"))
        .write.parquet(s"$dir/data")
      val v = graft.plans.Snapshots.commit(s, s"$dir/data")
      graft.plans.FileStats.recordFor(s, s"$dir/data", v,
        Seq("ts", "value"))
      dir
    })

  private val zorderDirMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  /** Session-scoped layout directory for the Z-ordered events table
    * (q101), one per (session, sfDir) — the Similarity.indexDir
    * pattern. */
  private def zorderDir(s: SparkSession, d: String): String =
    zorderDirMemo.computeIfAbsent((s, d), _ => {
      val dir = graft.Fs.createStagingDir(s, "graft-zorder")
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        graft.Fs.deleteRecursively(dir)))
      dir
    })

  def oracle: Map[String, String] = oracleBase ++ Map(
    // stats skipping is a pure scan-planning optimization: the pruned
    // read + exact predicate must answer exactly the plain range scan
    "q145_stats_skipping" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(min(value), 6) AS min_value,
        |  round(max(value), 6) AS max_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-13 00:00:00'
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // v1 everything, v2 merge-on-read survivors of the 2-day delete,
    // v3 post-purge ≡ v2 (the purge is purely physical)
    "q148_partitioned_delete" -> {
      def leg(tag: Int, popWhere: String) =
        s"""SELECT $tag AS version, event_id, event_type
           |FROM events WHERE $popWhere""".stripMargin
      val deleted = "ts >= TIMESTAMP '2024-01-10 00:00:00' AND " +
        "ts < TIMESTAMP '2024-01-12 00:00:00' AND event_id % 2 = 0"
      Seq(leg(1, "TRUE"), leg(2, s"NOT ($deleted)"),
          leg(3, s"NOT ($deleted)"))
        .mkString("\nUNION ALL\n") + "\nORDER BY version, event_id"
    },
    // v1 all but the hot day, v2 everything after the appends, v3
    // merge-on-read survivors of the % 97 delete, v4 post-compaction
    // ≡ v3 (the pass is purely physical; tombstones stay pinned)
    "q152_partitioned_compact" -> {
      def leg(tag: Int, popWhere: String) =
        s"""SELECT $tag AS version, event_id, event_type
           |FROM events WHERE $popWhere""".stripMargin
      val hotDay = "ts >= TIMESTAMP '2024-01-10 00:00:00' AND " +
        "ts < TIMESTAMP '2024-01-11 00:00:00'"
      Seq(leg(1, s"NOT ($hotDay)"), leg(2, "TRUE"),
          leg(3, "event_id % 97 <> 0"), leg(4, "event_id % 97 <> 0"))
        .mkString("\nUNION ALL\n") + "\nORDER BY version, event_id"
    },
    // v1 everything, v2 = the days surviving the retention cutoff
    // (the drop is a pure selection swap — v1 still serves the
    // dropped days)
    "q154_partition_drop" -> {
      def leg(tag: Int, popWhere: String) =
        s"""SELECT $tag AS version, event_id, event_type
           |FROM events WHERE $popWhere""".stripMargin
      Seq(leg(1, "TRUE"),
          leg(2, "ts >= TIMESTAMP '2024-01-03 00:00:00'"))
        .mkString("\nUNION ALL\n") + "\nORDER BY version, event_id"
    },
    // the streaming sessionization must equal the batch form exactly
    "q51s_stream_sessionize" -> oracleBase("q51_sessionize"),
    // the clustered layout must answer exactly what the unclustered
    // scan does
    "q101_zorder_range" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events
        |WHERE user_id BETWEEN 3 AND 7 AND value BETWEEN 50 AND 150
        |ORDER BY event_id""".stripMargin,
    // save → append → compact → serve must still answer exactly the
    // unclustered range scan
    "q101b_zorder_lifecycle" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events
        |WHERE user_id BETWEEN 3 AND 7 AND value BETWEEN 50 AND 150
        |ORDER BY event_id""".stripMargin,
    // q142: q101's range SQL per snapshot-version population — v1 the
    // clustered evens, v2 everything, v3/v4 the % 7 survivors (the
    // purge is purely physical, so leg 4 ≡ leg 3)
    "q142_zorder_timetravel" -> {
      def leg(tag: Int, popWhere: String) =
        s"""SELECT $tag AS version, event_id, user_id, event_type, value
           |FROM events
           |WHERE user_id BETWEEN 3 AND 7 AND value BETWEEN 50 AND 150
           |  AND ($popWhere)""".stripMargin
      Seq(
        leg(1, "event_id % 2 = 0"),
        leg(2, "TRUE"),
        leg(3, "event_id % 7 <> 0"),
        leg(4, "event_id % 7 <> 0"))
        .mkString("\nUNION ALL\n") + "\nORDER BY version, event_id"
    },
    // the streaming interval join must equal the batch interval join
    "q102_stream_stream_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
        |  c.user_id
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        | AND CAST(p.ts AS TIMESTAMP) <=
        |     CAST(c.ts AS TIMESTAMP) + INTERVAL '30 minutes'
        |ORDER BY click_id, purchase_id""".stripMargin,
    // the streaming left-outer interval join must equal the batch one
    "q102b_stream_stream_left" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
        |  c.user_id
        |FROM events c LEFT JOIN events p
        |  ON c.user_id = p.user_id
        | AND p.event_type = 'purchase'
        | AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        | AND CAST(p.ts AS TIMESTAMP) <=
        |     CAST(c.ts AS TIMESTAMP) + INTERVAL '30 minutes'
        |WHERE c.event_type = 'click'
        |ORDER BY click_id, purchase_id""".stripMargin,
  )

  private def oracleBase: Map[String, String] = Map(
    "q50_window_agg" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    // the streaming guise must equal the batch aggregation exactly
    "q77_stream_window_agg" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q51_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP))
        |                OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sess AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM e)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE) / 1e6 AS duration_sec
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "q59_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, min(ts) AS t_view FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |  FROM ev e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view
        |  GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM ev e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |  GROUP BY e.user_id)
        |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
        |  1 + (CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END)
        |    + (CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS stage
        |FROM v
        |LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,
    "q56_histogram" ->
      """SELECT event_type,
        |  CAST(least(floor(value / 50.0), 9) AS INTEGER) AS bin,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin,
    "q57_corr_stats" ->
      """WITH t AS (
        |  SELECT event_type, value,
        |    CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
        |  FROM events)
        |SELECT event_type,
        |  round(corr(value, k), 6) AS corr_vk,
        |  round(covar_samp(value, k), 4) AS covar_vk,
        |  round(stddev_samp(value), 6) AS sd_value,
        |  count(*) AS n
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q55_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q55b_sketch_stats" ->
      s"""WITH hs AS (
         |  SELECT DISTINCT event_type, ${hex48("hx")} AS h FROM (
         |    SELECT event_type, md5('u:' || CAST(user_id AS VARCHAR)) AS hx
         |    FROM events)),
         |r AS (
         |  SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |  FROM hs),
         |kmv AS (
         |  SELECT event_type,
         |    CAST(COALESCE(
         |      (${KmvK - 1} * 281474976710656) // max(CASE WHEN rn = $KmvK THEN h END),
         |      count(*)) AS BIGINT) AS users_est
         |  FROM r GROUP BY event_type),
         |s AS (
         |  SELECT event_type,
         |    round(quantile_cont(CASE WHEN ${Tokens.mdByteSql("event_id")} < $SampleByte
         |      THEN value END, 0.5), 6) AS p50_est,
         |    round(quantile_cont(CASE WHEN ${Tokens.mdByteSql("event_id")} < $SampleByte
         |      THEN value END, 0.99), 6) AS p99_est,
         |    CAST(count(CASE WHEN ${Tokens.mdByteSql("event_id")} < $SampleByte
         |      THEN 1 END) AS BIGINT) AS n_sample,
         |    count(*) AS n
         |  FROM events GROUP BY event_type)
         |SELECT s.event_type, s.p50_est, s.p99_est, kmv.users_est, s.n_sample, s.n
         |FROM s JOIN kmv USING (event_type) ORDER BY event_type""".stripMargin,
    "q53_sliding_window" ->
      """WITH b AS (
        |  SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS ws,
        |         event_type, value FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) - INTERVAL '1 hour',
        |         event_type, value FROM events)
        |SELECT ws AS window_start, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM b GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q54_lag_analytics" ->
      """SELECT user_id, event_id, value,
        |  lag(value) OVER w AS prev_value,
        |  lead(value) OVER w AS next_value,
        |  CAST(epoch_us(CAST(ts AS TIMESTAMP))
        |    - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) AS DOUBLE) / 1e6 AS gap_sec,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg3
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q52_asof_join" ->
      """WITH l AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'click'),
        |r AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    max(event_id) AS r_event_id, max(value) AS r_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.ts, l.value,
        |  r.ts AS asof_ts, r.r_event_id AS asof_event_id, r.r_value AS asof_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    // the oracle uses the direct non-equi range join — small data; the
    // Spark side's binned equi-join must produce the identical pairs
    "q67_range_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
        |  FROM events),
        |bounds AS (
        |  SELECT min(t) AS tmin, max(t) AS tmax,
        |    greatest((max(t) - min(t)) // 40, 1) AS step
        |  FROM ev),
        |camp AS (
        |  SELECT CAST(c.campaign_id AS BIGINT) AS campaign_id,
        |    b.tmin + c.campaign_id * b.step AS start_us,
        |    b.tmin + c.campaign_id * b.step + 2 * b.step AS end_us
        |  FROM (SELECT unnest(range(0, 40)) AS campaign_id) c
        |  CROSS JOIN bounds b)
        |SELECT e.event_id, c.campaign_id, e.user_id
        |FROM ev e JOIN camp c ON e.t >= c.start_us AND e.t < c.end_us
        |ORDER BY c.campaign_id, e.event_id""".stripMargin,
  )
}
