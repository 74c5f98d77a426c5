package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, Temporal}

/** In-repo batch≡stream parity and invariants for the round-5
  * streaming/clustering operators (the driver's DuckDB gate proves
  * the same equalities at sf0.01; these run them at sf0.001 on every
  * `sbt test`).
  */
class StreamBatchParitySpec extends SparkSpec {

  test("q77: watermarked streaming window agg equals batch q50 exactly") {
    val s = spark
    val batch = Temporal.queries("q50_window_agg")(s, sf)
    val stream = Temporal.queries("q77_stream_window_agg")(s, sf)
    // row-identical both ways (schema-aligned except: count both directions)
    assert(stream.count() === batch.count())
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("q51s: streaming session_window equals batch q51 exactly") {
    val s = spark
    val batch = Temporal.queries("q51_sessionize")(s, sf)
    val stream = Temporal.queries("q51s_stream_sessionize")(s, sf)
    assert(stream.count() === batch.count())
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("q75: stream dup flags equal the batch band-collision predicate") {
    val s = spark
    val out = Dedup.queries("q75_stream_dup_filter")(s, sf)
    val incoming = Tables.documents(s, sf)
      .where(col("doc_id") % 10 === 7).count()
    assert(out.count() === incoming)
    // n_bands_hit bounded by the band count; flag consistent with count
    val bad = out.where(
      col("n_bands_hit") < 0 || col("n_bands_hit") > Dedup.Bands ||
        (col("is_dup") =!= (col("n_bands_hit") > 0))).count()
    assert(bad === 0)
  }

  test("q78's production form: a small fixed TTL bounds state and re-admits late dups") {
    // q78's oracle gate derives its watermark delay from max(doc_id) so
    // no digest expires during the replay (output ≡ batch DISTINCT).
    // The production operator instead runs a small FIXED TTL and trades
    // exactness for bounded state: digests older than the delay are
    // evicted, and a duplicate arriving after eviction is re-admitted.
    // This exercises that trade directly: 3 staged files → serialized
    // micro-batches, 60 s TTL, a deliberate late duplicate in batch 3.
    val s = spark
    import s.implicits._
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.streaming.Trigger
    val stage = Files.createTempDirectory("graft-ttl-stage").toString
    try {
      def stageBatch(name: String, mtimeOffsetSec: Int,
          rows: Seq[(Long, String, Long)]): Unit = {
        val tmp = Files.createTempDirectory("graft-ttl-batch").toString
        rows.toDF("doc_id", "content_md5", "sec")
          .select($"doc_id", $"content_md5",
            timestamp_seconds($"sec").as("ts"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head.toPath
        val dest = Paths.get(s"$stage/$name")
        Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dest, java.nio.file.attribute.FileTime
          .fromMillis(System.currentTimeMillis() + mtimeOffsetSec * 1000L))
        Fs.deleteRecursively(tmp)
      }
      // batch 1: A and B early; batch 2: C far ahead — advances the
      // watermark past A/B's expiry under the 60 s TTL; batch 3 (D)
      // runs under that advanced watermark, so its end-of-batch
      // cleanup evicts A/B (eviction is lazy — it happens in the
      // first batch EXECUTED with the advanced watermark, not the one
      // that advanced it); batch 4: A again, after eviction
      stageBatch("b1.parquet", 0, Seq((1L, "A", 1000L), (2L, "B", 1001L)))
      stageBatch("b2.parquet", 60, Seq((3L, "C", 50000L)))
      stageBatch("b3.parquet", 120, Seq((4L, "D", 50002L)))
      stageBatch("b4.parquet", 180, Seq((5L, "A", 50003L)))
      val schema = s.read.parquet(s"$stage/b1.parquet").schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
        .withWatermark("ts", "60 seconds")
        .dropDuplicatesWithinWatermark("content_md5")
        .writeStream.format("memory").queryName("ttl_dedup")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try assert(q.awaitTermination(120000), "TTL replay timed out")
      finally q.stop()
      val out = s.table("ttl_dedup").select($"content_md5")
        .as[String].collect().toSeq
      // the late duplicate is ADMITTED (the TTL-vs-exactness trade);
      // in-TTL duplicates would still dedup (none staged here)
      assert(out.count(_ == "A") === 2, s"late dup not re-admitted: $out")
      assert(out.count(_ == "B") === 1)
      assert(out.count(_ == "C") === 1)
      assert(out.count(_ == "D") === 1)
      // state actually SHRANK when the watermark passed: A and B were
      // evicted, and the final state holds only the young digests
      val progs = q.recentProgress.toSeq.flatMap(_.stateOperators)
      assert(progs.map(_.numRowsRemoved).sum >= 2,
        s"no state eviction observed: ${progs.map(_.numRowsRemoved).toList}")
      val finalState = progs.lastOption.map(_.numRowsTotal)
      assert(finalState.exists(_ <= 3),
        s"state did not stay bounded: $finalState")
      s.catalog.dropTempView("ttl_dedup")
    } finally Fs.deleteRecursively(stage)
  }

  test("q110s: streamed incremental clusters equal the one-shot q110 exactly") {
    val s = spark
    val batch = Dedup.queries("q110_incremental_clusters")(s, sf)
    val stream = Dedup.queries("q110s_stream_clusters")(s, sf)
    assert(stream.count() === batch.count())
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("q110s: cross-batch merges through the persisted label table " +
      "(an absorbed batch id can BE a cluster label)") {
    val s = spark
    import s.implicits._
    // constructed corpus — the replay slices batches as
    // batch1 = %30==0, batch2 = %30==10, batch3 = %30==20:
    //  residents: {11,21}=A, {13}=B, {41,51}=W
    //  batch1: 30=W (LOWERS resident cluster 41 to label 30),
    //          60=Z (new singleton)
    //  batch2: 70=Z (merges with 60 VIA THE INDEX SERVE — label node
    //          60 has doc_id%10==0, so id-arithmetic tagging would
    //          misread it as a batch node; membership tagging must
    //          not), 100=A (merges resident cluster 11)
    //  batch3: 50=B (merges 13), 80=Q (new singleton)
    val A = "alpha beta gamma delta epsilon zeta eta theta"
    val B = "one two three four five six seven eight"
    val W = "north south east west up down left right"
    val Z = "red green blue yellow purple orange black white"
    val Q = "spring summer autumn winter morning noon evening night"
    val staging = java.nio.file.Files.createTempDirectory("q110s_x").toString
    try {
      Seq((11L, A), (21L, A), (13L, B), (41L, W), (51L, W),
          (30L, W), (60L, Z), (70L, Z), (100L, A), (50L, B), (80L, Q))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length($"text").cast("long"))
        .write.parquet(s"$staging/documents.parquet")
      val out = Dedup.queries("q110s_stream_clusters")(s, staging)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === Map(11L -> 11L, 21L -> 11L, 100L -> 11L,
        13L -> 13L, 50L -> 13L, 41L -> 30L, 51L -> 30L, 30L -> 30L,
        60L -> 60L, 70L -> 60L, 80L -> 80L), s"got $out")
      // and the streamed path equals the one-shot form on the same
      // constructed corpus (both must equal the full recompute)
      val one = Dedup.queries("q110_incremental_clusters")(s, staging)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === one)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(staging))
  }

  test("q76: semantic dedup keeps the id-minimal member of every cell") {
    val s = spark
    import s.implicits._
    val out = Similarity.queries("q76_semantic_dedup")(s, sf)
    assert(out.count() ===
      Tables.embeddings(s, sf).count())
    // every cell retains at least one kept vector, and the smallest
    // vec_id of each cell is always kept (it has no lower-id cell-mate)
    val minAll = out.groupBy($"cid").agg(min($"vec_id").as("min_vec"))
    val minKept = out.where($"kept")
      .groupBy($"cid").agg(min($"vec_id").as("min_kept"))
    val bad76 = minAll.join(minKept, Seq("cid"), "left")
      .where($"min_kept".isNull || $"min_kept" =!= $"min_vec").count()
    assert(bad76 === 0)
  }
}
