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
