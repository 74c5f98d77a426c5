package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Similarity

/** Product-quantization index lifecycle — the PQ twin of
  * [[IvfTopK]]'s IVF lifecycle: train once per corpus version, persist
  * the model artifacts, load them in any later session and serve ADC
  * queries WITHOUT retraining or touching the float vectors.
  *
  * Artifact layout under `indexDir`:
  *   - `codebooks/` — the PqM×PqK trained codewords (j, cid, cv);
  *     k-rows-scale, the only thing the query side broadcasts;
  *   - `codes/`     — the encoded corpus as (vec_id, j, cid): the
  *     FAISS codes table in exploded layout (8 rows × 3 ints per
  *     vector ≈ the packed 8-byte code, trades packing for
  *     join-ability; q89's packed form shows the bit layout);
  *   - `meta/`      — the source embeddings path, so `load` can
  *     sanity-name what the artifacts were built from.
  *
  * At 100 TB only `codes/` is corpus-sized, and serving a query scans
  * exactly it — `save` is the one-off training job, `load` reads the
  * k-row codebooks and one-row meta on the driver and leaves the
  * codes on disk for the scan.
  */
object PqIndex {

  final case class Handle(embPath: String, codebookPath: String,
      codesPath: String)

  /** Train (or reuse the session-memoized) PQ model for `sfDir`'s
    * embeddings table and persist its artifacts under `indexDir`.
    * Returns the handle `serve` consumes. */
  def save(s: SparkSession, sfDir: String, indexDir: String): Handle = {
    val base = IvfTopK.qualify(s, indexDir)
    val embPath = IvfTopK.qualify(s, s"$sfDir/embeddings.parquet")
    val (cents, encoded) = Similarity.pqModel(s, sfDir)
    cents.write.mode("overwrite").parquet(s"$base/codebooks")
    encoded.write.mode("overwrite").parquet(s"$base/codes")
    import s.implicits._
    Seq(embPath).toDF("emb_path")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/meta")
    Handle(embPath, s"$base/codebooks", s"$base/codes")
  }

  /** Reconstruct a handle from saved artifacts — no retraining, no
    * corpus scan; the driver reads back only the one-row meta. */
  def load(s: SparkSession, indexDir: String): Handle = {
    val base = IvfTopK.qualify(s, indexDir)
    val embPath = s.read.parquet(s"$base/meta").head().getString(0)
    Handle(embPath, s"$base/codebooks", s"$base/codes")
  }

  /** ADC top-k against the SAVED artifacts (the q89b query path with
    * disk-sourced model frames): broadcast lookup table from the
    * reloaded codebooks, distance sum over the persisted codes. The
    * embeddings table is touched only for the one query row. */
  def serve(s: SparkSession, h: Handle): DataFrame =
    Similarity.pqAdcTopK(
      s.read.parquet(h.embPath),
      s.read.parquet(h.codebookPath),
      s.read.parquet(h.codesPath))
}
