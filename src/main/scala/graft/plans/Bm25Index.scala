package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Persisted BM25 lexical index — the text twin of [[PqIndex]]/
  * [[IvfTopK]]'s vector lifecycles: tokenize and aggregate the corpus
  * ONCE per version, persist the index relations, and serve any query
  * from the artifacts without re-reading a single document.
  *
  * Artifact layout under `indexDir`:
  *   - `postings/` — (doc_id, term, tf, dl), the corpus-sized relation
  *     (one row per distinct doc×term), partitioned by `tbucket` =
  *     crc32(term) mod [[Buckets]] so a query's terms prune the scan
  *     to their buckets at the FILE level — at 100 TB a 3-term query
  *     opens ~3/[[Buckets]] of the index, not all of it (a raw
  *     `partitionBy(term)` would mint one directory per vocabulary
  *     entry — millions of tiny files — so terms hash into a bounded
  *     bucket space instead);
  *   - `terms/`    — (term, df), vocabulary-sized;
  *   - `stats/`    — one row (n_docs, avgdl);
  *   - `meta/`     — the source documents path.
  *
  * `serve` computes exactly [[TextAnalysis.bm25ScoreFrom]] over the
  * pruned reads, so served scores equal the fresh computation bit for
  * bit (the shared-scorer contract; q97b's oracle re-proves it against
  * DuckDB per round).
  */
object Bm25Index {

  /** Term-hash partition count for the postings table. */
  val Buckets = 64

  final case class Handle(docsPath: String, postingsPath: String,
      termsPath: String, statsPath: String)

  private def tbucket(c: org.apache.spark.sql.Column) =
    pmod(crc32(c.cast("string")), lit(Buckets)).cast("int")

  /** Build the full index relations for `sfDir`'s documents table and
    * persist them under `indexDir` — the one-off indexing job. */
  def save(s: SparkSession, sfDir: String, indexDir: String): Handle = {
    val base = IvfTopK.qualify(s, indexDir)
    val docsPath = IvfTopK.qualify(s, s"$sfDir/documents.parquet")
    val (postings, terms, stats) = TextAnalysis.bm25Relations(s, sfDir)
    postings.withColumn("tbucket", tbucket(col("term")))
      .write.mode("overwrite").partitionBy("tbucket")
      .parquet(s"$base/postings")
    terms.write.mode("overwrite").parquet(s"$base/terms")
    stats.coalesce(1).write.mode("overwrite").parquet(s"$base/stats")
    import s.implicits._
    Seq(docsPath).toDF("docs_path")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/meta")
    Handle(docsPath, s"$base/postings", s"$base/terms", s"$base/stats")
  }

  private val savedDirs = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Handle]()

  /** [[save]] exactly once per (session, indexDir) — the oracle-gated
    * serve query (q97b) goes through this so bench sweeps re-serve
    * from the artifacts instead of re-indexing per invocation. */
  def ensureSaved(s: SparkSession, sfDir: String, indexDir: String): Handle =
    savedDirs.computeIfAbsent((s, IvfTopK.qualify(s, indexDir)),
      _ => save(s, sfDir, indexDir))

  /** Reconstruct a handle from saved artifacts. */
  def load(s: SparkSession, indexDir: String): Handle = {
    val base = IvfTopK.qualify(s, indexDir)
    val docsPath = s.read.parquet(s"$base/meta").head().getString(0)
    Handle(docsPath, s"$base/postings", s"$base/terms", s"$base/stats")
  }

  /** BM25 scores of `queryTerms` against every matching document,
    * served from the SAVED artifacts alone: the postings scan carries
    * a static `tbucket IN (...)` partition filter plus the pushed
    * term predicate, the df/stats sides are vocabulary- and one-row-
    * sized, and the scorer is [[TextAnalysis.bm25ScoreFrom]] verbatim.
    * Returns (doc_id, bm25, n_matched), unordered — same contract as
    * the fresh [[TextAnalysis.bm25Agg]]. */
  def serve(s: SparkSession, h: Handle,
      queryTerms: Seq[String]): DataFrame = {
    // driver-side twin of the save-time tbucket column: CRC32 of the
    // UTF-8 term bytes (exactly Spark's crc32 over a string cast),
    // non-negative, so % equals pmod
    val buckets = queryTerms.map { t =>
      val c = new java.util.zip.CRC32()
      c.update(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.lang.Integer.valueOf((c.getValue % Buckets).toInt)
    }.distinct
    val tf = s.read.parquet(h.postingsPath)
      .where(col("tbucket").isin(buckets: _*))
      .where(col("term").isin(queryTerms: _*))
      .select(col("doc_id"), col("term"), col("tf"), col("dl"))
    val df = s.read.parquet(h.termsPath)
      .where(col("term").isin(queryTerms: _*))
    val stats = s.read.parquet(h.statsPath)
    TextAnalysis.bm25ScoreFrom(tf, df, stats)
  }
}
