package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * partition-local typed transforms.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC FAKE (clearly marked below): it derives features from
  * raw bytes only. Everything around it — the binary column schema,
  * the metadata struct, the `Dataset[T]` encoder plumbing, the
  * `mapPartitions` batch shape (one iterator per partition, the Scala
  * analogue of a Pandas-UDF batch), partition-preserving execution —
  * is real and tested. A production deployment swaps `fakeDecode` for
  * a codec call; nothing else changes.
  *
  * Scale notes: media bytes never shuffle — every stage is map-only on
  * the scan partitioning; features/metadata (small columns) are what
  * downstream joins/aggregations touch. Frame sampling explodes only
  * bounded index arrays, never byte payloads.
  */
object Multimodal {

  /** Typed row for the decode stage. */
  final case class MediaRow(doc_id: Long, media_type: String, media: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_type: String,
      byte_len: Int, first_byte: Int, checksum: Long)

  /** Attach a synthetic opaque payload + typed metadata to each doc
    * (payload = utf-8 text bytes standing in for real media bytes). */
  def withMedia(docs: DataFrame): DataFrame =
    docs
      .withColumn("media", col("text").cast("binary"))
      .withColumn("media_type",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")))
      .withColumn("meta", struct(
        (col("doc_id") % 640 + 16).cast("int").as("width"),
        (col("doc_id") % 480 + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") % 240 + 1).cast("int").as("n_frames")))

  /** STUB DECODE — deterministic fake standing in for a codec: reads
    * raw bytes only (length, first byte, additive checksum of the
    * first 64 bytes mod 997). Partition-local, zero shuffle. */
  def fakeDecode(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val n = r.media.length
      val first = if (n > 0) r.media(0) & 0xFF else -1
      var sum = 0L
      var i = 0
      while (i < math.min(64, n)) { sum += (r.media(i) & 0xFF); i += 1 }
      MediaFeatures(r.doc_id, r.media_type, n, first, sum % 997)
    }

  /** The typed decode pass: Dataset[MediaRow] -> mapPartitions. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("media_type"), col("media"))
      .as[MediaRow]
      .mapPartitions(fakeDecode)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Schema/metadata plumbing: typed metadata + payload size without
    // ever decoding (octet_length on the binary column).
    "q70_media_meta" -> { (s, d) =>
      withMedia(Tables.documents(s, d))
        .select(col("doc_id"), col("media_type"),
          octet_length(col("media")).as("n_bytes"),
          col("meta.width"), col("meta.height"), col("meta.n_frames"))
        .orderBy(col("doc_id"))
    },

    // The mapPartitions decode stage (STUBBED codec, real plumbing).
    "q71_media_features" -> { (s, d) =>
      decodeFeatures(withMedia(Tables.documents(s, d)))
        .toDF()
        .orderBy(col("doc_id"))
    },

    // Frame sampling: every 10th frame index for video rows — explodes
    // a bounded index array, never payload bytes.
    "q72_frame_sample" -> { (s, d) =>
      withMedia(Tables.documents(s, d))
        .where(col("media_type") === "video")
        .select(col("doc_id"), col("meta.n_frames"),
          explode(expr("sequence(0, meta.n_frames - 1, 10)")).as("frame_idx"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // Audio metadata: estimated duration from payload size (16-bit
    // mono at the typed sample rate — STUB arithmetic standing in for
    // a codec header parse) + 25 ms analysis-window count.
    "q74_audio_meta" -> { (s, d) =>
      withMedia(Tables.documents(s, d))
        .where(col("media_type") === "audio")
        .withColumn("duration_sec", round(
          octet_length(col("media")).cast("double") /
            (col("meta.sample_rate").cast("double") * 2.0), 6))
        .select(col("doc_id"), col("meta.sample_rate").as("sample_rate"),
          octet_length(col("media")).as("n_bytes"),
          col("duration_sec"),
          ceil(col("duration_sec") / 0.025).cast("int").as("n_windows_25ms"))
        .orderBy(col("doc_id"))
    },

    // Resize stub: pure metadata transform (halved dims, aspect kept).
    "q73_media_resize" -> { (s, d) =>
      withMedia(Tables.documents(s, d))
        .where(col("media_type") === "image")
        .select(col("doc_id"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          greatest(floor(col("meta.width") / 2).cast("int"), lit(1)).as("out_width"),
          greatest(floor(col("meta.height") / 2).cast("int"), lit(1)).as("out_height"))
        .orderBy(col("doc_id"))
    },
  )

  // The payload bytes are the utf-8 text bytes (ASCII corpus), so the
  // oracle can recompute byte arithmetic via ascii(substring(text,i,1)).
  def oracle: Map[String, String] = Map(
    "q70_media_meta" ->
      """SELECT doc_id,
        |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
        |  length(text) AS n_bytes,
        |  CAST(doc_id % 640 + 16 AS INTEGER) AS width,
        |  CAST(doc_id % 480 + 16 AS INTEGER) AS height,
        |  CAST(n_chars % 240 + 1 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q71_media_features" ->
      """SELECT doc_id,
        |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
        |  CAST(length(text) AS INTEGER) AS byte_len,
        |  CAST(ascii(substring(text, 1, 1)) AS INTEGER) AS first_byte,
        |  CAST(list_sum(list_transform(range(1, least(64, length(text)) + 1),
        |    i -> ascii(substring(text, i, 1)))) % 997 AS BIGINT) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q72_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(n_chars % 240 + 1 AS INTEGER) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id, n_frames, CAST(f.range AS INTEGER) AS frame_idx
        |FROM m CROSS JOIN range(0, 240, 10) f
        |WHERE f.range < n_frames
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q74_audio_meta" ->
      """SELECT doc_id, 16000 AS sample_rate,
        |  length(text) AS n_bytes,
        |  round(CAST(length(text) AS DOUBLE) / (16000.0 * 2.0), 6) AS duration_sec,
        |  CAST(ceil(round(CAST(length(text) AS DOUBLE) / (16000.0 * 2.0), 6) / 0.025) AS INTEGER) AS n_windows_25ms
        |FROM documents WHERE doc_id % 3 = 1
        |ORDER BY doc_id""".stripMargin,
    "q73_media_resize" ->
      """SELECT doc_id,
        |  CAST(doc_id % 640 + 16 AS INTEGER) AS width,
        |  CAST(doc_id % 480 + 16 AS INTEGER) AS height,
        |  greatest(CAST(floor((doc_id % 640 + 16) / 2) AS INTEGER), 1) AS out_width,
        |  greatest(CAST(floor((doc_id % 480 + 16) / 2) AS INTEGER), 1) AS out_height
        |FROM documents WHERE doc_id % 3 = 0
        |ORDER BY doc_id""".stripMargin,
  )
}
