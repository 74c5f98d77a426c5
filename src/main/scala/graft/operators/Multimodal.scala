package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * partition-local typed transforms.
  *
  * The IMAGE leg is decoded by a REAL codec: image rows carry an
  * actual binary P6 PPM payload (synthesized deterministically per
  * row — small real dimensions standing in for bytes an object store
  * would serve) and [[PpmCodec]] parses the genuine format grammar —
  * header, comments, raster — before feature extraction, so q71's
  * width/height/mean/checksum come from REAL PIXELS, with the decoded
  * header dims authoritative over the catalog metadata struct (the
  * "trust but verify" check a real pipeline runs). The AUDIO leg is
  * likewise real: audio rows carry an actual RIFF/WAV 16-bit PCM
  * binary and [[WavCodec]] parses the genuine container grammar, so
  * q74's sample rate/count/RMS/peak come from DECODED SAMPLES. The
  * VIDEO leg completes the set: video rows carry an actual YUV4MPEG2
  * stream and [[Y4mCodec]] parses the genuine container grammar —
  * stream-header parameters, per-frame FRAME markers, raw planes —
  * so q90's dims/frame count/luma/motion come from DECODED FRAMES.
  * Compressed formats (JPEG/MP3/H.264) would need library codecs; the
  * Spark-side plumbing is identical and a production deployment swaps
  * only the codec call.
  *
  * Scale notes: media bytes never shuffle — every stage is map-only on
  * the scan partitioning; features/metadata (small columns) are what
  * downstream joins/aggregations touch. Frame sampling explodes only
  * bounded index arrays, never byte payloads.
  */
object Multimodal {

  /** Max 64-bit hamming distance for a q87 dHash near-dup pair. */
  val DHashMaxHamming = 10

  /** Typed row for the decode stage. */
  final case class MediaRow(doc_id: Long, media_type: String, media: Array[Byte])
  /** q87 signature row: the 64-bit dHash split into 4×16-bit bands
    * (band values double as the LSH bucket keys, and 4 ints sidestep
    * cross-engine 64-bit sign-bit pitfalls). */
  final case class ImageSig(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** 64-bit difference hash (dHash) over a DECODED raster: sample a
    * 9×8 luma grid by nearest-neighbor (sx = gx·W/9, sy = gy·H/8,
    * integer division), set bit (8·gy + gx) when the luma sum
    * (r + g + b — monotone in mean luma, no division) of grid cell gx
    * exceeds its right neighbor. Gradient-sign structure survives
    * resizing/re-encoding, which is what makes dHash a perceptual
    * near-dup key rather than a byte fingerprint. */
  private[operators] def dhashSig(doc_id: Long, img: PpmCodec.Image): ImageSig = {
    def luma(sx: Int, sy: Int): Int = {
      val k = (sy * img.width + sx) * 3
      (img.pixels(k) & 0xFF) + (img.pixels(k + 1) & 0xFF) +
        (img.pixels(k + 2) & 0xFF)
    }
    val bands = new Array[Int](4)
    var b = 0
    while (b < 64) {
      val gx = b % 8
      val gy = b / 8
      val sy = gy * img.height / 8
      if (luma(gx * img.width / 9, sy) > luma((gx + 1) * img.width / 9, sy))
        bands(b / 16) |= 1 << (b % 16)
      b += 1
    }
    ImageSig(doc_id, bands(0), bands(1), bands(2), bands(3))
  }
  final case class MediaFeatures(doc_id: Long, media_type: String,
      byte_len: Int, img_width: Int, img_height: Int,
      mean_px_milli: Long, checksum: Long)
  final case class AudioRow(doc_id: Long, media: Array[Byte])
  final case class AudioFeatures(doc_id: Long, sample_rate: Int,
      n_samples: Int, byte_len: Int, rms_milli: Long, peak: Int)
  final case class VideoRow(doc_id: Long, media: Array[Byte])
  final case class VideoFeatures(doc_id: Long, width: Int, height: Int,
      n_frames: Int, byte_len: Int, mean_luma_milli: Long, motion: Long,
      duration_ms: Int)
  final case class FrameRow(doc_id: Long, frame_idx: Int,
      mean_luma_milli: Long, delta_milli: Long, is_key: Boolean)

  /** q90b keyframe gate: a frame opens a new scene when its mean
    * luma moved >= this much (milli-units) from the previous frame;
    * frame 0 is always a key. 8.0 luma units sits in a plateau of
    * the synthesized corpus's delta distribution (the same key set
    * from 8.0 to 10.0), so the gate exercises both branches without
    * knife-edging on float-free integer means. */
  val KeyframeDeltaMilli = 8000L

  /** q92: two frames of the same video are "the same scene" when
    * their mono dHashes differ in <= this many of 64 gradient bits.
    * Any value < 4 keeps the 4-band candidate join lossless by
    * pigeonhole (<= 3 flipped bits can touch at most 3 of the 4
    * 16-bit bands, so one band always matches); at 2 the synthesized
    * corpus exercises both branches (hammings run 0..7). */
  val FrameDHashMaxHamming = 2

  /** q95: two audio docs are perceptual near-dups when every one of
    * their 16 leading window energies agrees within this bound (L∞
    * over the energy vectors — an "every moment sounds this close"
    * verdict, robust where a single aggregate would wash out a loud
    * transient). 48 sits mid-plateau on the synthesized corpus: the
    * pair L∞ distribution has populations at ≤40 and ≥61 with
    * nothing between, so any bound in [41,60] picks the identical
    * pair set — no knife-edge. The double-offset candidate grids use
    * step 2·48: two energies within 48 always share a cell in one of
    * the two grids (an interval of length ≤48 has at most one grid
    * boundary of the combined lattice in its interior, and that
    * boundary belongs to exactly one grid), so candidate generation
    * is pigeonhole-lossless for the verdict. */
  val AudioLinfMax = 48L

  /** q95 windowing: 16 windows of 10 samples = the 160-sample prefix
    * every audio doc is guaranteed to have (n = doc_id%800 + 160). */
  val AudioWindows = 16
  val AudioWindowLen = 10

  final case class AudioSig(doc_id: Long, es: Array[Long])

  final case class FrameSig(doc_id: Long, frame_idx: Int,
      b0: Int, b1: Int, b2: Int, b3: Int)

  /** The per-frame mono dHash signature relation shared by q92 and
    * q92b: one decode per video, one (doc_id, frame_idx, 4×16-bit
    * band) row per frame — bytes never leave the decode partition. */
  private def frameSigs(s: SparkSession, d: String): DataFrame = {
    val session = s
    import session.implicits._
    videoFrameSigs(
      withMedia(Tables.documents(s, d))
        .where(col("media_type") === "video")
        .select(col("doc_id"), col("media"))
        .as[VideoRow])
  }

  /** Decode → per-frame dHash over an arbitrary video relation —
    * the content-level kernel behind [[frameSigs]], factored so tests
    * can feed synthesized videos through the REAL decode path. */
  private[graft] def videoFrameSigs(videos: Dataset[VideoRow]): DataFrame = {
    val session = videos.sparkSession
    import session.implicits._
    graft.Materialize.cut(
      videos
        .mapPartitions(_.flatMap { r =>
          val v = Y4mCodec.decode(r.media)
          v.frames.iterator.zipWithIndex.map { case (fr, f) =>
            dhashMono(r.doc_id, f, fr, v.width, v.height)
          }
        })
        .toDF())
  }

  /** Keyframe (scene-change) selection over DECODED frames of an
    * arbitrary video relation — the content-level kernel behind
    * q90b, factored so tests can feed synthesized videos through the
    * REAL decode path: a frame is a key when its mean luma moved
    * >= [[KeyframeDeltaMilli]] from the previous frame (frame 0
    * always is). One decode per video, one output row per frame —
    * partition-local flatMap, payload bytes never shuffle. */
  private[graft] def keyframes(videos: Dataset[VideoRow]): DataFrame = {
    val session = videos.sparkSession
    import session.implicits._
    videos
      .mapPartitions(_.flatMap { r =>
        val v = Y4mCodec.decode(r.media)
        val wh = v.width * v.height
        val means = v.frames.map { fr =>
          var sum = 0L
          var k = 0
          while (k < wh) { sum += fr(k) & 0xFF; k += 1 }
          sum * 1000 / wh
        }
        means.iterator.zipWithIndex.map { case (m, f) =>
          val delta = if (f == 0) -1L else math.abs(m - means(f - 1))
          FrameRow(r.doc_id, f, m, delta,
            f == 0 || delta >= KeyframeDeltaMilli)
        }
      })
      .toDF()
  }

  /** Banded within-video near-dup pairs over a frame-signature
    * relation (doc_id, frame_idx, b0..b3): candidates share a
    * (doc_id, band index, band value) bucket — never nf² all-pairs —
    * then the exact 4-band hamming filter at
    * [[FrameDHashMaxHamming]]. */
  private[graft] def framePairs(sig: DataFrame): DataFrame = {
    val ex = sig.select(col("doc_id"), col("frame_idx"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
      .select(col("doc_id"), col("frame_idx"), col("pos").as("j"),
        col("col").as("bv"))
    val cp = ex.select(col("doc_id"), col("frame_idx").as("frame_a"),
        col("j"), col("bv"))
      .join(ex.select(col("doc_id"), col("frame_idx").as("frame_b"),
        col("j"), col("bv")), Seq("doc_id", "j", "bv"))
      .where(col("frame_a") < col("frame_b"))
      .select(col("doc_id"), col("frame_a"), col("frame_b")).distinct()
    val xa = sig.select(col("doc_id"), col("frame_idx").as("frame_a"),
      col("b0").as("a0"), col("b1").as("a1"),
      col("b2").as("a2"), col("b3").as("a3"))
    val xb = sig.select(col("doc_id"), col("frame_idx").as("frame_b"),
      col("b0").as("c0"), col("b1").as("c1"),
      col("b2").as("c2"), col("b3").as("c3"))
    cp.join(xa, Seq("doc_id", "frame_a")).join(xb, Seq("doc_id", "frame_b"))
      .withColumn("hamming", expr(
        "bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3)").cast("int"))
      .where(col("hamming") <= FrameDHashMaxHamming)
      .select(col("doc_id"), col("frame_a"), col("frame_b"), col("hamming"))
  }

  /** Identical-signature contraction for [[sceneGroups]]: one
    * representative (min frame_idx) per distinct (doc_id, b0..b3)
    * signature. A 10k-frame static shot contracts to ONE rep here —
    * this is what keeps the scene-group pipeline sub-quadratic on
    * the video shape that makes q92's pair list explode. */
  private[graft] def sceneReps(sig: DataFrame): DataFrame =
    sig.groupBy(col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3"))
      .agg(min(col("frame_idx")).as("rep"))

  /** Within-video scene groups over a frame-signature relation
    * (doc_id, frame_idx, b0..b3): contract identical signatures to
    * reps ([[sceneReps]] — the q35 dedup contraction; the signature
    * fully determines adjacency, so rep-level edges are the
    * frame-level edges modulo contraction), run the shared min-label
    * propagation ([[Dedup.minLabelComponents]]) over the rep pair
    * graph, and label every frame with its component's min frame
    * index. Returns a MATERIALIZED (doc_id, frame_idx, scene_id)
    * frame. */
  private[graft] def sceneGroups(sig: DataFrame): DataFrame = {
    val keys = Seq("doc_id", "b0", "b1", "b2", "b3")
    val reps = sceneReps(sig)
    val frameRep = sig.join(reps, keys)
      .select(col("doc_id"), col("frame_idx"), col("rep"))
    val repSig = reps.select(col("doc_id"), col("rep").as("frame_idx"),
      col("b0"), col("b1"), col("b2"), col("b3"))
    // composite node id: frames are < 2^32 in any real container
    val nodeF = 4294967296L
    val edges = framePairs(repSig)
      .select((col("doc_id") * nodeF + col("frame_a")).as("pa"),
        (col("doc_id") * nodeF + col("frame_b")).as("pb"))
    val labels = Dedup.minLabelComponents(edges,
      reps.select((col("doc_id") * nodeF + col("rep")).as("node")))
    val out = graft.Materialize.cut(frameRep
      .join(labels,
        frameRep("doc_id") * nodeF + frameRep("rep") === labels("node"))
      .select(col("doc_id"), col("frame_idx"),
        (col("label") - col("doc_id") * nodeF).cast("int").as("scene_id")))
    graft.Materialize.release(labels)
    out
  }

  /** Mono (single-plane) dHash — [[dhashSig]]'s luma grid over a
    * decoded Y4M frame instead of a PPM RGB raster. */
  private[operators] def dhashMono(doc_id: Long, frame_idx: Int,
      plane: Array[Byte], w: Int, h: Int): FrameSig = {
    val bands = new Array[Int](4)
    var b = 0
    while (b < 64) {
      val gx = b % 8
      val gy = b / 8
      val sy = gy * h / 8
      if ((plane(sy * w + gx * w / 9) & 0xFF) >
          (plane(sy * w + (gx + 1) * w / 9) & 0xFF))
        bands(b / 16) |= 1 << (b % 16)
      b += 1
    }
    FrameSig(doc_id, frame_idx, bands(0), bands(1), bands(2), bands(3))
  }

  /** Real image dimensions for the synthesized PPM payloads — small
    * (4..19 x 4..15) so the oracle can recompute pixel features via
    * bounded list arithmetic; the metadata struct's width/height stay
    * the (larger) catalog claims, which q71's decoded dims override. */
  private val pxWSql = "CAST(doc_id % 16 + 4 AS INT)"
  private val pxHSql = "CAST(doc_id % 12 + 4 AS INT)"

  /** Pixel byte k of doc `doc_id`: (doc_id + 7k) mod 256 — integer
    * arithmetic both engines reproduce exactly. Synthesized by the
    * codegen'd [[graft.functions.PayloadSynthesis]] kernel; the
    * declarative hex form below is kept as the parity reference
    * (IoStreamingSpec asserts byte equality) — the interpreted
    * per-byte lambda it runs cost q70/q71 ~3× at sf0.1. */
  private def ppmPayload: org.apache.spark.sql.Column =
    graft.functions.MediaFunctions.ppmPayload(col("doc_id"))

  /** The declarative (hex-text) form of [[ppmPayload]] — parity
    * reference only. */
  private[graft] def ppmPayloadDeclarative: org.apache.spark.sql.Column =
    unhex(concat(
      hex(concat(lit("P6\n"), expr(pxWSql).cast("string"), lit(" "),
        expr(pxHSql).cast("string"), lit("\n255\n"))),
      expr(s"array_join(transform(sequence(0, $pxWSql * $pxHSql * 3 - 1), " +
        "k -> lpad(hex(pmod(doc_id + 7*k, 256)), 2, '0')), '')")))

  /** Real audio dimensions for the synthesized RIFF/WAV payloads:
    * n = doc_id % 800 + 160 sixteen-bit mono PCM samples at 16 kHz
    * (10–60 ms), sample k = ((doc_id*31 + 7k) mod 4096) - 2048 —
    * integer arithmetic both engines reproduce exactly. */
  private[operators] val nSampSql = "CAST(doc_id % 800 + 160 AS INT)"
  private[operators] val sampleRate = 16000

  private def le16Lit(v: Int): String =
    f"${v & 0xFF}%02X${(v >> 8) & 0xFF}%02X"
  private def le32Lit(v: Int): String =
    le16Lit(v & 0xFFFF) + le16Lit(v >>> 16)
  private def asciiHex(s: String): String =
    s.getBytes("US-ASCII").map(b => f"$b%02X").mkString
  /** Little-endian hex of a SQL int expression (values < 2^32). */
  private def le16Sql(e: String): String =
    s"concat(lpad(hex(($e) % 256), 2, '0'), lpad(hex((($e) DIV 256) % 256), 2, '0'))"
  private def le32Sql(e: String): String =
    s"concat(${le16Sql(e)}, ${le16Sql(s"($e) DIV 65536")})"

  /** A COMPLETE RIFF/WAV binary per audio row: canonical 44-byte
    * header (RIFF size, WAVE, fmt with PCM/mono/16-bit/16 kHz, data
    * size) followed by the little-endian samples. [[WavCodec]] parses
    * this through the genuine container grammar — the same
    * synthesis-stands-in-for-storage trade as [[ppmPayload]]. */
  private def wavPayload: org.apache.spark.sql.Column =
    graft.functions.MediaFunctions.wavPayload(col("doc_id"))

  /** Real video dimensions for the synthesized YUV4MPEG2 payloads:
    * nf = doc_id % 6 + 2 mono frames of (doc_id%8+4) x (doc_id%6+4)
    * luma at 25 fps; luma byte k of frame f = (doc_id + 11f + 7k)
    * mod 256 — integer arithmetic both engines reproduce exactly. */
  private[operators] val vidWSql = "CAST(doc_id % 8 + 4 AS INT)"
  private[operators] val vidHSql = "CAST(doc_id % 6 + 4 AS INT)"
  private[operators] val vidNfSql = "CAST(doc_id % 6 + 2 AS INT)"

  /** A COMPLETE YUV4MPEG2 binary per video row (see [[Y4mCodec]]) —
    * the same synthesis-stands-in-for-storage trade as
    * [[ppmPayload]]/[[wavPayload]]. */
  private def y4mPayload: org.apache.spark.sql.Column =
    graft.functions.MediaFunctions.y4mPayload(col("doc_id"))

  /** The declarative (hex-text) form of [[y4mPayload]] — parity
    * reference only (see [[ppmPayloadDeclarative]]). 4652414D450A is
    * hex("FRAME\n"). */
  private[graft] def y4mPayloadDeclarative: org.apache.spark.sql.Column =
    unhex(concat(
      hex(concat(lit("YUV4MPEG2 W"), expr(vidWSql).cast("string"),
        lit(" H"), expr(vidHSql).cast("string"),
        lit(" F25:1 Ip A1:1 Cmono\n"))),
      expr(s"array_join(transform(sequence(0, $vidNfSql - 1), " +
        s"f -> concat('4652414D450A', " +
        s"array_join(transform(sequence(0, $vidWSql * $vidHSql - 1), " +
        "k -> lpad(hex(pmod(doc_id + 11*f + 7*k, 256)), 2, '0')), ''))), '')")))

  /** The declarative (hex-text) form of [[wavPayload]] — parity
    * reference only (see [[ppmPayloadDeclarative]]). */
  private[graft] def wavPayloadDeclarative: org.apache.spark.sql.Column = {
    val n = nSampSql
    // u16 two's-complement image of the signed 16-bit sample
    val u16 = "pmod(pmod(doc_id * 31 + 7 * k, 4096) - 2048, 65536)"
    unhex(concat(
      lit(asciiHex("RIFF")), expr(le32Sql(s"36 + 2 * $n")),
      lit(asciiHex("WAVEfmt ") + le32Lit(16) + le16Lit(1) + le16Lit(1) +
        le32Lit(sampleRate) + le32Lit(sampleRate * 2) + le16Lit(2) +
        le16Lit(16)),
      lit(asciiHex("data")), expr(le32Sql(s"2 * $n")),
      expr(s"array_join(transform(sequence(0, $n - 1), " +
        s"k -> ${le16Sql(u16)}), '')")))
  }

  /** Attach payload + typed metadata to each doc: image rows get a
    * real P6 PPM binary, audio rows a real RIFF/WAV PCM binary,
    * video rows a real YUV4MPEG2 binary — every media type carries a
    * genuine container its codec grammar-parses. */
  def withMedia(docs: DataFrame): DataFrame =
    docs
      .withColumn("media_type",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")))
      .withColumn("media",
        when(col("media_type") === "image", ppmPayload)
          .when(col("media_type") === "audio", wavPayload)
          .otherwise(y4mPayload))
      .withColumn("meta", struct(
        (col("doc_id") % 640 + 16).cast("int").as("width"),
        (col("doc_id") % 480 + 16).cast("int").as("height"),
        lit(sampleRate).as("sample_rate"),
        (col("n_chars") % 240 + 1).cast("int").as("n_frames")))

  /** Partition-local decode: images through the REAL [[PpmCodec]]
    * (header-parsed dims, mean pixel value in milli-units, a
    * position-weighted raster checksum mod 1e9+7); audio/video
    * through the generic byte-level leg (length + additive checksum
    * of the first 64 bytes mod 997, dims/mean = -1 — the
    * container-agnostic fingerprint; q74/q90 are the real audio and
    * video decodes). Zero shuffle. */
  def decodeMedia(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      if (r.media_type == "image") {
        val img = PpmCodec.decode(r.media)
        val n = img.pixels.length
        var sum = 0L
        var chk = 0L
        var k = 0
        while (k < n) {
          val p = img.pixels(k) & 0xFF
          sum += p
          chk = (chk + p.toLong * (k + 1)) % 1000000007L
          k += 1
        }
        MediaFeatures(r.doc_id, r.media_type, r.media.length,
          img.width, img.height, sum * 1000 / n, chk)
      } else {
        val n = r.media.length
        var sum = 0L
        var i = 0
        while (i < math.min(64, n)) { sum += (r.media(i) & 0xFF); i += 1 }
        MediaFeatures(r.doc_id, r.media_type, n, -1, -1, -1L, sum % 997)
      }
    }

  /** The typed decode pass: Dataset[MediaRow] -> mapPartitions. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("media_type"), col("media"))
      .as[MediaRow]
      .mapPartitions(decodeMedia)
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

    // The mapPartitions decode stage: REAL PPM codec for images
    // (dims/mean/checksum from parsed pixels), container-agnostic
    // byte fingerprint for audio/video (their full decodes are
    // q74/q90).
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

    // Audio features through the REAL [[WavCodec]]: the container
    // grammar is parsed (not length-guessed), and sample rate, sample
    // count, RMS energy and peak amplitude come from the decoded PCM
    // samples; duration and the 25 ms analysis-window count derive
    // from the PARSED header fields. Partition-local, zero shuffle —
    // the audio twin of q71's image leg.
    "q74_audio_meta" -> { (s, d) =>
      val session = s
      import session.implicits._
      withMedia(Tables.documents(s, d))
        .where(col("media_type") === "audio")
        .select(col("doc_id"), col("media"))
        .as[AudioRow]
        .mapPartitions(_.map { r =>
          val w = WavCodec.decode(r.media)
          val n = w.samples.length
          // a structurally valid WAV with an empty data chunk would
          // yield RMS = sqrt(0/0) = NaN, silently coerced to 0 by
          // toLong — reject it like WavCodec rejects every other
          // degenerate input
          if (n == 0) throw new IllegalArgumentException(
            s"WAV: empty PCM data chunk in doc ${r.doc_id}")
          var sumSq = 0L
          var peak = 0
          var i = 0
          while (i < n) {
            val v = w.samples(i).toInt
            sumSq += v.toLong * v
            val a = math.abs(v)
            if (a > peak) peak = a
            i += 1
          }
          AudioFeatures(r.doc_id, w.sampleRate, n, r.media.length,
            math.floor(math.sqrt(sumSq.toDouble / n) * 1000).toLong, peak)
        })
        .toDF()
        .withColumn("duration_sec",
          round(col("n_samples").cast("double") / col("sample_rate"), 6))
        .withColumn("n_windows_25ms",
          ceil(col("duration_sec") / 0.025).cast("int"))
        .orderBy(col("doc_id"))
    },

    // Video features through the REAL [[Y4mCodec]]: the container
    // grammar is parsed (stream-header parameters, per-frame FRAME
    // markers) and dims, frame count, mean luma and the inter-frame
    // motion metric (total |luma delta| between consecutive frames)
    // come from the DECODED planes; duration derives from the PARSED
    // frame rate. Partition-local, zero shuffle — the video twin of
    // q71's image leg and q74's audio leg.
    "q90_video_features" -> { (s, d) =>
      val session = s
      import session.implicits._
      withMedia(Tables.documents(s, d))
        .where(col("media_type") === "video")
        .select(col("doc_id"), col("media"))
        .as[VideoRow]
        .mapPartitions(_.map { r =>
          val v = Y4mCodec.decode(r.media)
          val nf = v.frames.length
          // a structurally valid stream with zero frames has no luma
          // to average — reject like the q74 empty-data-chunk guard
          if (nf == 0) throw new IllegalArgumentException(
            s"Y4M: empty stream (no frames) in doc ${r.doc_id}")
          val wh = v.width * v.height
          var sum = 0L
          var motion = 0L
          var f = 0
          while (f < nf) {
            val cur = v.frames(f)
            val prev = if (f > 0) v.frames(f - 1) else null
            var k = 0
            while (k < wh) {
              sum += cur(k) & 0xFF
              if (prev != null)
                motion += math.abs((cur(k) & 0xFF) - (prev(k) & 0xFF))
              k += 1
            }
            f += 1
          }
          VideoFeatures(r.doc_id, v.width, v.height, nf, r.media.length,
            sum * 1000 / (nf.toLong * wh), motion,
            (nf.toLong * 1000 * v.fpsDen / v.fpsNum).toInt)
        })
        .toDF()
        .orderBy(col("doc_id"))
    },

    // Keyframe (scene-change) selection over DECODED frames — the
    // form of frame sampling a video training-data pipeline actually
    // runs (q72 samples by metadata index; this samples by content):
    // a frame is a key when its mean luma moved >= KeyframeDeltaMilli
    // from the previous frame (frame 0 always is). One decode per
    // video, one output row per frame — partition-local flatMap,
    // payload bytes never shuffle.
    "q90b_keyframes" -> { (s, d) =>
      val session = s
      import session.implicits._
      keyframes(
        withMedia(Tables.documents(s, d))
          .where(col("media_type") === "video")
          .select(col("doc_id"), col("media"))
          .as[VideoRow])
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // Repeated-scene (static-segment) detection WITHIN each video:
    // per-frame mono dHash over DECODED planes, candidates from the
    // (doc_id, band index, band value) equi-join — q87's bucket shape
    // with the video as an extra blocking key, NEVER nf² all-pairs
    // (a real video has thousands of frames) — then the exact 4-band
    // hamming filter. The dedup consumer for the video codec, as q87
    // is for the image codec.
    "q92_frame_neardup" -> { (s, d) =>
      framePairs(frameSigs(s, d))
        .orderBy(col("doc_id"), col("frame_a"), col("frame_b"))
    },

    // Scene GROUPS — the output shape a production pipeline emits
    // instead of q92's exhaustive pair list (which is inherently
    // quadratic for a static-camera video): contract identical
    // signatures to one representative per video (the q35 dedup
    // contraction — est depends only on the signature, so rep-level
    // edges are the doc-level edges modulo contraction), run the
    // shared min-label propagation over the rep pair graph, and
    // label every frame with its component's min frame index. A
    // 10k-frame static shot costs ONE rep and zero pair rows here.
    "q92b_scene_groups" -> { (s, d) =>
      sceneGroups(frameSigs(s, d)).orderBy(col("doc_id"), col("frame_idx"))
    },

    // CROSS-video perceptual dedup — the video-modality twin of q30's
    // exact digest dedup, keyed on decoded CONTENT instead of file
    // bytes (re-encoded/re-containered copies share it): per-frame
    // dHash folded to 16 bytes, the ordered frame sequence folded to
    // one 16-byte video fingerprint, group by fingerprint, canonical
    // = min doc_id. Scale: decode and both folds are map-side; only
    // (doc_id, fingerprint) rows ever shuffle (per-video agg, then
    // per-fingerprint group) — never frames, never media bytes.
    "q93_video_dedup" -> { (s, d) =>
      val fsig = frameSigs(s, d).select(col("doc_id"),
        col("frame_idx"),
        md5(concat_ws(",", col("b0"), col("b1"), col("b2"), col("b3")))
          .as("fsig"))
      val vfp = fsig.groupBy(col("doc_id"))
        .agg(md5(concat_ws("|", transform(
          sort_array(collect_list(struct(col("frame_idx"), col("fsig")))),
          x => x.getField("fsig")))).as("fp"))
      val rep = vfp.groupBy(col("fp")).agg(min(col("doc_id")).as("video_rep"))
      vfp.join(rep, Seq("fp"))
        .select(col("doc_id"), col("video_rep"),
          (col("doc_id") === col("video_rep")).as("is_canonical"))
        .orderBy(col("doc_id"))
    },

    // Perceptual image near-dup: dHash over DECODED pixels (the PPM
    // codec as a dedup INPUT, not just a feature extractor), then
    // hamming-banded pair generation — candidates share one of the 4
    // 16-bit hash bands (the q33 SimHash bucket shape), NEVER
    // all-pairs. Scale: the decode + hash is map-only on the scan
    // partitioning (bytes never shuffle — only the 4-int signature
    // does); the band equi-join bounds candidates to bucket
    // cardinality; hamming is 4 codegen'd bit_count(xor) terms.
    "q87_image_neardup_dhash" -> { (s, d) =>
      val session = s
      import session.implicits._
      // materialize once: the signature relation feeds the band
      // explode AND both hash-fetch joins
      val sig = graft.Materialize.cut(
        withMedia(Tables.documents(s, d))
          .where(col("media_type") === "image")
          .select(col("doc_id"), col("media_type"), col("media"))
          .as[MediaRow]
          .mapPartitions(_.map(r => dhashSig(r.doc_id, PpmCodec.decode(r.media))))
          .toDF())
      val ex = sig.select(col("doc_id"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
        .select(col("doc_id"), col("pos").as("j"), col("col").as("bv"))
      val cp = ex.select(col("doc_id").as("doc_a"), col("j"), col("bv"))
        .join(ex.select(col("doc_id").as("doc_b"), col("j"), col("bv")),
          Seq("j", "bv"))
        .where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
      val xa = sig.select(col("doc_id").as("doc_a"), col("b0").as("a0"),
        col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
      val xb = sig.select(col("doc_id").as("doc_b"), col("b0").as("c0"),
        col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
      cp.join(xa, Seq("doc_a")).join(xb, Seq("doc_b"))
        .withColumn("hamming", expr(
          "bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
            "bit_count(a2 ^ c2) + bit_count(a3 ^ c3)").cast("int"))
        .where(col("hamming") <= DHashMaxHamming)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Perceptual audio near-dup over DECODED PCM — the audio twin of
    // q87 (images) and q92/q93 (video), closing the last
    // codec-without-a-dedup-consumer gap. Signature = the 16
    // leading 10-sample window energies (sum |sample|) from the
    // WavCodec-decoded stream; verdict = L∞ over the two energy
    // vectors ≤ [[AudioLinfMax]]. Candidates come from a
    // double-offset magnitude grid per window (keys (w, grid,
    // energy div 2T) and (w, grid', (energy+T) div 2T)) — provably
    // lossless for the L∞ verdict (see [[AudioLinfMax]]), never
    // all-pairs. Scale shape: decode and energies are map-side on
    // the scan partitioning; only (doc_id, w, g, c) int rows — 32
    // per doc — enter the candidate shuffle; media bytes never move.
    "q95_audio_neardup" -> { (s, d) =>
      val session = s
      import session.implicits._
      val T = AudioLinfMax
      // materialize once: the signature relation feeds the grid-key
      // explode AND both energy-vector fetch joins
      val sig = graft.Materialize.cut(
        withMedia(Tables.documents(s, d))
          .where(col("media_type") === "audio")
          .select(col("doc_id"), col("media"))
          .as[AudioRow]
          .mapPartitions(_.map { r =>
            val wav = WavCodec.decode(r.media)
            val es = new Array[Long](AudioWindows)
            var i = 0
            while (i < AudioWindows * AudioWindowLen) {
              es(i / AudioWindowLen) += math.abs(wav.samples(i).toInt).toLong
              i += 1
            }
            AudioSig(r.doc_id, es)
          })
          .toDF())
      val ex = sig.select(col("doc_id"), posexplode(col("es")))
        .select(col("doc_id"), col("pos").as("w"), col("col").as("e"))
      val keys = ex.select(col("doc_id"), col("w"), explode(array(
          struct(lit(0).as("g"), expr(s"e div ${2 * T}").as("c")),
          struct(lit(1).as("g"), expr(s"(e + $T) div ${2 * T}").as("c"))))
          .as("k"))
        .select(col("doc_id"), col("w"), col("k.g").as("g"), col("k.c").as("c"))
      val cp = keys.select(col("doc_id").as("doc_a"), col("w"), col("g"),
          col("c"))
        .join(keys.select(col("doc_id").as("doc_b"), col("w"), col("g"),
          col("c")), Seq("w", "g", "c"))
        .where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
      cp.join(sig.select(col("doc_id").as("doc_a"), col("es").as("ea")),
          Seq("doc_a"))
        .join(sig.select(col("doc_id").as("doc_b"), col("es").as("eb")),
          Seq("doc_b"))
        .withColumn("linf", expr(
          "aggregate(zip_with(ea, eb, (x, y) -> abs(x - y)), " +
            "CAST(0 AS BIGINT), (acc, v) -> greatest(acc, v))"))
        .where(col("linf") <= T)
        .select(col("doc_a"), col("doc_b"), col("linf"))
        .orderBy(col("doc_a"), col("doc_b"))
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

  // Every media payload is a synthesized real container (P6 PPM,
  // RIFF/WAV, YUV4MPEG2), so the oracles recompute byte layouts and
  // features with the same integer arithmetic the codecs see after
  // parsing — never from the bytes themselves.
  private val ppmLenSql =
    "length('P6' || chr(10) || CAST(doc_id % 16 + 4 AS VARCHAR) || ' ' || " +
      "CAST(doc_id % 12 + 4 AS VARCHAR) || chr(10) || '255' || chr(10)) + " +
      "(doc_id % 16 + 4) * (doc_id % 12 + 4) * 3"

  // The WAV byte model the oracle recomputes: n samples, 44-byte
  // canonical header whose constant bytes sum to 1722 (RIFF/WAVE/fmt
  // tags + PCM fields at 16 kHz) plus the two little-endian size
  // fields, then 2 bytes per sample (two's-complement u16 image).
  private val nSampOr = "(doc_id % 800 + 160)"
  private val wavLenSql = s"44 + 2 * $nSampOr"
  private val u16Or =
    "(((doc_id * 31 + 7 * k) % 4096 - 2048) + 65536) % 65536"

  // The shared q92/q92b oracle CTE chain (mirrors dhashMono + the
  // (doc, band)-blocked pair join): luma at plane offset p of frame f
  // is (doc_id + 11*f + 7*p) mod 256, grid positions unrolled at
  // SQL-generation time as in q87; ends at `hm` = candidate pairs
  // with their exact 4-band hamming.
  private lazy val q92Chain: String = {
    def luma(sx: String, sy: String): String =
      s"((doc_id + 11*f + 7*(($sy)*w+($sx))) % 256)"
    def band(j: Int): String = (0 until 16).map { t =>
      val b = 16 * j + t
      val (gx, gy) = (b % 8, b / 8)
      val sy = s"(($gy*h)//8)"
      s"CASE WHEN ${luma(s"(($gx*w)//9)", sy)} > " +
        s"${luma(s"((${gx + 1}*w)//9)", sy)} THEN (1::INT << $t) ELSE 0 END"
    }.mkString("(", " + ", ")")
    val bandCols = (0 until 4)
      .map(j => s"CAST(${band(j)} AS INT) AS b$j").mkString(",\n    ")
    val hamSql = (1 to 4)
      .map(i => s"bit_count(xor(x.bands[$i], y.bands[$i]))").mkString(" + ")
    s"""m AS (
       |  SELECT doc_id, doc_id % 8 + 4 AS w, doc_id % 6 + 4 AS h,
       |    doc_id % 6 + 2 AS nf
       |  FROM documents WHERE doc_id % 3 = 2),
       |fr AS (
       |  SELECT doc_id, w, h, CAST(t.range AS INTEGER) AS f
       |  FROM m CROSS JOIN range(0, 8) t WHERE t.range < nf),
       |bd AS (SELECT doc_id, f,
       |    $bandCols
       |  FROM fr),
       |sig AS (SELECT doc_id, f, [b0, b1, b2, b3] AS bands FROM bd),
       |ex AS (SELECT doc_id, f, j, bands[j+1] AS bv
       |  FROM sig, range(0,4) AS t(j)),
       |cp AS (
       |  SELECT DISTINCT a.doc_id, a.f AS frame_a, b.f AS frame_b
       |  FROM ex a JOIN ex b ON a.doc_id = b.doc_id AND a.j = b.j
       |    AND a.bv = b.bv AND a.f < b.f),
       |hm AS (
       |  SELECT cp.doc_id, cp.frame_a, cp.frame_b,
       |    CAST($hamSql AS INTEGER) AS hamming
       |  FROM cp
       |  JOIN sig x ON x.doc_id = cp.doc_id AND x.f = cp.frame_a
       |  JOIN sig y ON y.doc_id = cp.doc_id AND y.f = cp.frame_b)""".stripMargin
  }

  // The Y4M byte model the oracle recomputes: variable-length ASCII
  // stream header, then nf frames of "FRAME\n" (6 bytes) + w*h luma.
  private val vwOr = "(doc_id % 8 + 4)"
  private val vhOr = "(doc_id % 6 + 4)"
  private val vnfOr = "(doc_id % 6 + 2)"
  private val y4mHdrSql =
    s"('YUV4MPEG2 W' || $vwOr || ' H' || $vhOr || " +
      "' F25:1 Ip A1:1 Cmono' || chr(10))"
  private val y4mLenSql =
    s"length($y4mHdrSql) + $vnfOr * (6 + $vwOr * $vhOr)"

  def oracle: Map[String, String] = Map(
    "q70_media_meta" ->
      s"""SELECT doc_id,
        |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST($ppmLenSql AS INTEGER)
        |       WHEN doc_id % 3 = 1 THEN CAST($wavLenSql AS INTEGER)
        |       ELSE CAST($y4mLenSql AS INTEGER) END AS n_bytes,
        |  CAST(doc_id % 640 + 16 AS INTEGER) AS width,
        |  CAST(doc_id % 480 + 16 AS INTEGER) AS height,
        |  CAST(n_chars % 240 + 1 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q71_media_features" ->
      s"""WITH m AS (SELECT doc_id, text,
        |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
        |    CAST(doc_id % 16 + 4 AS INTEGER) AS w,
        |    CAST(doc_id % 12 + 4 AS INTEGER) AS h
        |  FROM documents)
        |SELECT doc_id, media_type,
        |  CASE WHEN media_type = 'image' THEN CAST($ppmLenSql AS INTEGER)
        |       WHEN media_type = 'audio' THEN CAST($wavLenSql AS INTEGER)
        |       ELSE CAST($y4mLenSql AS INTEGER) END AS byte_len,
        |  CASE WHEN media_type = 'image' THEN w ELSE -1 END AS img_width,
        |  CASE WHEN media_type = 'image' THEN h ELSE -1 END AS img_height,
        |  CASE WHEN media_type = 'image' THEN
        |    CAST(list_sum(list_transform(range(0, w * h * 3),
        |      k -> (doc_id + 7 * k) % 256)) * 1000 // (w * h * 3) AS BIGINT)
        |    ELSE CAST(-1 AS BIGINT) END AS mean_px_milli,
        |  CASE WHEN media_type = 'image' THEN
        |    CAST(list_sum(list_transform(range(0, w * h * 3),
        |      k -> ((doc_id + 7 * k) % 256) * (k + 1))) % 1000000007 AS BIGINT)
        |  WHEN media_type = 'audio' THEN
        |    -- first 64 bytes of the WAV = the 44-byte header (1722
        |    -- constant bytes + the two LE size fields) + samples 0..9
        |    CAST((1722
        |      + (36 + 2 * $nSampOr) % 256 + (36 + 2 * $nSampOr) // 256
        |      + (2 * $nSampOr) % 256 + (2 * $nSampOr) // 256
        |      + list_sum(list_transform(range(0, 10),
        |          k -> $u16Or % 256 + $u16Or // 256))) % 997 AS BIGINT)
        |  ELSE
        |    -- first 64 bytes of the Y4M stream: header ASCII codes,
        |    -- then "FRAME\\n" (70,82,65,77,69,10) + luma per frame
        |    CAST(list_sum((
        |      list_transform(range(1, length($y4mHdrSql) + 1),
        |        i -> CAST(ascii(substring($y4mHdrSql, i, 1)) AS BIGINT))
        |      || flatten(list_transform(range(0, $vnfOr), f ->
        |           list_transform([70,82,65,77,69,10], x -> CAST(x AS BIGINT))
        |           || list_transform(range(0, $vwOr * $vhOr),
        |                k -> (doc_id + 11*f + 7*k) % 256)))
        |      )[1:64]) % 997 AS BIGINT) END AS checksum
        |FROM m ORDER BY doc_id""".stripMargin,
    "q72_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(n_chars % 240 + 1 AS INTEGER) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id, n_frames, CAST(f.range AS INTEGER) AS frame_idx
        |FROM m CROSS JOIN range(0, 240, 10) f
        |WHERE f.range < n_frames
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q74_audio_meta" ->
      s"""WITH m AS (
        |  SELECT doc_id, CAST($nSampOr AS INTEGER) AS n FROM documents
        |  WHERE doc_id % 3 = 1),
        |s AS (
        |  SELECT doc_id, n,
        |    list_transform(range(0, n),
        |      k -> CAST((doc_id * 31 + 7 * k) % 4096 - 2048 AS BIGINT)) AS smp
        |  FROM m)
        |SELECT doc_id, 16000 AS sample_rate, n AS n_samples,
        |  CAST(44 + 2 * n AS INTEGER) AS byte_len,
        |  CAST(floor(sqrt(CAST(list_sum(list_transform(smp, x -> x * x)) AS DOUBLE)
        |    / n) * 1000) AS BIGINT) AS rms_milli,
        |  CAST(list_max(list_transform(smp, x -> abs(x))) AS INTEGER) AS peak,
        |  round(CAST(n AS DOUBLE) / 16000, 6) AS duration_sec,
        |  CAST(ceil(round(CAST(n AS DOUBLE) / 16000, 6) / 0.025) AS INTEGER)
        |    AS n_windows_25ms
        |FROM s ORDER BY doc_id""".stripMargin,
    // mirrors the q90 decode: luma byte at global index g of the
    // frame stream is (doc_id + 11*(g // wh) + 7*(g % wh)) mod 256;
    // mean over all frames, motion = total |luma delta| between
    // consecutive frames, duration from the 25:1 frame rate
    "q90_video_features" ->
      s"""WITH m AS (
        |  SELECT doc_id,
        |    CAST($vwOr AS INTEGER) AS w,
        |    CAST($vhOr AS INTEGER) AS h,
        |    CAST($vnfOr AS INTEGER) AS nf
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id, w AS width, h AS height, nf AS n_frames,
        |  CAST(length('YUV4MPEG2 W' || w || ' H' || h ||
        |    ' F25:1 Ip A1:1 Cmono' || chr(10)) + nf * (6 + w * h)
        |    AS INTEGER) AS byte_len,
        |  CAST(list_sum(list_transform(range(0, nf * w * h),
        |    g -> (doc_id + 11 * (g // (w * h)) + 7 * (g % (w * h))) % 256))
        |    * 1000 // (nf * w * h) AS BIGINT) AS mean_luma_milli,
        |  CAST(list_sum(list_transform(range(0, (nf - 1) * w * h),
        |    g -> abs((doc_id + 11 * (g // (w * h) + 1) + 7 * (g % (w * h))) % 256
        |           - (doc_id + 11 * (g // (w * h)) + 7 * (g % (w * h))) % 256)))
        |    AS BIGINT) AS motion,
        |  CAST(nf * 40 AS INTEGER) AS duration_ms
        |FROM m ORDER BY doc_id""".stripMargin,
    // per-frame means on the TRUNCATED milli values (both engines
    // floor-divide before differencing), delta via lag, frame 0
    // always a key
    "q90b_keyframes" ->
      s"""WITH m AS (
        |  SELECT doc_id,
        |    CAST($vwOr AS INTEGER) AS w,
        |    CAST($vhOr AS INTEGER) AS h,
        |    CAST($vnfOr AS INTEGER) AS nf
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (
        |  SELECT doc_id, CAST(f.range AS INTEGER) AS frame_idx,
        |    CAST(list_sum(list_transform(range(0, w * h),
        |      k -> (doc_id + 11 * f.range + 7 * k) % 256)) * 1000 // (w * h)
        |      AS BIGINT) AS mean_luma_milli
        |  FROM m CROSS JOIN range(0, 8) f
        |  WHERE f.range < nf),
        |dl AS (
        |  SELECT doc_id, frame_idx, mean_luma_milli,
        |    CAST(coalesce(abs(mean_luma_milli - lag(mean_luma_milli)
        |      OVER (PARTITION BY doc_id ORDER BY frame_idx)), -1)
        |      AS BIGINT) AS delta_milli
        |  FROM fr)
        |SELECT doc_id, frame_idx, mean_luma_milli, delta_milli,
        |  (frame_idx = 0 OR delta_milli >= $KeyframeDeltaMilli) AS is_key
        |FROM dl ORDER BY doc_id, frame_idx""".stripMargin,
    "q73_media_resize" ->
      """SELECT doc_id,
        |  CAST(doc_id % 640 + 16 AS INTEGER) AS width,
        |  CAST(doc_id % 480 + 16 AS INTEGER) AS height,
        |  greatest(CAST(floor((doc_id % 640 + 16) / 2) AS INTEGER), 1) AS out_width,
        |  greatest(CAST(floor((doc_id % 480 + 16) / 2) AS INTEGER), 1) AS out_height
        |FROM documents WHERE doc_id % 3 = 0
        |ORDER BY doc_id""".stripMargin,
    // mirrors dhashMono + the (doc, band)-blocked pair join (chain
    // shared with q92b — see [[q92Chain]])
    "q92_frame_neardup" ->
      s"""WITH $q92Chain
         |SELECT doc_id, frame_a, frame_b, hamming FROM hm
         |WHERE hamming <= $FrameDHashMaxHamming
         |ORDER BY doc_id, frame_a, frame_b""".stripMargin,
    // mirrors the q92b contraction + propagation: transitive closure
    // of the (hamming <= cap) frame-pair graph per video, component
    // label = min frame index (contraction is invisible to the
    // closure — identical sigs are hamming-0 edges)
    "q92b_scene_groups" ->
      s"""WITH RECURSIVE $q92Chain,
         |edges AS (
         |  SELECT doc_id, frame_a AS src, frame_b AS dst FROM hm
         |  WHERE hamming <= $FrameDHashMaxHamming
         |  UNION ALL
         |  SELECT doc_id, frame_b, frame_a FROM hm
         |  WHERE hamming <= $FrameDHashMaxHamming),
         |reach(doc_id, a, b) AS (
         |  SELECT doc_id, f, f FROM fr
         |  UNION
         |  SELECT r.doc_id, r.a, e.dst FROM reach r
         |  JOIN edges e ON r.doc_id = e.doc_id AND r.b = e.src)
         |SELECT doc_id, a AS frame_idx, CAST(min(b) AS INTEGER) AS scene_id
         |FROM reach GROUP BY doc_id, a
         |ORDER BY doc_id, frame_idx""".stripMargin,
    // mirrors the q93 fold chain: per-frame md5 over the b0..b3
    // signature, ordered per-video fold, group by fingerprint
    "q93_video_dedup" ->
      s"""WITH $q92Chain,
         |fs AS (
         |  SELECT doc_id, f,
         |    md5(b0 || ',' || b1 || ',' || b2 || ',' || b3) AS fsig
         |  FROM bd),
         |vfp AS (
         |  SELECT doc_id, md5(string_agg(fsig, '|' ORDER BY f)) AS fp
         |  FROM fs GROUP BY doc_id),
         |rep AS (SELECT fp, min(doc_id) AS video_rep FROM vfp GROUP BY fp)
         |SELECT v.doc_id, r.video_rep, v.doc_id = r.video_rep AS is_canonical
         |FROM vfp v JOIN rep r USING (fp)
         |ORDER BY v.doc_id""".stripMargin,
    // mirrors dhashSig + the banded pair join: the oracle recomputes
    // each luma sample from the synthesis formula (pixel byte k =
    // (doc_id + 7k) mod 256) with the grid positions UNROLLED at
    // SQL-generation time (gx, gy literal per bit), then the same
    // DISTINCT band-bucket pairs and 4-band bit_count hamming
    "q87_image_neardup_dhash" -> {
      // luma sum at sampled pixel (sx, sy) — sx/sy are SQL expressions
      // over the per-doc w/h columns
      def luma(sx: String, sy: String): String = {
        val k = s"(3*(($sy)*w+($sx)))"
        (0 until 3).map(c => s"(doc_id + 7*($k+$c)) % 256").mkString("(", " + ", ")")
      }
      def band(j: Int): String = (0 until 16).map { t =>
        val b = 16 * j + t
        val (gx, gy) = (b % 8, b / 8)
        val sy = s"(($gy*h)//8)"
        s"CASE WHEN ${luma(s"(($gx*w)//9)", sy)} > " +
          s"${luma(s"((${gx + 1}*w)//9)", sy)} THEN (1::INT << $t) ELSE 0 END"
      }.mkString("(", " + ", ")")
      val bandCols = (0 until 4)
        .map(j => s"CAST(${band(j)} AS INT) AS b$j").mkString(",\n    ")
      val hamSql = (1 to 4)
        .map(i => s"bit_count(xor(x.bands[$i], y.bands[$i]))").mkString(" + ")
      s"""WITH img AS (
         |  SELECT doc_id, doc_id % 16 + 4 AS w, doc_id % 12 + 4 AS h
         |  FROM documents WHERE doc_id % 3 = 0),
         |bd AS (SELECT doc_id,
         |    $bandCols
         |  FROM img),
         |sig AS (SELECT doc_id, [b0, b1, b2, b3] AS bands FROM bd),
         |ex AS (SELECT doc_id, j, bands[j+1] AS bv FROM sig, range(0,4) AS t(j)),
         |cp AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM ex a JOIN ex b ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id),
         |hm AS (
         |  SELECT cp.doc_a, cp.doc_b, CAST($hamSql AS INTEGER) AS hamming
         |  FROM cp JOIN sig x ON x.doc_id = cp.doc_a
         |  JOIN sig y ON y.doc_id = cp.doc_b)
         |SELECT doc_a, doc_b, hamming FROM hm
         |WHERE hamming <= $DHashMaxHamming
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    // the direct all-pairs form of the L∞ verdict — the grid
    // candidate generation in the query is lossless for it, so the
    // sets match row-for-row; window energies recomputed from the
    // synthesized sample arithmetic (sample k = (31·doc_id + 7k) mod
    // 4096 − 2048)
    "q95_audio_neardup" ->
      s"""WITH m AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
         |w AS (
         |  SELECT doc_id, CAST(wi.range AS INT) AS w,
         |    list_sum(list_transform(range(0, $AudioWindowLen),
         |      k -> abs((doc_id*31 + 7*(wi.range*$AudioWindowLen + k))
         |             % 4096 - 2048))) AS e
         |  FROM m CROSS JOIN range(0, $AudioWindows) wi),
         |ev AS (SELECT doc_id, list(e ORDER BY w) AS es
         |       FROM w GROUP BY doc_id),
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(list_max(list_transform(range(1, ${AudioWindows + 1}),
         |      i -> abs(a.es[i] - b.es[i]))) AS BIGINT) AS linf
         |  FROM ev a JOIN ev b ON a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, linf FROM p WHERE linf <= $AudioLinfMax
         |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
