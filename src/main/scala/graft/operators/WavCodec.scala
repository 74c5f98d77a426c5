package graft.operators

/** A real, pure-JVM audio codec for the multimodal pipeline: RIFF/WAV
  * with 16-bit mono PCM samples — the uncompressed interchange format
  * of every audio tool, and the audio twin of [[PpmCodec]]. The parser
  * handles the actual container grammar — `RIFF` size header, `WAVE`
  * form type, the chunk stream (`fmt `, `data`, unknown chunks skipped
  * with the spec's odd-size pad byte), little-endian field decoding —
  * and rejects malformed input instead of guessing.
  *
  * Deliberately narrow, like PPM's maxval <= 255: PCM format 1,
  * 16 bits/sample, one channel. A production deployment swaps
  * [[decode]]'s callers to a library codec for compressed formats;
  * the Spark-side plumbing (binary column in, typed features out,
  * partition-local execution) is identical.
  */
object WavCodec {

  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short])

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (le16(b, i).toLong) | (le16(b, i + 2).toLong << 16)

  /** Strict RIFF/WAVE parse; throws IllegalArgumentException on any
    * grammar violation (bad magic, truncated chunk, missing fmt/data,
    * non-PCM, unsupported width/channels, half a sample). */
  def decode(bytes: Array[Byte]): Wav = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"WAV: $msg")
    def ascii(i: Int, n: Int): String = {
      if (i + n > bytes.length) fail(s"truncated id at byte $i")
      new String(bytes, i, n, "US-ASCII")
    }
    if (bytes.length < 12 || ascii(0, 4) != "RIFF") fail("bad magic (want RIFF)")
    val riffSize = le32(bytes, 4)
    // the RIFF size field covers everything after itself; a file
    // shorter than it claims is truncated
    if (8 + riffSize > bytes.length) fail(
      s"truncated container: RIFF claims ${riffSize} bytes, " +
        s"have ${bytes.length - 8}")
    if (ascii(8, 4) != "WAVE") fail("bad form type (want WAVE)")
    val limit = (8 + riffSize).toInt
    var pos = 12
    var fmt: Option[(Int, Int, Int, Long, Int, Int)] = None
    var data: Option[Array[Byte]] = None
    while (pos + 8 <= limit) {
      val id = ascii(pos, 4)
      val size = le32(bytes, pos + 4)
      if (size > Int.MaxValue || pos + 8 + size > limit)
        fail(s"truncated chunk '$id': claims $size bytes at $pos")
      val n = size.toInt
      id match {
        case "fmt " =>
          if (n < 16) fail(s"fmt chunk too small ($n bytes)")
          fmt = Some((le16(bytes, pos + 8), le16(bytes, pos + 10),
            le32(bytes, pos + 12).toInt, le32(bytes, pos + 16),
            le16(bytes, pos + 20), le16(bytes, pos + 22)))
        case "data" =>
          data = Some(java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + n))
        case _ => () // unknown chunk (LIST, fact, cue, ...) — skipped
      }
      // chunks are word-aligned: an odd payload carries one pad byte
      pos += 8 + n + (n & 1)
    }
    val (audioFormat, channels, rate, byteRate, blockAlign, bits) =
      fmt.getOrElse(fail("missing fmt chunk"))
    val pcm = data.getOrElse(fail("missing data chunk"))
    if (audioFormat != 1) fail(s"unsupported format $audioFormat (want PCM=1)")
    if (bits != 16) fail(s"unsupported sample width $bits (want 16)")
    if (channels != 1) fail(s"unsupported channel count $channels (want mono)")
    if (blockAlign != 2) fail(s"inconsistent blockAlign $blockAlign (want 2)")
    if (byteRate != rate.toLong * 2) fail(
      s"inconsistent byteRate $byteRate (want ${rate.toLong * 2})")
    if (rate <= 0) fail(s"non-positive sample rate $rate")
    if (pcm.length % 2 != 0) fail(s"odd data size ${pcm.length} (half a sample)")
    val samples = new Array[Short](pcm.length / 2)
    var i = 0
    while (i < samples.length) {
      samples(i) = le16(pcm, 2 * i).toShort
      i += 1
    }
    Wav(rate, channels, samples)
  }

  /** Encode (the synthesis twin — also a complete canonical writer:
    * 44-byte header, fmt before data, little-endian throughout). */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"non-positive sample rate $sampleRate")
    val dataSize = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    out.put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1).putShort(1) // PCM, mono
    out.putInt(sampleRate).putInt(sampleRate * 2)
    out.putShort(2).putShort(16) // blockAlign, bits
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(out.putShort)
    out.array()
  }
}
