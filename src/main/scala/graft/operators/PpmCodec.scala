package graft.operators

/** A real, pure-JVM image codec for the multimodal pipeline: binary
  * P6 PPM (the uncompressed interchange format every imaging tool
  * emits — `man ppm`). This replaces the byte-peeking stub the decode
  * stage shipped with while the container had no codec libraries:
  * the parser handles the actual format grammar — magic, `#` comments
  * anywhere between header tokens, arbitrary token whitespace, the
  * single post-maxval whitespace byte, then the `w*h*3` raster — and
  * rejects malformed input instead of guessing.
  *
  * Deliberately narrow: P6 with maxval <= 255 (1 byte/sample). A
  * production deployment swaps [[decode]]'s callers to a library
  * codec for JPEG/PNG; the Spark-side plumbing (binary column in,
  * typed features out, partition-local execution) is identical.
  */
object PpmCodec {

  final case class Image(width: Int, height: Int, pixels: Array[Byte])

  /** Strict P6 parse; throws IllegalArgumentException on any
    * grammar violation (truncated raster, bad magic, maxval > 255). */
  def decode(bytes: Array[Byte]): Image = {
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"PPM: $msg at byte $pos")
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f'
    // whitespace and #-comments may separate any two header tokens
    def skipWsAndComments(): Unit = {
      var in = true
      while (in && pos < bytes.length) {
        if (isWs(bytes(pos))) pos += 1
        else if (bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else in = false
      }
    }
    def token(): Int = {
      skipWsAndComments()
      if (pos >= bytes.length) fail("truncated header")
      var v = 0L
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > Int.MaxValue) fail("header value overflow")
        pos += 1
        any = true
      }
      if (!any) fail("expected integer token")
      v.toInt
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6')
      fail("bad magic (want P6)")
    pos = 2
    val w = token()
    val h = token()
    val maxval = token()
    if (w <= 0 || h <= 0) fail(s"non-positive dimensions ${w}x$h")
    if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
    // exactly ONE whitespace byte separates maxval from the raster
    if (pos >= bytes.length || !isWs(bytes(pos))) fail("missing raster separator")
    pos += 1
    // Long math: w*h*3 can wrap Int for adversarial header dims (e.g.
    // 40000x40000), and a wrapped-to-small n would accept a truncated
    // raster with bogus huge dims — exactly what strict rejection is
    // advertised to prevent.
    val nL = w.toLong * h * 3
    if (nL > Int.MaxValue) fail(s"raster size overflow: ${w}x$h x3")
    val n = nL.toInt
    if (bytes.length - pos < n)
      fail(s"truncated raster: need $n bytes, have ${bytes.length - pos}")
    Image(w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + n))
  }

  /** Encode (the synthesis twin — also a complete P6 writer). */
  def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height * 3,
      s"raster size ${pixels.length} != ${width}x$height x3")
    s"P6\n$width $height\n255\n".getBytes("US-ASCII") ++ pixels
  }
}
