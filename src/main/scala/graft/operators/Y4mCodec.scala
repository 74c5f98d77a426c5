package graft.operators

/** A real, pure-JVM video codec for the multimodal pipeline:
  * YUV4MPEG2 ("y4m") — the uncompressed frame-interchange container
  * spoken by ffmpeg/mjpegtools/x264, and the video twin of
  * [[PpmCodec]]/[[WavCodec]]. The parser handles the actual container
  * grammar — the `YUV4MPEG2` stream-header line with its tagged
  * parameters (`W`/`H`/`F`/`I`/`A`/`C`/`X`), then a sequence of
  * `FRAME` headers each followed by exactly one raw plane payload —
  * and rejects malformed input instead of guessing.
  *
  * Deliberately narrow, like PPM's maxval <= 255 and WAV's 16-bit
  * mono PCM: colorspaces `mono` (one w*h luma plane per frame) and
  * the 4:2:0 family (`420`, `420jpeg`, `420mpeg2`, `420paldv` —
  * w*h + 2*(w/2)*(h/2) bytes per frame, even dims required). A
  * production deployment swaps [[decode]]'s callers to a library
  * codec for compressed formats; the Spark-side plumbing (binary
  * column in, typed features out, partition-local execution) is
  * identical.
  */
object Y4mCodec {

  /** A decoded stream: header fields + per-frame plane payloads
    * (mono: the luma plane; 420: Y then U then V, packed). */
  final case class Video(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      colorspace: String, frames: Array[Array[Byte]])

  private val Magic = "YUV4MPEG2"
  private val Colorspaces = Set("mono", "420", "420jpeg", "420mpeg2", "420paldv")

  /** Bytes of one frame payload for the given geometry. */
  def frameSize(width: Int, height: Int, colorspace: String): Int =
    if (colorspace == "mono") width * height
    else width * height + 2 * ((width / 2) * (height / 2))

  /** Strict YUV4MPEG2 parse; throws IllegalArgumentException on any
    * grammar violation (bad magic, missing/duplicate/unknown
    * parameters, non-numeric geometry, unsupported colorspace, odd
    * 4:2:0 dims, bad FRAME marker, truncated frame, trailing bytes). */
  def decode(bytes: Array[Byte]): Video = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"Y4M: $msg")
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != '\n') i += 1
      if (i >= bytes.length) fail(s"unterminated header line at byte $from")
      i
    }
    val hdrEnd = lineEnd(0)
    val header = new String(bytes, 0, hdrEnd, "US-ASCII")
    val tokens = header.split(" ", -1)
    if (tokens.isEmpty || tokens(0) != Magic)
      fail(s"bad magic (want $Magic)")
    var w, h, fpsN, fpsD = -1
    var interlace: Option[Char] = None
    var aspect: Option[(Int, Int)] = None
    var cs: Option[String] = None
    def posInt(v: String, what: String): Int = {
      if (v.isEmpty || !v.forall(_.isDigit)) fail(s"non-numeric $what '$v'")
      val n = try v.toInt catch { case _: NumberFormatException =>
        fail(s"$what '$v' out of range") }
      if (n <= 0) fail(s"non-positive $what $n")
      n
    }
    def ratio(v: String, what: String): (Int, Int) = v.split(":", -1) match {
      case Array(a, b) => (posInt(a, s"$what numerator"),
        posInt(b, s"$what denominator"))
      case _ => fail(s"malformed $what ratio '$v'")
    }
    tokens.drop(1).foreach { t =>
      if (t.isEmpty) fail("empty parameter (double space in header)")
      (t.head, t.tail) match {
        case ('W', v) => if (w >= 0) fail("duplicate W") else w = posInt(v, "width")
        case ('H', v) => if (h >= 0) fail("duplicate H") else h = posInt(v, "height")
        case ('F', v) =>
          if (fpsN >= 0) fail("duplicate F")
          val (n0, d0) = ratio(v, "frame rate"); fpsN = n0; fpsD = d0
        case ('I', v) =>
          if (interlace.isDefined) fail("duplicate I")
          if (v.length != 1 || !"ptbm".contains(v.head))
            fail(s"unknown interlacing '$v'")
          interlace = Some(v.head)
        case ('A', v) =>
          if (aspect.isDefined) fail("duplicate A")
          aspect = Some(ratio(v, "aspect"))
        case ('C', v) =>
          if (cs.isDefined) fail("duplicate C")
          if (!Colorspaces.contains(v)) fail(s"unsupported colorspace '$v'")
          cs = Some(v)
        case ('X', _) => () // extension parameter — ignored per spec
        case (p, _) => fail(s"unknown parameter '$p' in '$t'")
      }
    }
    if (w < 0) fail("missing width (W)")
    if (h < 0) fail("missing height (H)")
    if (fpsN < 0) fail("missing frame rate (F)")
    val space = cs.getOrElse("420") // the spec's default is 4:2:0
    if (space != "mono" && ((w & 1) == 1 || (h & 1) == 1))
      fail(s"odd dimensions ${w}x$h for 4:2:0 colorspace")
    if (w.toLong * h > Int.MaxValue / 2) fail(s"oversized frame ${w}x$h")
    val fsize = frameSize(w, h, space)
    val frames = Array.newBuilder[Array[Byte]]
    var pos = hdrEnd + 1
    while (pos < bytes.length) {
      if (pos + 6 > bytes.length ||
          new String(bytes, pos, 5, "US-ASCII") != "FRAME")
        fail(s"bad FRAME marker at byte $pos")
      // frame parameters (if any) must be space-separated, newline-terminated
      if (bytes(pos + 5) != '\n' && bytes(pos + 5) != ' ')
        fail(s"malformed FRAME header at byte $pos")
      val fe = lineEnd(pos + 5)
      if (fe + 1 + fsize > bytes.length)
        fail(s"truncated frame: want $fsize bytes after byte ${fe + 1}, " +
          s"have ${bytes.length - fe - 1}")
      frames += java.util.Arrays.copyOfRange(bytes, fe + 1, fe + 1 + fsize)
      pos = fe + 1 + fsize
    }
    Video(w, h, fpsN, fpsD, space, frames.result())
  }

  /** Encode (the synthesis twin — a complete canonical writer:
    * full stream-header parameter set, bare `FRAME` markers). */
  def encode(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      colorspace: String, frames: Array[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(fpsNum > 0 && fpsDen > 0, s"bad rate $fpsNum:$fpsDen")
    require(Colorspaces.contains(colorspace), s"bad colorspace $colorspace")
    val fsize = frameSize(width, height, colorspace)
    frames.foreach(f => require(f.length == fsize,
      s"frame has ${f.length} bytes, want $fsize"))
    val header =
      s"$Magic W$width H$height F$fpsNum:$fpsDen Ip A1:1 C$colorspace\n"
        .getBytes("US-ASCII")
    val fh = "FRAME\n".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(
      header.length + frames.length * (fh.length + fsize))
    out.put(header)
    frames.foreach { f => out.put(fh); out.put(f) }
    out.array()
  }
}
