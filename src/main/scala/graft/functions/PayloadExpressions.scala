package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic media-payload synthesis (graft.operators.Multimodal):
  * the P6 PPM and RIFF/WAV binaries the codecs decode are generated
  * from doc_id by pure integer arithmetic. The declarative form —
  * `unhex(concat(hex(...), array_join(transform(sequence(...), k ->
  * lpad(hex(...), 2, '0')), '')))` — walks an interpreted lambda per
  * BYTE per row and round-trips every byte through hex text; at sf0.1
  * that synthesis dominated q70/q71/q74 (~3× regression when the
  * payloads became real containers in round 8). These kernels emit
  * the identical bytes in one pass.
  *
  * Byte layouts are the single source of truth shared with the DuckDB
  * oracles, which recompute features from the same integer formulas
  * (never from the bytes), so byte-for-byte equality with the
  * declarative form — asserted in IoStreamingSpec — is what keeps the
  * oracle gates unchanged. */
object PayloadSynthesis {

  /** P6 PPM: "P6\n{w} {h}\n255\n" + raster; pixel byte k =
    * (doc_id + 7k) mod 256; w = id%16+4, h = id%12+4. */
  def ppmBytes(id: Long): Array[Byte] = {
    val w = (id % 16 + 4).toInt
    val h = (id % 12 + 4).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val n = w * h * 3
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var k = 0
    while (k < n) {
      out(header.length + k) = ((id + 7L * k) % 256).toByte
      k += 1
    }
    out
  }

  /** Canonical 44-byte RIFF/WAV header (PCM, mono, 16-bit, 16 kHz) +
    * n = id%800+160 little-endian samples; sample k =
    * ((id*31 + 7k) mod 4096) - 2048 as u16 two's complement. */
  def wavBytes(id: Long): Array[Byte] = {
    val n = (id % 800 + 160).toInt
    val out = new Array[Byte](44 + 2 * n)
    def ascii(pos: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, out, pos, b.length)
    }
    def le16(pos: Int, v: Int): Unit = {
      out(pos) = (v & 0xFF).toByte
      out(pos + 1) = ((v >> 8) & 0xFF).toByte
    }
    def le32(pos: Int, v: Int): Unit = {
      le16(pos, v & 0xFFFF); le16(pos + 2, v >>> 16)
    }
    ascii(0, "RIFF"); le32(4, 36 + 2 * n)
    ascii(8, "WAVEfmt "); le32(16, 16)
    le16(20, 1); le16(22, 1)
    le32(24, 16000); le32(28, 32000)
    le16(32, 2); le16(34, 16)
    ascii(36, "data"); le32(40, 2 * n)
    var k = 0
    while (k < n) {
      val u = (((id * 31 + 7L * k) % 4096).toInt - 2048) & 0xFFFF
      out(44 + 2 * k) = (u & 0xFF).toByte
      out(45 + 2 * k) = ((u >> 8) & 0xFF).toByte
      k += 1
    }
    out
  }

  /** YUV4MPEG2 mono stream: "YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1
    * Cmono\n" + nf = id%6+2 frames, each "FRAME\n" + a w*h luma
    * plane (w = id%8+4, h = id%6+4); luma byte k of frame f =
    * (id + 11f + 7k) mod 256. */
  def y4mBytes(id: Long): Array[Byte] = {
    val w = (id % 8 + 4).toInt
    val h = (id % 6 + 4).toInt
    val nf = (id % 6 + 2).toInt
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 Cmono\n".getBytes("US-ASCII")
    val fh = "FRAME\n".getBytes("US-ASCII")
    val wh = w * h
    val out = new Array[Byte](header.length + nf * (6 + wh))
    System.arraycopy(header, 0, out, 0, header.length)
    var pos = header.length
    var f = 0
    while (f < nf) {
      System.arraycopy(fh, 0, out, pos, 6)
      pos += 6
      var k = 0
      while (k < wh) {
        out(pos + k) = ((id + 11L * f + 7L * k) % 256).toByte
        k += 1
      }
      pos += wh
      f += 1
    }
    out
  }
}

/** Codegen'd wrapper over [[PayloadSynthesis]]: one fused byte-array
  * build per row (the generated code calls the static forwarder
  * directly — no hex text, no interpreted lambda per byte). */
case class SynthPayload(child: Expression, kind: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_synth_$kind expects bigint doc_id, got $t")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = s"graft_synth_$kind"

  override def nullSafeEval(a: Any): Any = kind match {
    case "ppm" => PayloadSynthesis.ppmBytes(a.asInstanceOf[Long])
    case "y4m" => PayloadSynthesis.y4mBytes(a.asInstanceOf[Long])
    case _ => PayloadSynthesis.wavBytes(a.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = kind match {
      case "ppm" => "ppmBytes"
      case "y4m" => "y4mBytes"
      case _ => "wavBytes"
    }
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PayloadSynthesis.$fn($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaFunctions {
  /** Synthesized P6 PPM payload column from a bigint doc_id column. */
  def ppmPayload(id: Column): Column =
    GraftSqlBridge.column(SynthPayload(GraftSqlBridge.expression(id), "ppm"))
  /** Synthesized RIFF/WAV payload column from a bigint doc_id column. */
  def wavPayload(id: Column): Column =
    GraftSqlBridge.column(SynthPayload(GraftSqlBridge.expression(id), "wav"))
  /** Synthesized YUV4MPEG2 payload column from a bigint doc_id column. */
  def y4mPayload(id: Column): Column =
    GraftSqlBridge.column(SynthPayload(GraftSqlBridge.expression(id), "y4m"))
}
