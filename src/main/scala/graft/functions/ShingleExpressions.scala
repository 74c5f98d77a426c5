package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernels for the shingle expressions — also the interpreted
  * fallbacks. Each replaces an interpreted higher-order-function
  * pipeline (`transform(sequence(...), i -> ...slice/substring...)`)
  * that walks a lambda per shingle per row; measured at 10+ seconds
  * per corpus pass at sf0.1 in the curation queries.
  *
  * Parity contracts (asserted in VectorExprSpec):
  *  - [[ShingleKernels.tokenShingles]] ≡ `transform(sequence(1, n-k+1),
  *    i -> concat_ws(' ', slice(toks, i, k)))`, optionally wrapped in
  *    `array_distinct` (first-occurrence order); empty array when the
  *    input has fewer than k tokens (the callers' CASE guard).
  *  - [[ShingleKernels.charNgrams]] ≡ `array_distinct(transform(
  *    sequence(1, length(s)-k+1), i -> substring(s, i, k)))`; empty
  *    when length < k.
  *  - [[ShingleKernels.minMd5]] ≡ `array_min(transform(arr, x ->
  *    md5(x)))` — NULL on an empty array.
  */
object ShingleKernels {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray
  private val space = UTF8String.fromString(" ")

  def tokenShingles(arr: ArrayData, k: Int, distinct: Boolean): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(new Array[AnyRef](0))
    // hot path: allocate only the container this mode uses
    val out = if (distinct) new java.util.LinkedHashSet[UTF8String]() else null
    val list = if (distinct) null else new java.util.ArrayList[AnyRef](n - k + 1)
    var i = 0
    while (i <= n - k) {
      // concat_ws semantics: null tokens are skipped, others joined
      val parts = new java.util.ArrayList[UTF8String](k)
      var j = 0
      while (j < k) {
        if (!arr.isNullAt(i + j)) parts.add(arr.getUTF8String(i + j))
        j += 1
      }
      val s = UTF8String.concatWs(space, parts.toArray(new Array[UTF8String](parts.size())): _*)
      if (distinct) out.add(s) else list.add(s)
      i += 1
    }
    if (distinct) new GenericArrayData(out.toArray)
    else new GenericArrayData(list.toArray)
  }

  def charNgrams(s: UTF8String, k: Int): ArrayData = {
    val n = s.numChars()
    if (n < k) return new GenericArrayData(new Array[AnyRef](0))
    val out = new java.util.LinkedHashSet[UTF8String]()
    var i = 1
    while (i <= n - k + 1) {
      out.add(s.substringSQL(i, k))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def minMd5(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val md = digest.get()
    var min: Array[Byte] = null
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val h = md.digest(arr.getUTF8String(i).getBytes)
        if (min == null || less(h, min)) min = h
      }
      i += 1
    }
    if (min == null) null else hex(min)
  }

  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def hex(h: Array[Byte]): UTF8String = {
    val out = new Array[Byte](h.length * 2)
    var i = 0
    while (i < h.length) {
      out(2 * i) = hexChars((h(i) >>> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(h(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Space-joined k-token shingles of an array<string> column in one
  * codegen'd pass. `distinct = true` keeps first occurrences
  * (array_distinct order). Below k tokens → empty array. */
case class TokenShingles(child: Expression, k: Int, distinct: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(a: Any): Any =
    ShingleKernels.tokenShingles(a.asInstanceOf[ArrayData], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleKernels.tokenShingles($c, $k, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct character k-grams of a string column (substring semantics,
  * first-occurrence order). Below k chars → empty array. */
case class CharNgrams(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_char_ngrams expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override def nullSafeEval(a: Any): Any =
    ShingleKernels.charNgrams(a.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleKernels.charNgrams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Lexicographic min of md5 hex over an array<string> — the winnowing
  * reduction of a shingle fingerprint. NULL on empty input. */
case class MinMd5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_min_md5 expects array<string>, got $t")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_min_md5"

  override def nullSafeEval(a: Any): Any =
    ShingleKernels.minMd5(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.ShingleKernels.minMd5($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
    res
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
