package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[SimHash16]] — also the interpreted fallback.
  *
  * Per token: md5 of the UTF-8 bytes, then the 16-bit value encoded by
  * the first four hex digits with LITTLE-ENDIAN nibble weights
  * (digit j weighted 16^j — the same arithmetic as the SQL
  * formulation `instr('0123456789abcdef', substr(md5(t), j+1, 1)) - 1)
  * * 16^j` in [[graft.operators.Dedup]] and the DuckDB oracle).
  * Fingerprint bit b is set iff the count of tokens with bit b set
  * exceeds half the token count (the sign of the ±1 fold). A NULL
  * token contributes -1 to every bit — exactly what the SQL
  * `CASE WHEN ((x >> b) & 1) = 1 THEN 1 ELSE -1 END` yields for a
  * NULL x — which is the same as a token with value 0.
  */
object SimHash16Kernel {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def fp(arr: ArrayData): Int = {
    val n = arr.numElements()
    val ones = new Array[Int](16)
    var i = 0
    while (i < n) {
      var v = 0
      if (!arr.isNullAt(i)) {
        val md = digest.get()
        md.reset()
        val h = md.digest(arr.getUTF8String(i).getBytes)
        val b0 = h(0) & 0xff
        val b1 = h(1) & 0xff
        // hex chars c0..c3 are (hi b0, lo b0, hi b1, lo b1); value =
        // c0 + 16*c1 + 256*c2 + 4096*c3
        v = (b0 >>> 4) | ((b0 & 0xf) << 4) | ((b1 >>> 4) << 8) | ((b1 & 0xf) << 12)
      }
      var b = 0
      while (b < 16) { ones(b) += (v >>> b) & 1; b += 1 }
      i += 1
    }
    var out = 0
    var b = 0
    while (b < 16) {
      // sign of (ones - (n - ones)) > 0  ⇔  2*ones > n
      if (2 * ones(b) > n) out |= 1 << b
      b += 1
    }
    out
  }
}

/** 16-bit SimHash fingerprint over an array<string> token column in a
  * single codegen'd pass. The declarative form (one `transform` to
  * hash tokens + 16 `aggregate` folds, one per bit) walks interpreted
  * lambdas 17× per row and re-hashes nothing but still traverses the
  * array 17 times; this computes the identical fingerprint
  * (bit-for-bit, see [[SimHash16Kernel]]) with one md5 per token and
  * one traversal. NULL input → NULL (standard null-intolerant
  * unary); call sites that need the legacy `0` use coalesce. */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash16 expects array<string>, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_simhash16"

  override def nullSafeEval(a: Any): Any =
    SimHash16Kernel.fp(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash16Kernel.fp($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared kernel for [[MinHash16]] — also the interpreted fallback.
  *
  * K = 16 salted permutations, as ever: position i ranks tokens by
  * md5("<i>:" ++ token). The carried VALUE is the first 32 bits of
  * the winning digest as an unsigned number in a BIGINT (== the
  * numeric fold of the digest's first 8 hex chars) — 8 bytes per
  * position through every downstream join/shuffle/checkpoint instead
  * of a 32-char hex string. The min is taken over the 32-bit
  * prefixes directly; numeric order of prefixes == lexicographic
  * order of the 8-hex-char prefixes, so DuckDB mirrors it exactly as
  * `hexFold(list_min(list_transform(tokset, t ->
  * substr(md5('<i>:' || t), 1, 8))), 8)`. (A 4-digest sliced variant
  * was measured and REVERTED: the different permutation family drew
  * band mega-buckets of ~1.5k docs on this corpus — candidate volume
  * doubled while half failed the est filter, q31 9s → 20s. Prefix
  * truncation keeps the ORIGINAL family's bucket structure, modulo
  * negligible 32-bit prefix ties that both engines share.)
  * NULL tokens are skipped (list_min ignores NULLs); a position with
  * no non-NULL token (empty tokset) is NULL.
  */
object MinHash16Kernel {
  val K = 16
  private val salts: Array[Array[Byte]] =
    (0 until K).map(i => s"$i:".getBytes("UTF-8")).toArray
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def sigs(arr: ArrayData): ArrayData = {
    val mins = new Array[Long](K)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var seen = false
    val md = digest.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val tok = arr.getUTF8String(i).getBytes
        var k = 0
        while (k < K) {
          md.reset()
          md.update(salts(k))
          md.update(tok)
          val h = md.digest()
          val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
            ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](K)
    if (seen) {
      var k = 0
      while (k < K) { out(k) = java.lang.Long.valueOf(mins(k)); k += 1 }
    }
    new GenericArrayData(out)
  }
}

/** K=16 MinHash signature over an array<string> token-set column in a
  * single codegen'd pass: one array traversal with 16 salted md5s per
  * token, instead of 16 interpreted `array_min(transform(...))`
  * lambdas each re-walking the array. Output is array<bigint> of the
  * 16 min values (32-bit digest prefixes — see [[MinHash16Kernel]]).
  * NULL input → NULL; call sites needing the legacy
  * array-of-16-NULLs (what `array(sig0, ..., sig15)` yielded on a
  * NULL token set) use coalesce. */
case class MinHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash16 expects array<string>, got $t")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = true)
  override def prettyName: String = "graft_minhash16"

  override def nullSafeEval(a: Any): Any =
    MinHash16Kernel.sigs(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash16Kernel.sigs($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
