package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector math in [[graft.operators.Similarity]].
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) cannot be
  * whole-stage-codegen'd — each element evaluation walks an interpreted
  * lambda. For a 64-float dot product on millions of candidate pairs
  * that interpretation dominates the similarity queries' runtime, so
  * this is exactly the case SURVEY.md §7.4 reserves for a custom
  * `Expression`: semantics the built-ins can express but not at the
  * required speed. `doGenCode` emits a tight primitive loop (one pass
  * computes dot, |a|² and |b|²); `nullSafeEval` is the interpreted
  * fallback with identical arithmetic (same order, same doubles —
  * results are bit-identical to the HOF formulation, so oracle checks
  * are unaffected).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; xx += xi * xi; yy += yi * yi
      i += 1
    }
    dot / (math.sqrt(xx) * math.sqrt(yy))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $xx = 0.0, $yy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $xx += $xi * $xi; $yy += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared euclidean distance over array<double> columns — the k-means
  * assignment kernel (`graft.operators.Similarity` q39). Same rationale
  * as [[CosineSimilarity]]: the HOF formulation
  * (`aggregate(zip_with(...))`) walks an interpreted lambda per
  * element per candidate row; this emits one fused primitive loop.
  * Arithmetic is the identical left-to-right double fold, so results
  * are bit-equal to the HOF form and the DuckDB oracle's
  * `list_sum(list_transform(...))`. */
case class SquaredL2Distance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_l2sq expects (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val di = ctx.freshName("di")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $di = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $di * $di;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Signed-random-projection (Charikar) LSH bucket over an
  * array<float> embedding: bit j of the result is the sign of the
  * dot product with seeded hyperplane j. The declarative form is 8
  * sum-of-64-products column expressions — a 512-term tree that costs
  * ~1 s of fresh codegen per plan plus slow evaluation; this kernel
  * is one fused pass (all 8 accumulators per element).
  *
  * Arithmetic is the identical left-to-right double fold per plane as
  * the SQL expression it replaces and the DuckDB oracle's explicit
  * sum, so sign bits — and therefore buckets, probe sets, and final
  * top-k — are bit-equal. NULL embedding → NULL (callers that need
  * the legacy CASE-folds-null-to-0 semantics wrap in coalesce). */
case class HyperplaneBucket(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import HyperplaneBucket._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hplane_bucket expects array<float>, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_hplane_bucket"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), Dims)
    val acc = new Array[Double](Planes)
    var i = 0
    while (i < n) {
      val vi = v.getFloat(i).toDouble
      var j = 0
      while (j < Planes) { acc(j) += vi * Coef(j)(i); j += 1 }
      i += 1
    }
    var b = 0
    var j = 0
    while (j < Planes) { if (acc(j) > 0) b |= 1 << j; j += 1 }
    b
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val coef = ctx.addReferenceObj("hplaneCoef", Coef, "double[][]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val vi = ctx.freshName("vi")
      val b = ctx.freshName("b")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $Dims);
         |double[] $acc = new double[$Planes];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $vi = (double) $a.getFloat($i);
         |  for (int $j = 0; $j < $Planes; $j++) {
         |    $acc[$j] += $vi * $coef[$j][$i];
         |  }
         |}
         |int $b = 0;
         |for (int $j = 0; $j < $Planes; $j++) {
         |  if ($acc[$j] > 0) $b |= 1 << $j;
         |}
         |${ev.value} = $b;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {
  val Planes = 8
  val Dims = 64

  /** Seeded hyperplane coefficients — (j, i) from the first four md5
    * bytes of "plane:j:dim:i", mapped to [-1, 1). Public data only
    * (md5), reproducible everywhere; the SINGLE source of truth — the
    * oracle SQL embeds exactly these doubles as literals. */
  val Coef: Array[Array[Double]] = Array.tabulate(Planes, Dims) { (j, i) =>
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$j:dim:$i".getBytes("UTF-8"))
    val x = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    x.toDouble / (1L << 31).toDouble - 1.0
  }
}

/** Map-side IVF probe assignment: the `nprobe` nearest coarse-quantizer
  * cells of vector `left` against the BROADCAST centroid array `right`
  * (one row of `array<struct<cid: long, cv: array<double>>>`), returned
  * as `array<struct<cid: long, dist: double>>` sorted ascending by
  * (dist, cid).
  *
  * This is the scale fix for the k-NN similarity join's probe stage
  * (`graft.operators.Similarity` q86) and for every k-means assignment
  * pass: the declarative form — cross join each of n vectors with k
  * centroid rows, then `row_number() OVER (PARTITION BY vec_id)` —
  * materializes and SHUFFLES n×k rows just to keep nprobe of them,
  * which with corpus-derived k = n/TargetPerCell is n²/1000 shuffled
  * rows. Here the selection happens per row under the broadcast:
  * nothing wider than the nprobe winners ever leaves the map side.
  *
  * Distance arithmetic is the identical left-to-right double fold as
  * [[SquaredL2Distance]] and the DuckDB oracle's
  * `list_sum(list_transform(...))`, and the (dist, cid) tie-break
  * matches the window formulation's ORDER BY, so the selected cells —
  * and every downstream join and top-k — are bit-equal to the shuffle
  * form. Selection is a partial selection scan (O(k·nprobe), nprobe
  * small), independent of centroid array order since (dist, cid) is a
  * strict total order (cids are distinct). */
case class TopCells(left: Expression, right: Expression, nprobe: Int)
  extends BinaryExpression {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
          ArrayType(StructType(Array(f0, f1)), _))
          if f0.dataType == LongType &&
            f1.dataType.isInstanceOf[ArrayType] &&
            f1.dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_top_cells expects (array<double>, " +
          s"array<struct<cid: long, cv: array<double>>>), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("cid", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_top_cells"

  override def nullSafeEval(a: Any, b: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val v = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val k = cents.numElements()
    val ds = new Array[Double](k)
    val cs = new Array[Long](k)
    var c = 0
    while (c < k) {
      val row = cents.getStruct(c, 2)
      cs(c) = row.getLong(0)
      val cv = row.getArray(1)
      val n = math.min(v.numElements(), cv.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = v.getDouble(i) - cv.getDouble(i)
        acc += d * d
        i += 1
      }
      ds(c) = acc
      c += 1
    }
    val m = math.min(nprobe, k)
    val used = new Array[Boolean](k)
    val out = new Array[Any](m)
    var r = 0
    while (r < m) {
      var best = -1
      var c2 = 0
      while (c2 < k) {
        if (!used(c2) && (best < 0 || ds(c2) < ds(best) ||
          (ds(c2) == ds(best) && cs(c2) < cs(best)))) best = c2
        c2 += 1
      }
      used(best) = true
      out(r) = new GenericInternalRow(
        Array[Any](cs(best), ds(best)))
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val k = ctx.freshName("k")
      val ds = ctx.freshName("ds")
      val cs = ctx.freshName("cs")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val di = ctx.freshName("di")
      val m = ctx.freshName("m")
      val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val best = ctx.freshName("best")
      val c2 = ctx.freshName("c2")
      s"""
         |int $k = $b.numElements();
         |double[] $ds = new double[$k];
         |long[] $cs = new long[$k];
         |for (int $c = 0; $c < $k; $c++) {
         |  org.apache.spark.sql.catalyst.InternalRow $row = $b.getStruct($c, 2);
         |  $cs[$c] = $row.getLong(0);
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $row.getArray(1);
         |  int $n = java.lang.Math.min($a.numElements(), $cv.numElements());
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $di = $a.getDouble($i) - $cv.getDouble($i);
         |    $acc += $di * $di;
         |  }
         |  $ds[$c] = $acc;
         |}
         |int $m = java.lang.Math.min($nprobe, $k);
         |boolean[] $used = new boolean[$k];
         |Object[] $out = new Object[$m];
         |for (int $r = 0; $r < $m; $r++) {
         |  int $best = -1;
         |  for (int $c2 = 0; $c2 < $k; $c2++) {
         |    if (!$used[$c2] && ($best < 0 || $ds[$c2] < $ds[$best] ||
         |        ($ds[$c2] == $ds[$best] && $cs[$c2] < $cs[$best]))) $best = $c2;
         |  }
         |  $used[$best] = true;
         |  $out[$r] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ $cs[$best], $ds[$best] });
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Column-level entry point: cosine(a, b) over array<float> columns. */
  def cosine(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSimilarity(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column-level entry point: squared L2 over array<double> columns. */
  def l2sq(a: Column, b: Column): Column =
    GraftSqlBridge.column(SquaredL2Distance(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column-level entry point: 16-bit SimHash over an array<string>
    * token column. */
  def simhash16(toks: Column): Column =
    GraftSqlBridge.column(SimHash16(GraftSqlBridge.expression(toks)))

  /** Column-level entry point: K=16 MinHash hex signature array over
    * an array<string> token-set column. */
  def minhash16(tokset: Column): Column =
    GraftSqlBridge.column(MinHash16(GraftSqlBridge.expression(tokset)))

  /** Space-joined k-token shingles (optionally distinct,
    * first-occurrence order); empty below k tokens. */
  def shingles(toks: Column, k: Int, distinct: Boolean): Column =
    GraftSqlBridge.column(TokenShingles(GraftSqlBridge.expression(toks), k, distinct))

  /** Distinct character k-grams (substring semantics); empty below k
    * chars. */
  def charNgrams(s: Column, k: Int): Column =
    GraftSqlBridge.column(CharNgrams(GraftSqlBridge.expression(s), k))

  /** Lexicographic min of md5 hex over array<string>; NULL on empty. */
  def minMd5(arr: Column): Column =
    GraftSqlBridge.column(MinMd5(GraftSqlBridge.expression(arr)))

  /** 8-plane LSH bucket over an array<float> embedding column. */
  def hyperplaneBucket(v: Column): Column =
    GraftSqlBridge.column(HyperplaneBucket(GraftSqlBridge.expression(v)))

  /** nprobe nearest IVF cells of `v` (array<double>) against a
    * broadcast centroid array column — see [[TopCells]]. */
  def topCells(v: Column, cents: Column, nprobe: Int): Column =
    GraftSqlBridge.column(TopCells(
      GraftSqlBridge.expression(v), GraftSqlBridge.expression(cents), nprobe))

  /** Idempotent SQL registration so `graft_cosine(a, b)` /
    * `graft_l2sq(a, b)` work in `spark.sql` / `expr` strings on an
    * existing session. */
  def register(spark: SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark,
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      children => CosineSimilarity(children(0), children(1)))
    GraftSqlBridge.registerFunction(spark,
      FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[SquaredL2Distance].getName, "graft_l2sq"),
      children => SquaredL2Distance(children(0), children(1)))
    GraftSqlBridge.registerFunction(spark,
      FunctionIdentifier("graft_simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "graft_simhash16"),
      children => SimHash16(children(0)))
    GraftSqlBridge.registerFunction(spark,
      FunctionIdentifier("graft_minhash16"),
      new ExpressionInfo(classOf[MinHash16].getName, "graft_minhash16"),
      children => MinHash16(children(0)))
    GraftSqlBridge.registerFunction(spark,
      FunctionIdentifier("graft_hplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucket].getName, "graft_hplane_bucket"),
      children => HyperplaneBucket(children(0)))
  }
}

/** Algebraic rewrite: `graft_cosine(x, x)` is identically 1.0 for any
  * non-degenerate vector, so self-similarity (the diagonal that
  * all-pairs similarity joins routinely produce) folds to a literal —
  * a whole 64-float kernel invocation per row removed at plan time.
  * Registered through the standard `Rule[LogicalPlan]` extension
  * point.
  *
  * The fold only fires for NON-NULLABLE children: `BinaryExpression`
  * is null-intolerant, so `graft_cosine(x, x)` is NULL when x is NULL,
  * and an unconditional literal would turn that NULL into 1.0.
  * Documented divergence that remains: a zero vector gives 0/0 = NaN
  * un-folded but 1.0 folded; embeddings are validated non-degenerate
  * upstream, matching the convention that a vector is always
  * self-similar. */
object FoldSelfCosine
  extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b)
          if a.deterministic && !a.nullable && a.semanticEquals(b) =>
        Literal(1.0, DoubleType)
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` installs the
  * function library + optimizer rules at session build time (the
  * deployment path; tests use [[VectorFunctions.register]] on the
  * shared session). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))
    ext.injectFunction(
      FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[SquaredL2Distance].getName, "graft_l2sq"),
      (children: Seq[Expression]) => SquaredL2Distance(children(0), children(1)))
    ext.injectFunction(
      FunctionIdentifier("graft_simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "graft_simhash16"),
      (children: Seq[Expression]) => SimHash16(children(0)))
    ext.injectFunction(
      FunctionIdentifier("graft_minhash16"),
      new ExpressionInfo(classOf[MinHash16].getName, "graft_minhash16"),
      (children: Seq[Expression]) => MinHash16(children(0)))
    ext.injectFunction(
      FunctionIdentifier("graft_hplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucket].getName, "graft_hplane_bucket"),
      (children: Seq[Expression]) => HyperplaneBucket(children(0)))
    ext.injectOptimizerRule(_ => FoldSelfCosine)
    // opt-in (spark.graft.ivfTopK) top-k similarity pushdown: rewrite
    // ORDER BY graft_cosine(col, literal) DESC LIMIT k over a table
    // with a registered IVF index to the probed-cells scan
    ext.injectOptimizerRule(_ => graft.plans.IvfTopKRewrite)
  }
}
