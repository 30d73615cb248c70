package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Signed feature-hash embedding kernels for the semantic-dedup
  * operator ([[graft.ops.SemDedup]]) as native codegen expressions
  * (SURVEY §2.10 custom codegen scalar; the r18-verdict "fold the
  * per-shingle O(dims) accumulator rebuild into a codegen Expression"
  * item).
  *
  * Semantics are EXACTLY the SQL chain they replace (r18
  * PipelineQueries helpers), so the DuckDB oracle keeps re-deriving
  * the same values from scratch:
  *
  *  - `signed_feature_fold(sh, dims)`: for each non-null shingle s,
  *    idx = (first 15 hex chars of md5("fh|"+s) as a 60-bit int) mod
  *    dims, sign = +1 if the same prefix of md5("fs|"+s) is even else
  *    −1; acc[idx] += sign. One md5 pair per shingle and one O(dims)
  *    array allocation per ROW — the SQL `aggregate(...,
  *    transform(acc, ...))` it replaces rebuilt the accumulator array
  *    once per SHINGLE (O(dims·|sh|) copies).
  *  - `hyperplane_dots(v, nPlanes)`: the nPlanes dot products of v
  *    against [[graft.ops.Vectors.planeMatrix]]'s md5-seeded ±1
  *    hyperplanes, ascending-index accumulation (bit-identical to
  *    DuckDB's list_inner_product over the same literal planes; all
  *    inputs are small exact integers in doubles).
  *
  * Both go through a static JVM helper from generated code (the
  * SimHashText pattern) — no boxing, stays inside WholeStageCodegen.
  */
object FeatureHashImpl {

  /** First 15 hex chars of md5(s) as a non-negative 60-bit long —
    * bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)` /
    * DuckDB `CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)`.
    */
  private def md5hex60(s: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xFFL); i += 1 }
    (v << 4) | ((dig(7) & 0xFFL) >>> 4)
  }

  def fold(sh: ArrayData, dims: Int): ArrayData = {
    val acc = new Array[Double](dims)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      // null elements are no-ops, like the NULL-propagating SQL fold
      if (!sh.isNullAt(i)) {
        val s = sh.getUTF8String(i).toString
        val idx = (md5hex60("fh|" + s) % dims).toInt
        acc(idx) += (if (md5hex60("fs|" + s) % 2 == 0) 1.0 else -1.0)
      }
      i += 1
    }
    ArrayData.toArrayData(acc)
  }

  /** Per-(nPlanes, dims) plane matrix, derived once per JVM — the
    * exact [[graft.ops.Vectors.planeMatrix]] values (same md5 seed).
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planes(nPlanes: Int, dims: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nPlanes, dims), (k: (Int, Int)) =>
      graft.ops.Vectors.planeMatrix(k._1, k._2).map(_.toArray).toArray)

  def dots(v: ArrayData, nPlanes: Int): ArrayData = {
    val dims = v.numElements()
    val pl = planes(nPlanes, dims)
    val out = new Array[Double](nPlanes)
    var p = 0
    while (p < nPlanes) {
      val row = pl(p)
      var a = 0.0
      var d = 0
      while (d < dims) { a += row(d) * v.getDouble(d); d += 1 }
      out(p) = a
      p += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** `signed_feature_fold(sh array<string>, dims int)` → array<double>. */
case class SignedFeatureFold(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "signed_feature_fold"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] &&
        left.dataType.asInstanceOf[ArrayType].elementType == StringType &&
        right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"signed_feature_fold expects (array<string>, int dims), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def nullSafeEval(sh: Any, dims: Any): Any = {
    val d = dims.asInstanceOf[Int]
    require(d >= 1 && d <= 4096, s"signed_feature_fold: dims $d out of 1..4096")
    FeatureHashImpl.fold(sh.asInstanceOf[ArrayData], d)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, dims) =>
      s"${ev.value} = graft.functions.FeatureHashImpl.fold($sh, $dims);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SignedFeatureFold = copy(left = l, right = r)
}

/** `hyperplane_dots(v array<double>, nPlanes int)` → array<double>. */
case class HyperplaneDots(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hyperplane_dots"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] &&
        left.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
        right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hyperplane_dots expects (array<double>, int nPlanes), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def nullSafeEval(v: Any, np: Any): Any = {
    val n = np.asInstanceOf[Int]
    require(n >= 1 && n <= 1024, s"hyperplane_dots: nPlanes $n out of 1..1024")
    FeatureHashImpl.dots(v.asInstanceOf[ArrayData], n)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, np) =>
      s"${ev.value} = graft.functions.FeatureHashImpl.dots($v, $np);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HyperplaneDots = copy(left = l, right = r)
}
