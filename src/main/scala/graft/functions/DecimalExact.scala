package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}

/** Exact decimal arithmetic at an EXPLICIT result scale — ClickHouse's
  * `divideDecimal(a, b, result_scale)` / `multiplyDecimal(a, b,
  * result_scale)`.
  *
  * Spark's own decimal binary arithmetic can NOT express this: with
  * `spark.sql.decimalOperations.allowPrecisionLoss=true` (the default)
  * the result scale of DECIMAL(38,18)/DECIMAL(38,18) is capped at 6, so
  * a SQL-macro spelling silently truncates any requested scale > 6
  * (divideDecimal(1, 3, 10) -> 0.333333 instead of 0.3333333333). This
  * expression side-steps the type-coercion lattice entirely: the math
  * runs on java.math.BigDecimal (exact, arbitrary precision), and only
  * the RESULT is constrained — to DECIMAL(38, result_scale), overflow
  * refused loudly like ClickHouse's "Decimal math overflow".
  *
  * `scaleExpr` must be a foldable non-negative integer <= 38 (it decides
  * the OUTPUT TYPE, which Catalyst needs at analysis time).
  */
case class DecimalExactArith(
    first: Expression, second: Expression, third: Expression,
    divide: Boolean) extends TernaryExpression {

  private def fnName = if (divide) "divideDecimal" else "multiplyDecimal"

  lazy val resultScale: Int = {
    require(third.foldable,
      s"$fnName: result_scale must be a constant, got ${third.sql}")
    val v = third.eval() match {
      case null => throw new IllegalArgumentException(
        s"$fnName: result_scale must not be NULL")
      case b: Byte => b.toInt
      case s: Short => s.toInt
      case i: Int => i
      case l: Long => l.toInt
      case d: Decimal => d.toBigDecimal.toIntExact
      case other => throw new IllegalArgumentException(
        s"$fnName: result_scale must be an integer, got $other")
    }
    require(v >= 0 && v <= 38,
      s"$fnName: result_scale must be in [0, 38], got $v")
    v
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(first, second).forall(_.dataType.isInstanceOf[DecimalType])
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fnName expects two decimal arguments, got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString})")
  }

  override def dataType: DataType = DecimalType(38, resultScale)
  override def prettyName: String = fnName

  override def nullSafeEval(a: Any, b: Any, s: Any): Any =
    DecimalExact.compute(
      a.asInstanceOf[Decimal], b.asInstanceOf[Decimal], resultScale, divide)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, _) =>
      s"${ev.value} = graft.functions.DecimalExact.compute(" +
        s"$a, $b, $resultScale, $divide);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object DecimalExact {
  /** Exact BigDecimal op, HALF_UP at the requested scale (ClickHouse and
    * Spark's decimal-cast rounding convention); loud on /0 and overflow.
    */
  def compute(a: Decimal, b: Decimal, scale: Int, divide: Boolean): Decimal = {
    val x = a.toJavaBigDecimal
    val y = b.toJavaBigDecimal
    val r =
      if (divide) {
        if (y.signum == 0)
          throw new ArithmeticException("divideDecimal: division by zero")
        x.divide(y, scale, java.math.RoundingMode.HALF_UP)
      } else x.multiply(y).setScale(scale, java.math.RoundingMode.HALF_UP)
    // integer digits that survive DECIMAL(38, scale)
    if (r.precision - r.scale > 38 - scale)
      throw new ArithmeticException(
        s"${if (divide) "divideDecimal" else "multiplyDecimal"}: result $r " +
          s"overflows DECIMAL(38, $scale)")
    Decimal(r, 38, scale)
  }
}
