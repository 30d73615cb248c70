package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** ClickHouse `gcd(a, b)` / `lcm(a, b)` (math family, SURVEY §2.8) —
  * Spark has neither; both are tight codegen'd loops. Semantics match
  * ClickHouse/DuckDB: gcd(0, 0) = 0, sign-insensitive (result is
  * non-negative); lcm(a, b) = |a / gcd * b|.
  */
trait LongBinaryMath extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
}

object IntMath {
  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }
}

case class Gcd(left: Expression, right: Expression) extends LongBinaryMath {
  override def prettyName: String = "gcd"
  override def nullSafeEval(a: Any, b: Any): Any =
    IntMath.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |long x = java.lang.Math.abs($a); long y = java.lang.Math.abs($b);
         |while (y != 0L) { long t = x % y; x = y; y = t; }
         |${ev.value} = x;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Gcd =
    copy(left = l, right = r)
}

case class Lcm(left: Expression, right: Expression) extends LongBinaryMath {
  override def prettyName: String = "lcm"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]; val y = b.asInstanceOf[Long]
    if (x == 0 || y == 0) 0L
    else math.abs(x / IntMath.gcd(x, y) * y)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |long x = java.lang.Math.abs($a); long y = java.lang.Math.abs($b);
         |if (x == 0L || y == 0L) { ${ev.value} = 0L; }
         |else {
         |  long g = x, h = y;
         |  while (h != 0L) { long t = g % h; g = h; h = t; }
         |  ${ev.value} = x / g * y;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Lcm =
    copy(left = l, right = r)
}

/** Polymorphic element/byte count behind ClickHouse's `empty` /
  * `notEmpty` / `length`-style predicates: strings count BYTES (CH's
  * `length(String)` contract), binary counts bytes, arrays and maps
  * count elements. One codegen'd expression because Spark splits this
  * across `length` (strings) and `size` (collections), and a registry
  * BUILDER cannot dispatch on types it has not resolved yet.
  */
case class PolySize(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._

  override def prettyName: String = "poly_size"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | _: ArrayType | _: MapType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string/binary/array/map, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType =>
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].numBytes()
    case BinaryType => v.asInstanceOf[Array[Byte]].length
    case _: ArrayType =>
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].numElements()
    case _: MapType =>
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData].numElements()
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => child.dataType match {
      case StringType => s"${ev.value} = $v.numBytes();"
      case BinaryType => s"${ev.value} = $v.length;"
      case _ => s"${ev.value} = $v.numElements();"
    })

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): PolySize =
    copy(child = c)
}
