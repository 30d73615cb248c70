package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** CH `tupleNames(t)`: the tuple's element names as an array of
  * strings [CH docs: sql-reference/functions/tuple-functions]. The
  * names live in the TYPE, not the value — so the result is a
  * plan-time constant (`foldable`), read off the child's StructType
  * during analysis. Spark's auto-naming (col1, col2, …) plays the
  * role of CH's positional `1`, `2`, … for unnamed tuples.
  */
case class TupleNames(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tupleNames expects a tuple/struct, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def foldable: Boolean = child.resolved
  override def nullable: Boolean = false
  override def prettyName: String = "tupleNames"

  override def eval(input: InternalRow): Any =
    new GenericArrayData(
      child.dataType.asInstanceOf[StructType].fieldNames
        .map(UTF8String.fromString(_)).toArray[Any])

  override protected def withNewChildInternal(newChild: Expression): TupleNames =
    copy(child = newChild)
}
