package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Leaf-path enumeration of a JSON document — the per-row kernel of
  * ClickHouse's `distinctJSONPaths` aggregate (r19): dot-joined paths
  * of every non-object value, objects recursed, arrays and scalars
  * treated as leaves (the path set CH's JSON type tracks). The
  * aggregate spelling composes this with
  * flatten(collect_list(...)) + distinct + sort in ChDialect — one
  * map-side generator, no explode/shuffle per path.
  *
  * Lenient contract: NULL input → NULL; invalid JSON or a non-object
  * root → empty array (a Dynamic column holding a scalar has no
  * paths).
  */
object JsonPathsImpl {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def paths(json: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer[UTF8String]()
    try {
      val root = mapper.readTree(json.toString)
      if (root != null && root.isObject) walk(root, "", out)
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException => // empty
    }
    ArrayData.toArrayData(out.toArray[AnyRef])
  }

  private def walk(node: com.fasterxml.jackson.databind.JsonNode,
                   prefix: String,
                   out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      val p = if (prefix.isEmpty) e.getKey else prefix + "." + e.getKey
      if (e.getValue.isObject) walk(e.getValue, p, out)
      else out += UTF8String.fromString(p)
    }
  }
}

/** `json_paths(string)` → array<string> of leaf paths. */
case class JsonPaths(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "json_paths"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"json_paths expects string, got ${t.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    JsonPathsImpl.paths(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.JsonPathsImpl.paths($c);")
  override protected def withNewChildInternal(c: Expression): JsonPaths =
    copy(child = c)
}
