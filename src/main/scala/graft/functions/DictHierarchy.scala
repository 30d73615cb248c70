package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._

/** Hierarchical-dictionary walks [ClickHouse docs: sql-reference/
  * functions/ext-dict-functions#dictgethierarchy]: a dictionary whose
  * `parent` attribute links each key to its ancestor forms a forest;
  * `dictGetHierarchy` returns the chain key→root (key itself first,
  * like CH). The parent map arrives as a FOLDABLE literal — the same
  * plan-shipped replication model the scalar dictGet family uses, so
  * the walk is executor-local with no driver round trips.
  *
  * Cycle / depth guard: the walk stops after 1000 hops (CH caps
  * hierarchy depth too); a parent of 0 or a missing key ends the
  * chain (CH's null_value convention for UInt64 keys).
  */
case class DictHierarchy(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dict_get_hierarchy"
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType &&
        right.dataType == MapType(LongType, LongType) && right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("dict_get_hierarchy expects (bigint, " +
        "foldable map<bigint,bigint>)")
  }
  @transient private lazy val parents: Map[Long, Long] = {
    val md = right.eval(null).asInstanceOf[MapData]
    val ks = md.keyArray(); val vs = md.valueArray()
    (0 until md.numElements())
      .map(i => ks.getLong(i) -> vs.getLong(i)).toMap
  }
  override def nullSafeEval(k: Any, m: Any): Any = {
    val buf = scala.collection.mutable.ArrayBuffer[Long]()
    var cur = k.asInstanceOf[Long]
    var hops = 0
    while (hops < 1000 && cur != 0L && !buf.contains(cur)) {
      buf += cur
      cur = parents.getOrElse(cur, 0L)
      hops += 1
    }
    ArrayData.toArrayData(buf.toArray)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DictHierarchy = copy(left = l, right = r)
}

/** CH `bin(x)`: full 8-bit groups — for strings one group per UTF-8
  * byte, for integers the declared type's full width (CH prints the
  * width of the argument type: UInt8 → 8 bits, UInt64 → 64). Spark
  * widths map directly: TINYINT→8, SMALLINT→16, INT→32, BIGINT→64.
  * Type-dispatched at analysis so a numeric argument is NEVER
  * silently stringified (bits of "13" ≠ bits of 13).
  */
case class BinCh(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "bin"
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType | IntegerType | ShortType | ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bin expects a string or integral argument, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any = {
    val bits = child.dataType match {
      case StringType =>
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
          .map(b => f"${(b & 0xff).toBinaryString.toLong}%08d"
            .takeRight(8)).mkString
      case _ =>
        val (x, width) = v match {
          case l: Long => (l, 64)
          case i: Int => (i.toLong & 0xffffffffL, 32)
          case s: Short => (s.toLong & 0xffffL, 16)
          case b: Byte => (b.toLong & 0xffL, 8)
        }
        val raw = java.lang.Long.toBinaryString(x)
        ("0" * (width - raw.length)) + raw
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(bits)
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): BinCh =
    copy(child = c)
}

/** All transitive descendants of a key (`dictGetDescendants`); level
  * 0 = every descendant, level n = exactly depth n below the key. The
  * child index inverts the parent map ONCE per executor (transient
  * lazy), so per-row cost is proportional to the answer, not the
  * dictionary.
  */
case class DictDescendants(left: Expression, right: Expression, level: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dict_get_descendants"
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType &&
        right.dataType == MapType(LongType, LongType) && right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("dict_get_descendants expects (bigint, " +
        "foldable map<bigint,bigint>)")
  }
  @transient private lazy val childIdx: Map[Long, Seq[Long]] = {
    val md = right.eval(null).asInstanceOf[MapData]
    val ks = md.keyArray(); val vs = md.valueArray()
    (0 until md.numElements())
      .map(i => ks.getLong(i) -> vs.getLong(i))
      .groupBy(_._2).map { case (p, kv) => p -> kv.map(_._1).sorted.toSeq }
  }
  override def nullSafeEval(k: Any, m: Any): Any = {
    val seen = scala.collection.mutable.Set(k.asInstanceOf[Long])
    var frontier = childIdx.getOrElse(k.asInstanceOf[Long], Seq.empty)
      .filter(seen.add)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var depth = 1
    while (frontier.nonEmpty && depth <= 1000) {
      if (level == 0 || depth == level) out ++= frontier
      if (level != 0 && depth >= level) frontier = Seq.empty
      else {
        frontier = frontier.flatMap(c => childIdx.getOrElse(c, Seq.empty))
          .filter(seen.add)
        depth += 1
      }
    }
    ArrayData.toArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DictDescendants = copy(left = l, right = r)
}

/** CH `emptyArrayToSingle(arr)`: an empty array becomes the
  * single-element array of the element type's DEFAULT value (0 / '' /
  * false / epoch), anything else passes through unchanged [ClickHouse
  * docs: sql-reference/functions/array-functions#emptyarraytosingle].
  * Needs the element type at analysis (a SQL macro can't synthesize a
  * generic default), hence a typed expression.
  */
case class EmptyArrayToSingle(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def prettyName: String = "emptyArrayToSingle"
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"emptyArrayToSingle expects an array argument, got ${other.sql}")
    }
  @transient private lazy val elemDefault: Any = {
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    org.apache.spark.sql.catalyst.expressions.Literal.default(et).value
  }
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() > 0) a
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](elemDefault))
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): EmptyArrayToSingle =
    copy(child = c)
}
