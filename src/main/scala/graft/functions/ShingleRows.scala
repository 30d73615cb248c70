package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-expanding word-shingle generator (SURVEY.md §2.10 "custom
  * Generator"): `shingle_rows(tokens, n)` emits one (pos, shingle)
  * row per word n-gram — the multi-column unnest shape ClickHouse
  * reaches with `arrayJoin(arrayZip(...))`. A Generator (not a
  * scalar returning an array + explode) keeps the expansion streaming
  * inside GenerateExec: no intermediate array materialization per row.
  */
case class ShingleRows(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def elementSchema: StructType = new StructType()
    .add("pos", IntegerType, nullable = false)
    .add("shingle", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    val k = n.eval(input)
    if (arr == null || k == null) Iterator.empty
    else {
      val data = arr.asInstanceOf[ArrayData]
      val size = k.asInstanceOf[Int]
      val toks = Array.tabulate(data.numElements())(i => data.getUTF8String(i))
      if (toks.length < size) Iterator.empty
      else Iterator.tabulate(toks.length - size + 1) { i =>
        val s = UTF8String.concatWs(UTF8String.fromString(" "),
          toks.slice(i, i + size).toIndexedSeq: _*)
        new GenericInternalRow(Array[Any](i, s))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShingleRows =
    copy(child = newChildren(0), n = newChildren(1))
}
