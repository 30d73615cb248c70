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

/** Per-document term-frequency generator: `token_counts(tokens)` emits
  * one (tok, tf) row per DISTINCT token of the array — the MAP-SIDE
  * replacement for `explode + groupBy(doc, tok)`. The exploded corpus
  * (the heaviest frame of the lang-id / BM25 pipelines) never reaches
  * an exchange: term frequencies are finished within the row, so the
  * first shuffle downstream operates on distinct-(doc, token) rows,
  * one per token TYPE instead of one per token OCCURRENCE. O(tokens)
  * per row via an insertion-ordered hash map (emission order =
  * first occurrence — deterministic for a given array). Tokens are
  * cloned out of the unsafe row buffer: GenerateExec streams lazily,
  * and a view into a reused scan buffer would corrupt emitted rows.
  */
case class TokenCounts(child: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)

  override def elementSchema: StructType = new StructType()
    .add("tok", StringType, nullable = false)
    .add("tf", org.apache.spark.sql.types.LongType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) Iterator.empty
    else {
      val data = arr.asInstanceOf[ArrayData]
      val n = data.numElements()
      val m = new java.util.LinkedHashMap[UTF8String, java.lang.Long](
        math.max(8, n * 2), 0.75f)
      var i = 0
      while (i < n) {
        if (!data.isNullAt(i)) {
          val t = data.getUTF8String(i)
          val prev = m.get(t)
          if (prev == null) m.put(t.clone(), 1L)
          else m.put(t, prev + 1L)
        }
        i += 1
      }
      val it = m.entrySet().iterator()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext
        override def next(): InternalRow = {
          val e = it.next()
          new GenericInternalRow(Array[Any](e.getKey, e.getValue.longValue()))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TokenCounts =
    copy(child = newChildren(0))
}
