package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** H3 index ALGEBRA (SURVEY §2.8 #121, the h3 half): every operation
  * that is pure bit math on the PUBLIC 64-bit H3 index layout —
  * resolution/base-cell extraction, parent/center-child/children
  * rollups, validity, pentagon/class-III tests, hex string codec.
  *
  * Layout (public H3 docs, "H3 Index Representations"): bit 63
  * reserved(0) | bits 59–62 mode (cell = 1) | bits 56–58 reserved |
  * bits 52–55 resolution | bits 45–51 base cell (0–121) | 15 digits
  * × 3 bits, digit r at bits 3·(15−r)…3·(15−r)+2, unused digits = 7.
  * The 12 pentagon base cells and the deleted-K-subsequence rule
  * (first nonzero digit of a pentagon cell may not be 1) are also
  * published constants.
  *
  * What is deliberately NOT here: `geoToH3`/`h3ToGeo` — the
  * icosahedral gnomonic projection needs the 122-entry base-cell
  * geometry tables, which cannot be reproduced from first principles
  * (they are data, not algorithm). Users with h3 columns computed at
  * ingest get the full rollup/blocking algebra (parent = the
  * aggregation key operation, exactly the quadkey-prefix role); for
  * coordinate → cell indexing this engine offers geo_to_s2/quadkey.
  */
object H3Bits {

  private val ModeCell = 1L
  /** The 12 pentagon base cells (published H3 constant). */
  private val PentagonBases: Set[Int] =
    Set(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)
  private val pentagonArr: Array[Boolean] = {
    val a = new Array[Boolean](128)
    PentagonBases.foreach(a(_) = true)
    a
  }

  def resolution(h: Long): Int = ((h >>> 52) & 15L).toInt

  def baseCell(h: Long): Int = ((h >>> 45) & 127L).toInt

  def digit(h: Long, r: Int): Int = ((h >>> (3 * (15 - r))) & 7L).toInt

  def isPentagonBase(b: Int): Boolean = b >= 0 && b < 128 && pentagonArr(b)

  def isValid(h: Long): Boolean = {
    if (h < 0) return false // bit 63 must be 0
    if (((h >>> 59) & 15L) != ModeCell) return false
    if (((h >>> 56) & 7L) != 0L) return false
    val b = baseCell(h)
    if (b > 121) return false
    val res = resolution(h)
    val pent = isPentagonBase(b)
    var firstNonZeroSeen = false
    var r = 1
    while (r <= res) {
      val d = digit(h, r)
      if (d == 7) return false
      if (pent && !firstNonZeroSeen && d != 0) {
        if (d == 1) return false // deleted K subsequence
        firstNonZeroSeen = true
      }
      r += 1
    }
    while (r <= 15) {
      if (digit(h, r) != 7) return false
      r += 1
    }
    true
  }

  /** Mask of all-7 digits strictly below resolution `res`. */
  private def trailing7(res: Int): Long = (1L << (3 * (15 - res))) - 1L

  def toParent(h: Long, parentRes: Int): Long = {
    val res = resolution(h)
    require(parentRes >= 0 && parentRes <= res,
      s"h3_to_parent: parent resolution $parentRes out of range for a res-$res cell")
    (h & ~(15L << 52)) | (parentRes.toLong << 52) | trailing7(parentRes)
  }

  def toCenterChild(h: Long, childRes: Int): Long = {
    val res = resolution(h)
    require(childRes >= res && childRes <= 15,
      s"h3_to_center_child: child resolution $childRes out of range for a res-$res cell")
    // digits res+1 … childRes become 0, digits beyond childRes stay 7
    val cleared = h & ~trailing7(res)
    (cleared & ~(15L << 52)) | (childRes.toLong << 52) | trailing7(childRes)
  }

  /** All children at `childRes`, center-first order (digit-lexicographic).
    * Pentagon subtrees skip the deleted K subsequence. Loud-capped at
    * 5 levels down (16 807 children) — a wider fan-out per row is a
    * scale bug, not a query.
    */
  def toChildren(h: Long, childRes: Int): Array[Long] = {
    val res = resolution(h)
    require(childRes >= res && childRes <= 15,
      s"h3_to_children: child resolution $childRes out of range for a res-$res cell")
    val diff = childRes - res
    require(diff <= 5,
      s"h3_to_children: $diff levels of fan-out (7^$diff children/row) exceeds the " +
        "loud cap of 5 — roll up in stages or aggregate at a coarser resolution")
    val pent = isPentagonBase(baseCell(h)) && {
      // the subtree root is itself a pentagon iff all its digits are 0
      var r = 1; var allZero = true
      while (r <= res && allZero) { allZero = digit(h, r) == 0; r += 1 }
      allZero
    }
    // digits res+1…childRes are 0 in the center child; OR fills them in
    val base = toCenterChild(h, childRes)
    val out = Array.newBuilder[Long]
    val digits = new Array[Int](diff)
    def emit(): Unit = {
      var v = base
      var k = 0
      while (k < diff) {
        v |= digits(k).toLong << (3 * (15 - (res + 1 + k)))
        k += 1
      }
      out += v
    }
    def rec(k: Int, firstNonZeroSeen: Boolean): Unit = {
      if (k == diff) { emit(); return }
      var d = 0
      while (d < 7) {
        // pentagon rule: within an all-zero prefix, digit 1 is deleted
        val skip = pent && !firstNonZeroSeen && d == 1
        if (!skip) {
          digits(k) = d
          rec(k + 1, firstNonZeroSeen || d != 0)
        }
        d += 1
      }
    }
    rec(0, firstNonZeroSeen = false)
    out.result()
  }

  def isPentagon(h: Long): Boolean = {
    if (!isPentagonBase(baseCell(h))) return false
    val res = resolution(h)
    var r = 1
    while (r <= res) {
      if (digit(h, r) != 0) return false
      r += 1
    }
    true
  }

  def isResClassIII(h: Long): Boolean = resolution(h) % 2 == 1

  /** Total cell count at a resolution: 2 + 120·7^res (the published
    * closed form — 110 hexagons + 12 pentagons at res 0, ×7 per level
    * with the 12 pentagons each losing one child).
    */
  def numCells(res: Int): Long = {
    require(res >= 0 && res <= 15, s"h3_num_hexagons: resolution $res out of 0..15")
    var p = 1L
    var k = 0
    while (k < res) { p *= 7; k += 1 }
    2L + 120L * p
  }

  def toHexString(h: Long): UTF8String =
    UTF8String.fromString(java.lang.Long.toHexString(h))

  def fromHexString(s: UTF8String): Long = {
    val str = s.toString.trim
    require(str.nonEmpty && str.length <= 16 && str.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')),
      s"string_to_h3: '$str' is not a hex h3 index")
    java.lang.Long.parseUnsignedLong(str, 16)
  }
}

private[functions] trait H3UnaryLong extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects a bigint h3 index")
}

case class H3GetResolution(child: Expression) extends H3UnaryLong {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "h3_get_resolution"
  override def nullSafeEval(h: Any): Any = H3Bits.resolution(h.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.H3Bits.resolution($h);")
  override protected def withNewChildInternal(c: Expression): H3GetResolution =
    copy(child = c)
}

case class H3GetBaseCell(child: Expression) extends H3UnaryLong {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "h3_get_base_cell"
  override def nullSafeEval(h: Any): Any = H3Bits.baseCell(h.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.H3Bits.baseCell($h);")
  override protected def withNewChildInternal(c: Expression): H3GetBaseCell =
    copy(child = c)
}

case class H3IsValid(child: Expression) extends H3UnaryLong {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "h3_is_valid"
  override def nullSafeEval(h: Any): Any = H3Bits.isValid(h.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.H3Bits.isValid($h);")
  override protected def withNewChildInternal(c: Expression): H3IsValid =
    copy(child = c)
}

case class H3IsPentagon(child: Expression) extends H3UnaryLong {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "h3_is_pentagon"
  override def nullSafeEval(h: Any): Any = H3Bits.isPentagon(h.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.H3Bits.isPentagon($h);")
  override protected def withNewChildInternal(c: Expression): H3IsPentagon =
    copy(child = c)
}

case class H3IsResClassIII(child: Expression) extends H3UnaryLong {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "h3_is_res_class_iii"
  override def nullSafeEval(h: Any): Any = H3Bits.isResClassIII(h.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.H3Bits.isResClassIII($h);")
  override protected def withNewChildInternal(c: Expression): H3IsResClassIII =
    copy(child = c)
}

case class H3ToString(child: Expression) extends H3UnaryLong {
  override def dataType: DataType = StringType
  override def prettyName: String = "h3_to_string"
  override def nullSafeEval(h: Any): Any = H3Bits.toHexString(h.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.H3Bits.toHexString($h);")
  override protected def withNewChildInternal(c: Expression): H3ToString =
    copy(child = c)
}

case class StringToH3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "string_to_h3"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("string_to_h3 expects a hex string")
  override def nullSafeEval(s: Any): Any =
    H3Bits.fromHexString(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.H3Bits.fromHexString($s);")
  override protected def withNewChildInternal(c: Expression): StringToH3 =
    copy(child = c)
}

case class H3NumHexagons(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "h3_num_hexagons"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("h3_num_hexagons expects an int resolution")
  override def nullSafeEval(r: Any): Any = H3Bits.numCells(r.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, r =>
      s"${ev.value} = graft.functions.H3Bits.numCells($r);")
  override protected def withNewChildInternal(c: Expression): H3NumHexagons =
    copy(child = c)
}

private[functions] trait H3BinaryRes extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint h3 index, int resolution)")
}

case class H3ToParent(left: Expression, right: Expression) extends H3BinaryRes {
  override def dataType: DataType = LongType
  override def prettyName: String = "h3_to_parent"
  override def nullSafeEval(h: Any, r: Any): Any =
    H3Bits.toParent(h.asInstanceOf[Long], r.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, r) =>
      s"${ev.value} = graft.functions.H3Bits.toParent($h, $r);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): H3ToParent =
    copy(left = l, right = r)
}

case class H3ToCenterChild(left: Expression, right: Expression) extends H3BinaryRes {
  override def dataType: DataType = LongType
  override def prettyName: String = "h3_to_center_child"
  override def nullSafeEval(h: Any, r: Any): Any =
    H3Bits.toCenterChild(h.asInstanceOf[Long], r.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, r) =>
      s"${ev.value} = graft.functions.H3Bits.toCenterChild($h, $r);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): H3ToCenterChild =
    copy(left = l, right = r)
}

case class H3ToChildren(left: Expression, right: Expression) extends H3BinaryRes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "h3_to_children"
  override def nullSafeEval(h: Any, r: Any): Any =
    ArrayData.toArrayData(H3Bits.toChildren(h.asInstanceOf[Long], r.asInstanceOf[Int]))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, r) =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.H3Bits.toChildren($h, $r));""".stripMargin)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): H3ToChildren =
    copy(left = l, right = r)
}
