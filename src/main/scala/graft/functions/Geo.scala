package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse geo family (SURVEY §2.8): `pointInPolygon` and
  * `geohashEncode` as native expressions (both need loops, so they
  * compile to static calls — the same codegen shape as sip_hash64);
  * `greatCircleDistance` needs no custom code — it composes from
  * codegen'd builtins in the declared query (haversine, mirrored
  * verbatim in the DuckDB oracle).
  */
object GeoMath {

  /** Ray casting (even–odd rule) with boundary points counted inside —
    * the classic crossing-number algorithm. xs/ys are the polygon
    * vertices in order (closing edge implied).
    */
  def pointInPolygon(px: Double, py: Double, xs: ArrayData, ys: ArrayData): Boolean = {
    val n = math.min(xs.numElements(), ys.numElements())
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = xs.getDouble(i); val yi = ys.getDouble(i)
      val xj = xs.getDouble(j); val yj = ys.getDouble(j)
      // boundary points count inside: vertices, horizontal edges (the
      // crossing test below never fires when yi == yj == py), and
      // crossing edges (exact px == xCross hit)
      if (xi == px && yi == py) return true
      if (yi == py && yj == py &&
        px >= math.min(xi, xj) && px <= math.max(xi, xj)) return true
      if ((yi > py) != (yj > py)) {
        val xCross = (xj - xi) * (py - yi) / (yj - yi) + xi
        if (px == xCross) return true
        if (px < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  private val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash (Niemeyer's public algorithm): interleave
    * longitude/latitude interval halvings, 5 bits per base32 char.
    * Argument order (lon, lat) matches ClickHouse `geohashEncode`.
    */
  def geohashEncode(lon: Double, lat: Double, precision: Int): UTF8String = {
    val p = math.max(1, math.min(12, precision))
    val sb = new java.lang.StringBuilder(p)
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var isLon = true
    var bits = 0
    var ch = 0
    while (sb.length < p) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      isLon = !isLon
      bits += 1
      if (bits == 5) { sb.append(base32.charAt(ch)); bits = 0; ch = 0 }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Inverse of [[geohashEncode]]: un-interleave the base32 bits back
    * into interval halvings and return the CELL CENTER as (lon, lat)
    * — ClickHouse `geohashDecode`'s tuple order.
    */
  def geohashDecode(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var isLon = true
    var i = 0
    while (i < str.length) {
      val idx = base32.indexOf(Character.toLowerCase(str.charAt(i)))
      if (idx < 0) throw new IllegalArgumentException(
        s"geohash_decode: invalid base32 char '${str.charAt(i)}' in '$str'")
      var b = 4
      while (b >= 0) {
        val one = ((idx >> b) & 1) == 1
        if (isLon) {
          val mid = (lonLo + lonHi) / 2
          if (one) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (one) latLo = mid else latHi = mid
        }
        isLon = !isLon
        b -= 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any]((lonLo + lonHi) / 2, (latLo + latHi) / 2))
  }

  // ---- quadkey: hierarchical mercator cell index (h3/s2-class) ----

  /** Web-Mercator tile coordinates at `zoom` (Bing tile system — the
    * published algorithm): 2^zoom × 2^zoom grid, latitude clamped to
    * the mercator domain.
    */
  def lonLatToTile(lon: Double, lat: Double, zoom: Int): (Long, Long) = {
    val n = 1L << zoom
    val la = math.max(-85.05112878, math.min(85.05112878, lat))
    val x = math.min(n - 1, math.max(0L,
      math.floor((lon + 180.0) / 360.0 * n).toLong))
    val latRad = math.toRadians(la)
    val y = math.min(n - 1, math.max(0L, math.floor(
      (1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi)
        / 2.0 * n).toLong))
    (x, y)
  }

  /** Interleave tile bits into the base-4 quadkey string: digit i
    * (MSB first) = 2·y_bit + x_bit. The PREFIX of length p is exactly
    * the containing tile at zoom p — the parent/child property that
    * makes quadkeys a drop-in hierarchical cell index for cell-join
    * blocking and rollups (the h3/s2 role in this engine).
    */
  def quadkeyFromTile(x: Long, y: Long, zoom: Int): UTF8String = {
    val sb = new java.lang.StringBuilder(zoom)
    var i = zoom - 1
    while (i >= 0) {
      val d = (((y >> i) & 1L) << 1) | ((x >> i) & 1L)
      sb.append(('0' + d).toChar)
      i -= 1
    }
    UTF8String.fromString(sb.toString)
  }

  def quadkeyEncode(lon: Double, lat: Double, zoom: Int): UTF8String = {
    val p = math.max(1, math.min(23, zoom))
    val (x, y) = lonLatToTile(lon, lat, p)
    quadkeyFromTile(x, y, p)
  }

  /** Decode a quadkey back to its tile (x, y, zoom = length). */
  def quadkeyToTile(qk: UTF8String): (Long, Long, Int) = {
    val s = qk.toString
    var x = 0L; var y = 0L
    var i = 0
    while (i < s.length) {
      val d = s.charAt(i) - '0'
      if (d < 0 || d > 3) throw new IllegalArgumentException(
        s"quadkey_decode: invalid digit '${s.charAt(i)}' in '$s'")
      x = (x << 1) | (d & 1L)
      y = (y << 1) | ((d >> 1) & 1L)
      i += 1
    }
    (x, y, s.length)
  }

  /** Cell-center (lon, lat) of a quadkey's tile. */
  def quadkeyDecode(qk: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val (x, y, zoom) = quadkeyToTile(qk)
    val n = (1L << zoom).toDouble
    val lon = (x + 0.5) / n * 360.0 - 180.0
    val yc = 0.5 - (y + 0.5) / n
    val lat = 90.0 - 360.0 * math.atan(math.exp(-yc * 2.0 * math.Pi)) / math.Pi
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](lon, lat))
  }
}

/** `point_in_polygon(px, py, polygon)` with polygon as
  * `array<struct<x:double, y:double>>` — ClickHouse's
  * `pointInPolygon((x, y), [(x1, y1), …])`.
  */
case class PointInPolygon(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_polygon"
  override def checkInputDataTypes(): TypeCheckResult = {
    val polyOk = third.dataType match {
      case ArrayType(StructType(fields), _) =>
        fields.length == 2 && fields.forall(_.dataType == DoubleType)
      case _ => false
    }
    if (first.dataType == DoubleType && second.dataType == DoubleType && polyOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "point_in_polygon expects (double, double, array<struct<double,double>>)")
  }
  private def split(poly: ArrayData): (ArrayData, ArrayData) = {
    val n = poly.numElements()
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = poly.getStruct(i, 2)
      xs(i) = row.getDouble(0); ys(i) = row.getDouble(1)
      i += 1
    }
    (ArrayData.toArrayData(xs), ArrayData.toArrayData(ys))
  }
  override def nullSafeEval(px: Any, py: Any, poly: Any): Any = {
    val (xs, ys) = split(poly.asInstanceOf[ArrayData])
    GeoMath.pointInPolygon(px.asInstanceOf[Double], py.asInstanceOf[Double], xs, ys)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (px, py, poly) => {
      // freshName every local — hardcoded names collide when two such
      // calls share one generated function (Janino "Redefinition of
      // local variable" → silent interpreted fallback).
      val n = ctx.freshName("n")
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val i = ctx.freshName("i")
      val r = ctx.freshName("r")
      s"""
         |int $n = $poly.numElements();
         |double[] $xs = new double[$n]; double[] $ys = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.sql.catalyst.InternalRow $r = $poly.getStruct($i, 2);
         |  $xs[$i] = $r.getDouble(0); $ys[$i] = $r.getDouble(1);
         |}
         |${ev.value} = graft.functions.GeoMath.pointInPolygon($px, $py,
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($xs),
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($ys));
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PointInPolygon =
    copy(first = f, second = s, third = t)
}

/** `geohash_encode(lon, lat, precision)` — ClickHouse argument order. */
case class GeohashEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "geohash_encode"
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == DoubleType && second.dataType == DoubleType &&
      third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "geohash_encode expects (double lon, double lat, int precision)")
  override def nullSafeEval(lon: Any, lat: Any, p: Any): Any =
    GeoMath.geohashEncode(lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      p.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat, p) =>
      s"${ev.value} = graft.functions.GeoMath.geohashEncode($lon, $lat, $p);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GeohashEncode =
    copy(first = f, second = s, third = t)
}

/** `quadkey_encode(lon, lat, zoom)` — hierarchical Web-Mercator cell
  * id (Bing tile system). Fills the h3/s2 role: prefix = parent cell,
  * equi-join on (truncated) quadkeys = cell blocking.
  */
case class QuadkeyEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "quadkey_encode"
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == DoubleType && second.dataType == DoubleType &&
      third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "quadkey_encode expects (double lon, double lat, int zoom)")
  override def nullSafeEval(lon: Any, lat: Any, z: Any): Any =
    GeoMath.quadkeyEncode(lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      z.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat, z) =>
      s"${ev.value} = graft.functions.GeoMath.quadkeyEncode($lon, $lat, $z);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): QuadkeyEncode =
    copy(first = f, second = s, third = t)
}

/** `quadkey_decode(qk)` → struct<lon double, lat double> (cell center). */
case class QuadkeyDecode(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = new StructType()
    .add("lon", DoubleType, nullable = false)
    .add("lat", DoubleType, nullable = false)
  override def prettyName: String = "quadkey_decode"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("quadkey_decode expects a string")
  override def nullSafeEval(s: Any): Any =
    GeoMath.quadkeyDecode(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.GeoMath.quadkeyDecode($s);")
  override protected def withNewChildInternal(c: Expression): QuadkeyDecode =
    copy(child = c)
}

/** `geohash_decode(hash)` → struct<lon double, lat double> (cell
  * center) — ClickHouse tuple order, inverse of [[GeohashEncode]].
  */
case class GeohashDecode(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = new StructType()
    .add("lon", DoubleType, nullable = false)
    .add("lat", DoubleType, nullable = false)
  override def prettyName: String = "geohash_decode"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("geohash_decode expects a string")
  override def nullSafeEval(s: Any): Any =
    GeoMath.geohashDecode(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.GeoMath.geohashDecode($s);")
  override protected def withNewChildInternal(c: Expression): GeohashDecode =
    copy(child = c)
}
