package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row SimHash scalars — ClickHouse `wordShingleSimHash(s[, k])`
  * and `ngramSimHash(s[, k])` (default shingle size 3, like CH).
  * 64-bit majority-vote simhash over word-shingle / byte-ngram hashes.
  *
  * Shingle hashes come from the repo's bit-parity sipHash64 (zero
  * key), NOT ClickHouse's internal CityHash — so the VALUES are a
  * documented stand-in (same class as the cityHash64-family
  * stand-ins, SURVEY §8 divergence list): hamming-locality is fully
  * preserved (near-duplicate texts share most bits — the property
  * every simhash consumer relies on), bit-parity with CH is not.
  * The DataFrame-level near-dup pipeline (`pipe_simhash*`,
  * `Text.simhash32Sql`) remains the oracle-checked path; these
  * spellings serve CH query text operating per row.
  */
object SimHashTextImpl {

  private def fold(hashes: Array[Long]): Long = {
    if (hashes.isEmpty) return 0L
    val votes = new Array[Int](64)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  def wordShingle(s: UTF8String, k: Int): Long = {
    require(k >= 1 && k <= 25, s"wordShingleSimHash: shingle size $k out of 1..25")
    val toks = s.toString.split("[^A-Za-z0-9]+").filter(_.nonEmpty)
    if (toks.isEmpty) return 0L
    val shingles: Array[String] =
      if (toks.length <= k) Array(toks.mkString(" "))
      else Array.tabulate(toks.length - k + 1)(i =>
        toks.slice(i, i + k).mkString(" "))
    fold(shingles.distinct.map(sh =>
      CHash.sipHash64(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
  }

  def ngram(s: UTF8String, k: Int): Long = {
    require(k >= 1 && k <= 25, s"ngramSimHash: ngram size $k out of 1..25")
    val bytes = s.getBytes
    if (bytes.length == 0) return 0L
    val n = math.max(1, bytes.length - k + 1)
    val grams = Array.tabulate(n)(i =>
      java.util.Arrays.copyOfRange(bytes, i, math.min(bytes.length, i + k)))
    // distinct by content (byte arrays use reference equality)
    val seen = new java.util.HashSet[java.nio.ByteBuffer]()
    val out = Array.newBuilder[Long]
    grams.foreach { g =>
      if (seen.add(java.nio.ByteBuffer.wrap(g))) out += CHash.sipHash64(g)
    }
    fold(out.result())
  }
}

/** `word_shingle_sim_hash(s, k)` / `ngram_sim_hash(s, k)` selected by
  * the `word` flag (two CH spellings, one expression).
  */
case class SimHashText(left: Expression, right: Expression, word: Boolean)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String =
    if (word) "word_shingle_sim_hash" else "ngram_sim_hash"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, int shingle size)")
  override def nullSafeEval(s: Any, k: Any): Any =
    if (word) SimHashTextImpl.wordShingle(s.asInstanceOf[UTF8String], k.asInstanceOf[Int])
    else SimHashTextImpl.ngram(s.asInstanceOf[UTF8String], k.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (word) "wordShingle" else "ngram"
    nullSafeCodeGen(ctx, ev, (s, k) =>
      s"${ev.value} = graft.functions.SimHashTextImpl.$fn($s, $k);")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SimHashText =
    copy(left = l, right = r)
}
