package graft

import graft.functions.SimHashTextImpl
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Per-row simhash scalars (wordShingleSimHash / ngramSimHash): the
  * property every consumer relies on is HAMMING LOCALITY — near-dup
  * texts share most bits, unrelated texts don't. Values are
  * sipHash64-based stand-ins (documented divergence, like the
  * cityHash64 family): pinned here so they cannot drift silently.
  */
class SimHashTextSpec extends AnyFunSuite {

  private def ws(s: String, k: Int = 3): Long =
    SimHashTextImpl.wordShingle(UTF8String.fromString(s), k)
  private def ng(s: String, k: Int = 3): Long =
    SimHashTextImpl.ngram(UTF8String.fromString(s), k)
  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private val doc =
    "the quick brown fox jumps over the lazy dog while the cat watches " +
      "from the warm windowsill and the birds sing in the garden outside"
  private val nearDup = doc.replace("warm", "cold") // one word changed
  private val unrelated =
    "database systems execute analytical queries using columnar storage " +
      "vectorized operators and distributed shuffle exchanges at scale"

  test("hamming locality: near-dups close, unrelated far") {
    assert(ham(ws(doc), ws(nearDup)) <= 12,
      s"near-dup drifted ${ham(ws(doc), ws(nearDup))} bits")
    assert(ham(ws(doc), ws(unrelated)) >= 20,
      s"unrelated too close: ${ham(ws(doc), ws(unrelated))} bits")
    assert(ham(ng(doc), ng(nearDup)) <= 12)
    assert(ham(ng(doc), ng(unrelated)) >= 20)
  }

  test("determinism, mode separation, edge cases") {
    assert(ws(doc) == ws(doc) && ng(doc) == ng(doc))
    assert(ws(doc) != ng(doc)) // different shingle universes
    assert(ws("", 3) == 0L && ng("", 3) == 0L)
    // short text: a single whole-text shingle, still stable
    assert(ws("one two", 5) == ws("one two", 7))
    intercept[IllegalArgumentException](ws(doc, 0))
    intercept[IllegalArgumentException](ng(doc, 26))
    // tokenization ignores punctuation runs like CH's word splitter
    assert(ws("a,b;;c d") == ws("a b c d"))
  }

  test("CH spellings through the front door + hasTokenOrNull") {
    val spark = TestSpark.spark
    Graft.init(spark, "/root/testdata/sf0.001")
    val r = Graft.sql(spark,
      """SELECT wordShingleSimHash('a b c d e') AS w3,
                wordShingleSimHash('a b c d e', 3) AS w3e,
                ngramSimHash('ClickHouse') AS n3,
                hasTokenOrNull('Hello, world', 'world') AS t1,
                hasTokenOrNull('Hello, world', 'wo rld') AS t2,
                hasTokenOrNull('naïve test', 'naïve') AS t3,
                hasToken('naïve, test', 'naïve') AS t4,
                hasToken('Hello, world', 'naïve') AS t5""").head()
    assert(r.getLong(0) == r.getLong(1)) // default k = 3
    assert(r.getLong(2) != 0L)
    assert(r.getBoolean(3))
    assert(r.isNullAt(4)) // ill-formed needle -> NULL, not an error
    // CH separators are ASCII-only: non-ASCII characters are TOKEN
    // characters, so 'naïve' is one well-formed token (ADVICE r16)
    assert(r.getBoolean(5), "hasTokenOrNull must accept a non-ASCII token")
    assert(r.getBoolean(6))
    assert(!r.getBoolean(7))
  }
}
