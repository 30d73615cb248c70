package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registration lifecycle on a GENUINELY fresh SparkSession.
  *
  * Round 11 shipped a duplicate `stringJaccardIndex` macro that
  * tripped the registration-collision guard at init time; worse,
  * `Graft.init` marked the session registered BEFORE registration
  * completed, so every later front-door query on the half-registered
  * session died with UNRESOLVED_ROUTINE on late-registered names
  * (toString, arrayFirst, …). This spec is the test that would have
  * caught both: it inits a fresh session (new function registry) and
  * resolves functions registered at the very END of ChDialect's pass.
  */
class InitSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  test("Graft.init completes on a fresh session and late-registered names resolve") {
    // newSession() shares the SparkContext but gets its OWN
    // SessionState — empty function registry, exactly the state a
    // driver-run Verify/Bench session starts from.
    val fresh = TestSpark.spark.newSession()
    Graft.init(fresh, dir)
    // names registered LATE in ChDialect.register — the ones a
    // mid-registration throw silently drops:
    val r = Graft.sql(fresh,
      """SELECT toString(42) AS s,
                arrayFirst(x -> x > 1, [1, 2, 3]) AS f,
                damerauLevenshteinDistance('abc', 'acb') AS d,
                stringJaccardIndex('abc', 'bcd') AS j""").head()
    assert(r.getString(0) == "42")
    assert(String.valueOf(r.get(1)) == "2")
    assert(String.valueOf(r.get(2)) == "1")
    // the oracle-pinned (split-based char-set) Jaccard body: |{b,c}|/|{a,b,c,d}|
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-12)
  }

  test("Graft.init is idempotent and a second init keeps functions resolvable") {
    val fresh = TestSpark.spark.newSession()
    Graft.init(fresh, dir)
    Graft.init(fresh, dir) // second call must not re-register (guard would throw) nor unregister
    assert(Graft.sql(fresh, "SELECT toString(1) AS s").head().getString(0) == "1")
  }
}
