package graft
import org.scalatest.funsuite.AnyFunSuite
class ReadmeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  test("README front-door example runs") {
    Graft.init(spark, "/root/testdata/sf0.001")
    val rows = Graft.sql(spark, """
      SELECT event_type, topK(5)(user_id) AS heavy
      FROM events SAMPLE 0.1
      GROUP BY event_type WITH TOTALS
      ORDER BY event_type LIMIT 3 BY event_type""").collect()
    assert(rows.nonEmpty)
  }
}
