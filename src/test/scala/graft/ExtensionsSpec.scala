package graft

import graft.functions.CosineSimilarity
import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions installation path: functions available
  * in a fresh session without manual registration, and the cosine
  * canonicalization rule making symmetric calls structurally equal.
  */
class ExtensionsSpec extends AnyFunSuite {

  /** getOrCreate reuses the default session (ignoring extensions), so
    * build a genuinely new SparkSession over the shared context by
    * clearing the default first, and restore it after.
    */
  private def withExtSession[A](f: SparkSession => A): A = {
    TestSpark.spark // make sure the shared context exists
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try f(SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .getOrCreate())
    finally {
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
      SparkSession.clearActiveSession()
    }
  }

  test("extension-injected functions work without manual registration") {
    withExtSession { s =>
      import s.implicits._
      val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
      df.createOrReplaceTempView("ext_v")
      val r = s.sql("SELECT cosine_sim(a, b) AS s FROM ext_v").as[Double].head()
      assert(math.abs(r - 1.0) < 1e-12)
    }
  }

  test("canonicalization rule makes symmetric cosine calls structurally equal") {
    withExtSession { s =>
      // parquet-backed input — a local Seq would be constant-folded
      // into a LocalRelation before the assertion could see the plan
      val df = Tables(s, "/root/testdata/sf0.001", "embeddings")
        .selectExpr("embedding AS a", "reverse(embedding) AS b")
      val sel = df.selectExpr("cosine_sim(a, b) AS x", "cosine_sim(b, a) AS y")
      val coss = sel.queryExecution.optimizedPlan.expressions
        .flatMap(_.collect { case c: CosineSimilarity => c })
      assert(coss.size == 2)
      assert(coss(0).children.map(_.canonicalized) == coss(1).children.map(_.canonicalized),
        s"expected canonicalized argument order, got: ${coss.map(_.children)}")
      val row = sel.limit(1).collect().head
      assert(row.getDouble(0) == row.getDouble(1))
    }
  }
}
