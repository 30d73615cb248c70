package graft

import graft.ops.External
import org.scalatest.funsuite.AnyFunSuite

/** The external-process pipe line protocol: field alignment must
  * survive NULLs (a NULL serializes as an empty field, not a missing
  * one) and the per-partition process sees every row.
  */
class ExternalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("NULL fields serialize as empty fields, preserving alignment") {
    val df = Seq((1L, Option("a")), (2L, Option.empty[String]), (3L, Option("c")))
      .toDF("id", "s")
    val lines = External.pipeLines(df, "\t", Seq("cat")).collect().sorted.toSeq
    assert(lines == Seq("1\ta", "2\t", "3\tc"))
  }

  test("rows survive a multi-partition pipe through an external command") {
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "s").repartition(7)
    val out = External.pipeLines(df, "\t", Seq("cat")).collect()
    assert(out.length == 100)
    assert(out.toSet == (1 to 100).map(i => s"$i\tv$i").toSet)
  }
}
