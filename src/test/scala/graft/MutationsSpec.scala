package graft

import graft.ops.Mutations
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ALTER DELETE/UPDATE as copy-on-write snapshots: row counts, value
  * patches, and non-matching rows bit-identical to the source.
  */
class MutationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"
  private val tmp = System.getProperty("java.io.tmpdir")

  test("DELETE WHERE drops exactly the matching rows") {
    val src = Tables(spark, dir, "nation")
    val snap = Mutations.deleteWhere(src, $"n_regionkey" === 0,
      s"$tmp/graft_mut/nation_del")
    val expected = src.filter($"n_regionkey" =!= 0)
    assert(snap.count() == expected.count())
    assert(snap.filter($"n_regionkey" === 0).count() == 0)
    assert(snap.orderBy($"n_nationkey").collect().toSeq ==
      expected.orderBy($"n_nationkey").collect().toSeq)
  }

  test("UPDATE WHERE patches matching rows and preserves the rest") {
    val src = Tables(spark, dir, "nation")
    val snap = Mutations.updateWhere(src, $"n_regionkey" === 1,
      Map("n_name" -> lit("REDACTED")), s"$tmp/graft_mut/nation_upd")
    assert(snap.count() == src.count())
    assert(snap.filter($"n_regionkey" === 1 && $"n_name" =!= "REDACTED").count() == 0)
    val untouched = snap.filter($"n_regionkey" =!= 1).orderBy($"n_nationkey")
    val original = src.filter($"n_regionkey" =!= 1).orderBy($"n_nationkey")
    assert(untouched.collect().toSeq == original.collect().toSeq)
  }

  test("mutations compose: delete then update on the snapshot chain") {
    val src = Tables(spark, dir, "region")
    val s1 = Mutations.deleteWhere(src, $"r_regionkey" >= 3, s"$tmp/graft_mut/r1")
    val s2 = Mutations.updateWhere(s1, $"r_regionkey" === 0,
      Map("r_name" -> upper($"r_name")), s"$tmp/graft_mut/r2")
    assert(s2.count() == 3)
    assert(s2.filter($"r_regionkey" === 0).select($"r_name").as[String].head()
      == s2.filter($"r_regionkey" === 0).select(upper($"r_name")).as[String].head())
  }
}
