package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the dtype of every fixture column AS LOADED through
  * graft.Tables (the round-6 postmortem's second tripwire: the
  * fixture's physical ts type changed under us and nothing went red).
  * If the driver regenerates a fixture with a different physical
  * type, this fails immediately and names the column.
  *
  * events.ts is special: the raw file has shipped as ns-int64 AND as
  * tz-naive timestamp[us]; Tables normalizes every variant to
  * TIMESTAMP (LTZ) because event-time ops (withWatermark, window,
  * unix_micros) require it. The session TZ is pinned UTC so the
  * instant is preserved either way.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def loaded(name: String): Map[String, String] =
    Tables(spark, dir, name).schema.fields
      .map(f => f.name -> f.dataType.simpleString).toMap

  val expected: Map[String, Map[String, String]] = Map(
    "region" -> Map("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Map("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Map("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Map("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Map("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Map("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Map("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Map("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Map("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Map("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int")
  )

  test("every fixture column loads with the pinned dtype") {
    val diffs = expected.toSeq.sortBy(_._1).flatMap { case (tbl, cols) =>
      val got = loaded(tbl)
      (cols.keySet ++ got.keySet).toSeq.sorted.flatMap { c =>
        (cols.get(c), got.get(c)) match {
          case (Some(e), Some(g)) if e == g => None
          case (e, g) => Some(s"$tbl.$c expected=${e.getOrElse("<absent>")} got=${g.getOrElse("<absent>")}")
        }
      }
    }
    assert(diffs.isEmpty, "fixture schema drift:\n" + diffs.mkString("\n"))
  }

  test("events.ts is event-time capable (TIMESTAMP, not NTZ/long)") {
    import org.apache.spark.sql.types.TimestampType
    assert(Tables(spark, dir, "events").schema("ts").dataType == TimestampType)
  }

  test("parallelize guard: bounded on BOTH sides — never caches a huge file") {
    // lower cutoff: tiny tables aren't worth the shuffle
    assert(!Tables.shouldParallelize(1, 32, 1L << 18))
    assert(Tables.shouldParallelize(1, 32, (1L << 18) + 1))
    // file-count guard: many files already parallelize for free
    assert(!Tables.shouldParallelize(17, 32, 1L << 20))
    assert(Tables.shouldParallelize(16, 32, 1L << 20))
    // upper cutoff: a single multi-GB file must NOT be silently
    // repartitioned + persisted (the unbounded-cache hazard)
    assert(Tables.shouldParallelize(1, 32, 1L << 28))
    assert(!Tables.shouldParallelize(1, 32, (1L << 28) + 1))
    assert(!Tables.shouldParallelize(2, 32, 8L << 30))
  }
}
