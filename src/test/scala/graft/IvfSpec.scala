package graft

import graft.functions.GraftFunctions
import graft.ops.Vectors
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN (the data-adaptive scale path next to hyperplane LSH):
  * k-means cells + same-cell probing must recover a reasonable share
  * of true nearest neighbors while scanning a fraction of the corpus.
  */
class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("IVF same-cell probe reaches ≥50% recall@3 scanning ~1/8 of the corpus") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val (assigned, centers) = Vectors.ivfIndex(emb, "embedding", k = 8, seed = 42L)
    assert(centers.length == 8)
    assigned.cache()

    val queries = assigned.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qv"), $"cell")

    // ground truth: brute-force top-3 per query
    val wTrue = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id".asc)
    val truth = emb.join(broadcast(queries.select($"qid", $"qv")), $"vec_id" =!= $"qid")
      .withColumn("sim", expr("cosine_sim(embedding, qv)"))
      .withColumn("rn", row_number().over(wTrue)).filter($"rn" <= 3)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet

    // IVF: only same-cell candidates
    val ivf = queries.join(assigned, Seq("cell")).filter($"vec_id" =!= $"qid")
      .withColumn("sim", expr("cosine_sim(embedding, qv)"))
      .withColumn("rn", row_number().over(wTrue)).filter($"rn" <= 3)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet

    val recall = (ivf & truth).size.toDouble / truth.size
    info(f"IVF recall@3 = $recall%.2f (${ivf.size} candidates vs ${truth.size} truth)")
    assert(recall >= 0.5, f"recall too low: $recall%.2f")

    // negative: the 50% floor bites. pipe_ann_ivf is an allowlisted
    // rows-only gate entry whose correctness rests on this recall
    // assertion — prove the metric discriminates by scoring an
    // adversarial "index" (the 3 FARTHEST vectors per query, i.e.
    // what a degenerated cell assignment could return) well under
    // the floor.
    val wWorst = Window.partitionBy($"qid").orderBy($"sim".asc, $"vec_id".asc)
    val worst = emb.join(broadcast(queries.select($"qid", $"qv")), $"vec_id" =!= $"qid")
      .withColumn("sim", expr("cosine_sim(embedding, qv)"))
      .withColumn("rn", row_number().over(wWorst)).filter($"rn" <= 3)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val antiRecall = (worst & truth).size.toDouble / truth.size
    info(f"anti-neighbor recall@3 = $antiRecall%.2f")
    assert(antiRecall < 0.5,
      f"the recall floor does not discriminate: $antiRecall%.2f")
    assigned.unpersist()
  }
}
