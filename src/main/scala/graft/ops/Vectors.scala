package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vector-search primitives for the `embeddings` fixture (BASELINE
  * north star: similarity search). The scale story:
  *
  *  - brute-force exact top-k (the baseline) broadcasts a SMALL query
  *    set against the corpus — each corpus partition scores locally,
  *    one shuffle on query id for the per-query top-k window;
  *  - hyperplane LSH (the scale path) assigns every vector an n-bit
  *    bucket from sign(plane · v); probes equi-join their bucket —
  *    candidate generation is a hash join, never all-pairs.
  *
  * The hyperplanes are md5-seeded ±1 vectors generated here ONCE and
  * inlined as literals into both the Spark expression and the DuckDB
  * oracle, so both engines use identical planes.
  */
object Vectors {

  /** Deterministic ±1 hyperplane matrix: component (p, d) is +1 iff
    * the 60-bit md5 hash of "p,d" is even — reproducible anywhere.
    */
  def planeMatrix(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (1 to dim).map { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"$p,$d".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1.0 else -1.0
      }
    }

  /** SQL literal text of [[planeMatrix]] — `array(array(1.0,...),...)`
    * for Spark, `[[1.0,...],...]` for DuckDB.
    */
  def planesSparkSql(nPlanes: Int, dim: Int): String =
    planeMatrix(nPlanes, dim)
      .map(_.mkString("array(", ",", ")")).mkString("array(", ",", ")")

  def planesDuckSql(nPlanes: Int, dim: Int): String =
    planeMatrix(nPlanes, dim)
      .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  /** Spark SQL expression computing the LSH bucket of `vecCol`:
    * bit p = (plane_p · v > 0), folded to a BIGINT. The inner dot is
    * an ascending-index sequential fold, matching DuckDB list_sum.
    */
  def bucketSparkSql(vecCol: String, nPlanes: Int, dim: Int): String = {
    val planes = planesSparkSql(nPlanes, dim)
    s"""aggregate(sequence(0, ${nPlanes - 1}), 0L, (acc, p) -> acc +
       |  CASE WHEN aggregate(sequence(1, $dim), CAST(0.0 AS DOUBLE),
       |         (a, d) -> a + element_at(element_at($planes, p + 1), d)
       |                       * CAST(element_at($vecCol, d) AS DOUBLE)) > 0
       |       THEN shiftleft(1L, p) ELSE 0L END)""".stripMargin
  }

  /** IVF index: k-means over the corpus (the one legitimate iterative
    * index-BUILD job — queries never iterate), then every vector
    * carries its nearest-centroid id as `cell`. An ANN probe searches
    * only its own cell's vectors (equi-join on `cell`), optionally
    * multi-probing neighbor cells for recall — same shuffle shape as
    * the LSH path, with data-adaptive cells instead of random planes.
    *
    * Returns (assignments with a `cell` column, centroid arrays by id).
    */
  def ivfIndex(emb: DataFrame, vecCol: String, k: Int, seed: Long)
      : (DataFrame, Array[Array[Double]]) = {
    val feat = emb.withColumn("__fv",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("__fv").setPredictionCol("cell")
      .fit(feat)
    (model.transform(feat).drop("__fv"), model.clusterCenters.map(_.toArray))
  }

  private val ivfCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, Int, Long), (DataFrame, Array[Array[Double]])]

  /** [[ivfIndex]] built once per (corpus key, column, k, seed) and
    * persisted — index BUILD is amortized across queries, exactly how
    * a production ANN index is used (queries never re-run k-means).
    */
  def ivfIndexCached(emb: DataFrame, key: String, vecCol: String, k: Int, seed: Long)
      : (DataFrame, Array[Array[Double]]) =
    ivfCache.getOrElseUpdate((key, vecCol, k, seed), {
      val (a, c) = ivfIndex(emb, vecCol, k, seed)
      (a.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK), c)
    })

  /** DuckDB twin of [[bucketSparkSql]]. */
  def bucketDuckSql(vecCol: String, nPlanes: Int, dim: Int): String = {
    val planes = planesDuckSql(nPlanes, dim)
    s"""CAST(list_sum(list_transform(range(0, $nPlanes), p ->
       |  CASE WHEN list_sum(list_transform(range(1, ${dim + 1}),
       |         d -> ($planes)[p + 1][d] * $vecCol[d]::DOUBLE)) > 0
       |       THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)) AS BIGINT)""".stripMargin
  }
}
