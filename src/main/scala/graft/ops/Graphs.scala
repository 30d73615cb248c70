package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an edge list — the step that
  * turns near-duplicate PAIRS (MinHash/LSH or embedding-cosine
  * candidates) into duplicate CLUSTERS, so a curation pipeline can
  * keep one representative per cluster instead of dropping both ends
  * of every pair independently (which over-deletes on transitive
  * chains a~b~c).
  *
  * Algorithm: iterative min-label propagation. Every node starts with
  * label = its own id; each round every node takes the minimum label
  * in its closed neighborhood. Converges in O(graph diameter) rounds;
  * near-dup graphs are unions of small dense cliques-with-bridges, so
  * the diameter is tiny (single digits) regardless of corpus size —
  * the rounds are bounded by CLUSTER shape, not corpus row count.
  * Each round is one shuffle (edge join on node id) + one partial-agg
  * min — no driver-side data beyond the one converged counter per
  * round. For adversarial long-chain graphs the known upgrade is
  * star-contraction (large-star/small-star, Kiveris et al. "Connected
  * Components in MapReduce", SoCC'14), which replaces the per-round
  * hop with pointer doubling; propagation is the right default for
  * dedup workloads and is what this helper implements.
  */
object Graphs {

  /** Connected components of the undirected graph given by `edges`
    * (two numeric columns `srcCol`, `dstCol`). Returns one row per
    * distinct node: (`id`, `component`) where `component` is the
    * smallest node id in the node's component.
    *
    * `maxIter` bounds the propagation rounds (diameter guard); the
    * loop exits early the first round nothing changes. Intermediate
    * label frames persist at DISK_ONLY and unpersist eagerly, and
    * each round's result is re-rooted through its RDD
    * (`createDataFrame(next.rdd, schema)`): the Catalyst plan would
    * otherwise DOUBLE per round (labels feeds both the join and the
    * convergence check), while the RDD re-root keeps the logical plan
    * O(1) per round and still preserves recompute lineage through the
    * persisted RDD chain — the same pattern GraphX/GraphFrames use
    * for iterative algorithms.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // Symmetrize once: propagation needs both directions of each edge.
    val sym = edges.select(col(srcCol).as("id"), col(dstCol).as("nb"))
      .union(edges.select(col(dstCol).as("id"), col(srcCol).as("nb")))
      .distinct()
      .persist(StorageLevel.DISK_ONLY)
    // labels carries a third `chg` column (did THIS round lower the
    // label) so unpersist always targets the exact persisted frame
    var labels = sym.select($"id").distinct().withColumn("lbl", $"id")
      .withColumn("chg", lit(false))
      .persist(StorageLevel.DISK_ONLY)
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      // min label over the closed neighborhood: self ∪ neighbors.
      val nbMin = sym
        .join(labels.select($"id".as("nb"), $"lbl".as("nb_lbl")), "nb")
        .groupBy($"id").agg(min($"nb_lbl").as("nb_min"))
      // The OLD label is already on hand in this join, so the
      // convergence flag rides along as a column — the separate
      // next⋈labels re-join the check used to pay per round is gone.
      val nextPlan = labels
        .join(nbMin, Seq("id"), "left")
        .select($"id", least($"lbl", coalesce($"nb_min", $"lbl")).as("lbl"),
          (coalesce($"nb_min", $"lbl") < $"lbl").as("chg"))
      // Lineage cut: without this the logical plan doubles per round.
      val next = spark.createDataFrame(nextPlan.rdd, nextPlan.schema)
        .persist(StorageLevel.DISK_ONLY)
      // One scalar to the driver per round — the convergence test
      // (a filter over the just-persisted frame, no join).
      val changed = next.filter($"chg").limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0L
      round += 1
    }
    sym.unpersist()
    labels.select($"id", $"lbl".as("component"))
  }
}
