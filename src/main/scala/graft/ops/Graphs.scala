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
  * round. For adversarial long-chain graphs the upgrade is
  * star-contraction (large-star/small-star, Kiveris et al. "Connected
  * Components in MapReduce and Beyond", SoCC'14), which contracts
  * pointer-doubling-style in O(log² n) rounds regardless of diameter —
  * implemented here as [[Graphs.connectedComponentsStar]] behind the
  * same (edges, srcCol, dstCol) → (id, component) contract.
  * Propagation stays the default for dedup workloads (tiny diameters,
  * one shuffle/round); reach for the star variant when the edge
  * relation can contain long chains.
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
    // Symmetrize once, then CUT THE INPUT LINEAGE (same RDD re-root
    // the per-round labels get): every round's plan references sym,
    // and without the cut Catalyst re-analyzes the caller's FULL edge
    // lineage each round even though execution reads the cache — with
    // a deep input (r17's guarded near-dup chain) that driver-side
    // re-planning dominated the iteration (measured: 7–10 s per CC
    // call at sf0.1 vs ~2 s with a shallow input, identical data).
    val sym0 = edges.select(col(srcCol).as("id"), col(dstCol).as("nb"))
      .union(edges.select(col(dstCol).as("id"), col(srcCol).as("nb")))
      .distinct()
      .persist(StorageLevel.DISK_ONLY)
    val sym = spark.createDataFrame(sym0.rdd, sym0.schema)
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
    sym0.unpersist()
    labels.select($"id", $"lbl".as("component"))
  }

  /** Connected components by alternating large-star/small-star
    * contraction (Kiveris et al., SoCC'14 — a public algorithm).
    * Same contract as [[connectedComponents]]: one row per distinct
    * node, (`id`, `component` = smallest id in the component).
    *
    * Per round (edges kept oriented bigger→smaller):
    *  - large-star: over the SYMMETRIZED neighborhood of u, every
    *    strictly larger neighbor re-points at m = min(N(u) ∪ {u});
    *  - small-star: over the smaller-neighbor lists, every member of
    *    N(u) ∪ {u} except the minimum re-points at that minimum.
    *
    * Both halves are a groupBy-min plus a self-join on the grouping
    * key (the join reuses the agg's hash partitioning — ~1 exchange
    * per half), and the edge count never grows above the symmetrized
    * input. Terminates when the edge set IS a star forest, which is
    * directly recognizable without a confirm round: no node appears as
    * both parent and child, and no child has two parents (then every
    * star's parent is the minimum of its component, since edges stay
    * bigger→smaller). One aggregation job per round — two scalars to
    * the driver, never edges — and an input that is ALREADY a star
    * forest (the common near-dup case: pairwise clusters) runs ZERO
    * contraction rounds. O(log² n) rounds otherwise: a diameter-10⁴
    * path contracts in ~10 rounds where min-label propagation needs
    * 10⁴ (STRESS `cc_chain` rung). Throws after `maxIter` instead of
    * returning half-contracted labels — unlike propagation (whose
    * partial labels are still per-node monotone improvements), a
    * non-fixpoint star state has no usable meaning.
    */
  def connectedComponentsStar(edges: DataFrame, srcCol: String,
                              dstCol: String, maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val nodes = edges.select(col(srcCol).as("id"))
      .union(edges.select(col(dstCol).as("id")))
      .distinct().persist(StorageLevel.DISK_ONLY)

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select($"v".as("u"), $"u".as("v")))
      val mins = sym.groupBy($"u").agg(min($"v").as("mn"))
      sym.join(mins, "u")
        .where($"v" > $"u")
        .select($"v".as("u"), least($"u", $"mn").as("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      // edges arrive bigger→smaller, so N(u) here IS the small-neighbor
      // list and min(N(u) ∪ {u}) = min(N(u))
      val mins = e.groupBy($"u").agg(min($"v").as("mn"))
      e.join(mins, "u").select($"v".as("u"), $"mn".as("v"))
        .union(mins.select($"u", $"mn".as("v")))
        .where($"u" =!= $"v")
        .distinct()
    }
    // Fixpoint test: the edge set is a star forest iff (a) no node is
    // both a parent and a child and (b) no child has two parents. One
    // aggregation job over a role-tagged union (also the action that
    // materializes the just-persisted frame); empty edge sets are
    // vacuously forests.
    def isStarForest(e: DataFrame): Boolean = {
      val roles = e.select($"u".as("n"), lit(1L).as("nc"), lit(0L).as("np"))
        .union(e.select($"v".as("n"), lit(0L).as("nc"), lit(1L).as("np")))
        .groupBy($"n").agg(sum($"nc").as("nc"), sum($"np").as("np"))
      val r = roles.agg(
        max(when($"nc" > 0 && $"np" > 0, 1L).otherwise(0L)).as("both"),
        max($"nc").as("maxp")).head()
      (r.isNullAt(0) || r.getLong(0) == 0L) &&
        (r.isNullAt(1) || r.getLong(1) <= 1L)
    }

    // Same input-lineage cut as [[connectedComponents]]: the rounds
    // re-reference cur, and a deep caller lineage would be re-planned
    // per round without the RDD re-root.
    val cur0 = edges
      .select(greatest(col(srcCol), col(dstCol)).as("u"),
        least(col(srcCol), col(dstCol)).as("v"))
      .where($"u" =!= $"v").distinct()
      .persist(StorageLevel.DISK_ONLY)
    var cur = spark.createDataFrame(cur0.rdd, cur0.schema)
    // cur is the re-rooted VIEW; unpersist must target the frame that
    // actually holds the cache (cur0 on round 1, next thereafter)
    var curPersisted = cur0
    var converged = isStarForest(cur)
    var round = 0
    while (!converged && round < maxIter) {
      val nextPlan = smallStar(largeStar(cur))
      // lineage cut, same rationale as the propagation loop
      val next = spark.createDataFrame(nextPlan.rdd, nextPlan.schema)
        .persist(StorageLevel.DISK_ONLY)
      converged = isStarForest(next)
      curPersisted.unpersist()
      curPersisted = next
      cur = next
      round += 1
    }
    require(converged,
      s"connectedComponentsStar: no fixpoint after $maxIter rounds " +
        "(expected O(log² n)) — raise maxIter or check the edge relation")
    // `nodes` and the final star edges stay persisted — the result is
    // lazy, and unpersisting here would force a full recompute through
    // every contraction round when the caller finally consumes it
    // (same convention as the propagation loop's final labels frame).
    nodes.join(cur.select($"u".as("id"), $"v".as("component")),
        Seq("id"), "left")
      .select($"id", coalesce($"component", $"id").as("component"))
  }
}
