package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan auditor: regenerates PERF.md with the physical-plan shape of
  * the most expensive bench queries (plus any names passed on the
  * command line). For each query it records shuffle (Exchange) count,
  * broadcast count, and the two scale red flags — BroadcastNestedLoopJoin
  * and single-partition (global) windows/sorts — so plan regressions
  * show up as a diff of a committed file rather than a bench surprise.
  *
  * Usage: runMain graft.Perf [sfDir [query...]]
  */
object Perf {

  /** The standing audit set: the most expensive queries by bench time
    * plus the flagship. Extra names can be appended via argv.
    */
  private val standing = Seq(
    "q1_flagship", "pipe_minhash_lsh", "pipe_curation_e2e",
    "pipe_lang_id", "pipe_ngram_jaccard", "join_using",
    "pipe_sim_topk", "pipe_ann_lsh", "agg_lttb", "mt_formats",
    "agg_count_distinct", "agg_quantiles", "agg_moments",
    "join_star_revenue", "mt_projection", "funnel_sequence_timed",
    "agg_group_bitmap", "udf_executable",
    // round 5 additions
    "geo_cell_join", "pipe_embed_neardup", "agg_rank_corr",
    "funnel_window_strict", "mt_versioned_collapsing",
    "rel_limit_by_exec", "pipe_token_count",
    "tpch_q17_small_qty", "tpch_q18_large_orders",
    // round 6 additions
    "sql_ch_combo", "sql_ch_limit_by", "sql_ch_array_join",
    "funnel_sequence_pattern", "pipe_multimodal_decode",
    "mt_projection_derived", "agg_theta_sketch", "mt_versioned_final",
    "tpch_q6_forecast", "tpch_q12_priority", "tpch_q14_promo",
    "tpch_q19_discount", "geo_quadkey_cells", "cb_daily_pv_uv",
    // final round-6 session: TPC-H completion + routed joins
    "tpch_q2_mincost", "tpch_q9_profit", "tpch_q11_stock",
    "tpch_q21_waiting", "sql_ch_asof_join", "sql_ch_any_join",
    "sql_ch_fill_interval", "agg_ks_test",
    // round-6 closing session: pipeline + CB + stats additions
    "pipe_dedup_components", "pipe_stratified_sample", "pipe_seq_pack",
    "cb_top_users", "cb_minutely_errors", "cb_value_quantiles",
    "agg_exp_decay", "agg_auc", "agg_quantile_timing", "sql_ch_system",
    // round-6 final session: parametric syntax + spellings + PII
    "sql_ch_parametric", "sql_ch_topk", "sql_ch_funnel_text",
    "sql_ch_seq_text", "sql_ch_dialect_batch", "sql_ch_agg_spellings",
    "sql_ch_string_search", "pipe_pii_redact", "pipe_decontaminate",
    "pipe_gopher_rules", "sql_ch_ctas_final", "cb_sessionize",
    "cb_week_retention", "pipe_image_resize", "pipe_video_frames",
    "sql_ch_add_index", "pipe_pii_redact",
    // this session: bracket/ties/distinct-on routing + new pipelines
    "sql_ch_brackets", "sql_ch_limit_ties", "sql_ch_distinct_on",
    "pipe_gopher_repetition", "pipe_unigram_logprob",
    // round 7: NTZ-recovery audit (asof/funnel/window family),
    // new ASOF directions, resample, the full remaining TPC-H set
    "join_asof", "sql_ch_asof_rev", "sql_ch_asof_strict",
    "agg_resample", "sql_ch_foreach", "pipe_ann_ivf",
    "funnel_window", "window_frames", "window_lag_lead",
    "agg_any_bounding", "cb_first_last",
    "tpch_q4_priority", "tpch_q7_nations", "tpch_q8_share",
    "tpch_q13_custdist", "tpch_q15_top_supplier", "tpch_q16_partsupp",
    "tpch_q20_promo", "tpch_q22_opportunity",
    // round-7 closing: banding/quantize pipelines + breadth entries
    "pipe_simhash_bands", "pipe_embed_quantize", "scalar_vector_dist",
    "agg_ema", "scalar_r7_breadth",
    // round-7 second session: stats/pipeline additions + wave 10
    "agg_anova", "agg_mean_ztest", "agg_array_insert_at",
    "window_nn_derivative", "pipe_chunk_sliding", "pipe_shard_assign",
    "pipe_dedup_canonical", "sql_ch_w10_batch", "sql_ch_quantile_picks",
    "pipe_bm25", "sql_ch_merge_tf", "sql_ch_w11_batch", "agg_corr_matrix",
    "pipe_embed_standardize", "sql_ch_w12_batch", "sql_ch_w13_batch",
    // round-8: the three TPC-H entries the audit was missing (q10 was
    // r7's slowest bench query) + the new gate entries
    "tpch_q3_shipping", "tpch_q5_region", "tpch_q10_returns",
    "sql_ch_w14_batch", "sql_ch_recursive",
    "sql_ch_w15_batch", "sql_ch_w16_batch", "sql_ch_w17_batch",
    "sql_ch_fill_staleness", "sql_ch_interpolate_expr", "sql_ch_sample_n",
    // round-9: completed ClickBench suite's heavy shapes (q32 = full-
    // table high-card GROUP BY, q29 = 90-sum single pass, q18 = 3-key
    // grouped top-k, q23 = wide SELECT * sort) + w18/w19 + variant
    "cb43_q32", "cb43_q29", "cb43_q18", "cb43_q23", "cb43_q13",
    "sql_ch_w18_batch", "sql_ch_w19_batch", "sql_ch_w20_batch", "sql_ch_w21_batch", "sql_ch_w22_batch",
    "scalar_variant_type", "pipe_script_detect",
    // round-12: waves 23–26, tz faithfulness, test-family UDAFs
    "sql_ch_w23_batch", "sql_ch_w24_batch", "sql_ch_w25_ttests",
    "sql_ch_w25_mwu", "sql_ch_w25_ks", "sql_ch_w26_batch",
    "sql_ch_sparkbar", "sql_ch_totimezone", "sql_ch_sample_n_over",
    // round-12 waves 27–31: association/stats/ML aggregates (all
    // collected- or moment-state ObjectHashAggregate passes), the
    // polygon/JSON scalar batches, hierarchical dictionaries
    "sql_ch_assoc_spellings", "sql_ch_w28_aggs", "sql_ch_w28_scalars",
    "sql_ch_w28_window", "sql_ch_w29_batch", "sql_ch_w29_approx_top",
    "sql_ch_w30_ml", "sql_ch_w31_batch", "agg_cat_iv",
    "agg_interval_union", "sql_ch_w33_batch", "sql_ch_joinget",
    "pipe_ann_hamming", "pipe_domain_mixture", "pipe_intradoc_dedup",
    // round-16: star-contraction CC on the gate
    "pipe_dedup_components_star")

  /** `runMain graft.Perf --time [sfDir [query...]]`: wall-time a
    * query's cost split into front-door build (rewrite + analysis)
    * vs execution (noop write), 4 warm rounds each — the attribution
    * mode that located sql_ch_parametric's ObjectHashAggregate cost.
    * Master/parallelism come from SPARK_GRAFT_CPUS like Bench.
    */
  private def timeMode(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names0 = if (args.length > 1) args.drop(1).toSeq
                 else Seq("sql_ch_parametric")
    val names = names0.filter(SparkEntry.queries.contains)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm up codegen/classloading before attributing anything
    SparkEntry.queries("q1_flagship")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    for (n <- names; i <- 1 to 4) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"PROF $n round $i build=${(t1 - t0) / 1e9}%.3f s " +
        f"exec=${(t2 - t1) / 1e9}%.3f s")
    }
    spark.stop()
  }

  /** Count EXECUTED operator instances, not textual occurrences: a
    * persisted subtree's defining plan prints once per
    * InMemoryTableScan reference (with fresh expr ids, so line-dedup
    * can't fix it) but runs ONCE — walk the tree and descend into
    * each cached relation exactly once (identity-keyed on the shared
    * cacheBuilder: each reference holds its own InMemoryRelation COPY
    * with fresh output attrs, but they all share the builder that
    * materializes the RDD once). Shared by the PERF.md audit and the
    * STRESS exchange counter (r15 — STRESS used a raw regex before,
    * which double-counted persisted lineage per reference).
    */
  def executedNodes(root: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val seen = new java.util.IdentityHashMap[AnyRef, AnyRef]()
    val out = scala.collection.mutable.ArrayBuffer[SparkPlan]()
    def walk(p: SparkPlan): Unit = {
      out += p
      p match {
        case t: InMemoryTableScanExec =>
          if (seen.put(t.relation.cacheBuilder, t.relation.cacheBuilder) == null)
            walk(t.relation.cachedPlan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan) // AQE root/cached-plan wrapper has no children
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          // AFTER execution AQE seals each stage behind a LEAF wrapper —
          // descend into the materialized stage plan (once per stage;
          // a reused stage shares the identical plan object)
          if (seen.put(q.plan, q.plan) == null) walk(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          if (seen.put(r.child, r.child) == null) walk(r.child)
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(root)
    out.toSeq
  }

  /** Executed exchange count (shuffle + broadcast) for one frame —
    * the STRESS.md "exchanges" column since r15.
    */
  def executedExchanges(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    executedNodes(df.queryExecution.executedPlan).count {
      case _: ShuffleExchangeExec | _: BroadcastExchangeExec => true
      case _ => false
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--time")) return timeMode(args.drop(1))
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    // Audit EVERY declared query (r14): standing first (stable diff
    // order for the historical rows), then the rest of the contract —
    // a red-flag plan can no longer hide in an unaudited entry.
    val names = (standing ++ args.drop(1) ++ SparkEntry.queries.keys.toSeq.sorted)
      .distinct.filter(SparkEntry.queries.contains)
    val spark = Tuned(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class Audit(name: String, shuffles: Int, broadcasts: Int,
        bnlj: Int, singlePartition: Int, plan: String)
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning, SinglePartition}
    def nodes(root: org.apache.spark.sql.execution.SparkPlan) =
      executedNodes(root)

    val audits = names.map { n =>
      val qe = SparkEntry.queries(n)(spark, sfDir).queryExecution
      val plan = qe.executedPlan.toString
      val ns = nodes(qe.executedPlan)
      Audit(n,
        shuffles = ns.count {
          case s: ShuffleExchangeExec => s.outputPartitioning match {
            case _: HashPartitioning | _: RangePartitioning => true
            case _ => false
          }
          case _ => false
        },
        broadcasts = ns.count(_.isInstanceOf[BroadcastExchangeExec]),
        bnlj = ns.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        singlePartition = ns.count {
          case s: ShuffleExchangeExec => s.outputPartitioning == SinglePartition
          case _ => false
        },
        plan = plan)
    }

    val sb = new StringBuilder
    sb ++= "# PERF — physical-plan audit\n\n"
    sb ++= s"Generated by `runMain graft.Perf` against `$sfDir`. Regenerate after\n"
    sb ++= "any change to the audited queries; review the diff for plan regressions.\n\n"
    sb ++= "Scale-stress evidence (1×/10×/30× synthesized runs of the heavy\n"
    sb ++= "operator families): see `STRESS.md` (`runMain graft.Stress [mult]`).\n\n"
    sb ++= "Red-flag columns: BNLJ = BroadcastNestedLoopJoin (all-pairs — only\n"
    sb ++= "acceptable for bounded broadcast-scalar demonstrators); 1-part =\n"
    sb ++= "`Exchange SinglePartition` (a global serial point — only acceptable\n"
    sb ++= "on bounded aggregated series or final scalar folds).\n\n"
    sb ++= "Counts are EXECUTED operator instances (tree walk, each persisted\n"
    sb ++= "subtree counted once via its shared cacheBuilder) — the printed plan\n"
    sb ++= "repeats a cached subtree per reference, which the pre-r14 regex\n"
    sb ++= "counts double-counted.\n\n"
    sb ++= "Measured (`--time`, sf0.1, local[32], 4 warm rounds, round 12):\n"
    sb ++= "`sql_ch_parametric` exec 0.39–0.48 s warm (build ~0.1 s) on the\n"
    sb ++= "QuantileExact + UniqUpTo path — one two-phase ObjectHashAggregate\n"
    sb ++= "pass, 2 exchanges (was ~0.9 s + 3 exchanges via builtin\n"
    sb ++= "percentile + count(DISTINCT) Expand). Late-r12 wave entries, same\n"
    sb ++= "protocol: `sql_ch_w28_aggs` (11 stats aggregates incl. collected\n"
    sb ++= "rankCorr/ETD over ~6k filtered rows) exec 0.52 s warm,\n"
    sb ++= "`sql_ch_w30_ml` (two 600k-row ridge fits + apply) 0.34–0.43 s,\n"
    sb ++= "`sql_ch_assoc_spellings` (4 association aggregates, full orders\n"
    sb ++= "scan) 0.14–0.16 s, `sql_ch_w33_batch` (13 scalar columns over\n"
    sb ++= "nation) 0.15–0.22 s — all single-pass plans, warm builds ≤ 0.25 s.\n\n"
    sb ++= "| query | shuffles | broadcasts | BNLJ | 1-part |\n"
    sb ++= "|---|---|---|---|---|\n"
    audits.foreach { a =>
      sb ++= s"| ${a.name} | ${a.shuffles} | ${a.broadcasts} | ${a.bnlj} | ${a.singlePartition} |\n"
    }
    sb ++= "\n## Plans\n"
    audits.foreach { a =>
      sb ++= s"\n### ${a.name}\n\n```\n${a.plan.trim.take(6000)}\n```\n"
    }
    Files.write(Paths.get("PERF.md"), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"wrote PERF.md (${audits.size} queries)")
    spark.stop()
  }
}
