package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan for the
  * headline queries so pushdown / pruning / join-strategy regressions
  * are visible (run: `sbt "runMain graft.ExplainAudit [sfDir] [name]"`).
  *
  * What to look for (and what the tests assert):
  *  - parquet scans show PushedFilters + a pruned ReadSchema;
  *  - dimension joins are BroadcastHashJoin, fact-fact joins
  *    SortMergeJoin/ShuffledHashJoin (AQE may rewrite);
  *  - top-k is TakeOrderedAndProject, not a global Sort;
  *  - hot paths sit inside WholeStageCodegen spans;
  *  - no CartesianProduct anywhere.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).headOption
    val spark: SparkSession = graft.core.Sessions.local("graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    val names = only match {
      case Some(n) => Seq(n)
      case None => Seq("q1_pricing_summary", "q3_sql_shipping",
        "j1_broadcast_dims", "j2_inner_big", "l1_topk",
        "dd_minhash_lsh", "sim_lsh_ann", "mm_meta_only",
        "p4_filter_eq", "e1_event_window", "x1_asof_join",
        "x10_correlated", "w5_topk_group", "x16_range_join",
        "m10_merge_upsert", "dd_cluster_dedup", "d4_cms_estimate",
        // round 6: salted skew join, layout-pruned aggregates,
        // bounded-memory percentile twins
        "j6_skew_salted", "l4_partition_pruned", "l5_manifest_skip",
        "x8b_approx_percentile", "x12b_approx_fence",
        // round 7: repetition filters (explode→two-level agg shape)
        "t_repetition",
        // round 9: no-Expand approx profile twin, split-agg distinct
        // counting, cross-corpus gram-duplication fraction
        "p11b_profile_approx", "d2_approx_distinct", "dd_gram_dupfrac")
    }
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
