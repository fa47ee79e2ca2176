package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: prints `explain("formatted")` for the headline
  * queries so scan pushdown, broadcast choices, and whole-stage-codegen
  * coverage can be inspected (`runMain graft.Explain [sfDir] [name...]`). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("j1_walrus_match", "p2_filter_gt", "w1_replay_per_topic",
        "a2_rate_tumbling", "u2_semi_join", "j9_rls_probe",
        "dedup_minhash_lsh", "sim_ann_bruteforce", "p6_column_projection",
        "j1_walrus_200subs", "j_multi_table", "j_dispatch_gating",
        "s2_wal_decode", "p_truncate_routing", "dedup_embedding",
        "s1_wal2json_decode", "curation_sample", "curation_pack",
        "curation_contamination", "text_repetition", "text_gopher_filter",
        "j_asof_enrich", "j_range_windows", "dedup_incremental",
        "dedup_semantic", "curation_take_n", "text_oov_rate",
        "text_bm25", "text_collocations", "text_nb_classifier",
        "dedup_spans", "sim_knn_graph", "curation_shuffle", "a_corr",
        "a_expectations", "a_drift_psi", "a_ewma", "sim_pagerank",
        "text_ndcg", "text_rrf", "text_entropy", "text_source_overlap",
        "curation_curriculum", "curation_interleave", "a_skew_keys",
        "a_transitions", "sim_centroid_sep", "a_user_journey",
        "a_rolling_actives", "a_outliers_mad", "a_debounce",
        "j_asof_next", "pipeline_curation_e2e_v3", "a_wow_growth",
        "a_percent_rank", "a_chisq", "curation_split3",
        "text_keyphrases", "text_textrank", "a4_presence_orswot",
        "j8_routing_fallback", "sim_ann_recall")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
