package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q26_order_priority", "q29_market_share", "q31_ship_delay",
                  "q36_disjunctive_revenue", "q39_set_ops", "s04_tfidf_search",
                  "p01_pack_sequences", "a02_bloom_filtered_join",
                  "d05_embedding_dup", "d07_boilerplate", "s06_ann_multiprobe",
                  "q22_small_quantity_revenue", "q34_top_supplier", "q48_stg_users_cleanse",
                  "q51_partitioned_scan", "q53_compaction", "d02_ngram_jaccard",
                  "d03_minhash_lsh", "p10_domain_mix", "p11_global_shuffle",
                  "q56_funnel", "q57_cohort_retention", "q58_bucketed_join",
                  "q54_quality_checks", "a04_cms_heavy_hitters",
                  "q59_seeded_mart", "q60_evolved_partitions", "q61_time_travel",
                  "q62_scd2_apply", "p12_chunk_documents", "s09_ann_recall",
                  "m04_media_dedup",
                  "q65_range_join", "q66_incremental_agg", "q67_file_skipping",
                  "a05_kmv_distinct", "t10_hof_suite",
                  "d10_semantic_dedup", "q68_zorder_skipping", "q69_wap",
                  "p13_fuzzy_contamination", "a06_kmv_set_ops",
                  "s10_pq_codebook", "s11_pq_search", "q70_point_index",
                  "t11_bpe_merges", "q71_insert_overwrite",
                  "t12_bpe_encode", "d11_dup_spans",
                  "p14_temperature_mix", "q72_bloom_skipping",
                  "q73_unpivot", "q74_gap_fill",
                  "q75_percentile_suite", "m05_shard_manifest",
                  "q76_purge", "a07_sketch_sizing",
                  "d12_cluster_apply", "a08_aqp_groupby",
                  "q77_metadata_only", "p15_leakproof_split",
                  "d13_incremental_lsh", "p16_bloom_decontaminate",
                  "m06_perceptual_dedup", "d14_prefix_join",
                  "p18_corpus_pipeline", "q84_rollback", "q85_snapshot_history",
                  "a10_sketch_rollup", "m07_media_align", "d15_cdc_chunks",
                  "q86_temporal_join", "q87_write_constraints",
                  "p19_dataset_card", "st19_observed_metrics", "q88_graph_rank",
                  "p20_view_models", "q89_metadata_tables", "q90_branch_wap",
                  "q91_pos_delete", "st20_avro_cdc", "s13_ann_serve",
                  "q92_manifest_pruning", "p21_curriculum",
                  "q93_namespaces", "q94_hidden_partition",
                  "q95_partitions_meta", "q96_column_mapping",
                  "q97_type_promotion", "q98_merge_sync",
                  "q99_cherry_pick", "p22_dbt_snapshot",
                  "p23_snapshot_timestamp", "p24_backfill",
                  "st21_stream_hidden_partition", "s14_ivf_pq",
                  "q99_cherry_pick", "q100_refs_meta", "q101_ref_travel",
                  "p24_backfill", "s15_ann_append", "m08_clip_filter",
                  "st22_stream_ann_ingest",
                  "q102_spec_evolution", "q103_call_procedures",
                  "q104_multi_table_txn", "q105_show_tables",
                  "q106_default_values", "s16_sq8_search",
                  "t15_collocations", "p25_epoch_schedule",
                  "st23_stream_schema_drift", "st24_two_sink_txn",
                  "d16_dedup_weights", "s17_filtered_ann",
                  "s18_index_compact", "s19_index_drift",
                  "st25_stream_cdf", "q108_analyze_stats",
                  "q109_stats_broadcast", "q110_sql_dml",
                  "q111_mor_travel", "q112_sql_views",
                  "q113_sql_ddl", "q114_sql_merge",
                  "q115_clone_table", "p26_quality_curve",
                  "t16_vocab_curve", "d17_containment",
                  "q133_write_ordered", "q134_store_failures",
                  "q135_user_share", "a11_rolling_sketch",
                  "p30_source_quota", "st29_stream_write_order")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq
      def n(pat: String) = pat.r.findAllIn(plan).length
      println(s"[audit] $q: bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} shj=${n("ShuffledHashJoin")} " +
        s"exch=${n("Exchange")} wsc=${n("WholeStageCodegen")} partialAgg=${n("HashAggregate\\(keys=[^)]*functions=\\[partial")}")
      pushed.take(4).foreach(p => println(s"[audit]   $p"))
    }
    spark.stop()
  }
}
