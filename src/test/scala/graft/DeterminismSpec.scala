package graft

/** Partitioning-invariance: a query's rows must not depend on the
  * physical partitioning of its input or shuffles. This is what catches
  * an under-specified ORDER BY ... LIMIT (a tie at the cut line resolved
  * by partition arrival order) or any accidental dependence on scan
  * split boundaries — the determinism class the DuckDB oracle can NOT
  * catch, because the oracle only sees one partitioning.
  *
  * Each query runs twice: on the shared session (32-ish defaults) and on
  * a sibling session forced to 3 shuffle partitions and 4 KB scan
  * splits. Row SETS must be identical.
  */
class DeterminismSpec extends SparkSpec {

  private lazy val tiny = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "3")
    s.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    s.conf.set("spark.sql.files.openCostInBytes", "0")
    s
  }

  private val covered = SparkEntry.queries.keys.filter(_.startsWith("q_tpch_")).toSeq.sorted ++
    Seq("q_curriculum", "q_epoch_shuffle", "q_posexplode", "q_recursive_cte",
      "q_listagg", "q_bit_agg", "q_array_setops", "q_map_funcs",
      "q_k_anonymity", "q_variant", "q_xml_extract",
      // round-12 mining/statistics additions — all carry explicit total
      // orders; the iterative ones (BPE, CC) must converge identically
      // at any partitioning
      "q_itemsets", "q_markov", "q_fuzzy_match", "q_winsorize",
      "q_entity_clusters", "q_bpe_train", "q_cusum", "q_source_gini",
      "q_quantile_norm", "q_pattern_negation",
      "q_peak_concurrency", "q_boolean_retrieval", "q_phrase_search",
      "q_pareto", "q_funnel3", "q_mutual_info", "q_benford", "q_bpe_apply",
      // round-13 (session 2) statistics/text/retrieval additions — MMR's greedy pick
      // sequence and RAKE's top-k cut are the partition-sensitive shapes
      "q_kappa", "q_acf", "q_mann_whitney", "q_link_predict", "q_flesch",
      "q_mmr_diversify", "q_rake_keywords", "q_range_shards", "q_burstiness",
      "q_centroid_classify", "q_time_travel", "q_attribution",
      "q_click_paths", "q_ab_test", "q_kmeans_exact", "q_dbscan",
      "q_silhouette", "q_skyline", "q_ks_test", "q_assortativity",
      "q_hits", "q_corr_matrix", "q_freshness", "q_seq_patterns",
      "q_entropy_rate", "q_theil_sen")

  for (name <- covered) {
    test(s"$name is invariant to shuffle/scan partitioning") {
      val fn = SparkEntry.queries(name)
      val base = fn(spark, sf).collect().map(_.toSeq).toSeq
      val alt = fn(tiny, sf).collect().map(_.toSeq).toSeq
      // full sequence compare: ORDER BY'd outputs must match row-for-row
      assert(base == alt,
        s"$name changed under repartitioning: ${base.diff(alt).take(3)} vs ${alt.diff(base).take(3)}")
    }
  }
}
