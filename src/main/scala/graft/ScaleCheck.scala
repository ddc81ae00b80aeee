package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale checkpoint (VERDICT r3 next-round #5): no sf1 testdata exists
  * in this container, so this main materializes a ~10× corpus from
  * sf0.1 into target/sfx10 and times a heavy-query subset at both
  * scales, printing per-query scaling factors. A query whose cost
  * curve hides a candidate-pair blowup or a skew cliff at sf0.1 shows
  * a factor far above ~10 here.
  *
  * Replication is STATISTICS-PRESERVING, not copy-paste: key columns
  * shift per replica (so join fan-outs stay realistic), document text
  * is word-permuted per replica with a deterministic hash order (same
  * vocabulary/length distributions, but replicas are NOT near-dups of
  * their origin — a copy-paste corpus would degenerate every dedup
  * query into 10-way duplicate cliques, which is a different workload),
  * and embeddings get ±5% deterministic jitter (norms preserved,
  * exact-dup structure broken). Replica 0 is the original data.
  */
object ScaleCheck {

  val Replicas = 10
  val Stride = 100000000L // key shift per replica, above any base key

  /** Second-level replication (100× = 10× of the 10× corpus) needs a
    * stride ABOVE the first level's whole key range (base + 9·Stride),
    * or replica keys collide (base + r1·S + r2·S = base + r3·S) and
    * duplicate primary keys corrupt every join's fan-out. It also
    * needs a disjoint permutation-salt range, or a second-level
    * replica permuted with salt r would exactly reproduce a
    * first-level replica's text when fed the same token multiset. */
  def buildReplica(spark: SparkSession, base: String, out: String,
      stride: Long = Stride, saltBase: Int = 0): Unit = {
    def shiftKeys(df: DataFrame, r: Int, keys: String*): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(r * stride)))
    if (Files.exists(Paths.get(out, "_DONE"))) return
    def write(name: String, mk: Int => DataFrame): Unit = {
      val full = (0 until Replicas).map(mk).reduce(_ unionByName _)
      full.write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    // dims keep their PRIMARY KEYS unique: one copy, not a 10-way
    // union (duplicate r_regionkey/n_nationkey would fan every
    // dim-joined fact row out 10× and corrupt the scaling factors)
    Tables(spark, base, "region").write.mode("overwrite").parquet(s"$out/region.parquet")
    Tables(spark, base, "nation").write.mode("overwrite").parquet(s"$out/nation.parquet")
    write("customer", r => shiftKeys(Tables(spark, base, "customer"), r, "c_custkey"))
    write("supplier", r => shiftKeys(Tables(spark, base, "supplier"), r, "s_suppkey"))
    write("part", r => shiftKeys(Tables(spark, base, "part"), r, "p_partkey"))
    write("orders", r =>
      shiftKeys(Tables(spark, base, "orders"), r, "o_orderkey", "o_custkey"))
    write("lineitem", r =>
      shiftKeys(Tables(spark, base, "lineitem"), r, "l_orderkey", "l_partkey", "l_suppkey"))
    write("events", r =>
      shiftKeys(Tables(spark, base, "events"), r, "event_id", "user_id"))
    write("documents", r => {
      val d = shiftKeys(Tables(spark, base, "documents"), r, "doc_id")
      if (r == 0) d
      else {
        // per-replica word permutation: sort (hash, word) structs — the
        // hash is keyed on (word, position, replica), so each replica
        // is a fresh deterministic shuffle of the same tokens
        val words = split(col("text"), " ")
        val permuted = array_join(
          transform(
            array_sort(transform(words,
              (w, i) => struct(xxhash64(w, i, lit(saltBase + r)).as("h"), w.as("w")))),
            s => s.getField("w")),
          " ")
        d.withColumn("text", permuted)
          .withColumn("n_chars", length(col("text")).cast("long"))
      }
    })
    write("embeddings", r => {
      val d = shiftKeys(Tables(spark, base, "embeddings"), r, "vec_id")
      if (r == 0) d
      else d.withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          (x * (lit(1.0) +
            (pmod(xxhash64(col("vec_id"), i, lit(saltBase + r)), lit(1000)) / 10000.0 - 0.05)))
            .cast("float")))
    })
    Files.createFile(Paths.get(out, "_DONE"))
  }

  /** Families chosen for scale risk: the dedup ladder (candidate-pair
    * growth), ANN (index fit + probe), wide windows, salted/skew aggs,
    * sessionization, and one scan/join baseline each. */
  val heavyQueries: Seq[String] = Seq(
    "q_proj_filter", "q_agg_pricing", "q_join_salted", "q_topk_per_group",
    "q_window_frames", "q_session_window", "q_stats_agg",
    "q_dedup_exact", "q_dedup_minhash_lsh", "q_dedup_simhash",
    "q_dedup_ngram_jaccard", "q_dedup_substring", "q_dedup_levenshtein",
    "q_dedup_components", "q_dedup_hybrid", "q_knn_ivf", "q_knn_pq",
    "q_perplexity_bigram", "q_asof_join", "q_stateful_sessions",
    "q_merge_upsert", "q_runs_islands", "q_equi_bins", "q_skyline",
    "q_pagerank", "q_anomaly_mad", "q_ewma", "q_bpe_pairs",
    "q_cooccur_pmi", "q_cohort_retention", "q_ks_drift",
    "q_chi2_independence", "q_drift_timeline",
    // r7 additions: interval-coverage sliding distinct (corpus →
    // per-user islands), the ×32 Poisson-bootstrap fan-out, and the
    // oriented triangle join over the association graph
    "q_sliding_distinct", "q_bootstrap_ci", "q_graph_triangles",
    "q_lorenz_gini",
    // r7 second batch: the token-explode DSIR LM build, the basket
    // pair mining, the LSH-pair exact-containment join, and the
    // per-source dup-rate ride on componentLabels
    "q_dsir_weights", "q_assoc_rules", "q_minhash_containment",
    "q_dup_rate_by_source", "q_open_intervals",
    // r7 third batch: the calendar-pair trend tests, the sketch-guided
    // median, per-user window/collapse shapes, and the clip pass
    "q_mann_kendall", "q_theil_sen", "q_interarrival", "q_survival_km",
    "q_winsorize", "q_embed_centroids",
    // r7 fourth batch: the d²-fanout Gram, the shingle-df novelty
    // join, and the decay-weighted corpus pass
    "q_embed_effdim", "q_ngram_novelty", "q_decay_agg",
    // r7 fifth batch: the iterative peel over the co-purchase graph,
    // the three-ranking token pass, the word-level complexity explode,
    // and the forward twin of the union-style as-of
    "q_kcore", "q_rrf_fusion", "q_lexical_complexity", "q_asof_forward",
    // r7 sixth batch: the inverted-index fuzzy join, the LSH-pair
    // threshold sweep, and the growth-accounting user windows
    "q_fuzzy_join_token", "q_lsh_pr_curve", "q_growth_accounting",
    "q_stickiness",
    // r7 seventh batch: the basket-core recommender, the user-type
    // overlap collapse, and the d²-fanout Gram power iteration
    "q_item_cf", "q_audience_overlap", "q_embed_top_eigen",
    // r7 eighth batch: the ×4-fanout CMS build, the key-histogram join
    // sizing (runs the real join as its own check), and the
    // three-table purge ledger
    "q_countmin", "q_join_cardinality_est", "q_user_purge",
    // r7 post-tally batch (r7 VERDICT #7): the double GlobalPrefix
    // concentration pass, the 20-bin Gini stump scan, and the one-agg
    // DECIMAL moment matrix
    "q_pareto_8020", "q_stump_split", "q_corr_matrix",
    // r8 batch: the prefix-filtered similarity self-join, the
    // positional winnowing fingerprints (two window passes + the
    // band-bounded argmax join), the sequential-test day frame, and
    // the grouped moment regression
    "q_dedup_prefix_filter", "q_winnowing", "q_msprt", "q_ols_by_group",
    "q_bpe_merge", "q_multimodal_ahash_neardup",
    "q_conformal_interval", "q_blocking_quality", "q_bpe_apply",
    // r8 fourth batch: the corpus-pass Lloyd rounds (broadcast-literal
    // centroids, map-side-combined recompute) and the KN-smoothed LM
    // (LM-sized assembly, one corpus-sized scoring join)
    "q_kmeans_lloyd", "q_kneser_ney",
    // r8 fifth batch: the Pregel-as-joins community rounds on the
    // basket-pair core, the per-step corpus gradient aggregations,
    // and the leave-fold-out scoring join
    "q_label_propagation", "q_logistic_train", "q_crossval_rmse",
    // r8 sixth batch: the entropy feature screen, the wedge-bounded
    // Adamic–Adar join, the per-user lag exchange feeding the
    // states²-sized power iteration, the (class × token) NB train +
    // corpus scoring join, the two-window rank↔reference alignment,
    // and the RAKE phrase-islands explode
    "q_info_gain", "q_link_prediction", "q_markov_stationary",
    "q_naive_bayes", "q_quantile_normalize", "q_rake_keyphrases",
    // r8 seventh batch: the bipartite HITS edge build + per-round
    // dimension joins, the 3-round frontier expansion, the per-type
    // doubled-rank windows, and the one-pass EB prior collapse
    "q_hits", "q_bfs_hops", "q_spearman_by_type", "q_eb_shrinkage",
    // r8 eighth batch: the calendar-pair concordance join, the 2×2
    // corpus collapse, the one-pass λ-ladder moments, the per-user
    // change windows, and the two-pass vocabulary-growth checkpoint
    "q_kendall_tau", "q_did_estimator", "q_ridge_path", "q_scd2_build",
    "q_heaps_law",
    // r8 ninth batch: the per-dimension mean explode + probe-bounded
    // kernel blocks, the per-user pre/post collapse, and the
    // three-format write/read round-trip
    "q_embed_mmd", "q_propensity_ipw", "q_format_roundtrip",
    // r8 tenth batch: the contingency collapse and the k-fan-out
    // centroid distance projection
    "q_cluster_metrics", "q_silhouette",
    // TPC-H composites with corpus-proportional shuffle surface: the
    // wide agg (q1), the 8-table star (q8), the profit star (q9), the
    // outer-join histogram (q13), the correlated-average join-back
    // (q17), and the nested-agg semi-join chain (q20)
    "q_tpch_q1", "q_tpch_q8", "q_tpch_q9", "q_tpch_q13",
    "q_tpch_q17", "q_tpch_q20",
    // r8 eleventh batch (this round's operator additions): the
    // per-user score/outcome collapse + decile windows, the one-pass
    // groupingSets MI screen, the KM-twin hazard collapse, the
    // DECIMAL-window rolling slope, the user-key PAA/moment chain,
    // the sweep-line interval merge, the run-length dim build +
    // range-residual probe, the syllable-regexp corpus fold, the
    // token-spectrum collapse, the two-table row-hash fingerprint,
    // the capped probe×corpus kNN rank, the cell-grid density
    // classify, and the entity-frame BI five
    "q_gains_table", "q_target_encode", "q_mi_matrix", "q_nelson_aalen",
    "q_rolling_slope", "q_sax", "q_interval_coverage", "q_scd2_lookup",
    "q_readability", "q_good_turing", "q_table_fingerprint",
    "q_knn_dist_outlier", "q_dbscan_cells", "q_top_movers",
    "q_abc_classification", "q_hhi_concentration",
    "q_funnel_dropoff_time", "q_tukey_outlier", "q_sequence_support",
    // r8 twelfth batch: the secondary-sort Kalman fold, the ranked
    // CDC compaction window, the keyed full-outer diff join, the
    // partitioned write+pruned read, the deseasonalized residual
    // screen, the randomized-response projection + dual histograms,
    // and the stopword-detector confusion collapse
    "q_kalman_1d", "q_cdc_apply", "q_snapshot_diff", "q_partition_prune",
    "q_anomaly_deseasonalized", "q_ldp_frequency", "q_langid_confusion",
    // round-8 session batch: the per-user pair collapse + tiny ranked
    // frame (Wilcoxon), the one-pass 10-moment matrix (partial corr),
    // the per-type 4-moment collapse (JB), the 2×2 rater collapse
    // (kappa), the array-fold lexicon screen, the per-type conditional
    // moments + BH ladder, the two broadcast-center IRLS passes
    // (Huber), the top-501 TakeOrdered (Hill), the (user,type)
    // self-join pair mining + K² MM rounds (Bradley–Terry), the
    // ≤100-cell IPF window rounds, the 4-explode clipped-count joins
    // (BLEU), the distinct-key bottom-k merge (KMV), the user-window
    // presence collapse (removal attribution), and the two
    // groupingSets boosting passes (GBDT stumps)
    "q_wilcoxon_signed_rank", "q_partial_corr", "q_jarque_bera",
    "q_cohens_kappa", "q_lexicon_screen", "q_bh_fdr", "q_huber_mean",
    "q_neyman_allocation", "q_hill_tail", "q_bradley_terry",
    "q_ipf_raking", "q_bleu_overlap", "q_bottomk_sample",
    "q_attribution_removal", "q_gbdt_stumps",
    // round-8 second batch: the per-stratum 2×2 collapse (CMH), the
    // postings + 3-term broadcast fan-out (Dirichlet QL), the 2-integer
    // discordance collapse (McNemar), and the three-table (x,y)
    // dependency aggregations (FD audit)
    "q_mantel_haenszel", "q_dirichlet_ql", "q_mcnemar", "q_fd_audit",
    // round-8 third batch: the per-round corpus E-step joins (EM) and
    // the rating-matrix collapse + factor solves (ALS)
    "q_mixture_em", "q_als_round",
    // round-8 fourth batch: the three per-key frequency collapses
    // (skew audit), the per-type rank windows (trimmed mean), and the
    // 10-bin forecast collapse (Brier decomposition)
    "q_skew_audit_multi", "q_trimmed_mean", "q_brier_decomposition",
    // round-8 fifth batch: the (vec,dim) explode + 1024-row sign join
    // (JL) and the mapPartitions theta-partial corpus pass (set ops)
    "q_jl_projection", "q_theta_sketch_setops",
    // round-8 sixth batch: the per-look cumulative moment collapse and
    // the positive-argmax + vocabulary fan-out sampler
    "q_group_sequential", "q_negative_sampling",
    // round-8 seventh batch: the d²-Gram double power chain
    "q_pca_top2",
    // round-8 eighth batch: the per-user IV collapse, the dual-scorer
    // postings pass, and the band-bounded + md5-capped linkage pairs
    "q_iv_wald", "q_rank_agreement", "q_fellegi_sunter",
    // round-8 ninth batch: the procedure-comparison ladder and the
    // tie-domain rank collapse
    "q_holm_bonferroni", "q_kruskal_wallis",
    // round-8 tenth batch: the coalition-mask user collapse and the
    // probe×corpus ranking-eval pass
    "q_shapley_attribution", "q_map_at_k",
    // round-9 first batch: the 64-register one-pass portable HLL, the
    // double label join over the shared dst-clustered edge cache, the
    // seeded 5-round teleport recurrence, and the graded probe×corpus
    // ranking eval
    "q_hll_portable", "q_graph_modularity", "q_pagerank_personalized",
    "q_ndcg_at_k",
    // round-9 second batch: the component-member argmax rollup and the
    // one-pass two-sided moment collapse
    "q_dedup_keep_best", "q_regression_discontinuity",
    // round-9 third batch: the 9-way probe-explode bucket join and the
    // vocabulary-joined EM pass
    "q_knn_multiprobe", "q_plsa_round",
    // round-9 fourth batch: the per-(type,day) lead window + DECIMAL
    // collapse and the 3×(corpus×64 cell) Weiszfeld passes
    "q_twap", "q_geometric_median",
    // round-9 fifth batch: the triple-Gram cells self-join
    "q_embed_cka",
    // round-9 sixth batch: the per-shard register build + 64-row merge
    "q_hll_union_portable",
    // round-10 batch: the secondary-sort Holt fold over the collapsed
    // day frame, the shuffle-free per-partition MG fold + bounded
    // candidate recount, and the shared dual-scorer pass feeding the
    // executor-side 40-row draft
    "q_holt_forecast", "q_mg_heavy_hitters", "q_team_draft",
    // round-10 second batch: the ×32 label-reshuffle fan-out and the
    // per-series lag-window Yule–Walker moments, plus the pre-existing
    // vocabulary collapse + top-500 log-log solve (first gated here)
    "q_permutation_test", "q_zipf_fit", "q_ar2_forecast",
    // round-10 third batch: the per-user collapse + 20-bin ntile
    // feeding the bounded O(B³) max-min grid, and the per-shard
    // secondary-sort greedy packer
    "q_isotonic_calibration", "q_sequence_packing",
    // round-10 fourth batch: the cell-frame adjacency rounds and the
    // 32-candidate consensus scan over the day frame
    "q_dbscan_clusters", "q_ransac_line",
    // round-10 fifth batch: the banded 1-NN candidate join on the
    // per-user covariate frame
    "q_psm_matching",
    // round-10 sixth batch (second session): the 3-scan histogram
    // build + 4-bucket bracketed exact rank selection, and the
    // two-layout file-stats collapse off one Morton pass
    "q_hdr_quantiles", "q_zorder_layout",
    // round-10 seventh batch: the day-frame union feeding one
    // 10-moment collapse (granger), the week-block rank frame
    // (friedman), the 150-cell median + integer z moments (levene),
    // and the per-type count projection (wilson)
    "q_granger_causality", "q_friedman_test", "q_levene_test",
    "q_wilson_interval",
    // round-10 eighth batch: the per-type PH window walk and the
    // exact-DECIMAL rolling-error collapse
    "q_page_hinkley", "q_forecast_backtest",
    // round-10 ninth batch: three domain-bounded cent-support
    // collapses (pooled midranks, trim/winsorize spans, CDF gaps)
    "q_effect_sizes", "q_yuen_ttest", "q_wasserstein_1d",
    // round-10 tenth batch: the cluster-bounded pair join, the
    // DECIMAL(38,0) D-squared collapse, and the edge-moment Pearson
    "q_semdedup", "q_cvm_twosample", "q_graph_assortativity",
    // round-10 eleventh batch: the rel-week moment collapse and the
    // dual-threshold joint-exceedance count
    "q_event_study", "q_tail_dependence",
    // round-10 twelfth batch: the per-part secondary-sort Croston fold
    "q_croston",
    // round-10 thirteenth batch: the part-frame cumulative selection,
    // the user-grain capture flags, and the token-spectrum collapse
    "q_pps_sampling", "q_capture_recapture", "q_chao1_richness",
    // round-10 fourteenth batch: the 9-moment collapse and the
    // residual-frame diagnostics off the shared daily OLS
    "q_vif", "q_cooks_distance", "q_durbin_watson",
    // round-10 fifteenth batch: the monthly-demand sparse moments,
    // the (doc, term) collapse, and the rec-list pair self-join
    "q_abc_xyz", "q_term_burstiness", "q_rec_coverage",
    // round-10 sixteenth batch: the calendar-bounded subsequence
    // pair profile
    "q_matrix_profile",
    // round-11 first batch: the per-shard value-histogram collapse
    // feeding the k-bounded ε-rank summary + merge audit
    "q_rank_sketch",
    // round-11 second batch: the user-grain survival collapse + the
    // death-time frame, and the day-frame prefix-moment sup-F sweep
    "q_logrank_test", "q_structural_break",
    // round-11 third batch: the per-series theta fold off the day
    // frame, and the user-grain doubly-robust term collapse
    "q_theta_forecast", "q_aipw_estimator",
    // round-11 fourth batch: the day-frame lag joins (LB + DF), the
    // week-grain maxima collapse, and the (user, type) binary margins
    "q_ljung_box", "q_dickey_fuller", "q_block_maxima_evt",
    "q_cochran_q",
    // round-11 fifth batch: the day-frame prefix/sign walks
    "q_kpss_test", "q_runs_test",
    // round-11 sixth batch: the per-type arm-moment collapse
    "q_tost_equivalence",
    // round-11 seventh batch: the (type, day) count moments and the
    // week-grain subgroup collapse
    "q_negbin_fit", "q_control_chart", "q_hurst_exponent",
    // round-11 eighth batch: the per-series chart folds
    "q_ewma_chart", "q_cusum_chart", "q_dfa_alpha",
    // r12 batch: the 7-pass decimal-weighted IRLS (quantile reg), the
    // death-time-frame Newton rounds (Cox), the two-pass aux
    // regression (BP), the 5-row variance collapse (Bartlett), the
    // exact-median counting pass (Mood), the converted-user rank
    // window (Weibull), the nation-day return windows (ES), the
    // 4-lag day-frame joins (PACF), and the double rank window over
    // purchase gaps (AD)
    "q_quantile_reg", "q_cox_ph", "q_breusch_pagan", "q_bartlett_test",
    "q_mood_median", "q_weibull_fit", "q_expected_shortfall", "q_pacf",
    "q_anderson_darling",
    // r12 second batch: the day-frame FGLS transform (PW), the 5-lag
    // HAC score joins (NW), the single-partition forward fold (HMM),
    // and the region-aligned residual ADF (EG)
    "q_prais_winsten", "q_newey_west", "q_hmm_forward", "q_cointegration",
    "q_periodogram", "q_turning_points", "q_max_drawdown",
    "q_kendall_w", "q_spectral_entropy", "q_sharpe_ratio",
    // r13 batch: the bounded 250-row histogram pair sum (JT), the
    // nation/region/day keyed collapses + calendar-bounded windows
    // (grubbs, page, dagostino, chow, arch, pettitt, capm, sortino,
    // calmar, moran), the two-rank-window EDF form (cvm), the exact-
    // median counting pass (odds), and the moment collapses (icc,
    // cronbach)
    "q_jonckheere_terpstra", "q_grubbs_test", "q_page_trend",
    "q_dagostino_k2", "q_chow_test", "q_arch_lm", "q_pettitt_test",
    "q_capm_beta", "q_sortino_ratio", "q_calmar_ratio",
    "q_cramer_von_mises", "q_odds_ratio", "q_morans_i", "q_icc",
    "q_cronbach_alpha",
    // r13 second batch: the two-rank-window dispersion/superiority
    // tests (ansari, brunner–munzel), the bounded-histogram ordinal
    // family (somers, cliffs), day-frame forecast monitors (theil_u,
    // tracking), the 2D outlier quadratic (mahalanobis), and the
    // contingency collapse (cramers_v)
    "q_ansari_bradley", "q_theil_u", "q_somers_d", "q_cliffs_delta",
    "q_mahalanobis_outlier", "q_cramers_v", "q_tracking_signal",
    "q_brunner_munzel",
    // r13 third batch: the calendar-bounded Elo fold off the keyed
    // corpus collapse, the triple-MA KZ filter, STL-lite seasonal
    // strength, bounded composition/ballot grids (bray, dhondt,
    // borda), and the corpus term passes (theil, entropy rate)
    "q_elo_rating", "q_kolmogorov_zurbenko", "q_seasonal_strength",
    "q_bray_curtis", "q_dhondt_seats", "q_theil_index",
    "q_entropy_rate", "q_borda_count")

  def main(args: Array[String]): Unit = {
    // --build-only: materialize the corpus and exit — the mode the
    // 10× DuckDB oracle sweep uses (scripts/selfcheck.py pointed at
    // the sfx10 dir) so correctness above sf0.1 doesn't pay for the
    // timing sweep.
    val buildOnly = args.contains("--build-only")
    val pos = args.filterNot(_.startsWith("--"))
    val base = pos.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (pos.length > 1) pos(1) else "target/sfx10"
    // second-level replication (e.g. 100× = 10× of target/sfx10):
    //   --stride=1000000000 --salt=100  (see buildReplica scaladoc)
    def longArg(name: String, dflt: Long): Long = args.collectFirst {
      case a if a.startsWith(s"--$name=") => a.stripPrefix(s"--$name=").toLong }
      .getOrElse(dflt)
    val stride = longArg("stride", Stride)
    val salt = longArg("salt", 0L).toInt
    val spark = Sessions.build("graft-scalecheck")
    spark.sparkContext.setLogLevel("WARN")

    println(s"[scale] building $out from $base (${Replicas}x, stride=$stride, salt=$salt) ...")
    val tb = System.nanoTime()
    buildReplica(spark, base, out, stride, salt)
    println(f"[scale] corpus ready in ${(System.nanoTime() - tb) / 1e9}%.1f s")
    if (buildOnly) { spark.stop(); return }

    def time(name: String, dir: String): Double = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // localCheckpoint blocks aren't CacheManager entries
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
      runs.min
    }
    // warmup
    Tables(spark, base, "region").groupBy("r_name").count()
      .write.format("noop").mode("overwrite").save()

    // --only=q_a,q_b: targeted factor rerun (new/changed queries)
    // without paying for the full 37-query sweep.
    val only = args.collectFirst { case a if a.startsWith("--only=") =>
      a.stripPrefix("--only=").split(",").map(_.trim).filter(_.nonEmpty).toSet }
    val sweep = only.fold(heavyQueries)(f => heavyQueries.filter(f))
    println(f"${"query"}%-24s ${"sf0.1"}%8s ${"sfx10"}%8s  factor")
    val rows = sweep.map { q =>
      val t1 = time(q, base)
      val t10 = time(q, out)
      println(f"$q%-24s $t1%8.2f $t10%8.2f  ${t10 / t1}%5.1fx")
      (q, t1, t10)
    }
    val j = rows.map { case (q, t1, t10) =>
      f""""$q":[$t1%.3f,$t10%.3f]""" }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_check","replicas":$Replicas,"queries":$j}""")
    spark.stop()
  }
}
