package graft

/** Plan-quality audit over every registered query: no accidental
  * cartesian products or nested-loop joins outside the ops that
  * intentionally compare a bounded broadcast side against the corpus
  * (brute-force similarity scans and deliberate cross joins). A new
  * query that silently plans a cross product fails here before it
  * ever reaches a large scale factor.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // Ops whose semantics are a bounded-side × corpus comparison: the
  // nested-loop with a broadcast bounded side IS the intended plan.
  // (q_dedup_simhash and q_dedup_levenshtein left this list in round
  // 3: both are banded/blocked equi-joins over the full corpus now.)
  private val allowedNestedLoop = Set(
    "q_join_cross",        // deliberate small-dim cross join
    "q_knn_bruteforce",    // 8 query vectors × corpus
    "q_knn_signlsh",       // bucket-equi + residual (planner may NL the residual)
    "q_embed_neardup",     // label-equi + residual
    "q_tfidf_top_terms",   // 1-row broadcast doc-count scalar riding the plan
    "q_bm25",              // 1-row broadcast n_docs/avgdl scalar riding the plan
    "q_cooccur_pmi",       // 1-row broadcast doc-count scalar riding the plan
    "q_rfm",               // 1-row broadcast corpus-max-ts scalar riding the plan
    "q_perplexity_bigram", // 1-row broadcast vocab-size scalar riding the plan
    "q_window_pct",        // 1-row broadcast row-count scalar riding the plan
    "q_profile_stats",     // 1-row stat aggregates crossJoined (split-distinct)
    "q_profile_stats_approx", // same split-distinct core feeding the nd_ok flag
    "q_hll_sketch_union",  // 1-row sketch-union est × 1-row exact count
    "q_token_budget",      // 1-row broadcast grand-total scalar riding the plan
    "q_equi_bins",         // 1-row broadcast row-count scalar riding the plan
    "q_freq_items",        // 1-row broadcast token-total scalar riding the plan
    "q_ks_drift",          // 1-row broadcast sample-totals scalar riding the plan
    "q_auc_mannwhitney",   // 1-row broadcast rank-totals scalar riding the plan
    "q_js_divergence",     // 1-row broadcast token-totals scalar riding the plan
    "q_drift_timeline",    // #days × #types grid from two broadcast dim aggs
    "q_chi2_independence", // #langs × #sources grid from two broadcast dim aggs
    "q_knn_ivf",           // k-row broadcast centroid table for the probe rank
    "q_knn_pq",            // same coarse-probe shape as q_knn_ivf
    "q_tpch_q15",          // 1-row broadcast max-revenue scalar riding the plan
    "q_tpch_q22",          // 1-row broadcast avg-acctbal scalar riding the plan
    "q_tpch_q11",          // 1-row broadcast value-threshold scalar riding the plan
    "q_bootstrap_ci",      // two 1-row broadcast scalars (totals + se) riding the plan
    "q_cuped",             // 1-row broadcast pooled-moments scalar riding the plan
    "q_calibration",       // 1-row broadcast N + ECE scalars riding the plan
    "q_psi",               // 1-row broadcast edges/totals/psi scalars riding the plan
    "q_lorenz_gini",       // 1-row broadcast n/Σx/Σix moments riding the plan
    "q_changepoint_cusum", // 1-row broadcast μ/σ moments riding the window pass
    "q_mann_kendall",      // calendar-bounded (#days ≤ ~2.4k) broadcast pair join
                           // + 1-row S/ties/n scalars — bounded by calendar², not corpus
    "q_seasonal_dow",      // 1-row broadcast grand-mean scalar riding the plan
    "q_benford",           // 1-row broadcast N + chi² scalars riding the 9-row grid
    "q_open_intervals",    // 1-row broadcast peak-max scalar riding the grid
    "q_dsir_weights",      // 1-row broadcast token-totals scalar riding the plan
    "q_kanonymity",        // 1-row broadcast suppression totals riding the histogram
    "q_assoc_rules",       // 1-row broadcast basket-total scalar riding the plan
    "q_burst_detect",      // 1-row broadcast Poisson-baseline scalar riding the plan
    "q_theil_sen",         // calendar-bounded pair join + 1-row slope/median scalars
    "q_winsorize",         // 1-row broadcast p1/p99 clip bounds riding the plan
    "q_interarrival",      // 1-row broadcast exact-quantile scalars riding the plan
    "q_decay_agg",         // 1-row broadcast corpus-horizon scalar riding the plan
    "q_embed_effdim",      // 1-row broadcast n/dim scalars riding the 4096-cell grid
    "q_funnel_windowed",   // three 1-row broadcast step counts riding the plan
    "q_survival_km",       // 1-row broadcast censor-horizon + total scalars
    "q_graph_triangles",   // 1-row broadcast doc-count scalar in the lift test
    "q_kcore",             // 1-row broadcast degree-threshold scalar per peel round
    "q_xcorr_lagged",      // 8-row broadcast lag list × the #days frame
    "q_growth_accounting", // 1-row broadcast corpus-horizon scalar for churn
    "q_gains_table",       // 1-row broadcast corpus-midpoint scalar riding the plan
    "q_good_turing",       // 1-row broadcast token-total scalar riding the spectrum
    "q_knn_dist_outlier",  // capped probe set × corpus (q_knn_bruteforce shape)
    "q_mi_matrix",         // 1-row broadcast grand-total scalar per pair block
    "q_nelson_aalen",      // 1-row broadcast censor-horizon + total scalars (KM twin)
    "q_sequence_support",  // 1-row broadcast distinct-user total riding the pair frame
    "q_anomaly_deseasonalized", // 1-row broadcast gmean/median/MAD scalars on #days rows
    "q_ldp_frequency",     // 1-row broadcast report-total scalar riding the histogram
    "q_decile_lift",       // 1-row broadcast N/P totals riding the 10-row grid
    "q_power_analysis",    // 1-row broadcast μ/σ² moments × the 4-row MDE ladder
    "q_lsh_pr_curve",      // 5-row broadcast threshold ladder × the pair frame
    "q_fuzzy_join_token",  // 1-row broadcast target-corpus count riding the plan
    "q_ldiversity",        // 1-row broadcast exposure totals riding the histogram
    "q_embed_top_eigen",   // 1-row broadcast n/d/norm/Rayleigh scalars per round
    "q_countmin",          // 4-row broadcast hash-row ladder × tokens/top-k
    "q_bloom_fpr",         // 4-row hash ladder + 1-row count/fp scalars
    "q_weighted_median",   // 1-row broadcast total-weight scalar on the 50-row frame
    "q_join_cardinality_est", // 1-row broadcast predicted/actual scalars
    "q_slo_burn",          // 1-row broadcast period-budget scalar on #days rows
    "q_class_balance_sample", // 1-row broadcast min-class scalar on #classes rows
    "q_path_entropy",      // 1-row broadcast conditional-entropy scalar
    "q_pareto_8020",       // 1-row broadcast n/total scalars on the user frame
    "q_stump_split",       // 1-row broadcast totals/min-gini on the 20-bin frame
    "q_textrank",          // 1-row broadcast node-count scalar in the iteration body
    "q_blocking_quality",  // four 1-row broadcast count scalars crossJoined
    "q_kneser_ney",        // 1-row broadcast bigram-type total riding the LM build
    "q_logistic_train",    // 1-row broadcast weight vector riding each GD step
    "q_info_gain",         // 1-row broadcast corpus totals (nn/pp) riding the
                           // ≤ 3×24 bucket frame and the H(y) term
    "q_markov_stationary", // 1-row broadcast π-mass renormalizer riding the
                           // #states² frame each power-iteration round
    "q_naive_bayes",       // 5-row broadcast lang fan-out + 1-row vocab/doc-count
                           // smoothing scalars riding the scoring stream
    "q_hits",              // 1-row broadcast L2-norm scalar per half-step
    "q_eb_shrinkage",      // 1-row broadcast Beta(α,β) prior riding the
                           // #sources frame
    "q_kendall_tau",       // calendar-bounded (#days²/2) broadcast pair join
                           // + 1-row n_days scalar — the q_mann_kendall class
    "q_did_estimator",     // 1-row broadcast midpoint-date boundary riding
                           // the corpus pass
    "q_ridge_path",        // 3-row λ ladder × the 1-row moment frame
    "q_heaps_law",         // 1-row broadcast doc-id bounds + OLS fit riding
                           // the 20-row checkpoint frame
    "q_embed_mmd",         // ≤256²-bounded probe pair blocks (md5-capped,
                           // the ANN-audit class) + 1-row kernel-sum scalars
    "q_propensity_ipw",    // 1-row broadcast midpoint boundary + ATE scalar
                           // riding the ≤5-row stratum frame
    "q_cluster_metrics",   // 1-row broadcast total/entropy/pair-sum scalars
                           // riding the ≤256×#labels contingency frame
    "q_silhouette",        // k-row broadcast centroid fan-out + 1-row
                           // overall-mean scalar
    "q_wilcoxon_signed_rank", // 1-row broadcast corpus-midpoint + tie-correction
                           // scalars riding the per-user pair frame
    "q_bh_fdr",            // 1-row broadcast family-size + BH-kmax scalars
                           // riding the #types frame
    "q_neyman_allocation", // 1-row broadcast allocation totals riding the
                           // #strata frame
    "q_hill_tail",         // 1-row broadcast x_(k+1) scalar riding the
                           // 501-row top-k frame
    "q_bradley_terry",     // 1-row broadcast normalization scalar riding the
                           // ≤K² game frame each MM round
    "q_ipf_raking",        // 1-row broadcast marginal-target scalars riding
                           // the ≤100-cell contingency frame
    "q_bottomk_sample",    // 1-row broadcast exact-count audit scalar
    "q_gbdt_stumps",       // 1-row broadcast stump params + MSE scalars
                           // riding each boosting pass
    "q_mantel_haenszel",   // 1-row broadcast CMH/crude totals riding the
                           // #strata frame
    "q_dirichlet_ql",      // 3-row broadcast query-term fan-out + 1-row
                           // collection-total scalar
    "q_als_round",         // 1-row broadcast K + RMSE scalars riding the
                           // K-row item-factor frame
    "q_brier_decomposition", // 1-row broadcast grand-total/decomposition
                           // scalars riding the 10-bin frame
    "q_jl_projection",     // 64×16 sign-table grid from two range frames
                           // + md5-capped probe pair block (ANN-audit class)
    "q_theta_sketch_setops", // 1-row sketch-estimate × 1-row exact frame
    "q_group_sequential",  // 1-row broadcast time-range + total scalars
                           // riding the 5-look frame
    "q_negative_sampling", // K-row vocabulary fan-out + 1-row total scalar
    "q_pca_top2",          // 1-row broadcast n/λ/trace scalars riding the
                           // d² Gram per power round (q_embed_top_eigen class)
    "q_iv_wald",           // 1-row broadcast corpus-midpoint scalar riding
                           // the per-user collapse
    "q_rank_agreement",    // 3-row broadcast query-term fan-out + corpus
                           // scalars (the q_dirichlet_ql class)
    "q_fellegi_sunter",    // md5-capped 64×64 non-match pair block (the
                           // ANN-audit class) + 1-row m/u stat frames
    "q_holm_bonferroni",   // 1-row family-size + BH-kmax scalars riding
                           // the #types frame (the q_bh_fdr class)
    "q_kruskal_wallis",    // 1-row tie-correction scalar riding the
                           // group-rank frame
    "q_shapley_attribution", // 16×16 subset-mask grid joins (bitwise
                           // non-equi on ≤16-row frames) + 1-row totals
    "q_map_at_k",          // bounded probe set × corpus ground truth
                           // (the q_knn_bruteforce class) + 1-row totals
    "q_pagerank",          // 1-row broadcast node-count scalar in the iteration
                           // body (earlier rounds sit behind lazy checkpoints
                           // and are out of this audit's reach by construction)
    "q_dedup_minhash_mllib", // 1-row portable/MLlib/intersection count
                           // frames riding the agreement summary
    "q_hll_portable",      // 1-row exact-distinct audit scalar riding the
                           // 64-register frame (q_bottomk_sample class)
    "q_knn_multiprobe",    // 1-row recall/candidate totals riding the
                           // probe summary (q_map_at_k class)
    "q_ndcg_at_k",         // 1-row probe-count + metric totals
                           // (q_map_at_k class)
    "q_pagerank_personalized", // 1-row seed-count scalar in the iteration
                           // body (q_pagerank class)
    "q_plsa_round",        // 1-row topic-mass totals riding the
                           // vocabulary frame
    "q_regression_discontinuity", // 1-row left×right cutoff-side pivot
    "q_geometric_median",  // 1-row objective scalars chained across the
                           // three Weiszfeld iterates + 64-row centers
    "q_embed_cka",         // 1-row vec-count scalar riding the 1-row
                           // Frobenius frame (q_pca_top2 class)
    "q_hll_union_portable", // 1-row source-count scalar riding the
                           // 1-row register-comparison frame
    "q_mg_heavy_hitters",  // 1-row token-total scalar riding the
                           // candidate recount (q_freq_items class)
    "q_permutation_test",  // 1-row observed-stat + n_ge scalars riding
                           // the 32-replicate frame (q_bootstrap_ci class)
    "q_team_draft",        // 1-row×1-row top-20 array join feeding the
                           // executor-side draft fold + 10-row click
                           // broadcasts
    "q_isotonic_calibration", // O(B³) max-min grid: non-equi range
                           // joins on the 20-row bin frame (the
                           // q_shapley_attribution class) + 1-row
                           // midpoint scalar
    "q_ransac_line",       // 32-row candidate-line broadcast against
                           // the calendar-bounded day frame + 1-row
                           // n/tau and winner scalars
    "q_psm_matching",      // 1-row ATT + naive scalars crossJoined
                           // (the banded candidate join itself is an
                           // equi-join on the caliper bucket)
    "q_hdr_quantiles",     // 4-row broadcast rank ladder × the bounded
                           // bucket frame (cum >= r range join) + 1-row
                           // n/merge-check scalars riding the output
    "q_zorder_layout",     // 1-row broadcast max/zmin/zmax + predicate
                           // scalars riding the corpus pass and the
                           // 128-row file-stats frame
    "q_forecast_backtest", // 1-row broadcast naive-MAE scalar riding
                           // the 3-row model-metric frame
    "q_friedman_test",     // 1-row block-count + tie-mass scalars
                           // riding the 7-row rank-sum frame
    "q_levene_test",       // 1-row W/df scalars riding the 3-row
                           // group-moment frame
    "q_graph_assortativity", // 1-row node-count scalar riding the
                           // 1-row Pearson-moment frame
    "q_event_study",       // 1-row midpoint bounds + reference-period
                           // + pre-trend scalars riding the rel-week
                           // frame (the q_did_estimator class)
    "q_tail_dependence",   // 2-row broadcast rank ladder x bounded
                           // threshold frames + 1-row n scalar
                           // (the q_hdr_quantiles class)
    "q_croston",           // 1-row broadcast corpus-min-day scalar
                           // riding the demand collapse
    "q_pps_sampling",      // 1-row broadcast total/count scalars
                           // riding the part frame
    "q_capture_recapture", // 1-row broadcast corpus-min-day scalar
                           // riding the user-grain collapse
    "q_cooks_distance",    // 1-row broadcast fit + SSE scalars riding
                           // the day frame
    "q_durbin_watson",     // 1-row broadcast moment scalars riding
                           // the day frame
    "q_abc_xyz",           // 1-row broadcast month-count scalar riding
                           // the part frame
    "q_term_burstiness",   // 1-row broadcast doc-count scalar riding
                           // the term frame
    "q_rec_coverage",      // 1-row coverage/reach/ILS scalars
                           // crossJoined into the summary row
    "q_matrix_profile",    // calendar-bounded subsequence pair join
                           // (<= ~2.4k^2/2 at any scale — the
                           // q_mann_kendall class)
    "q_rank_sketch",       // k-bounded summary merge (kept-values ×
                           // ≤(k+1)·shards summary range join, ~200×200
                           // at ANY corpus scale) + 4-row rank ladder ×
                           // audit frame + 1-row n/ε/merge scalars
    "q_logrank_test",      // 1-row broadcast horizon + risk-set total
                           // scalars riding the user collapse and the
                           // death-time frame (the q_survival_km class)
    "q_structural_break",  // 1-row broadcast total-moment scalars
                           // riding the day frame + 1-row midpoint-F
                           // crossJoined into the winner row
    "q_aipw_estimator",    // 1-row broadcast horizon + arm-fit + strata
                           // -count scalars riding the user collapse
                           // (the q_propensity_ipw class)
    "q_ljung_box",         // 1-row broadcast global-moment scalars
                           // riding the 7-row lag frame
    "q_block_maxima_evt",  // 1-row fit scalars riding the week frame
                           // (exceedance audit) + 1-row exceed count
    "q_cochran_q",         // 1-row column-margin × row-margin scalar
                           // crossJoin (both 1-row)
    "q_kpss_test",         // 1-row broadcast global-moment scalars
                           // riding the day-frame prefix walk
    "q_runs_test",         // 1-row broadcast n + exact-median scalars
                           // riding the sign walk
    "q_control_chart",     // 1-row broadcast center/limit scalars
                           // riding the week frame
    "q_hurst_exponent",    // 5-row size fan-out × day frame + 1-row
                           // n and slope scalars riding block frames
    "q_dfa_alpha",         // the q_hurst_exponent class: size fan-out
                           // + 1-row profile/slope scalars
    // r12 batch — every entry is the sanctioned 1-row-broadcast
    // scalar class: coefficient/total frames crossJoined back over
    // bounded or linearly-scanned data, never a data×data product
    "q_quantile_reg",      // 1-row IRLS coefficient frames riding the
                           // 7 corpus passes
    "q_breusch_pagan",     // 1-row OLS coefficients riding the aux pass
    "q_mood_median",       // 1-row exact-median + margin totals riding
                           // the counting pass and the k-row table
    "q_weibull_fit",       // 1-row n riding the rank frame
    "q_anderson_darling",  // 1-row n/mean riding the gap frame
    "q_pacf",              // 1-row global moments riding the 4-row lag
                           // frame (the q_ljung_box class)
    "q_prais_winsten",     // 1-row OLS/rho scalars riding the day frame
    "q_newey_west",        // 1-row OLS + S0/omega/sxc scalars riding
                           // the day-frame score series
    "q_hmm_forward",       // 1-row day-mean riding the day frame
    "q_cointegration",     // 1-row OLS coefficients riding the aligned
                           // day frame
    "q_periodogram",       // 1-row mean/sd + 12-row harmonic fan-out
                           // riding the day frame
    "q_turning_points",    // 1-row n riding the extrema count
    "q_kendall_w",         // 1-row k/n scalars riding the day rank sums
    "q_spectral_entropy",  // the q_periodogram class + 1-row
    "q_jonckheere_terpstra", // ≤250-row (5 groups × 50 quantities)
                           // broadcast histogram self-pair + 1-row
                           // moment scalars — bounded by the value
                           // domain, not the corpus
    "q_grubbs_test",       // 1-row broadcast mean/sd scalar riding the
                           // 25-nation frame
    "q_dagostino_k2",      // 1-row broadcast mean scalar riding the
                           // calendar-bounded day frame
    "q_chow_test",         // three 1-row segment/pooled moment frames
                           // crossJoined
    "q_arch_lm",           // 1-row broadcast mean scalar riding the
                           // day frame
    "q_cramer_von_mises",  // two 1-row rank-moment frames crossJoined
    "q_morans_i",          // 1-row broadcast mean scalar riding the
                           // 25-nation frame
    "q_odds_ratio",        // 1-row broadcast exact-median scalar
                           // riding the counting pass
    "q_ansari_bradley",    // 1-row broadcast grand-total (N) scalar
                           // riding the GlobalPrefix rank frame
    "q_somers_d",          // ≤250-row broadcast histogram self-pair
                           // (the q_jonckheere_terpstra class)
    "q_cliffs_delta",      // ≤100-row broadcast histogram pair sum
    "q_mahalanobis_outlier", // 1-row broadcast mean/covariance scalars
                           // riding the day frame
    "q_cramers_v",         // 1-row broadcast n/k/m totals riding the
                           // ≤15-cell contingency grid
    "q_tracking_signal",   // two 1-row extreme/final scalars
                           // crossJoined onto the 1-row counts
    "q_brunner_munzel",    // 1-row broadcast rank-mean scalars riding
                           // the rank frame + 2-row variance combine
    "q_kolmogorov_zurbenko", // 1-row moment + 1-row peak frames
                           // crossJoined onto the day frame
    "q_theil_index",       // 1-row broadcast grand-total scalar riding
                           // the corpus term pass + 1-row combines
    "q_entropy_rate",      // 1-row broadcast transition-total scalar
                           // riding the ≤#types² cell frame
    "q_dhondt_seats",      // 100-row divisor ladder × the 5-region
                           // frame + 1-row total
    "q_borda_count")       // 1-row broadcast block-count scalar riding
                           // the 125-ballot frame
                           // total/entropy/argmax scalars

  test("no unexpected cartesian/nested-loop joins in any query plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val nestedLoop = plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct")
      if (nestedLoop && !allowedNestedLoop(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop/cartesian in: ${offenders.mkString(", ")}")
  }

  test("flagship queries keep their intended physical strategies") {
    // Pin the plan shapes that carry the scale story: selective
    // dimension broadcast, top-n pushed into the sort, rank-limit
    // pushed below the window, and the banded/blocked dedup scans
    // planned as hash equi-joins. A Spark upgrade or query edit that
    // silently degrades one of these fails here, not in a benchmark.
    val expected = Map(
      "q_join_inner" -> Seq("BroadcastHashJoin"),
      "q_sort_limit" -> Seq("TakeOrderedAndProject"),
      "q_topk_per_group" -> Seq("WindowGroupLimit"), // rank filter below the window
      "q_dedup_simhash" -> Seq("BroadcastHashJoin", "HashAggregate"),
      // sorted-neighborhood: ONE window (the block sort) + the
      // neighbor explode, and NO join of any kind — W·N candidates
      // come from lead(), not a pair join
      "q_dedup_levenshtein" -> Seq("Window", "Generate explode"),
      // TPC-H flagships (r5 ask #6): filtered dims broadcast, top-n
      // pushed into the sort, Q18's HAVING survivors semi-joined
      "q_tpch_q1" -> Seq("HashAggregate"),
      "q_tpch_q3" -> Seq("BroadcastHashJoin", "TakeOrderedAndProject"),
      "q_tpch_q5" -> Seq("BroadcastHashJoin"),
      // "PushedFilters: [IsNotNull" (not the bare label, which also
      // matches an EMPTY pushed list): proves the shipdate/discount
      // range predicates actually reach the parquet scan — the NTZ→TS
      // normalization cast in Tables must keep being unwrapped by
      // Catalyst (UnwrapCastInBinaryComparison) for this to hold.
      "q_tpch_q6" -> Seq("HashAggregate", "PushedFilters: [IsNotNull"),
      "q_tpch_q10" -> Seq("BroadcastHashJoin", "TakeOrderedAndProject"),
      "q_tpch_q18" -> Seq("LeftSemi", "TakeOrderedAndProject"),
      // second flagship batch: EXISTS → semi, NOT EXISTS → anti, the
      // outer-join histogram stays outer, and the correlated-average
      // decorrelates to hash joins (never a per-row subquery)
      "q_tpch_q4" -> Seq("LeftSemi"),
      "q_tpch_q13" -> Seq("LeftOuter", "HashAggregate"),
      "q_tpch_q17" -> Seq("HashAggregate"),
      "q_tpch_q19" -> Seq("BroadcastHashJoin"),
      "q_tpch_q22" -> Seq("LeftAnti"),
      // third flagship batch: dual-dim star joins stay broadcast on
      // the filtered dims, Q16's histogram keeps an exact distinct
      // (Expand-based partial), Q20's qualifying keys semi-join back
      "q_tpch_q7" -> Seq("BroadcastHashJoin"),
      "q_tpch_q8" -> Seq("BroadcastHashJoin"),
      "q_tpch_q9" -> Seq("BroadcastHashJoin"),
      "q_tpch_q16" -> Seq("BroadcastHashJoin", "HashAggregate"),
      "q_tpch_q20" -> Seq("LeftSemi", "BroadcastHashJoin"),
      // Q2's per-part min join-back ends in the pushed top-100; Q21
      // keeps both the EXISTS (semi) and NOT EXISTS (anti) as
      // equi-joins with the supplier inequality as a residual
      "q_tpch_q2" -> Seq("TakeOrderedAndProject", "BroadcastHashJoin"),
      "q_tpch_q21" -> Seq("LeftSemi", "LeftAnti", "TakeOrderedAndProject"),
      "q_tpch_q11" -> Seq("BroadcastHashJoin", "HashAggregate"),
      "q_tpch_q12" -> Seq("HashAggregate"))
    val misses = expected.toSeq.sortBy(_._1).flatMap { case (name, markers) =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      markers.filterNot(plan.contains).map(m => s"$name missing $m")
    }
    assert(misses.isEmpty, misses.mkString("; "))
    val levPlan = SparkEntry.queries("q_dedup_levenshtein")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!levPlan.contains("Join"), "q_dedup_levenshtein must be join-free (SNM)")
  }

  test("parquet scans prune columns (no SELECT * reaching the scan)") {
    // Spot-check a projection-heavy query: the lineitem scan must read
    // only the referenced columns.
    val plan = SparkEntry.queries("q_join_inner")(spark, sf)
      .queryExecution.executedPlan.toString
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty)
    // count TOP-LEVEL fields: a naive split(",") would count
    // decimal(12,2) or a nested struct's commas as extra columns
    def topLevelFields(s: String): Int = {
      if (s.isEmpty) return 0
      var depth = 0; var n = 1
      s.foreach {
        case '<' | '(' => depth += 1
        case '>' | ')' => depth -= 1
        case ',' if depth == 0 => n += 1
        case _ => ()
      }
      n
    }
    assert(readSchemas.forall(s => topLevelFields(s) <= 4), readSchemas.mkString("\n"))
  }
}
