package graft

import graft.functions.{CosineSim, HyperplaneSig, LangIdText, MinhashSigs, ShingleHash3, SimhashText, Winnow}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the engine's native Catalyst expressions,
  * registered the sanctioned way — `SparkSessionExtensions` via
  * `spark.sql.extensions=graft.GraftExtensions` — so a SQL-only user
  * (BI tool, `spark-sql` shell, JDBC gateway) can run the dedup /
  * similarity / fingerprint pipelines without touching the Scala API:
  *
  * {{{
  *   SELECT a.doc_id, b.doc_id
  *   FROM   docs a JOIN docs b ON simhash64(a.text, 60) = simhash64(b.text, 60)
  *   WHERE  a.doc_id < b.doc_id
  * }}}
  *
  * Every function resolves to the SAME codegen'd expression the Column
  * API uses ([[graft.functions.VectorOps]] / [[graft.functions.TextOps]]),
  * so plans stay inside WholeStageCodegen either way. Tuning
  * parameters (bits, k, w, seed) must be integer literals — they are
  * baked into generated code, mirroring how the Column API takes them
  * as Scala `Int`s, and a per-row variable value would silently break
  * LSH bucketing (signatures from different plane matrices are not
  * comparable).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // whole-relation operators ride as TABLE functions + the rule that
    // expands their placeholder once tables are resolvable — see
    // graft.plans.GraftRelations for the contract
    GraftExtensions.tableFunctions.foreach(ext.injectTableFunction)
    ext.injectResolutionRule(graft.plans.GraftRelationRule)
  }
}

object GraftExtensions {

  /** (identifier, info, builder) triples — shared by the extension
    * class and by tests that assert the catalog surface.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn[CosineSim]("cosine_sim", "(a, b) - cosine similarity of two array<float> embeddings") {
      case Seq(a, b) => CosineSim(a, b)
    },
    fn[HyperplaneSig]("lsh_sig",
      "(vec, bits, seed) - random-hyperplane LSH signature of an array<float> (bits, seed literals)") {
      case Seq(v, bits, seed) =>
        HyperplaneSig(v, intLit("lsh_sig", "bits", bits), longLit("lsh_sig", "seed", seed))
    },
    fn[SimhashText]("simhash64", "(text, bits) - SimHash of a string (bits <= 63, literal)") {
      case Seq(t, bits) => SimhashText(t, intLit("simhash64", "bits", bits))
    },
    fn[ShingleHash3]("shingle_hash3", "(text) - 28-bit hashes of the text's 3-word shingles") {
      case Seq(t) => ShingleHash3(t)
    },
    fn[MinhashSigs]("minhash_sigs",
      "(hashes, k) - k universal-hash minhash values of a shingle-hash array (k literal)") {
      case Seq(h, k) => MinhashSigs(h, intLit("minhash_sigs", "k", k))
    },
    fn[LangIdText]("lang_id", "(text) - heuristic language id (en/fr/es/de/zh/und)") {
      case Seq(t) => LangIdText(t)
    },
    fn[Winnow]("winnow", "(text, k, w) - winnowing fingerprint set (k-gram size, window; literals)") {
      case Seq(t, k, w) =>
        Winnow(t, intLit("winnow", "k", k), intLit("winnow", "w", w))
    })

  /** Table-function surface for the relational operators. Each builder
    * validates arity + literal-ness eagerly (analysis-time errors with
    * the usage string) and emits a [[graft.plans.GraftRelationCall]]
    * placeholder for [[graft.plans.GraftRelationRule]] to expand.
    */
  val tableFunctions: Seq[(FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    tfn("asof_join",
      "(left, right, key, left_ts, right_ts[, direction[, tolerance_seconds]]) - as-of join per key; direction 'backward' (latest at-or-before, default) or 'forward' (earliest at-or-after); tolerance nulls matches staler than the bound",
      arities = Set(5, 6, 7), numericArgs = Set(6)),
    tfn("interval_join",
      "(left, right, key, left_ts, start_col, end_col[, cell_seconds]) - events matched to overlapping intervals",
      arities = Set(6, 7), numericArgs = Set(6)),
    tfn("sessionize",
      "(table, gap_seconds) - per-session summary with gap-based session windows over (conv_id, ts)",
      arities = Set(2), numericArgs = Set(1)),
    tfn("sliding_rollup",
      "(table[, window, slide]) - overlapping hopping-window rollup; window/slide are interval strings like '1 hour' (default 1 hour / 30 minutes)",
      arities = Set(1, 3)),
    tfn("time_weighted_avg",
      "(table) - duration-weighted average turn length per conversation",
      arities = Set(1)),
    tfn("rolling_zscore",
      "(table[, lookback, min_points, threshold]) - trailing-frame z-score outlier flags (defaults 10, 8, 2.0)",
      arities = Set(1, 4), intArgs = Set(1, 2), doubleArgs = Set(3)),
    tfn("drift_corr",
      "(table) - Pearson r between turn position and turn length per conversation",
      arities = Set(1)),
    tfn("len_histogram",
      "(table[, bucket_width]) - per-hour turn-length bucket counts and shares (default width 50)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("ewma",
      "(table[, alpha]) - exponentially-weighted moving average of turn length per conversation (default alpha 0.3)",
      arities = Set(1, 2), doubleArgs = Set(1)),
    tfn("cusum_changepoint",
      "(table[, slack, threshold]) - two-sided CUSUM changepoint flags on turn length vs the conversation mean (defaults 1, 3)",
      arities = Set(1, 3), numericArgs = Set(1, 2)),
    tfn("lag_autocorr",
      "(table[, lag]) - lag-k serial correlation of turn length per conversation (default lag 1)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("mad_outliers",
      "(table[, threshold]) - MAD modified z-score outlier flags on turn length (default cutoff 3.5)",
      arities = Set(1, 2), doubleArgs = Set(1)),
    tfn("turn_gap_stats",
      "(table) - inter-arrival gap distribution per conversation (n, p50, p95, max in microseconds)",
      arities = Set(1)),
    tfn("spearman_drift",
      "(table) - Spearman rank correlation between turn position and turn length per conversation",
      arities = Set(1)),
    tfn("holt_smooth",
      "(table[, alpha, beta]) - Holt level+trend smoothing of turn length with one-step forecast (defaults 0.3, 0.2)",
      arities = Set(1, 3), doubleArgs = Set(1, 2)),
    tfn("role_runs",
      "(table) - run-length encoding of consecutive same-role turns per conversation",
      arities = Set(1)),
    tfn("burst_flags",
      "(table[, window_seconds, min_turns]) - trailing time-window turn counts and burst flags (defaults 300, 5)",
      arities = Set(1, 3), numericArgs = Set(1, 2)),
    tfn("tool_diversity",
      "(table) - Simpson diversity and effective tool count of per-conversation tool usage",
      arities = Set(1)),
    tfn("tool_transition_diversity",
      "(table) - Simpson diversity over consecutive tool-call PAIRS per conversation (order-sensitive sibling of tool_diversity) + dominant transition and share",
      arities = Set(1)),
    tfn("role_transitions",
      "(table) - corpus-level role-to-successor transition counts and row shares",
      arities = Set(1)),
    tfn("tool_vocab_growth",
      "(table) - per-turn running distinct-tool count per conversation",
      arities = Set(1)),
    tfn("hourly_profile",
      "(table) - corpus turn/tool/char volumes by (day-of-week, hour-of-day) in UTC",
      arities = Set(1)),
    tfn("ohlc_candles",
      "(table[, window_seconds]) - open/high/low/close turn-length candles per tumbling window (default 3600)",
      arities = Set(1, 2), numericArgs = Set(1)),
    tfn("daily_deltas",
      "(table) - day-over-day turn-count deltas per conversation vs the previous observed day",
      arities = Set(1)),
    tfn("gap_report",
      "(table[, min_gap_seconds]) - inter-arrival gaps longer than the threshold with bounding turns (default 1800)",
      arities = Set(1, 2), numericArgs = Set(1)),
    tfn("paa_sax",
      "(table[, segments]) - piecewise-aggregate means and 4-letter SAX symbols per conversation (default 8 segments)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("theilsen_slope",
      "(table[, tail_k]) - Theil-Sen robust slope (lower-median of pairwise slopes) over the trailing K turns (default 32)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("seasonal_residual",
      "(table) - corpus hourly turn counts vs their (day-of-week, hour-of-day) baseline with residual and ratio",
      arities = Set(1)),
    tfn("tool_cooccurrence",
      "(table) - unordered tool pairs with shared-conversation reach and Jaccard overlap",
      arities = Set(1)),
    tfn("heavy_hitters_daily",
      "(table[, k]) - top-k tools per UTC day by call count with day share (default 3)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("response_latency",
      "(table) - user-to-assistant answer-time profile per conversation (n, p50, p95, max in microseconds)",
      arities = Set(1)),
    tfn("cohort_retention",
      "(table) - first-active-day cohorts by observed age-day with active counts and retention share",
      arities = Set(1)),
    tfn("sax_motifs",
      "(table[, segments]) - SAX shape-signature census with a deterministic exemplar conversation (default 8 segments)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("conv_lifecycle",
      "(table) - per-conversation lifecycle summary (turns, endpoints, span, active days, intensity)",
      arities = Set(1)),
    tfn("term_topk",
      "(table[, k]) - top-k whitespace tokens by corpus frequency with share of token mass (default 50)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("term_lift",
      "(table[, k[, min_tf]]) - per-conversation distinctive terms by exact-rational frequency lift (default k=5, min_tf=2)",
      arities = Set(1, 2, 3), intArgs = Set(1, 2)),
    tfn("mann_kendall",
      "(table[, tail_k]) - Mann-Kendall monotonic-trend test (S, tau-a, tau-b) over the turn-length tail (default 32)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("rescaled_range",
      "(table) - Hurst-style rescaled-range (R/S) statistic of turn length per conversation",
      arities = Set(1)),
    tfn("day_activity_rank",
      "(table) - per-day competition rank and percentile of each conversation's turn count",
      arities = Set(1)),
    tfn("tool_pair_corr",
      "(table) - Pearson co-movement of tool pairs over zero-filled daily call-count series",
      arities = Set(1)),
    tfn("binary_split",
      "(table) - optimal binary split of the turn-length series (CART step) with segment means and SSE gain",
      arities = Set(1)),
    tfn("tool_cadence",
      "(table) - per-(conversation, tool) call count, endpoints, and inter-call gap quantiles",
      arities = Set(1)),
    tfn("term_vocab_growth",
      "(table) - corpus vocabulary growth by day: tokens, distinct/new terms, running vocabulary",
      arities = Set(1)),
    tfn("daily_cardinality",
      "(table) - exact per-day turn count, distinct conversations, distinct tools",
      arities = Set(1)),
    tfn("daily_cardinality_approx",
      "(table[, rsd]) - HyperLogLog++ per-day cardinality estimates (mergeable sketches; default rsd 0.05)",
      arities = Set(1, 2), doubleArgs = Set(1)),
    tfn("daily_autocorr",
      "(table[, max_lag]) - autocorrelation of the zero-filled daily turn series at lags 1..max_lag (default 14)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("tool_lead_lag",
      "(table[, max_lag]) - directional lead-lag correlation between tool daily series at lags 1..max_lag (default 7)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("daily_gini",
      "(table) - per-day Gini coefficient of turns-per-conversation concentration",
      arities = Set(1)),
    tfn("survival_curve",
      "(table) - conversation survival curve over the turn-count histogram",
      arities = Set(1)),
    tfn("active_streaks",
      "(table) - per-conversation consecutive-active-day streaks (gaps-and-islands)",
      arities = Set(1)),
    tfn("new_vs_returning",
      "(table) - day-grain growth accounting: active, new, returning, cumulative conversations",
      arities = Set(1)),
    tfn("tool_adoption",
      "(table) - per-tool adoption curve: first-time conversations per day and running total",
      arities = Set(1)),
    tfn("daily_dup_rate",
      "(table) - daily exact-duplication monitor over md5 text identity",
      arities = Set(1)),
    tfn("conv_burstiness",
      "(table) - Fano-factor burstiness of each conversation's daily turn series over its span",
      arities = Set(1)),
    tfn("char_half_life",
      "(table) - first turn position where the running character total reaches half the conversation's total",
      arities = Set(1)),
    tfn("whale_convs",
      "(table[, k]) - top-k conversations per day by turn count with day share (default 3)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("conv_concurrency",
      "(table) - sweep-line per-day opened/closed/open conversation counts",
      arities = Set(1)),
    tfn("toolset_churn",
      "(table) - day-over-day toolset kept/added/dropped counts with Jaccard overlap",
      arities = Set(1)),
    tfn("record_days",
      "(table) - record-breaking day census: running high, record count, drought",
      arities = Set(1)),
    tfn("lorenz_deciles",
      "(table[, buckets]) - per-day Lorenz curve: equal-population tiles with cumulative turn share (default 10)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("dist_drift",
      "(table) - day-over-day turn-length distribution drift (bucketed KS + total variation)",
      arities = Set(1)),
    tfn("term_churn",
      "(table[, k]) - daily top-term turnover: kept/added/dropped with Jaccard (default k 50)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("type_token_ratio",
      "(table) - daily lexical diversity: type-token ratio and hapax share",
      arities = Set(1)),
    tfn("daily_len_histogram",
      "(table) - daily digit-bucket turn-length histogram (the drift monitor's census)",
      arities = Set(1)),
    tfn("shingle_novelty",
      "(table) - daily first-seen 3-gram shingle share (corpus freshness monitor)",
      arities = Set(1)),
    tfn("dtw_pairs",
      "(table[, k, max_days]) - DTW distance between the top-k daily-turn-count series over the trailing max_days (defaults 8, 64)",
      arities = Set(1, 3), intArgs = Set(1, 2)),
    tfn("peak_days",
      "(table[, w]) - strict local maxima of each conversation's daily turn series within +-w observed days (default 3)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("tool_seq_edit",
      "(table[, k]) - edit distance between the top-k tool-call sequences (default 8)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("lttb_downsample",
      "(table[, window]) - largest-triangle-three-buckets downsampling of an events table per (user_id, window); window is an interval string (default '1 hour')",
      arities = Set(1, 2)),
    tfn("ooo_skew",
      "(table) - per-day out-of-order skew census vs the conversation high-water mark (the watermark-sizing statistic)",
      arities = Set(1)),
    tfn("funnel",
      "(table, step1[, step2, ... step8]) - ordered funnel conversion: conversations reaching each tool step strictly after the previous one",
      arities = (2 to 9).toSet),
    tfn("funnel_latency",
      "(table, step1, step2[, ... step8]) - exact p50/p95 of each funnel transition's per-conversation latency (percentile buffers the population; see funnel_latency_approx for the bounded-state path)",
      arities = (3 to 9).toSet),
    tfn("funnel_latency_approx",
      "(table, step1, step2[, ... step8]) - Greenwald-Khanna p50/p95 of each funnel transition's latency: O(accuracy) state regardless of converted-conversation count",
      arities = (3 to 9).toSet),
    tfn("sample_per_conv",
      "(table, k) - deterministic md5-permutation sample of up to k turns per conversation",
      arities = Set(2), intArgs = Set(1)),
    tfn("split_census",
      "(table[, train_per_mille, val_per_mille]) - reproducible conv-level train/val/test split census (defaults 800, 100)",
      arities = Set(1, 3), intArgs = Set(1, 2)),
    tfn("conv_fingerprint",
      "(table) - per-conversation md5 digest over texts in canonical turn order",
      arities = Set(1)),
    tfn("tool_paths",
      "(table[, k]) - census of each conversation's first-k tool-call path (default 4)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("decontaminate",
      "(corpus_table, bench_table[, k, bands, threshold]) - corpus docs near-duplicating a benchmark doc (defaults 16, 4, 0.5)",
      arities = Set(2, 5), intArgs = Set(2, 3), doubleArgs = Set(4)),
    tfn("rolling_active",
      "(table[, window_days]) - exact trailing-window distinct active conversations per day (default 7)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("rolling_active_sketch",
      "(table[, window_days, lg_k]) - HLL-sketch rolling distinct actives (mergeable daily artifacts; defaults 7, 12)",
      arities = Set(1, 3), intArgs = Set(1, 2)),
    tfn("session_coverage",
      "(table[, gap_seconds]) - per-day interval-union active time + peak session concurrency (default gap 1800)",
      arities = Set(1, 2), numericArgs = Set(1)),
    tfn("hampel_outliers",
      "(table[, window_days, k]) - rolling median+MAD robust outlier flags on the daily turn series (defaults 7, 3.0)",
      arities = Set(1, 3), intArgs = Set(1), doubleArgs = Set(2)),
    tfn("key_coverage",
      "(left_table, right_table, left_key, right_key) - referential-integrity census: matched keys, orphans both sides, coverage shares",
      arities = Set(4)),
    tfn("snapshot_diff",
      "(old_table, new_table, key_cols, measure_cols) - added/removed/changed keys between two snapshots; key_cols/measure_cols are comma-separated column lists",
      arities = Set(4)),
    tfn("ols_trend",
      "(table) - per-conversation OLS fit of turn length over turn position: slope, intercept, r2",
      arities = Set(1)),
    tfn("daily_checksum",
      "(table) - per-UTC-day parity checksums (rows add up to corpus_checksum; NULL-ts rows keep a NULL day group)",
      arities = Set(1)),
    tfn("corpus_checksum",
      "(table) - order-independent whole-corpus parity checksum (one mergeable scalar row)",
      arities = Set(1)),
    tfn("embedding_audit",
      "(embeddings_table) - per-dimension health stats: quantized mean, min/max, zero count, constant-dim flag",
      arities = Set(1)),
    tfn("quality_gate",
      "(docs_table[, min_tokens, max_tokens]) - Gopher-style keep/drop verdict with boolean reason flags (defaults 10, 100000; ratio thresholds at operator defaults)",
      arities = Set(1, 3), intArgs = Set(1, 2)),
    tfn("minhash_calibration",
      "(docs_table[, k, bands, max_bucket]) - estimated vs exact jaccard per banded candidate pair (defaults 16, 4, 64)",
      arities = Set(1, 4), intArgs = Set(1, 2, 3)),
    tfn("decontaminate_bloom",
      "(corpus_table, bench_table[, threshold, num_bits, num_hashes]) - exact-recall decontamination via a bloom-prescreened all-pairs jaccard (defaults 0.5, 262144, 3)",
      arities = Set(2, 5), doubleArgs = Set(2), intArgs = Set(3, 4)),
    tfn("label_outliers",
      "(table[, threshold]) - embedding outlier flags vs the label's min-id reference vector (default 0.5)",
      arities = Set(1, 2), doubleArgs = Set(1)),
    tfn("multi_granularity",
      "(table[, tier]) - one-scan conv-level + corpus-level rollup via grouping sets; tier one of 1m/1h/1d (default 1h)",
      arities = Set(1, 2)),
    tfn("turn_integrity",
      "(table) - per-conversation (conv_id, turn_idx) identity audit: dups, holes, span",
      arities = Set(1)),
    tfn("histogram_quantile",
      "(table[, tier, bucket_width]) - read-time p50/p95 reconstructed from the mergeable per-window length histogram; tier one of 1m/1h/1d (defaults 1h, 50)",
      arities = Set(1, 3), intArgs = Set(2)),
    tfn("weighted_sample",
      "(table, k) - deterministic weighted sample of k turns, priority ln(u)/w with md5-hash u and weight len(text)+1",
      arities = Set(2), intArgs = Set(1)),
    tfn("histogram_merge",
      "(table, from_tier, to_tier[, bucket_width]) - coarse-tier length histogram computed by MERGING the finer tier's histogram artifacts (counts summed, pct recomputed); identical to computing it from raw",
      arities = Set(3, 4), intArgs = Set(3)),
    tfn("term_topk_sketch",
      "(table, k, capacity) - corpus term top-k via the mergeable Misra-Gries sketch; exact when capacity >= vocabulary, est within N/(capacity+1) below",
      arities = Set(3), intArgs = Set(1, 2)),
    tfn("tier_stitch",
      "(table, from_ts, to_ts) - per-conversation totals over [from_ts, to_ts) answered from the rollup tier ladder (whole days from 1d, edge hours/minutes from 1h/1m, raw only sub-minute); timestamps 'yyyy-MM-dd HH:mm:ss'",
      arities = Set(3)),
    tfn("tier_stitch_stored",
      "(raw_table, warehouse_path, from_ts, to_ts) - tier_stitch served from the warehouse's STORED rollup_1m/1h/1d snapshot tables (manifest-pruned day reads; raw only for sub-minute edges)",
      arities = Set(4)),
    tfn("tier_stitch_serving",
      "(raw_table, warehouse_path, from_ts, to_ts) - REAL-TIME stitch: stored tiers for days the warehouse has CLOSED (per its checkpoints), raw transcripts for the live tail past the serving horizon",
      arities = Set(4)),
    tfn("doc_repetition",
      "(table[, line_tokens]) - Gopher-style within-document repetition metrics: duplicate chunk-line fractions, top-bigram char share, duplicate bigram/trigram position fractions (default line_tokens 2)",
      arities = Set(1, 2), intArgs = Set(1)),
    tfn("dedup_exact",
      "(table) - exact dedup by content hash: one row per distinct text with min-doc_id keeper and duplicate count",
      arities = Set(1)),
    tfn("minhash_pairs",
      "(table[, k, bands, threshold]) - MinHash+LSH candidate pairs verified by exact shingle jaccard >= threshold (defaults k=16 bands=4 threshold=0.7)",
      arities = Set(1, 4), intArgs = Set(1, 2), doubleArgs = Set(3)),
    tfn("dedup_clusters",
      "(table[, k, bands, threshold]) - connected components of the verified minhash-LSH pair graph: (doc_id, component) with the component's min doc_id as keeper label",
      arities = Set(1, 4), intArgs = Set(1, 2), doubleArgs = Set(3)),
    tfn("dedup_corpus",
      "(table[, k, bands, threshold]) - the dedup pipeline's terminal operator: corpus rows minus near-dup non-keepers (LSH pairs -> components -> min-doc_id keeper)",
      arities = Set(1, 4), intArgs = Set(1, 2), doubleArgs = Set(3)),
    tfn("simhash_pairs",
      "(table[, bits, max_dist]) - SimHash near-dup pairs within hamming max_dist via pigeonhole banding (defaults bits=60 max_dist=3)",
      arities = Set(1, 3), intArgs = Set(1, 2)),
    tfn("knn",
      "(corpus, queries, k[, mode, param]) - top-k cosine neighbors per query embedding; mode 'brute' (default, exact), 'lsh' (param = hyperplane bits), 'ivf' (param = nlist)",
      arities = Set(3, 4, 5), intArgs = Set(2, 4)),
    tfn("cosine_pairs",
      "(table, threshold[, bits]) - embedding pairs with cosine >= threshold: exhaustive when bits omitted, hyperplane-bucketed (the scale path) when given",
      arities = Set(2, 3), doubleArgs = Set(1), intArgs = Set(2)),
    tfn("bloom_bits",
      "(benchmark[, num_bits, num_hashes]) - ONE-row dense bloom bitset over the benchmark's shingle hashes; CTAS it as a reusable decontamination artifact (defaults 2^18 bits, 3 hashes)",
      arities = Set(1, 3), intArgs = Set(1, 2)),
    tfn("decontaminate_bloom_artifact",
      "(corpus, benchmark, bloom_table[, threshold]) - exact-recall bloom decontamination using a PREBUILT bloom_bits artifact table instead of rebuilding the bitset per run; the hash count is read from the artifact (default threshold 0.5)",
      arities = Set(3, 4), doubleArgs = Set(3)))

  private def tfn(name: String, usage: String, arities: Set[Int],
      numericArgs: Set[Int] = Set.empty, intArgs: Set[Int] = Set.empty,
      doubleArgs: Set[Int] = Set.empty)
      : (FunctionIdentifier, ExpressionInfo,
         Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = {
    val builder = (args: Seq[Expression]) => {
      if (!arities.contains(args.length))
        throw new IllegalArgumentException(
          s"$name$usage — got ${args.length} argument(s)")
      // validate numeric positions EAGERLY so a malformed tunable is an
      // analysis error carrying the usage string, not a bare
      // NumberFormatException from deep inside the resolution rule.
      // intArgs additionally pins the INT range here — the rule's
      // .toInt on an out-of-range long would be exactly that bare
      // exception
      val strArgs = args.zipWithIndex.map { case (e, i) =>
        if (numericArgs.contains(i)) numLit(name, usage, e).toString
        else if (intArgs.contains(i)) {
          intRange(numLit(name, usage, e), s"$name$usage: integer tunable")
            .toString
        }
        else if (doubleArgs.contains(i)) dblLit(name, usage, e).toString
        else strLit(name, usage, e)
      }
      graft.plans.GraftRelationCall(name, strArgs)
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[graft.plans.GraftRelationCall].getName, name),
      builder)
  }

  /** Table-function name arguments are identifiers baked into the plan —
    * string LITERALS only, same rule as the scalar registry.
    */
  private def strLit(fn: String, usage: String, e: Expression): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn$usage: name arguments must be string literals " +
        s"(they name tables/columns baked into the plan), got ${other.sql}")
  }

  /** Numeric tunables (gap_seconds, cell_seconds, tolerance): an
    * integer literal, or a string literal that parses as one — quoted
    * numerics like `sessionize('t', '1800')` worked before eager
    * validation existed and stay valid. Coercion of the literal forms
    * is SHARED with the scalar registry ([[intLiteralValue]]) so the
    * two tunable surfaces can never drift; only the messages differ.
    */
  private def numLit(fn: String, usage: String, e: Expression): Long = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
      try s.toString.trim.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$fn$usage: expected an integer literal, got '$s'")
      }
    case other => intLiteralValue(other).getOrElse(
      throw new IllegalArgumentException(
        s"$fn$usage: expected an integer literal, got ${other.sql}"))
  }

  /** Floating tunables (alpha, threshold): any numeric literal —
    * double/float/decimal/integer — or a string literal that parses as
    * a double. SQL decimal literals like `0.3` convert via
    * `Decimal.toDouble`, landing on the same IEEE value as the Scala
    * `0.3` default, so quoting is never required for fidelity.
    */
  private def dblLit(fn: String, usage: String, e: Expression): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Float, _) => v.toDouble
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
      try s.toString.trim.toDouble
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$fn$usage: expected a numeric literal, got '$s'")
      }
    case other => intLiteralValue(other).map(_.toDouble).getOrElse(
      throw new IllegalArgumentException(
        s"$fn$usage: expected a numeric literal, got ${other.sql}"))
  }

  private def fn[T <: Expression](name: String, usage: String)(
      build: PartialFunction[Seq[Expression], Expression])(implicit ct: scala.reflect.ClassTag[T])
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val builder = (args: Seq[Expression]) =>
      build.applyOrElse(args, (got: Seq[Expression]) =>
        throw new IllegalArgumentException(
          s"$name$usage — got ${got.length} argument(s)"))
    (FunctionIdentifier(name),
      new ExpressionInfo(ct.runtimeClass.getName, name),
      builder)
  }

  private def intLit(fn: String, arg: String, e: Expression): Int =
    intRange(longLit(fn, arg, e),
      s"$fn: '$arg' must be an integer literal in int range")

  /** The ONE int-range guard both tunable surfaces share — silent
    * .toInt truncation would run the query with a DIFFERENT parameter
    * than written, the exact hazard the literal rule exists to prevent.
    */
  private def intRange(v: Long, onErr: => String): Int = {
    if (v < Int.MinValue || v > Int.MaxValue)
      throw new IllegalArgumentException(s"$onErr (got $v, out of int range)")
    v.toInt
  }

  private def longLit(fn: String, arg: String, e: Expression): Long =
    intLiteralValue(e).getOrElse(
      throw new IllegalArgumentException(
        s"$fn: '$arg' must be an integer literal (it selects the hash family " +
          s"baked into generated code), got ${e.sql}"))

  /** The one shared integer-literal coercion (Byte/Short/Int/Long). */
  private def intLiteralValue(e: Expression): Option[Long] = e match {
    case Literal(v: Byte, _) => Some(v.toLong)
    case Literal(v: Short, _) => Some(v.toLong)
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(v: Long, _) => Some(v)
    case _ => None
  }
}
