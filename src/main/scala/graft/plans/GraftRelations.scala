package graft.plans

import graft.operators.{AsofJoin, Curation, Dedup, RangeJoin, RefOps, SeriesOps, Sessionize, Similarity, SnapshotDiff, TextAnalysis}
import graft.rollup.Rollup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** SQL surface for the WHOLE-RELATION operators (as-of join, interval
  * join, sessionization) — the operators a scalar function registry
  * cannot carry, exposed to SQL-only clients as TABLE functions:
  *
  * {{{
  *   SELECT * FROM asof_join('trades', 'quotes', 'conv_id', 'ts', 'qts')
  *   SELECT * FROM interval_join('events', 'windows', 'conv_id', 'ts',
  *                               'w_start', 'w_end', 3600)
  *   SELECT * FROM sessionize('transcripts', 1800)
  * }}}
  *
  * Mechanics: the injected table function ([[graft.GraftExtensions]])
  * only VALIDATES literals and emits a [[GraftRelationCall]]
  * placeholder — at function-build time the referenced tables are not
  * resolvable, and these operators need the right side's SCHEMA to
  * build their plan (asof's payload struct, interval's column fan).
  * The [[GraftRelationRule]] resolution rule then replaces the
  * placeholder with the SAME Column-API plan the Scala surface builds
  * (table names resolve through the session catalog, temp views
  * included), so SQL and Column clients run identical shapes — one
  * exchange for asof/sessionize, the grid-cell equi-join for interval.
  * Names are passed as string literals because table/column identity
  * is baked into the plan, exactly like the scalar registry's
  * bits/seed literal rule.
  */
final case class GraftRelationCall(fn: String, args: Seq[String]) extends LeafNode {
  override def output: Seq[Attribute] = Nil
  override lazy val resolved: Boolean = false
}

/** Replaces [[GraftRelationCall]] placeholders during resolution. The
  * replacement subplan is built with the Column API over catalog-
  * resolved tables and analyzed as a nested query — it contains no
  * further placeholders, so the rewrite converges in one firing.
  */
final case class GraftRelationRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case GraftRelationCall(fn, args) => build(fn, args)
  }

  private def build(fn: String, args: Seq[String]): LogicalPlan = {
    val df = fn match {
      case "asof_join" =>
        val Seq(l, r, key, lts, rts) = args.take(5)
        val direction = args.lift(5).getOrElse("backward") match {
          case "backward" => AsofJoin.Backward
          case "forward" => AsofJoin.Forward
          case other => throw new IllegalArgumentException(
            s"asof_join: direction must be 'backward' or 'forward', got '$other'")
        }
        AsofJoin.asofJoin(session.table(l), session.table(r), key, lts, rts,
          direction, args.lift(6).map(_.toLong))
      case "interval_join" =>
        val cell = if (args.length == 7) args(6).toLong else 3600L
        val Seq(l, r, key, ts, s, e) = args.take(6)
        RangeJoin.intervalJoin(session.table(l), session.table(r), key, ts, s, e, cell)
      case "sessionize" =>
        val Seq(t, gap) = args
        Sessionize.summarize(session.table(t), gap.toLong)
      case "sliding_rollup" =>
        if (args.length == 3)
          Rollup.sliding(session.table(args(0)), args(1), args(2))
        else Rollup.sliding(session.table(args(0)))
      case "time_weighted_avg" =>
        RefOps.timeWeightedAvg(session.table(args(0)))
      case "rolling_zscore" =>
        if (args.length == 4)
          RefOps.rollingZscore(session.table(args(0)),
            args(1).toInt, args(2).toInt, args(3).toDouble)
        else RefOps.rollingZscore(session.table(args(0)))
      case "drift_corr" =>
        RefOps.lengthDriftCorr(session.table(args(0)))
      case "len_histogram" =>
        if (args.length == 2)
          Rollup.charLenHistogram(session.table(args(0)),
            bucketWidth = args(1).toInt)
        else Rollup.charLenHistogram(session.table(args(0)))
      case "ewma" =>
        if (args.length == 2)
          RefOps.ewma(session.table(args(0)), args(1).toDouble)
        else RefOps.ewma(session.table(args(0)))
      case "cusum_changepoint" =>
        if (args.length == 3)
          RefOps.cusumChangepoint(session.table(args(0)),
            args(1).toLong, args(2).toLong)
        else RefOps.cusumChangepoint(session.table(args(0)))
      case "lag_autocorr" =>
        if (args.length == 2)
          RefOps.lagAutocorr(session.table(args(0)), args(1).toInt)
        else RefOps.lagAutocorr(session.table(args(0)))
      case "mad_outliers" =>
        if (args.length == 2)
          RefOps.madOutliers(session.table(args(0)), args(1).toDouble)
        else RefOps.madOutliers(session.table(args(0)))
      case "turn_gap_stats" =>
        RefOps.turnGapStats(session.table(args(0)))
      case "spearman_drift" =>
        RefOps.spearmanDrift(session.table(args(0)))
      case "holt_smooth" =>
        if (args.length == 3)
          RefOps.holtSmooth(session.table(args(0)),
            args(1).toDouble, args(2).toDouble)
        else RefOps.holtSmooth(session.table(args(0)))
      case "role_runs" =>
        RefOps.roleRuns(session.table(args(0)))
      case "burst_flags" =>
        if (args.length == 3)
          RefOps.burstFlags(session.table(args(0)),
            args(1).toLong, args(2).toLong)
        else RefOps.burstFlags(session.table(args(0)))
      case "tool_diversity" =>
        RefOps.toolDiversity(session.table(args(0)))
      case "tool_transition_diversity" =>
        RefOps.toolTransitionDiversity(session.table(args(0)))
      case "role_transitions" =>
        RefOps.roleTransitions(session.table(args(0)))
      case "tool_vocab_growth" =>
        RefOps.toolVocabGrowth(session.table(args(0)))
      case "hourly_profile" =>
        RefOps.hourlyProfile(session.table(args(0)))
      case "ohlc_candles" =>
        if (args.length == 2)
          SeriesOps.ohlcCandles(session.table(args(0)), args(1).toLong)
        else SeriesOps.ohlcCandles(session.table(args(0)))
      case "daily_deltas" =>
        SeriesOps.dailyDeltas(session.table(args(0)))
      case "gap_report" =>
        if (args.length == 2)
          SeriesOps.gapReport(session.table(args(0)), args(1).toLong)
        else SeriesOps.gapReport(session.table(args(0)))
      case "paa_sax" =>
        if (args.length == 2)
          SeriesOps.paaSax(session.table(args(0)), args(1).toInt)
        else SeriesOps.paaSax(session.table(args(0)))
      case "theilsen_slope" =>
        if (args.length == 2)
          SeriesOps.theilSenSlope(session.table(args(0)), args(1).toInt)
        else SeriesOps.theilSenSlope(session.table(args(0)))
      case "seasonal_residual" =>
        SeriesOps.seasonalResidual(session.table(args(0)))
      case "tool_cooccurrence" =>
        SeriesOps.toolCooccurrence(session.table(args(0)))
      case "heavy_hitters_daily" =>
        if (args.length == 2)
          SeriesOps.heavyHittersDaily(session.table(args(0)), args(1).toInt)
        else SeriesOps.heavyHittersDaily(session.table(args(0)))
      case "response_latency" =>
        SeriesOps.responseLatency(session.table(args(0)))
      case "cohort_retention" =>
        SeriesOps.cohortRetention(session.table(args(0)))
      case "sax_motifs" =>
        if (args.length == 2)
          SeriesOps.saxMotifs(session.table(args(0)), args(1).toInt)
        else SeriesOps.saxMotifs(session.table(args(0)))
      case "conv_lifecycle" =>
        SeriesOps.convLifecycle(session.table(args(0)))
      case "term_topk" =>
        if (args.length == 2)
          SeriesOps.termTopK(session.table(args(0)), args(1).toInt)
        else SeriesOps.termTopK(session.table(args(0)))
      case "term_lift" =>
        if (args.length == 3)
          SeriesOps.termLift(session.table(args(0)), args(1).toInt, args(2).toLong)
        else if (args.length == 2)
          SeriesOps.termLift(session.table(args(0)), args(1).toInt)
        else SeriesOps.termLift(session.table(args(0)))
      case "mann_kendall" =>
        if (args.length == 2)
          SeriesOps.mannKendall(session.table(args(0)), args(1).toInt)
        else SeriesOps.mannKendall(session.table(args(0)))
      case "rescaled_range" =>
        SeriesOps.rescaledRange(session.table(args(0)))
      case "day_activity_rank" =>
        SeriesOps.dayActivityRank(session.table(args(0)))
      case "tool_pair_corr" =>
        SeriesOps.toolPairCorrelation(session.table(args(0)))
      case "binary_split" =>
        SeriesOps.binarySplit(session.table(args(0)))
      case "tool_cadence" =>
        SeriesOps.toolCadence(session.table(args(0)))
      case "term_vocab_growth" =>
        SeriesOps.termVocabGrowth(session.table(args(0)))
      case "daily_cardinality" =>
        SeriesOps.dailyCardinality(session.table(args(0)))
      case "daily_cardinality_approx" =>
        if (args.length == 2)
          SeriesOps.dailyCardinalityApprox(session.table(args(0)), args(1).toDouble)
        else SeriesOps.dailyCardinalityApprox(session.table(args(0)))
      case "daily_autocorr" =>
        if (args.length == 2)
          SeriesOps.dailyAutocorr(session.table(args(0)), args(1).toInt)
        else SeriesOps.dailyAutocorr(session.table(args(0)))
      case "tool_lead_lag" =>
        if (args.length == 2)
          SeriesOps.toolLeadLag(session.table(args(0)), args(1).toInt)
        else SeriesOps.toolLeadLag(session.table(args(0)))
      case "daily_gini" =>
        SeriesOps.dailyGini(session.table(args(0)))
      case "survival_curve" =>
        SeriesOps.survivalCurve(session.table(args(0)))
      case "active_streaks" =>
        SeriesOps.activeStreaks(session.table(args(0)))
      case "new_vs_returning" =>
        SeriesOps.newVsReturning(session.table(args(0)))
      case "tool_adoption" =>
        SeriesOps.toolAdoption(session.table(args(0)))
      case "daily_dup_rate" =>
        SeriesOps.dailyDupRate(session.table(args(0)))
      case "conv_burstiness" =>
        SeriesOps.convBurstiness(session.table(args(0)))
      case "char_half_life" =>
        SeriesOps.charHalfLife(session.table(args(0)))
      case "whale_convs" =>
        if (args.length == 2)
          SeriesOps.whaleConvsDaily(session.table(args(0)), args(1).toInt)
        else SeriesOps.whaleConvsDaily(session.table(args(0)))
      case "conv_concurrency" =>
        SeriesOps.convConcurrency(session.table(args(0)))
      case "toolset_churn" =>
        SeriesOps.toolsetChurn(session.table(args(0)))
      case "record_days" =>
        SeriesOps.recordDays(session.table(args(0)))
      case "lorenz_deciles" =>
        if (args.length == 2)
          SeriesOps.lorenzDeciles(session.table(args(0)), args(1).toInt)
        else SeriesOps.lorenzDeciles(session.table(args(0)))
      case "dist_drift" =>
        SeriesOps.distDrift(session.table(args(0)))
      case "term_churn" =>
        if (args.length == 2)
          SeriesOps.termChurnDaily(session.table(args(0)), args(1).toInt)
        else SeriesOps.termChurnDaily(session.table(args(0)))
      case "type_token_ratio" =>
        SeriesOps.typeTokenRatio(session.table(args(0)))
      case "daily_len_histogram" =>
        SeriesOps.lengthHistogramDaily(session.table(args(0)))
      case "shingle_novelty" =>
        SeriesOps.shingleNoveltyDaily(session.table(args(0)))
      case "dtw_pairs" =>
        if (args.length == 3)
          SeriesOps.dtwPairs(session.table(args(0)), args(1).toInt, args(2).toInt)
        else SeriesOps.dtwPairs(session.table(args(0)))
      case "peak_days" =>
        if (args.length == 2)
          SeriesOps.peakDays(session.table(args(0)), args(1).toInt)
        else SeriesOps.peakDays(session.table(args(0)))
      case "tool_seq_edit" =>
        if (args.length == 2)
          RefOps.toolSeqEdit(session.table(args(0)), args(1).toInt)
        else RefOps.toolSeqEdit(session.table(args(0)))
      case "lttb_downsample" =>
        if (args.length == 2)
          RefOps.lttbDownsample(session.table(args(0)), args(1))
        else RefOps.lttbDownsample(session.table(args(0)))
      case "ooo_skew" =>
        SeriesOps.outOfOrderSkew(session.table(args(0)))
      case "funnel" =>
        SeriesOps.funnel(session.table(args(0)), args.drop(1))
      case "funnel_latency" =>
        SeriesOps.funnelLatency(session.table(args(0)), args.drop(1))
      case "funnel_latency_approx" =>
        SeriesOps.funnelLatencyApprox(session.table(args(0)), args.drop(1))
      case "sample_per_conv" =>
        Curation.samplePerConv(session.table(args(0)), args(1).toInt)
      case "split_census" =>
        if (args.length == 3)
          Curation.stratifiedSplit(session.table(args(0)),
            args(1).toInt, args(2).toInt)
        else Curation.stratifiedSplit(session.table(args(0)))
      case "conv_fingerprint" =>
        Curation.convFingerprint(session.table(args(0)))
      case "tool_paths" =>
        if (args.length == 2)
          Curation.toolPaths(session.table(args(0)), args(1).toInt)
        else Curation.toolPaths(session.table(args(0)))
      case "decontaminate" =>
        if (args.length == 5)
          Dedup.decontaminate(session.table(args(0)), session.table(args(1)),
            args(2).toInt, args(3).toInt, args(4).toDouble)
        else Dedup.decontaminate(session.table(args(0)), session.table(args(1)))
      case "rolling_active" =>
        if (args.length == 2)
          SeriesOps.rollingActiveDaily(session.table(args(0)), args(1).toInt)
        else SeriesOps.rollingActiveDaily(session.table(args(0)))
      case "rolling_active_sketch" =>
        if (args.length == 3)
          SeriesOps.rollingActiveSketchDaily(session.table(args(0)),
            args(1).toInt, args(2).toInt)
        else SeriesOps.rollingActiveSketchDaily(session.table(args(0)))
      case "session_coverage" =>
        if (args.length == 2)
          SeriesOps.sessionCoverageDaily(session.table(args(0)), args(1).toLong)
        else SeriesOps.sessionCoverageDaily(session.table(args(0)))
      case "hampel_outliers" =>
        if (args.length == 3)
          SeriesOps.hampelDaily(session.table(args(0)), args(1).toInt,
            args(2).toDouble)
        else SeriesOps.hampelDaily(session.table(args(0)))
      case "key_coverage" =>
        val Seq(lt, rt, lk, rk) = args.take(4)
        SnapshotDiff.keyCoverage(session.table(lt), session.table(rt), lk, rk)
      case "snapshot_diff" =>
        val Seq(o, n, ks, ms) = args.take(4)
        SnapshotDiff.diff(session.table(o), session.table(n),
          ks.split(",").map(_.trim).toSeq, ms.split(",").map(_.trim).toSeq)
      case "ols_trend" =>
        RefOps.olsTrend(session.table(args(0)))
      case "tier_stitch" =>
        Rollup.stitchRange(session.table(args(0)), args(1), args(2))
      case "tier_stitch_serving" =>
        Rollup.stitchRangeServing(session,
          new graft.table.SnapshotTable(s"${args(1)}/rollup_1m"),
          new graft.table.SnapshotTable(s"${args(1)}/rollup_1h"),
          new graft.table.SnapshotTable(s"${args(1)}/rollup_1d"),
          new graft.state.StateStore(s"${args(1)}/_state"),
          session.table(args(0)), args(2), args(3))
      case "tier_stitch_stored" =>
        // warehouse path baked as a literal, like every table identity
        // on this surface; raw table serves only the sub-minute edges
        Rollup.stitchRangeStored(session,
          new graft.table.SnapshotTable(s"${args(1)}/rollup_1m"),
          new graft.table.SnapshotTable(s"${args(1)}/rollup_1h"),
          new graft.table.SnapshotTable(s"${args(1)}/rollup_1d"),
          session.table(args(0)), args(2), args(3))
      case "daily_checksum" =>
        Curation.corpusChecksumDaily(session.table(args(0)))
      case "corpus_checksum" =>
        Curation.corpusChecksum(session.table(args(0)))
      case "embedding_audit" =>
        Similarity.embeddingAudit(session.table(args(0)))
      case "quality_gate" =>
        if (args.length == 3)
          TextAnalysis.qualityGate(session.table(args(0)),
            minTokens = args(1).toLong, maxTokens = args(2).toLong)
        else TextAnalysis.qualityGate(session.table(args(0)))
      case "minhash_calibration" =>
        if (args.length == 4)
          Dedup.minhashCalibration(session.table(args(0)), args(1).toInt,
            args(2).toInt, args(3).toInt)
        else Dedup.minhashCalibration(session.table(args(0)))
      case "decontaminate_bloom" =>
        if (args.length == 5)
          Dedup.decontaminateBloom(session.table(args(0)), session.table(args(1)),
            args(2).toDouble, args(3).toInt, args(4).toInt)
        else Dedup.decontaminateBloom(session.table(args(0)), session.table(args(1)))
      // the build-once / serve-many artifact lifecycle on the SQL
      // face: bloom_bits builds the one-row bitset (CTAS it into the
      // warehouse), decontaminate_bloom_artifact reads it back instead
      // of re-scanning the benchmark per run
      case "bloom_bits" =>
        if (args.length == 3)
          Dedup.bloomBits(session.table(args(0)), args(1).toInt, args(2).toInt)
        else Dedup.bloomBits(session.table(args(0)))
      case "decontaminate_bloom_artifact" =>
        // the hash count comes from the artifact row itself — a
        // caller-supplied count that disagrees with the build would
        // break the no-false-negative guarantee
        if (args.length == 4)
          Dedup.decontaminateBloomArtifact(session.table(args(0)),
            session.table(args(1)), session.table(args(2)), args(3).toDouble)
        else Dedup.decontaminateBloomArtifact(session.table(args(0)),
          session.table(args(1)), session.table(args(2)))
      case "label_outliers" =>
        if (args.length == 2)
          Similarity.labelOutliers(session.table(args(0)), args(1).toDouble)
        else Similarity.labelOutliers(session.table(args(0)))
      case "multi_granularity" =>
        val tier = args.lift(1).getOrElse("1h") match {
          case "1m" => graft.model.Tier.M1
          case "1h" => graft.model.Tier.H1
          case "1d" => graft.model.Tier.D1
          case other => throw new IllegalArgumentException(
            s"multi_granularity: tier must be 1m/1h/1d, got '$other'")
        }
        Rollup.multiGranularity(session.table(args(0)), tier)
      case "turn_integrity" =>
        Curation.turnIntegrity(session.table(args(0)))
      case "histogram_quantile" =>
        val tier = args.lift(1).getOrElse("1h") match {
          case "1m" => graft.model.Tier.M1
          case "1h" => graft.model.Tier.H1
          case "1d" => graft.model.Tier.D1
          case other => throw new IllegalArgumentException(
            s"histogram_quantile: tier must be 1m/1h/1d, got '$other'")
        }
        if (args.length == 3)
          Rollup.histogramQuantile(session.table(args(0)), tier, args(2).toInt)
        else Rollup.histogramQuantile(session.table(args(0)), tier)
      case "weighted_sample" =>
        Curation.weightedSample(session.table(args(0)), args(1).toInt)
      case "histogram_merge" =>
        val width = if (args.length == 4) args(3).toInt else 50
        Rollup.mergeHistogram(
          Rollup.charLenHistogram(session.table(args(0)),
            graft.model.Tier.byName(args(1)), width),
          graft.model.Tier.byName(args(2)))
      case "term_topk_sketch" =>
        graft.operators.SeriesOps.termTopKSketch(
          session.table(args(0)), args(1).toInt, args(2).toInt)
      case "doc_repetition" =>
        if (args.length == 2)
          TextAnalysis.repetition(session.table(args(0)), args(1).toInt)
        else TextAnalysis.repetition(session.table(args(0)))
      // dedup/ANN PIPELINES (not just their scalar kernels): the
      // flagship chains Column users run as q20/q23/q34/q35/q25/q26+
      // — composed here exactly as SparkEntry composes them, so a
      // spark-sql-only client gets identical plans
      case "dedup_exact" =>
        Dedup.exact(session.table(args(0)))
      case "minhash_pairs" =>
        if (args.length == 4)
          Dedup.minhashLsh(session.table(args(0)), args(1).toInt,
            args(2).toInt, args(3).toDouble)
        else Dedup.minhashLsh(session.table(args(0)))
      case "dedup_clusters" =>
        val docs = session.table(args(0))
        Dedup.components(
          if (args.length == 4)
            Dedup.minhashLsh(docs, args(1).toInt, args(2).toInt, args(3).toDouble)
          else Dedup.minhashLsh(docs))
      case "dedup_corpus" =>
        val docs = session.table(args(0))
        Dedup.dedupByPairs(docs,
          if (args.length == 4)
            Dedup.minhashLsh(docs, args(1).toInt, args(2).toInt, args(3).toDouble)
          else Dedup.minhashLsh(docs))
      case "simhash_pairs" =>
        if (args.length == 3)
          Dedup.simhashPairs(
            Dedup.simhash(session.table(args(0)), args(1).toInt),
            bits = args(1).toInt, maxDist = args(2).toInt)
        else Dedup.simhashPairs(Dedup.simhash(session.table(args(0))))
      case "knn" =>
        val corpus = session.table(args(0))
        val queries = session.table(args(1))
        val k = args(2).toInt
        args.lift(3).getOrElse("brute") match {
          case "brute" =>
            // a 5th arg with brute mode is always a mistake (a typo'd
            // mode or a tunable brute doesn't have) — reject it rather
            // than silently returning exact results for the wrong ask
            require(args.length <= 4,
              s"knn: mode 'brute' takes no param, got '${args(4)}'")
            Similarity.bruteForceTopK(corpus, queries, k)
          case "lsh" => args.lift(4) match {
            case Some(bits) => Similarity.lshTopK(corpus, queries, k, bits = bits.toInt)
            case None => Similarity.lshTopK(corpus, queries, k)
          }
          case "ivf" => args.lift(4) match {
            case Some(nlist) => Similarity.ivfTopK(corpus, queries, k, nlist = nlist.toInt)
            case None => Similarity.ivfTopK(corpus, queries, k)
          }
          case other => throw new IllegalArgumentException(
            s"knn: mode must be 'brute', 'lsh', or 'ivf', got '$other'")
        }
      case "cosine_pairs" =>
        if (args.length == 3)
          Similarity.lshPairsAbove(session.table(args(0)),
            args(1).toDouble, args(2).toInt)
        else Similarity.cosinePairsAbove(session.table(args(0)), args(1).toDouble)
      case other =>
        throw new IllegalStateException(s"unknown graft relation: $other")
    }
    df.queryExecution.analyzed
  }
}
