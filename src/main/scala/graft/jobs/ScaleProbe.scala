package graft.jobs

import graft.model.Tier
import graft.rollup.Rollup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Operator-level scaling probe: the rollup cascade + block encode over
  * a memory-cached input, with count-only actions — no warehouse
  * writes — so the measurement isolates the ENGINE's compute+shuffle
  * scaling from this sandbox's pathological multi-thread write path
  * (60%+ kernel time from Firecracker demand-paging at 32 writer
  * threads; BENCH/BASELINE.md variance section). Run the same binary at
  * `--master local[8]` and `local[32]` and compare best-rep times.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val input = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().appName("graft-scale-probe")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cores = spark.sparkContext.defaultParallelism

    val raw = spark.read.parquet(input.split(","): _*)
      .filter(col("ts").isNotNull && col("conv_id").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val n = raw.count() // materialize cache (uncounted warm pass)

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // optional third arg: a regex over stage names — a degraded-phase
    // rerun can re-measure just the data-path stages (plus whatever
    // control stages the regex names) without paying the full chain;
    // skipped stages report 0.00s and drop out of the total
    val stageFilter = if (args.length > 2) Some(args(2).r) else None
    // input ts (min, max): the snapdiff cutoff midpoint AND the stitch
    // range endpoints — LAZY so a stage filter skipping both never pays
    // the min/max scan, FORCED here (outside any timed stage) when
    // either will run, so neither stage's rep-1 sample absorbs the scan
    lazy val tsRange = {
      val r = raw.agg(min(col("ts")).cast("long").as("a"),
        max(col("ts")).cast("long").as("b")).head()
      (r.getLong(0), r.getLong(1))
    }
    lazy val tsMid = (tsRange._1 + tsRange._2) / 2
    if (stageFilter.forall(f => f.findFirstIn("snapdiff").isDefined ||
        f.findFirstIn("stitch").isDefined)) tsRange
    def stage(name: String)(body: => Unit): Double =
      if (stageFilter.forall(_.findFirstIn(name).isDefined)) timed(body)
      else 0.0

    // one-time setup for the stored-stitch read stage: materialize the
    // tier warehouse (untimed — it is the deployment artifact whose
    // write cost the durable pairs measure)
    val storedWh: Option[String] =
      if (stageFilter.forall(_.findFirstIn("stitchstored").isDefined) &&
          tsRange._2 - tsRange._1 >= 2 * 3661L + 60L) {
        // PID suffix (overridable): a fixed per-core-count path would
        // collide if two probes with the same core count run at once;
        // /dev/shm is RAM-backed, so callers probing memory-sensitive
        // shapes can redirect via SPARK_GRAFT_STITCH_WH_DIR
        val base = sys.env.getOrElse("SPARK_GRAFT_STITCH_WH_DIR", "/dev/shm")
        // reclaim leftovers from CRASHED probes (their end-of-run
        // delete never ran, and per-PID paths mean no later run reuses
        // them): any sibling dir whose embedded PID is no longer alive
        // is garbage — without this, repeated crashes fill the
        // RAM-backed tmpfs
        val baseDir = new java.io.File(base)
        Option(baseDir.listFiles()).getOrElse(Array.empty).foreach { f =>
          val m = "scale-stitch-wh-\\d+-(\\d+)".r.findFirstMatchIn(f.getName)
          m.map(_.group(1).toLong).foreach { pid =>
            if (ProcessHandle.of(pid).isEmpty)
              org.apache.commons.io.FileUtils.deleteQuietly(f)
          }
        }
        val wh = s"$base/scale-stitch-wh-$cores-${ProcessHandle.current().pid()}"
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(wh))
        new RollupJob(wh).run(spark, raw, s"scale-stitch-$cores")
        Some(wh)
      } else None

    val results = (1 to reps).map { r =>
      val tM1 = stage("rollup_1m")(Rollup.fromRaw(raw, Tier.M1).count())
      val m1 = Rollup.fromRaw(raw, Tier.M1)
      val tCascade = stage("cascade")(
        Rollup.cascade(Rollup.cascade(m1, Tier.H1), Tier.D1).count())
      val tBlocks = stage("blocks")(graft.rollup.BlockRollup.encode(raw, Tier.H1).count())
      // round-3 operators: sessionize (one conv_id exchange), as-of
      // against the 1m state (union-sort form), interval join against
      // the session windows (grid-cell equi-join; its time INCLUDES
      // recomputing the session-summary input — same plan both sides of
      // an N-vs-4N pair, so the ratio stays meaningful)
      val tSess = stage("sessionize")(graft.operators.Sessionize.summarize(raw, 1800L)
        .agg(count(col("duration_sec"))).head())
      val asofRight = m1.select(col("conv_id"), col("window_start"), col("turn_count"))
      // count a PAYLOAD column, not rows: a bare count() lets the
      // optimizer prune the unused `_latest` window column and elide
      // the entire asof computation (measured: 0.5 s for 56M rows —
      // a non-measurement)
      val tAsof = stage("asof")(graft.operators.AsofJoin.asofJoin(
          raw, asofRight, "conv_id", "ts", "window_start")
        .agg(count(col("turn_count_asof"))).head())
      val sess = graft.operators.Sessionize.summarize(raw, 1800L)
      val tInterval = stage("interval")(graft.operators.RangeJoin.intervalJoin(
        raw, sess, "conv_id", "ts", "session_start", "session_end", 3600L).count())
      // round-4 operators, same payload-count idiom: the counted column
      // is one the optimizer cannot produce without the full plan
      val tSliding = stage("sliding")(Rollup.sliding(raw)
        .agg(count(col("char_len_avg"))).head())
      val tTwa = stage("twa")(graft.operators.RefOps.timeWeightedAvg(raw)
        .agg(count(col("twa_char_len"))).head())
      val tZscore = stage("zscore")(graft.operators.RefOps.rollingZscore(raw)
        .agg(count(col("zscore"))).head())
      val tCorr = stage("corr")(graft.operators.RefOps.lengthDriftCorr(raw)
        .agg(count(col("drift_corr"))).head())
      val tHist = stage("hist")(Rollup.charLenHistogram(raw)
        .agg(count(col("pct"))).head())
      val tEwma = stage("ewma")(graft.operators.RefOps.ewma(raw)
        .agg(count(col("ewma_char_len"))).head())
      val tCusum = stage("cusum")(graft.operators.RefOps.cusumChangepoint(raw)
        .agg(count(col("cusum_pos"))).head())
      val tAc = stage("autocorr")(graft.operators.RefOps.lagAutocorr(raw)
        .agg(count(col("autocorr"))).head())
      val tMad = stage("mad")(graft.operators.RefOps.madOutliers(raw)
        .agg(count(col("robust_z"))).head())
      val tGap = stage("gaps")(graft.operators.RefOps.turnGapStats(raw)
        .agg(count(col("gap_p95_us"))).head())
      val tSp = stage("spearman")(graft.operators.RefOps.spearmanDrift(raw)
        .agg(count(col("spearman_corr"))).head())
      val tHolt = stage("holt")(graft.operators.RefOps.holtSmooth(raw)
        .agg(count(col("holt_forecast"))).head())
      val tRuns = stage("roleruns")(graft.operators.RefOps.roleRuns(raw)
        .agg(count(col("char_len_sum"))).head())
      val tBurst = stage("burst")(graft.operators.RefOps.burstFlags(raw)
        .agg(count(col("burst_count"))).head())
      val tDiv = stage("diversity")(graft.operators.RefOps.toolDiversity(raw)
        .agg(count(col("simpson_diversity"))).head())
      val tTrans = stage("transitions")(graft.operators.RefOps.roleTransitions(raw)
        .agg(count(col("share"))).head())
      val tVocab = stage("vocab")(graft.operators.RefOps.toolVocabGrowth(raw)
        .agg(count(col("distinct_tools_so_far"))).head())
      val tProf = stage("profile")(graft.operators.RefOps.hourlyProfile(raw)
        .agg(count(col("char_len_avg"))).head())
      // continuation-batch operators (q63-q72), same payload-count idiom
      val tOhlc = stage("ohlc")(graft.operators.SeriesOps.ohlcCandles(raw)
        .agg(count(col("hl_range"))).head())
      val tDaily = stage("daily")(graft.operators.SeriesOps.dailyDeltas(raw)
        .agg(count(col("pct_change"))).head())
      val tGapRep = stage("gapreport")(graft.operators.SeriesOps.gapReport(raw)
        .agg(count(col("gap_us"))).head())
      val tSax = stage("paasax")(graft.operators.SeriesOps.paaSax(raw)
        .agg(count(col("symbol"))).head())
      val tTheil = stage("theilsen")(graft.operators.SeriesOps.theilSenSlope(raw)
        .agg(count(col("theil_slope"))).head())
      val tSeason = stage("seasonal")(graft.operators.SeriesOps.seasonalResidual(raw)
        .agg(count(col("ratio"))).head())
      val tCooc = stage("cooc")(graft.operators.SeriesOps.toolCooccurrence(raw)
        .agg(count(col("jaccard"))).head())
      val tHh = stage("heavyhitters")(graft.operators.SeriesOps.heavyHittersDaily(raw)
        .agg(count(col("share"))).head())
      val tLat = stage("latency")(graft.operators.SeriesOps.responseLatency(raw)
        .agg(count(col("latency_p95_us"))).head())
      val tCohort = stage("cohort")(graft.operators.SeriesOps.cohortRetention(raw)
        .agg(count(col("retention"))).head())
      // extension-batch operators (q73-q83), same payload-count idiom
      val tMotif = stage("motifs")(graft.operators.SeriesOps.saxMotifs(raw)
        .agg(count(col("exemplar_conv"))).head())
      val tLife = stage("lifecycle")(graft.operators.SeriesOps.convLifecycle(raw)
        .agg(count(col("turns_per_active_day"))).head())
      val tTopk = stage("termtopk")(graft.operators.SeriesOps.termTopK(raw)
        .agg(count(col("share"))).head())
      val tLift = stage("termlift")(graft.operators.SeriesOps.termLift(raw)
        .agg(count(col("lift"))).head())
      val tMk = stage("mannkendall")(graft.operators.SeriesOps.mannKendall(raw)
        .agg(count(col("tau_b"))).head())
      val tRs = stage("rs")(graft.operators.SeriesOps.rescaledRange(raw)
        .agg(count(col("rs_stat"))).head())
      val tRank = stage("dayrank")(graft.operators.SeriesOps.dayActivityRank(raw)
        .agg(count(col("pct"))).head())
      val tPairc = stage("paircorr")(graft.operators.SeriesOps.toolPairCorrelation(raw)
        .agg(count(col("corr"))).head())
      val tSplit = stage("binsplit")(graft.operators.SeriesOps.binarySplit(raw)
        .agg(count(col("sse_gain"))).head())
      val tCad = stage("cadence")(graft.operators.SeriesOps.toolCadence(raw)
        .agg(count(col("gap_p95_us"))).head())
      val tVg = stage("vocabgrowth")(graft.operators.SeriesOps.termVocabGrowth(raw)
        .agg(count(col("cum_vocab"))).head())
      // cardinality pair: exact Expand-dedup vs mergeable HLL++ sketch —
      // the probe's one side-by-side of the same semantics at two
      // shuffle geometries
      val tCard = stage("cardexact")(graft.operators.SeriesOps.dailyCardinality(raw)
        .agg(count(col("distinct_convs"))).head())
      val tCardA = stage("cardsketch")(graft.operators.SeriesOps.dailyCardinalityApprox(raw)
        .agg(count(col("approx_convs"))).head())
      // grid-correlation family. Each persists its census internally;
      // a cacheManager.clearCache() here would also evict the probe's
      // cached raw input, so the censuses stay — reps 2+ are
      // census-warm for these two stages, identically in both the N
      // and 4N configs, which is what the ratio needs
      val tAcf = stage("dailyacf")(graft.operators.SeriesOps.dailyAutocorr(raw)
        .agg(count(col("corr"))).head())
      val tLl = stage("leadlag")(graft.operators.SeriesOps.toolLeadLag(raw)
        .agg(count(col("corr"))).head())
      // growth/concentration/duplication family: the payload column is
      // one the plan cannot produce without the full operator
      val tGini = stage("gini")(graft.operators.SeriesOps.dailyGini(raw)
        .agg(count(col("gini"))).head())
      val tSurv = stage("survival")(graft.operators.SeriesOps.survivalCurve(raw)
        .agg(count(col("survival_frac"))).head())
      val tStreak = stage("streaks")(graft.operators.SeriesOps.activeStreaks(raw)
        .agg(count(col("longest_streak"))).head())
      val tNvr = stage("newvsret")(graft.operators.SeriesOps.newVsReturning(raw)
        .agg(count(col("cum_convs"))).head())
      val tAdopt = stage("adoption")(graft.operators.SeriesOps.toolAdoption(raw)
        .agg(count(col("cum_convs"))).head())
      val tDup = stage("duprate")(graft.operators.SeriesOps.dailyDupRate(raw)
        .agg(count(col("dup_rate"))).head())
      val tFano = stage("fano")(graft.operators.SeriesOps.convBurstiness(raw)
        .agg(count(col("fano"))).head())
      val tHalf = stage("halflife")(graft.operators.SeriesOps.charHalfLife(raw)
        .agg(count(col("half_frac"))).head())
      val tWhale = stage("whales")(graft.operators.SeriesOps.whaleConvsDaily(raw)
        .agg(count(col("share"))).head())
      val tConc = stage("concurrency")(graft.operators.SeriesOps.convConcurrency(raw)
        .agg(count(col("open_convs"))).head())
      val tChurn = stage("churn")(graft.operators.SeriesOps.toolsetChurn(raw)
        .agg(count(col("jaccard"))).head())
      val tRec = stage("records")(graft.operators.SeriesOps.recordDays(raw)
        .agg(count(col("days_since_record"))).head())
      val tLor = stage("lorenz")(graft.operators.SeriesOps.lorenzDeciles(raw)
        .agg(count(col("cum_share"))).head())
      val tDrift = stage("drift")(graft.operators.SeriesOps.distDrift(raw)
        .agg(count(col("tv_dist"))).head())
      val tTermChurn = stage("termchurn")(graft.operators.SeriesOps.termChurnDaily(raw)
        .agg(count(col("jaccard"))).head())
      val tTtr = stage("ttr")(graft.operators.SeriesOps.typeTokenRatio(raw)
        .agg(count(col("ttr"))).head())
      val tNov = stage("novelty")(graft.operators.SeriesOps.shingleNoveltyDaily(raw)
        .agg(count(col("novelty_rate"))).head())
      // sequence-similarity + downsampling family (q106-q109). lttb
      // wants the events shape — derive one from the cached input
      // (hash-keyed, value = char length) so the probe measures the
      // operator's census/argmax plan, not a second parquet scan
      val tDtw = stage("dtw")(graft.operators.SeriesOps.dtwPairs(raw)
        .agg(count(col("dtw"))).head())
      val tPeaks = stage("peaks")(graft.operators.SeriesOps.peakDays(raw)
        .agg(count(col("prominence"))).head())
      val tSeqEdit = stage("seqedit")(graft.operators.RefOps.toolSeqEdit(raw)
        .agg(count(col("edit_dist"))).head())
      val tOoo = stage("ooo")(graft.operators.SeriesOps.outOfOrderSkew(raw)
        .agg(count(col("late_share"))).head())
      val tFunnel = stage("funnel")(graft.operators.SeriesOps.funnel(raw,
        Seq("search", "browse", "code")).agg(count(col("convs"))).head())
      val evShaped = raw.select(
        pmod(hash(col("conv_id")), lit(997)).cast("long").as("user_id"),
        hash(col("conv_id"), col("turn_idx")).cast("long").as("event_id"),
        col("ts"), length(col("text")).cast("double").as("value"))
      val tLttb = stage("lttb")(graft.operators.RefOps.lttbDownsample(evShaped)
        .agg(count(col("event_id"))).head())
      // curation family: the sample counts a passthrough payload column
      // (text) so the md5 window cannot be pruned; the fingerprint and
      // paths count their aggregate outputs
      val tSample = stage("sample")(graft.operators.Curation
        .samplePerConv(raw, 5).agg(count(col("text"))).head())
      val tSplitc = stage("splitcensus")(graft.operators.Curation
        .stratifiedSplit(raw).agg(count(col("char_sum"))).head())
      val tFp = stage("fingerprint")(graft.operators.Curation
        .convFingerprint(raw).agg(count(col("digest"))).head())
      val tPaths = stage("toolpaths")(graft.operators.Curation
        .toolPaths(raw).agg(count(col("share"))).head())
      val tMg = stage("multigran")(Rollup.multiGranularity(raw, Tier.H1)
        .agg(count(col("char_len_sum"))).head())
      val tTi = stage("integrity")(graft.operators.Curation
        .turnIntegrity(raw).agg(count(col("missing_turns"))).head())
      val tHq = stage("histquant")(Rollup.histogramQuantile(raw, Tier.H1)
        .agg(count(col("hq_p95"))).head())
      val tWs = stage("wsample")(graft.operators.Curation
        .weightedSample(raw, 200).agg(count(col("weight"))).head())
      // histmerge times the MERGE's own cost: its input histogram is
      // recomputed inside the stage (same plan at both core counts, so
      // the N-vs-4N ratio stays meaningful — the interval-join idiom)
      val tHm = stage("histmerge")(Rollup.mergeHistogram(
          Rollup.charLenHistogram(raw, Tier.M1), Tier.H1)
        .agg(count(col("pct"))).head())
      // sub-exhaustive capacity: the real sketch regime (trims fire)
      val tMgs = stage("mgsketch")(graft.operators.SeriesOps
        .termTopKSketch(raw, 50, 4096).agg(count(col("share"))).head())
      // snapshot diff: old = rollup over the input's first half (ts
      // midpoint), new = full rollup — the histmerge idiom: both
      // rollups recompute inside the stage, same plan at both core
      // counts, so the N-vs-4N ratio stays meaningful
      val tSd = stage("snapdiff") {
        val selD = Seq("conv_id", "window_start", "turn_count",
          "char_len_sum").map(col)
        graft.operators.SnapshotDiff.diff(
          Rollup.fromRaw(raw.filter(col("ts") < lit(tsMid).cast("timestamp")),
            Tier.H1).select(selD: _*),
          Rollup.fromRaw(raw, Tier.H1).select(selD: _*),
          keys = Seq("conv_id", "window_start"),
          measures = Seq("turn_count", "char_len_sum"))
          .agg(count(col("status"))).head()
      }
      val tHamp = stage("hampel")(graft.operators.SeriesOps
        .hampelDaily(raw).agg(count(col("mad"))).head())
      val tCov = stage("coverage")(graft.operators.SeriesOps
        .sessionCoverageDaily(raw).agg(count(col("covered_us"))).head())
      val tWau = stage("wauexact")(graft.operators.SeriesOps
        .rollingActiveDaily(raw).agg(count(col("rolling_active"))).head())
      val tWauS = stage("wausketch")(graft.operators.SeriesOps
        .rollingActiveSketchDaily(raw).agg(count(col("rolling_active_est"))).head())
      // tier-stitch range query over a deliberately RAGGED span (±1h1m1s
      // off the input's endpoints so every ladder level is exercised).
      // Each rep pays the FULL recompute-mode cost: the internal m1/h1
      // localCheckpoints are per-call (they free with the frame — no
      // cross-rep cache), so the measured time = tier build + stitched
      // read, the same plan both sides of an N-vs-4N pair. Skipped
      // (0.00s) when the input spans < 2×(1h1m1s)+1m — a smoke input
      // has no ladder to exercise and an inverted range would throw.
      // Payload = first_text so the min_by merge cannot be pruned.
      val fmtS = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")
      def at(s: Long) = java.time.LocalDateTime
        .ofEpochSecond(s, 0, java.time.ZoneOffset.UTC).format(fmtS)
      val tStitch =
        if (stageFilter.forall(_.findFirstIn("stitch").isDefined) &&
            tsRange._2 - tsRange._1 < 2 * 3661L + 60L) 0.0
        else stage("stitch") {
        Rollup.stitchRange(raw, at(tsRange._1 + 3661L), at(tsRange._2 - 3661L))
          .agg(count(col("first_text"))).head()
      }
      // the q141 READ path over the same ragged span: stored-tier
      // manifest-pruned reads + sub-minute raw edges. The warehouse
      // build is ONE-TIME setup before the reps loop (the write side
      // RollupMain's durable pairs already measure) — only the read is
      // timed, so the
      // N-vs-4N ratio isolates exactly what a deployment pays per
      // range query against materialized tiers.
      val tStitchStored = storedWh match {
        case Some(wh) => stage("stitchstored") {
          Rollup.stitchRangeStored(spark,
            new graft.table.SnapshotTable(s"$wh/rollup_1m"),
            new graft.table.SnapshotTable(s"$wh/rollup_1h"),
            new graft.table.SnapshotTable(s"$wh/rollup_1d"),
            raw, at(tsRange._1 + 3661L), at(tsRange._2 - 3661L))
            .agg(count(col("first_text"))).head()
        }
        case None => 0.0
      }
      val total = tStitch + tStitchStored + tWau + tWauS + tCov + tHamp + tSd + tHm + tMgs + tHq + tWs + tM1 + tCascade + tBlocks + tSess + tAsof + tInterval +
        tSliding + tTwa + tZscore + tCorr + tHist + tEwma + tCusum + tAc +
        tMad + tGap + tSp + tHolt + tRuns + tBurst + tDiv + tTrans +
        tVocab + tProf + tOhlc + tDaily + tGapRep + tSax + tTheil +
        tSeason + tCooc + tHh + tLat + tCohort + tMotif + tLife + tTopk +
        tLift + tMk + tRs + tRank + tPairc + tSplit + tCad + tVg +
        tCard + tCardA + tAcf + tLl + tGini + tSurv + tStreak + tNvr +
        tAdopt + tDup + tFano + tHalf + tWhale + tConc + tChurn + tRec +
        tLor + tDrift + tTermChurn + tTtr + tNov +
        tDtw + tPeaks + tSeqEdit + tLttb + tOoo + tFunnel +
        tSample + tSplitc + tFp + tPaths + tMg + tTi
      println(f"[scale-probe] rep=$r cores=$cores turns=$n rollup_1m=$tM1%.2fs " +
        f"cascade=$tCascade%.2fs blocks=$tBlocks%.2fs sessionize=$tSess%.2fs " +
        f"asof=$tAsof%.2fs interval=$tInterval%.2fs sliding=$tSliding%.2fs " +
        f"twa=$tTwa%.2fs zscore=$tZscore%.2fs corr=$tCorr%.2fs hist=$tHist%.2fs " +
        f"ewma=$tEwma%.2fs cusum=$tCusum%.2fs autocorr=$tAc%.2fs mad=$tMad%.2fs " +
        f"gaps=$tGap%.2fs spearman=$tSp%.2fs holt=$tHolt%.2fs " +
        f"roleruns=$tRuns%.2fs burst=$tBurst%.2fs diversity=$tDiv%.2fs " +
        f"transitions=$tTrans%.2fs vocab=$tVocab%.2fs profile=$tProf%.2fs " +
        f"ohlc=$tOhlc%.2fs daily=$tDaily%.2fs gapreport=$tGapRep%.2fs " +
        f"paasax=$tSax%.2fs theilsen=$tTheil%.2fs seasonal=$tSeason%.2fs " +
        f"cooc=$tCooc%.2fs heavyhitters=$tHh%.2fs latency=$tLat%.2fs " +
        f"cohort=$tCohort%.2fs motifs=$tMotif%.2fs lifecycle=$tLife%.2fs " +
        f"termtopk=$tTopk%.2fs termlift=$tLift%.2fs mannkendall=$tMk%.2fs " +
        f"rs=$tRs%.2fs dayrank=$tRank%.2fs paircorr=$tPairc%.2fs " +
        f"binsplit=$tSplit%.2fs cadence=$tCad%.2fs vocabgrowth=$tVg%.2fs " +
        f"cardexact=$tCard%.2fs cardsketch=$tCardA%.2fs " +
        f"dailyacf=$tAcf%.2fs leadlag=$tLl%.2fs " +
        f"gini=$tGini%.2fs survival=$tSurv%.2fs streaks=$tStreak%.2fs " +
        f"newvsret=$tNvr%.2fs adoption=$tAdopt%.2fs duprate=$tDup%.2fs " +
        f"fano=$tFano%.2fs halflife=$tHalf%.2fs whales=$tWhale%.2fs " +
        f"concurrency=$tConc%.2fs churn=$tChurn%.2fs records=$tRec%.2fs " +
        f"lorenz=$tLor%.2fs drift=$tDrift%.2fs " +
        f"termchurn=$tTermChurn%.2fs ttr=$tTtr%.2fs novelty=$tNov%.2fs " +
        f"dtw=$tDtw%.2fs peaks=$tPeaks%.2fs seqedit=$tSeqEdit%.2fs " +
        f"lttb=$tLttb%.2fs ooo=$tOoo%.2fs funnel=$tFunnel%.2fs " +
        f"sample=$tSample%.2fs splitcensus=$tSplitc%.2fs " +
        f"fingerprint=$tFp%.2fs toolpaths=$tPaths%.2fs " +
        f"multigran=$tMg%.2fs integrity=$tTi%.2fs " +
        f"histquant=$tHq%.2fs wsample=$tWs%.2fs " +
        f"histmerge=$tHm%.2fs mgsketch=$tMgs%.2fs snapdiff=$tSd%.2fs " +
        f"hampel=$tHamp%.2fs coverage=$tCov%.2fs " +
        f"wauexact=$tWau%.2fs wausketch=$tWauS%.2fs stitch=$tStitch%.2fs " +
        f"stitchstored=$tStitchStored%.2fs " +
        f"total=$total%.2fs " +
        (if (tM1 > 0) f"throughput=${n / tM1}%.0f turns/s" else "throughput=n/a"))
      total
    }
    storedWh.foreach(wh =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(wh)))
    println(f"[scale-probe] BEST cores=$cores total=${results.min}%.2fs " +
      (if (results.min > 0) f"chain_throughput=${n / results.min}%.0f turns/s"
       else "chain_throughput=n/a"))
    spark.stop()
  }
}
