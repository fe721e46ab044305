package graft

import graft.functions.{TextOps, VectorOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SQL function surface registered via `spark.sql.extensions`
  * (`graft.GraftExtensions`): each SQL function must resolve to the
  * SAME expression the Column API builds, literal-parameter misuse
  * must fail at analysis, and the catalog must list the functions.
  */
class GraftExtensionsSpec extends SparkTestBase {

  /** A second session on the SHARED SparkContext with the extensions
    * installed (the base suite's session must stay extension-free to
    * prove the Column API needs no registration). `spark.sql.extensions`
    * is a STATIC conf consumed at SparkContext creation, which this
    * JVM's shared context predates — so the spec replays the exact
    * startup path by hand: resolve the class by NAME, zero-arg
    * instantiate, apply (what `applyExtensions` does), via the
    * builder's `withExtensions`. Active/default are restored so other
    * suites' `getOrCreate` still binds the plain session.
    */
  lazy val ext: SparkSession = {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val byName = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    val s = org.apache.spark.sql.classic.SparkSession.builder()
      .master("local[8]")
      .appName("graft-ext-test")
      .withExtensions(byName)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(orig)
    SparkSession.setActiveSession(orig)
    s
  }

  test("catalog lists every injected function") {
    val names = GraftExtensions.functions.map(_._1.funcName).toSet
    val listed = ext.catalog.listFunctions().collect().map(_.name).toSet
    val missing = names -- listed
    assert(missing.isEmpty, s"not in catalog: $missing")
  }

  test("cosine_sim in SQL == CosineSim via Column API") {
    val emb = graft.ingest.Synth.embeddings(ext, 200, dims = 32)
    emb.createOrReplaceTempView("emb_ext")
    val viaSql = ext.sql(
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       cosine_sim(a.embedding, b.embedding) AS sim
        |FROM emb_ext a JOIN emb_ext b ON a.vec_id + 2 = b.vec_id
        |WHERE b.vec_id % 10 = 9""".stripMargin)
    val viaCol = {
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
      a.join(b, col("id_a") + 2 === col("id_b") && col("id_b") % 10 === 9)
        .select(col("id_a"), col("id_b"),
          VectorOps.cosineSim(col("ea"), col("eb")).as("sim"))
    }
    assertSameRows(viaSql, viaCol)
    // injected near-pairs really are near — the values are live, not null
    val sims = viaSql.select("sim").collect().map(_.getDouble(0))
    assert(sims.nonEmpty && sims.forall(_ > 0.9), s"expected near-dup sims, got ${sims.take(3).mkString(",")}")
  }

  test("text functions in SQL == Column API (simhash64, shingle_hash3, minhash_sigs, winnow, lsh_sig)") {
    val docs = graft.ingest.Synth.documents(ext, 100)
    docs.createOrReplaceTempView("docs_ext")
    val viaSql = ext.sql(
      """SELECT doc_id,
        |       simhash64(text, 60)                      AS sh,
        |       winnow(text, 8, 4)                       AS fp,
        |       minhash_sigs(shingle_hash3(text), 16)    AS mh
        |FROM docs_ext""".stripMargin)
    val viaCol = docs.select(col("doc_id"),
      TextOps.simhash(col("text"), 60).as("sh"),
      TextOps.fingerprint(col("text"), 8, 4).as("fp"),
      TextOps.minhash(TextOps.shingleHashes3(col("text")), 16).as("mh"))
    assertSameRows(viaSql, viaCol)

    val emb = graft.ingest.Synth.embeddings(ext, 50, dims = 16)
    emb.createOrReplaceTempView("emb_sig_ext")
    val sigSql = ext.sql("SELECT vec_id, lsh_sig(embedding, 20, 7) AS sig FROM emb_sig_ext")
    val sigCol = emb.select(col("vec_id"),
      VectorOps.lshSig(col("embedding"), 20, 7L).as("sig"))
    assertSameRows(sigSql, sigCol)

    val langSql = ext.sql("SELECT doc_id, lang_id(text) AS lang FROM docs_ext")
    val langCol = docs.select(col("doc_id"),
      graft.functions.LangId.col(col("text")).as("lang"))
    assertSameRows(langSql, langCol)
  }

  test("relational table functions in SQL == Column API (asof_join, interval_join, sessionize)") {
    val tr = graft.ingest.Synth.transcripts(ext, 5, 30, 7L).toDF()
    tr.createOrReplaceTempView("tr_ext")
    val sess = graft.operators.Sessionize.summarize(tr, 1800L)
    sess.createOrReplaceTempView("sess_ext")

    // sessionize: summary via SQL == summary via Column API
    assertSameRows(ext.sql("SELECT * FROM sessionize('tr_ext', 1800)"), sess)

    // asof: each turn matched to the latest session_start at or before
    // it (session starts are unique per conv — the asof contract)
    val right = sess.select(col("conv_id"), col("session_idx"), col("session_start"))
    right.createOrReplaceTempView("starts_ext")
    assertSameRows(
      ext.sql("SELECT * FROM asof_join('tr_ext', 'starts_ext', 'conv_id', 'ts', 'session_start')"),
      graft.operators.AsofJoin.asofJoin(tr, right, "conv_id", "ts", "session_start"))
    // the direction + tolerance axes ride through the SQL surface too
    assertSameRows(
      ext.sql("SELECT * FROM asof_join('tr_ext', 'starts_ext', 'conv_id', 'ts', " +
        "'session_start', 'forward', 3600)"),
      graft.operators.AsofJoin.asofJoin(tr, right, "conv_id", "ts", "session_start",
        graft.operators.AsofJoin.Forward, Some(3600L)))
    val dir = intercept[Exception] {
      ext.sql("SELECT * FROM asof_join('tr_ext', 'starts_ext', 'conv_id', 'ts', " +
        "'session_start', 'sideways')").collect()
    }
    assert(dir.getMessage.contains("backward"), dir.getMessage)

    // interval: turns matched to their session window (the q36 shape),
    // including the explicit cell_seconds knob
    assertSameRows(
      ext.sql("SELECT * FROM interval_join('tr_ext', 'sess_ext', 'conv_id', 'ts', " +
        "'session_start', 'session_end', 600)"),
      graft.operators.RangeJoin.intervalJoin(tr, sess, "conv_id", "ts",
        "session_start", "session_end", 600L))

    // non-literal argument fails analysis with the literal rule message
    val e = intercept[Exception] {
      ext.sql("SELECT * FROM sessionize('tr_ext', CAST(rand()*10 AS INT))").collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
    // quoted numerics stay valid (they predate eager validation)
    assertSameRows(ext.sql("SELECT * FROM sessionize('tr_ext', '1800')"), sess)
    // a malformed NUMERIC tunable is an analysis error carrying the
    // usage string, not a bare NumberFormatException from the rule
    val n = intercept[Exception] {
      ext.sql("SELECT * FROM sessionize('tr_ext', '18x0')").collect()
    }
    assert(n.getMessage.contains("gap_seconds") && n.getMessage.contains("literal"),
      n.getMessage)
    val n2 = intercept[Exception] {
      ext.sql("SELECT * FROM interval_join('tr_ext', 'sess_ext', 'conv_id', 'ts', " +
        "'session_start', 'session_end', '1h')").collect()
    }
    assert(n2.getMessage.contains("cell_seconds"), n2.getMessage)
    // wrong arity points at the usage string
    val a = intercept[Exception] {
      ext.sql("SELECT * FROM asof_join('tr_ext', 'starts_ext')").collect()
    }
    assert(a.getMessage.contains("argument"), a.getMessage)
    // the base session does not see the table functions
    intercept[Exception] {
      spark.sql("SELECT * FROM sessionize('tr_ext', 1800)").collect()
    }
  }

  test("round-4 table functions in SQL == Column API (sliding_rollup, twa, zscore, corr, histogram, ewma)") {
    val tr = graft.ingest.Synth.transcripts(ext, 5, 30, 11L).toDF()
    tr.createOrReplaceTempView("tr4_ext")
    assertSameRows(ext.sql("SELECT * FROM sliding_rollup('tr4_ext')"),
      graft.rollup.Rollup.sliding(tr))
    assertSameRows(ext.sql("SELECT * FROM sliding_rollup('tr4_ext', '2 hours', '1 hour')"),
      graft.rollup.Rollup.sliding(tr, "2 hours", "1 hour"))
    assertSameRows(ext.sql("SELECT * FROM time_weighted_avg('tr4_ext')"),
      graft.operators.RefOps.timeWeightedAvg(tr))
    assertSameRows(ext.sql("SELECT * FROM rolling_zscore('tr4_ext')"),
      graft.operators.RefOps.rollingZscore(tr))
    assertSameRows(ext.sql("SELECT * FROM rolling_zscore('tr4_ext', 20, 10, 1.5)"),
      graft.operators.RefOps.rollingZscore(tr, lookback = 20, minPoints = 10, threshold = 1.5))
    assertSameRows(ext.sql("SELECT * FROM drift_corr('tr4_ext')"),
      graft.operators.RefOps.lengthDriftCorr(tr))
    assertSameRows(ext.sql("SELECT * FROM len_histogram('tr4_ext', 25)"),
      graft.rollup.Rollup.charLenHistogram(tr, bucketWidth = 25))
    // double tunables: SQL decimal literal 0.5 must land on the same
    // IEEE double as the Scala literal
    assertSameRows(ext.sql("SELECT * FROM ewma('tr4_ext', 0.5)"),
      graft.operators.RefOps.ewma(tr, alpha = 0.5))
    assertSameRows(ext.sql("SELECT * FROM ewma('tr4_ext')"),
      graft.operators.RefOps.ewma(tr))
    assertSameRows(ext.sql("SELECT * FROM cusum_changepoint('tr4_ext')"),
      graft.operators.RefOps.cusumChangepoint(tr))
    assertSameRows(ext.sql("SELECT * FROM cusum_changepoint('tr4_ext', 0, 5)"),
      graft.operators.RefOps.cusumChangepoint(tr, slack = 0L, threshold = 5L))
    // operator-level require() surfaces through the SQL path
    val cb = intercept[Exception] {
      ext.sql("SELECT * FROM cusum_changepoint('tr4_ext', -1, 3)").collect()
    }
    // assert the require's distinctive text, not just "slack" — the
    // tfn usage string also contains "slack", which would satisfy a
    // bare contains() even for an analysis-layer arity/literal error
    assert(cb.getMessage.contains("slack must be in"), cb.getMessage)
    assertSameRows(ext.sql("SELECT * FROM lag_autocorr('tr4_ext')"),
      graft.operators.RefOps.lagAutocorr(tr))
    assertSameRows(ext.sql("SELECT * FROM lag_autocorr('tr4_ext', 2)"),
      graft.operators.RefOps.lagAutocorr(tr, lagK = 2))
    assertSameRows(ext.sql("SELECT * FROM mad_outliers('tr4_ext')"),
      graft.operators.RefOps.madOutliers(tr))
    assertSameRows(ext.sql("SELECT * FROM mad_outliers('tr4_ext', 2.5)"),
      graft.operators.RefOps.madOutliers(tr, threshold = 2.5))
    assertSameRows(ext.sql("SELECT * FROM turn_gap_stats('tr4_ext')"),
      graft.operators.RefOps.turnGapStats(tr))
    assertSameRows(ext.sql("SELECT * FROM spearman_drift('tr4_ext')"),
      graft.operators.RefOps.spearmanDrift(tr))
    assertSameRows(ext.sql("SELECT * FROM holt_smooth('tr4_ext')"),
      graft.operators.RefOps.holtSmooth(tr))
    assertSameRows(ext.sql("SELECT * FROM holt_smooth('tr4_ext', 0.5, 0.4)"),
      graft.operators.RefOps.holtSmooth(tr, alpha = 0.5, beta = 0.4))
    assertSameRows(ext.sql("SELECT * FROM role_runs('tr4_ext')"),
      graft.operators.RefOps.roleRuns(tr))
    assertSameRows(ext.sql("SELECT * FROM burst_flags('tr4_ext')"),
      graft.operators.RefOps.burstFlags(tr))
    assertSameRows(ext.sql("SELECT * FROM burst_flags('tr4_ext', 600, 3)"),
      graft.operators.RefOps.burstFlags(tr, windowSeconds = 600L, minTurns = 3L))
    val bb = intercept[Exception] {
      ext.sql("SELECT * FROM burst_flags('tr4_ext', 0, 3)").collect()
    }
    assert(bb.getMessage.contains("windowSeconds must be in"), bb.getMessage)
    assertSameRows(ext.sql("SELECT * FROM tool_diversity('tr4_ext')"),
      graft.operators.RefOps.toolDiversity(tr))
    assertSameRows(ext.sql("SELECT * FROM role_transitions('tr4_ext')"),
      graft.operators.RefOps.roleTransitions(tr))
    assertSameRows(ext.sql("SELECT * FROM tool_vocab_growth('tr4_ext')"),
      graft.operators.RefOps.toolVocabGrowth(tr))
    assertSameRows(ext.sql("SELECT * FROM hourly_profile('tr4_ext')"),
      graft.operators.RefOps.hourlyProfile(tr))
    assertSameRows(ext.sql("SELECT * FROM ohlc_candles('tr4_ext')"),
      graft.operators.SeriesOps.ohlcCandles(tr))
    assertSameRows(ext.sql("SELECT * FROM ohlc_candles('tr4_ext', 900)"),
      graft.operators.SeriesOps.ohlcCandles(tr, windowSeconds = 900L))
    assertSameRows(ext.sql("SELECT * FROM daily_deltas('tr4_ext')"),
      graft.operators.SeriesOps.dailyDeltas(tr))
    assertSameRows(ext.sql("SELECT * FROM gap_report('tr4_ext')"),
      graft.operators.SeriesOps.gapReport(tr))
    assertSameRows(ext.sql("SELECT * FROM gap_report('tr4_ext', 600)"),
      graft.operators.SeriesOps.gapReport(tr, minGapSeconds = 600L))
    assertSameRows(ext.sql("SELECT * FROM paa_sax('tr4_ext')"),
      graft.operators.SeriesOps.paaSax(tr))
    assertSameRows(ext.sql("SELECT * FROM paa_sax('tr4_ext', 4)"),
      graft.operators.SeriesOps.paaSax(tr, segments = 4))
    assertSameRows(ext.sql("SELECT * FROM theilsen_slope('tr4_ext')"),
      graft.operators.SeriesOps.theilSenSlope(tr))
    assertSameRows(ext.sql("SELECT * FROM theilsen_slope('tr4_ext', 8)"),
      graft.operators.SeriesOps.theilSenSlope(tr, tailK = 8))
    assertSameRows(ext.sql("SELECT * FROM seasonal_residual('tr4_ext')"),
      graft.operators.SeriesOps.seasonalResidual(tr))
    assertSameRows(ext.sql("SELECT * FROM tool_cooccurrence('tr4_ext')"),
      graft.operators.SeriesOps.toolCooccurrence(tr))
    assertSameRows(ext.sql("SELECT * FROM heavy_hitters_daily('tr4_ext', 2)"),
      graft.operators.SeriesOps.heavyHittersDaily(tr, k = 2))
    assertSameRows(ext.sql("SELECT * FROM response_latency('tr4_ext')"),
      graft.operators.SeriesOps.responseLatency(tr))
    assertSameRows(ext.sql("SELECT * FROM cohort_retention('tr4_ext')"),
      graft.operators.SeriesOps.cohortRetention(tr))
    assertSameRows(ext.sql("SELECT * FROM sax_motifs('tr4_ext', 4)"),
      graft.operators.SeriesOps.saxMotifs(tr, segments = 4))
    assertSameRows(ext.sql("SELECT * FROM conv_lifecycle('tr4_ext')"),
      graft.operators.SeriesOps.convLifecycle(tr))
    assertSameRows(ext.sql("SELECT * FROM term_topk('tr4_ext', 5)"),
      graft.operators.SeriesOps.termTopK(tr, k = 5))
    assertSameRows(ext.sql("SELECT * FROM term_lift('tr4_ext', 3, 1)"),
      graft.operators.SeriesOps.termLift(tr, k = 3, minTf = 1L))
    assertSameRows(ext.sql("SELECT * FROM mann_kendall('tr4_ext', 16)"),
      graft.operators.SeriesOps.mannKendall(tr, tailK = 16))
    assertSameRows(ext.sql("SELECT * FROM rescaled_range('tr4_ext')"),
      graft.operators.SeriesOps.rescaledRange(tr))
    assertSameRows(ext.sql("SELECT * FROM day_activity_rank('tr4_ext')"),
      graft.operators.SeriesOps.dayActivityRank(tr))
    assertSameRows(ext.sql("SELECT * FROM tool_pair_corr('tr4_ext')"),
      graft.operators.SeriesOps.toolPairCorrelation(tr))
    assertSameRows(ext.sql("SELECT * FROM binary_split('tr4_ext')"),
      graft.operators.SeriesOps.binarySplit(tr))
    assertSameRows(ext.sql("SELECT * FROM tool_cadence('tr4_ext')"),
      graft.operators.SeriesOps.toolCadence(tr))
    assertSameRows(ext.sql("SELECT * FROM term_vocab_growth('tr4_ext')"),
      graft.operators.SeriesOps.termVocabGrowth(tr))
    assertSameRows(ext.sql("SELECT * FROM daily_cardinality('tr4_ext')"),
      graft.operators.SeriesOps.dailyCardinality(tr))
    assertSameRows(ext.sql("SELECT * FROM daily_cardinality_approx('tr4_ext', 0.05)"),
      graft.operators.SeriesOps.dailyCardinalityApprox(tr, rsd = 0.05))
    assertSameRows(ext.sql("SELECT * FROM daily_autocorr('tr4_ext', 7)"),
      graft.operators.SeriesOps.dailyAutocorr(tr, maxLag = 7))
    assertSameRows(ext.sql("SELECT * FROM tool_lead_lag('tr4_ext', 3)"),
      graft.operators.SeriesOps.toolLeadLag(tr, maxLag = 3))
    assertSameRows(ext.sql("SELECT * FROM daily_gini('tr4_ext')"),
      graft.operators.SeriesOps.dailyGini(tr))
    assertSameRows(ext.sql("SELECT * FROM survival_curve('tr4_ext')"),
      graft.operators.SeriesOps.survivalCurve(tr))
    assertSameRows(ext.sql("SELECT * FROM active_streaks('tr4_ext')"),
      graft.operators.SeriesOps.activeStreaks(tr))
    assertSameRows(ext.sql("SELECT * FROM new_vs_returning('tr4_ext')"),
      graft.operators.SeriesOps.newVsReturning(tr))
    assertSameRows(ext.sql("SELECT * FROM tool_adoption('tr4_ext')"),
      graft.operators.SeriesOps.toolAdoption(tr))
    assertSameRows(ext.sql("SELECT * FROM daily_dup_rate('tr4_ext')"),
      graft.operators.SeriesOps.dailyDupRate(tr))
    assertSameRows(ext.sql("SELECT * FROM conv_burstiness('tr4_ext')"),
      graft.operators.SeriesOps.convBurstiness(tr))
    assertSameRows(ext.sql("SELECT * FROM char_half_life('tr4_ext')"),
      graft.operators.SeriesOps.charHalfLife(tr))
    assertSameRows(ext.sql("SELECT * FROM whale_convs('tr4_ext', 2)"),
      graft.operators.SeriesOps.whaleConvsDaily(tr, k = 2))
    assertSameRows(ext.sql("SELECT * FROM conv_concurrency('tr4_ext')"),
      graft.operators.SeriesOps.convConcurrency(tr))
    assertSameRows(ext.sql("SELECT * FROM toolset_churn('tr4_ext')"),
      graft.operators.SeriesOps.toolsetChurn(tr))
    assertSameRows(ext.sql("SELECT * FROM record_days('tr4_ext')"),
      graft.operators.SeriesOps.recordDays(tr))
    assertSameRows(ext.sql("SELECT * FROM hampel_outliers('tr4_ext', 5, 2.5)"),
      graft.operators.SeriesOps.hampelDaily(tr, w = 5, k = 2.5))
    assertSameRows(ext.sql("SELECT * FROM session_coverage('tr4_ext', 900)"),
      graft.operators.SeriesOps.sessionCoverageDaily(tr, gapSeconds = 900L))
    assertSameRows(ext.sql("SELECT * FROM rolling_active('tr4_ext', 5)"),
      graft.operators.SeriesOps.rollingActiveDaily(tr, w = 5))
    assertSameRows(ext.sql("SELECT * FROM rolling_active_sketch('tr4_ext', 5, 12)"),
      graft.operators.SeriesOps.rollingActiveSketchDaily(tr, w = 5, lgK = 12))
    assertSameRows(ext.sql("SELECT * FROM lorenz_deciles('tr4_ext', 4)"),
      graft.operators.SeriesOps.lorenzDeciles(tr, buckets = 4))
    assertSameRows(ext.sql("SELECT * FROM dist_drift('tr4_ext')"),
      graft.operators.SeriesOps.distDrift(tr))
    assertSameRows(ext.sql("SELECT * FROM term_churn('tr4_ext', 10)"),
      graft.operators.SeriesOps.termChurnDaily(tr, k = 10))
    assertSameRows(ext.sql("SELECT * FROM type_token_ratio('tr4_ext')"),
      graft.operators.SeriesOps.typeTokenRatio(tr))
    assertSameRows(ext.sql("SELECT * FROM daily_len_histogram('tr4_ext')"),
      graft.operators.SeriesOps.lengthHistogramDaily(tr))
    assertSameRows(ext.sql("SELECT * FROM shingle_novelty('tr4_ext')"),
      graft.operators.SeriesOps.shingleNoveltyDaily(tr))
    assertSameRows(ext.sql("SELECT * FROM dtw_pairs('tr4_ext', 4, 16)"),
      graft.operators.SeriesOps.dtwPairs(tr, k = 4, maxDays = 16))
    assertSameRows(ext.sql("SELECT * FROM peak_days('tr4_ext', 2)"),
      graft.operators.SeriesOps.peakDays(tr, w = 2))
    assertSameRows(ext.sql("SELECT * FROM tool_seq_edit('tr4_ext', 4)"),
      graft.operators.RefOps.toolSeqEdit(tr, k = 4))
    assertSameRows(ext.sql("SELECT * FROM ooo_skew('tr4_ext')"),
      graft.operators.SeriesOps.outOfOrderSkew(tr))
    assertSameRows(
      ext.sql("SELECT * FROM funnel('tr4_ext', 'search', 'browse')"),
      graft.operators.SeriesOps.funnel(tr, Seq("search", "browse")))
    // lttb wants the events shape — register a derived view
    val ev = tr.selectExpr("pmod(hash(conv_id), 97) AS user_id",
      "CAST(hash(conv_id, turn_idx) AS BIGINT) AS event_id", "ts",
      "CAST(length(text) AS DOUBLE) AS value")
    ev.createOrReplaceTempView("ev4_ext")
    assertSameRows(ext.sql("SELECT * FROM lttb_downsample('ev4_ext', '2 hours')"),
      graft.operators.RefOps.lttbDownsample(ev, windowExpr = "2 hours"))
    // malformed double tunable is an analysis error carrying the usage
    val d = intercept[Exception] {
      ext.sql("SELECT * FROM ewma('tr4_ext', 'abc')").collect()
    }
    assert(d.getMessage.contains("alpha") && d.getMessage.contains("numeric"),
      d.getMessage)
    // operator-level require() still surfaces through the SQL path
    val bad = intercept[Exception] {
      ext.sql("SELECT * FROM rolling_zscore('tr4_ext', 5, 9, 2.0)").collect()
    }
    assert(bad.getMessage.contains("minPoints"), bad.getMessage)
    // an out-of-int-range int tunable fails EAGERLY with the usage
    // string, not as a bare NumberFormatException from the rule's .toInt
    val range = intercept[Exception] {
      ext.sql("SELECT * FROM rolling_zscore('tr4_ext', 5000000000, 8, 2.0)").collect()
    }
    assert(range.getMessage.contains("int range") &&
      range.getMessage.contains("lookback"), range.getMessage)
  }

  test("non-literal tuning parameter fails analysis with a pointed message") {
    val docs = graft.ingest.Synth.documents(ext, 5)
    docs.createOrReplaceTempView("docs_badarg")
    val e = intercept[Exception] {
      ext.sql("SELECT simhash64(text, CAST(length(text) AS INT)) FROM docs_badarg").collect()
    }
    assert(e.getMessage.contains("integer literal"), e.getMessage)
    val arity = intercept[Exception] {
      ext.sql("SELECT cosine_sim(text) FROM docs_badarg").collect()
    }
    assert(arity.getMessage.contains("argument"), arity.getMessage)
    // out-of-int-range literal: an analysis error, NOT silent .toInt
    // truncation to a different tuning parameter
    val range = intercept[Exception] {
      ext.sql("SELECT simhash64(text, 4294967356) FROM docs_badarg").collect()
    }
    assert(range.getMessage.contains("int range"), range.getMessage)
  }

  test("base session (no extensions) does not see the functions; Column API needs no registration") {
    val err = intercept[Exception] {
      spark.sql("SELECT simhash64('a b c', 60)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("unresolved")
      || err.getMessage.toLowerCase.contains("cannot resolve")
      || err.getMessage.toLowerCase.contains("undefined function"), err.getMessage)
    // the Column API on the plain session still works
    import spark.implicits._
    val one = Seq("a b c d e").toDF("text")
      .select(TextOps.simhash($"text", 60).as("sh")).collect()
    assert(one.length == 1)
  }

  test("curation table functions in SQL == Column API (sample, split, fingerprint, paths, decontaminate, outliers)") {
    val tr = graft.ingest.Synth.transcripts(ext, nConvs = 20, avgTurns = 30,
      seed = 31L).toDF()
    tr.createOrReplaceTempView("trc_ext")
    assertSameRows(
      ext.sql("SELECT * FROM sample_per_conv('trc_ext', 3)"),
      graft.operators.Curation.samplePerConv(tr, 3))
    assertSameRows(
      ext.sql("SELECT * FROM split_census('trc_ext', 500, 250)"),
      graft.operators.Curation.stratifiedSplit(tr, 500, 250))
    assertSameRows(
      ext.sql("SELECT * FROM conv_fingerprint('trc_ext')"),
      graft.operators.Curation.convFingerprint(tr))
    assertSameRows(
      ext.sql("SELECT * FROM tool_paths('trc_ext', 3)"),
      graft.operators.Curation.toolPaths(tr, 3))
    val all = graft.ingest.Synth.documents(ext, n = 200, seed = 11L)
    val isBench = col("doc_id") % 10 === 6 || col("doc_id") % 10 === 7
    all.filter(!isBench).createOrReplaceTempView("corpus_ext")
    all.filter(isBench).createOrReplaceTempView("bench_ext")
    assertSameRows(
      ext.sql("SELECT * FROM decontaminate('corpus_ext', 'bench_ext', 16, 8, 0.5)"),
      graft.operators.Dedup.decontaminate(
        all.filter(!isBench), all.filter(isBench), 16, 8, 0.5))
    assertSameRows(
      ext.sql("SELECT * FROM decontaminate_bloom('corpus_ext', 'bench_ext', 0.5, 4096, 3)"),
      graft.operators.Dedup.decontaminateBloom(
        all.filter(!isBench), all.filter(isBench), 0.5, 4096, 3))
    // artifact lifecycle on the SQL face: build the bitset once as a
    // view (a deployment CTASes it), serve decontamination from it
    ext.sql("SELECT * FROM bloom_bits('bench_ext', 4096, 3)")
      .createOrReplaceTempView("bloom_art_ext")
    assertSameRows(
      ext.sql("SELECT * FROM decontaminate_bloom_artifact('corpus_ext', 'bench_ext', 'bloom_art_ext', 0.5)"),
      graft.operators.Dedup.decontaminateBloom(
        all.filter(!isBench), all.filter(isBench), 0.5, 4096, 3))
    all.createOrReplaceTempView("docs_cal_ext")
    assertSameRows(
      ext.sql("SELECT * FROM minhash_calibration('docs_cal_ext', 16, 8, 64)"),
      graft.operators.Dedup.minhashCalibration(all, 16, 8, 64))
    assertSameRows(
      ext.sql("SELECT * FROM quality_gate('docs_cal_ext', 20, 5000)"),
      graft.operators.TextAnalysis.qualityGate(all,
        minTokens = 20L, maxTokens = 5000L))
    val r1 = graft.rollup.Rollup.fromRaw(tr, graft.model.Tier.H1)
      .select(col("conv_id"), col("window_start"), col("turn_count"))
    r1.filter(col("turn_count") > 1).createOrReplaceTempView("snap_old_ext")
    r1.createOrReplaceTempView("snap_new_ext")
    assertSameRows(
      ext.sql("SELECT * FROM snapshot_diff('snap_old_ext', 'snap_new_ext', " +
        "'conv_id,window_start', 'turn_count')"),
      graft.operators.SnapshotDiff.diff(
        r1.filter(col("turn_count") > 1), r1,
        Seq("conv_id", "window_start"), Seq("turn_count")))
    val emb = graft.ingest.Synth.embeddings(ext, 150, dims = 16, seed = 5L)
      .withColumn("label", pmod(col("vec_id"), lit(5)).cast("int"))
    emb.createOrReplaceTempView("emb_cur_ext")
    assertSameRows(
      ext.sql("SELECT * FROM label_outliers('emb_cur_ext', 0.2)"),
      graft.operators.Similarity.labelOutliers(emb, 0.2))
    assertSameRows(
      ext.sql("SELECT * FROM embedding_audit('emb_cur_ext')"),
      graft.operators.Similarity.embeddingAudit(emb))
    assertSameRows(
      ext.sql("SELECT * FROM key_coverage('docs_cal_ext', 'emb_cur_ext', 'doc_id', 'vec_id')"),
      graft.operators.SnapshotDiff.keyCoverage(all, emb, "doc_id", "vec_id"))
    assertSameRows(
      ext.sql("SELECT * FROM corpus_checksum('trc_ext')"),
      graft.operators.Curation.corpusChecksum(tr))
    assertSameRows(
      ext.sql("SELECT * FROM daily_checksum('trc_ext')"),
      graft.operators.Curation.corpusChecksumDaily(tr))
    assertSameRows(
      ext.sql("SELECT * FROM ols_trend('trc_ext')"),
      graft.operators.RefOps.olsTrend(tr))
    assertSameRows(
      ext.sql("SELECT * FROM tier_stitch('trc_ext', '2024-01-04 05:06:07', '2024-01-20 10:11:12')"),
      graft.rollup.Rollup.stitchRange(tr, "2024-01-04 05:06:07", "2024-01-20 10:11:12"))
    // operator-level require() surfaces through the SQL path
    val bad = intercept[Exception] {
      ext.sql("SELECT * FROM sample_per_conv('trc_ext', 0)").collect()
    }
    assert(bad.getMessage.contains("k must be"), bad.getMessage)
    assertSameRows(
      ext.sql("SELECT * FROM multi_granularity('trc_ext', '1h')"),
      graft.rollup.Rollup.multiGranularity(tr, graft.model.Tier.H1))
    assertSameRows(
      ext.sql("SELECT * FROM turn_integrity('trc_ext')"),
      graft.operators.Curation.turnIntegrity(tr))
    val badTier = intercept[Exception] {
      ext.sql("SELECT * FROM multi_granularity('trc_ext', '5m')").collect()
    }
    assert(badTier.getMessage.contains("1m/1h/1d"), badTier.getMessage)
    assertSameRows(
      ext.sql("SELECT * FROM histogram_quantile('trc_ext', '1h', 50)"),
      graft.rollup.Rollup.histogramQuantile(tr, graft.model.Tier.H1, 50))
    assertSameRows(
      ext.sql("SELECT * FROM weighted_sample('trc_ext', 25)"),
      graft.operators.Curation.weightedSample(tr, 25))
    assertSameRows(
      ext.sql("SELECT * FROM histogram_merge('trc_ext', '1m', '1h', 50)"),
      graft.rollup.Rollup.mergeHistogram(
        graft.rollup.Rollup.charLenHistogram(tr, graft.model.Tier.M1, 50),
        graft.model.Tier.H1))
    assertSameRows(
      ext.sql("SELECT * FROM term_topk_sketch('trc_ext', 10, 4096)"),
      graft.operators.SeriesOps.termTopKSketch(tr, 10, 4096))
    assertSameRows(
      ext.sql("SELECT * FROM tool_transition_diversity('trc_ext')"),
      graft.operators.RefOps.toolTransitionDiversity(tr))
  }

  test("doc_repetition table function == Column API, default and explicit width") {
    val docs = graft.ingest.Synth.documents(ext, 120)
    docs.createOrReplaceTempView("docs_rep_ext")
    assertSameRows(
      ext.sql("SELECT * FROM doc_repetition('docs_rep_ext')"),
      graft.operators.TextAnalysis.repetition(docs))
    assertSameRows(
      ext.sql("SELECT * FROM doc_repetition('docs_rep_ext', 3)"),
      graft.operators.TextAnalysis.repetition(docs, lineTokens = 3))
  }

  test("tier_stitch_stored table function in SQL == Column API over a real warehouse") {
    val tr = graft.ingest.Synth.transcripts(ext, nConvs = 15, avgTurns = 40,
      seed = 19L).toDF()
    tr.createOrReplaceTempView("trc_stored_ext")
    val wh = tmpDir("ext-stitch-wh")
    new graft.jobs.RollupJob(wh).run(ext, tr, "ext-stitch-build")
    val (from, to) = ("2024-01-04 05:06:07", "2024-01-20 10:11:12")
    assertSameRows(
      ext.sql(s"SELECT * FROM tier_stitch_stored('trc_stored_ext', '$wh', '$from', '$to')"),
      graft.rollup.Rollup.stitchRangeStored(ext,
        new graft.table.SnapshotTable(s"$wh/rollup_1m"),
        new graft.table.SnapshotTable(s"$wh/rollup_1h"),
        new graft.table.SnapshotTable(s"$wh/rollup_1d"),
        tr, from, to))
    // and both equal the recompute mode (the q140/q141 identity)
    assertSameRows(
      ext.sql(s"SELECT * FROM tier_stitch_stored('trc_stored_ext', '$wh', '$from', '$to')"),
      graft.rollup.Rollup.stitchRange(tr, from, to))
    // serving mode over a fully-built warehouse degenerates to the
    // stored answer (horizon past the range) — SQL face parity
    assertSameRows(
      ext.sql(s"SELECT * FROM tier_stitch_serving('trc_stored_ext', '$wh', '$from', '$to')"),
      graft.rollup.Rollup.stitchRange(tr, from, to))
  }

  test("funnel latency table functions in SQL == Column API") {
    val tr = graft.ingest.Synth.transcripts(ext, nConvs = 20, avgTurns = 30,
      seed = 31L).toDF()
    tr.createOrReplaceTempView("trc_funnel_ext")
    assertSameRows(
      ext.sql("SELECT * FROM funnel_latency('trc_funnel_ext', 'signup', 'purchase')"),
      graft.operators.SeriesOps.funnelLatency(tr, Seq("signup", "purchase")))
    assertSameRows(
      ext.sql("SELECT * FROM funnel_latency_approx('trc_funnel_ext', 'signup', 'purchase')"),
      graft.operators.SeriesOps.funnelLatencyApprox(tr, Seq("signup", "purchase")))
  }

  test("dedup pipeline table functions in SQL == Column API (exact, pairs, clusters, corpus, simhash)") {
    val docs = graft.ingest.Synth.documents(ext, n = 250, seed = 7L)
    docs.createOrReplaceTempView("docs_pipe_ext")
    assertSameRows(
      ext.sql("SELECT * FROM dedup_exact('docs_pipe_ext')"),
      graft.operators.Dedup.exact(docs))
    assertSameRows(
      ext.sql("SELECT * FROM minhash_pairs('docs_pipe_ext', 16, 8, 0.5)"),
      graft.operators.Dedup.minhashLsh(docs, 16, 8, 0.5))
    assertSameRows(
      ext.sql("SELECT * FROM dedup_clusters('docs_pipe_ext', 16, 8, 0.5)"),
      graft.operators.Dedup.components(
        graft.operators.Dedup.minhashLsh(docs, 16, 8, 0.5)))
    assertSameRows(
      ext.sql("SELECT * FROM dedup_corpus('docs_pipe_ext', 16, 8, 0.5)"),
      graft.operators.Dedup.dedupByPairs(docs,
        graft.operators.Dedup.minhashLsh(docs, 16, 8, 0.5)))
    assertSameRows(
      ext.sql("SELECT * FROM simhash_pairs('docs_pipe_ext')"),
      graft.operators.Dedup.simhashPairs(graft.operators.Dedup.simhash(docs)))
    assertSameRows(
      ext.sql("SELECT * FROM simhash_pairs('docs_pipe_ext', 32, 2)"),
      graft.operators.Dedup.simhashPairs(
        graft.operators.Dedup.simhash(docs, 32), bits = 32, maxDist = 2))
  }

  test("knn/cosine_pairs table functions in SQL == Column API (brute, lsh, ivf)") {
    val emb = graft.ingest.Synth.embeddings(ext, 300, dims = 32)
    val queries = emb.filter(col("vec_id") < 8)
    emb.createOrReplaceTempView("corpus_knn_ext")
    queries.createOrReplaceTempView("queries_knn_ext")
    assertSameRows(
      ext.sql("SELECT * FROM knn('corpus_knn_ext', 'queries_knn_ext', 5)"),
      graft.operators.Similarity.bruteForceTopK(emb, queries, 5))
    assertSameRows(
      ext.sql("SELECT * FROM knn('corpus_knn_ext', 'queries_knn_ext', 5, 'lsh')"),
      graft.operators.Similarity.lshTopK(emb, queries, 5))
    assertSameRows(
      ext.sql("SELECT * FROM knn('corpus_knn_ext', 'queries_knn_ext', 5, 'ivf', 8)"),
      graft.operators.Similarity.ivfTopK(emb, queries, 5, nlist = 8))
    assertSameRows(
      ext.sql("SELECT * FROM cosine_pairs('corpus_knn_ext', 0.35)"),
      graft.operators.Similarity.cosinePairsAbove(emb, 0.35))
    assertSameRows(
      ext.sql("SELECT * FROM cosine_pairs('corpus_knn_ext', 0.35, 4)"),
      graft.operators.Similarity.lshPairsAbove(emb, 0.35, bits = 4))
    val badMode = intercept[Exception] {
      ext.sql("SELECT * FROM knn('corpus_knn_ext', 'queries_knn_ext', 5, 'exact')")
        .collect()
    }
    assert(badMode.getMessage.contains("mode must be"), badMode.getMessage)
  }
}
