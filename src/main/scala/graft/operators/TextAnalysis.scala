package graft.operators

import graft.functions.{LangId, TextFunctions, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text analysis over the `documents` table: token counting, quality
  * scoring, language ID, winnowing fingerprints. Everything except
  * lang-ID is pure codegen'd column arithmetic.
  */
object TextAnalysis {

  def stats(docs: DataFrame): DataFrame =
    ScanSpread.spreadForCompute(docs).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      TextFunctions.tokenCountWs(col("text")).as("tokens_ws"),
      TextFunctions.tokenCountBpe(col("text")).as("tokens_bpe"),
      TextFunctions.punctRatio(col("text")).as("punct_ratio"),
      TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"),
      TextFunctions.qualityScorePpm(col("text")).as("quality_ppm"))

  def langId(docs: DataFrame): DataFrame =
    ScanSpread.spreadForCompute(docs).select(
      col("doc_id"),
      LangId.col(col("text")).as("lang_pred"),
      col("lang").as("lang_label"))

  /** Gopher-style within-document repetition metrics (Rae et al. 2021,
    * table A1) — the canonical LLM training-data quality gate the stats
    * family doesn't cover: documents that repeat themselves (boilerplate,
    * scraper loops, template spam) score high here and get filtered
    * before dedup even runs.
    *
    * Metrics, all per document:
    *   - `dup_line_frac` / `dup_line_char_frac`: fraction of "lines"
    *     (fixed `lineTokens`-token chunks — the corpus is single-line,
    *     so physical newlines carry no signal; a chunk is the
    *     order-preserving analogue) that are repeats of an earlier
    *     line, by count and by character mass.
    *   - `top_bigram_char_frac`: characters covered by the most
    *     frequent word 2-gram (count × length, tie-free because the
    *     maximum is taken over the product) over total characters.
    *   - `dup_bigram_frac` / `dup_trigram_frac`: fraction of n-gram
    *     positions whose n-gram occurs more than once in the document.
    *
    * Everything is ONE native compiled pass per document
    * ([[graft.functions.TextOps.repetitionStats]] — the original
    * higher-order-function formulation ran INTERPRETED per n-gram,
    * measured 5.7-6.4 s at sf0.1 vs well under a second native; ZERO
    * shuffles either way, the 100 TB cost is one scan); per-doc
    * n-gram counting is O(n) hash-map work bounded by the tokenizer,
    * never by the corpus. Documents with fewer than 3 tokens (trigram
    * undefined) are dropped, mirroring the oracle; ROUND-6 applies
    * here, on the expression's unrounded IEEE-identical ratios.
    */
  def repetition(docs: DataFrame, lineTokens: Int = 2): DataFrame =
    ScanSpread.spreadForCompute(docs)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        TextOps.repetitionStatsCol(col("text"), lineTokens).as("_r"))
      .filter(col("_r").isNotNull)
      .select(
        col("doc_id"),
        col("_r.n_tokens").as("n_tokens"),
        col("_r.n_lines").as("n_lines"),
        round(col("_r.dup_line_frac"), 6).as("dup_line_frac"),
        round(col("_r.dup_line_char_frac"), 6).as("dup_line_char_frac"),
        round(col("_r.top_bigram_char_frac"), 6).as("top_bigram_char_frac"),
        round(col("_r.dup_bigram_frac"), 6).as("dup_bigram_frac"),
        round(col("_r.dup_trigram_frac"), 6).as("dup_trigram_frac"))

  /** Gopher-style composite quality GATE — the keep/drop decision a
    * training pipeline actually runs, assembled from the exact metrics
    * this family already computes ([[stats]] ratios, [[repetition]]
    * chunk/bigram fractions) as per-document boolean reason flags plus
    * the final `keep` verdict. Filtering with reasons (not just a
    * score) is the curation norm: reason counts per shard are the
    * drift dashboard, and a rule can be loosened by re-deriving `keep`
    * from the flags without re-touching text.
    *
    * Rules (all thresholds are parameters; defaults in the Gopher
    * neighborhood adapted to this corpus's single-line documents):
    * token-count band, mean-token-length band, punctuation-ratio cap,
    * stopword-ratio floor (non-natural text), and the repetition rule
    * (duplicate-chunk char mass / duplicate-bigram positions) — the
    * repetition metrics are undefined below 3 tokens and count as NOT
    * repetitive there (such docs already fail the token band).
    *
    * ONE scan, zero shuffles: every metric is per-row array/regexp
    * arithmetic inlined into a single projection (the q126 expression
    * set, guarded), codegen'd end to end — at 100 TB the gate costs a
    * map pass over text, and it runs BEFORE dedup ever shuffles.
    */
  def qualityGate(docs: DataFrame,
      minTokens: Long = 10L, maxTokens: Long = 100000L,
      minMeanTokChars: Double = 2.0, maxMeanTokChars: Double = 12.0,
      maxPunct: Double = 0.3, minStopword: Double = 0.01,
      maxDupLineChar: Double = 0.3, maxDupBigram: Double = 0.5): DataFrame = {
    require(minTokens >= 1 && maxTokens > minTokens,
      s"token band must satisfy 1 <= min < max, got [$minTokens, $maxTokens]")
    require(minMeanTokChars > 0 && maxMeanTokChars > minMeanTokChars,
      "mean-token-chars band must satisfy 0 < min < max")
    val guarded = ScanSpread.spreadForCompute(docs)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("toks"),
        TextOps.repetitionStatsCol(col("text"), 2).as("_r"))
    val n = size(col("toks")).cast("long")
    val meanTok =
      expr("cast(aggregate(toks, 0L, (a, x) -> a + length(x)) as double)") /
        n.cast("double")
    // null struct (< 3 tokens) nulls both fractions → coalesce(false)
    val dupLineChar = col("_r.dup_line_char_frac")
    val dupBigram = col("_r.dup_bigram_frac")
    val flagged = guarded.select(
      col("doc_id"),
      n.as("n_tokens"),
      (n < minTokens).as("too_short"),
      (n > maxTokens).as("too_long"),
      (meanTok < minMeanTokChars || meanTok > maxMeanTokChars)
        .as("bad_word_len"),
      (TextFunctions.punctRatio(col("text")) > maxPunct).as("high_punct"),
      (TextFunctions.stopwordRatio(col("text")) < minStopword)
        .as("low_stopword"),
      coalesce(dupLineChar > maxDupLineChar || dupBigram > maxDupBigram,
        lit(false)).as("repetitive"))
    flagged.withColumn("keep",
      !(col("too_short") || col("too_long") || col("bad_word_len") ||
        col("high_punct") || col("low_stopword") || col("repetitive")))
  }

  def fingerprints(docs: DataFrame, k: Int = 8, w: Int = 4): DataFrame =
    // winnowing hashes every k-gram — the whole cost is in this map
    // pass, upstream of any exchange, so an under-partitioned corpus
    // must be spread first (ScanSpread — no-op for large inputs)
    ScanSpread.spreadForCompute(docs).select(
      col("doc_id"),
      TextOps.fingerprint(col("text"), k, w).as("fp"))

  /** Containment candidates: docs sharing ≥ minShared winnowing
    * fingerprints, built around ONE shuffle of (f, doc_id): a window
    * over `f` computes each fingerprint's document frequency, the
    * df-capped survivors collect into PROVABLY bounded per-fingerprint
    * arrays (≤ maxDf — the window filter runs first) on the same
    * partitioning (no second exchange), and pairs explode from the
    * arrays. The previous self-join formulation shuffled three times
    * and evaluated the winnowing expression twice.
    *
    * Skew guard (`maxDf`): fingerprints present in more than `maxDf`
    * documents are dropped before pairing — a fingerprint of a
    * ubiquitous k-gram ("the fast …") carries no dedup signal but makes
    * pairing quadratic in its document frequency (measured: 5× the
    * whole bench suite's time without the cap). Same idea as stop-word
    * removal in LSH pipelines; at corpus scale the cap keeps the
    * expansion linear.
    */
  def fingerprintPairs(docs: DataFrame, minShared: Int = 2, maxDf: Int = 20,
      k: Int = 8, w: Int = 4): DataFrame = {
    val fp = fingerprints(docs, k, w).select(col("doc_id"), explode(col("fp")).as("f"))
    val byF = org.apache.spark.sql.expressions.Window.partitionBy(col("f"))
    fp.withColumn("df", count(lit(1)).over(byF))
      .filter(col("df") > 1 && col("df") <= maxDf)
      .groupBy(col("f"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(explode(expr(
        "flatten(transform(ids, (a, i) -> transform(slice(ids, i + 2, size(ids)), b -> struct(a, b))))"))
        .as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
