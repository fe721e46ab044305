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
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      TextFunctions.tokenCountWs(col("text")).as("tokens_ws"),
      TextFunctions.tokenCountBpe(col("text")).as("tokens_bpe"),
      TextFunctions.punctRatio(col("text")).as("punct_ratio"),
      TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"),
      TextFunctions.qualityScorePpm(col("text")).as("quality_ppm"))

  def langId(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      LangId.col(col("text")).as("lang_pred"),
      col("lang").as("lang_label"))

  /** The ONE set of repetition-shape expression strings (chunk
    * "lines", positional bigrams, duplicate-chunk char mass, duplicate
    * bigram positions) shared by [[repetition]] (q126) and
    * [[qualityGate]] (q134) — the rowChecksumCol single-definition
    * doctrine: each shape has a DuckDB oracle mirror, and a shared
    * definition means the two operators (and both oracles) cannot
    * drift apart. All operate on prior columns `toks`/`text`.
    */
  private def linesExpr(w: Int): String =
    s"transform(sequence(0, (size(toks) - 1) div $w), " +
      s"i -> array_join(slice(toks, i * $w + 1, $w), ' '))"
  private val bgExpr: String =
    "transform(sequence(1, size(toks) - 1), i -> " +
      "concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
  private val tgExpr: String =
    "transform(sequence(1, size(toks) - 2), i -> " +
      "concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', " +
      "element_at(toks, i + 2)))"
  private val dupLineCharExpr: String =
    "cast(aggregate(lines, 0L, (a, x) -> a + length(x)) - " +
      "aggregate(array_distinct(lines), 0L, (a, x) -> a + length(x)) as double) / " +
      "cast(aggregate(lines, 0L, (a, x) -> a + length(x)) as double)"
  private val dupBigramExpr: String =
    "cast(size(filter(bg, x -> size(filter(bg, y -> y = x)) > 1)) as double) / " +
      "cast(size(bg) as double)"


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
    * Everything is per-row array-HOF arithmetic (codegen'd, ZERO
    * shuffles — the 100 TB cost is one scan); the per-doc n-gram
    * counting is O(distinct × n) on short documents, bounded by the
    * tokenizer, never by the corpus. Documents with fewer than 3
    * tokens (trigram undefined) are dropped, mirroring the oracle.
    */
  def repetition(docs: DataFrame, lineTokens: Int = 2): DataFrame = {
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("text"), col("toks"),
        expr(linesExpr(lineTokens)).as("lines"),
        expr(bgExpr).as("bg"),
        expr(tgExpr).as("tg"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("lines")).cast("long").as("n_lines"),
        round((size(col("lines")) - size(array_distinct(col("lines"))))
          .cast("double") / size(col("lines")).cast("double"), 6)
          .as("dup_line_frac"),
        round(expr(dupLineCharExpr), 6).as("dup_line_char_frac"),
        round(expr(
          "cast(aggregate(array_distinct(bg), 0L, (m, x) -> " +
          "greatest(m, cast(size(filter(bg, y -> y = x)) * length(x) as bigint))) as double) / " +
          "cast(length(text) as double)"), 6).as("top_bigram_char_frac"),
        round(expr(dupBigramExpr), 6).as("dup_bigram_frac"),
        round(expr(
          "cast(size(filter(tg, x -> size(filter(tg, y -> y = x)) > 1)) as double) / " +
          "cast(size(tg) as double)"), 6).as("dup_trigram_frac"))
  }

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
    val guarded = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("text"), col("toks"),
        when(size(col("toks")) >= 3, expr(linesExpr(2))).as("lines"),
        when(size(col("toks")) >= 3, expr(bgExpr)).as("bg"))
    val n = size(col("toks")).cast("long")
    val meanTok =
      expr("cast(aggregate(toks, 0L, (a, x) -> a + length(x)) as double)") /
        n.cast("double")
    val dupLineChar = expr(dupLineCharExpr)
    val dupBigram = expr(dupBigramExpr)
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
    docs.select(
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
