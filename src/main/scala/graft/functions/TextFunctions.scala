package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline — all
  * composed from codegen'd built-ins (no UDFs), so they vectorize inside
  * WholeStageCodegen and push down through Catalyst untouched.
  */
object TextFunctions {

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(split(text, " ")).cast("long")

  /** BPE-ish token count: letter runs, single digits, and single
    * non-alnum marks — a cheap proxy for subword tokenizers. The regex
    * is POSIX-simple so Java (Spark) and RE2-family (oracle) agree.
    */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0))).cast("long")

  /** Punctuation ratio: punctuation chars / total chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", "")).cast("double") /
        length(text).cast("double"))

  /** Stopword ratio over whitespace tokens (tiny English list — the
    * quality-score feature, not a linguistic claim).
    */
  val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
  def stopwordRatio(text: Column): Column = {
    val toks = split(text, " ")
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*))).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite quality score in parts-per-million [0, 1_000_000]:
    * length band + low punctuation + stopword presence. Pure INTEGER
    * arithmetic (longs + integer division) — bit-identical across
    * engines; float formulations hit round-half boundaries where Spark
    * (BigDecimal HALF_UP) and other engines (float-multiply rounding)
    * disagree in the last digit.
    */
  def qualityScorePpm(text: Column): Column = {
    val nChars = length(text).cast("long")
    val punctChars = length(
      regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", "")).cast("long")
    val toks = split(text, " ")
    val nToks = size(toks).cast("long")
    val stopToks = size(filter(toks,
      t => t.isin(stopwords.map(x => x: Any): _*))).cast("long")
    // floor(int/int) in double is exact here: quotient gaps are
    // >= 1/denominator, many orders above double ulp at these scales
    val M = lit(1000000L)
    val lenPpm = least(nChars * 2000L, M)
    val punctPpm = M - least(
      when(nChars === 0L, 0L)
        .otherwise(floor((punctChars * 4000000L).cast("double") / nChars.cast("double")).cast("long")),
      M)
    val stopPpm = least(
      when(nToks === 0L, 0L)
        .otherwise(floor((stopToks * 5000000L).cast("double") / nToks.cast("double")).cast("long")),
      M)
    floor((lenPpm * 4L + punctPpm * 3L + stopPpm * 3L).cast("double") / 10.0).cast("long")
  }

  /** 3-word shingles: `transform(sequence) ∘ slice` — pure built-ins.
    * `split` on single space matches the oracle's `string_split`.
    */
  def shingles3(text: Column): Column = {
    val toks = split(text, " ")
    when(size(toks) < 3, array(text)).otherwise(
      transform(
        sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i, lit(3)))))
  }

  /** MinHash via ONE base hash per shingle + k universal-hash derives.
    * The naive form (k independent md5(i:shingle) calls) costs k md5
    * passes over every shingle — measured as most of the LSH pipeline's
    * time. Instead each shingle is hashed once (md5 prefix → 28-bit
    * int), and the k functions are `(a_i·h + b_i) mod P` with P prime
    * < 2^29: products stay < 2^57, so 64-bit engines (Spark long,
    * DuckDB BIGINT — which ERRORS on overflow rather than wrapping)
    * compute bit-identical values, keeping the oracle mirror exact.
    */
  val minhashP = 536870909L // largest prime < 2^29

  /** Deterministic (a, b) coefficients for minhash function i —
    * splitmix64-derived, inlined as literals on BOTH engines.
    */
  def minhashCoeffs(i: Int): (Long, Long) = {
    def mix(k: Long): Long = {
      var z = k + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a = java.lang.Long.remainderUnsigned(mix(2L * i + 1), minhashP - 1) + 1
    val b = java.lang.Long.remainderUnsigned(mix(2L * i + 2), minhashP)
    (a, b)
  }

  /** Base 28-bit hash per shingle: md5 7-hex-char prefix as int. */
  def shingleHashes(shingleCol: Column): Column =
    transform(shingleCol, s => conv(substring(md5(s), 1, 7), 16, 10).cast("long"))

  /** MinHash element i over pre-hashed shingles. */
  def minhashUniversal(hashesCol: Column, i: Int): Column = {
    val (a, b) = minhashCoeffs(i)
    array_min(transform(hashesCol, h => (h * a + b) % minhashP))
  }
}
