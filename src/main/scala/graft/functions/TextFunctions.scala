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

  /** MinHash element for seed i: the minimum of md5(i:shingle) hex
    * prefixes — min over lexicographic HEX STRINGS, which every engine
    * orders identically (the cross-engine-stable trick standing in for
    * k independent integer hash functions).
    */
  def minhashHex(shingleCol: Column, seedIdx: Int): Column =
    array_min(transform(shingleCol,
      s => substring(md5(concat(lit(s"$seedIdx:"), s)), 1, 16)))
}
