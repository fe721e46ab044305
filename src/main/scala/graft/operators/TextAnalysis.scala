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
