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
      LangId.udf(col("text")).as("lang_pred"),
      col("lang").as("lang_label"))

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      TextOps.fingerprint(col("text"), k = 8, w = 4).as("fp"))

  /** Containment candidates: docs sharing ≥ minShared winnowing
    * fingerprints (explode + self-join on fingerprint value — shuffles
    * (fp, doc_id) pairs only).
    *
    * Skew guard: fingerprints present in more than `maxDf` documents
    * are dropped before pairing — a fingerprint of a ubiquitous k-gram
    * ("the fast …") carries no dedup signal but makes the self-join
    * quadratic in its document frequency (measured: 5× the whole bench
    * suite's time without the cap). Same idea as stop-word removal in
    * LSH pipelines; at corpus scale the cap keeps the join linear.
    */
  def fingerprintPairs(docs: DataFrame, minShared: Int = 2, maxDf: Int = 20): DataFrame = {
    val fp = fingerprints(docs).select(col("doc_id"), explode(col("fp")).as("f"))
    val rare = fp.groupBy(col("f")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") > 1)
      .select(col("f"))
    // no broadcast hint: `rare` is O(|fingerprints|); the join shuffles
    // on f, which the pairing join needs anyway — AQE picks the strategy
    val pruned = fp.join(rare, Seq("f"))
    val a = pruned.withColumnRenamed("doc_id", "doc_a")
    val b = pruned.withColumnRenamed("doc_id", "doc_b")
    a.join(b, Seq("f")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
