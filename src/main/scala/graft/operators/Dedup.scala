package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. All are shuffle-lean:
  * hashes/signatures are computed map-side with codegen'd built-ins,
  * the only wide stages are the hash/band group-bys — at 100 TB those
  * shuffle a few dozen bytes per document, never the text itself
  * (candidate verification re-reads text only for the candidate pairs,
  * a vanishing fraction of the corpus).
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct text, keeping
    * the smallest doc_id (deterministic winner) + duplicate count.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), md5(col("text")).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("dup_count"))

  /** MinHash signatures: `k` hex-string min-hashes over 3-word shingles
    * (one row per doc, computed in a single map pass — no shuffle).
    */
  def minhashSignatures(docs: DataFrame, k: Int): DataFrame = {
    val sh = docs.select(col("doc_id"), TextFunctions.shingles3(col("text")).as("sh"))
    val sigCols = (0 until k).map(i =>
      TextFunctions.minhashHex(col("sh"), i).as(s"mh$i"))
    sh.select(col("doc_id") +: sigCols: _*)
  }

  /** LSH banding: split the k-signature into `bands` bands of k/bands
    * rows; docs sharing any band key become candidate pairs (a < b).
    * The band group-by shuffles only (band_key, doc_id).
    */
  def lshCandidatePairs(signatures: DataFrame, k: Int, bands: Int): DataFrame = {
    val rowsPerBand = k / bands
    require(bands * rowsPerBand == k, s"bands=$bands must divide k=$k")
    val bandExprs = (0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        concat_ws("|",
          (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*)
          .as("key"))
    }
    signatures
      .select(col("doc_id"), explode(array(bandExprs: _*)).as("bk"))
      .groupBy(col("bk"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      // pairs within a bucket; buckets are tiny (near-dup clusters)
      .select(explode(expr(
        "flatten(transform(ids, (a, i) -> transform(slice(ids, i + 2, size(ids)), b -> struct(a, b))))"))
        .as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
  }

  /** Exact n-gram (3-word shingle) Jaccard for given candidate pairs:
    * join shingle sets only for candidates, never all-pairs.
    */
  def jaccardVerify(docs: DataFrame, pairs: DataFrame, threshold: Double): DataFrame = {
    val sh = docs.select(
      col("doc_id"),
      array_distinct(TextFunctions.shingles3(col("text"))).as("sh"))
    pairs
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni",
        (size(col("sh_a")) + size(col("sh_b"))).cast("double") - col("inter"))
      .withColumn("jaccard", round(col("inter") / col("uni"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Full MinHash+LSH near-dup pipeline. */
  def minhashLsh(docs: DataFrame, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.7): DataFrame =
    jaccardVerify(docs, lshCandidatePairs(minhashSignatures(docs, k), k, bands), threshold)

  /** 60-bit SimHash over whitespace tokens with count weights. Uses the
    * cross-engine md5-hex→BIGINT trick so the oracle computes the
    * identical signature. Bit j set ⇔ Σ count·(±1 by token bit j) > 0.
    */
  def simhash(docs: DataFrame, bits: Int = 60): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    val bitSums = (0 until bits).map(j =>
      sum(col("cnt") * (shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1))
        .as(s"bs$j"))
    val sums = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until bits).map(j =>
      when(col(s"bs$j") > 0, lit(1L) * (1L << j)).otherwise(0L))
      .reduce(_ + _)
    sums.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: pigeonhole banding (4 chunks of bits/4 —
    * any pair within hamming distance maxDist shares ≥1 exact chunk),
    * then exact `bit_count(xor)` verification on candidates only.
    */
  def simhashPairs(sigs: DataFrame, bits: Int = 60, maxDist: Int = 3): DataFrame = {
    val chunks = 4
    val w = bits / chunks
    val mask = (1L << w) - 1
    val banded = sigs.select(
      col("doc_id"), col("simhash"),
      explode(array((0 until chunks).map(c =>
        struct(lit(c).as("band"),
          shiftright(col("simhash"), c * w).bitwiseAND(lit(mask)).as("key"))): _*))
        .as("bk"))
    val a = banded.select(col("bk"), col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val b = banded.select(col("bk"), col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    a.join(b, "bk")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
