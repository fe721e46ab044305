package graft.jobs

import graft.ingest.Synth
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup-at-scale probe: the text-dedup family (exact, MinHash+LSH,
  * SimHash banding) over [[Synth.documents]] — a seeded corpus with
  * KNOWN injected exact/near duplicates — measuring per-stage
  * throughput (docs/s) and recall against the injected ground truth.
  * Cached input + count-only actions isolate operator scaling from the
  * sandbox write path, like [[ScaleProbe]]; run the same binary at
  * `local[8]` and `local[32]` for the N-vs-4N evidence on the
  * training-data-pipeline operators.
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().appName("graft-dedup-scale-probe")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cores = spark.sparkContext.defaultParallelism

    val docs = Synth.documents(spark, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    docs.count() // materialize (uncounted)

    def timed(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val out = body
      (out, (System.nanoTime() - t0) / 1e9)
    }

    for (r <- 1 to reps) {
      val (ex, tEx) = timed(Dedup.exact(docs).count())
      val (mh, tMh) = timed(Dedup.minhashLsh(docs, k = 16, bands = 8, threshold = 0.8).count())
      val (sh, tSh) = timed(Dedup.simhashPairs(Dedup.simhash(docs)).count())
      // payload-count idiom (see ScaleProbe): counting a computed
      // column keeps the optimizer from pruning the map-only metrics
      val (rp, tRp) = timed(graft.operators.TextAnalysis.repetition(docs)
        .agg(count(col("dup_bigram_frac"))).head().getLong(0))
      val (qg, tQg) = timed(graft.operators.TextAnalysis.qualityGate(docs)
        .agg(count(col("keep"))).head().getLong(0))
      println(f"[dedup-probe] rep=$r cores=$cores docs=$n " +
        f"exact=$tEx%.2fs (${n / tEx}%.0f docs/s, $ex groups) " +
        f"minhash_lsh=$tMh%.2fs (${n / tMh}%.0f docs/s, $mh pairs) " +
        f"simhash_pairs=$tSh%.2fs (${n / tSh}%.0f docs/s, $sh pairs) " +
        f"repetition=$tRp%.2fs (${n / tRp}%.0f docs/s, $rp docs) " +
        f"quality_gate=$tQg%.2fs (${n / tQg}%.0f docs/s, $qg docs)")
    }

    // decontamination head-to-head: banded minhash (LSH recall curve)
    // vs bloom prescreen (exact recall) on the same %10∈{6,7} split
    // the spec's brute-truth test uses, so injected pairs straddle it.
    // Bloom flags ≥ banded flags ALWAYS (exact recall ⊇ band curve) —
    // printed counts make the containment visible at probe scale.
    val isBench = col("doc_id") % 10 === 6 || col("doc_id") % 10 === 7
    val corpusD = docs.filter(!isBench)
    val benchD = docs.filter(isBench)
    for (r <- 1 to reps) {
      val (db, tDb) = timed(
        Dedup.decontaminate(corpusD, benchD, k = 16, bands = 8, threshold = 0.5).count())
      val (bl, tBl) = timed(
        Dedup.decontaminateBloom(corpusD, benchD, threshold = 0.5).count())
      println(f"[dedup-probe] rep=$r cores=$cores decontaminate=$tDb%.2fs " +
        f"(${n / tDb}%.0f docs/s, $db flagged) " +
        f"decontaminate_bloom=$tBl%.2fs (${n / tBl}%.0f docs/s, $bl flagged)")
    }

    // embedding near-dup stage: n/4 vectors with injected cosine≈0.995
    // pairs; bits sized so buckets stay ~30 vectors (corpus/2^bits)
    val nv = math.max(1000L, n / 4)
    val bits = math.max(8, 64 - java.lang.Long.numberOfLeadingZeros(nv / 30L))
    val emb = Synth.embeddings(spark, nv, dims = 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    emb.count()
    for (r <- 1 to reps) {
      val (vp, tVp) = timed(
        graft.operators.Similarity.lshPairsAbove(emb, 0.95, bits = bits, tables = 8).count())
      println(f"[dedup-probe] rep=$r cores=$cores vecs=$nv bits=$bits " +
        f"lsh_pairs=$tVp%.2fs (${nv / tVp}%.0f vecs/s, $vp pairs)")
    }
    val vFound = graft.operators.Similarity.lshPairsAbove(emb, 0.95, bits = bits, tables = 8)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val vWant = (9L until nv by 10L).map(i => (i - 2, i)).toSet
    println(f"[dedup-probe] cores=$cores vec_recall=${
      (vWant intersect vFound).size.toDouble / vWant.size}%.4f " +
      f"vec_extra=${(vFound -- vWant).size}")

    // recall vs injected ground truth (exact pairs at id%10==8, near
    // pairs at id%10==9, both anchored at id-2)
    val found = Dedup.minhashLsh(docs, k = 16, bands = 8, threshold = 0.8)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = (8L until n by 10L).map(i => (i - 2, i)).toSet
    val nearPairs = (9L until n by 10L).map(i => (i - 2, i)).toSet
    def recall(want: Set[(Long, Long)]) =
      if (want.isEmpty) 1.0 else (want intersect found).size.toDouble / want.size
    println(f"[dedup-probe] cores=$cores recall_exact=${recall(exactPairs)}%.4f " +
      f"recall_near=${recall(nearPairs)}%.4f " +
      f"extra_pairs=${(found -- exactPairs -- nearPairs).size}")

    // clustering + keeper dedup over the full pair graph (the terminal
    // dedup stage): time the component fixpoint and verify the kept
    // corpus drops exactly one doc per injected pair
    for (r <- 1 to reps) {
      val pairs = Dedup.minhashLsh(docs, k = 16, bands = 8, threshold = 0.8)
      val (kept, tCl) = timed(Dedup.dedupByPairs(docs, pairs).count())
      println(f"[dedup-probe] rep=$r cores=$cores cluster_dedup=$tCl%.2fs " +
        f"(${n / tCl}%.0f docs/s, kept=$kept of $n)")
    }
    // components over the SAME collected pair set (no 5th pipeline
    // run, and no implicit assumption that two independent LSH runs
    // agree), cross-checked against the driver-side union-find
    import spark.implicits._
    val comp = Dedup.components(found.toSeq.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uf = new UnionFindRef
    found.foreach { case (a, b) => uf.union(a, b) }
    val involved = found.flatMap(p => Seq(p._1, p._2))
    val mismatches = involved.count(d => comp.get(d) != Some(uf.find(d)))
    println(f"[dedup-probe] cores=$cores clusters=${comp.values.toSet.size} " +
      f"docs_in_pairs=${involved.size} union_find_mismatches=$mismatches")
    spark.stop()
  }
}

/** Driver-side union-by-min union-find — the independent reference the
  * probe and DedupSpec check [[graft.operators.Dedup.components]]
  * against (union-by-min ⇒ every root is its component's min id, the
  * same fixpoint min-label propagation converges to). `find` is
  * ITERATIVE with full path compression: union-by-min alone can build
  * chain-deep trees, and a recursive find would stack-overflow on a
  * long transitive near-dup run at probe scale.
  */
final class UnionFindRef {
  private val parent = scala.collection.mutable.Map[Long, Long]()

  def find(x: Long): Long = {
    var r = x
    while (parent.getOrElse(r, r) != r) r = parent(r)
    var c = x
    while (c != r) { val n = parent.getOrElse(c, c); parent(c) = r; c = n }
    r
  }

  def union(a: Long, b: Long): Unit = {
    val ra = find(a)
    val rb = find(b)
    if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
  }
}
