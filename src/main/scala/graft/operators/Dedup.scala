package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
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
      // shuffle the 16-byte binary digest, not the 32-char hex string
      // (halves key bytes; unhex∘md5 is a bijection of md5's image so
      // the grouping is identical), and re-hex only the collapsed
      // group keys — lower(hex(unhex(x))) = x for md5's lowercase hex
      .select(col("doc_id"), unhex(md5(col("text"))).as("_h"))
      .groupBy(col("_h"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("dup_count"))
      .select(lower(hex(col("_h"))).as("text_hash"),
        col("keeper_doc_id"), col("dup_count"))

  /** MinHash signatures: `k` universal-hash min-hashes over 3-word
    * shingles (one row per doc, computed in a single map pass — no
    * shuffle). Each shingle is md5-hashed ONCE; the k functions are
    * cheap arithmetic derives (see [[TextFunctions.minhashUniversal]]).
    */
  def minhashSignatures(docs: DataFrame, k: Int): DataFrame = {
    // deliberately NO ScanSpread here: the fused shingle-hash +
    // minhash pass is cheap per row (one md5 per shingle, arithmetic
    // derives), and several callers build MULTIPLE signature
    // sub-pipelines per query (calibration's two estimate sides,
    // decontamination's two corpora) — same-phase A/B measured the
    // per-sub-pipeline spread exchange as a net loss (q133 1.12 s
    // without vs 1.87 s with; q34/q35 similar), while the genuinely
    // expensive passes (regexp stats, winnowing, bloom probes) keep
    // their spread
    val hs = docs.select(
      col("doc_id"), graft.functions.TextOps.shingleHashes3(col("text")).as("hs"))
    val sig = hs.select(
      col("doc_id"), graft.functions.TextOps.minhash(col("hs"), k).as("sig"))
    sig.select(
      col("doc_id") +: (0 until k).map(i => col("sig").getItem(i).as(s"mh$i")): _*)
  }

  /** LSH banding: split the k-signature into `bands` bands of k/bands
    * rows; docs sharing any band key become candidate pairs (a < b).
    * The band group-by shuffles only (band_key, doc_id).
    *
    * Hot-bucket guard (`maxBucket`): a degenerate band key (empty docs,
    * boilerplate) would make pairwise expansion quadratic in that
    * bucket's size. Buckets larger than `maxBucket` fall back to STAR
    * pairing — every member pairs with the bucket's min doc_id only —
    * which is linear and preserves dedup connectivity (all members stay
    * in one connected component for union-find clustering); the
    * trade-off, documented here, is that a non-representative pair
    * inside a hot bucket is only found via its representative. No
    * bucket is ever materialized as a single array on one reducer: the
    * stats aggregation is a partial-agg count/min, and pairing is a
    * bucket-key self-join.
    */
  /** Band-key fold constants — shared with [[graft.OracleSqlGen]] so
    * both engines compute the identical NUMERIC band key:
    * `bk = fold(band, mh…) of (acc·M + v) mod P31`. Products stay
    * < 2^52, wrap-free on 64-bit engines (DuckDB errors on overflow).
    * A numeric key sorts/compares ~10× cheaper through the bucket
    * shuffle than the old concatenated hex-string key (measured on the
    * 2M-doc probe: the banded window sort dominated the stage); key
    * collisions (≈ n²/2³² per band) only create false CANDIDATES,
    * which exact verification filters — and the oracle mirrors the
    * same keys anyway.
    */
  val bandFoldM = 1000003L
  val bandFoldP = 2147483647L

  /** Above this cap, [[pairsFromBuckets]] switches to the segmented
    * parallel expansion (an exhaustive-mode bucket can hold the whole
    * corpus — expanding it as one array would serialize the quadratic
    * stage on one task); at or below it, buckets are small and many,
    * and the zero-exchange single-array expansion wins.
    */
  val parallelExpandThreshold = 1024

  /** Segment size of the parallel expansion: each work unit expands at
    * most segSize² pairs, so units spread evenly over task slots.
    */
  val expandSegSize = 128

  def lshCandidatePairs(signatures: DataFrame, k: Int, bands: Int,
      maxBucket: Int = 64): DataFrame =
    pairsFromBuckets(bandedKeys(signatures, k, bands, "doc_id"), maxBucket)

  /** The ONE band-key derivation (numeric fold over the signature
    * columns, exploded to (id, bk) rows) — shared by the self-dedup
    * pairing and [[decontaminate]]'s cross-corpus join so the two
    * paths can never diverge from each other or from the oracle's
    * mirror of the same fold.
    *
    * NULL keys are dropped here, once, for every caller: a NULL-text
    * doc (or an empty user-supplied hash array on the SQL face) has a
    * NULL minhash signature by pin, so its fold is NULL in every
    * band. SQL equi-joins (the oracle, and [[decontaminate]]'s `bk`
    * join) never match NULL keys, but Spark's `Window.partitionBy(bk)`
    * in [[pairsFromBuckets]] groups NULLs into ONE bucket — without
    * this filter every NULL-signature doc would pair with every other
    * one (pairs the oracle never emits, with undefined jaccards in
    * verification).
    */
  private[operators] def bandedKeys(signatures: DataFrame, k: Int,
      bands: Int, idName: String): DataFrame = {
    val rowsPerBand = k / bands
    require(bands * rowsPerBand == k, s"bands=$bands must divide k=$k")
    val bandExprs = (0 until bands).map { b =>
      (0 until rowsPerBand).foldLeft(lit(b.toLong).cast("long")) { (acc, r) =>
        (acc * bandFoldM + col(s"mh${b * rowsPerBand + r}")) % bandFoldP
      }
    }
    signatures.select(col("doc_id").as(idName),
      explode(array(bandExprs: _*)).as("bk"))
      .filter(col("bk").isNotNull)
  }

  /** Shared banded-pairing kernel, built around ONE shuffle of
    * (bk, doc_id, extra…) that every branch reuses:
    *
    *  - a window over `bk` computes each row's bucket size `n` and the
    *    bucket representative (min doc_id + its `extra` values);
    *  - buckets of size in (1, maxBucket]: `collect_list` per bucket —
    *    now PROVABLY bounded by the cap, so the array-explode pairwise
    *    expansion is safe (the round-1 uncapped version could
    *    materialize a whole degenerate bucket on one reducer) — and the
    *    group-by runs on the window's existing bk partitioning, adding
    *    no exchange;
    *  - buckets beyond the cap: star pairs (rep, member) by pure
    *    filter+project — linear, no join, no array.
    *
    * Both branches hang off the same Exchange(bk), which Spark's
    * exchange-reuse dedupes — the (expensive) signature computation
    * below it runs once, not once per branch. `extra` columns (e.g.
    * signatures/embeddings) ride along into the output as `<c>_a/<c>_b`.
    */
  private[operators] def pairsFromBuckets(banded: DataFrame, maxBucket: Int,
      extra: Seq[String] = Seq.empty,
      /** false → caller dedupes cross-band repeats itself; use when the
        * `extra` columns are wide (e.g. embeddings) and a distinct over
        * them would shuffle the payload — score first, dedupe scalars.
        */
      distinctOutput: Boolean = true): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("bk"))
    val stat = extra.foldLeft(
      banded
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("rep", min(col("doc_id")).over(w))
        .filter(col("n") > 1)) { (df, c) =>
      df.withColumn(s"rep_$c", min_by(col(c), col("doc_id")).over(w))
    }
    val bucketArrs = stat.filter(col("n") <= maxBucket)
      .groupBy(col("bk"))
      .agg(sort_array(collect_list(struct(col("doc_id") +: extra.map(col): _*)))
        .as("ids"))
    val pairProj: Seq[Column] =
      col("p.a.doc_id").as("doc_a") +: col("p.b.doc_id").as("doc_b") +:
        extra.flatMap(c => Seq(col(s"p.a.$c").as(s"${c}_a"), col(s"p.b.$c").as(s"${c}_b")))
    val pairsSmall =
      if (maxBucket <= parallelExpandThreshold)
        // capped path (every production caller): buckets are provably
        // ≤ maxBucket members, the pairwise expansion is bounded and
        // runs on the window's existing bk partitioning — no extra
        // exchange, parallel across the many buckets
        bucketArrs
          .select(explode(expr(
            "flatten(transform(ids, (a, i) -> transform(slice(ids, i + 2, size(ids)), b -> struct(a, b))))"))
            .as("p"))
          .select(pairProj: _*)
      else {
        // UNCAPPED path (the exhaustive verification twins, e.g. q40's
        // bits=0 single all-pass bucket): one bucket holds the whole
        // corpus, so the single-array expansion above would build and
        // score all C(n,2) pairs IN ONE TASK — the quadratic stage
        // serializes on one core however many the cluster has. Split
        // each bucket's sorted array into fixed segments and emit one
        // WORK UNIT per segment pair (g1 ≤ g2, each carrying only its
        // two slices), exchange the units across the cluster (explicit
        // partition count: AQE would coalesce these few small-byte
        // rows back to one partition, defeating the point), then
        // expand per unit: positional i<j pairs within a segment, full
        // A×B across segments — exactly the global i<j pair set of the
        // sorted array, in ≤ segSize² chunks. Unit payload totals
        // O(n·nseg) bytes vs the O(n²) pair output — the exchange is
        // asymptotically free next to the expansion it parallelizes.
        val s = expandSegSize
        val nseg = s"cast(ceil(size(ids) / $s.0) as int)"
        val units = bucketArrs
          .select(col("bk"), explode(expr(
            s"""flatten(transform(sequence(0, $nseg - 1), g1 ->
               |  transform(sequence(g1, $nseg - 1), g2 -> struct(
               |    g1 as g1, g2 as g2,
               |    slice(ids, g1 * $s + 1, $s) as sa,
               |    slice(ids, g2 * $s + 1, $s) as sb))))""".stripMargin))
            .as("u"))
          .repartition(banded.sparkSession.sparkContext.defaultParallelism,
            col("bk"), col("u.g1"), col("u.g2"))
        units
          .select(explode(when(col("u.g1") === col("u.g2"),
            expr("flatten(transform(u.sa, (a, i) -> transform(slice(u.sa, i + 2, size(u.sa)), b -> struct(a, b))))"))
            .otherwise(
              expr("flatten(transform(u.sa, a -> transform(u.sb, b -> struct(a, b))))")))
            .as("p"))
          .select(pairProj: _*)
      }
    val pairsBig = stat.filter(col("n") > maxBucket && col("doc_id") =!= col("rep"))
      .select(col("rep").as("doc_a") +: col("doc_id").as("doc_b") +:
        extra.flatMap(c => Seq(col(s"rep_$c").as(s"${c}_a"), col(c).as(s"${c}_b"))): _*)
    val outCols = Seq("doc_a", "doc_b") ++ extra.flatMap(c => Seq(s"${c}_a", s"${c}_b"))
    // doc_a =!= doc_b: a numeric-fold key collision between two bands
    // of the SAME doc (P ≈ C(bands,2)/2³¹ per doc — expected hits at
    // 10¹⁰ docs) puts that doc_id in one bucket twice, and the
    // slice-pairing would emit a (x, x) self-pair that `distinct` does
    // NOT remove and the oracle's `a.doc_id < b.doc_id` join never
    // produces. Struct-keyed callers (simhash chunks, per-table LSH
    // buckets) cannot collide this way; the guard is here so every
    // caller is safe by construction.
    val unioned = pairsSmall.select(outCols.map(col): _*)
      .union(pairsBig.select(outCols.map(col): _*))
      .filter(col("doc_a") =!= col("doc_b"))
    if (distinctOutput) unioned.distinct() else unioned
  }

  /** n-gram (3-word shingle) Jaccard for given candidate pairs: join
    * shingle sets only for candidates, never all-pairs. Docs are
    * semi-joined to the candidate ids BEFORE shingling — candidate
    * pairs are a vanishing fraction of the corpus, so materializing
    * shingle arrays corpus-wide (measured at 19% of the whole bench
    * suite) is wasted work for every non-candidate document. The sets
    * intersected are the 28-bit shingle HASHES (the same native
    * [[graft.functions.ShingleHash3]] the signatures use), not shingle
    * strings — long arrays allocate ~10× less than rebuilt 3-word
    * strings, and a within-doc hash collision (P ≈ n²/2²⁹ ≈ 6e-6 at 60
    * words) shifts a jaccard value by at most 1/|union|; the oracle
    * computes the identical hashed form, so verification stays exact.
    */
  def jaccardVerify(docs: DataFrame, pairs: DataFrame, threshold: Double): DataFrame = {
    val ids = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
    // lazy pin: `sh` is joined twice (doc_a side, doc_b side) and each
    // join would otherwise re-run the semi-join + shingle pass; the
    // frame is candidate-docs-only (tiny by construction), so the pin
    // piggy-backs the first consumer's action — same caller-released
    // lifecycle as the candidate persist in minhashLsh
    val sh = docs.join(ids, Seq("doc_id"), "left_semi").select(
      col("doc_id"),
      array_distinct(graft.functions.TextOps.shingleHashes3(col("text"))).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni",
        (size(col("sh_a")) + size(col("sh_b"))).cast("double") - col("inter"))
      // uni=0 (two degenerate docs with empty shingle sets) cannot
      // arise from LSH candidacy since bandedKeys drops NULL keys, but
      // caller-supplied pairs can still contain one: jaccard is
      // UNDEFINED there, so emit NULL (dropped by the >= filter)
      // rather than evaluating 0/0.
      .withColumn("jaccard",
        when(col("uni") > 0, round(col("inter") / col("uni"), 6)))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Full MinHash+LSH near-dup pipeline.
    *
    * `materializeCandidates` (default on): the candidate-pair frame is
    * referenced three times by the verify stage (two id projections +
    * the pair join), and Spark does not reuse the banding exchanges
    * across those branches — re-deriving signatures+banding 3× was
    * measured at ~3× the one-pass cost on a 500k-doc corpus. The pair
    * set is small BY CONSTRUCTION (it is the thing dedup must
    * materialize anyway), so it is pinned once with a LAZY
    * MEMORY_AND_DISK persist: unlike the localCheckpoint this replaces,
    * nothing runs until an action needs it, and the retained lineage
    * means a lost executor recomputes the lost blocks instead of
    * permanently failing the query (localCheckpoint truncates lineage —
    * documented-unsafe under churn, which made the SAFE mode opt-in on
    * the one path that claims 100 TB). Cache lifecycle is the CALLER's:
    * the returned frame is lazy, so the pin cannot be released inside
    * this function — after the consuming action, release it with
    * `spark.sharedState.cacheManager.clearCache()` (what Bench/Verify
    * do between queries) or let LRU age it out in a session that keeps
    * querying the same corpus.
    */
  def minhashLsh(docs: DataFrame, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.7, materializeCandidates: Boolean = true): DataFrame = {
    val cand = lshCandidatePairs(minhashSignatures(docs, k), k, bands)
    val pairs =
      if (materializeCandidates)
        cand.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else cand
    jaccardVerify(docs, pairs, threshold)
  }

  /** Connected components of a near-dup pair graph — the step that
    * turns pairwise similarity into DEDUP DECISIONS: every doc in a
    * component is a near-dup of the others (transitively), and the
    * component id (the component's min doc_id) is the canonical
    * "keeper". Iterated min-label propagation: `label(x) ← min(label(x),
    * min over neighbors' labels)` until fixpoint, one edge-join +
    * min-aggregation shuffle per iteration over the PAIR graph only
    * (vanishingly small next to the corpus — it is the output dedup
    * already materializes). Iteration count is bounded by component
    * diameter: [[pairsFromBuckets]] emits cliques (diameter 1) and
    * hot-bucket stars (diameter 2), so chains only arise from genuine
    * transitive near-dup runs; `maxIters` caps adversarial inputs and
    * non-convergence throws rather than returning a silently split
    * component. Deterministic: min over ids everywhere.
    *
    * Output: (doc_id, component) for every doc incident to a pair.
    * Singletons are absent — [[dedupByPairs]] treats them as their own
    * keeper via left join.
    */
  def components(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist(lvl)
    // localCheckpoint per iteration: a persist alone keeps the FULL
    // iterative lineage, whose plan doubles every round (labels appears
    // under both the propagation join and the convergence check) — by
    // ~10 iterations planning itself OOMs. Truncation trades lineage
    // recovery for bounded plans, the standard iterative-graph
    // trade-off (GraphX checkpoints the same way): on executor loss the
    // operator fails and a rerun recomputes deterministically, rather
    // than replaying an exponentially deep lineage.
    //
    // (an r6 experiment removed the init checkpoint and folded the
    // convergence count into the checkpoint action as an observe()
    // metric — fewer jobs on paper, but same-phase A/B measured it
    // flat-to-slower locally, so the simpler shape stays; guide §1.1:
    // evidence over theory)
    var labels = e
      .groupBy(col("src").as("doc_id"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("doc_id"), least(col("doc_id"), col("nmin")).as("component"))
      .localCheckpoint(true)
    try {
      var it = 0
      var converged = false
      while (!converged && it < maxIters) {
        val viaNbr = e
          .join(labels.select(col("doc_id").as("dst"), col("component")), "dst")
          .select(col("src").as("doc_id"), col("component"),
            lit(null).cast("long").as("prev"))
        // the OLD label rides through the same aggregation (max ignores
        // the propagation rows' nulls; every doc_id has exactly one
        // labels row), so convergence is a trivial filter-count on the
        // checkpointed result instead of a second shuffle join per
        // iteration
        val next = labels
          .select(col("doc_id"), col("component"), col("component").as("prev"))
          .union(viaNbr)
          .groupBy("doc_id")
          .agg(min("component").as("component"), max("prev").as("prev"))
          .localCheckpoint(true)
        val changed = next.filter(col("component") =!= col("prev")).count()
        // no explicit unpersist: localCheckpoint pins at the RDD level,
        // where Dataset.unpersist is a no-op — superseded iterations
        // become unreferenced here and the ContextCleaner reclaims
        // their blocks (label frames are pair-graph-sized, tiny next to
        // the corpus, so the transient overlap is bounded and small)
        labels = next.select("doc_id", "component")
        converged = changed == 0
        it += 1
      }
      require(converged,
        s"components did not converge within $maxIters iterations — " +
          "component diameter exceeds the cap (raise maxIters)")
      labels
    } finally e.unpersist()
  }

  /** The dedup pipeline's terminal operator: drop every non-keeper of
    * each near-dup component, keeping the component's min doc_id (and
    * all singletons). Corpus-side cost is ONE left join against the
    * (tiny) component map — the corpus itself never shuffles wide
    * columns.
    */
  def dedupByPairs(docs: DataFrame, pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val comp = components(pairs, maxIters)
    docs.join(comp, Seq("doc_id"), "left")
      .filter(col("component").isNull || col("component") === col("doc_id"))
      .drop("component")
  }

  /** 60-bit SimHash over whitespace tokens with count weights, computed
    * by the native [[graft.functions.SimhashText]] expression in one
    * map pass — NO token shuffle (the declarative groupBy(doc, tok)
    * form shuffles every token row; it survives as
    * [[simhashDeclarative]], which the oracle mirrors and a DedupSpec
    * parity test pins bit-equal). Bit j set ⇔ Σ count·(±1 by token
    * bit j) > 0, token hash = md5-hex→BIGINT cross-engine trick.
    */
  def simhash(docs: DataFrame, bits: Int = 60): DataFrame =
    // no ScanSpread (same-phase A/B: the native simhash pass is cheap
    // enough that the spread exchange cost ~2× the win at sf0.1 —
    // q25 0.44 s → 0.89 s with it; the minhashSignatures rationale)
    docs.select(col("doc_id"),
      graft.functions.TextOps.simhash(col("text"), bits).as("simhash"))

  /** Declarative simhash — the form the DuckDB oracle mirrors term for
    * term; kept as the parity reference for the native expression.
    */
  private[operators] def simhashDeclarative(docs: DataFrame, bits: Int = 60): DataFrame = {
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
    * Same hot-bucket guard as [[lshCandidatePairs]]: a degenerate chunk
    * key (thousands of near-empty docs → simhash 0) falls back to star
    * pairing against the bucket's min-id member instead of going
    * quadratic.
    */
  def simhashPairs(sigs: DataFrame, bits: Int = 60, maxDist: Int = 3,
      maxBucket: Int = 64): DataFrame = {
    val chunks = 4
    val w = bits / chunks
    val mask = (1L << w) - 1
    // numeric band key: chunk index in the high bits, chunk value below
    val banded = sigs.select(
      col("doc_id"), col("simhash"),
      explode(array((0 until chunks).map(c =>
        lit(c.toLong * (mask + 1)) +
          shiftright(col("simhash"), c * w).bitwiseAND(lit(mask))): _*))
        .as("bk"))
    // no second distinct: pairsFromBuckets already dedupes on
    // (doc_a, doc_b, simhash_a, simhash_b), and the hamming projection
    // is a function of those — another distinct() would re-shuffle the
    // whole candidate set for zero semantic effect
    pairsFromBuckets(banded, maxBucket, extra = Seq("simhash"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("simhash_a").bitwiseXOR(col("simhash_b"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Test-set decontamination: flag every corpus document that is a
    * near-duplicate of a BENCHMARK document — the cross-corpus variant
    * of [[minhashLsh]], and the dedup operation a training pipeline
    * runs before every release (eval contamination is a one-sided
    * error: a missed near-dup silently inflates benchmark scores).
    *
    * Same primitives as the self-dedup path (shingle→minhash→band fold,
    * constants shared with the oracle), but the PAIRING is a corpus×
    * benchmark band join, not a self-join — and because the benchmark
    * side is small by definition, its banded signatures BROADCAST: the
    * corpus is never shuffled at all (candidate discovery is map-side),
    * which is what makes the operator affordable as a routine gate at
    * 100 TB where even one corpus exchange would dominate the run.
    * Candidate volume is bounded by the benchmark's band table (each
    * corpus row can match at most the broadcast side), so no
    * [[pairsFromBuckets]]-style quadratic guard is needed; degenerate
    * keys (empty/boilerplate text) cost at most |benchmark| matches
    * per corpus doc, which the verify stage then filters exactly.
    *
    * Verification is the [[jaccardVerify]] exact n-gram check, computed
    * only for candidate corpus docs (left-semi prune before shingling);
    * each flagged doc reports its BEST match — max jaccard, bench_id
    * tie-break — so the output is one row per contaminated doc:
    * `(doc_id, bench_id, jaccard)`. Recall follows the LSH band curve
    * exactly as in self-dedup (bounded in DedupSpec); the oracle
    * mirrors bands AND verification term for term, so the driver check
    * is hash-exact including recall behavior.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, k: Int = 16,
      bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    // the candidate frame feeds TWO branches (the left-semi prune and
    // the verify join); without a pin each branch re-derives the
    // corpus-wide shingle-md5 + minhash + banding — the measured ~3×
    // re-derivation the minhashLsh persist exists for. Same lazy
    // MEMORY_AND_DISK pin, same caller-released lifecycle (see the
    // minhashLsh scaladoc).
    val cand = bandedKeys(minhashSignatures(corpus, k), k, bands, "doc_id")
      .join(broadcast(
        bandedKeys(minhashSignatures(benchmark, k), k, bands, "bench_id")),
        Seq("bk"))
      .select(col("doc_id"), col("bench_id"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def sets(docs: DataFrame, idName: String, shName: String): DataFrame =
      docs.select(col("doc_id").as(idName),
        array_distinct(graft.functions.TextOps.shingleHashes3(col("text")))
          .as(shName))
    val setsC = sets(
      corpus.join(cand.select("doc_id").distinct(), Seq("doc_id"), "left_semi"),
      "doc_id", "_sa")
    val setsB = sets(benchmark, "bench_id", "_sb")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("jaccard").desc, col("bench_id"))
    cand
      .join(setsC, Seq("doc_id"))
      .join(broadcast(setsB), Seq("bench_id"))
      .withColumn("_i", size(array_intersect(col("_sa"), col("_sb"))).cast("double"))
      .withColumn("_u",
        (size(col("_sa")) + size(col("_sb"))).cast("double") - col("_i"))
      // same undefined-jaccard guard as jaccardVerify: NULL, not 0/0
      .withColumn("jaccard", when(col("_u") > 0, round(col("_i") / col("_u"), 6)))
      .filter(col("jaccard") >= threshold)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("doc_id"), col("bench_id"), col("jaccard"))
  }

  /** MinHash calibration audit: for every banded candidate pair, the
    * signature-ESTIMATED jaccard (fraction of agreeing minhash
    * components — the unbiased estimator LSH thresholds actually act
    * on) next to the EXACT shingle jaccard, plus their absolute error.
    * This is the tuning report behind every (k, bands, threshold)
    * choice in the dedup family: the estimator's observed error
    * distribution on the real corpus tells you whether k is large
    * enough for the band curve you assumed, BEFORE a production run
    * trusts it — sketch-calibration as a first-class query, the same
    * audit posture as [[graft.operators.SnapshotDiff]] for rollups.
    *
    * NULL signatures (empty/short docs — minhash of an empty hash
    * array is NULL by pin) produce NULL band keys in every band, and
    * [[bandedKeys]] drops NULL keys before bucketing, so degenerate
    * docs are never candidates and never reach the report — matching
    * the oracle, whose `a.bk = b.bk` equi-join can't match NULL keys
    * either. Candidate discovery reuses the banded kernel
    * verbatim (star guard included); the oracle mirrors signatures,
    * banding, star guard, and both divisions term for term.
    *
    * Plan: the candidate frame is referenced by the estimate join AND
    * the verify's three uses — same lazy pin + caller-released
    * lifecycle as [[minhashLsh]]. Signature recomputation for the two
    * estimate sides is map-side only; pairs (vanishing vs corpus) are
    * the only joined rows.
    */
  def minhashCalibration(docs: DataFrame, k: Int = 16, bands: Int = 4,
      maxBucket: Int = 64): DataFrame = {
    // the estimate stage needs each candidate pair's TWO signatures,
    // recomputed corpus-wide per estimate side and joined back. Two r6
    // alternatives were built and A/B-measured same-phase: (a) semi-
    // join the corpus to candidate ids before the estimate signature
    // passes — fewer corpus passes, but two extra join sub-pipelines
    // of fixed overhead; (b) ride the signature columns through the
    // banding as pairsFromBuckets `extra` columns — zero extra passes,
    // but k extra min_by window aggregates + k-wide collect structs in
    // the shared pairing kernel. BOTH measured slower end-to-end than
    // this shape at sf0.1 (1.12 s vs 1.84 s / 2.26 s): the signature
    // map passes are cheap codegen (and ScanSpread now parallelizes
    // them), while extra joins/window-aggs are fixed serial overhead.
    // At corpus scales where the repeated signature pass would
    // dominate, variant (a) is the documented path — see
    // OPTIMIZATION_r06.md "not yet optimized".
    // lazy pin on the signature frame: it feeds the candidate pipeline
    // AND both estimate sides — without the pin each reference re-runs
    // the corpus shingle-md5 + minhash pass (3× total). The pin adds
    // no job (the cand materialization populates it in passing) and no
    // joins — unlike the two measured-and-rejected restructurings
    // documented below. Footprint note: the cached table is corpus ×
    // (k+1) longs (MEMORY_AND_DISK — spills, never OOMs); at corpus
    // scales where even the spilled footprint is unwelcome, switch the
    // estimate sides to the candidate-pruned variant instead (prune
    // docs to candidate ids, recompute signatures on the pruned set).
    val sigs = minhashSignatures(docs, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = lshCandidatePairs(sigs, k, bands, maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def side(name: String) = sigs.select(
      col("doc_id").as(name) +:
        (0 until k).map(i => col(s"mh$i").as(s"_${name}_$i")): _*)
    val agree = (0 until k).map(i =>
      when(col(s"_doc_a_$i") === col(s"_doc_b_$i"), lit(1)).otherwise(lit(0)))
      .reduce(_ + _)
    val est = cand
      .join(side("doc_a"), Seq("doc_a"))
      .join(side("doc_b"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(agree.cast("double") / lit(k.toDouble), 6).as("est_jaccard"))
    val exact = jaccardVerify(docs, cand, threshold = 0.0)
    est.join(exact, Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        col("jaccard").as("exact_jaccard"),
        round(abs(col("est_jaccard") - col("jaccard")), 6).as("abs_err"))
  }

  /** Dynamic-shift `1L << amount` — the Scala `functions.shiftleft`
    * wrapper only takes a literal Int amount, but the underlying
    * Catalyst ShiftLeft takes any expression; bridge it so the bloom
    * bit masks stay inside whole-stage codegen (a UDF here would break
    * the map-side prescreen's codegen span).
    */
  private def shiftLeftDyn(value: Column, amount: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
    column(org.apache.spark.sql.catalyst.expressions.ShiftLeft(
      expression(value), expression(amount)))
  }

  /** k bloom probe bit-positions for one shingle hash, via standard
    * double hashing `h1 + i*h2 (mod numBits)` (Kirsch–Mitzenmacher).
    * Both base hashes are folded into [0, 2³¹) BEFORE the linear
    * combination so `h1 + i*h2` can never overflow a long — Spark 4
    * runs ANSI mode, where a wrapping overflow is a runtime error, not
    * a quiet reseed. h2 is forced odd so the probe stride is coprime
    * with the power-of-two bit count.
    */
  private def bloomProbes(h: Column, numBits: Int, numHashes: Int): Column = {
    val h1 = pmod(xxhash64(h), lit(1L << 31))
    val h2 = pmod(xxhash64(h, lit(graft.functions.TextOps.bloomSalt)),
      lit(1L << 31)).bitwiseOR(lit(1L))
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => pmod(h1 + i.cast("long") * h2, lit(numBits.toLong)))
  }

  /** Bloom-filter bitset over a benchmark corpus's distinct 3-word
    * shingle hashes, as a ONE-row frame `(bloom: array<bigint>)` of
    * exactly `numBits/64` packed words — DENSE, so the prescreen's
    * probe reads are O(1) indexed `element_at`s (default 2¹⁸ bits =
    * 32 KB on the broadcast wire; even 2²² bits is half a megabyte).
    *
    * This is a mergeable, reusable ARTIFACT in the q121/q123 histogram
    * sense: `bit_or` over word indices is associative and commutative,
    * so partial bitsets from benchmark shards combine map-side, the
    * only exchange carries at most `numBits/64` (word, mask) rows, and
    * bitsets built from different benchmark snapshots union with the
    * same `bit_or`. At 100 TB the artifact is built ONCE per benchmark
    * release (the benchmark side is small by definition) and then
    * broadcast to every curation run — a few hundred KB on the wire
    * instead of re-shuffling benchmark shingles per run.
    */
  /** The dense word array itself, materialized DRIVER-side: the
    * distributed part is the map-side probe + ONE `bit_or` exchange of
    * at most `numBits/64` (word, mask) rows; collecting those summary
    * rows is an O(metadata) planning action (the IVF-centroid
    * precedent — `Similarity.trainCentroids` collects nlist×dims the
    * same way), and the plain-Scala densify replaces what was an
    * in-plan `transform(sequence(...), element_at(map))` costing
    * numWords × mapSize INTERPRETED map scans — measured 21.5 s of the
    * 22 s q127 cold pass at 2¹⁸ bits before this change, 0 after.
    */
  def bloomBitsArray(benchmark: DataFrame, numBits: Int = 1 << 18,
      numHashes: Int = 3): Array[Long] = {
    require(numBits >= 64 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    require(numHashes >= 1 && numHashes <= 16,
      s"numHashes must be in [1,16], got $numHashes")
    val sparse = benchmark
      .select(explode(graft.functions.TextOps.shingleHashes3(col("text")))
        .as("_h"))
      .select(explode(bloomProbes(col("_h"), numBits, numHashes)).as("_bit"))
      .select(shiftright(col("_bit"), 6).cast("int").as("_w"),
        shiftLeftDyn(lit(1L), pmod(col("_bit"), lit(64L)).cast("int")).as("_m"))
      .groupBy(col("_w"))
      .agg(expr("bit_or(_m)").as("_m"))
      .collect()
    val arr = new Array[Long](numBits / 64)
    sparse.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** The persistable artifact form: ONE row `(bloom, num_hashes)` —
    * the hash count rides IN the artifact because probing with a
    * different count than the build silently breaks the no-false-
    * negative guarantee (probe index i ≥ build's k hits positions
    * never set → genuinely present shingles test absent → missed
    * contamination). [[bloomArtifactArray]] reads both back and the
    * serving paths use the STORED count, never a caller guess.
    */
  def bloomBits(benchmark: DataFrame, numBits: Int = 1 << 18,
      numHashes: Int = 3): DataFrame = {
    val arr = bloomBitsArray(benchmark, numBits, numHashes)
    val spark = benchmark.sparkSession
    import spark.implicits._
    Seq((arr.toSeq, numHashes)).toDF("bloom", "num_hashes")
  }

  /** Test-set decontamination with a bloom-filter prescreen — the
    * EXACT-recall sibling of [[decontaminate]] and its 100 TB fast
    * path. Where the banded-minhash form trades recall for candidate
    * volume (the LSH band curve), this form is provably lossless:
    *
    *   - a bloom filter has NO false negatives, so for any corpus doc
    *     the count of bloom-hit shingles is ≥ its true shingle
    *     intersection with EVERY benchmark doc;
    *   - jaccard(A,B) ≥ t implies |A∩B| ≥ t·|A|/(1+t)  (from
    *     i ≥ t·(a+b−i) and b ≥ i);
    *   - therefore keeping docs with `hits·(1+t) ≥ t·|A| − ε` keeps a
    *     strict superset of every doc with a qualifying match, and the
    *     exact verify stage then reproduces the full-cross-product
    *     answer while scoring only survivors.
    *
    * So the driver oracle for this operator is the EXACT all-pairs
    * decontamination (no band curve to mirror) — bloom parameters can
    * only change the cost, never the output. False positives cost one
    * exact verify each; at the default 2¹⁸ bits / 3 hashes the FPR at
    * benchmark scales this engine tests is < 1e-3 (bounded in
    * DedupSpec).
    *
    * Plan shape at 100 TB: the corpus is touched ONCE, map-side — the
    * bloom rides in as a broadcast single row and the prescreen is a
    * codegen'd filter; only survivor shingles (a vanishing fraction)
    * enter the pairing exchange, and the benchmark side of that join
    * broadcasts. Corpus text/shingles for non-matching docs never
    * reach the wire, same as [[decontaminate]], but with exact recall
    * and a reusable artifact ([[bloomBits]]) instead of a per-run
    * signature table.
    *
    * Output contract matches [[decontaminate]]: one row per
    * contaminated doc, `(doc_id, bench_id, jaccard)`, best match by
    * (jaccard DESC, bench_id).
    *
    * NOTE: the bitset is materialised EAGERLY at call time (an action
    * over `benchmark`, same as the IVF k-means centroids in
    * [[Similarity.ivfTopK]]) and embedded as a literal — the returned
    * frame does NOT re-read `benchmark`'s bloom side on execution. A
    * benchmark that changes between this call and the action sees the
    * stale bitset in the prescreen (never in the exact verify, which
    * joins the live frame) — rebuild the plan after benchmark updates.
    */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
      threshold: Double = 0.5, numBits: Int = 1 << 18,
      numHashes: Int = 3): DataFrame =
    decontaminateBloomWith(corpus, benchmark,
      bloomBitsArray(benchmark, numBits, numHashes), threshold, numHashes)

  /** [[decontaminateBloom]] with a PREBUILT bitset — the
    * build-once-per-benchmark-release path the [[bloomBits]] artifact
    * doctrine promises: the benchmark side is small and changes
    * rarely, so a curation loop that decontaminates many corpus
    * shards should pay the bitset build (a benchmark scan + one
    * `bit_or` exchange) ONCE, persist the one-row artifact, and hand
    * the words back here per run. This overload is a pure plan
    * constructor: it runs NO Spark job (DedupSpec pins that), and
    * `numBits` is implied by the array length; `numHashes` MUST be
    * the value the bitset was built with (probing with a larger count
    * tests unset positions and forfeits the no-false-negative
    * guarantee) — prefer [[decontaminateBloomArtifact]], which reads
    * the count from the artifact itself. `benchmark` is still
    * read lazily by the exact verify join — only the PRESCREEN bits
    * are precomputed, so a stale artifact can cost extra exact
    * verifies (bloom false positives) but can lose matches ONLY if
    * the live benchmark gained docs since the build — same staleness
    * contract as [[decontaminateBloom]]'s call-time snapshot,
    * documented there.
    */
  def decontaminateBloomWith(corpus: DataFrame, benchmark: DataFrame,
      bloom: Array[Long], threshold: Double = 0.5,
      numHashes: Int = 3): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    require(bloom.nonEmpty, "bloom artifact must be non-empty")
    require(numHashes >= 1 && numHashes <= 16,
      s"numHashes must be in [1,16], got $numHashes")
    val numBits = bloom.length * 64
    val bloomArr = bloom
    def sets(docs: DataFrame, idName: String): DataFrame =
      docs.select(col("doc_id").as(idName),
        array_distinct(graft.functions.TextOps.shingleHashes3(col("text")))
          .as("_s"))
    // setsB feeds two broadcast joins; a cache pin here measured
    // neutral-to-slower (broadcast builds don't amortize through the
    // columnar cache the way shuffle joins do) — left unpinned
    val setsB = sets(benchmark, "bench_id")
    // the bitset rides as a LITERAL array (the VectorOps centroid
    // reference-object pattern): the prescreen is a pure map-side
    // filter, evaluated ONCE (single consumer — no persist needed)
    // survivors carry their own set size through the explode (4 bytes
    // per shingle row), so NO self-join is needed to recover it — the
    // corpus side never meets a join until the survivor-shingle BHJ
    val pre = sets(ScanSpread.spreadForCompute(corpus), "doc_id")
      .withColumn("_hits", graft.functions.TextOps.bloomHitsCount(
        col("_s"), bloomArr, numBits, numHashes))
      .filter(col("_hits") >= lit(1) &&
        col("_hits").cast("double") * (1.0 + threshold) >=
          size(col("_s")).cast("double") * threshold - lit(1e-9))
      .select(col("doc_id"), size(col("_s")).as("_a"),
        explode(col("_s")).as("_h"))
    val inter = pre
      .join(broadcast(setsB.select(col("bench_id"), explode(col("_s")).as("_h"))),
        Seq("_h"))
      .groupBy(col("doc_id"), col("_a"), col("bench_id"))
      .agg(count(lit(1)).cast("double").as("_i"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("jaccard").desc, col("bench_id"))
    inter
      .join(broadcast(setsB.select(col("bench_id"), size(col("_s")).as("_b"))),
        Seq("bench_id"))
      .withColumn("jaccard",
        round(col("_i") / ((col("_a") + col("_b")).cast("double") - col("_i")), 6))
      .filter(col("jaccard") >= threshold)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("doc_id"), col("bench_id"), col("jaccard"))
  }

  /** Load a persisted [[bloomBits]] artifact frame (`(bloom:
    * array<bigint>, num_hashes: int)`, ONE row) back into the
    * driver-side (words, numHashes) pair the serving paths take — the
    * read half of the build-once/serve-many artifact lifecycle,
    * O(numBits/64) driver bytes (32 KB at the default 2¹⁸ bits).
    * Throws on an empty or multi-row frame: a malformed artifact
    * table must fail the run, not prescreen with garbage bits.
    */
  def bloomArtifactArray(bloom: DataFrame): (Array[Long], Int) = {
    val rows = bloom.select(col("bloom"), col("num_hashes")).collect()
    require(rows.length == 1,
      s"bloom artifact must be exactly one row, got ${rows.length}")
    (rows(0).getSeq[Long](0).toArray, rows(0).getInt(1))
  }

  /** [[decontaminateBloomWith]] fed from a persisted [[bloomBits]]
    * artifact frame — probes with the artifact's OWN hash count.
    */
  def decontaminateBloomArtifact(corpus: DataFrame, benchmark: DataFrame,
      bloom: DataFrame, threshold: Double = 0.5): DataFrame = {
    val (arr, numHashes) = bloomArtifactArray(bloom)
    decontaminateBloomWith(corpus, benchmark, arr, threshold, numHashes)
  }
}
