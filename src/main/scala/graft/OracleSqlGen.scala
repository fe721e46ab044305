package graft

/** Programmatically generated DuckDB oracle SQL for the dedup/similarity
  * operators — the SQL mirrors the Spark implementation term for term
  * (same md5-hex hash trick, same band layout, same rounding), so the
  * driver's value-hash compare is exact, including LSH recall behavior.
  */
object OracleSqlGen {

  /** Shared shingle CTE (3-word shingles; short docs collapse to one
    * whole-text shingle, matching TextFunctions.shingles3).
    */
  val shingleCte: String =
    """sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split(text, ' ')) < 3 THEN [text]
      |         ELSE list_transform(range(1, len(string_split(text, ' ')) - 1),
      |                i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))
      |    END AS sh
      |  FROM documents)""".stripMargin

  def minhashLsh(k: Int, bands: Int, threshold: Double, maxBucket: Int = 64): String = {
    val rowsPerBand = k / bands
    val P = graft.functions.TextFunctions.minhashP
    val sigCols = (0 until k).map { i =>
      val (a, b) = graft.functions.TextFunctions.minhashCoeffs(i)
      s"list_min(list_transform(hs, h -> (h * $a + $b) % $P)) AS mh$i"
    }.mkString(",\n    ")
    val M = graft.operators.Dedup.bandFoldM
    val P31 = graft.operators.Dedup.bandFoldP
    val bandSelects = (0 until bands).map { b =>
      val key = (0 until rowsPerBand).foldLeft(s"$b") { (acc, r) =>
        s"(($acc) * $M + mh${b * rowsPerBand + r}) % $P31"
      }
      s"SELECT doc_id, $key AS bk FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    // hs/sig mirror Dedup.minhashSignatures (one md5 per shingle,
    // universal-hash derives); band mirrors the numeric band-key fold;
    // stats/cand mirror Dedup.pairsFromBuckets: pairwise inside buckets
    // of size <= maxBucket, star pairing beyond
    s"""WITH $shingleCte,
       |hs AS (
       |  SELECT doc_id,
       |    list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 7) AS BIGINT)) AS hs
       |  FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM hs),
       |band AS (
       |  $bandSelects),
       |stats AS (
       |  SELECT bk, COUNT(*) AS n, MIN(doc_id) AS rep
       |  FROM band GROUP BY 1 HAVING COUNT(*) > 1),
       |cand AS (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |    FROM band a
       |    JOIN band b ON a.bk = b.bk AND a.doc_id < b.doc_id
       |    JOIN stats s ON s.bk = a.bk
       |    WHERE s.n <= $maxBucket
       |    UNION ALL
       |    SELECT s.rep AS doc_a, x.doc_id AS doc_b
       |    FROM band x JOIN stats s ON s.bk = x.bk
       |    WHERE s.n > $maxBucket AND x.doc_id != s.rep)),
       |ds AS (SELECT doc_id, list_distinct(hs) AS s FROM hs)
       |SELECT doc_a, doc_b,
       |  ROUND(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) /
       |        CAST(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)) AS DOUBLE), 6) AS jaccard
       |FROM cand JOIN ds x ON cand.doc_a = x.doc_id
       |          JOIN ds y ON cand.doc_b = y.doc_id
       |WHERE ROUND(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) /
       |            CAST(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)) AS DOUBLE), 6) >= $threshold""".stripMargin
  }

  /** MinHash calibration — mirrors
    * [[graft.operators.Dedup.minhashCalibration]]: identical
    * signature/band/star-guard CTEs as [[minhashLsh]], estimated
    * jaccard = agreeing components / k (NULL components agree on
    * nothing via CASE), exact jaccard with the threshold-0 filter the
    * Spark verify applies (drops 0/0-undefined pairs on both sides).
    */
  def minhashCalibration(k: Int, bands: Int, maxBucket: Int = 64): String = {
    val rowsPerBand = k / bands
    val P = graft.functions.TextFunctions.minhashP
    val sigCols = (0 until k).map { i =>
      val (a, b) = graft.functions.TextFunctions.minhashCoeffs(i)
      s"list_min(list_transform(hs, h -> (h * $a + $b) % $P)) AS mh$i"
    }.mkString(",\n    ")
    val M = graft.operators.Dedup.bandFoldM
    val P31 = graft.operators.Dedup.bandFoldP
    val bandSelects = (0 until bands).map { b =>
      val key = (0 until rowsPerBand).foldLeft(s"$b") { (acc, r) =>
        s"(($acc) * $M + mh${b * rowsPerBand + r}) % $P31"
      }
      s"SELECT doc_id, $key AS bk FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    val agree = (0 until k).map(i =>
      s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH $shingleCte,
       |hs AS (
       |  SELECT doc_id,
       |    list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 7) AS BIGINT)) AS hs
       |  FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM hs),
       |band AS (
       |  $bandSelects),
       |stats AS (
       |  SELECT bk, COUNT(*) AS n, MIN(doc_id) AS rep
       |  FROM band GROUP BY 1 HAVING COUNT(*) > 1),
       |cand AS (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |    FROM band a
       |    JOIN band b ON a.bk = b.bk AND a.doc_id < b.doc_id
       |    JOIN stats s ON s.bk = a.bk
       |    WHERE s.n <= $maxBucket
       |    UNION ALL
       |    SELECT s.rep AS doc_a, x.doc_id AS doc_b
       |    FROM band x JOIN stats s ON s.bk = x.bk
       |    WHERE s.n > $maxBucket AND x.doc_id != s.rep)),
       |ds AS (SELECT doc_id, list_distinct(hs) AS s FROM hs),
       |est AS (
       |  SELECT cand.doc_a, cand.doc_b,
       |    ROUND(CAST($agree AS DOUBLE) / $k.0, 6) AS est_jaccard
       |  FROM cand JOIN sig a ON cand.doc_a = a.doc_id
       |            JOIN sig b ON cand.doc_b = b.doc_id),
       |ex AS (
       |  SELECT doc_a, doc_b,
       |    ROUND(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) /
       |          (CAST(len(x.s) + len(y.s) AS DOUBLE)
       |           - CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)), 6) AS exact_jaccard
       |  FROM cand JOIN ds x ON cand.doc_a = x.doc_id
       |            JOIN ds y ON cand.doc_b = y.doc_id)
       |SELECT est.doc_a, est.doc_b, est.est_jaccard, ex.exact_jaccard,
       |  ROUND(abs(est.est_jaccard - ex.exact_jaccard), 6) AS abs_err
       |FROM est JOIN ex ON est.doc_a = ex.doc_a AND est.doc_b = ex.doc_b
       |WHERE ex.exact_jaccard >= 0.0""".stripMargin
  }

  def simhashSigCte(bits: Int): String = {
    val bitSums = (0 until bits).map(j =>
      s"SUM(cnt * (((h >> $j) & 1) * 2 - 1)) AS bs$j").mkString(",\n    ")
    val sigSum = (0 until bits).map(j =>
      s"(CASE WHEN bs$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"""tok AS (
       |  SELECT doc_id, tok, COUNT(*) AS cnt FROM (
       |    SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY 1, 2),
       |h AS (
       |  SELECT doc_id, cnt,
       |         CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
       |  FROM tok),
       |bs AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM h GROUP BY 1),
       |s AS (SELECT doc_id, CAST($sigSum AS BIGINT) AS simhash FROM bs)""".stripMargin
  }

  def simhash(bits: Int): String =
    s"WITH ${simhashSigCte(bits)}\nSELECT doc_id, simhash FROM s"

  def simhashPairs(bits: Int, maxDist: Int, maxBucket: Int = 64): String = {
    val chunks = 4
    val w = bits / chunks
    val mask = (1L << w) - 1
    // stats/pairing mirror Dedup.pairsFromBuckets (hot-bucket star
    // guard) over the numeric band key (chunk index in the high bits)
    s"""WITH ${simhashSigCte(bits)},
       |b AS (
       |  SELECT doc_id, simhash,
       |         c.c * ${mask + 1} + ((simhash >> (c.c * $w)) & $mask) AS bk
       |  FROM s, (SELECT UNNEST(range(0, $chunks)) AS c) c),
       |stats AS (
       |  SELECT bk, COUNT(*) AS n, MIN(doc_id) AS rep,
       |         ARG_MIN(simhash, doc_id) AS rep_sig
       |  FROM b GROUP BY 1 HAVING COUNT(*) > 1),
       |p AS (
       |  SELECT DISTINCT doc_a, doc_b, hamming FROM (
       |    SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
       |           bit_count(xor(a.simhash, b2.simhash)) AS hamming
       |    FROM b a
       |    JOIN b b2 ON a.bk = b2.bk AND a.doc_id < b2.doc_id
       |    JOIN stats s ON s.bk = a.bk
       |    WHERE s.n <= $maxBucket
       |    UNION ALL
       |    SELECT s.rep AS doc_a, x.doc_id AS doc_b,
       |           bit_count(xor(s.rep_sig, x.simhash)) AS hamming
       |    FROM b x JOIN stats s ON s.bk = x.bk
       |    WHERE s.n > $maxBucket AND x.doc_id != s.rep))
       |SELECT doc_a, doc_b, hamming FROM p WHERE hamming <= $maxDist""".stripMargin
  }

  def knnBruteForce(maxQueryId: Int, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < $maxQueryId),
       |c AS (SELECT vec_id AS n_id, embedding AS n_emb FROM embeddings),
       |sc AS (
       |  SELECT q_id, n_id,
       |    ROUND(list_cosine_similarity(CAST(q_emb AS DOUBLE[]), CAST(n_emb AS DOUBLE[])), 6) AS sim
       |  FROM q, c WHERE q_id != n_id)
       |SELECT q_id, n_id, sim, rank FROM (
       |  SELECT q_id, n_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
       |  FROM sc)
       |WHERE rank <= $k""".stripMargin

  /** Embedding-cosine near-dup pairs — mirrors
    * [[graft.operators.Similarity.cosinePairsAbove]] (double accumulation
    * over float inputs, round-6, threshold on the rounded value).
    */
  def cosinePairs(threshold: Double): String =
    s"""SELECT id_a, id_b, sim FROM (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |                                 CAST(b.embedding AS DOUBLE[])), 6) AS sim
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
       |WHERE sim >= $threshold""".stripMargin

  /** Connected components over the verified minhash-LSH pair graph —
    * mirrors [[graft.operators.Dedup.components]]: a recursive
    * reachability CTE propagates every label along (symmetrized) edges
    * and the component id is the min reachable doc_id, exactly the
    * fixpoint the Spark min-label propagation converges to.
    */
  private def dedupComponentsCte(k: Int, bands: Int, threshold: Double): String =
    s"""prs AS (SELECT doc_a, doc_b FROM (${minhashLsh(k, bands, threshold)}) mm),
       |e AS (SELECT doc_a AS s, doc_b AS d FROM prs
       |      UNION ALL SELECT doc_b, doc_a FROM prs),
       |reach AS (
       |  SELECT s AS doc_id, s AS comp FROM e
       |  UNION
       |  SELECT e.d, r.comp FROM reach r JOIN e ON r.doc_id = e.s),
       |cc AS (SELECT doc_id, MIN(comp) AS component FROM reach GROUP BY 1)""".stripMargin

  def dedupClusters(k: Int, bands: Int, threshold: Double): String =
    s"""WITH RECURSIVE ${dedupComponentsCte(k, bands, threshold)}
       |SELECT doc_id, component FROM cc""".stripMargin

  def dedupCorpus(k: Int, bands: Int, threshold: Double): String =
    s"""WITH RECURSIVE ${dedupComponentsCte(k, bands, threshold)}
       |SELECT d.doc_id, md5(d.text) AS text_hash
       |FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
       |WHERE cc.component IS NULL OR cc.component = d.doc_id""".stripMargin

  /** Media-table CTE mirroring [[graft.operators.Multimodal.synthMedia]]
    * hex digit for hex digit (same md5-of-"seed:id:field" derivation;
    * see its scaladoc for the shared spec). The payload is carried as a
    * lowercase HEX STRING — this DuckDB build has no substring/md5 over
    * BLOB, and hex-space slicing is byte-exact at 2× the offsets.
    */
  def mediaCte(n: Int, seed: Long): String = {
    // max size = 256 + 2047 = 2303 bytes → ≤ 144 md5 blocks
    val maxBlocks = (256 + 2047 + 15) / 16
    s"""ids AS (SELECT unnest(range(0, $n)) AS asset_id),
       |mmeta AS (SELECT asset_id, md5('$seed:' || asset_id || ':meta') AS mh FROM ids),
       |attrs AS (
       |  SELECT asset_id, mh,
       |    CAST(('0x' || substr(mh, 1, 2)) AS BIGINT) % 3 AS kind_idx,
       |    256 + CAST(('0x' || substr(mh, 3, 3)) AS BIGINT) % 2048 AS size
       |  FROM mmeta),
       |blks AS (
       |  SELECT a.asset_id, b.b
       |  FROM attrs a JOIN (SELECT unnest(range(0, $maxBlocks)) AS b) b
       |    ON b.b < (a.size + 15) // 16),
       |payload AS (
       |  SELECT k.asset_id,
       |    substr(string_agg(md5('$seed:' || k.asset_id || ':' || k.b), '' ORDER BY k.b),
       |           1, CAST(a.size * 2 AS BIGINT)) AS hexdata,
       |    a.size, a.mh, a.kind_idx
       |  FROM blks k JOIN attrs a USING (asset_id)
       |  GROUP BY k.asset_id, a.size, a.mh, a.kind_idx)""".stripMargin
  }

  /** q30 mirror: byte-bucket sums → polynomial digest + first feature
    * (see [[graft.operators.Multimodal.extractFeatures]]); the digest
    * powers M^j mod P are inlined as literals so the whole check is
    * exact integer arithmetic, and feature_f0 is one double division
    * cast to REAL — the identical single rounding both engines perform.
    */
  def mediaFeatures(n: Int, seed: Long, dims: Int): String = {
    val m = graft.operators.Multimodal.digestM
    val p = graft.operators.Multimodal.digestP
    val powers = Iterator.iterate(1L)(w => w * m % p).take(dims).zipWithIndex
      .map { case (w, j) => s"($j, $w)" }.mkString(", ")
    val maxSize = 256 + 2047 + 1
    s"""WITH ${mediaCte(n, seed)},
       |bytes AS (
       |  SELECT p.asset_id, i.i,
       |    CAST(('0x' || substr(p.hexdata, CAST(i.i*2 + 1 AS BIGINT), 2)) AS BIGINT) AS byte
       |  FROM payload p JOIN (SELECT unnest(range(0, $maxSize)) AS i) i ON i.i < p.size),
       |sums AS (
       |  SELECT asset_id, i % $dims AS j, CAST(SUM(byte) AS BIGINT) AS s
       |  FROM bytes GROUP BY 1, 2),
       |dg AS (
       |  SELECT asset_id, CAST(CAST(SUM(s * w.w) AS HUGEINT) % $p AS BIGINT) AS feature_digest
       |  FROM sums JOIN (VALUES $powers) AS w(j, w) ON sums.j = w.j
       |  GROUP BY 1)
       |SELECT p.asset_id, CAST(p.size AS BIGINT) AS byte_len, dg.feature_digest,
       |  CAST(s0.s / (255.0 * GREATEST(1, p.size // $dims)) AS REAL) AS feature_f0
       |FROM payload p
       |JOIN dg USING (asset_id)
       |JOIN (SELECT asset_id, s FROM sums WHERE j = 0) s0 USING (asset_id)""".stripMargin
  }

  /** q31 mirror: video frame slicing in hex space (2× offsets) —
    * frames/frame_len derive exactly as
    * [[graft.operators.Multimodal.sampleFrames]] computes them.
    */
  def frameSample(n: Int, seed: Long, stride: Int): String =
    s"""WITH ${mediaCte(n, seed)},
       |vids AS (
       |  SELECT asset_id, hexdata, size,
       |    4 + CAST(('0x' || substr(mh, 6, 2)) AS BIGINT) % 28 AS frames
       |  FROM payload WHERE kind_idx = 2),
       |fr AS (
       |  SELECT v.asset_id, f.f AS frame_idx, v.size // v.frames AS frame_len, v.hexdata
       |  FROM vids v JOIN (SELECT unnest(range(0, 32)) AS f) f
       |    ON f.f < v.frames AND f.f % $stride = 0)
       |SELECT asset_id, CAST(frame_idx AS INT) AS frame_idx,
       |  substr(hexdata, CAST(frame_idx * frame_len * 2 + 1 AS BIGINT),
       |         CAST(frame_len * 2 AS BIGINT)) AS frame_hex
       |FROM fr""".stripMargin

  val textStats: String = {
    val stop = graft.functions.TextFunctions.stopwords
      .map(s => s"'$s'").mkString(", ")
    val bpe = graft.functions.TextFunctions.bpeTokenPattern
    s"""SELECT doc_id,
       |  CAST(LENGTH(text) AS BIGINT) AS n_chars,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens_ws,
       |  CAST(len(regexp_extract_all(text, '$bpe')) AS BIGINT) AS tokens_bpe,
       |  CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE
       |    CAST(LENGTH(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
       |      / CAST(LENGTH(text) AS DOUBLE) END AS punct_ratio,
       |  CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0 ELSE
       |    CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stop))) AS DOUBLE)
       |      / CAST(len(string_split(text, ' ')) AS DOUBLE) END AS stopword_ratio,
       |  CAST(FLOOR((
       |    LEAST(LENGTH(text) * 2000, 1000000) * 4 +
       |    (1000000 - LEAST(CASE WHEN LENGTH(text) = 0 THEN 0 ELSE
       |      CAST(FLOOR(CAST(LENGTH(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) * 4000000 AS DOUBLE)
       |        / CAST(LENGTH(text) AS DOUBLE)) AS BIGINT) END, 1000000)) * 3 +
       |    LEAST(CASE WHEN len(string_split(text, ' ')) = 0 THEN 0 ELSE
       |      CAST(FLOOR(CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stop))) * 5000000 AS DOUBLE)
       |        / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS BIGINT) END, 1000000) * 3
       |  ) / 10.0) AS BIGINT) AS quality_ppm
       |FROM documents""".stripMargin
  }

  /** Quality-gate mirror — [[graft.operators.TextAnalysis.qualityGate]]
    * term for term: the [[textStats]] ratio shapes, the q126
    * chunk-line/bigram shapes guarded NULL below 3 tokens (COALESCE
    * false in the repetition flag), and `keep` recomputed from the
    * same subexpressions.
    */
  def qualityGate(minTokens: Long, maxTokens: Long,
      minMeanTokChars: Double, maxMeanTokChars: Double,
      maxPunct: Double, minStopword: Double,
      maxDupLineChar: Double, maxDupBigram: Double): String = {
    val stop = graft.functions.TextFunctions.stopwords
      .map(s => s"'$s'").mkString(", ")
    s"""WITH b AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS toks
       |  FROM documents WHERE text IS NOT NULL),
       |g AS (
       |  SELECT doc_id, text, toks,
       |    CASE WHEN len(toks) >= 3 THEN
       |      [array_to_string(toks[(i*2+1):(i*2+2)], ' ')
       |       for i in generate_series(0, (len(toks)-1)//2)] END AS lines,
       |    CASE WHEN len(toks) >= 3 THEN
       |      [concat(toks[i], ' ', toks[i+1])
       |       for i in generate_series(1, len(toks)-1)] END AS bg
       |  FROM b),
       |m AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(list_sum([length(x) for x in toks]) AS DOUBLE)
       |      / CAST(len(toks) AS DOUBLE) AS meantok,
       |    CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE
       |      CAST(LENGTH(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
       |        / CAST(LENGTH(text) AS DOUBLE) END AS punct_ratio,
       |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE
       |      CAST(len(list_filter(toks, t -> t IN ($stop))) AS DOUBLE)
       |        / CAST(len(toks) AS DOUBLE) END AS stopword_ratio,
       |    CASE WHEN lines IS NULL THEN NULL ELSE
       |      CAST(list_sum([length(x) for x in lines])
       |        - list_sum([length(x) for x in list_distinct(lines)]) AS DOUBLE)
       |        / CAST(list_sum([length(x) for x in lines]) AS DOUBLE) END AS dlc,
       |    CASE WHEN bg IS NULL THEN NULL ELSE
       |      CAST(len(list_filter(bg,
       |        x -> len(list_filter(bg, y -> y = x)) > 1)) AS DOUBLE)
       |        / CAST(len(bg) AS DOUBLE) END AS dbg
       |  FROM g)
       |SELECT doc_id, n_tokens,
       |  n_tokens < $minTokens AS too_short,
       |  n_tokens > $maxTokens AS too_long,
       |  (meantok < $minMeanTokChars OR meantok > $maxMeanTokChars) AS bad_word_len,
       |  punct_ratio > $maxPunct AS high_punct,
       |  stopword_ratio < $minStopword AS low_stopword,
       |  COALESCE(dlc > $maxDupLineChar OR dbg > $maxDupBigram, FALSE) AS repetitive,
       |  NOT (n_tokens < $minTokens OR n_tokens > $maxTokens
       |    OR meantok < $minMeanTokChars OR meantok > $maxMeanTokChars
       |    OR punct_ratio > $maxPunct OR stopword_ratio < $minStopword
       |    OR COALESCE(dlc > $maxDupLineChar OR dbg > $maxDupBigram, FALSE)) AS keep
       |FROM m""".stripMargin
  }

  /** q27 mirror — winnowing fingerprint pairs: md5-prefix k-gram
    * hashes (the [[graft.functions.TextOps]] `h28` form), sliding
    * w-window minimum (docs with fewer than w gram positions take the
    * global minimum, matching `TextOps.winnow`), distinct fingerprints
    * per doc, df-capped shared-fingerprint pair counting — the exact
    * `TextAnalysis.fingerprintPairs` pipeline.
    */
  def fingerprintPairs(k: Int, w: Int, minShared: Int, maxDf: Int): String =
    s"""WITH pos AS (
       |  SELECT doc_id, CAST(t.i AS BIGINT) AS i,
       |         CAST('0x' || substr(md5(substr(text, CAST(t.i AS INT), $k)), 1, 7) AS BIGINT) AS h,
       |         length(text) - $k + 1 AS n
       |  FROM documents, UNNEST(range(1, length(text) - $k + 2)) AS t(i)
       |  WHERE length(text) >= $k),
       |wins AS (
       |  SELECT doc_id, i, n,
       |         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
       |                      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS m
       |  FROM pos),
       |fps AS (
       |  SELECT DISTINCT doc_id, m AS f FROM wins
       |  WHERE (n <= $w AND i = 1) OR (n > $w AND i <= n - $w + 1)),
       |dfed AS (
       |  SELECT doc_id, f, COUNT(*) OVER (PARTITION BY f) AS df FROM fps),
       |live AS (SELECT doc_id, f FROM dfed WHERE df > 1 AND df <= $maxDf)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(COUNT(*) AS BIGINT) AS shared
       |FROM live a JOIN live b ON a.f = b.f AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |HAVING COUNT(*) >= $minShared""".stripMargin

  /** Test-set decontamination — mirrors
    * [[graft.operators.Dedup.decontaminate]] with corpus/benchmark
    * carved out of `documents` by `doc_id % modulus` (benchmark =
    * residue 0): same shingle/minhash/band-fold constants as
    * [[minhashLsh]], a corpus×benchmark band join for candidates, the
    * exact jaccard verify, then best-match-per-doc (max jaccard,
    * bench_id tie-break).
    */
  def decontaminate(k: Int, bands: Int, threshold: Double,
      modulus: Int): String = {
    val rowsPerBand = k / bands
    val P = graft.functions.TextFunctions.minhashP
    val sigCols = (0 until k).map { i =>
      val (a, b) = graft.functions.TextFunctions.minhashCoeffs(i)
      s"list_min(list_transform(hs, h -> (h * $a + $b) % $P)) AS mh$i"
    }.mkString(",\n    ")
    val M = graft.operators.Dedup.bandFoldM
    val P31 = graft.operators.Dedup.bandFoldP
    val bandSelects = (0 until bands).map { b =>
      val key = (0 until rowsPerBand).foldLeft(s"$b") { (acc, r) =>
        s"(($acc) * $M + mh${b * rowsPerBand + r}) % $P31"
      }
      s"SELECT doc_id, $key AS bk FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH $shingleCte,
       |hs AS (
       |  SELECT doc_id,
       |    list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 7) AS BIGINT)) AS hs
       |  FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM hs),
       |band AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT c.doc_id, b.doc_id AS bench_id
       |  FROM band c JOIN band b ON c.bk = b.bk
       |  WHERE c.doc_id % $modulus != 0 AND b.doc_id % $modulus = 0),
       |ds AS (SELECT doc_id, list_distinct(hs) AS s FROM hs),
       |v AS (
       |  SELECT cand.doc_id, cand.bench_id,
       |    ROUND(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) /
       |          (CAST(len(x.s) + len(y.s) AS DOUBLE)
       |           - CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)), 6) AS jaccard
       |  FROM cand JOIN ds x ON cand.doc_id = x.doc_id
       |            JOIN ds y ON cand.bench_id = y.doc_id)
       |SELECT doc_id, bench_id, jaccard FROM v
       |WHERE jaccard >= $threshold
       |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
       |  ORDER BY jaccard DESC, bench_id) = 1""".stripMargin
  }

  /** EXACT all-pairs decontamination — the oracle for
    * [[graft.operators.Dedup.decontaminateBloom]]. No band curve to
    * mirror: the bloom prescreen is provably lossless (no false
    * negatives), so the oracle is the full corpus×benchmark jaccard
    * over distinct shingle hashes, computed via an unnest-join (the
    * same intersection counting the Spark side does on survivors),
    * with the identical ROUND-6 division shape and best-match-per-doc
    * selection as [[decontaminate]].
    */
  def decontaminateExact(threshold: Double, modulus: Int): String =
    s"""WITH $shingleCte,
       |hs AS (
       |  SELECT doc_id,
       |    list_transform(sh, s -> CAST('0x' || substr(md5(s), 1, 7) AS BIGINT)) AS hs
       |  FROM sh),
       |ds AS (SELECT doc_id, list_distinct(hs) AS s FROM hs),
       |c AS (SELECT doc_id, s FROM ds WHERE doc_id % $modulus != 0),
       |b AS (SELECT doc_id AS bench_id, s FROM ds WHERE doc_id % $modulus = 0),
       |cu AS (SELECT doc_id, UNNEST(s) AS h FROM c),
       |bu AS (SELECT bench_id, UNNEST(s) AS h FROM b),
       |i AS (
       |  SELECT cu.doc_id, bu.bench_id, CAST(COUNT(*) AS DOUBLE) AS i
       |  FROM cu JOIN bu USING (h) GROUP BY 1, 2),
       |v AS (
       |  SELECT i.doc_id, i.bench_id,
       |    ROUND(i.i / (CAST(len(x.s) + len(y.s) AS DOUBLE) - i.i), 6) AS jaccard
       |  FROM i JOIN c x ON i.doc_id = x.doc_id
       |         JOIN b y ON i.bench_id = y.bench_id)
       |SELECT doc_id, bench_id, jaccard FROM v
       |WHERE jaccard >= $threshold
       |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
       |  ORDER BY jaccard DESC, bench_id) = 1""".stripMargin

  /** Embedding label-outlier flags — mirrors
    * [[graft.operators.Similarity.labelOutliers]]: zero-norm vectors
    * dropped first (the one input class where the engines' cosine
    * primitives disagree — Spark 0.0, DuckDB -1.0), then per-label
    * min-id reference vector, ROUND-6 cosine, boolean flag below
    * threshold.
    */
  def labelOutliers(threshold: Double): String =
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding FROM embeddings
       |  WHERE list_sum(list_transform(CAST(embedding AS DOUBLE[]),
       |                                x -> x * x)) > 0),
       |r AS (
       |  SELECT label, MIN(vec_id) AS ref_vec_id FROM e GROUP BY 1),
       |re AS (
       |  SELECT r.label, r.ref_vec_id, e.embedding AS ref_embedding
       |  FROM r JOIN e ON e.vec_id = r.ref_vec_id)
       |SELECT e.vec_id, e.label, re.ref_vec_id,
       |  ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                               CAST(re.ref_embedding AS DOUBLE[])), 6) AS sim,
       |  ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                               CAST(re.ref_embedding AS DOUBLE[])), 6)
       |    < $threshold AS is_outlier
       |FROM e JOIN re ON e.label = re.label""".stripMargin
}
