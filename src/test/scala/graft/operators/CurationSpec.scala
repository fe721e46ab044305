package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ingest.Synth

/** Specs for the training-data curation family: deterministic
  * per-conversation sampling, reproducible splits, conversation
  * fingerprints, and tool-journey paths.
  */
class CurationSpec extends SparkTestBase {

  private lazy val turns = Synth.transcripts(
    spark, nConvs = 25, avgTurns = 40, seed = 23L).toDF().cache()

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def turnsDf(rows: Seq[(String, Integer, String, String, String)]) = {
    import spark.implicits._
    rows.map { case (c, i, r, x, tl) =>
      (c, i, r, x, tl, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }

  // ---- samplePerConv ----------------------------------------------------

  test("samplePerConv matches the brute md5-permutation selection") {
    val k = 7
    val got = Curation.samplePerConv(turns, k)
      .select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    val expected = turns
      .filter(col("conv_id").isNotNull && col("turn_idx").isNotNull)
      .select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1).values.flatMap { rs =>
        rs.sortBy { case (c, i) =>
          (java.lang.Long.parseLong(md5Hex(s"$c:$i").take(15), 16), i)
        }.take(k)
      }.toSet
    assert(got == expected)
  }

  test("samplePerConv is invariant to physical row order and k >= size keeps all") {
    val small = turns.limit(200).cache()
    val a = Curation.samplePerConv(small, 3)
      .select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    val b = Curation.samplePerConv(small.repartition(7).sortWithinPartitions(desc("text")), 3)
      .select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(a == b)
    val all = Curation.samplePerConv(small, 1000000).count()
    assert(all == small.filter(col("conv_id").isNotNull &&
      col("turn_idx").isNotNull).count())
  }

  test("samplePerConv null doctrine and row passthrough") {
    val df = turnsDf(Seq(
      ("A", 0, "user", "hello", null),
      ("A", 1, "assistant", null, "search"),
      (null, 2, "user", "x", null),
      ("B", null, "user", "y", null)))
    val got = Curation.samplePerConv(df, 5).collect()
    assert(got.length == 2)
    val byIdx = got.map(r => r.getInt(1) -> r).toMap
    assert(byIdx(0).getString(3) == "hello" && byIdx(0).getString(4) == null)
    assert(byIdx(1).getString(3) == null && byIdx(1).getString(4) == "search")
  }

  test("samplePerConv plan: one conv exchange, no joins") {
    val p = Curation.samplePerConv(turns, 5)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1, s"expected one exchange:\n$p")
    assert(!p.contains("Join"), s"expected no join:\n$p")
  }

  test("samplePerConv rejects out-of-range k") {
    intercept[IllegalArgumentException](Curation.samplePerConv(turns, 0))
    intercept[IllegalArgumentException](Curation.samplePerConv(turns, 1000001))
  }

  // ---- stratifiedSplit ----------------------------------------------------

  test("stratifiedSplit: conv-level purity, totals, ROUND-6 share") {
    val got = Curation.stratifiedSplit(turns).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val base = turns.filter(col("conv_id").isNotNull)
    val bucketOf = base.select("conv_id").distinct().collect()
      .map(_.getString(0))
      .map { c =>
        c -> java.lang.Long.parseLong(md5Hex(c).take(7), 16) % 1000
      }.toMap
    def splitOf(b: Long): String =
      if (b < 800) "train" else if (b < 900) "val" else "test"
    val rows = base.select("conv_id", "text").collect()
      .map(r => (splitOf(bucketOf(r.getString(0))), r.getString(0),
        Option(r.getString(1)).map(_.length.toLong)))
    val totalTurns = rows.length.toLong
    rows.groupBy(_._1).foreach { case (split, rs) =>
      val (convs, ts, chars) = got(split) match {
        case (c, t, _, ch) => (c, t, ch)
      }
      assert(convs == rs.map(_._2).distinct.length.toLong, s"$split convs")
      assert(ts == rs.length.toLong, s"$split turns")
      assert(chars == rs.flatMap(_._3).sum, s"$split chars")
      val share = got(split)._3
      val exp = math.rint(rs.length.toDouble / totalTurns * 1e6) / 1e6
      assert(math.abs(share - exp) < 1e-9, s"$split share")
    }
    assert(got.values.map(_._2).sum == totalTurns)
  }

  test("stratifiedSplit thresholds move the boundary (brute 500/250 check)") {
    val got = Curation.stratifiedSplit(turns, 500, 250).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = turns.filter(col("conv_id").isNotNull)
      .select("conv_id").distinct().collect().map(_.getString(0))
      .groupBy { c =>
        val b = java.lang.Long.parseLong(md5Hex(c).take(7), 16) % 1000
        if (b < 500) "train" else if (b < 750) "val" else "test"
      }.map { case (s, cs) => s -> cs.length.toLong }
    assert(got == expected, s"got $got, brute $expected")
    // and the 500/250 boundary must actually differ from the default
    val default = Curation.stratifiedSplit(turns).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got != default, "non-default thresholds must move conversations")
    intercept[IllegalArgumentException](Curation.stratifiedSplit(turns, 999, 1))
    intercept[IllegalArgumentException](Curation.stratifiedSplit(turns, 0, 100))
  }

  // ---- convFingerprint ----------------------------------------------------

  test("convFingerprint golden: canonical order, markers, exact md5") {
    val df = turnsDf(Seq(
      ("A", 1, "assistant", "world", null),
      ("A", 0, "user", "hello", null),
      ("B", 0, "user", null, null),
      ("C", 0, "user", "", null)))
    val got = Curation.convFingerprint(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got("A") == ((2L, 10L, md5Hex("5:hello\u00015:world"))))
    // null text digests as the bare 'N' marker with zero chars...
    assert(got("B") == ((1L, 0L, md5Hex("N"))))
    // ...which is distinct from the (length-prefixed) empty string
    assert(got("C") == ((1L, 0L, md5Hex("0:"))))
    assert(got("B")._3 != got("C")._3)
  }

  test("convFingerprint is order-independent and drops unkeyable turns") {
    val base = turns.filter(col("conv_id").isNotNull && col("turn_idx").isNotNull)
    val a = Curation.convFingerprint(turns).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    val b = Curation.convFingerprint(
      turns.repartition(11).sortWithinPartitions(desc("turn_idx"))).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(a == b)
    assert(a.keySet == base.select("conv_id").distinct().collect()
      .map(_.getString(0)).toSet)
  }

  test("convFingerprint equal transcripts get equal digests, one-char drift differs") {
    val df = turnsDf(Seq(
      ("X", 0, "user", "same", null), ("X", 1, "user", "text", null),
      ("Y", 0, "user", "same", null), ("Y", 1, "user", "text", null),
      ("Z", 0, "user", "same", null), ("Z", 1, "user", "texT", null)))
    val got = Curation.convFingerprint(df).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(got("X") == got("Y"))
    assert(got("X") != got("Z"))
  }

  test("convFingerprint plan: one exchange, no joins") {
    val p = Curation.convFingerprint(turns)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1, s"expected one exchange:\n$p")
    assert(!p.contains("Join"), s"expected no join:\n$p")
  }

  // ---- turnIntegrity --------------------------------------------------------

  test("turnIntegrity golden: dups, holes, shifted span, clean conv") {
    val df = turnsDf(Seq(
      ("A", 0, "user", "t", null), ("A", 1, "user", "t", null),
      ("A", 1, "user", "t", null), ("A", 4, "user", "t", null), // dup 1, holes 2-3
      ("B", 2, "user", "t", null), ("B", 3, "user", "t", null), // shifted (min 2)
      ("C", 0, "user", "t", null), ("C", 1, "user", "t", null), // clean
      ("D", null, "user", "t", null),                           // unorderable drops
      (null, 0, "user", "t", null)))                            // unkeyable drops
    val got = Curation.turnIntegrity(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getBoolean(7)))).toMap
    assert(got.keySet == Set("A", "B", "C"))
    assert(got("A") == ((4L, 3L, 0L, 4L, 1L, 2L, false)))
    assert(got("B") == ((2L, 2L, 2L, 3L, 0L, 0L, false)))
    assert(got("C") == ((2L, 2L, 0L, 1L, 0L, 0L, true)))
  }

  test("turnIntegrity: canonical synth is contiguous everywhere; holes detected after filtering") {
    val all = Curation.turnIntegrity(turns)
    assert(all.filter(!col("contiguous")).count() == 0,
      "row_number-derived turn_idx must audit clean")
    val holed = Curation.turnIntegrity(turns.filter(pmod(col("turn_idx"), lit(7)) =!= 3))
    assert(holed.filter(col("missing_turns") > 0).count() > 0)
    assert(holed.filter(col("dup_keys") > 0).count() == 0)
  }

  test("turnIntegrity plan: one aggregation family, no joins or windows") {
    val p = Curation.turnIntegrity(turns).queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("Window"), s"plan:\n$p")
  }

  // ---- toolPaths ----------------------------------------------------------

  test("toolPaths golden: ordered truncated paths with ROUND-6 share") {
    val df = turnsDf(Seq(
      ("A", 0, "tool", "t", "search"),
      ("A", 1, "user", "t", null),
      ("A", 2, "tool", "t", "code"),
      ("A", 3, "tool", "t", "search"),
      ("B", 5, "tool", "t", "search"),
      ("B", 9, "tool", "t", "code"),
      ("C", 0, "user", "t", null),
      ("D", 2, "tool", "t", "browse"),
      ("D", 0, "tool", "t", "search"),
      ("D", 1, "tool", "t", "code"),
      ("D", 3, "tool", "t", "browse")))
    val got = Curation.toolPaths(df, k = 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map(
      "search>code>search" -> ((1L, 0.333333)),
      "search>code" -> ((1L, 0.333333)),
      "search>code>browse" -> ((1L, 0.333333))))
  }

  test("toolPaths matches the brute per-conv path scan on synth") {
    val k = 4
    val got = Curation.toolPaths(turns, k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = turns
      .filter(col("conv_id").isNotNull && col("turn_idx").isNotNull &&
        col("tool").isNotNull)
      .select("conv_id", "turn_idx", "tool").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).values
      .map(_.sortBy(_._2).take(k).map(_._3).mkString(">"))
      .groupBy(identity).map { case (p, ps) => p -> ps.size.toLong }
    assert(got == expected)
    val shareSum = Curation.toolPaths(turns, k)
      .agg(sum("share")).collect()(0).getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-3)
  }

  test("toolPaths plan: shared conv exchange, census exchange, no joins") {
    val p = Curation.toolPaths(turns, 4)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size <= 3, s"expected <=3 exchanges:\n$p")
    assert(!p.contains("Join"), s"expected no join:\n$p")
  }

  test("toolPaths rejects out-of-range k") {
    intercept[IllegalArgumentException](Curation.toolPaths(turns, 0))
    intercept[IllegalArgumentException](Curation.toolPaths(turns, 33))
  }

  test("weightedSample: k >= corpus returns every keyed row; weight = len+1") {
    val rows = turnsDf(Seq(
      ("a", 0, "user", "hello", null),
      ("a", 1, "asst", null, null), // null text -> weight 1
      (null, 2, "user", "dropped", null), // unkeyable
      ("b", null.asInstanceOf[Integer], "user", "dropped", null)))
    val out = Curation.weightedSample(rows, k = 10).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(3))).sorted
    assert(out.toSeq == Seq(("a", 0, 6L), ("a", 1, 1L)))
  }

  test("weightedSample: deterministic and weight-biased") {
    import spark.implicits._
    // 300 heavy rows (len 400 -> w 401) vs 300 light (len 4 -> w 5);
    // md5 randomness is fixed, so the counts are exact reruns apart
    val rows = ((0 until 300).map(i => ("h" + i, 0, "user", "x" * 400)) ++
      (0 until 300).map(i => ("l" + i, 0, "user", "x" * 4)))
      .map { case (c, i, r, t) =>
        (c, i, r, t, null.asInstanceOf[String],
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val s1 = Curation.weightedSample(rows, k = 100).collect()
    val s2 = Curation.weightedSample(rows, k = 100).collect()
    assert(s1.map(_.toString).sorted.sameElements(s2.map(_.toString).sorted))
    val heavy = s1.count(_.getString(0).startsWith("h"))
    // P(light in sample) ~ 5/401 per slot; expect heavy to dominate
    assert(heavy >= 85, s"weighting not biasing selection: heavy=$heavy/100")
    assert(heavy < 100, "sample should not be heavy-only at these odds")
  }

  test("weightedSample plan: no exchange, TakeOrderedAndProject top-k") {
    // over a materialized frame (as a stored table would be) the
    // sampler is map-only + per-partition heap: NOTHING shuffles
    val p = Curation.weightedSample(turns, 50)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$p")
    assert(!p.contains("Exchange"), s"sampler must not shuffle the corpus:\n$p")
    assert(!p.contains("Join"), s"no join expected:\n$p")
  }

  test("weightedSample rejects out-of-range k") {
    intercept[IllegalArgumentException](Curation.weightedSample(turns, 0))
  }

  private def checksumOf(df: org.apache.spark.sql.DataFrame): (Long, BigInt) = {
    val r = Curation.corpusChecksum(df).collect()(0)
    (r.getAs[Long]("n_rows"), BigInt(r.getAs[String]("checksum")))
  }

  test("corpusChecksum: order/partition independent, merge-additive, change-sensitive") {
    val tdf = turns.toDF()
    val (n0, c0) = checksumOf(tdf)
    assert(n0 > 0)
    // physical layout must not matter
    assert(checksumOf(tdf.repartition(7)) == ((n0, c0)))
    assert(checksumOf(tdf.orderBy(col("text"))) == ((n0, c0)))
    // shard checksums ADD to the corpus checksum (mergeable artifact)
    val h1 = tdf.filter(col("turn_idx") % 2 === 0)
    val h2 = tdf.filter(col("turn_idx") % 2 =!= 0)
    val ((n1, c1), (n2, c2)) = (checksumOf(h1), checksumOf(h2))
    assert(n1 + n2 == n0 && c1 + c2 == c0)
    // any single-row mutation moves the scalar
    val mutated = tdf.withColumn("text",
      when(col("turn_idx") === 0 && col("conv_id") === "conv1",
        concat(col("text"), lit("!"))).otherwise(col("text")))
    assert(checksumOf(mutated)._2 != c0)
    assert(checksumOf(tdf.limit(100))._2 != c0)
  }

  test("corpusChecksumDaily: day rows add up to the scalar; null ts keeps a NULL day group") {
    import spark.implicits._
    val tdf = turns.toDF().withColumn("ts",
      when(col("turn_idx") === 3, lit(null).cast("timestamp"))
        .otherwise(col("ts")))
    val days = Curation.corpusChecksumDaily(tdf).collect()
    assert(days.exists(_.isNullAt(0)), "null-ts rows must keep a NULL day group")
    val (n0, c0) = checksumOf(tdf)
    assert(days.map(_.getAs[Long]("n_rows")).sum == n0)
    assert(days.map(r => BigInt(r.getAs[String]("checksum"))).sum == c0,
      "day checksums must ADD to the corpus scalar")
  }

  test("corpusChecksum distinguishes null text from empty text") {
    import spark.implicits._
    val a = Seq(("c1", 0, "user", null.asInstanceOf[String], null.asInstanceOf[String],
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val b = a.withColumn("text", lit(""))
    assert(checksumOf(a)._2 != checksumOf(b)._2)
  }

  test("row checksum canonicalization is injective (joiner in data, marker-valued text)") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def row(role: String, text: String) =
      Seq(("c1", 0, role, text, null.asInstanceOf[String], ts))
        .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    // a U+0001 INSIDE a field must not shift field boundaries: under a
    // plain joiner scheme ("user\u0001x", "y") and ("user", "x\u0001y")
    // canonicalize identically — length prefixes keep them distinct
    assert(checksumOf(row("user\u0001x", "y"))._2 != checksumOf(row("user", "x\u0001y"))._2)
    // a text VALUE equal to a would-be null marker must not collide
    // with an actual NULL in that field
    assert(checksumOf(row("user", "\u0002"))._2 != checksumOf(row("user", null))._2)
    assert(checksumOf(row("user", "N"))._2 != checksumOf(row("user", null))._2)
  }

  test("convFingerprint digest is injective across turn boundaries") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // two turns ("ab", "c") vs ("ab\u0001c") in a 1-turn sibling would
    // collide under plain joining if turn counts were ignored — and
    // ("a\u0001b", "c") vs ("a", "b\u0001c") collide even at equal turn
    // counts; the length-prefixed digest separates both
    val x = Seq(("c1", 0, "u", "a\u0001b", null.asInstanceOf[String], ts),
      ("c1", 1, "u", "c", null.asInstanceOf[String], ts))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val y = Seq(("c1", 0, "u", "a", null.asInstanceOf[String], ts),
      ("c1", 1, "u", "b\u0001c", null.asInstanceOf[String], ts))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    def digestOf(df: org.apache.spark.sql.DataFrame): String =
      Curation.convFingerprint(df).collect()(0).getAs[String]("digest")
    assert(digestOf(x) != digestOf(y))
  }
}
