package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RefOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("counterRate: per-second deltas, reset recovery, null boundaries") {
    // key 1: steady counter 10→40→40 over 10s/20s intervals, then a
    // RESET (40→5: the post-reset value is the increase), then a
    // duplicate timestamp (zero interval → null)
    val events = Seq(
      (1L, ts("2024-03-01 10:00:00"), 1L, 10.0),
      (2L, ts("2024-03-01 10:00:10"), 1L, 40.0),  // (40-10)/10 = 3.0
      (3L, ts("2024-03-01 10:00:30"), 1L, 40.0),  // flat → 0.0
      (4L, ts("2024-03-01 10:00:40"), 1L, 5.0),   // reset → 5/10 = 0.5
      (5L, ts("2024-03-01 10:00:40"), 1L, 7.0),   // dup ts → null
      (6L, ts("2024-03-01 10:00:00"), 2L, 99.0))  // single sample → null
      .toDF("event_id", "ts", "user_id", "value")
    val out = RefOps.counterRate(events).orderBy("event_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out == Map(
      1L -> None, 2L -> Some(3.0), 3L -> Some(0.0),
      4L -> Some(0.5), 5L -> None, 6L -> None), s"got $out")
    // one exchange on the key, nothing else wide
    val plan = RefOps.counterRate(events).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, s"one key exchange expected:\n$plan")
  }

  test("topKPerKeyAgg == window topKPerKey; mergeable under repartition") {
    // the bounded-aggregator form must be bit-identical to the window
    // form on the same input, under any partitioning (merge order)
    val events = (1L to 200L).map { i =>
      (i, ts(f"2024-03-01 10:${(i % 50) / 10}%02d:${i % 60}%02d"),
        i % 7, i.toDouble)
    }.toDF("event_id", "ts", "user_id", "value")
    assertSameRows(
      RefOps.topKPerKeyAgg(events, 3),
      RefOps.topKPerKey(events, 3))
    assertSameRows(
      RefOps.topKPerKeyAgg(events.repartition(13), 5),
      RefOps.topKPerKey(events, 5))
    // k >= group size returns whole groups, still rank-ordered
    assertSameRows(
      RefOps.topKPerKeyAgg(events, 1000),
      RefOps.topKPerKey(events, 1000))
    intercept[IllegalArgumentException](RefOps.topKPerKeyAgg(events, 0))
  }

  test("topKPerKeyAgg plan: partial-aggregated, no window sort of the corpus") {
    val events = Seq((1L, ts("2024-03-01 10:00:00"), 1L, 1.0))
      .toDF("event_id", "ts", "user_id", "value")
    val p = RefOps.topKPerKeyAgg(events, 3).queryExecution.executedPlan.toString
    // ObjectHashAggregate partial->final around ONE exchange: the
    // k-item summaries combine map-side (the skew story), and there is
    // no Window/Sort over the raw rows
    assert(p.contains("ObjectHashAggregate"), s"expected object agg plan:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1, s"one key exchange expected:\n$p")
    assert(!p.contains("Window"), s"no window expected:\n$p")
  }

  test("downsampleMinMax: extreme samples per window, deterministic ties") {
    val events = Seq(
      (1L, ts("2024-03-01 10:05:00"), 1L, 5.0),
      (2L, ts("2024-03-01 10:10:00"), 1L, 9.0),
      (3L, ts("2024-03-01 10:20:00"), 1L, 9.0),  // tie on max value
      (4L, ts("2024-03-01 10:30:00"), 1L, 5.0),  // tie on min value
      (5L, ts("2024-03-01 11:05:00"), 1L, 7.0))  // next window: min==max row
      .toDF("event_id", "ts", "user_id", "value")
    val out = RefOps.downsampleMinMax(events).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start").toString.take(13),
        r.getAs[String]("kind")) -> r.getAs[Long]("event_id")).toMap
    assert(out == Map(
      ("2024-03-01 10", "min") -> 1L,  // tie → LOWEST event_id
      ("2024-03-01 10", "max") -> 3L,  // tie → HIGHEST event_id
      ("2024-03-01 11", "min") -> 5L,
      ("2024-03-01 11", "max") -> 5L), s"got $out")
    // partial-aggregated single exchange: map-side combine makes the
    // shuffle ~2 rows per (key, window) regardless of input density
    val plan = RefOps.downsampleMinMax(events).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, s"one exchange expected:\n$plan")
    assert(plan.contains("partial"), s"expected map-side partial agg:\n$plan")
  }

  test("downsampleMinMax: null samples carry no magnitude") {
    // Spark struct ordering sorts nulls FIRST, SQL's ORDER BY defaults
    // them LAST — the operator excludes them so both agree (and its
    // oracle mirrors the filter); a window of only nulls disappears
    val events = Seq(
      (1L, ts("2024-03-01 10:05:00"), 1L, Some(5.0)),
      (2L, ts("2024-03-01 10:10:00"), 1L, None),
      (3L, ts("2024-03-01 11:05:00"), 1L, None))
      .toDF("event_id", "ts", "user_id", "value")
    val out = RefOps.downsampleMinMax(events).collect()
    assert(out.forall(_.getAs[Long]("event_id") == 1L), s"got ${out.toSeq}")
    assert(out.length == 2) // min and max rows of the one live window
  }

  test("lttbDownsample golden: mean anchors, exact-area argmax, tie, endpoints") {
    // bucket 11:00 is the one interior bucket; anchors are the flat
    // 10.00 means of 10:00 and 12:00, so e2 (spike up, area 3.6e12 µs·
    // cents) ties e3 (spike down, same area) → smaller event_id wins,
    // and the collinear e4 scores zero
    val events = Seq(
      (1L, ts("2024-03-01 10:30:00"), 1L, Some(10.0)),
      (2L, ts("2024-03-01 11:10:00"), 1L, Some(20.0)),
      (3L, ts("2024-03-01 11:20:00"), 1L, Some(0.0)),
      (4L, ts("2024-03-01 11:40:00"), 1L, Some(10.0)),
      (5L, ts("2024-03-01 12:30:00"), 1L, Some(10.0)),
      // user 2: a single live sample — first AND last, never lttb;
      // the null-value row has no y and drops whole
      (6L, ts("2024-03-01 10:00:00"), 2L, Some(7.0)),
      (7L, ts("2024-03-01 10:05:00"), 2L, None))
      .toDF("event_id", "ts", "user_id", "value")
    val out = RefOps.lttbDownsample(events).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("kind")) ->
        r.getAs[Long]("event_id")).toMap
    assert(out == Map(
      (1L, "lttb") -> 2L, (1L, "first") -> 1L, (1L, "last") -> 5L,
      (2L, "first") -> 6L, (2L, "last") -> 6L), s"got $out")
  }

  test("lttbDownsample: interior picks match an exact-BigInt brute argmax") {
    // deterministic dense series: 3 users x 120 points, 2-decimal
    // values, irregular spacing — brute recomputes the triangle area
    // from raw points in a DIFFERENT algebraic form (anchor-mean
    // cross products scaled by np*nn, vs the operator's A*B - C*D
    // which equals nn times this)
    val events = (0 until 360).map { i =>
      val u = i % 3 + 1L
      val t = new java.sql.Timestamp(
        ts("2024-03-01 00:00:00").getTime + i * 173000L + (i % 7) * 1000L)
      (i.toLong, t, u, math.round(((i * 37 % 100) + (i % 13) / 13.0) * 100) / 100.0)
    }.toDF("event_id", "ts", "user_id", "value")
    val got = RefOps.lttbDownsample(events).collect()
      .filter(_.getAs[String]("kind") == "lttb")
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("window_start")) -> r.getAs[Long]("event_id"))
      .toMap
    // brute: per (user, hour-bucket) census, neighbor means, exact area
    val rows = events.collect().map { r =>
      val us = r.getAs[java.sql.Timestamp]("ts").getTime * 1000L
      val bus = us - math.floorMod(us, 3600000000L)
      (r.getAs[Long]("user_id"), bus, r.getAs[Long]("event_id"),
        us - bus, math.round(r.getAs[Double]("value") * 100))
    }
    val census = rows.groupBy(t => (t._1, t._2)).map { case (k, v) =>
      k -> (BigInt(v.length), v.map(t => BigInt(t._4)).sum, v.map(t => BigInt(t._5)).sum)
    }
    val expected = rows.groupBy(t => (t._1, t._2)).flatMap { case ((u, bus), pts) =>
      val buckets = census.keys.filter(_._1 == u).map(_._2).toSeq.sorted
      val idx = buckets.indexOf(bus)
      if (idx <= 0 || idx >= buckets.length - 1) None
      else {
        val (tp, tn) = (buckets(idx - 1), buckets(idx + 1))
        val (np, sxp0, syp) = census((u, tp))
        val (nn, sxn0, syn) = census((u, tn))
        val sxp = sxp0 + np * BigInt(tp - bus)
        val sxn = sxn0 + nn * BigInt(tn - bus)
        val best = pts.map { case (_, _, eid, xr, yc) =>
          val s = (sxp * nn * yc - sxp * syn + BigInt(xr) * syn * np
            - BigInt(xr) * syp * nn + sxn * syp - sxn * np * yc).abs
          (s, eid)
        }.minBy { case (s, eid) => (-s, eid) }
        Some((u, new java.sql.Timestamp(bus / 1000L)) -> best._2)
      }
    }
    assert(got == expected, s"argmax mismatch:\n got $got\n exp $expected")
    // plan pin: the argmax and endpoints are min_by/max_by AGGREGATIONS
    // that collapse before their exchange — the ONLY Window node is the
    // census-grain lag/lead (the rank-window form shuffled and sorted
    // the full input three times: measured 99 s vs the 17 s 1m-rollup
    // control on the same 57M rows)
    val plan = RefOps.lttbDownsample(events).queryExecution.executedPlan.toString
    assert("\\bWindow \\[".r.findAllIn(plan).size == 1,
      s"expected exactly the census lag/lead window:\n$plan")
    assert(!plan.contains("row_number"), s"expected no rank windows:\n$plan")
    assert(plan.contains("partial_min_by"),
      s"expected map-side partial argmax agg:\n$plan")
  }

  test("toolSeqEdit golden: alphabetical alphabet, turn order, top-k, pairs") {
    // tools rank error=1, purchase=2, signup=3 → chars '!', '"', '#';
    // A = "!\"#", B = "\"!#" (one adjacent swap = 2 unit edits),
    // C = "!" falls outside k=2
    val t = Seq(
      ("A", 0, "error"), ("A", 1, "purchase"), ("A", 2, "signup"),
      ("B", 0, "purchase"), ("B", 1, "error"), ("B", 2, "signup"),
      ("C", 0, "error"))
      .map { case (c, i, tl) => (c, i, "user", "x", tl,
        ts(s"2024-03-01 10:0$i:00")) }
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val out = RefOps.toolSeqEdit(t, k = 2).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ("A", "B", 3L, 3L, 2L), s"got $r")
    // k=3 pulls C in: deleting two chars from either 3-seq costs 2
    val all = RefOps.toolSeqEdit(t, k = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(all == Map(("A", "B") -> 2L, ("A", "C") -> 2L, ("B", "C") -> 2L))
  }

  test("toolSeqEdit matches a classic Wagner-Fischer DP on synth; big alphabet fails") {
    val turns = graft.ingest.Synth.transcripts(
      spark, nConvs = 20, avgTurns = 40, seed = 23L).toDF()
    val got = RefOps.toolSeqEdit(turns, k = 6).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    // independent sequences: collect, rank tools, order turns, DP
    val raw = turns.filter(col("tool").isNotNull && col("turn_idx").isNotNull
      && col("conv_id").isNotNull)
      .select("conv_id", "turn_idx", "tool").collect()
    val rank = raw.map(_.getString(2)).distinct.sorted.zipWithIndex.toMap
    val seqs = raw.groupBy(_.getString(0)).map { case (c, rs) =>
      c -> rs.sortBy(_.getInt(1)).map(r => ('!' + rank(r.getString(2))).toChar).mkString
    }
    val top = seqs.toSeq.sortBy { case (c, s) => (-s.length, c) }.take(6)
    def wf(a: String, b: String): Long = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1) {
        j => if (i == 0) j else if (j == 0) i else 0 })
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length).toLong
    }
    val exp = (for {
      (ca, sa) <- top; (cb, sb) <- top if ca < cb
    } yield (ca, cb) -> wf(sa, sb)).toMap
    assert(got == exp, s"edit distances diverge:\n got $got\n exp $exp")
    // alphabet guard: 95 distinct tools must fail loudly, not alias
    val big = (0 until 95).flatMap(i => Seq(
      ("X", i, "user", "x", f"t$i%02d", ts("2024-03-01 10:00:00")),
      ("Y", i, "user", "x", f"t$i%02d", ts("2024-03-01 10:00:00"))))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val e = intercept[Exception] { RefOps.toolSeqEdit(big, k = 2).collect() }
    assert(e.getMessage != null && e.toString.contains("alphabet"), e.toString)
  }

  test("olsTrend: exact line recovers slope/intercept with r2=1; degenerate groups pin NULL") {
    // conv A: char_len = 3 + 2*turn_idx exactly (texts of length 3,5,7,9)
    val tr = Seq(
      ("A", 0, "aaa"), ("A", 1, "aaaaa"), ("A", 2, "aaaaaaa"), ("A", 3, "aaaaaaaaa"),
      // conv B: constant length — slope 0, vy = 0 => r2 NULL
      ("B", 0, "xx"), ("B", 1, "xx"), ("B", 2, "xx"),
      // conv C: n = 2 < 3 => all NULL
      ("C", 0, "a"), ("C", 1, "aaaa"),
      // conv D: one null text observation drops, leaving n = 3 on a line
      ("D", 0, "aa"), ("D", 1, null), ("D", 2, "aaaa"), ("D", 4, "aaaaaaaa")
    ).toDF("conv_id", "turn_idx", "text")
    val got = RefOps.olsTrend(tr).collect()
      .map(r => r.getAs[String]("conv_id") -> r).toMap
    val a = got("A")
    assert(a.getAs[Long]("n") == 4)
    assert(a.getAs[Double]("slope") == 2.0)
    assert(a.getAs[Double]("intercept") == 3.0)
    assert(a.getAs[Double]("r2") == 1.0)
    val b = got("B")
    assert(b.getAs[Double]("slope") == 0.0 && b.getAs[Double]("intercept") == 2.0)
    assert(b.isNullAt(b.fieldIndex("r2")), "zero y-variance must pin r2 NULL")
    val c = got("C")
    Seq("slope", "intercept", "r2").foreach(f =>
      assert(c.isNullAt(c.fieldIndex(f)), s"n<3 must pin $f NULL"))
    // D: points (0,2),(2,4),(4,8) — slope 36/24 = 1.5,
    // intercept (14 − 1.5·6)/3 = 5/3, r2 = 36²/(24·56) = 27/28
    val d = got("D")
    assert(d.getAs[Long]("n") == 3)
    assert(d.getAs[Double]("slope") == 1.5)
    assert(d.getAs[Double]("intercept") == math.rint(5.0 / 3.0 * 1e6) / 1e6)
    assert(d.getAs[Double]("r2") == math.rint(27.0 / 28.0 * 1e6) / 1e6)
  }
}
