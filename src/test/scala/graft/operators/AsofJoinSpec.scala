package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    ("k1", ts("2024-03-01 10:00:00"), 100L),
    ("k1", ts("2024-03-01 10:05:00"), 105L),
    ("k1", ts("2024-03-01 10:10:00"), 110L),
    ("k2", ts("2024-03-01 10:03:00"), 203L))
    .toDF("conv_id", "qts", "px")

  private lazy val trades = Seq(
    ("k1", 1, ts("2024-03-01 09:59:59")), // before any quote → null
    ("k1", 2, ts("2024-03-01 10:00:00")), // TIE with quote ts → matches it
    ("k1", 3, ts("2024-03-01 10:07:30")), // between quotes → 10:05
    ("k1", 4, ts("2024-03-01 11:00:00")), // after last → 10:10
    ("k2", 5, ts("2024-03-01 10:04:00")), // other key → its own quote
    ("k3", 6, ts("2024-03-01 10:04:00"))) // key with no right rows → null
    .toDF("conv_id", "turn_idx", "ts")

  test("asof: latest right row at or before left ts, per key, ties match") {
    val out = AsofJoin.asofJoin(trades, quotes, "conv_id", "ts", "qts")
      .orderBy("turn_idx").collect()
    assert(out.map(r => if (r.isNullAt(4)) -1L else r.getLong(4)).toSeq ==
      Seq(-1L, 100L, 105L, 110L, 203L, -1L))
    // the as-of timestamp rides along with the payload
    assert(out(2).getTimestamp(3) == ts("2024-03-01 10:05:00"))
    // left columns pass through untouched
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2, 3, 4, 5, 6))
  }

  test("asof: a null payload COLUMN does not skip past the latest right ROW") {
    val q = Seq(
      ("k1", ts("2024-03-01 10:00:00"), Some(100L)),
      ("k1", ts("2024-03-01 10:05:00"), None)) // latest row, null column
      .toDF("conv_id", "qts", "px")
    val t = Seq(("k1", 1, ts("2024-03-01 10:06:00"))).toDF("conv_id", "turn_idx", "ts")
    val out = AsofJoin.asofJoin(t, q, "conv_id", "ts", "qts").head()
    // the latest ROW (10:05) wins even though its px is null — matching
    // DuckDB ASOF JOIN, which picks rows, not non-null column values
    assert(out.getTimestamp(3) == ts("2024-03-01 10:05:00"))
    assert(out.isNullAt(4))
  }

  test("asof: one shuffle on the key, no range join in the plan") {
    val out = AsofJoin.asofJoin(trades, quotes, "conv_id", "ts", "qts")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asof must not plan a join:\n$plan")
    assert("Exchange".r.findAllIn(plan).size <= 2,
      s"expected union-side exchanges only:\n$plan")
  }

  test("asof forward: earliest at-or-after, ties match; tolerance nulls stale matches") {
    val out = AsofJoin.asofJoin(trades, quotes, "conv_id", "ts", "qts",
        direction = AsofJoin.Forward)
      .orderBy("turn_idx").collect()
    // 09:59:59→10:00, 10:00 tie→10:00, 10:07:30→10:10, 11:00→none,
    // k2 10:04→none (its only quote is at 10:03, behind), k3→none
    assert(out.map(r => if (r.isNullAt(4)) -1L else r.getLong(4)).toSeq ==
      Seq(100L, 100L, 110L, -1L, -1L, -1L))

    // backward with a 60s staleness bound: the 10:07:30 trade's match
    // (10:05, 150s stale) nulls out; the tie match (0s) survives
    val tol = AsofJoin.asofJoin(trades, quotes, "conv_id", "ts", "qts",
        toleranceSeconds = Some(60L))
      .orderBy("turn_idx").collect()
    assert(tol.map(r => if (r.isNullAt(4)) -1L else r.getLong(4)).toSeq ==
      Seq(-1L, 100L, -1L, -1L, 203L, -1L))
  }

  test("asof: null timestamps never match (both directions, tolerance or not)") {
    val nullQuote = Seq(("k1", null.asInstanceOf[java.sql.Timestamp], 999L))
      .toDF("conv_id", "qts", "px")
    val nullTrade = Seq(("k1", 9, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("conv_id", "turn_idx", "ts")
    for (dir <- Seq[AsofJoin.Direction](AsofJoin.Backward, AsofJoin.Forward);
         tol <- Seq(None, Some(3600L))) {
      // a null-ts RIGHT row is meaningless state — nulls-first sorting
      // would otherwise make it a universal fallback match
      val viaNullRight = AsofJoin.asofJoin(trades,
        quotes.union(nullQuote), "conv_id", "ts", "qts", dir, tol).collect()
      assert(!viaNullRight.exists(r => !r.isNullAt(4) && r.getLong(4) == 999L),
        s"null-ts right row matched ($dir, $tol)")
      // a null-ts LEFT row passes through with null payload
      val viaNullLeft = AsofJoin.asofJoin(trades.union(nullTrade),
        quotes, "conv_id", "ts", "qts", dir, tol).collect()
      val nl = viaNullLeft.find(_.getInt(1) == 9).get
      assert(nl.isNullAt(4), s"null-ts left row must not match ($dir, $tol)")
    }
  }

  test("asof forward plans the RUNNING frame, never unbounded-following") {
    // [currentRow, unboundedFollowing] re-aggregates the remaining
    // partition per output row — O(n²) on dense keys; forward must be
    // the reversed-sort running frame instead
    val plan = AsofJoin.asofJoin(trades, quotes, "conv_id", "ts", "qts",
      direction = AsofJoin.Forward).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("unboundedfollowing"),
      s"forward asof must not plan an unbounded-following frame:\n$plan")
    assert("Exchange".r.findAllIn(plan).size <= 2, plan)
  }

  test("asof: reserved and colliding column names fail fast") {
    // same contract as RangeJoin.intervalJoin: refuse inputs that would
    // be silently clobbered by internal columns or duplicated outputs
    intercept[IllegalArgumentException](AsofJoin.asofJoin(
      trades.withColumn("_side", lit(1)), quotes, "conv_id", "ts", "qts"))
    intercept[IllegalArgumentException](AsofJoin.asofJoin(
      trades, quotes.withColumn("_r", lit(1)), "conv_id", "ts", "qts"))
    intercept[IllegalArgumentException](AsofJoin.asofJoin(
      trades.withColumn("px_asof", lit(0L)), quotes, "conv_id", "ts", "qts"))
  }

  test("asof == naive latest-at-or-before reference on random inputs") {
    // randomized pin against the O(|l|·|r|) definition the union-sort
    // form replaces: for each left row, max right ts <= left ts per key
    val gen = for {
      nl <- org.scalacheck.Gen.choose(1, 40)
      nr <- org.scalacheck.Gen.choose(0, 40)
      ls <- org.scalacheck.Gen.listOfN(nl, for {
        k <- org.scalacheck.Gen.choose(0, 4)
        t <- org.scalacheck.Gen.choose(0L, 50L)
      } yield (s"k$k", t))
      rs <- org.scalacheck.Gen.listOfN(nr, for {
        k <- org.scalacheck.Gen.choose(0, 4)
        t <- org.scalacheck.Gen.choose(0L, 50L)
      } yield (s"k$k", t))
    } yield (ls, rs.distinct) // right unique per (key, ts) — the contract
    new graft.PropHelpers {}.forAllN(gen, n = 25) { case (ls, rs) =>
      val base = ts("2024-03-01 00:00:00").getTime
      val left = ls.zipWithIndex.map { case ((k, t), i) =>
        (k, i, new java.sql.Timestamp(base + t * 60000)) }
        .toDF("conv_id", "turn_idx", "ts")
      val right = rs.zipWithIndex.map { case ((k, t), i) =>
        (k, new java.sql.Timestamp(base + t * 60000), i.toLong) }
        .toDF("conv_id", "qts", "px")
      val got = AsofJoin.asofJoin(left, right, "conv_id", "ts", "qts")
        .collect()
        .map(r => (r.getInt(1), if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .toMap
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val matches = rs.zipWithIndex.filter { case ((rk, rt), _) => rk == k && rt <= t }
        i -> (if (matches.isEmpty) None
              else Some(matches.maxBy { case ((_, rt), ri) => (rt, ri) } match {
                case ((_, rt), _) =>
                  // latest ts; px of THE row at that ts (unique per key+ts)
                  rs.zipWithIndex.collectFirst {
                    case ((rk2, rt2), ri2) if rk2 == k && rt2 == rt => ri2.toLong
                  }.get
              }))
      }.toMap
      assert(got == want, s"ls=$ls rs=$rs")
    }
  }

  test("forward asof with tolerance == naive reference on random inputs") {
    val gen = for {
      nl <- org.scalacheck.Gen.choose(1, 40)
      nr <- org.scalacheck.Gen.choose(0, 40)
      tol <- org.scalacheck.Gen.choose(0L, 20L) // minutes
      ls <- org.scalacheck.Gen.listOfN(nl, for {
        k <- org.scalacheck.Gen.choose(0, 4)
        t <- org.scalacheck.Gen.choose(0L, 50L)
      } yield (s"k$k", t))
      rs <- org.scalacheck.Gen.listOfN(nr, for {
        k <- org.scalacheck.Gen.choose(0, 4)
        t <- org.scalacheck.Gen.choose(0L, 50L)
      } yield (s"k$k", t))
    } yield (ls, rs.distinct, tol)
    new graft.PropHelpers {}.forAllN(gen, n = 25) { case (ls, rs, tolMin) =>
      val base = ts("2024-03-01 00:00:00").getTime
      val left = ls.zipWithIndex.map { case ((k, t), i) =>
        (k, i, new java.sql.Timestamp(base + t * 60000)) }
        .toDF("conv_id", "turn_idx", "ts")
      val right = rs.zipWithIndex.map { case ((k, t), i) =>
        (k, new java.sql.Timestamp(base + t * 60000), i.toLong) }
        .toDF("conv_id", "qts", "px")
      val got = AsofJoin.asofJoin(left, right, "conv_id", "ts", "qts",
          direction = AsofJoin.Forward, toleranceSeconds = Some(tolMin * 60L))
        .collect()
        .map(r => (r.getInt(1), if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .toMap
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val matches = rs.filter { case (rk, rt) => rk == k && rt >= t && rt - t <= tolMin }
        i -> (if (matches.isEmpty) None
              else {
                val rt = matches.map(_._2).min // earliest; unique per (key, ts)
                rs.zipWithIndex.collectFirst {
                  case ((rk2, rt2), ri2) if rk2 == k && rt2 == rt => ri2.toLong
                }
              })
      }.toMap
      assert(got == want, s"ls=$ls rs=$rs tol=$tolMin")
    }
  }
}
