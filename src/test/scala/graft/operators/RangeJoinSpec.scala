package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int) = java.sql.Timestamp.from(
    java.time.Instant.parse("2024-03-01T00:00:00Z").plusSeconds(min * 60L))

  private lazy val events = Seq(
    ("k1", 1, ts(30)),   // inside iv A only
    ("k1", 2, ts(90)),   // inside iv B only
    ("k1", 3, ts(60)),   // boundary: A.end == ts (inclusive) and B.start == ts
    ("k1", 4, ts(500)),  // no interval
    ("k2", 5, ts(30)))   // same time, other key
    .toDF("conv_id", "turn_idx", "ts")

  private lazy val intervals = Seq(
    ("k1", "A", ts(0), ts(60)),
    ("k1", "B", ts(60), ts(200)),  // spans multiple 1h cells
    ("k2", "C", ts(0), ts(45)))
    .toDF("conv_id", "iv", "iv_start", "iv_end")

  test("interval join: overlaps, inclusive bounds, per-key isolation, multi-cell intervals") {
    val got = RangeJoin.intervalJoin(events, intervals, "conv_id", "ts",
        "iv_start", "iv_end", cellSeconds = 3600L)
      .select("turn_idx", "iv").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set(1 -> "A", 2 -> "B", 3 -> "A", 3 -> "B", 5 -> "C"),
      s"got $got")
  }

  test("guards: shared column names fail fast; inverted intervals match nothing") {
    // shared non-key name would AnalysisException deep in the plan (or
    // silently clobber) — the operator rejects it up front
    val clash = intervals.withColumnRenamed("iv", "turn_idx")
    intercept[IllegalArgumentException](
      RangeJoin.intervalJoin(events, clash, "conv_id", "ts", "iv_start", "iv_end"))
    // an inverted (end < start) interval is dropped BEFORE cell
    // expansion — no matches, and no descending-sequence cell blowup
    val inverted = Seq(("k1", "X", ts(400), ts(0))).toDF("conv_id", "iv", "iv_start", "iv_end")
    assert(RangeJoin.intervalJoin(events, inverted, "conv_id", "ts",
      "iv_start", "iv_end").count() == 0)
  }

  test("interval join plans an equi-join, never a nested-loop range join") {
    val out = RangeJoin.intervalJoin(events, intervals, "conv_id", "ts",
      "iv_start", "iv_end")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must be grid-bucketed equi-join:\n$plan")
  }

  test("interval join == naive inequality reference on random inputs") {
    val gen = for {
      ne <- org.scalacheck.Gen.choose(1, 30)
      ni <- org.scalacheck.Gen.choose(0, 15)
      es <- org.scalacheck.Gen.listOfN(ne, for {
        k <- org.scalacheck.Gen.choose(0, 3)
        t <- org.scalacheck.Gen.choose(0L, 600L)
      } yield (s"k$k", t))
      is <- org.scalacheck.Gen.listOfN(ni, for {
        k <- org.scalacheck.Gen.choose(0, 3)
        a <- org.scalacheck.Gen.choose(0L, 600L)
        len <- org.scalacheck.Gen.choose(0L, 300L)
      } yield (s"k$k", a, a + len))
    } yield (es, is)
    new graft.PropHelpers {}.forAllN(gen, n = 20) { case (es, is) =>
      val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
      def t(min: Long) = java.sql.Timestamp.from(base.plusSeconds(min * 60))
      val left = es.zipWithIndex.map { case ((k, m), i) => (k, i, t(m)) }
        .toDF("conv_id", "turn_idx", "ts")
      val right = is.zipWithIndex.map { case ((k, a, b), i) => (k, i, t(a), t(b)) }
        .toDF("conv_id", "iv", "iv_start", "iv_end")
      val got = RangeJoin.intervalJoin(left, right, "conv_id", "ts",
          "iv_start", "iv_end", cellSeconds = 1800L)
        .select("turn_idx", "iv").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val want = (for {
        ((ek, em), ei) <- es.zipWithIndex
        ((ik, ia, ib), ii) <- is.zipWithIndex
        if ek == ik && ia <= em && em <= ib
      } yield (ei, ii)).toSet
      assert(got == want, s"es=$es is=$is")
    }
  }
}
