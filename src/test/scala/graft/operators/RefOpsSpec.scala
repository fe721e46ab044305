package graft.operators

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
}
