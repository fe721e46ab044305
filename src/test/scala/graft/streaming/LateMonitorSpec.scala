package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LateMonitorSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def toTurns(rows: Seq[(String, Int, Timestamp)]) = {
    import spark.implicits._
    rows.toDF("conv_id", "turn_idx", "ts")
      .select(col("conv_id"), col("turn_idx"), lit("user").as("role"),
        lit("x").as("text"), lit(null).cast("string").as("tool"), col("ts"))
  }

  test("stream ≡ batch on turn-ordered triggers; hwm carries across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Int, Timestamp)]
    // the watermark must still ADMIT the cross-trigger straggler (rows
    // below it are dropped before the state function — the monitor
    // measures lateness within the watermark bound, by construction)
    val q = LateMonitor.latePartials(
        ms.toDF().toDF("conv_id", "turn_idx", "ts"),
        watermarkDelay = "2 hours")
      .writeStream.outputMode("append")
      .format("memory").queryName("late_partials")
      .start()
    try {
      // batch 1: conv a sets hwm 10:30 (turn 1 arrives BEHIND turn 0's
      // mark: 60s late); conv b is clean
      ms.addData(
        ("a", 0, ts("2024-03-01 10:30:00")),
        ("a", 1, ts("2024-03-01 10:29:00")),
        ("b", 0, ts("2024-03-01 11:00:00")))
      q.processAllAvailable()
      // batch 2: a's CARRIED mark (10:30) flags a cross-trigger
      // straggler from the previous day's session (30 min late); a
      // fresh on-time turn follows. Within this trigger the rows are
      // ADDED out of turn order — the fold must re-order by turn_idx
      ms.addData(
        ("a", 3, ts("2024-03-01 10:40:00")),
        ("a", 2, ts("2024-03-01 10:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val merged = LateMonitor.mergeLatePartials(
      spark.table("late_partials"))
    val got = merged.collect().map(r => r.getTimestamp(0).toString ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    // batch oracle over the same rows in the same arrival (turn) order
    val batch = graft.operators.SeriesOps.outOfOrderSkew(toTurns(Seq(
      ("a", 0, ts("2024-03-01 10:30:00")),
      ("a", 1, ts("2024-03-01 10:29:00")),
      ("a", 2, ts("2024-03-01 10:00:00")),
      ("a", 3, ts("2024-03-01 10:40:00")),
      ("b", 0, ts("2024-03-01 11:00:00")))))
      .collect().map(r => r.getTimestamp(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(6)) -1L else r.getLong(6)))).toMap
    assert(got == batch, s"stream != batch:\n got $got\n exp $batch")
    // and the values themselves: 5 events, 2 late (60s and 30m), max 30m
    assert(got("2024-03-01 00:00:00.0") ==
      ((5L, 2L, 0.4, 1800000000L)), s"got $got")
  }

  test("every turn is counted exactly once across partials; sub-ms precision") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Int, Timestamp)]
    val q = LateMonitor.latePartials(
        ms.toDF().toDF("conv_id", "turn_idx", "ts"),
        watermarkDelay = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("late_once")
      .start()
    try {
      // µs-level inversion: turn 1 is 500µs BEHIND turn 0 — getTime
      // (ms) alone would call them simultaneous and miss the lateness
      val base = ts("2024-03-02 09:00:00.001000")
      val back = ts("2024-03-02 09:00:00.000500")
      ms.addData(("c", 0, base), ("c", 1, back))
      q.processAllAvailable()
      ms.addData(("c", 2, ts("2024-03-02 09:01:00")))
      q.processAllAvailable()
    } finally q.stop()
    val parts = spark.table("late_once").collect()
    assert(parts.map(_.getLong(2)).sum == 3L, s"events must sum to 3: ${parts.toSeq}")
    assert(parts.map(_.getLong(3)).sum == 1L, s"exactly one late: ${parts.toSeq}")
    val mx = parts.flatMap(r => if (r.isNullAt(4)) None else Some(r.getLong(4)))
    assert(mx.toSeq == Seq(500L), s"skew must be the exact 500µs: ${parts.toSeq}")
  }
}
