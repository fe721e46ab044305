package graft.streaming

import java.sql.Timestamp
import graft.SparkTestBase
import graft.operators.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSessionizeSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cross-batch continuity, gap-boundary parity, batch == stream on replay") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Int, Timestamp)]
    val q = StreamingSessionize.sessions(
        ms.toDF().toDF("conv_id", "turn_idx", "ts"),
        gapSeconds = 1800L, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssess")
      .start()
    try {
      // session 1 of c1 starts in batch 1...
      ms.addData(("c1", 0, ts("2024-03-01 10:00:00")), ("c1", 1, ts("2024-03-01 10:05:00")))
      q.processAllAvailable()
      assert(spark.table("ssess").isEmpty, "open sessions must not emit")

      // ...and CONTINUES in batch 2 (cross-batch continuity), including
      // a row at EXACTLY the 30-minute gap after its predecessor — the
      // batch rule is strict `>`, so it stays in the same session
      // (session_window() would split here); c2 opens far ahead, which
      // advances the watermark past c1's last+gap
      ms.addData(("c1", 2, ts("2024-03-01 10:20:00")), ("c1", 3, ts("2024-03-01 10:50:00")),
        ("c2", 0, ts("2024-03-01 12:00:00")))
      q.processAllAvailable()
      // watermark updates at batch END; processAllAvailable also runs
      // the follow-up batch that fires due timeouts — after the c9 row
      // pushes the watermark to 13:00, BOTH c1 (last+gap 11:20) and c2
      // (12:30) close
      ms.addData(("c9", 0, ts("2024-03-01 13:00:00")))
      q.processAllAvailable()
      val closed = spark.table("ssess").as[StreamingSessionize.SessionRow].collect()
      assert(closed.sortBy(_.conv_id).toSeq == Seq(
        StreamingSessionize.SessionRow(
          "c1", ts("2024-03-01 10:00:00"), ts("2024-03-01 10:50:00"), 4L, 3000.0),
        StreamingSessionize.SessionRow(
          "c2", ts("2024-03-01 12:00:00"), ts("2024-03-01 12:00:00"), 1L, 0.0)),
        s"got ${closed.toSeq}")

      // advancing further closes c9's first (single-turn) session too
      ms.addData(("c9", 1, ts("2024-03-01 14:00:00")))
      q.processAllAvailable()
      val emitted = spark.table("ssess").as[StreamingSessionize.SessionRow].collect()
      assert(emitted.map(_.conv_id).sorted.toSeq == Seq("c1", "c2", "c9"))

      // batch-vs-stream equality on the replayed input: every emitted
      // session matches the batch operator exactly (minus the lifetime
      // session_idx, a batch construct — documented)
      val all = Seq(
        ("c1", 0, ts("2024-03-01 10:00:00")), ("c1", 1, ts("2024-03-01 10:05:00")),
        ("c1", 2, ts("2024-03-01 10:20:00")), ("c1", 3, ts("2024-03-01 10:50:00")),
        ("c2", 0, ts("2024-03-01 12:00:00")),
        ("c9", 0, ts("2024-03-01 13:00:00")), ("c9", 1, ts("2024-03-01 14:00:00")))
        .toDF("conv_id", "turn_idx", "ts")
      val batch = Sessionize.summarize(all, 1800L)
        .select("conv_id", "session_start", "session_end", "turns", "duration_sec")
      val streamed = spark.table("ssess")
      assert(streamed.join(batch, batch.columns.toSeq, "inner").count() ==
        streamed.count(), "every closed stream session must equal its batch row")
    } finally q.stop()
  }

  test("out-of-order rows inside the watermark land in the right session") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Int, Timestamp)]
    val q = StreamingSessionize.sessions(
        ms.toDF().toDF("conv_id", "turn_idx", "ts"),
        gapSeconds = 1800L, watermarkDelay = "2 hours")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssess_ooo")
      .start()
    try {
      ms.addData(("c1", 0, ts("2024-03-01 10:00:00")), ("c1", 2, ts("2024-03-01 10:40:00")))
      q.processAllAvailable()
      // 10:20 arrives LATE (next batch) but inside the 2h watermark: it
      // must merge into the buffered session, not open its own
      ms.addData(("c1", 1, ts("2024-03-01 10:20:00")))
      q.processAllAvailable()
      ms.addData(("c9", 0, ts("2024-03-01 15:00:00"))) // wm → 13:00
      q.processAllAvailable()
      ms.addData(("c9", 1, ts("2024-03-01 15:00:01"))) // timeout fires
      q.processAllAvailable()
      val rows = spark.table("ssess_ooo").as[StreamingSessionize.SessionRow].collect()
      assert(rows.toSeq == Seq(StreamingSessionize.SessionRow(
        "c1", ts("2024-03-01 10:00:00"), ts("2024-03-01 10:40:00"), 3L, 2400.0)),
        s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("closeSessions: strict-gap splits, watermark-gated closes, µs arithmetic") {
    import StreamingSessionize.closeSessions
    val gap = 1800L * 1000000L
    // exact-gap boundary stays; gap+1µs splits
    val (c1, p1) = closeSessions(
      Seq(0L, gap, gap * 2, gap * 3 + 1), gap, watermarkUs = Long.MaxValue)
    assert(c1.map(_.length) == Seq(3, 1) && p1.isEmpty)
    // nothing closes until the watermark passes last+gap STRICTLY
    val (c2, p2) = closeSessions(Seq(0L, 1000L), gap, watermarkUs = 1000L + gap)
    assert(c2.isEmpty && p2 == Seq(Seq(0L, 1000L)))
    val (c3, p3) = closeSessions(Seq(0L, 1000L), gap, watermarkUs = 1001L + gap)
    assert(c3.map(_.length) == Seq(2) && p3.isEmpty)
    // closed prefix + open tail split correctly
    val far = gap * 10
    val (c4, p4) = closeSessions(Seq(0L, far), gap, watermarkUs = far)
    assert(c4 == Seq(Seq(0L)) && p4 == Seq(Seq(far)))
  }

  test("durable session sink: exactly-once commits under stream_sessions lineage") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = tmpDir("sess-wh")
    // the session job's OWN state root: the rollup stream and the
    // session stream run concurrently over one warehouse, and a
    // StateStore root is single-writer
    assert(StreamingSessionJob.statePath(wh) != s"$wh/_state")
    val state = new graft.state.StateStore(StreamingSessionJob.statePath(wh))
    val table = new graft.table.SnapshotTable(StreamingSessionJob.tablePath(wh))
    val committed = StreamingRollupJob.loadCommitted(state, table, StreamingSessionJob.tierName)

    val ms = MemoryStream[(String, Int, Timestamp)]
    val q = StreamingSessionize.sessions(
        ms.toDF().toDF("conv_id", "turn_idx", "ts"),
        gapSeconds = 1800L, watermarkDelay = "0 seconds")
      .toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmpDir("sess-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamingRollupJob.commitBatch(state, table, StreamingSessionJob.tierName,
          committed, "spec-scope", batch, id, "sess-job", dayCol = "session_start")
        ()
      }
      .start()
    try {
      ms.addData(("c1", 0, ts("2024-03-01 10:00:00")), ("c1", 1, ts("2024-03-01 10:10:00")))
      q.processAllAvailable()
      ms.addData(("c2", 0, ts("2024-03-01 13:00:00")))
      q.processAllAvailable()
      ms.addData(("c2", 1, ts("2024-03-01 15:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val rows = table.read(spark)
    assert(rows.count() >= 1, "closed sessions must land in the table")
    assert(rows.filter(col("conv_id") === "c1").head()
      .getAs[Long]("turns") == 2L)
    // lineage rides the stream_sessions namespace with manifest keys
    assert(state.lineage.exists(r =>
      r.tier == "stream_sessions" && r.status == "COMPLETED"))
    assert(table.currentManifest.get.batchKeys.nonEmpty)
    // a replayed batchId is skipped, not re-appended
    val before = table.currentManifest.get.version
    val replay = Seq(("cX", 0, ts("2024-03-01 20:00:00")))
      .toDF("conv_id", "turn_idx", "ts")
      .select(col("conv_id"), col("ts").as("session_start"),
        col("ts").as("session_end"), lit(1L).as("turns"), lit(0.0).as("duration_sec"))
    val replayedId = state.lineage.filter(_.tier == "stream_sessions")
      .map(_.partition).head.split("-batch-").last.toLong
    val n = StreamingRollupJob.commitBatch(state, table, StreamingSessionJob.tierName,
      committed, "spec-scope", replay, replayedId, "sess-job", dayCol = "session_start")
    assert(n == 0L && table.currentManifest.get.version == before,
      "replayed batch must be a no-op")
  }
}
