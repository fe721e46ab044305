package graft.streaming

import java.sql.Timestamp
import graft.SparkTestBase
import graft.model.Turn
import org.apache.spark.sql.streaming.Trigger

class SessionTrackerSpec extends SparkTestBase {

  private def t(minutes: Long): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
      .plusMinutes(minutes))

  test("session closes on event-time idle gap and emits one exact summary") {
    import spark.implicits._
    val dir = tmpDir("session-in")
    // conv a: 4 turns in the first 6 minutes → last activity t+6.
    // conv b: 3 turns three hours later → advances the watermark far
    // past a's idle horizon but stays open itself.
    val turns = Seq(
      Turn("a", 0, "user", "hi", null, t(0)),
      Turn("a", 1, "assistant", "hello!", "search", t(2)),
      Turn("a", 2, "user", "thanks", null, t(4)),
      Turn("a", 3, "assistant", "bye", null, t(6)),
      Turn("b", 0, "user", "later conv", null, t(180)),
      Turn("b", 1, "assistant", "yes", "code", t(182)),
      Turn("b", 2, "user", "ok", null, t(184)))
    turns.toDF().write.mode("overwrite").parquet(dir)

    val q = SessionTracker.sessionSummaries(
        StreamingRollup.readStream(spark, dir),
        idleGapMs = 30L * 60 * 1000, watermarkDelay = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // watermark = t+184 − 10m = t+174; a's timeout was t+6 + 30m = t+36
    // → a closed; b's timeout t+184+30m is ahead → still open.
    val rows = spark.table("sessions").as[SessionTracker.ConvSummary]
      .collect().sortBy(_.conv_id)
    assert(rows.map(_.conv_id).toSeq == Seq("a"),
      s"exactly conv a must have closed, got ${rows.mkString(", ")}")
    val a = rows.head
    assert(a.turns == 4L)
    assert(a.user_turns == 2L && a.assistant_turns == 2L)
    assert(a.tool_calls == 1L)
    assert(a.char_len_sum == Seq("hi", "hello!", "thanks", "bye").map(_.length.toLong).sum)
    assert(a.first_ts == t(0) && a.last_ts == t(6))
    assert(a.duration_sec == 360.0)
    assert(a.turn_span == 4)
  }
}
