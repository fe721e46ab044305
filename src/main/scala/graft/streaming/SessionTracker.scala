package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state with `flatMapGroupsWithState`: per-conversation
  * session tracking. A conversation accumulates running aggregates while
  * turns keep arriving; once the event-time watermark passes its last
  * activity plus `idleGapMs`, the state times out and the tracker emits
  * ONE final [[ConvSummary]] and drops the state.
  *
  * This is the streaming generalization of the reference's per-file
  * status machine (`PENDING → IN_PROGRESS → COMPLETED`,
  * `MigrateTask.java:79-111`): open state = IN_PROGRESS, the event-time
  * timeout is the "no more rows can arrive" transition to COMPLETED.
  * State size is O(live conversations) — closed conversations leave
  * nothing behind, so a 10^12-turn stream holds state only for the
  * conversations inside one idle-gap horizon.
  */
object SessionTracker {

  /** Narrow typed input row (text reduced to its length map-side —
    * session state never holds text bytes).
    */
  final case class TurnLite(
      conv_id: String, turn_idx: Int, role: String, tool: String,
      ts: Timestamp, char_len: Long)

  /** Running per-conversation state while the session is open. */
  final case class ConvState(
      turns: Long, userTurns: Long, assistantTurns: Long, toolCalls: Long,
      charLenSum: Long, firstMs: Long, lastMs: Long,
      minIdx: Int, maxIdx: Int)

  /** Final summary emitted exactly once, when the session closes. */
  final case class ConvSummary(
      conv_id: String, turns: Long, user_turns: Long, assistant_turns: Long,
      tool_calls: Long, char_len_sum: Long, first_ts: Timestamp,
      last_ts: Timestamp, duration_sec: Double, turn_span: Int)

  private val empty =
    ConvState(0L, 0L, 0L, 0L, 0L, Long.MaxValue, Long.MinValue,
      Int.MaxValue, Int.MinValue)

  private def merge(s: ConvState, t: TurnLite): ConvState = {
    val ms = t.ts.getTime
    ConvState(
      s.turns + 1,
      s.userTurns + (if (t.role == "user") 1 else 0),
      s.assistantTurns + (if (t.role == "assistant") 1 else 0),
      s.toolCalls + (if (t.tool != null) 1 else 0),
      s.charLenSum + t.char_len,
      math.min(s.firstMs, ms), math.max(s.lastMs, ms),
      math.min(s.minIdx, t.turn_idx), math.max(s.maxIdx, t.turn_idx))
  }

  private def summarize(convId: String, s: ConvState): ConvSummary =
    ConvSummary(convId, s.turns, s.userTurns, s.assistantTurns, s.toolCalls,
      s.charLenSum, new Timestamp(s.firstMs), new Timestamp(s.lastMs),
      (s.lastMs - s.firstMs) / 1000.0, s.maxIdx - s.minIdx + 1)

  private def track(idleGapMs: Long)(
      convId: String, rows: Iterator[TurnLite],
      state: GroupState[ConvState]): Iterator[ConvSummary] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(summarize(convId, s))
    } else {
      var s = state.getOption.getOrElse(empty)
      rows.foreach(t => s = merge(s, t))
      state.update(s)
      // close when the event-time watermark passes last activity + gap;
      // the timeout must stay ahead of the current watermark (a session
      // fed only by late rows would otherwise set one in the past)
      state.setTimeoutTimestamp(
        math.max(s.lastMs + idleGapMs, state.getCurrentWatermarkMs() + 1))
      Iterator.empty
    }
  }

  /** Session summaries over a transcripts stream. Append mode: each
    * conversation yields exactly one row, after `idleGapMs` of event-time
    * silence (as observed through a `watermarkDelay` watermark).
    */
  def sessionSummaries(
      stream: DataFrame,
      idleGapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[ConvSummary] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .filter(col("ts").isNotNull && col("conv_id").isNotNull)
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        col("ts"), length(col("text")).cast("long").as("char_len"))
      .withWatermark("ts", watermarkDelay)
      .as[TurnLite]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        track(idleGapMs))
  }
}
