package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming GAP-BASED sessionization — the durable streaming sibling
  * of the batch [[graft.operators.Sessionize]] (q19): a conversation's
  * turns split into sessions wherever the inter-turn gap exceeds
  * `gapSeconds`, and each CLOSED session emits exactly one summary row.
  *
  * Semantics are batch-exact by construction:
  *
  *  - the split rule is the SAME strict `gap > gapSeconds` in
  *    MICROSECOND arithmetic (a row at exactly `gapSeconds` after its
  *    predecessor stays in the session — `session_window()` would put
  *    it in a new one, because its window is half-open `[start,
  *    last+gap)`, which is why this uses custom state instead);
  *  - out-of-order arrivals inside the watermark horizon land
  *    correctly: turns BUFFER in state (timestamps only — O(turns
  *    inside one watermark+gap horizon per live conversation), never
  *    text) and a session only closes once the event-time watermark
  *    passes `last_event + gap`, when no admissible row can extend or
  *    reorder it;
  *  - closed conversations leave NO state behind (the buffer empties
  *    and the state is removed), so perpetual streams hold state only
  *    for conversations inside one horizon.
  *
  * The one batch construct that does not stream is the per-conversation
  * LIFETIME `session_idx`: numbering session k requires remembering a
  * conversation forever after it goes idle, which contradicts bounded
  * state. Streaming consumers order sessions by `session_start`
  * (equivalent information); the spec pins batch-vs-stream equality on
  * everything else.
  */
object StreamingSessionize {

  final case class TurnTs(conv_id: String, ts: Timestamp)

  /** Pending (not yet closable) event times of one conversation, in
    * epoch MICROSECONDS, unsorted (sorted on use).
    */
  final case class PendingTurns(us: List[Long])

  final case class SessionRow(
      conv_id: String, session_start: Timestamp, session_end: Timestamp,
      turns: Long, duration_sec: Double)

  private def usOf(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def tsOf(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** Split sorted event times into sessions (strict `> gapUs` splits —
    * the batch rule), then close every session no admissible future row
    * can extend: a session with last event L is extended only by a row
    * with `ts <= L + gap`, impossible once the watermark exceeds it.
    * Returns (closed sessions, still-open sessions), both ascending.
    */
  private[streaming] def closeSessions(sortedUs: Seq[Long], gapUs: Long,
      watermarkUs: Long): (Seq[Seq[Long]], Seq[Seq[Long]]) = {
    val sessions = sortedUs.foldLeft(List.empty[List[Long]]) {
      case (acc, t) => acc match {
        case cur :: rest if t - cur.head <= gapUs => (t :: cur) :: rest
        case _ => List(t) :: acc
      }
    }.map(_.reverse).reverse
    sessions.partition(s => watermarkUs > s.last + gapUs)
  }

  private def track(gapUs: Long)(
      convId: String, rows: Iterator[TurnTs],
      state: GroupState[PendingTurns]): Iterator[SessionRow] = {
    val merged = (state.getOption.map(_.us).getOrElse(Nil) ++
      rows.map(t => usOf(t.ts))).sorted
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (closed, open) = closeSessions(merged, gapUs, wmUs)
    if (open.isEmpty) {
      if (state.exists || state.hasTimedOut) state.remove()
    } else {
      state.update(PendingTurns(open.flatten.toList))
      // fire as soon as the watermark strictly exceeds the EARLIEST
      // open session's last + gap (keying to the latest would make an
      // early pending session wait for a later one's horizon): floor-ms
      // suffices (wm > floor((last+gap)/1000) ms ⇒ wm·1000 > last+gap
      // µs), clamped ahead of the current watermark as the API requires
      state.setTimeoutTimestamp(
        math.max((open.head.last + gapUs) / 1000L, state.getCurrentWatermarkMs() + 1))
    }
    closed.iterator.map { s =>
      SessionRow(convId, tsOf(s.head), tsOf(s.last), s.length.toLong,
        (s.last - s.head).toDouble / 1000000.0)
    }
  }

  /** Closed-session summaries over a transcripts stream (append mode).
    * Input needs `conv_id` and `ts`; everything else is ignored.
    */
  def sessions(stream: DataFrame, gapSeconds: Long,
      watermarkDelay: String = "10 minutes"): Dataset[SessionRow] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .filter(col("ts").isNotNull && col("conv_id").isNotNull)
      .select(col("conv_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[TurnTs]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        track(gapSeconds * 1000000L))
  }
}

/** Durable sink for [[StreamingSessionize]] — the same exactly-once
  * machinery as [[StreamingRollupJob]] (atomic manifest batch keys,
  * O(1) per-trigger planning, `stream_sessions` lineage namespace,
  * periodic compaction, ONE shared sink harness —
  * `StreamingRollupJob.startSink`), writing closed sessions as
  * `session_start`-day partitions of `<warehouse>/sessions_stream`.
  *
  * The session job gets its OWN state root
  * (`<warehouse>/_sessions_state`): a [[graft.state.StateStore]] root
  * is single-writer (its compaction debris sweep deletes commits a
  * concurrent writer's trailing seq counter renders invisible — see
  * the StateStore scaladoc), and the natural deployment runs the
  * rollup stream and the session stream CONCURRENTLY over one
  * warehouse. Separate roots make that safe structurally: the lineage
  * namespace separates facts, the root separates writers.
  */
object StreamingSessionJob {

  def tablePath(warehouse: String): String = s"$warehouse/sessions_stream"

  def statePath(warehouse: String): String = s"$warehouse/_sessions_state"

  val tierName = "sessions"

  def start(spark: SparkSession, inputDir: String, warehouse: String,
      checkpointDir: String, gapSeconds: Long = 1800L,
      watermarkDelay: String = "10 minutes", jobId: String = "stream-sessions",
      compactEvery: Int = 100, compactMaxFiles: Int = 4): StreamingQuery =
    StreamingRollupJob.startSink(
      StreamingSessionize.sessions(
        StreamingRollup.readStream(spark, inputDir), gapSeconds, watermarkDelay).toDF(),
      new graft.state.StateStore(statePath(warehouse)),
      new graft.table.SnapshotTable(tablePath(warehouse)),
      checkpointDir, tierName, jobId, compactEvery, compactMaxFiles,
      dayCol = "session_start")
}
