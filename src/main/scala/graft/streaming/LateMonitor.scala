package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sibling of [[graft.operators.SeriesOps.outOfOrderSkew]] —
  * the live late-data monitor that tells an operator whether the
  * configured watermark still covers the corpus's stragglers.
  *
  * State is ONE high-water mark (µs) per open conversation plus its
  * last-activity instant — the minimal lateness lineage — evicted by
  * event-time timeout after `stateTtlMs` of silence (the
  * [[SessionTracker]] eviction contract: a conversation that returns
  * after eviction starts a fresh mark, so lateness spanning an
  * eviction gap is deliberately not flagged; the batch operator over
  * the durable tiers is the exact-replay path, per the SURVEY
  * streaming-scope doctrine).
  *
  * Emissions are per-(conversation, trigger, day) PARTIALS whose
  * columns are all MERGEABLE: `events` and `late_events` sum,
  * `skew_max_us` maxes — [[mergeLatePartials]] is the batch face that
  * folds them to the q110 day census. The skew QUANTILES stay
  * batch-only, exactly like the drift statistic atop the streaming
  * length histogram: a percentile does not merge across triggers.
  *
  * Arrival order: within a trigger, rows fold in `turn_idx` order (the
  * same arrival proxy the batch operator uses — a shuffled micro-batch
  * would otherwise make lateness nondeterministic); across triggers
  * the carried mark observes TRUE arrival order. Feeding triggers in
  * turn order therefore reproduces the batch census exactly
  * (spec-pinned); a stream that genuinely delivers out of order is
  * measuring what the batch operator cannot — real arrival.
  *
  * Null doctrine: null ts cannot be placed (and could not pass the
  * watermark), null conv_id has no lineage, null turn_idx no arrival
  * rank — all drop, mirroring the batch filter.
  *
  * Bound: input rows BELOW the current watermark are dropped by the
  * engine before the state function sees them, so the monitor
  * measures lateness WITHIN the watermark bound by construction — a
  * straggler the watermark no longer admits is exactly the event the
  * pipeline already lost, and only the batch census over the durable
  * tiers can still count it. Size the watermark from q110's p95.
  */
object LateMonitor {

  final case class TurnArrival(conv_id: String, turn_idx: Int, ts: Timestamp)

  /** Per-conversation state: event-time high-water mark (µs) and last
    * activity (ms, for the eviction timeout).
    */
  final case class HwmState(hwmUs: Long, lastMs: Long)

  /** Mergeable per-(conversation, trigger, day) lateness partial. */
  final case class LatePartial(
      conv_id: String, day: Timestamp, events: Long, late_events: Long,
      skew_max_us: Option[Long])

  private val dayUs = 86400L * 1000000L

  /** Full-precision µs (getTime alone drops the sub-ms part).
    * floorDiv, not `/`: truncation would shift pre-epoch instants up
    * to a second forward, diverging from the batch `unix_micros`.
    */
  private def micros(ts: Timestamp): Long =
    java.lang.Math.floorDiv(ts.getTime, 1000L) * 1000000L +
      ts.getNanos / 1000L

  private def track(ttlMs: Long)(
      convId: String, rows: Iterator[TurnArrival],
      state: GroupState[HwmState]): Iterator[LatePartial] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      // turn_idx is the within-trigger arrival proxy (unique per conv)
      val ordered = rows.toArray.sortBy(_.turn_idx)
      var hwm = state.getOption.map(_.hwmUs).getOrElse(Long.MinValue)
      var lastMs = state.getOption.map(_.lastMs).getOrElse(Long.MinValue)
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[Long, (Long, Long, Long)]
      ordered.foreach { r =>
        val us = micros(r.ts)
        val day = us - java.lang.Math.floorMod(us, dayUs)
        val skew = if (hwm > us) hwm - us else -1L
        val (n, late, mx) = acc.getOrElse(day, (0L, 0L, -1L))
        acc(day) = (n + 1, late + (if (skew >= 0) 1 else 0),
          math.max(mx, skew))
        hwm = math.max(hwm, us)
        lastMs = math.max(lastMs, r.ts.getTime)
      }
      state.update(HwmState(hwm, lastMs))
      // the timeout must stay ahead of the current watermark (the
      // SessionTracker rule: late-only activity would otherwise set
      // one in the past)
      state.setTimeoutTimestamp(
        math.max(lastMs + ttlMs, state.getCurrentWatermarkMs() + 1))
      acc.iterator.map { case (day, (n, late, mx)) =>
        LatePartial(convId, new Timestamp(day / 1000L), n, late,
          if (late > 0) Some(mx) else None)
      }
    }
  }

  /** Per-trigger lateness partials over a transcripts stream. Append
    * mode; every input turn is counted exactly once across all emitted
    * partials.
    */
  def latePartials(
      stream: DataFrame,
      watermarkDelay: String = "10 minutes",
      stateTtlMs: Long = 24L * 3600 * 1000): Dataset[LatePartial] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .filter(col("ts").isNotNull && col("conv_id").isNotNull &&
        col("turn_idx").isNotNull)
      .select(col("conv_id"), col("turn_idx"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[TurnArrival]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        track(stateTtlMs))
  }

  /** Batch face: fold emitted partials to the q110 day census (count
    * columns — the quantiles are batch-only by design, see the class
    * doc).
    */
  def mergeLatePartials(partials: DataFrame): DataFrame =
    partials
      .groupBy(col("day"))
      .agg(
        sum(col("events")).as("events"),
        sum(col("late_events")).as("late_events"),
        round(sum(col("late_events")).cast("double") /
          sum(col("events")).cast("double"), 6).as("late_share"),
        max(col("skew_max_us")).as("skew_max_us"))
}
