package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Series-shape operators over the canonical transcripts table: OHLC
  * candles (the classic financial downsample, here over turn length),
  * day-over-day deltas (period-over-period change detection on the
  * daily rollup), and gap reports (missing-data detection — the
  * row-level sibling of [[Sessionize]]'s aggregation).
  *
  * Family doctrine (shared with [[RefOps]]'s timeseries block):
  * integer moments until the last projection, fixed-shape double
  * expressions whose DuckDB oracles mirror the operand order verbatim,
  * null ts drops the observation wherever ts is the axis, null
  * turn_idx drops it wherever turn order or output identity needs the
  * key, and every operator is a ONE-conv_id-exchange plan (or cheaper)
  * so the shapes survive a 10¹²-turn input.
  *
  * Reference analogue: these extend the rollup surface the reference
  * computes point-by-point on ingest (`IoTDBWriter.java` insert path);
  * the reference has no windowed analytics at all, so semantics here
  * are defined by this engine and pinned by the DuckDB oracles.
  */
object SeriesOps {

  /** 10-year cap on second-granularity tunables — a wild literal should
    * fail analysis, not overflow µs longs at runtime ([[RefOps.burstFlags]]
    * rationale).
    */
  private val capS = 315360000L

  /** OHLC candles over turn length per (conv_id, tumbling window):
    * open/close are the char lengths of the window's FIRST/LAST turn in
    * canonical turn order, high/low the extremes, plus the sample count
    * and the high−low range — the standard candlestick downsample that
    * preserves trend direction (open vs close) and volatility (range)
    * where a plain avg rollup flattens both.
    *
    * Order key: turn_idx ALONE — within a conversation turn_idx is the
    * unique canonical order ([[RefOps.ewma]] input contract) and is
    * consistent with time order by construction
    * ([[graft.ingest.Transcripts.fromEvents]] derives it from
    * `(ts, event_id)`), so `min_by`/`max_by` on it are deterministic
    * with no tiebreak column; the oracle's ARG_MIN/ARG_MAX see the
    * identical unique key.
    *
    * Windowing is the µs-floor idiom ([[graft.rollup.Rollup.sliding]]):
    * integer arithmetic on epoch micros, no calendar fields, so only
    * the NTZ zone guard applies.
    *
    * Null doctrine: the candle summarizes the char_len SIGNAL, so a
    * null text is a missing sample with no place on the value axis and
    * drops the whole observation ([[RefOps.timeWeightedAvg]]
    * semantics — an endpoint must be a real sample, not a NULL that
    * poisons open/close); null ts cannot be placed on the time axis
    * and null turn_idx cannot be ordered — both drop.
    *
    * All five outputs are exact longs — no doubles anywhere, so the
    * oracle match is trivially bit-exact.
    *
    * Scale: ONE partial-aggregated (conv_id, window_start) exchange —
    * min_by/max_by carry (value, key) pairs through the map-side
    * combine, so the shuffle moves one collapsed row per candle, far
    * below raw-row volume.
    */
  def ohlcCandles(transcripts: DataFrame, windowSeconds: Long = 3600L): DataFrame = {
    require(windowSeconds > 0 && windowSeconds <= capS,
      s"windowSeconds must be in (0, $capS], got $windowSeconds")
    TimeArith.requireUtcForNtz(transcripts, "ts")
    val wUs = windowSeconds * 1000000L
    val us = unix_micros(col("ts").cast("timestamp"))
    transcripts
      .filter(col("ts").isNotNull && col("turn_idx").isNotNull &&
        col("text").isNotNull)
      .select(
        col("conv_id"),
        timestamp_micros(us - pmod(us, lit(wUs))).as("window_start"),
        col("turn_idx"),
        length(col("text")).cast("long").as("char_len"))
      .groupBy(col("conv_id"), col("window_start"))
      .agg(
        count(lit(1)).as("n_samples"),
        min_by(col("char_len"), col("turn_idx")).as("open_len"),
        max(col("char_len")).as("high_len"),
        min(col("char_len")).as("low_len"),
        max_by(col("char_len"), col("turn_idx")).as("close_len"))
      .withColumn("hl_range", col("high_len") - col("low_len"))
  }

  /** Day-over-day turn-count deltas per conversation: the daily
    * activity series with its previous-day value, absolute change, and
    * relative change — the period-over-period comparison every
    * monitoring dashboard runs on a rollup ("did this agent's traffic
    * double overnight?"). Days are µs-floored UTC days (identical to
    * DATE_TRUNC('day') under the pinned UTC session, but calendar-free
    * so only the NTZ guard applies).
    *
    * "Previous day" is the previous OBSERVED day in the series, not
    * day−1: activity series at this grain are sparse (most convs are
    * idle most days) and a LOCF-style comparison against the last
    * active day is the standard reading; a strict calendar-adjacent
    * variant is one gap-fill away ([[graft.gapfill.GapFill]]).
    *
    * turn_count and delta are exact longs; pct_change is ONE division
    * of the two longs both cast to double, rounded 6 — the
    * [[RefOps.toolDiversity]] fixed-shape idiom. The first observed day
    * has no predecessor: prev/delta/pct pin NULL.
    *
    * Null ts drops the observation (time axis); turn_idx/role/text play
    * no part (pure counting), so their nulls keep their rows — same
    * census semantics as the rollup tiers.
    *
    * Scale: the daily groupBy partial-aggregates map-side and exchanges
    * one row per (conv, day); the lag window then re-exchanges only
    * that collapsed frame on conv_id — the
    * [[graft.rollup.Rollup.charLenHistogram]] two-exchange shape (one
    * real but collapsed, one metadata-scale).
    * Deliberately NOT the pre-repartition one-exchange form: at 10¹²
    * turns a conv_id repartition of RAW rows moves the full corpus,
    * while this plan's first exchange moves ~one row per conv-day.
    */
  def dailyDeltas(transcripts: DataFrame): DataFrame = {
    TimeArith.requireUtcForNtz(transcripts, "ts")
    val dayUs = 86400L * 1000000L
    val us = unix_micros(col("ts").cast("timestamp"))
    val daily = transcripts
      .filter(col("ts").isNotNull)
      .select(
        col("conv_id"),
        timestamp_micros(us - pmod(us, lit(dayUs))).as("day_start"))
      .groupBy(col("conv_id"), col("day_start"))
      .agg(count(lit(1)).as("turn_count"))
    val w = Window.partitionBy(col("conv_id")).orderBy(col("day_start"))
    daily
      .withColumn("prev_count", lag(col("turn_count"), 1).over(w))
      .withColumn("delta", col("turn_count") - col("prev_count"))
      .withColumn("pct_change",
        round(col("delta").cast("double") / col("prev_count").cast("double"), 6))
  }

  /** Missing-data gap report per conversation: one row per
    * inter-arrival gap strictly longer than `minGapSeconds`, carrying
    * the bounding turn ids, the bounding timestamps, and the exact gap
    * in integer microseconds. [[Sessionize]] AGGREGATES across these
    * boundaries (a session per island); this reports the boundaries
    * THEMSELVES — the "where is my data missing / where did the agent
    * stall" query that feeds gap-fill planning and SLA monitoring.
    *
    * By construction `gapReport(t, g)` rows are exactly the
    * session-opening breaks of `Sessionize.assign(t, g)` minus each
    * conversation's first turn — sessions per conv = gaps + 1 (pinned
    * as a cross-operator property in SeriesOpsSpec).
    *
    * Order key (ts, turn_idx) — the [[Sessionize]] time-axis order, so
    * simultaneous turns tie-break identically in both engines. Null ts
    * cannot sit on the time axis; null turn_idx cannot serve as the
    * from/to identity and would order NULLS FIRST in Spark but NULLS
    * LAST in DuckDB under ts ties — both drop the whole observation.
    * A dropped row can surface a longer merged gap (the
    * [[RefOps.turnGapStats]] "gap spans missing samples" reading).
    *
    * Output is all-integer (µs) and raw timestamps — no doubles.
    *
    * Scale: ONE conv_id exchange, one sort, one lead, one filter whose
    * selectivity is the gap rate — output rows ≈ sessions, orders of
    * magnitude below input rows.
    */
  def gapReport(transcripts: DataFrame, minGapSeconds: Long = 1800L): DataFrame = {
    require(minGapSeconds > 0 && minGapSeconds <= capS,
      s"minGapSeconds must be in (0, $capS], got $minGapSeconds")
    TimeArith.requireUtcForNtz(transcripts, "ts")
    val w = Window.partitionBy(col("conv_id")).orderBy(col("ts"), col("turn_idx"))
    transcripts
      .filter(col("ts").isNotNull && col("turn_idx").isNotNull)
      .select(col("conv_id"), col("turn_idx"), col("ts"))
      .withColumn("_next_ts", lead(col("ts"), 1).over(w))
      .withColumn("_next_idx", lead(col("turn_idx"), 1).over(w))
      .withColumn("gap_us",
        unix_micros(col("_next_ts").cast("timestamp")) -
          unix_micros(col("ts").cast("timestamp")))
      .filter(col("gap_us") > minGapSeconds * 1000000L)
      .select(
        col("conv_id"),
        col("turn_idx").as("from_idx"),
        col("_next_idx").as("to_idx"),
        col("ts").as("gap_start"),
        col("_next_ts").as("gap_end"),
        col("gap_us"))
  }
}
