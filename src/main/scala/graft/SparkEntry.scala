package graft

import graft.ingest.Transcripts
import graft.model.Tier
import graft.rollup.Rollup
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every oracle-checked query runs over the driver's parquet tables; the
  * canonical `transcripts` input (BASELINE.json `input_hint`) is derived
  * deterministically from `events.parquet` in BOTH engines (Spark:
  * [[Transcripts.fromEvents]]; DuckDB: [[Transcripts.oracleCte]]), so
  * rolled-up points are verified value-for-value at every tier.
  */
object SparkEntry {

  private def transcripts(s: SparkSession, dir: String): DataFrame =
    Transcripts.fromEvents(s, dir)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * 1-minute per-conversation continuous aggregates over transcripts.
    */
  def entry(spark: SparkSession): DataFrame =
    Rollup.fromRaw(transcripts(spark, "/root/testdata/sf0.001"), Tier.M1)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // input derivation: per-turn text equality under stable (conv_id, turn_idx)
    "q01_transcripts" -> ((s, dir) => transcripts(s, dir)),
    // tier cascade raw→1m→1h→1d; each tier reads ONLY the previous tier,
    // while the oracle recomputes every tier directly from raw turns —
    // so a passing check proves cascade == direct at each tier.
    "q02_rollup_1m" -> ((s, dir) => Rollup.fromRaw(transcripts(s, dir), Tier.M1)),
    "q03_rollup_1h" -> ((s, dir) =>
      Rollup.cascade(Rollup.fromRaw(transcripts(s, dir), Tier.M1), Tier.H1)),
    "q04_rollup_1d" -> ((s, dir) =>
      Rollup.cascade(
        Rollup.cascade(Rollup.fromRaw(transcripts(s, dir), Tier.M1), Tier.H1),
        Tier.D1)),
    // skew path: salted two-phase agg must equal the plain 1m rollup
    "q05_rollup_1m_salted" -> ((s, dir) =>
      Rollup.fromRawSalted(transcripts(s, dir), Tier.M1, salts = 8)),
    // tool-call frequency companion table + its cascade
    "q06_tool_freq_1h" -> ((s, dir) => Rollup.toolFreq(transcripts(s, dir), Tier.H1)),
    "q07_tool_freq_1d" -> ((s, dir) =>
      Rollup.toolFreqCascade(Rollup.toolFreq(transcripts(s, dir), Tier.H1), Tier.D1)),
    // Gorilla XOR + delta-of-delta blocks: encode per (conv, 1h window),
    // decode + explode back to points; oracle is the raw series, so a
    // pass proves bit-exact codec roundtrip through the shuffle path.
    "q08_blocks_roundtrip" -> ((s, dir) =>
      graft.rollup.BlockRollup.decode(
        graft.rollup.BlockRollup.encode(transcripts(s, dir), Tier.H1))),
    // linear-interpolation gap-fill on the 1h char_len_avg series
    "q09_gapfill_1h" -> ((s, dir) =>
      graft.gapfill.GapFill.linear(
        Rollup.fromRaw(transcripts(s, dir), Tier.H1), Tier.H1, "char_len_avg"))
  )

  private val rollupSelect: String =
    """SELECT
      |  conv_id,
      |  WSTART AS window_start,
      |  COUNT(*) AS turn_count,
      |  COUNT(*) FILTER (WHERE role = 'user') AS user_turns,
      |  COUNT(*) FILTER (WHERE role = 'assistant') AS assistant_turns,
      |  COUNT(tool) AS tool_calls,
      |  CAST(SUM(LENGTH(text)) AS BIGINT) AS char_len_sum,
      |  CAST(MIN(LENGTH(text)) AS BIGINT) AS char_len_min,
      |  CAST(MAX(LENGTH(text)) AS BIGINT) AS char_len_max,
      |  CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS token_sum,
      |  MIN(turn_idx) AS min_turn_idx,
      |  MAX(turn_idx) AS max_turn_idx,
      |  ARG_MIN(text, turn_idx) AS first_text,
      |  ARG_MAX(text, turn_idx) AS last_text,
      |  CAST(SUM(LENGTH(text)) AS BIGINT) * 1.0 / COUNT(*) AS char_len_avg,
      |  COUNT(*) * 1.0 / WSECONDS AS turn_rate
      |FROM transcripts
      |GROUP BY 1, 2""".stripMargin

  private def rollupOracle(trunc: String, seconds: Long): String =
    Transcripts.oracle(
      rollupSelect
        .replace("WSTART", s"DATE_TRUNC('$trunc', ts)")
        .replace("WSECONDS", s"$seconds.0"))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_transcripts" -> Transcripts.oracle("SELECT * FROM transcripts"),
    "q02_rollup_1m" -> rollupOracle("minute", 60L),
    "q03_rollup_1h" -> rollupOracle("hour", 3600L),
    "q04_rollup_1d" -> rollupOracle("day", 86400L),
    "q05_rollup_1m_salted" -> rollupOracle("minute", 60L),
    "q06_tool_freq_1h" -> Transcripts.oracle(
      """SELECT conv_id, DATE_TRUNC('hour', ts) AS window_start, tool, COUNT(*) AS n
        |FROM transcripts WHERE tool IS NOT NULL GROUP BY 1, 2, 3""".stripMargin),
    "q07_tool_freq_1d" -> Transcripts.oracle(
      """SELECT conv_id, DATE_TRUNC('day', ts) AS window_start, tool, COUNT(*) AS n
        |FROM transcripts WHERE tool IS NOT NULL GROUP BY 1, 2, 3""".stripMargin),
    "q08_blocks_roundtrip" -> Transcripts.oracle(
      "SELECT conv_id, ts, CAST(LENGTH(text) AS DOUBLE) AS value FROM transcripts"),
    "q09_gapfill_1h" -> Transcripts.oracle(
      """, r AS (
        |  SELECT conv_id, DATE_TRUNC('hour', ts) AS window_start,
        |         CAST(SUM(LENGTH(text)) AS BIGINT) * 1.0 / COUNT(*) AS value
        |  FROM transcripts GROUP BY 1, 2),
        |p AS (
        |  SELECT conv_id, window_start, value,
        |         LEAD(window_start) OVER (PARTITION BY conv_id ORDER BY window_start) AS next_ws,
        |         LEAD(value) OVER (PARTITION BY conv_id ORDER BY window_start) AS next_v
        |  FROM r),
        |g AS (
        |  SELECT conv_id, window_start AS ws, next_ws, value, next_v,
        |         UNNEST(generate_series(window_start + INTERVAL 1 HOUR,
        |                                next_ws - INTERVAL 1 HOUR,
        |                                INTERVAL 1 HOUR)) AS gs
        |  FROM p
        |  WHERE next_ws IS NOT NULL AND next_ws > window_start + INTERVAL 1 HOUR)
        |SELECT conv_id, window_start, value, FALSE AS filled FROM p
        |UNION ALL
        |SELECT conv_id, gs AS window_start,
        |       value + (next_v - value) *
        |         (CAST(EPOCH(gs) - EPOCH(ws) AS DOUBLE) /
        |          CAST(EPOCH(next_ws) - EPOCH(ws) AS DOUBLE)) AS value,
        |       TRUE AS filled
        |FROM g""".stripMargin)
  )
}
