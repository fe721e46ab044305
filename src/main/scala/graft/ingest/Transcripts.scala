package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Canonical `transcripts` input table (BASELINE.json `input_hint`):
  * `(conv_id string, turn_idx int, role string, text string, tool string,
  * ts timestamp)`.
  *
  * Two producers:
  *
  *  1. [[fromEvents]] — a deterministic derivation from the driver's
  *     `events.parquet`, expressible identically in ANSI SQL, so the
  *     DuckDB oracle can verify every downstream operator on the exact
  *     same input (see [[oracleCte]]).
  *  2. [[graft.ingest.Synth]] — a seeded distributed generator for
  *     unit/golden/bench fixtures at arbitrary scale (FIXTURES.md §1).
  *
  * Reference analogue: the CSV scan + typed parse front end
  * (`CSVReader.java:83-115`, `CsvColumn.java:79-115`); here the "scan"
  * is a columnar parquet read with pushdown, and the stable row identity
  * is the natural key `(conv_id, turn_idx)` instead of the synthetic
  * base64(SHA-256) row id (`CSVReader.java:335-346`).
  */
object Transcripts {

  /** Derive transcripts from the `events` table. Deterministic: the turn
    * order within a conversation is the total order `(ts, event_id)`, so
    * `turn_idx` is stable across engines — the per-row invariant
    * ("per-turn text equality under stable (conv_id, turn_idx) ordering")
    * is checkable bit-for-bit against DuckDB running [[oracleCte]].
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val byConv = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("conv_id", concat(lit("c"), col("user_id").cast("string")))
      .withColumn("turn_idx", (row_number().over(byConv) - 1).cast("int"))
      .withColumn(
        "role",
        when(col("event_type").isin("click", "view"), "user")
          .when(col("event_type").isin("signup", "purchase"), "assistant")
          .otherwise("tool"))
      .withColumn("text", concat(col("event_type"), lit(" "), col("props")))
      .withColumn(
        "tool",
        when(col("event_type").isin("purchase", "signup", "error"), col("event_type")))
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }

  /** The same derivation as [[fromEvents]], as an ANSI SQL CTE body for
    * the DuckDB oracle. Every oracle query prefixes `WITH transcripts AS
    * (...)`. Must stay semantically identical to [[fromEvents]].
    */
  val oracleCte: String =
    """transcripts AS (
      |  SELECT
      |    'c' || CAST(user_id AS VARCHAR) AS conv_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
      |    CASE WHEN event_type IN ('click','view') THEN 'user'
      |         WHEN event_type IN ('signup','purchase') THEN 'assistant'
      |         ELSE 'tool' END AS role,
      |    event_type || ' ' || props AS text,
      |    CASE WHEN event_type IN ('purchase','signup','error') THEN event_type END AS tool,
      |    ts
      |  FROM events
      |)""".stripMargin

  /** Wrap an oracle query body with the transcripts CTE. */
  def oracle(body: String): String = s"WITH $oracleCte\n$body"

  /** Input-schema validation: fail fast if the frame does not carry the
    * canonical columns with compatible types (reference analogue: the
    * fatal sink-schema equality assert, `IoTDBSchemaValidator.java:111-140`,
    * and config-time name resolution, `ConfigValidator.java:111-118`).
    * Extra columns are tolerated and projected away, mirroring the
    * reference's silently-ignored undeclared CSV columns
    * (`CSVReader.java:245-249`).
    */
  def validate(df: DataFrame): DataFrame = {
    val required = Seq(
      "conv_id" -> "string", "turn_idx" -> "int", "role" -> "string",
      "text" -> "string", "tool" -> "string", "ts" -> "timestamp")
    val present = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val missing = required.collect {
      case (n, t) if !present.get(n).exists(_.startsWith(t)) =>
        s"$n:$t (found ${present.getOrElse(n, "<absent>")})"
    }
    require(missing.isEmpty, s"transcripts schema mismatch: ${missing.mkString(", ")}")
    df.select(required.map(r => col(r._1)): _*)
  }

  /** Reject rows the engine cannot place on a timeline or key — null
    * `ts` (reference: null-timestamp skip, `Converter.java:79-85`) or
    * null `conv_id` (reference: null path value fails the row for that
    * device, `Converter.java:128-131`). Returns (accepted, rejected);
    * rejected rows flow to the `_lineage` table instead of being lost.
    */
  def splitValid(df: DataFrame): (DataFrame, DataFrame) = {
    val ok = col("ts").isNotNull && col("conv_id").isNotNull
    (df.filter(ok), df.filter(!ok))
  }
}
