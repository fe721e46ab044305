package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV source for transcripts — the reference's primary input surface
  * (`CSVReader.java`), re-expressed on Spark's csv reader with the same
  * behavior contract, exercised by the reference's own scenario
  * fixtures (`/root/reference/tests/` CSVs + `configs/` JSON pairs),
  * retargeted to the transcript schema:
  *
  *  - configurable delimiter + quote (`CSVReader.java:327-333`;
  *    `different_delimiter` / `quoted_values` fixtures);
  *  - header-name binding: extra undeclared columns silently ignored
  *    (`CSVReader.java:245-249`, `extra_columns` fixture), a missing
  *    declared column fails fast (`CSVReader.java:247-248` per-row →
  *    fail-fast here, since a columnar engine knows at open time);
  *  - three timestamp formats (`CsvColumn.java:117-142`): UNIX seconds
  *    ×1000 to millis (`:121`), ISO-8601, custom pattern — pinned UTC
  *    (the reference uses system-default zone for CUSTOM, `:131`; this
  *    engine defines UTC as canonical, SURVEY.md §7 hard-part 2);
  *  - per-row error semantics: a value that fails its typed parse
  *    rejects the ROW (to the lineage side-output), never the batch
  *    (`CSVReader.java:199-204`, `invalid_data_types` /
  *    `missing_values` fixtures).
  */
object CsvSource {

  sealed trait TsFormat
  /** epoch SECONDS — multiplied to millis like `CsvColumn.java:121`. */
  case object Unix extends TsFormat
  case object Iso extends TsFormat
  final case class Custom(pattern: String) extends TsFormat

  final case class Options(
      delimiter: String = ",",
      quote: String = "\"",
      tsFormat: TsFormat = Iso)

  private val declared = Seq("conv_id", "turn_idx", "role", "text", "tool", "ts")

  /** Read transcript CSVs → (valid typed turns, rejected raw rows).
    * Valid side has the canonical `Turn` schema; rejects carry every
    * declared raw column plus a `reject_reason`.
    */
  def read(spark: SparkSession, path: String, opts: Options = Options()): (DataFrame, DataFrame) = {
    val raw = spark.read
      .option("header", "true")
      .option("sep", opts.delimiter)
      .option("quote", opts.quote)
      // RFC-4180 doubled-quote escaping ("" inside a quoted field),
      // the reference parser's behavior (quoted_values fixture)
      .option("escape", opts.quote)
      // all columns read as string; typing is explicit below so a bad
      // value rejects the row instead of poisoning inference
      .option("inferSchema", "false")
      .csv(path)

    val missing = declared.filterNot(raw.columns.contains)
    require(missing.isEmpty,
      s"csv missing declared columns: ${missing.mkString(", ")} " +
        s"(found: ${raw.columns.mkString(", ")})")

    // projection by name — undeclared extras dropped here
    val projected = raw.select(declared.map(col): _*)

    val tsParsed = opts.tsFormat match {
      case Unix => timestamp_millis(expr("try_cast(ts AS long)") * 1000)
      case Iso => try_to_timestamp(col("ts"))
      case Custom(p) => try_to_timestamp(col("ts"), lit(p))
    }
    val typed = projected
      .withColumn("_turn_idx", expr("try_cast(turn_idx AS int)"))
      .withColumn("_ts", tsParsed)

    val ok =
      col("conv_id").isNotNull &&
      col("_turn_idx").isNotNull &&
      col("_ts").isNotNull

    val valid = typed.filter(ok).select(
      col("conv_id"), col("_turn_idx").as("turn_idx"), col("role"),
      col("text"), col("tool"), col("_ts").as("ts"))

    val rejects = typed.filter(!ok).select(
      declared.map(col) :+
        when(col("conv_id").isNull, "null conv_id")
          .when(col("_turn_idx").isNull, "bad turn_idx")
          .otherwise("bad ts").as("reject_reason"): _*)

    (valid, rejects)
  }
}
