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
  /** Custom-pattern parse. `zone` declares the deployment timezone
    * whose WALL-CLOCK the pattern-parsed values represent: the
    * reference zones CUSTOM timestamps with `ZoneId.systemDefault()`
    * (`CsvColumn.java:128-131`) — an implicit dependency on wherever
    * the JVM happens to run. This engine makes the zone an explicit
    * knob (default UTC, the canonical choice of SURVEY.md §7 hard-part
    * 2): a migration from a non-UTC deployment declares its zone and
    * gets the reference's instants, deterministically.
    */
  final case class Custom(pattern: String, zone: String = "UTC") extends TsFormat

  final case class Options(
      delimiter: String = ",",
      quote: String = "\"",
      tsFormat: TsFormat = Iso)

  /** ISO acceptance pinned to `DateTimeFormatter.ISO_DATE_TIME` shapes
    * (`CsvColumn.java:123-126`): date + 'T' + at least HH:mm, optional
    * seconds/fraction, optional Z or ±HH:MM offset. Spark's bare
    * `try_to_timestamp` is laxer (accepts date-only and space-separated
    * forms the reference REJECTS as rows), which would diverge the
    * valid/reject split on malformed feeds; this guard restores the
    * reference's row-reject contract. Offsets accept the full
    * ISO-8601 offset-id family (`+hh`, `+hh:mm`, `+hh:mm:ss`) exactly
    * as `ISO_DATE_TIME` does. Zone-REGION suffixes
    * (`+01:00[Europe/Paris]`) are accepted like `ISO_DATE_TIME`: the
    * bracket section is stripped and the OFFSET determines the instant
    * — the offset is always present when a region is (ISO_DATE_TIME
    * nests the region optional inside the offset optional), so the
    * value is fully determined without any tzdb lookup needed for
    * the INSTANT. The region NAME is additionally tzdb-validated
    * (`validZoneRegions` below): `+01:00[No/Such_Zone]` REJECTS the
    * row exactly as `ISO_DATE_TIME`'s `appendZoneRegionId()` throws in
    * the reference (`CsvColumn.java:123-126` → per-row FAILED) — a
    * feed with corrupt region suffixes must quarantine those rows,
    * not silently ingest them. This ties the valid/reject split to
    * the JVM's tzdb version, but so did the reference's formatter —
    * matching its behavior IS the contract.
    */
  private[ingest] val isoDateTimeRe =
    """^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}(:\d{2}(\.\d{1,9})?)?((Z|[+-]\d{2}(:\d{2}(:\d{2})?)?)(\[[A-Za-z][A-Za-z0-9~/._+-]*\])?)?$"""

  /** The tzdb region ids `appendZoneRegionId()` accepts, as a sorted
    * literal set: membership drives an `isin` the optimizer turns into
    * a hashed InSet — O(1) per row, codegen'd, no tzdb lookup on the
    * hot path. Sorted for plan determinism across JVMs with the same
    * tzdb.
    */
  private[ingest] lazy val validZoneRegions: Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.time.ZoneId.getAvailableZoneIds.asScala.toSeq.sorted
  }

  private val declared = Seq("conv_id", "turn_idx", "role", "text", "tool", "ts")

  /** Read transcript CSVs → (valid typed turns, rejected raw rows).
    * Valid side has the canonical `Turn` schema; rejects carry every
    * declared raw column plus a `reject_reason`.
    */
  def read(spark: SparkSession, path: String, opts: Options): (DataFrame, DataFrame) =
    read(spark, Seq(path), opts)

  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    read(spark, Seq(path), Options())

  /** Multi-path form — a declared setting reads ALL its files in one
    * scan plan (`CsvSettings.filePaths`, the reference fans these out to
    * its thread pool; Spark's scheduler owns that parallelism here).
    */
  def read(spark: SparkSession, paths: Seq[String],
      opts: Options = Options()): (DataFrame, DataFrame) = {
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
      .csv(paths: _*)

    val missing = declared.filterNot(raw.columns.contains)
    require(missing.isEmpty,
      s"csv missing declared columns: ${missing.mkString(", ")} " +
        s"(found: ${raw.columns.mkString(", ")})")

    // projection by name — undeclared extras dropped here
    val projected = raw.select(declared.map(col): _*)

    val tsParsed = tsParse("ts", opts.tsFormat)
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

  private def tsParse(name: String, fmt: TsFormat) = fmt match {
    // try_multiply: under ANSI (Spark 4 default) a plain ×1000 on an
    // absurd epoch (try_cast succeeds at ~1e18) THROWS and fails the
    // whole batch — the one thing this path must never do. Overflow →
    // null → the ROW rejects. Documented deviation: the reference's
    // `Long.parseLong(v) * 1000` (`CsvColumn.java:121`) silently WRAPS
    // and accepts a garbage timestamp; rejecting is the safer contract.
    case Unix => timestamp_millis(expr(s"try_multiply(try_cast(`$name` AS long), 1000L)"))
    case Iso =>
      // bracket region (empty when absent) must be a real tzdb id —
      // shape alone accepted `[No/Such_Zone]` the reference rejects
      val region = regexp_extract(col(name), """\[([^\]]*)\]$""", 1)
      val regionOk = region === lit("") || region.isin(validZoneRegions: _*)
      when(col(name).rlike(isoDateTimeRe) && regionOk,
        try_to_timestamp(regexp_replace(col(name), """\[[^\]]*\]$""", "")))
      .otherwise(lit(null).cast("timestamp"))
    case Custom(p, zone) =>
      // fail fast at PLAN time on a bad zone id — under ANSI an invalid
      // zone inside to_utc_timestamp would kill the batch at run time
      require(scala.util.Try(java.time.ZoneId.of(zone)).isSuccess,
        s"invalid timezone id for CUSTOM timestamp format: '$zone'")
      val parsed = try_to_timestamp(col(name), lit(p))
      if (zone == "UTC") parsed else to_utc_timestamp(parsed, zone)
  }

  /** Config-declared read: the generalized form of [[read]], driven by a
    * validated [[ConfigModel.CsvSetting]] instead of the fixed transcript
    * schema — the reference's column-binding + typed-parse contract for
    * ARBITRARY declared columns (`CSVReader.java:245-249` header
    * binding, `CsvColumn.java:75-142` typed parse, `Converter.java`
    * null-on-error):
    *
    *  - header-name binding: undeclared extras ignored; a missing
    *    declared column fails fast;
    *  - output columns are named by joinKey (the projection+rename of
    *    op #11), the parsed timestamp lands in `timestamp`;
    *  - a non-null raw value that fails its typed parse (or a null /
    *    unparseable timestamp) rejects the ROW to the second frame,
    *    never the batch (`CSVReader.java:199-204`); null inputs stay
    *    null (missing_values fixture).
    */
  def readDeclared(spark: SparkSession, setting: ConfigModel.CsvSetting): (DataFrame, DataFrame) = {
    import ConfigModel._
    val (staged, parseFailed, declaredCols) = stagePlan(spark, setting)
    val outCols = col(s"${stagePrefix}ts").as("timestamp") +:
      setting.columns.zipWithIndex.map { case (c, i) =>
        col(s"$stagePrefix$i").as(c.joinKey.getOrElse(c.name))
      }
    val valid = staged.filter(!parseFailed).select(outCols: _*)
    val rejects = staged.filter(parseFailed).select(
      declaredCols.map(col) :+
        when(col(s"${stagePrefix}ts").isNull, "bad timestamp")
          .otherwise("bad typed value").as("reject_reason"): _*)
    (valid, rejects)
  }

  /** (validRows, rejectRows) for a declared setting in ONE scan — the
    * two frames [[readDeclared]] returns are complementary filters over
    * one staged plan, so counting them separately re-reads and
    * re-parses every file twice; status/metrics passes (the registry's
    * per-setting accounting) should use this instead.
    */
  def declaredCounts(spark: SparkSession, setting: ConfigModel.CsvSetting): (Long, Long) = {
    val (staged, parseFailed, _) = stagePlan(spark, setting)
    val row = staged.agg(
      count(when(!parseFailed, lit(1))).as("valid"),
      count(when(parseFailed, lit(1))).as("rejects")).head()
    (row.getLong(0), row.getLong(1))
  }

  private val stagePrefix = "__graft_t_"

  /** Shared staging plan: (staged frame carrying raw + typed columns,
    * row-reject predicate, declared raw column names).
    */
  private def stagePlan(spark: SparkSession, setting: ConfigModel.CsvSetting)
      : (DataFrame, org.apache.spark.sql.Column, Seq[String]) = {
    import ConfigModel._
    val tsCol = setting.timestampColumn.getOrElse(
      throw new IllegalArgumentException("setting has no timestamp column"))
    val raw = spark.read
      .option("header", "true")
      .option("sep", setting.delimiter)
      .option("quote", setting.quote)
      .option("escape", setting.quote)
      .option("inferSchema", "false")
      .csv(setting.filePaths: _*)

    val declaredCols = tsCol.name +: setting.columns.map(_.name)
    val missing = declaredCols.filterNot(raw.columns.contains)
    require(missing.isEmpty,
      s"csv missing declared columns: ${missing.mkString(", ")} " +
        s"(found: ${raw.columns.mkString(", ")})")

    def typedExpr(c: CsvColumn) = c.tpe match {
      case CString => col(c.name)
      case CDouble => expr(s"try_cast(`${c.name}` AS double)")
      case CFloat => expr(s"try_cast(`${c.name}` AS float)")
      case CInteger => expr(s"try_cast(`${c.name}` AS int)")
      case CLong => expr(s"try_cast(`${c.name}` AS long)")
      case CBoolean => expr(s"try_cast(`${c.name}` AS boolean)")
      case CTime => tsParse(c.name, c.tsFormat)
    }
    val outName = (c: CsvColumn) => c.joinKey.getOrElse(c.name)

    // Output names must be unambiguous: `timestamp` is the parsed-ts
    // output, and each column lands at its joinKey-or-name. A raw
    // column literally named `timestamp` (or a name colliding with
    // another column's joinKey) would produce two output columns with
    // one name — fail fast instead of silently shadowing.
    val outNames = "timestamp" +: setting.columns.map(outName)
    val dups = outNames.groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
    require(dups.isEmpty,
      s"ambiguous output column name(s): ${dups.mkString(", ")} " +
        "(a column name collides with 'timestamp' or another column's joinKey)")

    // Typed staging happens in ONE select over the raw frame, with
    // POSITIONAL reserved aliases: every typed expression reads the
    // original raw columns (a withColumn chain would let a parsed
    // column shadow a same-named raw column before later expressions
    // read it), and staged names cannot collide with output names.
    require(!raw.columns.exists(_.startsWith(stagePrefix)),
      s"raw csv columns may not start with the reserved prefix $stagePrefix")
    val staged = raw.select(
      raw.columns.map(col) ++
        (tsParse(tsCol.name, tsCol.tsFormat).as(s"${stagePrefix}ts") +:
          setting.columns.zipWithIndex.map { case (c, i) =>
            typedExpr(c).as(s"$stagePrefix$i")
          }): _*)
    // a row is rejected iff its timestamp fails, or any declared value
    // is present (non-null raw) but unparseable (null typed)
    val parseFailed = setting.columns.zipWithIndex
      .filter(_._1.tpe != CString)
      .map { case (c, i) => col(c.name).isNotNull && col(s"$stagePrefix$i").isNull }
      .foldLeft(col(s"${stagePrefix}ts").isNull)(_ || _)

    (staged, parseFailed, declaredCols)
  }
}
