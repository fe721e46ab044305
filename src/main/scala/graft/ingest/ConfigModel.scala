package graft.ingest

/** Declared source/sink configuration graph + static validator — the
  * analogue of the reference's "analyzer"
  * (`/root/reference/src/main/java/org/kreps/csvtoiotdb/ConfigValidator.java:29-174`):
  * every rule the reference enforces before any byte of data moves is
  * re-expressed here as data + a pure checker, wired in front of
  * [[CsvSource]] by [[SettingsRegistry]]. A user wiring a new source
  * hits these errors at plan time, not as task failures at 100 TB.
  */
object ConfigModel {

  /** Declared CSV column types (`configs/csv/CsvDataType` via
    * `README.md:293-303`).
    */
  sealed trait CsvType
  case object CDouble extends CsvType
  case object CFloat extends CsvType
  case object CInteger extends CsvType
  case object CLong extends CsvType
  case object CBoolean extends CsvType
  case object CTime extends CsvType
  case object CString extends CsvType

  /** Sink measurement types (`README.md:305-311`, TSDataType). */
  sealed trait SinkType
  case object INT32 extends SinkType
  case object INT64 extends SinkType
  case object FLOAT extends SinkType
  case object DOUBLE extends SinkType
  case object BOOLEAN extends SinkType
  case object TEXT extends SinkType

  final case class CsvColumn(
      name: String,
      tpe: CsvType,
      joinKey: Option[String] = None,
      isPathColumn: Boolean = false,
      /** TIME columns: parse format (`CsvColumn.java:117-142`). */
      tsFormat: CsvSource.TsFormat = CsvSource.Iso)

  final case class CsvSetting(
      timestampColumn: Option[CsvColumn],
      columns: Seq[CsvColumn],
      filePaths: Seq[String],
      delimiter: String = ",",
      quote: String = "\"")

  final case class Measurement(name: String, dataType: SinkType, joinKey: String)

  final case class Device(
      deviceId: String,
      pathColumn: Option[String] = None,
      measurements: Seq[Measurement] = Seq.empty)

  final case class MigrationConfig(
      csvSettings: Seq[CsvSetting],
      devices: Seq[Device])
}

object ConfigValidator {
  import ConfigModel._

  /** `ConfigValidator.java:21` reserves "timestamp"; `README.md:316-320`
    * additionally reserves row_id/row_number (generated columns).
    * Checked case-insensitively like the reference (`:62`).
    */
  val reservedJoinKeys: Set[String] = Set("timestamp", "row_id", "row_number")

  /** Type-conversion legality matrix (`ConfigValidator.java:158-174`,
    * table form `README.md:325-343`) as plain data.
    */
  val legalConversions: Map[CsvType, Set[SinkType]] = Map(
    CDouble -> Set(DOUBLE, FLOAT, INT32, INT64, TEXT),
    CFloat -> Set(DOUBLE, FLOAT, INT32, INT64, TEXT),
    CInteger -> Set(INT32, INT64, FLOAT, DOUBLE, TEXT),
    CLong -> Set(INT32, INT64, FLOAT, DOUBLE, TEXT),
    CBoolean -> Set(BOOLEAN, INT32, INT64, TEXT),
    CTime -> Set(INT64, TEXT),
    CString -> Set(INT32, INT64, FLOAT, DOUBLE, BOOLEAN, TEXT))

  def isValidConversion(csv: CsvType, sink: SinkType): Boolean =
    legalConversions(csv).contains(sink)

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** Validate the whole config graph; throws IllegalArgumentException on
    * the first violated rule, message-compatible with the reference.
    * `checkFiles = false` skips the filesystem existence check (for
    * validating configs before their inputs land).
    */
  def validate(config: MigrationConfig, checkFiles: Boolean = true): Unit = {
    validateCsvSettings(config, checkFiles)
    validateSinkSettings(config)
  }

  /** `ConfigValidator.java:40-72`. */
  private def validateCsvSettings(config: MigrationConfig, checkFiles: Boolean): Unit = {
    val seen = scala.collection.mutable.Set[String]()
    config.csvSettings.foreach { s =>
      if (s.timestampColumn.isEmpty)
        fail("Each CSV setting must have exactly one timestamp column.")
      if (checkFiles) s.filePaths.foreach { p =>
        val f = new java.io.File(p)
        if (!f.exists() || !f.isFile)
          fail(s"CSV file path does not exist or is not a file: $p")
      }
      s.columns.flatMap(_.joinKey).foreach { jk =>
        if (reservedJoinKeys.contains(jk.toLowerCase))
          fail(s"The joinKey '$jk' is reserved. Please use a different joinKey.")
        if (!seen.add(jk))
          fail(s"Duplicate joinKey found in CSV settings: $jk")
      }
    }
  }

  /** `ConfigValidator.java:80-145`. */
  private def validateSinkSettings(config: MigrationConfig): Unit = {
    val csvJoinKeys = config.csvSettings.flatMap(_.columns.flatMap(_.joinKey)).toSet
    val usedPathColumns = config.devices.flatMap(_.pathColumn).toSet
    val usedJoinKeys =
      config.devices.flatMap(_.measurements.map(_.joinKey)).toSet ++ usedPathColumns

    for {
      s <- config.csvSettings
      pc <- s.columns if pc.isPathColumn
      jk <- pc.joinKey
    } if (!usedPathColumns.contains(jk))
      fail(s"CSV path column is not used in any device configuration: $jk")

    for (d <- config.devices; m <- d.measurements)
      if (!csvJoinKeys.contains(m.joinKey))
        fail(s"Measurement joinKey does not match any CSV joinKey: ${m.joinKey}")

    for (jk <- csvJoinKeys)
      if (!usedJoinKeys.contains(jk))
        fail(s"Unused joinKey found in CSV settings: $jk")

    // conversion legality (`ConfigValidator.java:130-145`)
    val byJoinKey = (for {
      s <- config.csvSettings
      c <- s.columns
      jk <- c.joinKey
    } yield jk -> c).toMap
    for (d <- config.devices; m <- d.measurements) {
      val c = byJoinKey.getOrElse(m.joinKey,
        fail(s"No CSV column found for joinKey: ${m.joinKey}"))
      if (!isValidConversion(c.tpe, m.dataType))
        fail(s"Invalid conversion from CSV type ${c.tpe} to sink type " +
          s"${m.dataType} for joinKey ${m.joinKey}")
    }
  }
}
