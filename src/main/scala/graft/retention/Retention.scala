package graft.retention

import graft.model.Tier
import graft.table.SnapshotTable

/** Tier-expiry retention: once a day-partition's horizon at a finer
  * tier has passed, the finer data is dropped — the coarser rollups
  * (and the encoded blocks) keep answering queries for that range.
  * North-rule "tier-expiry compaction via Iceberg rewrite"; reference
  * analogue: the per-file lifecycle completing and never being re-read
  * (`MigrateTask.java:104-110`).
  *
  * All operations are snapshot commits on [[SnapshotTable]]:
  * metadata-only partition drops, file-level compaction rewrites, and
  * snapshot expiry that physically unlinks unreferenced files — so a
  * reader concurrent with retention still sees a consistent snapshot.
  */
object Retention {

  /** Per-tier horizon in days: how long a tier's partitions are kept
    * past the global watermark day. Raw is the shortest-lived.
    */
  final case class Policy(horizonDays: Map[String, Int] = Map(
    Tier.M1.name -> 7, Tier.H1.name -> 90, Tier.D1.name -> 3650))

  /** Drop expired partitions of `table` given the current watermark day
    * (ISO yyyy-MM-dd). Returns the dropped set. Purely lexicographic
    * day comparison — no wall clock involved.
    */
  def expire(table: SnapshotTable, tier: Tier, watermarkDay: String,
      policy: Policy): Set[String] = {
    val horizon = policy.horizonDays.getOrElse(tier.name, Int.MaxValue)
    val cutoff = java.time.LocalDate.parse(watermarkDay).minusDays(horizon.toLong).toString
    val expired = table.partitionsOf.filter(_ < cutoff)
    if (expired.nonEmpty) {
      table.dropPartitions(expired)
      table.expireSnapshots(keep = 2)
    }
    expired
  }

  /** Compact fragmented partitions then expire superseded snapshots —
    * the `rewrite_data_files` + `expire_snapshots` pair.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, table: SnapshotTable,
      maxFilesPerPartition: Int = 4): Unit = {
    table.compact(spark, maxFilesPerPartition)
    table.expireSnapshots(keep = 2)
  }
}
