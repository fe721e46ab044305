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

  /** Per-table horizon in days: how long a table's partitions are kept
    * past the global watermark day. Raw/fine tiers are the
    * shortest-lived; the encoded blocks table out-lives raw BY DESIGN
    * (it is what keeps answering point-level queries once raw expires),
    * so its horizon matches the coarsest tier's.
    */
  final case class Policy(horizonDays: Map[String, Int] = Map(
    Tier.M1.name -> 7, Tier.H1.name -> 90, Tier.D1.name -> 3650,
    Retention.blocksKey -> 3650))

  /** Horizon key of the encoded-blocks table in [[Policy]]. */
  val blocksKey: String = "blocks_1h"

  /** Drop expired partitions of `table` given the current watermark day
    * (ISO yyyy-MM-dd). Returns the dropped set. Purely lexicographic
    * day comparison — no wall clock involved. `horizonKey` selects the
    * table's horizon in the policy (tier name or [[blocksKey]]).
    */
  def expire(table: SnapshotTable, horizonKey: String, watermarkDay: String,
      policy: Policy): Set[String] = {
    val horizon = policy.horizonDays.getOrElse(horizonKey, Int.MaxValue)
    val cutoff = java.time.LocalDate.parse(watermarkDay).minusDays(horizon.toLong).toString
    val expired = table.partitionsOf.filter(_ < cutoff)
    if (expired.nonEmpty) table.dropPartitions(expired)
    // snapshot expiry + crash-orphan vacuum run EVERY pass, not only
    // when partitions expired: a long-horizon table (blocks) may never
    // drop a partition yet still accretes a snapshot per daily commit
    // and orphans per failed attempt
    if (table.currentVersion.nonEmpty) table.expireSnapshots(keep = 2)
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
