package graft.jobs

import graft.ingest.Transcripts
import graft.model.Tier
import graft.rollup.Rollup
import graft.state.StateStore
import graft.table.SnapshotTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end resumable rollup pipeline: transcripts → validation →
  * tier cascade (raw→1m→1h→1d) → snapshot-committed tier tables, with
  * per-partition watermarks + lineage so a killed job resumes exactly
  * where it stopped (north rule; reference analogue: the whole
  * `MigrateTask` + H2 state machine, SURVEY.md §1.4/§3.2).
  *
  * Work unit = (tier, day-partition). Commit protocol per tier:
  *
  *   1. plan: target partitions = input partitions minus partitions
  *      already COMPLETED at this tier (the anti-join work pruning of
  *      `MigrationInitializer.java:62-75`);
  *   2. compute the tier ONLY for target partitions — tier k reads the
  *      tier k-1 TABLE with manifest-level partition pruning, never raw;
  *   3. [[SnapshotTable.overwritePartitions]] — idempotent MERGE of the
  *      recomputed partitions (rerun ⇒ same bytes, no duplicates);
  *   4. checkpoint rows: a partition is COMPLETED once it is closed
  *      (its day ends at or before the input watermark — no more data
  *      can arrive under monotone event time), else IN_PROGRESS and
  *      recomputed next run;
  *   5. lineage + metrics rows, exactly-once per (jobId, tier).
  *
  * Transient commit failures retry with the reference's backoff policy
  * `min(base·2^attempt, cap)` (`IoTDBWriter.java:289-291`), recording
  * RETRY lineage rows with incremented retry_count.
  */
final class RollupJob(
    warehouse: String,
    maxRetries: Int = 5,
    retryBaseMs: Long = 50L,
    retryCapMs: Long = 1000L,
    sleeper: Long => Unit = Thread.sleep) {

  val state = new StateStore(s"$warehouse/_state")
  def tierTable(t: Tier): SnapshotTable = new SnapshotTable(s"$warehouse/rollup_${t.name}")
  def blocksTable(t: Tier): SnapshotTable = new SnapshotTable(s"$warehouse/blocks_${t.name}")
  def rejectsTable: SnapshotTable = new SnapshotTable(s"$warehouse/rejects")

  /** Test hook: injected faults, keyed by (tier, partitionCountSoFar).
    * A function that throws when the commit should fail transiently.
    */
  @volatile var commitFault: (String, Int) => Unit = (_, _) => ()
  private val commitAttempts = new java.util.concurrent.atomic.AtomicInteger(0)

  final case class TierResult(tier: String, partitions: Seq[String], rows: Long)

  private def dayOf(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd")

  /** Run the full pipeline over a transcripts frame. `killAfterTier`
    * simulates a crash between tier commits (resume tests).
    */
  def run(
      spark: SparkSession,
      input: DataFrame,
      jobId: String,
      killAfterTier: Option[String] = None): Seq[TierResult] = {

    val validated = Transcripts.validate(input)
    val (valid0, rejects) = Transcripts.splitValid(validated)
    val valid = valid0.cache()
    try {
      // rejected rows → lineage table, run survives (reference: parse
      // errors mark the row FAILED without aborting the batch,
      // CSVReader.java:199-204)
      val rejectCount = rejects.count()
      if (rejectCount > 0) {
        rejectsTable.append(
          rejects.withColumn("p", coalesce(dayOf(col("ts")), lit("invalid"))), "p")
        state.commitLineage(Seq(state.LineageRow(
          "ingest", "rejects", "FAILED", "null ts or conv_id", 0, rejectCount,
          jobId, state.nextSeq())))
      }

      // input watermark: the engine's "no more data before this" point
      val wmRow = valid.agg(max(unix_micros(col("ts").cast("timestamp")))).head()
      val watermarkUs = if (wmRow.isNullAt(0)) Long.MinValue else wmRow.getLong(0)

      val results = scala.collection.mutable.ArrayBuffer[TierResult]()
      var finerParts: Set[String] = Set.empty

      for (tier <- Tier.cascade) {
        val done = state.completedPartitions(tier.name)
        // day partitions align across tiers (1m/1h/1d windows nest in days)
        val allParts = tier match {
          case Tier.M1 =>
            valid.select(dayOf(col("ts")).as("p")).distinct()
              .collect().map(_.getString(0)).toSet
          case _ => finerParts
        }
        val target = (allParts -- done).toSeq.sorted
        if (target.nonEmpty) {
          val tierDf = tier match {
            case Tier.M1 =>
              Rollup.fromRaw(
                valid.filter(dayOf(col("ts")).isin(target: _*)), Tier.M1)
            case t =>
              val finer = Tier.cascade(Tier.cascade.indexOf(t) - 1)
              val src = tierTable(finer).read(spark, Some(target.toSet))
              Rollup.cascade(src, t)
          }
          val withP = tierDf.withColumn("p", dayOf(col("window_start")))
          val rows = commitWithRetry(tier.name, jobId) {
            tierTable(tier).overwritePartitions(withP, "p")
            withP.count()
          }
          // per-partition checkpoint: closed days are COMPLETED
          val cps = target.map { p =>
            val dayEndUs = (java.time.LocalDate.parse(p).plusDays(1)
              .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond) * 1000000L
            val closed = dayEndUs <= watermarkUs
            state.Checkpoint(tier.name, p, watermarkUs,
              if (closed) "COMPLETED" else "IN_PROGRESS", jobId, state.nextSeq())
          }
          state.commitCheckpoints(cps)
          state.commitLineage(target.map(p => state.LineageRow(
            tier.name, p, "COMPLETED", "", 0, rows, jobId, state.nextSeq())))
          state.commitMetrics(Seq(state.MetricsRow(
            jobId, tier.name, rows, 0, state.nextSeq())))
          results += TierResult(tier.name, target, rows)
        } else {
          results += TierResult(tier.name, Seq.empty, 0L)
        }
        finerParts = allParts
        if (killAfterTier.contains(tier.name))
          throw new SimulatedKill(s"killed after tier ${tier.name}")
      }
      results.toSeq
    } finally valid.unpersist()
  }

  /** Reference retry policy: `min(base·2^attempt, cap)` backoff
    * (`IoTDBWriter.java:272-291`); terminal failure marks lineage FAILED
    * (`IoTDBWriter.java:249-269`) and rethrows.
    */
  private def commitWithRetry[A](tier: String, jobId: String)(body: => A): A = {
    var attempt = 0
    while (true) {
      try {
        commitFault(tier, commitAttempts.getAndIncrement())
        return body
      } catch {
        case k: SimulatedKill => throw k
        case e: Exception if attempt < maxRetries =>
          state.commitLineage(Seq(state.LineageRow(
            tier, "*", "RETRY", String.valueOf(e.getMessage), attempt + 1, 0,
            jobId, state.nextSeq())))
          sleeper(math.min(retryBaseMs * (1L << attempt), retryCapMs))
          attempt += 1
        case e: Exception =>
          state.commitLineage(Seq(state.LineageRow(
            tier, "*", "FAILED", String.valueOf(e.getMessage), attempt, 0,
            jobId, state.nextSeq())))
          throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

final class SimulatedKill(msg: String) extends RuntimeException(msg)
