package graft.streaming

import graft.model.Tier
import graft.state.StateStore
import graft.table.SnapshotTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Durable streaming ingestion: drives [[StreamingRollup.rollup]] into
  * the same SnapshotTable + StateStore warehouse the batch pipeline
  * uses — the streaming sibling of [[graft.jobs.RollupJob]].
  *
  * Append-mode closed windows land per micro-batch as day partitions
  * via `foreachBatch`; each batch commits a lineage row keyed by its
  * streaming batchId. Batch commits are IDEMPOTENT on replay: Spark
  * re-runs a micro-batch after a crash (the streaming checkpoint is
  * at-least-once into a non-transactional sink), so [[commitBatch]]
  * first consults lineage — a batch whose id is already COMPLETED is
  * skipped. The residual window (crash BETWEEN the table commit and
  * the lineage commit re-appends one batch) is the same commit-ordering
  * caveat the reference has between its sink insert and its
  * `row_processing` status UPDATE (`MigrateTask.java:79-111`) and the
  * batch RollupJob documents for its own tier commit + checkpoint pair;
  * closing it fully would need the lineage write to ride inside the
  * table's atomic manifest commit.
  *
  * Nothing here caches or collects: a micro-batch of closed windows is
  * O(windows closed this trigger), already aggregated by the streaming
  * state store.
  */
object StreamingRollupJob {

  def tablePath(warehouse: String, tier: Tier) = s"$warehouse/rollup_stream_${tier.name}"

  /** Start the durable streaming rollup. The caller owns the returned
    * query (awaitTermination / stop); `checkpointDir` must be stable
    * across restarts — it is the streaming source/state checkpoint that
    * makes a restarted query resume exactly where it stopped.
    */
  def start(spark: SparkSession, inputDir: String, warehouse: String,
      checkpointDir: String, tier: Tier = Tier.M1,
      watermarkDelay: String = "10 minutes", jobId: String = "stream"): StreamingQuery = {
    val state = new StateStore(s"$warehouse/_state")
    val table = new SnapshotTable(tablePath(warehouse, tier))
    StreamingRollup.rollup(StreamingRollup.readStream(spark, inputDir), tier, watermarkDelay)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        commitBatch(state, table, batch, id, jobId)
        ()
      }
      .start()
  }

  private val tierOf = "rollup_stream_(.+)".r

  /** One micro-batch commit: skip if this batchId already has COMPLETED
    * lineage (crash-replay idempotence), else append the windows as day
    * partitions and record lineage. Visible for direct testing.
    */
  private[streaming] def commitBatch(state: StateStore, table: SnapshotTable,
      batch: DataFrame, batchId: Long, jobId: String): Long = {
    val tierName = table.root.split('/').last match {
      case tierOf(t) => t
      case other => other
    }
    val partition = s"batch-$batchId"
    val already = state.latestLineage.get((tierName, partition))
      .exists(_.status == "COMPLETED")
    if (already) {
      state.log("WARNING", tierName,
        s"micro-batch $batchId replayed after restart; already committed — skipping", jobId)
      0L
    } else {
      // appended rows from parquet footer metadata of the files this
      // batch staged (append concatenates prev ++ staged) — no count()
      // job over the data
      val prevCount = table.currentManifest.map(_.files.size).getOrElse(0)
      val withDay = batch.withColumn("p", date_format(col("window_start"), "yyyy-MM-dd"))
      val manifest = table.append(withDay, "p")
      val appended = table.rowCount(batch.sparkSession, manifest.files.drop(prevCount))
      state.commitLineage(Seq(state.LineageRow(
        tierName, partition, "COMPLETED", "", 0, appended, jobId,
        state.nextSeq())))
      appended
    }
  }
}
