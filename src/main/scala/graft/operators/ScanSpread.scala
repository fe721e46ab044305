package graft.operators

import org.apache.spark.sql.DataFrame

/** Spread an under-partitioned input before per-row HEAVY map work —
  * the guide §2.5 "input skew" case: a corpus that arrives as one (or
  * few) scan partitions (single parquet file / row group, small table,
  * unsplittable container) serializes every downstream map pass on one
  * core, however many the cluster has, because nothing upstream of the
  * first exchange redistributes it. The hash-heavy document operators
  * (shingle-md5 + minhash, simhash, winnowing fingerprints, bloom
  * prescreen) are exactly such passes: all their cost is BEFORE the
  * first shuffle.
  *
  * The spread is gated on the PLANNED input size (pure planning-time
  * estimate — no job, so plan-constructor contracts like
  * decontaminateBloomWith's zero-jobs pin hold): inputs estimated
  * above a couple of scan splits already produce enough partitions,
  * so the gate makes this a no-op at scale — the corpus is never
  * round-robin-shuffled when it is genuinely large. When the gate
  * fires, the exchange moves at most `spreadMaxBytes` (small by the
  * gate's own definition) and buys `defaultParallelism`-way execution
  * of the expensive map stage.
  */
object ScanSpread {

  /** Inputs estimated at or below this size are spread. Two default
    * scan splits (2 × 128 MB `spark.sql.files.maxPartitionBytes`):
    * below it a scan yields ≲2 partitions, so the map stage would use
    * ≲2 cores; shuffling ≤256 MB to unlock full parallelism is always
    * cheap relative to the hash work it parallelizes. Override with
    * `spark.graft.spread.maxBytes` (0 disables).
    */
  val defaultSpreadMaxBytes: Long = 256L * 1024 * 1024

  private[operators] def spreadForCompute(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val maxBytes = spark.conf.getOption("spark.graft.spread.maxBytes")
      .map(v => try v.toLong catch {
        case e: NumberFormatException => throw new IllegalArgumentException(
          s"spark.graft.spread.maxBytes must be a byte count, got '$v'", e)
      }).getOrElse(defaultSpreadMaxBytes)
    if (maxBytes <= 0) df
    else {
      val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (est <= maxBytes)
        df.repartition(spark.sparkContext.defaultParallelism)
      else df
    }
  }
}
