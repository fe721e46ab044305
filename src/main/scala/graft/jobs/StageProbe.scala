package graft.jobs

import graft.model.Tier
import graft.rollup.Rollup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal single-stage scaling probe: times one named stage, prints
  * one line. Used by the BENCH/BASELINE.md methodology to attribute
  * scaling loss (compute vs shuffle vs write).
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val Array(stage, input) = args.take(2)
    val spark = SparkSession.builder().appName(s"probe-$stage")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = spark.read.parquet(input)
      .filter(col("ts").isNotNull && col("conv_id").isNotNull)
    // warmup scan so JIT/codegen/page-cache effects don't pollute
    raw.count()
    val t0 = System.nanoTime()
    stage match {
      case "agg" => Rollup.fromRaw(raw, Tier.M1).count()
      case "agg-write" =>
        Rollup.fromRaw(raw, Tier.M1)
          .withColumn("p", date_format(col("window_start"), "yyyy-MM-dd"))
          .repartition(col("p"))
          .sortWithinPartitions("conv_id", "window_start")
          .write.mode("overwrite").partitionBy("p")
          .parquet(args(2))
      case "scan" => raw.count()
      case "blocks" =>
        graft.rollup.BlockRollup.encode(raw, Tier.H1).count()
    }
    println(f"[probe] $stage: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
