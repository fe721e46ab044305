package graft.jobs

import graft.model.Tier
import graft.rollup.Rollup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B probe for the tier-write clustering strategy: times the
  * full 1m agg + clustered parquet write under each candidate physical
  * layout, interleaved in one session so host phase and JIT state are
  * held constant (single-box wall clocks swing up to 4× across runs —
  * BENCH/BASELINE.md variance section — so cross-JVM A/B is meaningless).
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val input = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().appName("graft-write-probe")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val raw = spark.read.parquet(input.split(","): _*)
      .filter(col("ts").isNotNull && col("conv_id").isNotNull)
    def tier: DataFrame =
      Rollup.fromRaw(raw, Tier.M1)
        .withColumn("p", date_format(col("window_start"), "yyyy-MM-dd"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "hash_day" -> (() => tier.repartition(col("p"))
        .sortWithinPartitions(col("conv_id"), col("window_start"))),
      "hash_day_salt8" -> (() => tier
        .repartition(col("p"), pmod(hash(col("conv_id")), lit(8)))
        .sortWithinPartitions(col("conv_id"), col("window_start"))),
      "range_day_conv" -> (() => tier
        .repartitionByRange(col("p"), col("conv_id"))
        .sortWithinPartitions(col("conv_id"), col("window_start"))),
      // writer-task caps over the range winner: the A/B axis behind
      // spark.graft.write.tasks (RollupJob.writeClustered) — fewer
      // CONCURRENT parquet writers on a host whose write(2) page
      // faults serialize on the mmap_lock, same upstream parallelism
      "range_cap16" -> (() => tier
        .repartitionByRange(16, col("p"), col("conv_id"))
        .sortWithinPartitions(col("conv_id"), col("window_start"))),
      "range_cap8" -> (() => tier
        .repartitionByRange(8, col("p"), col("conv_id"))
        .sortWithinPartitions(col("conv_id"), col("window_start"))),
      "range_cap4" -> (() => tier
        .repartitionByRange(4, col("p"), col("conv_id"))
        .sortWithinPartitions(col("conv_id"), col("window_start"))),
      "no_cluster" -> (() => tier))

    val codecs: Seq[String] =
      if (args.length > 2) args(2).split(",").toSeq else Seq("snappy")

    for (r <- 1 to rounds; codec <- codecs; (label, mk) <- variants) {
      spark.conf.set("spark.sql.parquet.compression.codec", codec)
      val out = s"/dev/shm/write-probe-$label-$r"
      val t0 = System.nanoTime()
      mk().withColumn("_p", col("p")).write.mode("overwrite")
        .partitionBy("_p").parquet(out)
      val secs = (System.nanoTime() - t0) / 1e9
      val dir = new java.io.File(out)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val parts = walk(dir).filter(_.getName.endsWith(".parquet"))
      println(f"[probe] round=$r codec=$codec variant=$label wall=$secs%.2fs " +
        f"files=${parts.size} mb=${parts.map(_.length).sum / 1048576.0}%.0f")
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
    spark.stop()
  }
}
