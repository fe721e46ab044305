package graft.jobs

import graft.model.Tier
import graft.rollup.Rollup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step-by-step wall-clock breakdown of the rollup pipeline — the
  * measure-don't-guess harness behind the tuning notes in
  * BENCH/BASELINE.md. Not part of the driver contract.
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val input = args(0)
    val spark = SparkSession.builder().appName("graft-profile")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(body: => A): A = {
      val s = System.nanoTime()
      val r = body
      println(f"[profile] $name: ${(System.nanoTime() - s) / 1e9}%.2fs")
      r
    }
    val raw = spark.read.parquet(input)
    t("scan+count")(raw.count())
    val valid = raw.filter(col("ts").isNotNull && col("conv_id").isNotNull)
    t("agg max(ts) uncached")(
      valid.agg(max(unix_micros(col("ts").cast("timestamp")))).head())
    val cached = valid.cache()
    t("cache materialize")(cached.count())
    t("agg max(ts) cached")(
      cached.agg(max(unix_micros(col("ts").cast("timestamp")))).head())
    val m1 = Rollup.fromRaw(cached, Tier.M1)
    t("fromRaw(M1).count from cache")(m1.count())
    t("fromRaw(M1).count from parquet")(Rollup.fromRaw(valid, Tier.M1).count())
    val withP = m1.withColumn("p", date_format(col("window_start"), "yyyy-MM-dd"))
    t("M1 write straight (no repartition)")(
      withP.write.mode("overwrite").parquet("/tmp/profile_m1_straight"))
    t("M1 write repartition(p)+sort")(
      withP.repartition(col("p")).sortWithinPartitions("conv_id", "window_start")
        .write.mode("overwrite").partitionBy("p").parquet("/tmp/profile_m1_part"))
    val m1c = m1.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("M1 persist+count")(m1c.count())
    t("cascade 1h from persisted M1")(Rollup.cascade(m1c, Tier.H1).count())
    spark.stop()
  }
}
