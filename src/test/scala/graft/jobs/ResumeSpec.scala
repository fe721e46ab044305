package graft.jobs

import graft.SparkTestBase
import graft.ingest.Synth
import graft.model.Tier

class ResumeSpec extends SparkTestBase {

  private def freshInput() = Synth.transcripts(
    spark, nConvs = 12, avgTurns = 40, seed = 11L).toDF()

  test("uninterrupted run commits all tiers with COMPLETED/IN_PROGRESS checkpoints") {
    val wh = tmpDir("wh-clean")
    val job = new RollupJob(wh)
    val res = job.run(spark, freshInput(), "job-1")
    assert(res.map(_.tier) == Seq("1m", "1h", "1d", "blocks_1h"))
    assert(res.forall(_.rows > 0))
    val cps = job.state.checkpoints
    assert(cps.nonEmpty)
    // the last day with data can't be closed; earlier days must be COMPLETED
    val m1 = cps.collect { case ((t, p), c) if t == "1m" => p -> c.status }.toMap
    val lastDay = m1.keys.max
    assert(m1(lastDay) == "IN_PROGRESS")
    assert((m1 - lastDay).values.forall(_ == "COMPLETED"))
  }

  test("kill after 1m tier → resume completes 1h/1d and recomputes only open partitions") {
    val wh = tmpDir("wh-resume")
    val input = freshInput()

    val killed = new RollupJob(wh)
    intercept[SimulatedKill] {
      killed.run(spark, input, "job-1", killAfterTier = Some("1m"))
    }
    // 1m committed, 1h/1d absent
    assert(killed.tierTable(Tier.M1).currentVersion.nonEmpty)
    assert(killed.tierTable(Tier.H1).currentVersion.isEmpty)

    val resumed = new RollupJob(wh)
    val res = resumed.run(spark, input, "job-2")
    // resume recomputed only the non-COMPLETED (open) 1m partitions
    val m1Recomputed = res.find(_.tier == "1m").get.partitions
    val completedBefore = killed.state.completedPartitions("1m")
    assert(m1Recomputed.toSet.intersect(completedBefore).isEmpty)
    assert(res.find(_.tier == "1h").get.rows > 0)

    // final state identical to an uninterrupted run in a fresh warehouse
    val whRef = tmpDir("wh-ref")
    val ref = new RollupJob(whRef)
    ref.run(spark, input, "job-ref")
    for (t <- Seq(Tier.M1, Tier.H1, Tier.D1)) {
      assertSameRows(
        ref.tierTable(t).read(spark),
        resumed.tierTable(t).read(spark))
    }
  }

  test("rerun after success is a no-op for completed partitions") {
    val wh = tmpDir("wh-noop")
    val input = freshInput()
    val job = new RollupJob(wh)
    job.run(spark, input, "job-1")
    val res2 = new RollupJob(wh).run(spark, input, "job-2")
    val completed = job.state.completedPartitions("1m")
    // second run touches only the still-open partitions
    assert(res2.find(_.tier == "1m").get.partitions.toSet.intersect(completed).isEmpty)
  }

  test("transient commit failure retries with backoff and records RETRY lineage") {
    val wh = tmpDir("wh-flaky")
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val job = new RollupJob(wh, maxRetries = 5, retryBaseMs = 50, retryCapMs = 1000,
      sleeper = sleeps.append(_))
    var failures = 0
    job.commitFault = (tier, _) =>
      if (tier == "1m" && failures < 3) { failures += 1; throw new RuntimeException(s"flaky $failures") }
    val res = job.run(spark, freshInput(), "job-flaky")
    assert(res.forall(r => r.tier != "1m" || r.rows > 0))
    val retries = job.state.lineage.filter(_.status == "RETRY")
    assert(retries.map(_.retryCount).sorted == Seq(1, 2, 3))
    // reference backoff: min(base·2^attempt, cap) → 50, 100, 200
    assert(sleeps.toSeq == Seq(50L, 100L, 200L))
  }

  test("null-ts rows are rejected to lineage, run survives") {
    val wh = tmpDir("wh-rejects")
    val input = Synth.transcripts(spark, nConvs = 5, avgTurns = 20, seed = 3L,
      nullTsEvery = 7).toDF()
    val job = new RollupJob(wh)
    val res = job.run(spark, input, "job-rej")
    assert(res.forall(_.rows >= 0))
    val rej = job.state.lineage.filter(r => r.tier == "ingest" && r.status == "FAILED")
    assert(rej.nonEmpty && rej.head.rows > 0)
    assert(job.rejectsTable.read(spark).count() == rej.head.rows)
  }
}
