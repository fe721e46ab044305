package graft.streaming

import graft.SparkTestBase
import graft.ingest.Synth
import graft.model.Tier
import graft.rollup.Rollup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingRollupSpec extends SparkTestBase {

  test("streaming 1m rollup emits the batch-identical aggregates for closed windows") {
    val dir = tmpDir("stream-in")
    val turns = Synth.transcripts(spark, nConvs = 8, avgTurns = 40, seed = 21L).toDF()
    turns.write.mode("overwrite").parquet(dir)

    val q = StreamingRollup.rollup(StreamingRollup.readStream(spark, dir), Tier.M1)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_rollup")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("stream_rollup")
    // append mode only emits windows the watermark has passed; compare
    // exactly that subset against the batch rollup
    val batch = Rollup.fromRaw(turns, Tier.M1)
      .select("conv_id", "window_start", "turn_count", "user_turns",
        "assistant_turns", "tool_calls", "char_len_sum", "char_len_min",
        "char_len_max")
    val emitted = streamed.count()
    assert(emitted > 0, "watermark should have closed most windows")
    val joined = streamed.join(batch,
      Seq("conv_id", "window_start", "turn_count", "user_turns",
        "assistant_turns", "tool_calls", "char_len_sum", "char_len_min",
        "char_len_max"), "inner")
    assert(joined.count() == emitted, "every emitted window must match batch exactly")
  }

  test("streaming sliding rollup emits batch-identical overlapping windows") {
    val dir = tmpDir("stream-slide-in")
    val turns = Synth.transcripts(spark, nConvs = 8, avgTurns = 40, seed = 23L).toDF()
    turns.write.mode("overwrite").parquet(dir)

    val q = StreamingRollup.sliding(StreamingRollup.readStream(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_sliding")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("stream_sliding")
    val emitted = streamed.count()
    assert(emitted > 0, "watermark should have closed most windows")
    // every emitted (conv, window) must equal the batch operator's row,
    // INCLUDING the derived double (same sum*1.0/count over the same
    // longs -> identical bits, joinable on equality)
    val batch = Rollup.sliding(turns)
    val joined = streamed.join(batch,
      Seq("conv_id", "window_start", "turn_count", "user_turns",
        "tool_calls", "char_len_sum", "char_len_avg"), "inner")
    assert(joined.count() == emitted, "every emitted window must match batch exactly")
    // overlap sanity: each emitted turn-instance count ~2x per turn once
    // all windows close; at minimum the emitted set must contain turns
    // counted in MORE instances than the tumbling tier would hold
    val tumbling = Rollup.fromRaw(turns, graft.model.Tier.H1).count()
    assert(batch.count() > tumbling, "sliding must produce overlapping instances")
  }
}
