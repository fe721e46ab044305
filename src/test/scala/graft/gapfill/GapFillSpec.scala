package graft.gapfill

import graft.SparkTestBase
import graft.ingest.Synth
import graft.model.Tier
import graft.rollup.Rollup
import org.apache.spark.sql.functions._

class GapFillSpec extends SparkTestBase {
  import spark.implicits._

  test("fills exactly the missing grid points with linear values") {
    import java.sql.Timestamp
    // conv A present at minutes 0, 3; conv B at minute 1 only
    val rollup = Seq(
      ("A", Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      ("A", Timestamp.valueOf("2024-01-01 00:03:00"), 40.0),
      ("B", Timestamp.valueOf("2024-01-01 00:01:00"), 5.0)
    ).toDF("conv_id", "window_start", "char_len_avg")
    val out = GapFill.linear(rollup, Tier.M1, "char_len_avg")
      .orderBy("conv_id", "window_start").collect()
    val a = out.filter(_.getString(0) == "A").map(r =>
      (r.getTimestamp(1).toString, r.getDouble(2), r.getBoolean(3)))
    assert(a.toSeq == Seq(
      ("2024-01-01 00:00:00.0", 10.0, false),
      ("2024-01-01 00:01:00.0", 20.0, true),
      ("2024-01-01 00:02:00.0", 30.0, true),
      ("2024-01-01 00:03:00.0", 40.0, false)))
    // single-point series: nothing to fill
    assert(out.count(_.getString(0) == "B") == 1)
  }

  test("locf repeats the previous value across the gap (step semantics)") {
    import java.sql.Timestamp
    val rollup = Seq(
      ("A", Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      ("A", Timestamp.valueOf("2024-01-01 00:03:00"), 40.0)
    ).toDF("conv_id", "window_start", "char_len_avg")
    val out = GapFill.locf(rollup, Tier.M1, "char_len_avg")
      .orderBy("window_start").collect()
      .map(r => (r.getTimestamp(1).toString, r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      ("2024-01-01 00:00:00.0", 10.0, false),
      ("2024-01-01 00:01:00.0", 10.0, true),  // carried forward, not 20
      ("2024-01-01 00:02:00.0", 10.0, true),  // carried forward, not 30
      ("2024-01-01 00:03:00.0", 40.0, false)))
  }

  test("idempotent: filling an already-gapless series adds no rows") {
    val rollup = Rollup.fromRaw(
      Synth.transcripts(spark, 10, 30, seed = 5L).toDF(), Tier.H1)
    val once = GapFill.linear(rollup, Tier.H1, "char_len_avg")
    val again = GapFill.linear(
      once.withColumnRenamed("value", "char_len_avg").drop("filled"),
      Tier.H1, "char_len_avg")
    assert(once.count() == again.count())
    assert(again.filter(col("filled")).count() ===
      once.filter(col("filled")).count())
  }

  test("no fill across conversation boundaries") {
    import java.sql.Timestamp
    val rollup = Seq(
      ("A", Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      ("B", Timestamp.valueOf("2024-01-01 00:05:00"), 9.0)
    ).toDF("conv_id", "window_start", "char_len_avg")
    val out = GapFill.linear(rollup, Tier.M1, "char_len_avg")
    assert(out.count() == 2 && out.filter(col("filled")).count() == 0)
  }
}
