package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int) = java.sql.Timestamp.from(
    java.time.Instant.parse("2024-03-01T10:00:00Z").plusSeconds(min * 60L))

  private lazy val turns = Seq(
    ("c1", 0, ts(0), "a"),
    ("c1", 1, ts(10), "b"),
    ("c1", 2, ts(51), "c"), // 41-minute gap → new session
    ("c1", 3, ts(60), "d"),
    ("c2", 0, ts(5), "e"))
    .toDF("conv_id", "turn_idx", "ts", "text")

  test("assign: sessions split exactly at gaps beyond the threshold") {
    val got = Sessionize.assign(turns, gapSeconds = 1800L)
      .select("conv_id", "turn_idx", "session_idx").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("c1", 0) -> 1L, ("c1", 1) -> 1L, ("c1", 2) -> 2L, ("c1", 3) -> 2L,
      ("c2", 0) -> 1L))
    // a gap of exactly the threshold does NOT split (strict >)
    val exact = Seq(("c", 0, ts(0), "x"), ("c", 1, ts(30), "y"))
      .toDF("conv_id", "turn_idx", "ts", "text")
    assert(Sessionize.assign(exact, 1800L).select("session_idx")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 1L))
  }

  test("summarize: per-session bounds, counts, duration") {
    val got = Sessionize.summarize(turns, 1800L)
      .orderBy("conv_id", "session_idx").collect()
    assert(got.length == 3)
    val s1 = got(0) // c1 session 1
    assert(s1.getString(0) == "c1" && s1.getLong(1) == 1L)
    assert(s1.getTimestamp(2) == ts(0) && s1.getTimestamp(3) == ts(10))
    assert(s1.getLong(4) == 2L && s1.getDouble(5) == 600.0)
    val s2 = got(1)
    assert(s2.getLong(1) == 2L && s2.getLong(4) == 2L && s2.getDouble(5) == 540.0)
    val c2 = got(2)
    assert(c2.getString(0) == "c2" && c2.getLong(4) == 1L && c2.getDouble(5) == 0.0)
  }
}
