package graft.retention

import graft.SparkTestBase
import graft.model.Tier
import graft.table.SnapshotTable
import org.apache.spark.sql.functions._

class RetentionSpec extends SparkTestBase {
  import spark.implicits._

  private def dayed(days: (String, Int)*) =
    days.toDF("p", "v")

  test("tier expiry drops partitions past the horizon, lexicographically") {
    val t = new SnapshotTable(tmpDir("ret-tier"))
    t.overwritePartitions(dayed("2024-01-01" -> 1, "2024-03-01" -> 2, "2024-06-01" -> 3), "p")
    // 1m horizon is 7 days: watermark 2024-06-05 expires everything
    // before 2024-05-29
    val dropped = Retention.expire(t, Tier.M1.name, "2024-06-05", Retention.Policy())
    assert(dropped == Set("2024-01-01", "2024-03-01"))
    assert(t.partitionsOf == Set("2024-06-01"))
  }

  test("blocks table: expiry + orphan vacuum run through the policy key") {
    val t = new SnapshotTable(tmpDir("ret-blocks"))
    t.overwritePartitions(dayed("2014-01-01" -> 1, "2026-01-01" -> 2), "p")
    // a crash-orphaned stage file (no manifest references it, old mtime)
    val orphanDir = java.nio.file.Paths.get(t.root, "data", "stage-orphan", "_p=z")
    java.nio.file.Files.createDirectories(orphanDir)
    val orphan = orphanDir.resolve("part-orphan.parquet")
    java.nio.file.Files.write(orphan, Array[Byte](1, 2, 3))
    java.nio.file.Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 7200000L))

    // blocks horizon is ~10y: the 2014 partition expires, 2026 survives
    val dropped = Retention.expire(t, Retention.blocksKey, "2026-02-01", Retention.Policy())
    assert(dropped == Set("2014-01-01"))
    assert(t.partitionsOf == Set("2026-01-01"))
    assert(!java.nio.file.Files.exists(orphan),
      "blocks retention must vacuum crash orphans")
    assert(t.read(spark).collect().map(_.getAs[Int]("v")).toSeq == Seq(2))
  }

  test("orphan vacuum runs even when NO partition expires (long-horizon table)") {
    val t = new SnapshotTable(tmpDir("ret-noexp"))
    t.overwritePartitions(dayed("2026-01-01" -> 1), "p")
    // superseded snapshot + old orphan, but nothing past the horizon
    t.overwritePartitions(dayed("2026-01-01" -> 2), "p")
    t.overwritePartitions(dayed("2026-01-01" -> 3), "p")
    val orphan = java.nio.file.Paths.get(t.root, "data", "stage-x", "_p=q", "f.parquet")
    java.nio.file.Files.createDirectories(orphan.getParent)
    java.nio.file.Files.write(orphan, Array[Byte](9))
    java.nio.file.Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 7200000L))
    val dropped = Retention.expire(t, Retention.blocksKey, "2026-02-01", Retention.Policy())
    assert(dropped.isEmpty)
    assert(!java.nio.file.Files.exists(orphan),
      "vacuum must not be gated on partition expiry")
    assert(t.read(spark).collect().map(_.getAs[Int]("v")).toSeq == Seq(3))
  }

  test("unknown horizon key never expires anything") {
    val t = new SnapshotTable(tmpDir("ret-unknown"))
    t.overwritePartitions(dayed("1999-01-01" -> 1), "p")
    assert(Retention.expire(t, "no-such-table", "2026-01-01", Retention.Policy()).isEmpty)
    assert(t.partitionsOf == Set("1999-01-01"))
  }
}
