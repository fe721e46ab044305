package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  private lazy val media = Multimodal.synthMedia(spark, 60, seed = 9L).cache()

  test("synthetic media is deterministic and schema-exact") {
    val again = Multimodal.synthMedia(spark, 60, seed = 9L)
    assert(media.schema == Multimodal.mediaSchema)
    val a = media.select(col("asset_id"), md5(col("media"))).collect().map(_.toString).sorted
    val b = again.select(col("asset_id"), md5(col("media"))).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("feature extraction yields fixed-dim float vectors per asset") {
    val feats = Multimodal.extractFeatures(media, dims = 32)
    assert(feats.schema.fieldNames.toSeq ==
      Seq("asset_id", "feature", "feature_norm", "feature_md5"))
    val rows = feats.collect()
    assert(rows.length == 60)
    assert(rows.forall(_.getSeq[Float](1).length == 32))
    // scalar companions agree with the array they digest
    rows.foreach { r =>
      val f = r.getSeq[Float](1)
      val norm = math.sqrt(f.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(r.getDouble(2) - norm) < 1e-9)
      assert(r.getString(3).matches("[0-9a-f]{32}"))
    }
    // plumbing composes with the ANN operator
    val asEmb = feats.select(col("asset_id").as("vec_id"), col("feature").as("embedding"))
    val knn = Similarity.bruteForceTopK(asEmb, asEmb.limit(2), 3)
    assert(knn.count() == 6)
  }

  test("frame sampling slices the byte stream by meta.frames") {
    val frames = Multimodal.sampleFrames(media, stride = 2)
    val one = media.filter(col("kind") === "video").select(col("asset_id"),
      col("meta.frames"), length(col("media"))).head()
    val expect = (one.getInt(1) + 1) / 2
    val got = frames.filter(col("asset_id") === one.getLong(0)).count()
    assert(got == expect, s"asset ${one.getLong(0)}: $got frames, want $expect")
    assert(frames.filter(length(col("frame_bytes")) === 0).count() == 0)
  }

  test("resize rewrites metadata only for images") {
    val rs = Multimodal.resizeStub(media, 32, 32)
    assert(rs.select("meta.width").distinct().collect().map(_.getInt(0)).toSeq == Seq(32))
    assert(rs.count() == media.filter(col("kind") === "image").count())
  }
}
