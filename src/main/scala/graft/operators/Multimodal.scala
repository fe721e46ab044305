package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side plumbing — schema, batched
  * per-partition processing, partitioning, feature shapes — is real and
  * tested; the pixel/sample DECODE step is a clearly-marked
  * deterministic STUB (`decodeStub`): the container has no image/audio
  * codecs, and on a real cluster that one function body is swapped for
  * an actual decoder (libjpeg/ffmpeg) without touching any plumbing.
  */
object Multimodal {

  /** media table schema: one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("media", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("frames", IntegerType, nullable = true),
      StructField("format", StringType, nullable = false))), nullable = false)))

  /** Deterministic synthetic media: payload bytes derived from
    * (seed, asset_id) — a stand-in for real blobs with realistic sizes,
    * generated distributedly (one task per id range, never driver-side).
    */
  def synthMedia(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    val rows = spark.range(0L, n.toLong).rdd.map { id =>
      val rng = new java.util.Random(seed ^ (id * 0x9e3779b97f4a7c15L))
      val kinds = Array("image", "audio", "video")
      val kind = kinds(rng.nextInt(3))
      val size = 256 + rng.nextInt(2048)
      val bytes = new Array[Byte](size)
      rng.nextBytes(bytes)
      val meta = kind match {
        case "image" => Row(8 + rng.nextInt(248), 8 + rng.nextInt(248), null, null, "fake-img")
        case "audio" => Row(null, null, 8000 + 8000 * rng.nextInt(5), null, "fake-pcm")
        case "video" => Row(64, 64, null, 4 + rng.nextInt(28), "fake-vid")
      }
      Row(id, kind, bytes, meta)
    }
    spark.createDataFrame(rows, mediaSchema)
  }

  /** STUB decoder — deterministic pseudo-"pixels" from bytes. ??? in
    * spirit: replace this body with a real codec on a cluster with
    * image/audio libs. Everything downstream consumes only its OUTPUT
    * SHAPE (fixed-length Float features), which is the contract.
    */
  def decodeStub(media: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var i = 0
    while (i < media.length) {
      out(i % dims) += (media(i) & 0xff) / 255.0f
      i += 1
    }
    var j = 0
    while (j < dims) { out(j) = out(j) / math.max(1, media.length / dims); j += 1 }
    out
  }

  /** Batched feature extraction over partitions: the Scala analogue of
    * `mapInPandas` — each partition is processed as one streaming batch
    * (constant memory, no per-row closure dispatch), output is a typed
    * (asset_id, feature: array<float>) frame ready for
    * [[Similarity.lshTopK]], plus scalar verification companions
    * computed in the same pass: `feature_norm` (L2 norm, double) and
    * `feature_md5` (hex digest of the big-endian-packed float bytes) —
    * sortable/hashable columns for harnesses that cannot order an
    * array column.
    */
  def extractFeatures(media: DataFrame, dims: Int = 32): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("feature_norm", DoubleType, nullable = false),
      StructField("feature_md5", StringType, nullable = false)))
    val rdd = media.select(col("asset_id"), col("media")).rdd.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val f = decodeStub(r.getAs[Array[Byte]](1), dims)
        var norm = 0.0
        val packed = java.nio.ByteBuffer.allocate(4 * f.length)
        var i = 0
        while (i < f.length) {
          norm += f(i).toDouble * f(i).toDouble
          packed.putFloat(f(i))
          i += 1
        }
        md.reset()
        val hex = md.digest(packed.array()).map(b => f"$b%02x").mkString
        Row(r.getLong(0), f.toSeq, math.sqrt(norm), hex)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling for "video" assets — pure column algebra: slice the
    * byte stream into `frames` equal chunks, keep every `stride`-th.
    * (`substring` works on BinaryType; no decode needed to shard work.)
    */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_len",
        (length(col("media")) / col("meta.frames")).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("meta.frames") - 1, lit(stride))))
      .select(
        col("asset_id"),
        col("frame_idx"),
        expr("substring(media, frame_idx * frame_len + 1, frame_len)").as("frame_bytes"))

  /** Metadata-only "resize": the shape transform is real (new meta +
    * size-proportional byte budget), the pixel resample is the stub.
    */
  def resizeStub(media: DataFrame, w: Int, h: Int): DataFrame =
    media.filter(col("kind") === "image")
      .withColumn("meta", struct(
        lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.frames").as("frames"),
        concat(col("meta.format"), lit(s"-${w}x$h")).as("format")))
}
