package graft.codec

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One input point of a series block. */
final case class Pt(ts_us: Long, value: Double)

/** Aggregation buffer: unsorted point accumulator with doubling growth.
  * Kept columnar (two primitive arrays) so per-partition updates are
  * allocation-free; Spark only serializes it at shuffle boundaries
  * (partial→final merge). `merge` copies only the live prefix `n`.
  */
final case class PtBuf(var n: Int, var ts: Array[Long], var vs: Array[Double])

/** Encoded series block: delta-of-delta timestamps + Gorilla XOR values,
  * with the header the reader needs for pruning (count, min/max ts) —
  * the columnar analogue of the reference's per-device Tablet
  * (`IoTDBWriter.java:147-185`), persisted instead of RPC'd.
  */
final case class SeriesBlock(
    ts_block: Array[Byte],
    value_block: Array[Byte],
    count: Long,
    min_ts: Long,
    max_ts: Long)

/** Typed Aggregator packing a (conv, window) group's points into an
  * encoded [[SeriesBlock]]. Commutative & associative: buffers merge by
  * concatenation and the final sort happens once in `finish`, so the
  * result is independent of partitioning / merge order (safe under AQE
  * re-plans and salted pre-aggregation).
  */
final class BlockAgg extends Aggregator[Pt, PtBuf, SeriesBlock] {

  override def zero: PtBuf = PtBuf(0, new Array[Long](8), new Array[Double](8))

  private def grow(b: PtBuf, need: Int): Unit = {
    if (b.n + need > b.ts.length) {
      var cap = b.ts.length
      while (cap < b.n + need) cap <<= 1
      b.ts = java.util.Arrays.copyOf(b.ts, cap)
      b.vs = java.util.Arrays.copyOf(b.vs, cap)
    }
  }

  override def reduce(b: PtBuf, p: Pt): PtBuf = {
    grow(b, 1)
    b.ts(b.n) = p.ts_us
    b.vs(b.n) = p.value
    b.n += 1
    b
  }

  override def merge(a: PtBuf, b: PtBuf): PtBuf = {
    grow(a, b.n)
    System.arraycopy(b.ts, 0, a.ts, a.n, b.n)
    System.arraycopy(b.vs, 0, a.vs, a.n, b.n)
    a.n += b.n
    a
  }

  override def finish(b: PtBuf): SeriesBlock = {
    val idx = Array.range(0, b.n)
    // sort indices by (ts, value-bits) for a deterministic block layout
    // even under duplicate timestamps
    val sorted = idx.sortBy(i => (b.ts(i), java.lang.Double.doubleToRawLongBits(b.vs(i))))
    val ts = sorted.map(b.ts)
    val vs = sorted.map(b.vs)
    SeriesBlock(
      SeriesCodec.encodeTimestamps(ts),
      SeriesCodec.encodeValues(vs),
      b.n.toLong,
      if (b.n > 0) ts(0) else 0L,
      if (b.n > 0) ts(b.n - 1) else 0L)
  }

  override def bufferEncoder: Encoder[PtBuf] = BlockAgg.bufEnc
  override def outputEncoder: Encoder[SeriesBlock] = BlockAgg.outEnc
}

object BlockAgg {
  private[codec] val bufEnc: Encoder[PtBuf] = Encoders.product[PtBuf]
  private[codec] val outEnc: Encoder[SeriesBlock] = Encoders.product[SeriesBlock]

  /** Column-API entry: `block_agg(unix_micros(ts), value)`. */
  lazy val udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new BlockAgg())

  def apply(ts: Column, value: Column): Column = udf.apply(ts, value)

  /** Decode a block pair back to points — the verification/read path
    * (exploded to rows; not on the hot write path).
    */
  lazy val decodeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf {
      (tsBlock: Array[Byte], valueBlock: Array[Byte]) =>
        val ts = SeriesCodec.decodeTimestamps(tsBlock)
        val vs = SeriesCodec.decodeValues(valueBlock)
        ts.zip(vs).map { case (t, v) => Pt(t, v) }
    }

  def decode(tsBlock: Column, valueBlock: Column): Column =
    decodeUdf.apply(tsBlock, valueBlock)
}
