package graft.codec

import java.nio.ByteBuffer

/** Block codecs for rolled-up series storage (north rule: "Gorilla XOR
  * float encoding and delta-of-delta timestamp compression for rolled-up
  * blocks stored as binary columns").
  *
  * The reference only *selects* these encodings per measurement
  * (`IoTDBMeasurement.java:45`, `GORILLA` listed in `README.md:250`);
  * the codec itself lives inside IoTDB. This is a from-scratch
  * implementation following the published Gorilla paper (Pelkonen et
  * al., "Gorilla: A Fast, Scalable, In-Memory Time Series Database",
  * VLDB 2015, §4.1), with two deliberate deviations for generality:
  *
  *  - timestamps are epoch MICROseconds (the input parquet carries
  *    microsecond precision), and the delta-of-delta bucket ladder is
  *    extended with a zigzag-encoded 64-bit escape so arbitrary gaps
  *    (>2h, out-of-order ingestion after sorting, etc.) never overflow;
  *  - values are encoded from `doubleToRawLongBits`, so NaN payloads,
  *    ±Inf, -0.0 and denormals round-trip bit-exactly.
  *
  * Pure Scala, no Spark dependency — unit/property tested in isolation
  * (CodecSpec), wrapped by [[BlockAggregator]] for the distributed path.
  */
object SeriesCodec {

  // ---- delta-of-delta timestamps -------------------------------------

  /** Encode sorted (non-decreasing not required, but sorted input is the
    * contract of the block writer) timestamps. Layout:
    * [int32 count][int64 firstTs][zigzag-dod bitstream from 2nd point;
    * the first delta is itself encoded as a dod against delta0=0].
    * Buckets ('0' | '10'+7b | '110'+9b | '1110'+12b | '11110'+32b |
    * '11111'+64b), zigzag-signed.
    */
  def encodeTimestamps(ts: Array[Long]): Array[Byte] = {
    val w = new BitWriter(ts.length)
    var prevTs = 0L
    var prevDelta = 0L
    var i = 0
    while (i < ts.length) {
      if (i == 0) {
        prevTs = ts(0)
      } else {
        val delta = ts(i) - prevTs
        val dod = delta - prevDelta
        writeDod(w, dod)
        prevDelta = delta
        prevTs = ts(i)
      }
      i += 1
    }
    val bits = w.toBytes
    val out = ByteBuffer.allocate(12 + bits.length)
    out.putInt(ts.length)
    out.putLong(if (ts.nonEmpty) ts(0) else 0L)
    out.put(bits)
    out.array()
  }

  private def writeDod(w: BitWriter, dod: Long): Unit = {
    val z = ZigZag.encode(dod)
    // UNSIGNED bucket compares: |dod| ≥ 2⁶² zigzags past Long.MaxValue
    // to a NEGATIVE z, which a signed '<' would misroute into the 7-bit
    // bucket — silently decoding to a different timestamp. Unsigned
    // ordering sends it to the 64-bit escape, keeping the round-trip
    // bit-exact for arbitrary deltas as the header doc promises.
    def ltU(bound: Long) = java.lang.Long.compareUnsigned(z, bound) < 0
    if (dod == 0L) w.writeBit(false)
    else if (ltU(1L << 7)) { w.writeBits(0x2, 2); w.writeBits(z, 7) }
    else if (ltU(1L << 9)) { w.writeBits(0x6, 3); w.writeBits(z, 9) }
    else if (ltU(1L << 12)) { w.writeBits(0xe, 4); w.writeBits(z, 12) }
    else if (ltU(1L << 32)) { w.writeBits(0x1e, 5); w.writeBits(z, 32) }
    else { w.writeBits(0x1f, 5); w.writeBits(z, 64) }
  }

  def decodeTimestamps(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val first = bb.getLong
    val out = new Array[Long](n)
    if (n == 0) return out
    out(0) = first
    val r = new BitReader(java.util.Arrays.copyOfRange(bytes, 12, bytes.length))
    var prevTs = first
    var prevDelta = 0L
    var i = 1
    while (i < n) {
      val dod =
        if (!r.readBit()) 0L
        else if (!r.readBit()) ZigZag.decode(r.readBits(7))
        else if (!r.readBit()) ZigZag.decode(r.readBits(9))
        else if (!r.readBit()) ZigZag.decode(r.readBits(12))
        else if (!r.readBit()) ZigZag.decode(r.readBits(32))
        else ZigZag.decode(r.readBits(64))
      val delta = prevDelta + dod
      prevTs += delta
      out(i) = prevTs
      prevDelta = delta
      i += 1
    }
    out
  }

  // ---- Gorilla XOR values --------------------------------------------

  /** Gorilla §4.1.2: first value verbatim (64 bits); then per value the
    * XOR with the previous: '0' if identical; '10' + meaningful bits
    * reusing the previous (leading, length) window when it still fits;
    * '11' + 5-bit leading-zero count + 6-bit (length-1) + bits.
    * Storing length-1 lets a 64-bit window fit in 6 bits.
    */
  def encodeValues(vs: Array[Double]): Array[Byte] = {
    val w = new BitWriter(vs.length)
    var prevBits = 0L
    var prevLead = -1
    var prevLen = -1
    var i = 0
    while (i < vs.length) {
      val bits = java.lang.Double.doubleToRawLongBits(vs(i))
      if (i == 0) {
        w.writeBits(bits, 64)
      } else {
        val xor = bits ^ prevBits
        if (xor == 0L) w.writeBit(false)
        else {
          w.writeBit(true)
          val lead0 = math.min(java.lang.Long.numberOfLeadingZeros(xor), 31)
          val trail = java.lang.Long.numberOfTrailingZeros(xor)
          val len = 64 - lead0 - trail
          if (prevLead >= 0 && lead0 >= prevLead && lead0 + len <= prevLead + prevLen) {
            w.writeBit(false)
            w.writeBits(xor >>> (64 - prevLead - prevLen), prevLen)
          } else {
            w.writeBit(true)
            w.writeBits(lead0.toLong, 5)
            w.writeBits((len - 1).toLong, 6)
            w.writeBits(xor >>> trail, len)
            prevLead = lead0
            prevLen = len
          }
        }
      }
      prevBits = bits
      i += 1
    }
    val bits = w.toBytes
    val out = ByteBuffer.allocate(4 + bits.length)
    out.putInt(vs.length)
    out.put(bits)
    out.array()
  }

  def decodeValues(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Double](n)
    if (n == 0) return out
    val r = new BitReader(java.util.Arrays.copyOfRange(bytes, 4, bytes.length))
    var prevBits = r.readBits(64)
    out(0) = java.lang.Double.longBitsToDouble(prevBits)
    var lead = -1
    var len = -1
    var i = 1
    while (i < n) {
      if (!r.readBit()) {
        // identical
      } else if (!r.readBit()) {
        val meaningful = r.readBits(len)
        prevBits = prevBits ^ (meaningful << (64 - lead - len))
      } else {
        lead = r.readBits(5).toInt
        len = r.readBits(6).toInt + 1
        val meaningful = r.readBits(len)
        prevBits = prevBits ^ (meaningful << (64 - lead - len))
      }
      out(i) = java.lang.Double.longBitsToDouble(prevBits)
      i += 1
    }
    out
  }
}
