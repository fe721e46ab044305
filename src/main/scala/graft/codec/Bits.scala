package graft.codec

/** Append-only bit writer backing the block codecs. Grows a byte array;
  * bits are written MSB-first within each byte.
  */
final class BitWriter(initialCapacity: Int = 64) {
  private var buf = new Array[Byte](math.max(8, initialCapacity))
  private var bitPos = 0 // absolute bit position

  private def ensure(bits: Int): Unit = {
    val neededBytes = (bitPos + bits + 7) >>> 3
    if (neededBytes > buf.length) {
      var cap = buf.length
      while (cap < neededBytes) cap <<= 1
      buf = java.util.Arrays.copyOf(buf, cap)
    }
  }

  def writeBit(b: Boolean): Unit = {
    ensure(1)
    if (b) buf((bitPos >>> 3)) = (buf(bitPos >>> 3) | (0x80 >>> (bitPos & 7))).toByte
    bitPos += 1
  }

  /** Write the low `n` bits of `v` (0 <= n <= 64), MSB first. */
  def writeBits(v: Long, n: Int): Unit = {
    ensure(n)
    var i = n - 1
    while (i >= 0) {
      if (((v >>> i) & 1L) != 0L)
        buf(bitPos >>> 3) = (buf(bitPos >>> 3) | (0x80 >>> (bitPos & 7))).toByte
      bitPos += 1
      i -= 1
    }
  }

  def lengthBits: Int = bitPos

  def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, (bitPos + 7) >>> 3)
}

/** Bit reader over a byte array; mirror of [[BitWriter]]. */
final class BitReader(bytes: Array[Byte]) {
  private var bitPos = 0

  def readBit(): Boolean = {
    val b = (bytes(bitPos >>> 3) & (0x80 >>> (bitPos & 7))) != 0
    bitPos += 1
    b
  }

  /** Read `n` bits (0 <= n <= 64) MSB-first into the low bits of a Long. */
  def readBits(n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) {
      v = (v << 1) | (if (readBit()) 1L else 0L)
      i += 1
    }
    v
  }
}

object ZigZag {
  def encode(v: Long): Long = (v << 1) ^ (v >> 63)
  def decode(v: Long): Long = (v >>> 1) ^ -(v & 1L)
}
