package graft.codec

import graft.PropHelpers
import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite with PropHelpers {

  private def bitsOf(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  // --- generators -----------------------------------------------------

  /** Monotone non-decreasing micros sequences: duplicates, sub-ms jitter,
    * and >2h gaps (the DoD overflow hazard from SURVEY.md §7).
    */
  private val tsSeqGen: Gen[Array[Long]] = for {
    n <- Gen.chooseNum(0, 400)
    start <- Gen.chooseNum(0L, 1893456000000000L) // 1970..2030 in micros
    deltas <- Gen.listOfN(
      n,
      Gen.frequency(
        4 -> Gen.chooseNum(0L, 1000L),              // duplicate / sub-ms
        8 -> Gen.chooseNum(1000L, 60L * 1000000L),  // normal turn gaps
        1 -> Gen.chooseNum(2L * 3600L * 1000000L, 90L * 86400L * 1000000L) // >2h..90d
      ))
  } yield deltas.scanLeft(start)(_ + _).toArray

  private val doubleGen: Gen[Double] = Gen.frequency(
    8 -> Gen.chooseNum(-1e9, 1e9),
    2 -> Gen.chooseNum(0L, 4000L).map(_.toDouble), // char-length-like
    1 -> Gen.oneOf(
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      -0.0, 0.0, Double.MinPositiveValue, Double.MaxValue, Double.MinValue,
      java.lang.Double.longBitsToDouble(0x7ff8000000001234L) // NaN payload
    ))

  private val valueSeqGen: Gen[Array[Double]] = for {
    n <- Gen.chooseNum(0, 400)
    // runs of identical values exercise the '0' (xor==0) branch
    vs <- Gen.listOfN(n, Gen.frequency(5 -> doubleGen, 2 -> Gen.const(42.0)))
  } yield vs.toArray

  // --- properties -----------------------------------------------------

  test("zigzag roundtrips all longs") {
    forAllN(Arbitrary.arbitrary[Long]) { v => assert(ZigZag.decode(ZigZag.encode(v)) == v) }
    for (v <- Seq(Long.MinValue, Long.MaxValue, 0L, -1L, 1L))
      assert(ZigZag.decode(ZigZag.encode(v)) == v)
  }

  test("bit writer/reader roundtrips arbitrary widths") {
    forAllN(Gen.listOf(Gen.zip(Gen.chooseNum(0L, Long.MaxValue), Gen.chooseNum(1, 64)))) {
      pairs =>
        val w = new BitWriter()
        pairs.foreach { case (v, n) =>
          w.writeBits(v & (if (n == 64) -1L else (1L << n) - 1), n)
        }
        val r = new BitReader(w.toBytes)
        pairs.foreach { case (v, n) =>
          assert(r.readBits(n) == (v & (if (n == 64) -1L else (1L << n) - 1)))
        }
    }
  }

  test("delta-of-delta timestamps roundtrip (dups, sub-ms, >2h gaps)") {
    forAllN(tsSeqGen) { ts =>
      assert(SeriesCodec.decodeTimestamps(SeriesCodec.encodeTimestamps(ts)).sameElements(ts))
    }
  }

  test("delta-of-delta handles extreme dod magnitudes via 64-bit escape") {
    val ts = Array(0L, Long.MaxValue / 2, Long.MaxValue / 2 + 1)
    assert(SeriesCodec.decodeTimestamps(SeriesCodec.encodeTimestamps(ts)).sameElements(ts))
  }

  test("dod >= 2^62 zigzags past Long.MaxValue and still routes to the 64-bit escape") {
    // zigzag(2^62) wraps NEGATIVE; a signed bucket compare would
    // misroute it into the 7-bit bucket and silently decode a different
    // timestamp — the unsigned compare sends it to the escape
    for (ts <- Seq(
      Array(0L, 1L << 62, (1L << 62) + 5),
      Array(0L, Long.MaxValue, Long.MaxValue - 3),
      Array(Long.MinValue / 2, Long.MaxValue / 2)))
      assert(SeriesCodec.decodeTimestamps(SeriesCodec.encodeTimestamps(ts)).sameElements(ts),
        s"corrupted roundtrip for ${ts.toSeq}")
  }

  test("gorilla values roundtrip bit-exactly (NaN payloads, ±Inf, -0.0, denormals)") {
    forAllN(valueSeqGen) { vs =>
      val out = SeriesCodec.decodeValues(SeriesCodec.encodeValues(vs))
      assert(out.length == vs.length)
      var i = 0
      while (i < vs.length) {
        assert(bitsOf(out(i)) == bitsOf(vs(i)), s"at $i: ${vs(i)} != ${out(i)}")
        i += 1
      }
    }
  }

  test("empty and singleton blocks") {
    assert(SeriesCodec.decodeTimestamps(SeriesCodec.encodeTimestamps(Array.empty)).isEmpty)
    assert(SeriesCodec.decodeValues(SeriesCodec.encodeValues(Array.empty)).isEmpty)
    assert(SeriesCodec.decodeTimestamps(SeriesCodec.encodeTimestamps(Array(123L))).sameElements(Array(123L)))
    assert(SeriesCodec.decodeValues(SeriesCodec.encodeValues(Array(Double.NaN))).forall(_.isNaN))
  }

  test("constant-delta series compresses to ~1 bit per point") {
    val ts = Array.tabulate(10000)(i => 1700000000000000L + i * 60000000L)
    val enc = SeriesCodec.encodeTimestamps(ts)
    // header 12 bytes + first delta ~2 bytes + 1 bit per remaining point
    assert(enc.length < 12 + 8 + 10000 / 8 + 16, s"got ${enc.length} bytes")
    val vs = Array.fill(10000)(37.0)
    val encV = SeriesCodec.encodeValues(vs)
    assert(encV.length < 4 + 8 + 10000 / 8 + 16, s"got ${encV.length} bytes")
  }
}
