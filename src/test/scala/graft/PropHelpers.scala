package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property harness: scalatestplus isn't in the
  * offline cache, so drive scalacheck `Gen`s directly with a fixed seed
  * chain. Failures report the iteration index for reproduction.
  */
trait PropHelpers {
  def forAllN[A](gen: Gen[A], n: Int = 200, seed0: Long = 42L)(f: A => Unit): Unit = {
    var seed = Seed(seed0)
    var i = 0
    while (i < n) {
      val a = gen.pureApply(Gen.Parameters.default, seed)
      try f(a)
      catch {
        case e: Throwable =>
          throw new AssertionError(s"property failed at iteration $i (seed0=$seed0): $e", e)
      }
      seed = seed.next
      i += 1
    }
  }
}
