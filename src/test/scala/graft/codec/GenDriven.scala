package graft.codec

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property-driver (the scalatest-scalacheck bridge
  * artifact is not in the offline cache, so we sample generators directly). */
trait GenDriven {
  def forAll[A](gen: Gen[A], trials: Int = 80)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var i = 0
    while (i < trials) {
      f(gen.pureApply(params, seed))
      seed = seed.next
      i += 1
    }
  }
}
