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
}
