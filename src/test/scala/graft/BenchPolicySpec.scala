package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's drift-retake attempt-selection policy (pure — no suite
  * run needed). The policy is the mechanized BASELINE.md
  * retaken-not-recorded rule: publish the attempt with the lowest
  * MEASURED drift ratio, never let an unmeasurable attempt win. */
class BenchPolicySpec extends AnyFunSuite {

  test("lowest defined drift ratio wins; ties go to the earliest attempt") {
    assert(BenchPolicy.pickPublished(Seq(Some(1.6), Some(1.01))) == 1)
    assert(BenchPolicy.pickPublished(Seq(Some(1.01), Some(1.6))) == 0)
    assert(BenchPolicy.pickPublished(Seq(Some(1.5), Some(1.02), Some(1.02), Some(1.3))) == 1)
  }

  test("a None-ratio retake never displaces a measured attempt (r9 advice)") {
    // the r9 bug shape: attempt 1 flagged at 1.6, retake broken (mass
    // query failures → no ratio) — the broken retake must NOT publish
    // as drift_detected=false; the flagged original is the record
    assert(BenchPolicy.pickPublished(Seq(Some(1.6), None)) == 0)
    // and symmetrically: a first attempt with no verdict loses to any
    // measured retake, even a drifted one
    assert(BenchPolicy.pickPublished(Seq(None, Some(1.4))) == 1)
    assert(BenchPolicy.pickPublished(Seq(None, None, Some(1.05))) == 2)
  }

  test("all-None publishes the first attempt (no verdict ever existed)") {
    assert(BenchPolicy.pickPublished(Seq(None)) == 0)
    assert(BenchPolicy.pickPublished(Seq(None, None)) == 0)
  }

  test("single clean attempt publishes itself") {
    assert(BenchPolicy.pickPublished(Seq(Some(1.0))) == 0)
  }
}
