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

  test("a None-ratio retake does not END the retake loop (r10 review)") {
    // attempt 1 measured drifted, retake 2 unmeasurable: the drift
    // verdict still stands — keep retaking within budget
    assert(BenchPolicy.retakeNeeded(Seq(Some(1.6), None), 1.15))
    // a later clean measurement ends it
    assert(!BenchPolicy.retakeNeeded(Seq(Some(1.6), None, Some(1.02)), 1.15))
    // no measured ratio at all = no verdict = no retake
    assert(!BenchPolicy.retakeNeeded(Seq(None), 1.15))
    assert(!BenchPolicy.retakeNeeded(Seq(Some(1.05)), 1.15))
  }

  test("BENCH_SELF overwrite needs a positive in-band verdict (r10 review)") {
    val bar = 1.15
    // clean comparable run: record
    assert(BenchPolicy.selfRecordable(Some(1.02), refMissing = false, anyFailed = false, bar))
    // wrong SF: median ratio ~0.1 is 'not drifted' but NOT comparable
    assert(!BenchPolicy.selfRecordable(Some(0.1), refMissing = false, anyFailed = false, bar))
    // drifted: never
    assert(!BenchPolicy.selfRecordable(Some(1.4), refMissing = false, anyFailed = false, bar))
    // unmeasurable with a reference present: no verdict, no record
    assert(!BenchPolicy.selfRecordable(None, refMissing = false, anyFailed = false, bar))
    // bootstrap: no reference exists yet — a fully-green run seeds it
    assert(BenchPolicy.selfRecordable(None, refMissing = true, anyFailed = false, bar))
    assert(!BenchPolicy.selfRecordable(None, refMissing = true, anyFailed = true, bar))
    // a failed query invalidates even an in-band ratio: the line's
    // total omits the failure's seconds — faster-looking but partial
    assert(!BenchPolicy.selfRecordable(Some(1.0), refMissing = false, anyFailed = true, bar))
  }

  test("BENCH_SELF record is monotone (r10 verdict task 2)") {
    val bar = 1.15
    // the exact r10 driver case: in-band 1.141 vs stored 0.912 — the
    // 31%-slower run must NOT displace the committed quiet record
    assert(!BenchPolicy.selfRecordable(Some(1.141), refMissing = false,
      anyFailed = false, bar, storedRatio = Some(0.912)))
    // a genuinely faster clean run replaces it
    assert(BenchPolicy.selfRecordable(Some(0.905), refMissing = false,
      anyFailed = false, bar, storedRatio = Some(0.912)))
    // a tie within eps (same-speed refresh on an equally quiet host)
    // is admitted — re-runs carrying new telemetry fields stay possible
    assert(BenchPolicy.selfRecordable(Some(0.92), refMissing = false,
      anyFailed = false, bar, storedRatio = Some(0.912)))
    // ...but eps does not admit real regressions
    assert(!BenchPolicy.selfRecordable(Some(0.95), refMissing = false,
      anyFailed = false, bar, storedRatio = Some(0.912)))
    // no stored measured ratio (fresh tree, or a legacy record without
    // the field): the in-band verdict alone suffices
    assert(BenchPolicy.selfRecordable(Some(1.1), refMissing = false,
      anyFailed = false, bar, storedRatio = None))
    // bootstrap seeds ONLY when there is no measured record to protect:
    // a reference-file loss must not let a ratio-less run clobber one
    assert(!BenchPolicy.selfRecordable(None, refMissing = true,
      anyFailed = false, bar, storedRatio = Some(0.912)))
    assert(BenchPolicy.selfRecordable(None, refMissing = true,
      anyFailed = false, bar, storedRatio = None))
  }

  test("the monotone bar is the record's FLOOR, so within-eps refreshes cannot ratchet it (r11 review)") {
    val bar = 1.15
    // a 0.93 refresh lands in the tie band of floor 0.912 and records...
    assert(BenchPolicy.selfRecordable(Some(0.93), refMissing = false,
      anyFailed = false, bar, storedRatio = Some(0.912)))
    // ...but the floor it WRITES is still 0.912 — not its own 0.93
    assert(BenchPolicy.nextFloor(Some(0.93), Some(0.912)) == Some(0.912))
    // so the next step of the would-be ratchet (0.95 vs floor 0.912)
    // is rejected: the bar never walks upward in +eps steps
    assert(!BenchPolicy.selfRecordable(Some(0.95), refMissing = false,
      anyFailed = false, bar, storedRatio = Some(0.912)))
    // a genuinely faster run lowers the floor
    assert(BenchPolicy.nextFloor(Some(0.88), Some(0.912)) == Some(0.88))
    // seeding writes its own ratio as the floor
    assert(BenchPolicy.nextFloor(Some(1.0), None) == Some(1.0))
    assert(BenchPolicy.nextFloor(None, None).isEmpty)
  }

  test("a record-targeted redirect with no floor source refuses rather than poison the fallback (r12 advice)") {
    // the hole: BENCH_SELF.json absent (storedFloor None), the redirect
    // run gated out (wrong-SF ratio ~0.1 → gatedRatio None) — a write
    // would carry drift_median_ratio 0.1 with no record_floor_ratio,
    // and the NEXT run's legacy fallback would read 0.1 as the floor,
    // locking out every legitimate ~0.9 run forever
    assert(!BenchPolicy.redirectWritable(gatedRatio = None,
      storedFloor = None, measuredRatio = Some(0.1)))
    // same shape with a drifted ratio: equally refused
    assert(!BenchPolicy.redirectWritable(None, None, Some(1.4)))
    // ratio-less run (no reference): drift_median_ratio lands as null —
    // floor-neutral, nothing for a fallback to misread — admitted
    assert(BenchPolicy.redirectWritable(None, None, None))
    // a stored floor carries through regardless of this run's verdict
    assert(BenchPolicy.redirectWritable(None, Some(0.864), Some(0.1)))
    // an in-band gated ratio is its own floor source (redirect bootstrap)
    assert(BenchPolicy.redirectWritable(Some(0.95), None, Some(0.95)))
  }

  test("host canary: kernel semantics pinned against an independent model (r15)") {
    // the canary's evidentiary value rests on the kernel computing a
    // FIXED workload — pin it against an out-of-band recomputation
    // (python: x^=(x<<13)&M; x^=x>>7; x^=(x<<17)&M over 64-bit), so a
    // miscompile or a dead-code-eliminated loop is a failure here, not
    // a silently-fast canary
    assert(HostCanary.chain(1000L, 42L) == 2260733264014075113L)
    assert(HostCanary.chain(500L, 7L) == -614539209596869955L)
    // determinism + the degenerate chain
    assert(HostCanary.chain(1000L, 42L) == HostCanary.chain(1000L, 42L))
    assert(HostCanary.chain(0L, 99L) == 99L)
  }

  test("host canary: measure() returns positive walls and feeds the sink (r15)") {
    val before = HostCanary.sink
    val (single, mt) = HostCanary.measure()
    // positive, sane readings (a broken timer or an eliminated loop
    // reads ~0); the upper bound is loose — this spec must pass on a
    // loaded CI host, it pins shape not speed
    assert(single > 0.05 && single < 120.0)
    assert(mt > 0.05 && mt < 240.0)
    // the sink changed: the workload's results are observably consumed,
    // so the JIT cannot legally eliminate the timed loops
    assert(HostCanary.sink != before || HostCanary.sink != 0L)
  }

  test("hostSlowdown carries a verdict only when both readings exist (r15)") {
    assert(BenchPolicy.hostSlowdown(2.1, 2.0).exists(s => math.abs(s - 1.05) < 1e-12))
    assert(BenchPolicy.hostSlowdown(0.0, 2.0).isEmpty)
    assert(BenchPolicy.hostSlowdown(2.0, 0.0).isEmpty)
  }

  test("memo_hits field: sorted, deduped, valid JSON array (r16)") {
    assert(BenchPolicy.memoHitsJson(Nil) == "[]")
    assert(BenchPolicy.memoHitsJson(Seq("q72_canonical_docs")) ==
      """["q72_canonical_docs"]""")
    // sorted + deduped so the artifact is stable across attempt orders
    assert(BenchPolicy.memoHitsJson(
      Seq("q105_classifier_learned", "q72_canonical_docs",
        "q105_classifier_learned")) ==
      """["q105_classifier_learned","q72_canonical_docs"]""")
  }

  test("compact trailing line: parses as JSON and stays under 500 bytes (r16)") {
    // worst plausible shape: several memo hits, a drifted ratio, a long
    // sf path — the whole point is surviving a ~2000-char tail capture
    val line = BenchPolicy.compactLine("123.4567", 106, 2, "1.161", true,
      BenchPolicy.memoHitsJson(Seq("q72_canonical_docs",
        "q105_classifier_learned")),
      "BENCH_LAST.json", "/root/testdata/sf0.1")
    assert(line.length < 500, s"compact line too long: ${line.length}")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(math.abs(node.get("value").asDouble() - 123.4567) < 1e-9)
    assert(node.get("unit").asText() == "sec")
    assert(node.get("n_queries").asInt() == 106)
    assert(node.get("n_errors").asInt() == 2)
    assert(node.get("drift_detected").asBoolean())
    assert(node.get("memo_hits").size() == 2)
    assert(node.get("queries_in").asText() == "BENCH_LAST.json")
    assert(node.get("sf").asText() == "/root/testdata/sf0.1")
    // the full line's queries map is NOT here — that is the contract:
    // this line must fit any tail capture whole
    assert(node.get("queries") == null)
  }
}
