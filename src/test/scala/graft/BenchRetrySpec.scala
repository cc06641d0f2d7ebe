package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention self-diagnosis must be testable WITHOUT a
  * contended host: these pin the pure predicates and the bounded-retry
  * merge by injecting the r6 incident's measured numbers. */
class BenchRetrySpec extends AnyFunSuite {

  test("dedupContended: r6 starved window triggers, clean windows do not") {
    // r6 driver artifact: decode 8.2 MB/s; warmed page-cache reads on
    // this host run in the GB/s band — far under the 2.5% floor
    assert(Bench.dedupContended(8.2, 2000.0))
    // clean runs: decode 210-234 MB/s (CPU-bound at ~10% of warm rate)
    assert(!Bench.dedupContended(210.0, 2000.0))
    // even an unusually fast warm read must not flag a clean decode
    assert(!Bench.dedupContended(210.0, 8000.0))
    // missing measurements never trigger a retry
    assert(!Bench.dedupContended(-1.0, 2000.0))
    assert(!Bench.dedupContended(210.0, -1.0))
  }

  test("headlineContended: probe drift >1.5x across the bracket triggers") {
    assert(Bench.headlineContended(Seq(1.0, 1.8)))
    assert(Bench.headlineContended(Seq(2.4, 1.0)))
    assert(!Bench.headlineContended(Seq(1.0, 1.4)))
    // sentinel probes (failed measurement) are ignored, not compared
    assert(!Bench.headlineContended(Seq(-1.0, 1.8)))
    assert(!Bench.headlineContended(Seq(1.0)))
  }

  test("minWithRetry: slow contended reps fund exactly one extra rep") {
    var extraRuns = 0
    // both injected reps starved (dedup 72s-class); the extra rep is clean
    val (best, retried) = Bench.minWithRetry[Double](
      Seq(72.24, 74.0), identity, _ > 50.0, () => { extraRuns += 1; 7.6 })
    assert(retried && best == 7.6 && extraRuns == 1)
  }

  test("minWithRetry: clean reps never pay a retry") {
    var extraRuns = 0
    val (best, retried) = Bench.minWithRetry[Double](
      Seq(7.6, 8.9), identity, _ > 50.0, () => { extraRuns += 1; 0.0 })
    assert(!retried && best == 7.6 && extraRuns == 0)
  }

  test("minWithRetry: a still-contended retry ships the best effort, bounded") {
    var extraRuns = 0
    // the retry ALSO lands slow: best-effort min ships; no second retry
    val (best, retried) = Bench.minWithRetry[Double](
      Seq(72.24, 74.0), identity, _ > 50.0, () => { extraRuns += 1; 68.0 })
    assert(retried && best == 68.0 && extraRuns == 1)
  }
}
