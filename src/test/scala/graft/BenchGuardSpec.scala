package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins BOTH directions of every Bench spike-guard path (r13 verdict
  * #4): the ml04 iter-median guard (r12 verdict #3) demonstrably
  * suppressed a spurious retry in the r13 driver bench, but only the
  * suppression direction had live evidence — a real per-iteration
  * regression tripping, the telemetry-missing fallback (r13 ADVICE
  * #1), the telemetry keying, and the :cold memo-pin exemption (r13
  * verdict #3) are all asserted here instead of waiting for a live
  * event. [[Bench.spikeDecision]] is pure, so these are plain unit
  * cases. */
class BenchGuardSpec extends AnyFunSuite {
  private val ml04 = "ml04_lda_em_train"
  private val ml04Pins = Map(ml04 -> 29.0, s"$ml04:iter_median" -> 0.618)

  test("ml04 wall spread does not trip while the iteration median is healthy") {
    // the r13 driver artifact's exact shape: 82.4 s wall (2.8x the wall
    // pin) from 4 GC-stall outlier iterations around a 1.21x median
    assert(!Bench.spikeDecision(ml04, 82.4, 1, ml04Pins,
      Some(Seq.fill(46)(0.748) ++ Seq(22.9, 7.5, 5.8, 2.7))))
  }

  test("a real 1.5x per-iteration regression still trips") {
    assert(Bench.spikeDecision(ml04, 50.0, 1, ml04Pins,
      Some(Seq.fill(50)(1.2))))
  }

  test("missing iteration telemetry falls back to the wall pin, not immunity") {
    // r13 ADVICE #1: a broken reflective accessor returning None must
    // not silently disable ALL spike protection for ml04
    assert(Bench.spikeDecision(ml04, 82.4, 1, ml04Pins, None))
    assert(!Bench.spikeDecision(ml04, 30.0, 1, ml04Pins, None))
  }

  test("an iter_median pin on another query never reads ml04's telemetry") {
    // r13 ADVICE #1: the telemetry is keyed — a future query pinned on
    // iter_times must not be judged against ml04's iteration times
    val pins = Map("other_q" -> 1.0, "other_q:iter_median" -> 0.5)
    assert(Bench.spikeDecision("other_q", 10.0, 1, pins,
      Some(Seq.fill(50)(0.5))))
  }

  test(":cold pin exempts a memoized query's first run only") {
    // r13 verdict #3: dd16/ss15/mm07 pin memo-warm minima, so a fresh
    // JVM's cold first sample tripped the guard by construction
    val pins = Map("dd16_incremental_band_index" -> 0.45,
      "dd16_incremental_band_index:cold" -> 3.0)
    // the observed cold first run: under the cold pin, no retry
    assert(!Bench.spikeDecision("dd16_incremental_band_index", 2.9, 1, pins, None))
    // the same time on a WARM sample (runs 2) is a real regression
    assert(Bench.spikeDecision("dd16_incremental_band_index", 2.9, 2, pins, None))
    // a genuinely spiked cold run still trips past the cold pin
    assert(Bench.spikeDecision("dd16_incremental_band_index", 5.0, 1, pins, None))
  }

  test("without a :cold pin the universal wall rule is unchanged") {
    val pins = Map("q01_pricing_summary" -> 1.0)
    assert(Bench.spikeDecision("q01_pricing_summary", 1.7, 1, pins, None))
    assert(!Bench.spikeDecision("q01_pricing_summary", 1.4, 1, pins, None))
    // unpinned queries never trip (universal pinning is the generator's
    // declared-coverage gate's job, not the runtime's)
    assert(!Bench.spikeDecision("unpinned", 99.0, 1, Map.empty, None))
  }
}
