package graft.apps

import graft.SparkSpec

/** Session-window streaming gate (VERDICT r15 task #5): the native
  * session_window path is verified against an INDEPENDENT batch
  * lag/cumsum recompute of the same corpus — the streaming state
  * machine's merge/evict behavior across micro-batches must equal
  * the one-shot batch answer — and the suite gates a proportionally
  * smaller run's throughput so structural regressions (state-store
  * rewrite, per-batch re-plan) fail here long before the round
  * bench runs at local[32]/sf0.1.
  */
class StreamSessionizeSpec extends SparkSpec {

  test("streaming session windows equal the batch lag/cumsum twin " +
      "and sustain the harness floor") {
    val r = StreamBenchApp.runSessionize(spark,
      "/root/testdata/sf0.01", nBatches = 4, batchRows = 2500)
    assert(r.records == 10000L, s"expected 10k records, got ${r.records}")
    assert(r.sessions > 0, "no sessions were emitted")
    assert(r.mismatches == 0,
      s"${r.mismatches} sessions diverge between the streaming " +
        "session_window path and the batch lag/cumsum recompute")
    // local[4] spec-harness floor; the bench line enforces the full
    // profile at local[32]
    val floor = 1000.0
    assert(r.recordsPerSec >= floor,
      s"sessionize throughput regression: " +
        s"${f"${r.recordsPerSec}%.0f"} rec/s < $floor rec/s " +
        s"(${r.records} records, ${r.batches} batches)")
  }
}
