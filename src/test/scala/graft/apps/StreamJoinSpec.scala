package graft.apps

import graft.SparkSpec

/** Stream-stream join gate (r18): the watermarked CASH_OUT ⋈ PAYMENT
  * laundering probe is verified against the batch twin of the same
  * fed rows — every pair the bounded batch join produces must be
  * emitted by the incremental two-state-store streaming join exactly
  * once, none extra — and the suite gates a proportionally smaller
  * run's throughput so structural regressions (state-store retention
  * widening, per-batch re-plan) fail here before the round bench. */
class StreamJoinSpec extends SparkSpec {

  test("stream-stream join equals the batch twin and sustains the " +
      "harness floor") {
    val r = StreamBenchApp.runJoin(spark,
      "/root/testdata/sf0.01", nBatches = 4, batchRows = 2500)
    assert(r.records > 0, "no CASH_OUT/PAYMENT rows fed")
    assert(r.joined > 0,
      "no pairs emitted — the equality gate would be vacuous")
    assert(r.mismatches == 0,
      s"${r.mismatches} pair payloads diverge between the streaming " +
        "join and the batch twin")
    // local[4] spec-harness floor; the bench line enforces the full
    // profile at local[32]
    val floor = 300.0
    assert(r.recordsPerSec >= floor,
      s"stream join throughput regression: " +
        s"${f"${r.recordsPerSec}%.0f"} rec/s < $floor rec/s " +
        s"(${r.records} records, ${r.batches} batches)")
  }
}
