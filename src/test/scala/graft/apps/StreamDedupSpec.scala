package graft.apps

import graft.SparkSpec

/** Streaming-dedup gate (VERDICT r16 task #7): the watermark-bounded
  * `dropDuplicatesWithinWatermark` path is verified against the batch
  * distinct-key twin of the same fed multiset — planted re-deliveries
  * across micro-batches must be dropped, every distinct content key
  * must be emitted exactly once — and the suite gates a
  * proportionally smaller run's throughput so structural regressions
  * (state-store rewrite amplification, per-batch re-plan) fail here
  * long before the round bench runs at local[32]/sf0.1.
  */
class StreamDedupSpec extends SparkSpec {

  test("streaming dedup drops planted re-deliveries, emits each key " +
      "once, and sustains the harness floor") {
    val r = StreamBenchApp.runDedup(spark,
      "/root/testdata/sf0.01", nBatches = 4, batchRows = 2500)
    // 10k clean rows + 3 batches × 200 re-delivered tails
    assert(r.records == 10600L, s"expected 10.6k fed, got ${r.records}")
    assert(r.dupsFed >= 600L,
      s"only ${r.dupsFed} duplicates fed — the gate would be vacuous")
    assert(r.uniques > 0 && r.uniques < r.records)
    assert(r.mismatches == 0,
      s"${r.mismatches} keys diverge between the streaming dedup " +
        "path and the batch distinct-key twin")
    // local[4] spec-harness floor; the bench line enforces the full
    // profile at local[32]
    val floor = 1000.0
    assert(r.recordsPerSec >= floor,
      s"dedup throughput regression: " +
        s"${f"${r.recordsPerSec}%.0f"} rec/s < $floor rec/s " +
        s"(${r.records} records, ${r.batches} batches)")
  }
}
