package graft.apps

import graft.SparkSpec

/** Streaming-throughput regression gate (VERDICT r13 task #7): the
  * scoring graph's records/s is a standing bench line
  * (`stream_throughput`, floor [[StreamBenchApp.ThroughputFloorRecSec]]
  * at local[32]/sf0.1); this spec gates a proportionally smaller run
  * in the test harness (local[4], sf0.001) so a structural
  * regression — per-batch lineage re-execution, a driver-side
  * collect in the hot path, per-batch re-planning — fails the suite
  * long before the round bench runs. The spec floor is deliberately
  * conservative: the gated failure modes each cost multiples, not
  * percents.
  */
class StreamThroughputSpec extends SparkSpec {

  test("scoring graph sustains a floor throughput in the test " +
      "harness (regression gate)") {
    // sf0.01 events = 10k rows → 4 full 2500-row micro-batches;
    // batches this size amortize the fixed per-batch cost enough
    // that the number measures the graph, not the scheduler
    val (stats, alertRows) = StreamBenchApp.run(spark,
      "/root/testdata/sf0.01", nBatches = 4, batchRows = 2500)
    assert(stats.totalBatches >= 4,
      s"expected >= 4 micro-batches, got ${stats.totalBatches}")
    assert(stats.totalRecords > 0, "no records flowed")
    val rps = stats.totalRecords.toDouble * 1000.0 /
      math.max(1L, stats.totalProcessingMs)
    // local[4] spec-harness floor; the bench line enforces the full
    // 8,000 rec/s profile at local[32]
    val floor = 1000.0
    assert(rps >= floor,
      s"throughput regression: ${f"$rps%.0f"} rec/s < $floor rec/s " +
        s"(${stats.totalRecords} records, " +
        s"${stats.totalProcessingMs} ms, $alertRows alerts)")
    // internal consistency, same checks the r13 verdict ran by hand
    assert(stats.totalFraud <= stats.totalRecords)
    assert(alertRows == stats.totalFraud,
      s"alert sink received $alertRows rows but the stats counted " +
        s"${stats.totalFraud} fraud records — the distributed alert " +
        "path diverged from the stats path")
  }
}
