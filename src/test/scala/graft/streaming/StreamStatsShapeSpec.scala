package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Pins the streaming_stats.json surface to the reference's shape
  * (spark_streaming_app.py:169-176 cumulative keys, 219-226 derived
  * keys, 375-381 latest_batch keys). Validates both the live
  * StatsAccumulator output and the checked-in bench artifact, so the
  * artifact can't drift from the code that claims to produce it. */
class StreamStatsShapeSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** Reference key set minus current_resources (psutil sampling — not
    * engine state; omission documented in StatsAccumulator.json). */
  private val topKeys = Set(
    "start_time", "total_batches", "total_records",
    "total_fraud_detected", "total_processing_time_ms", "last_update",
    "avg_batch_size", "avg_processing_time_ms", "fraud_percentage",
    "latest_batch")

  private val batchKeys = Set(
    "batch_id", "timestamp", "records", "fraud_detected",
    "processing_time_ms", "empty_batch")

  private def keySet(node: com.fasterxml.jackson.databind.JsonNode): Set[String] = {
    val it = node.fieldNames()
    val b = Set.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  test("StatsAccumulator.json carries the reference key set") {
    val stats = new ScoringStream.StatsAccumulator
    stats.record(batchId = 0, n = 100, nFraud = 3, ms = 42)
    stats.record(batchId = 1, n = 50, nFraud = 0, ms = 17)
    val node = mapper.readTree(stats.json)
    assert(keySet(node) == topKeys)
    assert(keySet(node.get("latest_batch")) == batchKeys)
    assert(node.get("total_batches").asLong == 2)
    assert(node.get("total_records").asLong == 150)
    assert(node.get("total_fraud_detected").asLong == 3)
    assert(node.get("total_processing_time_ms").asLong == 59)
    assert(node.get("avg_batch_size").asDouble == 75.0)
    assert(math.abs(node.get("fraud_percentage").asDouble - 2.0) < 1e-9)
    assert(node.get("latest_batch").get("batch_id").asLong == 1)
    assert(!node.get("latest_batch").get("empty_batch").asBoolean)
  }

  test("before any batch, latest_batch is null and averages are zero") {
    val node = mapper.readTree(new ScoringStream.StatsAccumulator().json)
    assert(keySet(node) == topKeys)
    assert(node.get("latest_batch").isNull)
    assert(node.get("fraud_percentage").asDouble == 0.0)
  }

  test("the checked-in bench artifact matches the shape") {
    val path = java.nio.file.Paths.get("artifacts/streaming_stats.json")
    assume(java.nio.file.Files.exists(path),
      "artifact not generated yet (runMain graft.apps.StreamBenchApp)")
    val node = mapper.readTree(java.nio.file.Files.readString(path))
    assert(keySet(node) == topKeys)
    assert(node.get("total_batches").asLong > 0)
    assert(node.get("total_records").asLong > 0)
    assert(keySet(node.get("latest_batch")) == batchKeys)
  }
}
