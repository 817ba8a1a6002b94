package graft.batch

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ml.FraudPipeline
import graft.sources.Sinks

/** The reference's Postgres batch-scoring flow (SURVEY §3.3,
  * postgres_model_inference.py:224-348) collapsed to a single
  * distributed plan.
  *
  * The reference pages through the table with OFFSET/LIMIT into
  * pandas, converts each page to a Spark frame, scores, counts,
  * collects fraud rows back to pandas and appends CSV — every page
  * crosses the driver twice. Here: one partitioned scan → one
  * transform → one filtered distributed write; the only driver-side
  * bytes are the stats JSON.
  *
  * The input frame is source-agnostic: feed it
  * `Sources.jdbcPartitioned(...)` in production or any
  * Transaction-shaped frame in tests.
  */
object BatchScoring {

  final case class InferenceStats(
      totalRecords: Long, fraudDetected: Long, elapsedSec: Double) {
    /** postgres_model_inference.py:350-368 stats shape. */
    def json: String =
      s"""{"total_records":$totalRecords,""" +
        s""""fraud_detected":$fraudDetected,""" +
        s""""fraud_percentage":${
          if (totalRecords > 0) fraudDetected.toDouble / totalRecords * 100
          else 0.0},""" +
        s""""total_time_seconds":$elapsedSec}"""
  }

  /** Score → append fraud hits as CSV (S8) → stats JSON (S11). */
  def run(
      input: DataFrame,
      model: PipelineModel,
      fraudCsvDir: String,
      statsPath: String): InferenceStats = {
    val t0 = System.nanoTime()
    val scored = FraudPipeline.predict(model, input).persist()
    try {
      val total = scored.count()
      val fraud = scored.filter(col("fraud_prediction") === 1)
        .select((input.columns.map(col) :+ col("fraud_probability"))
          .toIndexedSeq: _*)
      val nFraud = fraud.count()
      if (nFraud > 0) Sinks.csvAppend(fraud, fraudCsvDir)
      val stats = InferenceStats(total, nFraud,
        (System.nanoTime() - t0) / 1e9)
      Sinks.metricsJson(stats.json, statsPath)
      stats
    } finally scored.unpersist()
  }
}
