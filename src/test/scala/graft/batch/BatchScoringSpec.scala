package graft.batch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ml.{FraudPipeline, Transactions}

class BatchScoringSpec extends SparkSpec {

  test("batch scoring writes fraud hits + stats JSON (S8/S11)") {
    val txns = Transactions.fromEvents(spark, sfDir).cache()
    val model = FraudPipeline.train(txns)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_batch").toString

    val stats = BatchScoring.run(txns, model,
      s"$tmp/fraud_hits", s"$tmp/inference_stats.json")

    assert(stats.totalRecords == txns.count())
    val expectedFraud = FraudPipeline.predict(model, txns)
      .filter(col("fraud_prediction") === 1).count()
    assert(stats.fraudDetected == expectedFraud)

    // Stats JSON in the reference's shape.
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$tmp/inference_stats.json"))
    assert(json.contains("\"total_records\""))
    assert(json.contains("\"fraud_percentage\""))

    // Fraud CSV exists with the original columns + probability iff
    // any fraud was detected.
    if (expectedFraud > 0) {
      val written = spark.read.option("header", "true")
        .csv(s"$tmp/fraud_hits")
      assert(written.count() == expectedFraud)
      assert(written.columns.contains("fraud_probability"))
      assert(written.columns.contains("amount"))
    }
  }
}
