package graft.apps

import org.apache.spark.sql.SparkSession

import graft.core.Sessions
import graft.ml.FraudPipeline
import graft.sources.{Sinks, Sources}

/** Batch training entry point — the reference's
  * `fraud_detection_model.py __main__` flow (SURVEY §3.2):
  * load CSV → split (seed 42) → export test split → train →
  * evaluate → persist model + metrics.
  *
  * Usage: runMain graft.apps.TrainApp <data.csv> <outputDir>
  */
object TrainApp {
  def main(args: Array[String]): Unit = {
    val dataPath = args.headOption.getOrElse("data/t2.csv")
    val outDir = args.drop(1).headOption.getOrElse("ml_output")
    val spark: SparkSession = Sessions.local("graft-train")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = Sources.csv(spark, dataPath)
      val (train, test) = FraudPipeline.split(df)
      // Test split export for replay (fraud_detection_model.py:91-94).
      Sinks.csvOverwrite(test, s"$outDir/test_data", singleFile = true)
      val t0 = System.nanoTime()
      val model = FraudPipeline.train(train)
      val trainSec = (System.nanoTime() - t0) / 1e9
      val metrics = FraudPipeline.evaluate(model, test)
      FraudPipeline.save(model, s"$outDir/fraud_detection_model")
      Sinks.metricsJson(FraudPipeline.metricsJson(metrics),
        s"$outDir/model_metrics.json")
      println(f"[train] completed in $trainSec%.1f s: " +
        FraudPipeline.metricsJson(metrics))
    } finally spark.stop()
  }
}
