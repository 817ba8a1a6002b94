package graft.apps

import org.apache.spark.sql.SparkSession

import graft.batch.BatchScoring
import graft.core.Sessions
import graft.ml.FraudPipeline
import graft.sources.Sources

/** Batch inference entry point — the reference's
  * `postgres_model_inference.py main` (SURVEY §3.3), pagination-free.
  *
  * Usage:
  *   runMain graft.apps.BatchInferenceApp csv <data.csv> <modelDir> <outDir>
  *   runMain graft.apps.BatchInferenceApp jdbc <url> <table> <modelDir> <outDir>
  */
object BatchInferenceApp {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = Sessions.local("graft-batch-inference")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (input, modelDir, outDir) = args.toList match {
        case "csv" :: path :: model :: out :: Nil =>
          (Sources.csv(spark, path), model, out)
        case "jdbc" :: url :: table :: model :: out :: Nil =>
          // Partition bounds from the table's surrogate id (S4/L2);
          // a production deployment would read bounds via a min/max
          // pushdown query first.
          (Sources.jdbcPartitioned(spark, url, table,
            partitionColumn = "id", lowerBound = 0L,
            upperBound = 1000000L, numPartitions = 32), model, out)
        case _ =>
          sys.error("usage: csv <data.csv> <modelDir> <outDir> | " +
            "jdbc <url> <table> <modelDir> <outDir>")
      }
      val model = FraudPipeline.load(modelDir)
      val stats = BatchScoring.run(input, model,
        s"$outDir/fraud_hits", s"$outDir/inference_stats.json")
      println(s"[batch-inference] ${stats.json}")
    } finally spark.stop()
  }
}
