package graft.apps

import org.apache.spark.sql.SparkSession

import graft.core.Sessions
import graft.ml.FraudPipeline
import graft.sources.{Sinks, Sources}
import graft.streaming.ScoringStream

/** Streaming scoring entry point — the reference's
  * `spark_streaming_app.py main` (SURVEY §3.1): Kafka →
  * parse → score → distributed Kafka alerts + stats JSON.
  *
  * Requires the spark-sql-kafka connector on the classpath and a
  * reachable broker (integration deployment; not runnable in the
  * zero-egress build environment — the same graph is exercised on
  * MemoryStream in ScoringStreamSpec).
  *
  * Usage: runMain graft.apps.StreamApp <bootstrap> <inTopic>
  *          <alertTopic> <modelDir> <checkpointDir> [statsPath]
  */
object StreamApp {
  def main(args: Array[String]): Unit = {
    val Array(bootstrap, inTopic, alertTopic, modelDir, checkpointDir) =
      args.take(5)
    val statsPath = args.lift(5).getOrElse("streaming_stats.json")
    val spark: SparkSession = Sessions.local("graft-stream")
    spark.sparkContext.setLogLevel("WARN")
    val model = FraudPipeline.load(modelDir)
    val parsed = ScoringStream.parse(
      Sources.kafkaStream(spark, bootstrap, inTopic).load())
    val stats = new ScoringStream.StatsAccumulator
    val query = ScoringStream.start(parsed, model, checkpointDir,
      alertDf => Sinks.kafka(alertDf, bootstrap, alertTopic),
      stats)
    ScoringStream.stopOnShutdown(query) // T5
    sys.addShutdownHook(stats.writeJson(statsPath))
    query.awaitTermination()
  }
}
