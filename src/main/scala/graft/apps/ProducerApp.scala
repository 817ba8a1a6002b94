package graft.apps

import graft.core.Sessions
import graft.sources.Sources
import graft.streaming.ScoringStream
import org.apache.spark.sql.functions._

/** Rate-limited transaction replayer — the reference's
  * `transaction_producer.py` (pandas iterrows + sleep + per-row
  * send, 1 msg/s default) as a streaming job: fixture CSV → rate
  * replay → to_json → Kafka. Needs the kafka connector + broker at
  * runtime.
  *
  * Usage: runMain graft.apps.ProducerApp <fixture.csv> <bootstrap>
  *          <topic> [rowsPerSecond]
  */
object ProducerApp {
  def main(args: Array[String]): Unit = {
    val Array(fixturePath, bootstrap, topic) = args.take(3)
    val rps = args.lift(3).flatMap(_.toIntOption).getOrElse(1)
    val spark = Sessions.local("graft-producer")
    spark.sparkContext.setLogLevel("WARN")
    val fixture = Sources.csv(spark, fixturePath)
    val wire = ScoringStream.rateReplay(spark, fixture, rps)
      .select(to_json(struct(col("*"))).as("value"))
    val query = wire.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_producer_ckpt")
          .toString)
      .start()
    ScoringStream.stopOnShutdown(query)
    query.awaitTermination()
  }
}
