package graft.apps

import graft.core.Sessions
import graft.sources.Sources
import graft.streaming.ScoringStream

/** Debug topic tap — the reference's `transaction_consumer.py`
  * (plain consumer printing each message): Kafka → parse → console.
  * Needs the kafka connector + broker at runtime.
  *
  * Usage: runMain graft.apps.TopicTapApp <bootstrap> <topic>
  */
object TopicTapApp {
  def main(args: Array[String]): Unit = {
    val Array(bootstrap, topic) = args.take(2)
    val spark = Sessions.local("graft-topic-tap")
    spark.sparkContext.setLogLevel("WARN")
    val tagged = ScoringStream.parseTagged(
      Sources.kafkaStream(spark, bootstrap, topic).load())
    val query = ScoringStream.validRows(tagged)
      .writeStream.format("console")
      .option("truncate", "false")
      .start()
    ScoringStream.stopOnShutdown(query)
    query.awaitTermination()
  }
}
