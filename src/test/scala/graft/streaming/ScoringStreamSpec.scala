package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ml.{FraudPipeline, Transactions}
import graft.schema.Transaction

class ScoringStreamSpec extends SparkSpec {

  private lazy val txns = Transactions.fromEvents(spark, sfDir).cache()
  private lazy val model = FraudPipeline.train(txns)

  /** JSON wire rows as the producer would emit them (P10). */
  private def wireJson(limit: Int): Seq[String] =
    txns.limit(limit)
      .select(to_json(struct(col("*"))).as("v"))
      .collect().map(_.getString(0)).toSeq

  test("parse round-trips the JSON wire format to Transaction shape") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val parsed = ScoringStream.parse(
      input.toDF().withColumnRenamed("value", "raw")
        .select(col("raw").cast("binary").as("value")))
    assert(parsed.schema == Transaction.schema)

    val q = parsed.writeStream.format("memory").queryName("parsed_sink")
      .start()
    try {
      input.addData(wireJson(20))
      q.processAllAvailable()
      val got = spark.table("parsed_sink")
      assert(got.count() == 20)
      // Values survive the round trip (compare a stable projection).
      val a = got.select("type", "amount", "isFraud")
        .collect().map(_.toSeq).toSet
      val b = txns.limit(20).select("type", "amount", "isFraud")
        .collect().map(_.toSeq).toSet
      assert(a == b)
    } finally q.stop()
  }

  test("scoring graph emits alerts for fraud rows and tracks stats") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val parsed = ScoringStream.parse(
      input.toDF().select(col("value").cast("binary").as("value")))
    val stats = new ScoringStream.StatsAccumulator
    val collected = scala.collection.mutable.ArrayBuffer.empty[String]
    val checkpoint = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString

    val q = ScoringStream.start(parsed, model, checkpoint,
      alertDf => collected.synchronized {
        collected ++= alertDf.collect().map(_.getString(0))
      },
      stats)
    try {
      val rows = wireJson(200)
      input.addData(rows)
      q.processAllAvailable()
      input.addData(rows.take(50))
      q.processAllAvailable()

      assert(stats.totalBatches == 2)
      assert(stats.totalRecords == 250)
      // Alerts are JSON rows containing the model's outputs.
      val expectedFraud = FraudPipeline.predict(model, txns.limit(200))
        .filter(col("fraud_prediction") === 1).count()
      if (expectedFraud > 0) {
        assert(collected.nonEmpty)
        assert(collected.forall(_.contains("\"prediction\":1.0")))
      }
      assert(stats.totalFraud ==
        collected.size) // one alert per fraud row
      // Stats JSON has the reference's shape.
      val json = stats.json
      assert(json.contains("\"total_batches\":2"))
      assert(json.contains("\"avg_batch_size\":125.0"))
      assert(json.contains("\"fraud_percentage\""))
      // T2: checkpoint directory was written.
      assert(new java.io.File(checkpoint, "offsets").list().nonEmpty)
    } finally q.stop()
  }

  test("malformed payloads route to the dead-letter path, not nulls") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val tagged = ScoringStream.parseTagged(
      input.toDF().select(col("value").cast("binary").as("value")))
    val goodQ = ScoringStream.validRows(tagged)
      .writeStream.format("memory").queryName("dlq_good").start()
    val badQ = ScoringStream.corruptRows(tagged)
      .writeStream.format("memory").queryName("dlq_bad").start()
    try {
      input.addData(wireJson(5) ++ Seq("{not json at all", "42"))
      goodQ.processAllAvailable()
      badQ.processAllAvailable()
      assert(spark.table("dlq_good").count() == 5)
      val bad = spark.table("dlq_bad").collect()
        .map(_.getString(0)).toSet
      assert(bad == Set("{not json at all", "42"))
    } finally { goodQ.stop(); badQ.stop() }
  }

  test("empty batches are guarded (T3): no stats recorded") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val parsed = ScoringStream.parse(
      input.toDF().select(col("value").cast("binary").as("value")))
    val stats = new ScoringStream.StatsAccumulator
    val checkpoint = java.nio.file.Files
      .createTempDirectory("graft_ckpt_empty").toString
    val q = ScoringStream.start(parsed, model, checkpoint,
      _ => fail("no alerts expected"), stats)
    try {
      q.processAllAvailable()
      assert(stats.totalBatches == 0)
      assert(stats.totalRecords == 0)
    } finally q.stop()
  }

  test("rate replay (T6) streams fixture rows") {
    val fixture = txns.limit(10)
    val replay = ScoringStream.rateReplay(spark, fixture,
      rowsPerSecond = 100)
    assert(replay.isStreaming)
    val q = replay.writeStream.format("memory").queryName("replay_sink")
      .start()
    try {
      // Let a few rate ticks arrive.
      val deadline = System.currentTimeMillis() + 15000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        q.processAllAvailable()
        n = spark.table("replay_sink").count()
      }
      assert(n > 0, "replay produced no rows in 15s")
      val replayed = spark.table("replay_sink")
        .select("nameOrig").distinct().collect().map(_.getString(0)).toSet
      val source = fixture.select("nameOrig").distinct()
        .collect().map(_.getString(0)).toSet
      assert(replayed.subsetOf(source))
    } finally q.stop()
  }

  test("graceful shutdown (T5) stops an active query, no-op when stopped") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val parsed = ScoringStream.parse(
      input.toDF().select(col("value").cast("binary").as("value")))
    val q = parsed.writeStream.format("memory").queryName("t5_sink")
      .start()
    assert(q.isActive)
    ScoringStream.stopGracefully(q)
    assert(!q.isActive)
    // idempotent on an already-terminated query
    ScoringStream.stopGracefully(q)
    assert(!q.isActive)
  }
}
