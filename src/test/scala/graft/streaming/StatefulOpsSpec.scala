package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.schema.Transaction

class StatefulOpsSpec extends SparkSpec {

  private def txn(step: Int, orig: String, oldBal: Double,
      newBal: Double, fraud: Int = 0): Transaction =
    Transaction(step, "TRANSFER", oldBal - newBal, orig, oldBal, newBal,
      "C999", 0.0, 0.0, fraud, 0)

  test("running balance accumulates per account across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val updates = StatefulOps.runningBalance(input.toDS())
    val q = updates.writeStream.format("memory")
      .queryName("balance_sink").outputMode(OutputMode.Update()).start()
    try {
      input.addData(txn(1, "A", 100.0, 60.0), txn(1, "B", 50.0, 50.0))
      q.processAllAvailable()
      input.addData(txn(2, "A", 60.0, 10.0))
      q.processAllAvailable()
      // Last update per account reflects the accumulated state.
      val last = spark.table("balance_sink")
        .groupBy("account")
        .agg(max(struct(col("txnCount"), col("netFlow"))).as("s"))
        .select(col("account"), col("s.txnCount"), col("s.netFlow"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      assert(last("A") == ((2L, -90.0))) // -40 then -50
      assert(last("B") == ((1L, 0.0)))
    } finally q.stop()
  }

  test("windowed type counts aggregate by event-time hour") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val windowed = StatefulOps.windowedTypeCounts(input.toDF())
    val q = windowed.writeStream.format("memory")
      .queryName("window_sink").outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        txn(1, "A", 100.0, 50.0, fraud = 1),
        txn(1, "B", 10.0, 5.0),
        txn(2, "C", 30.0, 30.0))
      q.processAllAvailable()
      val rows = spark.table("window_sink")
        .select(col("window.start").cast("string").as("w"),
          col("n_txns"), col("n_fraud"))
        .collect()
      val byWindow = rows.map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(byWindow("2024-01-01 01:00:00") == ((2L, 1L)))
      assert(byWindow("2024-01-01 02:00:00") == ((1L, 0L)))
    } finally q.stop()
  }

  test("stream-stream join pairs events within the time bound only") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val purchases = MemoryStream[(Long, java.sql.Timestamp, String)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp, String)]
    def ts(minute: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    val l = purchases.toDF().toDF("user_id", "eventTime", "p_id")
    val r = clicks.toDF().toDF("user_id", "eventTime", "c_id")
    val joined = StatefulOps.streamStreamJoin(l, r, "user_id")
      .select(col("p_id"), col("r_c_id"))
    val q = joined.writeStream.format("memory")
      .queryName("ss_join_sink").start()
    try {
      clicks.addData((1L, ts(0), "c_early"), (1L, ts(30), "c_in"),
        (2L, ts(45), "c_other_user"))
      purchases.addData((1L, ts(50), "p1"))
      q.processAllAvailable()
      val got = spark.table("ss_join_sink").collect()
        .map(rr => (rr.getString(0), rr.getString(1))).toSet
      // c_in (20 min before) joins; c_early (50 min before) also
      // within the 1h bound; user 2's click must not.
      assert(got == Set(("p1", "c_early"), ("p1", "c_in")))
    } finally q.stop()
  }

  test("windowed aggregation works identically on the batch table") {
    val parsed = graft.ml.Transactions.fromEvents(spark, sfDir)
    val agg = StatefulOps.windowedTypeCounts(parsed)
    assert(!agg.isStreaming)
    val total = agg.agg(sum(col("n_txns"))).head().getLong(0)
    assert(total == parsed.count())
  }

  test("session windows: gap splits sessions, watermark emits closed ones") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val sessions = StatefulOps.sessionWindowCounts(input.toDF())
    val q = sessions.writeStream.format("memory")
      .queryName("session_sink").outputMode(OutputMode.Append()).start()
    try {
      // A: steps 1,2 (one session — within the 2h gap) then step 10
      // (a second session); B: step 1 only.
      input.addData(
        txn(1, "A", 100.0, 60.0), txn(2, "A", 60.0, 30.0),
        txn(10, "A", 30.0, 10.0), txn(1, "B", 50.0, 50.0))
      q.processAllAvailable()
      // push the watermark (maxEvent - 4h) far past every session's
      // end; two batches because the watermark is computed from the
      // PREVIOUS batch's max event time
      input.addData(txn(40, "C", 1.0, 1.0))
      q.processAllAvailable()
      input.addData(txn(41, "C", 1.0, 1.0))
      q.processAllAvailable()
      val rows = spark.table("session_sink")
        .select(col("nameOrig"), col("n_txns")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val aSessions = rows.filter(_._1 == "A").map(_._2).sorted.toSeq
      assert(aSessions == Seq(1L, 2L),
        s"A must emit two closed sessions (2 txns, then 1): " +
          s"${rows.mkString(",")}")
      assert(rows.count(_._1 == "B") == 1 &&
        rows.find(_._1 == "B").get._2 == 1L)
      // C's session is still open (watermark has not passed it)
      assert(!rows.exists(_._1 == "C"))
    } finally q.stop()
  }

  test("dedup-within-watermark drops replayed transactions across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Transaction]
    val deduped = StatefulOps.dedupWithinWatermark(input.toDF())
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_sink").outputMode(OutputMode.Append()).start()
    try {
      val a = txn(1, "A", 100.0, 60.0)
      val b = txn(1, "B", 50.0, 50.0)
      // duplicate within the same batch AND replayed in the next one
      input.addData(a, a, b)
      q.processAllAvailable()
      input.addData(a, txn(2, "A", 60.0, 10.0))
      q.processAllAvailable()
      val names = spark.table("dedup_sink")
        .select(col("step"), col("nameOrig")).collect()
        .map(r => (r.getInt(0), r.getString(1)))
      assert(names.length == 3, s"got ${names.mkString(",")}")
      assert(names.toSet ==
        Set((1, "A"), (1, "B"), (2, "A")))
    } finally q.stop()
  }
}
