package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {

  test("as-of semantics: latest right row at-or-before each left row") {
    import spark.implicits._
    val trades = Seq( // (key, t, trade_id)
      ("A", 10L, 1L), ("A", 20L, 2L), ("A", 30L, 3L),
      ("B", 15L, 4L)
    ).toDF("k", "t", "trade_id")
    val quotes = Seq( // (key, t, px)
      ("A", 5L, 100.0), ("A", 20L, 105.0), ("A", 25L, 110.0),
      ("B", 99L, 999.0) // after B's trade — must not match
    ).toDF("k", "t", "px")

    val out = AsofJoin.asof(trades, quotes,
      keyCol = "k", leftTimeCol = "t", rightTimeCol = "t",
      rightPayload = Seq("px"))
      .select("trade_id", "asof_px")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    assert(out(1L) == Some(100.0)) // t=10 → quote at 5
    assert(out(2L) == Some(105.0)) // t=20 → quote AT 20 (>= tie)
    assert(out(3L) == Some(110.0)) // t=30 → quote at 25
    assert(out(4L) == None) // B has no preceding quote
  }

  test("plan is one shuffle + window, not a nested-loop join") {
    val plan = AsofJoin.asofPurchaseClick(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not theta-join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Window"))
  }

  test("every matched click precedes or equals its purchase") {
    val events = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"))
    val joined = AsofJoin.asofPurchaseClick(spark, sfDir)
      .join(events.withColumnRenamed("ts", "p_ts"), "event_id")
      .join(events.select(col("event_id").as("asof_click_id"),
        col("ts").as("c_ts")), "asof_click_id")
    assert(joined.filter(col("c_ts") > col("p_ts")).count() == 0)
  }
}
