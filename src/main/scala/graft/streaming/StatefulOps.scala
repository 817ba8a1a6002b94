package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.schema.Transaction

/** Stateful streaming operators — the SURVEY §7.4 extension surface
  * the reference does not have (its only cross-batch state is
  * driver-side Python dicts, spark_streaming_app.py:169-177):
  * per-account running state via flatMapGroupsWithState and
  * watermarked event-time windows over the `step` clock.
  *
  * Scale posture: state is keyed by account and lives in the state
  * store (RocksDB-backed on a real cluster), partitioned by
  * hash(key) — no driver-side accumulation; watermarks bound state
  * growth for the windowed aggregates.
  */
object StatefulOps {

  final case class AccountState(txnCount: Long, netFlow: Double)

  final case class AccountUpdate(
      account: String, txnCount: Long, netFlow: Double)

  /** Per-origin-account running transaction count + net balance flow
    * (newbalanceOrig - oldbalanceOrg accumulated). Works on both
    * streaming and batch Datasets (flatMapGroupsWithState requires
    * streaming; batch callers get the same semantics via groupBy). */
  def runningBalance(
      parsed: Dataset[Transaction]): Dataset[AccountUpdate] = {
    import parsed.sparkSession.implicits._
    parsed
      .groupByKey(_.nameOrig)
      .flatMapGroupsWithState[AccountState, AccountUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Transaction],
            state: GroupState[AccountState]) =>
          val prev = state.getOption.getOrElse(AccountState(0L, 0.0))
          var cnt = prev.txnCount
          var net = prev.netFlow
          rows.foreach { t =>
            cnt += 1
            net += t.newbalanceOrig - t.oldbalanceOrg
          }
          state.update(AccountState(cnt, net))
          Iterator(AccountUpdate(key, cnt, net))
      }
  }

  /** Event time for the PaySim `step` clock (1 step = 1 hour,
    * SURVEY §1.1): a synthetic timestamp so watermarks and windows
    * apply. */
  def withEventTime(parsed: DataFrame): DataFrame =
    parsed.withColumn("eventTime",
      expr("timestamp'2024-01-01 00:00:00' + " +
        "make_interval(0, 0, 0, 0, step, 0, 0)"))

  /** Watermarked stream-stream inner join: each left event pairs
    * with right events of the same key whose event time falls in
    * [left - maxDelay, left]. Both sides carry watermarks so the
    * join state store can evict rows older than the time bound —
    * without the range condition + watermarks a stream-stream join
    * buffers both streams forever. Columns: left must have
    * (key, eventTime, ...); right (key, eventTime, ...); right's
    * are prefixed `r_` in the output. */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
      key: String, maxDelay: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("eventTime", maxDelay)
    val r = right.toDF(right.columns.map("r_" + _).toIndexedSeq: _*)
      .withWatermark("r_eventTime", maxDelay)
    l.join(r,
      col(key) === col(s"r_$key") &&
        col("r_eventTime") >= col("eventTime") -
          expr(s"INTERVAL $maxDelay") &&
        col("r_eventTime") <= col("eventTime"))
  }

  /** Watermarked tumbling-window aggregation: per (1h window, type)
    * transaction count / volume / fraud count; 2h watermark bounds
    * state and admits the late data a replayed feed produces. */
  def windowedTypeCounts(parsed: DataFrame): DataFrame =
    withEventTime(parsed)
      .withWatermark("eventTime", "2 hours")
      .groupBy(window(col("eventTime"), "1 hour"), col("type"))
      .agg(
        count(lit(1)).as("n_txns"),
        sum(col("amount")).as("volume"),
        sum(col("isFraud")).as("n_fraud"))

  /** Native session windows (`session_window`, Spark 3.2+): per-
    * account activity sessions closed by `gap` of inactivity — the
    * built-in declarative twin of the gap-based sessionizers
    * elsewhere in this engine (batch `e2_sessionize` via lag/cumsum,
    * custom streaming state via flatMapGroupsWithState). Here the
    * ENGINE owns the merge/expire logic in its session-window state
    * store: state is keyed (account, session), merged when late
    * events bridge two sessions, and evicted once the watermark
    * passes a session's end — the bounded-state contract at 100 TB.
    * Append mode emits a session exactly once, when it can no longer
    * grow. */
  def sessionWindowCounts(parsed: DataFrame,
      gap: String = "2 hours"): DataFrame =
    withEventTime(parsed)
      .withWatermark("eventTime", "4 hours")
      .groupBy(session_window(col("eventTime"), gap), col("nameOrig"))
      .agg(
        count(lit(1)).as("n_txns"),
        sum(col("amount")).as("volume"))
      .select(col("nameOrig"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_txns"), col("volume"))

  /** Streaming exact dedup bounded by the watermark: drop re-deliveries
    * of the same logical transaction (at-least-once sources replay —
    * the reference's Kafka feed has no dedup at all, so every replay
    * double-counts). `dropDuplicatesWithinWatermark` keys the state
    * store on the dedup key and EVICTS entries once the watermark
    * passes them — bounded state, unlike a plain `dropDuplicates` on
    * a stream, which retains every key forever. The key is the
    * transaction's content hash, so the op needs no producer-assigned
    * ids. */
  def dedupWithinWatermark(parsed: DataFrame,
      horizon: String = "2 hours"): DataFrame =
    withEventTime(parsed)
      .withColumn("txn_key", txnKey)
      .withWatermark("eventTime", horizon)
      .dropDuplicatesWithinWatermark("txn_key")

  /** The content hash [[dedupWithinWatermark]] keys its state on —
    * shared with the bench gate's batch twin so both sides derive
    * the key identically. `step` is part of the hash, so identical
    * keys always share an event time: a re-delivery can never
    * straddle the watermark horizon relative to its original. */
  def txnKey: org.apache.spark.sql.Column =
    xxhash64(col("step"), col("type"), col("nameOrig"),
      col("nameDest"), col("amount"))
}
