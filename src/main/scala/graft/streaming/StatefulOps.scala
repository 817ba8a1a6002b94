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
}
