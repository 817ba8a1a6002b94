package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deterministic PaySim-shaped transaction frame derived from the
  * shipped `events` table, so the fraud pipeline (M1–M9) exercises
  * real driver data at every scale factor. The mapping is pure
  * column arithmetic — same rows at every run, label correlated with
  * `amount` so the classifier has signal to learn.
  *
  * Schema matches graft.schema.Transaction / the reference's wire
  * StructType (spark_streaming_app.py:33-45).
  */
object Transactions {
  def fromEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      ((col("event_id") % 744) + 1).cast("int").as("step"),
      when(col("event_type") === "purchase", "TRANSFER")
        .when(col("event_type") === "click", "PAYMENT")
        .when(col("event_type") === "view", "CASH_IN")
        .when(col("event_type") === "signup", "DEBIT")
        .otherwise("CASH_OUT").as("type"),
      (col("value") * 1000.0).as("amount"),
      concat(lit("C"), col("user_id")).as("nameOrig"),
      (col("value") * 2000.0).as("oldbalanceOrg"),
      greatest(col("value") * 2000.0 - col("value") * 1000.0, lit(0.0))
        .as("newbalanceOrig"),
      concat(
        when(col("event_type") === "purchase", "M").otherwise("C"),
        col("user_id") + 7).as("nameDest"),
      (col("value") * 500.0).as("oldbalanceDest"),
      (col("value") * 500.0 + col("value") * 1000.0).as("newbalanceDest"),
      when(col("value") > 100.0, 1).otherwise(0).as("isFraud"),
      lit(0).as("isFlaggedFraud"))
}
