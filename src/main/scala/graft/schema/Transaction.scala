package graft.schema

import org.apache.spark.sql.types._

/** The PaySim mobile-money transaction record — the reference's single
  * relational universe (explicit StructType at
  * spark_streaming_app.py:33-45; CSV header in t1/t2/t3.csv; SQL DDL
  * at to_sql.py:13-27).
  *
  * The case class keeps the wire column name `type` via Scala
  * backticks, so `Dataset[Transaction]` round-trips the wire schema
  * without renames. Spelling `oldbalanceOrg` (no 'i') is the
  * reference's own inconsistency, kept for parity.
  */
final case class Transaction(
    step: Int,
    `type`: String,
    amount: Double,
    nameOrig: String,
    oldbalanceOrg: Double,
    newbalanceOrig: Double,
    nameDest: String,
    oldbalanceDest: Double,
    newbalanceDest: Double,
    isFraud: Int,
    isFlaggedFraud: Int
)

object Transaction {
  /** Mirror of spark_streaming_app.py:33-45 — 11 nullable fields. */
  val schema: StructType = StructType(
    Seq(
      StructField("step", IntegerType, nullable = true),
      StructField("type", StringType, nullable = true),
      StructField("amount", DoubleType, nullable = true),
      StructField("nameOrig", StringType, nullable = true),
      StructField("oldbalanceOrg", DoubleType, nullable = true),
      StructField("newbalanceOrig", DoubleType, nullable = true),
      StructField("nameDest", StringType, nullable = true),
      StructField("oldbalanceDest", DoubleType, nullable = true),
      StructField("newbalanceDest", DoubleType, nullable = true),
      StructField("isFraud", IntegerType, nullable = true),
      StructField("isFlaggedFraud", IntegerType, nullable = true)
    )
  )
}
