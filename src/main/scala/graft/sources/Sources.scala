package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.schema.Transaction

/** Source operators S1–S6 (SURVEY §2.1), as small composable
  * builders. Everything returns a lazy DataFrame plan; nothing is
  * driver-materialized.
  */
object Sources {

  /** S1: CSV scan. Explicit schema by default — the reference's
    * inferSchema=True (fraud_detection_model.py:76) costs a full
    * extra pass over the data, which at 100 TB is a second scan for
    * zero information we don't already have. `infer = true` opts into
    * reference-faithful inference. */
  def csv(spark: SparkSession, path: String,
      schema: StructType = Transaction.schema,
      infer: Boolean = false): DataFrame = {
    val r = spark.read.option("header", "true")
    if (infer) r.option("inferSchema", "true").csv(path)
    else r.schema(schema).csv(path)
  }

  /** S3: Kafka stream source with the reference's options
    * (spark_streaming_app.py:409-416): earliest offsets, tolerant of
    * data loss (T7). Returns the configured reader — call `.load()`
    * where the spark-sql-kafka connector is on the classpath (it is
    * not shipped in this image, so source resolution is deferred to
    * the caller and validated in integration, not unit tests). */
  def kafkaStream(spark: SparkSession, bootstrapServers: String,
      topic: String): org.apache.spark.sql.streaming.DataStreamReader =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("failOnDataLoss", "false")

  /** S4: partitioned JDBC scan — replaces the reference's manual
    * OFFSET/LIMIT pagination (postgres_model_inference.py:272-275),
    * which is serial AND order-unstable (no ORDER BY: Postgres may
    * return overlapping/missing rows across pages). Partitioning on a
    * numeric key gives parallel, disjoint, stable range scans. */
  def jdbcPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)

  /** S5: catalog introspection — existence + schema + cardinality
    * (postgres_model_inference.py:196-209 does this with raw
    * information_schema SQL). */
  def tableInfo(spark: SparkSession,
      table: String): Option[(StructType, Long)] =
    if (!spark.catalog.tableExists(table)) None
    else {
      val df = spark.table(table)
      Some((df.schema, df.count()))
    }

  /** S6: local-collection source (postgres_model_inference.py:285). */
  def fromRows(spark: SparkSession,
      rows: Seq[Transaction]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }
}
