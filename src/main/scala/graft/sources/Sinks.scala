package graft.sources

import java.nio.file.{Files, Paths}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink operators S7–S11 (SURVEY §2.1). All distributed writes; the
  * only driver-side writer is the metrics JSON (S11), which is a
  * handful of bytes by construction.
  */
object Sinks {

  /** S7: CSV sink for the test split (fraud_detection_model.py:91-94
    * goes through toPandas().to_csv — the full split through driver
    * memory; we write distributed, `singleFile` opts into coalesce(1)
    * for byte-level parity when a single file is required). */
  def csvOverwrite(df: DataFrame, path: String,
      singleFile: Boolean = false): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** S8: CSV append sink for per-batch fraud hits
    * (postgres_model_inference.py:300-307 appends via pandas with a
    * header-once dance; Spark's append mode handles it). */
  def csvAppend(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).option("header", "true").csv(path)

  /** S9: Kafka alert sink — the distributed replacement for the
    * reference's driver-side collect + per-row producer.send loop
    * (spark_streaming_app.py:352-363). Expects a `value` column;
    * requires the kafka connector jar at runtime. */
  def kafka(df: DataFrame, bootstrapServers: String, topic: String): Unit =
    df.select(col("value").cast("string"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()

  /** S10: JDBC sink — CSV→Postgres ETL (to_sql.py:41-62 drops and
    * recreates the table then chunk-inserts via pandas; overwrite
    * mode is the same contract, written in parallel). */
  def jdbcOverwrite(df: DataFrame, url: String, table: String,
      props: Properties = new Properties()): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props)

  /** S11: metrics/stats JSON file sink (driver-side by design —
    * fraud_detection_model.py:297-299 etc.). */
  def metricsJson(json: String, path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, json)
  }
}
