package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ml.Transactions
import graft.schema.Transaction

class SourcesSpec extends SparkSpec {

  test("S1/S7: CSV sink + explicit-schema scan round-trips transactions") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_csv").toString
    val txns = Transactions.fromEvents(spark, sfDir).limit(100)
    Sinks.csvOverwrite(txns, tmp)
    val back = Sources.csv(spark, tmp)
    assert(back.schema == Transaction.schema)
    assert(back.count() == 100)
    val a = txns.select("nameOrig", "amount", "isFraud")
      .collect().map(_.toSeq).toSet
    val b = back.select("nameOrig", "amount", "isFraud")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("S1: inferSchema variant reads the same rows") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_csv_infer").toString
    Sinks.csvOverwrite(Transactions.fromEvents(spark, sfDir).limit(50),
      tmp)
    val inferred = Sources.csv(spark, tmp, infer = true)
    assert(inferred.count() == 50)
    assert(inferred.schema("amount").dataType ==
      org.apache.spark.sql.types.DoubleType)
  }

  test("S8: CSV append accumulates batches") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_csv_append").toString
    val txns = Transactions.fromEvents(spark, sfDir).limit(30)
    Sinks.csvAppend(txns, tmp)
    Sinks.csvAppend(txns, tmp)
    assert(Sources.csv(spark, tmp).count() == 60)
  }

  test("S5: catalog introspection reports schema + cardinality") {
    Transactions.fromEvents(spark, sfDir).limit(10)
      .createOrReplaceTempView("txn_catalog_probe")
    val Some((schema, n)) = Sources.tableInfo(spark, "txn_catalog_probe")
    assert(n == 10)
    assert(schema.fieldNames.contains("isFraud"))
    assert(Sources.tableInfo(spark, "no_such_table").isEmpty)
  }

  test("S6: local-collection source preserves the wire schema") {
    val rows = Seq(
      Transaction(1, "PAYMENT", 9839.64, "C1", 170136.0, 160296.36,
        "M1", 0.0, 0.0, 0, 0),
      Transaction(1, "TRANSFER", 181.0, "C2", 181.0, 0.0,
        "C3", 0.0, 0.0, 1, 0))
    val df = Sources.fromRows(spark, rows)
    assert(df.count() == 2)
    assert(df.filter(col("isFraud") === 1).count() == 1)
  }

  test("S3: Kafka source builder constructs without the connector") {
    // No broker/connector jar in this environment: the builder must
    // be constructible (resolution happens at .load(), deferred to
    // deployments that ship spark-sql-kafka).
    val reader = Sources.kafkaStream(spark, "localhost:9092", "txns")
    assert(reader != null)
    val ex = intercept[Exception](reader.load())
    assert(ex.getMessage.toLowerCase.contains("kafka"))
  }

  test("S11: metrics JSON sink creates parent dirs") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_metrics").toString
    Sinks.metricsJson("""{"ok":true}""", s"$tmp/nested/stats.json")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$tmp/nested/stats.json")) ==
      """{"ok":true}""")
  }
}
