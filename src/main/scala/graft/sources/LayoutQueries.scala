package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Storage-layout operators promoted into the registry (VERDICT r4/r5
  * task: "layout-pruned aggregate with a plan assert"): a
  * partition-pruned aggregate and a manifest-skipped ranged aggregate.
  * Both materialize a laid-out copy of the source under a
  * deterministic temp path and then run the query THROUGH the layout,
  * so Verify/Bench exercise the pruning path itself; the oracle is
  * plain SQL over the original table — layout must be
  * semantics-preserving.
  *
  * At 100 TB these layouts are written once by the ingest job and
  * amortized over every query; re-writing per call here is the test
  * harness shape, not the deployment shape.
  */
object LayoutQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic per-SF temp root (idempotent overwrite per call). */
  private def tmpRoot(dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_layout_$tag"
  }

  /** One layout write per (app, dir): ingest writes the layout once
    * and every query amortizes it — re-writing per call would make
    * the bench measure the writer, not the pruned read these
    * operators exist to demonstrate. */
  private val written =
    scala.collection.concurrent.TrieMap.empty[String, Unit]

  private def writeOnce(s: SparkSession, key: String)(w: => Unit): Unit =
    written.getOrElseUpdate(s.sparkContext.applicationId + ":" + key, w)

  /** Aggregate over a hive-partitioned copy: documents partitioned by
    * lang, filtered to one partition. The scan must show
    * PartitionFilters (LayoutSpec plan-asserts this) — at 100 TB the
    * filter never lists, let alone reads, the other languages'
    * directories. */
  def l4PartitionPruned(s: SparkSession, dir: String): DataFrame = {
    val path = s"${tmpRoot(dir)}/documents_by_lang"
    writeOnce(s, path)(Tables.documents(s, dir)
      .write.partitionBy("lang").mode("overwrite").parquet(path))
    s.read.parquet(path)
      .filter(col("lang") === "en")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).cast("long").as("sum_ids"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
  }

  /** Ranged aggregate through the min/max file manifest: orders
    * range-clustered on o_orderkey, manifest built once, then a
    * key-range query that scans ONLY intersecting files
    * ([[DataSkipping.prunedRead]]). LayoutSpec asserts the candidate
    * file list is a strict subset. */
  def l5ManifestSkip(s: SparkSession, dir: String): DataFrame = {
    val path = s"${tmpRoot(dir)}/orders_clustered"
    writeOnce(s, path)(Tables.orders(s, dir)
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(path))
    val manifest = DataSkipping.buildManifest(s, path, "o_orderkey")
    DataSkipping.prunedRead(s, manifest, "o_orderkey", 1000L, 5000L)
      .agg(count(lit(1)).cast("long").as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).cast("long")
          .as("price_cents"))
  }

  val queries: Map[String, Q] = Map(
    "l4_partition_pruned" -> (l4PartitionPruned _),
    "l5_manifest_skip" -> (l5ManifestSkip _)
  )

  val oracle: Map[String, String] = Map(
    // Layout is semantics-preserving: the oracle runs on the ORIGINAL
    // table with a plain filter.
    "l4_partition_pruned" ->
      """SELECT lang,
        | count(*) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE lang = 'en'
        |GROUP BY lang""".stripMargin,
    "l5_manifest_skip" ->
      """SELECT count(*) AS n_orders,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |   AS price_cents
        |FROM orders
        |WHERE o_orderkey BETWEEN 1000 AND 5000""".stripMargin
  )
}
