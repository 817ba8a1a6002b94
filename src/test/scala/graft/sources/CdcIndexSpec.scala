package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.RetrievalQueries

/** The persisted CDC chunk index: incremental build content,
  * serve-side file discipline, and exact agreement between the
  * indexed serve and the scan-side twin. */
class CdcIndexSpec extends SparkSpec {

  private def scannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.flatMap(_.selectedPartitions.toPartitionArray
      .map(_.filePath.toString))

  test("incrementally-built chunk digests and census match a " +
      "one-shot recompute") {
    val paths = IndexStore.ensureCdcChunks(spark, sfDir)
    val persisted = spark.read.parquet(paths.chunks)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val fresh = RetrievalQueries.cdcChunkHashes(
        graft.core.Tables.documents(spark, sfDir))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(persisted == fresh,
      s"chunk stores diverge: ${persisted.size} vs ${fresh.size}")
    // census partials re-sum to the true occurrence counts
    val census = spark.read.parquet(paths.census)
      .groupBy("h").agg(sum("occ").as("occ"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val trueOcc = fresh.values.groupBy(identity)
      .view.mapValues(_.size.toLong)
    assert(census.size == trueOcc.size)
    trueOcc.foreach { case (h, n) =>
      assert(census(h) == n, s"chunk $h: census ${census(h)} != $n")
    }
  }

  test("indexed serve reads only the persisted index tables, never " +
      "the documents table") {
    val df = RetrievalQueries.tCdcChunksIndexed(spark, sfDir)
    val files = scannedFiles(df)
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(f.contains("cdc_chunks") || f.contains("cdc_census"),
        s"indexed serve reads a non-index file: $f")
      assert(!f.contains("documents.parquet"),
        s"indexed serve touches the base documents table: $f")
    }
  }

  test("indexed serve is row-identical to the scan-side " +
      "t_cdc_chunks twin") {
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val idx = rows(RetrievalQueries.tCdcChunksIndexed(spark, sfDir))
    val scan = rows(RetrievalQueries.tCdcChunks(spark, sfDir))
    assert(idx == scan,
      s"indexed/scan twins diverge: idx=${idx.size} scan=${scan.size}")
  }
}
