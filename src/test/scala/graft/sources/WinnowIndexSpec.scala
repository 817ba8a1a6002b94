package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextQueries

/** The persisted winnow fingerprint index: incremental build content,
  * serve-side file discipline, and exact agreement between the
  * indexed serve and the scan-side twin. */
class WinnowIndexSpec extends SparkSpec {

  private def scannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.flatMap(_.selectedPartitions.toPartitionArray
      .map(_.filePath.toString))

  test("incrementally-built fingerprint rows match the scan path's " +
      "winnow selection") {
    val paths = IndexStore.ensureWinnow(spark, sfDir)
    def multiset(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val persisted = multiset(spark.read.parquet(paths.fps))
    val fresh = multiset(TextQueries.tWinnowFp(spark, sfDir))
    assert(persisted == fresh,
      s"fingerprint stores diverge: ${persisted.size} vs ${fresh.size}")
  }

  test("indexed serve reads only the persisted index table, never " +
      "the documents table") {
    val df = TextQueries.ddWinnowIndexed(spark, sfDir)
    val files = scannedFiles(df)
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(f.contains("winnow_fps"),
        s"indexed serve reads a non-index file: $f")
      assert(!f.contains("documents.parquet"),
        s"indexed serve touches the base documents table: $f")
    }
  }

  test("indexed serve is row-identical to the scan-side " +
      "dd_winnow_pairs twin") {
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val idx = rows(TextQueries.ddWinnowIndexed(spark, sfDir))
    val scan = rows(TextQueries.ddWinnowPairs(spark, sfDir))
    assert(idx == scan,
      s"indexed/scan twins diverge: idx=${idx.size} scan=${scan.size}")
  }
}
