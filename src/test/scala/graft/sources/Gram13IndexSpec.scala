package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{SimilarityQueries, TextQueries}

/** The persisted 13-gram decontamination index: incremental build
  * content, serve-side file discipline, and exact agreement between
  * the indexed serve and the scan-side twin. */
class Gram13IndexSpec extends SparkSpec {

  private def scannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.flatMap(_.selectedPartitions.toPartitionArray
      .map(_.filePath.toString))

  test("incrementally-built gram rows match a one-shot recompute") {
    val paths = IndexStore.ensureGram13(spark, sfDir)
    def multiset(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val persisted = multiset(spark.read.parquet(paths.grams))
    val fresh = multiset(graft.core.Tables.documents(spark, sfDir)
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"),
        explode(transform(SimilarityQueries.wordGramExpr("words", 13),
          g => xxhash64(g))).as("g")))
    assert(persisted == fresh,
      s"gram stores diverge: ${persisted.size} vs ${fresh.size}")
  }

  test("indexed serve reads only the persisted index table, never " +
      "the documents table") {
    val df = TextQueries.tDecontaminateIndexed(spark, sfDir)
    val files = scannedFiles(df)
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(f.contains("decon_grams"),
        s"indexed serve reads a non-index file: $f")
      assert(!f.contains("documents.parquet"),
        s"indexed serve touches the base documents table: $f")
    }
  }

  test("indexed serve is row-identical to the scan-side " +
      "t_decontaminate twin") {
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = rows(TextQueries.tDecontaminateIndexed(spark, sfDir))
    val scan = rows(TextQueries.tDecontaminate(spark, sfDir))
    assert(idx == scan,
      s"indexed/scan twins diverge: idx=${idx.size} scan=${scan.size}")
  }
}
