package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityQueries

/** The persisted SimHash near-dup index: incremental build content,
  * serve-side file discipline, and exact agreement between the
  * indexed serve and the scan-side twin. */
class SimhashIndexSpec extends SparkSpec {

  private def scannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.flatMap(_.selectedPartitions.toPartitionArray
      .map(_.filePath.toString))

  test("incrementally-built signature table matches a one-shot " +
      "recompute from the raw corpus row-for-row") {
    val paths = IndexStore.ensureSimhash(spark, sfDir)
    // every doc contributes exactly one row per probe combo, all
    // carrying the SAME signature
    val sigs = spark.read.parquet(paths.sigs)
    val bad = sigs.groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("simhash")).as("ns"))
      .filter(col("n") =!= SimilarityQueries.ShCombos.size ||
        col("ns") =!= 1)
      .count()
    assert(bad == 0, s"$bad docs with wrong combo count or mixed sigs")
    // persisted signatures == the scan path's signatures
    val persisted = sigs.select(col("doc_id"), col("simhash"))
      .distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fresh = SimilarityQueries.ddSimhash(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(persisted.keySet == fresh.keySet,
      s"index holds ${persisted.size} docs, corpus has ${fresh.size}")
    persisted.foreach { case (id, h) =>
      assert(h == fresh(id), s"doc $id: persisted signature diverges")
    }
    // probe keys are the signature's nibble concatenations (the
    // layout contract the partition-local candidate join relies on)
    val badKeys = sigs.filter(
      expr(s"k != (${SimilarityQueries.shKeyCaseSql("simhash")})"))
      .count()
    assert(badKeys == 0, s"$badKeys probe rows with wrong key")
  }

  test("indexed serve reads only the persisted signature table, " +
      "never the documents table") {
    val df = SimilarityQueries.ddSimhashIndexed(spark, sfDir)
    val files = scannedFiles(df)
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(f.contains("simhash_sigs"),
        s"indexed serve reads a non-index file: $f")
      assert(!f.contains("documents.parquet"),
        s"indexed serve touches the base documents table: $f")
    }
  }

  test("indexed serve is row-identical to the scan-side " +
      "dd_simhash_pairs twin") {
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val idx = rows(SimilarityQueries.ddSimhashIndexed(spark, sfDir))
    val scan = rows(SimilarityQueries.ddSimhashPairs(spark, sfDir))
    assert(idx == scan,
      s"indexed/scan twins diverge: idx=${idx.size} scan=${scan.size}")
  }
}
