package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityQueries

/** The persisted MinHash dedup index: incremental build content,
  * serve-side file discipline, and exact agreement between the
  * indexed serve and the scan-side twin. */
class MinhashIndexSpec extends SparkSpec {

  private def scannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.flatMap(_.selectedPartitions.toPartitionArray
      .map(_.filePath.toString))

  test("incrementally-built shingle store matches a one-shot " +
      "recompute from the raw corpus row-for-row") {
    val paths = IndexStore.ensureMinhash(spark, sfDir)
    val persisted = spark.read.parquet(paths.shingles)
      .select(col("doc_id"), col("hs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val fresh = graft.core.Tables.documents(spark, sfDir)
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"),
        transform(SimilarityQueries.wordGramExpr("words", 3),
          g => xxhash64(g)).as("hs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(persisted.keySet == fresh.keySet,
      s"index holds ${persisted.size} docs, corpus has ${fresh.size}")
    persisted.foreach { case (id, hs) =>
      assert(hs == fresh(id), s"doc $id: persisted shingles diverge")
    }
    // bands: every doc contributes exactly MhBands rows
    val badBands = spark.read.parquet(paths.bands)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .filter(col("n") =!= IndexStore.MhBands).count()
    assert(badBands == 0, s"$badBands docs with wrong band count")
  }

  test("indexed serve reads only the persisted index tables, never " +
      "the documents table") {
    val df = SimilarityQueries.ddMinhashIndexed(spark, sfDir)
    val files = scannedFiles(df)
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(f.contains("mh_bands") || f.contains("mh_shingles"),
        s"indexed serve reads a non-index file: $f")
      assert(!f.contains("documents.parquet"),
        s"indexed serve touches the base documents table: $f")
    }
  }

  test("indexed serve is row-identical to the scan-side " +
      "dd_minhash_lsh twin") {
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val idx = rows(SimilarityQueries.ddMinhashIndexed(spark, sfDir))
    val scan = rows(SimilarityQueries.ddMinhashLsh(spark, sfDir))
    assert(idx == scan,
      s"indexed/scan twins diverge:\n  idx  $idx\n  scan $scan")
  }
}
