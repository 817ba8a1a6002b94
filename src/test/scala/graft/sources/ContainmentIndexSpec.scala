package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityQueries

/** The persisted containment-join index: incremental build content,
  * serve-side file discipline, and exact agreement between the
  * indexed serve and the scan-side twin. */
class ContainmentIndexSpec extends SparkSpec {

  private def scannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.flatMap(_.selectedPartitions.toPartitionArray
      .map(_.filePath.toString))

  test("incrementally-built fingerprints and census match a one-shot " +
      "recompute from the raw corpus") {
    val paths = IndexStore.ensureContainment(spark, sfDir)
    val persisted = spark.read.parquet(paths.docs)
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2)))
      .toMap
    val fresh = graft.core.Tables.documents(spark, sfDir)
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"),
        sort_array(transform(
          SimilarityQueries.wordGramExpr("words", 3),
          g => xxhash64(g))).as("g"))
      .withColumn("na", size(col("g")).cast("long"))
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2)))
      .toMap
    assert(persisted.keySet == fresh.keySet,
      s"index holds ${persisted.size} docs, corpus has ${fresh.size}")
    persisted.foreach { case (id, fp) =>
      assert(fp == fresh(id), s"doc $id: persisted fingerprint diverges")
    }
    // census: partial rows re-sum to the true global document
    // frequencies (the additivity contract of the base+delta split)
    val census = spark.read.parquet(paths.freq)
      .groupBy("gr").agg(sum("nf").as("nf"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trueFreq = fresh.values
      .flatMap(_._1).groupBy(identity).view.mapValues(_.size.toLong)
    assert(census.size == trueFreq.size)
    trueFreq.foreach { case (gr, nf) =>
      assert(census(gr) == nf, s"gram $gr: census ${census(gr)} != $nf")
    }
  }

  test("indexed serve reads only the persisted index tables, never " +
      "the documents table") {
    val df = SimilarityQueries.ddContainmentIndexed(spark, sfDir)
    val files = scannedFiles(df)
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(f.contains("cont_docs") || f.contains("cont_freq"),
        s"indexed serve reads a non-index file: $f")
      assert(!f.contains("documents.parquet"),
        s"indexed serve touches the base documents table: $f")
    }
  }

  test("indexed serve is row-identical to the scan-side " +
      "dd_containment twin") {
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val idx = rows(SimilarityQueries.ddContainmentIndexed(spark, sfDir))
    val scan = rows(SimilarityQueries.ddContainment(spark, sfDir))
    assert(idx == scan,
      s"indexed/scan twins diverge: idx=${idx.size} scan=${scan.size}")
  }
}
