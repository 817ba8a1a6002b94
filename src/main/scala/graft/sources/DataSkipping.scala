package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping: a persistable min/max manifest per
  * parquet file plus a manifest-driven pruned read — the scan
  * planning a lakehouse table format (Iceberg/Delta-style) does from
  * its metadata layer, expressed in pure Spark.
  *
  * At 100 TB the point is that the MANIFEST, not the data, answers
  * "which files can contain key ∈ [lo, hi]": it is built once per
  * write (one pass, map-side-combinable min/max per
  * `input_file_name`), persisted next to the data, and consulted at
  * query time for file-list pruning before the scan starts. This
  * composes with (not replaces) parquet row-group pushdown — row
  * groups prune within a file that is already being read; the
  * manifest keeps non-overlapping files out of the scan entirely,
  * which is what matters when the file listing itself is millions of
  * entries. Pruning is sound for files written sorted/clustered on
  * the key (the writer's job, same contract as any clustered table).
  */
object DataSkipping {

  /** One manifest row per file: (file, lo, hi, n_rows) for `keyCol`
    * (numeric long semantics). */
  def buildManifest(s: SparkSession, dataPath: String,
      keyCol: String): DataFrame =
    s.read.parquet(dataPath)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).cast("long").as("lo"),
        max(col(keyCol)).cast("long").as("hi"),
        count(lit(1)).as("n_rows"))

  /** Files whose [lo, hi] range intersects [qLo, qHi] — the driver
    * reads ONLY the manifest (tiny) here; the data path is untouched
    * until the pruned scan below. */
  def candidateFiles(manifest: DataFrame, qLo: Long, qHi: Long): Seq[String] =
    manifest.filter(col("hi") >= qLo && col("lo") <= qHi)
      .select("file").collect().map(_.getString(0)).toSeq

  /** Manifest-pruned ranged read: scan only intersecting files, then
    * apply the exact predicate (manifest pruning is a superset
    * filter, never a substitute for it). The no-intersection branch
    * preserves the SOURCE schema (a footer-only read of one manifest
    * file under an always-false filter) so downstream column
    * references behave identically whether or not anything matched
    * (ADVICE r5: emptyDataFrame's zero-column schema made the empty
    * case throw AnalysisException). */
  def prunedRead(s: SparkSession, manifest: DataFrame, keyCol: String,
      qLo: Long, qHi: Long): DataFrame = {
    val files = candidateFiles(manifest, qLo, qHi)
    if (files.isEmpty)
      manifest.select("file").limit(1).collect().headOption match {
        case Some(row) =>
          s.read.parquet(row.getString(0)).filter(lit(false))
        case None => s.emptyDataFrame // no files exist at all
      }
    else
      s.read.parquet(files: _*)
        .filter(col(keyCol) >= qLo && col(keyCol) <= qHi)
  }
}
