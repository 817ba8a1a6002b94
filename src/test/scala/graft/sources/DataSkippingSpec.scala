package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class DataSkippingSpec extends SparkSpec {

  /** Write orders clustered on the key into many files so per-file
    * ranges are disjoint — the layout any clustered table maintains. */
  private lazy val clusteredPath: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_skip").toString + "/orders"
    Tables.orders(spark, sfDir)
      .repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("manifest covers every file and row exactly once") {
    val m = DataSkipping.buildManifest(spark, clusteredPath, "o_orderkey")
    val total = Tables.orders(spark, sfDir).count()
    assert(m.agg(sum("n_rows")).head().getLong(0) == total)
    assert(m.count() == 8)
    assert(m.filter(col("lo") > col("hi")).count() == 0)
  }

  test("range query prunes non-overlapping files and stays exact") {
    val m = DataSkipping.buildManifest(spark, clusteredPath, "o_orderkey")
      .localCheckpoint()
    val keys = Tables.orders(spark, sfDir)
      .agg(min("o_orderkey"), max("o_orderkey")).head()
    val (lo, hi) = (keys.getLong(0), keys.getLong(1))
    // probe the middle ~10% of the key space
    val qLo = lo + (hi - lo) * 45 / 100
    val qHi = lo + (hi - lo) * 55 / 100
    val cand = DataSkipping.candidateFiles(m, qLo, qHi)
    assert(cand.nonEmpty && cand.size < 8,
      s"clustered layout should prune most files, touched ${cand.size}/8")
    val pruned = DataSkipping.prunedRead(spark, m, "o_orderkey", qLo, qHi)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val full = spark.read.parquet(clusteredPath)
      .filter(col("o_orderkey") >= qLo && col("o_orderkey") <= qHi)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(pruned.sameElements(full))
  }

  test("a range outside every file reads nothing") {
    val m = DataSkipping.buildManifest(spark, clusteredPath, "o_orderkey")
    val hi = m.agg(max("hi")).head().getLong(0)
    assert(DataSkipping.candidateFiles(m, hi + 1000, hi + 2000).isEmpty)
    assert(DataSkipping
      .prunedRead(spark, m, "o_orderkey", hi + 1000, hi + 2000)
      .isEmpty)
  }

  test("the empty branch keeps the source schema (ADVICE r5)") {
    val m = DataSkipping.buildManifest(spark, clusteredPath, "o_orderkey")
    val hi = m.agg(max("hi")).head().getLong(0)
    val empty = DataSkipping
      .prunedRead(spark, m, "o_orderkey", hi + 1000, hi + 2000)
    val populated = DataSkipping
      .prunedRead(spark, m, "o_orderkey", hi - 10, hi)
    assert(empty.schema == populated.schema,
      s"empty=${empty.schema.treeString} vs ${populated.schema.treeString}")
    // downstream column references must not throw in the empty case
    assert(empty.filter(col("o_orderkey") > 0)
      .select("o_orderkey", "o_totalprice").count() == 0)
  }
}
