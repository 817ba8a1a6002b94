package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SketchQueriesSpec extends SparkSpec {

  private def exactCounts: Map[String, Long] =
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").isin(SketchQueries.Probes: _*))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("CMS estimates never underestimate and stay within the row bound") {
    val n = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")))
      .count()
    val exact = exactCounts
    val est = SketchQueries.d4CmsEstimate(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (p <- SketchQueries.Probes) {
      val e = exact.getOrElse(p, 0L)
      assert(est(p) >= e, s"$p: est ${est(p)} < exact $e")
      // worst-case overcount in a row is bounded by the total stream
      assert(est(p) - e <= n, s"$p overcount exceeds stream size")
    }
  }

  test("sketch table has at most D*W cells and counts sum to D*N") {
    val sketch = SketchQueries.cmsTable(spark, sfDir).cache()
    assert(sketch.count() <= SketchQueries.D.toLong * SketchQueries.W)
    val n = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")))
      .count()
    val sum = sketch.agg(org.apache.spark.sql.functions.sum("c"))
      .head().getLong(0)
    assert(sum == SketchQueries.D * n)
  }

  test("sketches merge by union + re-aggregation (commutative counters)") {
    // Split the corpus in half by doc_id parity, sketch each half,
    // merge via union+groupBy — must equal the whole-corpus sketch
    // exactly (the property that makes incremental daily sketches
    // valid).
    val docs = Tables.documents(spark, sfDir)
    def sketchOf(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(split(col("text"), " ")).as("w"))
      .select(explode(sequence(lit(0), lit(SketchQueries.D - 1))).as("j"),
        col("w"))
      .select(col("j"),
        pmod(graft.core.PortableHash.md5Hash60(
          concat(col("j").cast("string"), lit(":"), col("w"))),
          lit(SketchQueries.W.toLong)).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("c"))
    val whole = sketchOf(docs)
    val merged = sketchOf(docs.filter(col("doc_id") % 2 === 0))
      .unionByName(sketchOf(docs.filter(col("doc_id") % 2 === 1)))
      .groupBy("j", "bucket").agg(sum("c").as("c"))
    assert(whole.join(merged, Seq("j", "bucket"))
      .filter(whole("c") =!= merged("c")).count() == 0)
    assert(whole.count() == merged.count())
  }
}
