package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CosineSimilaritySpec extends SparkSpec {

  test("matches the composed higher-order-function expression") {
    val df = graft.core.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS e")
      .limit(100)
    val self = df.selectExpr("vec_id",
      "cosine_sim(e, e) AS native",
      """aggregate(zip_with(e, e, (x, y) -> x * y), 0D,
        |  (acc, x) -> acc + x) /
        |(sqrt(aggregate(zip_with(e, e, (x, y) -> x * y), 0D,
        |  (acc, x) -> acc + x)) *
        | sqrt(aggregate(zip_with(e, e, (x, y) -> x * y), 0D,
        |  (acc, x) -> acc + x))) AS composed""".stripMargin)
      .collect()
    self.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12,
        s"vec ${r.getLong(0)}")
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12,
        "self-cosine must be 1")
    }
  }

  test("known-value pairs") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0), 0.0), // orthogonal
      (Array(1.0, 1.0), Array(1.0, 1.0), 1.0), // identical
      (Array(1.0, 0.0), Array(-1.0, 0.0), -1.0) // opposite
    ).toDF("a", "b", "expected")
    df.selectExpr("cosine_sim(a, b) AS got", "expected")
      .collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("null propagation") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    val r = df.selectExpr("cosine_sim(a, b) AS c").head()
    assert(r.isNullAt(0))
  }

  test("mismatched lengths yield null, never a prefix-truncated score") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0)))
      .toDF("a", "b")
    val r = df.selectExpr("cosine_sim(a, b) AS c").head()
    assert(r.isNullAt(0))
  }

  test("expression participates in whole-stage codegen") {
    val df = graft.core.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS e")
      .selectExpr("cosine_sim(e, e) AS c")
      .filter(col("c") > 0.5)
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark WholeStageCodegen spans; the Filter/Project
    // containing cosine_sim must carry one (an interpreted-only
    // expression would break the span).
    assert(plan.linesIterator.exists(l =>
      l.contains("cosine_sim") && l.trim.matches("""[+\-:\s]*\*\(\d+\).*""")),
      s"expected cosine_sim inside a codegen span in:\n$plan")
    // And it actually runs (codegen path, not interpreted fallback).
    assert(df.count() > 0)
  }
}
