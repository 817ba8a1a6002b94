package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain join (row multiplicity exact)") {
    val big = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val small = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = big.join(small, "l_orderkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val salted = SkewJoin.saltedJoin(big, small,
      key = "l_orderkey", spreadCol = "l_linenumber", salt = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(salted == plain)
  }

  test("a synthetic hot key spreads across salt values") {
    import spark.implicits._
    // 1000 rows of ONE key — the pathological shape.
    val big = (1 to 1000).map(i => (42L, i)).toDF("k", "row_id")
    val salted = big.withColumn("__salt",
      pmod(hash(col("row_id")), lit(8)))
    val saltsUsed = salted.select("__salt").distinct().count()
    assert(saltsUsed == 8, s"hot key only spread over $saltsUsed salts")
  }

  test("adaptive salt picks 1 on uniform keys and the plan has no replication") {
    val big = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val small = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    // TPC-H l_orderkey is uniform (≤7 lines/order): no key needs more
    // than one reducer, so the histogram sample must choose salt 1.
    assert(SkewJoin.adaptiveSalt(big, "l_orderkey") == 1)
    val plan = SkewJoin.adaptiveSaltedJoin(big, small,
      key = "l_orderkey", spreadCol = "l_linenumber")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("__salt") && !plan.toLowerCase.contains("explode"),
      s"unskewed path must not replicate the small side:\n$plan")
  }

  test("adaptive salt salts a hot-keyed big side and stays exact") {
    import spark.implicits._
    // 5000 rows of ONE key plus a uniform tail — the shape that needs
    // salting. The sampled share of key 42 is ~5/6, so the decision
    // must be salt > 1.
    val big = ((1 to 5000).map(i => (42L, i)) ++
      (1 to 1000).map(i => (i.toLong % 100, 10000 + i)))
      .toDF("k", "row_id")
    val small = (0L to 100L).map(k => (k, s"dim_$k")).toDF("k", "name")
    assert(SkewJoin.adaptiveSalt(big, "k") > 1,
      "hot key must trigger the salted path")
    val plain = big.join(small, "k")
      .groupBy("name").agg(count(lit(1)).as("n"), sum("row_id").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val adaptive = SkewJoin.adaptiveSaltedJoin(big, small,
      key = "k", spreadCol = "row_id")
      .groupBy("name").agg(count(lit(1)).as("n"), sum("row_id").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(adaptive == plain)
  }

  test("stats sentinel falls back to the fixed probe and still detects skew") {
    import spark.implicits._
    // An RDD-backed relation carries NO size statistics: its plan
    // reports the spark.sql.defaultSizeInBytes sentinel
    // (Long.MaxValue). Pre-fix (ADVICE r8) that inflated estRows
    // until the derived fraction clamped to 1e-6 — an empty sample on
    // this 6000-row hot-keyed input, salt 1, mitigation silently off.
    // The sentinel detector must take the fixed-fraction probe and
    // find the hot key.
    val rows = (1 to 5000).map(i => (42L, i)) ++
      (1 to 1000).map(i => (i.toLong % 100, 10000 + i))
    val big = spark.sparkContext.parallelize(rows, 4).toDF("k", "row_id")
    val size = big.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(size >= BigInt(Long.MaxValue) / 2,
      s"fixture must carry the no-stats sentinel, got $size")
    assert(SkewJoin.adaptiveSalt(big, "k") > 1,
      "sentinel input with a hot key must still salt")
  }

  test("width-scaled sentinel under a wide-row projection is still detected") {
    import spark.implicits._
    // ADVICE r10 test-gap: adaptiveSalt probes big.select(key), and
    // Spark's size-only visitor scales the Project's sizeInBytes by
    // the output/child width ratio. With wide string padding, the
    // projected key column is a small fraction of the row, so the
    // TOP-LEVEL size drops below the Long.MaxValue/2 margin while
    // the LEAF still carries the raw sentinel — the shape only the
    // leaf check catches. This fixture pins that the projected plan
    // is genuinely below the margin (otherwise it would pass with
    // the old top-level-only check too) and that the salt decision
    // still takes the fixed-fraction probe and finds the hot key.
    // NB: must be a Row-RDD LogicalRDD — a tuple-RDD (ExternalRDD)
    // gets its serializer column-pruned, so the Project's width
    // ratio is 1 and the sentinel never scales.
    val pad = "x" * 200
    val rows = (1 to 5000).map(i =>
        org.apache.spark.sql.Row(42L, i, pad, pad + pad)) ++
      (1 to 1000).map(i =>
        org.apache.spark.sql.Row(i.toLong % 100, 10000 + i, pad, pad + pad))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("row_id",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("pad1",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("pad2",
        org.apache.spark.sql.types.StringType)))
    val big = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val margin = BigInt(Long.MaxValue) / 2
    val projected = big.select(col("k")).queryExecution.optimizedPlan
    assert(projected.stats.sizeInBytes < margin,
      s"fixture must width-scale the sentinel below the margin, " +
        s"got ${projected.stats.sizeInBytes}")
    assert(projected.collectLeaves()
      .exists(_.stats.sizeInBytes >= margin),
      "fixture leaf must still carry the raw sentinel")
    assert(SkewJoin.adaptiveSalt(big, "k") > 1,
      "width-scaled sentinel input with a hot key must still salt")
  }
}
