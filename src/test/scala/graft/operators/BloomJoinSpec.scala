package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class BloomJoinSpec extends SparkSpec {

  test("bloom pre-filter reduces rows, never drops a true match") {
    val dim = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = BloomJoin.buildBloom(dim, "o_orderkey",
      math.max(dim.count(), 1L))
    val big = Tables.lineitem(spark, sfDir).select(col("l_orderkey"))
    val total = big.count()
    val pruned = big.filter(BloomJoin.mightContain(bloom, col("l_orderkey")))
    val trueMatches = big.join(
      dim.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi").count()
    val prunedCount = pruned.count()
    // no false negatives (the bloom contract), real reduction (the
    // point of the operator): urgent orders are ~1/5 of lineitem
    assert(prunedCount >= trueMatches,
      s"bloom must never drop a true match: $prunedCount < $trueMatches")
    assert(prunedCount < total,
      s"bloom must actually prune: $prunedCount of $total")
    // with a correctly-sized filter, false positives are a small
    // fraction of the pass-through set
    assert(prunedCount <= trueMatches + total / 10,
      s"false-positive flood: $prunedCount vs $trueMatches true")
  }

  test("bloom semi-join equals the plain semi-join exactly") {
    val got = BloomJoin.j7BloomSemi(spark, sfDir).head()
    val exp = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_semi")
      .agg(count(lit(1)),
        sum(col("l_quantity").cast("long")).cast("long"),
        sum(round(col("l_extendedprice") * 100).cast("long")).cast("long"))
      .head()
    assert(got.getLong(0) == exp.getLong(0))
    assert(got.getLong(1) == exp.getLong(1))
    assert(got.getLong(2) == exp.getLong(2))
  }

  test("might_contain evaluates in the fact scan stage, before the join") {
    val plan = BloomJoin.j7BloomSemi(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom predicate missing from plan:\n$plan")
    // the predicate must sit BELOW the semi-join (filter feeding the
    // scan side), not above it: find the join line and check a
    // might_contain Filter appears after it in the printed tree
    val lines = plan.linesIterator.toVector
    val joinIdx = lines.indexWhere(_.contains("LeftSemi"))
    val filterIdx = lines.indexWhere(_.contains("might_contain"))
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      s"might_contain must be under the semi-join:\n$plan")
  }
}
