package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class TopKPerGroupSpec extends SparkSpec {

  private def base = Tables.lineitem(spark, sfDir)
    .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"))

  private def viaCustom(k: Int) =
    TopKPerGroup(base, Seq("l_suppkey"), "cents",
      descending = true, Seq("l_orderkey", "l_linenumber"), k)

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("cents").desc, col("l_orderkey"), col("l_linenumber"))
    base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  test("custom operator selects exactly the window formulation's rows") {
    for (k <- Seq(1, 3, 10)) {
      val custom = viaCustom(k).collect().map(_.toSeq).toSet
      val window = viaWindow(k).collect().map(_.toSeq).toSet
      assert(custom == window, s"k=$k mismatch")
    }
  }

  test("plan uses the custom exec twice (partial+final) and never sorts") {
    val plan = viaCustom(3).queryExecution.executedPlan
    val str = plan.toString
    // nodeName strips the Exec suffix: the exec prints as TopKPerGroup
    assert(str.contains("TopKPerGroup"),
      s"custom exec missing from plan:\n$str")
    // partial before the exchange, final after
    assert("TopKPerGroup \\[".r.findAllIn(str).length == 2, str)
    assert(!str.contains("Window"), s"window exec leaked into plan:\n$str")
    assert(!str.contains("Sort "), s"sort leaked into plan:\n$str")
  }

  test("a tiny partial-group cap forces flushes without changing results") {
    // cap=1 drains the partial heap map on nearly every new key, so
    // the interleaved flush path (lazy emit during consumption) is
    // exercised thousands of times; results must equal the window
    // formulation exactly at any cap.
    val window = viaWindow(3).collect().map(_.toSeq).toSet
    for (cap <- Seq(1, 2, 7)) {
      val custom = TopKPerGroup(base, Seq("l_suppkey"), "cents",
        descending = true, Seq("l_orderkey", "l_linenumber"), k = 3,
        maxPartialGroups = cap)
        .collect().map(_.toSeq).toSet
      assert(custom == window, s"cap=$cap mismatch")
    }
  }

  test("groups smaller than k return all their rows") {
    val perGroup = base.groupBy("l_suppkey").count()
    val small = perGroup.agg(min("count")).head().getLong(0)
    // k larger than every group → operator degenerates to identity
    val k = 100000
    assert(viaCustom(k).count() == base.count(),
      s"k=$k should keep everything (smallest group $small)")
  }
}
