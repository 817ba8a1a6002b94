package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{PortableHash, Tables}

class MergeOpsSpec extends SparkSpec {

  test("merge partitions rows into kept/updated/inserted consistently") {
    val orders = Tables.orders(spark, sfDir)
    val nOrders = orders.count()
    val byH = orders
      .withColumn("h", PortableHash.md5Hash60(col("o_orderkey")) % 10L)
    val nUpd = byH.filter(col("h") < 3).count()
    val nIns = byH.filter(col("h") === 0).count()

    val out = MergeOps.m10MergeUpsert(spark, sfDir).cache()
    val counts = out.groupBy("action").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("updated", 0L) == nUpd)
    assert(counts.getOrElse("inserted", 0L) == nIns)
    assert(counts.getOrElse("kept", 0L) == nOrders - nUpd)
    assert(out.count() == nOrders + nIns)
  }

  test("merge result has unique keys and no null prices") {
    val out = MergeOps.m10MergeUpsert(spark, sfDir).cache()
    assert(out.select("o_orderkey").distinct().count() == out.count())
    assert(out.filter(col("price_cents").isNull).count() == 0)
  }

  test("updated rows carry the re-priced value") {
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("base_cents"))
    val bad = MergeOps.m10MergeUpsert(spark, sfDir)
      .filter(col("action") === "updated")
      .join(base, "o_orderkey")
      .filter(col("price_cents") =!= col("base_cents") + 10000L)
      .count()
    assert(bad == 0)
  }

  test("incremental agg merge is indistinguishable from a full " +
    "recompute, and both partitions contribute") {
    val li = Tables.lineitem(spark, sfDir)
    val full = li
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_extendedprice")).cast("long").as("usd"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("usd")).as("sum_usd"),
        sum(col("usd") * col("usd")).as("sumsq_usd"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val got = MergeOps.m11IncrAgg(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(got.keySet == full.keySet)
    got.foreach { case (k, (n, s1, s2, avg)) =>
      assert((n, s1, s2) == full(k), s"state+delta merge drift at $k")
      assert(avg == s1.toDouble / n.toDouble)
    }
    // fixture: the split really divides the data (else the test
    // degenerates to a plain aggregate)
    val nOld = li.filter(col("l_shipdate") <
      lit(MergeOps.IncrAggSplit)).count()
    val nNew = li.filter(col("l_shipdate") >=
      lit(MergeOps.IncrAggSplit)).count()
    assert(nOld > 0 && nNew > 0, s"split fixture: $nOld / $nNew")
  }
}
