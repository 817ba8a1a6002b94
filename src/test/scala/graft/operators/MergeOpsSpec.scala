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
}
