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
}
