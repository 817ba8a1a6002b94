package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{PortableHash, Tables}

class Md5Hash60Spec extends SparkSpec {

  test("native md5_hash60 equals the composed builtin spelling") {
    // Over real key and word distributions — the oracle contract
    // (DuckDB's ('0x'||substr(md5(x),1,15))::BIGINT) hangs off this.
    val keys = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("v"))
    val words = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("v"))
    for (df <- Seq(keys, words)) {
      val diff = df.select(
        PortableHash.md5Hash60(col("v")).as("fast"),
        PortableHash.md5Hash60Composed(col("v")).as("ref"))
        .filter(not(col("fast") <=> col("ref")))
        .count()
      assert(diff == 0)
    }
  }

  test("known value matches an independently computed digest") {
    import spark.implicits._
    // md5("42") = a1d0c6e83f027327d8461063f4ac58a6; the hash is the
    // first 15 hex chars read base-16.
    val expected = java.lang.Long.parseLong("a1d0c6e83f02732", 16)
    val got = Seq("42").toDF("v")
      .select(PortableHash.md5Hash60(col("v")))
      .head().getLong(0)
    assert(got == expected)
  }

  test("null in, null out") {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("v")
      .select(PortableHash.md5Hash60(col("v")))
      .head()
    assert(r.isNullAt(0))
  }
}
