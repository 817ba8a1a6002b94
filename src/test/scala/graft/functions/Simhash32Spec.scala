package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{PortableHash, Tables}
import graft.operators.SimilarityQueries

class Simhash32Spec extends SparkSpec {

  test("native simhash32 is bit-identical to the composed vote/pack HOF") {
    val hashed = Tables.documents(spark, sfDir)
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"),
        expr("transform(array_distinct(transform(" +
          "sequence(1, greatest(size(words) - 2, 1)), " +
          "i -> concat_ws(' ', slice(words, i, 3)))), " +
          "g -> cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint))")
          .as("hs"))
    val diff = hashed
      .select(call_function("simhash32", col("hs")).as("fast"),
        SimilarityQueries.simhashHof("hs").as("ref"))
      .filter(not(col("fast") <=> col("ref")))
      .count()
    assert(diff == 0)
  }

  test("known bit pattern: single element votes every set bit") {
    import spark.implicits._
    // one hash → every set bit wins its vote, every clear bit loses;
    // the packed simhash equals the low 32 bits of the input.
    val h = 0xDEADBEEFL
    val got = Seq(Tuple1(Seq(h))).toDF("hs")
      .select(call_function("simhash32", col("hs")))
      .head().getLong(0)
    assert(got == (h & 0xFFFFFFFFL))
  }

  test("null and empty inputs yield null; null elements are skipped") {
    import spark.implicits._
    val out = Seq(
      (1L, Some(Seq(Some(7L), None))),
      (2L, Some(Seq.empty[Option[Long]])),
      (3L, Option.empty[Seq[Option[Long]]])
    ).toDF("id", "hs")
      .select(col("id"), call_function("simhash32", col("hs")).as("sh"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(out(2L).isEmpty && out(3L).isEmpty)
    assert(out(1L).contains(7L & 0xFFFFFFFFL))
  }
}
