package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.SimilarityQueries

class MinhashSigSpec extends SparkSpec {

  test("native minhash_sig is bit-identical to the composed HOF expression") {
    // Corpus-wide equality: the entire LSH recall contract of the
    // minhash queries rests on the native expression producing the
    // EXACT values of transform/array_min/xxhash64 — check every
    // signature over the real shingle distribution.
    val hashed = Tables.documents(spark, sfDir)
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"),
        expr("transform(array_distinct(transform(" +
          "sequence(1, greatest(size(words) - 2, 1)), " +
          "i -> concat_ws(' ', slice(words, i, 3)))), g -> xxhash64(g))")
          .as("hs"))
    val diff = hashed
      .select(col("doc_id"),
        call_function("minhash_sig", col("hs"), lit(32)).as("fast"),
        SimilarityQueries.minhashSigHof(col("hs"), 32).as("ref"))
      .filter(not(col("fast") <=> col("ref")))
      .count()
    assert(diff == 0)
  }

  test("null and empty inputs yield null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(7L, 8L))),
      (2L, Some(Seq.empty[Long])),
      (3L, Option.empty[Seq[Long]])
    ).toDF("id", "hs")
      .select(col("id"),
        call_function("minhash_sig", col("hs"), lit(4)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!df(1L) && df(2L) && df(3L))
  }

  test("signature length and determinism") {
    import spark.implicits._
    val sigs = Seq((1L, Seq(42L, 43L)), (2L, Seq(42L, 43L)))
      .toDF("id", "hs")
      .select(call_function("minhash_sig", col("hs"), lit(16)).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs.forall(_.length == 16))
    assert(sigs(0) == sigs(1))
  }
}
