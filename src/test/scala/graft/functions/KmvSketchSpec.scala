package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class KmvSketchSpec extends SparkSpec {

  test("estimate within ~3/sqrt(k) of exact distinct counts") {
    val li = Tables.lineitem(spark, sfDir)
    val r = li.agg(
      KmvSketch.approxDistinct(xxhash64(col("l_partkey"))).as("est_part"),
      countDistinct(col("l_partkey")).as("n_part"),
      KmvSketch.approxDistinct(xxhash64(col("l_orderkey"))).as("est_ord"),
      countDistinct(col("l_orderkey")).as("n_ord")).head()
    val tol = 3.0 / math.sqrt(KmvSketch.K) // ~0.19
    for ((est, exact) <- Seq((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))) {
      val err = math.abs(est - exact).toDouble / exact
      assert(err < tol, s"KMV err $err (est $est vs $exact)")
    }
  }

  test("small domains are counted exactly (below k)") {
    val r = Tables.orders(spark, sfDir).agg(
      KmvSketch.approxDistinct(xxhash64(col("o_orderstatus")))
        .as("est")).head()
    assert(r.getLong(0) == 3L)
  }

  test("sketches merge across groups like a re-aggregation") {
    // Per-group sketches whose merged finish ~ global distinct: the
    // mergeability property a 100 TB incremental pipeline relies on.
    val li = Tables.lineitem(spark, sfDir)
    val global = li.agg(
      KmvSketch.approxDistinct(xxhash64(col("l_partkey")))).head()
      .getLong(0)
    // Aggregate in two stages: per returnflag, then overall — udaf
    // merge path must land on the same estimate as the single pass.
    val twoStage = li
      .groupBy(col("l_returnflag"))
      .agg(collect_list(xxhash64(col("l_partkey"))).as("hs"))
      .select(explode(col("hs")).as("h"))
      .agg(KmvSketch.approxDistinct(col("h"))).head().getLong(0)
    assert(global == twoStage)
  }

  test("set algebra: union/intersection estimates vs exact ground " +
    "truth; exact branch below k") {
    import graft.core.PortableHash
    val bits = PortableHash.Bits
    val li = Tables.lineitem(spark, sfDir)
    def keysWhere(c: org.apache.spark.sql.Column): Set[Long] =
      li.filter(c).select(col("l_partkey")).distinct()
        .collect().map(_.getLong(0)).toSet
    val heavy = keysWhere(col("l_quantity") > 25)
    val light = keysWhere(!(col("l_quantity") > 25))
    val sk = li.select((col("l_quantity") > 25).as("hv"),
        PortableHash.md5Hash60(col("l_partkey")).as("h"))
      .groupBy(col("hv"))
      .agg(KmvSketch.sketchOf(col("h")).as("sk"))
      .collect().map(r => r.getBoolean(0) ->
        r.getSeq[Long](1).toArray).toMap
    val (a, b) = (sk(true), sk(false))
    val tol = 4.0 / math.sqrt(KmvSketch.K)
    def check(est: Long, exact: Int, what: String): Unit = {
      if (exact < KmvSketch.K) // exact branches must be EQUAL
        assert(est == exact.toLong, s"$what: $est != $exact")
      else assert(math.abs(est - exact).toDouble / exact < tol,
        s"$what: $est vs $exact")
    }
    check(KmvSketch.estimateOf(a, bits), heavy.size, "heavy")
    check(KmvSketch.estimateOf(b, bits), light.size, "light")
    check(KmvSketch.estimateOf(KmvSketch.unionOf(a, b), bits),
      (heavy ++ light).size, "union")
    val interExact = (heavy & light).size
    val interEst = KmvSketch.intersectEstimate(a, b, bits)
    if ((heavy ++ light).size < KmvSketch.K)
      assert(interEst == interExact.toLong)
    else // intersection error scales by union/intersection ratio
      assert(math.abs(interEst - interExact) <=
        math.max(5.0, tol * (heavy ++ light).size),
        s"intersect: $interEst vs $interExact")
  }
}
