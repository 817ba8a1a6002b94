package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The engine's oracle determinism claim, tested directly: results
  * must be IDENTICAL (not just close) under different input
  * partitionings — the property that makes hash-compare correctness
  * possible across cluster sizes (a 1000-executor run partitions
  * nothing like local[4]).
  */
class DeterminismSpec extends SparkSpec {

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case d: Double => java.lang.Double.doubleToLongBits(d) // bitwise
      case x => x
    }.toSeq).toSeq.sortBy(_.mkString("|"))

  test("cents-sum aggregates are bitwise stable across partitionings") {
    def run(parts: Int) = canon(
      Tables.lineitem(spark, sfDir).repartition(parts)
        .filter(col("l_quantity") > 5.0)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("sum_qty"),
          avg(col("l_quantity")).as("avg_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("cents")))
    assert(run(2) == run(17))
  }

  test("a raw double sum is NOT stable — the trap the cents trick avoids") {
    def rawSum(parts: Int) =
      Tables.lineitem(spark, sfDir).repartition(parts)
        .agg(sum(col("l_extendedprice"))).head().getDouble(0)
    // Not asserted unstable (it can coincide), but the exact cents
    // path must be invariant while this one is merely approximately
    // equal — document the contrast.
    val a = rawSum(2)
    val b = rawSum(17)
    assert(math.abs(a - b) / math.abs(a) < 1e-9,
      "raw sums should at least be close")
  }

  test("quantize-then-sum centroids are bitwise stable across " +
    "partitionings — the order sim_centroids fixes") {
    def run(parts: Int) = canon(
      Tables.embeddings(spark, sfDir).repartition(parts)
        .select(col("label"), posexplode(col("embedding")))
        .select(col("label"), col("pos"),
          round(col("col").cast("double") *
            SimilarityQueries.CentroidScale).cast("long").as("q"))
        .groupBy(col("label"), col("pos"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_q")))
    assert(run(2) == run(13))
  }

  test("windowed running totals are stable across partitionings") {
    import org.apache.spark.sql.expressions.Window
    def run(parts: Int) = canon {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(spark, sfDir).repartition(parts)
        .select(col("o_orderkey"),
          sum(round(col("o_totalprice") * 100).cast("long")).over(w)
            .as("rc"))
    }
    assert(run(3) == run(13))
  }

  test("delta-ingest decisions are identical across shuffle " +
      "partitionings — the warm-start serve is a data property too") {
    def run(parts: String) = {
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try PipelineQueries.pipeDeltaIngest(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getString(2)))
        .sortBy(_._1).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    }
    val a = run("3")
    val b = run("19")
    assert(a == b, s"decisions diverge under repartitioning: " +
      s"${a.diff(b).take(3)} vs ${b.diff(a).take(3)}")
    assert(a.nonEmpty)
  }

  test("avg-derived threshold cuts (q17/q11/q22) are row-identical " +
      "across shuffle partitionings — exact integer partials make " +
      "the double avg deterministic") {
    // The three closing TPC-H shapes filter on a double computed
    // from an aggregate (0.2·avg(qty), 1.5·avg(cents), avg(cents)).
    // Whole-number/integer inputs keep every partial sum exact, so
    // the threshold — and therefore the kept SET, not just the
    // totals — must be invariant under aggregation partitioning.
    def run(parts: String)(q: => DataFrame) = {
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try canon(q)
      finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    }
    for ((name, q) <- Seq[(String, () => DataFrame)](
        "q17" -> (() => RelationalQueries.q17SmallQtyRevenue(spark, sfDir)),
        "q11" -> (() => RelationalQueries.q11ImportantParts(spark, sfDir)),
        "q22" -> (() => RelationalQueries.q22SalesOpportunity(spark, sfDir)))) {
      val a = run("3")(q())
      val b = run("19")(q())
      assert(a == b, s"$name diverges under repartitioning")
      assert(a.nonEmpty, s"$name must keep rows at smoke SF")
    }
  }
}
