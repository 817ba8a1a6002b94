package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multi-dimensional OLAP shapes the relational surface was still
  * missing: CUBE/grouping-sets aggregation, market-basket pair
  * mining (the co-occurrence census behind association rules), and
  * gap-filled time series with last-observation-carried-forward.
  *
  * Common discipline: every emitted measure is exact integer (cents
  * / counts) so the DuckDB oracle hash-compares exactly, and every
  * shuffle keys on the aggregation key itself — no driver loops, no
  * cartesians, bounded per-key fanout everywhere.
  */
object OlapQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Money at exact integer cents (the repo-wide determinism rule). */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  // =================================================================
  // x26_cube — CUBE aggregation with grouping markers
  // =================================================================

  /** Full CUBE over (l_returnflag, l_linestatus): per-cell, per-flag,
    * per-status and grand-total rows in ONE pass, tagged with
    * `grouping_id` so consumers can tell a real NULL from a rollup
    * NULL — the warehouse "totals + subtotals in one scan" staple.
    *
    * 100 TB shape: Catalyst plans CUBE as a single Expand (4 rows per
    * input here) feeding ONE two-phase HashAggregate — partial maps
    * collapse each grouping set locally, so the exchange carries at
    * most |cells| × 4 rows, not 4× the fact table. The alternative
    * (4 separate scans unioned) reads the data 4 times; this reads
    * it once. */
  def x26Cube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("disc_price"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_rows"),
        sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
        sum(cents(col("disc_price"))).as("revenue_c"))

  // =================================================================
  // x27_copurchase — market-basket pair mining
  // =================================================================

  /** Pairs must co-occur in at least this many orders to be emitted
    * (interpolated into the oracle SQL — single source of truth). */
  val MinPairSupport = 2

  /** Frequent co-purchased part pairs: for every order, every
    * unordered pair of distinct parts it contains; pairs kept at
    * support ≥ [[MinPairSupport]], enriched with each part's own
    * order frequency (the inputs to confidence/lift in association
    * mining — left as exact counts so the oracle hash-matches).
    *
    * 100 TB shape: the pair generator is a self-equi-join of the
    * distinct (order, part) table on orderkey — Spark reuses one
    * exchange for both sides (ReuseExchange), and the fanout per
    * order is bounded by its basket size (≤ 13 parts ⇒ ≤ 78 pairs
    * here; baskets are small by nature). The pair census then
    * shuffles on the (p1, p2) key. Item frequencies are a census
    * bounded by |part| — dimension-sized, so broadcast back onto the
    * pair table; on a catalog too big to broadcast this join falls
    * back to sort-merge on p1/p2 and nothing else changes. */
  def x27Copurchase(s: SparkSession, dir: String): DataFrame = {
    val items = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= MinPairSupport)
    val freq = items.groupBy(col("p")).agg(count(lit(1)).as("item_n"))
    pairs
      .join(broadcast(freq.select(col("p").as("p1"),
        col("item_n").as("n1"))), "p1")
      .join(broadcast(freq.select(col("p").as("p2"),
        col("item_n").as("n2"))), "p2")
      .select(col("p1"), col("p2"), col("pair_n"), col("n1"),
        col("n2"))
  }

  // =================================================================
  // e7_gapfill — gap-filled hourly series with LOCF
  // =================================================================

  /** Gap-filled hourly revenue per event type: a dense hour spine
    * from each type's first to last observed hour, missing hours
    * filled by last-observation-carried-forward — the resample +
    * fill-forward every metrics pipeline runs before charting or
    * feature-extraction.
    *
    * 100 TB shape: the hourly pre-aggregation is the only full-data
    * shuffle and it shrinks events to ≤ |types| × |hours| rows. The
    * spine is generated from the per-type min/max (one tiny agg) via
    * `sequence` explode — map-side, never a range join. The LOCF
    * window partitions by event_type over hour-count-bounded
    * partitions (~9k rows/year each), so the per-partition sort is
    * trivial; with an unbounded key universe you'd range-repartition
    * the spine first, same plan otherwise. */
  def e7Gapfill(s: SparkSession, dir: String): DataFrame = {
    val hourNs = TemporalQueries.HourNs
    val hourly = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), expr(s"ts div $hourNs").as("hb"),
        cents(col("value")).as("c"))
      .groupBy(col("event_type"), col("hb"))
      .agg(sum(col("c")).as("obs_c"))
    val spine = hourly.groupBy(col("event_type"))
      .agg(min(col("hb")).as("mn"), max(col("hb")).as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"))).as("hb"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "hb"), "left")
      .select(col("event_type"), col("hb"),
        last(col("obs_c"), ignoreNulls = true).over(w)
          .as("filled_c"),
        col("obs_c").isNull.as("is_gap"))
  }

  val queries: Map[String, Q] = Map(
    "x26_cube" -> (x26Cube _),
    "x27_copurchase" -> (x27Copurchase _),
    "e7_gapfill" -> (e7Gapfill _)
  )

  val oracle: Map[String, String] = Map(
    "x26_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | count(*) AS n_rows,
        | CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |   AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
        |   * 100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "x27_copurchase" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS o,
         |   l_partkey AS p FROM lineitem),
         |freq AS (SELECT p, count(*) AS item_n FROM items GROUP BY p),
         |pairs AS (SELECT a.p AS p1, b.p AS p2, count(*) AS pair_n
         | FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
         | GROUP BY a.p, b.p
         | HAVING count(*) >= $MinPairSupport)
         |SELECT p1, p2, pair_n, f1.item_n AS n1, f2.item_n AS n2
         |FROM pairs
         |JOIN freq f1 ON p1 = f1.p
         |JOIN freq f2 ON p2 = f2.p""".stripMargin,
    "e7_gapfill" ->
      s"""WITH hourly AS (SELECT event_type,
         |   epoch_ns(ts) // ${TemporalQueries.HourNs} AS hb,
         |   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         |     AS obs_c
         | FROM events WHERE value IS NOT NULL
         | GROUP BY event_type, hb),
         |spine AS (SELECT event_type,
         |   unnest(generate_series(mn, mx)) AS hb
         | FROM (SELECT event_type, min(hb) AS mn, max(hb) AS mx
         |       FROM hourly GROUP BY event_type))
         |SELECT s.event_type, s.hb,
         | last_value(h.obs_c IGNORE NULLS) OVER (
         |   PARTITION BY s.event_type ORDER BY s.hb) AS filled_c,
         | h.obs_c IS NULL AS is_gap
         |FROM spine s
         |LEFT JOIN hourly h
         |  ON s.event_type = h.event_type AND s.hb = h.hb""".stripMargin
  )
}
