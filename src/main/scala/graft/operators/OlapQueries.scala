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
    // fanOut: the Expand×4 + partial aggregate would otherwise run
    // inside the single-row-group scan task
    Tables.fanOut(Tables.lineitem(s, dir), "l_orderkey")
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
    * back to sort-merge on p1/p2 and nothing else changes.
    *
    * The pair self-join + census is the SAME subtree g6_triangles
    * builds its edge set from, so both scan twins read one memoized
    * checkpoint ([[GraphQueries.basketPairCensus]], VERDICT r16 task
    * #4) — derived purely from lineitem, so this twin still
    * certifies the persisted graph index independently. */
  def x27Copurchase(s: SparkSession, dir: String): DataFrame = {
    val pairs = GraphQueries.basketPairCensus(s, dir)
      .select(col("u").as("p1"), col("v").as("p2"), col("pair_n"))
      .filter(col("pair_n") >= MinPairSupport)
    val freq = GraphQueries.basketItems(s, dir)
      .groupBy(col("p")).agg(count(lit(1)).as("item_n"))
    pairs
      .join(broadcast(freq.select(col("p").as("p1"),
        col("item_n").as("n1"))), "p1")
      .join(broadcast(freq.select(col("p").as("p2"),
        col("item_n").as("n2"))), "p2")
      .select(col("p1"), col("p2"), col("pair_n"), col("n1"),
        col("n2"))
  }

  /** x27's serve twin off the persisted co-purchase graph index
    * (VERDICT r15 task #1): the basket self-join over lineitem —
    * the expensive subtree — ran once at index build; serving
    * re-sums the base/delta PARTIAL pair counts by (p1, p2) (they
    * are additive over the order-keyed split) and applies the
    * support filter, and item frequencies re-sum the same way. The
    * serve plan reads the two edge-sized index tables alone —
    * lineitem is absent (GraphIndexSpec asserts this) — and the
    * shared scan-semantics oracle certifies the persisted content
    * end-to-end. */
  def x27CopurchaseIndexed(s: SparkSession, dir: String): DataFrame = {
    val gp = graft.sources.IndexStore.ensureGraphEdges(s, dir)
    val pairs = s.read.parquet(gp.pairs)
      .groupBy(col("u").as("p1"), col("v").as("p2"))
      .agg(sum(col("pair_n")).cast("long").as("pair_n"))
      .filter(col("pair_n") >= MinPairSupport)
    val freq = s.read.parquet(gp.freq)
      .groupBy(col("p")).agg(sum(col("item_n")).cast("long").as("item_n"))
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

  // =================================================================
  // x28_corr_matrix — exact-sums Pearson correlation
  // =================================================================

  /** Pearson correlations between lineitem measures from EXACT
    * integer moment sums: quantize each measure to a long first
    * (qty as units, price as whole dollars, discount/tax as
    * per-mille), accumulate Σx, Σy, Σxy, Σx², Σy² as associative
    * long sums in ONE pass, then derive r = (nΣxy − ΣxΣy) /
    * (√(nΣx²−Σx²)·√(nΣy²−Σy²)) — both engines evaluate the SAME
    * IEEE expression on identical integers, so even the double is
    * hash-stable. `corr()` itself streams doubles and is
    * partitioning-dependent; the moment-sum reformulation is the
    * deterministic (and single-pass, map-side-combining) form.
    *
    * Dollar/per-mille quantization keeps Σxy ≤ ~5e6 per row —
    * long-safe past 1e11 rows; at larger scales promote the moment
    * sums to decimal(38,0), same plan. Output: one row per measure
    * pair with the raw moments (auditable) and r. */
  def x28CorrMatrix(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(s, dir).select(
      round(col("l_quantity")).cast("long").as("qty"),
      round(col("l_extendedprice")).cast("long").as("usd"),
      round(col("l_discount") * 1000).cast("long").as("disc_pm"),
      round(col("l_tax") * 1000).cast("long").as("tax_pm"))
    val pairs = Seq(("qty", "usd"), ("qty", "disc_pm"),
      ("usd", "tax_pm"))
    val aggs = count(lit(1)).as("n") +: pairs.flatMap { case (x, y) =>
      Seq(sum(col(x)).as(s"sx_${x}_$y"),
        sum(col(y)).as(s"sy_${x}_$y"),
        sum(col(x) * col(y)).as(s"sxy_${x}_$y"),
        sum(col(x) * col(x)).as(s"sxx_${x}_$y"),
        sum(col(y) * col(y)).as(s"syy_${x}_$y"))
    }
    val wide = base.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (x, y) =>
      s"struct('${x}__$y' AS pair, sx_${x}_$y AS sx, " +
        s"sy_${x}_$y AS sy, sxy_${x}_$y AS sxy, " +
        s"sxx_${x}_$y AS sxx, syy_${x}_$y AS syy)"
    }.mkString(", ")
    wide.selectExpr("n", s"inline(array($stacked))")
      .select(col("pair"), col("n"), col("sx"), col("sy"),
        col("sxy"), col("sxx"), col("syy"),
        // cast BEFORE combining: n·Σy² overflows int64 (1.3e19 at
        // sf0.01 already); double products of exact ints are the
        // same IEEE values in both engines
        ((col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (sqrt(col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) *
            sqrt(col("n").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))))
          .as("r"))
  }

  // =================================================================
  // x29_scd2_build — state-change interval construction
  // =================================================================

  /** BUILDS the SCD2 history x24 consumes: collapse each user's
    * time-ordered event stream into maximal runs of one event_type
    * (gaps-and-islands), one interval row per run with its start,
    * end (the next run's start; open for the live run) and event
    * count — the change-data-capture compaction every warehouse
    * applies to entity snapshots. Microsecond timeline (DuckDB reads
    * parquet NANOS at µs); (ts, event_id) total order makes run
    * boundaries deterministic.
    *
    * 100 TB shape: both windows partition by user_id — the natural
    * entity key, millions of small partitions, no global sort. The
    * run-id is a per-user cumulative sum of change flags (lag ≠
    * current), the canonical islands id; the run table then shrinks
    * to |runs| rows before the lead() window assigns closing
    * timestamps. One shuffle key (user_id) serves flag, census and
    * lead stages. */
  def x29Scd2Build(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
    val flagged = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("t"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byUser)
          .isNull.or(lag(col("event_type"), 1).over(byUser)
            =!= col("event_type")), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("t"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = flagged.groupBy(col("user_id"), col("run_id"))
      .agg(min(col("event_type")).as("state"), // constant per run
        min(col("t")).as("valid_from"),
        count(lit(1)).as("n_events"))
    runs.withColumn("valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("valid_from"), col("run_id"))))
      .select(col("user_id"), col("run_id"), col("state"),
        col("valid_from"), col("valid_to"), col("n_events"))
  }

  // =================================================================
  // p14_skew_profile — join-key skew diagnostics
  // =================================================================

  /** Heavy keys reported by the skew profile. */
  val SkewTopK = 10

  /** Join-key skew diagnostics for l_partkey: the [[SkewTopK]]
    * heaviest keys, each carrying the global census stats a
    * planner's skew decision needs — key count, row count, max/median
    * per-key multiplicity (×2-integer median), and the skew ratio
    * max·n_keys·1000 div n_rows (1000 ≈ uniform) — the measurement
    * step behind SkewJoin's salting decision, exposed as an operator.
    *
    * 100 TB shape: the census shuffles once on the key; every
    * downstream stat is computed over |keys| rows, and the top-k is
    * TakeOrderedAndProject (partial heaps), never a global sort. The
    * single-row stats broadcast back onto k rows. */
  def p14SkewProfile(s: SparkSession, dir: String): DataFrame = {
    val census = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    val stats = census.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"),
      round(expr("percentile(cnt, 0.5)") * 2).cast("long")
        .as("med_cnt_x2"))
    census.orderBy(col("cnt").desc, col("l_partkey")).limit(SkewTopK)
      .crossJoin(broadcast(stats))
      .select(col("l_partkey"), col("cnt"), col("n_keys"),
        col("n_rows"), col("max_cnt"), col("med_cnt_x2"),
        expr("max_cnt * n_keys * 1000 div n_rows").as("skew_pm"))
  }

  // =================================================================
  // x31_exact_median_2pass — distributed exact selection
  // =================================================================

  /** Coarse histogram bucket width (cents) for the two-pass exact
    * median. Range/width ≈ 11k buckets on this corpus — census
    * scale. */
  val MedianBucketWidth = 1024L

  /** EXACT global median in two scans and bounded memory — the
    * 100 TB replacement for `percentile(c, 0.5)`, whose per-group
    * sort materializes the whole column. Distributed selection:
    * (1) coarse value-histogram census (range/[[MedianBucketWidth]]
    * buckets) + a running count locates the bucket(s) holding the
    * k-th elements; (2) a value census WITHIN those ≤ 2 buckets
    * (≤ width distinct values each) ranks exactly. Lower+upper
    * medians summed (×2) keep the even-count midpoint integer.
    *
    * Scale shape: two scans, shuffles keyed by bucket/value; the
    * only SinglePartition window is over the bounded bucket census
    * (the x20 discipline); target ranks and selected buckets travel
    * as 1-or-2-row broadcasts. An all-ranks generalization is the
    * same plan with k a column instead of a literal pair. */
  def x31ExactMedian2pass(s: SparkSession, dir: String): DataFrame = {
    val w = MedianBucketWidth
    val vals = Tables.lineitem(s, dir)
      .select(cents(col("l_extendedprice")).as("c"))
    val nrow = vals.agg(count(lit(1)).as("n"))
      .select(col("n"), expr("(n + 1) div 2").as("k1"),
        expr("(n + 2) div 2").as("k2"))
    val census = vals.groupBy(expr(s"c div $w").as("b"))
      .agg(count(lit(1)).as("bn"))
    val cw = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val coarse = census
      .withColumn("cumb", coalesce(sum(col("bn")).over(cw), lit(0L)))
    val sel = coarse.crossJoin(broadcast(nrow))
      .filter((col("cumb") < col("k1") &&
          col("k1") <= col("cumb") + col("bn")) ||
        (col("cumb") < col("k2") &&
          col("k2") <= col("cumb") + col("bn")))
      .select(col("b"), col("cumb"))
    val fw = Window.partitionBy(col("b")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = vals.withColumn("b", expr(s"c div $w"))
      .join(broadcast(sel), "b")
      .groupBy(col("b"), col("cumb"), col("c"))
      .agg(count(lit(1)).as("vn"))
      .withColumn("rb",
        col("cumb") + coalesce(sum(col("vn")).over(fw), lit(0L)))
      .crossJoin(broadcast(nrow))
    val v1 = ranked
      .filter(col("rb") < col("k1") &&
        col("k1") <= col("rb") + col("vn"))
      .select(col("n"), col("c").as("v1"))
    val v2 = ranked
      .filter(col("rb") < col("k2") &&
        col("k2") <= col("rb") + col("vn"))
      .select(col("c").as("v2"))
    v1.crossJoin(v2)
      .select(col("n"), (col("v1") + col("v2")).as("med_c_x2"))
  }

  /** Per-mille quantile probes for [[x32QuantileBands]]. */
  val QuantileBandsPm: Seq[Int] = Seq(250, 500, 750, 950, 990)

  /** The all-ranks generalization [[x31ExactMedian2pass]] promises:
    * EXACT type-1 quantiles (value at rank ⌈p·n⌉) for the whole
    * [[QuantileBandsPm]] band set in the SAME two scans — k becomes
    * a column, nothing else changes. The coarse census is joined
    * against the broadcast rank table to pick each rank's bucket;
    * the fine in-bucket census resolves every rank exactly. Output
    * (p_pm, k, val) stays all-integer; the oracle derives the same
    * ranks with an explicit row_number selection.
    *
    * Scale shape: identical to x31 — the rank table is |bands| rows,
    * the selected-buckets broadcast ≤ |bands| rows, and the fine
    * pass reads only those buckets' rows. percentile(array(...)) on
    * the same data would sort every group in memory; approx twins
    * trade exactness; this is the exact-AND-bounded plan. */
  def x32QuantileBands(s: SparkSession, dir: String): DataFrame = {
    val w = MedianBucketWidth
    val vals = Tables.lineitem(s, dir)
      .select(cents(col("l_extendedprice")).as("c"))
    val ks = vals.agg(count(lit(1)).as("n"))
      .select(col("n"), explode(array(
        QuantileBandsPm.map(p => lit(p)): _*)).as("p_pm"))
      .select(col("p_pm"),
        expr("(n * p_pm + 999) div 1000").as("k"))
    val census = vals.groupBy(expr(s"c div $w").as("b"))
      .agg(count(lit(1)).as("bn"))
    val cw = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val coarse = census
      .withColumn("cumb", coalesce(sum(col("bn")).over(cw), lit(0L)))
    val sel = coarse.crossJoin(broadcast(ks))
      .filter(col("cumb") < col("k") &&
        col("k") <= col("cumb") + col("bn"))
      .select(col("b"), col("cumb"), col("p_pm"), col("k"))
    val buckets = sel.select(col("b"), col("cumb")).distinct()
    val fw = Window.partitionBy(col("b")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = vals.withColumn("b", expr(s"c div $w"))
      .join(broadcast(buckets), "b")
      .groupBy(col("b"), col("cumb"), col("c"))
      .agg(count(lit(1)).as("vn"))
      .withColumn("rb",
        col("cumb") + coalesce(sum(col("vn")).over(fw), lit(0L)))
    ranked.join(broadcast(sel.select(col("b"), col("p_pm"),
        col("k"))), "b")
      .filter(col("rb") < col("k") &&
        col("k") <= col("rb") + col("vn"))
      .select(col("p_pm"), col("k"), col("c").as("val"))
  }

  // =================================================================
  // p15_impute — group-median null imputation
  // =================================================================

  /** Null repair by group statistic: every null `value` filled with
    * its event_type's median (integer floor of the ×2-exact median,
    * so both engines agree bit-for-bit), original kept alongside and
    * the repair flagged — the imputation step every feature pipeline
    * runs before training, with the provenance column that makes it
    * auditable. The driver corpus happens to be null-free (the
    * oracle then pins the fill expression and flags), so the
    * null-repair path itself is exercised by the planted-null
    * spec.
    *
    * 100 TB shape: the median table is |types| rows (broadcast); the
    * fill itself is map-side coalesce. Exact per-group medians
    * assume per-group sort fits the executor (the x8/x8b twin rule);
    * with unbounded groups swap in the x31/x32 two-pass selection —
    * same broadcast join, same fill. */
  def p15Impute(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        when(col("value").isNotNull, cents(col("value"))).as("c"))
    val med = ev.filter(col("c").isNotNull)
      .groupBy(col("event_type"))
      // `div` truncates toward zero — the SAME semantics as the
      // oracle's `//` (measured: DuckDB -7 // 2 = -3), so the halved
      // median agrees for either sign; shiftright would FLOOR and
      // silently diverge on negative odd x2-medians
      .agg(expr("CAST(round(percentile(c, 0.5) * 2) AS BIGINT) div 2")
        .as("med_c"))
    ev.join(broadcast(med), "event_type")
      .select(col("event_id"), col("event_type"), col("c"),
        coalesce(col("c"), col("med_c")).as("filled_c"),
        col("c").isNull.as("was_imputed"))
  }

  // =================================================================
  // p16_benford — first-digit distribution vs Benford's law
  // =================================================================

  /** Benford expectation per leading digit, in per-mille:
    * ⌊log10(1 + 1/d) · 1000⌋ — computed ONCE here and interpolated
    * into both engines, the single-source-of-truth discipline. */
  val BenfordPm: Seq[(Int, Long)] = (1 to 9).map(d =>
    d -> math.floor(math.log10(1.0 + 1.0 / d) * 1000).toLong)

  /** First-digit census of price cents against Benford's law — the
    * classic fabricated-data screen, as a data-quality operator:
    * per digit, the exact count, observed per-mille, and the
    * Benford expectation, plus the absolute deviation the consumer
    * thresholds on. All integer (the log10 constants are baked at
    * plan-construction time).
    *
    * 100 TB shape: one scan, map-side digit extraction, a 9-row
    * census, broadcast total. Nothing else. */
  def p16Benford(s: SparkSession, dir: String): DataFrame = {
    val digits = Tables.lineitem(s, dir)
      .select(substring(cents(col("l_extendedprice"))
        .cast("string"), 1, 1).cast("int").as("digit"))
    val census = digits.groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    val total = census.agg(sum(col("n")).as("tot"))
    val expect = BenfordPm.map { case (d, pm) =>
      s"WHEN digit = $d THEN ${pm}L"
    }.mkString("CASE ", " ", " END")
    census.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("n * 1000 div tot").as("observed_pm"),
        expr(expect).as("benford_pm"))
      .withColumn("deviation_pm",
        abs(col("observed_pm") - col("benford_pm")))
  }

  // =================================================================
  // x33_winsorize — exact per-group percentile clipping
  // =================================================================

  /** Winsorization band in per-mille: clip below p[lo] and above
    * p[hi]. Interpolated into the oracle. */
  val WinsorLoPm = 50
  val WinsorHiPm = 950

  /** Winsorize event values per type at exact type-1 quantiles
    * (value at rank ⌈p·n⌉) — the outlier-capping feature-prep step,
    * emitted with the original value and a clip direction so the
    * repair is auditable. Type-1 quantiles are plain integers both
    * engines select identically; no interpolation, no floats.
    *
    * 100 TB shape: rank windows partition by event_type (the x8
    * per-group-sort caveat; unbounded groups → the x31/x32 two-pass
    * selection per group, same join-back). Bounds are a |types|-row
    * broadcast; the clip is map-side. */
  def x33Winsorize(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        cents(col("value")).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("c"))
    val ranked = ev
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
    val bounds = ranked
      .filter(col("rn") === expr(s"(n * $WinsorLoPm + 999) div 1000") ||
        col("rn") === expr(s"(n * $WinsorHiPm + 999) div 1000"))
      .groupBy(col("event_type"))
      .agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
    ev.join(broadcast(bounds), "event_type")
      .select(col("event_id"), col("event_type"), col("c"),
        greatest(least(col("c"), col("hi")), col("lo"))
          .as("clipped_c"),
        when(col("c") < col("lo"), lit("low"))
          .when(col("c") > col("hi"), lit("high"))
          .otherwise(lit("kept")).as("clip"))
  }

  val queries: Map[String, Q] = Map(
    "x33_winsorize" -> (x33Winsorize _),
    "p16_benford" -> (p16Benford _),
    "p15_impute" -> (p15Impute _),
    "x32_quantile_bands" -> (x32QuantileBands _),
    "x31_exact_median_2pass" -> (x31ExactMedian2pass _),
    "x26_cube" -> (x26Cube _),
    "x27_copurchase" -> (x27Copurchase _),
    "x27_copurchase_indexed" -> (x27CopurchaseIndexed _),
    "e7_gapfill" -> (e7Gapfill _),
    "x28_corr_matrix" -> (x28CorrMatrix _),
    "x29_scd2_build" -> (x29Scd2Build _),
    "p14_skew_profile" -> (p14SkewProfile _)
  )

  // shared by the scan and indexed twins' oracle entries below
  private val x27OracleSql =
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
       |JOIN freq f2 ON p2 = f2.p""".stripMargin

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
    // the indexed twin shares the scan-semantics oracle verbatim —
    // a hash match certifies the persisted graph index content
    // (build + delta append + serve re-sum) end-to-end
    "x27_copurchase" -> x27OracleSql,
    "x27_copurchase_indexed" -> x27OracleSql,
    "x33_winsorize" ->
      s"""WITH ev AS (SELECT event_id, event_type,
         |   CAST(round(value * 100) AS BIGINT) AS c
         | FROM events WHERE value IS NOT NULL),
         |r AS (SELECT event_type, c,
         |   row_number() OVER (PARTITION BY event_type ORDER BY c)
         |     AS rn,
         |   count(*) OVER (PARTITION BY event_type) AS n
         | FROM ev),
         |b AS (SELECT event_type, min(c) AS lo, max(c) AS hi
         | FROM r
         | WHERE rn = (n * $WinsorLoPm + 999) // 1000
         |    OR rn = (n * $WinsorHiPm + 999) // 1000
         | GROUP BY event_type)
         |SELECT event_id, ev.event_type, c,
         | greatest(least(c, hi), lo) AS clipped_c,
         | CASE WHEN c < lo THEN 'low' WHEN c > hi THEN 'high'
         |      ELSE 'kept' END AS clip
         |FROM ev JOIN b USING (event_type)""".stripMargin,
    "p16_benford" -> {
      val expect = BenfordPm.map { case (d, pm) =>
        s"WHEN digit = $d THEN $pm"
      }.mkString("CASE ", " ", " END")
      s"""WITH d AS (SELECT CAST(substr(CAST(CAST(round(
         |   l_extendedprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
         |   AS INTEGER) AS digit FROM lineitem),
         |census AS (SELECT digit, count(*) AS n FROM d
         |           GROUP BY digit),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM census)
         |SELECT digit, n, n * 1000 // tot AS observed_pm,
         | CAST($expect AS BIGINT) AS benford_pm,
         | abs(n * 1000 // tot - CAST($expect AS BIGINT))
         |   AS deviation_pm
         |FROM census CROSS JOIN t""".stripMargin
    },
    "p15_impute" ->
      """WITH ev AS (SELECT event_id, event_type,
        |   CASE WHEN value IS NOT NULL
        |        THEN CAST(round(value * 100) AS BIGINT) END AS c
        | FROM events),
        |med AS (SELECT event_type,
        |   CAST(round(quantile_cont(c, 0.5) * 2) AS BIGINT) // 2
        |     AS med_c
        | FROM ev WHERE c IS NOT NULL GROUP BY event_type)
        |SELECT event_id, ev.event_type, c,
        | coalesce(c, med_c) AS filled_c,
        | c IS NULL AS was_imputed
        |FROM ev JOIN med USING (event_type)""".stripMargin,
    // explicit rank selection — the engine's two-pass plan must
    // surface the exact same (p, k, value) triples
    "x32_quantile_bands" -> {
      val bandList = QuantileBandsPm.mkString(", ")
      s"""WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
         |             AS c FROM lineitem),
         |r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn,
         |        count(*) OVER () AS n
         |      FROM v),
         |p AS (SELECT unnest([$bandList]) AS p_pm)
         |SELECT CAST(p_pm AS INTEGER) AS p_pm,
         |  CAST((n * p_pm + 999) // 1000 AS BIGINT) AS k,
         |  c AS val
         |FROM r JOIN p ON rn = (n * p_pm + 999) // 1000""".stripMargin
    },
    // the SEMANTIC definition; the engine runs the two-pass
    // selection — hash equality pins the reformulation
    "x31_exact_median_2pass" ->
      """WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
        |             AS c FROM lineitem)
        |SELECT count(*) AS n,
        | CAST(round(quantile_cont(c, 0.5) * 2) AS BIGINT) AS med_c_x2
        |FROM v""".stripMargin,
    "x28_corr_matrix" ->
      """WITH b AS (SELECT CAST(round(l_quantity) AS BIGINT) AS qty,
        |   CAST(round(l_extendedprice) AS BIGINT) AS usd,
        |   CAST(round(l_discount * 1000) AS BIGINT) AS disc_pm,
        |   CAST(round(l_tax * 1000) AS BIGINT) AS tax_pm
        | FROM lineitem),
        |m AS (SELECT count(*) AS n,
        |   CAST(sum(qty) AS BIGINT) AS sx1,
        |   CAST(sum(usd) AS BIGINT) AS sy1,
        |   CAST(sum(qty * usd) AS BIGINT) AS sxy1,
        |   CAST(sum(qty * qty) AS BIGINT) AS sxx1,
        |   CAST(sum(usd * usd) AS BIGINT) AS syy1,
        |   CAST(sum(disc_pm) AS BIGINT) AS sy2,
        |   CAST(sum(qty * disc_pm) AS BIGINT) AS sxy2,
        |   CAST(sum(disc_pm * disc_pm) AS BIGINT) AS syy2,
        |   CAST(sum(tax_pm) AS BIGINT) AS sy3,
        |   CAST(sum(usd * tax_pm) AS BIGINT) AS sxy3,
        |   CAST(sum(tax_pm * tax_pm) AS BIGINT) AS syy3
        | FROM b)
        |SELECT pair, n, sx, sy, sxy, sxx, syy,
        | (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |   (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |    sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r
        |FROM (
        | SELECT 'qty__usd' AS pair, n, sx1 AS sx, sy1 AS sy,
        |   sxy1 AS sxy, sxx1 AS sxx, syy1 AS syy FROM m
        | UNION ALL
        | SELECT 'qty__disc_pm', n, sx1, sy2, sxy2, sxx1, syy2 FROM m
        | UNION ALL
        | SELECT 'usd__tax_pm', n, sy1, sy3, sxy3, syy1, syy3 FROM m
        |)""".stripMargin,
    "x29_scd2_build" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |   epoch_us(ts) AS t FROM events),
        |flagged AS (SELECT user_id, event_type, t, event_id,
        |   CASE WHEN lag(event_type) OVER w IS NULL
        |          OR lag(event_type) OVER w <> event_type
        |        THEN 1 ELSE 0 END AS chg
        | FROM ev
        | WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |runs0 AS (SELECT user_id, event_type, t,
        |   CAST(sum(chg) OVER (PARTITION BY user_id
        |     ORDER BY t, event_id ROWS UNBOUNDED PRECEDING)
        |     AS BIGINT) AS run_id
        | FROM flagged),
        |runs AS (SELECT user_id, run_id,
        |   min(event_type) AS state,
        |   min(t) AS valid_from, count(*) AS n_events
        | FROM runs0 GROUP BY user_id, run_id)
        |SELECT user_id, run_id, state, valid_from,
        | lead(valid_from) OVER (PARTITION BY user_id
        |   ORDER BY valid_from, run_id) AS valid_to,
        | n_events
        |FROM runs""".stripMargin,
    "p14_skew_profile" ->
      s"""WITH census AS (SELECT l_partkey, count(*) AS cnt
         | FROM lineitem GROUP BY l_partkey),
         |stats AS (SELECT count(*) AS n_keys,
         |   CAST(sum(cnt) AS BIGINT) AS n_rows,
         |   max(cnt) AS max_cnt,
         |   CAST(round(quantile_cont(cnt, 0.5) * 2) AS BIGINT)
         |     AS med_cnt_x2
         | FROM census)
         |SELECT l_partkey, cnt, n_keys, n_rows, max_cnt, med_cnt_x2,
         | max_cnt * n_keys * 1000 // n_rows AS skew_pm
         |FROM (SELECT * FROM census
         |      ORDER BY cnt DESC, l_partkey LIMIT $SkewTopK)
         |CROSS JOIN stats""".stripMargin,
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
