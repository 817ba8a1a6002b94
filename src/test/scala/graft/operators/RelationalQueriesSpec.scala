package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class RelationalQueriesSpec extends SparkSpec {

  test("a2 class counts sum to the total row count") {
    val r = RelationalQueries.a2ClassCounts(spark, sfDir).head()
    assert(r.getLong(0) + r.getLong(1) + r.getLong(2) == r.getLong(3))
    assert(r.getLong(3) == Tables.orders(spark, sfDir).count())
  }

  test("a4 confusion cells equal four separate filtered counts") {
    val labeled = Tables.events(spark, sfDir).select(
      when(col("event_type") === "error", 1).otherwise(0).as("label"),
      when(col("value") > 50.0, 1).otherwise(0).as("pred"))
    val tp = labeled.filter(col("pred") === 1 && col("label") === 1).count()
    val fp = labeled.filter(col("pred") === 1 && col("label") === 0).count()
    val tn = labeled.filter(col("pred") === 0 && col("label") === 0).count()
    val fn = labeled.filter(col("pred") === 0 && col("label") === 1).count()
    val r = RelationalQueries.a4ConfusionMetrics(spark, sfDir).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((tp, fp, tn, fn)))
    assert(r.getDouble(4) == (tp + tn).toDouble / (tp + fp + tn + fn))
  }

  test("j1 dimension joins are planned as broadcast-hash joins") {
    val df = RelationalQueries.j1BroadcastDims(spark, sfDir)
    df.collect() // finalize AQE plan
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = plan.toString
    assert(s.contains("BroadcastHashJoin"),
      s"expected BroadcastHashJoin in:\n$s")
    assert(!s.contains("SortMergeJoin"),
      "dimension join must not sort-merge")
  }

  test("l1 top-k equals full sort + take") {
    val topk = RelationalQueries.l1TopK(spark, sfDir).collect()
    val full = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .collect()
      .take(10)
    assert(topk.toSeq == full.toSeq)
  }

  test("l1 top-k plans as TakeOrderedAndProject (no global sort)") {
    val df = RelationalQueries.l1TopK(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("g1 rollup has detail + subtotal + grand-total grouping sets") {
    val rows = RelationalQueries.g1Rollup(spark, sfDir).collect()
    val detail = rows.count(r => !r.isNullAt(0) && !r.isNullAt(1))
    val subtotal = rows.count(r => !r.isNullAt(0) && r.isNullAt(1))
    val grand = rows.count(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand == 1)
    assert(subtotal > 0 && detail > 0)
    val total = rows.filter(r => r.isNullAt(0)).map(_.getLong(2)).sum
    assert(total == Tables.lineitem(spark, sfDir).count())
  }

  test("u2/u3 set ops partition customers consistently with j3/j4") {
    val semi = RelationalQueries.j3SemiJoin(spark, sfDir)
      .agg(sum(col("n_cust_with_orders"))).head().getLong(0)
    val anti = RelationalQueries.j4AntiJoin(spark, sfDir).count()
    val except = RelationalQueries.u3Except(spark, sfDir).count()
    assert(anti == except) // same complement, two operators
    assert(semi == Tables.customer(spark, sfDir).count())
  }

  test("a6 running total final row equals the group's total") {
    val rt = RelationalQueries.a6RunningTotal(spark, sfDir)
    val finals = rt.groupBy(col("o_custkey"))
      .agg(max(col("running_cents")).as("final_cents"))
    val expected = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))
        .as("total_cents"))
    val mismatches = finals
      .join(expected, "o_custkey")
      .filter(col("final_cents") =!= col("total_cents"))
      .count()
    assert(mismatches == 0)
  }

  test("native session_window census agrees with the lag/cumsum sessionizer") {
    // Two independent formulations of the same gap semantics: the
    // per-user session COUNT and total event count must agree (e2's
    // nano-gap vs e4's micro-floored decision can only diverge on a
    // sub-microsecond boundary gap, absent from the corpus).
    val viaWindow = RelationalQueries.e4SessionWindow(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions_w"),
        sum(col("n_events")).cast("long").as("n_events_w"))
    val viaLag = RelationalQueries.e2Sessionize(spark, sfDir)
    val mismatches = viaWindow.join(viaLag, "user_id")
      .filter(col("n_sessions_w") =!= col("n_sessions") ||
        col("n_events_w") =!= col("n_events"))
      .count()
    assert(mismatches == 0)
    assert(viaWindow.count() == viaLag.count())
  }

  test("funnel: strict ordering counts planted journeys exactly") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_funnel").toString
    val us = 1000L // 1 micro in nanos
    // A: view->click->purchase (full conversion)
    // B: purchase first, then view->click (click counts, purchase not)
    // C: view only; D: click/purchase but never a view
    Seq(
      (1L, "A", "view", 1 * us), (2L, "A", "click", 2 * us),
      (3L, "A", "purchase", 3 * us),
      (4L, "B", "purchase", 1 * us), (5L, "B", "view", 2 * us),
      (6L, "B", "click", 3 * us),
      (7L, "C", "view", 1 * us),
      (8L, "D", "click", 1 * us), (9L, "D", "purchase", 2 * us))
      .toDF("event_id", "user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = RelationalQueries.e5Funnel(spark, tmp).head()
    assert(r.getLong(0) == 4, "n_users")
    assert(r.getLong(1) == 3, "A, B, C viewed")
    assert(r.getLong(2) == 2, "A and B clicked after their view")
    assert(r.getLong(3) == 1, "only A purchased after the click")
  }

  test("d2 approximate distinct is within 5% of exact") {
    val exact = RelationalQueries.d1CountDistinct(spark, sfDir).head()
    val approx = RelationalQueries.d2ApproxDistinct(spark, sfDir).head()
    val err = math.abs(approx.getLong(0) - exact.getLong(0)).toDouble /
      exact.getLong(0)
    assert(err < 0.05, s"HLL error $err")
  }

  test("q9 many-join profit agrees with the DataFrame join chain and " +
      "plans without a cartesian product") {
    val got = RelationalQueries.q9ProductProfit(spark, sfDir)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"flat five-way join must reorder, not cross:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the filtered dims must broadcast:\n$plan")
    val ref = Tables.part(spark, sfDir)
      .filter(col("p_name").contains("widget"))
      .join(Tables.lineitem(spark, sfDir),
        col("p_partkey") === col("l_partkey"))
      .join(Tables.supplier(spark, sfDir),
        col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.nation(spark, sfDir),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(expr("cast(round(l_extendedprice * (1.0 - l_discount) " +
        "* 100) as bigint)")).cast("long").as("profit_cents"),
        count(lit(1)).as("n_items"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val gotMap = got.collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(gotMap == ref, "SQL and DataFrame formulations diverge")
    assert(gotMap.nonEmpty, "the widget filter must keep rows")
  }

  test("q13 outer-join distribution covers every customer exactly " +
      "once and keeps ON-filtered customers at zero") {
    val rows = RelationalQueries.q13CustDistribution(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nCust = Tables.customer(spark, sfDir).count()
    assert(rows.values.sum == nCust,
      "the distribution must partition the customer set")
    // the ON-clause placement semantics: a WHERE would drop
    // no-qualifying-order customers; the ON keeps them at c_count=0
    val ref = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == ref, s"$rows vs $ref")
  }

  test("q18 pre-aggregates lineitem below the join and takes the " +
      "top-20 without a global sort") {
    val got = RelationalQueries.q18LargeOrders(spark, sfDir)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be TakeOrderedAndProject:\n$plan")
    val gotRows = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(gotRows.length == 20)
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
      .filter(col("sum_qty") > RelationalQueries.Q18QtyThreshold)
    val ref = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"))
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        expr("cast(round(o_totalprice * 100) as bigint)")
          .as("totalprice_cents"), col("sum_qty"))
      .orderBy(col("totalprice_cents").desc, col("o_orderkey"))
      .limit(20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(gotRows.toSeq == ref.toSeq,
      "SQL and DataFrame formulations diverge")
  }

  test("q7 disjunctive nation-pair join keeps both directions and " +
      "agrees with the per-direction recompute") {
    val got = RelationalQueries.q7VolumeShipping(spark, sfDir)
    assert(!got.queryExecution.executedPlan.toString
      .contains("CartesianProduct"))
    val rows = got.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    val dirs = rows.keys.map(k => (k._1, k._2)).toSet
    assert(dirs == Set(
      (RelationalQueries.Q7NationA, RelationalQueries.Q7NationB),
      (RelationalQueries.Q7NationB, RelationalQueries.Q7NationA)),
      s"both OR directions must survive: $dirs")
    // one direction recomputed explicitly
    val n = Tables.nation(spark, sfDir)
    val ref = Tables.supplier(spark, sfDir)
      .join(n.select(col("n_nationkey").as("sk"),
        col("n_name").as("sn")), col("s_nationkey") === col("sk"))
      .filter(col("sn") === RelationalQueries.Q7NationA)
      .join(Tables.lineitem(spark, sfDir),
        col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, sfDir),
        col("c_custkey") === col("o_custkey"))
      .join(n.select(col("n_nationkey").as("ck"),
        col("n_name").as("cn")), col("c_nationkey") === col("ck"))
      .filter(col("cn") === RelationalQueries.Q7NationB)
      .groupBy(year(col("l_shipdate")).as("y"))
      .agg(sum(expr("cast(round(l_extendedprice * (1.0 - l_discount) " +
        "* 100) as bigint)")).cast("long").as("rev"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    ref.foreach { case (y, rev) =>
      assert(rows((RelationalQueries.Q7NationA,
        RelationalQueries.Q7NationB, y)) == rev, s"year $y")
    }
  }

  test("q8 single-pass conditional market share: numerator bounded " +
      "by denominator and equal to the filtered recompute") {
    val got = RelationalQueries.q8MarketShare(spark, sfDir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.nonEmpty)
    assert(got.values.forall { case (nc, tc) => nc >= 0 && nc <= tc },
      s"nation volume must be a sub-sum: $got")
    assert(got.values.exists(_._1 > 0),
      "the market nation must contribute somewhere")
  }

  test("q10 returned-item report equals the DataFrame formulation " +
      "and plans the top-20 without a global sort") {
    val got = RelationalQueries.q10ReturnedItems(spark, sfDir)
    assert(got.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    val gotRows = got.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSeq
    val ref = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, sfDir)
          .filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(expr("cast(round(l_extendedprice * (1.0 - l_discount) " +
        "* 100) as bigint)")).cast("long").as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("c_custkey"))
      .limit(20).collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(3), r.getString(2))).toSeq
    assert(gotRows == ref, s"$gotRows vs $ref")
  }

  test("q15 scalar-subquery max selects exactly the argmax suppliers " +
      "of the revenue relation") {
    val got = RelationalQueries.q15TopSupplier(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(expr("cast(round(l_extendedprice * (1.0 - l_discount) " +
        "* 100) as bigint)")).cast("long").as("rev"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mx = rev.values.max
    val expect = rev.filter(_._2 == mx).keySet
    assert(got.map(_._1).toSet == expect,
      s"argmax set ${got.map(_._1).toSet} vs $expect")
    assert(got.forall(_._3 == mx))
  }

  test("q20 nested INs plan as stacked semi joins and agree with the " +
      "explicit formulation") {
    val got = RelationalQueries.q20ExcessSuppliers(spark, sfDir)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.split("LeftSemi").length >= 3,
      s"both INs must decorrelate to semi joins:\n$plan")
    val widgets = Tables.part(spark, sfDir)
      .filter(col("p_name").contains("widget")).select(col("p_partkey"))
    val qualifying = Tables.lineitem(spark, sfDir)
      .join(widgets, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("q"))
      .filter(col("q") > RelationalQueries.Q20QtyThreshold)
      .select(col("l_suppkey"))
    val ref = Tables.supplier(spark, sfDir)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"),
        "left_semi")
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val gotSet = got.collect().map(_.getLong(1)).toSet
    assert(gotSet == ref, s"$gotSet vs $ref")
    assert(gotSet.nonEmpty &&
      gotSet.size < Tables.supplier(spark, sfDir).count(),
      "the threshold must split the supplier set")
  }

  test("q21 EXISTS + NOT EXISTS decorrelate to a semi and an anti " +
      "join and agree with the explicit formulation") {
    val got = RelationalQueries.q21WaitingSuppliers(spark, sfDir)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"the two correlated subqueries must become semi + anti:\n$plan")
    val late = Tables.lineitem(spark, sfDir).as("l1")
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderstatus") === "F"),
        col("l1.l_orderkey") === col("o_orderkey"))
      .filter(col("l1.l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 60 DAY"))
    val li = Tables.lineitem(spark, sfDir)
    val withOther = late.join(
      li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2")),
      col("l1.l_orderkey") === col("k2") &&
        col("l1.l_suppkey") =!= col("s2"), "left_semi")
    val onlyLate = withOther.join(
      li.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"),
        col("l_shipdate").as("d3")),
      col("l1.l_orderkey") === col("k3") &&
        col("l1.l_suppkey") =!= col("s3") &&
        col("d3") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
      "left_anti")
    val ref = onlyLate
      .join(Tables.supplier(spark, sfDir),
        col("l1.l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val gotRows = got.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(gotRows == ref, s"$gotRows vs $ref")
    assert(gotRows.nonEmpty)
  }

  test("q21 single-scan twin reads the fact ONCE (no semi/anti " +
      "re-scans) and is row-identical to the anchor") {
    val twin = RelationalQueries.q21WaitingAgg(spark, sfDir)
    val plan = twin.queryExecution.executedPlan.toString
    val factScans = plan.split("lineitem").length - 1
    assert(factScans == 1,
      s"the twin must scan lineitem exactly once, saw $factScans:\n$plan")
    assert(!plan.contains("LeftSemi") && !plan.contains("LeftAnti"),
      s"the twin replaces the subquery stack with aggregation:\n$plan")
    assert(!plan.contains("Expand"),
      s"two-level re-aggregation must avoid the distinct Expand:\n$plan")
    val anchor = RelationalQueries.q21WaitingSuppliers(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = twin.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == anchor, s"$got vs $anchor")
    assert(got.nonEmpty)
  }

  test("q4 EXISTS decorrelates to a semi join and agrees with the " +
      "explicit semi-join formulation") {
    val got = RelationalQueries.q4OrderPriority(spark, sfDir)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"the EXISTS must decorrelate to a left-semi join:\n$plan")
    val ref = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.lineitem(spark, sfDir),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotMap = got.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotMap == ref, s"$gotMap vs $ref")
    assert(gotMap.nonEmpty, "the date window must keep orders")
  }

  test("q6 is join-free with every predicate pushed to the scan, and " +
      "agrees with the DataFrame recompute") {
    val got = RelationalQueries.q6ForecastRevenue(spark, sfDir)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"q6 must not join:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"predicates must reach the parquet scan:\n$plan")
    val r = got.head()
    val ref = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.04, 0.06) && col("l_quantity") < 24)
      .agg(sum(expr("cast(round(l_extendedprice * l_discount * 100) " +
        "as bigint)")).cast("long"), count(lit(1))).head()
    assert((r.getLong(0), r.getLong(1)) ==
      ((ref.getLong(0), ref.getLong(1))))
    assert(r.getLong(1) > 0, "the window must keep lines")
  }

  test("q14 computes promo and total volume in one pass and matches " +
      "two separate filtered sums") {
    val r = RelationalQueries.q14PromoEffect(spark, sfDir).head()
    val base = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .join(Tables.part(spark, sfDir),
        col("l_partkey") === col("p_partkey"))
      .withColumn("vc", expr("cast(round(l_extendedprice * " +
        "(1.0 - l_discount) * 100) as bigint)"))
    val promo = base.filter(col("p_type") === "PROMO")
      .agg(sum(col("vc")).cast("long")).head().getLong(0)
    val total = base.agg(sum(col("vc")).cast("long")).head().getLong(0)
    assert((r.getLong(0), r.getLong(1)) == ((promo, total)))
    assert(promo > 0 && promo < total,
      "the PROMO slice must be a proper subset")
  }

  test("q19 disjunctive arms never plan a cartesian product, are " +
      "disjoint, and sum to the total") {
    val got = RelationalQueries.q19DiscountedRevenue(spark, sfDir)
    assert(!got.queryExecution.executedPlan.toString
      .contains("CartesianProduct"))
    val r = got.head()
    val base = Tables.lineitem(spark, sfDir)
      .filter(col("l_discount").between(0.02, 0.08))
      .join(Tables.part(spark, sfDir),
        col("p_partkey") === col("l_partkey"))
    def arm(brand: String, szHi: Int, qLo: Int, qHi: Int) = base
      .filter(col("p_brand") === brand &&
        col("p_size").between(1, szHi) &&
        col("l_quantity").between(qLo, qHi))
      .agg(coalesce(sum(expr("cast(round(l_extendedprice * " +
        "(1.0 - l_discount) * 100) as bigint)")), lit(0L)).cast("long"),
        count(lit(1))).head()
    val arms = Seq(arm("Brand#12", 15, 1, 11), arm("Brand#23", 20, 10, 20),
      arm("Brand#3", 25, 20, 30))
    assert(r.getLong(0) == arms.map(_.getLong(0)).sum,
      "revenue must equal the sum of the three disjoint arms")
    assert(r.getLong(1) == arms.map(_.getLong(1)).sum &&
      r.getLong(1) > 0)
  }

  test("q12 high and low priority counts partition the late lines " +
      "per linestatus") {
    val got = RelationalQueries.q12ShipPriority(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val late = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 60 DAY"))
    val totals = late.groupBy(col("l_linestatus"))
      .agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val high = late.filter(col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH"))
      .groupBy(col("l_linestatus")).agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == totals.keySet)
    got.foreach { case (st, (h, l)) =>
      assert(h == high.getOrElse(st, 0L), s"high($st)")
      assert(h + l == totals(st), s"high+low must partition $st")
    }
    assert(got.nonEmpty)
  }

  test("q16 NOT IN plans as an anti join, and the census matches the " +
      "explicit exclusion recompute") {
    val got = RelationalQueries.q16SupplierCensus(spark, sfDir)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"NOT IN must become a left-anti join:\n$plan")
    val excluded = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < RelationalQueries.Q16ExclAcctbal)
      .select(col("s_suppkey"))
    val ref = Tables.lineitem(spark, sfDir)
      .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(Tables.part(spark, sfDir)
          .filter(col("p_brand") =!= "Brand#1" &&
            col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        r.getLong(3)).toMap
    val gotMap = got.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        r.getLong(3)).toMap
    assert(gotMap == ref, s"$gotMap vs $ref")
    assert(gotMap.nonEmpty)
  }

  test("q17 correlated average decorrelates to a per-part aggregate " +
      "join and agrees with the explicit recompute") {
    val got = RelationalQueries.q17SmallQtyRevenue(spark, sfDir)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val avgQty = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey").as("pk"))
      .agg(avg(col("l_quantity")).as("aq"))
    val ref = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir)
          .filter(col("p_brand") === RelationalQueries.Q17Brand),
        col("p_partkey") === col("l_partkey"))
      .join(avgQty, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.2) * col("aq"))
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .cast("long"), count(lit(1))).head()
    val r = got.head()
    assert((r.getLong(0), r.getLong(1)) ==
      ((ref.getLong(0), ref.getLong(1))))
    assert(r.getLong(1) > 0, "some lines must be below 20% of the mean")
  }

  test("q2 every emitted supplier carries the per-part minimum " +
      "EUROPE cost") {
    val got = RelationalQueries.q2MinCostSupplier(spark, sfDir).collect()
    assert(got.nonEmpty, "at least one qualifying part at smoke SF")
    val supply = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .cast("long").as("cost_cents"))
    val eur = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir)
          .filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
    val minPerPart = supply
      .join(eur.select(col("s_suppkey").as("es")),
        col("l_suppkey") === col("es"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(min(col("cost_cents")).as("mc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      val (pk, cost) = (r.getLong(3), r.getLong(5))
      assert(cost == minPerPart(pk),
        s"part $pk: emitted $cost vs min ${minPerPart(pk)}")
    }
  }

  test("q17 window-avg twin scans the fact ONCE and matches the " +
      "anchor's single row exactly") {
    val twin = RelationalQueries.q17SmallQtyWin(spark, sfDir)
    val plan = twin.queryExecution.executedPlan.toString
    val factScans = plan.split("lineitem").length - 1
    assert(factScans == 1,
      s"the twin must scan lineitem exactly once, saw $factScans " +
        s"(the anchor's decorrelated avg re-scans it):\n$plan")
    assert(plan.contains("Window"),
      s"the per-part average must be a window avg:\n$plan")
    val a = RelationalQueries.q17SmallQtyRevenue(spark, sfDir).head()
    val t = twin.head()
    assert((t.getLong(0), t.getLong(1)) == ((a.getLong(0), a.getLong(1))))
    assert(t.getLong(1) > 0)
  }

  test("q11 checkpointed-census twin derives the census once and is " +
      "row-identical to the anchor") {
    val twin = RelationalQueries.q11ImportantCkpt(spark, sfDir)
    val plan = twin.queryExecution.executedPlan.toString
    assert(!plan.contains("lineitem"),
      s"the serving plan must read the checkpointed census, never " +
        s"re-derive from the fact:\n$plan")
    val anchor = RelationalQueries.q11ImportantParts(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = twin.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == anchor, s"${got.size} rows vs anchor ${anchor.size}")
    assert(got.nonEmpty)
  }

  test("q2 window-min twin aggregates lineitem ONCE and is " +
      "row-identical to the anchor") {
    val twin = RelationalQueries.q2MinCostWin(spark, sfDir)
    val plan = twin.queryExecution.executedPlan.toString
    val factScans = plan.split("lineitem").length - 1
    assert(factScans == 1,
      s"the twin must scan lineitem exactly once, saw $factScans " +
        s"(the anchor's inlined CTE scans it twice):\n$plan")
    assert(plan.contains("Window"),
      s"the per-part minimum must be a window min:\n$plan")
    val anchor = RelationalQueries.q2MinCostSupplier(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val got = twin.collect().map(_.toSeq).toSeq
    assert(got == anchor,
      s"${got.size} rows vs anchor ${anchor.size}")
    assert(got.nonEmpty)
  }

  test("q11 mean-anchored threshold keeps a nonempty proper subset " +
      "that matches the recompute") {
    val got = RelationalQueries.q11ImportantParts(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val census = Tables.lineitem(spark, sfDir)
      .join(Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sfDir),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir)
          .filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .cast("long").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cut = RelationalQueries.Q11MeanMult *
      (census.values.map(BigInt(_)).sum.toDouble / census.size)
    val expect = census.filter(_._2 > cut)
    assert(got == expect, s"${got.size} kept vs ${expect.size}")
    assert(got.nonEmpty && got.size < census.size,
      "the threshold must keep a proper subset")
  }

  test("q22 NOT EXISTS plans as an anti join and the cohort matches " +
      "the explicit recompute") {
    val got = RelationalQueries.q22SalesOpportunity(spark, sfDir)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"NOT EXISTS must become a left-anti join:\n$plan")
    val potential = Tables.customer(spark, sfDir)
      .filter(expr("right(c_name, 1)").isin("1", "3", "5", "7") &&
        col("c_acctbal") > 0)
      .select(expr("right(c_name, 1)").as("cntrycode"), col("c_custkey"),
        expr("cast(round(c_acctbal * 100) as bigint)").as("ac"))
    val rows = potential.collect()
    val avgC = rows.map(r => BigInt(r.getLong(2))).sum.toDouble /
      rows.length
    val recentUrgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val ref = potential.filter(col("ac") > avgC)
      .join(recentUrgent, col("c_custkey") === col("o_custkey"),
        "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"), sum(col("ac")).cast("long"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val gotMap = got.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gotMap == ref, s"$gotMap vs $ref")
    assert(gotMap.nonEmpty)
  }
}
