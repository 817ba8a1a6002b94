package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalQueriesSpec extends SparkSpec {

  test("SCD2 join: every order matches exactly one dimension version " +
    "and the plan is a broadcast hash join, not a nested loop") {
    val out = TemporalQueries.x24Scd2Join(spark, sfDir)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"versioned-dim lookup must hash on the equi key:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "interval predicate must ride the hash join, not a BNL")
    val totalOrders = graft.core.Tables.orders(spark, sfDir).count()
    val matched = out.agg(sum("n_orders")).head().getLong(0)
    assert(matched == totalOrders,
      s"point-in-time lookup must cover every order exactly once: " +
        s"$matched of $totalOrders")
  }

  test("sliding distinct: brute-force cross-check + rolling >= hourly") {
    val rows = TemporalQueries.e6SlidingDistinct(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, h1, h24) => assert(h24 >= h1) }
    // brute force from the raw events
    val pairs = graft.core.Tables.events(spark, sfDir)
      .select(expr(s"ts div ${TemporalQueries.HourNs}").as("hb"),
        col("user_id")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byHour = pairs.groupBy(_._1)
    rows.foreach { case (hb, h1, h24) =>
      assert(h1 == byHour(hb).map(_._2).distinct.size.toLong)
      val expect24 = pairs.filter(p =>
        p._1 <= hb && p._1 > hb - TemporalQueries.SlideHours)
        .map(_._2).distinct.size.toLong
      assert(h24 == expect24, s"hour $hb: $h24 vs $expect24")
    }
    assert(rows.length == byHour.size)
  }

  test("robust stats: first-principles median/MAD/mode recompute") {
    val out = TemporalQueries.x25RobustStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val ev = graft.core.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      if (s.length % 2 == 1) 2 * s(s.length / 2)
      else s(s.length / 2 - 1) + s(s.length / 2)
    }
    ev.groupBy(_._1).foreach { case (et, vs) =>
      val cs = vs.map(_._2).toSeq
      val (n, m2, mad4, modeC, modeN) = out(et)
      assert(n == cs.length.toLong)
      assert(m2 == med2(cs), s"$et median×2")
      assert(mad4 == med2(cs.map(c => math.abs(2 * c - m2))),
        s"$et mad×4")
      val census = cs.groupBy(identity).view.mapValues(_.size)
      val bestN = census.values.max
      val bestC = census.filter(_._2 == bestN).keys.min
      assert((modeC, modeN) == ((bestC, bestN.toLong)), s"$et mode")
    }
  }

  test("max concurrency: first-principles sweep recompute") {
    val got = TemporalQueries.e8MaxConcurrency(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val iv = graft.core.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        expr("ts div 1000"), round(col("value") * 100).cast("long"))
      .collect().map { r =>
        val c = r.getLong(3)
        val dur = ((c % TemporalQueries.ConcDurModS +
          TemporalQueries.ConcDurModS) % TemporalQueries.ConcDurModS +
          TemporalQueries.ConcDurMinS) * 1000000L
        (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(2) + dur)
      }
    iv.groupBy(_._1).foreach { case (et, ivs) =>
      val pts = ivs.flatMap(i =>
        Seq((i._3, 1, i._2), (i._4, -1, i._2)))
        .sortBy(p => (p._1, p._2, p._3))
      val curve = pts.scanLeft(0L)((acc, p) => acc + p._2).tail
      val peak = curve.max
      val firstT = pts.zip(curve).filter(_._2 == peak).map(_._1._1)
      val (nIv, maxC, tFirst, nAt) = got(et)
      assert(nIv == ivs.length.toLong)
      assert(maxC == peak, s"$et peak")
      assert(tFirst == firstT.min, s"$et first-peak instant")
      assert(nAt == firstT.length.toLong, s"$et rows at peak")
    }
    assert(got.keySet == iv.map(_._1).distinct.toSet)
  }

  test("interval coverage: merged-interval recompute; covered <= " +
    "span; covered >= longest single interval") {
    val iv = graft.core.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), expr("ts div 1000"),
        round(col("value") * 100).cast("long"))
      .collect().map { r =>
        val c = r.getLong(2)
        val dur = ((c % TemporalQueries.ConcDurModS +
          TemporalQueries.ConcDurModS) % TemporalQueries.ConcDurModS +
          TemporalQueries.ConcDurMinS) * 1000000L
        (r.getString(0), r.getLong(1), r.getLong(1) + dur)
      }
    val got = TemporalQueries.e10IntervalCoverage(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    iv.groupBy(_._1).foreach { case (et, ivs) =>
      // classic merge-sorted-intervals recompute
      val sorted = ivs.map(i => (i._2, i._3)).sortBy(identity)
      var (covered, curLo, curHi) = (0L, sorted.head._1, sorted.head._2)
      sorted.tail.foreach { case (lo, hi) =>
        if (lo > curHi) { covered += curHi - curLo; curLo = lo; curHi = hi }
        else curHi = math.max(curHi, hi)
      }
      covered += curHi - curLo
      val (cov, span, utilPm) = got(et)
      assert(cov == covered, s"$et union length")
      assert(span == sorted.map(_._2).max - sorted.map(_._1).min)
      assert(cov <= span && cov >= ivs.map(i => i._3 - i._2).max)
      assert(utilPm == cov * 1000 / span)
    }
  }

  test("conversion lag: first-principles recompute; only " +
    "converting users appear; lags non-negative") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val views = rows.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val tv = views.min
        val after = rows.filter(r => r._2 == "purchase" && r._3 >= tv)
        if (after.isEmpty) None else Some(u -> (after.map(_._3).min - tv))
      }
    }
    val got = TemporalQueries.e11ConversionLag(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect.toMap)
    got.values.foreach(l => assert(l >= 0))
  }

  test("anomaly: planted burst flagged, wobbling baseline not; " +
    "constant window yields NULL z") {
    import spark.implicits._
    val h = TemporalQueries.HourNs
    // type "a": alternating 4/6 events per hour (nonzero variance),
    // then a 50-event burst at hour 29; type "b": constant 5/hour
    // (zero variance -> z must be NULL, never +-Infinity)
    val rows =
      (0 until 30).flatMap { hb =>
        val n = if (hb == 29) 50 else if (hb % 2 == 0) 4 else 6
        Seq.fill(n)(("a", hb * h + 1L))
      } ++ (0 until 30).flatMap(hb => Seq.fill(5)(("b", hb * h + 1L)))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_anomaly").toString
    rows.toDF("event_type", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = TemporalQueries.e12Anomaly(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          r.getBoolean(6))).toMap
    val (zBurst, flagged) = got(("a", 29L))
    assert(flagged && zBurst.exists(_ > 3.0), s"burst: $zBurst")
    (24 until 29).foreach { hb =>
      val (z, f) = got(("a", hb.toLong))
      assert(!f && z.exists(math.abs(_) <= 3.0), s"baseline hour $hb")
    }
    got.keys.filter(_._1 == "b").foreach { k =>
      assert(got(k) == ((None, false)), s"constant window at $k")
    }
    // rows only appear once the trailing window is FULL
    assert(!got.contains(("a", 23L)) && got.contains(("a", 24L)))
  }

  test("transitions: first-principles Markov census recompute; " +
    "rates partition each source state") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getLong(3)))
    val expect = ev.groupBy(_._1).values.flatMap { rows =>
      val types = rows.sortBy(r => (r._4, r._2)).map(_._3)
      types.zip(types.drop(1))
    }.groupBy(x => x).view.mapValues(_.size.toLong).toMap
    val got = TemporalQueries.x34Transitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == expect.keySet)
    val bySrc = expect.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    got.foreach { case ((p, c), (n, tot, pm)) =>
      assert(n == expect((p, c)))
      assert(tot == bySrc(p))
      assert(pm == n * 1000 / tot)
    }
  }

  test("cohort retention: driver recompute; week-0 row covers " +
    "the full cohort") {
    val acts = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr(s"ts div ${TemporalQueries.WeekNs}").as("wk"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val firsts = acts.groupBy(_._1).view.mapValues(_.map(_._2).min)
    val expect = acts.groupBy { case (u, wk) =>
      (firsts(u), wk - firsts(u))
    }.map { case (k, v) => k -> v.map(_._1).distinct.length.toLong }
    val sizes = firsts.values.groupBy(identity).view
      .mapValues(_.size.toLong)
    val got = TemporalQueries.e9CohortRetention(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case ((cw, off), (nAct, cn)) =>
      assert(nAct == expect((cw, off)))
      assert(cn == sizes(cw))
      if (off == 0L) assert(nAct == cn,
        s"cohort $cw: every member is by definition active week 0")
    }
  }

  test("KMV sliding twin: exact branch equals e6 exactly below K, " +
    "full-sketch windows estimate within the 1/sqrt(K) band") {
    import graft.functions.KmvSketch
    val exact = TemporalQueries.e6SlidingDistinct(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val kmv = TemporalQueries.e6bSlidingKmv(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(kmv.keySet == exact.keySet, "window spines diverge")
    var fullSketch = 0
    kmv.foreach { case (hb, (eh, er)) =>
      val (xh, xr) = exact(hb)
      // below K the sketch holds every distinct hash, so the
      // "estimate" must be EXACT; at/above K both the hourly and the
      // rolling column must land inside the error band (ADVICE r15:
      // the hourly column previously skipped the band check)
      if (xh < KmvSketch.K) assert(eh == xh, s"hour $hb: $eh != $xh")
      else {
        fullSketch += 1
        val relErr = math.abs(eh - xh).toDouble / xh
        assert(relErr <= 4.0 / math.sqrt(KmvSketch.K),
          s"hour $hb: estimate $eh vs exact $xh (relErr $relErr)")
      }
      if (xr < KmvSketch.K) assert(er == xr, s"roll $hb: $er != $xr")
      else {
        fullSketch += 1
        val relErr = math.abs(er - xr).toDouble / xr
        assert(relErr <= 4.0 / math.sqrt(KmvSketch.K),
          s"window $hb: estimate $er vs exact $xr (relErr $relErr)")
      }
    }
    info(s"$fullSketch windows exercised the full-sketch estimator")
  }

  test("KMV sliding twin estimator branch: a planted >K-user window " +
    "estimates within the error band and uses the k-min formula") {
    import spark.implicits._
    import graft.functions.KmvSketch
    val h = TemporalQueries.HourNs
    // 600 distinct users in hour 0 (> K = 256), 40 in hour 1
    val rows = (0 until 600).map(u => (0L * h + 1, u.toLong)) ++
      (0 until 40).map(u => (1L * h + 1, (10000 + u).toLong))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_kmv_win").toString
    rows.toDF("ts", "user_id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = TemporalQueries.e6bSlidingKmv(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // hour 0: 600 distinct — the sketch is full, the estimate comes
    // from the (K-1)/p formula and must land inside ~4/sqrt(K)
    val (h0, _) = got(0L)
    // (the estimator MAY equal the exact 600 by chance — only the
    // error band below is asserted)
    assert(math.abs(h0 - 600L).toDouble / 600.0 <=
      4.0 / math.sqrt(KmvSketch.K),
      s"full-sketch hourly estimate $h0 vs exact 600")
    // hour 1 sees its own 40 users plus hour 0's 600 in its trailing
    // window: hourly exact (below K), rolling estimated (above K)
    val (h1, r1) = got(1L)
    assert(h1 == 40L, s"below-K hour must be exact, got $h1")
    assert(math.abs(r1 - 640L).toDouble / 640.0 <=
      4.0 / math.sqrt(KmvSketch.K),
      s"full-sketch rolling estimate $r1 vs exact 640")
  }
}
