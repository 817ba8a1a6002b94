package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OlapQueriesSpec extends SparkSpec {

  test("cube: one Expand pass, grouping ids partition the output, " +
    "and the grand total equals the table count") {
    val out = OlapQueries.x26Cube(spark, sfDir)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"),
      s"CUBE must plan as a single Expand + one aggregate, " +
        s"not unioned rescans:\n$plan")
    val rows = out.collect()
    assert(rows.map(_.getLong(2)).toSet == Set(0L, 1L, 2L, 3L))
    val total = graft.core.Tables.lineitem(spark, sfDir).count()
    val grand = rows.filter(_.getLong(2) == 3L)
    assert(grand.length == 1 && grand.head.getLong(3) == total)
    // each grouping set's row counts must re-sum to the grand total
    Seq(0L, 1L, 2L).foreach { gid =>
      val s = rows.filter(_.getLong(2) == gid).map(_.getLong(3)).sum
      assert(s == total, s"gid=$gid cells sum to $s, not $total")
    }
  }

  test("copurchase: first-principles pair census recompute") {
    val items = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCnt = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val itemCnt = items.groupBy(_._2).map { case (p, v) =>
      p -> v.size.toLong
    }
    val expect = pairCnt.filter(_._2 >= OlapQueries.MinPairSupport)
    val got = OlapQueries.x27Copurchase(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case ((p1, p2), (pn, n1, n2)) =>
      assert(pn == expect((p1, p2)))
      assert(n1 == itemCnt(p1) && n2 == itemCnt(p2))
    }
  }

  test("gapfill: dense per-type spine, LOCF recompute, gap flags") {
    val hourNs = TemporalQueries.HourNs
    val hourly = graft.core.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), expr(s"ts div $hourNs").as("hb"),
        round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2))
      .map { case (k, v) => k -> v.map(_._3).sum }
    val out = OlapQueries.e7Gapfill(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    hourly.keys.groupBy(_._1).foreach { case (et, ks) =>
      val (mn, mx) = (ks.map(_._2).min, ks.map(_._2).max)
      // spine is dense over [min, max] and nothing outside it
      (mn to mx).foreach { hb =>
        val (filled, isGap) = out((et, hb))
        assert(isGap == !hourly.contains((et, hb)))
        // LOCF: last observed sum at or before hb
        val last = (hb to mn by -1)
          .collectFirst { case h if hourly.contains((et, h)) =>
            hourly((et, h)) }.get
        assert(filled == last, s"($et,$hb): $filled vs $last")
      }
      assert(out.keys.count(_._1 == et) == (mx - mn + 1))
    }
  }

  test("edjoin: planted near-pairs survive the prefix filter, " +
    "including the all-positions-shift delete+append case") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog"
    // two substitutions, spread across the 24-char key
    val b = "tke quick brawn fox jumps over the lazy dog"
    // delete first char + append: every gram position shifts by one
    val c = a.drop(1) + "x"
    // three substitutions inside the key: beyond the threshold
    val d = "xhe qXick brown Yox jumps over the lazy dog"
    val filler = (10L to 29L).map(i =>
      (i, s"unrelated filler document number $i with its own words"))
    val docs = (Seq(0L -> a, 1L -> b, 2L -> c, 3L -> d) ++ filler)
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_edjoin_planted").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SimilarityQueries.ddEdJoin(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got.contains((0L, 1L)) && got((0L, 1L)) == 2)
    assert(got.contains((0L, 2L)) && got((0L, 2L)) <= 2)
    assert(!got.contains((0L, 3L)),
      "distance-3 pair must not be emitted")
    got.keys.foreach { case (x, y) => assert(x < y) }
  }

  test("edjoin: short keys under the pigeonhole floor take the " +
      "all-pairs fallback and near-pairs are still found") {
    import spark.implicits._
    // 5-char keys with one mid-key substitution: a single edit
    // destroys every q=4 gram they share, so the prefix filter alone
    // would silently miss the pair (ADVICE r16) — the length-bounded
    // all-pairs fallback must catch it
    val docs = (Seq(
      0L -> "abcde",          // short near-pair, dist 1 vs doc 1
      1L -> "abxde",
      2L -> "zzzzz",          // short, far from everything
      3L -> "abcdefgh") ++    // short (8 < 12), dist 3 vs doc 0
      (10L to 29L).map(i =>
        (i, s"unrelated filler document number $i with its own words")))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_edjoin_short").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SimilarityQueries.ddEdJoin(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got.contains((0L, 1L)) && got((0L, 1L)) == 1,
      s"short-key near-pair missed: $got")
    assert(!got.contains((0L, 2L)), "distance-4 short pair emitted")
    assert(!got.contains((0L, 3L)), "distance-3 short pair emitted")
  }

  test("edjoin on the fixture corpus agrees with brute force") {
    import spark.implicits._
    val keys = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        substring(col("text"), 1, SimilarityQueries.EdJoinKeyLen)
          .as("k"))
      .as[(Long, String)].collect()
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1)(i =>
        Array.tabulate(t.length + 1)(j => if (i == 0) j
        else if (j == 0) i else 0))
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val expect = (for {
      (ia, ka) <- keys; (ib, kb) <- keys if ia < ib
      dist = lev(ka, kb) if dist <= SimilarityQueries.EdJoinMaxDist
    } yield (ia, ib) -> dist).toMap
    val got = SimilarityQueries.ddEdJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == expect,
      s"missed: ${(expect.keySet -- got.keySet).take(5)}; " +
        s"extra: ${(got.keySet -- expect.keySet).take(5)}")
  }

  test("corr matrix: moment sums and r match a driver recompute") {
    val rows = graft.core.Tables.lineitem(spark, sfDir)
      .select(round(col("l_quantity")).cast("long"),
        round(col("l_extendedprice")).cast("long"),
        round(col("l_discount") * 1000).cast("long"),
        round(col("l_tax") * 1000).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    def corr(xs: Array[Long], ys: Array[Long])
      : (Long, Long, Long, Long, Long, Double) = {
      val n = xs.length.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val (sxx, syy) = (xs.map(a => a * a).sum, ys.map(b => b * b).sum)
      val r = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (math.sqrt(n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
          math.sqrt(n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
      (sx, sy, sxy, sxx, syy, r)
    }
    val expect = Map(
      "qty__usd" -> corr(rows.map(_._1), rows.map(_._2)),
      "qty__disc_pm" -> corr(rows.map(_._1), rows.map(_._3)),
      "usd__tax_pm" -> corr(rows.map(_._2), rows.map(_._4)))
    val got = OlapQueries.x28CorrMatrix(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)),
        r.getLong(1))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (pair, (moments, n)) =>
      assert(n == rows.length.toLong)
      assert(moments == expect(pair), pair)
      assert(math.abs(moments._6) <= 1.0, s"$pair r out of [-1,1]")
    }
  }

  test("scd2 build: runs partition each user's stream, states " +
    "alternate, intervals chain") {
    val out = OlapQueries.x29Scd2Build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5)))
    val events = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    assert(out.map(_._6).sum == events.length.toLong,
      "runs must partition the event stream")
    out.groupBy(_._1).foreach { case (u, runs0) =>
      val runs = runs0.sortBy(_._2)
      // driver recompute of the run-length encoding
      val stream = events.filter(_._1 == u).sortBy(e => (e._4, e._2))
      val expectRuns = stream.foldLeft(Vector.empty[(String, Long, Long)]) {
        case (acc, (_, _, et, t)) =>
          if (acc.nonEmpty && acc.last._1 == et)
            acc.init :+ ((et, acc.last._2, acc.last._3 + 1))
          else acc :+ ((et, t, 1L))
      }
      assert(runs.map(r => (r._3, r._4, r._6)).toVector == expectRuns,
        s"user $u run encoding")
      runs.sliding(2).filter(_.length == 2).foreach { w =>
        val (a, b) = (w(0), w(1))
        assert(a._3 != b._3, s"user $u: consecutive runs must differ")
        assert(a._5.contains(b._4), s"user $u: valid_to must chain")
      }
      assert(runs.last._5.isEmpty, s"user $u: live run stays open")
    }
  }

  test("skew profile: census recompute and skew ratio") {
    val cnts = graft.core.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey")).count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val top = cnts.sortBy(t => (-t._2, t._1)).take(OlapQueries.SkewTopK)
    val got = OlapQueries.p14SkewProfile(spark, sfDir).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      top.toSeq)
    val r0 = got.head
    assert(r0.getLong(2) == cnts.length.toLong)
    assert(r0.getLong(3) == cnts.map(_._2).sum)
    assert(r0.getLong(4) == cnts.map(_._2).max)
    assert(r0.getLong(6) ==
      r0.getLong(4) * r0.getLong(2) * 1000 / r0.getLong(3))
  }

  test("2-pass median: sorted recompute; cross-bucket straddle " +
    "resolves exactly") {
    val cs = graft.core.Tables.lineitem(spark, sfDir)
      .select(round(col("l_extendedprice") * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = cs.length
    val expect = cs((n + 1) / 2 - 1) + cs((n + 2) / 2 - 1)
    val got = OlapQueries.x31ExactMedian2pass(spark, sfDir).head()
    assert(got.getLong(0) == n.toLong)
    assert(got.getLong(1) == expect)
    // planted even-count corpus whose two middle values live in
    // DIFFERENT coarse buckets (1023 | 1025 around the 1024 edge)
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_median_straddle").toString
    Seq(0.07, 10.23, 10.25, 99.99).toDF("l_extendedprice")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val r = OlapQueries.x31ExactMedian2pass(spark, tmp).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 1023L + 1025L)
  }

  test("quantile bands: every band matches the sorted recompute " +
    "and bands are monotone") {
    val cs = graft.core.Tables.lineitem(spark, sfDir)
      .select(round(col("l_extendedprice") * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = cs.length.toLong
    val got = OlapQueries.x32QuantileBands(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == OlapQueries.QuantileBandsPm.toSet)
    OlapQueries.QuantileBandsPm.foreach { p =>
      val k = (n * p + 999) / 1000
      assert(got(p) == ((k, cs((k - 1).toInt))), s"p=$p")
    }
    val vals = OlapQueries.QuantileBandsPm.sorted.map(got(_)._2)
    assert(vals == vals.sorted, "quantile values must be monotone")
  }

  test("impute: planted nulls fill with the group median floor, " +
    "originals flagged") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_impute").toString
    Seq((1L, "a", Some(1.0)), (2L, "a", Some(2.0)),
      (3L, "a", Some(3.0)), (4L, "a", None),
      (5L, "b", Some(10.0)), (6L, "b", None))
      .toDF("event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = OlapQueries.p15Impute(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    assert(got(4L) == ((200L, true)), "a-median 2.00 fills the null")
    assert(got(6L) == ((1000L, true)), "b-median 10.00 fills the null")
    assert(got(1L) == ((100L, false)) && got(5L) == ((1000L, false)))
    assert(got.size == 6)
  }

  test("benford: digit census recompute; constants from one source") {
    val cs = graft.core.Tables.lineitem(spark, sfDir)
      .select(round(col("l_extendedprice") * 100).cast("long"))
      .collect().map(_.getLong(0))
    val census = cs.map(_.toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.size.toLong)
    val got = OlapQueries.p16Benford(spark, sfDir).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == census.keySet.toSet)
    got.foreach { case (d, (n, obsPm, benPm, dev)) =>
      assert(n == census(d))
      assert(obsPm == n * 1000 / cs.length)
      assert(benPm == OlapQueries.BenfordPm.toMap.apply(d))
      assert(dev == math.abs(obsPm - benPm))
    }
    // sanity: the expectation column really is Benford (d=1 ~ 30.1%)
    assert(OlapQueries.BenfordPm.head == ((1, 301L)))
  }

  test("winsorize: bounds are the exact type-1 group quantiles; " +
    "clip arithmetic and flags recompute") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bounds = ev.groupBy(_._2).map { case (et, rows) =>
      val cs = rows.map(_._3).sorted
      val n = cs.length.toLong
      def q(pm: Int) = cs(((n * pm + 999) / 1000 - 1).toInt)
      et -> (q(OlapQueries.WinsorLoPm), q(OlapQueries.WinsorHiPm))
    }
    val got = OlapQueries.x33Winsorize(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toMap
    assert(got.size == ev.length)
    ev.foreach { case (id, et, c) =>
      val (lo, hi) = bounds(et)
      val (_, c2, clipped, flag) = got(id)
      assert(c2 == c)
      assert(clipped == math.max(math.min(c, hi), lo))
      assert(flag == (if (c < lo) "low" else if (c > hi) "high"
        else "kept"))
    }
    // the band actually clips something on this corpus
    assert(got.values.exists(_._4 != "kept"))
  }

  test("centroids: exact integer sums match a driver recompute " +
    "and cover labels x dims") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    val dims = emb.head._2.length
    val expect = emb.flatMap { case (l, e) =>
      e.zipWithIndex.map { case (v, i) =>
        (l, i) -> math.round(v.toDouble * SimilarityQueries
          .CentroidScale)
      }
    }.groupBy(_._1).map { case (k, v) =>
      k -> (v.length.toLong, v.map(_._2).sum)
    }
    val got = SimilarityQueries.simCentroids(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.size == emb.map(_._1).distinct.length * dims)
    assert(got == expect)
  }
}
