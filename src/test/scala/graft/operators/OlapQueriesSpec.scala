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
