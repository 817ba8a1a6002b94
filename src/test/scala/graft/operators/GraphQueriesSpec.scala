package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class GraphQueriesSpec extends SparkSpec {

  test("pagerank: symmetric pair is a fixed point at the initial rank") {
    import spark.implicits._
    // One part ↔ one supplier: both outdeg 1, so every iteration each
    // node receives the other's full rank and 150000 + 85% of 1e6 =
    // 1e6 exactly — the quantized fixed point, checkable by hand.
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_pagerank").toString
    Seq((1L, 1L)).toDF("l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val pr = GraphQueries.g5Pagerank(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr == Map(2L -> 1000000L, 3L -> 1000000L), s"got $pr")
  }

  test("pagerank on the corpus: ranks bounded below, hubs outrank leaves") {
    val pr = GraphQueries.g5Pagerank(spark, sfDir)
    // damping floor: every node keeps at least the teleport mass
    assert(pr.filter(col("pr") < GraphQueries.PrScale * 15 / 100)
      .count() == 0)
    // suppliers (odd ids) are the high-degree side of the bipartite
    // graph (each supplier serves many parts) — their mean rank must
    // exceed the parts' mean rank
    val means = pr
      .groupBy((col("node") % 2).as("side"))
      .agg(avg(col("pr")).as("mean_pr"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(means(1L) > means(0L),
      s"high-degree suppliers must outrank parts: $means")
    // node count = parts + suppliers present in lineitem
    val li = Tables.lineitem(spark, sfDir)
    val expectedNodes = li.select("l_partkey").distinct().count() +
      li.select("l_suppkey").distinct().count()
    assert(pr.count() == expectedNodes)
  }

  test("g5b block-fused convergence equals a step-at-a-time replay") {
    // Reference replay of the convergence rule, one power step at a
    // time: plain integer power steps, pair-smoothed iterates
    // avg_k = (pr_{k-1} + pr_k) div 2, consecutive smoothed L1
    // delta, stop at the first step k >= 2 under tol or at the cap.
    // The block-fused engine must reproduce the smoothed ranks AND
    // n_iters bit-for-bit — a fused block may compute steps past the
    // stop, but must never emit them.
    import GraphQueries.{PrScale, PrbMaxIters, PrbTolPerNode}
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val edges = li ++ li.map { case (p, s) => (s, p) }
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val tol = outdeg.size.toLong * PrbTolPerNode
    var prRaw = outdeg.keys.map(_ -> PrScale).toMap
    var avgPrev: Map[Long, Long] = null // smoothed iterate k-1
    var pr: Map[Long, Long] = null      // smoothed iterate k (emitted)
    var it = 0
    var converged = false
    while (it < PrbMaxIters && !converged) {
      val rate = prRaw.map { case (n, p) => n -> p / outdeg(n) }
      val nxt = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> (PrScale * 15 / 100 +
          es.map(e => rate(e._1)).sum * 85 / 100)
      }
      val avg = nxt.map { case (n, p) => n -> (prRaw(n) + p) / 2 }
      if (avgPrev != null) {
        val delta = avg.map { case (n, p) =>
          math.abs(p - avgPrev(n)) }.sum
        converged = delta <= tol
      }
      avgPrev = avg
      pr = avg
      prRaw = nxt
      it += 1
    }
    val got = GraphQueries.g5bPagerankConverged(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.forall(_._3 == it),
      s"n_iters ${got.head._3} vs replay $it")
    val gotMap = got.map(r => r._1 -> r._2).toMap
    assert(gotMap == pr, {
      val diff = pr.collect {
        case (n, p) if gotMap.get(n) != Some(p) =>
          s"$n: engine=${gotMap.get(n)} replay=$p"
      }
      s"rank mismatch (${diff.size} nodes): ${diff.take(5).mkString(", ")}"
    })
  }

  test("g5c warm start converges faster than cold and matches a " +
      "step-at-a-time replay from the persisted base ranks") {
    import GraphQueries.{PrScale, PrbMaxIters, PrbTolPerNode}
    val coldIters = GraphQueries.g5bPagerankConverged(spark, sfDir)
      .head().getInt(2)
    val got = GraphQueries.g5cPagerankIncremental(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val warmIters = got.head._3
    assert(got.forall(_._3 == warmIters))
    assert(warmIters < coldIters,
      s"warm start bought nothing: $warmIters vs cold $coldIters")
    // replay the warm phase one power step at a time, initialized
    // from the SAME persisted base ranks the engine reads (their
    // content is oracle-certified; this pins the warm LOOP)
    val baseRanks = spark.read.parquet(
        graft.sources.IndexStore.ensureBaseRanks(spark, sfDir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val edges = li ++ li.map { case (p, s) => (s, p) }
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val tol = outdeg.size.toLong * PrbTolPerNode
    var prRaw = outdeg.keys
      .map(n => n -> baseRanks.getOrElse(n, PrScale)).toMap
    var avgPrev: Map[Long, Long] = null
    var pr: Map[Long, Long] = null
    var it = 0
    var converged = false
    while (it < PrbMaxIters && !converged) {
      val rate = prRaw.map { case (n, p) => n -> p / outdeg(n) }
      val nxt = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> (PrScale * 15 / 100 +
          es.map(e => rate(e._1)).sum * 85 / 100)
      }
      val avg = nxt.map { case (n, p) => n -> (prRaw(n) + p) / 2 }
      if (avgPrev != null) {
        val delta = avg.map { case (n, p) =>
          math.abs(p - avgPrev(n)) }.sum
        converged = delta <= tol
      }
      avgPrev = avg
      pr = avg
      prRaw = nxt
      it += 1
    }
    assert(got.head._3 == it, s"n_iters ${got.head._3} vs replay $it")
    assert(got.map(r => r._1 -> r._2).toMap == pr,
      "warm-start ranks diverge from the replay")
  }

  test("triangles: planted co-purchase graph counted exactly") {
    import spark.implicits._
    // order 1 contains parts 1,2,3 (one triangle); order 2 parts
    // 3,4 (an edge that closes nothing)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_tri").toString
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val r = GraphQueries.g6Triangles(spark, tmp).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 4L, 1L)))
  }

  test("triangles on the corpus equal a brute-force recount") {
    val pairs = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.groupBy(_._1).values.flatMap { sup =>
      val ss = sup.map(_._2).distinct.sorted
      for (i <- ss.indices; j <- i + 1 until ss.length)
        yield (ss(i), ss(j))
    }.toSet
    val adj = edges.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val brute = edges.toSeq.map { case (u, v) =>
      (adj.getOrElse(u, Set.empty) & adj.getOrElse(v, Set.empty)).size
    }.sum // each triangle u<v<w counted once, at edge (u,v) via w
    val r = GraphQueries.g6Triangles(spark, sfDir).head()
    assert(r.getLong(1) == edges.size.toLong)
    assert(r.getLong(2) == brute.toLong,
      s"engine ${r.getLong(2)} vs brute $brute")
  }
}
