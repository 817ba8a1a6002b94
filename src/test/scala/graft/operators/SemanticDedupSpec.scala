package graft.operators

import graft.SparkSpec

/** dd_semantic (SemDeDup-shape): planted semantic duplicates must
  * collapse to their centroid-nearest representative; distinct
  * content must survive. */
class SemanticDedupSpec extends SparkSpec {

  private def writeFixture(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_semantic").toString
    val rnd = new java.util.Random(7L)
    def vec(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val base = vec()
    // five near-identical members (cosine ≈ 0.998 ≫ SemTau) + three
    // mutually-random vectors (64-dim random cosine ≈ N(0, 1/64),
    // never near 0.7)
    val rows =
      (10 to 14).map { id =>
        val noise = vec()
        val e = base.zip(noise).map { case (x, z) => x + 0.03 * z }
        val n = math.sqrt(e.map(x => x * x).sum)
        (id.toLong, e.map(x => (x / n).toFloat).toSeq, 0)
      } ++ Seq(20L, 21L, 22L).map { id =>
        (id, vec().map(_.toFloat).toSeq, 1)
      }
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("planted near-identical group collapses to exactly its " +
      "centroid-nearest member; distinct vectors survive") {
    val dir = writeFixture()
    val out = SimilarityQueries.ddSemantic(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    val dups = out.filter { case (id, _, _) => id >= 10 && id <= 14 }
    val keptDups = dups.filter(_._3)
    assert(keptDups.length == 1,
      s"expected exactly 1 survivor of the planted group, got " +
        s"${keptDups.map(_._1).toSeq}")
    // the survivor is the centroid-nearest = max cosine-to-centroid
    val bestCosc = dups.map(_._2).max
    assert(keptDups.head._2 == bestCosc,
      s"survivor ${keptDups.head} is not the centroid-nearest " +
        s"(best cosc $bestCosc)")
    val others = out.filter(_._1 >= 20)
    assert(others.forall(_._3),
      s"distinct vectors were dropped: ${others.filterNot(_._3).toSeq}")
  }

  test("rank-window cap binds on an oversized cluster: drops are " +
      "counted and keep/drop degrades gracefully") {
    val dir = writeBigClusterFixture()
    // 12 near-identical vectors land in one bucket; window 3 < 11
    // predecessors, so the cap BINDS: skipped = C(12,2) − (3·12 − 6)
    val stats = SimilarityQueries
      .ddSemanticCapstatsWindowed(spark, dir, window = 3)
      .collect().head
    val maxCluster = stats.getLong(stats.fieldIndex("max_cluster"))
    val skipped = stats.getLong(stats.fieldIndex("pairs_skipped"))
    assert(maxCluster == 12L, s"fixture cluster fragmented: $stats")
    assert(skipped == 66L - 30L,
      s"expected 36 skipped comparisons, got $skipped ($stats)")
    // graceful degradation: near-identical members still collapse to
    // one survivor — every member exceeds SemTau against its
    // IMMEDIATE predecessors, so the window loses nothing here
    val out = SimilarityQueries
      .ddSemanticWindowed(spark, dir, window = 3).collect()
      .map(r => (r.getLong(0), r.getBoolean(3)))
    val kept = out.filter { case (id, k) => id < 100 && k }
    assert(kept.length == 1,
      s"windowed prune kept ${kept.map(_._1).toSeq} of the planted " +
        "cluster; expected exactly the centroid-nearest survivor")
    assert(out.filter(_._1 >= 100).forall(_._2),
      "distinct vectors must survive the windowed prune")
  }

  test("default window does not bind at fixture scale: " +
      "pairs_skipped = 0") {
    val dir = writeFixture()
    val stats = SimilarityQueries.ddSemanticCapstats(spark, dir)
      .collect().head
    assert(stats.getLong(stats.fieldIndex("pairs_skipped")) == 0L,
      s"SemRankWindow bound at fixture scale: $stats")
    // and therefore windowed ≡ unbounded (an astronomically large
    // window IS the unbounded prune) — row-for-row
    val dflt = SimilarityQueries.ddSemantic(spark, dir)
      .collect().map(_.toSeq).sortBy(_.toString)
    val unbounded = SimilarityQueries
      .ddSemanticWindowed(spark, dir, window = Int.MaxValue)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(dflt.sameElements(unbounded),
      "windowed result diverged from the unbounded prune even " +
        "though the cap never bound")
  }

  private def writeBigClusterFixture(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_semantic_big").toString
    val rnd = new java.util.Random(11L)
    def vec(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val base = vec()
    val rows =
      (0 until 12).map { id =>
        val noise = vec()
        val e = base.zip(noise).map { case (x, z) => x + 0.02 * z }
        val n = math.sqrt(e.map(x => x * x).sum)
        (id.toLong, e.map(x => (x / n).toFloat).toSeq, 0)
      } ++ Seq(100L, 101L).map { id =>
        (id, vec().map(_.toFloat).toSeq, 1)
      }
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("structured corpus: over-represented clusters prune hard") {
    val dir = AnnBenchCorpus.ensure(spark, perCluster = 100)
    val out = SimilarityQueries.ddSemantic(spark, dir).collect()
    val kept = out.count(_.getBoolean(3))
    val total = out.length
    assert(total == AnnBenchCorpus.Clusters * 100)
    // each planted cluster fragments across a handful of sign-LSH
    // buckets (members near a plane boundary flip bits — inherent to
    // LSH clustering, ~15 buckets/cluster measured), and each bucket
    // keeps ~1 representative: ≥80% of the corpus must go
    assert(kept <= total / 5,
      s"semantic prune kept $kept/$total — planted tight clusters " +
        "should collapse to a few representatives per bucket")
    assert(kept >= AnnBenchCorpus.Clusters / 2,
      s"only $kept representatives kept — implausibly aggressive")
  }
}
