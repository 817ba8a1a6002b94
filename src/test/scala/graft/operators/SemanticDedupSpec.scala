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
