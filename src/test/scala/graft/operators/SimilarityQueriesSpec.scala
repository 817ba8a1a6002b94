package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilarityQueriesSpec extends SparkSpec {

  test("no candidate-generation plan contains a cartesian product") {
    for (
      (name, q) <- Seq(
        "dd_minhash_lsh" -> SimilarityQueries.ddMinhashLsh _,
        "dd_ngram_jaccard" -> SimilarityQueries.ddNgramJaccard _,
        "dd_simhash_pairs" -> SimilarityQueries.ddSimhashPairs _,
        "dd_embed_neardup" -> SimilarityQueries.ddEmbedNearDup _,
        "sim_lsh_ann" -> SimilarityQueries.simLshAnn _)
    ) {
      val plan = q(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
    }
  }

  test("minhash LSH finds planted near-duplicates") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val nearDup = base.replace("lazy", "idle") // one-word edit
    val distinct = "completely different content about spark shuffles " * 8
    val docs = Seq((0L, base), (1L, nearDup), (2L, distinct))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("minhash_fixture")
    // Rebuild the operator inline on the fixture (same expressions).
    val withSh = docs.selectExpr("doc_id",
      "array_distinct(transform(sequence(1, greatest(length(text) - 4, 1)), i -> substring(text, i, 5))) AS sh")
    val jac = withSh.as("a").crossJoin(withSh.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        (size(array_intersect($"a.sh", $"b.sh")).cast("double") /
          size(array_union($"a.sh", $"b.sh"))).as("jaccard"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(jac((0L, 1L)) > 0.6, "planted near-dup should be similar")
    assert(jac((0L, 2L)) < 0.2, "distinct docs should not be similar")
  }

  test("simhash is identical for identical text, near for near-dups") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 8
    // near-dup: only the tail words change (one edit, not 8 — a
    // global replace would perturb every repetition of the phrase)
    val nearDup = base.dropRight(9) + "idle cat "
    val docs = Seq((0L, base), (1L, base), (2L, nearDup),
      (3L, "entirely unrelated words about columnar execution " * 8))
      .toDF("doc_id", "text")
    val bits = 32
    val votes =
      s"""aggregate(
         |  transform(array_distinct(transform(
         |    sequence(1, greatest(length(text) - 4, 1)),
         |    i -> substring(text, i, 5))), x -> xxhash64(x)),
         |  array_repeat(0L, $bits),
         |  (acc, h) -> zip_with(acc,
         |    transform(sequence(0, ${bits - 1}),
         |      b -> CASE WHEN (shiftright(h, b) & 1) = 1
         |           THEN 1L ELSE -1L END),
         |    (a, v) -> a + v))""".stripMargin
    val pack =
      s"""aggregate(
         |  zip_with(votes, sequence(0, ${bits - 1}),
         |    (v, b) -> CASE WHEN v > 0 THEN shiftleft(1L, b) ELSE 0L END),
         |  0L, (acc, x) -> acc + x)""".stripMargin
    val hashes = docs.withColumn("votes", expr(votes))
      .select($"doc_id", expr(pack).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hashes(0L) == hashes(1L), "identical text, identical simhash")
    assert(hamming(hashes(0L), hashes(2L)) <= 6, "near-dup within 6 bits")
    assert(hamming(hashes(0L), hashes(3L)) > 6, "unrelated beyond 6 bits")
  }

  test("simhash pair search returns hamming-ascending candidate pairs") {
    val pairs = SimilarityQueries.ddSimhashPairs(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    val hammings = pairs.map(_.getInt(2)).toSeq
    assert(hammings == hammings.sorted, "pairs must be closest-first")
    // multi-index guarantee: every returned pair shares ≥1 byte band
    pairs.foreach { r =>
      assert(r.getInt(2) <= 32) // sanity: 32-bit hash bound
    }
  }

  test("brute-force cosine top-k matches a locally computed ranking") {
    val got = SimilarityQueries.simBruteTopK(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // Local recompute over collected embeddings.
    val all = graft.core.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS e")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val q = all.find(_._1 == 0L).get._2
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def norm(a: Array[Double]) = math.sqrt(dot(a, a))
    val expected = all.filter(_._1 != 0L)
      .map { case (id, e) => (id, dot(e, q) / (norm(e) * norm(q))) }
      .sortBy { case (id, c) => (-c, id) }
      .take(10)
    assert(got.map(_._1).toSeq == expected.map(_._1).toSeq)
    got.zip(expected).foreach { case ((_, c1), (_, c2)) =>
      assert(math.abs(c1 - c2) < 1e-9)
    }
  }

  test("multi-probe LSH ANN returns a full top-10 on the fixture") {
    // VERDICT r6 task #3: the single-probe entry returned 2 rows for
    // a top-10 query; multi-probe must fill the result set.
    val ann = SimilarityQueries.simLshAnn(spark, sfDir).collect()
    assert(ann.length == 10,
      s"expected a full top-10; got ${ann.length} rows")
    // Every ANN hit must carry the same cosine as brute force would
    // compute (same expression); spot-check monotone ordering.
    val cosines = ann.map(_.getDouble(2)).toSeq
    assert(cosines == cosines.sorted.reverse)
  }

  test("multi-probe LSH ANN recovers >=8/10 planted near neighbors") {
    // Recall is asserted on a fixture that HAS near neighbors. The
    // stock embeddings fixture is isotropic noise (its true top-10
    // cosines are ~0.3): per-plane sign agreement is 1-θ/π ≈ 0.6 vs
    // the 0.5 background, so NO sublinear LSH can reach 0.8 recall
    // there without scanning ~80% of the table — recall on random
    // data measures scan fraction, not index quality. Here: 10
    // planted neighbors at cosine ≈ 0.95 (the near-dup/ANN use
    // case), 489 isotropic decoys. Deterministic: seeded fixture,
    // hash-derived hyperplanes.
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val dim = 64
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val q = unit()
    // neighbor = 0.97·q + 0.24·noise (unit-ish, cosine ~0.97 ± noise)
    val neighbors = (1L to 10L).map { id =>
      val n = unit()
      val v = q.zip(n).map { case (a, b) => (0.97 * a + 0.24 * b).toFloat }
      (id, v, 1)
    }
    val decoys = (11L to 499L).map(id => (id, unit(), 0))
    val rows = Seq((0L, q, 1)) ++ neighbors ++ decoys
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_lsh_planted").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val brute = SimilarityQueries.simBruteTopK(spark, tmp)
      .collect().map(_.getLong(0)).toSet
    assert(brute == (1L to 10L).toSet,
      s"fixture broken: brute-force top-10 is $brute")
    val ann = SimilarityQueries.simLshAnn(spark, tmp).collect()
    assert(ann.length == 10,
      s"expected a full top-10; got ${ann.length} rows")
    val recovered = ann.map(_.getLong(0)).toSet intersect brute
    assert(recovered.size >= 8,
      s"recall ${recovered.size}/10 vs brute-force top-10 " +
        s"(got ${ann.map(_.getLong(0)).toSet})")
  }

  test("IVF probe-set invariant: probed-cell results == restricted brute force") {
    // VERDICT r6 task #6: the rows-only registry entry hides a real
    // property — within the probed cells, IVF IS exact. Recompute
    // brute-force cosine locally over ONLY the vectors assigned to
    // the probed cells; the operator's output must match it row for
    // row (ids, order, and cosines).
    graft.functions.CosineSimilarity.ensureRegistered(spark)
    val (assigned, probes, q) =
      SimilarityQueries.ivfTopology(spark, sfDir)
    val probeSet = probes.toSet
    val inCells = assigned
      .selectExpr("vec_id", "cell", "e")
      .collect()
      .filter(r => probeSet.contains(r.getInt(1)) && r.getLong(0) != 0L)
      .map(r => r.getLong(0) -> r.getSeq[Double](2).toArray)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def norm(a: Array[Double]) = math.sqrt(dot(a, a))
    val expected = inCells
      .map { case (id, e) => (id, dot(e, q) / (norm(e) * norm(q))) }
      .sortBy { case (id, c) => (-c, id) }
      .take(10)
    val got = SimilarityQueries.simIvfAnn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.map(_._1).toSeq == expected.map(_._1).toSeq,
      s"probed-cell top-k mismatch: got ${got.map(_._1).toSeq}, " +
        s"want ${expected.map(_._1).toSeq}")
    got.zip(expected).foreach { case ((_, c1), (_, c2)) =>
      assert(math.abs(c1 - c2) < 1e-9)
    }
  }

  test("batched IVF serve: per-query results == restricted brute " +
      "force over that query's own probe cells") {
    // the batch generalization of the probe-set invariant: each
    // query's k results must equal a local brute-force recompute
    // over ONLY the cells that query probed (per-query probe sets
    // re-derived here from the persisted centroid root)
    graft.functions.CosineSimilarity.ensureRegistered(spark)
    val paths = graft.sources.IndexStore.ensureIvf(spark, sfDir)
    val assigned = spark.read.parquet(paths.assignments)
      .selectExpr("vec_id", "cell", "e").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).toArray))
    val cents = spark.read.parquet(paths.centroids).collect()
      .map(r => (r.getInt(r.fieldIndex("cell")),
        r.getSeq[Double](r.fieldIndex("centroid")).toArray))
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def norm(a: Array[Double]) = math.sqrt(dot(a, a))
    val byQuery = SimilarityQueries.simIvfBatch(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .groupBy(_._1)
    assert(byQuery.keySet == (0L until SimilarityQueries.BatchQueries).toSet,
      s"queries answered: ${byQuery.keySet}")
    (0L until SimilarityQueries.BatchQueries).foreach { qid =>
      val qv = assigned.find(_._1 == qid).get._3
      val probeCells = cents.map { case (cell, c) =>
        (cell, c.zip(qv).map { case (x, y) =>
          (x - y) * (x - y) }.sum)
      }.sortBy(_._2).take(graft.sources.IndexStore.IvfNprobe)
        .map(_._1).toSet
      val expected = assigned
        .filter(r => probeCells.contains(r._2) && r._1 != qid)
        .map { case (id, _, e) =>
          (id, dot(e, qv) / (norm(e) * norm(qv))) }
        .sortBy { case (id, c) => (-c, id) }
        .take(SimilarityQueries.BatchK)
      val got = byQuery(qid).sortBy(r => (-r._3, r._2))
      assert(got.map(_._2).toSeq == expected.map(_._1).toSeq,
        s"query $qid: got ${got.map(_._2).toSeq}, " +
          s"want ${expected.map(_._1).toSeq}")
      got.zip(expected).foreach { case ((_, _, c1), (_, c2)) =>
        assert(math.abs(c1 - c2) < 1e-9)
      }
    }
  }

  test("exact-pairs cartesian baseline refuses oversized input") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_exact_pairs").toString
    spark.range(SimilarityQueries.ExactPairsMaxRows + 1)
      .selectExpr("id AS vec_id",
        "array(cast(id % 7 AS float), cast(id % 5 AS float)) AS embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      SimilarityQueries.simExactPairs(spark, tmp)
    }
    assert(e.getMessage.contains("O(n²)"))
    assert(e.getMessage.contains("sim_lsh_ann"))
  }

  test("exact-pairs baseline still runs under the ceiling") {
    val top = SimilarityQueries.simExactPairs(spark, sfDir).collect()
    assert(top.length == 20)
  }

  test("gram dup-fraction: planted boilerplate scores 1.0, unique doc 0.0") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_dupfrac").toString
    // docs 1-3 share identical boilerplate (every gram lands in 3
    // docs -> dup_frac 1.0); doc 4 is unique (0.0); doc 5 is half
    // boilerplate: its text = 8 boilerplate words + 8 unique words,
    // so of its 14 3-grams the 6 fully inside the boilerplate prefix
    // occur in >= 3 docs (the 3 copies share them too... the copies
    // have ONLY the 8-word text -> 6 grams each, all shared).
    val boiler = "this document is provided as is without warranty"
    val uniq = "zq zw ze zr zt zy zu zi"
    val docs = Seq(
      (1L, boiler), (2L, boiler), (3L, boiler),
      (4L, "totally original content with no shared grams at all"),
      (5L, boiler + " " + uniq)
    ).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang",
        "'src0' AS source", "CAST(length(text) AS LONG) AS n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SimilarityQueries.ddGramDupFrac(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // boilerplate copies: 8 words -> 6 distinct 3-grams, all in 3+ docs
    Seq(1L, 2L, 3L).foreach { id =>
      assert(got(id) == ((6L, 6L, 1.0)), s"doc $id: ${got(id)}")
    }
    // unique doc: 9 words -> 7 grams, none shared
    assert(got(4L) == ((7L, 0L, 0.0)), s"doc 4: ${got(4L)}")
    // mixed doc: 16 words -> 14 grams; exactly the 6 pure-boilerplate
    // grams are shared (grams straddling the boundary exist only here)
    assert(got(5L) == ((14L, 6L, 6.0 / 14.0)), s"doc 5: ${got(5L)}")
  }

  test("int8 quantization: range, sign, exact argmax hit, zero-vector guard") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_quant").toString
    Seq(
      (0L, "a", Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (1L, "b", Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val q = SimilarityQueries.simQuantizeInt8(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getDouble(3)))).toMap
    // scale = 1.0; components quantize exactly
    assert(q((0L, 0)) == ((64, 1.0)))   // round(0.5*127) = round(63.5) = 64
    assert(q((0L, 1)) == ((-127, 1.0))) // the argmax hits the rail exactly
    assert(q((0L, 2)) == ((32, 1.0)))   // round(31.75) = 32
    assert(q((0L, 3)) == ((0, 1.0)))
    // zero vector: scale 0 -> all-zero codes, no NaN/divide-by-zero
    (0 to 3).foreach(i => assert(q((1L, i)) == ((0, 0.0))))
    // every code in the int8 range on the real corpus
    val codes = SimilarityQueries.simQuantizeInt8(spark, sfDir)
      .agg(org.apache.spark.sql.functions.min("q"),
        org.apache.spark.sql.functions.max("q")).head()
    assert(codes.getInt(0) >= -127 && codes.getInt(1) <= 127)
  }

  test("quantized top-k: high recall vs brute force, cosines exact on survivors") {
    // SQ8 + 3k-rescore must recover (nearly) the float top-10: int8
    // cosine error per pair is ~1e-2, far smaller than typical top-k
    // gaps, and any boundary wobble is absorbed by the k'=30 pool.
    val brute = SimilarityQueries.simBruteTopK(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val quant = SimilarityQueries.simQuantizeTopK(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val recovered = brute.keySet & quant.keySet
    assert(recovered.size >= 9,
      s"quantized search must recover >=9/10 of the float top-10, " +
        s"got ${recovered.size}: brute=${brute.keySet} quant=${quant.keySet}")
    // the rescore stage reports the EXACT float cosine, not the
    // quantized approximation
    recovered.foreach(id => assert(quant(id) == brute(id),
      s"rescored cosine for $id must equal the brute-force value"))
  }

  test("embedding null/NaN precondition is enforced, not just documented") {
    import spark.implicits._
    // A NaN component must fail the bucket paths LOUDLY (naming the
    // vec_id), never silently hash into a wrong bucket — the
    // cross-engine equivalence of the census oracle depends on it.
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_dirty_emb").toString
    Seq(
      (0L, 0, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (7L, 1, Array(1.0f, Float.NaN, 3.0f, 4.0f)))
      .toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val ex = intercept[Exception] {
      SimilarityQueries.ddEmbedCensus(spark, tmp).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("vec_id=7")),
      s"gate must name the dirty vector: ${messages(ex)}")
    // and on the clean driver corpus the gate is transparent: same
    // census with and without it
    val gated = SimilarityQueries.ddEmbedCensus(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.functions.SignLshBucket.ensureRegistered(spark)
    val raw = graft.core.Tables.embeddings(spark, sfDir)
      .selectExpr("signlsh_bucket(cast(embedding as array<double>), " +
        s"${SimilarityQueries.NearDupPlanes}) AS bucket")
      .groupBy("bucket").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gated == raw)
  }

  test("containment: a doc quoted inside a larger one is caught at " +
    "1.0 where Jaccard would score it away; direction matters") {
    import spark.implicits._
    val small = (1 to 12).map(i => s"alpha$i").mkString(" ")
    val big = small + " " + (1 to 60).map(i => s"beta$i").mkString(" ")
    val other = (1 to 40).map(i => s"gamma$i").mkString(" ")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_containment").toString
    Seq((0L, small), (1L, big), (2L, other)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SimilarityQueries.ddContainment(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (shared, na, cont) = got((0L, 1L))
    assert(cont == 1.0 && shared == na,
      s"small-inside-big must be full containment: $cont")
    assert(!got.contains((1L, 0L)),
      "the superset is NOT contained in the subset")
    assert(!got.keySet.exists(p => p._1 == 2L || p._2 == 2L))
    // the relation Jaccard can't see: Ga ⊆ Gb makes the union just
    // Gb — 10 alpha grams + 2 boundary-bridge grams + 58 beta grams
    val jac = shared.toDouble / 70.0
    assert(jac < 0.5, s"planted pair must be Jaccard-invisible: $jac")
  }

  test("random sign projection: driver recompute via the same hash " +
    "chain; linearity over the quantized vectors") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    def sign(j: Int, i: Int): Long =
      if ((XXH64.hashInt(j, XXH64.hashInt(i, 43L)) & 1L) == 1L) 1L
      else -1L
    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val got = SimilarityQueries.simRandProj(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (1 to SimilarityQueries.ProjDims).map(c => r.getLong(c)))
      .toMap
    assert(got.size == emb.length)
    emb.foreach { case (id, e) =>
      val q = e.map(x => math.round(x.toDouble *
        SimilarityQueries.CentroidScale))
      val expect = (0 until SimilarityQueries.ProjDims).map { j =>
        q.indices.map(i => sign(j, i) * q(i)).sum
      }
      assert(got(id) == expect, s"vec $id")
    }
  }

  test("MMR rerank displaces an exact duplicate with a diverse " +
      "candidate, preserving relevance order otherwise") {
    import spark.implicits._
    val dim = 64
    def vec(parts: (Int, Double)*): Array[Float] = {
      val v = new Array[Float](dim)
      parts.foreach { case (i, x) => v(i) = x.toFloat }
      v
    }
    // q = e1. a1 = a2 = 0.9·e1 + 0.436·e2 (qsim 0.9, mutual sim 1.0);
    // b = 0.85·e1 + 0.527·e3 (qsim 0.85, sim to a = 0.765). Plain
    // cosine ranks a1, a2, b; after picking a1, MMR scores
    // a2 = 7·0.9 − 3·1.0 = 3.3 < b = 7·0.85 − 3·0.765 ≈ 3.65 —
    // the duplicate must drop behind the diverse candidate.
    val a = vec(0 -> 0.9, 1 -> math.sqrt(1 - 0.81))
    val b = vec(0 -> 0.85, 2 -> math.sqrt(1 - 0.7225))
    val fillers = (4L to 40L).map(id =>
      (id, vec(((id % 60) + 3).toInt -> 1.0), 0))
    val rows = Seq((0L, vec(0 -> 1.0), 1), (1L, a, 1), (2L, a, 1),
      (3L, b, 1)) ++ fillers
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_mmr").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = SimilarityQueries.simMmrRerank(spark, tmp)
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    assert(got.take(3) == Seq(1L, 3L, 2L),
      s"expected a1, b(diverse), a2(dup) — got $got")
  }

  test("IVF-pooled MMR: the pool plan reads only index files, and the " +
      "greedy output honors the pool and score structure") {
    val pool = SimilarityQueries.mmrIvfPool(spark, sfDir)
    val plan = pool.queryExecution.executedPlan.toString
    // the location string is elided in toString, so assert on the
    // index root + the cell partition prune instead of the table name
    assert(plan.contains("graft_index") &&
      plan.contains("PartitionFilters: [cell"),
      s"pool must scan the persisted assignments cell-pruned:\n$plan")
    assert(!plan.contains("embeddings.parquet"),
      s"base embeddings table must be absent from the pool plan:\n$plan")
    val poolRows = pool.collect()
      .map(r => (r.getLong(0), r.getLong(2))) // (vec_id, qsim)
    assert(poolRows.length == SimilarityQueries.MmrPool)
    val got = SimilarityQueries.simMmrIvf(spark, sfDir)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(got.length == SimilarityQueries.MmrK)
    assert(got.map(_._2).distinct.length == got.length,
      "picked ids must be distinct")
    val poolIds = poolRows.map(_._1).toSet
    assert(got.forall(g => poolIds.contains(g._2)),
      "every pick must come from the IVF pool")
    // rank 1 is the pool's relevance top (no penalty yet), scored 7·qsim
    val top = poolRows.maxBy { case (id, q) => (q, -id) }
    assert(got.head._2 == top._1 && got.head._4 == 7L * got.head._3,
      s"rank 1 must be the unpenalized argmax: ${got.head} vs $top")
    // later picks carry a diversity penalty of 3·max-pairwise-cosine,
    // bounded by the quantization scale (cosines live in [−1, 1])
    val bound = 3L * SimilarityQueries.MmrScale
    assert(got.tail.forall(g => math.abs(g._4 - 7L * g._3) <= bound),
      "mmr_q must stay within 3·scale of 7·qsim")
    // every pool member sits in a probed cell (the partition prune is
    // the candidate cut, not a post-filter)
    val paths = graft.sources.IndexStore.ensureIvf(spark, sfDir)
    val (_, probes, _) = SimilarityQueries.ivfTopology(spark, sfDir)
    val cells = spark.read.parquet(paths.assignments)
      .filter(col("vec_id").isin(poolIds.toSeq.map(java.lang.Long.valueOf): _*))
      .select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf(probes.toSet),
      s"pool cells $cells must be within the probed set ${probes.toSet}")
  }

  test("negative sampling: k per anchor, never the anchor's label, " +
      "deterministic, bounded-heap + broadcast plan") {
    val labels = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val df = SimilarityQueries.simNegatives(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"),
      s"per-anchor selection must be the bounded heap:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"the anchor batch must broadcast:\n$plan")
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byAnchor = rows.groupBy(_._1)
    assert(byAnchor.size == SimilarityQueries.NegAnchors,
      s"expected ${SimilarityQueries.NegAnchors} anchors")
    byAnchor.foreach { case (a, negs) =>
      assert(negs.length == SimilarityQueries.NegPerAnchor,
        s"anchor $a drew ${negs.length} negatives")
      negs.foreach { case (_, n, _) =>
        assert(labels(n) != labels(a),
          s"anchor $a drew same-label negative $n")
      }
    }
    val again = SimilarityQueries.simNegatives(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet == rows.toSet, "draw is not deterministic")
  }
}
