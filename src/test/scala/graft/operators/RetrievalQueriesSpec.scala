package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalQueriesSpec extends SparkSpec {

  test("BM25 integer score matches a double-precision reference " +
    "within quantization error") {
    import RetrievalQueries._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum / n
    val df = BmTerms.map(t =>
      t -> docs.count(_._2.contains(t)).toDouble).toMap
    val k1 = BmK1Num.toDouble / BmK1Den
    val b = BmBNum.toDouble / BmBDen
    def ref(words: Seq[String]): Double = BmTerms.map { t =>
      val tf = words.count(_ == t).toDouble
      if (tf == 0 || df(t) == 0) 0.0
      else {
        val idf = math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5))
        idf * tf * (k1 + 1) /
          (tf + k1 * (1 - b + b * words.length / avgdl))
      }
    }.sum
    val got = tBm25TopK(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == BmK)
    val refScores = docs.map { case (id, ws) => id -> ref(ws) }.toMap
    got.foreach { case (id, q) =>
      // q is a ×1e4 fixed-point BM25 with one floor per idf and one
      // per doc-term division: tolerance a few quanta
      assert(math.abs(q / 1e4 - refScores(id)) < 2e-3,
        s"doc $id: quantized ${q / 1e4} vs reference ${refScores(id)}")
    }
    // the top-k really is the top-k of the reference ranking (modulo
    // quantization ties): every selected doc's reference score must
    // be >= the best unselected score minus tolerance
    val bestOut = refScores.filterNot(kv => got.contains(kv._1))
      .values.max
    got.values.foreach(q => assert(q / 1e4 >= bestOut - 2e-3))
  }

  test("DSIR weight is the exact sum of per-bucket quantized " +
    "log-ratios (first-principles recompute)") {
    import RetrievalQueries._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).toSeq))
    def bucket(w: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      val hex = md5.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % DsirBuckets
    }
    val tgt = docs.filter(d => DsirTargetSources.contains(d._2))
    val raw = docs.filterNot(d => DsirTargetSources.contains(d._2))
    val ct = tgt.flatMap(_._3).groupBy(bucket).view.mapValues(_.length)
    val cr = raw.flatMap(_._3).groupBy(bucket).view.mapValues(_.length)
    val tt = tgt.map(_._3.length).sum.toDouble
    val tr = raw.map(_._3.length).sum.toDouble
    def q(c: Int, t: Double): Long =
      math.floor((math.log(c + 1.0) - math.log(t + DsirBuckets))
        * 1e4 + 1e-6).toLong
    val got = tDsirWeight(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    docs.take(25).foreach { case (id, _, ws) =>
      val expect = ws.map { w =>
        val b = bucket(w)
        q(ct.getOrElse(b, 0), tt) - q(cr.getOrElse(b, 0), tr)
      }.sum
      assert(got(id) == ((ws.length.toLong, expect)),
        s"doc $id: got ${got(id)}, expected ($expect)")
    }
  }

  test("chunk dedup: census invariants + exact-duplicate docs lose " +
    "every chunk + lossless reassembly for fully-kept docs") {
    import RetrievalQueries._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def chunksOf(text: String): Seq[String] =
      text.split(" ", -1).grouped(ChunkWords)
        .map(_.mkString(" ")).toSeq
    val out = ddChunkDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out.length == docs.size)
    // census: kept chunks across the corpus == globally distinct chunks
    val allChunks = docs.toSeq.flatMap { case (_, t) => chunksOf(t) }
    assert(out.map(_._3).sum == allChunks.distinct.size)
    out.foreach { case (id, nc, nk, clean) =>
      assert(nc == chunksOf(docs(id)).size && nk <= nc)
      if (nk == nc) // nothing removed → exact reassembly
        assert(clean == docs(id), s"doc $id reassembly mismatch")
    }
  }

  test("chunk dedup on a planted corpus: dup doc keeps nothing, " +
    "partial-overlap doc keeps only its novel chunk") {
    import RetrievalQueries._
    import spark.implicits._
    val w = (1 to ChunkWords).map(i => s"w$i")
    val a = (w ++ w.map(_ + "x")).mkString(" ") // chunks A1, A2
    val c = (w ++ w.map(_ + "z")).mkString(" ") // chunks A1, C2
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_chunkdd").toString
    Seq((0L, a, "en", "s0", a.length.toLong),
        (1L, a, "en", "s0", a.length.toLong),  // exact dup of doc 0
        (2L, c, "en", "s0", c.length.toLong))  // shares chunk A1 only
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = ddChunkDedup(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3))).toMap
    assert(out(0L) == ((2L, 2L, a)))   // first occurrence keeps all
    assert(out(1L) == ((2L, 0L, ""))) // exact dup keeps nothing
    val novel = w.map(_ + "z").mkString(" ")
    assert(out(2L) == ((2L, 1L, novel))) // keeps only its novel chunk
  }

  def md5Hash60(s: String): Long = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md5.map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Reference CDC chunking: boundary before word i when the bigram
    * hash ≡ 0 mod CdcMod. */
  def cdcChunks(words: Seq[String]): Seq[Seq[String]] = {
    import RetrievalQueries.CdcMod
    val out = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer(words.head))
    words.sliding(2).foreach {
      case Seq(pw, w) =>
        if (md5Hash60(pw + " " + w) % CdcMod == 0)
          out += scala.collection.mutable.ArrayBuffer(w)
        else out.last += w
      case _ => ()
    }
    out.map(_.toSeq).toSeq
  }

  test("CDC chunking matches the reference recompute on the corpus") {
    import RetrievalQueries._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val refChunks = docs.map { case (id, ws) =>
      id -> cdcChunks(ws).map(_.mkString(" ")) }
    val census = refChunks.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size)
    val got = tCdcChunks(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    refChunks.foreach { case (id, cs) =>
      val shared = cs.count(c => census(c) > 1)
      assert(got(id) == ((cs.size.toLong, shared.toLong)),
        s"doc $id: ${got(id)} vs (${cs.size}, $shared)")
    }
  }

  test("CDC chunks survive a single-word insertion; fixed chunks " +
    "do not (the reason CDC exists)") {
    import RetrievalQueries._
    import spark.implicits._
    // base doc long enough for several CDC chunks; mutant inserts
    // one word mid-document
    val base = (0 until 120).map(i => s"tok${i % 37}v$i")
    val mutant = (base.take(60) :+ "INSERTED") ++ base.drop(60)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_cdc").toString
    Seq((0L, base.mkString(" "), "en", "s0", 1L),
        (1L, mutant.mkString(" "), "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = tCdcChunks(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val baseChunks = cdcChunks(base).map(_.mkString(" "))
    val mutantChunks = cdcChunks(mutant).map(_.mkString(" "))
    val sharedRef = baseChunks.toSet & mutantChunks.toSet
    // localization: every chunk not touching the insertion point
    // keeps its identity — the damage is O(1) chunks, not O(n)
    assert(sharedRef.size >= baseChunks.size - 3,
      s"CDC must localize the edit: ${sharedRef.size} of " +
        s"${baseChunks.size} chunks shared")
    assert(got(0L)._2 == baseChunks.count(sharedRef.contains),
      "engine shared-chunk count must match the reference")
    // fixed-size chunking loses every chunk after the insertion
    // 120 words → 12 fixed chunks; the insertion at word 60 keeps
    // exactly the 6 preceding chunks and shift-breaks every later one
    val fixedBase = base.grouped(ChunkWords).map(_.mkString(" ")).toSet
    val fixedMut = mutant.grouped(ChunkWords).map(_.mkString(" ")).toSet
    assert((fixedBase & fixedMut).size == 6,
      "fixed chunking should shift-break after the insertion")
  }

  test("trgm LIKE: planted corpus — trigram-coverage false positive " +
    "is rejected by the verify, true matches carry instr positions") {
    import spark.implicits._
    val p = RetrievalQueries.LikePattern // "spark order data"
    val docs = Seq(
      (0L, s"prefix words then $p and a tail"),       // true match
      (1L, p),                                        // exact doc
      // every trigram of p present (two overlapping halves swapped)
      // but the full substring absent — coverage says candidate,
      // verify must reject
      (2L, "order datax yspark order dat park order data spar"),
      (3L, "completely unrelated content here"),
      (4L, s"double $p again $p twice")                // first pos only
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_trgm_planted").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // fixture check: doc 2 really covers all trigrams of p
    val grams = (0 to p.length - 3).map(i => p.substring(i, i + 3)).toSet
    val d2 = "order datax yspark order dat park order data spar"
    val d2grams = (0 to d2.length - 3).map(i => d2.substring(i, i + 3)).toSet
    assert(grams.subsetOf(d2grams) && !d2.contains(p),
      "planted false positive must cover trigrams without containing")
    val got = RetrievalQueries.tTrgmLike(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expect = Seq(0L, 1L, 4L).map(id =>
      id -> (docs.collect().find(_.getLong(0) == id).get
        .getString(1).indexOf(p) + 1)).toMap
    assert(got == expect, s"got $got, expected $expect")
  }
}
