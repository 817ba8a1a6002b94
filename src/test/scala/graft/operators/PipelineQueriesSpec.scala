package graft.operators

import graft.SparkSpec

/** The composed corpus-construction funnel: stage algebra that must
  * hold on ANY corpus (monotone survivor counts, quota caps, digest
  * consistency) — the cross-engine content itself is pinned by the
  * DuckDB oracle. */
class PipelineQueriesSpec extends SparkSpec {

  test("funnel stages are ordered, monotone, and consistent with " +
      "the corpus") {
    val rows = PipelineQueries.pipeCorpusBuild(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq("raw", "lang", "quality",
      "exact", "neardup", "decon", "quota"))
    val nDocs = graft.core.Tables.documents(spark, sfDir).count()
    assert(rows.head._3 == nDocs, "raw stage must count the corpus")
    // every stage only drops documents — counts, token sums, and
    // membership digests are all monotone non-increasing
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, s"stage ${b._2} gained docs: $b vs $a")
      assert(b._4 <= a._4, s"stage ${b._2} gained tokens: $b vs $a")
      assert(b._5 <= a._5, s"stage ${b._2} digest grew: $b vs $a")
    }
    // the funnel must actually funnel on the shipped corpus (a gate
    // that drops nothing is a vacuous test), and survivors remain
    assert(rows.last._3 > 0, "quota stage emptied the corpus")
    assert(rows.last._3 < rows.head._3, "no stage dropped anything")
    // quota caps per-source membership, so the final count can never
    // exceed sources × quota
    val nSources = graft.core.Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(rows.last._3 <= nSources * TextQueries.DomainQuota)
  }

  test("delta ingest assigns every decision branch on a planted " +
      "corpus, with first-failure precedence") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // doc_id % 5 == 4 → delta; % 17 == 0 → eval. Base doc 0 is BOTH
    // the near-dup anchor and an eval doc — precedence must still
    // label its copies exact_dup/near_dup, not contaminated.
    val w = (1 to 117).map(i => s"q$i")
    val t0 = ("the and of " + w.mkString(" "))
    val t0edit = ("the and of " + w.updated(60, "EDIT").mkString(" "))
    val contam = "a the b " + w.slice(20, 33).mkString(" ") + " " +
      (1 to 45).map(i => s"z$i").mkString(" ")
    def clean(tag: String) = s"a the b and c " +
      (1 to 30).map(i => s"$tag$i").mkString(" ")
    val rows = Seq(
      (0L, t0), (1L, clean("base1")), (2L, clean("base2")),
      (4L, t0),                      // exact dup of base 0
      (9L, t0edit),                  // near dup of base 0
      (14L, (1 to 30).map(i => s"x$i").mkString(" ")), // no stopwords
      (19L, "a the b and c"),        // en>0 but 5 tokens
      (24L, contam),                 // shares a 13-gram with eval 0
      (34L, clean("ev")),            // eval split member
      (89L, clean("dupmate")), (94L, clean("dupmate")), // intra-delta
      (44L, clean("c44")), (49L, clean("c49")), (54L, clean("c54")),
      (59L, clean("c59")), (64L, clean("c64")), (69L, clean("c69")),
      (74L, clean("c74")), (79L, clean("c79")))
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest")
      .toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(length(text) AS LONG) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = PipelineQueries.pipeDeltaIngest(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.keySet == rows.map(_._1).filter(_ % 5 == 4).toSet,
      "exactly one decision per delta doc")
    assert(got(4L) == "exact_dup", s"base copy: $got")
    assert(got(9L) == "near_dup", s"one-word edit of base: $got")
    assert(got(14L) == "lang", s"stopword-free doc: $got")
    assert(got(19L) == "quality", s"short doc: $got")
    assert(got(24L) == "contaminated", s"13-gram overlap: $got")
    assert(got(34L) == "eval_split", s"eval member: $got")
    assert(got(94L) == "exact_dup", s"intra-delta dup loser: $got")
    // survivors: 89 + the eight c-docs; cap 5 → 5 admits by lowest
    // portable hash, the rest quota
    val surv = Seq(44L, 49L, 54L, 59L, 64L, 69L, 74L, 79L, 89L)
    surv.foreach(id => assert(Set("admit", "quota")(got(id)),
      s"doc $id should reach the quota stage: $got"))
    val expAdmits = surv.toDF("doc_id")
      .withColumn("h",
        graft.core.PortableHash.md5Hash60Composed(col("doc_id")))
      .orderBy(col("h"), col("doc_id"))
      .limit(PipelineQueries.DeltaAdmitCap)
      .collect().map(_.getLong(0)).toSet
    assert(surv.filter(id => got(id) == "admit").toSet == expAdmits,
      s"admits must be the $expAdmits lowest-hash survivors: $got")
  }

  test("delta ingest probes the catalog partition-pruned to the " +
      "base split") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val files = PipelineQueries.deltaFlagged(spark, sfDir)
      .queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec => f
      }.flatMap(_.selectedPartitions.toPartitionArray
        .map(_.filePath.toString))
      .filter(_.contains("catalog_digests"))
    assert(files.nonEmpty, "catalog must appear in the ingest plan")
    files.foreach(f => assert(f.contains("split=base"),
      s"catalog scan not pruned to the base split: $f"))
  }

  test("the ingest near-dup probe reads the cluster-layout banding, " +
      "never the top-k search layout") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val files = PipelineQueries.deltaFlagged(spark, sfDir)
      .queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec => f
      }.flatMap(_.selectedPartitions.toPartitionArray
        .map(_.filePath.toString))
    assert(files.exists(_.contains("mh_cbands")),
      "cluster bands must feed the near-dup probe")
    assert(files.exists(_.contains("mh_cstats")),
      "the census must come from the additive sidecar")
    assert(!files.exists(_.contains("mh_bands")),
      "the 4x8 search banding must not appear in an ADMISSION probe " +
        "(weaker recall at J>=0.85 would admit duplicates)")
  }
}
