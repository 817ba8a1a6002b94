package graft.apps

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.PipelineQueries

/** Streaming delta-ingest gate (r19, VERDICT r18 task #2): the
  * pipe_delta_ingest decision body running inside foreachBatch over a
  * MemoryStream of delta docs. The planted corpus is the
  * PipelineQueriesSpec fixture — every decision branch fires — with
  * the intra-delta duplicate pair (89, 94) deliberately STRADDLING a
  * batch boundary under batchRows = 3, so the cross-batch seen-digest
  * state is load-bearing: doc 94 must come back exact_dup because
  * doc 89's digest was fed two batches earlier. Throughput is gated
  * ONLY in the bench artifact (`stream_ingest` line), never here —
  * the r18 StreamJoinSpec lesson. */
class StreamIngestSpec extends SparkSpec {

  // ADVICE r19: the planted fixture tree is deleted in afterAll —
  // tracked via this flag so a skipped suite never materializes it
  // just to delete it.
  private var plantedCreated: Option[java.nio.file.Path] = None

  override def afterAll(): Unit = {
    try plantedCreated.foreach { root =>
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(root)
      val all = try s.iterator().asScala.toSeq finally s.close()
      all.reverse.foreach(p =>
        try java.nio.file.Files.deleteIfExists(p)
        catch { case _: java.io.IOException => () })
    } finally super.afterAll()
  }

  private lazy val plantedDir: String = {
    import spark.implicits._
    val w = (1 to 117).map(i => s"q$i")
    val t0 = "the and of " + w.mkString(" ")
    val t0edit = "the and of " + w.updated(60, "EDIT").mkString(" ")
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
    val dirPath = java.nio.file.Files.createTempDirectory("graft_singest")
    plantedCreated = Some(dirPath)
    val dir = dirPath.toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(length(text) AS LONG) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("multi-batch streamed decisions equal the boundary-replaying " +
      "batch twin, and the cross-batch duplicate is caught") {
    val r = StreamBenchApp.runIngest(spark, plantedDir, batchRows = 3)
    assert(r.records == 16, "the planted delta split is 16 docs")
    assert(r.batches == 6, "16 docs at 3/batch = 6 micro-batches")
    assert(r.mismatches == 0,
      s"${r.mismatches} decisions diverge from the batch twin")
    val got = r.decisions.map(d => d._1 -> d._3).toMap
    // 89 fed in batch 4, 94 alone in batch 5 — only the seen-digest
    // state can mark it exact_dup
    assert(got(94L) == "exact_dup",
      s"cross-batch duplicate missed: $got")
    assert(got(4L) == "exact_dup" && got(9L) == "near_dup" &&
      got(14L) == "lang" && got(19L) == "quality" &&
      got(24L) == "contaminated" && got(34L) == "eval_split",
      s"standing-index probe decisions drifted: $got")
    assert(r.admitted > 0, "no admits — the quota branch is vacuous")
  }

  test("a single-batch run is byte-identical to pipe_delta_ingest") {
    val r = StreamBenchApp.runIngest(spark, plantedDir,
      batchRows = 1000)
    assert(r.batches == 1)
    assert(r.mismatches == 0)
    val oneShot = PipelineQueries.pipeDeltaIngest(spark, plantedDir)
      .collect()
      .map(row => (row.getLong(0), row.getString(1), row.getString(2)))
      .sortBy(_._1).toSeq
    assert(r.decisions.sortBy(_._1) == oneShot,
      "single-batch streamed decisions must equal the one-shot query")
  }

  test("genuinely NEW doc_ids are screened from their text — the " +
      "near-dup and contamination probes no longer require the doc " +
      "to be pre-indexed (ADVICE r19)") {
    import spark.implicits._
    val dir = plantedDir // standing indexes built over the fixture
    val w = (1 to 117).map(i => s"q$i")
    val t0 = "the and of " + w.mkString(" ")
    def clean(tag: String) = s"a the b and c " +
      (1 to 30).map(i => s"$tag$i").mkString(" ")
    // none of these ids exist in the corpus or any index; none are
    // ≡ 0 (mod 17), so the eval-split gate never masks the probes
    val batch = Seq(
      (1001L, t0),                                   // exact of base 0
      (1002L, "the and of " +                        // near-dup of 0
        w.updated(30, "EDITX").mkString(" ")),
      (1005L, ("a the b and c " +                    // near-dup of the
        (1 to 29).map(i => s"base1$i").mkString(" ") // SINGLETON-
        + " ZED")),                                  // bucket base 1
      (1006L, "a the b and c " +                     // 13-gram overlap
        w.slice(40, 53).mkString(" ") + " " +        // with eval doc 0
        (1 to 10).map(i => s"n$i").mkString(" ")),
      (1007L, clean("nw"))                           // novel — admit
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val prior = Seq.empty[String].toDF("text_md5")
    val got = PipelineQueries.flagBatch(spark, dir, batch, prior)
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[String]("drop_reason")).getOrElse("admit"))
      .toMap
    assert(got(1001L) == "exact_dup",
      s"new exact copy of a base doc must be caught: $got")
    assert(got(1002L) == "near_dup",
      s"new near-dup of a base doc must be caught: $got")
    assert(got(1005L) == "near_dup",
      s"singleton-base-bucket near-dup must be caught (the n >= 2 " +
        s"census cut would have skipped it): $got")
    assert(got(1006L) == "contaminated",
      s"new doc sharing an eval 13-gram must be caught: $got")
    assert(got(1007L) == "admit",
      s"a clean novel doc must pass every probe: $got")
  }
}
