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
}
