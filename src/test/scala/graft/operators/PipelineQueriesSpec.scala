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
}
