package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The composed corpus-construction pipeline — the end product every
  * individual dd_*, t_*, and l* operator exists to serve, run as ONE
  * registered query: a training corpus is built by chaining language
  * identification, quality gating, exact deduplication, near-dup
  * cluster deduplication, benchmark decontamination, and per-domain
  * quota capping (the C4/Gopher/RefinedWeb-style funnel), and what a
  * pipeline owner actually monitors is the FUNNEL — how many
  * documents and tokens each stage dropped.
  *
  * [[pipeCorpusBuild]] emits one row per stage: (stage_ord, stage,
  * n_docs, sum_tokens, id_digest). `id_digest` is a commutative
  * multiset digest — Σ (md5-60(doc_id) mod [[DigestMod]]) over the
  * stage's survivor set — so the oracle hash-verifies stage
  * MEMBERSHIP, not just its cardinality: two wrong drops that cancel
  * in count and token sum still flip the digest. The mod keeps the
  * sum far from long overflow at any corpus size (raw 60-bit terms
  * would overflow past ~8 rows).
  *
  * Stage semantics (each over the previous stage's survivors):
  *   0 raw      — the corpus.
  *   1 lang     — the [[TextQueries.corpusClean]] English-evidence
  *                gate (padded ' the '/' and ' occurrences > 0).
  *   2 quality  — n_tokens ≥ 20 and stopword-ratio < 0.5 (same
  *                arithmetic as corpusClean, stop terms the/and/of).
  *   3 exact    — keep the min doc_id per text digest among stage-2
  *                survivors (ddExactRows' deterministic convention).
  *   4 neardup  — drop non-representative members of the corpus
  *                near-dup clusters ([[DedupCluster.ddClusterCc]],
  *                memoized; clusters are a property of the corpus,
  *                so membership is computed once, full-corpus).
  *   5 decon    — drop the held-out eval docs (doc_id % 17 == 0, the
  *                t_decontaminate convention) and every training doc
  *                sharing a word 13-gram with them.
  *   6 quota    — at most [[TextQueries.DomainQuota]] docs per
  *                source, by the portable-hash draw (the l13 cap) on
  *                the custom bounded-heap TopKPerGroup path.
  *
  * 100 TB shape: the corpus projection that feeds every stage is one
  * slim scan (doc_id, source, digest, three integer text metrics —
  * text itself is dropped at the scan); the gates are map-side
  * filters; exact dedup is one digest-keyed shuffle; near-dup and
  * decon drops are broadcast anti-joins of the (tiny) drop lists the
  * memoized cluster/contamination derivations produce; the quota is
  * the bounded-heap operator (≤ quota rows per domain per map task);
  * and each funnel row is a map-side-combined 1-row aggregate. A
  * real pipeline materializes survivors between stages —
  * [[localCheckpoint]] on the shared base plays that role here.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Modulus for the per-stage membership digest (a prime well under
    * 2³¹, so a billion-document stage sum stays under 2⁶⁰). */
  val DigestMod = 1000000007L

  private def occ(c: Column, pat: String): Column =
    ((length(c) - length(regexp_replace(c,
      java.util.regex.Pattern.quote(pat), ""))) / pat.length)
      .cast("long")

  def pipeCorpusBuild(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val text = col("text")
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        md5(text).as("text_md5"),
        ((length(text) - length(translate(text, " ", ""))).cast("long")
          + 1L).as("n_tokens"),
        (occ(text, "the") + occ(text, "and") + occ(text, "of"))
          .as("stops"),
        (occ(text, " the ") + occ(text, " and ")).as("en"),
        graft.core.PortableHash.md5Hash60(col("doc_id")).as("h"))
      .localCheckpoint() // the staged-materialization point: all six
                         // stage chains and seven funnel aggregates
                         // re-read this slim projection, never the
                         // corpus
    val s1 = base.filter(col("en") > 0)
    val s2 = s1.filter(col("n_tokens") >= 20 &&
      col("stops").cast("double") / col("n_tokens") < 0.5)
    val s3 = s2.join(
      s2.groupBy(col("text_md5")).agg(min(col("doc_id")).as("doc_id")),
      Seq("text_md5", "doc_id"))
    val dups = DedupCluster.ddClusterCc(s, dir)
      .filter(col("cluster_id") =!= col("doc_id")).select(col("doc_id"))
    val s4 = s3.join(broadcast(dups), Seq("doc_id"), "left_anti")
    val contaminated = TextQueries.tDecontaminate(s, dir)
      .select(col("doc_id"))
    val s5 = s4.filter(col("doc_id") % 17 =!= 0)
      .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
    val s6 = graft.plans.TopKPerGroup(s5, Seq("source"), "h",
      descending = false, Seq("doc_id"), TextQueries.DomainQuota)
    def funnelRow(ord: Int, name: String, df: DataFrame): DataFrame =
      df.agg(
        count(lit(1)).cast("long").as("n_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).cast("long")
          .as("sum_tokens"),
        coalesce(sum(col("h") % DigestMod), lit(0L)).cast("long")
          .as("id_digest"))
        .select(lit(ord).as("stage_ord"), lit(name).as("stage"),
          col("n_docs"), col("sum_tokens"), col("id_digest"))
    funnelRow(0, "raw", base)
      .unionByName(funnelRow(1, "lang", s1))
      .unionByName(funnelRow(2, "quality", s2))
      .unionByName(funnelRow(3, "exact", s3))
      .unionByName(funnelRow(4, "neardup", s4))
      .unionByName(funnelRow(5, "decon", s5))
      .unionByName(funnelRow(6, "quota", s6))
  }

  val queries: Map[String, Q] = Map(
    "pipe_corpus_build" -> (pipeCorpusBuild _)
  )

  /** The full funnel in one DuckDB statement: the cluster closure
    * (DedupCluster's recursive CTE), the decontamination gram join
    * (raw gram strings where the engine joins 64-bit hashes — the
    * standing collision caveat), and window formulations of the
    * dedup-min and quota cuts the engine runs as one shuffle / the
    * bounded-heap operator. Hash equality certifies every stage's
    * membership via the digests. */
  val oracle: Map[String, String] = Map(
    "pipe_corpus_build" -> (DedupCluster.ccCte + s""",
      |base AS (SELECT doc_id, source, md5(text) AS text_md5,
      |  CAST(length(text) - length(replace(text, ' ', '')) + 1
      |    AS BIGINT) AS n_tokens,
      |  CAST((length(text) - length(replace(text, 'the', ''))) / 3
      |     + (length(text) - length(replace(text, 'and', ''))) / 3
      |     + (length(text) - length(replace(text, 'of', ''))) / 2
      |    AS BIGINT) AS stops,
      |  CAST((length(text) - length(replace(text, ' the ', ''))) / 5
      |     + (length(text) - length(replace(text, ' and ', ''))) / 5
      |    AS BIGINT) AS en,
      |  ${graft.core.PortableHash.duckSql("CAST(doc_id AS VARCHAR)")}
      |    AS h
      |  FROM documents),
      |s1 AS (SELECT * FROM base WHERE en > 0),
      |s2 AS (SELECT * FROM s1
      |       WHERE n_tokens >= 20
      |         AND CAST(stops AS DOUBLE) / n_tokens < 0.5),
      |s3 AS (SELECT s2.* FROM s2
      |       JOIN (SELECT text_md5, min(doc_id) AS doc_id
      |             FROM s2 GROUP BY text_md5) m
      |         ON s2.text_md5 = m.text_md5 AND s2.doc_id = m.doc_id),
      |s4 AS (SELECT * FROM s3 WHERE doc_id NOT IN
      |        (SELECT doc_id FROM lbl WHERE cluster_id <> doc_id)),
      |dw AS (SELECT doc_id, string_split(text, ' ') AS w
      |       FROM documents),
      |dg AS (SELECT doc_id,
      |         unnest(list_distinct(list_transform(
      |           range(1, greatest(len(w) - 12, 1) + 1),
      |           i -> array_to_string(w[i:i+12], ' ')))) AS g
      |       FROM dw),
      |ev AS (SELECT DISTINCT g FROM dg WHERE doc_id % 17 = 0),
      |cont AS (SELECT DISTINCT dg.doc_id FROM dg JOIN ev USING (g)
      |         WHERE dg.doc_id % 17 <> 0),
      |s5 AS (SELECT * FROM s4
      |       WHERE doc_id % 17 <> 0
      |         AND doc_id NOT IN (SELECT doc_id FROM cont)),
      |s6 AS (SELECT * FROM
      |        (SELECT s5.*, row_number() OVER (PARTITION BY source
      |           ORDER BY h, doc_id) AS rn FROM s5)
      |       WHERE rn <= ${TextQueries.DomainQuota}),
      |funnel AS (
      |  SELECT 0 AS o, 'raw' AS stage, count(*) AS n,
      |    sum(n_tokens) AS t, sum(h % $DigestMod) AS dg FROM base
      |  UNION ALL SELECT 1, 'lang', count(*), sum(n_tokens),
      |    sum(h % $DigestMod) FROM s1
      |  UNION ALL SELECT 2, 'quality', count(*), sum(n_tokens),
      |    sum(h % $DigestMod) FROM s2
      |  UNION ALL SELECT 3, 'exact', count(*), sum(n_tokens),
      |    sum(h % $DigestMod) FROM s3
      |  UNION ALL SELECT 4, 'neardup', count(*), sum(n_tokens),
      |    sum(h % $DigestMod) FROM s4
      |  UNION ALL SELECT 5, 'decon', count(*), sum(n_tokens),
      |    sum(h % $DigestMod) FROM s5
      |  UNION ALL SELECT 6, 'quota', count(*), sum(n_tokens),
      |    sum(h % $DigestMod) FROM s6)
      |SELECT CAST(o AS INTEGER) AS stage_ord, stage,
      |  CAST(n AS BIGINT) AS n_docs,
      |  CAST(coalesce(t, 0) AS BIGINT) AS sum_tokens,
      |  CAST(coalesce(dg, 0) AS BIGINT) AS id_digest
      |FROM funnel""".stripMargin)
  )
}
