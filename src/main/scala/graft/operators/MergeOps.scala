package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{PortableHash, Tables}

/** CDC merge / upsert — MERGE INTO semantics expressed Spark-first:
  * one full-outer equi-join on the key, then per-row resolution with
  * `coalesce` + `when` (matched → update, unmatched-source → insert,
  * unmatched-target → keep). Catalyst plans a single shuffle on the
  * key for both sides; with AQE the delta side (typically ≪ target)
  * broadcasts and the target never moves — exactly the shape a
  * 100 TB incremental-ingest pipeline wants. A real deployment would
  * pair this with a merge-on-read table format; the RESOLUTION
  * operator here is format-agnostic.
  *
  * The delta is derived deterministically from the base table via the
  * engine-portable hash (updates: h%10 < 3 re-priced; inserts: h%10 =
  * 0 under negated keys — disjoint from the positive key space at
  * any scale), so the merged result is exactly reproducible in the
  * SQL oracle.
  */
object MergeOps {
  type Q = (SparkSession, String) => DataFrame

  def m10MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    def cents = round(col("o_totalprice") * 100).cast("long")
    val withH = Tables.orders(s, dir)
      .withColumn("h", PortableHash.md5Hash60(col("o_orderkey")) % 10L)
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey"), cents.as("price_cents"))
    val updates = withH.filter(col("h") < 3)
      .select(col("o_orderkey"), (cents + 10000L).as("price_cents"))
    // Insert keys are NEGATED (orderkeys are positive), so the
    // synthetic new keys are disjoint from the base at ANY scale — a
    // fixed offset would collide once max(o_orderkey) crossed it.
    val inserts = withH.filter(col("h") === 0)
      .select((-col("o_orderkey") - 1L).as("o_orderkey"),
        cents.as("price_cents"))
    val delta = updates.unionByName(inserts)
    base.as("b").join(delta.as("u"), Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        coalesce(col("u.price_cents"), col("b.price_cents"))
          .as("price_cents"),
        when(col("u.price_cents").isNull, "kept")
          .when(col("b.price_cents").isNull, "inserted")
          .otherwise("updated").as("action"))
  }

  val queries: Map[String, Q] = Map(
    "m10_merge_upsert" -> (m10MergeUpsert _)
  )

  val oracle: Map[String, String] = Map(
    "m10_merge_upsert" ->
      """WITH o AS (SELECT o_orderkey,
        |   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |   ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT
        |     % 10 AS h
        |  FROM orders),
        |base AS (SELECT o_orderkey AS k, cents FROM o),
        |delta AS (
        |  SELECT o_orderkey AS k, cents + 10000 AS cents
        |  FROM o WHERE h < 3
        |  UNION ALL
        |  SELECT -o_orderkey - 1, cents FROM o WHERE h = 0)
        |SELECT coalesce(b.k, u.k) AS o_orderkey,
        | CAST(coalesce(u.cents, b.cents) AS BIGINT) AS price_cents,
        | CASE WHEN u.k IS NULL THEN 'kept'
        |      WHEN b.k IS NULL THEN 'inserted'
        |      ELSE 'updated' END AS action
        |FROM base b FULL OUTER JOIN delta u ON b.k = u.k""".stripMargin
  )
}
