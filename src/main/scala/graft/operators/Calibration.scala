package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Host-speed calibration probe (r21, VERDICT r20 task #1).
  *
  * The r20 verdict's headline finding was that the bench signal is
  * host-noise-limited: the same code measured 111.9→164.3 s across
  * one day, so cross-round wall-second comparisons are adjudicated
  * by after-the-fact per-query bisects. This query is the in-sweep
  * ruler that makes those comparisons self-normalizing: a fixed,
  * data-INDEPENDENT integer workload (no I/O beyond the plan, no
  * shuffle skew, no index state) whose wall time tracks the host's
  * effective compute speed. Readers divide any query's seconds by
  * the same sweep's `cal_host_probe` seconds to get a host-
  * normalized ratio; two sweeps whose probes differ by 1.3× are a
  * 1.3× host day, not an engine regression (BENCH_NOTES.md r21
  * documents the protocol).
  *
  * Like every registered query it computes fresh each invocation
  * (nothing memoized) and carries an exact DuckDB oracle: the
  * checksum is a pure integer fold both engines agree on bit-for-
  * bit, so the probe is also hash-gated — a wrong row count or a
  * codegen fault flips the compare.
  */
object Calibration {
  type Q = (SparkSession, String) => DataFrame

  /** Probe size: large enough that scheduling noise is <5% of its
    * wall (~0.3-0.5 s on the reference 32-core host), small enough
    * that the probe itself is a negligible slice of the sweep. */
  val CalRows = 2000000000L

  /** Knuth multiplicative-hash constant and a prime modulus — an
    * arbitrary but fixed integer mix both engines fold identically
    * (every term < 1e6, so the 2e9-term sum stays far inside i64
    * after the modulus; the product id*K maxes at ~5.3e18 < 2^63). */
  val CalMult = 2654435761L
  val CalMod = 1000003L

  /** The probe: one map-side integer fold over an in-plan range —
    * parallelism pinned to the session's cores so the probe measures
    * the HOST (cycles available to this JVM), not the data layout. */
  def calHostProbe(s: SparkSession, dir: String): DataFrame =
    s.range(0L, CalRows, 1L, graft.core.Sessions.cpus)
      .agg(
        sum(expr(s"(id * ${CalMult}L) % ${CalMod}L")).cast("long")
          .as("cal_checksum"),
        count(lit(1)).cast("long").as("cal_rows"))

  val queries: Map[String, Q] = Map(
    "cal_host_probe" -> (calHostProbe _))

  /** DuckDB replays the identical fold over its own range source —
    * table-independent, like the engine side. */
  val oracle: Map[String, String] = Map(
    "cal_host_probe" ->
      s"""SELECT CAST(sum((i * $CalMult) % $CalMod) AS BIGINT)
         |    AS cal_checksum,
         |  CAST(count(*) AS BIGINT) AS cal_rows
         |FROM range($CalRows) t(i)""".stripMargin)
}
