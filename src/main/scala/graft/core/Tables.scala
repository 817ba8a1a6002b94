package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish testdata (TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst pushes filters and
  * prunes columns into the scan (verify via PushedFilters/ReadSchema
  * in .explain). At 100 TB these would be partitioned/bucketed table
  * scans; the query shapes below do not depend on single-file layout.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    ntzNormalized(load(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    ntzNormalized(load(s, d, "lineitem"), "l_shipdate")
  /** `events` with `ts` normalized to BIGINT epoch-nanoseconds.
    *
    * The driver's generator has shipped `ts` as parquet TIMESTAMP
    * with either NANOS (read as long via the `nanosAsLong` legacy
    * flag) or MICROS (read as TIMESTAMP_NTZ) physical units across
    * rounds. Every temporal operator here does integer time algebra
    * (`ts div 3.6e12` bucketing, sweep lines, gap fills) and every
    * DuckDB oracle reads `epoch_ns(ts)` — which is unit-agnostic —
    * so the loader pins one representation at the scan boundary
    * instead of letting a schema drift fail 15 queries (r14). The
    * session timezone is UTC everywhere (Sessions/Verify), so the
    * NTZ→TZ cast below is instant-preserving. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    import org.apache.spark.sql.functions.{col, unix_micros}
    val df = load(s, d, "events")
    // fixture files may omit ts entirely (e.g. the impute spec)
    if (!df.schema.fieldNames.contains("ts")) return df
    df.schema("ts").dataType match {
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df // already long nanos (nanosAsLong path)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")

  /** Spread a narrow heavy-per-row compute chain (gram hashing,
    * shingling, codec decode) across the session's cores when the
    * upstream scan cannot parallelize it itself.
    *
    * Why (guide §2.5 "input skew" / §1.2 step 1): the local testdata
    * ships each table as ONE parquet file with ONE row group, so
    * every scan is effectively a single task — and WholeStageCodegen
    * fuses the per-row compute into that task, serializing minutes of
    * hashing behind one core while 31 idle. One hash exchange on a
    * stable key (deterministic row→partition assignment, unlike
    * round-robin) costs a few hundred KB here and buys cores× on the
    * fused compute.
    *
    * Scale posture: guarded on the scan's actual partition count, so
    * on a real multi-row-group / multi-file table (≥ cores splits)
    * this is a NO-OP — at 100 TB the scan already parallelizes and
    * the extra exchange would be pure waste. Results are unaffected:
    * partitioning is not observable by any value these chains
    * compute (each is oracle-checked against single-process DuckDB).
    */
  def fanOut(df: DataFrame, key: String): DataFrame = {
    val cores = Sessions.cpus
    if (df.rdd.getNumPartitions >= cores) df
    else df.repartition(cores, df(key))
  }

  /** Byte-sized output files at a persisted-index write boundary,
    * whatever the upstream compute's partitioning (guide §6 file
    * sizing). [[fanOut]] pins the build compute at `cores` partitions
    * (an explicit-count repartition AQE may not coalesce), so a
    * map-only build chain would write `cores` shard files per split —
    * and every SERVE of that index then pays one scan task per shard
    * plus the lost clustering, which the r21 mid-round bench measured
    * as 2-5× serve regressions (t_cdc_chunks_indexed 0.28→1.36 s).
    * REBALANCE hands the final exchange to AQE's advisory partition
    * sizing: the write shrinks to as few files as the BYTES need
    * (tiny at sf0.1, ~128 MB shards at 100 TB) while the wide compute
    * above the exchange keeps its parallelism. Content is unchanged —
    * only row placement across output files moves. */
  def packForWrite(df: DataFrame): DataFrame = df.hint("rebalance")

  /** The reverse guard of [[events]]: `orders`/`lineitem` date
    * columns are consumed as timestamps (range joins, date_trunc,
    * SCD2 validity windows), so if a future testdata regen ships
    * them as TIMESTAMP(NANOS) — which `nanosAsLong` surfaces as
    * BIGINT — convert back to TIMESTAMP_NTZ (integer µs division,
    * then an instant-preserving cast under the UTC session zone).
    * MICROS files already arrive as NTZ and pass through. */
  private def ntzNormalized(df: DataFrame, c: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    if (df.schema.fieldNames.contains(c) &&
        df.schema(c).dataType == LongType)
      df.withColumn(c,
        timestamp_micros(expr(s"$c div 1000")).cast(TimestampNTZType))
    else df
  }
}
