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
