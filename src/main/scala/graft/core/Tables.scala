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
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame   = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")
}
