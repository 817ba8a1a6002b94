package graft.core

import graft.SparkSpec

/** Pins the loader-boundary timestamp normalization (r14 incident:
  * the driver regenerated events.parquet with ts as TIMESTAMP(MICROS)
  * instead of NANOS and 15 temporal queries stopped resolving).
  *
  * The physical unit the generator emits is outside this repo's
  * control, so [[Tables]] owns one invariant per table family:
  *   - `events.ts`  → always BIGINT epoch-nanoseconds downstream;
  *   - `orders.o_orderdate` / `lineitem.l_shipdate` → always
  *     TIMESTAMP_NTZ downstream (a NANOS file would surface them as
  *     BIGINT via the nanosAsLong legacy flag).
  * Both directions are exercised here with synthetic files, so a
  * future drift fails THIS suite instead of the round's oracle gate.
  */
class TablesSpec extends SparkSpec {
  import org.apache.spark.sql.types.{LongType, TimestampNTZType}

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  // 2024-01-01T00:00:00 UTC in epoch units
  private val EpochUs = 1704067200000000L

  test("events.ts TIMESTAMP_NTZ (MICROS file) loads as epoch-nanos " +
    "long with instant preserved") {
    import spark.implicits._
    val dir = tmpDir("graft_tables_us")
    Seq((1L, EpochUs), (2L, EpochUs + 1500000L))
      .toDF("event_id", "us")
      .selectExpr("event_id",
        "cast(timestamp_micros(us) as timestamp_ntz) as ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == LongType)
    val byId = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == EpochUs * 1000L)
    assert(byId(2L) == (EpochUs + 1500000L) * 1000L)
  }

  test("events.ts already-long (NANOS-as-long file) passes through " +
    "bit-identical; ts-less fixtures untouched") {
    import spark.implicits._
    val dir = tmpDir("graft_tables_ns")
    Seq((1L, EpochUs * 1000L + 17L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == LongType)
    assert(got.head().getLong(1) == EpochUs * 1000L + 17L)

    val dir2 = tmpDir("graft_tables_nots")
    Seq((1L, "a")).toDF("event_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    assert(Tables.events(spark, dir2).columns.toSeq ==
      Seq("event_id", "event_type"))
  }

  test("orders.o_orderdate arriving as epoch-nanos long is restored " +
    "to TIMESTAMP_NTZ at the same instant") {
    import spark.implicits._
    val dir = tmpDir("graft_tables_ons")
    Seq((10L, EpochUs * 1000L)).toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Tables.orders(spark, dir)
    assert(got.schema("o_orderdate").dataType == TimestampNTZType)
    assert(got.selectExpr("unix_micros(cast(o_orderdate as timestamp))")
      .head().getLong(0) == EpochUs)
  }

  test("orders/lineitem MICROS files (current generator) pass " +
    "through as TIMESTAMP_NTZ") {
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    assert(o.schema("o_orderdate").dataType == TimestampNTZType)
    assert(l.schema("l_shipdate").dataType == TimestampNTZType)
  }
}
