package graft.apps

import graft.core.Sessions
import graft.sources.{Sinks, Sources}

/** CSV → JDBC ETL — the reference's `to_sql.py` (SQLAlchemy DDL +
  * chunked pandas insert) as one distributed write. Needs a JDBC
  * driver + database at runtime.
  *
  * Usage: runMain graft.apps.EtlApp <data.csv> <jdbcUrl> <table>
  */
object EtlApp {
  def main(args: Array[String]): Unit = {
    val Array(csvPath, url, table) = args.take(3)
    val spark = Sessions.local("graft-etl")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = Sources.csv(spark, csvPath)
      Sinks.jdbcOverwrite(df, url, table)
      println(s"[etl] wrote ${df.count()} rows to $table")
    } finally spark.stop()
  }
}
