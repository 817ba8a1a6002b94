package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway A/B timing: custom TopKPerGroup vs window(row_number)
  * on the identical input (same columns, same ordering), noop sink.
  * Not part of the driver contract. */
object ScratchTopK {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("graft-scratch-topk")
    spark.sparkContext.setLogLevel("WARN")
    def base = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm both paths
    noop(base.limit(1000))
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("cents").desc, col("l_orderkey"), col("l_linenumber"))
    for (_ <- 1 to 3) {
      time("window ") {
        noop(base.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3).drop("rn"))
      }
      time("custom ") {
        noop(graft.plans.TopKPerGroup(base, Seq("l_suppkey"), "cents",
          descending = true, Seq("l_orderkey", "l_linenumber"), 3))
      }
    }
    spark.stop()
  }
}
