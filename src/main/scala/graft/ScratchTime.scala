package graft

/** Throwaway timing harness (not part of the library surface). */
object ScratchTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("p9_star_extras")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = graft.core.Sessions.local("graft-scratch")
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
