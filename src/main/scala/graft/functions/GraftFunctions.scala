package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Single registration point for all graft Catalyst functions —
  * `.withExtensions(GraftFunctions.register)` on a builder, or
  * `GraftFunctions.ensureRegistered(spark)` on a session the harness
  * built without extensions. */
object GraftFunctions {
  def register(ext: SparkSessionExtensions): Unit = {
    CosineSimilarity.register(ext)
    MinhashSig.register(ext)
    Md5Hash60.register(ext)
    Simhash32.register(ext)
    JaccardSim.register(ext)
    SignLshBucket.register(ext)
    WinnowFps.register(ext)
    GramHashes.register(ext)
    IntersectCount.register(ext)
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    CosineSimilarity.ensureRegistered(spark)
    MinhashSig.ensureRegistered(spark)
    Md5Hash60.ensureRegistered(spark)
    Simhash32.ensureRegistered(spark)
    JaccardSim.ensureRegistered(spark)
    SignLshBucket.ensureRegistered(spark)
    WinnowFps.ensureRegistered(spark)
    GramHashes.ensureRegistered(spark)
    IntersectCount.ensureRegistered(spark)
  }
}
