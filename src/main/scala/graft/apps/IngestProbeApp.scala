package graft.apps

/** Standalone probe for the stream_ingest gate: runs the foreachBatch
  * delta-ingest loop at `SPARK_GRAFT_SF_DIR` (default sf0.1) with the
  * bench's 100-doc batches and prints the gate's scalars — the tool
  * used to measure/re-calibrate [[StreamBenchApp.IngestFloorRecSec]]
  * without paying a full bench sweep. */
object IngestProbeApp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("graft-ingest-probe")
    spark.sparkContext.setLogLevel("WARN")
    val r = StreamBenchApp.runIngest(spark, sfDir, batchRows = 100)
    println(s"[probe] records=${r.records} batches=${r.batches} " +
      s"admitted=${r.admitted} mismatches=${r.mismatches} " +
      f"recPerSec=${r.recordsPerSec}%.1f")
    spark.stop()
  }
}
