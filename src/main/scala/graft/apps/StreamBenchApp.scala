package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.Sessions
import graft.ml.{FraudPipeline, Transactions}
import graft.streaming.ScoringStream

/** Streaming instrumentation parity bench (BASELINE.md item 1,
  * VERDICT r4/r5 task #6): runs the EXACT scoring graph StreamApp
  * deploys — parse → score → distributed alerts → stats — on a
  * MemoryStream (the environment has no Kafka broker; the graph is
  * source-agnostic), and emits the reference-shaped
  * `streaming_stats.json` (spark_streaming_app.py:219-226).
  *
  * The artifact is checked in at `artifacts/streaming_stats.json`;
  * StreamStatsShapeSpec pins its key set against the reference's.
  * `graft.Bench` calls [[run]] so the same numbers also land as a
  * `{"metric":"streaming",...}` line in the per-round bench artifact
  * (VERDICT r6 task #7).
  *
  * Usage: runMain graft.apps.StreamBenchApp [outPath] [nBatches] [batchRows]
  */
object StreamBenchApp {

  /** Regression floor for the scoring graph's throughput on this
    * host profile (VERDICT r13 task #7): r13 measured 11,256 rec/s
    * steady-state at local[32]/sf0.1; 8,000 leaves the documented
    * ±10–15% host band plus headroom while still catching any
    * structural regression (a lineage re-execution, a driver-side
    * collect, a per-batch re-plan would each cost far more than 30%).
    * Enforced two ways: StreamThroughputSpec gates a smaller run at a
    * proportionally conservative floor, and graft.Bench stamps the
    * floor + pass/fail into its stream_throughput line so the
    * per-round artifact is self-gating. */
  val ThroughputFloorRecSec = 8000.0

  /** Drive the scoring graph over `nBatches` MemoryStream batches of
    * `batchRows` JSON wire rows each; returns the cumulative stats
    * plus the number of alert rows the sink received. Pure function
    * of the session — writes no artifact (main() does that). */
  def run(spark: SparkSession, sfDir: String, nBatches: Int,
      batchRows: Int,
      resources: Option[graft.core.ResourceUtil] = None)
      : (ScoringStream.StatsAccumulator, Long) = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val txns = Transactions.fromEvents(spark, sfDir).cache()
    // weighted=true (the opt-in fix for the reference's unweighted
    // training) so the imbalanced fixture yields fraud predictions —
    // the bench must exercise the alert path, not skip it.
    val model = FraudPipeline.train(txns, weighted = true)
    // JSON wire rows, as the producer would emit them (P10).
    val wire = txns
      .select(to_json(struct(col("*"))).as("v"))
      .limit(nBatches * batchRows)
      .collect().map(_.getString(0)).toSeq
    txns.unpersist()

    val input = MemoryStream[String]
    val parsed = ScoringStream.parse(
      input.toDF().select(col("value").cast("binary").as("value")))
    val stats = new ScoringStream.StatsAccumulator
    resources.foreach(_.capture())
    val checkpoint = java.nio.file.Files
      .createTempDirectory("graft_stream_bench_ckpt").toString
    var alertRows = 0L
    val query = ScoringStream.start(parsed, model, checkpoint,
      // distributed alert path: the frame is fully computed on
      // executors; the sink here just counts what Kafka would receive
      alertDf => alertRows += alertDf.count(),
      stats)
    try {
      wire.grouped(batchRows).take(nBatches).foreach { rows =>
        input.addData(rows)
        query.processAllAvailable()
        resources.foreach(_.capture())
      }
    } finally query.stop()
    (stats, alertRows)
  }

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("artifacts/streaming_stats.json")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(5)
    val batchRows = args.lift(2).map(_.toInt).getOrElse(2000)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")

    val spark = Sessions.local("graft-stream-bench")
    spark.sparkContext.setLogLevel("WARN")

    // reference parity: psutil-style resource sampling at init and
    // around each batch (spark_streaming_app.py:163-165,319,372)
    val resources = new graft.core.ResourceUtil
    val (stats, alertRows) =
      run(spark, sfDir, nBatches, batchRows, Some(resources))

    stats.writeJson(outPath)
    val resourcePath = outPath.replaceAll("[^/]+$", "resource_summary.json")
    resources.writeJson(resourcePath)
    // Self-verifying tail line, same contract as graft.Bench: short,
    // LAST, parseable.
    println(stats.json)
    println(
      s"""{"metric":"stream_bench","batches":${stats.totalBatches},""" +
        s""""records":${stats.totalRecords},"alerts":$alertRows,""" +
        s""""out":"$outPath"}""")
    spark.stop()
  }
}
