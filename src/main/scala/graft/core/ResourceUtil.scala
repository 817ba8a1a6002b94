package graft.core

import java.nio.file.{Files, Paths}

/** JVM-native equivalent of the reference's psutil-based
  * ResourceUtilization (spark_streaming_app.py:60-131): `capture()`
  * snapshots process CPU load and memory, `summaryJson` emits the
  * reference's resource summary shape key-for-key
  * (spark_streaming_app.py:107-121). CPU comes from
  * `OperatingSystemMXBean.getProcessCpuLoad` (the JVM's view of this
  * process, like psutil's `Process.cpu_percent`), memory from the
  * runtime heap against total system memory.
  *
  * Driver-side by design, like the reference's: this instruments the
  * APPLICATION process, not the cluster — executor-level metrics
  * belong to the Spark metrics system.
  */
final class ResourceUtil {
  private case class Sample(cpuPct: Double, memPct: Double, memMb: Double)

  private val startTime = java.time.Instant.now()
  private val samples = scala.collection.mutable.ArrayBuffer.empty[Sample]
  private val os = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  /** Snapshot current process CPU% and memory (reference: capture()
    * appends one psutil sample per call site — batch start/end,
    * init, shutdown). */
  def capture(): Unit = synchronized {
    val cpu = math.max(os.getProcessCpuLoad, 0.0) * 100.0
    val rt = Runtime.getRuntime
    val usedBytes = (rt.totalMemory - rt.freeMemory).toDouble
    val totalBytes = os.getTotalMemorySize.toDouble
    val memPct = if (totalBytes > 0) usedBytes / totalBytes * 100.0 else 0.0
    samples += Sample(cpu, memPct, usedBytes / 1024.0 / 1024.0)
  }

  def sampleCount: Int = synchronized(samples.length)

  /** The reference's summary dict, key-for-key
    * (spark_streaming_app.py:107-121). */
  def summaryJson: String = synchronized {
    require(samples.nonEmpty, "capture() at least once before summary")
    def stats(f: Sample => Double): (Double, Double, Double) = {
      val vs = samples.map(f)
      (vs.min, vs.max, vs.sum / vs.length)
    }
    val (cpuMin, cpuMax, cpuAvg) = stats(_.cpuPct)
    val (mpMin, mpMax, mpAvg) = stats(_.memPct)
    val (mbMin, mbMax, mbAvg) = stats(_.memMb)
    val end = java.time.Instant.now()
    val durationSec =
      java.time.Duration.between(startTime, end).toMillis / 1000.0
    s"""{"start_time":"$startTime","end_time":"$end",""" +
      s""""duration_seconds":$durationSec,"samples":${samples.length},""" +
      f""""cpu_min":$cpuMin%.3f,"cpu_max":$cpuMax%.3f,"cpu_avg":$cpuAvg%.3f,""" +
      f""""memory_min_percent":$mpMin%.3f,"memory_max_percent":$mpMax%.3f,""" +
      f""""memory_avg_percent":$mpAvg%.3f,""" +
      f""""memory_min_mb":$mbMin%.3f,"memory_max_mb":$mbMax%.3f,""" +
      f""""memory_avg_mb":$mbAvg%.3f}"""
  }

  def writeJson(path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, summaryJson)
  }
}
