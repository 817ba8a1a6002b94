package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Pins the resource summary to the reference's psutil shape
  * (spark_streaming_app.py:107-121), same contract style as
  * StreamStatsShapeSpec. */
class ResourceUtilSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private val keys = Set(
    "start_time", "end_time", "duration_seconds", "samples",
    "cpu_min", "cpu_max", "cpu_avg",
    "memory_min_percent", "memory_max_percent", "memory_avg_percent",
    "memory_min_mb", "memory_max_mb", "memory_avg_mb")

  test("summary carries the reference key set with sane values") {
    val r = new ResourceUtil
    r.capture()
    val garbage = Array.fill(1 << 20)(1.0) // force some heap use
    r.capture()
    assert(garbage.length > 0)
    val node = mapper.readTree(r.summaryJson)
    val it = node.fieldNames()
    val got = Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).toSet
    assert(got == keys)
    assert(node.get("samples").asInt == 2)
    assert(node.get("memory_min_mb").asDouble > 0)
    assert(node.get("memory_max_mb").asDouble >=
      node.get("memory_min_mb").asDouble)
    assert(node.get("cpu_max").asDouble >= node.get("cpu_min").asDouble)
    assert(node.get("duration_seconds").asDouble >= 0)
  }

  test("summary before any capture is refused") {
    intercept[IllegalArgumentException](new ResourceUtil().summaryJson)
  }
}
