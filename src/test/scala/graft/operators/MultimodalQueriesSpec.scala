package graft.operators

import graft.SparkSpec

class MultimodalQueriesSpec extends SparkSpec {

  test("metadata-only scan does not read the payload column") {
    val df = MultimodalQueries.mmMetaOnly(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString
    // The parquet scan must project only the columns the metadata
    // aggregation needs — never `text` payload-wide reads... the fake
    // payload derives from `text`, so here we assert the aggregate
    // reads doc_id + text only (no props/source/lang).
    assert(!scan.contains("lang"), s"pruning failed:\n$scan")
    df.collect()
  }

  test("decode/feature batch transform has the declared schema") {
    val df = MultimodalQueries.mmDecodeFeatures(spark, sfDir)
    assert(df.columns.toSeq ==
      Seq("asset_id", "width", "height", "f0", "n_frames"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // FakeCodec invariants: dims in range, features normalized.
    assert(rows.forall { r =>
      r.getInt(1) >= 256 && r.getInt(1) < 768 &&
        r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0
    })
  }

  test("fake codec is deterministic and byte-faithful") {
    val payload = "some media payload bytes".getBytes("UTF-8")
    val (w1, h1) = MultimodalQueries.FakeCodec.decodeDims(payload)
    val (w2, h2) = MultimodalQueries.FakeCodec.decodeDims(payload)
    assert((w1, h1) == ((w2, h2)))
    val resized = MultimodalQueries.FakeCodec.resize(payload, 2, 2)
    assert(resized.length == 12)
    val frames = MultimodalQueries.FakeCodec
      .sampleFrames(new Array[Byte](5000), 2)
    assert(frames.size == 3) // blocks 0, 2, 4
  }
}
