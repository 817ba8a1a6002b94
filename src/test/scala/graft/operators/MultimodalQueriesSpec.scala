package graft.operators

import graft.SparkSpec

class MultimodalQueriesSpec extends SparkSpec {

  test("metadata-only scan does not read the payload column") {
    // Materialize the media table first (payload as a real stored
    // binary column), then prove the metadata aggregation's parquet
    // scan prunes it — THE property that makes metadata queries on a
    // 100 TB media lake cheap.
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_media").toString
    MultimodalQueries.assets(spark, sfDir)
      .write.mode("overwrite").parquet(tmp)
    val stored = spark.read.parquet(tmp)
    val metaQuery = stored
      .groupBy(org.apache.spark.sql.functions.col("media_type"))
      .agg(org.apache.spark.sql.functions
        .sum(org.apache.spark.sql.functions.col("meta.byte_len"))
        .as("total_bytes"))
    val scan = metaQuery.queryExecution.executedPlan.toString
    val readSchema = scan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("payload"),
      s"payload must be pruned from the scan: $readSchema")
    assert(metaQuery.collect().nonEmpty)
  }

  test("schema evolution: mergeSchema unions old and new layouts") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_evolve").toString
    // v1 files lack the column added in v2.
    Seq((1L, "a")).toDF("id", "v1col")
      .write.parquet(s"$tmp/part=1")
    Seq((2L, "b", 3.5)).toDF("id", "v1col", "v2col")
      .write.parquet(s"$tmp/part=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(tmp)
    assert(merged.columns.toSet == Set("id", "v1col", "v2col", "part"))
    val v1row = merged.filter($"id" === 1L).head()
    assert(v1row.isNullAt(v1row.fieldIndex("v2col")))
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

  test("PGM codec: golden bytes, round trip, header grammar, corrupt input") {
    import MultimodalQueries.PgmCodec
    // golden encode: exact on-disk layout of a 3x2 image
    val px = Array[Byte](0, 127, -1, 10, 20, 30) // -1 = 255 unsigned
    val enc = PgmCodec.encode(3, 2, px)
    assert(new String(enc.take(10), "US-ASCII") == "P5\n3 2\n255")
    assert(enc(10) == '\n'.toByte)
    assert(enc.drop(11).toSeq == px.toSeq)
    // round trip
    val (w, h, back) = PgmCodec.decode(enc)
    assert((w, h) == ((3, 2)) && back.toSeq == px.toSeq)
    // full Netpbm header grammar: comments + arbitrary whitespace
    val commented = ("P5 # a comment\n# another\n 3\t2 # dims\n255\n")
      .getBytes("US-ASCII") ++ px
    val (w2, h2, back2) = PgmCodec.decode(commented)
    assert((w2, h2) == ((3, 2)) && back2.toSeq == px.toSeq)
    // CRLF producer: "\r\n" after maxval is ONE delimiter — the
    // raster must not shift by a byte (ADVICE r11)
    val crlf = "P5\r\n3 2\r\n255\r\n".getBytes("US-ASCII") ++ px
    val (w3, h3, back3) = PgmCodec.decode(crlf)
    assert((w3, h3) == ((3, 2)) && back3.toSeq == px.toSeq)
    // a LONE '\r' delimiter still works (it is whitespace)
    val crOnly = "P5\r3 2\r255\r".getBytes("US-ASCII") ++ px
    assert(PgmCodec.decode(crOnly)._3.toSeq == px.toSeq)
    // EOF right after maxval must refuse at the delimiter check,
    // not run off the end
    intercept[IllegalArgumentException] {
      PgmCodec.decode("P5\n3 2\n255".getBytes("US-ASCII"))
    }
    // a foreign magic number must refuse, not misparse
    val bad = intercept[IllegalArgumentException] {
      PgmCodec.decode("P6\n3 2\n255\nxxxxxx".getBytes("US-ASCII"))
    }
    assert(bad.getMessage.contains("P6"))
    // truncated raster must refuse
    intercept[IllegalArgumentException] {
      PgmCodec.decode(enc.dropRight(2))
    }
  }

  test("WAV codec: round trip, chunk walking past a LIST chunk, " +
    "loud refusal of foreign magic and truncation") {
    val smp = Array[Short](0, 100, -100, 32767, -32768, 7)
    val enc = MultimodalQueries.WavCodec.encode(16000, smp)
    assert(enc.length == 44 + 12)
    assert(new String(enc, 0, 4, "US-ASCII") == "RIFF")
    val (rate, back) = MultimodalQueries.WavCodec.decode(enc)
    assert(rate == 16000 && back.toSeq == smp.toSeq)
    // splice a LIST chunk between fmt and data — an external
    // producer shape the chunk walker must skip
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = enc.slice(0, 36) ++ listChunk ++
      enc.slice(36, enc.length)
    // fix the RIFF size field (bytes 4..7, little endian)
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte
    spliced(5) = ((total >> 8) & 0xff).toByte
    val (rate2, back2) = MultimodalQueries.WavCodec.decode(spliced)
    assert(rate2 == 16000 && back2.toSeq == smp.toSeq)
    // refusals
    val corrupt = enc.clone(); corrupt(0) = 'X'.toByte
    intercept[IllegalArgumentException] {
      MultimodalQueries.WavCodec.decode(corrupt)
    }
    intercept[IllegalArgumentException] {
      MultimodalQueries.WavCodec.decode(enc.slice(0, 50))
    }
  }

  test("WAV decode query recovers the generator's closed-form stats") {
    val got = MultimodalQueries.mmWavDecode(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.take(50).foreach { r =>
      val id = r.getLong(0)
      val n = (64 + id % 128).toInt
      assert(r.getInt(1) == (8000 + (id % 4) * 4000).toInt)
      assert(r.getLong(2) == n.toLong)
      val vals = (0 until n).map(i =>
        ((id * 37 + i * 11) % 4096 - 2048).toInt)
      assert(r.getLong(3) == vals.map(_.toLong).sum)
      assert(r.getLong(4) == vals.map(v => v.toLong * v).sum)
      assert(r.getInt(5) == vals.min && r.getInt(6) == vals.max)
    }
  }

  test("WAV downsample: closed-form recompute incl. the truncated " +
    "negative-odd averages; odd tail dropped") {
    val got = MultimodalQueries.mmWavDownsample(spark, sfDir)
      .collect()
    assert(got.nonEmpty)
    var sawNegOdd = false
    got.take(80).foreach { r =>
      val id = r.getLong(0)
      val n = (64 + id % 128).toInt
      assert(r.getInt(1) == (8000 + (id % 4) * 4000).toInt / 2)
      assert(r.getLong(2) == (n / 2).toLong)
      def smp(i: Int) = ((id * 37 + i * 11) % 4096 - 2048).toInt
      val ds = (0 until n / 2).map { i =>
        val s = smp(2 * i) + smp(2 * i + 1)
        if (s < 0 && s % 2 != 0) sawNegOdd = true
        s / 2 // truncation toward zero, same as the oracle's //
      }
      assert(r.getLong(3) == ds.map(_.toLong).sum)
      assert(r.getLong(4) == ds.map(v => v.toLong * v).sum)
    }
    assert(sawNegOdd,
      "fixture must exercise the floor-vs-truncate edge")
  }

  test("PGM decode query recovers the generator's closed-form stats") {
    // The engine must get every stat from PARSING the bytes; compare
    // against the closed form the generator used.
    val got = MultimodalQueries.mmPgmDecode(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.take(50).foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((8 + id % 16).toInt, (6 + id % 10).toInt)
      assert(r.getInt(1) == w && r.getInt(2) == h)
      val vals = for (rr <- 0 until h; cc <- 0 until w)
        yield ((id * 31 + rr * 17 + cc * 5) % 256).toInt
      assert(r.getLong(3) == w.toLong * h)
      assert(r.getLong(4) == vals.map(_.toLong).sum)
      assert(r.getInt(5) == vals.min && r.getInt(6) == vals.max)
    }
  }

  test("PGM container walker: frame boundaries exact, foreign bytes " +
      "and truncation throw") {
    import MultimodalQueries.PgmCodec
    val frames = (0 until 3).map { f =>
      (2 + f, 2, Array.tabulate(2 * (2 + f))(i => (f * 40 + i).toByte))
    }
    val container = frames.map { case (w, h, px) =>
      PgmCodec.encode(w, h, px) }.reduce(_ ++ _)
    val decoded = PgmCodec.decodeStream(container)
    assert(decoded.size == 3)
    decoded.zip(frames).foreach { case ((w, h, px), (ew, eh, epx)) =>
      assert(w == ew && h == eh && px.sameElements(epx))
    }
    // a single frame decodes as a 1-frame stream
    assert(PgmCodec.decodeStream(
      PgmCodec.encode(2, 2, Array[Byte](1, 2, 3, 4))).size == 1)
    // trailing garbage after the last raster is a foreign magic
    intercept[IllegalArgumentException] {
      PgmCodec.decodeStream(container ++ Array[Byte]('X', 'Y'))
    }
    // mid-stream truncation (lost raster tail) throws, never yields
    // a partial frame list
    intercept[IllegalArgumentException] {
      PgmCodec.decodeStream(container.dropRight(1))
    }
  }

  test("PGM downsample: 2x2 block averages match the closed form, " +
      "dims floor-halved") {
    val got = MultimodalQueries.mmPgmDownsample(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.take(50).foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((8 + id % 16).toInt, (6 + id % 10).toInt)
      val (ow, oh) = (w / 2, h / 2)
      def p(rr: Int, cc: Int) = ((id * 31 + rr * 17 + cc * 5) % 256).toInt
      val vals = for (rr <- 0 until oh; cc <- 0 until ow) yield
        (p(2 * rr, 2 * cc) + p(2 * rr, 2 * cc + 1) +
          p(2 * rr + 1, 2 * cc) + p(2 * rr + 1, 2 * cc + 1)) / 4
      assert(r.getInt(1) == ow && r.getInt(2) == oh)
      assert(r.getLong(3) == vals.map(_.toLong).sum)
      assert(r.getInt(4) == vals.min && r.getInt(5) == vals.max)
    }
  }

  test("frame-sample query: every-2nd-frame stats match the " +
      "closed form, sampled strictly fewer pixels than total") {
    val got = MultimodalQueries.mmPgmFrameSample(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.take(50).foreach { r =>
      val id = r.getLong(0)
      val (w, h, k) =
        ((8 + id % 16).toInt, (6 + id % 10).toInt, (2 + id % 5).toInt)
      val sampledF = (0 until k).filter(_ % 2 == 0)
      val vals = for {
        f <- sampledF; rr <- 0 until h; cc <- 0 until w
      } yield ((id * 31 + f * 53 + rr * 17 + cc * 5) % 256).toInt
      assert(r.getInt(1) == k, "n_frames")
      assert(r.getInt(2) == sampledF.size, "n_sampled")
      assert(r.getLong(3) == sampledF.size.toLong * w * h)
      assert(r.getLong(4) == vals.map(_.toLong).sum, "sum_sampled")
      assert(r.getInt(5) == vals.max, "max_sampled")
      // the sample is a strict subset whenever k > 1 (it always is)
      assert(sampledF.size < k || k == 1)
    }
  }
}
