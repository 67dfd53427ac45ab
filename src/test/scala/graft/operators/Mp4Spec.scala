package graft.operators

import graft.SparkSpec
import graft.multimodal.Mp4Container
import graft.multimodal.Mp4Container._

/** ISO-BMFF container parsing: encode→parse round-trips over the full
  * sample-table cross-walk, keyframe byte extraction against the
  * deterministic mdat fill, 64-bit/largesize paths, and the
  * malformed-structure quarantine contract. */
class Mp4Spec extends SparkSpec {

  private val sizes = Array(30, 41, 25, 60, 33, 47, 29, 52, 38, 44)

  private def fixture(
      syncEvery: Int = 3, chunkSize: Int = 3): Array[Byte] =
    encodeMp4(seed = 17L, sampleSizes = sizes, syncEvery = syncEvery,
      timescale = 1000, sampleDelta = 40, width = 64, height = 48,
      chunkSize = chunkSize)

  test("round-trip: movie header, track header, codec, sample count") {
    val meta = parse(fixture())
    assert(meta.majorBrand == "isom")
    assert(meta.timescale == 1000)
    assert(meta.durationMs == sizes.length * 40L)
    assert(meta.tracks.length == 1)
    val t = meta.tracks.head
    assert(t.trackId == 1 && t.handler == "vide" && t.codec == "mp4v")
    assert(t.width == 64 && t.height == 48)
    assert(t.timescale == 1000 && t.durationMs == sizes.length * 40L)
    assert(t.nSamples == sizes.length)
  }

  test("keyframes: sync numbers, exact sizes, decode times") {
    val t = parse(fixture(syncEvery = 3)).tracks.head
    // 0-based samples 0,3,6,9 → 1-based 1,4,7,10
    assert(t.keyframes.map(_.sample) == Seq(1, 4, 7, 10))
    assert(t.keyframes.map(_.size) ==
      Seq(sizes(0).toLong, sizes(3).toLong, sizes(6).toLong, sizes(9).toLong))
    assert(t.keyframes.map(_.timeMs) == Seq(0L, 120L, 240L, 360L))
  }

  test("keyframe bytes come out of mdat at the sample table's offsets") {
    val payload = fixture(syncEvery = 4, chunkSize = 3)
    val frames = Mp4Container.keyframeBytes(payload, maxFrames = 8)
    // sync samples (0-based) 0, 4, 8; byte j of sample i = (17+i+j)%251
    val expectSamples = Seq(0, 4, 8)
    assert(frames.length == 3)
    frames.zip(expectSamples).foreach { case (f, i) =>
      assert(f.length == sizes(i), s"sample $i size")
      f.zipWithIndex.foreach { case (b, j) =>
        assert((b & 0xff) == (17 + i + j) % 251, s"sample $i byte $j")
      }
    }
    // maxFrames truncates
    assert(Mp4Container.keyframeBytes(payload, maxFrames = 2).length == 2)
  }

  test("chunk map: non-uniform last chunk and single-chunk layouts agree") {
    // chunkSize 3 over 10 samples → chunks of 3,3,3,1 (two stsc runs);
    // chunkSize 10 → one chunk; offsets must produce identical bytes
    val a = Mp4Container.keyframeBytes(fixture(chunkSize = 3), 99)
    val b = Mp4Container.keyframeBytes(fixture(chunkSize = 10), 99)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
  }

  test("no stss box: every sample is a sync sample (spec default)") {
    // hide the stss box by renaming it to 'free' (sizes stay valid):
    // the parser must fall back to the spec default, all samples sync
    val payload = fixture(syncEvery = 3)
    val idx = indexOfBox(payload, "stss")
    System.arraycopy("free".getBytes("US-ASCII"), 0, payload, idx + 4, 4)
    val all = parse(payload).tracks.head
    assert(all.keyframes.length == sizes.length)
    assert(all.keyframes.map(_.sample) == (1 to sizes.length))
    // explicit all-sync stss agrees with the default
    val explicit = parse(fixture(syncEvery = 1)).tracks.head
    assert(explicit.keyframes.map(_.sample) == all.keyframes.map(_.sample))
  }

  test("largesize and to-EOF boxes parse") {
    val payload = fixture()
    // rewrite the trailing mdat header to the 16-byte largesize form
    val buf = java.nio.ByteBuffer.wrap(payload)
    var o = 0
    var mdatOff = -1
    while (o < payload.length && mdatOff < 0) {
      val size = buf.getInt(o)
      val typ = new String(payload, o + 4, 4, "US-ASCII")
      if (typ == "mdat") mdatOff = o else o += size
    }
    assert(mdatOff > 0)
    val mdatSize = buf.getInt(mdatOff)
    val large = new Array[Byte](payload.length + 8)
    System.arraycopy(payload, 0, large, 0, mdatOff)
    val lb = java.nio.ByteBuffer.wrap(large)
    lb.putInt(mdatOff, 1) // size==1 → largesize follows type
    System.arraycopy(payload, mdatOff + 4, large, mdatOff + 4, 4)
    lb.putLong(mdatOff + 8, mdatSize.toLong + 8)
    System.arraycopy(payload, mdatOff + 8, large, mdatOff + 16,
      payload.length - mdatOff - 8)
    // keyframe offsets shift by the 8 extra header bytes — reparse of
    // the moov still works; byte extraction would need re-muxed stco,
    // so only assert the structural walk succeeds
    assert(parse(large).tracks.head.nSamples == sizes.length)

    // size==0: mdat runs to end of file
    val toEof = payload.clone()
    java.nio.ByteBuffer.wrap(toEof).putInt(mdatOff, 0)
    assert(parse(toEof).tracks.head.nSamples == sizes.length)
  }

  test("malformed structures raise IllegalArgumentException, never escape") {
    val good = fixture()
    def mustFail(b: Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException](parse(b))
      assert(e.getMessage.startsWith("mp4:"), s"$what: ${e.getMessage}")
    }
    mustFail(Array[Byte](0, 0, 0, 24), "tiny payload")
    mustFail(good.take(40), "truncated moov")
    // box size overrunning the container
    val overrun = good.clone()
    java.nio.ByteBuffer.wrap(overrun).putInt(0, good.length + 100)
    mustFail(overrun, "oversized box")
    // sample count bomb: patch stsz entry count to 2^24
    val idx = indexOfBox(good, "stsz")
    val bomb = good.clone()
    java.nio.ByteBuffer.wrap(bomb).putInt(idx + 16, 1 << 24)
    mustFail(bomb, "stsz bomb")
    // constant-size stsz has no entry array for the box-extent check
    // to bound: a count past the shared cross-track sample budget must
    // be rejected BEFORE materializing per-sample arrays
    val bomb2 = good.clone()
    val bb2 = java.nio.ByteBuffer.wrap(bomb2)
    bb2.putInt(idx + 12, 1 << 20) // constant sample size
    bb2.putInt(idx + 16, (1 << 20) + 1) // count over the shared budget
    mustFail(bomb2, "stsz constant-size allocation bomb")
    // entry array past the box's declared end: must quarantine, not
    // silently read the next box's bytes as sample sizes
    val trunc = good.clone()
    java.nio.ByteBuffer.wrap(trunc).putInt(idx + 16, sizes.length + 1)
    mustFail(trunc, "stsz entries past box end")
    // stsc first run not starting at chunk 1 would silently shift
    // every sample to the wrong chunk base (offsets still land inside
    // mdat, so only validation catches it)
    val stsc = indexOfBox(good, "stsc")
    val shifted = good.clone()
    java.nio.ByteBuffer.wrap(shifted).putInt(stsc + 16, 2)
    mustFail(shifted, "stsc first run not at chunk 1")
    // a duplicated / unsorted sync table double-counts keyframes
    val stss = indexOfBox(good, "stss")
    val dup = good.clone()
    val prevSync = java.nio.ByteBuffer.wrap(dup).getInt(stss + 16)
    java.nio.ByteBuffer.wrap(dup).putInt(stss + 20, prevSync)
    mustFail(dup, "non-increasing sync table")
    // chunk offset pointing outside the payload: keyframeBytes must
    // reject the slice, not AIOOBE
    val stco = indexOfBox(good, "stco")
    val wild = good.clone()
    java.nio.ByteBuffer.wrap(wild).putInt(stco + 16, Int.MaxValue)
    intercept[IllegalArgumentException](
      Mp4Container.keyframeBytes(wild, 10))
  }

  test("header-only payload (moov without mdat) parses; extraction refuses") {
    // the range-GET shape: fetch just ftyp+moov, read the sample
    // tables, then range-GET keyframes from the full object — parse
    // must work on the header alone (sample OFFSETS are promises about
    // the full file, not the fetched bytes); only extraction fails
    val full = fixture()
    val mdatOff = indexOfBox(full, "mdat")
    val headerOnly = full.take(mdatOff)
    val t = parse(headerOnly).tracks.head
    assert(t.nSamples == sizes.length)
    assert(t.keyframes.map(_.sample) == Seq(1, 4, 7, 10))
    intercept[IllegalArgumentException](
      Mp4Container.keyframeBytes(headerOnly, 4))
  }

  test("audio-only container refuses keyframe extraction") {
    // PCM/AAC bytes must never flow downstream labeled as keyframes
    val payload = fixture()
    val h = indexOfBox(payload, "hdlr")
    System.arraycopy("soun".getBytes("US-ASCII"), 0, payload, h + 16, 4)
    val e = intercept[IllegalArgumentException](
      Mp4Container.keyframeBytes(payload, 4))
    assert(e.getMessage.contains("no video track"))
  }

  test("distributed keyframeSample quarantines poison, demuxes the rest") {
    import graft.multimodal.MediaPipeline
    import graft.multimodal.MediaPipeline.MediaRecord
    import spark.implicits._
    val records = (0L until 20L).map { id =>
      MediaRecord(id, "video/mp4",
        encodeMp4(seed = id, sampleSizes = Array.tabulate(6)(i =>
          20 + ((id + i) % 30).toInt), syncEvery = 2, timescale = 1000,
          sampleDelta = 40, width = 32, height = 24), Map.empty)
    } ++ Seq(
      MediaRecord(999L, "video/mp4", Array[Byte](0, 0, 0, 9, 'f', 'r'),
        Map.empty), // malformed container → error row
      MediaRecord(555L, "audio/wav", Array.tabulate(64)(_.toByte),
        Map.empty)) // non-video → byte-grouped fallback
    val out = MediaPipeline
      .keyframeSample(records.toDS().repartition(4), maxFrames = 16)
      .toDF().cache()
    val poison = out.filter("error is not null").collect()
    assert(poison.length == 1 && poison.head.getAs[Long]("doc_id") == 999L)
    assert(poison.head.getAs[String]("error").contains("mp4:"))
    val ok = out.filter("error is null")
    assert(ok.count() == 21)
    // 6 samples, syncEvery 2 → 3 keyframes per valid mp4
    assert(ok.filter("media_type = 'video/mp4' and n_frames = 3").count() == 20)
    // fallback: 64 bytes / frameBytes 32 → 2 frames, stride 4 keeps 1
    assert(ok.filter("media_type = 'audio/wav'").head()
      .getAs[Int]("n_frames") == 1)
    out.unpersist()
  }

  private def indexOfBox(b: Array[Byte], typ: String): Int = {
    var i = 0
    while (i < b.length - 8) {
      if (new String(b, i + 4, 4, "US-ASCII") == typ) return i
      i += 1
    }
    fail(s"no $typ box in fixture")
  }
}
