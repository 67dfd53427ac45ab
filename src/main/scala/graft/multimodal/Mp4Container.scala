package graft.multimodal

/** ISO-BMFF (MP4 / QuickTime) container parsing in pure JVM — the
  * demux half of video support, built from the public ISO/IEC
  * 14496-12 box structure. No codec library exists in this container,
  * so SAMPLE BYTES stay opaque (pixel decode quarantines, honestly);
  * everything the container itself declares is decoded for real:
  *
  *   - box walk (compact + 64-bit `largesize` + size-0 to-EOF boxes)
  *   - `mvhd`/`mdhd` v0+v1 timescales and durations
  *   - `tkhd` track ids and 16.16 fixed-point display dimensions
  *   - `hdlr` handler (vide/soun) and `stsd` codec fourcc
  *   - the full sample-table cross-walk: `stts` (decode timestamps) ×
  *     `stsc` (sample→chunk runs) × `stsz` (sizes) × `stco`/`co64`
  *     (chunk file offsets) × `stss` (sync samples) → exact keyframe
  *     byte ranges inside `mdat`, extractable without any codec.
  *
  * This is what a training pipeline needs from video at 100 TB:
  * keyframe sampling is a container operation (seek to sync-sample
  * offsets), not a decode operation — the expensive codec work applies
  * only to the ~2% of bytes the sync table selects.
  *
  * All reads are bounds-checked against the payload; malformed or
  * adversarial structures raise IllegalArgumentException, which
  * MediaPipeline.decodeQuarantined turns into error rows.
  *
  * Reference parity note: the reference treats media strictly as
  * opaque assets (href + media_type, avhrr recipe.py:70); this module
  * is part of the beyond-reference training-pipeline surface.
  */
object Mp4Container {

  /** One sync sample (keyframe): 1-based sample number, absolute file
    * offset + size of its bytes, decode time in ms (media timescale
    * converted). */
  case class Keyframe(sample: Int, offset: Long, size: Long, timeMs: Long)

  case class Mp4Track(
      trackId: Long,
      handler: String,
      codec: String,
      timescale: Long,
      durationMs: Long,
      width: Int,
      height: Int,
      nSamples: Int,
      keyframes: Seq[Keyframe])

  case class Mp4Meta(
      majorBrand: String,
      timescale: Long,
      durationMs: Long,
      tracks: Seq[Mp4Track])

  private def bad(msg: String) = throw new IllegalArgumentException(msg)

  /** Sample-count cap: ~10⁶ samples is hours of video; a header
    * claiming more is corruption (and an allocation bomb). */
  private val MAX_SAMPLES = 1 << 20
  private val MAX_TRACKS = 64

  // -- big-endian primitive reads over untrusted bytes ---------------

  private final class Buf(val b: Array[Byte]) {
    val len: Long = b.length.toLong
    private def check(o: Long, n: Int): Unit =
      // `o > len - n`, never `o + n > len`: a crafted huge offset must
      // not wrap Long and slip past the bound
      if (o < 0 || o > len - n) bad(s"mp4: read of $n bytes at $o overruns ${len}B payload")
    def u8(o: Long): Int = { check(o, 1); b(o.toInt) & 0xff }
    def u16(o: Long): Int = { check(o, 2)
      ((b(o.toInt) & 0xff) << 8) | (b(o.toInt + 1) & 0xff) }
    def u32(o: Long): Long = { check(o, 4)
      ((b(o.toInt) & 0xffL) << 24) | ((b(o.toInt + 1) & 0xffL) << 16) |
        ((b(o.toInt + 2) & 0xffL) << 8) | (b(o.toInt + 3) & 0xffL) }
    def u64(o: Long): Long = {
      val hi = u32(o); val lo = u32(o + 4)
      val v = (hi << 32) | lo
      if (v < 0) bad(s"mp4: 64-bit field at $o out of Long range")
      v
    }
    def fourcc(o: Long): String = { check(o, 4)
      new String(b, o.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII) }
    def slice(o: Long, n: Long): Array[Byte] = {
      if (n < 0 || n > Int.MaxValue) bad(s"mp4: slice of $n bytes")
      check(o, n.toInt)
      java.util.Arrays.copyOfRange(b, o.toInt, (o + n).toInt)
    }
  }

  /** A box: type + payload extent (header excluded). */
  private case class Box(typ: String, start: Long, end: Long)

  /** Walk the boxes in [start, end): compact 32-bit sizes, `largesize`
    * (size==1 → 64-bit size follows the type), and size==0 (box runs
    * to the end of its container, last box only). */
  private def boxes(buf: Buf, start: Long, end: Long): List[Box] = {
    val out = List.newBuilder[Box]
    var o = start
    var n = 0
    while (o < end) {
      if (o > end - 8) bad(s"mp4: truncated box header at $o")
      val size32 = buf.u32(o)
      val typ = buf.fourcc(o + 4)
      val (payload, boxEnd) =
        if (size32 == 1L) { // largesize
          // the 16-byte header must itself fit the CONTAINER — the
          // payload-level check alone would read a sibling's bytes as
          // the size before the boxEnd backstop fires
          if (o > end - 16) bad(s"mp4: truncated largesize header at $o")
          val size = buf.u64(o + 8)
          if (size < 16) bad(s"mp4: largesize box '$typ' of $size bytes")
          (o + 16, o + size)
        } else if (size32 == 0L) (o + 8, end) // to end of container
        else {
          if (size32 < 8) bad(s"mp4: box '$typ' of $size32 bytes")
          (o + 8, o + size32)
        }
      if (boxEnd > end) bad(s"mp4: box '$typ' overruns container at $o")
      out += Box(typ, payload, boxEnd)
      o = boxEnd
      n += 1
      if (n > 4096) bad("mp4: more than 4096 sibling boxes")
    }
    out.result()
  }

  private def find(bs: List[Box], typ: String): Option[Box] =
    bs.find(_.typ == typ)
  private def need(bs: List[Box], typ: String, ctx: String): Box =
    find(bs, typ).getOrElse(bad(s"mp4: no '$typ' box in $ctx"))

  /** Reads must stay inside the declared box, not just the payload:
    * a truncated table would otherwise silently read the next box's
    * bytes as entries and misparse instead of quarantining. */
  private def within(b: Box, o: Long, n: Long): Unit =
    if (o < b.start || n < 0 || o + n > b.end)
      bad(s"mp4: ${b.typ} field of $n bytes at $o overruns box end ${b.end}")

  /** Full-box header: (version, payload offset past version+flags). */
  private def fullBox(buf: Buf, b: Box): (Int, Long) = {
    within(b, b.start, 4)
    (buf.u8(b.start), b.start + 4)
  }

  // -- sample tables --------------------------------------------------

  private def readCount(
      buf: Buf, b: Box, o: Long, bytesPer: Int, what: String): Int = {
    within(b, o, 4)
    val n = buf.u32(o)
    if (n > MAX_SAMPLES) bad(s"mp4: $what count $n exceeds cap $MAX_SAMPLES")
    within(b, o + 4, bytesPer.toLong * n) // the entry array itself fits
    n.toInt
  }

  /** stsz → per-sample sizes (constant-size form expanded).
    * `budget` is the REMAINING cross-track sample allowance: the
    * constant-size form has no entry array for the box-extent check
    * to bound, so without a shared cap a 2 KB payload declaring
    * 2^20-sample constant-size tracks x 64 tracks would materialize
    * gigabytes of per-sample arrays (OOM is not NonFatal — it would
    * defeat the quarantine contract). A shared budget keeps worst-
    * case allocation bounded while still parsing header-only
    * (moov-without-mdat) payloads, which a payload-length bound on
    * declared sample BYTES would wrongly reject. */
  private def sampleSizes(
      buf: Buf, stbl: List[Box], budget: Int): Array[Long] = {
    val b = need(stbl, "stsz", "stbl")
    val (_, o) = fullBox(buf, b)
    within(b, o, 8)
    val const = buf.u32(o)
    val n =
      if (const != 0) readCount(buf, b, o + 4, 0, "stsz sample")
      else readCount(buf, b, o + 4, 4, "stsz sample")
    if (n > budget)
      bad(s"mp4: $n samples exceed the remaining cross-track " +
        s"budget $budget (cap $MAX_SAMPLES)")
    if (const != 0) Array.fill(n)(const)
    else Array.tabulate(n)(i => buf.u32(o + 8 + 4L * i))
  }

  /** stts → per-sample decode time (media timescale units). */
  private def sampleTimes(buf: Buf, stbl: List[Box], n: Int): Array[Long] = {
    val b = need(stbl, "stts", "stbl")
    val (_, o) = fullBox(buf, b)
    val runs = readCount(buf, b, o, 8, "stts entry")
    val times = new Array[Long](n)
    var t = 0L
    var s = 0
    var r = 0
    while (r < runs && s < n) {
      val count = buf.u32(o + 4 + 8L * r)
      val delta = buf.u32(o + 8 + 8L * r)
      var i = 0L
      while (i < count && s < n) {
        times(s) = t
        t += delta
        s += 1
        i += 1
      }
      r += 1
    }
    if (s < n) bad(s"mp4: stts covers $s of $n samples")
    times
  }

  /** stsc × stco/co64 → per-sample absolute file offset. Chunk runs
    * give samples-per-chunk; within a chunk samples are contiguous, so
    * offsets accumulate sample sizes from the chunk base. */
  private def sampleOffsets(
      buf: Buf, stbl: List[Box], sizes: Array[Long]): Array[Long] = {
    val stscBox = need(stbl, "stsc", "stbl")
    val (_, so) = fullBox(buf, stscBox)
    val runs = readCount(buf, stscBox, so, 12, "stsc entry")
    val chunkOffsets: Array[Long] = find(stbl, "stco") match {
      case Some(b) =>
        val (_, o) = fullBox(buf, b)
        val n = readCount(buf, b, o, 4, "stco entry")
        Array.tabulate(n)(i => buf.u32(o + 4 + 4L * i))
      case None =>
        val b = need(stbl, "co64", "stbl")
        val (_, o) = fullBox(buf, b)
        val n = readCount(buf, b, o, 8, "co64 entry")
        Array.tabulate(n)(i => buf.u64(o + 4 + 8L * i))
    }
    val out = new Array[Long](sizes.length)
    var s = 0
    var r = 0
    while (r < runs && s < sizes.length) {
      val firstChunk = buf.u32(so + 4 + 12L * r) // 1-based
      val perChunk = buf.u32(so + 8 + 12L * r)
      if (r == 0 && firstChunk != 1)
        // ISO 14496-12 mandates the first run covers chunk 1; a later
        // start would silently shift every sample to the wrong chunk
        // base, and wrong offsets still land inside mdat — quarantine
        bad(s"mp4: stsc first run starts at chunk $firstChunk, not 1")
      if (firstChunk < 1 || firstChunk > chunkOffsets.length)
        bad(s"mp4: stsc first_chunk $firstChunk outside ${chunkOffsets.length} chunks")
      if (perChunk < 1 || perChunk > MAX_SAMPLES)
        bad(s"mp4: stsc samples_per_chunk $perChunk out of bounds")
      val lastChunk = // run extends to the next run's first_chunk - 1
        if (r + 1 < runs) {
          val next = buf.u32(so + 4 + 12L * (r + 1))
          if (next <= firstChunk) bad("mp4: stsc first_chunk not increasing")
          math.min(next - 1, chunkOffsets.length.toLong)
        } else chunkOffsets.length.toLong
      var c = firstChunk
      while (c <= lastChunk && s < sizes.length) {
        var off = chunkOffsets((c - 1).toInt)
        var i = 0L
        while (i < perChunk && s < sizes.length) {
          out(s) = off
          off += sizes(s)
          s += 1
          i += 1
        }
        c += 1
      }
      r += 1
    }
    if (s < sizes.length) bad(s"mp4: chunk map covers $s of ${sizes.length} samples")
    out
  }

  /** stss → 1-based sync sample numbers; absent = every sample sync
    * (the spec's default, also the all-intra case). */
  private def syncSamples(buf: Buf, stbl: List[Box], n: Int): Array[Int] =
    find(stbl, "stss") match {
      case None => Array.tabulate(n)(_ + 1)
      case Some(b) =>
        val (_, o) = fullBox(buf, b)
        val k = readCount(buf, b, o, 4, "stss entry")
        var prev = 0L
        Array.tabulate(k) { i =>
          val s = buf.u32(o + 4 + 4L * i)
          if (s < 1 || s > n) bad(s"mp4: sync sample $s outside 1..$n")
          // strictly increasing per spec: a duplicated or unsorted
          // sync table would double-count keyframes downstream
          if (s <= prev) bad(s"mp4: sync table not increasing at $s")
          prev = s
          s.toInt
        }
    }

  // -- headers --------------------------------------------------------

  /** mvhd/mdhd share the v0 (32-bit) / v1 (64-bit) time layout:
    * creation, modification, timescale, duration. */
  private def timeHeader(buf: Buf, b: Box): (Long, Long) = {
    val (ver, o) = fullBox(buf, b)
    ver match {
      case 0 => within(b, o, 16); (buf.u32(o + 8), buf.u32(o + 12))
      case 1 => within(b, o, 28); (buf.u32(o + 16), buf.u64(o + 20))
      case v => bad(s"mp4: ${b.typ} version $v")
    }
  }

  private def toMs(units: Long, timescale: Long): Long = {
    if (units > Long.MaxValue / 1000) bad(s"mp4: duration $units overflows")
    units * 1000 / timescale
  }

  // -- public API -----------------------------------------------------

  /** Parse the container: movie + per-track metadata and exact
    * keyframe byte ranges. Raises IllegalArgumentException on any
    * malformed structure (quarantine contract). */
  def parse(payload: Array[Byte]): Mp4Meta = {
    val buf = new Buf(payload)
    val top = boxes(buf, 0, buf.len)
    val majorBrand = find(top, "ftyp")
      .map { f => within(f, f.start, 4); buf.fourcc(f.start).trim }
      .getOrElse("")
    val moov = need(top, "moov", "file")
    val moovKids = boxes(buf, moov.start, moov.end)
    val (mvTimescale, mvDuration) = timeHeader(buf, need(moovKids, "mvhd", "moov"))
    if (mvTimescale <= 0) bad(s"mp4: movie timescale $mvTimescale")
    val traks = moovKids.filter(_.typ == "trak")
    if (traks.length > MAX_TRACKS) bad(s"mp4: ${traks.length} tracks")
    var sampleBudget = MAX_SAMPLES // shared across tracks
    val tracks = traks.map { trak =>
      val kids = boxes(buf, trak.start, trak.end)
      val tkhd = need(kids, "tkhd", "trak")
      val (tkVer, tko) = fullBox(buf, tkhd)
      val (trackId, afterDur) = tkVer match {
        case 0 => (buf.u32(tko + 8), tko + 20)
        case 1 => (buf.u32(tko + 16), tko + 32)
        case v => bad(s"mp4: tkhd version $v")
      }
      // reserved(8) layer(2) alt_group(2) volume(2) reserved(2) matrix(36)
      within(tkhd, afterDur, 60)
      val width = (buf.u32(afterDur + 52) >> 16).toInt // 16.16 fixed
      val height = (buf.u32(afterDur + 56) >> 16).toInt
      val mdiaBox = need(kids, "mdia", "trak")
      val mdia = boxes(buf, mdiaBox.start, mdiaBox.end)
      val (mdTimescale, mdDuration) = timeHeader(buf, need(mdia, "mdhd", "mdia"))
      if (mdTimescale <= 0) bad(s"mp4: media timescale $mdTimescale")
      val handler = find(mdia, "hdlr")
        .map { h => within(h, h.start + 8, 4); buf.fourcc(h.start + 8) }
        .getOrElse("")
      val minf = need(mdia, "minf", "mdia")
      val stbl0 = need(boxes(buf, minf.start, minf.end), "stbl", "minf")
      val stbl = boxes(buf, stbl0.start, stbl0.end)
      val codec = find(stbl, "stsd").map { sd =>
        val (_, o) = fullBox(buf, sd)
        within(sd, o, 4)
        if (buf.u32(o) < 1) "" else { within(sd, o + 8, 4); buf.fourcc(o + 8) }
      }.getOrElse("")
      val sizes = sampleSizes(buf, stbl, sampleBudget)
      sampleBudget -= sizes.length
      val offsets = sampleOffsets(buf, stbl, sizes)
      val times = sampleTimes(buf, stbl, sizes.length)
      val keyframes = syncSamples(buf, stbl, sizes.length).toSeq.map { s =>
        Keyframe(s, offsets(s - 1), sizes(s - 1),
          toMs(times(s - 1), mdTimescale))
      }
      Mp4Track(trackId, handler, codec, mdTimescale,
        toMs(mdDuration, mdTimescale), width, height,
        sizes.length, keyframes)
    }
    Mp4Meta(majorBrand, mvTimescale, toMs(mvDuration, mvTimescale), tracks)
  }

  /** Extract up to `maxFrames` keyframe payloads of the first video
    * (`vide`) track — the real container-aware frame sampling that
    * MediaPipeline.frameSample approximates for codec-less formats.
    * The bytes come straight out of `mdat` at the sample table's
    * offsets; decoding them is the codec stub's job. An audio-only
    * container raises: PCM/AAC bytes must never flow downstream
    * labeled as video keyframes. */
  def keyframeBytes(payload: Array[Byte], maxFrames: Int): Seq[Array[Byte]] =
    keyframeBytes(payload, parse(payload), maxFrames)

  /** Parse-once variant for callers that already hold the Mp4Meta of
    * this exact payload (the hot mapPartitions loops). */
  def keyframeBytes(
      payload: Array[Byte], meta: Mp4Meta,
      maxFrames: Int): Seq[Array[Byte]] = {
    require(maxFrames > 0, s"maxFrames must be positive, got $maxFrames")
    val buf = new Buf(payload)
    val track = meta.tracks.find(_.handler == "vide")
      .getOrElse(bad("mp4: no video track to sample keyframes from"))
    track.keyframes.take(maxFrames).map(k => buf.slice(k.offset, k.size))
  }

  // -- fixture encoder (the parser's inverse) -------------------------

  /** Encode a minimal valid one-track MP4: ftyp + moov (mvhd, trak
    * with full sample tables) + mdat. Samples are laid out
    * `chunkSize` per chunk (exercising multi-run stsc/stco); byte `j`
    * of 0-based sample `i` is `(seed + i + j) % 251` so tests and
    * oracles can recompute extracted keyframe bytes arithmetically.
    * Every `syncEvery`-th sample (0-based: i % syncEvery == 0) is a
    * sync sample. */
  def encodeMp4(
      seed: Long,
      sampleSizes: Array[Int],
      syncEvery: Int,
      timescale: Int,
      sampleDelta: Int,
      width: Int,
      height: Int,
      codec: String = "mp4v",
      chunkSize: Int = 3): Array[Byte] = {
    require(sampleSizes.nonEmpty && sampleSizes.forall(_ > 0))
    require(syncEvery > 0 && timescale > 0 && sampleDelta > 0 && chunkSize > 0)
    val n = sampleSizes.length
    val duration = n.toLong * sampleDelta
    val sync = (0 until n).filter(_ % syncEvery == 0).map(_ + 1) // 1-based
    val nChunks = (n + chunkSize - 1) / chunkSize

    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val total = 8 + payload.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(total)
      bb.putInt(total)
      bb.put(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      payload.foreach(bb.put)
      bb.array()
    }
    def be32(vs: Long*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(v => bb.putInt(v.toInt))
      bb.array()
    }

    val ftyp = box("ftyp", "isom".getBytes, be32(0x200),
      "isom".getBytes, "mp41".getBytes)
    val mvhd = box("mvhd", be32(0), // version+flags
      be32(0, 0, timescale, duration), // times
      be32(0x00010000L, 0x01000000L), // rate, volume+reserved(2)
      be32(0, 0), // reserved(8)
      be32(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L), // matrix
      be32(0, 0, 0, 0, 0, 0), // pre_defined
      be32(2)) // next_track_ID
    val tkhd = box("tkhd", be32(7), // version 0, flags=enabled|in_movie|preview
      be32(0, 0, 1, 0, duration), // times, track_ID, reserved, duration
      be32(0, 0), // reserved
      be32(0, 0), // layer+alt_group, volume+reserved
      be32(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L), // matrix
      be32(width.toLong << 16, height.toLong << 16))
    val mdhd = box("mdhd", be32(0),
      be32(0, 0, timescale, duration), be32(0x55c40000L)) // und language
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes,
      be32(0, 0, 0), "graft video".getBytes ++ Array[Byte](0))
    val stsd = box("stsd", be32(0), be32(1),
      // one minimal sample entry: size(4) format(4) reserved(6) dri(2)
      be32(16), codec.getBytes, be32(0), be32(0))
    val stts = box("stts", be32(0), be32(1), be32(n.toLong, sampleDelta.toLong))
    val stss = box("stss", be32(0), be32(sync.length.toLong),
      be32(sync.map(_.toLong): _*))
    val stsc = box("stsc", be32(0),
      if (n % chunkSize == 0 || nChunks == 1)
        be32(1, 1, chunkSize.toLong.min(n), 1) // one uniform run
      else // full chunks, then a shorter last run
        be32(2, 1, chunkSize.toLong, 1, nChunks.toLong, (n % chunkSize).toLong, 1))
    val stsz = box("stsz", be32(0), be32(0, n.toLong),
      be32(sampleSizes.map(_.toLong).toIndexedSeq: _*))
    // stco needs absolute file offsets: compute moov size with a
    // placeholder, then fill (stco payload length is fixed by nChunks)
    def buildStbl(stco: Array[Byte]) =
      box("stbl", stsd, stts, stss, stsc, stsz, stco)
    def buildMoov(stco: Array[Byte]) = {
      val stbl = buildStbl(stco)
      val minf = box("minf",
        box("vmhd", be32(1), be32(0, 0)),
        box("dinf", box("dref", be32(0), be32(1),
          box("url ", be32(1)))),
        stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      box("moov", mvhd, box("trak", tkhd, mdia))
    }
    val stcoStub = box("stco", be32(0), be32(nChunks.toLong),
      be32(Seq.fill(nChunks)(0L): _*))
    val mdatStart = ftyp.length + buildMoov(stcoStub).length + 8L
    val chunkOffs = new Array[Long](nChunks)
    var off = mdatStart
    var s = 0
    var c = 0
    while (s < n) {
      chunkOffs(c) = off
      var i = 0
      while (i < chunkSize && s < n) { off += sampleSizes(s); s += 1; i += 1 }
      c += 1
    }
    val stco = box("stco", be32(0), be32(nChunks.toLong), be32(chunkOffs.toIndexedSeq: _*))
    val moov = buildMoov(stco)
    val mdatPayload = new Array[Byte](sampleSizes.map(_.toLong).sum.toInt)
    var p = 0
    var si = 0
    while (si < n) {
      var j = 0
      while (j < sampleSizes(si)) {
        mdatPayload(p) = ((seed + si + j) % 251).toByte
        p += 1
        j += 1
      }
      si += 1
    }
    val mdat = box("mdat", mdatPayload)
    ftyp ++ moov ++ mdat
  }
}
