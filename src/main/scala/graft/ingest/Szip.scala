package graft.ingest

import java.io.IOException

/** The HDF5 szip filter (id 4): CCSDS 121.0-B-2 extended-Rice
  * lossless coding, as applied by H5Zszip.c + the szip/libaec
  * library. Everything here is implemented from the public spec:
  *
  *   - CCSDS 121.0-B-2 "Lossless Data Compression" — the adaptive
  *     entropy coder: per-block option IDs (zero-block / second
  *     extension / split-sample-k / no-compression), fundamental-
  *     sequence codewords, the unit-delay predictor + mapper.
  *   - HDF5 H5Zszip.c (public source) — cd_values layout
  *     [options_mask, bits_per_pixel, pixels_per_block,
  *     pixels_per_scanline] and the 4-byte little-endian original
  *     size prefixed to each compressed chunk.
  *   - szip 2.1 / libaec (public sources) — the raw-stream framing
  *     HDF5 uses (SZ_RAW_OPTION_MASK: no szip header), scanline =
  *     reference-sample interval, 64-block segments for zero runs.
  *
  * Support matrix (unsupported → loud IOException, which the granule
  * quarantine path records per file):
  *   sample size      : 8 / 16 / 32 bits (H5Zszip itself rejects
  *                      precision > 32)      yes
  *   modes            : NN (unit-delay preprocessing) and EC    yes
  *   options          : raw stream, LSB sample byte order       yes
  *                      MSB byte order / chip                   no, loud
  *   block options    : split-k, FS, no-compression, zero-block
  *                      (incl. ROS), second extension           yes
  *                      second extension on a block carrying a
  *                      reference sample                        no, loud
  *
  * The encoder exists for fixture writing and property round-trips;
  * it never emits second extension (the decoder's SE path is pinned
  * by hand-built spec vectors instead).
  *
  * Reference analog: granules opened via netcdf/HDF5 stacks where
  * libhdf5 may carry szip-filtered chunks
  * (reference: insitu_cmems_vertical/recipe.py:34 `open_dataset`).
  */
object Szip {

  // SZ_*_OPTION_MASK constants from the public szip headers
  val AllowK13 = 1
  val Chip = 2
  val EC = 4
  val LSB = 8
  val MSB = 16
  val NN = 32
  val Raw = 128

  /** cd_values[0..3] of the HDF5 filter message, H5Zszip order. */
  case class Params(optionsMask: Int, bitsPerPixel: Int,
      pixelsPerBlock: Int, pixelsPerScanline: Int) {
    def preprocess: Boolean = (optionsMask & NN) != 0
  }

  private def idLenOf(n: Int): Int =
    if (n <= 8) 3 else if (n <= 16) 4 else 5

  private def validate(p: Params): Unit = {
    val n = p.bitsPerPixel
    if (n != 8 && n != 16 && n != 32)
      throw new IOException(
        s"szip: unsupported bits_per_pixel $n (8/16/32 only)")
    if ((p.optionsMask & MSB) != 0 && n > 8)
      throw new IOException("szip: MSB sample byte order unsupported")
    if ((p.optionsMask & Chip) != 0)
      throw new IOException("szip: chip option unsupported")
    val j = p.pixelsPerBlock
    if (j < 2 || j > 64 || (j & 1) != 0)
      throw new IOException(s"szip: pixels_per_block $j out of range")
    val pps = p.pixelsPerScanline
    if (pps < j || pps > j * 128)
      throw new IOException(
        s"szip: pixels_per_scanline $pps out of range for block $j")
  }

  // -- MSB-first bit I/O over untrusted bytes --------------------------

  /** MSB-first reader over untrusted bytes. Bytewise accumulator —
    * this sits on the per-sample granule-decode hot path, so no
    * per-bit array indexing: `acc` holds `nbits` valid low bits
    * (≤ 39 after a refill for a 32-bit read, well inside a Long). */
  private final class BitReader(data: Array[Byte]) {
    private var bytePos = 0
    private var acc = 0L
    private var nbits = 0
    private def fill(need: Int): Unit = {
      while (nbits < need) {
        if (bytePos >= data.length)
          throw new IOException("szip: bitstream truncated")
        acc = (acc << 8) | (data(bytePos) & 0xFFL)
        bytePos += 1
        nbits += 8
      }
    }
    def get(bits: Int): Long = {
      fill(bits)
      nbits -= bits
      val v = (acc >>> nbits) & ((1L << bits) - 1)
      acc &= (1L << nbits) - 1
      v
    }
    /** Fundamental-sequence codeword: count of 0 bits before a 1,
      * consumed a buffered word at a time via leading-zero count. */
    def fs(cap: Int): Int = {
      var z = 0
      while (true) {
        if (nbits == 0) fill(1)
        if (acc == 0L) { // all buffered bits are zeros
          z += nbits
          nbits = 0
          if (z > cap)
            throw new IOException(
              s"szip: fundamental-sequence codeword exceeds $cap bits")
        } else {
          val zeros = nbits - (64 - java.lang.Long.numberOfLeadingZeros(acc))
          z += zeros
          if (z > cap)
            throw new IOException(
              s"szip: fundamental-sequence codeword exceeds $cap bits")
          nbits -= zeros + 1 // the zeros and their terminating 1
          acc &= (1L << nbits) - 1
          return z
        }
      }
      -1 // unreachable
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def put(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def putFs(v: Int): Unit = { put(0L, v); put(1L, 1) }
    def result(): Array[Byte] = {
      if (nbits > 0) { out.write(cur << (8 - nbits)); cur = 0; nbits = 0 }
      out.toByteArray
    }
  }

  // -- the CCSDS mapper and its inverse (unit-delay predictor) ---------

  private def mapDelta(x: Long, pred: Long, maxv: Long): Long = {
    val d = x - pred
    val theta = math.min(pred, maxv - pred)
    if (d >= 0 && d <= theta) 2 * d
    else if (d < 0 && -d <= theta) -2 * d - 1
    else theta + math.abs(d)
  }

  private def unmapDelta(m: Long, pred: Long, maxv: Long): Long = {
    val theta = math.min(pred, maxv - pred)
    val d =
      if (m <= 2 * theta) { if ((m & 1) == 0) m / 2 else -(m + 1) / 2 }
      else { val am = m - theta; if (theta == pred) am else -am }
    val x = pred + d
    if (x < 0 || x > maxv)
      throw new IOException("szip: mapped sample out of range")
    x
  }

  // -- decode ----------------------------------------------------------

  /** Decode `sampleCount` samples from a raw szip stream (the HDF5
    * chunk payload AFTER its 4-byte size prefix) into little-endian
    * bytes of `bitsPerPixel/8` each. */
  def decode(data: Array[Byte], p: Params, sampleCount: Int): Array[Byte] = {
    validate(p)
    val n = p.bitsPerPixel
    val esz = n / 8
    val j = p.pixelsPerBlock
    val idLen = idLenOf(n)
    val maxId = (1 << idLen) - 1
    val maxv = if (n == 32) 0xFFFFFFFFL else (1L << n) - 1
    val r = new BitReader(data)
    val out = new Array[Byte](sampleCount * esz)
    var written = 0

    def emit(x: Long): Unit = {
      var b = 0
      while (b < esz) { // LSB option: little-endian sample bytes
        out(written * esz + b) = ((x >>> (8 * b)) & 0xFF).toByte
        b += 1
      }
      written += 1
    }

    while (written < sampleCount) {
      val m = math.min(p.pixelsPerScanline, sampleCount - written)
      val sigma = new Array[Long](m) // mapped values (ref raw at 0)
      var posn = 0
      while (posn < m) {
        val blockIdx = posn / j
        val blockEnd = math.min(posn + j, m)
        val ref = p.preprocess && posn == 0
        val id = r.get(idLen).toInt
        if (id == 0) {
          val se = r.get(1) == 1L
          if (ref) sigma(0) = r.get(n)
          if (se) {
            // second extension: FS-coded pair values
            if (ref)
              throw new IOException(
                "szip: second extension on a reference block unsupported")
            var i = posn
            while (i < blockEnd) {
              val mm = r.fs(1 << 16).toLong
              // invert m = g(g+1)/2 + d2, d1 = g - d2
              var g = ((math.sqrt(8.0 * mm + 1) - 1) / 2).toLong
              while (g * (g + 1) / 2 > mm) g -= 1
              while ((g + 1) * (g + 2) / 2 <= mm) g += 1
              val d2 = mm - g * (g + 1) / 2
              val d1 = g - d2
              if (d1 > maxv || d2 > maxv)
                throw new IOException("szip: second-extension pair out of range")
              sigma(i) = d1
              if (i + 1 < blockEnd) sigma(i + 1) = d2
              else if (d2 != 0)
                throw new IOException("szip: dangling second-extension value")
              i += 2
            }
            posn = blockEnd
          } else {
            // zero-block: run of all-zero blocks, 64-block segments
            val z = r.fs(80) + 1
            val segRemaining = 64 - (blockIdx % 64)
            val run =
              if (z == 5) segRemaining // ROS: rest of segment
              else if (z <= 4) z
              else z - 1
            if (run > segRemaining)
              throw new IOException("szip: zero run crosses a segment boundary")
            val zEnd = math.min(posn + run * j, m)
            var i = if (ref) posn + 1 else posn
            while (i < zEnd) { sigma(i) = 0L; i += 1 }
            posn = zEnd
          }
        } else if (id == maxId) {
          // no compression: raw n-bit samples (ref included as-is)
          var i = posn
          while (i < blockEnd) { sigma(i) = r.get(n); i += 1 }
          posn = blockEnd
        } else {
          // split-sample: FS of (v >> k) for each, then the k LSBs
          val k = id - 1
          if (ref) sigma(0) = r.get(n)
          val from = if (ref) posn + 1 else posn
          val cnt = blockEnd - from
          val hi = new Array[Long](cnt)
          val fsCap = math.min(maxv >>> k, 1L << 16).toInt
          var i = 0
          while (i < cnt) { hi(i) = r.fs(fsCap).toLong; i += 1 }
          i = 0
          while (i < cnt) {
            val v = (hi(i) << k) | (if (k > 0) r.get(k) else 0L)
            if (v > maxv)
              throw new IOException("szip: split-sample value out of range")
            sigma(from + i) = v
            i += 1
          }
          posn = blockEnd
        }
      }
      // post-process the scanline: NN inverse or direct (EC)
      if (p.preprocess) {
        if (sigma(0) > maxv)
          throw new IOException("szip: reference sample out of range")
        emit(sigma(0))
        var i = 1
        var pred = sigma(0)
        while (i < m) {
          pred = unmapDelta(sigma(i), pred, maxv)
          emit(pred)
          i += 1
        }
      } else {
        var i = 0
        while (i < m) {
          if (sigma(i) > maxv)
            throw new IOException("szip: sample out of range")
          emit(sigma(i))
          i += 1
        }
      }
    }
    out
  }

  // -- encode (fixture writer + property round-trips) ------------------

  /** Encode little-endian samples into a raw szip stream (no HDF5
    * size prefix — the fixture writer adds it). */
  def encode(raw: Array[Byte], p: Params): Array[Byte] = {
    validate(p)
    val n = p.bitsPerPixel
    val esz = n / 8
    if (raw.length % esz != 0)
      throw new IllegalArgumentException(
        s"szip: ${raw.length} bytes not a multiple of sample size $esz")
    val total = raw.length / esz
    val j = p.pixelsPerBlock
    val idLen = idLenOf(n)
    val maxId = (1 << idLen) - 1
    val maxK = maxId - 2
    val maxv = if (n == 32) 0xFFFFFFFFL else (1L << n) - 1
    val w = new BitWriter

    def sampleAt(i: Int): Long = {
      var v = 0L
      var b = 0
      while (b < esz) {
        v |= (raw(i * esz + b) & 0xFFL) << (8 * b)
        b += 1
      }
      v
    }

    var done = 0
    while (done < total) {
      val m = math.min(p.pixelsPerScanline, total - done)
      // preprocess into mapped values
      val sigma = new Array[Long](m)
      if (p.preprocess) {
        sigma(0) = sampleAt(done)
        var i = 1
        while (i < m) {
          sigma(i) = mapDelta(sampleAt(done + i), sampleAt(done + i - 1), maxv)
          i += 1
        }
      } else {
        var i = 0
        while (i < m) { sigma(i) = sampleAt(done + i); i += 1 }
      }
      val blocks = (m + j - 1) / j
      var b = 0
      while (b < blocks) {
        val from = b * j
        val until = math.min(from + j, m)
        val ref = p.preprocess && b == 0
        val codedFrom = if (ref) from + 1 else from
        def allZero(lo: Int, hi: Int): Boolean = {
          var i = lo; while (i < hi) { if (sigma(i) != 0) return false; i += 1 }
          true
        }
        // zero-run: maximal run of all-zero blocks within this segment
        if (allZero(codedFrom, until)) {
          var runEnd = b + 1
          val segEnd = math.min((b / 64 + 1) * 64, blocks)
          while (runEnd < segEnd &&
              allZero(runEnd * j, math.min(runEnd * j + j, m)))
            runEnd += 1
          val run = runEnd - b
          w.put(0L, idLen); w.put(0L, 1)
          if (ref) w.put(sigma(from), n)
          val z = if (run <= 4) run else run + 1
          w.putFs(z - 1)
          b = runEnd
        } else {
          val cnt = until - codedFrom
          // cost of split-k vs no-compression; pick the cheapest
          var bestK = -1
          var bestCost = cnt.toLong * n // no-compression (coded part)
          var k = 0
          while (k <= math.min(maxK, n - 1)) {
            var cost = cnt.toLong * (k + 1)
            var i = codedFrom
            while (i < until && cost < bestCost) {
              cost += (sigma(i) >>> k); i += 1
            }
            if (cost < bestCost) { bestCost = cost; bestK = k }
            k += 1
          }
          if (bestK < 0) {
            w.put(maxId.toLong, idLen)
            // no-compression: every sample raw, reference included
            var i = from
            while (i < until) { w.put(sigma(i), n); i += 1 }
          } else {
            w.put((bestK + 1).toLong, idLen)
            if (ref) w.put(sigma(from), n)
            var i = codedFrom
            while (i < until) { w.putFs((sigma(i) >>> bestK).toInt); i += 1 }
            if (bestK > 0) {
              i = codedFrom
              while (i < until) {
                w.put(sigma(i) & ((1L << bestK) - 1), bestK); i += 1
              }
            }
          }
          b += 1
        }
      }
      done += m
    }
    w.result()
  }
}
