package graft.multimodal

/** REAL media decoding in pure JVM — no native or third-party libs.
  *
  * Two decode paths, zero new dependencies:
  *
  *   - javax.imageio (java.desktop, in every standard JDK): JPEG,
  *     PNG, GIF, TIFF — the formats real crawled-image corpora are
  *     overwhelmingly made of;
  *   - byte-arithmetic decoders written here for formats ImageIO
  *     lacks or where exact pixel control matters:
  *       netpbm P5/P6 (PGM/PPM)   — the scientific-imaging interchange
  *       BMP (24/32-bit BI_RGB)   — uncompressed Windows bitmaps
  *       WAV (RIFF PCM 8/16-bit)  — uncompressed audio
  *
  * Video containers (MP4) are demuxed for real by Mp4Container
  * (ISO-BMFF box walk, sample tables, keyframe byte extraction); the
  * extracted sample BYTES remain undecodable without a codec library,
  * so pixel-level video decode still quarantines.
  *
  * On top of the decoded pixels/samples: bilinear resize, 8×8
  * block-mean luma features, a DCT-based 64-bit perceptual hash
  * (the standard pHash construction: 32×32 luma → DCT-II → top-left
  * 8×8 minus DC → median threshold), and windowed RMS/zero-crossing
  * audio features. Malformed payloads raise IllegalArgumentException;
  * run corpora through MediaPipeline.decodeQuarantined, which turns
  * those into error rows so the job never dies on one bad file.
  *
  * Reference parity note: the reference treats media strictly as
  * opaque assets (href + media_type, avhrr recipe.py:70); this module
  * is part of the beyond-reference training-pipeline surface.
  */
object RealDecoders {

  /** Grayscale image: row-major luma in [0,1]. */
  case class GrayImage(width: Int, height: Int, luma: Array[Float])

  /** PCM audio: mono samples in [-1,1]. */
  case class PcmAudio(sampleRate: Int, samples: Array[Float])

  private def bad(msg: String) = throw new IllegalArgumentException(msg)

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], o: Int): Long =
    u16le(b, o).toLong | (u16le(b, o + 2).toLong << 16)
  private def i32le(b: Array[Byte], o: Int): Int = u32le(b, o).toInt

  /** Pixel-count cap: a 64 MP "image" in a header is corruption. */
  private val MAX_PIXELS = 1 << 26

  // ---- netpbm P5 (gray) / P6 (rgb), 8-bit binary ----

  def decodeNetpbm(b: Array[Byte]): GrayImage = {
    if (b.length < 10 || b(0) != 'P' || (b(1) != '5' && b(1) != '6'))
      bad("not a binary PGM/PPM payload")
    val rgb = b(1) == '6'
    // header tokens separated by whitespace, '#' comments to EOL
    var o = 2
    def token(): Int = {
      var inComment = false
      while (o < b.length && (inComment || b(o).toChar.isWhitespace ||
        b(o) == '#')) {
        if (b(o) == '#') inComment = true
        else if (b(o) == '\n') inComment = false
        o += 1
      }
      var v = 0L
      val start = o
      while (o < b.length && b(o) >= '0' && b(o) <= '9') {
        v = v * 10 + (b(o) - '0')
        if (v > Int.MaxValue) bad("netpbm header value out of range")
        o += 1
      }
      if (o == start) bad("malformed netpbm header")
      v.toInt
    }
    val w = token(); val h = token(); val maxval = token()
    if (w <= 0 || h <= 0 || w.toLong * h > MAX_PIXELS)
      bad(s"netpbm dims $w x $h out of bounds")
    if (maxval != 255) bad(s"only maxval 255 supported, got $maxval")
    o += 1 // single whitespace after maxval
    val n = w * h
    val need = if (rgb) 3 * n else n
    if (b.length - o < need)
      bad(s"netpbm payload truncated: need $need raster bytes")
    val luma = new Array[Float](n)
    var i = 0
    while (i < n) {
      luma(i) =
        if (rgb) {
          val p = o + 3 * i
          (0.299f * (b(p) & 0xff) + 0.587f * (b(p + 1) & 0xff) +
            0.114f * (b(p + 2) & 0xff)) / 255f
        } else (b(o + i) & 0xff) / 255f
      i += 1
    }
    GrayImage(w, h, luma)
  }

  // ---- BMP: BITMAPINFOHEADER, 24/32-bit, BI_RGB, bottom-up or top-down ----

  def decodeBmp(b: Array[Byte]): GrayImage = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') bad("not a BMP payload")
    val dataOff = u32le(b, 10)
    val w = i32le(b, 18)
    val hRaw = i32le(b, 22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    val bpp = u16le(b, 28)
    val compression = u32le(b, 30)
    if (compression != 0) bad(s"compressed BMP (method $compression) unsupported")
    if (bpp != 24 && bpp != 32) bad(s"only 24/32-bit BMP supported, got $bpp")
    // h <= 0 AFTER abs: math.abs(Int.MinValue) is still negative, and
    // a crafted 0x80000000 height would otherwise slip every check and
    // die as NegativeArraySizeException outside the quarantine contract
    if (w <= 0 || h <= 0 || w.toLong * h > MAX_PIXELS)
      bad(s"BMP dims $w x $h out of bounds")
    val bytesPp = bpp / 8
    val stride = (w * bytesPp + 3) & ~3
    if (dataOff < 0 || dataOff + stride.toLong * h > b.length)
      bad("BMP raster truncated")
    val luma = new Array[Float](w * h)
    var y = 0
    while (y < h) {
      val srcRow = dataOff.toInt + (if (bottomUp) (h - 1 - y) else y) * stride
      var x = 0
      while (x < w) {
        val p = srcRow + x * bytesPp // BGR(A) order
        luma(y * w + x) = (0.114f * (b(p) & 0xff) + 0.587f * (b(p + 1) & 0xff) +
          0.299f * (b(p + 2) & 0xff)) / 255f
        x += 1
      }
      y += 1
    }
    GrayImage(w, h, luma)
  }

  // ---- WAV: RIFF/WAVE, PCM (format 1), 8/16-bit, any channel count ----

  def decodeWav(b: Array[Byte]): PcmAudio = {
    if (b.length < 44 || new String(b, 0, 4) != "RIFF" ||
      new String(b, 8, 4) != "WAVE") bad("not a RIFF/WAVE payload")
    var o = 12
    var channels = 0; var rate = 0; var bits = 0
    var data: (Int, Int) = null // (offset, len)
    while (o + 8 <= b.length && (data == null || channels == 0)) {
      val id = new String(b, o, 4)
      val size = u32le(b, o + 4)
      if (size < 0 || o + 8 + size > b.length)
        bad(s"WAV chunk '$id' overruns payload")
      id match {
        case "fmt " =>
          if (size < 16) bad("WAV fmt chunk too small")
          val fmt = u16le(b, o + 8)
          if (fmt != 1) bad(s"only PCM WAV supported, got format $fmt")
          channels = u16le(b, o + 10)
          rate = i32le(b, o + 12)
          bits = u16le(b, o + 22)
          if (channels < 1 || channels > 8) bad(s"WAV channels $channels")
          if (rate <= 0) bad(s"WAV sample rate $rate")
          if (bits != 8 && bits != 16) bad(s"only 8/16-bit PCM, got $bits")
        case "data" => data = (o + 8, size.toInt)
        case _ => () // skip LIST/fact/etc
      }
      o += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (channels == 0 || data == null) bad("WAV lacks fmt or data chunk")
    val (dOff, dLen) = data
    val bytesPerSample = bits / 8
    val frames = dLen / (bytesPerSample * channels)
    if (frames > (1 << 26)) bad(s"WAV of $frames frames out of bounds")
    val mono = new Array[Float](frames)
    var i = 0
    while (i < frames) {
      var acc = 0f
      var c = 0
      while (c < channels) {
        val p = dOff + (i * channels + c) * bytesPerSample
        acc += (if (bits == 16) u16le(b, p).toShort.toFloat / 32768f
        else ((b(p) & 0xff) - 128).toFloat / 128f)
        c += 1
      }
      mono(i) = acc / channels
      i += 1
    }
    PcmAudio(rate, mono)
  }

  // ---- JPEG/PNG/GIF/TIFF via JDK ImageIO (java.desktop module) ----

  /** Decode via javax.imageio — present in every standard JDK with
    * JPEG/PNG/GIF/TIFF/BMP/WBMP readers registered; no display needed
    * (pure raster work, headless-safe). Luma via the same Rec.601
    * weights as the byte-arithmetic decoders so pHash values are
    * comparable across decode paths. */
  def decodeImageIo(b: Array[Byte]): GrayImage = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      catch {
        // ImageIO readers throw IOException (and occasionally runtime
        // errors) on truncated/adversarial payloads — normalize to the
        // quarantine contract's IllegalArgumentException
        case e: java.io.IOException => bad(s"ImageIO: ${e.getMessage}")
      }
    if (img == null) bad("ImageIO: no registered reader for payload")
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0 || w.toLong * h > MAX_PIXELS)
      bad(s"image dims $w x $h out of bounds")
    val rgb = img.getRGB(0, 0, w, h, null, 0, w)
    val luma = new Array[Float](w * h)
    var i = 0
    while (i < luma.length) {
      val p = rgb(i)
      luma(i) = (0.299f * ((p >> 16) & 0xff) + 0.587f * ((p >> 8) & 0xff) +
        0.114f * (p & 0xff)) / 255f
      i += 1
    }
    GrayImage(w, h, luma)
  }

  /** Fixture encoder through ImageIO (`"jpeg"`, `"png"`, ...) — the
    * decode path's inverse for tests and synthetic corpora. */
  def encodeImageIo(img: GrayImage, format: String): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(img.width, img.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val v = (math.max(0f, math.min(1f, img.luma(y * img.width + x)))
          * 255f).round
        bi.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(bi, format, baos))
      bad(s"no ImageIO writer for format '$format'")
    baos.toByteArray
  }

  // ---- transforms over decoded data ----

  /** Resize a luma grid: area-average (box filter) when decimating by
    * more than 2× — point-sampling bilinear at high ratios ALIASES
    * (two re-crawls of one photo at different sizes hit different
    * source-pixel phases and hash apart), which is why standard pHash
    * implementations box-filter first — bilinear otherwise. */
  def resize(img: GrayImage, w2: Int, h2: Int): GrayImage = {
    require(w2 > 0 && h2 > 0, s"resize to $w2 x $h2")
    if (img.width > 2 * w2 || img.height > 2 * h2) areaResize(img, w2, h2)
    else bilinearResize(img, w2, h2)
  }

  /** Mean of the source box feeding each output cell. */
  private def areaResize(img: GrayImage, w2: Int, h2: Int): GrayImage = {
    val out = new Array[Float](w2 * h2)
    var y = 0
    while (y < h2) {
      val y0 = y * img.height / h2
      val y1 = math.max(y0 + 1, (y + 1) * img.height / h2)
      var x = 0
      while (x < w2) {
        val x0 = x * img.width / w2
        val x1 = math.max(x0 + 1, (x + 1) * img.width / w2)
        var s = 0.0
        var yy = y0
        while (yy < y1) {
          var xx = x0
          while (xx < x1) { s += img.luma(yy * img.width + xx); xx += 1 }
          yy += 1
        }
        out(y * w2 + x) = (s / ((y1 - y0) * (x1 - x0))).toFloat
        x += 1
      }
      y += 1
    }
    GrayImage(w2, h2, out)
  }

  private def bilinearResize(img: GrayImage, w2: Int, h2: Int): GrayImage = {
    val out = new Array[Float](w2 * h2)
    val sx = img.width.toFloat / w2
    val sy = img.height.toFloat / h2
    var y = 0
    while (y < h2) {
      val fy = math.min((y + 0.5f) * sy - 0.5f, img.height - 1f)
      val y0 = math.max(0, fy.floor.toInt)
      val y1 = math.min(img.height - 1, y0 + 1)
      val wy = math.max(0f, fy - y0)
      var x = 0
      while (x < w2) {
        val fx = math.min((x + 0.5f) * sx - 0.5f, img.width - 1f)
        val x0 = math.max(0, fx.floor.toInt)
        val x1 = math.min(img.width - 1, x0 + 1)
        val wx = math.max(0f, fx - x0)
        val top = img.luma(y0 * img.width + x0) * (1 - wx) +
          img.luma(y0 * img.width + x1) * wx
        val bot = img.luma(y1 * img.width + x0) * (1 - wx) +
          img.luma(y1 * img.width + x1) * wx
        out(y * w2 + x) = top * (1 - wy) + bot * wy
        x += 1
      }
      y += 1
    }
    GrayImage(w2, h2, out)
  }

  /** 8×8 block-mean luma features (dim 64) — the standard thumbnail
    * embedding for near-dup blocking. */
  def blockMeanFeatures(img: GrayImage): Array[Float] =
    resize(img, 8, 8).luma

  /** 64-bit perceptual hash: 32×32 luma → DCT-II → top-left 8×8
    * coefficients minus DC → bit per coefficient above the median.
    * Brightness/contrast-invariant (affine luma changes preserve
    * coefficient ordering), resize-invariant by construction. */
  def phash64(img: GrayImage): Long = {
    val g = resize(img, 32, 32).luma
    val n = 32
    // DCT-II, only the first 8 frequencies each axis are needed
    val coef = new Array[Double](8 * 8)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < n) {
          var x = 0
          while (x < n) {
            s += g(y * n + x) *
              math.cos((2 * x + 1) * v * math.Pi / (2 * n)) *
              math.cos((2 * y + 1) * u * math.Pi / (2 * n))
            x += 1
          }
          y += 1
        }
        coef(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val ac = coef.drop(1)
    val sorted = ac.sorted
    val median = sorted(31) // true median of 63 values (the standard pHash threshold)
    var bits = 0L
    var i = 0
    while (i < 63) {
      if (ac(i) > median) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Windowed audio features: per-window (RMS, zero-crossing rate),
    * `windows` × 2 floats — the cheap spectral sketch for audio
    * near-dup blocking. */
  def audioFeatures(a: PcmAudio, windows: Int = 32): Array[Float] = {
    require(windows > 0)
    val out = new Array[Float](windows * 2)
    if (a.samples.isEmpty) return out
    val step = math.max(1, a.samples.length / windows)
    var w = 0
    while (w < windows) {
      val lo = math.min(w * step, a.samples.length - 1)
      val hi = math.min(lo + step, a.samples.length)
      var sum2 = 0.0
      var zc = 0
      var i = lo
      while (i < hi) {
        val s = a.samples(i)
        sum2 += s * s
        if (i > lo && (s >= 0) != (a.samples(i - 1) >= 0)) zc += 1
        i += 1
      }
      out(w * 2) = math.sqrt(sum2 / (hi - lo)).toFloat
      out(w * 2 + 1) = zc.toFloat / math.max(1, hi - lo)
      w += 1
    }
    out
  }

  /** The real Decoder for MediaPipeline: JPEG/PNG/GIF/TIFF via JDK
    * ImageIO and netpbm/BMP via the byte decoders → 8×8 block-mean
    * luma (64 floats); WAV → 32×(RMS, ZCR) (64 floats). Formats that
    * genuinely need a codec library (MP4 video) still raise — the
    * pipeline quarantines them rather than faking features. */
  final class PixelDecoder extends MediaPipeline.Decoder {
    def featureDim: Int = 64
    def decode(mediaType: String, payload: Array[Byte]): Array[Float] =
      mediaType match {
        case "image/x-portable-graymap" | "image/x-portable-pixmap" =>
          blockMeanFeatures(decodeNetpbm(payload))
        case "image/bmp" => blockMeanFeatures(decodeBmp(payload))
        case "image/jpeg" | "image/jpg" | "image/png" | "image/gif" |
             "image/tiff" =>
          blockMeanFeatures(decodeImageIo(payload))
        case "audio/wav" | "audio/x-wav" => audioFeatures(decodeWav(payload))
        case "video/mp4" | "video/quicktime" =>
          // demux is real (proves the container), pixel decode is not:
          // raise with what the sample table says so quarantine rows
          // carry the parsed codec, not a generic refusal
          val t = Mp4Container.parse(payload).tracks
            .find(_.handler == "vide")
          bad(t match {
            case Some(v) =>
              s"demuxed ${v.codec} video (${v.keyframes.length} keyframes)" +
                " but pixel decode needs a codec library"
            case None => "mp4 container has no video track"
          })
        case other =>
          bad(s"no decoder for $other")
      }
  }

  // ---- fixture encoders (the decoders' inverses) ----

  def encodePgm(img: GrayImage): Array[Byte] = {
    val header = s"P5\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val px = img.luma.map(v =>
      (math.max(0f, math.min(1f, v)) * 255f).round.toByte)
    header ++ px
  }

  def encodeBmp(img: GrayImage): Array[Byte] = {
    val stride = (img.width * 3 + 3) & ~3
    val dataLen = stride * img.height
    val b = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54 + dataLen); b.putInt(0); b.putInt(54)
    b.putInt(40); b.putInt(img.width); b.putInt(img.height) // bottom-up
    b.putShort(1); b.putShort(24); b.putInt(0); b.putInt(dataLen)
    b.putInt(2835); b.putInt(2835); b.putInt(0); b.putInt(0)
    var y = img.height - 1
    while (y >= 0) {
      var x = 0
      while (x < img.width) {
        val v = (math.max(0f, math.min(1f, img.luma(y * img.width + x)))
          * 255f).round.toByte
        b.put(v).put(v).put(v)
        x += 1
      }
      var pad = stride - img.width * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  def encodeWav(a: PcmAudio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(36 + dataLen); b.put("WAVE".getBytes)
    b.put("fmt ".getBytes); b.putInt(16)
    b.putShort(1); b.putShort(1); b.putInt(a.sampleRate)
    b.putInt(a.sampleRate * 2); b.putShort(2); b.putShort(16)
    b.put("data".getBytes); b.putInt(dataLen)
    a.samples.foreach(s => b.putShort(
      (math.max(-1f, math.min(1f, s)) * 32767f).round.toShort))
    b.array()
  }
}
