package graft.operators

import graft.SparkSpec
import graft.multimodal.RealDecoders._

/** Real pure-JVM media decoding: byte-exact round-trips through the
  * fixture encoders, pHash invariances, audio features of known
  * signals, and the malformed-payload quarantine contract. */
class RealDecodersSpec extends SparkSpec {

  private def gradient(w: Int, h: Int): GrayImage =
    GrayImage(w, h, Array.tabulate(w * h)(i =>
      ((i % w).toFloat / w + (i / w).toFloat / h) / 2))

  test("PGM and BMP round-trip byte-exact through their encoders") {
    val img = gradient(37, 23) // odd width exercises BMP row padding
    val viaPgm = decodeNetpbm(encodePgm(img))
    assert(viaPgm.width == 37 && viaPgm.height == 23)
    // 8-bit quantization is the only loss
    viaPgm.luma.zip(img.luma).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1.5f / 255f, s"$a vs $b")
    }
    val viaBmp = decodeBmp(encodeBmp(img))
    assert(viaBmp.width == 37 && viaBmp.height == 23)
    viaBmp.luma.zip(img.luma).foreach { case (a, b) =>
      // grayscale BMP: same value in BGR, luma weights sum to 1
      assert(math.abs(a - b) <= 1.5f / 255f, s"$a vs $b")
    }
    // P6 color parses too, with the standard luma weights
    val p6 = "P6\n2 1\n255\n".getBytes ++
      Array[Byte](255.toByte, 0, 0, 0, 0, 255.toByte)
    val c = decodeNetpbm(p6)
    assert(math.abs(c.luma(0) - 0.299f) < 0.01f)
    assert(math.abs(c.luma(1) - 0.114f) < 0.01f)
  }

  test("WAV decode: sine RMS, DC zero crossings, stereo mixdown") {
    val n = 4800
    val sine = Array.tabulate(n)(i =>
      (0.5 * math.sin(2 * math.Pi * 440 * i / 48000.0)).toFloat)
    val a = decodeWav(encodeWav(PcmAudio(48000, sine)))
    assert(a.sampleRate == 48000 && a.samples.length == n)
    val f = audioFeatures(a, windows = 4)
    // RMS of a 0.5-amplitude sine = 0.5/sqrt(2) ~ 0.3536
    (0 until 4).foreach(w => assert(math.abs(f(w * 2) - 0.3536f) < 0.01f))
    // a constant (DC) signal has zero crossings ~ 0
    val dc = audioFeatures(PcmAudio(8000, Array.fill(800)(0.7f)), 4)
    (0 until 4).foreach(w => assert(dc(w * 2 + 1) == 0f))
  }

  /** Spectrally rich test image — a pure gradient has ~zero AC
    * energy, making pHash bits tie-noise; real photos (and this
    * sinusoid mix) have a broad spectrum. */
  private def textured(w: Int, h: Int): GrayImage =
    GrayImage(w, h, Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (0.5 + 0.2 * math.sin(x * 0.7) + 0.15 * math.cos(y * 1.1) +
        0.1 * math.sin((x + 2 * y) * 0.23)).toFloat
    })

  test("pHash: brightness-invariant, distinct content far apart") {
    val img = textured(64, 48)
    val h0 = phash64(img)
    // affine luma change (x0.8 + 0.1) preserves DCT ordering
    val brighter = GrayImage(64, 48, img.luma.map(v => v * 0.8f + 0.1f))
    assert(java.lang.Long.bitCount(h0 ^ phash64(brighter)) <= 4)
    // resize invariance by construction
    assert(java.lang.Long.bitCount(
      h0 ^ phash64(resize(img, 128, 96))) <= 8)
    // structurally different content: far in Hamming space
    val rnd = new scala.util.Random(7)
    val noise = GrayImage(64, 48, Array.fill(64 * 48)(rnd.nextFloat()))
    assert(java.lang.Long.bitCount(h0 ^ phash64(noise)) >= 16)
    // block-mean features of a constant image are constant
    val flat = blockMeanFeatures(GrayImage(31, 17, Array.fill(31 * 17)(0.4f)))
    assert(flat.length == 64 && flat.forall(v => math.abs(v - 0.4f) < 1e-4f))
  }

  test("malformed payloads raise IllegalArgumentException, never crash") {
    intercept[IllegalArgumentException](decodeNetpbm("P7\n".getBytes))
    intercept[IllegalArgumentException](
      decodeNetpbm("P5\n10 10\n255\nxx".getBytes)) // truncated raster
    intercept[IllegalArgumentException](
      decodeNetpbm("P5\n999999999 999999999\n255\n".getBytes)) // dims bomb
    intercept[IllegalArgumentException](decodeBmp(Array[Byte]('B', 'M', 0)))
    val bmp = encodeBmp(gradient(8, 8))
    val rle = bmp.clone(); rle(30) = 1 // compression = BI_RLE8
    intercept[IllegalArgumentException](decodeBmp(rle))
    intercept[IllegalArgumentException](decodeWav("RIFFxxxxNOPE".getBytes))
    val wav = encodeWav(PcmAudio(8000, Array.fill(8)(0f)))
    val badFmt = wav.clone(); badFmt(20) = 3 // IEEE float format
    intercept[IllegalArgumentException](decodeWav(badFmt))
    // the Decoder seam: undecodable types refuse rather than fake
    val d = new PixelDecoder
    intercept[IllegalArgumentException](d.decode("video/mp4", Array[Byte](1)))
  }

  test("the PixelDecoder runs the distributed pipeline over real media") {
    import graft.multimodal.MediaPipeline
    import spark.implicits._
    // real payloads encoded DRIVER-side (a distributed encode closure
    // would capture this spec class and fail serialization)
    val records = (0 until 30).map { i =>
      val id = i.toLong
      (id % 3) match {
        case 0 => MediaPipeline.MediaRecord(id, "image/bmp",
          encodeBmp(gradient(16 + (id % 5).toInt, 12)), Map("k" -> "v"))
        case 1 => MediaPipeline.MediaRecord(id, "image/x-portable-graymap",
          encodePgm(GrayImage(8, 8,
            Array.fill(64)((id % 7).toFloat / 7))), Map.empty)
        case _ => MediaPipeline.MediaRecord(id, "audio/wav",
          encodeWav(PcmAudio(8000, Array.tabulate(800)(j =>
            (0.3 * math.sin(2 * math.Pi * (100 + id) * j / 8000.0)).toFloat))),
          Map.empty)
      }
    }.toDS().repartition(4)
    val feats = MediaPipeline.extractFeatures(records,
      new PixelDecoder).collect()
    assert(feats.length == 30)
    assert(feats.forall(_.features.length == 64))
    // audio rows carry the sine RMS in the even slots
    val audio = feats.filter(_.media_type == "audio/wav")
    assert(audio.forall(f => math.abs(f.features(0) - 0.212f) < 0.02f))
    // image rows are luma means in [0,1]
    val images = feats.filter(_.media_type.startsWith("image/"))
    assert(images.forall(_.features.forall(v => v >= 0f && v <= 1f)))
    // quarantined decode: poison rows become error rows, job survives
    val poisoned = records.union(Seq(
      MediaPipeline.MediaRecord(900L, "image/bmp",
        encodeBmp(gradient(8, 8)).take(20), Map.empty),
      MediaPipeline.MediaRecord(901L, "video/mp4",
        Array[Byte](1, 2, 3), Map.empty)).toDS())
    val out = MediaPipeline.decodeQuarantined(poisoned,
      new PixelDecoder).collect()
    assert(out.count(_.error != null) == 2)
    assert(out.filter(_.error != null).forall(_.features.isEmpty))
    assert(out.count(_.error == null) == 30)
  }

  test("ImageIO decode: JPEG/PNG round-trip, pHash stability, quarantine") {
    val img = textured(64, 48)
    // PNG is lossless: 8-bit quantization is the only loss
    val png = decodeImageIo(encodeImageIo(img, "png"))
    assert(png.width == 64 && png.height == 48)
    png.luma.zip(img.luma).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1.5f / 255f, s"$a vs $b")
    }
    // real lossy JPEG: quantization noise must not move the pHash
    val jpg = decodeImageIo(encodeImageIo(img, "jpeg"))
    assert(java.lang.Long.bitCount(phash64(img) ^ phash64(jpg)) <= 6)
    // the re-crawl shape: brightness jitter THROUGH lossy re-encoding
    val twin = decodeImageIo(encodeImageIo(
      GrayImage(64, 48, img.luma.map(v => v * 0.85f + 0.05f)), "jpeg"))
    assert(java.lang.Long.bitCount(phash64(img) ^ phash64(twin)) <= 6)
    // truncated JPEG and garbage quarantine per the decoder contract
    intercept[IllegalArgumentException](
      decodeImageIo(encodeImageIo(img, "jpeg").take(40)))
    intercept[IllegalArgumentException](decodeImageIo(Array[Byte](1, 2, 3)))
    // the Decoder seam routes JPEG/PNG through ImageIO
    val d = new PixelDecoder
    assert(d.decode("image/jpeg", encodeImageIo(img, "jpeg")).length == 64)
    assert(d.decode("image/png", encodeImageIo(img, "png")).length == 64)
  }

  test("multimodal_decode holds its documented bounds end-to-end") {
    val rows = MultimodalQueries.multimodalDecode(spark, sf).collect()
    assert(rows.length == 5) // jpeg, bmp, pgm, png, wav
    val r = rows.head
    // every brightness-jittered twin (JPEG AND BMP) within the bound
    assert(r.getAs[Int]("max_twin_hamming") <= 6)
    assert(r.getAs[Long]("n_twins") == 30)
    // exactly the three poison payloads quarantined
    assert(r.getAs[Long]("n_quarantined") == 3)
  }
}
