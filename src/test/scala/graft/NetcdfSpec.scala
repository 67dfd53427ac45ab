package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets

import graft.catalog.ItemAssembly
import graft.ingest.{NetcdfClassic, NetcdfGranuleSource}

/** Test shims over NetcdfClassic.buildHeader (the byte-level writer
  * lives in main — it is the reader's inverse). */
object NcFixture {
  import NetcdfClassic._
  type AttrVal = AttrValue
  def S(v: String): AttrValue = CharAttr(v)
  def D(v: Double): AttrValue = DoubleAttr(v)
  def F(v: Float): AttrValue = FloatAttr(v)
  def I(v: Seq[Int]): AttrValue = IntAttr(v)
  def Sh(v: Short): AttrValue = ShortAttr(v)

  def bytes(attrs: Seq[(String, AttrVal)], version: Int = 1,
      dims: Seq[(String, Long)] = Seq(("ni", 409L), ("nj", 5680L)))
      : Array[Byte] =
    NetcdfClassic.buildHeader(attrs, dims, version)

  def writeFile(path: String, attrs: Seq[(String, AttrVal)],
      version: Int = 1): Unit = {
    val f = new FileOutputStream(path)
    try f.write(bytes(attrs, version)) finally f.close()
  }
}

class NetcdfSpec extends SparkSpec {
  import NcFixture._

  private def parse(b: Array[Byte]): NetcdfClassic.Header =
    NetcdfClassic.readHeader(new DataInputStream(new ByteArrayInputStream(b)))

  test("classic header parse: strings, doubles, arrays, dims, all versions") {
    val attrs = Seq(
      ("id", S("AVHRR_SST_METOP_B-OSISAF-L2P-v1.0")),
      ("uuid", S("granule-x")),
      ("westernmost_longitude", S("-54.92")),
      ("northernmost_latitude", D(83.25)),
      ("scale", F(0.01f)),
      ("flags", I(Seq(1, 2, 3))),
      ("rows", Sh(409.toShort)))
    for (v <- Seq(1, 2, 5)) {
      val h = parse(bytes(attrs, version = v))
      assert(h.version == v)
      assert(h.dims == Seq(("ni", 409L), ("nj", 5680L)))
      assert(h.attrs("id") == "AVHRR_SST_METOP_B-OSISAF-L2P-v1.0")
      assert(h.attrs("westernmost_longitude") == "-54.92")
      assert(h.attrs("northernmost_latitude") == "83.25")
      assert(h.attrs("scale") == "0.01")
      assert(h.attrs("flags") == "1, 2, 3")
      assert(h.attrs("rows") == "409")
    }
    // only the header is consumed: trailing variable data is untouched
    val withData = bytes(attrs) ++ Array.fill[Byte](1024)(7)
    assert(parse(withData).attrs("uuid") == "granule-x")
    // non-NetCDF bytes fail loudly
    intercept[java.io.IOException](parse("PARQUET1".getBytes))
  }

  test("CDF-5 attribute types decode instead of quarantining the granule") {
    import NetcdfClassic.{LongAttr, UByteAttr}
    val attrs = Seq(
      ("big_count", LongAttr(Seq(3000000000L, -1L))),
      ("mask", UByteAttr(Seq(0xff, 0x01, 0x80))),
      ("id", S("cdf5-granule")))
    val h = parse(bytes(attrs, version = 5))
    assert(h.version == 5)
    // int64 renders signed; ubyte renders UNSIGNED (0xff = 255)
    assert(h.attrs("big_count") == "3000000000, -1")
    assert(h.attrs("mask") == "255, 1, 128")
    assert(h.attrs("id") == "cdf5-granule")
  }

  test("CDF-5-only attribute types in a CDF-1 header fail loudly") {
    // the writer refuses nc_type 7-11 below version 5; the reader must
    // enforce the same bound — a CDF-1 header carrying NC_INT64 is
    // corrupt and must quarantine, not parse silently
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBytes("CDF"); out.writeByte(1)
    out.writeInt(0) // numrecs
    out.writeInt(0); out.writeInt(0) // ABSENT dim_list
    out.writeInt(0x0C); out.writeInt(1) // one global attr
    out.writeInt(1); out.writeByte('x'); out.write(Array[Byte](0, 0, 0))
    out.writeInt(10) // NC_INT64 — CDF-5 only
    out.writeInt(1)
    out.writeLong(42L)
    out.flush()
    val e = intercept[java.io.IOException](parse(bos.toByteArray))
    assert(e.getMessage.contains("CDF-5 only"), e.getMessage)
  }

  test("corrupt length words surface as IOException, never as crashes") {
    // valid magic + numrecs, then a dim_list whose name-length word
    // reads as a negative int (0xFFFFFF00): must be the quarantinable
    // IOException, not NegativeArraySizeException / OOM
    val negLen = Array[Byte]('C', 'D', 'F', 1,
      0, 0, 0, 0, // numrecs
      0, 0, 0, 0x0A, // NC_DIMENSION
      0, 0, 0, 1, // one dim
      0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0x00) // name length < 0
    intercept[java.io.IOException](parse(negLen))
    // a huge positive length must be rejected BEFORE allocation
    val hugeLen = Array[Byte]('C', 'D', 'F', 1,
      0, 0, 0, 0,
      0, 0, 0, 0x0A,
      0, 0, 0, 1,
      0x7F.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte) // ~2 GB name
    intercept[java.io.IOException](parse(hugeLen))
  }

  test("NetCDF granules glob -> attrs -> items end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nc").toString
    def granule(i: Int, w: String): Seq[(String, AttrVal)] = Seq(
      ("id", S("AVHRR_SST_METOP_B-OSISAF-L2P-v1.0")),
      ("uuid", S(f"granule-nc-$i%03d")),
      ("westernmost_longitude", S(w)),
      ("southernmost_latitude", S("-60.0")),
      ("easternmost_longitude", S("5.5")),
      ("northernmost_latitude", S("70.25")),
      ("time_coverage_start", S(f"2022-05-01T00:0$i%d:03")),
      ("time_coverage_end", S(f"2022-05-01T00:0$i%d:59")))
    writeFile(s"$dir/g1.nc", granule(1, "-54.92"))
    writeFile(s"$dir/g2.nc", granule(2, "-10.5"), version = 2)
    writeFile(s"$dir/g3.nc", granule(3, "not-a-number")) // quarantined
    // a corrupt file must quarantine, not kill the job
    val f = new FileOutputStream(s"$dir/broken.nc")
    try f.write("HDF5-ish-gibberish".getBytes) finally f.close()

    val src = new NetcdfGranuleSource(s"file:$dir/*.nc")
    val (items, errors) = ItemAssembly.assemble(src.granules(spark))
    val got = items.orderBy("item_id").collect()
    assert(got.length == 2)
    assert(got.map(_.getAs[String]("item_id")).toSeq ==
      Seq("granule-nc-001", "granule-nc-002"))
    assert(got.head.getAs[Double]("bbox_w") == -54.92)
    assert(got.head.getAs[Double]("bbox_n") == 70.25)
    val errs = errors.collect()
    assert(errs.length == 2, "bad bbox + corrupt file both quarantined")
    assert(errs.exists(_.getAs[String]("source_url").endsWith("broken.nc")))
  }
}
