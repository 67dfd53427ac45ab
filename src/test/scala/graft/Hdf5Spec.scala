package graft

import java.io.{ByteArrayInputStream, DataInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets

import graft.ingest.{Hdf5Header, NetcdfClassic, NetcdfGranuleSource, Szip}

/** HDF5 root-attribute reader: writer round-trips (fixed + vlen
  * strings, numerics), hand-built v2/OHDR and v3-attribute fixtures,
  * corrupt-input quarantine, and the granule-source e2e that mixes
  * HDF5 and classic files under one glob. */
class Hdf5Spec extends SparkSpec {
  import NetcdfClassic._

  private def parse(b: Array[Byte]): Map[String, String] =
    Hdf5Header.readRootAttrs(new DataInputStream(new ByteArrayInputStream(b)))

  private val granuleAttrs: Seq[(String, AttrValue)] = Seq(
    ("id", CharAttr("AVHRR_SST_METOP_B-OSISAF-L2P-v1.0")),
    ("uuid", CharAttr("granule-h5-001")),
    ("westernmost_longitude", CharAttr("-85.0")),
    ("southernmost_latitude", CharAttr("-60.0")),
    ("easternmost_longitude", CharAttr("85.0")),
    ("northernmost_latitude", CharAttr("60.0")),
    ("time_coverage_start", CharAttr("2022-05-01T00:01:03")),
    ("time_coverage_end", CharAttr("2022-05-01T00:03:59")))

  test("fixed-string and numeric attrs round-trip through superblock v0") {
    val attrs = granuleAttrs ++ Seq(
      ("resolution", DoubleAttr(0.05)),
      ("scale", FloatAttr(1.5f)),
      ("bands", IntAttr(Seq(1, 2, 3))),
      ("flag", ShortAttr(7.toShort)),
      ("big_count", LongAttr(Seq(3000000000L, -1L))),
      ("mask", UByteAttr(Seq(0xff, 0x01, 0x80))))
    val got = parse(Hdf5Header.buildFile(attrs))
    assert(got("id") == "AVHRR_SST_METOP_B-OSISAF-L2P-v1.0")
    assert(got("uuid") == "granule-h5-001")
    assert(got("time_coverage_start") == "2022-05-01T00:01:03")
    assert(got("resolution") == "0.05")
    assert(got("scale") == "1.5")
    assert(got("bands") == "1, 2, 3")
    assert(got("flag") == "7")
    assert(got("big_count") == "3000000000, -1")
    assert(got("mask") == "255, 1, 128")
  }

  test("vlen string attrs resolve through the global heap") {
    // netcdf-c stores NC_STRING attrs as vlen + global heap; NC_CHAR
    // as fixed strings — both must parse to the same values
    val fixed = parse(Hdf5Header.buildFile(granuleAttrs))
    val vlen = parse(Hdf5Header.buildFile(granuleAttrs, vlenStrings = true))
    assert(vlen == fixed)
    assert(vlen("uuid") == "granule-h5-001")
  }

  test("superblock v2 + OHDR object header + v3 attribute parse") {
    // hand-built "latest format" file: superblock v2 (root addr at
    // offset 36) pointing at an OHDR v2 header holding one v3
    // attribute (uuid = 'ohdr-granule'); checksums are zeros (the
    // reader does not verify them)
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = { u16(v.toInt); u16((v >> 16).toInt) }
    def u64(v: Long): Unit = { u32(v); u32(v >> 32) }
    bos.write(Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    u8(2) // superblock v2
    u8(8); u8(8) // offset/length sizes
    u8(0) // consistency flags
    u64(0L) // base
    u64(-1L) // extension
    u64(200L) // eof
    u64(48L) // ROOT object header address
    u32(0L) // superblock checksum (unverified)
    // OHDR at 48
    val name = "uuid".getBytes(StandardCharsets.UTF_8) :+ 0.toByte
    val value = "ohdr-granule".getBytes(StandardCharsets.UTF_8)
    // v3 attr body: ver,flags,name size,dt size,ds size,encoding,
    // then name/dt/ds/data UNPADDED
    val attrBody = 9 + name.length + 8 + 8 + value.length
    val chunk0 = 4 + attrBody + 4 // msg header + body + checksum
    bos.write("OHDR".getBytes(StandardCharsets.US_ASCII))
    u8(2) // version
    u8(0x00) // flags: 1-byte chunk0 size, no times, no phase change
    u8(chunk0)
    u8(0x0C); u16(attrBody); u8(0) // message: type, size, flags
    u8(3); u8(0) // attribute v3, no sharing
    u16(name.length); u16(8); u16(8)
    u8(0) // name encoding: ASCII
    bos.write(name)
    // datatype: fixed string of value.length
    u8(0x13); u8(0); u8(0); u8(0); u32(value.length.toLong)
    // dataspace v2 scalar: version,rank,flags,type(scalar=0)... v2 is
    // version(1) rank(1) flags(1) type(1)
    u8(2); u8(0); u8(0); u8(0); u32(0L) // pad to declared 8 bytes
    bos.write(value)
    u32(0L) // chunk checksum (unverified)
    val got = parse(bos.toByteArray)
    assert(got == Map("uuid" -> "ohdr-granule"))
  }

  test("dense-group link storage: corrupt heap quarantines, never crashes") {
    // hand-built superblock v2 + OHDR root whose only message is a
    // Link Info with a DEFINED fractal-heap address pointing at
    // nothing — the dense path must quarantine as IOException, not
    // crash or silently yield an empty variable list.
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = { u16(v.toInt); u16((v >> 16).toInt) }
    def u64(v: Long): Unit = { u32(v); u32(v >> 32) }
    bos.write(Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    u8(2) // superblock v2
    u8(8); u8(8) // offset/length sizes
    u8(0) // consistency flags
    u64(0L) // base
    u64(-1L) // extension
    u64(200L) // eof
    u64(48L) // ROOT object header address
    u32(0L) // superblock checksum (unverified)
    // OHDR at 48: one Link Info message — version, flags (no creation
    // index), fractal heap address (DEFINED), name-index b-tree (undef)
    val body = 1 + 1 + 8 + 8
    val chunk0 = 4 + body + 4
    bos.write("OHDR".getBytes(StandardCharsets.US_ASCII))
    u8(2) // object header version
    u8(0x00) // flags: 1-byte chunk0 size
    u8(chunk0)
    u8(0x02); u16(body); u8(0) // message: LINK_INFO, size, flags
    u8(0); u8(0) // link-info version 0, flags 0
    u64(0x1000L) // fractal heap address: defined ⇒ dense storage
    u64(-1L) // name-index b-tree: undefined
    u32(0L) // chunk checksum (unverified)
    intercept[java.io.IOException](Hdf5Header.readFile(bos.toByteArray))
  }

  test("dense groups round-trip: root direct block, depth-0 name index") {
    import Hdf5Header.FixtureVar
    // 10 links (past libhdf5's compact threshold of 8) fitting one
    // 512-byte direct block and one B-tree leaf
    val vars = (0 until 10).map { i =>
      FixtureVar(f"VAR_$i%02d", Seq(6L),
        Array.tabulate(6)(j => i * 10.0 + j),
        attrs = Seq(("units", CharAttr(s"u$i"))))
    }
    val bytes = Hdf5Header.buildDataFile(granuleAttrs, vars,
      denseLinks = true)
    val f = Hdf5Header.readFile(bytes)
    // root attrs unaffected by the dense group structure
    assert(f.rootAttrs("uuid") == "granule-h5-001")
    assert(f.datasetNames == vars.map(_.name))
    vars.foreach { v =>
      val d = f.dataset(v.name)
      assert(d.data.toSeq == v.values.toSeq, v.name)
      assert(d.attrs("units") == v.attrs.head._2
        .asInstanceOf[CharAttr].v)
    }
  }

  test("dense groups round-trip: indirect root + depth-1 name index") {
    import Hdf5Header.FixtureVar
    // 50 links: objects overflow several 512-byte blocks (root
    // becomes an indirect block) and 50 > leaf capacity (the name
    // index gains an internal root whose own records must be
    // enumerated too — a v2 B-tree stores records at every level)
    val vars = (0 until 50).map { i =>
      FixtureVar(f"LONG_VARIABLE_NAME_$i%03d", Seq(4L),
        Array.tabulate(4)(j => i * 100.0 + j),
        chunks = if (i % 2 == 0) Some(Seq(2L)) else None,
        deflate = i % 2 == 0, shuffle = i % 2 == 0)
    }
    val bytes = Hdf5Header.buildDataFile(granuleAttrs, vars,
      denseLinks = true)
    val f = Hdf5Header.readFile(bytes)
    assert(f.datasetNames == vars.map(_.name))
    vars.foreach { v =>
      assert(f.dataset(v.name).data.toSeq == v.values.toSeq, v.name)
    }
    // flipping the FRHP signature quarantines loudly
    val corrupt = bytes.clone()
    val frhp = {
      val s = "FRHP".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      (0 until corrupt.length - 4).find(i =>
        corrupt(i) == s(0) && corrupt(i + 1) == s(1) &&
          corrupt(i + 2) == s(2) && corrupt(i + 3) == s(3)).get
    }
    corrupt(frhp) = 'X'.toByte
    intercept[java.io.IOException](Hdf5Header.readFile(corrupt))
  }

  test("corrupt HDF5 input quarantines as IOException, never crashes") {
    // truncated signature
    intercept[java.io.IOException](parse("HDF".getBytes))
    // valid signature, unsupported superblock version
    val badVer = Hdf5Header.buildFile(granuleAttrs).clone()
    badVer(8) = 7
    intercept[java.io.IOException](parse(badVer))
    // root address pointing past the probe: bounds error, not OOM
    val badAddr = Hdf5Header.buildFile(granuleAttrs).clone()
    badAddr(64) = 0xff.toByte; badAddr(65) = 0xff.toByte
    badAddr(66) = 0x7f.toByte
    intercept[java.io.IOException](parse(badAddr))
    // corrupt attribute count / message overrun
    val badMsg = Hdf5Header.buildFile(granuleAttrs).clone()
    badMsg(96 + 2) = 0x40.toByte // claim 64 messages in the v1 header
    intercept[java.io.IOException](parse(badMsg))
  }

  test("contiguous variables round-trip with dims, values, and attrs") {
    import Hdf5Header.FixtureVar
    val lon = Array.tabulate(12)(i => -85.0 + i * 0.5)
    val bytes = Hdf5Header.buildDataFile(
      granuleAttrs,
      Seq(FixtureVar("LONGITUDE", Seq(12L), lon,
        attrs = Seq(("units", CharAttr("degrees_east")),
          ("valid_range", IntAttr(Seq(-180, 180)))))))
    val f = Hdf5Header.readFile(bytes)
    // root attrs unaffected by the richer group structure
    assert(f.rootAttrs("uuid") == "granule-h5-001")
    assert(f.datasetNames == Seq("LONGITUDE"))
    val ds = f.dataset("LONGITUDE")
    assert(ds.dims == Seq(12L))
    assert(ds.data.toSeq == lon.toSeq)
    assert(ds.attrs("units") == "degrees_east")
    assert(ds.attrs("valid_range") == "-180, 180")
    intercept[java.io.IOException](f.dataset("LATITUDE"))
  }

  test("chunked + shuffle + deflate 2-D data reassembles, edge chunks clip") {
    import Hdf5Header.FixtureVar
    // 7×5 grid in 4×3 chunks: a 2×2 chunk grid with both edges partial
    val vals = Array.tabulate(35)(i => (i * 31 % 97).toDouble - 40)
    val bytes = Hdf5Header.buildDataFile(
      granuleAttrs,
      Seq(
        FixtureVar("sst", Seq(7L, 5L), vals, dtype = "i4",
          chunks = Some(Seq(4L, 3L)), deflate = true, shuffle = true),
        FixtureVar("quality", Seq(7L, 5L), vals.map(v => (v.toInt % 5).toDouble),
          dtype = "i2", chunks = Some(Seq(7L, 5L)))))
    val f = Hdf5Header.readFile(bytes)
    assert(f.datasetNames.sorted == Seq("quality", "sst"))
    assert(f.dataset("sst").data.toSeq == vals.toSeq)
    assert(f.dataset("quality").data.toSeq ==
      vals.map(v => (v.toInt % 5).toDouble).toSeq)
  }

  test("fletcher32 chunks verify and strip; corrupted chunks quarantine") {
    import Hdf5Header.FixtureVar
    val vals = Array.tabulate(40)(i => -10.0 + i * 0.75)
    // the full netcdf filter stack: shuffle → deflate → fletcher32
    // (checksum over the compressed bytes, as libhdf5 writes it)
    val bytes = Hdf5Header.buildDataFile(
      granuleAttrs,
      Seq(FixtureVar("V", Seq(40L), vals, chunks = Some(Seq(16L)),
        deflate = true, shuffle = true, fletcher = true)))
    val got = Hdf5Header.readFile(bytes).dataset("V")
    assert(got.data.toSeq == vals.toSeq)
    // fletcher32 alone (odd-length chunk bytes exercise the trailing-
    // byte fold): i1 elements make a 16-byte chunk → use 15 elems
    val odd = Array.tabulate(15)(i => (i - 7).toDouble)
    val b2 = Hdf5Header.buildDataFile(
      granuleAttrs,
      Seq(FixtureVar("W", Seq(15L), odd, dtype = "i1",
        chunks = Some(Seq(5L)), fletcher = true)))
    assert(Hdf5Header.readFile(b2).dataset("W").data.toSeq == odd.toSeq)
    // flip one raw-data byte: the checksum must catch it as a loud
    // quarantine, not a silent wrong value
    val corrupt = bytes.clone()
    val tail = corrupt.length - 30 // inside the last chunk's payload
    corrupt(tail) = (corrupt(tail) ^ 0x5a).toByte
    val e = intercept[java.io.IOException](
      Hdf5Header.readFile(corrupt).dataset("V"))
    assert(e.getMessage.contains("fletcher32"),
      s"expected a fletcher32 mismatch, got: ${e.getMessage}")
  }

  test("unwritten all-fill chunks reconstitute from the fill value") {
    import Hdf5Header.FixtureVar
    // second half of the variable is pure fill ⇒ netcdf lazy
    // allocation never writes that chunk; the reader must fill it
    val vals = Array.tabulate(16)(i => if (i < 8) i.toDouble else -999.0)
    val bytes = Hdf5Header.buildDataFile(
      granuleAttrs,
      Seq(FixtureVar("TIME", Seq(16L), vals, dtype = "f8",
        chunks = Some(Seq(8L)), deflate = true, fill = Some(-999.0))))
    val ds = Hdf5Header.readFile(bytes).dataset("TIME")
    assert(ds.data.toSeq == vals.toSeq)
  }

  test("corrupt dataset structures quarantine as IOException") {
    import Hdf5Header.FixtureVar
    val good = Hdf5Header.buildDataFile(granuleAttrs,
      Seq(FixtureVar("v", Seq(4L), Array(1.0, 2, 3, 4),
        chunks = Some(Seq(2L)), deflate = true)))
    // corrupt the chunk B-tree signature (first TREE after the group's)
    def indexOfTree(b: Array[Byte], from: Int): Int = {
      val sig = "TREE".getBytes
      (from until b.length - 4).find(i => sig.indices.forall(j =>
        b(i + j) == sig(j))).getOrElse(-1)
    }
    val g1 = indexOfTree(good, 0)
    val chunkTree = indexOfTree(good, g1 + 4)
    assert(chunkTree > 0)
    val bad = good.clone(); bad(chunkTree) = 'X'.toByte
    intercept[java.io.IOException](
      Hdf5Header.readFile(bad).dataset("v"))
    // truncated deflate stream
    val short = java.util.Arrays.copyOf(good, good.length - 3)
    intercept[java.io.IOException](
      Hdf5Header.readFile(short).dataset("v"))
    // root attrs still parse from the intact head either way
    assert(Hdf5Header.readFile(bad).rootAttrs("uuid") == "granule-h5-001")
  }

  test("netcdf4 trajectory variables drive extract_geometry end-to-end") {
    import Hdf5Header.FixtureVar
    import org.apache.spark.sql.functions._
    // the insitu shape (recipe.py:91-93): LONGITUDE/LATITUDE/TIME 1-D
    // coordinate variables, netcdf-chunked and compressed
    val n = 48
    val lon = Array.tabulate(n)(i => -40.0 + i * 0.25)
    val lat = Array.tabulate(n)(i => 10.0 + (if (i < 24) 0.0 else (i - 23) * 0.1))
    val time = Array.tabulate(n)(i => 8000.0 + i / 24.0)
    val dir = java.nio.file.Files.createTempDirectory("graft-h5v").toString
    val bytes = Hdf5Header.buildDataFile(
      Seq(("id", CharAttr("GL_TS_DB_FIXTURE"))),
      Seq(
        FixtureVar("LONGITUDE", Seq(n.toLong), lon,
          chunks = Some(Seq(16L)), deflate = true, shuffle = true),
        FixtureVar("LATITUDE", Seq(n.toLong), lat,
          chunks = Some(Seq(16L)), deflate = true, shuffle = true),
        FixtureVar("TIME", Seq(n.toLong), time,
          attrs = Seq(("units", CharAttr("days since 1950-01-01"))))))
    val path = s"$dir/traj.nc"
    val fo = new FileOutputStream(path)
    try fo.write(bytes) finally fo.close()
    // read back THROUGH the file and build the geometry the way
    // InsituAssembly does
    val f = Hdf5Header.readFile(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    assert(f.dataset("TIME").attrs("units") == "days since 1950-01-01")
    import spark.implicits._
    val df = Seq((f.dataset("LONGITUDE").data.toSeq,
      f.dataset("LATITUDE").data.toSeq)).toDF("lon", "lat")
    val g = df.select(
      graft.geometry.Geometry.extractTrajectory(0.001)(col("lon"), col("lat"))
        .as("g")).select("g.geo_type", "g.n_points_in", "g.n_points_out")
      .first()
    assert(g.getString(0) == "LineString")
    assert(g.getInt(1) == n)
    // Douglas-Peucker collapses the two straight runs to ~3 points
    assert(g.getInt(2) <= 4)
  }

  test("real netcdf4 platform files run the insitu vertical end-to-end") {
    val rows = graft.operators.SourceSinkQueries
      .srcInsituNetcdf4(spark, "").collect()
    // three categories → three derived collections
    assert(rows.map(_.getString(0)).toSeq == Seq("BO", "DB", "TS").map(c =>
      s"INSITU_GLO_PHYBGCWAV_DISCRETE_MYNRT_013_030-$c"))
    val byCat = rows.map(r => r.getString(0).split("-").last ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    // BO: 3 platforms, one moored (all-same-point → Point)
    assert(byCat("BO") == ((3L, 2L, 1L, 1L)))
    // DB: the truncated granule quarantines → 2 survivors
    assert(byCat("DB") == ((2L, 2L, 0L, 1L)))
    assert(byCat("TS") == ((3L, 3L, 0L, 1L)))
    // CF time decoded: 2022-05-01 in days-since-1950
    val t0 = rows.map(_.getTimestamp(4)).min
    assert(t0 == java.sql.Timestamp.valueOf("2022-05-01 00:00:00"))
  }

  test("CF time unit forms parse; junk calendars degrade to no datetimes") {
    import graft.ingest.Hdf5InsituSource.cfEpoch
    val day = 86400L * 1000000L
    assert(cfEpoch("days since 1950-01-01").contains((day, -631152000000000L)))
    assert(cfEpoch("hours since 1970-01-01T00:00:00Z")
      .contains((3600L * 1000000L, 0L)))
    assert(cfEpoch("seconds since 1970-01-01 00:00:00")
      .contains((1000000L, 0L)))
    assert(cfEpoch("Days Since 2000-01-01").isDefined)
    // non-zero-padded spellings real archives carry must parse, not
    // silently drop every timestamp of the granule
    assert(cfEpoch("days since 1950-1-1").contains((day, -631152000000000L)))
    assert(cfEpoch("hours since 1800-01-01 00:00:0.0").isDefined)
    assert(cfEpoch("seconds since 1970-1-1 0:0:0")
      .contains((1000000L, 0L)))
    // explicit offsets still honored, not truncated
    assert(cfEpoch("hours since 1970-01-01T02:00:00+02:00")
      .contains((3600L * 1000000L, 0L)))
    // invalid month/day: unrecognized, not wrong
    assert(cfEpoch("days since 1970-13-01").isEmpty)
    assert(cfEpoch("fortnights since 1970-01-01").isEmpty)
    assert(cfEpoch("days since the beginning").isEmpty)
    assert(cfEpoch("").isEmpty)
  }

  test("HDF5 and classic granules mix under one glob end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5").toString
    def gAttrs(i: Int): Seq[(String, AttrValue)] = Seq(
      ("id", CharAttr("AVHRR_SST_METOP_B-OSISAF-L2P-v1.0")),
      ("uuid", CharAttr(f"granule-mix-$i%03d")),
      ("westernmost_longitude", CharAttr((i * 7 % 170 - 85).toString)),
      ("southernmost_latitude", CharAttr((i * 5 % 120 - 60).toString)),
      ("easternmost_longitude", CharAttr((i * 7 % 170 - 75).toString)),
      ("northernmost_latitude", CharAttr((i * 5 % 120 - 52).toString)),
      ("time_coverage_start", CharAttr(f"2022-05-01T${i % 24}%02d:01:03")),
      ("time_coverage_end", CharAttr(f"2022-05-01T${i % 24}%02d:03:59")))
    (0 until 6).foreach { i =>
      val bytes =
        if (i % 2 == 0) Hdf5Header.buildFile(gAttrs(i), vlenStrings = i == 4)
        else NetcdfClassic.buildHeader(gAttrs(i),
          dims = Seq(("ni", 409L), ("nj", 5680L)), version = 1)
      val f = new FileOutputStream(s"$dir/g$i.nc")
      try f.write(bytes) finally f.close()
    }
    val src = new NetcdfGranuleSource(s"file:$dir/*.nc")
    val rows = src.granules(spark).collect()
    assert(rows.length == 6)
    val uuids = rows.map(_.getAs[String]("uuid")).sorted.toSeq
    assert(uuids == (0 until 6).map(i => f"granule-mix-$i%03d"))
    // item assembly consumes both formats identically
    val (items, quarantined) =
      graft.catalog.ItemAssembly.assemble(src.granules(spark))
    assert(items.count() == 6 && quarantined.count() == 0)
  }

  test("szip chunks decode end-to-end through the HDF5 reader") {
    import Hdf5Header.FixtureVar
    // f4 (32-bit samples): smooth ramp + flat stretches — the NN
    // predictor's home turf — across several chunks, one partial
    val vals = Array.tabulate(50)(i =>
      if (i < 20) 10.0f + i * 0.5f else if (i < 35) 17.5f else i * 1.0f)
      .map(_.toDouble)
    val bytes = Hdf5Header.buildDataFile(
      granuleAttrs,
      Seq(FixtureVar("SST", Seq(50L), vals, dtype = "f4",
        chunks = Some(Seq(16L)), szip = true)))
    assert(Hdf5Header.readFile(bytes).dataset("SST").data.toSeq ==
      vals.map(_.toFloat.toDouble).toSeq)
    // i2 (16-bit samples) with the szip → fletcher32 stack libhdf5
    // writes when both are enabled (checksum over compressed bytes)
    val iv = Array.tabulate(30)(i => ((i * 37) % 1000 - 500).toDouble)
    val b2 = Hdf5Header.buildDataFile(
      granuleAttrs,
      Seq(FixtureVar("QC", Seq(30L), iv, dtype = "i2",
        chunks = Some(Seq(10L)), szip = true, fletcher = true)))
    assert(Hdf5Header.readFile(b2).dataset("QC").data.toSeq == iv.toSeq)
    // i1 (8-bit samples, 3-bit option IDs)
    val bv = Array.tabulate(24)(i => ((i % 5) - 2).toDouble)
    val b3 = Hdf5Header.buildDataFile(
      granuleAttrs,
      Seq(FixtureVar("FLAG", Seq(24L), bv, dtype = "i1",
        chunks = Some(Seq(24L)), szip = true)))
    assert(Hdf5Header.readFile(b3).dataset("FLAG").data.toSeq == bv.toSeq)
    // the Rice stream itself carries no checksum — integrity comes
    // from the fletcher32 stage, which must catch a flipped byte in
    // the compressed payload as a loud quarantine
    val corrupt = b2.clone()
    val t = corrupt.length - 10
    corrupt(t) = (corrupt(t) ^ 0x77).toByte
    val e = intercept[java.io.IOException](
      Hdf5Header.readFile(corrupt).dataset("QC"))
    assert(e.getMessage.contains("fletcher32") ||
      e.getMessage.contains("szip"), e.getMessage)
  }

  test("szip decoder matches hand-built CCSDS 121 spec vectors") {
    // bit-string helper: the strings below ARE the spec derivation
    def bits(s: String): Array[Byte] = {
      val b = s.replaceAll("\\s", "")
      val out = new Array[Byte]((b.length + 7) / 8)
      b.zipWithIndex.foreach { case (c, i) =>
        if (c == '1') out(i / 8) = (out(i / 8) | (0x80 >> (i % 8))).toByte
      }
      out
    }
    val ec8 = Szip.Params(Szip.Raw | Szip.LSB | Szip.EC, 8, 8, 16)
    // EC mode, n=8 (3-bit IDs), J=8, one 16-sample scanline.
    // Block 1 split k=1 (ID 2): samples 3,0,1,2,7,7,7,7 →
    //   FS of v>>1 = 1,0,0,1,3,3,3,3 then the k=1 LSBs 1,0,1,0,1,1,1,1
    // Block 2 zero-block (ID 0, selector 0, run 1 → FS 0)
    val vecA = bits("010  01 1 1 01 0001 0001 0001 0001  10101111  000 0 1")
    assert(Szip.decode(vecA, ec8, 16).toSeq ==
      Seq[Byte](3, 0, 1, 2, 7, 7, 7, 7, 0, 0, 0, 0, 0, 0, 0, 0))
    // NN mode, one block with a reference sample. Samples
    // 100,101,99,100,100,100,100,100 → ref 100 raw, mapped deltas
    // 2,3,2,0,0,0,0 FS-coded (k=0, ID 1)
    val nn8 = Szip.Params(Szip.Raw | Szip.LSB | Szip.NN, 8, 8, 8)
    val vecB = bits("001  01100100  001 0001 001 1 1 1 1")
    assert(Szip.decode(vecB, nn8, 8).toSeq ==
      Seq[Byte](100, 101, 99, 100, 100, 100, 100, 100))
    // ROS: 64-sample scanline, block 1 uncompressed (ID 7), then a
    // zero run coded ROS (FS value 4 → z=5 → rest of segment)
    val ec64 = Szip.Params(Szip.Raw | Szip.LSB | Szip.EC, 8, 8, 64)
    val vecC = bits("111 00001010 00010100 00011110 00101000" +
      " 00110010 00111100 01000110 01010000  000 0 00001")
    val gotC = Szip.decode(vecC, ec64, 64).toSeq
    assert(gotC.take(8) == Seq[Byte](10, 20, 30, 40, 50, 60, 70, 80))
    assert(gotC.drop(8).forall(_ == 0))
    // second extension: pairs (1,0),(0,1),(2,0),(0,0) → interleaved
    // m = g(g+1)/2 + d2 with g = d1+d2 → 1, 2, 3, 0, FS-coded after
    // ID 0 + selector 1
    val vecD = bits("000 1  01 001 0001 1")
    assert(Szip.decode(vecD, Szip.Params(Szip.Raw | Szip.LSB | Szip.EC,
      8, 8, 8), 8).toSeq == Seq[Byte](1, 0, 0, 1, 2, 0, 0, 0))
    // truncation and zero-floods quarantine with loud messages
    intercept[java.io.IOException](Szip.decode(Array[Byte](0x20), ec8, 16))
    intercept[java.io.IOException](
      Szip.decode(new Array[Byte](16 * 1024), nn8, 8))
  }
}
