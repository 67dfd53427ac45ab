package graft

import org.apache.spark.sql.functions._

import graft.functions.SurrogateRepair
import graft.geometry.Geometry
import graft.ingest.ListingCache

class GeometrySpec extends SparkSpec {

  test("douglas-peucker drops collinear interior points") {
    val line = IndexedSeq((0.0, 0.0), (1.0, 0.00005), (2.0, 0.0),
      (3.0, 0.00008), (4.0, 0.0))
    val simp = Geometry.douglasPeucker(line, 0.001)
    assert(simp == IndexedSeq((0.0, 0.0), (4.0, 0.0)))
  }

  test("douglas-peucker keeps real corners") {
    val corner = IndexedSeq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0))
    assert(Geometry.douglasPeucker(corner, 0.001) == corner)
  }

  test("trajectory extraction: LineString, Point degenerate, dedupe") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.0, 1.0, 2.0, 3.0), Seq(0.0, 0.0, 0.0, 1.0)), // polyline
      (2L, Seq(5.0, 5.0, 5.0), Seq(6.0, 6.0, 6.0)), // all-same → Point
      (3L, Seq(7.0), Seq(8.0)) // single
    ).toDF("id", "lon", "lat")
      .select(col("id"),
        Geometry.extractTrajectory(0.001)(col("lon"), col("lat")).as("g"))
      .select("id", "g.geo_type", "g.geometry", "g.n_points_out",
        "g.bbox_w", "g.bbox_n")
    val rows = df.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getString(2), r.getInt(3))).toMap
    assert(rows(1L)._1 == "LineString")
    assert(rows(1L)._3 == 3, "collinear interior point dropped")
    assert(rows(2L)._1 == "Point")
    assert(rows(2L)._2 == """{"type":"Point","coordinates":[5.0,6.0]}""")
    assert(rows(3L)._1 == "Point")
  }

  test("NaN/Infinity fill values are dropped before geometry assembly") {
    import spark.implicits._
    val nan = Double.NaN
    val inf = Double.PositiveInfinity
    val df = Seq(
      // one NaN fill point inside an otherwise good track
      (1L, Seq(0.0, nan, 2.0, 3.0), Seq(0.0, nan, 0.5, 1.0)),
      // all points non-finite → Empty, not a NaN geometry
      (2L, Seq(nan, inf), Seq(nan, 1.0))
    ).toDF("id", "lon", "lat")
      .select(col("id"),
        Geometry.extractTrajectory(0.001)(col("lon"), col("lat")).as("g"))
      .select("id", "g.geo_type", "g.geometry", "g.bbox_w", "g.bbox_e",
        "g.n_points_in")
    val rows = df.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getString(2), r.getDouble(3), r.getDouble(4),
        r.getInt(5)))).toMap
    val (t1, geo1, w1, e1, n1) = rows(1L)
    assert(t1 == "LineString")
    // NaN is illegal JSON: the serialized Feature must stay parsable
    assert(!geo1.contains("NaN") && !geo1.contains("Infinity"), geo1)
    assert(!w1.isNaN && !e1.isNaN && w1 == 0.0 && e1 == 3.0)
    assert(n1 == 4, "input count still reports the raw length")
    assert(rows(2L)._1 == "Empty", "all-non-finite must quarantine")
  }

  test("surrogate repair restores surrogateescape bytes") {
    // Python surrogateescape: byte 0xE9 (latin-1 'é') → U+DCE9
    val broken = "caf" + '\udce9'
    assert(SurrogateRepair.repair(broken) == "café" ||
      SurrogateRepair.repair(broken) == "caf�")
    // 0xC3 0xA9 is valid UTF-8 'é' escaped as two surrogates
    val utf8Escaped = "caf" + '\udcc3' + '\udca9'
    assert(SurrogateRepair.repair(utf8Escaped) == "café")
    // clean strings (incl. valid astral pairs) pass through untouched
    val clean = "plain 🌊 text"
    assert(SurrogateRepair.repair(clean) == clean)
    assert(SurrogateRepair.repair(null) == null)
  }

  test("surrogate repair over map values (driver-side)") {
    // NOTE: lone surrogates cannot transit a Spark string column
    // (UTF8String mangles them to '?'), so the map form is exercised
    // directly; in-pipeline repair happens at the binary level below.
    val fixed = SurrogateRepair.repair("x" + '\udcc3' + '\udca9')
    assert(fixed == "xé")
  }

  test("binary decode-repair inside a Spark pipeline") {
    import spark.implicits._
    val damaged: Array[Byte] =
      "caf".getBytes("UTF-8") ++ Array(0xe9.toByte) // latin-1 'é'
    val valid: Array[Byte] = "café".getBytes("UTF-8")
    val df = Seq((1, damaged), (2, valid)).toDF("id", "raw")
      .select(col("id"), SurrogateRepair.decodeRepairUdf(col("raw")).as("s"))
    val rows = df.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows(1) == "café", s"latin-1 byte recovered: ${rows(1)}")
    assert(rows(2) == "café", "valid UTF-8 untouched")
  }

  test("listing cache: miss lists + writes, hit skips lister") {
    // scheme-qualified root: the probe must go through Hadoop
    // FileSystem (a java.nio probe on "file://..." always misses)
    val tmp = "file://" +
      java.nio.file.Files.createTempDirectory("graft-cache").toString
    var listerCalls = 0
    def lister(glob: String) = {
      import spark.implicits._
      listerCalls += 1
      Seq("u3", "u1", "u2").toDF("url")
    }
    val first = ListingCache
      .cachedListing(spark, "glob://pattern", tmp)(lister)
      .collect().map(_.getString(0))
    assert(first.sameElements(Array("u1", "u2", "u3")), "sorted listing")
    assert(listerCalls == 1)
    val second = ListingCache
      .cachedListing(spark, "glob://pattern", tmp)(lister)
      .collect().map(_.getString(0))
    assert(second.sameElements(first))
    assert(listerCalls == 1, "cache hit must not re-list")
    // different glob → different cache key
    ListingCache.cachedListing(spark, "glob://other", tmp)(lister)
    assert(listerCalls == 2)
  }

  test("storage options overlay the Hadoop conf without mutating it") {
    val base = spark.sparkContext.hadoopConfiguration
    val overlaid = ListingCache.confWith(base,
      Map("fs.s3a.endpoint" -> "https://object-store.example",
        "fs.s3a.access.key" -> "AKTEST"))
    assert(overlaid.get("fs.s3a.endpoint") == "https://object-store.example")
    assert(overlaid.get("fs.s3a.access.key") == "AKTEST")
    assert(base.get("fs.s3a.access.key") == null,
      "session-wide conf must stay untouched")
    assert(ListingCache.confWith(base, Map.empty) eq base)
    // a listing with options still works against file://
    val dir = java.nio.file.Files.createTempDirectory("graft-glob").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.nc"),
      Array[Byte](1))
    val urls = ListingCache.globListing(spark, s"file:$dir/*.nc",
      Map("fs.s3a.access.key" -> "AKTEST")).collect()
    assert(urls.length == 1)
  }

  test("glob listing over local filesystem") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-glob")
    Seq("a.nc", "b.nc", "c.txt").foreach { f =>
      java.nio.file.Files.writeString(tmp.resolve(f), "x")
    }
    val urls = ListingCache.globListing(spark, s"file:$tmp/*.nc")
      .collect().map(_.getString(0))
    assert(urls.length == 2)
    assert(urls.forall(_.endsWith(".nc")))
  }
}
