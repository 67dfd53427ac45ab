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

  test("exact intersects: the corner-region LineString false positive") {
    import Geometry._
    // the pgstac-parity case: a diagonal track whose bbox overlaps the
    // query box's corner region without the line ever entering the box
    val box = """{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]]]}"""
    // x+y=20.5 passes OUTSIDE the (10,10) corner; x+y=19 cuts inside it
    val missTrack =
      """{"type":"LineString","coordinates":[[9.5,11],[11,9.5]]}"""
    val hitTrack =
      """{"type":"LineString","coordinates":[[8,11],[11,8]]}"""
    def ix(a: String, b: String): Boolean = (for {
      ga <- parseGeoJson(a); gb <- parseGeoJson(b)
    } yield intersects(ga, gb)).getOrElse(fail(s"parse failed: $a / $b"))
    // bbox of missTrack is [8,8]-[11,11]: OVERLAPS the box bbox...
    assert(envelope(parseGeoJson(missTrack).get)._1 <= 10.0)
    // ...but the exact test says no (the line passes outside (10,10))
    assert(!ix(missTrack, box))
    // while the closer diagonal clips the corner and does intersect
    assert(ix(hitTrack, box))
    assert(ix(box, hitTrack)) // symmetric
  }

  test("exact intersects: points, containment, holes, touching") {
    import Geometry._
    def g(s: String) = parseGeoJson(s).get
    val box = g("""{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]]]}""")
    // boundary-inclusive: a point ON the edge intersects
    assert(intersects(g("""{"type":"Point","coordinates":[10,5]}"""), box))
    assert(intersects(g("""{"type":"Point","coordinates":[5,5]}"""), box))
    assert(!intersects(g("""{"type":"Point","coordinates":[10.01,5]}"""), box))
    // containment without edge crossings still intersects (both ways)
    val inner = g("""{"type":"Polygon","coordinates":[[[4,4],[6,4],[6,6],[4,6],[4,4]]]}""")
    assert(intersects(inner, box) && intersects(box, inner))
    // a line fully inside intersects; a line inside a HOLE does not
    val donut = g("""{"type":"Polygon","coordinates":[
      [[0,0],[10,0],[10,10],[0,10],[0,0]],
      [[3,3],[7,3],[7,7],[3,7],[3,3]]]}""".replaceAll("\\s", ""))
    assert(intersects(
      g("""{"type":"LineString","coordinates":[[1,1],[2,2]]}"""), donut))
    assert(!intersects(
      g("""{"type":"LineString","coordinates":[[4,4],[6,6]]}"""), donut))
    // crossing the hole's edge from inside it DOES intersect
    assert(intersects(
      g("""{"type":"LineString","coordinates":[[5,5],[5,12]]}"""), donut))
    // touching polygons (shared edge) intersect
    val east = g("""{"type":"Polygon","coordinates":[[[10,0],[20,0],[20,10],[10,10],[10,0]]]}""")
    assert(intersects(box, east))
    // disjoint polygons don't
    val far = g("""{"type":"Polygon","coordinates":[[[30,30],[40,30],[40,40],[30,40],[30,30]]]}""")
    assert(!intersects(box, far))
    // multi-geometries: any part suffices
    val multi = g("""{"type":"MultiPolygon","coordinates":[
      [[[30,30],[40,30],[40,40],[30,40],[30,30]]],
      [[[4,4],[6,4],[6,6],[4,6],[4,4]]]]}""".replaceAll("\\s", ""))
    assert(intersects(multi, box))
    // malformed input parses to None, predicate stays total
    assert(parseGeoJson("{\"type\":\"Weird\"}").isEmpty)
    assert(parseGeoJson("not json").isEmpty)
    // degenerate-but-well-formed geometries also parse to None — a
    // Geom with no points would crash envelope()/intersects later
    assert(parseGeoJson("""{"type":"MultiPolygon","coordinates":[]}""").isEmpty)
    assert(parseGeoJson("""{"type":"Polygon","coordinates":[[]]}""").isEmpty)
    assert(parseGeoJson(
      """{"type":"Polygon","coordinates":[[[0,0],[1,1]]]}""").isEmpty)
    assert(parseGeoJson("""{"type":"LineString","coordinates":[[0,0]]}""").isEmpty)
  }

  test("intersects search: exact predicate vs bbox search divergence") {
    import spark.implicits._
    import graft.catalog.CatalogQuery
    // items carrying LineString geometries: one clips the query box's
    // corner, one only bbox-overlaps it, one is far away
    val mk = Geometry.extractTrajectory(0.0)
    val items = Seq(
      ("hit", Seq(8.0, 11.0), Seq(11.0, 8.0)),
      ("bbox_only", Seq(9.5, 11.0), Seq(11.0, 9.5)),
      ("far", Seq(30.0, 40.0), Seq(30.0, 40.0))
    ).toDF("item_id", "lon", "lat")
      .withColumn("g", mk(col("lon"), col("lat")))
      .select(col("item_id"), col("g.geometry").as("geometry"),
        col("g.bbox_w").as("bbox_w"), col("g.bbox_s").as("bbox_s"),
        col("g.bbox_e").as("bbox_e"), col("g.bbox_n").as("bbox_n"))
    val queryBox = """{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]]]}"""
    val viaBbox = items.filter(
        col("bbox_w") <= 10.0 && col("bbox_e") >= 0.0 &&
          col("bbox_s") <= 10.0 && col("bbox_n") >= 0.0)
      .collect().map(_.getString(0)).toSet
    assert(viaBbox == Set("hit", "bbox_only"), "bbox overlap false-positives")
    val viaExact = items
      .filter(col("bbox_w") <= 10.0 && col("bbox_e") >= 0.0 &&
        col("bbox_s") <= 10.0 && col("bbox_n") >= 0.0)
      .filter(Geometry.intersectsUdf(col("geometry"), lit(queryBox)))
      .collect().map(_.getString(0)).toSet
    assert(viaExact == Set("hit"), "exact intersects rejects the corner miss")
    // and through the Search parameter end-to-end
    val viaSearch = CatalogQuery.compile(items,
      CatalogQuery.Search(intersects = Some(queryBox), limit = 10))
      .collect().map(_.getString(0)).toSet
    assert(viaSearch == Set("hit"))
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
