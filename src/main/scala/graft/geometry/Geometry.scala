package graft.geometry

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Geometry without a geo library (SURVEY.md §7.2 risk 3): everything
  * is GeoJSON strings + bbox scalars. Covers the reference's
  * `extract_geometry(ds, tolerance=0.001, ...)` (insitu recipe.py:91-93,
  * backed by shapely simplify) and `shapely.box` → GeoJSON polygon
  * (avhrr recipe.py:58-59).
  */
object Geometry {

  /** bbox → GeoJSON Polygon ring as a pure expression (no UDF). */
  def bboxPolygon(w: Column, s: Column, e: Column, n: Column): Column =
    format_string(
      "{\"type\":\"Polygon\",\"coordinates\":[[[%s,%s],[%s,%s],[%s,%s],[%s,%s],[%s,%s]]]}",
      w, s, e, s, e, n, w, n, w, s)

  /** Douglas-Peucker polyline simplification (tolerance in degrees,
    * matching shapely's `simplify(0.001)` call in the reference).
    * Self-contained, iterative (explicit stack — no recursion depth
    * limit on long trajectories). */
  def douglasPeucker(
      pts: IndexedSeq[(Double, Double)],
      eps: Double): IndexedSeq[(Double, Double)] = {
    if (pts.length < 3) return pts
    val keep = new Array[Boolean](pts.length)
    keep(0) = true
    keep(pts.length - 1) = true
    val stack = scala.collection.mutable.Stack((0, pts.length - 1))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.pop()
      if (hi - lo > 1) {
        val (x1, y1) = pts(lo)
        val (x2, y2) = pts(hi)
        val dx = x2 - x1
        val dy = y2 - y1
        val len = math.hypot(dx, dy)
        var maxD = -1.0
        var maxI = -1
        var i = lo + 1
        while (i < hi) {
          val (px, py) = pts(i)
          val d =
            if (len == 0) math.hypot(px - x1, py - y1)
            else math.abs(dy * (px - x1) - dx * (py - y1)) / len
          if (d > maxD) { maxD = d; maxI = i }
          i += 1
        }
        if (maxD > eps) {
          keep(maxI) = true
          stack.push((lo, maxI))
          stack.push((maxI, hi))
        }
      }
    }
    pts.indices.collect { case i if keep(i) => pts(i) }
  }

  /** Trajectory geometry extraction: lon/lat arrays → simplified
    * GeoJSON (Point when degenerate, LineString otherwise) + bbox.
    * Mirrors stac_insitu.geometry.extract_geometry semantics as called
    * at insitu recipe.py:91-93: dedupe consecutive points, simplify
    * with ε, degenerate → Point. UDF: per-row local O(n) work. */
  case class ExtractedGeom(
      geo_type: String,
      geometry: String,
      bbox_w: Double,
      bbox_s: Double,
      bbox_e: Double,
      bbox_n: Double,
      n_points_in: Int,
      n_points_out: Int)

  // ---- exact ST_Intersects (SURVEY §7.3 divergence closed) ----
  //
  // pgstac's GiST search (docker-compose.yml:30-44) evaluates true
  // ST_Intersects; bbox overlap alone false-positives whenever a
  // LineString crosses only the corner REGION of a query box. The
  // exact predicate below implements the standard computational-
  // geometry tests (orientation/segment intersection, boundary-
  // inclusive ray-cast point-in-polygon) over the GeoJSON subset this
  // module itself emits: Point, LineString, Polygon (+ Multi* and
  // holes). STAC `bbox` search stays bbox-only by spec; `intersects`
  // search runs the bbox prefilter (pushdown-able) THEN this exact
  // test on the candidates — the PostGIS index-then-recheck shape.

  sealed trait Geom
  case class GPoint(x: Double, y: Double) extends Geom
  case class GLine(pts: IndexedSeq[(Double, Double)]) extends Geom
  /** head ring = outer boundary, tail = holes. */
  case class GPolygon(rings: IndexedSeq[IndexedSeq[(Double, Double)]])
      extends Geom
  case class GMulti(parts: IndexedSeq[Geom]) extends Geom

  /** Minimal GeoJSON geometry parser (Jackson ships with Spark).
    * Malformed/unsupported input → None: a dirty geometry row must
    * filter out of a search, never crash it. */
  def parseGeoJson(s: String): Option[Geom] =
    try {
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
      fromJson(n)
    } catch { case _: Exception => None }

  private def fromJson(
      n: com.fasterxml.jackson.databind.JsonNode): Option[Geom] = {
    if (n == null || !n.isObject || !n.has("type")) return None
    def pt(a: com.fasterxml.jackson.databind.JsonNode): (Double, Double) =
      (a.get(0).asDouble(), a.get(1).asDouble())
    def ring(a: com.fasterxml.jackson.databind.JsonNode) =
      (0 until a.size).map(i => pt(a.get(i)))
    val c = n.get("coordinates")
    // degenerate-but-well-formed JSON (empty Multi*, empty rings) must
    // parse to None, not to a Geom that later crashes envelope()/
    // intersects() with empty.min — a 500 where a 400 belongs
    val parsed = n.get("type").asText() match {
      case "Point" if c != null && c.size >= 2 =>
        Some(GPoint(c.get(0).asDouble(), c.get(1).asDouble()))
      case "LineString" if c != null && c.size >= 2 =>
        Some(GLine(ring(c)))
      case "Polygon" if c != null && c.size >= 1 =>
        Some(GPolygon((0 until c.size).map(i => ring(c.get(i)))))
      case "MultiPolygon" if c != null =>
        Some(GMulti((0 until c.size).map(i =>
          GPolygon((0 until c.get(i).size).map(j => ring(c.get(i).get(j)))))))
      case "MultiLineString" if c != null =>
        Some(GMulti((0 until c.size).map(i => GLine(ring(c.get(i))))))
      case "MultiPoint" if c != null =>
        Some(GMulti((0 until c.size).map(i =>
          GPoint(c.get(i).get(0).asDouble(), c.get(i).get(1).asDouble()))))
      case _ => None
    }
    parsed.filter(nonDegenerate)
  }

  private def nonDegenerate(g: Geom): Boolean = g match {
    case _: GPoint => true
    case GLine(pts) => pts.length >= 2
    case GPolygon(rings) => rings.nonEmpty && rings.forall(_.length >= 3)
    case GMulti(parts) => parts.nonEmpty && parts.forall(nonDegenerate)
  }

  private def orient(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double): Int =
    math.signum((bx - ax) * (cy - ay) - (by - ay) * (cx - ax)).toInt

  private def onSegment(px: Double, py: Double, qx: Double, qy: Double,
      rx: Double, ry: Double): Boolean =
    orient(px, py, qx, qy, rx, ry) == 0 &&
      rx >= math.min(px, qx) && rx <= math.max(px, qx) &&
      ry >= math.min(py, qy) && ry <= math.max(py, qy)

  /** Closed-segment intersection (touching endpoints count — matches
    * ST_Intersects' boundary-inclusive semantics). */
  private[geometry] def segIntersect(
      a: (Double, Double), b: (Double, Double),
      c: (Double, Double), d: (Double, Double)): Boolean = {
    val o1 = orient(a._1, a._2, b._1, b._2, c._1, c._2)
    val o2 = orient(a._1, a._2, b._1, b._2, d._1, d._2)
    val o3 = orient(c._1, c._2, d._1, d._2, a._1, a._2)
    val o4 = orient(c._1, c._2, d._1, d._2, b._1, b._2)
    (o1 != o2 && o3 != o4) ||
      onSegment(a._1, a._2, b._1, b._2, c._1, c._2) ||
      onSegment(a._1, a._2, b._1, b._2, d._1, d._2) ||
      onSegment(c._1, c._2, d._1, d._2, a._1, a._2) ||
      onSegment(c._1, c._2, d._1, d._2, b._1, b._2)
  }

  private def segments(pts: IndexedSeq[(Double, Double)]) =
    if (pts.length < 2) IndexedSeq.empty
    else pts.zip(pts.tail)

  /** Boundary-inclusive ray cast against one ring. */
  private def pointInRing(
      x: Double, y: Double, ring: IndexedSeq[(Double, Double)]): Boolean = {
    val closed = if (ring.nonEmpty && ring.head != ring.last)
      ring :+ ring.head else ring
    var inside = false
    segments(closed).foreach { case ((x1, y1), (x2, y2)) =>
      if (onSegment(x1, y1, x2, y2, x, y)) return true
      if ((y1 > y) != (y2 > y) &&
        x < (x2 - x1) * (y - y1) / (y2 - y1) + x1) inside = !inside
    }
    inside
  }

  /** Inside the outer ring, on any boundary, and not STRICTLY inside
    * a hole. */
  private def pointInPolygon(x: Double, y: Double, p: GPolygon): Boolean = {
    if (p.rings.isEmpty || !pointInRing(x, y, p.rings.head)) return false
    p.rings.tail.forall { hole =>
      val closed = if (hole.nonEmpty && hole.head != hole.last)
        hole :+ hole.head else hole
      val onEdge = segments(closed).exists { case ((x1, y1), (x2, y2)) =>
        onSegment(x1, y1, x2, y2, x, y) }
      onEdge || !pointInRing(x, y, hole)
    }
  }

  private def ringSegs(p: GPolygon) = p.rings.flatMap { r =>
    segments(if (r.nonEmpty && r.head != r.last) r :+ r.head else r)
  }

  /** Exact boundary-inclusive intersects over the supported GeoJSON
    * subset — the DE-9IM "interiors or boundaries share a point"
    * predicate pgstac answers for STAC `intersects` search. */
  def intersects(a: Geom, b: Geom): Boolean = (a, b) match {
    case (GMulti(ps), g) => ps.exists(intersects(_, g))
    case (g, GMulti(ps)) => ps.exists(intersects(g, _))
    case (GPoint(x1, y1), GPoint(x2, y2)) => x1 == x2 && y1 == y2
    case (p: GPoint, l: GLine) => pointOnLine(p, l)
    case (l: GLine, p: GPoint) => pointOnLine(p, l)
    case (GPoint(x, y), pg: GPolygon) => pointInPolygon(x, y, pg)
    case (pg: GPolygon, GPoint(x, y)) => pointInPolygon(x, y, pg)
    case (l1: GLine, l2: GLine) =>
      segments(l1.pts).exists(s1 => segments(l2.pts).exists(s2 =>
        segIntersect(s1._1, s1._2, s2._1, s2._2))) ||
        (l1.pts.length == 1 && pointOnLine(GPoint(l1.pts.head._1,
          l1.pts.head._2), l2)) ||
        (l2.pts.length == 1 && pointOnLine(GPoint(l2.pts.head._1,
          l2.pts.head._2), l1))
    case (l: GLine, pg: GPolygon) => linePolygon(l, pg)
    case (pg: GPolygon, l: GLine) => linePolygon(l, pg)
    case (p1: GPolygon, p2: GPolygon) =>
      ringSegs(p1).exists(s1 => ringSegs(p2).exists(s2 =>
        segIntersect(s1._1, s1._2, s2._1, s2._2))) ||
        p1.rings.headOption.exists(_.headOption.exists { case (x, y) =>
          pointInPolygon(x, y, p2) }) ||
        p2.rings.headOption.exists(_.headOption.exists { case (x, y) =>
          pointInPolygon(x, y, p1) })
  }

  private def pointOnLine(p: GPoint, l: GLine): Boolean =
    segments(l.pts).exists { case ((x1, y1), (x2, y2)) =>
      onSegment(x1, y1, x2, y2, p.x, p.y) } ||
      (l.pts.length == 1 && l.pts.head == ((p.x, p.y)))

  private def linePolygon(l: GLine, pg: GPolygon): Boolean =
    segments(l.pts).exists(s => ringSegs(pg).exists(e =>
      segIntersect(s._1, s._2, e._1, e._2))) ||
      l.pts.headOption.exists { case (x, y) => pointInPolygon(x, y, pg) }

  /** Exact intersects against a FIXED query geometry, parsed ONCE on
    * the driver and closed over — the per-row work is one parse of the
    * row's geometry plus the exact test (the caller is expected to
    * bbox-prefilter so this runs on candidates, not the catalog).
    * Null/malformed rows → false. */
  def intersectsWith(query: Geom): UserDefinedFunction =
    udf { (rowGeo: String) =>
      rowGeo != null &&
        parseGeoJson(rowGeo).exists(g => intersects(g, query))
    }

  /** GeoJSON×GeoJSON exact intersects as a UDF — for row×row use;
    * prefer intersectsWith for a constant query geometry (avoids
    * re-parsing the same string per row). Null/malformed → false. */
  val intersectsUdf: UserDefinedFunction =
    udf { (ga: String, gb: String) =>
      (ga != null && gb != null) && (for {
        a <- parseGeoJson(ga)
        b <- parseGeoJson(gb)
      } yield intersects(a, b)).getOrElse(false)
    }

  /** The [w,s,e,n] envelope of a parsed geometry — drives the
    * pushdown-able bbox prefilter for `intersects` search. */
  def envelope(g: Geom): (Double, Double, Double, Double) = g match {
    case GPoint(x, y) => (x, y, x, y)
    case GLine(pts) =>
      (pts.map(_._1).min, pts.map(_._2).min,
        pts.map(_._1).max, pts.map(_._2).max)
    case GPolygon(rings) =>
      val all = rings.headOption.getOrElse(IndexedSeq.empty)
      (all.map(_._1).min, all.map(_._2).min,
        all.map(_._1).max, all.map(_._2).max)
    case GMulti(parts) =>
      val es = parts.map(envelope)
      (es.map(_._1).min, es.map(_._2).min, es.map(_._3).max,
        es.map(_._4).max)
  }

  def extractTrajectory(tolerance: Double = 0.001): UserDefinedFunction =
    udf { (lon: Seq[Double], lat: Seq[Double]) =>
      // a single bad granule (null/mismatched coordinate arrays) must
      // not kill the job: emit an explicit Invalid row instead
      if (lon == null || lat == null)
        ExtractedGeom("Invalid", "", 0, 0, 0, 0, 0, 0)
      else if (lon.length != lat.length)
        ExtractedGeom("Invalid", "", 0, 0, 0, 0,
          math.max(lon.length, lat.length), 0)
      else {
      // NaN/Infinity fill values (routine in NetCDF) must be dropped
      // BEFORE geometry assembly: NaN is illegal in JSON (the Feature
      // would be unparsable) and would poison every bbox scalar. The
      // raw count still reports the full input so the drop is visible.
      val rawAll = lon.zip(lat).toIndexedSeq
      val raw = rawAll.filter { case (x, y) =>
        java.lang.Double.isFinite(x) && java.lang.Double.isFinite(y)
      }
      // dedupe consecutive duplicates
      val dedup = raw.headOption.map { h =>
        raw.tail.foldLeft(IndexedSeq(h)) { (acc, p) =>
          if (acc.last == p) acc else acc :+ p
        }
      }.getOrElse(IndexedSeq.empty)
      if (dedup.isEmpty)
        ExtractedGeom("Empty", "", 0, 0, 0, 0, rawAll.length, 0)
      else if (dedup.length == 1) {
        val (x, y) = dedup.head
        ExtractedGeom("Point",
          s"""{"type":"Point","coordinates":[$x,$y]}""",
          x, y, x, y, rawAll.length, 1)
      } else {
        val simp = douglasPeucker(dedup, tolerance)
        val coords = simp.map { case (x, y) => s"[$x,$y]" }.mkString(",")
        val xs = dedup.map(_._1)
        val ys = dedup.map(_._2)
        ExtractedGeom("LineString",
          s"""{"type":"LineString","coordinates":[$coords]}""",
          xs.min, ys.min, xs.max, ys.max, rawAll.length, simp.length)
      }
      }
    }
}
