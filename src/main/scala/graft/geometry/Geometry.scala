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
