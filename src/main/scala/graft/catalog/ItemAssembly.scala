package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.geometry.Geometry

/** Granule metadata rows → catalog item rows (fn_struct_build and
  * friends): the engine's `generate_stac_item`
  * (avhrr recipe.py:45-74) as one declarative projection —
  * normalization, strict casts, bbox array + scalars, GeoJSON
  * polygon, assets map, links array. Pure Column expressions ⇒
  * whole-stage codegen, scales linearly, no Python-worker analog.
  */
object ItemAssembly {

  /** The reference's `xstac_kwargs` (avhrr recipe.py:131-135, insitu
    * recipe.py:165-169): the CRS plus the names of the x/y grid
    * dimensions. xstac derives STAC projection-extension fields from
    * these against the open dataset; here the granule rows carry no
    * grid arrays, so the derivable subset is proj:code/proj:epsg and
    * proj:bbox (from the item bbox — exact for epsg:4326 where data
    * and CRS coordinates coincide). Dimension names are kept for
    * sources whose metadata rows DO carry per-dimension sizes. */
  case class XstacKwargs(
      referenceSystem: String = "epsg:4326",
      xDimension: String = "ni",
      yDimension: String = "nj")

  /** Strict numeric cast: parse failure lands in `cast_errors` rather
    * than silently nulling — the engine twin of the reference's
    * `raise ValueError(ds.attrs, bbox_strings)` (insitu
    * recipe.py:87-90) but non-fatal: bad rows are quarantined, good
    * rows proceed (at 100 TB a single bad granule must not kill the
    * job). */
  private def strictDouble(c: Column): Column =
    expr(s"try_cast(${c.toString} AS double)")

  /** Assemble items from granule_meta (FIXTURES.md B1 schema).
    * Returns (items, errors): errors carries the original strings for
    * the rows whose bbox failed to parse, with full context. */
  def assemble(granules: DataFrame,
      xstac: Option[XstacKwargs] = None): (DataFrame, DataFrame) = {
    val withCasts = granules.select(
      col("*"),
      strictDouble(col("westernmost_longitude")).as("bbox_w"),
      strictDouble(col("southernmost_latitude")).as("bbox_s"),
      strictDouble(col("easternmost_longitude")).as("bbox_e"),
      strictDouble(col("northernmost_latitude")).as("bbox_n"),
      to_timestamp(col("time_coverage_start")).as("start_datetime"),
      to_timestamp(col("time_coverage_end")).as("end_datetime"))

    val bad = withCasts.filter(
      col("bbox_w").isNull || col("bbox_s").isNull ||
        col("bbox_e").isNull || col("bbox_n").isNull)
      .select(col("uuid").as("item_id"), col("source").as("source_url"),
        col("westernmost_longitude"), col("southernmost_latitude"),
        col("easternmost_longitude"), col("northernmost_latitude"),
        lit("unparsable bbox attribute").as("error"))

    val good = withCasts.filter(
      col("bbox_w").isNotNull && col("bbox_s").isNotNull &&
        col("bbox_e").isNotNull && col("bbox_n").isNotNull)

    val items = good.select(
      col("uuid").as("item_id"),
      col("id").as("collection_id"),
      Geometry.bboxPolygon(col("bbox_w"), col("bbox_s"),
        col("bbox_e"), col("bbox_n")).as("geometry"),
      array(col("bbox_w"), col("bbox_s"), col("bbox_e"), col("bbox_n"))
        .as("bbox"),
      col("bbox_w"), col("bbox_s"), col("bbox_e"), col("bbox_n"),
      col("start_datetime"),
      col("end_datetime"),
      array(col("start_datetime"), col("end_datetime")).as("datetimes"),
      map(Seq(
        lit("start_datetime"),
        date_format(col("start_datetime"), "yyyy-MM-dd'T'HH:mm:ss"),
        lit("end_datetime"),
        date_format(col("end_datetime"), "yyyy-MM-dd'T'HH:mm:ss")) ++
        projProperties(xstac): _*)
        .as("properties"),
      map(lit("data"),
        struct(col("source").as("href"),
          lit("application/netcdf").as("media_type"))).as("assets"),
      array(struct(lit("collection").as("rel"), col("id").as("target")))
        .as("links"),
      col("source").as("source_url"),
      current_timestamp().as("ingested_at"))

    (items, bad)
  }

  /** STAC projection-extension key/value columns for the properties
    * map. proj:epsg only when the reference system is an EPSG code. */
  private def projProperties(xstac: Option[XstacKwargs]): Seq[Column] =
    xstac.toSeq.flatMap { x =>
      val epsg = "(?i)epsg:(\\d+)".r
      val code = x.referenceSystem match {
        case epsg(n) => Seq(lit("proj:epsg"), lit(n))
        case _ => Seq.empty
      }
      Seq(
        lit("proj:code"), lit(x.referenceSystem.toUpperCase),
        lit("proj:bbox"), concat(lit("["),
          concat_ws(", ", col("bbox_w").cast("string"),
            col("bbox_s").cast("string"), col("bbox_e").cast("string"),
            col("bbox_n").cast("string")), lit("]"))) ++ code
    }
}
