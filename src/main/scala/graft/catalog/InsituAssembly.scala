package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.geometry.Geometry

/** Platform trajectory rows → catalog items — the engine's
  * `generate_stac_item` for the in-situ recipe
  * (insitu recipe.py:73-123): category from the URL path
  * (recipe.py:75), derived collection id root-CATEGORY
  * (recipe.py:77), trajectory geometry with ε=0.001 simplification
  * and Point degeneration (recipe.py:91-93), `datetimes` only when
  * time exists (recipe.py:100-108), public asset + collection link
  * (recipe.py:118-122). Strict-cast quarantine mirrors
  * recipe.py:87-90 without killing the job.
  */
object InsituAssembly {

  def assemble(platforms: DataFrame): (DataFrame, DataFrame) = {
    val withGeo = platforms
      // category from the URL: element_at(split(url,'/'), -3)
      // (recipe.py:75). try_element_at: a malformed URL with <3
      // segments must quarantine, not ANSI-crash the job
      .withColumn("category_from_url",
        try_element_at(split(col("source"), "/"), lit(-3)))
      .withColumn("collection_id",
        concat_ws("-", lit(graft.ingest.InsituSource.CollectionRoot),
          col("category_from_url")))
      .withColumn("g",
        Geometry.extractTrajectory(0.001)(col("lon"), col("lat")))
      .withColumn("lon_min_cast",
        expr("try_cast(geospatial_lon_min AS double)"))

    val quarantined = col("lon_min_cast").isNull ||
      col("category_from_url").isNull ||
      // Empty trajectories would emit invalid "" geometry at (0,0,0,0)
      col("g.geo_type").isin("Invalid", "Empty")
    val bad = withGeo
      .filter(quarantined)
      .select(col("id").as("item_id"), col("source").as("source_url"),
        col("geospatial_lon_min"),
        when(col("lon_min_cast").isNull, lit("unparsable bbox attribute"))
          .when(col("category_from_url").isNull, lit("malformed source url"))
          .otherwise(lit("invalid or empty trajectory arrays")).as("error"))

    val good = withGeo.filter(!quarantined)

    val items = good.select(
      col("id").as("item_id"),
      col("collection_id"),
      col("g.geometry").as("geometry"),
      array(col("g.bbox_w"), col("g.bbox_s"), col("g.bbox_e"),
        col("g.bbox_n")).as("bbox"),
      col("g.bbox_w").as("bbox_w"), col("g.bbox_s").as("bbox_s"),
      col("g.bbox_e").as("bbox_e"), col("g.bbox_n").as("bbox_n"),
      array_min(col("time")).as("start_datetime"),
      array_max(col("time")).as("end_datetime"),
      // datetimes only when observation times exist (recipe.py:100-101)
      when(size(col("time")) > 0, col("time"))
        .otherwise(lit(null)).as("datetimes"),
      map_concat(
        col("attrs"),
        map(lit("geo_type"), col("g.geo_type"),
          lit("n_points"), col("g.n_points_out").cast("string")))
        .as("properties"),
      map(lit("public"),
        struct(col("source").as("href"),
          lit("application/netcdf").as("media_type"))).as("assets"),
      array(struct(lit("collection").as("rel"),
        col("collection_id").as("target"))).as("links"),
      col("source").as("source_url"),
      current_timestamp().as("ingested_at"))

    (items, bad)
  }
}
