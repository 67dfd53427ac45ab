package graft.catalog

import java.sql.Timestamp

/** Canonical catalog schemas (SURVEY.md §1.3) — the engine's central
  * tables. Mirrors the STAC item/collection shapes the reference
  * builds (item ctor avhrr recipe.py:67-74, insitu recipe.py:110-123;
  * collection docs collections.yaml) with scalar bbox projections kept
  * alongside the array so bbox predicates push down to parquet
  * row-group stats.
  */
object StacModel {

  case class AssetRef(href: String, media_type: String)
  case class LinkRef(rel: String, target: String)

  /** One catalog item — a granule / platform observation set. */
  case class StacItem(
      item_id: String,
      collection_id: String,
      geometry: String, // GeoJSON
      bbox: Seq[Double],
      bbox_w: Double,
      bbox_s: Double,
      bbox_e: Double,
      bbox_n: Double,
      start_datetime: Timestamp,
      end_datetime: Timestamp,
      datetimes: Seq[Timestamp],
      properties: Map[String, String],
      assets: Map[String, AssetRef],
      links: Seq[LinkRef],
      source_url: String,
      ingested_at: Timestamp)

  case class Provider(name: String, roles: Seq[String], url: Option[String])
  case class CollectionLink(rel: String, href: String, title: Option[String])

  /** One collection document (collections.yaml:1-32 shape). */
  case class StacCollection(
      id: String,
      title: String,
      description: String,
      license: String,
      keywords: Seq[String],
      extent_spatial: String,
      extent_temporal: String,
      providers: Seq[Provider],
      links: Seq[CollectionLink])
}
