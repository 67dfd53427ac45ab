package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-situ platform metadata source (the second reference recipe,
  * insitu_glo_phybgcwav_discrete_mynrt_013_030/recipe.py): one row per
  * platform file with trajectory coordinate arrays and global attrs
  * (consumed fields at recipe.py:73-93; FIXTURES.md B2 schema).
  *
  * The fixture generates, distributedly, `platformsPerCategory`
  * platforms for each of the reference's 15 category codes
  * (collections.yaml:1-390), with trajectory shapes that exercise the
  * geometry extractor: multi-point tracks (→ LineString), single-point
  * and all-same-point platforms (→ Point), and collinear runs that
  * Douglas-Peucker must collapse (recipe.py:91-93, tolerance 0.001).
  */
object InsituSource {

  /** The reference's 15 in-situ category codes (collections.yaml). */
  val Categories: Seq[String] = Seq(
    "BO", "CT", "DB", "FB", "GL", "ML", "MO", "PF",
    "RF", "SD", "SM", "TG", "TS", "TX", "XB")

  val CollectionRoot = "INSITU_GLO_PHYBGCWAV_DISCRETE_MYNRT_013_030"

  def platforms(
      spark: SparkSession,
      platformsPerCategory: Int = 20,
      month: String = "202205"): DataFrame = {
    import spark.implicits._
    val cats = Categories.toDF("category")
    val idx = spark.range(0, platformsPerCategory).toDF("pidx")
    cats.crossJoin(idx)
      .withColumn("platform_code",
        concat(col("category"), lit("-"), format_string("%04d", col("pidx"))))
      .withColumn("source",
        concat(lit("https://data.example.org/monthly/"), col("category"),
          lit(s"/$month/GL_PR_"), col("platform_code"), lit(".nc")))
      .withColumn("id", col("platform_code"))
      // deterministic trajectory seed per platform
      .withColumn("seed", xxhash64(col("platform_code")))
      // track length: 1 point every 7th platform (Point degenerate),
      // otherwise 8-24 points
      .withColumn("n_pts",
        when(col("pidx") % 7 === 0, lit(1))
          .otherwise((pmod(col("seed"), lit(17)) + 8).cast("int")))
      .withColumn("lon0",
        (pmod(col("seed"), lit(320)).cast("double") - 160))
      .withColumn("lat0",
        (pmod(shiftright(col("seed"), 13), lit(140)).cast("double") - 70))
      // collinear easterly drift with a kink at 3/4 of the track —
      // DP(ε=0.001) must keep only endpoints + the kink
      // every 11th platform is a MOORED buoy: a multi-row track whose
      // coordinates are ALL identical — the promised all-same-point →
      // Point degenerate (distinct from the n_pts=1 single-row case)
      .withColumn("moored", col("pidx") % 11 === 10)
      .withColumn("lon", expr(
        "transform(sequence(0, n_pts - 1), " +
          "i -> CASE WHEN moored THEN lon0 ELSE lon0 + i * 0.05 END)"))
      .withColumn("lat", expr(
        """transform(sequence(0, n_pts - 1), i ->
          |  CASE WHEN moored OR i < (n_pts * 3) DIV 4 THEN lat0
          |       ELSE lat0 + (i - (n_pts * 3) DIV 4) * 0.03 END)"""
          .stripMargin))
      .withColumn("time", expr(
        s"""transform(sequence(0, n_pts - 1), i ->
           |  timestampadd(HOUR, CAST(i AS INT),
           |    TIMESTAMP '2022-05-01 00:00:00'))""".stripMargin))
      .withColumn("geospatial_lon_min",
        when(col("pidx") % 13 === 12, lit("broken"))
          .otherwise(expr("CAST(array_min(lon) AS STRING)")))
      .withColumn("geospatial_lat_min",
        expr("CAST(array_min(lat) AS STRING)"))
      .withColumn("geospatial_lon_max",
        expr("CAST(array_max(lon) AS STRING)"))
      .withColumn("geospatial_lat_max",
        expr("CAST(array_max(lat) AS STRING)"))
      .withColumn("attrs", map(
        lit("institution"), concat(lit("inst-"), col("category")),
        lit("platform_code"), col("platform_code"),
        lit("source"), lit("drifting buoy")))
      .select("source", "id", "category",
        "geospatial_lon_min", "geospatial_lat_min",
        "geospatial_lon_max", "geospatial_lat_max",
        "lon", "lat", "time", "attrs")
  }
}
