package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Granule metadata sources (src_scientific, SURVEY.md §2.1).
  *
  * The reference opens each NetCDF remotely and reads global attrs
  * (avhrr recipe.py:46-63). On the JVM with no NetCDF library
  * available offline (SURVEY §7.2 risk 1), the engine isolates the
  * format behind this trait: the rest of the pipeline only ever sees
  * one metadata ROW per granule — `(source, attrs...)` — so a real
  * netcdf-java-backed implementation slots in without touching
  * assembly/catalog code.
  */
trait GranuleSource extends Serializable {
  /** One row per granule with the FIXTURES.md B1 `granule_meta` schema:
    * source, id, uuid, westernmost_longitude, southernmost_latitude,
    * easternmost_longitude, northernmost_latitude,
    * time_coverage_start, time_coverage_end (numeric fields as
    * STRINGS — the reference's attrs are strings, recipe.py:51-56). */
  def granules(spark: SparkSession): DataFrame
}

/** Deterministic synthetic granule source: generates the 3-minute
  * AVHRR-style grid DISTRIBUTEDLY (sequence+explode — never a
  * driver-side list, unlike the reference's `pattern.items()`,
  * SURVEY §3.1 step 3), drops a planted missing list, and derives
  * attrs per slot. A few rows carry unparsable bbox strings to
  * exercise strict-cast error semantics (insitu recipe.py:87-90).
  */
final class FixtureGranuleSource(
    start: String = "2022-05-01 00:01:03",
    end: String = "2022-05-01 23:59:59",
    missing: Seq[String] = Seq("2022-05-01 08:01:03", "2022-05-01 17:31:03"),
    badBboxEvery: Int = 97) extends GranuleSource {

  override def granules(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val grid = spark.sql(
      s"""SELECT explode(sequence(
         |  TIMESTAMP '$start', TIMESTAMP '$end',
         |  INTERVAL 3 MINUTES)) AS ts""".stripMargin)
    val missingDf = missing.toDF("m")
      .select(col("m").cast("timestamp").as("ts"))
    val slots = grid.join(broadcast(missingDf), Seq("ts"), "left_anti")
    val slot = unix_timestamp(col("ts"))
    slots.select(
      col("ts"),
      concat(lit("https://example.org/sst/"),
        date_format(col("ts"), "yyyy/DDD/yyyyMMddHHmmss"),
        lit("-OSISAF-L2P.nc")).as("source"),
      lit("AVHRR_SST_METOP_B-OSISAF-L2P-v1.0").as("id"),
      concat(lit("granule-"), date_format(col("ts"), "yyyyMMddHHmmss"))
        .as("uuid"),
      // bbox strings derived from the slot; every Nth is unparsable
      when(slot % badBboxEvery === 0, lit("not-a-number"))
        .otherwise(((slot % 170) - 85).cast("string"))
        .as("westernmost_longitude"),
      // HASH the slot before the modulus (as the v2 source does): the
      // raw slot % 120 collapses to TWO values under the 180 s stride
      // (gcd 60), and a LINEAR multiply-then-mod keeps the same gcd —
      // only a non-linear mix actually diversifies the residues
      (pmod(xxhash64(col("ts")), lit(120)) - 60).cast("string")
        .as("southernmost_latitude"),
      (((slot % 170) - 85) + 10).cast("string").as("easternmost_longitude"),
      ((pmod(xxhash64(col("ts")), lit(120)) - 60) + 8).cast("string")
        .as("northernmost_latitude"),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("time_coverage_start"),
      date_format(col("ts") + expr("INTERVAL 3 MINUTES"),
        "yyyy-MM-dd'T'HH:mm:ss").as("time_coverage_end"))
  }
}
