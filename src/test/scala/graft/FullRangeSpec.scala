package graft

import org.apache.spark.sql.functions._
import org.scalatest.Tag

import graft.catalog.{CatalogStore, ItemAssembly}

/** Marks tests that process the full reference-scale range (minutes,
  * not milliseconds) — kept in the default run so scale claims stay
  * continuously verified, but tagged for selective exclusion via
  * `testOnly -- -l graft.SlowTest`. */
object SlowTest extends Tag("graft.SlowTest")

/** The reference's FULL production range — 1,569,438 three-minute
  * slots, 2016-01-19T08:07:03 .. 2024-12-31T23:59:59 (avhrr
  * recipe.py:90-92) — through the V2 source and item assembly.
  * MonthScaleSpec proves one month end-to-end including the catalog
  * write; this proves the whole range plans and executes with the
  * driver holding only partition descriptors (no driver-side date
  * list — the reference materializes all 1.5M pd.Timestamps on the
  * driver). */
class FullRangeSpec extends SparkSpec {

  test("full range: 1,569,438 slots assemble across 108 months " +
      "with bounded driver state", SlowTest) {
    val granules = spark.read
      .format("graft.ingest.v2.GranuleGridSource")
      .option("start", "2016-01-19T08:07:03Z")
      .option("end", "2024-12-31T23:59:59Z")
      .option("numpartitions", "32")
      .load()
    // driver state is 32 slice descriptors (~32 bytes each), never a
    // materialized slot list
    assert(granules.rdd.getNumPartitions == 32)

    val (items, errors) = ItemAssembly.assemble(granules)
    val agg = CatalogStore.withMonth(items).agg(
      count(lit(1)).as("n"),
      countDistinct(col("month")).as("months"),
      min(col("start_datetime")).as("t0"),
      max(col("start_datetime")).as("t1")).first()

    assert(agg.getLong(0) == 1569438L,
      s"item count ${agg.getLong(0)} != reference full-range slot count")
    assert(agg.getLong(1) == 108L,
      s"expected 108 month partitions, got ${agg.getLong(1)}")
    assert(agg.getTimestamp(2).toString.startsWith("2016-01-19 08:07:03"))
    assert(agg.getTimestamp(3).toString.startsWith("2024-12-31 23:58:03"))
    assert(errors.isEmpty, "grid rows are all well-formed")
  }
}
