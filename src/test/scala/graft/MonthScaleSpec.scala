package graft

import java.sql.Timestamp

import graft.catalog._

/** The reference's actual flagship workload at full size: the May-2022
  * AVHRR key space — 14,880 3-minute slots (avhrr recipe.py:116-118)
  * — ingested through the V2 source into a partitioned catalog and
  * searched. The reference distributes this via driver-side
  * enumeration + Beam; here the whole key space never touches the
  * driver. */
class MonthScaleSpec extends SparkSpec {

  test("full May-2022 granule month: ingest, upsert, search") {
    val t0 = System.nanoTime()
    val month = spark.read.format("graft.ingest.v2.GranuleGridSource")
      .option("start", "2022-05-01T00:01:03Z")
      .option("end", "2022-05-31T23:59:59Z")
      .option("numPartitions", "16")
      .load()
    assert(month.count() == 14880, "the reference's full-month key space")

    val (items, errors) = ItemAssembly.assemble(month)
    assert(errors.count() == 0)

    val path = java.nio.file.Files
      .createTempDirectory("graft-month").toString + "/items"
    CatalogStore.write(items, path)
    val catalog = CatalogStore.read(spark, path)
    assert(catalog.count() == 14880)

    // STAC search: one day, northern boxes, sorted, paged
    val q = CatalogQuery.Search(
      collections = Seq("AVHRR_SST_METOP_B-OSISAF-L2P-v1.0"),
      interval = Some((
        Timestamp.valueOf("2022-05-10 00:00:00"),
        Timestamp.valueOf("2022-05-11 00:00:00"))),
      cql2 = Some("bbox_n >= 30"),
      sortBy = Seq(("start_datetime", true)),
      limit = 100)
    val page = CatalogQuery.compile(catalog, q).collect()
    assert(page.nonEmpty && page.length <= 100)
    assert(page.forall(_.getAs[Double]("bbox_n") >= 30))

    // idempotent re-upsert of a week
    val week = spark.read.format("graft.ingest.v2.GranuleGridSource")
      .option("start", "2022-05-08T00:01:03Z")
      .option("end", "2022-05-14T23:59:59Z")
      .load()
    CatalogStore.upsert(spark, path, ItemAssembly.assemble(week)._1)
    assert(CatalogStore.read(spark, path).count() == 14880,
      "re-upserting a contained week adds nothing")

    val secs = (System.nanoTime() - t0) / 1e9
    info(f"month-scale ingest+search+upsert: $secs%.1f s")
    assert(secs < 120, "full month must stay interactive on local[4]")
  }
}
