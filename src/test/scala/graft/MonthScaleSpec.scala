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

  test("month-partitioned layout prunes partitions on interval search") {
    val grid = spark.read.format("graft.ingest.v2.GranuleGridSource")
      .option("start", "2022-03-01T00:01:03Z")
      .option("end", "2022-06-30T23:59:59Z") // four months
      .load()
    val (items, _) = ItemAssembly.assemble(grid)
    val path = java.nio.file.Files
      .createTempDirectory("graft-monthly").toString + "/items"
    CatalogStore.writeMonthly(items, path)
    // four month dirs under the collection partition
    val collDir = new java.io.File(path).listFiles()
      .find(_.getName.startsWith("collection_id=")).get
    assert(collDir.listFiles().count(_.getName.startsWith("month=")) == 4)

    val catalog = CatalogStore.read(spark, path)
    val q = CatalogQuery.Search(
      interval = Some((
        Timestamp.valueOf("2022-05-05 00:00:00"),
        Timestamp.valueOf("2022-05-20 00:00:00"))),
      limit = 100000)
    val compiled = CatalogQuery.compile(catalog, q)
    // physical plan prunes to the April+May partitions
    val plan = compiled.queryExecution.executedPlan.toString
    assert(plan.contains("month"), s"partition filter expected:\n$plan")
    val rows = compiled.collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val m = r.getAs[String]("month")
      m == "2022-04" || m == "2022-05"
    })
    // correctness: same answer as the unpartitioned path
    val flat = java.nio.file.Files
      .createTempDirectory("graft-flat").toString + "/items"
    CatalogStore.write(items, flat)
    val expected = CatalogQuery
      .compile(CatalogStore.read(spark, flat), q).count()
    assert(rows.length.toLong == expected)

    // upsert into the monthly catalog must PRESERVE the layout: a
    // month-less delta gets the month derived, and the directory tree
    // keeps its two levels (a flat rewrite would corrupt discovery)
    val before = CatalogStore.read(spark, path).count()
    val delta = items.limit(50)
    CatalogStore.upsert(spark, path, delta)
    val after = CatalogStore.read(spark, path)
    assert(after.count() == before, "idempotent re-upsert")
    assert(collDir.listFiles().count(_.getName.startsWith("month=")) == 4,
      "month partitions survive upsert")
  }
}
