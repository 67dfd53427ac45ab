package graft

import org.apache.spark.sql.functions._

/** DataSourceV2 granule source: partition planning, row generation,
  * and agreement with the sequence-based fixture source. */
class GranuleV2Spec extends SparkSpec {

  private def v2(start: String, end: String, parts: Int = 8) =
    spark.read.format("graft.ingest.v2.GranuleGridSource")
      .option("start", start).option("end", end)
      .option("numPartitions", parts.toString)
      .load()

  test("grid cardinality matches the closed-form slot count") {
    val df = v2("2022-05-01T00:01:03Z", "2022-05-01T23:59:59Z")
    assert(df.count() == 480) // one day of 3-minute slots
    assert(df.rdd.getNumPartitions == 8, "planned input partitions")
  }

  test("rows carry well-formed granule metadata") {
    val r = v2("2022-05-01T00:01:03Z", "2022-05-01T00:10:00Z").orderBy("ts")
      .collect()
    assert(r.length == 3)
    val first = r.head
    assert(first.getAs[String]("source")
      .matches("https://example\\.org/sst/2022/121/20220501000103-OSISAF-L2P\\.nc"))
    assert(first.getAs[String]("uuid") == "granule-20220501000103")
    assert(first.getAs[String]("time_coverage_start") == "2022-05-01T00:01:03")
    assert(first.getAs[String]("time_coverage_end") == "2022-05-01T00:04:03")
    // bbox strings parse and are consistent w+10=e
    val w = first.getAs[String]("westernmost_longitude").toDouble
    val e = first.getAs[String]("easternmost_longitude").toDouble
    assert(e == w + 10)
  }

  test("v2 source feeds item assembly like the fixture source") {
    val (items, errors) = graft.catalog.ItemAssembly.assemble(
      v2("2022-05-01T00:01:03Z", "2022-05-01T05:59:59Z"))
    assert(errors.count() == 0, "v2 rows are all parsable")
    assert(items.count() == 120)
    assert(items.select("collection_id").distinct().count() == 1)
  }

  test("partitioning scales without changing results") {
    val a = v2("2022-05-01T00:01:03Z", "2022-05-01T23:59:59Z", parts = 1)
      .agg(sum(unix_timestamp(col("ts")))).collect()(0).getLong(0)
    val b = v2("2022-05-01T00:01:03Z", "2022-05-01T23:59:59Z", parts = 32)
      .agg(sum(unix_timestamp(col("ts")))).collect()(0).getLong(0)
    assert(a == b)
  }
}
