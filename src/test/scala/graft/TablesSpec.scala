package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the schema-adaptive events loader (round-8 regression: the driver
  * fixture drifted parquet TIMESTAMP(NANOS) → timestamp[us] and the old
  * single-layout loader broke 21 queries at analysis time). Both physical
  * layouts must normalize to identical session-UTC µs timestamps. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // 2021-06-01T00:00:00Z plus offsets, expressed in nanoseconds.
  private val baseNs = 1622505600L * 1000000000L
  private val offsetsNs = Seq(0L, 1500L, 999999999L, 86400L * 1000000000L + 123456000L)

  test("normalizeEventsTs: INT64 nanos layout → µs timestamps") {
    val df = offsetsNs.map(baseNs + _).toDF("ts")
    val out = Tables.normalizeEventsTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    val micros = out.select(unix_micros($"ts")).as[Long].collect().toSeq
    assert(micros == offsetsNs.map(o => (baseNs + o) / 1000))
  }

  test("normalizeEventsTs: timestamp[us] (NTZ) layout → identical µs timestamps") {
    // Build the NTZ column from µs so it matches what Spark reads from a
    // timestamp[us] parquet file with no UTC adjustment (session tz is UTC).
    val ntz = offsetsNs.map(o => (baseNs + o) / 1000).toDF("us")
      .withColumn("ts", timestamp_micros($"us").cast(TimestampNTZType))
      .drop("us")
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val out = Tables.normalizeEventsTs(ntz)
    assert(out.schema("ts").dataType == TimestampType)
    val micros = out.select(unix_micros($"ts")).as[Long].collect().toSeq
    assert(micros == offsetsNs.map(o => (baseNs + o) / 1000))
  }

  test("both layouts round-trip through parquet to the same values") {
    val tmp = java.nio.file.Files.createTempDirectory("tables-spec").toString
    // µs layout: Spark writes TimestampNTZ as parquet timestamp[us] (no UTC flag),
    // matching the driver's current fixture shape.
    val us = offsetsNs.map(o => (baseNs + o) / 1000).toDF("us")
      .withColumn("ts", timestamp_micros($"us").cast(TimestampNTZType)).drop("us")
    us.write.mode("overwrite").parquet(s"$tmp/events_us.parquet")
    val readBack = spark.read.parquet(s"$tmp/events_us.parquet")
    val out = Tables.normalizeEventsTs(readBack)
    val micros = out.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted
    assert(micros == offsetsNs.map(o => (baseNs + o) / 1000).sorted)
  }

  test("driver fixture loads through the guard with TimestampType ts") {
    val e = Tables.events(spark, sf)
    assert(e.schema("ts").dataType == TimestampType)
    assert(e.count() > 0)
  }

  test("all ten driver tables pass the fixture-drift guard") {
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    names.foreach { n => assert(Tables.table(spark, sf, n).columns.nonEmpty, n) }
    assert(Tables.events(spark, sf).columns.nonEmpty)
  }

  test("generic table() serves events on the legacy long-ts layout") {
    // Regression (round-9 advice): table(s, dir, "events") used to guard
    // BEFORE normalizing, so a legacy TIMESTAMP(NANOS) fixture — read as
    // LongType under the nanosAsLong conf — failed with a misleading
    // "fixture drift" error on a layout the events loader supports.
    val tmp = java.nio.file.Files.createTempDirectory("tables-spec-long").toString
    offsetsNs.map(o => (1L, baseNs + o, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val e = Tables.table(spark, tmp, "events")
    assert(e.schema("ts").dataType == TimestampType)
    val micros = e.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted
    assert(micros == offsetsNs.map(o => (baseNs + o) / 1000).sorted)
  }

  test("guard fails loudly on a family mismatch") {
    val bad = Seq((1L, "x")).toDF("event_id", "ts") // ts as string, not time
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("a"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val err = intercept[IllegalStateException] { Tables.normalizeEventsTs(bad) }
    assert(err.getMessage.contains("unsupported type"))
  }
}
