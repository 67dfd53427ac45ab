package graft

import graft.operators.RelationalQueries

class RelationalQueriesSpec extends SparkSpec {

  test("flagship pricing summary returns grouped rows in order") {
    val rows = RelationalQueries.q1Pricing(spark, sf).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.sameElements(keys.sorted), "must be ordered by group keys")
    // every group aggregates at least one line
    assert(rows.forall(_.getAs[Long]("count_order") > 0))
  }

  test("time grid is a complete 3-minute grid") {
    val ts = RelationalQueries.srcTimeGrid(spark, sf)
      .collect().map(_.getTimestamp(0).getTime).sorted
    assert(ts.length == 960) // 2 days of 3-min slots
    assert(ts.sliding(2).forall { case Array(a, b) => b - a == 180000L })
  }

  test("drop-missing removes exactly the excluded slots") {
    val full = RelationalQueries.srcTimeGrid(spark, sf).count()
    val dropped = RelationalQueries.srcDropMissing(spark, sf).count()
    assert(full - dropped == 3)
  }

  test("every declared oracle key has a query implementation") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("approx distinct within 5% of exact") {
    val approx = RelationalQueries.aggDistinctApprox(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = RelationalQueries.aggDistinctExact(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.05, s"key $k")
    }
  }

  test("hll sketches: per-partition estimates bound error, union == rescan") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.events(spark, sf)
    val got = RelationalQueries.aggHllPartitioned(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // per-type estimates within 5% of exact
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(got(k) - n).toDouble / n < 0.05, s"type $k")
    }
    // the UNION of per-type sketches answers the global question
    // within bound WITHOUT rescanning rows — the mergeability claim
    val globalExact = e.select(countDistinct(col("user_id"))).head.getLong(0)
    assert(math.abs(got("ALL") - globalExact).toDouble / globalExact < 0.05)
    // and it equals the estimate of a direct one-pass global sketch
    // (the max-per-bucket union algebra is exact, not merely close)
    val direct = RelationalQueries.hllEstimate(
      RelationalQueries.hllRegisters(
        e.select(lit("ALL").as("event_type"), col("user_id")),
        "event_type", "user_id"),
      "event_type", "n").head.getLong(1)
    assert(got("ALL") == direct, "union of partials must equal one-pass sketch")
  }

  test("hll registers: codegen parity and repartition invariance") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val keys = (1L to 5000L).map(i => ("g", i * 2654435761L + 7))
    def est(parts: Int): Long = RelationalQueries.hllEstimate(
      RelationalQueries.hllRegisters(
        keys.toDF("g", "k").repartition(parts), "g", "k"),
      "g", "n").head.getLong(1)
    // every stage is order-independent math — partitioning must not move
    // the estimate by even one count
    assert(est(1) == est(32))
    // the codegen expression agrees with the static kernel it inlines
    val got = keys.toDF("g", "k")
      .select(graft.functions.HllSketch.hllRegister(col("k"), 12))
      .as[Long].collect().sorted.toSeq
    val want = keys.map(k =>
      graft.functions.HllSketch.register(k._2, 12)).sorted
    assert(got == want)
  }

  test("sort_range_partition: buckets cover every row, ranges stay " +
      "disjoint and ordered, and the deterministic sample balances " +
      "the layout") {
    import org.apache.spark.sql.functions._
    val rows = RelationalQueries.sortRangePartition(spark, sf)
      .orderBy(col("bucket")).collect()
    assert(rows.nonEmpty && rows.head.getInt(0) == 0)
    val total = rows.map(_.getLong(1)).sum
    val nLi = graft.Tables.lineitem(spark, sf).count()
    assert(total == nLi, s"every row lands in exactly one bucket: " +
      s"$total vs $nLi")
    // ranges are disjoint and ordered: boundary ties always go UP
    // (zip, not sliding-with-partial-match: a 1-bucket result must
    // fail an assertion, not throw MatchError)
    assert(rows.length > 1, "fixture must produce multiple buckets")
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2),
        s"overlap between buckets ${a.getInt(0)} and ${b.getInt(0)}")
    }
    // the sampled boundaries balance the layout: no bucket more than
    // 4x the mean (sf0.001's 6k rows over 32 buckets)
    val mean = total.toDouble / rows.length
    assert(rows.map(_.getLong(1)).max <= 4 * mean,
      s"skewed layout: ${rows.map(_.getLong(1)).toSeq}")
  }
}
