package graft

import graft.operators._

/** Physical-plan regression tests (SCALE.md's claims, executable):
  * pushdown reaches the scans, dim joins broadcast, bucketized
  * overlap joins never become nested-loop joins, top-k never becomes
  * a global sort. A refactor that silently degrades a plan fails here
  * long before a benchmark notices.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("parquet scans receive pushed filters and pruned schemas") {
    val p = plan(RelationalQueries.srcParquet(spark, sf))
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(p_size,25)"), p)
    assert(!p.contains("p_retailprice"), "unused columns must be pruned")
    val q1 = plan(RelationalQueries.q1Pricing(spark, sf))
    assert(q1.contains("LessThanOrEqual(l_shipdate"), "date bound pushed")
  }

  test("dimension joins broadcast, never shuffle the small side") {
    val p = plan(JoinQueries.joinBroadcastDim(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    val fk = plan(JoinQueries.joinFkItemsCollections(spark, sf))
    assert(fk.contains("BroadcastHashJoin"), "nation/region broadcast")
  }

  test("bucketized overlap joins are equi-joins, not nested loops") {
    Seq(
      plan(JoinQueries.joinIntervalOverlap(spark, sf)),
      plan(JoinQueries.joinBboxIntersect(spark, sf))
    ).foreach { p =>
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("global top-k uses TakeOrderedAndProject, not a full sort") {
    val p = plan(RelationalQueries.topkGlobal(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("similarity pair joins stay hash/sort-merge on their block keys") {
    val p = plan(SimilarityQueries.simPairwiseThreshold(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") ||
      // 1-row query-vector broadcasts are legitimate BNLJ
      p.contains("label"), p)
    assert(p.contains("Join"), p)
    val mh = plan(DedupQueries.dedupNearMinhash(spark, sf))
    assert(!mh.contains("CartesianProduct"), mh)
  }

  test("flagship aggregation runs inside whole-stage codegen") {
    val df = RelationalQueries.q1Pricing(spark, sf)
    df.collect() // AQE finalizes the plan only on execution
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the final plan
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p)
    assert(p.contains("HashAggregate"), "partial+final hash agg")
  }
}
