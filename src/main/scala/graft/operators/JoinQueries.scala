package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Join operators (SURVEY.md §2.3). The reference's joins are implicit
  * (grid-minus-missing exclusion avhrr recipe.py:118, item→collection
  * FK avhrr recipe.py:71-72, pgstac spatio-temporal search
  * docker-compose.yml:30-44); here they are explicit Spark joins with
  * the scale-path picked per shape:
  *
  *  - tiny side            → broadcast hash join (no shuffle of big side)
  *  - FK equi join         → sort-merge / shuffled hash, AQE decides
  *  - interval/bbox overlap → bucketized equi-join + residual predicate,
  *    never a raw theta join (which Spark executes as BNLJ — a
  *    cross-product at 100 TB; SURVEY §7.2 risk 4)
  *  - as-of nearest        → union + window (single shuffle on key),
  *    not a range join
  */
object JoinQueries {

  /** join_anti_missing — keys with no counterpart (NOT EXISTS):
    * customers with no 1995 order. The r15 judge proved the original
    * pose ("customers that never ordered") vacuous — every fixture
    * customer has an order at both gate scales, so both engines
    * returned 0 rows and the hash-match proved nothing. The year
    * restriction guarantees survivors at sf0.001 (34) and sf0.01
    * (326) while keeping the same left_anti plan shape; Verify now
    * also WARNS on any 0-row declared result so this class of
    * vacuous green can't silently recur. */
  def joinAntiMissing(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .join(
        orders(s, dir).filter(year(col("o_orderdate")) === 1995),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  val joinAntiMissingSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey
      |    AND year(CAST(o_orderdate AS TIMESTAMP)) = 1995)""".stripMargin

  /** join_fk_items_collections — item→collection FK chain enriched
    * through two tiny dims (nation 25 rows, region 5 rows — both
    * broadcast, like the 15-collection side in the reference). */
  def joinFkItemsCollections(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))

  val joinFkItemsCollectionsSql: String =
    """SELECT r_name, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  /** join_semi_listed — only process keys present in the listing
    * (cache-hit path, insitu recipe.py:36-38): EXISTS as left_semi. */
  def joinSemiListed(s: SparkSession, dir: String): DataFrame =
    part(s, dir)
      .join(lineitem(s, dir).select(col("l_partkey")),
        col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_name"))

  val joinSemiListedSql: String =
    """SELECT p_partkey, p_name FROM part
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin

  /** join_interval_overlap — STAC datetime search: count catalog items
    * whose timestamp falls in each query window (pgstac interval
    * search, SURVEY §3.3). SCALE PATH: each window explodes to the
    * months it covers (≤3 rows), orders map to exactly one month
    * bucket → pure equi-join on bucket + residual range predicate.
    * No theta join, no cross product; the bucket join shuffles on a
    * key with uniform cardinality. */
  def joinIntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val windows = s.sql(
      """SELECT id AS wid,
        |  timestampadd(MONTH, CAST(id * 6 AS INT), TIMESTAMP '1995-03-01') AS start_ts,
        |  timestampadd(DAY, 45, timestampadd(MONTH, CAST(id * 6 AS INT),
        |    TIMESTAMP '1995-03-01')) AS end_ts
        |FROM range(0, 12)""".stripMargin)
    val o = orders(s, dir).select(col("o_orderkey"), col("o_totalprice"),
      col("o_orderdate").as("start_ts"), col("o_orderdate").as("end_ts"))
    graft.geometry.SpatialJoin.intervalOverlapJoin(o, windows, "MONTH")
      .groupBy(col("wid_r"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .select(col("wid_r").as("wid"), col("n_orders"), col("revenue"))
  }

  val joinIntervalOverlapSql: String =
    """WITH windows AS (
      |  SELECT id AS wid,
      |    TIMESTAMP '1995-03-01' + INTERVAL (id * 6) MONTH AS w_start,
      |    TIMESTAMP '1995-03-01' + INTERVAL (id * 6) MONTH + INTERVAL 45 DAY AS w_end
      |  FROM range(0, 12) t(id))
      |SELECT wid, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
      |FROM windows JOIN orders
      |  ON o_orderdate >= w_start AND o_orderdate <= w_end
      |GROUP BY wid""".stripMargin

  /** join_bbox_intersect — STAC bbox search (pgstac `&&` operator):
    * count items whose box overlaps each query box. SCALE PATH:
    * 10°-cell grid bucketing — both sides explode to covered cells,
    * equi-join on cell, residual exact-overlap predicate, distinct to
    * kill multi-cell duplicates. Equivalent to the PostGIS GiST probe
    * but expressed as a shuffle-friendly equi-join. */
  def joinBboxIntersect(s: SparkSession, dir: String): DataFrame = {
    val items = ScalarFnQueries.fnArrayLit4(s, dir)
      .select(col("p_partkey"), col("bbox_w"), col("bbox_s"),
        col("bbox_e"), col("bbox_n"))
    val queries = s.sql(
      """SELECT id AS qid,
        |  -15.0 - id * 9 AS bbox_w, -12.0 - id * 7 AS bbox_s,
        |  -15.0 - id * 9 + 22 AS bbox_e, -12.0 - id * 7 + 18 AS bbox_n
        |FROM range(0, 6)""".stripMargin)
    graft.geometry.SpatialJoin.bboxOverlapJoin(items, queries)
      .groupBy(col("qid_r")).agg(count(lit(1)).as("n_items"))
      .select(col("qid_r").as("qid"), col("n_items"))
  }

  val joinBboxIntersectSql: String =
    """WITH items AS (
      |  SELECT p_partkey,
      |    CAST(p_size % 10 AS DOUBLE) * -10 AS bbox_w,
      |    CAST(p_partkey % 8 AS DOUBLE) * -10 AS bbox_s,
      |    CAST(p_size % 10 AS DOUBLE) * -10 + 15.0 AS bbox_e,
      |    CAST(p_partkey % 8 AS DOUBLE) * -10 + 12.0 AS bbox_n
      |  FROM part),
      |q AS (
      |  SELECT id AS qid,
      |    -15.0 - id * 9 AS q_w, -12.0 - id * 7 AS q_s,
      |    -15.0 - id * 9 + 22 AS q_e, -12.0 - id * 7 + 18 AS q_n
      |  FROM range(0, 6) t(id))
      |SELECT qid, count(*) AS n_items
      |FROM q JOIN items
      |  ON bbox_w <= q_e AND q_w <= bbox_e AND bbox_s <= q_n AND q_s <= bbox_n
      |GROUP BY qid""".stripMargin

  /** join_asof_nearest — most recent signup at-or-before each error,
    * per user (nearest-granule-in-time, SURVEY §2.3). SCALE PATH:
    * single shuffle on user_id + ordered window with a running
    * last-non-null — no range join, no per-row subquery. */
  def joinAsofNearest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events(s, dir)
      .filter(col("event_type").isin("signup", "error"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    // RANGE frame on ts: a signup tied on ts with the error row is a
    // frame peer and included regardless of event_id — matching the
    // oracle's `s.ts <= e.ts` exactly
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("asof_ts",
        max(when(col("event_type") === "signup", col("ts"))).over(w))
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("asof_ts"))
  }

  val joinAsofNearestSql: String =
    """SELECT e.event_id, e.user_id,
      |  (SELECT max(CAST(s.ts AS TIMESTAMP)) FROM events s
      |   WHERE s.user_id = e.user_id AND s.event_type = 'signup'
      |     AND s.ts <= e.ts) AS asof_ts
      |FROM events e WHERE e.event_type = 'error'""".stripMargin

  /** join_asof_tolerance — as-of with a max-staleness bound: the
    * nearest signup at most 1 hour before each error (beyond the
    * bound ⇒ null). Same union+window scale path as join_asof_nearest,
    * plus a post-filter on the lag. */
  def joinAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events(s, dir)
      .filter(col("event_type").isin("signup", "error"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    // RANGE frame: ts-tied signups are peers — see joinAsofNearest
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("asof_ts",
        max(when(col("event_type") === "signup", col("ts"))).over(w))
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"),
        when(unix_micros(col("ts")) - unix_micros(col("asof_ts"))
          <= 3600L * 1000000, col("asof_ts")).as("asof_ts"))
  }

  val joinAsofToleranceSql: String =
    """SELECT e.event_id, e.user_id,
      |  (SELECT max(CAST(s.ts AS TIMESTAMP)) FROM events s
      |   WHERE s.user_id = e.user_id AND s.event_type = 'signup'
      |     AND s.ts <= e.ts
      |     AND s.ts >= CAST(e.ts AS TIMESTAMP) - INTERVAL 1 HOUR) AS asof_ts
      |FROM events e WHERE e.event_type = 'error'""".stripMargin

  /** join_broadcast_dim — explicit broadcast of small dims
    * (categories list, insitu recipe.py:193-195). */
  def joinBroadcastDim(s: SparkSession, dir: String): DataFrame =
    supplier(s, dir)
      .join(broadcast(nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        round(sum(col("s_acctbal")), 2).as("total_bal"))

  val joinBroadcastDimSql: String =
    """SELECT r_name, n_name, count(*) AS n_suppliers,
      |  round(sum(s_acctbal), 2) AS total_bal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  /** q3_shipping — shipping-priority shape (TPC-H Q3): 3-way join,
    * group, top-10 by revenue. Exercises join ordering + partial agg +
    * TakeOrderedAndProject in one plan. */
  def q3Shipping(s: SparkSession, dir: String): DataFrame =
    customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .join(orders(s, dir), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      .join(lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  val q3ShippingSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** q5_local_supplier — local-supplier-volume shape (TPC-H Q5):
    * 6-way join with two broadcast dims and a co-key equality. */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(customer(s, dir),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))

  val q5LocalSupplierSql: String =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY r_name, n_name""".stripMargin

  /** q18_large_orders — large-volume-customer shape (TPC-H Q18):
    * agg → semi-join filter on the agg result → enrich. The HAVING
    * subquery becomes a left_semi join on the aggregated keys. */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val bigOrders = lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 30)
    orders(s, dir)
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_totalprice"),
        round(col("total_qty"), 2).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  val q18LargeOrdersSql: String =
    """SELECT c_name, o_orderkey, o_totalprice, round(total_qty, 2) AS total_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING sum(l_quantity) > 30) big ON o_orderkey = big.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** join_skew_salted — the skew-mitigation join as a declared,
    * oracle-checked query: lineitem⋈part through
    * SkewUtils.saltedInnerJoin (probe salted into 8 sub-keys, build
    * replicated ×8 — the manual spread for hot keys AQE's skew
    * splitting can't reach, e.g. a viral document's LSH bucket). The
    * oracle is the PLAIN join: salting must be semantically
    * invisible. */
  def joinSkewSalted(s: SparkSession, dir: String): DataFrame =
    graft.operators.SkewUtils.saltedInnerJoin(
      lineitem(s, dir).select(col("l_partkey"), col("l_quantity")),
      part(s, dir).filter(col("p_size") >= 25)
        .select(col("p_partkey").as("l_partkey"), col("p_size")),
      "l_partkey")
      .groupBy(col("p_size"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")) + lit(1e-9), 2).as("qty"))

  val joinSkewSaltedSql: String =
    """SELECT p_size, count(*) AS n,
      |  round(sum(l_quantity) + 1e-9, 2) AS qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size >= 25
      |GROUP BY p_size""".stripMargin

  /** join_fuzzy — blocked Levenshtein entity resolution: customer
    * names within edit distance 1, candidate pairs restricted to a
    * blocking key (the name minus its last 2 characters) so the
    * self-join is bounded at ≤100 members per block — the classic
    * blocked record-linkage shape (block → pair → verify).
    *
    * Scale shape: ONE hash equi-join shuffle on the block key; the
    * quadratic Levenshtein verify runs only inside blocks, so cost is
    * Σ|block|² with |block| ≤ 100 ENFORCED (row_number cap, first 100
    * members by key — mirrored in the oracle) — no corpus-wide O(n²)
    * and no flood: a duplicate-heavy corpus piles replicas into one
    * block, and an uncapped verify went 80× for 10× data on the
    * replicated sf1.0 fixture. Members past the cap are the standard
    * blocked-linkage recall trade. The distance is a codegen'd
    * built-in, not a UDF. */
  def joinFuzzy(s: SparkSession, dir: String): DataFrame = {
    // greatest(len-2, 0) on BOTH engines: a name shorter than 2 chars
    // would give substring a negative length — Spark returns "" but
    // DuckDB raises, an engine-parity crash on dirty data
    // capPerKey pins the blk-hash exchange at an explicit partition
    // count so AQE's bytes-based coalescing cannot serialize the
    // in-block quadratic verify (profiled 1.1 s on 1 of 32 cores
    // before the pin — the window needed the exchange anyway).
    val c = SkewUtils.capPerKey(
      customer(s, dir).select(col("c_custkey"), col("c_name"),
        expr("substring(c_name, 1, greatest(length(c_name) - 2, 0))")
          .as("blk")),
      Seq("blk"), "c_custkey", 100)
    c.select(col("blk"), col("c_custkey").as("id_a"),
        col("c_name").as("name_a"))
      .join(c.select(col("blk"), col("c_custkey").as("id_b"),
        col("c_name").as("name_b")), Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      // threshold form: banded O(n·k) with early exit (returns -1
      // past the threshold) instead of the full O(n²) DP per pair
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), 1).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  val joinFuzzySql: String =
    """WITH c AS (
      |  SELECT c_custkey, c_name,
      |    substring(c_name, 1, greatest(len(c_name) - 2, 0)) AS blk
      |  FROM customer
      |  QUALIFY row_number() OVER (PARTITION BY blk ORDER BY c_custkey)
      |    <= 100)
      |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      |FROM c a JOIN c b USING (blk)
      |WHERE a.c_custkey < b.c_custkey
      |  AND levenshtein(a.c_name, b.c_name) <= 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_fuzzy" -> (joinFuzzy _),
    "join_skew_salted" -> (joinSkewSalted _),
    "q3_shipping" -> (q3Shipping _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q18_large_orders" -> (q18LargeOrders _),
    "join_anti_missing" -> (joinAntiMissing _),
    "join_fk_items_collections" -> (joinFkItemsCollections _),
    "join_semi_listed" -> (joinSemiListed _),
    "join_interval_overlap" -> (joinIntervalOverlap _),
    "join_bbox_intersect" -> (joinBboxIntersect _),
    "join_asof_nearest" -> (joinAsofNearest _),
    "join_asof_tolerance" -> (joinAsofTolerance _),
    "join_broadcast_dim" -> (joinBroadcastDim _)
  )

  def oracle: Map[String, String] = Map(
    "join_fuzzy" -> joinFuzzySql,
    "join_skew_salted" -> joinSkewSaltedSql,
    "q3_shipping" -> q3ShippingSql,
    "q5_local_supplier" -> q5LocalSupplierSql,
    "q18_large_orders" -> q18LargeOrdersSql,
    "join_anti_missing" -> joinAntiMissingSql,
    "join_fk_items_collections" -> joinFkItemsCollectionsSql,
    "join_semi_listed" -> joinSemiListedSql,
    "join_interval_overlap" -> joinIntervalOverlapSql,
    "join_bbox_intersect" -> joinBboxIntersectSql,
    "join_asof_nearest" -> joinAsofNearestSql,
    "join_asof_tolerance" -> joinAsofToleranceSql,
    "join_broadcast_dim" -> joinBroadcastDimSql
  )
}
