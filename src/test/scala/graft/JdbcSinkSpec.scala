package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.catalog.{CatalogStore, ItemAssembly, JdbcCatalogSink}
import graft.ingest.FixtureGranuleSource

/** JDBC upsert parity sink against embedded Derby (the pgstac role):
  * idempotent re-run, last-write-wins, and ON CONFLICT SQL shape. */
class JdbcSinkSpec extends SparkSpec {

  // in-memory Derby lives in this JVM; executors are threads in
  // local mode, so foreachPartition writers reach the same database
  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def conn() = DriverManager.getConnection(url)

  private def query[T](sql: String)(f: java.sql.ResultSet => T): T = {
    val c = conn()
    try {
      val rs = c.createStatement().executeQuery(sql)
      f(rs)
    } finally c.close()
  }

  private def count(where: String = ""): Int =
    query(s"SELECT count(*) FROM items $where") { rs => rs.next(); rs.getInt(1) }

  test("JDBC upsert: idempotent re-run and last-write-wins") {
    val c = conn()
    c.createStatement().execute(JdbcCatalogSink.createTableSql("items"))
    c.close()
    val cfg = JdbcCatalogSink.JdbcConfig(url, "items",
      JdbcCatalogSink.GenericDialect)

    val (items0, _) = ItemAssembly.assemble(
      new FixtureGranuleSource(end = "2022-05-01 01:59:59").granules(spark))
    // pin ingested_at so re-runs carry an identical timestamp
    val items = items0.withColumn("ingested_at",
      lit(java.sql.Timestamp.valueOf("2022-06-01 00:00:00")))
    val n = items.count()

    JdbcCatalogSink.upsertItems(items, cfg)
    assert(count() == n, "first run inserts every item")

    // exact re-run: same rows, same timestamps — nothing may change
    JdbcCatalogSink.upsertItems(items, cfg)
    assert(count() == n, "re-run is idempotent")

    // newer delta for one item wins (same (item, collection) identity)
    val one = items.limit(1)
    val id = one.select("item_id").first().getString(0)
    def contentOf(itemId: String): String =
      query(s"SELECT content FROM items WHERE item_id = '$itemId'") {
        rs => rs.next(); rs.getString(1) }
    val newer = one
      .withColumn("properties", map_concat(col("properties"),
        map(lit("processing:version"), lit("2.0"))))
      .withColumn("ingested_at",
        lit(java.sql.Timestamp.valueOf("2022-07-01 00:00:00")))
    JdbcCatalogSink.upsertItems(newer, cfg)
    assert(count() == n, "upsert replaces, never duplicates")
    assert(contentOf(id).contains("\"processing:version\":\"2.0\""))

    // an OLDER replay of the same item must NOT win
    val older = one
      .withColumn("properties", map_concat(col("properties"),
        map(lit("processing:version"), lit("0.1"))))
      .withColumn("ingested_at",
        lit(java.sql.Timestamp.valueOf("2022-01-01 00:00:00")))
    JdbcCatalogSink.upsertItems(older, cfg)
    assert(contentOf(id).contains("\"processing:version\":\"2.0\"") &&
      !contentOf(id).contains("\"processing:version\":\"0.1\""),
      "stale replay must not overwrite a newer row")

    // a cross-collection re-ingest is a NEW identity — a second row,
    // exactly like the partition-scoped parquet merge
    val moved = one
      .withColumn("collection_id", lit("MOVED"))
      .withColumn("ingested_at",
        lit(java.sql.Timestamp.valueOf("2022-08-01 00:00:00")))
    JdbcCatalogSink.upsertItems(moved, cfg)
    assert(count() == n + 1, "new collection = new identity")
    assert(count(s"WHERE item_id = '$id'") == 2,
      "the original collection's row survives the move")

    // content is the Feature JSON (pgstac content-document parity)
    val content = query(
      s"SELECT content FROM items WHERE item_id = '$id'") { rs =>
      rs.next(); rs.getString(1) }
    assert(content.startsWith("{\"type\":\"Feature\""))
    assert(content.contains("\"geometry\":{\"type\":\"Polygon\""))
  }

  test("JDBC sink agrees with the parquet CatalogStore merge") {
    val url2 = "jdbc:derby:memory:graftdb2;create=true"
    val c = DriverManager.getConnection(url2)
    c.createStatement().execute(JdbcCatalogSink.createTableSql("items"))
    c.close()
    val cfg = JdbcCatalogSink.JdbcConfig(url2, "items",
      JdbcCatalogSink.GenericDialect)
    val path = java.nio.file.Files
      .createTempDirectory("graft-jdbc-parity").toString + "/items"

    val t0 = lit(java.sql.Timestamp.valueOf("2022-06-01 00:00:00"))
    val t1 = lit(java.sql.Timestamp.valueOf("2022-06-02 00:00:00"))
    val (a0, _) = ItemAssembly.assemble(
      new FixtureGranuleSource(end = "2022-05-01 01:59:59").granules(spark))
    val a = a0.withColumn("ingested_at", t0)
    // reprocessed delta: same identity (collection_id, item_id) —
    // partitioned-catalog item identity includes the collection —
    // with updated properties and a newer ingest stamp
    val delta = a0.limit(5)
      .withColumn("properties", map_concat(col("properties"),
        map(lit("processing:version"), lit("2.0"))))
      .withColumn("ingested_at", t1)

    CatalogStore.write(a, path)
    CatalogStore.upsert(spark, path, delta)
    JdbcCatalogSink.upsertItems(a, cfg)
    JdbcCatalogSink.upsertItems(delta, cfg)

    // both stores: same ids, and the same 5 ids carrying the v2 marker
    val parquetState = CatalogStore.read(spark, path)
      .select(col("item_id"),
        (try_element_at(col("properties"), lit("processing:version"))
          === "2.0").as("v2"))
      .collect().map(r => (r.getString(0), !r.isNullAt(1) && r.getBoolean(1)))
      .toSet
    val jdbcState = {
      val cc = DriverManager.getConnection(url2)
      try {
        val rs = cc.createStatement()
          .executeQuery("SELECT item_id, content FROM items")
        val buf = scala.collection.mutable.Set[(String, Boolean)]()
        while (rs.next()) buf += ((rs.getString(1),
          rs.getString(2).contains("\"processing:version\":\"2.0\"")))
        buf.toSet
      } finally cc.close()
    }
    assert(jdbcState == parquetState,
      "JDBC and parquet sinks must converge to the same catalog state")
    assert(jdbcState.count(_._2) == 5, "exactly the 5 reprocessed items")
  }

  test("streaming micro-batches upsert through the JDBC sink exactly once") {
    val url3 = "jdbc:derby:memory:graftdb3;create=true"
    val c = DriverManager.getConnection(url3)
    c.createStatement().execute(JdbcCatalogSink.createTableSql("items"))
    c.close()
    val cfg = JdbcCatalogSink.JdbcConfig(url3, "items",
      JdbcCatalogSink.GenericDialect)
    val dir = java.nio.file.Files.createTempDirectory("graft-sjdbc")
    val srcDir = s"$dir/in"
    val ckpt = s"$dir/ckpt"
    // stage the delta as parquet, stream it file-ingest style
    val (items0, _) = ItemAssembly.assemble(
      new FixtureGranuleSource(end = "2022-05-01 00:59:59").granules(spark))
    val items = items0.withColumn("ingested_at",
      lit(java.sql.Timestamp.valueOf("2022-06-01 00:00:00")))
    items.write.parquet(srcDir)
    val n = items.count()
    def runStream(): Unit = {
      val stream = spark.readStream.schema(items.schema).parquet(srcDir)
      val q = graft.streaming.StreamingOps
        .jdbcUpsertSink(stream, cfg, ckpt).start()
      q.awaitTermination()
    }
    runStream()
    def dbCount(): Long = {
      val cc = DriverManager.getConnection(url3)
      try {
        val rs = cc.createStatement()
          .executeQuery("SELECT count(*) FROM items")
        rs.next(); rs.getLong(1)
      } finally cc.close()
    }
    assert(dbCount() == n, "stream loads every item")
    // restart against the same checkpoint: nothing re-processed;
    // wipe the checkpoint and replay: the sink's guard absorbs it
    runStream()
    assert(dbCount() == n)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    runStream()
    assert(dbCount() == n, "checkpoint-less replay is absorbed by upsert")
  }

  test("Postgres dialect emits the pgstac ON CONFLICT statement") {
    val sql = JdbcCatalogSink.PostgresDialect.upsertSql("pgstac.items")
    assert(sql.contains("ON CONFLICT (item_id, collection_id) DO UPDATE"))
    assert(sql.contains("(EXCLUDED.ingested_at, EXCLUDED.tie) >= " +
      "(pgstac.items.ingested_at, pgstac.items.tie)"))
  }

  test("pre-tie tables migrate with addTieColumnSql and then upsert") {
    val url = "jdbc:derby:memory:graftmig;create=true"
    val c = DriverManager.getConnection(url)
    // the old DDL, verbatim: no tie column
    c.createStatement().execute(
      "CREATE TABLE items (item_id VARCHAR(256) NOT NULL, " +
        "collection_id VARCHAR(256) NOT NULL, content CLOB, " +
        "ingested_at TIMESTAMP, PRIMARY KEY (item_id, collection_id))")
    c.createStatement().execute("INSERT INTO items VALUES " +
      "('legacy', 'C', '{}', TIMESTAMP('2022-06-01 00:00:00'))")
    c.createStatement().execute(JdbcCatalogSink.addTieColumnSql(
      JdbcCatalogSink.GenericDialect, "items"))
    c.close()
    val cfg = JdbcCatalogSink.JdbcConfig(url, "items",
      JdbcCatalogSink.GenericDialect)
    val (items, _) = ItemAssembly.assemble(
      new FixtureGranuleSource(end = "2022-05-01 00:59:59").granules(spark))
    val delta = items
      .withColumn("ingested_at",
        lit(java.sql.Timestamp.valueOf("2022-06-01 00:00:00")))
    JdbcCatalogSink.upsertItems(delta, cfg)
    // equal-timestamp overwrite of the legacy row: MinValue default
    // loses to any real hash, reproducing the old >= behavior
    val legacy = delta.limit(1)
      .withColumn("item_id", lit("legacy"))
      .withColumn("collection_id", lit("C"))
    JdbcCatalogSink.upsertItems(legacy, cfg)
    val cc = DriverManager.getConnection(url)
    try {
      val rs = cc.createStatement().executeQuery(
        "SELECT count(*) FROM items WHERE item_id = 'legacy' " +
          "AND CAST(content AS VARCHAR(100)) = '{}'")
      rs.next()
      assert(rs.getLong(1) == 0, "migrated legacy row must be replaced")
    } finally cc.close()
  }

  test("equal-timestamp cross-batch replays converge in either order") {
    // two deltas for the SAME item, SAME ingested_at, DIFFERENT
    // content: the stored tie hash must make the DB pick the same
    // winner no matter which batch arrives first — and that winner
    // must be the one CatalogStore.upsert picks
    val ts = lit(java.sql.Timestamp.valueOf("2022-06-01 00:00:00"))
    val (base, _) = ItemAssembly.assemble(
      new FixtureGranuleSource(end = "2022-05-01 00:59:59").granules(spark))
    def variant(v: String) = base.limit(1)
      .withColumn("properties", map_concat(col("properties"),
        map(lit("processing:version"), lit(v))))
      .withColumn("ingested_at", ts)
    val d1 = variant("a")
    val d2 = variant("b")

    // parquet-store winner
    val path = java.nio.file.Files
      .createTempDirectory("graft-jdbc-tie").toString + "/items"
    CatalogStore.write(d1, path)
    CatalogStore.upsert(spark, path, d2)
    val parquetWinner = CatalogStore.read(spark, path)
      .select(try_element_at(col("properties"), lit("processing:version")))
      .head.getString(0)

    def runOrder(n: Int, first: org.apache.spark.sql.DataFrame,
        second: org.apache.spark.sql.DataFrame): String = {
      val url = s"jdbc:derby:memory:grafttie$n;create=true"
      val c = DriverManager.getConnection(url)
      c.createStatement().execute(JdbcCatalogSink.createTableSql("items"))
      c.close()
      val cfg = JdbcCatalogSink.JdbcConfig(url, "items",
        JdbcCatalogSink.GenericDialect)
      JdbcCatalogSink.upsertItems(first, cfg)
      JdbcCatalogSink.upsertItems(second, cfg)
      val cc = DriverManager.getConnection(url)
      try {
        val rs = cc.createStatement()
          .executeQuery("SELECT content FROM items")
        rs.next()
        val m = "\"processing:version\":\"(.)\"".r
          .findFirstMatchIn(rs.getString(1))
        assert(!rs.next(), "exactly one row per (item, collection)")
        m.get.group(1)
      } finally cc.close()
    }
    val w12 = runOrder(1, d1, d2)
    val w21 = runOrder(2, d2, d1)
    assert(w12 == w21, "winner must not depend on arrival order")
    assert(w12 == parquetWinner,
      "JDBC winner must match the parquet-store winner")
  }
}
