package graft.catalog

import java.sql.{Connection, DriverManager, PreparedStatement, SQLException, Timestamp}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** JDBC upsert parity sink — the engine twin of the reference's ONLY
  * sink, pgstac item upsert (`ToPgStac`, avhrr recipe.py:85,137; DSN
  * runtime-config.yaml:2). pgstac stores one row per item (item ids
  * unique within their collection) with the item document as JSON;
  * this sink writes the same shape —
  * (item_id, collection_id, content, ingested_at) with content the
  * same Feature JSON the FeatureCollection serializer emits — via
  * foreachPartition, so every executor streams its partition straight
  * into the database with NO driver collect. Upsert semantics match
  * CatalogStore.upsert: last write (newest ingested_at) wins per
  * (item_id, collection_id), re-runs are idempotent.
  *
  * Scale: one connection + one prepared statement per partition,
  * rows batched BATCH-at-a-time (the ON CONFLICT dialect) — at
  * 1000 executors the DB sees bounded concurrent writers
  * (= shuffle partitions), each doing set-based batches, which is
  * exactly how pgstac's loader is driven in production.
  */
object JdbcCatalogSink {

  val COLS: Seq[String] =
    Seq("item_id", "collection_id", "content", "ingested_at", "tie")

  private val BATCH = 500

  /** Statement strategy per SQL dialect. Implementations must be
    * serializable — they ship inside the foreachPartition closure. */
  sealed trait Dialect extends Serializable {
    def writer(conn: Connection, table: String): RowWriter
  }

  trait RowWriter {
    /** (item_id, collection_id, content, ingested_at, tie) */
    def write(id: String, coll: String, content: String,
        ingestedAt: Timestamp, tie: Long): Unit
    def flush(): Unit
  }

  /** PostgreSQL / pgstac: one INSERT ... ON CONFLICT DO UPDATE
    * statement, batched. The conflict target is (item_id,
    * collection_id) — STAC item ids are unique per collection, and
    * keying on the pair keeps this store row-for-row convergent with
    * the partition-scoped CatalogStore merge (a cross-collection
    * re-ingest is a second row in BOTH stores). The WHERE guard keeps
    * the newest (ingested_at, tie) pair — a replayed older delta is a
    * no-op, so retries and out-of-order backfills are safe, and the
    * STORED content-hash tiebreak makes cross-batch equal-timestamp
    * conflicts converge to the same winner CatalogStore.upsert picks
    * regardless of arrival order (a plain >= on ingested_at alone
    * would be last-arrival-wins and the two stores could diverge). */
  case object PostgresDialect extends Dialect {
    def upsertSql(table: String): String =
      s"""INSERT INTO $table (item_id, collection_id, content, ingested_at, tie)
         |VALUES (?, ?, ?, ?, ?)
         |ON CONFLICT (item_id, collection_id) DO UPDATE SET
         |  content = EXCLUDED.content,
         |  ingested_at = EXCLUDED.ingested_at,
         |  tie = EXCLUDED.tie
         |WHERE (EXCLUDED.ingested_at, EXCLUDED.tie) >= ($table.ingested_at, $table.tie)""".stripMargin

    def writer(conn: Connection, table: String): RowWriter = new RowWriter {
      private val st = conn.prepareStatement(upsertSql(table))
      private var n = 0
      def write(id: String, coll: String, content: String,
          ingestedAt: Timestamp, tie: Long): Unit = {
        st.setString(1, id); st.setString(2, coll)
        st.setString(3, content); st.setTimestamp(4, ingestedAt)
        st.setLong(5, tie)
        st.addBatch(); n += 1
        if (n >= BATCH) flush()
      }
      def flush(): Unit = if (n > 0) { st.executeBatch(); n = 0 }
    }
  }

  /** Dialect-free update-else-insert for databases without ON
    * CONFLICT (embedded Derby in tests). Same last-write-wins guard
    * on the same (item_id, collection_id) key: the UPDATE only hits
    * rows with ingested_at <= the incoming one; a duplicate-key race
    * on INSERT means a CONCURRENT writer created the row after our
    * probe — the guarded UPDATE is retried so a newer incoming delta
    * still wins (and an older one is a no-op), matching the Postgres
    * WHERE guard under concurrency. */
  case object GenericDialect extends Dialect {
    def writer(conn: Connection, table: String): RowWriter = new RowWriter {
      // (ingested_at, tie) lexicographic guard spelled out — Derby
      // has no row-value comparison; semantics match PostgresDialect
      private val upd = conn.prepareStatement(
        s"UPDATE $table SET content = ?, ingested_at = ?, tie = ? " +
          s"WHERE item_id = ? AND collection_id = ? AND " +
          s"(ingested_at < ? OR (ingested_at = ? AND tie <= ?))")
      private val ins = conn.prepareStatement(
        s"INSERT INTO $table (item_id, collection_id, content, " +
          s"ingested_at, tie) VALUES (?, ?, ?, ?, ?)")
      def write(id: String, coll: String, content: String,
          ingestedAt: Timestamp, tie: Long): Unit = {
        def guardedUpdate(): Int = {
          upd.setString(1, content); upd.setTimestamp(2, ingestedAt)
          upd.setLong(3, tie)
          upd.setString(4, id); upd.setString(5, coll)
          upd.setTimestamp(6, ingestedAt)
          upd.setTimestamp(7, ingestedAt); upd.setLong(8, tie)
          upd.executeUpdate()
        }
        if (guardedUpdate() == 0) {
          try {
            ins.setString(1, id); ins.setString(2, coll)
            ins.setString(3, content); ins.setTimestamp(4, ingestedAt)
            ins.setLong(5, tie)
            ins.executeUpdate()
          } catch {
            case e: SQLException if e.getSQLState != null &&
                e.getSQLState.startsWith("23") =>
              // insert race lost: re-apply the guarded UPDATE rather
              // than drop the row — if the racing row is older, ours
              // must still win
              guardedUpdate()
          }
        }
      }
      def flush(): Unit = ()
    }
  }

  case class JdbcConfig(
      url: String,
      table: String = "items",
      dialect: Dialect = PostgresDialect,
      props: Map[String, String] = Map.empty)

  /** Upsert catalog items into the JDBC table. The delta is first
    * deduped per (item_id, collection_id) with the SAME deterministic
    * last-write-wins rank CatalogStore.upsert uses — same ordering
    * AND the same content-hash tiebreak expression
    * (CatalogStore.tiebreakHash over the full item schema), so
    * equal-timestamp duplicates pick the same winner in both stores.
    * One batch never races itself; cross-batch ordering is handled by
    * the dialect's ingested_at guard. */
  def upsertItems(items: DataFrame, conf: JdbcConfig): Unit = {
    val w = Window.partitionBy(col("item_id"), col("collection_id"))
      .orderBy(col("ingested_at").desc, col("tie").desc)
    // the tiebreak hash travels WITH the row into the table (column
    // `tie`) so the dialects' cross-batch guard can apply the same
    // deterministic equal-timestamp resolution the in-batch window
    // rank does — without it, equal-timestamp replays across batches
    // would be arrival-order-wins and diverge from CatalogStore
    // exclude the derived month column (a monthly-layout frame may
    // carry it) so the hash basis is IDENTICAL to CatalogStore
    // .upsert's — a different basis would pick different equal-
    // timestamp winners and the stores would diverge after all
    val rows = items
      .withColumn("_tie",
        CatalogStore.tiebreakHash(items, exclude = Set("month")))
      .withColumn("content", FeatureCollection.featureColumn)
      .select(col("item_id"), col("collection_id"), col("content"),
        col("ingested_at"), col("_tie").as("tie"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val (url, table, dialect, props) =
      (conf.url, conf.table, conf.dialect, conf.props)
    rows.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val jprops = new java.util.Properties()
        props.foreach { case (k, v) => jprops.setProperty(k, v) }
        val conn = DriverManager.getConnection(url, jprops)
        try {
          conn.setAutoCommit(false)
          val writer = dialect.writer(conn, table)
          it.foreach { r =>
            writer.write(r.getString(0), r.getString(1), r.getString(2),
              r.getTimestamp(3), r.getLong(4))
          }
          writer.flush()
          conn.commit()
        } catch {
          case t: Throwable => conn.rollback(); throw t
        } finally conn.close()
      }
    }
  }

  /** DDL for the parity table (content as TEXT/CLOB; pgstac proper
    * uses jsonb — adjust the type when pointing at real pgstac). */
  /** Migration for tables created by the pre-tie DDL. The default is
    * Long.MinValue, not 0: ties are compared with `incoming >=
    * stored`, so a MinValue stored tie makes every equal-timestamp
    * incoming row win regardless of its (possibly negative) hash —
    * exactly the old guard's `EXCLUDED.ingested_at >=` behavior for
    * pre-migration rows, converging to real-hash semantics as rows
    * are rewritten. */
  def addTieColumnSql(dialect: Dialect, table: String): String =
    dialect match {
      case PostgresDialect =>
        s"ALTER TABLE $table ADD COLUMN IF NOT EXISTS tie BIGINT " +
          s"NOT NULL DEFAULT ${Long.MinValue}"
      case GenericDialect => // Derby syntax
        s"ALTER TABLE $table ADD COLUMN tie BIGINT WITH DEFAULT ${Long.MinValue}"
    }

  def createTableSql(table: String, textType: String = "CLOB"): String =
    s"CREATE TABLE $table (item_id VARCHAR(256) NOT NULL, " +
      s"collection_id VARCHAR(256) NOT NULL, content $textType, " +
      s"ingested_at TIMESTAMP, tie BIGINT NOT NULL, " +
      s"PRIMARY KEY (item_id, collection_id))"
}
