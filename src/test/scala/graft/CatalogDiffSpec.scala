package graft

import org.apache.spark.sql.functions._

import graft.catalog.CatalogDiff

/** Snapshot CDC: the changelog must classify added / removed /
  * changed exactly, ignore ingested_at-only churn, and be immune to
  * column order (the hash basis is canonicalized). */
class CatalogDiffSpec extends SparkSpec {

  private def snap(rows: Seq[(String, String, String, java.sql.Timestamp)]) = {
    import spark.implicits._
    rows.toDF("collection_id", "item_id", "payload", "ingested_at")
  }

  private val t0 = java.sql.Timestamp.valueOf("2022-05-01 00:00:00")
  private val t1 = java.sql.Timestamp.valueOf("2022-05-02 00:00:00")

  test("changelog classifies added, removed, changed; ignores ingest churn") {
    val old = snap(Seq(
      ("c1", "a", "p1", t0),
      ("c1", "b", "p2", t0),
      ("c1", "c", "p3", t0),
      ("c2", "d", "p4", t0)))
    val neu = snap(Seq(
      ("c1", "a", "p1", t1), // ingested_at-only churn → NOT a change
      ("c1", "b", "p2-edited", t1), // changed
      // c dropped → removed
      ("c2", "d", "p4", t0), // untouched
      ("c2", "e", "p5", t1))) // added
    val log = CatalogDiff.changelog(old, neu).collect()
      .map(r => (r.getString(1), r.getString(2))).toMap
    assert(log == Map("b" -> "changed", "c" -> "removed", "e" -> "added"))
    val sum = CatalogDiff.summarize(CatalogDiff.changelog(old, neu))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(sum("c1") == ((0L, 1L, 1L)))
    assert(sum("c2") == ((1L, 0L, 0L)))
  }

  test("changelog is column-order independent") {
    val old = snap(Seq(("c1", "a", "p1", t0)))
    // same content, columns selected in a different order
    val neu = snap(Seq(("c1", "a", "p1", t0)))
      .select("ingested_at", "payload", "item_id", "collection_id")
    assert(CatalogDiff.changelog(old, neu).count() == 0,
      "a reordered but identical snapshot must produce an empty changelog")
  }
}
