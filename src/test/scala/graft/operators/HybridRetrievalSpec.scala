package graft.operators

import graft.SparkSpec

/** sim_hybrid_rrf / sim_hybrid_serve — reciprocal-rank fusion of the
  * BM25 lexical pool and the cosine dense pool. The DuckDB oracles
  * hash-pin the exact rows at the gate scales; these tests pin the
  * SEMANTICS so a refactor can't silently change what the numbers
  * mean: rank provenance (each emitted rank must reproduce its
  * system's own ordering), the RRF formula itself, and the
  * serve-tier's lexical-parity contract.
  */
class HybridRetrievalSpec extends SparkSpec {

  private lazy val fused =
    SimilarityQueries.simHybridRrf(spark, sf).collect()
  private lazy val served =
    SimilarityQueries.simHybridServe(spark, sf).collect()
  private lazy val scanLexPool =
    TextQueries.bm25Top(spark, sf, 50)
      .select("doc_id").collect().map(_.getLong(0))

  test("fused output is rrf-descending with doc_id tiebreak; " +
    "ranks stay inside the pool bound") {
    assert(fused.nonEmpty)
    val keys = fused.map(r => (r.getDouble(3), r.getLong(0))).toSeq
    assert(keys == keys.sortBy { case (v, id) => (-v, id) })
    fused.foreach { r =>
      Seq(1, 2).foreach { i =>
        if (!r.isNullAt(i))
          assert(r.getLong(i) >= 1L && r.getLong(i) <= 50L)
      }
      // a doc with NO rank in either system cannot be in the output
      assert(!(r.isNullAt(1) && r.isNullAt(2)))
    }
  }

  test("rrf equals the reciprocal-rank formula over the emitted ranks") {
    fused.foreach { r =>
      val lex = if (r.isNullAt(1)) 0.0 else 1.0 / (60 + r.getLong(1))
      val den = if (r.isNullAt(2)) 0.0 else 1.0 / (60 + r.getLong(2))
      assert(math.abs(r.getDouble(3) - (lex + den)) < 5e-7,
        s"row $r does not satisfy rrf = 1/(60+lex) + 1/(60+dense)")
    }
  }

  test("lexical ranks reproduce the BM25 pool's own ordering") {
    fused.filter(!_.isNullAt(1)).foreach { r =>
      val rank = r.getLong(1).toInt
      assert(scanLexPool(rank - 1) == r.getLong(0),
        s"doc ${r.getLong(0)} claims lexical rank $rank but the " +
          s"BM25 pool has ${scanLexPool(rank - 1)} there")
    }
  }

  test("dense ranks reproduce the exact-cosine pool's own ordering") {
    import org.apache.spark.sql.functions._
    val densePool = SimilarityQueries
      .simTopkCosinePool(spark, sf, 50)
      .select(col("doc_id")).collect().map(_.getLong(0))
    fused.filter(!_.isNullAt(2)).foreach { r =>
      val rank = r.getLong(2).toInt
      assert(densePool(rank - 1) == r.getLong(0))
    }
  }

  test("serve-tier fusion holds the same invariants and the lexical " +
    "side is scan-identical (the indexed-BM25 parity contract)") {
    assert(served.nonEmpty)
    val keys = served.map(r => (r.getDouble(3), r.getLong(0))).toSeq
    assert(keys == keys.sortBy { case (v, id) => (-v, id) })
    served.filter(!_.isNullAt(1)).foreach { r =>
      val rank = r.getLong(1).toInt
      assert(scanLexPool(rank - 1) == r.getLong(0))
    }
    served.foreach { r =>
      val lex = if (r.isNullAt(1)) 0.0 else 1.0 / (60 + r.getLong(1))
      val den = if (r.isNullAt(2)) 0.0 else 1.0 / (60 + r.getLong(2))
      assert(math.abs(r.getDouble(3) - (lex + den)) < 5e-7)
    }
  }

  test("batch fusion: query 1 (the single serve's own terms + vector) " +
    "is hash-identical to the single-query hybrid serve") {
    val batch = SimilarityQueries.simHybridServeBatch(spark, sf).collect()
    assert(batch.nonEmpty)
    val q1 = batch.filter(_.getInt(0) == 1)
      .map(r => (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getDouble(4))).toSeq
    val single = served
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getDouble(3))).toSeq
    assert(q1 == single)
    // every batch query fuses validly
    batch.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      val keys = rows.map(r => (r.getDouble(4), r.getLong(1))).toSeq
      assert(keys == keys.sortBy { case (v, id) => (-v, id) })
    }
  }
}
