package graft.operators

import graft.SparkSpec

/** Quality-threshold curation: the exact-percentile filter (oracle
  * path) and the approx_percentile filter (100 TB path) must agree on
  * the kept set up to sketch error. */
class CurationSpec extends SparkSpec {

  test("chunks reconstruct every document losslessly") {
    // stride-S chunking invariant: the first S words of every chunk
    // except the last, plus the whole last chunk, concatenate back to
    // the original token stream — no token lost or duplicated at
    // chunk boundaries
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
    val chunks = TextQueries.textChunk(spark, sf)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)).toSeq)
      .toMap
    val original = docs.select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == original.keySet)
    original.foreach { case (id, text) =>
      val cs = chunks(id)
      val rebuilt = (cs.dropRight(1).map(_.split(" ", -1).take(48))
        :+ cs.last.split(" ", -1)).flatten
      assert(rebuilt.toSeq == text.split(" ", -1).toSeq,
        s"doc $id does not reconstruct from its chunks")
      // overlap: consecutive chunks share width-stride = 16 words
      cs.sliding(2).foreach {
        case Seq(a, b) =>
          val aw = a.split(" ", -1); val bw = b.split(" ", -1)
          assert(aw.drop(48).sameElements(bw.take(aw.length - 48)),
            s"doc $id chunk overlap broken")
        case _ =>
      }
    }
  }

  test("approx-percentile filter agrees with the exact filter") {
    val exact = TextQueries.textQualityFilter(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approx = TextQueries.textQualityFilterApprox(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // accuracy 10000 on a small corpus: the sketch is exact up to
    // interpolation at the cut, so the sets differ by at most the
    // handful of docs tied at the threshold
    val sym = (exact diff approx) union (approx diff exact)
    assert(exact.nonEmpty && approx.nonEmpty)
    assert(sym.size <= math.max(2, exact.size / 20),
      s"kept sets diverge by ${sym.size} of ${exact.size}")
  }

  test("filter keeps roughly the top 80% and every kept doc clears the bar") {
    val rows = TextQueries.textQualityFilter(spark, sf)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val n = graft.Tables.documents(spark, sf).count()
    assert(rows.forall { case (q, t) => q >= t })
    assert(rows.length >= (n * 0.75).toInt && rows.length <= n,
      s"kept ${rows.length} of $n")
  }
}
