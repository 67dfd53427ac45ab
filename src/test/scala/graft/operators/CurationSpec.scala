package graft.operators

import graft.SparkSpec

/** Quality-threshold curation: the exact-percentile filter (oracle
  * path) and the approx_percentile filter (100 TB path) must agree on
  * the kept set up to sketch error. */
class CurationSpec extends SparkSpec {

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
