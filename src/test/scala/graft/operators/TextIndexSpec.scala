package graft.operators

import graft.SparkSpec

/** The persisted inverted index (snk_text_index / text_bm25_indexed):
  * the index-served BM25 must reproduce the scan-time BM25 exactly,
  * and serving must touch only the pruned index artifacts — never the
  * corpus. (The audit numbers themselves are oracle-checked by the
  * driver gate; here we pin path parity and the serve plan.)
  */
class TextIndexSpec extends SparkSpec {

  test("index-served bm25 equals scan-time bm25 row for row") {
    val served = TextQueries.textBm25Indexed(spark, sf).collect().toSeq
    val scanned = TextQueries.textBm25(spark, sf).collect().toSeq
    assert(served == scanned,
      s"index path diverged:\nserved=$served\nscanned=$scanned")
  }

  test("serve plan prunes term buckets and never scans the corpus") {
    val df = TextQueries.textBm25Indexed(spark, sf)
    df.collect() // AQE finalizes on execution
    val p = df.queryExecution.executedPlan.toString
    // the bucket predicate must act as directory-level partition
    // pruning, and the term predicate as a pushed row-group filter
    assert(p.contains("PartitionFilters") && p.contains("bucket"),
      s"no bucket partition pruning:\n$p")
    assert(p.contains("In(term"), s"term filter not pushed:\n$p")
    // df and stats arrive broadcast; the top-20 is a heap, not a sort
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), s"serve must not shuffle-join:\n$p")
    // nothing corpus-sized: the documents table is absent from the plan
    assert(!p.contains("documents.parquet"),
      s"serving must read the index, not the corpus:\n$p")
  }

  test("audit counts the written postings, not the in-flight frame") {
    val row = TextQueries.snkTextIndex(spark, sf).collect().head
    val nDocs = row.getAs[Long]("n_docs")
    val nPostings = row.getAs[Long]("n_postings")
    val totalTf = row.getAs[Long]("total_tf")
    assert(nDocs > 0 && nPostings >= nDocs && totalTf >= nPostings,
      s"degenerate audit: $row")
  }
}
