package graft.operators

import graft.SparkSpec

/** Dirty-ingest behavior: PERMISSIVE JSONL reading must quarantine
  * exactly the malformed lines — never fail the job, never silently
  * drop a row. */
class SourceFormatsSpec extends SparkSpec {

  test("jsonl read quarantines exactly the planted corrupt lines") {
    val r = SourceSinkQueries.srcJsonlQuarantine(spark, sf).collect()(0)
    assert(r.getLong(0) == 20L, s"parsed ${r.getLong(0)} good lines")
    assert(r.getLong(1) == 3L, s"quarantined ${r.getLong(1)} lines")
  }
}
