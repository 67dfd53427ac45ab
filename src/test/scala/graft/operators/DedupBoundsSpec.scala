package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BLOCK_CAP bound for the prefix-blocked n-gram Jaccard dedup: an
  * identical-text flood (one giant block) must pair only its first
  * BLOCK_CAP members, never all-pairs. */
class DedupBoundsSpec extends SparkSpec {

  test("identical-text flood pairs are capped at C(BLOCK_CAP, 2)") {
    import spark.implicits._
    val boiler = "the same boilerplate paragraph repeated in every doc " +
      "with enough words for three grams"
    val flood = (0 until 600).map(i => (i.toLong, boiler))
    val small = Seq((9000L, "a tiny distinct doc about penguins and ice"),
      (9001L, "a tiny distinct doc about penguins and ice"))
    val docs = (flood ++ small).toDF("doc_id", "text")
    val pairs = DedupQueries.dedupNgramJaccardFrom(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cap = 256
    val floodPairs = pairs.count { case (a, b) => a < 9000 && b < 9000 }
    assert(floodPairs == cap * (cap - 1) / 2,
      s"flood produced $floodPairs pairs, want C($cap,2)")
    // members past the cap never appear in any pair
    assert(!pairs.exists { case (a, b) =>
      (a >= cap && a < 9000) || (b >= cap && b < 9000) })
    // an unrelated small block is untouched by the cap
    assert(pairs.contains((9000L, 9001L)))
  }
}
