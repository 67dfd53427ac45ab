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

  test("simhash: a verbatim flood collapses to star edges, cap untouched") {
    import spark.implicits._
    val boiler = "the same boilerplate paragraph repeated verbatim in " +
      "every single document of this flood with plenty of words"
    // 600 identical docs — ABOVE the 512 band cap: pre-collapse this
    // saturated every band bucket (members past the cap silently lost
    // their pairs on exactly dedup's target corpus) and cost C(512,2)
    // candidate pairs; post-collapse banding sees ONE row for the
    // whole flood and every member keeps its membership via a star
    // edge to the representative
    val flood = (0 until 600).map(i => (i.toLong, boiler))
    val others = Seq(
      (9000L, "a tiny distinct doc about penguins and icebergs today"),
      (9001L, "a tiny distinct doc about penguins and icebergs today"))
    val pairs = DedupQueries
      .dedupSimhashFrom((flood ++ others).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val floodPairs = pairs.filter { case (a, b, _) => a < 9000 && b < 9000 }
    assert(floodPairs.length == 599,
      s"flood must yield exactly 599 star edges, got ${floodPairs.length}")
    assert(floodPairs.forall { case (a, _, h) => a == 0L && h == 0 })
    // EVERY member appears — no cap-induced recall loss at any flood size
    assert(floodPairs.map(_._2).toSet == (1L until 600L).toSet)
    // the identical pair outside the flood is a star edge too
    assert(pairs.contains((9000L, 9001L, 0)))
  }

  test("minhash: a verbatim flood collapses to star edges") {
    import spark.implicits._
    val boiler = "another boilerplate paragraph repeated verbatim in " +
      "every single document of this second flood with plenty of words"
    val flood = (0 until 600).map(i => (i.toLong, boiler))
    val pairs = DedupQueries
      .dedupNearMinhashFrom(flood.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.length == 599)
    assert(pairs.forall { case (a, _, j) => a == 0L && j == 1.0 })
    assert(pairs.map(_._2).toSet == (1L until 600L).toSet)
  }

  test("simhash: a flood of DISTINCT permuted texts keeps every member") {
    // the shape the exact collapse cannot merge: same token MULTISET,
    // different order — sha256(text) distinct (no collapse) but
    // simhash is bag-of-tokens (identical sig), so all 600 land in
    // one bucket per band, above the 512 cap. Pre-overflow, members
    // past the cap silently lost all pairs; the chained anchor
    // candidates (hamming 0 — same sig) must keep every one.
    import spark.implicits._
    val words = (0 until 40).map(i => s"tok$i")
    val docs = (0 until 600).map { i =>
      val rot = words.drop(i % 40) ++ words.take(i % 40)
      val j = i / 40 + 1
      // rotate + swap position 0 with position j: distinct orderings
      val t = if (j < rot.length)
        (rot.updated(0, rot(j)).updated(j, rot(0))) else rot
      (i.toLong, t.mkString(" "))
    }
    assert(docs.map(_._2).distinct.length == 600,
      "fixture texts must be pairwise distinct")
    val pairs = DedupQueries
      .dedupSimhashFrom(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.forall(_._3 == 0), "permutations share one sig")
    val present = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(present == (0L until 600L).toSet,
      s"distinct-flood members lost: ${(0L until 600L).toSet -- present}")
  }

  test("minhash: a flood of DISTINCT same-shingle-set texts keeps every member") {
    // distinct texts sharing ONE shingle SET: "a b c" repeated k
    // times has exactly the 3 cyclic 3-grams whatever k is, so 600
    // distinct texts (k = 2..601) collapse to nothing (distinct
    // sha256), produce IDENTICAL minhash signatures (set-based), and
    // flood every band bucket above the 512 cap; pairwise set
    // Jaccard is 1.0, so every chained anchor candidate verifies
    val base = "alpha beta gamma"
    import spark.implicits._
    val docs = (0 until 600).map { i =>
      (i.toLong, Seq.fill(i + 2)(base).mkString(" "))
    }
    assert(docs.map(_._2).distinct.length == 600)
    val pairs = DedupQueries
      .dedupNearMinhashFrom(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.forall(_._3 == 1.0), "same shingle set => jaccard 1.0")
    val present = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(present == (0L until 600L).toSet,
      s"distinct-flood members lost: ${(0L until 600L).toSet -- present}")
  }

  test("bloom-prefiltered incremental dedup is result-identical") {
    import spark.implicits._
    // dups, near-dups and uniques split across old/fresh: the bloom
    // prefilter must keep every true dup (no false negatives) and the
    // exact confirmation must kill every bloom false positive
    val base = (0 until 200).map { i =>
      (i.toLong, s"document number $i talks about topic ${i % 17} " +
        s"in enough words to shingle properly ${i % 5}")
    }
    // fresh ids end in 7; every other one copies an old doc verbatim
    // ((id+3) % 200 ends in 0 — an old id); two null-text rows (one
    // per side) must flow through both variants without NPE
    val docs = (base.map { case (id, t) =>
      if (id % 10 == 7 && (id / 10) % 2 == 0)
        (id, base(((id + 3) % 200).toInt)._2)
      else (id, t)
    } ++ Seq((900L, null: String), (907L, null: String)))
      .toDF("doc_id", "text")
    val old = docs.filter(col("doc_id") % 10 =!= 7)
    val fresh = docs.filter(col("doc_id") % 10 === 7)
    val plain = DedupQueries.dedupIncrementalFrom(old, fresh)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val bloom = DedupQueries.dedupIncrementalBloomFrom(old, fresh)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(bloom == plain, "bloom variant must be byte-identical")
    assert(plain.exists(_._2 == 1), "fixture must contain true exact dups")
    assert(plain.exists(_._2 == 0), "fixture must contain non-dups")
  }
}
