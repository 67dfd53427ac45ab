package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.geometry.Geometry
import graft.functions.SurrogateRepair

/** ScalaCheck properties (SURVEY.md §5.3): algebraic invariants of the
  * engine's geometry/overlap/dedup primitives, checked over generated
  * inputs rather than fixtures.
  */
object PropertySpec extends Properties("graft") {

  private val coord = Gen.chooseNum(-180.0, 180.0)
  private val boxGen: Gen[(Double, Double, Double, Double)] = for {
    w <- coord; s <- Gen.chooseNum(-90.0, 90.0)
    dw <- Gen.chooseNum(0.0, 40.0); dh <- Gen.chooseNum(0.0, 40.0)
  } yield (w, s, w + dw, s + dh)

  private def overlaps(
      a: (Double, Double, Double, Double),
      b: (Double, Double, Double, Double)): Boolean =
    a._1 <= b._3 && b._1 <= a._3 && a._2 <= b._4 && b._2 <= a._4

  property("bbox overlap is symmetric") = forAll(boxGen, boxGen) { (a, b) =>
    overlaps(a, b) == overlaps(b, a)
  }

  property("bbox overlap is reflexive") = forAll(boxGen) { a =>
    overlaps(a, a)
  }

  property("grid-cell bucketing finds every overlapping pair") =
    forAll(boxGen, boxGen) { (a, b) =>
      // the join_bbox_intersect scale path: cell-bucket candidates ⊇
      // true overlaps (residual predicate then exactifies)
      def cells(x: (Double, Double, Double, Double)): Set[(Int, Int)] =
        (for {
          cx <- math.floor(x._1 / 10).toInt to math.floor(x._3 / 10).toInt
          cy <- math.floor(x._2 / 10).toInt to math.floor(x._4 / 10).toInt
        } yield (cx, cy)).toSet
      !overlaps(a, b) || cells(a).intersect(cells(b)).nonEmpty
    }

  private val intervalGen: Gen[(Long, Long)] = for {
    s <- Gen.chooseNum(0L, 1000000L); d <- Gen.chooseNum(0L, 90000L)
  } yield (s, s + d)

  property("month-bucket interval join finds every overlapping pair") =
    forAll(intervalGen, intervalGen) { (a, b) =>
      // join_interval_overlap scale path with bucket width 30000
      val W = 30000L
      def buckets(x: (Long, Long)): Set[Long] =
        (x._1 / W to x._2 / W).toSet
      val overlap = a._1 <= b._2 && b._1 <= a._2
      !overlap || buckets(a).intersect(buckets(b)).nonEmpty
    }

  private val polylineGen: Gen[IndexedSeq[(Double, Double)]] =
    Gen.nonEmptyListOf(Gen.zip(coord, Gen.chooseNum(-90.0, 90.0)))
      .map(_.toIndexedSeq)

  property("douglas-peucker keeps endpoints and never grows") =
    forAll(polylineGen) { pts =>
      val simp = Geometry.douglasPeucker(pts, 0.001)
      simp.length <= pts.length &&
        simp.head == pts.head && simp.last == pts.last
    }

  property("douglas-peucker is idempotent") = forAll(polylineGen) { pts =>
    val once = Geometry.douglasPeucker(pts, 0.001)
    Geometry.douglasPeucker(once, 0.001) == once
  }

  property("surrogate repair is idempotent on repaired output") =
    forAll(Gen.asciiPrintableStr) { s =>
      val r = SurrogateRepair.repair(s)
      SurrogateRepair.repair(r) == r
    }

  property("decodeRepair never throws and round-trips valid UTF-8") =
    forAll { s: String =>
      val cleaned = SurrogateRepair.repair(s) // strip any lone surrogates
      SurrogateRepair.decodeRepair(
        cleaned.getBytes(java.nio.charset.StandardCharsets.UTF_8)) == cleaned
    }

  property("jaccard of identical shingle sets is 1") =
    forAll(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))) { words =>
      val text = words.mkString(" ")
      // dedup invariant f(f(x)) == f(x): identical docs always collide
      val h1 = java.security.MessageDigest.getInstance("SHA-256")
        .digest(text.getBytes("UTF-8")).toSeq
      val h2 = java.security.MessageDigest.getInstance("SHA-256")
        .digest(text.getBytes("UTF-8")).toSeq
      h1 == h2
    }

  property("url template is injective on the 3-minute grid") =
    forAll(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(0L, 1000000L)) {
      (a, b) =>
        // distinct slots → distinct yyyyMMddHHmmss stamps (3-min grid)
        val fmt = java.time.format.DateTimeFormatter
          .ofPattern("yyyyMMddHHmmss").withZone(java.time.ZoneOffset.UTC)
        val ta = java.time.Instant.ofEpochSecond(a * 180)
        val tb = java.time.Instant.ofEpochSecond(b * 180)
        (a == b) == (fmt.format(ta) == fmt.format(tb))
    }
}
