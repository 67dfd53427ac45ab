package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.10): union of bounding boxes — the
  * aggregate behind collection spatial extents, which pgstac maintains
  * server-side for the reference (collections.yaml extent.spatial;
  * summary maintenance noted in SURVEY §2.4 agg_extent).
  *
  * Buffer is 4 doubles; merge is associative+commutative min/max, so
  * Spark runs it as partial+final aggregation — shuffle carries one
  * buffer per group per partition.
  */
object BboxUnionAgg {

  case class Bbox(w: Double, s: Double, e: Double, n: Double)

  val empty: Bbox = Bbox(
    Double.PositiveInfinity, Double.PositiveInfinity,
    Double.NegativeInfinity, Double.NegativeInfinity)

  val agg: Aggregator[Bbox, Bbox, Bbox] = new Aggregator[Bbox, Bbox, Bbox] {
    def zero: Bbox = empty
    def reduce(b: Bbox, a: Bbox): Bbox = merge(b, a)
    def merge(x: Bbox, y: Bbox): Bbox = Bbox(
      math.min(x.w, y.w), math.min(x.s, y.s),
      math.max(x.e, y.e), math.max(x.n, y.n))
    def finish(r: Bbox): Bbox = r
    def bufferEncoder: Encoder[Bbox] = Encoders.product[Bbox]
    def outputEncoder: Encoder[Bbox] = Encoders.product[Bbox]
  }
}
