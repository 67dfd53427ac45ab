package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The property that makes sort_zorder a clustering key and not just
  * a funny sort: consecutive chunks of a z-ordered table have BOUNDED
  * min/max envelopes on BOTH dimensions, so file/row-group stats can
  * prune a predicate on either one. A linear sort bounds only its own
  * dimension.
  */
class ZorderSpec extends SparkSpec {

  test("morton key interleaves bits exactly") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val rows = Seq((3L, 5L), (0L, 1L), (65535L, 0L), (0L, 65535L),
        (21845L, 43690L), (65535L, 65535L))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        RelationalQueries.mortonKey(col("x"), col("y")).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // the extremes pin the key into 32 bits
    assert(ref(65535L, 65535L) == (1L << 32) - 1)
  }

  test("z-ordered chunks bound BOTH dimension spans; linear sort does not") {
    import spark.implicits._
    val n = 64 // dense n×n grid: 4096 cells → 16 chunks of 256
    val grid = (0 until n * n).map(i => (i.toLong % n, i.toLong / n))
      .toDF("x", "y")
    def maxSpans(keyed: DataFrame): (Long, Long) = {
      val w = Window.orderBy(col("k"), col("x"), col("y"))
      val chunks = keyed.withColumn("c", ntile(16).over(w))
        .groupBy("c")
        .agg((max(col("x")) - min(col("x"))).as("sx"),
          (max(col("y")) - min(col("y"))).as("sy"))
        .collect()
      (chunks.map(_.getAs[Long]("sx")).max,
        chunks.map(_.getAs[Long]("sy")).max)
    }
    val (zx, zy) = maxSpans(grid.select(col("x"), col("y"),
      RelationalQueries.mortonKey(col("x"), col("y")).as("k")))
    val (lx, ly) = maxSpans(grid.select(col("x"), col("y"),
      col("x").as("k")))
    // 256-cell z-chunks are 16×16 tiles: both spans ≤ 16, so a
    // predicate on EITHER dim prunes ~15/16 of the chunks
    assert(zx <= 16 && zy <= 16, s"z spans ($zx, $zy)")
    // the linear sort bounds its own dim tightly but every chunk
    // spans the FULL secondary range — zero pruning for y-predicates
    assert(lx <= 4, s"x-sorted x span $lx")
    assert(ly == (n - 1).toLong, s"x-sorted y span $ly")
  }
}
