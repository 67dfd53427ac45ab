package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Temporary profiling harness (not an assertion spec): times the
  * langid pipeline's phases at whatever dir GRAFT_PROFILE_DIR names.
  * Skipped unless the env var is set. */
class ProfileLangidSpec extends SparkSpec {
  test("profile phases") {
    val dir = sys.env.getOrElse("GRAFT_PROFILE_DIR", "")
    assume(dir.nonEmpty)
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val d = graft.Tables.documents(spark, dir)
    val toks = d
      .select(col("doc_id"), col("lang"),
        substring(col("text"), 1, 256).as("px"))
      .filter(length(col("px")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(1, length(px) - 1), i -> substr(px, i, 2))"))
        .as("tok"))
    val train = toks.filter(pmod(col("doc_id"), lit(10)) < 7)
    val test = toks.filter(pmod(col("doc_id"), lit(10)) >= 7)
      .select(col("doc_id"), col("tok"))
    t("train_explode_count")(train.count())
    val cnt = t("cnt_build")(train.groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumnRenamed("lang", "clang").localCheckpoint(true))
    val prior = t("prior_distinct")(
      train.select(col("doc_id"), col("lang")).distinct()
        .groupBy(col("lang")).agg(count(lit(1)).as("nd"))
        .withColumnRenamed("lang", "clang").localCheckpoint(true))
    val tot = cnt.groupBy(col("clang")).agg(sum(col("cnt")).as("tot"))
    val vsz = cnt.agg(countDistinct(col("tok")).as("v"))
    val testCnt = test.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("n"))
    t("test_dedup_count")(testCnt.count())
    val fan = testCnt.crossJoin(broadcast(tot))
      .join(broadcast(cnt), Seq("clang", "tok"), "left")
      .crossJoin(broadcast(vsz))
      .select(col("doc_id"), col("clang"),
        (col("n").cast("double") *
          log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
            (col("tot") + col("v")).cast("double"))).as("lp"))
    t("fanout_score")(fan.groupBy(col("doc_id"), col("clang"))
      .agg(sum(col("lp")).as("slp")).count())
    t("full_operator")(TextQueries.textLangidNb(spark, dir).count())
  }
}
