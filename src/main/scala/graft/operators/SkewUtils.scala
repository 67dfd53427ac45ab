package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helper (SURVEY.md §7 M7): salted equi-join for the
  * case AQE's skew splitting can't fix — a build side small enough to
  * replicate but a probe side with pathological key skew (one key ≫
  * everything else, e.g. a viral document's LSH bucket or a hot
  * collection).
  *
  * probe gains a uniform salt in [0, n); build is exploded ×n with
  * every salt value; the join key becomes (key, salt), spreading the
  * hot key over n reducers. Semantically identical to the plain
  * equi-join (inner/left_semi).
  */
object SkewUtils {

  def saltedInnerJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      salts: Int = 8): DataFrame = {
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
