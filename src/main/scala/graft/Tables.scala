package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Test-table loaders. The driver passes a scale-factor directory
  * (e.g. /root/testdata/sf0.01) containing one parquet file per table
  * (TESTDATA.md). All engine queries read through here so the physical
  * layout (single file now, partitioned dirs at scale) is swappable.
  *
  * Every load is checked against the FIXTURES.md §A shape with a loud
  * diff message: round 8's lesson is that a silently regenerated fixture
  * (events.ts drifted parquet TIMESTAMP(NANOS) → timestamp[us]) broke a
  * 21-query family at analysis time with no red signal. The guard turns
  * the next drift into a one-line diagnosis at first read.
  */
object Tables {

  /** Coarse type families for the drift guard: fixture regenerations may
    * legitimately widen int32→int64 or ms→µs timestamps; those must not
    * trip the guard, while string→int or a dropped column must. */
  private def family(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "int"
    case FloatType | DoubleType | _: DecimalType       => "num"
    case StringType                                    => "string"
    case TimestampType | TimestampNTZType | DateType   => "time"
    case a: ArrayType                                  => s"array<${family(a.elementType)}>"
    case other                                         => other.simpleString
  }

  /** Expected (column, type-family) shape per table — FIXTURES.md §A.
    * Extra columns are allowed; missing or family-mismatched ones fail. */
  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region"   -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation"   -> Seq("n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "int", "c_name" -> "string", "c_nationkey" -> "int",
                      "c_acctbal" -> "num", "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "int", "s_name" -> "string", "s_nationkey" -> "int",
                      "s_acctbal" -> "num"),
    "part"     -> Seq("p_partkey" -> "int", "p_name" -> "string", "p_brand" -> "string",
                      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "num"),
    "orders"   -> Seq("o_orderkey" -> "int", "o_custkey" -> "int", "o_orderstatus" -> "string",
                      "o_totalprice" -> "num", "o_orderdate" -> "time", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "int", "l_partkey" -> "int", "l_suppkey" -> "int",
                      "l_linenumber" -> "int", "l_quantity" -> "num", "l_extendedprice" -> "num",
                      "l_discount" -> "num", "l_tax" -> "num", "l_returnflag" -> "string",
                      "l_linestatus" -> "string", "l_shipdate" -> "time"),
    "events"   -> Seq("event_id" -> "int", "ts" -> "time", "user_id" -> "int",
                      "event_type" -> "string", "value" -> "num", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "int", "text" -> "string", "lang" -> "string",
                       "source" -> "string", "n_chars" -> "int"),
    "embeddings" -> Seq("vec_id" -> "int", "embedding" -> "array<num>", "label" -> "int")
  )

  private def guard(name: String, df: DataFrame): DataFrame = {
    expected.get(name).foreach { exp =>
      val got = df.schema.fields.map(f => f.name -> family(f.dataType)).toMap
      val bad = exp.collect {
        case (col, fam) if !got.get(col).contains(fam) =>
          s"$col: expected $fam, got ${got.getOrElse(col, "ABSENT")}"
      }
      require(
        bad.isEmpty,
        s"fixture drift in $name.parquet — ${bad.mkString("; ")}. " +
          s"Actual schema: ${df.schema.simpleString}. " +
          "Update Tables.expected + FIXTURES.md together if the new shape is intended."
      )
    }
    df
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    // events must normalize ts BEFORE the guard: on a legacy
    // TIMESTAMP(NANOS) fixture the raw read is LongType and the generic
    // guard would report "fixture drift" for a layout the events loader
    // explicitly supports. Route through the normalizing loader.
    if (name == "events") eventsRaw(spark, dir)
    else guard(name, spark.read.parquet(s"$dir/$name.parquet"))

  /** events.ts has shipped in two physical layouts across driver fixture
    * generations: parquet TIMESTAMP(NANOS) (Spark reads it as long nanos
    * under the legacy conf) and plain timestamp[us] (read as
    * TIMESTAMP_NTZ). Normalize either to a session-UTC TimestampType at
    * microsecond precision — identical to DuckDB's `CAST(ts AS
    * TIMESTAMP)` in the oracle SQL, so hashes match on both layouts. */
  private[graft] def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type ${other.simpleString}; expected INT64 " +
            "nanos or a timestamp — fixture drifted to a third layout?")
    }
  }

  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    // Harmless for µs files, required to read legacy TIMESTAMP(NANOS).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    guard("events", normalizeEventsTs(spark.read.parquet(s"$dir/events.parquet")))
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame   = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
