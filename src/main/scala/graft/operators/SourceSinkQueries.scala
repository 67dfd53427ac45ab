package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.{CatalogQuery, CatalogStore, CollectionsYaml, ItemAssembly}
import graft.functions.SurrogateRepair
import graft.geometry.Geometry
import graft.ingest.{FixtureGranuleSource, ListingCache}

/** Source/sink and ingest-adjacent operators (SURVEY.md §2.1 remainder
  * + non-oracle §2.2 ops): listing cache, glob/binary sources, the
  * scientific-granule source, YAML collections, catalog upsert, the
  * geometry-extraction UDF and byte-level surrogate repair — each
  * declared so the driver harness executes the real code path
  * (rows-only where DuckDB cannot express the semantics).
  */
object SourceSinkQueries {

  /** src_listing_cache — content-addressed cache keys: sha256(glob)
    * (insitu recipe.py:31-35). The key derivation is oracle-checked;
    * the probe/write cycle is unit-tested in GeometrySpec. */
  def srcListingCache(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)

  private def documents(s: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(lit("https://host/"), col("source"), lit("/"),
          col("lang"), lit("/201*.nc")).as("glob"))
      .select(col("doc_id"), col("glob"),
        sha2(col("glob"), 256).as("cache_key"))

  val srcListingCacheSql: String =
    """SELECT doc_id,
      |  'https://host/' || source || '/' || lang || '/201*.nc' AS glob,
      |  sha256('https://host/' || source || '/' || lang || '/201*.nc')
      |    AS cache_key
      |FROM documents""".stripMargin

  /** src_glob_listing — Hadoop glob enumeration
    * (`sorted(fs.glob(...))`, insitu recipe.py:40). The fixture dir is
    * the pinned 10-table TESTDATA layout, so the sorted listing is a
    * constant. Output is the file NAME (plus the scheme witness that
    * the path really came back from the Hadoop filesystem layer): the
    * absolute prefix is whichever sfDir this run was pointed at, which
    * a static oracle cannot know — an earlier oracle hardcoded the
    * sf0.01 path and went false-red at every other scale the local
    * gate runs. */
  def srcGlobListing(s: SparkSession, dir: String): DataFrame =
    ListingCache.globListing(s, s"file:$dir/*.parquet")
      .select(regexp_extract(col("url"), "([^/]+)$", 1).as("file_name"),
        col("url").startsWith("file:").as("hadoop_scheme"))
      .orderBy(col("file_name"))

  val srcGlobListingSql: String =
    """SELECT t || '.parquet' AS file_name, TRUE AS hadoop_scheme
      |FROM (VALUES ('region'),('nation'),('customer'),('supplier'),
      |  ('part'),('orders'),('lineitem'),('events'),('documents'),
      |  ('embeddings')) AS v(t)
      |ORDER BY file_name""".stripMargin

  /** src_open_url — opened-file handles as rows: Spark's binaryFile
    * source over the test tables (the engine form of
    * OpenURLWithFSSpec, avhrr recipe.py:124 — for local/HDFS/S3
    * filesystems; HTTP lists get a custom V2 provider later).
    * Metadata-only projection: content bytes are NOT read. Output is
    * the file NAME plus a non-emptiness witness — the absolute path
    * and byte size are environment facts an oracle can't re-derive,
    * the fixture-table name set is pinned by the Tables guard. */
  def srcOpenUrl(s: SparkSession, dir: String): DataFrame =
    s.read.format("binaryFile")
      .load(s"$dir/*.parquet")
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
        (col("length") > 0).as("non_empty"))
      .orderBy(col("file_name"))

  /** The fixture dir always holds exactly the 10 TESTDATA tables (the
    * same layout pin as snk_listing_cache), so the listed names are a
    * constant; non-emptiness is the one size fact that survives
    * fixture regeneration. */
  val srcOpenUrlSql: String =
    """SELECT t || '.parquet' AS file_name, TRUE AS non_empty
      |FROM (VALUES ('region'),('nation'),('customer'),('supplier'),
      |  ('part'),('orders'),('lineitem'),('events'),('documents'),
      |  ('embeddings')) AS v(t)""".stripMargin

  /** src_scientific — the granule-metadata source behind the
    * GranuleSource trait (OpenWithXarray's role, avhrr
    * recipe.py:125-127): one metadata row per granule, generated
    * distributedly. */
  def srcScientific(s: SparkSession, dir: String): DataFrame =
    new FixtureGranuleSource().granules(s)

  /** The full 478-row granule table re-derived from first principles
    * at SQL-build time: the grid/missing/url/bbox arithmetic is
    * replayed in plain Java time/long math, and the hash-mixed
    * latitudes via the PUBLIC XXH64 algorithm (seed 42 over the
    * timestamp's microsecond long — exactly what Spark's xxhash64
    * hashes for a TimestampType column). The emitted VALUES are
    * engine-independent constants, so distributed grid generation,
    * the anti-join, and every derivation column are hash-gated. */
  val srcScientificSql: String = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val start = java.time.LocalDateTime.parse("2022-05-01T00:01:03")
    val end = java.time.LocalDateTime.parse("2022-05-01T23:59:59")
    val missing = Set("2022-05-01T08:01:03", "2022-05-01T17:31:03")
    val urlFmt =
      java.time.format.DateTimeFormatter.ofPattern("yyyy/DDD/yyyyMMddHHmmss")
    val isoFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss")
    val sqlFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    val compactFmt =
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
    val rows = Iterator.iterate(start)(_.plusMinutes(3))
      .takeWhile(!_.isAfter(end))
      .filterNot(t => missing.contains(t.format(isoFmt)))
      .map { t =>
        val slot = t.toEpochSecond(java.time.ZoneOffset.UTC)
        val lat = Math.floorMod(XXH64.hashLong(slot * 1000000L, 42L), 120L) - 60L
        val w = slot % 170 - 85
        val wStr = if (slot % 97 == 0) "not-a-number" else w.toString
        s"(TIMESTAMP '${t.format(sqlFmt)}', " +
          s"'https://example.org/sst/${t.format(urlFmt)}-OSISAF-L2P.nc', " +
          s"'AVHRR_SST_METOP_B-OSISAF-L2P-v1.0', " +
          s"'granule-${t.format(compactFmt)}', " +
          s"'$wStr', '$lat', '${w + 10}', '${lat + 8}', " +
          s"'${t.format(isoFmt)}', '${t.plusMinutes(3).format(isoFmt)}')"
      }.mkString(",\n  ")
    s"""SELECT * FROM (VALUES
       |  $rows
       |) AS t(ts, source, id, uuid, westernmost_longitude,
       |  southernmost_latitude, easternmost_longitude,
       |  northernmost_latitude, time_coverage_start, time_coverage_end)"""
      .stripMargin
  }

  /** src_scientific_v2 — the DataSourceV2 granule source: partitioned
    * virtual table of granule metadata (graft.ingest.v2); the V2
    * skeleton a NetCDF reader plugs into. Aggregated so the output is
    * compact but every partition is read. */
  def srcScientificV2(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.ingest.v2.GranuleGridSource")
      .option("start", "2022-05-01T00:01:03Z")
      .option("end", "2022-05-02T23:59:59Z")
      .load()
      .groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_granules"),
        countDistinct(col("uuid")).as("n_unique"),
        min(col("time_coverage_start")).as("first_start"),
        max(col("time_coverage_end")).as("last_end"))

  /** The V2 grid source is deterministic: 480 three-minute granules
    * per day over the two-day option range, every uuid unique, and the
    * day's last coverage interval ends at 00:01:03 the next morning —
    * constants a VALUES oracle pins (partition planning or option
    * parsing drift goes hash-red). */
  val srcScientificV2Sql: String =
    """SELECT * FROM (VALUES
      |  (TIMESTAMP '2022-05-01 00:00:00', CAST(480 AS BIGINT),
      |   CAST(480 AS BIGINT), '2022-05-01T00:01:03', '2022-05-02T00:01:03'),
      |  (TIMESTAMP '2022-05-02 00:00:00', CAST(480 AS BIGINT),
      |   CAST(480 AS BIGINT), '2022-05-02T00:01:03', '2022-05-03T00:01:03')
      |) AS t(day, n_granules, n_unique, first_start, last_end)""".stripMargin

  /** src_yaml_collections — YAML collection docs → typed rows
    * (open_collections, avhrr recipe.py:84,156). */
  def srcYamlCollections(s: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempFile("collections", ".yaml")
    val in = getClass.getResourceAsStream("/collections_fixture.yaml")
    Files.write(tmp, in.readAllBytes())
    CollectionsYaml.load(s, tmp.toString).toDF()
      .select(col("id"), col("title"), col("license"),
        col("extent_temporal"), size(col("providers")).as("n_providers"),
        size(col("keywords")).as("n_keywords"))
      .orderBy(col("id"))
  }

  /** The YAML fixture is a static resource, so the typed rows the
    * parser must produce are constants — a VALUES oracle pins field
    * extraction, list sizing, and extent formatting exactly. */
  val srcYamlCollectionsSql: String =
    """SELECT * FROM (VALUES
      |  ('AVHRR_SST_METOP_B-OSISAF-L2P-v1.0',
      |   'Fixture Metop-B Sea Surface Temperature metagranules',
      |   'no conditions apply', '2016-01-19T08:07:03Z/',
      |   CAST(2 AS INT), CAST(2 AS INT)),
      |  ('INSITU_FIXTURE_013_030-BO',
      |   'Fixture In Situ Observation - Bottles',
      |   'other', '2020-01-01/', CAST(1 AS INT), CAST(2 AS INT)),
      |  ('INSITU_FIXTURE_013_030-CT',
      |   'Fixture In Situ Observation - CTD',
      |   'other', '2020-01-01/', CAST(1 AS INT), CAST(1 AS INT))
      |) AS t(id, title, license, extent_temporal, n_providers, n_keywords)
      |""".stripMargin

  /** src_csv / src_json / src_orc — format matrix beyond parquet:
    * write the nation table out in each format and read it back with
    * an EXPLICIT schema (never inference in production paths, SURVEY
    * §1.2). Roundtrip ⇒ the oracle is the original table. */
  private def roundtrip(
      s: SparkSession, dir: String, format: String): DataFrame = {
    val src = graft.Tables.nation(s, dir)
    val tmp = Files.createTempDirectory(s"graft-$format").toString + "/nation"
    src.write.format(format).mode("overwrite").save(tmp)
    s.read.format(format)
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .load(tmp)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
  }

  def srcCsv(s: SparkSession, dir: String): DataFrame = {
    val src = graft.Tables.nation(s, dir)
    val tmp = Files.createTempDirectory("graft-csv").toString + "/nation"
    src.write.option("header", "true").mode("overwrite").csv(tmp)
    s.read.option("header", "true")
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .csv(tmp)
  }

  def srcJson(s: SparkSession, dir: String): DataFrame =
    roundtrip(s, dir, "json")

  def srcOrc(s: SparkSession, dir: String): DataFrame =
    roundtrip(s, dir, "orc")

  val srcFormatSql: String = "SELECT n_nationkey, n_name, n_regionkey FROM nation"

  /** src_jsonl_quarantine — JSONL ingest with corrupt-record
    * quarantine: the crawl-dump reality where a 100 TB drop always
    * carries truncated/garbage/mistyped lines. Explicit schema (never
    * inference in a production path) + PERMISSIVE mode routes every
    * unparseable line into a corrupt-record column instead of failing
    * the job or silently dropping rows; the malformed ROW SURVIVES for
    * a quarantine sink. Output proves the split (20 parsed + 3
    * planted-corrupt). Fixture building collects 20 rows to write the
    * temp file — harness cost, not the operator; the read path is a
    * distributed scan.
    *
    * Scale: JSON parsing is per-line and schema-projected (only the
    * declared columns are parsed), so the scan parallelizes like any
    * text source; quarantine is a narrow flag, no shuffle. */
  def srcJsonlQuarantine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = Files.createTempDirectory("graft-jsonl")
    val good = graft.Tables.documents(s, dir).limit(20)
      .select(to_json(struct(col("doc_id"), col("lang"), col("n_chars"))))
      .as[String].collect()
    val corrupt = Seq(
      """{"doc_id": 999999, "lang": "en", "n_chars":""", // truncated
      "definitely not json",
      """{"doc_id": "abc", "lang": 7}""" // mistyped fields
    )
    val path = tmp.resolve("docs.jsonl")
    Files.write(path,
      (good ++ corrupt).mkString("\n").getBytes("UTF-8"))
    // fixture hygiene: file first, then dir (deleteOnExit is LIFO)
    tmp.toFile.deleteOnExit()
    path.toFile.deleteOnExit()
    val df = s.read
      .schema("doc_id LONG, lang STRING, n_chars LONG, _corrupt STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json("file:" + path)
    // count() over doc_id AND _corrupt: Spark disallows queries whose
    // referenced columns are ONLY the internal corrupt-record column,
    // and column pruning reduces a boolean projection to exactly that.
    // Every parsed line has doc_id; every quarantined line has _corrupt.
    df.agg(count(col("doc_id")).as("n_good"),
      count(col("_corrupt")).as("n_quarantined"))
  }

  /** The fixture is 20 well-formed lines (any `documents` fixture has
    * ≥20 rows) plus exactly 3 planted-corrupt ones, so the quarantine
    * split is a constant: a parser that drops, fails, or mis-routes a
    * line goes hash-red instead of rows-only-green. */
  val srcJsonlQuarantineSql: String =
    """SELECT CAST(20 AS BIGINT) AS n_good,
      |  CAST(3 AS BIGINT) AS n_quarantined""".stripMargin

  /** snk_listing_cache — the cache write+hit cycle
    * (insitu recipe.py:35-44): miss lists and writes parquet, hit
    * reads it back without re-listing. Output proves both paths. */
  def snkListingCache(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cacheRoot = Files.createTempDirectory("graft-lc").toString
    var listerCalls = 0
    def lister(glob: String): DataFrame = {
      listerCalls += 1
      ListingCache.globListing(s, glob)
    }
    val glob = s"file:$dir/*.parquet"
    val first = ListingCache.cachedListing(s, glob, cacheRoot)(lister).count()
    val second = ListingCache.cachedListing(s, glob, cacheRoot)(lister).count()
    Seq((first, second, listerCalls))
      .toDF("miss_count", "hit_count", "lister_calls")
  }

  /** The fixture dir always holds exactly the 10 TESTDATA tables (the
    * Tables guard pins that layout), so the miss/hit listing counts and
    * the single lister invocation are constants. */
  val snkListingCacheSql: String =
    """SELECT CAST(10 AS BIGINT) AS miss_count,
      |  CAST(10 AS BIGINT) AS hit_count,
      |  CAST(1 AS INT) AS lister_calls""".stripMargin

  /** snk_upsert + snk_parquet_catalog — ingest → partitioned catalog →
    * idempotent re-upsert; output proves idempotence (count stable,
    * item_id unique). Side-effectful, but the outcome is a fixture
    * constant ⇒ VALUES oracle (see [[snkUpsertSql]]). */
  def snkUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = Files.createTempDirectory("graft-snk").toString + "/items"
    val (items, _) = ItemAssembly.assemble(
      new FixtureGranuleSource(end = "2022-05-01 03:59:59").granules(s))
    CatalogStore.write(items, path)
    val n1 = CatalogStore.read(s, path).count()
    CatalogStore.upsert(s, path, items) // re-ingest: must be a no-op
    val after = CatalogStore.read(s, path)
    val n2 = after.count()
    val distinct = after.select("item_id").distinct().count()
    Seq((n1, n2, distinct, n1 == n2 && n2 == distinct))
      .toDF("initial_count", "after_upsert", "distinct_ids", "idempotent")
  }

  /** The 00:01:03–03:59:59 grid holds 80 three-minute slots, none in
    * the planted missing list; exactly one (unix_seconds % 97 == 0)
    * carries an unparsable bbox and is strict-cast quarantined by item
    * assembly ⇒ 79 catalog items, stable across the re-upsert. */
  val snkUpsertSql: String =
    """SELECT CAST(79 AS BIGINT) AS initial_count,
      |  CAST(79 AS BIGINT) AS after_upsert,
      |  CAST(79 AS BIGINT) AS distinct_ids, TRUE AS idempotent""".stripMargin

  /** catalog_changelog — snapshot CDC through the real store: write a
    * catalog, upsert a delta that MODIFIES some items and ADDS others,
    * and diff the two snapshots. The output row proves the changelog
    * classifies exactly the touched items (and that an untouched
    * re-ingest contributes nothing). The FixtureGranuleSource grid is
    * deterministic — 20 hour-0 items modified, 40 items in hours 4-5
    * added, none removed — so the expected deltas are constants and a
    * VALUES oracle pins the classification exactly; CatalogDiffSpec
    * covers removed/changed corners. */
  def catalogChangelog(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.catalog.CatalogDiff
    val (v1Path, path, nChangedExp) = ensureChangelogFixture(s)
    val v1 = s.read.parquet(v1Path)
    val v2 = CatalogStore.read(s, path)
    val log = CatalogDiff.changelog(v1, v2)
    val byChange = log.groupBy(col("change")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq((byChange.getOrElse("added", 0L),
      byChange.getOrElse("changed", 0L),
      byChange.getOrElse("removed", 0L),
      byChange.getOrElse("changed", 0L) == nChangedExp))
      .toDF("n_added", "n_changed", "n_removed", "changed_matches")
  }

  /** The changelog's two snapshots, built ONCE per JVM (the same
    * build-vs-serve split as the persisted indexes; Bench force-builds
    * in warmup): the declared qid then measures the CDC diff — the
    * query path a deployment re-runs — not the fixture's write-upsert
    * cycle. Returns (v1 snapshot path, store path, expected changed). */
  private val changelogFixture =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String, Long)]()

  private[graft] def ensureChangelogFixture(
      s: SparkSession): (String, String, Long) =
    changelogFixture.computeIfAbsent("fixture", { _ =>
      MemoBuilds.record("changelog_fixture")
      import s.implicits._
      val path = Files.createTempDirectory("graft-cdc").toString + "/items"
      val (items, _) = ItemAssembly.assemble(
        new FixtureGranuleSource(end = "2022-05-01 03:59:59").granules(s))
      CatalogStore.write(items, path)
      // pin v1 as its OWN snapshot copy. cache() is NOT enough twice
      // over: unmaterialized it would lazily re-read the post-upsert
      // files, and materialized the CacheManager plan-matches the
      // identical v2 read and serves IT from the v1 cache — either way
      // the diff compares a snapshot with itself and reports nothing
      val v1Path = Files.createTempDirectory("graft-cdc-v1").toString + "/v1"
      CatalogStore.read(s, path).write.parquet(v1Path)
      val v1 = s.read.parquet(v1Path)
      // delta: hour-0 items re-ingested with a bumped ingested_at and a
      // CHANGED source_url; hours 4-5 are NEW
      val changedIds = items.filter(hour(col("start_datetime")) === 0)
        .select("item_id").as[String].collect().toSet
      val changed = v1.filter(col("item_id").isin(changedIds.toSeq: _*))
        .withColumn("source_url", concat(col("source_url"), lit("?v=2")))
        .withColumn("ingested_at",
          col("ingested_at") + expr("INTERVAL 1 HOUR"))
      val (fresh, _) = ItemAssembly.assemble(
        new FixtureGranuleSource(
          start = "2022-05-01 04:01:03", end = "2022-05-01 05:59:59")
          .granules(s))
      CatalogStore.upsert(s, path, changed.unionByName(fresh))
      (v1Path, path, changedIds.size.toLong)
    })

  val catalogChangelogSql: String =
    """SELECT CAST(40 AS BIGINT) AS n_added,
      |  CAST(20 AS BIGINT) AS n_changed,
      |  CAST(0 AS BIGINT) AS n_removed,
      |  TRUE AS changed_matches""".stripMargin

  /** snk_compact — small-file compaction of an upserted catalog
    * (CatalogMaintenance): a sliver-heavy write (32 tasks × every
    * leaf) is compacted to ⌈bytes/target⌉ files per leaf with the
    * same checked swap protocol as upsert; the output row proves
    * rows survived bit-for-bit and the file count collapsed.
    * Side-effectful, but the outcome is a fixture
    * constant ⇒ VALUES oracle; crash/equivalence details in
    * CatalogMaintenanceSpec. */
  def snkCompact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.catalog.CatalogMaintenance
    val path = Files.createTempDirectory("graft-compact").toString + "/items"
    val (items, _) = ItemAssembly.assemble(
      new FixtureGranuleSource(end = "2022-05-01 03:59:59").granules(s))
    // sliver write: round-robin repartition makes EVERY task write a
    // sliver into EVERY partition dir — the anti-pattern compaction
    // exists to clean up
    CatalogStore.withMonth(items).repartition(32)
      .write.partitionBy("collection_id", "month").parquet(path)
    val before = CatalogMaintenance.fileStats(s, path)
      .agg(count(lit(1)), sum(col("n_rows"))).first()
    val (leavesSeen, leavesCompacted) =
      CatalogMaintenance.compact(s, path, targetBytes = 1L << 30)
    val after = CatalogMaintenance.fileStats(s, path)
      .agg(count(lit(1)), sum(col("n_rows"))).first()
    Seq((before.getLong(0), after.getLong(0), leavesCompacted.toLong,
        before.getLong(1) == after.getLong(1),
        after.getLong(0) == leavesSeen.toLong))
      .toDF("files_before", "files_after", "leaves_compacted",
        "rows_preserved", "one_file_per_leaf")
  }

  /** The sliver write is 32 round-robin tasks over the 80-item fixture
    * (≥2 rows per task), all landing in the single (collection, month)
    * leaf the 4-hour grid spans → exactly 32 files before, 1 after,
    * 1 leaf compacted. Constants for the fixture layout ⇒ a VALUES
    * oracle pins the whole compaction outcome. */
  val snkCompactSql: String =
    """SELECT CAST(32 AS BIGINT) AS files_before,
      |  CAST(1 AS BIGINT) AS files_after,
      |  CAST(1 AS BIGINT) AS leaves_compacted,
      |  TRUE AS rows_preserved,
      |  TRUE AS one_file_per_leaf""".stripMargin

  /** snk_train_shards — the training-shard writer: packed sequences
    * land as lang=…/shard=… parquet leaves, each leaf ONE file sorted
    * by (seq_id, seq_offset) — the layout a data loader streams
    * sequentially and prunes by partition key. repartition on the
    * leaf keys makes exactly one task own each leaf (no sliver
    * files); sortWithinPartitions costs a per-task sort, never a
    * global one. Side-effectful, but the audit row derives
    * from `documents` ⇒ oracle-checked; the output row proves rows
    * survived, every leaf is single-file, and files are internally
    * seq-ordered. */
  def snkTrainShards(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val path = Files.createTempDirectory("graft-shards").toString + "/packed"
    val packed = TextQueries.textPackSequences(s, dir)
    // the local sort MUST lead with the partition columns: the V1
    // partitioned-write path requires ordering on (lang, shard) and
    // EliminateSorts DISCARDS a user sort that doesn't conform,
    // silently writing unsorted leaves (verified on Spark 4.1.2 —
    // a (seq_id)-only sort survives in-memory by accident and breaks
    // on spill)
    packed
      .repartition(col("lang"), col("shard"))
      .sortWithinPartitions(col("lang"), col("shard"), col("seq_id"),
        col("seq_offset"))
      .write.partitionBy("lang", "shard").parquet(path)
    // _metadata.row_index is the TRUE in-file position — unlike
    // monotonically_increasing_id it stays correct when a big file
    // spans several input splits
    val back = s.read.parquet(path)
      .select(col("*"), col("_metadata.file_path").as("f"),
        col("_metadata.row_index").as("pos"))
    val filesPerLeaf = back.groupBy(col("lang"), col("shard"))
      .agg(countDistinct(col("f")).as("nf"))
      .agg(max(col("nf"))).first().getLong(0)
    val w = Window.partitionBy(col("f")).orderBy(col("pos"))
    val disorder = back
      .withColumn("prev", lag(col("seq_id") * 100000L + col("seq_offset"), 1)
        .over(w))
      .filter(col("prev") > col("seq_id") * 100000L + col("seq_offset"))
      .count()
    Seq((packed.count(), back.count(), filesPerLeaf, disorder == 0))
      .toDF("rows_in", "rows_out", "max_files_per_leaf", "seq_sorted")
  }

  /** The packer emits exactly one row per document, the shard write
    * preserves every row, and the layout invariants (one file per
    * leaf, in-file seq order) are booleans the sink must always hold —
    * so the oracle derives the counts from `documents` itself and
    * stays correct under fixture regeneration. */
  val snkTrainShardsSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS rows_in,
      |  CAST(count(*) AS BIGINT) AS rows_out,
      |  CAST(1 AS BIGINT) AS max_files_per_leaf,
      |  TRUE AS seq_sorted
      |FROM documents""".stripMargin

  /** src_netcdf_attrs — REAL NetCDF classic granules on disk → header
    * attribute extraction (NetcdfClassic) → B1 metadata rows → item
    * assembly. The engine form of OpenURLWithFSSpec → OpenWithXarray
    * → attrs (avhrr recipe.py:124-127, :46-63): per-partition Hadoop
    * opens reading a few KB of header per granule. The fixture attrs
    * are pure arithmetic on the granule index, so DuckDB re-derives
    * every expected row INDEPENDENTLY (see [[srcNetcdfAttrsSql]]) —
    * a full-strength oracle over real binary parsing; byte-level
    * round-trips additionally proven in NetcdfSpec. */
  def srcNetcdfAttrs(s: SparkSession, dir: String): DataFrame = {
    import graft.ingest.NetcdfClassic._
    val tmp = Files.createTempDirectory("graft-nc").toString
    (0 until 24).foreach { i =>
      val bytes = buildHeader(Seq(
        ("id", CharAttr("AVHRR_SST_METOP_B-OSISAF-L2P-v1.0")),
        ("uuid", CharAttr(f"granule-nc-$i%03d")),
        ("westernmost_longitude", CharAttr((i * 7 % 170 - 85).toString)),
        ("southernmost_latitude", CharAttr((i * 5 % 120 - 60).toString)),
        ("easternmost_longitude", CharAttr((i * 7 % 170 - 75).toString)),
        ("northernmost_latitude", CharAttr((i * 5 % 120 - 52).toString)),
        ("time_coverage_start", CharAttr(f"2022-05-01T${i % 24}%02d:01:03")),
        ("time_coverage_end", CharAttr(f"2022-05-01T${i % 24}%02d:03:59"))),
        dims = Seq(("ni", 409L), ("nj", 5680L)),
        version = 1 + (i % 2)) // mix CDF-1 and CDF-2
      Files.write(java.nio.file.Paths.get(s"$tmp/g$i.nc"), bytes)
    }
    val src = new graft.ingest.NetcdfGranuleSource(s"file:$tmp/*.nc")
    val (items, _) = ItemAssembly.assemble(src.granules(s))
    items.select(col("item_id"), col("collection_id"),
        col("bbox_w"), col("bbox_n"), col("start_datetime"))
      .orderBy(col("item_id"))
  }

  /** DuckDB regenerates the 24 expected items from the same index
    * arithmetic the fixture writer uses — the whole CDF-1/2 write →
    * header parse → strict-cast → item-assembly chain must reproduce
    * it byte-for-byte to hash-match. */
  val srcNetcdfAttrsSql: String = granuleAttrsSql("granule-nc-")

  /** Shared recompute oracle for the classic-NetCDF and HDF5 attr
    * sources (identical fixture arithmetic, different on-disk format —
    * exactly the parity the shared GranuleSource seam promises). */
  private def granuleAttrsSql(prefix: String): String =
    s"""SELECT '$prefix' || lpad(CAST(i AS VARCHAR), 3, '0') AS item_id,
       |  'AVHRR_SST_METOP_B-OSISAF-L2P-v1.0' AS collection_id,
       |  CAST((i*7) % 170 - 85 AS DOUBLE) AS bbox_w,
       |  CAST((i*5) % 120 - 52 AS DOUBLE) AS bbox_n,
       |  TIMESTAMP '2022-05-01 00:01:03' + to_hours(i) AS start_datetime
       |FROM range(24) t(i)""".stripMargin

  /** src_hdf5_attrs — HDF5-backed netcdf4 granules (the reference's
    * actual production file_type, avhrr recipe.py:120,126) → root
    * attribute extraction (Hdf5Header: superblock → object header →
    * attribute messages, fixed AND vlen strings) → B1 rows → item
    * assembly, through the SAME NetcdfGranuleSource seam as classic
    * files (the source sniffs the magic). Same index-arithmetic
    * fixture as the classic source ⇒ the same independent DuckDB
    * recompute oracle; format internals additionally proven in
    * Hdf5Spec. */
  def srcHdf5Attrs(s: SparkSession, dir: String): DataFrame = {
    import graft.ingest.NetcdfClassic._
    val tmp = Files.createTempDirectory("graft-h5q").toString
    (0 until 24).foreach { i =>
      val bytes = graft.ingest.Hdf5Header.buildFile(Seq(
        ("id", CharAttr("AVHRR_SST_METOP_B-OSISAF-L2P-v1.0")),
        ("uuid", CharAttr(f"granule-h5-$i%03d")),
        ("westernmost_longitude", CharAttr((i * 7 % 170 - 85).toString)),
        ("southernmost_latitude", CharAttr((i * 5 % 120 - 60).toString)),
        ("easternmost_longitude", CharAttr((i * 7 % 170 - 75).toString)),
        ("northernmost_latitude", CharAttr((i * 5 % 120 - 52).toString)),
        ("time_coverage_start", CharAttr(f"2022-05-01T${i % 24}%02d:01:03")),
        ("time_coverage_end", CharAttr(f"2022-05-01T${i % 24}%02d:03:59"))),
        vlenStrings = i % 2 == 1) // mix NC_CHAR and NC_STRING storage
      Files.write(java.nio.file.Paths.get(s"$tmp/g$i.nc"), bytes)
    }
    val src = new graft.ingest.NetcdfGranuleSource(s"file:$tmp/*.nc")
    val (items, _) = ItemAssembly.assemble(src.granules(s))
    items.select(col("item_id"), col("collection_id"),
        col("bbox_w"), col("bbox_n"), col("start_datetime"))
      .orderBy(col("item_id"))
  }

  val srcHdf5AttrsSql: String = granuleAttrsSql("granule-h5-")

  /** snk_jdbc_upsert — the pgstac-parity JDBC sink (ToPgStac, avhrr
    * recipe.py:85,137) against embedded Derby: upsert, idempotent
    * re-run, newer-delta replace — all proven in the output row.
    * Side-effectful, but the grid outcome is a constant ⇒ VALUES
    * oracle; full replace semantics in JdbcSinkSpec. */
  def snkJdbcUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.catalog.JdbcCatalogSink
    val db = "graftq" + System.nanoTime()
    val url = s"jdbc:derby:memory:$db;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().execute(JdbcCatalogSink.createTableSql("items"))
    c.close()
    val cfg = JdbcCatalogSink.JdbcConfig(url, "items",
      JdbcCatalogSink.GenericDialect)
    val (items0, _) = ItemAssembly.assemble(
      new FixtureGranuleSource(end = "2022-05-01 01:59:59").granules(s))
    val items = items0.withColumn("ingested_at",
      lit(java.sql.Timestamp.valueOf("2022-06-01 00:00:00")))
    JdbcCatalogSink.upsertItems(items, cfg)
    JdbcCatalogSink.upsertItems(items, cfg) // idempotent re-run
    def count(): Long = {
      val cc = java.sql.DriverManager.getConnection(url)
      try {
        val rs = cc.createStatement()
          .executeQuery("SELECT count(*) FROM items")
        rs.next(); rs.getLong(1)
      } finally cc.close()
    }
    val n = items.count()
    val afterRerun = count()
    // drop the in-memory database — a bench loop re-invoking this
    // query would otherwise accumulate one full item table per run
    try java.sql.DriverManager
      .getConnection(s"jdbc:derby:memory:$db;drop=true")
    catch { case _: java.sql.SQLException => () } // drop always throws 08006
    Seq((n, afterRerun, n == afterRerun))
      .toDF("items_sent", "rows_in_db", "idempotent")
  }

  /** 00:01:03–01:59:59 = 40 grid slots, none missing, none on the
    * bad-bbox stride ⇒ 40 items sent and 40 rows after the idempotent
    * re-run. */
  val snkJdbcUpsertSql: String =
    """SELECT CAST(40 AS BIGINT) AS items_sent,
      |  CAST(40 AS BIGINT) AS rows_in_db, TRUE AS idempotent""".stripMargin

  /** insitu_ingest — the reference's second recipe end-to-end:
    * trajectory platforms → category-derived collections → simplified
    * geometries → catalog. Output summarizes per-category results
    * (deterministic fixture ⇒ VALUES oracle; geometry internals in
    * GeometrySpec/InsituSpec). */
  def insituIngest(s: SparkSession, dir: String): DataFrame = {
    // one source pass: errors.count() and the items aggregation both
    // read the checkpointed platforms, not the generator + DP UDF twice
    val platforms = graft.ingest.InsituSource.platforms(s).localCheckpoint()
    val (items, errors) = graft.catalog.InsituAssembly.assemble(platforms)
    val errN = errors.count()
    items
      .groupBy(col("collection_id"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(element_at(col("properties"), "geo_type") === "LineString", 1)
          .otherwise(0)).as("n_tracks"),
        sum(when(element_at(col("properties"), "geo_type") === "Point", 1)
          .otherwise(0)).as("n_points"))
      .withColumn("n_quarantined", lit(errN))
  }

  /** The synthetic in-situ fixture is deterministic: 15 categories ×
    * (19 platforms kept, 15 trajectory LineStrings, 4 degenerate
    * Points) with 15 strict-cast/NaN quarantines total — constants a
    * VALUES oracle pins across the whole trajectory vertical
    * (category derivation, DP simplification classification,
    * quarantine routing). */
  val insituIngestSql: String =
    """SELECT 'INSITU_GLO_PHYBGCWAV_DISCRETE_MYNRT_013_030-' || cat
      |    AS collection_id,
      |  CAST(19 AS BIGINT) AS n_items, CAST(15 AS BIGINT) AS n_tracks,
      |  CAST(4 AS BIGINT) AS n_points, CAST(15 AS BIGINT) AS n_quarantined
      |FROM (VALUES ('BO'),('CT'),('DB'),('FB'),('GL'),('ML'),('MO'),
      |  ('PF'),('RF'),('SD'),('SM'),('TG'),('TS'),('TX'),('XB')) t(cat)"""
      .stripMargin

  /** catalog_search — the STAC-search compiler over a freshly built
    * catalog: collection + bbox + interval + sort + limit in one
    * Catalyst plan (SURVEY §3.3). */
  def catalogSearch(s: SparkSession, dir: String): DataFrame = {
    val path = Files.createTempDirectory("graft-search").toString + "/items"
    val (items, _) = ItemAssembly.assemble(
      new FixtureGranuleSource(end = "2022-05-01 05:59:59").granules(s))
    CatalogStore.write(items, path)
    CatalogQuery.compile(
      CatalogStore.read(s, path),
      CatalogQuery.Search(
        collections = Seq("AVHRR_SST_METOP_B-OSISAF-L2P-v1.0"),
        bbox = Some((-60.0, -40.0, 60.0, 40.0)),
        interval = Some((
          java.sql.Timestamp.valueOf("2022-05-01 01:00:00"),
          java.sql.Timestamp.valueOf("2022-05-01 04:00:00"))),
        sortBy = Seq(("start_datetime", true)),
        limit = 25))
      .select("item_id", "collection_id", "start_datetime",
        "bbox_w", "bbox_n")
  }

  /** The 25-item first page is a fixture constant (granule ids and
    * timestamps re-derivable from the 3-minute grid; longitudes from
    * the slot arithmetic; latitudes are the engine's pinned
    * xxhash64-mixed values — see FixtureGranuleSource). The VALUES pin
    * guards the search semantics: collection membership, bbox overlap,
    * interval overlap, sort order, and the limit boundary all go
    * hash-red on drift. */
  val catalogSearchSql: String =
    """SELECT item_id, 'AVHRR_SST_METOP_B-OSISAF-L2P-v1.0' AS collection_id,
      |  TIMESTAMP '2022-05-01 00:00:00' + to_seconds(slot) AS start_datetime,
      |  CAST(w AS DOUBLE) AS bbox_w, CAST(n AS DOUBLE) AS bbox_n
      |FROM (VALUES
      |  ('granule-20220501005803', 3483, 28, -13),
      |  ('granule-20220501010103', 3663, 38, 37),
      |  ('granule-20220501010703', 4023, 58, -25),
      |  ('granule-20220501012203', 4923, -62, 44),
      |  ('granule-20220501012803', 5283, -42, 21),
      |  ('granule-20220501013103', 5463, -32, 29),
      |  ('granule-20220501013403', 5643, -22, -24),
      |  ('granule-20220501014303', 6183, 8, 27),
      |  ('granule-20220501014603', 6363, 18, 19),
      |  ('granule-20220501014903', 6543, 28, -23),
      |  ('granule-20220501015203', 6723, 38, 17),
      |  ('granule-20220501015503', 6903, 48, 10),
      |  ('granule-20220501021303', 7983, -62, 43),
      |  ('granule-20220501021603', 8163, -52, 2),
      |  ('granule-20220501021903', 8343, -42, -11),
      |  ('granule-20220501022203', 8523, -32, -10),
      |  ('granule-20220501022503', 8703, -22, -28),
      |  ('granule-20220501023103', 9063, -2, 6),
      |  ('granule-20220501024003', 9603, 28, 13),
      |  ('granule-20220501024303', 9783, 38, -22),
      |  ('granule-20220501024903', 10143, 58, 26),
      |  ('granule-20220501030403', 11043, -62, -23),
      |  ('granule-20220501030703', 11223, -52, 33),
      |  ('granule-20220501031003', 11403, -42, -27),
      |  ('granule-20220501031303', 11583, -32, 46)
      |) AS t(item_id, slot, w, n)""".stripMargin

  /** catalog_search_core — the ORACLE-CHECKED twin of catalog_search
    * (SURVEY §3.3): the search compiler's full relational core —
    * collection membership, bbox overlap INCLUDING antimeridian
    * handling on both the query box (w > e splits into two segments)
    * and item boxes (a crossing swath stores w > e), datetime-interval
    * overlap, a CQL2-text property filter, keyset-token paging, and
    * sortby + tiebreak + limit — over an items frame derived
    * arithmetically from the driver's `orders` table so DuckDB can
    * replay the identical derivation + search in ANSI SQL. The one
    * non-ANSI residual (exact ST_Intersects recheck) stays under
    * catalog_search / GeometrySpec. */
  def catalogSearchCore(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    // lon base/width chosen so ~5% of items genuinely wrap the
    // antimeridian (bbox_w > bbox_e), exercising lonOverlap's crossing
    // branch; all moduli on positive keys so Spark and DuckDB agree
    val wb = (k * 7 % 360 - 180).cast("double")
    val wd = (k % 17 + 10).cast("double")
    val items = s.read.parquet(s"$dir/orders.parquet").select(
      concat(lit("item-"), lpad(k.cast("string"), 10, "0")).as("item_id"),
      col("o_orderpriority").as("collection_id"),
      wb.as("bbox_w"),
      when(wb + wd > 180.0, wb + wd - 360.0).otherwise(wb + wd).as("bbox_e"),
      (k * 3 % 140 - 80).cast("double").as("bbox_s"),
      (k * 3 % 140 - 80 + 5 + k % 13).cast("double").as("bbox_n"),
      // parquet stores o_orderdate as timestamp_ntz; cast to the
      // session-TZ (UTC) timestamp the search compiler's token
      // machinery round-trips
      col("o_orderdate").cast("timestamp").as("start_datetime"),
      (col("o_orderdate").cast("timestamp") + expr("INTERVAL 2 DAY"))
        .as("end_datetime"),
      col("o_totalprice").as("price"))
    CatalogQuery.compile(items, CatalogQuery.Search(
      collections = Seq("1-URGENT", "2-HIGH"),
      bbox = Some((140.0, -60.0, -140.0, 60.0)), // w > e: crossing query
      interval = Some((
        java.sql.Timestamp.valueOf("1994-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("1996-12-31 00:00:00"))),
      cql2 = Some("price >= 10000"),
      sortBy = Seq(("start_datetime", true)),
      afterToken = Some(Seq(
        java.sql.Timestamp.valueOf("1994-06-01 00:00:00"),
        "item-0000000000")),
      limit = 50))
      .select("item_id", "collection_id", "start_datetime",
        "bbox_w", "bbox_e", "bbox_s", "bbox_n", "price")
  }

  private val catalogSearchCoreSql: String =
    """WITH items AS (
      |  SELECT 'item-' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS item_id,
      |    o_orderpriority AS collection_id,
      |    CAST(o_orderkey * 7 % 360 - 180 AS DOUBLE) AS bbox_w,
      |    CAST(CASE WHEN (o_orderkey * 7 % 360 - 180) + (o_orderkey % 17 + 10) > 180
      |      THEN (o_orderkey * 7 % 360 - 180) + (o_orderkey % 17 + 10) - 360
      |      ELSE (o_orderkey * 7 % 360 - 180) + (o_orderkey % 17 + 10) END AS DOUBLE) AS bbox_e,
      |    CAST(o_orderkey * 3 % 140 - 80 AS DOUBLE) AS bbox_s,
      |    CAST(o_orderkey * 3 % 140 - 80 + 5 + o_orderkey % 13 AS DOUBLE) AS bbox_n,
      |    o_orderdate AS start_datetime,
      |    o_orderdate + INTERVAL 2 DAY AS end_datetime,
      |    o_totalprice AS price
      |  FROM orders)
      |SELECT item_id, collection_id, start_datetime,
      |  bbox_w, bbox_e, bbox_s, bbox_n, price
      |FROM items
      |WHERE collection_id IN ('1-URGENT', '2-HIGH')
      |  AND ((CASE WHEN bbox_w > bbox_e THEN bbox_w <= 180.0 OR 140.0 <= bbox_e
      |             ELSE bbox_w <= 180.0 AND 140.0 <= bbox_e END)
      |    OR (CASE WHEN bbox_w > bbox_e THEN bbox_w <= -140.0 OR -180.0 <= bbox_e
      |             ELSE bbox_w <= -140.0 AND -180.0 <= bbox_e END))
      |  AND bbox_s <= 60.0 AND -60.0 <= bbox_n
      |  AND start_datetime <= TIMESTAMP '1996-12-31 00:00:00'
      |  AND TIMESTAMP '1994-01-01 00:00:00' <= end_datetime
      |  AND price >= 10000
      |  AND (start_datetime > TIMESTAMP '1994-06-01 00:00:00'
      |    OR (start_datetime = TIMESTAMP '1994-06-01 00:00:00'
      |        AND item_id > 'item-0000000000'))
      |ORDER BY start_datetime, item_id
      |LIMIT 50""".stripMargin

  /** catalog_fc_page — the STAC FeatureCollection response serializer
    * (stac-fastapi's JSON surface, docker-compose.yml:1-28): three
    * token-walked pages re-exploded to (page, feature) rows. Feature
    * JSON is deterministic (no ingest timestamps serialized) and the
    * fixture grid is a constant ⇒ the oracle regenerates the expected
    * pages; envelope shape asserted e2e in CatalogSpec. */
  def catalogFcPage(s: SparkSession, dir: String): DataFrame = {
    import graft.catalog.FeatureCollection
    val path = Files.createTempDirectory("graft-fc").toString + "/items"
    val (items, _) = ItemAssembly.assemble(
      new FixtureGranuleSource(end = "2022-05-01 02:59:59").granules(s))
    CatalogStore.write(items, path)
    val all = CatalogStore.read(s, path)
    val q = CatalogQuery.Search(sortBy = Seq(("start_datetime", true)),
      limit = 10)
    var token: Option[String] = None
    val bodies = (1 to 3).map { i =>
      val p = FeatureCollection.page(all, q, token)
      token = p.nextToken
      (i, p.body)
    }
    import s.implicits._
    bodies.toDF("page", "body")
      .select(col("page"), explode(expr(
        "from_json(body, 'STRUCT<features: ARRAY<STRUCT<id: STRING>>>')" +
          ".features.id")).as("item_id"))
      .orderBy(col("page"), col("item_id"))
  }

  /** The fixture granules sit on a continuous 3-minute grid from
    * 2022-05-01 00:01:03, item ids are `granule-<yyyyMMddHHmmss>`, and
    * the search sorts by start_datetime with limit 10 — so three
    * token-walked pages are exactly the first 30 grid slots, 10 per
    * page. The oracle regenerates that grid instead of trusting the
    * serializer: any drift in paging, token handling, or feature-JSON
    * ids goes hash-red. */
  val catalogFcPageSql: String =
    """SELECT CAST(1 + (row_number() OVER (ORDER BY ts) - 1) // 10 AS INT)
      |    AS page,
      |  'granule-' || strftime(ts, '%Y%m%d%H%M%S') AS item_id
      |FROM generate_series(TIMESTAMP '2022-05-01 00:01:03',
      |                     TIMESTAMP '2022-05-01 01:28:03',
      |                     INTERVAL 3 MINUTE) t(ts)
      |ORDER BY page, item_id""".stripMargin

  /** src_hdf5_vars — netcdf4 VARIABLE data, not just attrs: the
    * insitu recipe reads LONGITUDE/LATITUDE/TIME coordinate variables
    * out of its HDF5-backed granules (extract_geometry, insitu
    * recipe.py:91-93). Granules written netcdf-style (chunked +
    * shuffle + deflate), decoded DISTRIBUTED (one mapPartitions over
    * the listing; each task reads only its files), then the same
    * trajectory-geometry UDF the insitu vertical uses. Deterministic
    * fixture arithmetic ⇒ DuckDB recompute oracle; byte-level
    * round-trips in Hdf5Spec. */
  def srcHdf5Vars(s: SparkSession, dir: String): DataFrame = {
    import graft.ingest.Hdf5Header
    import graft.ingest.Hdf5Header.FixtureVar
    import graft.ingest.NetcdfClassic.CharAttr
    val tmp = Files.createTempDirectory("graft-h5vars").toString
    (0 until 6).foreach { g =>
      val n = 36 + 4 * g
      val lon = Array.tabulate(n)(i => -60.0 + g * 7 + i * 0.25)
      val lat = Array.tabulate(n)(i =>
        -30.0 + g * 5 + (if (i < n / 2) 0.0 else (i - n / 2 + 1) * 0.1))
      val time = Array.tabulate(n)(i => 8000.0 + g * 30 + i / 24.0)
      val bytes = Hdf5Header.buildDataFile(
        Seq(("id", CharAttr(f"platform-$g%03d"))),
        Seq(
          FixtureVar("LONGITUDE", Seq(n.toLong), lon,
            chunks = Some(Seq(16L)), deflate = true, shuffle = true),
          FixtureVar("LATITUDE", Seq(n.toLong), lat,
            chunks = Some(Seq(16L)), deflate = true, shuffle = true),
          FixtureVar("TIME", Seq(n.toLong), time,
            attrs = Seq(("units", CharAttr("days since 1950-01-01"))))))
      val fo = new java.io.FileOutputStream(s"$tmp/traj-$g.nc")
      try fo.write(bytes) finally fo.close()
    }
    import s.implicits._
    val coords = ListingCache.globListing(s, s"file:$tmp/*.nc").as[String]
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        it.map { url =>
          val p = new org.apache.hadoop.fs.Path(url)
          val fs = p.getFileSystem(conf)
          val in = fs.open(p)
          val bytes = try {
            val len = fs.getFileStatus(p).getLen.toInt
            val b = new Array[Byte](len)
            in.readFully(0, b)
            b
          } finally in.close()
          val f = Hdf5Header.readFile(bytes)
          val t = f.dataset("TIME").data
          (f.rootAttrs("id"),
            f.dataset("LONGITUDE").data.toSeq,
            f.dataset("LATITUDE").data.toSeq,
            t.min, t.max)
        }
      }
      .toDF("platform_id", "lon", "lat", "t_min", "t_max")
    coords
      .select(col("platform_id"), col("t_min"), col("t_max"),
        Geometry.extractTrajectory(0.001)(col("lon"), col("lat")).as("g"))
      .select(col("platform_id"), col("g.geo_type"),
        col("g.n_points_in"), col("g.n_points_out"),
        col("g.bbox_w"), col("g.bbox_n"), col("t_min"), col("t_max"))
      .orderBy(col("platform_id"))
  }

  /** DuckDB re-derives all 6 platform rows from the same index
    * arithmetic the fixture writer uses — the chunked+shuffle+deflate
    * HDF5 write → distributed decode → DP-simplify chain must
    * reproduce them exactly. n_points_out = 3: each track is two
    * collinear runs, so DP keeps start/corner/end. */
  val srcHdf5VarsSql: String =
    """SELECT 'platform-' || lpad(CAST(g AS VARCHAR), 3, '0') AS platform_id,
      |  'LineString' AS geo_type,
      |  CAST(36 + 4*g AS INT) AS n_points_in, CAST(3 AS INT) AS n_points_out,
      |  CAST(-60.0 + 7*g AS DOUBLE) AS bbox_w,
      |  CAST(-30.0 + 5*g + (18 + 2*g) * 0.1 AS DOUBLE) AS bbox_n,
      |  CAST(8000.0 + 30*g AS DOUBLE) AS t_min,
      |  CAST(8000.0 + 30*g + (35.0 + 4*g)/24.0 AS DOUBLE) AS t_max
      |FROM range(6) t(g)""".stripMargin

  /** src_insitu_netcdf4 — the insitu vertical over REAL netcdf4
    * files end-to-end: category-shaped paths → Hdf5InsituSource
    * (whole-file HDF5 decode of LONGITUDE/LATITUDE/TIME + global
    * attrs, distributed) → InsituAssembly (the same generate_stac_item
    * path the synthetic fixture drives) → per-collection summary.
    * Includes a corrupt granule that must quarantine, not kill.
    * Deterministic fixture ⇒ VALUES oracle. */
  def srcInsituNetcdf4(s: SparkSession, dir: String): DataFrame = {
    import graft.ingest.{Hdf5Header, Hdf5InsituSource}
    import graft.ingest.Hdf5Header.FixtureVar
    import graft.ingest.NetcdfClassic.CharAttr
    val tmp = Files.createTempDirectory("graft-insitu4").toString
    val epochDays = 26418.0 // 2022-05-01 in days since 1950-01-01
    for (cat <- Seq("DB", "TS", "BO"); i <- 0 until 3) {
      val d = new java.io.File(s"$tmp/$cat/202205")
      d.mkdirs()
      val n = 24
      val moored = cat == "BO" && i == 2
      val lon = Array.tabulate(n)(k =>
        if (moored) -12.5 else -40.0 + i * 10 + k * 0.05)
      val lat = Array.tabulate(n)(k =>
        if (moored) 31.0
        else 10.0 + i * 5 + (if (k < 18) 0.0 else (k - 17) * 0.03))
      val time = Array.tabulate(n)(k => epochDays + 30 * i + k / 24.0)
      val bytes = Hdf5Header.buildDataFile(
        Seq(
          ("id", CharAttr(f"$cat%s-$i%04d")),
          ("geospatial_lon_min", CharAttr(lon.min.toString)),
          ("geospatial_lat_min", CharAttr(lat.min.toString)),
          ("geospatial_lon_max", CharAttr(lon.max.toString)),
          ("geospatial_lat_max", CharAttr(lat.max.toString)),
          ("institution", CharAttr(s"inst-$cat"))),
        Seq(
          FixtureVar("LONGITUDE", Seq(n.toLong), lon,
            chunks = Some(Seq(16L)), deflate = true, shuffle = true),
          // one granule stores f4 + szip(+fletcher32) — the CCSDS-
          // Rice filter some Copernicus archives enable — so the
          // declared query proves that decode path e2e as well
          (if (cat == "TS" && i == 1)
            FixtureVar("LATITUDE", Seq(n.toLong),
              lat.map(_.toFloat.toDouble), dtype = "f4",
              chunks = Some(Seq(16L)), szip = true, fletcher = true)
          else FixtureVar("LATITUDE", Seq(n.toLong), lat,
            chunks = Some(Seq(16L)), deflate = true, shuffle = true)),
          FixtureVar("TIME", Seq(n.toLong), time,
            attrs = Seq(("units", CharAttr("days since 1950-01-01"))))),
        // one granule per run carries DENSE (fractal-heap) links —
        // the libhdf5 1.10+ group layout — so the declared query
        // proves the dense decode path end-to-end, not just in units
        denseLinks = cat == "TS" && i == 0)
      val payload =
        if (cat == "DB" && i == 1) bytes.take(40) // corrupt: truncated
        else bytes
      val fo = new java.io.FileOutputStream(s"$tmp/$cat/202205/GL_PR_$cat-$i.nc")
      try fo.write(payload) finally fo.close()
    }
    // one decode pass: errors.count() and the items agg both read the
    // checkpointed platforms, not the whole-file HDF5 decode twice
    // (same discipline as insituIngest)
    val platforms = Hdf5InsituSource.platforms(s, s"file:$tmp/*/*/*.nc")
      .localCheckpoint()
    val (items, errors) = graft.catalog.InsituAssembly.assemble(platforms)
    val errN = errors.count()
    items
      .groupBy(col("collection_id"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(element_at(col("properties"), "geo_type") === "LineString", 1)
          .otherwise(0)).as("n_tracks"),
        sum(when(element_at(col("properties"), "geo_type") === "Point", 1)
          .otherwise(0)).as("n_points"),
        min(col("start_datetime")).as("t_min"))
      .withColumn("n_quarantined", lit(errN))
      .orderBy(col("collection_id"))
  }

  /** The 9-granule fixture's outcome is constant: BO keeps 3 (2
    * drifting tracks + 1 moored Point), DB loses its truncated granule
    * to quarantine (2 tracks), TS keeps 3 tracks (incl. the szip and
    * dense-links granules — so those decode paths are hash-gated
    * too); every granule starts at epoch-day 26418 = 2022-05-01. */
  val srcInsituNetcdf4Sql: String =
    """SELECT 'INSITU_GLO_PHYBGCWAV_DISCRETE_MYNRT_013_030-' || cat
      |    AS collection_id,
      |  CAST(n_items AS BIGINT) AS n_items,
      |  CAST(n_tracks AS BIGINT) AS n_tracks,
      |  CAST(n_points AS BIGINT) AS n_points,
      |  TIMESTAMP '2022-05-01 00:00:00' AS t_min,
      |  CAST(1 AS BIGINT) AS n_quarantined
      |FROM (VALUES ('BO', 3, 2, 1), ('DB', 2, 2, 0), ('TS', 3, 3, 0))
      |  t(cat, n_items, n_tracks, n_points)""".stripMargin

  /** catalog_api_http — the full STAC API stack over real HTTP
    * (stac-fastapi's role, docker-compose.yml:1-28): catalog → JDK
    * HttpServer → HttpClient walks GET-search pages through next
    * hrefs and POSTs a cql2-json search, checking HTTP parity with
    * the direct FeatureCollection page. The walk's outcome is a
    * fixture constant ⇒ VALUES oracle; parity + errors e2e in
    * StacApiSpec. */
  def catalogApiHttp(s: SparkSession, dir: String): DataFrame = {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val stored = CatalogStore.read(s, ensureApiCatalog(s))
    // server start/stop stays per call (cheap, and leaves no non-daemon
    // HTTP threads to block JVM exit); the catalog build is what the
    // memo hoists out of the measured path
    val server = new graft.catalog.StacApiServer(stored)
    val base = server.start()
    try {
      val http = HttpClient.newHttpClient()
      def get(p: String): String = http.send(
        HttpRequest.newBuilder(java.net.URI.create(base + p)).GET().build(),
        HttpResponse.BodyHandlers.ofString()).body()
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      def ids(body: String): Seq[String] = {
        val f = om.readTree(body).get("features")
        (0 until f.size).map(f.get(_).get("id").asText())
      }
      // walk every page over HTTP
      var href = "/search?limit=25&sortby=%2Bstart_datetime"
      var viaHttp = Vector.empty[String]
      var pages = 0
      while (href != null && pages < 100) {
        val body = get(href)
        viaHttp ++= ids(body)
        pages += 1
        val links = om.readTree(body).get("links")
        href = (0 until links.size).map(links.get)
          .find(_.get("rel").asText() == "next")
          .map(_.get("href").asText()).orNull
      }
      // POST a cql2-json SPATIAL search (s_intersects — the pgstac
      // conformance class) — exercises the envelope-prefilter + exact
      // recheck plan over real HTTP
      val post = http.send(
        HttpRequest.newBuilder(java.net.URI.create(base + "/search"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"filter-lang":"cql2-json","filter":
              {"op":"s_intersects","args":[{"property":"geometry"},
              {"type":"Polygon",
              "coordinates":[[[0,0],[60,0],[60,40],[0,40],[0,0]]]}]},
              "limit":500}""".replaceAll("\n\\s*", "")))
          .build(),
        HttpResponse.BodyHandlers.ofString()).body()
      val nFiltered = ids(post).length
      val direct = stored.orderBy(col("start_datetime"), col("item_id"))
        .select("item_id").collect().map(_.getString(0)).toSeq
      import s.implicits._
      Seq((viaHttp.length.toLong, pages.toLong, nFiltered.toLong,
        viaHttp == direct))
        .toDF("n_items_http", "n_pages", "n_filtered", "http_matches_direct")
    } finally server.stop()
  }

  /** The API fixture grid (00:01:03–02:59:59) yields 60 items ⇒ a
    * 25/25/10 three-page token walk; the cql2-json s_intersects box
    * admits exactly 10. The VALUES pin makes paging, link emission,
    * and the spatial filter hash-checked over real HTTP. */
  val catalogApiHttpSql: String =
    """SELECT CAST(60 AS BIGINT) AS n_items_http,
      |  CAST(3 AS BIGINT) AS n_pages, CAST(10 AS BIGINT) AS n_filtered,
      |  TRUE AS http_matches_direct""".stripMargin

  /** The API qid's catalog, written ONCE per JVM (build-vs-serve
    * split; Bench force-builds in warmup) so the declared qid measures
    * the HTTP search walk — the serve tier's actual load — not the
    * fixture ingest. */
  private val apiCatalog =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def ensureApiCatalog(s: SparkSession): String =
    apiCatalog.computeIfAbsent("fixture", { _ =>
      MemoBuilds.record("api_catalog_fixture")
      val path = Files.createTempDirectory("graft-api-q").toString + "/items"
      val (items, _) = ItemAssembly.assemble(
        new FixtureGranuleSource(end = "2022-05-01 02:59:59").granules(s))
      CatalogStore.write(items, path)
      path
    })

  /** fn_geometry_extract — trajectory → simplified GeoJSON + bbox
    * (extract_geometry(tolerance=0.001), insitu recipe.py:91-93).
    * Trajectories synthesized per-row from the time grid. */
  def fnGeometryExtract(s: SparkSession, dir: String): DataFrame = {
    val grid = RelationalQueries.srcTimeGrid(s, dir).limit(200)
      .withColumn("slot", unix_timestamp(col("ts")))
    val traj = grid.select(col("ts"),
      // 12-point drifting track with a collinear run DP must collapse
      expr("transform(sequence(0, 11), i -> " +
        "CAST((slot % 170 - 85) + i * 0.5 AS DOUBLE))").as("lon"),
      expr("transform(sequence(0, 11), i -> " +
        "CAST((slot % 120 - 60) + CASE WHEN i < 8 THEN 0.0 " +
        "ELSE (i - 7) * 0.4 END AS DOUBLE))").as("lat"))
    traj.select(col("ts"),
      Geometry.extractTrajectory(0.001)(col("lon"), col("lat")).as("g"))
      .select(col("ts"), col("g.geo_type"), col("g.n_points_in"),
        col("g.n_points_out"), col("g.bbox_w"), col("g.bbox_n"))
  }

  /** DuckDB regenerates the same 200 grid trajectories and their
    * expected DP outcome: every track is a flat 8-point run plus a
    * collinear 4-point climb, so simplify keeps start/corner/end
    * (n_points_out = 3) and the bbox maxima follow the slot
    * arithmetic (lat max = base + 4·0.4). */
  val fnGeometryExtractSql: String =
    """SELECT ts, 'LineString' AS geo_type,
      |  CAST(12 AS INT) AS n_points_in, CAST(3 AS INT) AS n_points_out,
      |  CAST(CAST(epoch(ts) AS BIGINT) % 170 - 85 AS DOUBLE) AS bbox_w,
      |  CAST(CAST(epoch(ts) AS BIGINT) % 120 - 60 + 1.6 AS DOUBLE) AS bbox_n
      |FROM (SELECT unnest(generate_series(
      |    TIMESTAMP '2022-05-01 00:01:03',
      |    TIMESTAMP '2022-05-02 23:59:59', INTERVAL 3 MINUTE)) AS ts) g
      |ORDER BY ts LIMIT 200""".stripMargin

  /** fn_surrogate_repair — byte-level decode repair for
    * surrogate-damaged attrs (reencode_surrogates,
    * insitu recipe.py:48-63): latin-1 bytes inside UTF-8 recovered. */
  def fnSurrogateRepair(s: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(s, dir)
      .select(col("doc_id"),
        // append an invalid byte (0xE9, latin-1 'é') to valid UTF-8
        SurrogateRepair.decodeRepairUdf(
          concat(col("text").cast("binary"), unbase64(lit("6Q=="))))
          .as("repaired"))
      .select(col("doc_id"),
        (length(col("repaired")) > 0).as("non_empty"),
        substring(col("repaired"), -1, 1).as("last_char"))

  /** Every document gets the same planted 0xE9 tail, and the repair
    * must decode it as latin-1 'é' (chr(233)) with the valid UTF-8
    * prefix intact — per-row expectations DuckDB states directly from
    * `documents`, so the oracle survives fixture regeneration. */
  val fnSurrogateRepairSql: String =
    """SELECT doc_id, TRUE AS non_empty, chr(233) AS last_char
      |FROM documents""".stripMargin

  /** src_schema_evolution — the lake reality that a later drop adds a
    * column: drop 1 carries the original nation schema, drop 2 adds
    * n_comment_len. A mergeSchema read unions the schemas — old rows
    * surface the new column as NULL, no rewrite of drop 1, and the
    * partition column keeps drops queryable. Scale: schema merge
    * reads footers only (the same KB-per-file economics as
    * src_parquet_meta); the data scan is unchanged. The oracle
    * replays the union semantics relationally. */
  def srcSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft-evo").toString + "/t"
    val n = graft.Tables.nation(s, dir)
    n.filter(col("n_nationkey") % 2 === 0)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .write.mode("overwrite").parquet(s"$tmp/dropno=1")
    n.filter(col("n_nationkey") % 2 === 1)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        length(col("n_name")).cast("long").as("n_comment_len"))
      .write.mode("overwrite").parquet(s"$tmp/dropno=2")
    s.read.option("mergeSchema", "true").parquet(tmp)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        col("n_comment_len"), col("dropno").cast("long").as("dropno"))
  }

  val srcSchemaEvolutionSql: String =
    """SELECT n_nationkey, n_name, n_regionkey,
      |  CAST(NULL AS BIGINT) AS n_comment_len, CAST(1 AS BIGINT) AS dropno
      |FROM nation WHERE n_nationkey % 2 = 0
      |UNION ALL
      |SELECT n_nationkey, n_name, n_regionkey,
      |  CAST(length(n_name) AS BIGINT), CAST(2 AS BIGINT)
      |FROM nation WHERE n_nationkey % 2 = 1""".stripMargin

  /** The columns src_parquet_meta audits: (table, column, whether the
    * footer's numeric min/max stats are surfaced). One list drives
    * BOTH the Spark footer reader and the generated oracle SQL, so
    * the two sides can't drift. Timestamps and strings keep min/max
    * null (parquet truncates string stats; timestamp units vary). */
  private val PARQUET_META_COLS: Seq[(String, String, Boolean)] = Seq(
    ("lineitem", "l_orderkey", true), ("lineitem", "l_partkey", true),
    ("lineitem", "l_suppkey", true), ("lineitem", "l_linenumber", true),
    ("lineitem", "l_quantity", true), ("lineitem", "l_extendedprice", true),
    ("lineitem", "l_discount", true), ("lineitem", "l_tax", true),
    ("lineitem", "l_returnflag", false), ("lineitem", "l_linestatus", false),
    ("lineitem", "l_shipdate", false),
    ("documents", "doc_id", true), ("documents", "text", false),
    ("documents", "lang", false), ("documents", "source", false),
    ("documents", "n_chars", true))

  /** src_parquet_meta — storage-layout audit from parquet FOOTERS
    * only, hash-proven against the data: per column, the footer's
    * value count, null count, and numeric min/max stats must equal
    * what a full scan of the data computes (the oracle recomputes
    * them from the table views — a mis-decoded stat or miscounted
    * chunk fails the hash). This is the 100 TB shape for lake
    * auditing: the job reads kilobytes of footer per file instead of
    * the data — the driver-side cost is one listing, the per-file
    * footer parse is distributed, and the result is 16 rows. The
    * same footer stats are what row-group pruning trusts, so this
    * doubles as a pruning-integrity check. */
  def srcParquetMeta(s: SparkSession, dir: String): DataFrame = {
    val wanted = PARQUET_META_COLS.map { case (t, c, n) => ((t, c), n) }.toMap
    // session conf, NOT a bare new Configuration(): the audit must see
    // spark.hadoop.* credentials/endpoints on a real lake (the same
    // pitfall ListingCache.sessionConfSnapshot documents)
    val conf = s.sparkContext.hadoopConfiguration
    val files: Seq[(String, String)] =
      PARQUET_META_COLS.map(_._1).distinct.flatMap { t =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/$t.parquet")
        val fs = p.getFileSystem(conf)
        val all =
          if (fs.getFileStatus(p).isDirectory)
            fs.listStatus(p).toSeq.map(_.getPath)
              .filter(_.getName.endsWith(".parquet"))
          else Seq(p)
        all.map(f => (t, f.toString))
      }
    footerAudit(s, files, wanted)
  }

  /** The footer-audit core: (table, file) pairs → per-column footer
    * aggregates. Driven by srcParquetMeta over the test tables and by
    * SourceFormatsSpec over a multi-file/multi-row-group fixture. */
  private[graft] def footerAudit(
      s: SparkSession,
      files: Seq[(String, String)],
      wanted: Map[(String, String), Boolean]): DataFrame = {
    import s.implicits._
    val confSnapshot = ListingCache.sessionConfSnapshot(s)
    s.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 32)))
      .flatMap { case (tbl, file) =>
        import scala.jdk.CollectionConverters._
        val conf = ListingCache.confWith(
          new org.apache.hadoop.conf.Configuration(false), confSnapshot)
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(file), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          r.getFooter.getBlocks.asScala.toList.flatMap { bg =>
            bg.getColumns.asScala.toList.flatMap { cc =>
              val colName = cc.getPath.toDotString
              wanted.get((tbl, colName)).map { numeric =>
                val st = cc.getStatistics
                // null-count and min/max are tracked INDEPENDENTLY in
                // parquet stats: an all-null chunk has no min/max (the
                // getters would return uninitialized 0s), and a writer
                // may omit null_count (getNumNulls == -1). Guard each.
                val haveNulls = st != null && st.isNumNullsSet
                val haveMinMax = st != null && st.hasNonNullValue
                def num(v: AnyRef): Option[Double] = v match {
                  case l: java.lang.Long    => Some(l.doubleValue)
                  case i: java.lang.Integer => Some(i.doubleValue)
                  case d: java.lang.Double  => Some(d.doubleValue)
                  case f: java.lang.Float   => Some(f.doubleValue)
                  case _                    => None
                }
                (tbl, colName, cc.getValueCount,
                  if (haveNulls) Some(st.getNumNulls) else None,
                  if (numeric && haveMinMax) num(st.genericGetMin.asInstanceOf[AnyRef]) else None,
                  if (numeric && haveMinMax) num(st.genericGetMax.asInstanceOf[AnyRef]) else None)
              }
            }
          }
        } finally r.close()
      }
      .toDF("tbl", "col", "chunk_values", "chunk_nulls", "chunk_min",
        "chunk_max")
      .groupBy(col("tbl"), col("col"))
      .agg(
        sum(col("chunk_values")).as("n_values"),
        // a chunk with the stat ABSENT must surface as unknown (null),
        // never as a confidently narrower sum/min/max: sum()/min()
        // skip nulls, so gate each aggregate on every chunk reporting
        when(count(col("chunk_nulls")) === count(lit(1)),
          sum(col("chunk_nulls"))).as("n_nulls"),
        // + 0.0 canonicalizes IEEE -0.0 (pyarrow keeps the sign in
        // stats; the data-side min may come back +0.0) on BOTH engines
        when(count(col("chunk_min")) === count(lit(1)),
          min(col("chunk_min")) + lit(0.0)).as("min_val"),
        when(count(col("chunk_max")) === count(lit(1)),
          max(col("chunk_max")) + lit(0.0)).as("max_val"))
  }

  val srcParquetMetaSql: String = PARQUET_META_COLS.map {
    case (t, c, numeric) =>
      val mn = if (numeric) s"CAST(min($c) AS DOUBLE) + 0.0"
               else "CAST(NULL AS DOUBLE)"
      val mx = if (numeric) s"CAST(max($c) AS DOUBLE) + 0.0"
               else "CAST(NULL AS DOUBLE)"
      s"SELECT '$t' AS tbl, '$c' AS col, " +
        s"CAST(count(*) AS BIGINT) AS n_values, " +
        s"CAST(count(*) - count($c) AS BIGINT) AS n_nulls, " +
        s"$mn AS min_val, $mx AS max_val FROM $t"
  }.mkString("\nUNION ALL\n")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_parquet_meta" -> (srcParquetMeta _),
    "src_schema_evolution" -> (srcSchemaEvolution _),
    "src_listing_cache" -> (srcListingCache _),
    "src_glob_listing" -> (srcGlobListing _),
    "src_open_url" -> (srcOpenUrl _),
    "src_scientific" -> (srcScientific _),
    "src_netcdf_attrs" -> (srcNetcdfAttrs _),
    "src_hdf5_attrs" -> (srcHdf5Attrs _),
    "src_hdf5_vars" -> (srcHdf5Vars _),
    "src_insitu_netcdf4" -> (srcInsituNetcdf4 _),
    "src_scientific_v2" -> (srcScientificV2 _),
    "src_yaml_collections" -> (srcYamlCollections _),
    "src_csv" -> (srcCsv _),
    "src_json" -> (srcJson _),
    "src_jsonl_quarantine" -> (srcJsonlQuarantine _),
    "catalog_changelog" -> (catalogChangelog _),
    "src_orc" -> (srcOrc _),
    "snk_listing_cache" -> (snkListingCache _),
    "snk_upsert" -> (snkUpsert _),
    "snk_compact" -> (snkCompact _),
    "snk_train_shards" -> (snkTrainShards _),
    "snk_jdbc_upsert" -> (snkJdbcUpsert _),
    "catalog_search" -> (catalogSearch _),
    "catalog_search_core" -> (catalogSearchCore _),
    "catalog_fc_page" -> (catalogFcPage _),
    "catalog_api_http" -> (catalogApiHttp _),
    "insitu_ingest" -> (insituIngest _),
    "fn_geometry_extract" -> (fnGeometryExtract _),
    "fn_surrogate_repair" -> (fnSurrogateRepair _)
  )

  def oracle: Map[String, String] = Map(
    "src_parquet_meta" -> srcParquetMetaSql,
    "src_schema_evolution" -> srcSchemaEvolutionSql,
    "src_listing_cache" -> srcListingCacheSql,
    "src_csv" -> srcFormatSql,
    "src_json" -> srcFormatSql,
    "src_orc" -> srcFormatSql,
    "catalog_search_core" -> catalogSearchCoreSql,
    // Deterministic-fixture qids get VALUES oracles: the inputs are
    // static (a resource YAML, the 10-table fixture layout, the
    // FixtureGranuleSource time grid), so the expected output is a
    // constant the oracle pins EXACTLY — a drift in parsing, listing,
    // or diff classification goes hash-red instead of rows-only-green.
    "src_yaml_collections" -> srcYamlCollectionsSql,
    "snk_listing_cache" -> snkListingCacheSql,
    "catalog_changelog" -> catalogChangelogSql,
    "src_glob_listing" -> srcGlobListingSql,
    "snk_compact" -> snkCompactSql,
    "snk_train_shards" -> snkTrainShardsSql,
    "catalog_fc_page" -> catalogFcPageSql,
    "src_jsonl_quarantine" -> srcJsonlQuarantineSql,
    "src_open_url" -> srcOpenUrlSql,
    "src_scientific" -> srcScientificSql,
    "src_scientific_v2" -> srcScientificV2Sql,
    // real-binary-format sources: DuckDB re-derives the expected rows
    // from the fixture's index arithmetic — full recompute oracles
    // over the CDF/HDF5 write→parse→assemble chains
    "src_netcdf_attrs" -> srcNetcdfAttrsSql,
    "src_hdf5_attrs" -> srcHdf5AttrsSql,
    "src_hdf5_vars" -> srcHdf5VarsSql,
    "src_insitu_netcdf4" -> srcInsituNetcdf4Sql,
    "insitu_ingest" -> insituIngestSql,
    "snk_upsert" -> snkUpsertSql,
    "snk_jdbc_upsert" -> snkJdbcUpsertSql,
    "catalog_search" -> catalogSearchSql,
    "catalog_api_http" -> catalogApiHttpSql,
    "fn_geometry_extract" -> fnGeometryExtractSql,
    "fn_surrogate_repair" -> fnSurrogateRepairSql
    // all others: env-dependent, side-effectful, or UDF-valued —
    // covered by CatalogSpec/GeometrySpec/StreamingSpec unit+e2e tests
  )
}
