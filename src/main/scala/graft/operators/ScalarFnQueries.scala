package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Element-wise operators (SURVEY.md §2.2) — the reference's per-record
  * transformations (URL templating avhrr recipe.py:32-42, datetime
  * normalization recipe.py:26-29, strict casts recipe.py:51-56, id
  * splitting insitu recipe.py:75,194, item struct assembly
  * avhrr recipe.py:67-74, bbox→GeoJSON recipe.py:58-59) re-expressed as
  * codegen'd Column expressions — zero UDFs in this file, so every
  * query stays inside WholeStageCodegen and scales linearly.
  */
object ScalarFnQueries {

  /** fn_url_template — granule URL from timestamp
    * (`generate_url`, avhrr recipe.py:32-42): root/YYYY/DDD/⟨stamp⟩.nc
    * with zero-padded day-of-year. Pure expressions over the
    * distributed time grid. */
  def fnUrlTemplate(s: SparkSession, dir: String): DataFrame =
    RelationalQueries.srcTimeGrid(s, dir).select(
      col("ts"),
      concat_ws("/",
        lit("https://example.org/sst"),
        year(col("ts")).cast("string"),
        lpad(dayofyear(col("ts")).cast("string"), 3, "0"),
        concat(date_format(col("ts"), "yyyyMMddHHmmss"),
          lit("-OSISAF-L2P.nc"))).as("url"))

  val fnUrlTemplateSql: String =
    """SELECT ts,
      |  concat_ws('/', 'https://example.org/sst',
      |    CAST(year(ts) AS VARCHAR),
      |    lpad(CAST(dayofyear(ts) AS VARCHAR), 3, '0'),
      |    strftime(ts, '%Y%m%d%H%M%S') || '-OSISAF-L2P.nc') AS url
      |FROM generate_series(
      |  TIMESTAMP '2022-05-01 00:01:03',
      |  TIMESTAMP '2022-05-02 23:59:59',
      |  INTERVAL 3 MINUTE) AS t(ts)""".stripMargin

  /** fn_norm_datetime — canonical ISO-8601 rendering
    * (`normalize_datetime`, avhrr recipe.py:26-29). */
  def fnNormDatetime(s: SparkSession, dir: String): DataFrame =
    orders(s, dir).select(
      col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("iso"))

  val fnNormDatetimeSql: String =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS iso
      |FROM orders""".stripMargin

  /** fn_str_to_double — numeric-string → double with null-on-error
    * accounting (strict bbox casts, avhrr recipe.py:51-56; error
    * context insitu recipe.py:87-90). try_cast keeps bad rows visible
    * instead of crashing the job. */
  def fnStrToDouble(s: SparkSession, dir: String): DataFrame =
    part(s, dir).select(
      col("p_partkey"),
      expr("try_cast(element_at(split(p_brand, '#'), 2) AS double)")
        .as("brand_num"),
      expr("try_cast(p_type AS double)").isNull.as("type_unparsable"))

  val fnStrToDoubleSql: String =
    """SELECT p_partkey,
      |  TRY_CAST(string_split(p_brand, '#')[2] AS DOUBLE) AS brand_num,
      |  TRY_CAST(p_type AS DOUBLE) IS NULL AS type_unparsable
      |FROM part""".stripMargin

  /** fn_rsplit_part — k-th path segment from the right
    * (`url.rsplit("/", 3)[1]`, insitu recipe.py:75). */
  def fnRsplitPart(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"),
        concat(lit("https://host/data/"), col("lang"), lit("/"),
          col("source"), lit("/"), col("doc_id"), lit(".nc")).as("url"))
      .select(col("doc_id"), col("url"),
        element_at(split(col("url"), "/"), -3).as("category"),
        element_at(split(col("url"), "-"), -1).as("suffix"))

  val fnRsplitPartSql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |    'https://host/data/' || lang || '/' || source || '/' ||
      |      CAST(doc_id AS VARCHAR) || '.nc' AS url
      |  FROM documents)
      |SELECT doc_id, url,
      |  string_split(url, '/')[-3] AS category,
      |  string_split(url, '-')[-1] AS suffix
      |FROM u""".stripMargin

  /** fn_concat_id — derived collection id root-CATEGORY
    * (insitu recipe.py:77). */
  def fnConcatId(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      concat_ws("-", lit("insitu_glo"), col("lang"), col("source"))
        .as("collection_id"))

  val fnConcatIdSql: String =
    """SELECT doc_id, concat_ws('-', 'insitu_glo', lang, source) AS collection_id
      |FROM documents""".stripMargin

  /** fn_sha256_hex — content-addressed cache key
    * (`hashlib.sha256(...).hexdigest()`, insitu recipe.py:31-33). */
  def fnSha256Hex(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"), sha2(col("text"), 256).as("content_hash"))

  val fnSha256HexSql: String =
    "SELECT doc_id, sha256(text) AS content_hash FROM documents"

  /** fn_struct_build — STAC item assembly → JSON (pystac.Item ctor,
    * avhrr recipe.py:67-74; JSONB parity with pgstac). */
  def fnStructBuild(s: SparkSession, dir: String): DataFrame =
    orders(s, dir).select(
      col("o_orderkey"),
      to_json(struct(
        col("o_orderkey").as("id"),
        col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"))).as("item_json"))

  val fnStructBuildSql: String =
    """SELECT o_orderkey,
      |  CAST(to_json(struct_pack(id := o_orderkey, status := o_orderstatus,
      |    priority := o_orderpriority)) AS VARCHAR) AS item_json
      |FROM orders""".stripMargin

  /** fn_array_lit4 — bbox [w,s,e,n] from 4 scalars
    * (avhrr recipe.py:51-56); carried as array AND scalars so the
    * scalar forms stay pushdown-able (SURVEY §1.2). The array rides
    * the declared output as JSON: the driver's hash-compare cannot
    * sort raw ARRAY columns (round-1 finding). */
  def fnArrayLit4(s: SparkSession, dir: String): DataFrame = {
    val w = (col("p_size") % 10).cast("double") * -10
    val sC = (col("p_partkey") % 8).cast("double") * -10
    part(s, dir).select(
      col("p_partkey"),
      to_json(array(w, sC, w + lit(15.0), sC + lit(12.0))).as("bbox_json"),
      w.as("bbox_w"), sC.as("bbox_s"),
      (w + lit(15.0)).as("bbox_e"), (sC + lit(12.0)).as("bbox_n"))
  }

  val fnArrayLit4Sql: String =
    """SELECT p_partkey,
      |  CAST(to_json([CAST(p_size % 10 AS DOUBLE) * -10,
      |   CAST(p_partkey % 8 AS DOUBLE) * -10,
      |   CAST(p_size % 10 AS DOUBLE) * -10 + 15.0,
      |   CAST(p_partkey % 8 AS DOUBLE) * -10 + 12.0]) AS VARCHAR) AS bbox_json,
      |  CAST(p_size % 10 AS DOUBLE) * -10 AS bbox_w,
      |  CAST(p_partkey % 8 AS DOUBLE) * -10 AS bbox_s,
      |  CAST(p_size % 10 AS DOUBLE) * -10 + 15.0 AS bbox_e,
      |  CAST(p_partkey % 8 AS DOUBLE) * -10 + 12.0 AS bbox_n
      |FROM part""".stripMargin

  /** fn_map_insert — add an asset entry to the assets map
    * (`item.add_asset`, avhrr recipe.py:70, insitu recipe.py:118-121). */
  def fnMapInsert(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      to_json(map_concat(
        map(lit("data"), concat(lit("https://host/"), col("source"))),
        map(lit("public"), concat(lit("https://cdn/"), col("source")))))
        .as("assets_json"))

  val fnMapInsertSql: String =
    """SELECT doc_id,
      |  CAST(to_json(MAP(['data','public'],
      |      ['https://host/' || source, 'https://cdn/' || source]))
      |    AS VARCHAR) AS assets_json
      |FROM documents""".stripMargin

  /** fn_map_transform — rewrite every value of a string map
    * (`reencode_surrogates` over attrs, insitu recipe.py:48-63);
    * here the value fix is `upper`, the surrogate repair itself is the
    * non-oracle UDF in functions.SurrogateRepair. */
  def fnMapTransform(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      to_json(transform_values(
        map(lit("lang"), col("lang"), lit("source"), col("source")),
        (_, v) => upper(v))).as("attrs_json"))

  val fnMapTransformSql: String =
    """SELECT doc_id,
      |  CAST(to_json(MAP(['lang','source'], [upper(lang), upper(source)]))
      |    AS VARCHAR) AS attrs_json
      |FROM documents""".stripMargin

  /** fn_array_append — append the collection link
    * (`item.links.append`, avhrr recipe.py:71). */
  def fnArrayAppend(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      to_json(array_append(array(lit("self"), col("source")), col("lang")))
        .as("links_json"))

  val fnArrayAppendSql: String =
    """SELECT doc_id,
      |  CAST(to_json(list_append(['self', source], lang)) AS VARCHAR)
      |    AS links_json
      |FROM documents""".stripMargin

  /** fn_conditional — null-safe conditional properties
    * (insitu recipe.py:100-108). */
  def fnConditional(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      when(col("n_chars") > 300, lit("long"))
        .when(col("n_chars") > 150, lit("medium"))
        .otherwise(lit("short")).as("size_class"),
      coalesce(nullif(col("lang"), lit("en")), lit("default"))
        .as("lang_or_default"))

  val fnConditionalSql: String =
    """SELECT doc_id,
      |  CASE WHEN n_chars > 300 THEN 'long'
      |       WHEN n_chars > 150 THEN 'medium'
      |       ELSE 'short' END AS size_class,
      |  coalesce(nullif(lang, 'en'), 'default') AS lang_or_default
      |FROM documents""".stripMargin

  /** fn_bbox_to_poly — bbox → GeoJSON Polygon ring, no geo library
    * (`shapely.box` + `mapping`, avhrr recipe.py:58-59). Integer
    * coords so both engines format identically. */
  def fnBboxToPoly(s: SparkSession, dir: String): DataFrame = {
    val w = col("p_size") % 10 * -10
    val sC = (col("p_partkey") % 8).cast("int") * -10
    val e = w + 15
    val n = sC + 12
    part(s, dir).select(
      col("p_partkey"),
      format_string(
        "{\"type\":\"Polygon\",\"coordinates\":[[[%d,%d],[%d,%d],[%d,%d],[%d,%d],[%d,%d]]]}",
        w, sC, e, sC, e, n, w, n, w, sC).as("geometry"))
  }

  val fnBboxToPolySql: String =
    """SELECT p_partkey,
      |  printf('{"type":"Polygon","coordinates":[[[%d,%d],[%d,%d],[%d,%d],[%d,%d],[%d,%d]]]}',
      |    w, s, e, s, e, n, w, n, w, s) AS geometry
      |FROM (SELECT p_partkey,
      |        (p_size % 10) * -10 AS w, CAST(p_partkey % 8 AS INT) * -10 AS s,
      |        (p_size % 10) * -10 + 15 AS e,
      |        CAST(p_partkey % 8 AS INT) * -10 + 12 AS n
      |      FROM part)""".stripMargin

  /** fn_json_extract — JSON property access (events.props; the STAC
    * item ↔ JSONB parity surface, SURVEY §2.8): schema-full
    * from_json + field extraction. */
  def fnJsonExtract(s: SparkSession, dir: String): DataFrame =
    graft.Tables.events(s, dir)
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .filter(col("k") > 50)

  val fnJsonExtractSql: String =
    """SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k
      |FROM events WHERE CAST(json_extract(props, '$.k') AS INT) > 50""".stripMargin

  /** fn_identity_hook — user post-process hook point, identity here
    * (`postprocess_item`, avhrr recipe.py:77-78). */
  def fnIdentityHook(s: SparkSession, dir: String): DataFrame = {
    val hook: DataFrame => DataFrame = identity
    hook(documents(s, dir).select(col("doc_id"), col("source")))
  }

  val fnIdentityHookSql: String =
    "SELECT doc_id, source FROM documents"

  /** fn_url_normalize — canonical URL form, the key for URL-level
    * dedup in a crawl/training pipeline (and for the reference's
    * remote granule opens, where the same file can be listed under
    * http/https, with/without default ports, casing, duplicate
    * slashes or fragments — insitu recipe.py:30-45 content-addresses
    * exactly these listings). Canonicalization: drop the fragment,
    * lowercase scheme+host, strip default ports (:80 http / :443
    * https), collapse duplicate path slashes, strip a trailing
    * slash. Query strings are preserved verbatim (reordering params
    * can change semantics). Messy variants are synthesized
    * deterministically from the time grid (minute mod 4) so both
    * engines normalize identical inputs. Pure per-row regexp
    * expressions — codegen'd, no shuffle. */
  /** ONE definition of the canonicalization chain as a Column —
    * fn_url_normalize's body, reused by pipeline_crawl_frontier so
    * frontier keys and the declared normalizer cannot drift. */
  private[operators] def urlNormCol(raw: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noFrag = regexp_replace(raw, "#.*$", "")
    val scheme =
      lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val pathq =
      regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val path = regexp_replace(
      regexp_replace(pathq, "/{2,}", "/"), "(.)/$", "$1")
    concat(scheme, lit("://"), host, path)
  }

  def fnUrlNormalize(s: SparkSession, dir: String): DataFrame = {
    val base = fnUrlTemplate(s, dir)
    val m = minute(col("ts")) % 4
    val raw = when(m === 0, col("url"))
      .when(m === 1, regexp_replace(col("url"),
        "^https://example\\.org", "HTTPS://EXAMPLE.ORG:443"))
      .when(m === 2, concat(regexp_replace(col("url"),
        "/sst/", "/sst//"), lit("#frag")))
      .otherwise(concat(regexp_replace(col("url"),
        "^https://example\\.org", "http://Example.Org:80"), lit("/")))
    base.select(col("ts"), raw.as("url_raw"),
      urlNormCol(raw).as("url_norm"))
  }

  val fnUrlNormalizeSql: String =
    s"""WITH g AS ($fnUrlTemplateSql),
       |raw AS (SELECT ts, CASE CAST(minute(ts) AS INT) % 4
       |    WHEN 0 THEN url
       |    WHEN 1 THEN regexp_replace(url, '^https://example\\.org',
       |      'HTTPS://EXAMPLE.ORG:443', 'g')
       |    WHEN 2 THEN regexp_replace(url, '/sst/', '/sst//', 'g')
       |      || '#frag'
       |    ELSE regexp_replace(url, '^https://example\\.org',
       |      'http://Example.Org:80', 'g') || '/' END AS url_raw
       |  FROM g),
       |nf AS (SELECT ts, url_raw,
       |    regexp_replace(url_raw, '#.*$$', '', 'g') AS u FROM raw),
       |parts AS (SELECT ts, url_raw,
       |    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
       |      AS scheme,
       |    lower(regexp_extract(u,
       |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
       |    regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')
       |      AS pathq
       |  FROM nf)
       |SELECT ts, url_raw,
       |  scheme || '://' ||
       |  CASE WHEN scheme = 'http'
       |         THEN regexp_replace(hostport, ':80$$', '')
       |       WHEN scheme = 'https'
       |         THEN regexp_replace(hostport, ':443$$', '')
       |       ELSE hostport END ||
       |  regexp_replace(regexp_replace(pathq, '/{2,}', '/', 'g'),
       |    '(.)/$$', '\\1') AS url_norm
       |FROM parts""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_url_normalize" -> (fnUrlNormalize _),
    "fn_url_template" -> (fnUrlTemplate _),
    "fn_norm_datetime" -> (fnNormDatetime _),
    "fn_str_to_double" -> (fnStrToDouble _),
    "fn_rsplit_part" -> (fnRsplitPart _),
    "fn_concat_id" -> (fnConcatId _),
    "fn_sha256_hex" -> (fnSha256Hex _),
    "fn_struct_build" -> (fnStructBuild _),
    "fn_array_lit4" -> (fnArrayLit4 _),
    "fn_map_insert" -> (fnMapInsert _),
    "fn_map_transform" -> (fnMapTransform _),
    "fn_array_append" -> (fnArrayAppend _),
    "fn_conditional" -> (fnConditional _),
    "fn_bbox_to_poly" -> (fnBboxToPoly _),
    "fn_json_extract" -> (fnJsonExtract _),
    "fn_identity_hook" -> (fnIdentityHook _)
  )

  def oracle: Map[String, String] = Map(
    "fn_url_normalize" -> fnUrlNormalizeSql,
    "fn_url_template" -> fnUrlTemplateSql,
    "fn_norm_datetime" -> fnNormDatetimeSql,
    "fn_str_to_double" -> fnStrToDoubleSql,
    "fn_rsplit_part" -> fnRsplitPartSql,
    "fn_concat_id" -> fnConcatIdSql,
    "fn_sha256_hex" -> fnSha256HexSql,
    "fn_struct_build" -> fnStructBuildSql,
    "fn_array_lit4" -> fnArrayLit4Sql,
    "fn_map_insert" -> fnMapInsertSql,
    "fn_map_transform" -> fnMapTransformSql,
    "fn_array_append" -> fnArrayAppendSql,
    "fn_conditional" -> fnConditionalSql,
    "fn_bbox_to_poly" -> fnBboxToPolySql,
    "fn_json_extract" -> fnJsonExtractSql,
    "fn_identity_hook" -> fnIdentityHookSql
  )
}
