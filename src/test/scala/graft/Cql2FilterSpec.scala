package graft

import org.apache.spark.sql.functions._

import graft.catalog.{CatalogQuery, Cql2Filter}

class Cql2FilterSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  private def count(filter: String): Long =
    docs.filter(Cql2Filter.compile(filter, docs.columns.toSet)).count()

  test("comparisons and logic match the equivalent Column filters") {
    assert(count("n_chars > 300") ==
      docs.filter(col("n_chars") > 300).count())
    assert(count("lang = 'en' AND n_chars <= 200") ==
      docs.filter(col("lang") === "en" && col("n_chars") <= 200).count())
    assert(count("lang = 'en' OR lang = 'fr'") ==
      docs.filter(col("lang").isin("en", "fr")).count())
    assert(count("NOT (lang = 'en')") ==
      docs.filter(col("lang") =!= "en").count())
  }

  test("IN, LIKE, IS NULL") {
    assert(count("lang IN ('en', 'de', 'zh')") ==
      docs.filter(col("lang").isin("en", "de", "zh")).count())
    assert(count("source LIKE 'src1%'") ==
      docs.filter(col("source").like("src1%")).count())
    assert(count("lang IS NOT NULL") == docs.count())
    assert(count("lang IS NULL") == 0)
  }

  test("operator precedence: AND binds tighter than OR") {
    val got = count("lang = 'en' OR lang = 'fr' AND n_chars > 300")
    val want = docs.filter(col("lang") === "en" ||
      (col("lang") === "fr" && col("n_chars") > 300)).count()
    assert(got == want)
  }

  test("unknown properties fall back to the properties map") {
    import spark.implicits._
    val items = Seq(
      ("i1", Map("quality" -> "good")),
      ("i2", Map("quality" -> "bad"))
    ).toDF("item_id", "properties")
    val got = items
      .filter(Cql2Filter.compile("quality = 'good'", items.columns.toSet))
      .collect().map(_.getString(0))
    assert(got.sameElements(Array("i1")))
  }

  test("keyword-prefixed identifiers, escaped quotes, exponents, missing keys") {
    import spark.implicits._
    val items = Seq(
      ("i1", Map("not_processed" -> "x", "title" -> "O'Brien",
        "eps" -> "0.002")),
      ("i2", Map("other" -> "y"))
    ).toDF("item_id", "properties")
    def ids(f: String) = items
      .filter(Cql2Filter.compile(f, items.columns.toSet))
      .collect().map(_.getString(0)).toSeq
    // identifier starting with a keyword prefix is NOT the keyword
    assert(ids("not_processed = 'x'") == Seq("i1"))
    // doubled-quote escape
    assert(ids("title = 'O''Brien'") == Seq("i1"))
    // scientific notation parses
    assert(Cql2Filter.compile("eps > 1e-3", Set.empty) != null)
    // missing map key is null, not a crash (ANSI mode)
    assert(ids("other = 'y'") == Seq("i2"))
  }

  test("numeric comparison on a non-numeric property value filters, not crashes") {
    import spark.implicits._
    val items = Seq(
      ("i1", Map("cloud_cover" -> "12.5")),
      ("i2", Map("cloud_cover" -> "not-a-number")),
      ("i3", Map("cloud_cover" -> "80")),
      ("i4", Map("flag" -> "true"))
    ).toDF("item_id", "properties")
    def ids(f: String) = items
      .filter(Cql2Filter.compile(f, items.columns.toSet))
      .collect().map(_.getString(0)).toSeq
    // ANSI mode: the "not-a-number" value must become null (row
    // filtered), not a CAST_INVALID_INPUT crash killing the search
    assert(ids("cloud_cover < 50") == Seq("i1"))
    assert(ids("cloud_cover >= 12.5") == Seq("i1", "i3"))
    assert(ids("cloud_cover IN (80, 99)") == Seq("i3"))
    assert(ids("flag = TRUE") == Seq("i4"))
    // MIXED-type IN list: each member compares through its own
    // try-cast branch (numeric vs string), so Spark's ANSI common-type
    // coercion never sees the non-numeric property value
    assert(ids("cloud_cover IN (80, 'not-a-number')").toSet ==
      Set("i2", "i3"))
    assert(ids("flag IN (TRUE, 'nope')") == Seq("i4"))
  }

  test("malformed input fails loudly") {
    intercept[Exception](Cql2Filter.compile("n_chars >", Set("n_chars")))
    intercept[Exception](Cql2Filter.compile("(lang = 'en'", Set("lang")))
    intercept[Exception](Cql2Filter.compile("lang = 'en' extra", Set("lang")))
  }

  test("cql2-json compiles to the same AST and results as cql2-text") {
    import Cql2Filter._
    // identical filters, both encodings — the ASTs must be EQUAL, so
    // every downstream Column translation is shared by construction
    val pairs = Seq(
      "n_chars > 300" ->
        """{"op":">","args":[{"property":"n_chars"},300]}""",
      "lang = 'en' AND n_chars <= 200" ->
        """{"op":"and","args":[
          |{"op":"=","args":[{"property":"lang"},"en"]},
          |{"op":"<=","args":[{"property":"n_chars"},200]}]}""".stripMargin,
      "lang IN ('en', 'de', 'zh')" ->
        """{"op":"in","args":[{"property":"lang"},["en","de","zh"]]}""",
      "source LIKE 'src1%'" ->
        """{"op":"like","args":[{"property":"source"},"src1%"]}""",
      "lang IS NULL" ->
        """{"op":"isNull","args":[{"property":"lang"}]}""",
      "NOT (lang = 'en')" ->
        """{"op":"not","args":[
          |{"op":"=","args":[{"property":"lang"},"en"]}]}""".stripMargin,
      "lang = 'en' OR lang = 'fr' AND n_chars > 300" ->
        """{"op":"or","args":[
          |{"op":"=","args":[{"property":"lang"},"en"]},
          |{"op":"and","args":[
          |  {"op":"=","args":[{"property":"lang"},"fr"]},
          |  {"op":">","args":[{"property":"n_chars"},300]}]}]}""".stripMargin
    )
    pairs.foreach { case (text, json) =>
      assert(parseJson(json) == new Parser(text).parseAll(),
        s"AST mismatch for: $text")
      val t = docs.filter(compile(text, docs.columns.toSet)).count()
      val j = docs.filter(compileJson(json, docs.columns.toSet)).count()
      assert(t == j, s"row-count mismatch for: $text ($t vs $j)")
    }
    // n-ary and folds left; floats stay Double, ints stay Long
    assert(parseJson(
      """{"op":"and","args":[
        |{"op":"=","args":[{"property":"a"},1]},
        |{"op":"=","args":[{"property":"b"},2.5]},
        |{"op":"=","args":[{"property":"c"},true]}]}""".stripMargin) ==
      And(And(Cmp("a", "=", 1L), Cmp("b", "=", 2.5)), Cmp("c", "=", true)))
    // malformed JSON / unknown ops / bad shapes fail loudly
    intercept[IllegalArgumentException](parseJson("not json at all"))
    intercept[IllegalArgumentException](
      parseJson("""{"op":"between","args":[]}"""))
    intercept[Exception](
      parseJson("""{"op":"=","args":[{"property":"a"}]}"""))
    intercept[Exception](
      parseJson("""{"op":"in","args":[{"property":"a"},"not-array"]}"""))
  }

  test("cql2-json plugs into the STAC search compiler like cql2-text") {
    val path = java.nio.file.Files.createTempDirectory("graft-cqlj").toString
    val (items, _) = graft.catalog.ItemAssembly.assemble(
      new graft.ingest.FixtureGranuleSource(
        end = "2022-05-01 02:59:59").granules(spark))
    graft.catalog.CatalogStore.write(items, s"$path/items")
    val all = graft.catalog.CatalogStore.read(spark, s"$path/items")
    val viaText = CatalogQuery.compile(all, CatalogQuery.Search(
      cql2 = Some("bbox_n >= 0 AND item_id LIKE 'granule-%'"),
      limit = 1000)).collect().map(_.getAs[String]("item_id")).toSeq
    val viaJson = CatalogQuery.compile(all, CatalogQuery.Search(
      cql2Json = Some(
        """{"op":"and","args":[
          |{"op":">=","args":[{"property":"bbox_n"},0]},
          |{"op":"like","args":[{"property":"item_id"},"granule-%"]}]}"""
          .stripMargin),
      limit = 1000)).collect().map(_.getAs[String]("item_id")).toSeq
    assert(viaText.nonEmpty && viaText == viaJson)
  }

  test("spatial/temporal/advanced ops: text and json forms, hand-computed") {
    import spark.implicits._
    val items = Seq(
      ("i1", """{"type":"Point","coordinates":[5.0,5.0]}""",
        5.0, 5.0, 5.0, 5.0,
        "2022-05-01 00:00:00", "2022-05-01 06:00:00", Map("name" -> "Alpha")),
      ("i2", """{"type":"LineString","coordinates":[[20.0,20.0],[30.0,30.0]]}""",
        20.0, 20.0, 30.0, 30.0,
        "2022-05-02 00:00:00", "2022-05-02 06:00:00", Map("name" -> "beta")),
      ("i3", """{"type":"Point","coordinates":[-50.0,8.0]}""",
        -50.0, 8.0, -50.0, 8.0,
        "2022-06-01 00:00:00", "2022-06-02 00:00:00", Map("name" -> "GAMMA"))
    ).toDF("item_id", "geometry", "bbox_w", "bbox_s", "bbox_e", "bbox_n",
        "start_s", "end_s", "properties")
      .withColumn("start_datetime", col("start_s").cast("timestamp"))
      .withColumn("end_datetime", col("end_s").cast("timestamp"))
      .drop("start_s", "end_s")
    def ids(text: String): Seq[String] = items
      .filter(Cql2Filter.compile(text, items.columns.toSet))
      .collect().map(_.getString(0)).toSeq.sorted
    def idsJ(json: String): Seq[String] = items
      .filter(Cql2Filter.compileJson(json, items.columns.toSet))
      .collect().map(_.getString(0)).toSeq.sorted

    // s_intersects: polygon containing only i1; WKT and GeoJSON forms
    assert(ids(
      "S_INTERSECTS(geometry, POLYGON((0 0, 10 0, 10 10, 0 10, 0 0)))") ==
      Seq("i1"))
    assert(idsJ(
      """{"op":"s_intersects","args":[{"property":"geometry"},
        |{"type":"Polygon",
        | "coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]]]}]}"""
        .stripMargin) == Seq("i1"))
    // BBOX literal covers i1 and i3
    assert(ids("S_INTERSECTS(geometry, BBOX(-60, 0, 10, 10))") ==
      Seq("i1", "i3"))
    // envelope-overlaps-but-exact-misses: the i2 diagonal's bbox meets
    // this box, the line itself does not — the recheck must reject it
    assert(ids(
      "S_INTERSECTS(geometry, POLYGON((28 18, 32 18, 32 22, 28 22, 28 18)))")
      .isEmpty)
    // t_intersects on `datetime` → [start,end] interval overlap
    assert(ids("T_INTERSECTS(datetime, " +
      "INTERVAL('2022-05-01T03:00:00Z', '2022-05-01T23:00:00Z'))") ==
      Seq("i1"))
    assert(idsJ(
      """{"op":"t_intersects","args":[{"property":"datetime"},
        |{"interval":["2022-05-01T03:00:00Z","2022-05-01T23:00:00Z"]}]}"""
        .stripMargin) == Seq("i1"))
    // anyinteracts alias + open upper end
    assert(ids("ANYINTERACTS(datetime, INTERVAL('2022-05-15T00:00:00Z', '..'))")
      == Seq("i3"))
    // a plain timestamp column → containment semantics
    assert(ids("T_INTERSECTS(start_datetime, " +
      "INTERVAL('2022-05-01T12:00:00Z', '2022-06-01T12:00:00Z'))") ==
      Seq("i2", "i3"))
    // BETWEEN is bounds-inclusive; NOT BETWEEN negates
    assert(ids("bbox_n BETWEEN 5 AND 20") == Seq("i1", "i3"))
    assert(ids("bbox_n NOT BETWEEN 5 AND 20") == Seq("i2"))
    assert(idsJ("""{"op":"between","args":[{"property":"bbox_n"},5,20]}""") ==
      Seq("i1", "i3"))
    // CASEI over a map-fallback property, IN, LIKE, and a top column
    assert(ids("CASEI(name) = CASEI('ALPHA')") == Seq("i1"))
    assert(ids("CASEI(name) IN ('beta', 'gamma')") == Seq("i2", "i3"))
    assert(ids("CASEI(item_id) LIKE 'I1%'") == Seq("i1"))
    assert(idsJ(
      """{"op":"=","args":[{"op":"casei","args":[{"property":"name"}]},
        |{"op":"casei","args":["ALPHA"]}]}""".stripMargin) == Seq("i1"))
    // malformed spatial/temporal forms fail loudly, as 400-able errors
    intercept[IllegalArgumentException](
      Cql2Filter.compile("S_INTERSECTS(geometry, CIRCLE(0 0 5))", Set.empty))
    intercept[IllegalArgumentException](
      Cql2Filter.compile("T_INTERSECTS(datetime, INTERVAL('nope', '..'))",
        Set.empty))
  }

  test("cql2 filter plugs into the STAC search compiler") {
    val path = java.nio.file.Files.createTempDirectory("graft-cql").toString
    val (items, _) = graft.catalog.ItemAssembly.assemble(
      new graft.ingest.FixtureGranuleSource(
        end = "2022-05-01 02:59:59").granules(spark))
    graft.catalog.CatalogStore.write(items, s"$path/items")
    val all = graft.catalog.CatalogStore.read(spark, s"$path/items")
    val page = CatalogQuery.compile(all, CatalogQuery.Search(
      cql2 = Some("bbox_n >= 0 AND item_id LIKE 'granule-%'"),
      limit = 1000)).collect()
    assert(page.nonEmpty)
    assert(page.forall(_.getAs[Double]("bbox_n") >= 0))
  }
}
