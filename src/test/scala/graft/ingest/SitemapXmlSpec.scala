package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** SitemapXml: subset fidelity + the fail-open contract on malformed
  * documents. */
class SitemapXmlSpec extends AnyFunSuite {

  test("urlset round-trip: fields extracted, missing fields empty, " +
      "entities decoded in amp-last order") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://a.example/p?x=1&amp;y=2</loc>
        |  <lastmod>2022-05-03</lastmod>
        |  <changefreq>daily</changefreq><priority>0.8</priority></url>
        |<url><loc>https://a.example/q</loc></url>
        |</urlset>""".stripMargin
    val es = SitemapXml.parseUrlset(xml)
    assert(es.size == 2)
    assert(es.head.loc == "https://a.example/p?x=1&y=2")
    assert(es.head.lastmod == "2022-05-03" &&
      es.head.changefreq == "daily" && es.head.priority == "0.8")
    assert(es(1) == SitemapXml.Entry("https://a.example/q", "", "", ""))
  }

  test("attributed and namespace-prefixed tags parse by local name " +
      "(r16 advisory: real sitemaps attribute/prefix these elements)") {
    val xml =
      """<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<sm:url data-x="1"><sm:loc>https://a.example/p1</sm:loc>
        |  <sm:lastmod>2022-05-03</sm:lastmod></sm:url>
        |<url class="plain"><loc>https://a.example/p2</loc></url>
        |<url/>
        |<url />
        |</sm:urlset>""".stripMargin
    val es = SitemapXml.parseUrlset(xml)
    assert(es.map(_.loc) ==
      Seq("https://a.example/p1", "https://a.example/p2"),
      s"prefixed + attributed tags must both yield entries, got $es")
    assert(es.head.lastmod == "2022-05-03")
    val idx =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<sitemap id="a"><loc>file:/a/s-0.xml</loc></sitemap>
        |<ns:sitemap><ns:loc>file:/a/s-1.xml</ns:loc></ns:sitemap>
        |</sitemapindex>""".stripMargin
    assert(SitemapXml.parseIndex(idx) ==
      Seq("file:/a/s-0.xml", "file:/a/s-1.xml"))
    // comments / PIs whose text contains the tag name are not blocks
    assert(SitemapXml.parseUrlset(
      "<?xml version=\"1.0\"?><!-- <url> --><urlset></urlset>").isEmpty)
  }

  test("index parse + truncated/locless blocks skip, never throw") {
    val idx = """<sitemapindex>
      |<sitemap><loc>file:/a/sitemap-0.xml</loc></sitemap>
      |<sitemap><lastmod>2022-01-01</lastmod></sitemap>
      |<sitemap><loc>file:/a/sitemap-1.xml</loc></sitemap>
      |<sitemap><loc>file:/a/trunc""".stripMargin
    assert(SitemapXml.parseIndex(idx) ==
      Seq("file:/a/sitemap-0.xml", "file:/a/sitemap-1.xml"))
    assert(SitemapXml.parseUrlset("complete garbage <url> no close")
      .isEmpty)
  }
}
