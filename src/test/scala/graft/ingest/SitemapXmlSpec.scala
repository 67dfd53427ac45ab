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
