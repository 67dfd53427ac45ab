package graft.ingest

/** Sitemap-protocol parser (sitemaps.org XML subset) — the crawl
  * SEED-LIST source: a crawler reads the sitemap index, fans out to
  * the per-section urlsets, and feeds the locs into the frontier
  * (robots.txt's `Sitemap:` field points here). Implemented subset:
  * `<sitemapindex><sitemap><loc>` and
  * `<urlset><url><loc|lastmod|changefreq|priority>`; namespaces and
  * attributes are skipped by matching local tag names only; entities
  * in values are NOT decoded (sitemap locs are required to be
  * entity-escaped URLs — the four standard entities are decoded).
  * Scanning is indexOf-based (no regex), line-agnostic, and total:
  * a block missing a field yields an empty string, malformed
  * fragments are skipped — a crawler must not die on a bad sitemap.
  */
object SitemapXml {

  final case class Entry(
      loc: String, lastmod: String, changefreq: String, priority: String)

  /** `<sitemap><loc>` values of a sitemap index document. */
  def parseIndex(xml: String): Seq[String] =
    blocks(xml, "sitemap").map(b => field(b, "loc")).filter(_.nonEmpty)

  /** `<url>` entries of a urlset document. */
  def parseUrlset(xml: String): Seq[Entry] =
    blocks(xml, "url").map { b =>
      Entry(field(b, "loc"), field(b, "lastmod"),
        field(b, "changefreq"), field(b, "priority"))
    }.filter(_.loc.nonEmpty)

  private def blocks(xml: String, tag: String): Seq[String] = {
    val open = s"<$tag>"
    val close = s"</$tag>"
    val out = Seq.newBuilder[String]
    var i = xml.indexOf(open)
    while (i >= 0) {
      val start = i + open.length
      val end = xml.indexOf(close, start)
      if (end < 0) i = -1 // truncated block: skip, never throw
      else {
        out += xml.substring(start, end)
        i = xml.indexOf(open, end + close.length)
      }
    }
    out.result()
  }

  private def field(block: String, tag: String): String = {
    val open = s"<$tag>"
    val start = block.indexOf(open)
    if (start < 0) return ""
    val from = start + open.length
    val end = block.indexOf(s"</$tag>", from)
    if (end < 0) "" else decode(block.substring(from, end).trim)
  }

  private def decode(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&amp;", "&")
}
