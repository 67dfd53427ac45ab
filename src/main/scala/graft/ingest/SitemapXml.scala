package graft.ingest

/** Sitemap-protocol parser (sitemaps.org XML subset) — the crawl
  * SEED-LIST source: a crawler reads the sitemap index, fans out to
  * the per-section urlsets, and feeds the locs into the frontier
  * (robots.txt's `Sitemap:` field points here). Implemented subset:
  * `<sitemapindex><sitemap><loc>` and
  * `<urlset><url><loc|lastmod|changefreq|priority>`. Tags are matched
  * by LOCAL name — attributes (`<url data-x="1">`) and namespace
  * prefixes (`<sm:url>`) on both open and close tags are accepted and
  * skipped (r16 advisory: the bare-literal match silently yielded
  * zero entries on attributed/prefixed real-world sitemaps);
  * self-closing forms (`<url/>`) are skipped as empty. Entities in
  * values: the four standard XML entities are decoded (sitemap locs
  * are required to be entity-escaped URLs). Scanning is index-based
  * (no regex), line-agnostic, and total: a block missing a field
  * yields an empty string, malformed fragments are skipped — a
  * crawler must not die on a bad sitemap.
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

  /** Scan result for one open tag: (index just past its '>', or -1). */
  private def afterOpen(xml: String, tag: String, from: Int): Int = {
    var i = xml.indexOf('<', from)
    while (i >= 0) {
      var j = i + 1
      while (j < xml.length && xml.charAt(j) != '>' &&
        xml.charAt(j) != '/' && !Character.isWhitespace(xml.charAt(j)))
        j += 1
      val name = xml.substring(i + 1, j)
      val gt = xml.indexOf('>', j)
      if (gt < 0) return -1 // truncated tag: nothing more to find
      val local = name.substring(name.lastIndexOf(':') + 1)
      val selfClosing = xml.charAt(gt - 1) == '/'
      if (local == tag && !name.startsWith("/") && !name.startsWith("!") &&
        !name.startsWith("?") && !selfClosing)
        return gt + 1
      i = xml.indexOf('<', gt)
    }
    -1
  }

  /** Index of the '<' of the next close tag `</[prefix:]tag…>`, or -1. */
  private def closeOf(xml: String, tag: String, from: Int): Int = {
    var i = xml.indexOf("</", from)
    while (i >= 0) {
      var j = i + 2
      while (j < xml.length && xml.charAt(j) != '>' &&
        !Character.isWhitespace(xml.charAt(j)))
        j += 1
      val name = xml.substring(i + 2, j)
      if (name.substring(name.lastIndexOf(':') + 1) == tag) return i
      i = xml.indexOf("</", j)
    }
    -1
  }

  private def blocks(xml: String, tag: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var start = afterOpen(xml, tag, 0)
    while (start >= 0) {
      val end = closeOf(xml, tag, start)
      if (end < 0) start = -1 // truncated block: skip, never throw
      else {
        out += xml.substring(start, end)
        val gt = xml.indexOf('>', end)
        start = if (gt < 0) -1 else afterOpen(xml, tag, gt + 1)
      }
    }
    out.result()
  }

  private def field(block: String, tag: String): String = {
    val from = afterOpen(block, tag, 0)
    if (from < 0) return ""
    val end = closeOf(block, tag, from)
    if (end < 0) "" else decode(block.substring(from, end).trim)
  }

  private def decode(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&amp;", "&")
}
