package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** RobotsTxt: RFC 9309 group selection and rule precedence on planted
  * files — the semantics the arithmetic oracle of
  * curation_robots_filter cross-validates at corpus scale. */
class RobotsTxtSpec extends AnyFunSuite {

  private val file =
    """# a comment line
      |User-agent: crawler-x
      |Disallow: /
      |
      |User-agent: graft-fetch
      |Disallow: /beta/
      |
      |User-agent: *
      |Disallow: /private/
      |Disallow: /p/
      |Allow: /p/public
      |Crawl-delay: 2
      |Sitemap: https://example.org/map.xml
      |""".stripMargin

  test("group selection: specific product-token prefix beats *, " +
      "unknown agents fall to *") {
    val g = RobotsTxt.rulesFor(file, "graft-fetch/1.0")
    assert(!g.allows("/beta/x"), "the graft-fetch group applies")
    assert(g.allows("/p/anything"),
      "the * group's /p/ disallow must NOT leak into the specific group")
    val star = RobotsTxt.rulesFor(file, "someone-else")
    assert(!star.allows("/p/anything"))
    assert(!star.allows("/private/f"))
    assert(star.allows("/open/page"))
  }

  test("longest match wins and ties go to Allow") {
    val star = RobotsTxt.rulesFor(file, "zzz")
    assert(star.allows("/p/public/doc"),
      "Allow /p/public (longer) overrides Disallow /p/")
    val tie = RobotsTxt.rulesFor(
      "User-agent: *\nDisallow: /a/\nAllow: /a/\n", "x")
    assert(tie.allows("/a/doc"), "equal-length rules tie to Allow")
  }

  test("no matching group, empty Disallow, metacharacter rules, and " +
      "malformed lines all fail OPEN") {
    assert(RobotsTxt.rulesFor("User-agent: other\nDisallow: /\n", "me")
      .allows("/x"), "no group for this agent → allowed")
    assert(RobotsTxt.rulesFor("User-agent: *\nDisallow:\n", "me")
      .allows("/x"), "empty Disallow allows all")
    assert(RobotsTxt.rulesFor("garbage line no colon\n%%%\n", "me")
      .allows("/anything"))
  }

  test("wildcard Disallow fails CLOSED via its literal prefix " +
      "(r16 advisory: the politeness gate must not fail open)") {
    // the very common site-wide wildcard: Disallow: /* blocks all
    val all = RobotsTxt.rulesFor("User-agent: *\nDisallow: /*\n", "me")
    assert(!all.allows("/") && !all.allows("/any/page"),
      "Disallow: /* must block the whole site, not be dropped")
    // a mid-pattern wildcard blocks at least its literal prefix
    val pre = RobotsTxt.rulesFor(
      "User-agent: *\nDisallow: /private*\n", "me")
    assert(!pre.allows("/private") && !pre.allows("/private/f") &&
      !pre.allows("/private-x"))
    assert(pre.allows("/public/f"),
      "the conservative prefix must not leak past the literal part")
    // '$'-anchored rules keep the prefix, dropping only the anchor
    val anch = RobotsTxt.rulesFor(
      "User-agent: *\nDisallow: /tmp/$\n", "me")
    assert(!anch.allows("/tmp/") && !anch.allows("/tmp/deep"),
      "anchor dropped conservatively: the prefix still blocks")
    // the pattern that truncates to an empty prefix blocks everything
    assert(!RobotsTxt.rulesFor("User-agent: *\nDisallow: *\n", "me")
      .allows("/x"))
  }

  test("wildcard Allow is DROPPED (also fail-closed): it cannot " +
      "re-open a disallowed subtree") {
    val f = "User-agent: *\nDisallow: /p/\nAllow: /p/pub*\n"
    val r = RobotsTxt.rulesFor(f, "me")
    assert(!r.allows("/p/pub/doc"),
      "a wildcard Allow must not be misread as a literal re-allow")
    assert(!r.allows("/p/other"))
    // a LITERAL Allow still wins by longest-match as before
    val lit = RobotsTxt.rulesFor(
      "User-agent: *\nDisallow: /p/\nAllow: /p/pub\n", "me")
    assert(lit.allows("/p/pub/doc") && !lit.allows("/p/other"))
  }

  test("a User-agent line AFTER rules starts a new group (RFC group " +
      "boundary)") {
    val f = "User-agent: a\nDisallow: /x/\nUser-agent: b\nDisallow: /y/\n"
    assert(!RobotsTxt.rulesFor(f, "a").allows("/x/1"))
    assert(RobotsTxt.rulesFor(f, "a").allows("/y/1"))
    assert(!RobotsTxt.rulesFor(f, "b").allows("/y/1"))
    assert(RobotsTxt.rulesFor(f, "b").allows("/x/1"))
  }

  test("adjacent User-agent lines share one rule set") {
    val f = "User-agent: a\nUser-agent: b\nDisallow: /x/\n"
    assert(!RobotsTxt.rulesFor(f, "a").allows("/x/1"))
    assert(!RobotsTxt.rulesFor(f, "b").allows("/x/1"))
  }

  test("Crawl-delay: per-group, fractional rounds UP, malformed and " +
      "absent yield None, and the line never enters rule precedence") {
    // the shared fixture file: * group publishes 2
    assert(RobotsTxt.rulesFor(file, "zzz").crawlDelay.contains(2L))
    // the specific group publishes none — no leak from the * group
    assert(RobotsTxt.rulesFor(file, "graft-fetch/1.0").crawlDelay.isEmpty)
    // fractional (politeness rounds toward slower, never faster)
    assert(RobotsTxt.rulesFor(
      "User-agent: *\nCrawl-delay: 0.5\n", "me").crawlDelay.contains(1L))
    // malformed → skipped like any malformed line
    assert(RobotsTxt.rulesFor(
      "User-agent: *\nCrawl-delay: soon\n", "me").crawlDelay.isEmpty)
    // a Crawl-delay after rules stays in ITS group; a UA line after
    // it starts a new one (the delay is part of the rule section)
    val f = "User-agent: a\nDisallow: /x/\nCrawl-delay: 3\n" +
      "User-agent: b\nDisallow: /y/\n"
    assert(RobotsTxt.rulesFor(f, "a").crawlDelay.contains(3L))
    assert(RobotsTxt.rulesFor(f, "b").crawlDelay.isEmpty)
    // precedence untouched: the delay line adds no allow/disallow rule
    assert(RobotsTxt.rulesFor(f, "a").size == 1)
  }
}
