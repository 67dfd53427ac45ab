package graft.ingest

/** Robots Exclusion Protocol parser (RFC 9309 subset) — the
  * crawl-politeness gate every published pipeline applies before a
  * URL is even fetched. Implemented rules:
  *
  *  - groups: consecutive `User-agent:` lines open a group; the
  *    following `Allow:` / `Disallow:` lines belong to every agent
  *    named above them (RFC 9309 §2.2.1).
  *  - group selection: the group whose agent token is the longest
  *    case-insensitive prefix of the product token wins; otherwise
  *    the `*` group; otherwise everything is allowed.
  *  - rule matching: plain prefix match. The RFC's `*`/`$`
  *    metacharacters are handled CONSERVATIVELY (fail-closed for a
  *    politeness gate, r16 advisory): a `Disallow` containing them
  *    falls back to its literal prefix up to the first
  *    metacharacter — a slash-then-star Disallow disallows
  *    everything, `Disallow: /private&#42;` at least `/private` — which
  *    blocks a superset of what the full pattern would; an `Allow`
  *    containing them is DROPPED (dropping an Allow also fails
  *    closed). Full wildcard matching is NOT implemented; the
  *    conservative direction only ever under-crawls.
  *  - decision: the LONGEST matching rule wins; on a length tie,
  *    Allow wins (RFC 9309 §2.2.2). An empty Disallow allows all.
  *
  * Parsing is line-local and total: unknown fields and malformed
  * lines are skipped, never fatal (a crawler that dies on a weird
  * robots.txt fetches nothing).
  */
object RobotsTxt {

  /** (isAllow, pathPrefix) rules for one selected group, plus the
    * group's `Crawl-delay` if one parsed (the de-facto politeness
    * extension most crawlers honor — not in RFC 9309, which is why
    * it rides on Rules as metadata rather than entering the
    * allow/disallow precedence). */
  final case class Rules(rules: Vector[(Boolean, String)],
      crawlDelay: Option[Long] = None) {
    /** RFC 9309 §2.2.2: longest match wins; ties go to Allow. */
    def allows(path: String): Boolean = {
      var bestLen = -1
      var bestAllow = true // no matching rule → allowed
      rules.foreach { case (isAllow, prefix) =>
        if (path.startsWith(prefix) && prefix.length >= bestLen) {
          if (prefix.length > bestLen) {
            bestLen = prefix.length
            bestAllow = isAllow
          } else if (isAllow) bestAllow = true // tie → Allow
        }
      }
      bestAllow
    }
    def size: Int = rules.size
  }

  private final case class Group(
      agents: Vector[String], rules: Vector[(Boolean, String)],
      crawlDelay: Option[Long])

  /** Parse the full file and select the group for `agent`. */
  def rulesFor(robots: String, agent: String): Rules = {
    val groups = parseGroups(robots)
    val a = agent.toLowerCase
    // longest agent token that prefixes the product token
    val specific = groups
      .flatMap(g => g.agents.filter(t => t != "*" && a.startsWith(t))
        .map(t => (t.length, g)))
      .sortBy(-_._1)
      .headOption.map(_._2)
    val chosen = specific.orElse(groups.find(_.agents.contains("*")))
    Rules(chosen.map(_.rules).getOrElse(Vector.empty),
      chosen.flatMap(_.crawlDelay))
  }

  private def parseGroups(robots: String): Vector[Group] = {
    val out = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[(Boolean, String)]
    var delay = Option.empty[Long]
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) out += Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None
      inRules = false
    }
    robots.split("\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim // comments
      val i = line.indexOf(':')
      if (i > 0) {
        val field = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        field match {
          case "user-agent" =>
            if (inRules) flush() // a UA after rules starts a NEW group
            agents :+= value.toLowerCase
          case "allow" | "disallow" if agents.nonEmpty =>
            inRules = true
            val isAllow = field == "allow"
            val hasMeta = value.contains('*') || value.contains('$')
            if (!hasMeta) {
              // empty Disallow = allow everything (no rule)
              if (value.nonEmpty) rules :+= (isAllow, value)
            } else if (!isAllow) {
              // conservative wildcard fallback (see scaladoc): the
              // Disallow matches AT LEAST its literal prefix up to the
              // first metacharacter — `Disallow: /*` or `Disallow: *`
              // truncate to a prefix that matches every path. Wildcard
              // Allow rules stay dropped (also fail-closed).
              rules :+= (false,
                value.takeWhile(c => c != '*' && c != '$'))
            }
          case "crawl-delay" if agents.nonEmpty =>
            // de-facto extension: seconds between fetches. Fractional
            // values round UP (politeness never rounds toward faster);
            // unparseable values are skipped like any malformed line.
            inRules = true
            try {
              val d = math.ceil(value.toDouble).toLong
              if (d >= 0) delay = Some(d)
            } catch { case _: NumberFormatException => () }
          case _ => () // sitemap, unknown fields
        }
      }
    }
    flush()
    out.result()
  }
}
