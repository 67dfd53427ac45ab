package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** pipeline_crawl_frontier: the invariants the oracle gate can't
  * state — the politeness cap actually binds, failed fetches are
  * re-queued, already-fetched pages never reappear, and the robots
  * gate bites per host. */
class CrawlFrontierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = WarcQueries
    .pipelineCrawlFrontier(spark, sf)
    .select(col("host"), col("url_norm"), col("n_refs"), col("rk"))
    .as[(String, String, Long, Long)].collect()

  test("per-host politeness cap binds: no host exceeds the cap, and " +
      "rk is dense 1..n within each host") {
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (h, rs) =>
      assert(rs.length <= WarcQueries.FRONTIER_HOST_CAP,
        s"$h: ${rs.length} rows exceed the cap")
      assert(rs.map(_._4).sorted.toSeq == (1L to rs.length).toSeq,
        s"$h: ranks must be dense")
    }
  }

  test("failed fetches are re-queued; successful ones never " +
      "reappear (the seen-set anti-join is exact, not just " +
      "bloom-approximate)") {
    val exOrg = rows.filter(_._1 == "example.org").map(_._2)
    assert(exOrg.nonEmpty, "the 404 retry branch must survive")
    val ids = exOrg.map(u => u.split("/page/")(1).toLong)
    assert(ids.forall(_ % 7 == 0),
      s"every re-queued example.org page must be a prior 404, got " +
        s"${ids.filterNot(_ % 7 == 0).take(5).toSeq}")
    // exactness: a bloom false positive would DROP a fresh URL; the
    // retry set must therefore be the complete capped 404 list
    val all404 = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 7 === 0).count()
    assert(exOrg.length ==
      math.min(all404, WarcQueries.FRONTIER_HOST_CAP.toLong),
      "no fresh URL may be lost to a bloom false positive")
  }

  test("robots gate bites per host: d%3==0 domains carry only " +
      "Allow-listed pages (id starting '1' when d%6==0), and the " +
      "fully disallowed hosts are absent") {
    val byHost = rows.groupBy(_._1)
    // d=3 (shopmart.io) and d=9 (campuswiki.edu): /page/ disallowed,
    // no Allow rule -> the host must be absent entirely
    assert(!byHost.contains("shopmart.io") &&
      !byHost.contains("campuswiki.edu"),
      s"fully robots-blocked hosts must be absent, got ${byHost.keySet}")
    // d=0 and d=6: disallowed except the '/page/1' Allow prefix
    Seq("example-news.com", "spam-mill.info").foreach { h =>
      byHost.get(h).foreach { rs =>
        assert(rs.forall(_._2.split("/page/")(1).startsWith("1")),
          s"$h: only the Allow-listed '1…' pages may pass")
      }
    }
    // an unrestricted domain (d=1) is present with unrestricted ids
    assert(byHost.contains("example-blog.net"))
  }

  test("discovered links rank by reference count: within a host, " +
      "n_refs is non-increasing in rk") {
    rows.groupBy(_._1).foreach { case (h, rs) =>
      val byRk = rs.sortBy(_._4).map(_._3)
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a >= b },
        s"$h: n_refs must be non-increasing in rank")
    }
  }

  test("fetch schedule: consecutive fetches on one host are spaced " +
      "at exactly the host's Crawl-delay; the seed host (no " +
      "published delay) paces at the 1 s default") {
    val sched = WarcQueries.pipelineFetchSchedule(spark, sf)
      .select(col("host"), col("rk"), col("delay_s"),
        col("fetch_at_s"), col("wave"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(sched.nonEmpty)
    // the schedule covers the frontier 1:1 — no URL lost or invented
    assert(sched.length == rows.length,
      s"schedule rows ${sched.length} != frontier rows ${rows.length}")
    sched.groupBy(_._1).foreach { case (h, rs) =>
      val byRk = rs.sortBy(_._2)
      val d = byRk.head._3
      assert(byRk.forall(_._3 == d), s"$h: one delay per host")
      byRk.zip(byRk.tail).foreach { case (a, b) =>
        assert(b._4 - a._4 == d,
          s"$h: gap ${b._4 - a._4} != crawl-delay $d between " +
            s"rk=${a._2} and rk=${b._2}")
      }
      assert(byRk.forall(r => r._5 == r._4 / WarcQueries.WAVE_SECONDS),
        s"$h: wave must be fetch_at_s DIV WAVE_SECONDS")
    }
    val bySuffix = sched.groupBy(_._1).view.mapValues(_.head._3)
    assert(bySuffix.get("example.org").forall(_ == 1L),
      "the seed host must fall back to the default delay")
    // the fixture's published delays (1 + d%3) must round-trip the
    // parser: spot-check one of each class that survives the gate
    Seq("example-blog.net" -> 2L, "forumhub.dev" -> 2L).foreach {
      case (h, want) => bySuffix.get(h).foreach(got =>
        assert(got == want, s"$h: parsed delay $got != published $want"))
    }
  }

  test("a frontier host ABSENT from the delay table still schedules " +
      "— left join + default delay, consistent with the frontier's " +
      "fail-open allow gate (ADVICE r17)") {
    val fr = Seq(
      ("known.example", "https://known.example/a", 3L, 1L),
      ("known.example", "https://known.example/b", 1L, 2L),
      ("unknown.example", "https://unknown.example/x", 2L, 1L))
      .toDF("host", "url_norm", "n_refs", "rk")
    val delays = Seq(("known.example", 5L)).toDF("host", "delay_s")
    val got = WarcQueries.scheduleFrom(fr, delays)
      .select(col("host"), col("rk"), col("delay_s"), col("fetch_at_s"))
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.length == 3, "no frontier row may be dropped")
    assert(got.toSeq == Seq(
      ("known.example", 1L, 5L, 0L),
      ("known.example", 2L, 5L, 5L),
      ("unknown.example", 1L, WarcQueries.DEFAULT_CRAWL_DELAY, 0L)))
  }
}
