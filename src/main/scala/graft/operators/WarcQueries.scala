package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{ListingCache, WarcIo}

/** WARC crawl-archive ingest (SURVEY §2.1 extension; VERDICT r15 task
  * 1): the container every published LLM pipeline's corpus starts
  * from, parsed pure-JVM from the ISO 28500 spec — the engine analog
  * of the reference's remote-archive opens (avhrr recipe.py:124,
  * insitu recipe.py:158) pointed at crawl data instead of granules.
  *
  * Hash-proof fixture (the multimodal_video_meta idiom,
  * MultimodalQueries.scala): every WARC byte is ARITHMETIC on
  * documents rows — urls, dates, HTTP status, headers, and the HTML
  * body are deterministic functions of (doc_id, text) — so DuckDB
  * recomputes every parsed output column without reading a byte of
  * WARC. A wrong member boundary, a mis-read Content-Length, an
  * off-by-one in the HTTP head/body split, or a dropped record shifts
  * a length/digest and the gate goes hash-red.
  *
  * Scale shape: glob-list the archive files, then ONE narrow
  * mapPartitions parses each file streaming (per-record buffering
  * only, bounded by Content-Length) — no shuffle, no driver reads;
  * parallelism = #files, exactly how a 1000-executor cluster eats a
  * crawl dump of 100k 1 GB WARCs. Payload bytes stay in the scan
  * stage: src_warc projects 32-byte digests, the pipeline strips to
  * text before anything wide. The fixture build (a distributed
  * per-file archive write — see [[warcRoot]]) is harness cost,
  * memoized per corpus fingerprint.
  */
object WarcQueries {

  private[operators] val N_FILES = 32
  private val BASE_EPOCH =
    java.time.Instant.parse("2022-05-01T00:00:00Z").getEpochSecond
  private val INFO_PAYLOAD =
    "software: graft-warc/1.0\r\nformat: WARC File Format 1.0\r\n"
  private val NOT_FOUND_BODY =
    "<html><body><p>not found</p></body></html>"

  private def isoTs(epoch: Long): String =
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(epoch))

  /** The response body for one document — MUST stay byte-identical to
    * TextQueries.htmlWrap / htmlWrapSqlExpr (the oracle replays it). */
  private def responseBody(docId: Long, text: String): String =
    if (docId % 7 == 0) NOT_FOUND_BODY
    else
      "<html><head><script type=\"text/javascript\">var x = 1;</script>" +
        "<style>p { color: red }</style></head><body><h1>Doc " + docId +
        "</h1><!-- boilerplate -->" + TextQueries.linkBlockStr(docId) +
        "<p>" + text +
        " &amp; more &lt;escaped&gt; &quot;text&quot;&nbsp;here</p>" +
        "</body></html>"

  // ── fixture build (harness cost, memoized per corpus) ──

  private val warcRootMemo = new BuildMemo[String]()

  /** Write the corpus as N_FILES `.warc.gz` archives: per file a
    * warcinfo record, then per document (sorted) a request + response
    * pair. Returns the directory.
    *
    * DISTRIBUTED write (round 16): the original driver loop gzipped
    * 1.5M members single-threaded at the 100× fixture (~690 s). Now
    * each archive file is written by the Spark task that owns its
    * residue class — repartition on k, sort (k, doc_id) within the
    * partition, stream records out on k changes, one reused native
    * Deflater per file (WarcIo.MemberWriter — a fresh
    * GZIPOutputStream per member burned ~0.17 ms of zlib init each).
    * 32-way parallel, zero driver collect; measured 703 s → ~9 s
    * build at sf10 (1.5M members). The
    * root is node-local temp — fine under local[*] (harness fixture);
    * a cluster-scale archive writer lands on shared storage with the
    * identical per-task loop. */
  private[operators] def warcRoot(s: SparkSession, dir: String): String = {
    val fp = IndexManifest.corpusFingerprint(dir, "documents")
    warcRootMemo.getOrBuild(s"$dir|$fp", s.sparkContext) {
      MemoBuilds.record("warc_fixture")
      val root = Files.createTempDirectory("graft-warc").toString
      IndexManifest.registerTempRoot(root)
      val n = N_FILES
      graft.Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
          (col("doc_id") % n).as("k"))
        .repartition(n, col("k"))
        .sortWithinPartitions(col("k"), col("doc_id"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          var curK = -1L
          var out: WarcIo.MemberWriter = null
          def closeCur(): Unit = if (out != null) { out.close(); out = null }
          try {
            it.foreach { r =>
              val id = r.getLong(0)
              val text = r.getString(1)
              val k = r.getLong(2)
              if (k != curK) {
                closeCur()
                out = new WarcIo.MemberWriter(
                  new java.io.BufferedOutputStream(
                    new java.io.FileOutputStream(
                      s"$root/part-$k.warc.gz")))
                out.writeRecord(Seq(
                  "WARC-Type" -> "warcinfo",
                  "WARC-Record-ID" -> s"<urn:uuid:file-$k>",
                  "WARC-Date" -> isoTs(BASE_EPOCH),
                  "Content-Type" -> "application/warc-fields"),
                  INFO_PAYLOAD.getBytes("UTF-8"))
                curK = k
              }
              val url = s"https://example.org/page/$id"
              val ts = isoTs(BASE_EPOCH + id)
              val req = s"GET /page/$id HTTP/1.1\r\nHost: example.org\r\n" +
                "User-Agent: graft/1.0\r\n\r\n"
              out.writeRecord(Seq(
                "WARC-Type" -> "request",
                "WARC-Record-ID" -> s"<urn:uuid:req-$id>",
                "WARC-Date" -> ts,
                "WARC-Target-URI" -> url,
                "Content-Type" -> "application/http;msgtype=request"),
                req.getBytes("UTF-8"))
              val body = responseBody(id, text).getBytes("UTF-8")
              val statusLine =
                if (id % 7 == 0) "HTTP/1.1 404 Not Found"
                else "HTTP/1.1 200 OK"
              val head = statusLine + "\r\n" +
                "Content-Type: text/html; charset=utf-8\r\n" +
                s"Content-Length: ${body.length}\r\n\r\n"
              out.writeRecord(Seq(
                "WARC-Type" -> "response",
                "WARC-Record-ID" -> s"<urn:uuid:resp-$id>",
                "WARC-Date" -> ts,
                "WARC-Target-URI" -> url,
                "Content-Type" -> "application/http;msgtype=response"),
                head.getBytes("UTF-8") ++ body)
            }
          } finally closeCur()
        }
      root
    }
  }

  /** The second-crawl body for CHANGED pages — byte-identical in the
    * oracle. */
  private def v2Body(docId: Long, text: String): String =
    "<html><body><h2>Doc " + docId + " v2</h2><p>" + text +
      "</p></body></html>"

  private val revisitRootMemo = new BuildMemo[String]()

  /** The SECOND crawl wave: every document re-fetched one day later.
    * Pages whose content is unchanged (doc_id % 3 == 0) land as
    * `revisit` records under the identical-payload-digest profile —
    * WARC-Refers-To the first crawl's response, WARC-Payload-Digest
    * of the ORIGINAL body, payload = just the HTTP header block (the
    * crawl-side dedup every archive crawler performs: Heritrix
    * writes exactly this instead of re-storing the body). Changed
    * pages land as full responses with the v2 body. Same distributed
    * per-file write as [[warcRoot]]. */
  private[operators] def warcRevisitRoot(
      s: SparkSession, dir: String): String = {
    val fp = IndexManifest.corpusFingerprint(dir, "documents")
    revisitRootMemo.getOrBuild(s"$dir|$fp", s.sparkContext) {
      MemoBuilds.record("warc_revisit_fixture")
      val root = Files.createTempDirectory("graft-warc2").toString
      IndexManifest.registerTempRoot(root)
      val n = N_FILES
      graft.Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
          (col("doc_id") % n).as("k"))
        .repartition(n, col("k"))
        .sortWithinPartitions(col("k"), col("doc_id"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          var curK = -1L
          var out: WarcIo.MemberWriter = null
          def closeCur(): Unit = if (out != null) { out.close(); out = null }
          val sha = java.security.MessageDigest.getInstance("SHA-256")
          try {
            it.foreach { r =>
              val id = r.getLong(0)
              val text = r.getString(1)
              val k = r.getLong(2)
              if (k != curK) {
                closeCur()
                out = new WarcIo.MemberWriter(
                  new java.io.BufferedOutputStream(
                    new java.io.FileOutputStream(
                      s"$root/part-$k.warc.gz")))
                curK = k
              }
              val url = s"https://example.org/page/$id"
              val ts = isoTs(BASE_EPOCH + 86400L + id)
              if (id % 3 == 0) {
                // unchanged content → revisit, body NOT re-stored
                val body1 = responseBody(id, text).getBytes("UTF-8")
                sha.reset()
                val digest = sha.digest(body1)
                  .map(b => f"$b%02x").mkString
                val statusLine = if (id % 7 == 0)
                  "HTTP/1.1 404 Not Found" else "HTTP/1.1 200 OK"
                val head = statusLine + "\r\n" +
                  "Content-Type: text/html; charset=utf-8\r\n" +
                  s"Content-Length: ${body1.length}\r\n\r\n"
                out.writeRecord(Seq(
                  "WARC-Type" -> "revisit",
                  "WARC-Record-ID" -> s"<urn:uuid:rev-$id>",
                  "WARC-Refers-To" -> s"<urn:uuid:resp-$id>",
                  "WARC-Profile" -> ("http://netpreserve.org/warc/1.0/" +
                    "revisit/identical-payload-digest"),
                  "WARC-Payload-Digest" -> s"sha256:$digest",
                  "WARC-Date" -> ts,
                  "WARC-Target-URI" -> url,
                  "Content-Type" -> "application/http;msgtype=response"),
                  head.getBytes("UTF-8"))
              } else {
                val body = v2Body(id, text).getBytes("UTF-8")
                val head = "HTTP/1.1 200 OK\r\n" +
                  "Content-Type: text/html; charset=utf-8\r\n" +
                  s"Content-Length: ${body.length}\r\n\r\n"
                out.writeRecord(Seq(
                  "WARC-Type" -> "response",
                  "WARC-Record-ID" -> s"<urn:uuid:resp2-$id>",
                  "WARC-Date" -> ts,
                  "WARC-Target-URI" -> url,
                  "Content-Type" -> "application/http;msgtype=response"),
                  head.getBytes("UTF-8") ++ body)
              }
            }
          } finally closeCur()
        }
      root
    }
  }

  /** warc_revisit_audit — the crawl-side dedup ledger: parse the
    * second crawl, and for every `revisit` record verify its declared
    * payload digest against the FIRST crawl's actual body digest (a
    * cross-archive integrity join — a stale or wrong refers-to breaks
    * it) and account the bytes the crawler did NOT re-store. Changed
    * pages report their re-stored v2 size. Every output column —
    * record type, refers-to linkage, digest equality, bytes saved or
    * stored — is recomputed by DuckDB from documents arithmetic.
    *
    * Scale shape: two per-file parse scans (digests travel, not
    * bodies) joined on doc_id — the revisit side carries only header
    * strings; one narrow join, no corpus-wide state. */
  def warcRevisitAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val crawl1 = warcRecords(s, s"file:${warcRoot(s, dir)}/*.warc.gz")
      .filter(col("rec_type") === "response")
      .select(
        regexp_extract(col("url"), "page/(\\d+)$", 1).cast("long")
          .as("doc_id"),
        sha2(col("body"), 256).as("sha1"),
        length(col("body")).cast("long").as("n1"))
    val root2 = warcRevisitRoot(s, dir)
    val sessionConf = ListingCache.sessionConfSnapshot(s)
    val listing = ListingCache.globListing(s, s"file:$root2/*.warc.gz")
      .as[String]
    val nFiles = math.max(listing.count().toInt, 1)
    val crawl2 = listing
      .repartition(math.min(nFiles, 4096))
      .mapPartitions { it =>
        val conf = ListingCache.confWith(
          new org.apache.hadoop.conf.Configuration(false), sessionConf)
        it.flatMap { url =>
          val p = new org.apache.hadoop.fs.Path(url)
          val in = p.getFileSystem(conf).open(p)
          WarcIo.parseGzip(in).map { r =>
            (r.targetUri, r.recType,
              r.headers.getOrElse("warc-refers-to", "")
                .stripPrefix("<").stripSuffix(">"),
              r.headers.getOrElse("warc-payload-digest", ""),
              r.body.length.toLong,
              java.security.MessageDigest.getInstance("SHA-256")
                .digest(r.body).map(b => f"$b%02x").mkString)
          }
        }
      }
      .toDF("url", "rec_type", "refers_to", "payload_digest",
        "n_payload", "body_sha2")
      .select(
        regexp_extract(col("url"), "page/(\\d+)$", 1).cast("long")
          .as("doc_id"),
        col("rec_type"), col("refers_to"), col("payload_digest"),
        col("n_payload"), col("body_sha2"))
    crawl2.join(crawl1, Seq("doc_id"))
      .select(col("doc_id"), col("rec_type"),
        (col("rec_type") === "revisit" &&
          col("refers_to") === concat(lit("urn:uuid:resp-"), col("doc_id")) &&
          col("payload_digest") === concat(lit("sha256:"), col("sha1")))
          .as("dedup_ok"),
        when(col("rec_type") === "revisit", col("n1")).otherwise(0L)
          .as("bytes_saved"),
        when(col("rec_type") === "response", col("n_payload"))
          .otherwise(0L).as("bytes_stored"))
  }

  lazy val warcRevisitAuditSql: String =
    s"""WITH $respbCte
       |SELECT doc_id,
       |  CASE WHEN doc_id % 3 = 0 THEN 'revisit' ELSE 'response' END
       |    AS rec_type,
       |  doc_id % 3 = 0 AS dedup_ok,
       |  CAST(CASE WHEN doc_id % 3 = 0
       |    THEN octet_length(encode(body)) ELSE 0 END AS BIGINT)
       |    AS bytes_saved,
       |  CAST(CASE WHEN doc_id % 3 <> 0 THEN
       |    octet_length(encode('<html><body><h2>Doc ' || doc_id
       |      || ' v2</h2><p>' || text || '</p></body></html>'))
       |    ELSE 0 END AS BIGINT) AS bytes_stored
       |FROM respb JOIN documents USING (doc_id)""".stripMargin
      .replace("%WRAP%",
        graft.operators.TextQueries.htmlWrapSqlExpr("doc_id", "text"))

  // ── sitemap seed list ──

  private val N_SITEMAPS = 8
  private val sitemapRootMemo = new BuildMemo[String]()

  /** Sitemap fixture: an index document plus N_SITEMAPS urlset files
    * (doc residue classes), every field arithmetic on doc_id —
    * lastmod omitted on every 5th entry (the parser must yield ''
    * instead of inventing one). Urlsets write distributed (the
    * warcRoot loop shape); the 8-line index writes on the driver,
    * which is also how a crawler consumes it. */
  private[operators] def sitemapRoot(s: SparkSession, dir: String): String = {
    val fp = IndexManifest.corpusFingerprint(dir, "documents")
    sitemapRootMemo.getOrBuild(s"$dir|$fp", s.sparkContext) {
      MemoBuilds.record("sitemap_fixture")
      val root = Files.createTempDirectory("graft-sitemap").toString
      IndexManifest.registerTempRoot(root)
      val n = N_SITEMAPS
      graft.Tables.documents(s, dir)
        .select(col("doc_id"), (col("doc_id") % n).as("k"))
        .repartition(n, col("k"))
        .sortWithinPartitions(col("k"), col("doc_id"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          var curK = -1L
          var out: java.io.Writer = null
          def closeCur(): Unit = if (out != null) {
            out.write("</urlset>\n"); out.close(); out = null
          }
          try {
            it.foreach { r =>
              val id = r.getLong(0)
              val k = r.getLong(1)
              if (k != curK) {
                closeCur()
                out = new java.io.OutputStreamWriter(
                  new java.io.BufferedOutputStream(
                    new java.io.FileOutputStream(
                      s"$root/sitemap-$k.xml")), "UTF-8")
                out.write("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
                  "<urlset xmlns=\"http://www.sitemaps.org/schemas/" +
                  "sitemap/0.9\">\n")
                curK = k
              }
              val lastmod =
                if (id % 5 == 0) ""
                else "<lastmod>" + java.time.LocalDate.parse("2022-05-01")
                  .plusDays(id % 28).toString + "</lastmod>"
              val freq = (id % 3) match {
                case 0 => "daily"; case 1 => "weekly"; case _ => "monthly"
              }
              out.write(
                s"<url><loc>https://example.org/page/$id</loc>$lastmod" +
                  s"<changefreq>$freq</changefreq>" +
                  s"<priority>0.${id % 10}</priority></url>\n")
            }
          } finally closeCur()
        }
      val idx = (0 until n)
        .map(k => s"<sitemap><loc>file:$root/sitemap-$k.xml</loc></sitemap>")
        .mkString(
          "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<sitemapindex>\n",
          "\n", "\n</sitemapindex>\n")
      Files.write(java.nio.file.Paths.get(s"$root/sitemap-index.xml"),
        idx.getBytes("UTF-8"))
      root
    }
  }

  /** src_sitemap — the crawl seed-list source: read the sitemap
    * INDEX (driver, one tiny document — exactly how a crawler
    * bootstraps), fan the listed urlsets out one-per-task, and parse
    * every entry (graft.ingest.SitemapXml). Every output field is
    * doc_id arithmetic, so the oracle recomputes the full seed list
    * — including the empty lastmod on every 5th entry — without
    * touching XML. */
  def srcSitemap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = sitemapRoot(s, dir)
    val idxXml = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/sitemap-index.xml")), "UTF-8")
    val maps = graft.ingest.SitemapXml.parseIndex(idxXml)
    val sessionConf = ListingCache.sessionConfSnapshot(s)
    s.createDataset(maps)
      .repartition(math.max(maps.size, 1))
      .mapPartitions { it =>
        val conf = ListingCache.confWith(
          new org.apache.hadoop.conf.Configuration(false), sessionConf)
        it.flatMap { loc =>
          val p = new org.apache.hadoop.fs.Path(loc)
          val in = p.getFileSystem(conf).open(p)
          val xml = try {
            val bos = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var m = in.read(buf)
            while (m >= 0) { bos.write(buf, 0, m); m = in.read(buf) }
            new String(bos.toByteArray, "UTF-8")
          } finally in.close()
          val k = "sitemap-(\\d+)\\.xml$".r
            .findFirstMatchIn(loc).map(_.group(1).toLong).getOrElse(-1L)
          graft.ingest.SitemapXml.parseUrlset(xml).map(e =>
            (e.loc, e.lastmod, e.changefreq, e.priority, k))
        }
      }
      .toDF("url", "lastmod", "changefreq", "priority", "sitemap_k")
  }

  lazy val srcSitemapSql: String =
    s"""SELECT 'https://example.org/page/' || doc_id AS url,
       |  CASE WHEN doc_id % 5 = 0 THEN ''
       |    ELSE strftime(DATE '2022-05-01'
       |      + to_days(CAST(doc_id % 28 AS INT)), '%Y-%m-%d') END
       |    AS lastmod,
       |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'daily'
       |    WHEN 1 THEN 'weekly' ELSE 'monthly' END AS changefreq,
       |  '0.' || (doc_id % 10) AS priority,
       |  CAST(doc_id % ${N_SITEMAPS} AS BIGINT) AS sitemap_k
       |FROM documents""".stripMargin

  // ── distributed parse ──

  /** Parse every `.warc.gz` under a glob, one file per task, into
    * typed record rows (body kept as binary for downstream stages;
    * `err` non-empty marks quarantine rows). */
  private[graft] def warcRecords(
      s: SparkSession, glob: String): DataFrame = {
    import s.implicits._
    val sessionConf = ListingCache.sessionConfSnapshot(s)
    val listing = ListingCache.globListing(s, glob).as[String]
    // one task per archive, capped: a constant repartition(32) would
    // CAP a 100k-file crawl's parse at 32 tasks (round-16 self-review
    // finding); the listing is driver-small, so counting it is free
    val nFiles = math.max(listing.count().toInt, 1)
    listing
      .repartition(math.min(nFiles, 4096))
      .mapPartitions { it =>
        val conf = ListingCache.confWith(
          new org.apache.hadoop.conf.Configuration(false), sessionConf)
        it.flatMap { url =>
          val p = new org.apache.hadoop.fs.Path(url)
          val in: java.io.InputStream =
            try p.getFileSystem(conf).open(p)
            catch { case e: Exception =>
              new java.io.InputStream { // surfaces as a gzip: open error row
                override def read(): Int = throw new java.io.IOException(
                  s"open failed: ${e.getMessage}")
              }
            }
          WarcIo.parseGzip(in).zipWithIndex.map { case (r, i) =>
            (r.targetUri,
              r.recordId.stripPrefix("<").stripSuffix(">"),
              r.recType, r.date,
              if (r.recType == "response") r.httpMime else r.contentType,
              r.contentLength, r.httpStatus.toLong, r.body, r.err,
              url, i.toLong)
          }
        }
      }
      .toDF("url", "rec_id", "rec_type", "warc_ts", "mime",
        "content_length", "http_status", "body", "err",
        "src_file", "rec_idx")
  }

  /** Default split grain for the offset-driven read: archives above
    * this split into ~this-many-byte member-aligned ranges. */
  private[operators] val WARC_SPLIT_BYTES = 64L << 20

  /** Offset-split WARC read (VERDICT r16 task 5): removes the
    * one-task-per-FILE ceiling — ONE oversized archive no longer
    * serializes onto one task. Files over `splitBytes`: one indexing
    * task walks the gzip member boundaries (WarcIo.memberOffsets —
    * each member is independently inflatable by construction) and
    * cuts member-ALIGNED splits of ~splitBytes; the parse stage then
    * seeks each split and inflates only its range, with rec_idx
    * continued from the split's starting member ordinal so the
    * output is record-for-record IDENTICAL to the whole-file parse
    * (spec-pinned; src_warc_split hash-gates it against the same
    * DuckDB oracle as src_warc). Files at or under the grain — and
    * files whose member walk stops early (corrupt/foreign tail) —
    * fall back to one whole-file split, preserving the quarantine
    * semantics byte for byte.
    *
    * Scale shape: indexing is one inflate-and-discard pass per big
    * file (distributed, one task per file); parsing is one task per
    * SPLIT — a 100 GB archive becomes ~1600 parallel 64 MB splits
    * instead of one 100 GB task. */
  private[graft] def warcRecordsSplit(
      s: SparkSession, glob: String,
      splitBytes: Long = WARC_SPLIT_BYTES): DataFrame = {
    import s.implicits._
    val sessionConf = ListingCache.sessionConfSnapshot(s)
    val listing = ListingCache.globListing(s, glob).as[String]
    val nFiles = math.max(listing.count().toInt, 1)
    // stage 1: member-aligned split plans, one indexing task per file
    val splits = listing
      .repartition(math.min(nFiles, 4096))
      .mapPartitions { it =>
        val conf = ListingCache.confWith(
          new org.apache.hadoop.conf.Configuration(false), sessionConf)
        it.flatMap { url =>
          val p = new org.apache.hadoop.fs.Path(url)
          try {
            val fs = p.getFileSystem(conf)
            val len = fs.getFileStatus(p).getLen
            if (len <= splitBytes) Seq((url, 0L, Long.MaxValue, 0L))
            else {
              val offs = WarcIo.memberOffsets(fs.open(p)).toArray
              if (offs.length <= 1) Seq((url, 0L, Long.MaxValue, 0L))
              else {
                val cuts = Seq.newBuilder[(String, Long, Long, Long)]
                var start = 0L
                var startIdx = 0L
                var i = 1
                while (i < offs.length) {
                  if (offs(i) - start >= splitBytes) {
                    cuts += ((url, start, offs(i), startIdx))
                    start = offs(i); startIdx = i.toLong
                  }
                  i += 1
                }
                cuts += ((url, start, Long.MaxValue, startIdx))
                cuts.result()
              }
            }
          } catch { case _: Exception =>
            // unopenable/unindexable: one whole-file split — the
            // parse stage surfaces the open failure as its error row
            Seq((url, 0L, Long.MaxValue, 0L))
          }
        }
      }
      .toDF("src", "start", "end", "start_idx")
      .persist()
    val nSplits = math.max(splits.count().toInt, 1)
    // stage 2: parse each split independently. Task count is capped
    // at 2× the lane count, NOT one task per split: a task parses its
    // splits sequentially, so extra tasks past the lanes only buy
    // scheduling overhead (the 4 KB-grain gate fixture planned 896
    // splits → 896 ~1.5 ms tasks, 1.3 s of pure task latency at
    // sf0.1). Splits are size-aligned by construction, so round-robin
    // packing stays balanced; the straggler-removal property (no
    // single oversized archive serializing a lane) only needs
    // splits ≥ lanes, which the cap preserves.
    splits
      .repartition(math.min(nSplits,
        math.max(2 * s.sparkContext.defaultParallelism, 64)))
      .as[(String, Long, Long, Long)]
      .mapPartitions { it =>
        val conf = ListingCache.confWith(
          new org.apache.hadoop.conf.Configuration(false), sessionConf)
        it.flatMap { case (url, start, end, startIdx) =>
          val p = new org.apache.hadoop.fs.Path(url)
          val in: java.io.InputStream =
            try {
              val raw = p.getFileSystem(conf).open(p)
              if (start > 0) raw.seek(start)
              val remaining =
                if (end == Long.MaxValue) Long.MaxValue else end - start
              new BoundedIn(raw, remaining)
            } catch { case e: Exception =>
              new java.io.InputStream {
                override def read(): Int = throw new java.io.IOException(
                  s"open failed: ${e.getMessage}")
              }
            }
          WarcIo.parseGzip(in).zipWithIndex.map { case (r, i) =>
            (r.targetUri,
              r.recordId.stripPrefix("<").stripSuffix(">"),
              r.recType, r.date,
              if (r.recType == "response") r.httpMime else r.contentType,
              r.contentLength, r.httpStatus.toLong, r.body, r.err,
              url, startIdx + i.toLong)
          }
        }
      }
      .toDF("url", "rec_id", "rec_type", "warc_ts", "mime",
        "content_length", "http_status", "body", "err",
        "src_file", "rec_idx")
  }

  /** EOF-at-range-end wrapper: the split's member range, exactly. */
  private final class BoundedIn(
      in: java.io.InputStream, private var remaining: Long)
      extends java.io.InputStream {
    override def read(): Int =
      if (remaining <= 0L) -1
      else { val b = in.read(); if (b >= 0) remaining -= 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (remaining <= 0L) return -1
      val n = in.read(b, off, math.min(len.toLong, remaining).toInt)
      if (n > 0) remaining -= n
      n
    }
    override def close(): Unit = in.close()
  }

  /** src_warc_split — src_warc's exact projection through the
    * OFFSET-SPLIT read path, with the grain forced down to 4 KB so
    * the sf0.01 gate genuinely parses every archive as many
    * member-aligned splits; the oracle is src_warc's — parity with
    * the whole-file parse is hash-gated, not just spec-asserted. */
  def srcWarcSplit(s: SparkSession, dir: String): DataFrame = {
    val root = warcRoot(s, dir)
    warcRecordsSplit(s, s"file:$root/*.warc.gz", splitBytes = 4096L)
      .select(col("url"), col("rec_id"), col("rec_type"), col("warc_ts"),
        col("mime"), col("content_length"), col("http_status"),
        length(col("body")).cast("long").as("n_body"),
        sha2(col("body"), 256).as("body_sha"), col("err"),
        regexp_extract(col("src_file"), "part-(\\d+)\\.warc\\.gz$", 1)
          .cast("long").as("file_k"),
        col("rec_idx"))
  }

  /** src_warc — the full parsed-record table: every record type, the
    * WARC framing lengths, the HTTP status split, a body digest, and
    * the in-file record index (rec_idx pins the PARSE ORDER — a
    * swallowed or duplicated member shifts every index after it).
    * 32-byte digests travel past the scan, never payloads. */
  def srcWarc(s: SparkSession, dir: String): DataFrame = {
    val root = warcRoot(s, dir)
    warcRecords(s, s"file:$root/*.warc.gz")
      .select(col("url"), col("rec_id"), col("rec_type"), col("warc_ts"),
        col("mime"), col("content_length"), col("http_status"),
        length(col("body")).cast("long").as("n_body"),
        sha2(col("body"), 256).as("body_sha"), col("err"),
        regexp_extract(col("src_file"), "part-(\\d+)\\.warc\\.gz$", 1)
          .cast("long").as("file_k"),
        col("rec_idx"))
  }

  /** Every output column recomputed from documents alone: the three
    * record classes are unioned with their payloads rebuilt as string
    * concat (the info block, the HTTP request head, the status line +
    * HTTP head + HTML body), lengths via octet_length over UTF-8, and
    * digests via DuckDB's own sha256. */
  /** Shared oracle CTEs: the per-file rank (drank — rec_idx
    * arithmetic: warcinfo 0, request 2r+1, response 2r+2) and the
    * response body/status rebuild (respb, %WRAP% substituted by the
    * caller AFTER stripMargin). One definition, two oracles
    * (src_warc, warc_cdx) — the fixture arithmetic is spelled once. */
  private lazy val drankCte: String =
    s"""drank AS (
       |  SELECT doc_id, doc_id % ${N_FILES} AS k,
       |    CAST(row_number() OVER (PARTITION BY doc_id % ${N_FILES}
       |      ORDER BY doc_id) - 1 AS BIGINT) AS rnk
       |  FROM documents)""".stripMargin

  private lazy val respbCte: String =
    """respb AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0
      |      THEN '<html><body><p>not found</p></body></html>'
      |      ELSE %WRAP%
      |    END AS body,
      |    CASE WHEN doc_id % 7 = 0 THEN 'HTTP/1.1 404 Not Found'
      |      ELSE 'HTTP/1.1 200 OK' END AS sl,
      |    CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS st
      |  FROM documents)""".stripMargin

  lazy val srcWarcSql: String = {
    val crlf = "chr(13) || chr(10)"
    s"""WITH info AS (
       |  SELECT 'software: graft-warc/1.0' || $crlf ||
       |    'format: WARC File Format 1.0' || $crlf AS p),
       |$drankCte,
       |finfo AS (
       |  SELECT '' AS url, 'urn:uuid:file-' || k AS rec_id,
       |    'warcinfo' AS rec_type, '2022-05-01T00:00:00Z' AS warc_ts,
       |    'application/warc-fields' AS mime,
       |    CAST(octet_length(encode(p)) AS BIGINT) AS content_length,
       |    CAST(-1 AS BIGINT) AS http_status,
       |    CAST(octet_length(encode(p)) AS BIGINT) AS n_body,
       |    sha256(p) AS body_sha, '' AS err,
       |    CAST(k AS BIGINT) AS file_k, CAST(0 AS BIGINT) AS rec_idx
       |  FROM (SELECT DISTINCT doc_id % ${N_FILES} AS k FROM documents),
       |    info),
       |req AS (
       |  SELECT 'https://example.org/page/' || d.doc_id AS url,
       |    'urn:uuid:req-' || d.doc_id AS rec_id, 'request' AS rec_type,
       |    strftime(TIMESTAMP '2022-05-01 00:00:00' + to_seconds(d.doc_id),
       |      '%Y-%m-%dT%H:%M:%SZ') AS warc_ts,
       |    'application/http;msgtype=request' AS mime,
       |    CAST(octet_length(encode(p)) AS BIGINT) AS content_length,
       |    CAST(-1 AS BIGINT) AS http_status,
       |    CAST(octet_length(encode(p)) AS BIGINT) AS n_body,
       |    sha256(p) AS body_sha, '' AS err,
       |    CAST(r.k AS BIGINT) AS file_k,
       |    CAST(2 * r.rnk + 1 AS BIGINT) AS rec_idx
       |  FROM (SELECT doc_id,
       |      'GET /page/' || doc_id || ' HTTP/1.1' || $crlf ||
       |      'Host: example.org' || $crlf ||
       |      'User-Agent: graft/1.0' || $crlf || $crlf AS p
       |    FROM documents) d
       |  JOIN drank r ON r.doc_id = d.doc_id),
       |$respbCte,
       |resp AS (
       |  SELECT 'https://example.org/page/' || b.doc_id AS url,
       |    'urn:uuid:resp-' || b.doc_id AS rec_id, 'response' AS rec_type,
       |    strftime(TIMESTAMP '2022-05-01 00:00:00' + to_seconds(b.doc_id),
       |      '%Y-%m-%dT%H:%M:%SZ') AS warc_ts,
       |    'text/html; charset=utf-8' AS mime,
       |    CAST(octet_length(encode(sl || $crlf ||
       |      'Content-Type: text/html; charset=utf-8' || $crlf ||
       |      'Content-Length: ' || octet_length(encode(body)) ||
       |      $crlf || $crlf)) + octet_length(encode(body)) AS BIGINT)
       |      AS content_length,
       |    CAST(st AS BIGINT) AS http_status,
       |    CAST(octet_length(encode(body)) AS BIGINT) AS n_body,
       |    sha256(body) AS body_sha, '' AS err,
       |    CAST(r.k AS BIGINT) AS file_k,
       |    CAST(2 * r.rnk + 2 AS BIGINT) AS rec_idx
       |  FROM respb b JOIN drank r ON r.doc_id = b.doc_id)
       |SELECT * FROM finfo
       |UNION ALL SELECT * FROM req
       |UNION ALL SELECT * FROM resp""".stripMargin
      // AFTER stripMargin: the wrap expression's '||' continuation
      // lines would lose a pipe to the margin strip
      .replace("%WRAP%",
        graft.operators.TextQueries.htmlWrapSqlExpr("doc_id", "text"))
  }

  /** pipeline_warc_to_corpus — the crawl-to-corpus chain in ONE pass:
    * parse WARC responses, keep HTTP 200 HTML, strip boilerplate with
    * the text_html_strip kernel, language-guess with the text_langid
    * kernel, score with the Gopher card — per page: language, word
    * count, keep verdict. The oracle rebuilds each 200's body from
    * documents and replays strip + langid + gopher in DuckDB, so the
    * WHOLE chain (WARC framing → HTTP split → strip regexes → langid
    * arithmetic → rule card) is hash-gated end to end.
    *
    * Scale shape: parse and every kernel are row-local (one narrow
    * stage, no shuffle, no second scan — lang_guess rides through the
    * card via the carry hook). At 100 TB you would persist the
    * stripped corpus between stages; the chain itself adds nothing
    * wide. */
  def pipelineWarcToCorpus(s: SparkSession, dir: String): DataFrame = {
    val root = warcRoot(s, dir)
    val corpus = warcRecords(s, s"file:$root/*.warc.gz")
      .filter(col("rec_type") === "response" && col("http_status") === 200)
      .select(
        regexp_extract(col("url"), "page/(\\d+)$", 1).cast("long")
          .as("doc_id"),
        TextQueries.htmlStripCol(decode(col("body"), "UTF-8")).as("text"))
      .withColumn("lang_guess",
        graft.functions.TextFunctions.langId(col("text")))
    TextQueries.gopherRulesFrom(corpus, carry = Seq("lang_guess"))
      .select(col("doc_id"), col("lang_guess"), col("n_words"), col("keep"))
  }

  lazy val pipelineWarcToCorpusSql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, lang,
       |    ${graft.operators.TextQueries.htmlStripSqlExpr("(%WRAP%)")}
       |      AS text
       |  FROM documents WHERE doc_id % 7 <> 0),
       |card AS (
       |  SELECT doc_id, n_words, keep
       |  FROM (${graft.operators.TextQueries.gopherRulesSqlFrom("corpus")})),
       |lg AS (
       |  SELECT doc_id, lang_guess
       |  FROM (${graft.operators.TextQueries.langGuessSqlFrom("corpus")}))
       |SELECT card.doc_id, lg.lang_guess, card.n_words, card.keep
       |FROM card JOIN lg USING (doc_id)""".stripMargin
      // AFTER stripMargin (the '||' continuation-line margin hazard)
      .replace("%WRAP%",
        graft.operators.TextQueries.htmlWrapSqlExpr("doc_id", "text"))

  /** pipeline_warc_extract — the FULL published-pipeline chain over
    * real parsed bytes: WARC parse → HTTP 200 gate → block-level
    * main-content extraction (text_extract_main's classifier, not
    * the flat strip) → language guess → Gopher card, all in one
    * composition. Documents whose extraction keeps no block (the
    * boilerplate-only pages) drop out BEFORE the quality gates —
    * exactly the yield lever extract_main exists for.
    *
    * The WARC body blocks into two non-empty pieces under the
    * extract splitter: the `Doc <id>` heading (always `short`) and
    * the main paragraph — so the oracle replays the classifier on
    * the reconstructed paragraph text alone (anchor-free reduction),
    * then runs the langid + gopher kernels over the survivors.
    * Scale shape: the src_warc scan + two row-local kernel stages +
    * one tiny re-aggregate per doc for the block join — no new wide
    * operator anywhere in the chain. */
  def pipelineWarcExtract(s: SparkSession, dir: String): DataFrame = {
    val root = warcRoot(s, dir)
    val pages = warcRecords(s, s"file:$root/*.warc.gz")
      .filter(col("rec_type") === "response" && col("http_status") === 200)
      .select(
        regexp_extract(col("url"), "page/(\\d+)$", 1).cast("long")
          .as("doc_id"),
        decode(col("body"), "UTF-8").as("page"))
    val corpus = TextExtractQueries
      .classifyBlocks(pages, TextExtractQueries.FIXTURE_SW_LOW,
        TextExtractQueries.FIXTURE_SW_HIGH)
      .filter(col("keep"))
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("idx"), col("text")))),
          x => x.getField("text")), " ").as("text"))
      .withColumn("lang_guess",
        graft.functions.TextFunctions.langId(col("text")))
    TextQueries.gopherRulesFrom(corpus, carry = Seq("lang_guess"))
      .select(col("doc_id"), col("lang_guess"), col("n_words"),
        col("keep"))
  }

  lazy val pipelineWarcExtractSql: String =
    s"""WITH b2 AS (
       |  SELECT doc_id, lang,
       |    ${TextExtractQueries.htmlStripOfParagraphTail} AS bt
       |  FROM documents WHERE doc_id % 7 <> 0),
       |corpus AS (
       |  SELECT doc_id, lang, bt AS text
       |  FROM b2
       |  WHERE ${TextExtractQueries.classifySqlExpr("bt",
                  TextExtractQueries.FIXTURE_SW_LOW,
                  TextExtractQueries.FIXTURE_SW_HIGH)}
       |    IN ('good', 'neargood')),
       |card AS (
       |  SELECT doc_id, n_words, keep
       |  FROM (${graft.operators.TextQueries.gopherRulesSqlFrom("corpus")})),
       |lg AS (
       |  SELECT doc_id, lang_guess
       |  FROM (${graft.operators.TextQueries.langGuessSqlFrom("corpus")}))
       |SELECT card.doc_id, lg.lang_guess, card.n_words, card.keep
       |FROM card JOIN lg USING (doc_id)""".stripMargin

  /** warc_cdx — the CDX capture index every crawl archive ships
    * beside its WARCs (the standard lookup artifact: OpenWayback /
    * pywb format, reduced to its key columns): one row per response
    * with the SURT key (host labels reversed, then the path — the
    * sort order that clusters a domain's captures), the capture
    * timestamp, a digest prefix, and the (file, record) coordinate a
    * reader seeks to. The SURT/key derivation is GENERIC string work
    * on the parsed Target-URI (not fixture arithmetic); the oracle
    * replays it from the known URL shape plus the drank coordinate
    * arithmetic — so record order inside every archive file is
    * hash-pinned.
    *
    * Scale shape: a projection of the src_warc scan filtered to
    * responses — row-local regex + digest prefix, no shuffle; at
    * crawl scale the CDX lands sorted by (surt, ts) via
    * sort_range_partition's reproducible boundaries. */
  def warcCdx(s: SparkSession, dir: String): DataFrame = {
    val root = warcRoot(s, dir)
    val host = regexp_extract(col("url"), "://([^/]*)", 1)
    val path = regexp_extract(col("url"), "://[^/]*(/.*)$", 1)
    warcRecords(s, s"file:$root/*.warc.gz")
      .filter(col("rec_type") === "response")
      .select(
        concat(array_join(reverse(split(host, "\\.")), ","),
          lit(")"), path).as("surt"),
        col("warc_ts"),
        substring(sha2(col("body"), 256), 1, 16).as("digest16"),
        regexp_extract(col("src_file"), "part-(\\d+)\\.warc\\.gz$", 1)
          .cast("long").as("file_k"),
        col("rec_idx"), col("http_status"))
  }

  lazy val warcCdxSql: String =
    s"""WITH $drankCte,
       |$respbCte
       |SELECT
       |  list_aggregate(list_reverse(string_split('example.org', '.')),
       |    'string_agg', ',') || ')/page/' || b.doc_id AS surt,
       |  strftime(TIMESTAMP '2022-05-01 00:00:00' + to_seconds(b.doc_id),
       |    '%Y-%m-%dT%H:%M:%SZ') AS warc_ts,
       |  substr(sha256(body), 1, 16) AS digest16,
       |  CAST(r.k AS BIGINT) AS file_k,
       |  CAST(2 * r.rnk + 2 AS BIGINT) AS rec_idx,
       |  CAST(st AS BIGINT) AS http_status
       |FROM respb b JOIN drank r ON r.doc_id = b.doc_id""".stripMargin
      .replace("%WRAP%",
        graft.operators.TextQueries.htmlWrapSqlExpr("doc_id", "text"))

  /** snk_wet — the WET (extracted-text) companion archive Common
    * Crawl ships beside every WARC: per source archive, one
    * `conversion` record per HTTP-200 page whose payload is the
    * STRIPPED text (the text_html_strip kernel — exactly what a
    * training pipeline downloads instead of raw WARC). Written
    * DISTRIBUTED with the same MemberWriter framing, then READ BACK
    * through WarcIo and audited per file: record count, total text
    * bytes, and a digest-prefix sum over payloads — so the whole
    * write→read round trip is hash-gated against DuckDB recomputing
    * the stripped text from documents.
    *
    * Scale shape: one parsed-WARC scan → row-local strip →
    * per-file-task member writes (the warcRoot discipline) → one
    * header-cheap read-back scan; the audit aggregates to |files|
    * rows. */
  private val wetRootMemo = new BuildMemo[String]()

  def snkWet(s: SparkSession, dir: String): DataFrame = {
    val root = warcRoot(s, dir)
    // memoized per corpus fingerprint like warcRoot (r16 advisory:
    // re-writing all 32 WET archives per bench iteration repaid the
    // full distributed write each time; the MEASURED cost of the qid
    // is the read-back audit — the write is fixture-build cost)
    val fp = IndexManifest.corpusFingerprint(dir, "documents")
    val wetRoot = wetRootMemo.getOrBuild(s"$dir|$fp", s.sparkContext) {
      MemoBuilds.record("wet_fixture")
      buildWetRoot(s, root)
    }
    // audit WHAT LANDED: read the WET archives back through the parser
    warcRecords(s, s"file:$wetRoot/*.warc.gz")
      .filter(col("rec_type") === "conversion")
      .select(
        regexp_extract(col("src_file"), "part-(\\d+)\\.warc\\.gz$", 1)
          .cast("long").as("file_k"),
        length(col("body")).cast("long").as("nb"),
        conv(substring(sha2(col("body"), 256), 1, 10), 16, 10)
          .cast("long").as("dg"))
      .groupBy(col("file_k"))
      .agg(count(lit(1)).as("n_records"),
        sum(col("nb")).as("total_bytes"),
        sum(col("dg")).as("digest_sum"))
  }

  /** The distributed WET write (see [[snkWet]]). Returns the root. */
  private def buildWetRoot(s: SparkSession, root: String): String = {
    val wetRoot = Files.createTempDirectory("graft-wet").toString
    IndexManifest.registerTempRoot(wetRoot)
    // extract: HTTP 200 responses → stripped text, keyed to file_k
    warcRecords(s, s"file:$root/*.warc.gz")
      .filter(col("rec_type") === "response" && col("http_status") === 200)
      .select(col("url"),
        regexp_extract(col("src_file"), "part-(\\d+)\\.warc\\.gz$", 1)
          .cast("long").as("k"),
        col("warc_ts"),
        TextQueries.htmlStripCol(decode(col("body"), "UTF-8")).as("text"),
        regexp_extract(col("url"), "page/(\\d+)$", 1).cast("long")
          .as("doc_id"))
      .repartition(N_FILES, col("k"))
      .sortWithinPartitions(col("k"), col("doc_id"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        var curK = -1L
        var out: WarcIo.MemberWriter = null
        def closeCur(): Unit = if (out != null) { out.close(); out = null }
        try {
          it.foreach { r =>
            val (url, k, ts, text) = (r.getString(0), r.getLong(1),
              r.getString(2), r.getString(3))
            if (k != curK) {
              closeCur()
              out = new WarcIo.MemberWriter(
                new java.io.BufferedOutputStream(
                  new java.io.FileOutputStream(
                    s"$wetRoot/part-$k.warc.gz")))
              curK = k
            }
            out.writeRecord(Seq(
              "WARC-Type" -> "conversion",
              "WARC-Record-ID" -> s"<urn:uuid:wet-${r.getLong(4)}>",
              "WARC-Date" -> ts,
              "WARC-Target-URI" -> url,
              "Content-Type" -> "text/plain"),
              text.getBytes("UTF-8"))
          }
        } finally closeCur()
      }
    wetRoot
  }

  lazy val snkWetSql: String =
    s"""WITH wet AS (
       |  SELECT doc_id, doc_id % ${N_FILES} AS k,
       |    ${TextQueries.htmlStripSqlExpr("(%WRAP%)")} AS text
       |  FROM documents WHERE doc_id % 7 <> 0)
       |SELECT CAST(k AS BIGINT) AS file_k,
       |  CAST(count(*) AS BIGINT) AS n_records,
       |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       |  CAST(sum(CAST('0x' || substr(sha256(text), 1, 10) AS BIGINT))
       |    AS BIGINT) AS digest_sum
       |FROM wet GROUP BY k""".stripMargin
      .replace("%WRAP%",
        graft.operators.TextQueries.htmlWrapSqlExpr("doc_id", "text"))

  /** snk_wat — the WAT (web-archive-transformation) METADATA
    * companion Common Crawl ships as the third member of the
    * WARC/WAT/WET triple: per HTTP-200 response, one `metadata`
    * record whose payload is a JSON envelope of what a pipeline
    * mines WITHOUT the body — target URI, capture time, payload
    * digest, status, and the page's out-links (the warc_links
    * extraction, preserved at URL level). The JSON is assembled by
    * CONCATENATION in body order, never a map-backed serializer, so
    * its bytes are deterministic and the oracle rebuilds the exact
    * string from documents arithmetic — the per-file digest sum pins
    * byte-for-byte JSON equality through the write→read round trip,
    * and the links count is re-parsed FROM the read-back JSON (an
    * extraction bug cannot hide behind a byte-identical envelope).
    *
    * Scale shape: the [[snkWet]] discipline — one parsed-WARC scan,
    * row-local JSON assembly, per-file-task member writes (memoized
    * per corpus fingerprint; the measured cost is the read-back
    * audit), one header-cheap read-back aggregating to |files| rows. */
  private val watRootMemo = new BuildMemo[String]()

  /** The memoized WAT root for a corpus (builds on first use). */
  private[operators] def watRootFor(s: SparkSession, dir: String): String = {
    val root = warcRoot(s, dir)
    val fp = IndexManifest.corpusFingerprint(dir, "documents")
    watRootMemo.getOrBuild(s"$dir|$fp", s.sparkContext) {
      MemoBuilds.record("wat_fixture")
      buildWatRoot(s, root)
    }
  }

  def snkWat(s: SparkSession, dir: String): DataFrame = {
    val watRoot = watRootFor(s, dir)
    val payload = decode(col("body"), "UTF-8")
    warcRecords(s, s"file:$watRoot/*.warc.gz")
      .filter(col("rec_type") === "metadata")
      .select(
        regexp_extract(col("src_file"), "part-(\\d+)\\.warc\\.gz$", 1)
          .cast("long").as("file_k"),
        length(col("body")).cast("long").as("nb"),
        conv(substring(sha2(col("body"), 256), 1, 10), 16, 10)
          .cast("long").as("dg"),
        // the url field is also an https string: links = matches − 1
        (size(regexp_extract_all(payload,
          lit("\"(https://[^\"]+)\""), lit(1))) - 1)
          .cast("long").as("nl"))
      .groupBy(col("file_k"))
      .agg(count(lit(1)).as("n_records"),
        sum(col("nb")).as("total_bytes"),
        sum(col("dg")).as("digest_sum"),
        sum(col("nl")).as("n_links"))
  }

  /** JSON string-array serialization of an href list. A link-less
    * page must emit `[]`, not `[""]` — the quoted-list template
    * around a bare array_join turned an empty list into a
    * one-element empty string (ADVICE r17). */
  private[operators] def watLinksJson(hrefs: Column): Column =
    when(size(hrefs) === 0, lit("[]"))
      .otherwise(concat(lit("[\""), array_join(hrefs, "\",\""),
        lit("\"]")))

  /** The distributed WAT write (see [[snkWat]]). Returns the root. */
  private def buildWatRoot(s: SparkSession, root: String): String = {
    val watRoot = Files.createTempDirectory("graft-wat").toString
    IndexManifest.registerTempRoot(watRoot)
    val page = decode(col("body"), "UTF-8")
    warcRecords(s, s"file:$root/*.warc.gz")
      .filter(col("rec_type") === "response" && col("http_status") === 200)
      .select(col("url"),
        regexp_extract(col("src_file"), "part-(\\d+)\\.warc\\.gz$", 1)
          .cast("long").as("k"),
        col("warc_ts"),
        regexp_extract(col("url"), "page/(\\d+)$", 1).cast("long")
          .as("doc_id"),
        concat(
          lit("{\"url\":\""), col("url"),
          lit("\",\"ts\":\""), col("warc_ts"),
          lit("\",\"digest\":\"sha256:"),
          substring(sha2(col("body"), 256), 1, 16),
          lit("\",\"status\":200,\"links\":"),
          watLinksJson(regexp_extract_all(page,
            lit("<a href=\"(https://[^\"]+)\""), lit(1))),
          lit("}")).as("meta"))
      .repartition(N_FILES, col("k"))
      .sortWithinPartitions(col("k"), col("doc_id"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        var curK = -1L
        var out: WarcIo.MemberWriter = null
        def closeCur(): Unit = if (out != null) { out.close(); out = null }
        try {
          it.foreach { r =>
            val (url, k, ts, id, meta) = (r.getString(0), r.getLong(1),
              r.getString(2), r.getLong(3), r.getString(4))
            if (k != curK) {
              closeCur()
              out = new WarcIo.MemberWriter(
                new java.io.BufferedOutputStream(
                  new java.io.FileOutputStream(
                    s"$watRoot/part-$k.warc.gz")))
              curK = k
            }
            out.writeRecord(Seq(
              "WARC-Type" -> "metadata",
              "WARC-Record-ID" -> s"<urn:uuid:wat-$id>",
              "WARC-Refers-To" -> s"<urn:uuid:resp-$id>",
              "WARC-Date" -> ts,
              "WARC-Target-URI" -> url,
              "Content-Type" -> "application/json"),
              meta.getBytes("UTF-8"))
          }
        } finally closeCur()
      }
    watRoot
  }

  lazy val snkWatSql: String =
    s"""WITH wat AS (
       |  SELECT doc_id, doc_id % ${N_FILES} AS k,
       |    '{"url":"https://example.org/page/' || doc_id ||
       |    '","ts":"' ||
       |    strftime(TIMESTAMP '2022-05-01 00:00:00' + to_seconds(doc_id),
       |      '%Y-%m-%dT%H:%M:%SZ') ||
       |    '","digest":"sha256:' || substr(sha256(%WRAP%), 1, 16) ||
       |    '","status":200,"links":["https://' || %L1DOM% ||
       |    '/page/' || (doc_id + 1) || '","https://' || %L2DOM% ||
       |    '/page/' || (doc_id + 2) || '","https://' || %L3DOM% ||
       |    '/page/' || (doc_id + 3) || '"]}' AS p
       |  FROM documents WHERE doc_id % 7 <> 0)
       |SELECT CAST(k AS BIGINT) AS file_k,
       |  CAST(count(*) AS BIGINT) AS n_records,
       |  CAST(sum(octet_length(encode(p))) AS BIGINT) AS total_bytes,
       |  CAST(sum(CAST('0x' || substr(sha256(p), 1, 10) AS BIGINT))
       |    AS BIGINT) AS digest_sum,
       |  CAST(3 * count(*) AS BIGINT) AS n_links
       |FROM wat GROUP BY k""".stripMargin
      .replace("%WRAP%",
        "(" + TextQueries.htmlWrapSqlExpr("doc_id", "text") + ")")
      .replace("%L1DOM%", linkDomSql(
        """CASE WHEN ((doc_id) % 10) BETWEEN 5 AND 7
          | THEN 5 + ((((doc_id) % 10) - 4) % 3)
          | ELSE (((doc_id) % 10) + 1) % 10 END""".stripMargin
          .replace("\n", " ")))
      .replace("%L2DOM%", linkDomSql(
        """CASE WHEN ((doc_id) % 10) BETWEEN 5 AND 7
          | THEN 5 + ((((doc_id) % 10) - 3) % 3) ELSE 0 END""".stripMargin
          .replace("\n", " ")))
      .replace("%L3DOM%", linkDomSql(
        """CASE WHEN ((doc_id) % 10) BETWEEN 5 AND 7
          | THEN 0 ELSE (9 * ((doc_id) % 10) + 1) % 10 END""".stripMargin
          .replace("\n", " ")))

  /** `doms[i + 1]` over the literal domain list (DuckDB 1-indexed). */
  private def linkDomSql(i: String): String =
    "([" + PipelineQueries.URL_DOMAINS.map(d => s"'$d'").mkString(",") +
      s"])[($i) + 1]"

  /** pipeline_crawl_funnel — the corpus-funnel card a crawl run
    * reports: per domain, how many URLs survive EACH gate in
    * published-pipeline order — robots.txt (curation_robots_filter's
    * parser), the domain blocklist (curation_url_filter), the HTTP
    * fetch (src_warc's 200 gate), main-content extraction
    * (text_extract_main's classifier), and the Gopher quality card —
    * plus the surviving token budget. Every stage is the
    * already-verified operator; this composes them CUMULATIVELY (a
    * page dropped by robots never reaches the fetch column), and the
    * oracle rebuilds the whole funnel from documents arithmetic plus
    * the shared strip/classify/gopher SQL kernels.
    *
    * Scale shape: one parsed-WARC scan; robots and blocklist are
    * broadcast; extraction and the card are row-local; ONE hash agg
    * to |domains| rows. The only join is doc_id-keyed block
    * reassembly, exactly pipeline_warc_extract's. */
  def pipelineCrawlFunnel(s: SparkSession, dir: String): DataFrame = {
    val root = warcRoot(s, dir)
    // robots rules parse once (per-domain artifacts), broadcast
    val parsedRobots = (0 until 10).map(d => d ->
      graft.ingest.RobotsTxt.rulesFor(
        PipelineQueries.robotsTextFor(d), "graft")).toMap
    val bRobots = s.sparkContext.broadcast(parsedRobots)
    val robotsOk = udf { (d: Int, path: String) =>
      bRobots.value(d).allows(path)
    }
    val blockedIdx = PipelineQueries.URL_BLOCKED_IDX.map(_.toLong)
    val resp = warcRecords(s, s"file:$root/*.warc.gz")
      .filter(col("rec_type") === "response")
      .select(
        regexp_extract(col("url"), "page/(\\d+)$", 1).cast("long")
          .as("doc_id"),
        col("http_status"),
        decode(col("body"), "UTF-8").as("page"))
      .withColumn("d", (col("doc_id") % 10).cast("int"))
      .withColumn("robots_ok",
        robotsOk(col("d"), concat(lit("/p/"), col("doc_id"))))
      .withColumn("url_ok", !(col("doc_id") % 10).isin(blockedIdx: _*))
      .withColumn("fetched", col("http_status") === 200)
    // extraction + quality over the fetched pages (the 404 body
    // strips to a short block and can never be kept — the cumulative
    // flags below make the order explicit anyway)
    val extracted = TextExtractQueries
      .classifyBlocks(resp.select(col("doc_id"), col("page")),
        TextExtractQueries.FIXTURE_SW_LOW,
        TextExtractQueries.FIXTURE_SW_HIGH)
      .filter(col("keep"))
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("idx"), col("text")))),
          x => x.getField("text")), " ").as("text"))
    val card = TextQueries.gopherRulesFrom(extracted)
      .select(col("doc_id"), col("n_words"),
        col("keep").as("quality_ok"))
    resp
      .join(card, Seq("doc_id"), "left")
      .select(col("d"), col("robots_ok"), col("url_ok"), col("fetched"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        col("n_words").isNotNull.as("ext_ok"),
        coalesce(col("quality_ok"), lit(false)).as("quality_ok"))
      .withColumn("c1", col("robots_ok"))
      .withColumn("c2", col("c1") && col("url_ok"))
      .withColumn("c3", col("c2") && col("fetched"))
      .withColumn("c4", col("c3") && col("ext_ok"))
      .withColumn("c5", col("c4") && col("quality_ok"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_urls"),
        sum(col("c1").cast("long")).as("n_crawlable"),
        sum(col("c2").cast("long")).as("n_allowed"),
        sum(col("c3").cast("long")).as("n_fetched_ok"),
        sum(col("c4").cast("long")).as("n_extracted"),
        sum(col("c5").cast("long")).as("n_kept"),
        sum(when(col("c5"), col("n_words")).otherwise(lit(0L)))
          .as("kept_tokens"))
      .select(
        element_at(typedLit(PipelineQueries.URL_DOMAINS),
          col("d") + 1).as("domain"),
        col("n_urls"), col("n_crawlable"), col("n_allowed"),
        col("n_fetched_ok"), col("n_extracted"), col("n_kept"),
        col("kept_tokens"))
  }

  lazy val pipelineCrawlFunnelSql: String = {
    val doms = PipelineQueries.URL_DOMAINS.map(d => s"'$d'").mkString(", ")
    val blocked = PipelineQueries.URL_BLOCKED_IDX.mkString(", ")
    s"""WITH doms(i, dom) AS (
       |  SELECT * FROM (SELECT unnest(generate_series(0, 9)),
       |    unnest([$doms]))),
       |b2 AS (
       |  SELECT doc_id, lang,
       |    ${TextExtractQueries.htmlStripOfParagraphTail} AS bt
       |  FROM documents WHERE doc_id % 7 <> 0),
       |corpus AS (
       |  SELECT doc_id, lang, bt AS text
       |  FROM b2
       |  WHERE ${TextExtractQueries.classifySqlExpr("bt",
                  TextExtractQueries.FIXTURE_SW_LOW,
                  TextExtractQueries.FIXTURE_SW_HIGH)}
       |    IN ('good', 'neargood')),
       |card AS (
       |  SELECT doc_id, n_words, keep
       |  FROM (${TextQueries.gopherRulesSqlFrom("corpus")})),
       |f AS (
       |  SELECT d.doc_id, d.doc_id % 10 AS dd,
       |    CASE
       |      WHEN d.doc_id % 10 % 3 <> 0 THEN TRUE
       |      WHEN d.doc_id % 10 % 6 = 0
       |        AND CAST(d.doc_id AS VARCHAR) LIKE '1%' THEN TRUE
       |      ELSE FALSE
       |    END AS robots_ok,
       |    d.doc_id % 10 NOT IN ($blocked) AS url_ok,
       |    d.doc_id % 7 <> 0 AS fetched,
       |    c.doc_id IS NOT NULL AS ext_ok,
       |    coalesce(c.keep, FALSE) AS quality_ok,
       |    coalesce(c.n_words, 0) AS n_words
       |  FROM documents d LEFT JOIN card c ON c.doc_id = d.doc_id),
       |g AS (
       |  SELECT dd, robots_ok AS c1,
       |    robots_ok AND url_ok AS c2,
       |    robots_ok AND url_ok AND fetched AS c3,
       |    robots_ok AND url_ok AND fetched AND ext_ok AS c4,
       |    robots_ok AND url_ok AND fetched AND ext_ok AND quality_ok
       |      AS c5,
       |    n_words
       |  FROM f)
       |SELECT doms.dom AS domain,
       |  CAST(count(*) AS BIGINT) AS n_urls,
       |  CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_crawlable,
       |  CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_allowed,
       |  CAST(sum(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_fetched_ok,
       |  CAST(sum(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_extracted,
       |  CAST(sum(CASE WHEN c5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN c5 THEN n_words ELSE 0 END) AS BIGINT)
       |    AS kept_tokens
       |FROM g JOIN doms ON doms.i = g.dd
       |GROUP BY 1""".stripMargin
  }

  // ── the crawl→graph loop (round 17): out-links from the parsed
  // bodies → registered-domain edge list → the bit-exact integer
  // PageRank kernel over real crawl links ──

  /** The per-link edge stream: canonical-link host as the source,
    * each anchor host as a destination, both reduced to the
    * registered domain (the same last-two-labels extraction
    * curation_url_filter normalizes to), INTRA-domain links dropped
    * (published host-level graphs — CommonCrawl's host ranks, the
    * RefinedWeb URL prior — count only cross-domain citations).
    *
    * Scale shape: row-local regex scans over the src_warc read; only
    * (src, dst) domain strings leave the scan — payload bytes never
    * shuffle. */
  private[operators] def warcLinkEdges(
      s: SparkSession, dir: String): DataFrame = {
    val root = warcRoot(s, dir)
    val page = decode(col("body"), "UTF-8")
    def regDom(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      regexp_extract(c, "([^.]+\\.[^.]+)$", 1)
    warcRecords(s, s"file:$root/*.warc.gz")
      .filter(col("rec_type") === "response" && col("http_status") === 200)
      .select(
        regexp_extract(page,
          "<link rel=\"canonical\" href=\"https://([^/\"]+)/", 1)
          .as("src_host"),
        explode(regexp_extract_all(page,
          lit("<a href=\"https://([^/\"]+)/[^\"]*\""), lit(1)))
          .as("dst_host"))
      .select(regDom(col("src_host")).as("src_domain"),
        regDom(col("dst_host")).as("dst_domain"))
      .filter(col("src_domain") =!= col("dst_domain"))
  }

  /** warc_links — the web link graph from the crawl, at the
    * registered-domain level: one row per (src, dst) domain pair with
    * its link count — the edge list every published URL-quality prior
    * (CommonCrawl host ranks, RefinedWeb/CCNet) starts from. The
    * reference analog is the links array its recipes attach per item
    * (avhrr recipe.py:71, insitu recipe.py:122). Oracle: the whole
    * extraction replayed as doc_id arithmetic (the link block is a
    * pure function of doc_id — see TextQueries.linkBlockStr). */
  def warcLinks(s: SparkSession, dir: String): DataFrame =
    warcLinkEdges(s, dir)
      .groupBy(col("src_domain"), col("dst_domain"))
      .agg(count(lit(1)).as("n_links"))

  /** The arithmetic edge CTEs shared by warc_links and
    * graph_host_rank oracles: d = doc_id % 10, targets per
    * TextQueries.linkTargets, 404s excluded, intra-domain dropped. */
  private[operators] lazy val linkEdgeCtes: String =
    s"""lnkd AS (
       |  SELECT CAST(doc_id % 10 AS INT) AS d FROM documents
       |  WHERE doc_id % 7 <> 0),
       |lnkt AS (
       |  SELECT d,
       |    CASE WHEN d BETWEEN 5 AND 7 THEN 5 + ((d - 4) % 3)
       |      ELSE (d + 1) % 10 END AS t1,
       |    CASE WHEN d BETWEEN 5 AND 7 THEN 5 + ((d - 3) % 3)
       |      ELSE 0 END AS t2,
       |    CASE WHEN d BETWEEN 5 AND 7 THEN 0
       |      ELSE (9 * d + 1) % 10 END AS t3
       |  FROM lnkd),
       |lnke AS (
       |  SELECT d AS s, t1 AS t FROM lnkt
       |  UNION ALL SELECT d, t2 FROM lnkt
       |  UNION ALL SELECT d, t3 FROM lnkt),
       |lnkx AS (SELECT s, t FROM lnke WHERE s <> t),
       |doms(i, dom) AS (
       |  SELECT * FROM (SELECT unnest(generate_series(0, 9)),
       |    unnest([%DOMS%])))""".stripMargin
      .replace("%DOMS%", graft.operators.PipelineQueries.URL_DOMAINS
        .map(d => s"'$d'").mkString(", "))

  lazy val warcLinksSql: String =
    s"""WITH $linkEdgeCtes
       |SELECT ds.dom AS src_domain, dd.dom AS dst_domain,
       |  CAST(count(*) AS BIGINT) AS n_links
       |FROM lnkx JOIN doms ds ON ds.i = lnkx.s
       |JOIN doms dd ON dd.i = lnkx.t
       |GROUP BY 1, 2""".stripMargin

  /** graph_host_rank — the published URL-quality prior computed FROM
    * the crawl itself: the EXISTING integer fixed-point PageRank
    * kernel (SimilarityQueries.pagerankRanks — the bit-exact
    * recurrence graph_pagerank pins) run over warc_links' distinct
    * domain edges. Deterministic end to end: integer floor division
    * everywhere, so partitioning cannot move a unit and the oracle
    * replays all PR_ITERS rounds in a recursive CTE. Output: per
    * domain, its fixed-point rank plus distinct in/out degree — the
    * hub (the news site every page cites) ranks first and the closed
    * ads/spam/tracking farm stays demoted despite its dense internal
    * triangle (WarcLinksSpec pins both).
    *
    * Scale shape: the edge list aggregates to ≤|domains|² rows before
    * the kernel; at crawl scale the kernel's distributed path is one
    * co-partitioned join + partial agg per round over the cached
    * topology (the graph_pagerank design), and the tiny-graph driver
    * shortcut used here is spec-pinned bit-identical to it. */
  /** The distinct domain-id edge list shared by graph_host_rank and
    * graph_hits, materialized ONCE: without it every consumer (the
    * kernel's edge count + node count + the two driver collects, the
    * in/out-degree aggs) re-expanded the subtree and re-ran the whole
    * archive parse + regex scan — profiled ~7 parses per
    * graph_host_rank call, 2.3 s of its 2.3 s warm time at sf0.1
    * (guide §7.2 duplicated-subtree remedy). The list is ≤ |domains|²
    * rows by construction, so the driver read is bounded at any
    * corpus size. */
  private val hostEdgesMemo = new BuildMemo[Seq[(Long, Long)]]()

  private def hostEdges(s: SparkSession, dir: String): DataFrame = {
    def toId(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      array_position(typedLit(PipelineQueries.URL_DOMAINS), c) - 1
    // Memoized per (dir, corpus fingerprint) — the datasheet_hostrank
    // discipline: ≤ |domains|² rows (bounded driver read) out of a
    // full archive parse that graph_host_rank and graph_hits were
    // EACH re-running per call.
    val fp = IndexManifest.corpusFingerprint(dir, "documents")
    val rows = hostEdgesMemo.getOrBuild(s"$dir|$fp", s.sparkContext) {
      MemoBuilds.record("host_edges")
      warcLinkEdges(s, dir)
        .select(toId(col("src_domain")).as("a"),
          toId(col("dst_domain")).as("b"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    import s.implicits._
    rows.toDF("a", "b")
  }

  def graphHostRank(s: SparkSession, dir: String): DataFrame = {
    val edges = hostEdges(s, dir)
    val nodes = edges.select(col("a")).union(edges.select(col("b")))
      .distinct().select(col("a").as("vec_id"))
    val ranks = SimilarityQueries.pagerankRanks(nodes, edges)
    val ind = edges.groupBy(col("b"))
      .agg(count(lit(1)).as("n_in_domains"))
    val outd = edges.groupBy(col("a"))
      .agg(count(lit(1)).as("n_out_domains"))
    ranks
      .join(ind, ranks("vec_id") === ind("b"), "left")
      .join(outd, ranks("vec_id") === outd("a"), "left")
      .select(
        element_at(typedLit(PipelineQueries.URL_DOMAINS),
          (col("vec_id") + 1).cast("int")).as("domain"),
        col("rank_fp"),
        coalesce(col("n_in_domains"), lit(0L)).as("n_in_domains"),
        coalesce(col("n_out_domains"), lit(0L)).as("n_out_domains"))
  }

  /** The domain-rank recurrence as reusable CTEs (appended after
    * [[linkEdgeCtes]]): index-space adjacency + the state-as-one-row
    * recursive rank vector — the graphPagerankSql idiom over the
    * arithmetic edge topology. Exposes `hrank(v, rank_fp)`. */
  private[operators] lazy val hostRankCtes: String =
    s"""hru AS (SELECT DISTINCT s, t FROM lnkx),
       |hrn AS (SELECT DISTINCT v FROM (
       |  SELECT s AS v FROM hru UNION ALL SELECT t FROM hru)),
       |hridx AS (SELECT v, row_number() OVER (ORDER BY v) AS i
       |  FROM hrn),
       |hrie AS (SELECT bi.i AS tv, ai.i AS sv
       |  FROM hru e JOIN hridx ai ON e.s = ai.v
       |  JOIN hridx bi ON e.t = bi.v),
       |hrinc AS (SELECT x.i, COALESCE(g.l, []) AS l FROM hridx x
       |  LEFT JOIN (SELECT tv, list(sv ORDER BY sv) AS l FROM hrie
       |    GROUP BY tv) g ON g.tv = x.i),
       |hrdg AS (SELECT x.i, COALESCE(d.dg, 1) AS dg FROM hridx x
       |  LEFT JOIN (SELECT sv, count(*) AS dg FROM hrie GROUP BY sv) d
       |    ON d.sv = x.i),
       |hrtopo AS (SELECT (SELECT count(*) FROM hridx) AS n,
       |  (SELECT list(l ORDER BY i) FROM hrinc) AS inc,
       |  (SELECT list(dg ORDER BY i) FROM hrdg) AS dg),
       |hrst(it, rs) AS (
       |  SELECT 0, (SELECT list_transform(range(1, n + 1),
       |      v -> ${SimilarityQueries.PR_SCALE} // n) FROM hrtopo)
       |  UNION ALL
       |  SELECT p.it + 1, list_transform(range(1, t.n + 1),
       |      v -> (${SimilarityQueries.PR_SCALE} * 15 // 100 // t.n) +
       |        COALESCE(list_sum(list_transform(t.inc[v],
       |          u -> (85 * p.rs[u]) // (100 * t.dg[u]))), 0))
       |  FROM hrst p, hrtopo t WHERE p.it < ${SimilarityQueries.PR_ITERS}),
       |hrfin AS (SELECT rs FROM hrst ORDER BY it DESC LIMIT 1),
       |hrank AS (SELECT x.v, hrfin.rs[x.i] AS rank_fp
       |  FROM hridx x, hrfin)""".stripMargin

  lazy val graphHostRankSql: String =
    s"""WITH RECURSIVE $linkEdgeCtes,
       |$hostRankCtes,
       |hin AS (SELECT t, count(*) AS n_in FROM hru GROUP BY t),
       |hout AS (SELECT s, count(*) AS n_out FROM hru GROUP BY s)
       |SELECT doms.dom AS domain, CAST(r.rank_fp AS BIGINT) AS rank_fp,
       |  CAST(COALESCE(hin.n_in, 0) AS BIGINT) AS n_in_domains,
       |  CAST(COALESCE(hout.n_out, 0) AS BIGINT) AS n_out_domains
       |FROM hrank r JOIN doms ON doms.i = r.v
       |LEFT JOIN hin ON hin.t = r.v
       |LEFT JOIN hout ON hout.s = r.v""".stripMargin

  /** graph_hits — Kleinberg hubs-and-authorities over the SAME
    * crawl-derived domain graph as graph_host_rank: authority = "the
    * page everyone worth reading cites", hub = "the page that cites
    * everything worth reading" — the complementary URL-quality prior
    * to PageRank (HITS separates a directory/portal page from an
    * endorsed destination, which a single rank score conflates). Runs
    * [[SimilarityQueries.hitsRanks]], the integer max-normalized
    * fixed point: all-ones hub start, ten (authority ← in-hubs,
    * hub ← out-authorities) rounds, each vector rescaled to
    * HITS_SCALE by exact floor division — bit-reproducible under any
    * partitioning, so the oracle replays the entire recurrence in a
    * recursive CTE. On the fixture the cited-by-everyone news hub
    * tops authority at exactly HITS_SCALE while the closed link
    * farm's internal triangle keeps its authority bounded
    * (WarcLinksSpec pins both).
    *
    * Scale shape: identical to graph_host_rank — the edge list
    * aggregates to ≤|domains|² rows before the kernel; the kernel's
    * distributed path is two co-partitioned joins + partial aggs per
    * round over cached topology plus a 1-row broadcast max, and the
    * tiny-graph driver shortcut used here is spec-pinned
    * bit-identical to it. */
  def graphHits(s: SparkSession, dir: String): DataFrame = {
    val edges = hostEdges(s, dir)
    val nodes = edges.select(col("a")).union(edges.select(col("b")))
      .distinct().select(col("a").as("vec_id"))
    SimilarityQueries.hitsRanks(nodes, edges)
      .select(
        element_at(typedLit(PipelineQueries.URL_DOMAINS),
          (col("vec_id") + 1).cast("int")).as("domain"),
        col("auth_fp"), col("hub_fp"))
  }

  /** The HITS recurrence as CTEs over [[linkEdgeCtes]]'s topology —
    * the hostRankCtes idiom with TWO state vectors; the per-round
    * intermediates (raw sums, maxes, normalized vectors) chain
    * through LATERALs inside the recursive step. HUGEINT arithmetic
    * mirrors the engine's decimal(38,0)/BigInt discipline. Exposes
    * `hhits(v, auth_fp, hub_fp)`. */
  private[operators] lazy val hostHitsCtes: String =
    s"""hiu AS (SELECT DISTINCT s, t FROM lnkx),
       |hin2 AS (SELECT DISTINCT v FROM (
       |  SELECT s AS v FROM hiu UNION ALL SELECT t FROM hiu)),
       |hidx AS (SELECT v, row_number() OVER (ORDER BY v) AS i
       |  FROM hin2),
       |hie AS (SELECT ai.i AS sv, bi.i AS tv
       |  FROM hiu e JOIN hidx ai ON e.s = ai.v
       |  JOIN hidx bi ON e.t = bi.v),
       |hinc2 AS (SELECT x.i, COALESCE(g.l, []) AS l FROM hidx x
       |  LEFT JOIN (SELECT tv, list(sv ORDER BY sv) AS l FROM hie
       |    GROUP BY tv) g ON g.tv = x.i),
       |houtc AS (SELECT x.i, COALESCE(g.l, []) AS l FROM hidx x
       |  LEFT JOIN (SELECT sv, list(tv ORDER BY tv) AS l FROM hie
       |    GROUP BY sv) g ON g.sv = x.i),
       |htopo AS (SELECT (SELECT count(*) FROM hidx) AS n,
       |  (SELECT list(l ORDER BY i) FROM hinc2) AS inc,
       |  (SELECT list(l ORDER BY i) FROM houtc) AS outc),
       |hst(it, hs, aus) AS (
       |  SELECT 0,
       |    (SELECT list_transform(range(1, n + 1),
       |      v -> ${SimilarityQueries.HITS_SCALE}::HUGEINT) FROM htopo),
       |    (SELECT list_transform(range(1, n + 1),
       |      v -> 0::HUGEINT) FROM htopo)
       |  UNION ALL
       |  SELECT p.it + 1, lhn.h2, lan.a2
       |  FROM hst p, htopo t,
       |  LATERAL (SELECT list_transform(range(1, t.n + 1),
       |      v -> COALESCE(list_sum(list_transform(t.inc[v],
       |        u -> p.hs[u])), 0)::HUGEINT) AS ar) lar,
       |  LATERAL (SELECT greatest(list_max(lar.ar), 1::HUGEINT)
       |    AS am) lam,
       |  LATERAL (SELECT list_transform(lar.ar,
       |      x -> (x * ${SimilarityQueries.HITS_SCALE}) // lam.am)
       |    AS a2) lan,
       |  LATERAL (SELECT list_transform(range(1, t.n + 1),
       |      v -> COALESCE(list_sum(list_transform(t.outc[v],
       |        u -> lan.a2[u])), 0)::HUGEINT) AS hr) lhr,
       |  LATERAL (SELECT greatest(list_max(lhr.hr), 1::HUGEINT)
       |    AS hm) lhm,
       |  LATERAL (SELECT list_transform(lhr.hr,
       |      x -> (x * ${SimilarityQueries.HITS_SCALE}) // lhm.hm)
       |    AS h2) lhn
       |  WHERE p.it < ${SimilarityQueries.HITS_ITERS}),
       |hfin2 AS (SELECT hs, aus FROM hst ORDER BY it DESC LIMIT 1),
       |hhits AS (SELECT x.v, f.aus[x.i] AS auth_fp, f.hs[x.i] AS hub_fp
       |  FROM hidx x, hfin2 f)""".stripMargin

  lazy val graphHitsSql: String =
    s"""WITH RECURSIVE $linkEdgeCtes,
       |$hostHitsCtes
       |SELECT doms.dom AS domain,
       |  CAST(r.auth_fp AS BIGINT) AS auth_fp,
       |  CAST(r.hub_fp AS BIGINT) AS hub_fp
       |FROM hhits r JOIN doms ON doms.i = r.v""".stripMargin

  // ── pipeline_crawl_frontier — the fetch list for the NEXT crawl
  // wave (VERDICT r16 task 4): with this in place the engine
  // expresses a crawler's entire data plane — frontier → fetch
  // (src_warc) → extract → gate → pack ──

  private[operators] val FRONTIER_HOST_CAP = 25

  /** pipeline_crawl_frontier — compose the next wave's fetch list:
    *
    *  1. SEEDS: the sitemap entries (src_sitemap) — the configured
    *     seed list;
    *  2. DISCOVERED: every anchor URL extracted from the prior
    *     wave's HTTP-200 bodies (the warc_links scan at URL level);
    *  3. both branches normalized with THE fn_url_normalize chain
    *     (ScalarFnQueries.urlNormCol) and merged to one candidate
    *     row per canonical URL with its reference count (the
    *     in-link-count priority signal real frontiers rank by);
    *  4. ROBOTS gate: per-host RFC 9309 rules (graft.ingest
    *     .RobotsTxt — the curation_robots_filter parser, path
    *     prefix '/page/'), parsed once on the driver and broadcast;
    *  5. SEEN-set anti-join: URLs the prior crawl already fetched
    *     successfully are excluded via the dedup_incremental_bloom
    *     shape — a mergeable Bloom sketch of the seen set broadcast
    *     as a prefilter, surviving candidates confirmed EXACTLY by a
    *     broadcast semi-join (no corpus-wide shuffle; false
    *     positives eliminated). 404 pages are NOT seen — the
    *     frontier re-queues failures, as real crawlers do;
    *  6. per-host politeness cap: TopKPerGroup (the custom plan) by
    *     (n_refs desc, url asc), FRONTIER_HOST_CAP rows per host —
    *     ≤ cap rows per (host, partition) cross the exchange.
    *
    * Output: (host, url_norm, n_refs, rk). Oracle: the WHOLE chain
    * is doc_id arithmetic — seeds, the link targets, robots
    * verdicts, the seen set, and the cap replayed in SQL. */
  /** One parsed rule set per fixture host (a crawler fetches each
    * host's robots.txt once per wave) — shared by the frontier's
    * politeness gate and the schedule's Crawl-delay lookup. The seed
    * host publishes no delay, exercising the default path. */
  private[operators] lazy val frontierRobots
      : Map[String, graft.ingest.RobotsTxt.Rules] =
    (PipelineQueries.URL_DOMAINS.zipWithIndex.map { case (dom, d) =>
      dom -> graft.ingest.RobotsTxt.rulesFor(
        PipelineQueries.robotsTextFor(d, "/page/"), "graft")
    } :+ ("example.org" -> graft.ingest.RobotsTxt.rulesFor(
      "User-agent: *\nDisallow: /private/\n", "graft"))).toMap

  /** Memoized frontier rows per (dir, corpus fingerprint) — the
    * datasheet_hostrank discipline: the frontier is a CAP-BOUNDED
    * output (≤ FRONTIER_HOST_CAP × |hosts| rows — the documented
    * bounded-driver-read class) of an EXPENSIVE chain (full archive
    * scan + sitemap parse + bloom + anti-join, ~2.3 s warm at sf0.1),
    * corpus-fingerprint-stable, and consumed by TWO qids
    * (pipeline_crawl_frontier, pipeline_fetch_schedule) that were
    * each re-running the whole chain per call. A real crawler
    * computes the wave's frontier once and every consumer reads it. */
  private val frontierMemo = new BuildMemo[Seq[(String, String, Long, Long)]]()

  def pipelineCrawlFrontier(s: SparkSession, dir: String): DataFrame = {
    val fp = IndexManifest.corpusFingerprint(dir, "documents")
    val rows = frontierMemo.getOrBuild(s"$dir|$fp", s.sparkContext) {
      MemoBuilds.record("crawl_frontier")
      buildCrawlFrontier(s, dir)
        .select(col("host"), col("url_norm"), col("n_refs"), col("rk"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSeq
    }
    import s.implicits._
    rows.toDF("host", "url_norm", "n_refs", "rk")
  }

  private def buildCrawlFrontier(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.GraftExtensions.register(s)
    val root = warcRoot(s, dir)
    val seeds = srcSitemap(s, dir).select(col("url"))
    val page = decode(col("body"), "UTF-8")
    // ONE archive scan feeds both frontier inputs: the compact
    // (normalized fetched URL, href list) projection is cached —
    // bodies dropped — instead of re-parsing every WARC a second
    // time for the seen set (the two-scan shape this replaced would
    // double the dominant cost at crawl scale)
    val resp200 = warcRecords(s, s"file:$root/*.warc.gz")
      .filter(col("rec_type") === "response" && col("http_status") === 200)
      .select(ScalarFnQueries.urlNormCol(col("url")).as("seen_u"),
        regexp_extract_all(page,
          lit("<a href=\"(https://[^\"]+)\""), lit(1)).as("hrefs"))
      .persist()
    val discovered = resp200.select(explode(col("hrefs")).as("url"))
    val cands = seeds.unionByName(discovered)
      .select(ScalarFnQueries.urlNormCol(col("url")).as("url_norm"))
      .groupBy(col("url_norm"))
      .agg(count(lit(1)).as("n_refs"))
      .withColumn("host",
        regexp_extract(col("url_norm"), "://([^/]+)/", 1))
      .withColumn("path",
        regexp_extract(col("url_norm"), "://[^/]+(/.*)$", 1))
    val rb = s.sparkContext.broadcast(frontierRobots)
    val allowedUdf = udf { (host: String, path: String) =>
      rb.value.get(host).forall(_.allows(path))
    }
    val gated = cands.filter(allowedUdf(col("host"), col("path")))
    // seen set (successful prior fetches), normalized with the SAME
    // chain; bloom prefilter + exact confirm
    val seen = resp200.select(col("seen_u").as("u"))
    val bloom = seen.stat.bloomFilter("u", math.max(seen.count(), 1L), 0.01)
    val bloomBc = s.sparkContext.broadcast(bloom)
    val mightContain = udf((u: String) =>
      u != null && bloomBc.value.mightContainString(u))
    val candSeen = gated.filter(mightContain(col("url_norm")))
      .select(col("url_norm").as("u")).distinct()
    val confirmed = seen.join(broadcast(candSeen), Seq("u"), "left_semi")
      .distinct()
    val fresh = gated.join(broadcast(confirmed),
      gated("url_norm") === confirmed("u"), "left_anti")
    val capped = graft.plans.TopKPerGroup.topKPerGroup(
      fresh.select(col("host"), col("url_norm"), col("n_refs")),
      Seq("host"),
      orderBy = Seq(("n_refs", false), ("url_norm", true)),
      k = FRONTIER_HOST_CAP)
    val w = Window.partitionBy(col("host"))
      .orderBy(col("n_refs").desc, col("url_norm"))
    // materialize the (cap-bounded) frontier, then release the
    // cached scan projection — the pagerankRanks lifecycle
    val out = capped.withColumn("rk", row_number().over(w).cast("long"))
      .localCheckpoint(eager = true)
    resp200.unpersist()
    out
  }

  /** The frontier chain as reusable CTEs (appended after
    * [[linkEdgeCtes]]) — shared by pipeline_crawl_frontier and
    * pipeline_fetch_schedule. Exposes `ranked(host, url_norm,
    * n_refs, rk)`; consumers apply the [[FRONTIER_HOST_CAP]]. */
  private[operators] lazy val frontierCtes: String =
    s"""seeds AS (
       |  SELECT 'https://example.org/page/' || doc_id AS u
       |  FROM documents),
       |dt AS (
       |  SELECT doc_id, CAST(doc_id % 10 AS INT) AS d FROM documents
       |  WHERE doc_id % 7 <> 0),
       |disc AS (
       |  SELECT 'https://' || dd.dom || '/page/' || (dt.doc_id + tj.j)
       |    AS u
       |  FROM dt, LATERAL (SELECT unnest([
       |      struct_pack(j := 1, t := CASE WHEN dt.d BETWEEN 5 AND 7
       |        THEN 5 + ((dt.d - 4) % 3) ELSE (dt.d + 1) % 10 END),
       |      struct_pack(j := 2, t := CASE WHEN dt.d BETWEEN 5 AND 7
       |        THEN 5 + ((dt.d - 3) % 3) ELSE 0 END),
       |      struct_pack(j := 3, t := CASE WHEN dt.d BETWEEN 5 AND 7
       |        THEN 0 ELSE (9 * dt.d + 1) % 10 END)]) AS e) fan,
       |    LATERAL (SELECT (fan.e).j AS j, (fan.e).t AS t) tj
       |  JOIN doms dd ON dd.i = tj.t),
       |cand AS (
       |  SELECT u AS url_norm, CAST(count(*) AS BIGINT) AS n_refs
       |  FROM (SELECT u FROM seeds UNION ALL SELECT u FROM disc)
       |  GROUP BY 1),
       |parts AS (
       |  SELECT url_norm, n_refs,
       |    regexp_extract(url_norm, '://([^/]+)/', 1) AS host,
       |    regexp_extract(url_norm, 'page/(\\d+)$$', 1) AS pid
       |  FROM cand),
       |gated AS (
       |  SELECT p.* FROM parts p LEFT JOIN doms ON doms.dom = p.host
       |  WHERE p.host = 'example.org'
       |     OR doms.i % 3 <> 0
       |     OR (doms.i % 6 = 0 AND p.pid LIKE '1%')),
       |seen AS (
       |  SELECT 'https://example.org/page/' || doc_id AS u
       |  FROM documents WHERE doc_id % 7 <> 0),
       |fresh AS (
       |  SELECT g.* FROM gated g
       |  WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.u = g.url_norm)),
       |ranked AS (
       |  SELECT host, url_norm, n_refs,
       |    CAST(row_number() OVER (PARTITION BY host
       |      ORDER BY n_refs DESC, url_norm) AS BIGINT) AS rk
       |  FROM fresh)""".stripMargin

  lazy val pipelineCrawlFrontierSql: String =
    s"""WITH $linkEdgeCtes,
       |$frontierCtes
       |SELECT host, url_norm, n_refs, rk FROM ranked
       |WHERE rk <= $FRONTIER_HOST_CAP""".stripMargin

  /** Scheduler tick length: fetches grouped into WAVE_SECONDS-wide
    * dispatch waves (the unit a fetcher fleet pulls at a time). */
  private[operators] val WAVE_SECONDS = 10L

  /** pipeline_fetch_schedule — turn the frontier into a POLITE fetch
    * plan: per host, the rk-ordered URLs are serialized at exactly
    * the host's `Crawl-delay` spacing (the de-facto robots.txt
    * extension, parsed by graft.ingest.RobotsTxt from the same rule
    * sets the frontier's gate used; hosts that publish no delay get
    * the 1 s default), giving each URL its dispatch offset
    * `fetch_at_s = (rk − 1) × delay_s` and its scheduler wave
    * `fetch_at_s DIV WAVE_SECONDS`. This is the last composition in
    * front of src_warc: frontier → schedule → fetch → extract →
    * gate → pack is now the crawler's entire data plane, each stage
    * an oracle-checked operator.
    *
    * Scale shape: one broadcast join of a |hosts|-row delay table
    * onto the capped frontier (≤ cap × |hosts| rows), then row-local
    * arithmetic — nothing shuffles beyond the frontier's own
    * TopKPerGroup exchange. Oracle: the whole chain — frontier CTEs
    * plus the delay arithmetic (domain i delays 1 + i%3 s, the seed
    * host defaults to 1 s) — is replayed in SQL. */
  def pipelineFetchSchedule(s: SparkSession, dir: String): DataFrame = {
    val fr = pipelineCrawlFrontier(s, dir)
    import s.implicits._
    val delays = frontierRobots.toSeq
      .map { case (host, r) =>
        (host, r.crawlDelay.getOrElse(DEFAULT_CRAWL_DELAY)) }
      .sortBy(_._1)
      .toDF("host", "delay_s")
    scheduleFrom(fr, delays)
  }

  /** The delay-table composition seam: LEFT join + default so a
    * frontier host absent from the delay map still gets a schedule
    * row (the frontier's allow gate fail-opens for unknown hosts —
    * an inner join here silently dropped those URLs, ADVICE r17). */
  private[operators] def scheduleFrom(
      fr: DataFrame, delays: DataFrame): DataFrame =
    fr.join(broadcast(delays), Seq("host"), "left")
      .withColumn("delay_s",
        coalesce(col("delay_s"), lit(DEFAULT_CRAWL_DELAY)))
      .select(col("host"), col("url_norm"), col("n_refs"), col("rk"),
        col("delay_s"),
        ((col("rk") - 1) * col("delay_s")).as("fetch_at_s"),
        expr(s"((rk - 1) * delay_s) DIV $WAVE_SECONDS").as("wave"))

  private[operators] val DEFAULT_CRAWL_DELAY = 1L

  lazy val pipelineFetchScheduleSql: String =
    s"""WITH $linkEdgeCtes,
       |$frontierCtes,
       |fr AS (SELECT host, url_norm, n_refs, rk FROM ranked
       |  WHERE rk <= $FRONTIER_HOST_CAP),
       |dly AS (
       |  SELECT dom AS host, CAST(1 + (i % 3) AS BIGINT) AS delay_s
       |  FROM doms
       |  UNION ALL SELECT 'example.org', $DEFAULT_CRAWL_DELAY)
       |SELECT f.host, f.url_norm, f.n_refs, f.rk,
       |  COALESCE(d.delay_s, $DEFAULT_CRAWL_DELAY) AS delay_s,
       |  CAST((f.rk - 1) * COALESCE(d.delay_s, $DEFAULT_CRAWL_DELAY)
       |    AS BIGINT) AS fetch_at_s,
       |  CAST(((f.rk - 1) * COALESCE(d.delay_s, $DEFAULT_CRAWL_DELAY))
       |    // $WAVE_SECONDS AS BIGINT) AS wave
       |FROM fr f LEFT JOIN dly d ON d.host = f.host""".stripMargin

  /** Base revisit interval of the adaptive re-crawl policy (1 day —
    * the fixture's own crawl spacing). */
  private[operators] val RECRAWL_BASE_S = 86400L

  /** pipeline_recrawl_plan — adaptive revisit scheduling from the
    * two crawls' CHANGE HISTORY (the Heritrix wait-between-visits /
    * Cho–Garcia-Molina multiplicative policy): per page, compare
    * crawl 1's response with crawl 2's record —
    *
    *   - stored a new 200 body over an old 200 → content CHANGED:
    *     state `hot`, interval halves;
    *   - `revisit` (identical-payload-digest) of a 200 → unchanged:
    *     state `cold`, interval doubles;
    *   - 200 where crawl 1 saw 404 → `recovered`, base interval;
    *   - still 404 → `dead`, interval ×4 (back off hardest).
    *
    * The engine DERIVES every state from the parsed archives (record
    * types, statuses, the revisit profile's absence of a body); the
    * oracle recomputes the whole plan from doc_id arithmetic — a
    * mis-parsed revisit or status lands in the wrong state and goes
    * hash-red. Completes the crawl loop: frontier → schedule →
    * fetch → extract → recrawl-plan feeds the NEXT frontier.
    *
    * Scale shape: two header-level archive scans (bodies never
    * shuffle — only (doc_id, type, status) projections), one
    * co-partitioned doc_id join, row-local policy arithmetic. */
  def pipelineRecrawlPlan(s: SparkSession, dir: String): DataFrame = {
    val c1 = warcRecords(s, s"file:${warcRoot(s, dir)}/*.warc.gz")
      .filter(col("rec_type") === "response")
      .select(
        regexp_extract(col("url"), "page/(\\d+)$", 1).cast("long")
          .as("doc_id"),
        col("http_status").as("s1"))
    val c2 = warcRecords(s, s"file:${warcRevisitRoot(s, dir)}/*.warc.gz")
      .filter(col("rec_type").isin("response", "revisit"))
      .select(
        regexp_extract(col("url"), "page/(\\d+)$", 1).cast("long")
          .as("doc_id"),
        col("rec_type").as("t2"))
    c1.join(c2, Seq("doc_id"))
      .select(col("doc_id"),
        when(col("t2") === "response" && col("s1") === 404,
          lit("recovered"))
          .when(col("t2") === "response", lit("hot"))
          // a revisit stores no body, so its OWN status is absent;
          // identical payload digest == crawl 1's body == crawl 1's
          // status (a revisit of a 404 is still a 404)
          .when(col("s1") === 404, lit("dead"))
          .otherwise(lit("cold")).as("state"))
      .withColumn("interval_s",
        when(col("state") === "hot", RECRAWL_BASE_S / 2)
          .when(col("state") === "recovered", RECRAWL_BASE_S)
          .when(col("state") === "cold", RECRAWL_BASE_S * 2)
          .otherwise(RECRAWL_BASE_S * 4))
  }

  lazy val pipelineRecrawlPlanSql: String =
    s"""SELECT doc_id,
       |  CASE WHEN doc_id % 3 <> 0 AND doc_id % 7 = 0 THEN 'recovered'
       |       WHEN doc_id % 3 <> 0 THEN 'hot'
       |       WHEN doc_id % 7 = 0 THEN 'dead'
       |       ELSE 'cold' END AS state,
       |  CASE WHEN doc_id % 3 <> 0 AND doc_id % 7 = 0
       |         THEN $RECRAWL_BASE_S
       |       WHEN doc_id % 3 <> 0 THEN ${RECRAWL_BASE_S / 2}
       |       WHEN doc_id % 7 = 0 THEN ${RECRAWL_BASE_S * 4}
       |       ELSE ${RECRAWL_BASE_S * 2} END AS interval_s
       |FROM documents""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_crawl_frontier" -> (pipelineCrawlFrontier _),
    "pipeline_fetch_schedule" -> (pipelineFetchSchedule _),
    "pipeline_recrawl_plan" -> (pipelineRecrawlPlan _),
    "src_warc_split" -> (srcWarcSplit _),
    "warc_links" -> (warcLinks _),
    "graph_host_rank" -> (graphHostRank _),
    "graph_hits" -> (graphHits _),
    "pipeline_crawl_funnel" -> (pipelineCrawlFunnel _),
    "src_warc" -> (srcWarc _),
    "pipeline_warc_to_corpus" -> (pipelineWarcToCorpus _),
    "pipeline_warc_extract" -> (pipelineWarcExtract _),
    "warc_cdx" -> (warcCdx _),
    "warc_revisit_audit" -> (warcRevisitAudit _),
    "src_sitemap" -> (srcSitemap _),
    "snk_wet" -> (snkWet _),
    "snk_wat" -> (snkWat _)
  )

  def oracle: Map[String, String] = Map(
    "pipeline_crawl_frontier" -> pipelineCrawlFrontierSql,
    "pipeline_fetch_schedule" -> pipelineFetchScheduleSql,
    "pipeline_recrawl_plan" -> pipelineRecrawlPlanSql,
    "src_warc_split" -> srcWarcSql,
    "warc_links" -> warcLinksSql,
    "graph_host_rank" -> graphHostRankSql,
    "graph_hits" -> graphHitsSql,
    "pipeline_crawl_funnel" -> pipelineCrawlFunnelSql,
    "src_warc" -> srcWarcSql,
    "pipeline_warc_to_corpus" -> pipelineWarcToCorpusSql,
    "pipeline_warc_extract" -> pipelineWarcExtractSql,
    "warc_cdx" -> warcCdxSql,
    "warc_revisit_audit" -> warcRevisitAuditSql,
    "src_sitemap" -> srcSitemapSql,
    "snk_wet" -> snkWetSql,
    "snk_wat" -> snkWatSql
  )
}
