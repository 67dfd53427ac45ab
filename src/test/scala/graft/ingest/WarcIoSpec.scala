package graft.ingest

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** WarcIo: round-trip fidelity plus the corrupt-member quarantine
  * contract — a malformed record yields ONE error row and the parser
  * resyncs to the next record; compression-level corruption yields a
  * file-level error row instead of a thrown task. */
class WarcIoSpec extends AnyFunSuite {

  private def respHeaders(id: Int) = Seq(
    "WARC-Type" -> "response",
    "WARC-Record-ID" -> s"<urn:uuid:resp-$id>",
    "WARC-Date" -> "2022-05-01T00:00:00Z",
    "WARC-Target-URI" -> s"https://example.org/page/$id",
    "Content-Type" -> "application/http;msgtype=response")

  private def httpPayload(body: String, status: String = "200 OK") =
    (s"HTTP/1.1 $status\r\nContent-Type: text/html\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n" + body)
      .getBytes("UTF-8")

  private def gzipFile(records: Seq[(Seq[(String, String)], Array[Byte])])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    records.foreach { case (h, p) => WarcIo.writeRecord(bos, h, p) }
    bos.toByteArray
  }

  test("round-trip: every field, every record, member-per-record gzip") {
    val bytes = gzipFile((1 to 5).map(i =>
      respHeaders(i) -> httpPayload(s"<p>body $i</p>")))
    val recs = WarcIo.parseGzip(new ByteArrayInputStream(bytes)).toList
    assert(recs.size == 5)
    recs.zipWithIndex.foreach { case (r, i0) =>
      val i = i0 + 1
      assert(r.err == "")
      assert(r.recType == "response")
      assert(r.recordId == s"<urn:uuid:resp-$i>")
      assert(r.targetUri == s"https://example.org/page/$i")
      assert(r.httpStatus == 200)
      assert(r.httpMime == "text/html")
      assert(new String(r.body, "UTF-8") == s"<p>body $i</p>")
      assert(r.contentLength == httpPayload(s"<p>body $i</p>").length)
    }
  }

  test("truncated payload: Content-Length past EOF quarantines, " +
      "earlier records survive") {
    val good = WarcIo.recordBytes(respHeaders(1), httpPayload("<p>ok</p>"))
    val bad = {
      val full = WarcIo.recordBytes(respHeaders(2), httpPayload("<p>gone</p>"))
      full.take(full.length - 20) // cut inside the payload
    }
    val bos = new ByteArrayOutputStream()
    WarcIo.writeMember(bos, good)
    WarcIo.writeMember(bos, bad)
    val recs = WarcIo.parseGzip(
      new ByteArrayInputStream(bos.toByteArray)).toList
    assert(recs.size == 2)
    assert(recs.head.err == "" && recs.head.httpStatus == 200)
    assert(recs(1).err.startsWith("truncated payload"))
    assert(recs(1).recordId == "<urn:uuid:resp-2>")
  }

  test("garbage between records: one quarantine row, resync parses " +
      "the NEXT record fully") {
    val r1 = WarcIo.recordBytes(respHeaders(1), httpPayload("<p>a</p>"))
    val junk = "this is not a warc record\r\nmore junk\r\n".getBytes("UTF-8")
    val r3 = WarcIo.recordBytes(respHeaders(3), httpPayload("<p>c</p>"))
    val bos = new ByteArrayOutputStream()
    WarcIo.writeMember(bos, r1 ++ junk ++ r3)
    val recs = WarcIo.parseGzip(
      new ByteArrayInputStream(bos.toByteArray)).toList
    assert(recs.size == 3)
    assert(recs(0).err == "" && recs(0).targetUri.endsWith("/1"))
    assert(recs(1).err.startsWith("resync"))
    assert(recs(2).err == "" && recs(2).targetUri.endsWith("/3") &&
      new String(recs(2).body, "UTF-8") == "<p>c</p>")
  }

  test("bad version line and missing Content-Length both quarantine " +
      "with a reason") {
    val noLen = ("WARC/1.0\r\nWARC-Type: metadata\r\n" +
      "WARC-Record-ID: <urn:uuid:x>\r\n\r\n").getBytes("US-ASCII")
    val r2 = WarcIo.recordBytes(respHeaders(2), httpPayload("<p>b</p>"))
    val bos = new ByteArrayOutputStream()
    WarcIo.writeMember(bos, noLen ++ r2)
    val recs = WarcIo.parseGzip(
      new ByteArrayInputStream(bos.toByteArray)).toList
    // the record with no Content-Length quarantines; its residual
    // bytes (here none before r2's version line) resync cleanly
    assert(recs.exists(_.err.contains("Content-Length")))
    assert(recs.exists(r => r.err == "" && r.targetUri.endsWith("/2")))
  }

  test("corrupt DEFLATE data inside a member: file-level gzip " +
      "quarantine row, no throw") {
    val ok = gzipFile(Seq(respHeaders(1) -> httpPayload("<p>a</p>")))
    // flip bytes in the middle of the compressed stream
    val corrupted = ok.clone()
    (ok.length / 2 until math.min(ok.length / 2 + 8, ok.length))
      .foreach(i => corrupted(i) = (corrupted(i) ^ 0x5a).toByte)
    val recs = WarcIo.parseGzip(
      new ByteArrayInputStream(corrupted)).toList
    assert(recs.nonEmpty)
    assert(recs.last.err.startsWith("gzip:") ||
      recs.last.err.startsWith("truncated"),
      s"expected quarantine, got: ${recs.map(_.err)}")
  }

  test("every WARC header survives into the headers map (revisit " +
      "profile fields reachable)") {
    val rec = WarcIo.recordBytes(Seq(
      "WARC-Type" -> "revisit",
      "WARC-Record-ID" -> "<urn:uuid:rev-1>",
      "WARC-Refers-To" -> "<urn:uuid:resp-1>",
      "WARC-Profile" ->
        "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest",
      "WARC-Payload-Digest" -> "sha256:abc123",
      "WARC-Date" -> "2022-05-02T00:00:00Z",
      "WARC-Target-URI" -> "https://example.org/page/1"),
      "HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII"))
    val bos = new ByteArrayOutputStream()
    WarcIo.writeMember(bos, rec)
    val r = WarcIo.parseGzip(
      new ByteArrayInputStream(bos.toByteArray)).toList.head
    assert(r.err == "" && r.recType == "revisit")
    assert(r.headers("warc-refers-to") == "<urn:uuid:resp-1>")
    assert(r.headers("warc-payload-digest") == "sha256:abc123")
    assert(r.headers("warc-profile").endsWith("identical-payload-digest"))
  }

  test("memberOffsets walks exact gzip member boundaries (seeking " +
      "to each offset parses exactly the remaining records)") {
    val members = (1 to 7).map(i =>
      WarcIo.recordBytes(respHeaders(i), httpPayload(s"<p>m $i</p>")))
    val bos = new ByteArrayOutputStream()
    members.foreach(m => WarcIo.writeMember(bos, m))
    val bytes = bos.toByteArray
    val offs = WarcIo.memberOffsets(
      new ByteArrayInputStream(bytes)).toArray
    assert(offs.length == 7, s"7 members, got ${offs.toSeq}")
    assert(offs.head == 0L)
    assert(offs.sameElements(offs.sorted) && offs.distinct.length == 7)
    // each offset is a true member boundary: parsing from it yields
    // exactly the records from that member on
    offs.zipWithIndex.foreach { case (o, i) =>
      val tail = java.util.Arrays.copyOfRange(bytes, o.toInt, bytes.length)
      val recs = WarcIo.parseGzip(new ByteArrayInputStream(tail)).toList
      assert(recs.count(_.err.isEmpty) == 7 - i,
        s"offset $o (member $i): expected ${7 - i} records")
      assert(recs.head.recordId == s"<urn:uuid:resp-${i + 1}>")
    }
    // MemberWriter framing (the reused-Deflater path) indexes too
    val bos2 = new ByteArrayOutputStream()
    val mw = new WarcIo.MemberWriter(bos2)
    (1 to 4).foreach(i => mw.writeRecord(respHeaders(i),
      httpPayload(s"<p>w $i</p>")))
    mw.close()
    assert(WarcIo.memberOffsets(
      new ByteArrayInputStream(bos2.toByteArray)).size == 4)
  }

  test("memberOffsets stops cleanly on a truncated or non-gzip tail") {
    val good = WarcIo.recordBytes(respHeaders(1), httpPayload("<p>a</p>"))
    val bos = new ByteArrayOutputStream()
    WarcIo.writeMember(bos, good)
    val full = bos.toByteArray
    // truncated second member
    val bos2 = new ByteArrayOutputStream()
    bos2.write(full); bos2.write(full, 0, full.length - 9)
    assert(WarcIo.memberOffsets(
      new ByteArrayInputStream(bos2.toByteArray)).toList == List(0L))
    // garbage tail
    val bos3 = new ByteArrayOutputStream()
    bos3.write(full); bos3.write("not gzip".getBytes("US-ASCII"))
    assert(WarcIo.memberOffsets(
      new ByteArrayInputStream(bos3.toByteArray)).toList == List(0L))
    assert(WarcIo.memberOffsets(
      new ByteArrayInputStream(Array.emptyByteArray)).isEmpty)
  }

  test("empty stream parses to zero records") {
    assert(WarcIo.parseGzip(
      new ByteArrayInputStream(Array.emptyByteArray)).toList
      .forall(_.err.nonEmpty))
  }

  test("out-of-range Content-Length quarantines the RECORD and " +
      "resyncs — later records survive (r16 advisory: a declared " +
      "2-4 GiB length must not become a file-level gzip quarantine)") {
    // hand-build a record whose declared length is absurd (the body
    // actually present is tiny) — recordBytes would compute the real
    // length, so frame it manually
    def rawWithLen(id: Int, declared: String, body: String) =
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:uuid:resp-$id>\r\n" +
        s"WARC-Target-URI: https://example.org/page/$id\r\n" +
        s"Content-Length: $declared\r\n\r\n" + body + "\r\n\r\n")
        .getBytes("US-ASCII")
    val bos = new ByteArrayOutputStream()
    // 3 GiB: used to throw NegativeArraySizeException in len.toInt
    WarcIo.writeMember(bos, rawWithLen(1, "3221225472", "tiny"))
    val good1 = WarcIo.recordBytes(respHeaders(2), httpPayload("<p>a</p>"))
    WarcIo.writeMember(bos, good1)
    // > 4 GiB: used to silently read len mod 2^32 bytes
    WarcIo.writeMember(bos, rawWithLen(3, "8589934600", "tiny"))
    // negative declared length
    WarcIo.writeMember(bos, rawWithLen(4, "-7", "tiny"))
    val good2 = WarcIo.recordBytes(respHeaders(5), httpPayload("<p>b</p>"))
    WarcIo.writeMember(bos, good2)
    val recs = WarcIo.parseGzip(
      new ByteArrayInputStream(bos.toByteArray)).toList
    val bad = recs.filter(_.err.nonEmpty)
    assert(bad.size == 3, s"three record quarantines, got $recs")
    assert(bad.forall(_.err.startsWith("content-length out of range")),
      s"record-level reason, never 'gzip:' file-level: ${bad.map(_.err)}")
    assert(bad.map(_.contentLength).sorted ==
      List(-7L, 3221225472L, 8589934600L),
      "the absurd declared length is carried on the quarantine row")
    val ok = recs.filter(_.err.isEmpty)
    assert(ok.map(_.recordId) ==
      List("<urn:uuid:resp-2>", "<urn:uuid:resp-5>"),
      "records after each bad declaration must survive via resync")
    assert(ok.forall(_.httpStatus == 200))
  }

  test("non-HTTP response payload degrades to status -1, whole " +
      "payload as body") {
    val p = "not http at all".getBytes("UTF-8")
    val bytes = gzipFile(Seq(respHeaders(9) -> p))
    val r = WarcIo.parseGzip(new ByteArrayInputStream(bytes)).toList.head
    assert(r.err == "" && r.httpStatus == -1 &&
      new String(r.body, "UTF-8") == "not http at all")
  }
}
