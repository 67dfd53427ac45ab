package graft.ingest

import java.io.InputStream
import java.net.{HttpURLConnection, URI}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Remote HTTP open with auth kwargs — the engine form of the
  * reference's fsspec HTTP open with `storage_kwargs` (headers/auth
  * client kwargs, avhrr recipe.py:124,154): a URL table is fetched IN
  * THE EXECUTORS, one connection per row, with the caller's header
  * map applied to every request.
  *
  * Scale design: the URL frame's partitioning IS the fetch
  * parallelism — repartition(n) = n concurrent streams, so politeness
  * limits are a plan knob, not code. The driver never opens a
  * connection. Bodies are streamed through a digest and byte counter
  * (never materialized), capped at maxBytes, so a mis-pointed URL
  * can't blow executor memory. Transient failures retry twice with
  * linear backoff; terminal failures become status rows (-1), never
  * task failures — one dead URL must not kill a 100 TB ingest stage.
  */
object HttpSource {

  /** One fetch outcome: HTTP status (-1 = connect error), byte count
    * and content digest. For any 2xx the body is drained and sha256
    * is the digest of the (possibly empty — think 204) bytes read up
    * to maxBytes; the "" sentinel means NO body was fetched (non-2xx
    * or connect error), so distinguish empty-body from not-fetched by
    * the sentinel, not by n_bytes. */
  case class Fetched(url: String, status: Int, n_bytes: Long, sha256: String)

  private val RETRIES = 2

  /** GET every row of `urls` (a single `url` string column) with
    * `headers` applied — auth tokens, user agents, byte ranges. */
  def openUrls(
      s: SparkSession,
      urls: DataFrame,
      headers: Map[String, String],
      connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 30000,
      maxBytes: Long = 64L << 20): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val hdrs = headers.toSeq // Map is serializable, Seq keeps it cheap
    urls.select(col("url")).as[String]
      .mapPartitions { it =>
        it.map(u => fetchOne(u, hdrs, connectTimeoutMs, readTimeoutMs,
          maxBytes))
      }
      .toDF()
  }

  private def fetchOne(
      url: String,
      headers: Seq[(String, String)],
      connectTimeoutMs: Int,
      readTimeoutMs: Int,
      maxBytes: Long): Fetched = {
    var attempt = 0
    while (true) {
      try {
        val conn = URI.create(url).toURL.openConnection()
          .asInstanceOf[HttpURLConnection]
        try {
          conn.setConnectTimeout(connectTimeoutMs)
          conn.setReadTimeout(readTimeoutMs)
          conn.setRequestMethod("GET")
          headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
          val status = conn.getResponseCode
          // a 5xx is as transient as a connect error: retry it under
          // the same backoff instead of permanently recording failure
          if (status >= 500 && attempt < RETRIES)
            throw new java.io.IOException(s"transient HTTP $status")
          // any 2xx carries a body worth draining — 206 is the normal
          // reply to the Range headers this API advertises
          if (status / 100 != 2) return Fetched(url, status, 0L, "")
          val (n, digest) = drain(conn.getInputStream, maxBytes)
          return Fetched(url, status, n, digest)
        } finally conn.disconnect()
      } catch {
        // task-kill/cancellation signals must propagate, not become a
        // fake status -1 row: ClosedByInterruptException is an
        // IOException, so it would otherwise be retried with sleeps
        // and then swallowed, delaying cancellation and recording a
        // bogus fetch outcome
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
        case e: java.nio.channels.ClosedByInterruptException => throw e
        case _: java.io.IOException if attempt < RETRIES =>
          attempt += 1
          try Thread.sleep(200L * attempt)
          catch {
            case ie: InterruptedException =>
              Thread.currentThread().interrupt(); throw ie
          }
        case _: Exception =>
          return Fetched(url, -1, 0L, "")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Stream the body through sha256 + a counter; never buffers more
    * than 64 KiB. Hashes and counts EXACTLY maxBytes when the body is
    * larger — clamping inside the last read keeps the digest a
    * deterministic content key regardless of how the socket chunks
    * the stream. */
  private def drain(in: InputStream, maxBytes: Long): (Long, String) = {
    val md = MessageDigest.getInstance("SHA-256")
    val buf = new Array[Byte](65536)
    var total = 0L
    try {
      var read = in.read(buf)
      while (read >= 0 && total < maxBytes) {
        val take = math.min(read.toLong, maxBytes - total).toInt
        md.update(buf, 0, take)
        total += take
        if (total < maxBytes) read = in.read(buf) else read = -1
      }
    } finally in.close()
    (total, md.digest().map("%02x".format(_)).mkString)
  }
}
