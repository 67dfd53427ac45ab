package graft.ingest

import java.io.{InputStream, OutputStream}

/** Minimal POSIX ustar (IEEE 1003.1) tar writer/reader — the
  * container format of WebDataset training shards (one `.tar` per
  * shard, each sample a run of `<key>.<ext>` entries with a shared
  * key). Only the subset a shard pipeline needs is implemented:
  * regular files, names ≤ 100 bytes, sizes ≤ 8 GiB (11 octal
  * digits). Headers are written fully deterministic — fixed mode /
  * uid / gid / mtime — so a shard's bytes are a pure function of its
  * contents and digests of whole shards are reproducible.
  *
  * Reader discipline mirrors WarcIo: header checksums are verified
  * and a corrupt header yields ONE quarantine entry and stops the
  * file (tar has no resync marker — unlike WARC's version line, a
  * damaged size field forfeits all following offsets), while every
  * entry before the damage is kept.
  */
object TarIo {

  private val BLOCK = 512

  /** One parsed entry: name, payload, or a quarantine error. */
  final case class Entry(name: String, data: Array[Byte], err: String)

  // ── writer ──

  /** Append one regular-file entry (header + padded data). */
  def writeEntry(out: OutputStream, name: String,
      data: Array[Byte]): Unit = {
    require(name.getBytes("UTF-8").length <= 100,
      s"tar entry name over 100 bytes: $name")
    val h = new Array[Byte](BLOCK)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("UTF-8")
      System.arraycopy(b, 0, h, off, b.length)
    }
    def putOctal(off: Int, len: Int, v: Long): Unit =
      // len-1 octal digits, NUL terminated (the pre-POSIX-compatible
      // form every tar reader accepts)
      put(off, ("%0" + (len - 1) + "o").format(v))
    put(0, name)                       // name[100]
    putOctal(100, 8, 420L)             // mode[8]  = 0644
    putOctal(108, 8, 0L)               // uid[8]
    putOctal(116, 8, 0L)               // gid[8]
    putOctal(124, 12, data.length.toLong) // size[12]
    putOctal(136, 12, 0L)              // mtime[12] — fixed for determinism
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum spaces
    h(156) = '0'                       // typeflag: regular file
    put(257, "ustar")                  // magic[6] (NUL-terminated by fill)
    put(263, "00")                     // version[2]
    var sum = 0L
    var i = 0
    while (i < BLOCK) { sum += (h(i) & 0xff); i += 1 }
    put(148, "%06o".format(sum))       // chksum: 6 octal, NUL, space
    h(154) = 0; h(155) = ' '
    out.write(h)
    out.write(data)
    val pad = (BLOCK - data.length % BLOCK) % BLOCK
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** Write the end-of-archive marker (two zero blocks). */
  def finish(out: OutputStream): Unit =
    out.write(new Array[Byte](2 * BLOCK))

  // ── reader ──

  /** Parse all entries; a corrupt header emits one `err` entry and
    * stops (no resync possible in tar — see scaladoc). `onStop` fires
    * exactly once when the iterator reaches its end — clean
    * terminator, clean EOF, or quarantine stop — so callers can close
    * the underlying stream without tracking it themselves (the WarcIo
    * closeQuietly discipline; executors otherwise leak one file
    * descriptor per shard per parse). */
  def readEntries(in: InputStream,
      onStop: () => Unit = () => ()): Iterator[Entry] =
    new Iterator[Entry] {
      private var stopped = false
      private var stopFired = false

      private def fireStop(): Unit = if (!stopFired) {
        stopFired = true
        try onStop() catch { case _: Exception => () }
      }

      private def readFully(n: Int): Array[Byte] = {
        val b = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = in.read(b, off, n - off)
          if (r < 0) throw new java.io.EOFException(
            s"truncated: wanted $n bytes, got $off")
          off += r
        }
        b
      }

      private def advance(): Entry = {
        if (stopped) return null
        // header read: EOF at a header BOUNDARY (0 bytes) is a clean
        // unterminated archive (tools tolerate a missing end marker);
        // EOF mid-header is damage and quarantines
        val h = new Array[Byte](BLOCK)
        var off = 0
        var eof = false
        while (off < BLOCK && !eof) {
          val r = in.read(h, off, BLOCK - off)
          if (r < 0) eof = true else off += r
        }
        if (eof) {
          stopped = true
          if (off == 0) return null
          return Entry("", Array.emptyByteArray,
            s"tar: truncated header: $off of $BLOCK bytes")
        }
        if (h.forall(_ == 0)) { stopped = true; return null } // terminator
        try {
          // verify checksum: stored vs computed with field spaced out
          val stored = parseOctal(h, 148, 8)
          var sum = 0L
          var i = 0
          while (i < BLOCK) {
            sum += (if (i >= 148 && i < 156) ' '.toInt else h(i) & 0xff)
            i += 1
          }
          if (sum != stored)
            throw new IllegalArgumentException(
              s"header checksum $stored != computed $sum")
          val name = {
            val end0 = h.indexOf(0.toByte)
            val end = if (end0 < 0 || end0 > 100) 100 else end0
            new String(h, 0, end, "UTF-8")
          }
          val size = parseOctal(h, 124, 12)
          if (size < 0 || size > Int.MaxValue.toLong)
            throw new IllegalArgumentException(s"entry size $size")
          val data = readFully(size.toInt)
          val pad = ((BLOCK - size % BLOCK) % BLOCK).toInt
          if (pad > 0) readFully(pad)
          Entry(name, data, "")
        } catch {
          case e: Exception =>
            stopped = true
            Entry("", Array.emptyByteArray,
              s"tar: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }

      private def parseOctal(h: Array[Byte], off: Int, len: Int): Long = {
        var v = 0L
        var i = off
        var seen = false
        while (i < off + len) {
          val c = h(i)
          if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
          else if (c != ' ' && c != 0)
            throw new IllegalArgumentException(
              s"bad octal byte ${c & 0xff} at $i")
          i += 1
        }
        if (!seen) throw new IllegalArgumentException("empty octal field")
        v
      }

      private def step(): Entry = {
        val e = advance()
        if (e == null) fireStop()
        e
      }

      private var nextEntry: Entry = step()

      override def hasNext: Boolean = nextEntry != null
      override def next(): Entry = {
        val e = nextEntry
        nextEntry = step()
        e
      }
    }
}
