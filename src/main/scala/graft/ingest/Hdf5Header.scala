package graft.ingest

import java.io.{DataInputStream, IOException}
import java.nio.charset.StandardCharsets

/** Pure-Scala reader for HDF5 ROOT-GROUP ATTRIBUTES — the subset a
  * `file_type="netcdf4"` granule ingest actually consumes (the
  * reference opens granules with netcdf4, i.e. HDF5-backed files:
  * avhrr recipe.py:120,126; insitu recipe.py:153,160 — and reads only
  * global attrs, recipe.py:46-63). Implements the publicly documented
  * HDF5 File Format Specification far enough for that job:
  *
  *   superblock v0 / v2 / v3  →  root object header address
  *   object header v1 (+ continuations) and v2 "OHDR" (+ "OCHK")
  *   attribute messages v1 / v2 / v3
  *   datatypes: fixed-point, IEEE float, fixed string, vlen string
  *     (global-heap backed — how the netcdf C library stores
  *     NC_STRING attrs; NC_CHAR attrs are fixed strings)
  *   dataspaces: scalar and simple-1D
  *
  * Everything else (B-trees, chunked data, filters, groups below
  * root) is out of scope on purpose: granule METADATA lives in the
  * root header, so this reader costs one bounded sequential probe of
  * the file head — no library, no random I/O at 100 TB listing scale.
  *
  * Unknown versions/classes raise IOException with a precise message:
  * the GranuleSource quarantine path records the reason per file
  * instead of killing the job. Checksums are not verified (corruption
  * surfaces as a bounds error or a quarantined parse, same outcome).
  *
  * All superblock/message integers are little-endian; data endianness
  * comes from the datatype bit field (big-endian data is rejected —
  * netcdf-c writes little-endian on every mainstream platform).
  */
object Hdf5Header {

  private[ingest] val SIGNATURE: Array[Byte] =
    Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Probe cap: the root object header + its heaps sit at the head of
    * netcdf-written files; a reference past the cap quarantines the
    * granule rather than buffering an entire 100 MB payload. */
  private val MAX_PROBE = 4 << 20

  private val UNDEF = -1L // 0xFFFF_FFFF_FFFF_FFFF

  def isHdf5Magic(first: Array[Byte]): Boolean =
    first.length >= 8 && SIGNATURE.indices.forall(i => first(i) == SIGNATURE(i))

  /** Bounded little-endian view over the probed file head. Every read
    * is range-checked so corrupt offsets surface as the quarantinable
    * IOException, never as AIOOBE/OOM (same discipline as
    * NetcdfClassic.boundedCount). */
  private final class Buf(val b: Array[Byte]) {
    def len: Int = b.length
    private def check(o: Long, n: Int): Unit =
      if (o < 0 || n < 0 || o + n > len)
        throw new IOException(
          s"HDF5 reference beyond ${len}-byte probe (offset $o, need $n)")
    def u8(o: Long): Int = { check(o, 1); b(o.toInt) & 0xff }
    def u16(o: Long): Int = { check(o, 2); (b(o.toInt) & 0xff) |
      ((b(o.toInt + 1) & 0xff) << 8) }
    def u32(o: Long): Long = { check(o, 4); u16(o).toLong |
      (u16(o + 2).toLong << 16) }
    def u64(o: Long): Long = { check(o, 8); u32(o) | (u32(o + 4) << 32) }
    def uint(o: Long, width: Int): Long = width match {
      case 1 => u8(o).toLong
      case 2 => u16(o).toLong
      case 4 => u32(o)
      case 8 => u64(o)
      case w => throw new IOException(s"unsupported HDF5 field width $w")
    }
    def bytes(o: Long, n: Int): Array[Byte] = {
      check(o, n)
      java.util.Arrays.copyOfRange(b, o.toInt, o.toInt + n)
    }
  }

  /** Read the file's root-group attributes, rendered to strings with
    * the same conventions as NetcdfClassic (strings raw, numerics
    * comma-joined) so ItemAssembly consumes both formats identically. */
  def readRootAttrs(in: DataInputStream): Map[String, String] =
    readRootAttrs(readUpTo(in, MAX_PROBE))

  def readRootAttrs(head: Array[Byte]): Map[String, String] = {
    val buf = new Buf(head)
    if (!isHdf5Magic(head))
      throw new IOException("not an HDF5 file (bad signature)")
    val rootAddr = buf.u8(8) match {
      case 0 =>
        requireWidths(buf.u8(13), buf.u8(14))
        // v0: fixed prefix (56 bytes) then the root symbol table
        // entry: link name offset (8) + OBJECT HEADER ADDRESS
        buf.u64(64)
      case v @ (2 | 3) =>
        requireWidths(buf.u8(9), buf.u8(10))
        // v2/v3: base(12) + extension(20) + eof(28) + ROOT ADDR(36)
        val _ = v
        buf.u64(36)
      case v =>
        throw new IOException(s"unsupported HDF5 superblock version $v")
    }
    if (rootAddr == UNDEF)
      throw new IOException("HDF5 root object header address undefined")
    messagesOf(buf, rootAddr)
      .filter(_.msgType == MSG_ATTRIBUTE)
      .map(m => parseAttribute(buf, m.off, m.size))
      .toMap
  }

  private def requireWidths(offsets: Int, lengths: Int): Unit =
    if (offsets != 8 || lengths != 8)
      throw new IOException(
        s"unsupported HDF5 offset/length widths $offsets/$lengths (need 8/8)")

  private val MSG_ATTRIBUTE = 0x000C
  private val MSG_CONTINUATION = 0x0010

  private case class Msg(msgType: Int, off: Long, size: Int)

  /** All header messages of the object at `addr`, following
    * continuation blocks, v1 and v2 framing. */
  private def messagesOf(buf: Buf, addr: Long): Seq[Msg] = {
    if (buf.u8(addr) == 1) messagesV1(buf, addr)
    else if (new String(buf.bytes(addr, 4), StandardCharsets.US_ASCII) == "OHDR")
      messagesV2(buf, addr)
    else throw new IOException(
      s"unrecognized HDF5 object header at offset $addr")
  }

  private def messagesV1(buf: Buf, addr: Long): Seq[Msg] = {
    val totalMsgs = buf.u16(addr + 2)
    val chunk0Size = buf.u32(addr + 8)
    val out = Seq.newBuilder[Msg]
    var seen = 0
    // (blockStart, blockSize); v1 prefix is 12 bytes + 4 pad so chunk
    // 0's messages begin 8-byte aligned at addr+16
    var blocks = List((addr + 16, chunk0Size))
    while (blocks.nonEmpty && seen < totalMsgs) {
      val (start, size) = blocks.head
      blocks = blocks.tail
      var o = start
      val end = start + size
      while (o + 8 <= end && seen < totalMsgs) {
        val t = buf.u16(o)
        val sz = buf.u16(o + 2)
        val dataOff = o + 8
        if (dataOff + sz > end)
          throw new IOException(
            s"HDF5 v1 message overruns its header block at offset $o")
        if (t == MSG_CONTINUATION)
          blocks ::= ((buf.u64(dataOff), buf.u64(dataOff + 8)))
        else out += Msg(t, dataOff, sz)
        seen += 1
        o = dataOff + sz
      }
    }
    if (seen < totalMsgs)
      throw new IOException(
        s"HDF5 v1 object header claims $totalMsgs messages, found $seen")
    out.result()
  }

  private def messagesV2(buf: Buf, addr: Long): Seq[Msg] = {
    if (buf.u8(addr + 4) != 2)
      throw new IOException("unsupported HDF5 v2 object header version")
    val flags = buf.u8(addr + 5)
    var o = addr + 6
    if ((flags & 0x20) != 0) o += 16 // access/mod/change/birth times
    if ((flags & 0x10) != 0) o += 4 // non-default attr phase change
    val chunkSizeWidth = 1 << (flags & 0x03)
    val chunk0Size = buf.uint(o, chunkSizeWidth)
    o += chunkSizeWidth
    val creationOrder = (flags & 0x04) != 0
    val out = Seq.newBuilder[Msg]
    // v2 message framing: type(1) size(2) flags(1) [order(2)]; each
    // block ends with a 4-byte checksum (not verified)
    var blocks = List((o, chunk0Size))
    while (blocks.nonEmpty) {
      val (start, size) = blocks.head
      blocks = blocks.tail
      var p = start
      val end = start + size - 4 // trailing checksum
      val msgHeader = if (creationOrder) 6 else 4
      while (p + msgHeader <= end) {
        val t = buf.u8(p)
        val sz = buf.u16(p + 1)
        val dataOff = p + msgHeader
        if (dataOff + sz > end)
          throw new IOException(
            s"HDF5 v2 message overruns its header block at offset $p")
        if (t == MSG_CONTINUATION) {
          // continuation block: "OCHK" signature + messages + checksum
          val contAddr = buf.u64(dataOff)
          val contLen = buf.u64(dataOff + 8)
          if (new String(buf.bytes(contAddr, 4),
              StandardCharsets.US_ASCII) != "OCHK")
            throw new IOException(
              s"HDF5 continuation block at $contAddr lacks OCHK signature")
          blocks ::= ((contAddr + 4, contLen - 4))
        } else if (t != 0) out += Msg(t, dataOff, sz)
        p = dataOff + sz
      }
    }
    out.result()
  }

  // ---- attribute message ----

  private def pad8(n: Long): Long = (n + 7) & ~7L

  private def parseAttribute(
      buf: Buf, off: Long, size: Int): (String, String) = {
    val version = buf.u8(off)
    val (nameOff, nameSize, dtSize, dsSize, padded) = version match {
      case 1 =>
        (off + 8, buf.u16(off + 2), buf.u16(off + 4), buf.u16(off + 6), true)
      case 2 =>
        if ((buf.u8(off + 1) & 0x03) != 0)
          throw new IOException("shared attribute datatype/dataspace " +
            "unsupported in HDF5 header reader")
        (off + 8, buf.u16(off + 2), buf.u16(off + 4), buf.u16(off + 6), false)
      case 3 =>
        if ((buf.u8(off + 1) & 0x03) != 0)
          throw new IOException("shared attribute datatype/dataspace " +
            "unsupported in HDF5 header reader")
        // +1: the name-character-set-encoding byte
        (off + 9, buf.u16(off + 2), buf.u16(off + 4), buf.u16(off + 6), false)
      case v =>
        throw new IOException(s"unsupported HDF5 attribute version $v")
    }
    def span(n: Int): Long = if (padded) pad8(n.toLong) else n.toLong
    val name = cString(buf.bytes(nameOff, nameSize))
    val dtOff = nameOff + span(nameSize)
    val dsOff = dtOff + span(dtSize)
    val dataOff = dsOff + span(dsSize)
    val count = dataspaceElems(buf, dsOff)
    val _ = size
    name -> decodeValues(buf, dtOff, dataOff, count)
  }

  /** Scalar dataspace ⇒ 1 element; simple 1-D ⇒ dim0. Higher ranks
    * never occur for granule metadata attrs. */
  private def dataspaceElems(buf: Buf, off: Long): Long = {
    val version = buf.u8(off)
    val rank = buf.u8(off + 1)
    val dimsOff = version match {
      case 1 => off + 8
      case 2 =>
        if (buf.u8(off + 3) == 2) // type: 0=scalar, 1=simple, 2=null
          throw new IOException("HDF5 null dataspace attribute")
        off + 4
      case v => throw new IOException(s"unsupported HDF5 dataspace version $v")
    }
    rank match {
      case 0 => 1L
      case 1 => buf.u64(dimsOff)
      case r => throw new IOException(
        s"rank-$r attribute dataspace unsupported (granule attrs are " +
          "scalar or 1-D)")
    }
  }

  // ---- datatype + data ----

  private def decodeValues(
      buf: Buf, dtOff: Long, dataOff: Long, count: Long): String = {
    if (count < 0 || count > (1 << 20))
      throw new IOException(s"attr element count $count out of bounds")
    val classV = buf.u8(dtOff)
    val cls = classV & 0x0f
    val bits0 = buf.u8(dtOff + 1)
    val elemSize = buf.u32(dtOff + 4)
    if (elemSize <= 0 || elemSize * count > (1 << 20))
      throw new IOException(
        s"attr value of ${elemSize * count} bytes exceeds header bound")
    val n = count.toInt
    val sz = elemSize.toInt
    cls match {
      case 3 => // fixed string: the whole buffer is the value
        cString(buf.bytes(dataOff, sz * n))
      case 0 => // fixed-point
        if ((bits0 & 0x01) != 0)
          throw new IOException("big-endian HDF5 integer attrs unsupported")
        val signed = (bits0 & 0x08) != 0
        (0 until n).map { i =>
          val raw = buf.uint(dataOff + i.toLong * sz, sz)
          val v =
            if (signed) sz match {
              case 1 => raw.toByte.toLong
              case 2 => raw.toShort.toLong
              case 4 => raw.toInt.toLong
              case _ => raw
            } else raw
          if (!signed && sz == 8) java.lang.Long.toUnsignedString(v)
          else v.toString
        }.mkString(", ")
      case 1 => // IEEE float
        if ((bits0 & 0x01) != 0)
          throw new IOException("big-endian HDF5 float attrs unsupported")
        (0 until n).map { i =>
          sz match {
            case 4 => java.lang.Float
              .intBitsToFloat(buf.u32(dataOff + i.toLong * 4).toInt).toString
            case 8 => java.lang.Double
              .longBitsToDouble(buf.u64(dataOff + i.toLong * 8)).toString
            case w => throw new IOException(s"unsupported HDF5 float width $w")
          }
        }.mkString(", ")
      case 9 => // variable-length
        if ((bits0 & 0x0f) != 1)
          throw new IOException("vlen SEQUENCE attrs unsupported (strings only)")
        // each element: length(4) + global heap address(8) + index(4)
        (0 until n).map { i =>
          val eo = dataOff + i.toLong * 16
          val len = buf.u32(eo).toInt
          val heapAddr = buf.u64(eo + 4)
          val heapIdx = buf.u32(eo + 12).toInt
          new String(globalHeapObject(buf, heapAddr, heapIdx, len),
            StandardCharsets.UTF_8)
        }.mkString(", ")
      case c => throw new IOException(
        s"unsupported HDF5 attr datatype class $c")
    }
  }

  /** Fetch object `idx` from the global heap collection at `addr`
    * ("GCOL"): header(16) then objects of (index u16, refcount u16,
    * reserved u32, size u64, data pad-8); index 0 terminates. */
  private def globalHeapObject(
      buf: Buf, addr: Long, idx: Int, len: Int): Array[Byte] = {
    if (new String(buf.bytes(addr, 4), StandardCharsets.US_ASCII) != "GCOL")
      throw new IOException(s"no GCOL global heap at offset $addr")
    if (buf.u8(addr + 4) != 1)
      throw new IOException("unsupported global heap version")
    val end = addr + buf.u64(addr + 8)
    var o = addr + 16
    while (o + 16 <= end) {
      val objIdx = buf.u16(o)
      val objSize = buf.u64(o + 8)
      if (objIdx == idx) {
        if (len > objSize)
          throw new IOException(
            s"vlen length $len exceeds heap object size $objSize")
        return buf.bytes(o + 16, len)
      }
      if (objIdx == 0) // free space: terminates the object walk
        throw new IOException(s"global heap object $idx not found at $addr")
      o += 16 + pad8(objSize)
    }
    throw new IOException(s"global heap object $idx not found at $addr")
  }

  private def cString(bytes: Array[Byte]): String = {
    val nul = bytes.indexOf(0.toByte)
    new String(bytes, 0, if (nul < 0) bytes.length else nul,
      StandardCharsets.UTF_8)
  }

  private def readUpTo(in: DataInputStream, max: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var total = 0
    var read = in.read(buf)
    while (read > 0 && total < max) {
      val take = math.min(read, max - total)
      out.write(buf, 0, take)
      total += take
      read = if (total < max) in.read(buf) else -1
    }
    out.toByteArray
  }

  // ---- fixture writer (reader's inverse, like NetcdfClassic.buildHeader) ----

  /** Serialize a minimal-but-valid HDF5 file holding the given root
    * attributes: superblock v0 → v1 object header → v1 attribute
    * messages. `vlenStrings=true` stores string attrs the way netcdf-c
    * stores NC_STRING (vlen + global heap) instead of NC_CHAR (fixed
    * string) — both paths the reader must handle. Checksums absent
    * (v0/v1 structures carry none). */
  def buildFile(
      attrs: Seq[(String, NetcdfClassic.AttrValue)],
      vlenStrings: Boolean = false): Array[Byte] = {
    import NetcdfClassic._
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = { u16(v.toInt); u16((v >> 16).toInt) }
    def u64(v: Long): Unit = { u32(v); u32(v >> 32) }
    def raw(b: Array[Byte]): Unit = bos.write(b)
    def padTo8(n: Int): Unit = (0 until ((8 - n % 8) % 8)).foreach(_ => u8(0))

    // -- datatype/dataspace/data encodings per attr value --
    def dtString(len: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(0x13.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
      b.putInt(len)
      b.array()
    }
    def dtVlenString: Array[Byte] = {
      // class 9 v1, type=string(1); base type: the 8-byte fixed-string
      val b = java.nio.ByteBuffer.allocate(16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(0x19.toByte); b.put(0x01.toByte); b.put(0.toByte); b.put(0.toByte)
      b.putInt(16) // element size on disk: len + heap addr + index
      b.put(dtString(1))
      b.array()
    }
    def dtFixed(size: Int, signed: Boolean): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(0x10.toByte); b.put((if (signed) 0x08 else 0x00).toByte)
      b.put(0.toByte); b.put(0.toByte)
      b.putInt(size)
      b.putShort(0); b.putShort((size * 8).toShort)
      b.array()
    }
    def dtFloat(size: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(20)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(0x11.toByte); b.put(0x20.toByte)
      b.put((if (size == 8) 63 else 31).toByte); b.put(0.toByte)
      b.putInt(size)
      b.putShort(0); b.putShort((size * 8).toShort)
      if (size == 8) { b.put(52.toByte); b.put(11.toByte); b.put(0.toByte)
        b.put(52.toByte); b.putInt(1023) }
      else { b.put(23.toByte); b.put(8.toByte); b.put(0.toByte)
        b.put(23.toByte); b.putInt(127) }
      b.array()
    }
    def dsScalar: Array[Byte] = Array[Byte](1, 0, 0, 0, 0, 0, 0, 0)
    def ds1d(n: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte); b.put(1.toByte); b.put(0.toByte)
      (0 until 5).foreach(_ => b.put(0.toByte))
      b.putLong(n)
      b.array()
    }
    def le(width: Int, v: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(width)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      width match {
        case 1 => b.put(v.toByte)
        case 2 => b.putShort(v.toShort)
        case 4 => b.putInt(v.toInt)
        case 8 => b.putLong(v)
      }
      b.array()
    }

    // -- global heap for vlen strings (placed at offset 96, BEFORE the
    // object header, so heap addresses are known when messages build) --
    val HEAP_ADDR = 96L
    val vlenPayloads: Seq[Array[Byte]] =
      if (!vlenStrings) Seq.empty
      else attrs.collect { case (_, CharAttr(s)) =>
        s.getBytes(StandardCharsets.UTF_8) }
    val heapBytes: Array[Byte] = if (vlenPayloads.isEmpty) Array.empty else {
      val hb = new java.io.ByteArrayOutputStream()
      def h8(v: Int): Unit = hb.write(v & 0xff)
      def h16(v: Int): Unit = { h8(v); h8(v >> 8) }
      def h32(v: Long): Unit = { h16(v.toInt); h16((v >> 16).toInt) }
      def h64(v: Long): Unit = { h32(v); h32(v >> 32) }
      val objBytes = vlenPayloads.map(p => 16 + ((p.length + 7) & ~7)).sum
      val total = 16L + objBytes + 16L // header + objects + free-space obj
      hb.write("GCOL".getBytes(StandardCharsets.US_ASCII))
      h8(1); h8(0); h8(0); h8(0)
      h64(total)
      vlenPayloads.zipWithIndex.foreach { case (p, i) =>
        h16(i + 1); h16(1); h32(0L); h64(p.length.toLong)
        hb.write(p)
        (0 until ((8 - p.length % 8) % 8)).foreach(_ => h8(0))
      }
      h16(0); h16(0); h32(0L); h64(16L) // free-space terminator
      hb.toByteArray
    }
    val objHeaderAddr = HEAP_ADDR + heapBytes.length

    // -- attribute messages --
    var vlenIdx = 0
    val msgs: Seq[Array[Byte]] = attrs.map { case (attrName, value) =>
      val (dt, ds, data) = value match {
        case CharAttr(s) =>
          val b = s.getBytes(StandardCharsets.UTF_8)
          if (vlenStrings) {
            vlenIdx += 1
            val d = java.nio.ByteBuffer.allocate(16)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            d.putInt(b.length); d.putLong(HEAP_ADDR); d.putInt(vlenIdx)
            (dtVlenString, dsScalar, d.array())
          } else (dtString(b.length), dsScalar, b)
        case DoubleAttr(d) =>
          (dtFloat(8), dsScalar,
            le(8, java.lang.Double.doubleToLongBits(d)))
        case FloatAttr(f) =>
          (dtFloat(4), dsScalar,
            le(4, java.lang.Float.floatToIntBits(f).toLong))
        case IntAttr(is) =>
          (dtFixed(4, signed = true), ds1d(is.length.toLong),
            is.toArray.flatMap(i => le(4, i.toLong)))
        case ShortAttr(sh) =>
          (dtFixed(2, signed = true), dsScalar, le(2, sh.toLong))
        case LongAttr(ls) =>
          (dtFixed(8, signed = true), ds1d(ls.length.toLong),
            ls.toArray.flatMap(l => le(8, l)))
        case UByteAttr(bs) =>
          (dtFixed(1, signed = false), ds1d(bs.length.toLong),
            bs.toArray.flatMap(v => le(1, v.toLong)))
      }
      val nameBytes = attrName.getBytes(StandardCharsets.UTF_8) :+ 0.toByte
      val mb = new java.io.ByteArrayOutputStream()
      def m8(v: Int): Unit = mb.write(v & 0xff)
      def m16(v: Int): Unit = { m8(v); m8(v >> 8) }
      def mPad8(): Unit =
        (0 until ((8 - mb.size() % 8) % 8)).foreach(_ => m8(0))
      m8(1); m8(0) // attribute message v1
      m16(nameBytes.length); m16(dt.length); m16(ds.length)
      mb.write(nameBytes); mPad8()
      mb.write(dt); mPad8()
      mb.write(ds); mPad8()
      mb.write(data); mPad8()
      mb.toByteArray
    }
    val msgBytes = msgs.map(m => 8 + m.length).sum

    // -- superblock v0 --
    raw(SIGNATURE)
    u8(0); u8(0); u8(0); u8(0); u8(0) // versions + reserved
    u8(8); u8(8); u8(0) // offset/length widths
    u16(4); u16(16) // group leaf / internal K
    u32(0L) // file consistency flags
    u64(0L) // base address
    u64(UNDEF) // free space address
    u64(objHeaderAddr + 16 + msgBytes) // end of file
    u64(UNDEF) // driver info
    // root symbol table entry
    u64(0L) // link name offset
    u64(objHeaderAddr)
    u32(0L); u32(0L) // cache type + reserved
    (0 until 16).foreach(_ => u8(0)) // scratch
    raw(heapBytes)
    // -- v1 object header: 12-byte prefix + 4 pad, then messages --
    u8(1); u8(0)
    u16(msgs.length)
    u32(1L) // reference count
    u32(msgBytes.toLong)
    u32(0L) // pad to 8-byte alignment
    msgs.foreach { m =>
      u16(MSG_ATTRIBUTE); u16(m.length); u8(0); u8(0); u8(0); u8(0)
      raw(m)
    }
    bos.toByteArray
  }
}
