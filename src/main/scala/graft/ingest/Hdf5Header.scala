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
  * plus whole-file DATASET decode (Hdf5File) for the insitu vertical.
  *
  * Support matrix (each "no" fails with a distinguishable IOException
  * that the quarantine path records per file — pinned in Hdf5Spec):
  *
  *   root-group links : symbol-table (netcdf-c default)  yes
  *                      compact v2 link messages          yes
  *                      dense (fractal-heap, libhdf5
  *                        1.10+ groups with >8 links)     yes — managed
  *                        unfiltered objects, root direct block or one
  *                        indirect level, name-index v2 B-tree depth
  *                        ≤ 1 (huge/tiny IDs, filtered heaps, deeper
  *                        trees: no, loud)
  *   chunk filters    : shuffle, deflate                  yes
  *                      fletcher32 (verified + stripped)  yes
  *                      szip (CCSDS-Rice, 8/16/32-bit
  *                        LSB samples, NN + EC — see the
  *                        [[Szip]] matrix for sub-limits)  yes
  *                      scaleoffset / nbit / others       no, loud
  *   data endianness  : little-endian                     yes
  *                      big-endian                        no, loud
  *   groups below root, vlen/compound datasets            no, loud
  *
  * The attrs-only probe stays a bounded sequential read of the file
  * head — no library, no random I/O at 100 TB listing scale.
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
      // `o > len - n`, NOT `o + n > len`: a crafted offset near
      // Long.MaxValue overflows the sum negative, slips the check, and
      // dies as AIOOBE — which escapes the IOException-only quarantine
      if (o < 0 || n < 0 || o > len.toLong - n)
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
      case w if w > 0 && w < 8 => // odd widths: 3-byte B-tree record
        check(o, w) //   counts, 5-byte heap offsets, …
        (0 until w).foldLeft(0L)((acc, i) =>
          acc | ((b((o + i).toInt) & 0xFFL) << (8 * i)))
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
    messagesOf(buf, rootAddrOf(buf))
      .filter(_.msgType == MSG_ATTRIBUTE)
      .map(m => parseAttribute(buf, m.off, m.size))
      .toMap
  }

  /** Superblock → root object header address (v0 / v2 / v3). */
  private def rootAddrOf(buf: Buf): Long = {
    if (!isHdf5Magic(buf.b))
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
    rootAddr
  }

  private def requireWidths(offsets: Int, lengths: Int): Unit =
    if (offsets != 8 || lengths != 8)
      throw new IOException(
        s"unsupported HDF5 offset/length widths $offsets/$lengths (need 8/8)")

  private val MSG_DATASPACE = 0x0001
  private val MSG_LINK_INFO = 0x0002
  private val MSG_DATATYPE = 0x0003
  private val MSG_FILL = 0x0005
  private val MSG_LINK = 0x0006
  private val MSG_LAYOUT = 0x0008
  private val MSG_FILTER = 0x000B
  private val MSG_ATTRIBUTE = 0x000C
  private val MSG_CONTINUATION = 0x0010
  private val MSG_SYMBOL_TABLE = 0x0011

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

  // ---- datasets: netcdf4 VARIABLES, not just attrs ----
  //
  // The insitu recipe reads 1-D coordinate variables out of its
  // netcdf4 granules (extract_geometry(ds, x="LONGITUDE",
  // y="LATITUDE", time="TIME"), insitu recipe.py:91-93) — attrs alone
  // don't cover it. This section implements the additional format
  // surface that netcdf-c-written variables need: root-group child
  // enumeration (symbol-table B-tree v1 + local heap, or v2 link
  // messages), dataset object headers (dataspace/datatype/fill/
  // layout/filter-pipeline), contiguous + chunked (B-tree v1 indexed)
  // raw data, and the two filters netcdf-c applies (shuffle,
  // deflate — inflated with java.util.zip, no native lib).

  /** One decoded variable: row-major numeric data plus its attrs. */
  case class Hdf5Dataset(
      name: String,
      dims: Seq[Long],
      attrs: Map[String, String],
      data: Array[Double])

  /** Whole-file random-access view (datasets live past the head
    * probe, so this takes the full granule bytes — bounded by the
    * caller; granules are MBs). */
  final class Hdf5File(bytes: Array[Byte]) {
    private val buf = new Buf(bytes)
    private val rootMsgs = messagesOf(buf, rootAddrOf(buf))

    val rootAttrs: Map[String, String] = rootMsgs
      .filter(_.msgType == MSG_ATTRIBUTE)
      .map(m => parseAttribute(buf, m.off, m.size))
      .toMap

    /** Root-group children in file order: (name, object header addr). */
    private val children: Seq[(String, Long)] = childrenOf(buf, rootMsgs)

    def datasetNames: Seq[String] = children.map(_._1)

    def dataset(name: String): Hdf5Dataset =
      children.find(_._1 == name) match {
        case None => throw new IOException(
          s"no dataset '$name' in root group (have: ${
            children.map(_._1).mkString(", ")})")
        case Some((_, addr)) => readDataset(buf, name, addr)
      }
  }

  def readFile(bytes: Array[Byte]): Hdf5File = new Hdf5File(bytes)

  // -- root-group children --

  private def childrenOf(buf: Buf, msgs: Seq[Msg]): Seq[(String, Long)] = {
    val links = msgs.filter(_.msgType == MSG_LINK)
      .map(m => parseLink(buf, m.off))
    if (links.nonEmpty) links
    else msgs.find(_.msgType == MSG_SYMBOL_TABLE) match {
      case Some(st) =>
        symbolTableChildren(buf, buf.u64(st.off), buf.u64(st.off + 8))
      case None =>
        // v2 headers spill >8 links into DENSE storage: link messages
        // live as managed objects in a fractal heap, enumerated via
        // the name-index v2 B-tree (the layout libhdf5 1.10+ writes
        // once a group crosses the compact-link threshold)
        msgs.find(_.msgType == MSG_LINK_INFO) match {
          case Some(m) =>
            val base = m.off + (if ((buf.u8(m.off + 1) & 0x01) != 0) 10 else 2)
            val heapAddr = buf.u64(base)
            val nameBtree = buf.u64(base + 8)
            if (heapAddr == UNDEF) Seq.empty
            else denseGroupChildren(buf, heapAddr, nameBtree)
          case None => Seq.empty
        }
    }
  }

  /** Dense (fractal-heap) link storage: every link rides as a managed
    * object in the heap; the name-index v2 B-tree's records carry the
    * heap IDs. Listing walks ALL records (internal nodes included —
    * a v2 B-tree stores records at every level) and resolves each
    * heap ID to its link message; the name hash is never needed for
    * enumeration. Supports what netcdf-style files contain: unfiltered
    * managed objects, root direct block or one level of indirect
    * blocks, B-tree depth ≤ 1 — everything else fails loudly. */
  private def denseGroupChildren(
      buf: Buf, heapAddr: Long, btreeAddr: Long): Seq[(String, Long)] = {
    // ---- fractal heap header (FRHP) ----
    if (new String(buf.bytes(heapAddr, 4), StandardCharsets.US_ASCII) != "FRHP")
      throw new IOException(s"no fractal heap at offset $heapAddr")
    if (buf.u8(heapAddr + 4) != 0)
      throw new IOException(
        s"unsupported fractal heap version ${buf.u8(heapAddr + 4)}")
    val idLen = buf.u16(heapAddr + 5)
    val ioFiltersLen = buf.u16(heapAddr + 7)
    if (ioFiltersLen != 0)
      throw new IOException("filtered fractal heap unsupported")
    val flags = buf.u8(heapAddr + 9)
    val maxManagedObj = buf.u32(heapAddr + 10)
    val nHuge = buf.u64(heapAddr + 86)
    val nTiny = buf.u64(heapAddr + 102)
    if (nHuge != 0 || nTiny != 0)
      throw new IOException(
        s"huge/tiny fractal-heap objects unsupported ($nHuge huge, $nTiny tiny)")
    val tableWidth = buf.u16(heapAddr + 110)
    val startBlockSize = buf.u64(heapAddr + 112)
    val maxDirectBlockSize = buf.u64(heapAddr + 120)
    val maxHeapBits = buf.u16(heapAddr + 128)
    val rootBlockAddr = buf.u64(heapAddr + 132)
    val currentRowsRoot = buf.u16(heapAddr + 140)
    if (tableWidth <= 0 || startBlockSize <= 0 || maxHeapBits <= 0)
      throw new IOException("corrupt fractal heap geometry")
    def minBytes(v: Long): Int = {
      var n = 1; var x = v >> 8
      while (x != 0) { n += 1; x >>= 8 }
      n
    }
    val offsetBytes = (maxHeapBits + 7) / 8
    val lengthBytes = minBytes(maxManagedObj)
    if (idLen != 1 + offsetBytes + lengthBytes)
      throw new IOException(
        s"fractal heap ID length $idLen != 1+$offsetBytes+$lengthBytes")
    val blockHeaderLen =
      4 + 1 + 8 + offsetBytes + (if ((flags & 0x02) != 0) 4 else 0)

    // ---- direct-block map: heap linear offset → file address ----
    case class DBlock(blockOff: Long, size: Long, fileAddr: Long)
    def rowSize(row: Int): Long =
      if (row < 2) startBlockSize else startBlockSize << (row - 1)
    val blocks: Seq[DBlock] =
      if (currentRowsRoot == 0)
        Seq(DBlock(0L, startBlockSize, rootBlockAddr))
      else {
        if (new String(buf.bytes(rootBlockAddr, 4),
          StandardCharsets.US_ASCII) != "FHIB")
          throw new IOException(
            s"no fractal-heap indirect block at offset $rootBlockAddr")
        val entriesOff = rootBlockAddr + 4 + 1 + 8 + offsetBytes
        var heapOff = 0L
        (0 until currentRowsRoot).flatMap { row =>
          val sz = rowSize(row)
          if (sz > maxDirectBlockSize) throw new IOException(
            "nested indirect fractal-heap blocks unsupported")
          (0 until tableWidth).flatMap { col =>
            val slot = row * tableWidth + col
            val addr = buf.u64(entriesOff + slot.toLong * 8)
            val off = heapOff
            heapOff += sz
            if (addr == UNDEF) None else Some(DBlock(off, sz, addr))
          }
        }
      }
    blocks.foreach { b =>
      if (new String(buf.bytes(b.fileAddr, 4),
        StandardCharsets.US_ASCII) != "FHDB")
        throw new IOException(
          s"no fractal-heap direct block at offset ${b.fileAddr}")
    }
    def objFileOffset(heapOff: Long, objLen: Long): Long = {
      val b = blocks.find(b =>
        heapOff >= b.blockOff && heapOff < b.blockOff + b.size)
        .getOrElse(throw new IOException(
          s"fractal-heap object offset $heapOff outside any direct block" +
            (if (currentRowsRoot == 0)
              " (root direct block assumed Starting Block Size " +
                s"$startBlockSize; a larger reverted root is unsupported)"
            else "")))
      val rel = heapOff - b.blockOff
      if (rel < blockHeaderLen)
        throw new IOException("fractal-heap object inside block header")
      if (objLen <= 0 || rel > b.size - objLen)
        throw new IOException(
          s"fractal-heap object ($objLen bytes at $heapOff) " +
            "overruns its direct block")
      b.fileAddr + rel
    }

    // ---- name-index v2 B-tree (BTHD / BTIN / BTLF) ----
    if (btreeAddr == UNDEF)
      throw new IOException("dense group lacks its name-index v2 B-tree")
    if (new String(buf.bytes(btreeAddr, 4), StandardCharsets.US_ASCII) != "BTHD")
      throw new IOException(s"no v2 B-tree header at offset $btreeAddr")
    val btType = buf.u8(btreeAddr + 5)
    if (btType != 5) // 5 = link-name index
      throw new IOException(s"unexpected v2 B-tree type $btType")
    val nodeSize = buf.u32(btreeAddr + 6)
    val recordSize = buf.u16(btreeAddr + 10)
    val depth = buf.u16(btreeAddr + 12)
    val rootNodeAddr = buf.u64(btreeAddr + 16)
    val nRecRoot = buf.u16(btreeAddr + 24)
    if (recordSize < 5 || recordSize > 64 || nodeSize < 32)
      throw new IOException(
        s"corrupt v2 B-tree geometry: node $nodeSize record $recordSize")
    // record = name hash (4) + heap ID (recordSize - 4)
    def recordsOf(addr: Long, n: Int, sig: String): Seq[Long] = {
      if (new String(buf.bytes(addr, 4), StandardCharsets.US_ASCII) != sig)
        throw new IOException(s"no $sig v2 B-tree node at offset $addr")
      (0 until n).map(i => addr + 6 + i.toLong * recordSize)
    }
    val recordOffs: Seq[Long] = depth match {
      case 0 => recordsOf(rootNodeAddr, nRecRoot, "BTLF")
      case 1 =>
        val own = recordsOf(rootNodeAddr, nRecRoot, "BTIN")
        // child pointers follow the records: address + leaf record
        // count stored in the minimum bytes for a full leaf
        val maxLeafRec = (nodeSize - 10) / recordSize
        val nrecBytes = minBytes(maxLeafRec.toLong)
        val ptrOff = rootNodeAddr + 6 + nRecRoot.toLong * recordSize
        val ptrLen = 8L + nrecBytes
        val fromLeaves = (0 to nRecRoot).flatMap { i =>
          val a = buf.u64(ptrOff + i * ptrLen)
          val n = buf.uint(ptrOff + i * ptrLen + 8, nrecBytes).toInt
          recordsOf(a, n, "BTLF")
        }
        own ++ fromLeaves
      case d => throw new IOException(s"v2 B-tree depth $d unsupported")
    }

    // ---- heap IDs → link messages ----
    recordOffs.map { rOff =>
      val idOff = rOff + 4
      val b0 = buf.u8(idOff)
      if (((b0 >> 4) & 0x03) != 0)
        throw new IOException(
          s"non-managed fractal-heap object type ${(b0 >> 4) & 0x03}")
      val heapOff = buf.uint(idOff + 1, offsetBytes)
      val objLen = buf.uint(idOff + 1 + offsetBytes, lengthBytes)
      parseLink(buf, objFileOffset(heapOff, objLen))
    }.sortBy(_._1)
  }

  /** Hard link message v1: name + child object header address. */
  private def parseLink(buf: Buf, off: Long): (String, Long) = {
    if (buf.u8(off) != 1)
      throw new IOException(s"unsupported HDF5 link message version ${buf.u8(off)}")
    val flags = buf.u8(off + 1)
    var o = off + 2
    if ((flags & 0x08) != 0) {
      val t = buf.u8(o); o += 1
      if (t != 0) throw new IOException(
        s"only hard links supported in root group (link type $t)")
    }
    if ((flags & 0x04) != 0) o += 8 // creation order
    if ((flags & 0x10) != 0) o += 1 // charset
    val nameLen = buf.uint(o, 1 << (flags & 0x03))
    o += (1 << (flags & 0x03))
    if (nameLen > (1 << 16))
      throw new IOException(s"link name of $nameLen bytes out of bounds")
    val name = new String(buf.bytes(o, nameLen.toInt), StandardCharsets.UTF_8)
    (name, buf.u64(o + nameLen))
  }

  /** The "earliest format" group: B-tree v1 over SNOD symbol-table
    * nodes, names in the local heap — netcdf-c's default layout. */
  private def symbolTableChildren(
      buf: Buf, btreeAddr: Long, heapAddr: Long): Seq[(String, Long)] = {
    if (new String(buf.bytes(heapAddr, 4), StandardCharsets.US_ASCII) != "HEAP")
      throw new IOException(s"no local heap at offset $heapAddr")
    val dataSeg = buf.u64(heapAddr + 24)
    def walk(addr: Long, depth: Int): Seq[(String, Long)] = {
      if (depth > 32)
        throw new IOException("HDF5 group B-tree deeper than 32 levels")
      if (new String(buf.bytes(addr, 4), StandardCharsets.US_ASCII) != "TREE")
        throw new IOException(s"no B-tree node at offset $addr")
      if (buf.u8(addr + 4) != 0)
        throw new IOException("chunk B-tree node where a group node expected")
      val level = buf.u8(addr + 5)
      val n = buf.u16(addr + 6)
      // header(24) then key0(8) child0(8) key1 child1 … keyN
      (0 until n).flatMap { i =>
        val child = buf.u64(addr + 24 + 8 + i.toLong * 16)
        if (level > 0) walk(child, depth + 1)
        else snodEntries(buf, child, dataSeg)
      }
    }
    walk(btreeAddr, 0)
  }

  private def snodEntries(
      buf: Buf, addr: Long, heapData: Long): Seq[(String, Long)] = {
    if (new String(buf.bytes(addr, 4), StandardCharsets.US_ASCII) != "SNOD")
      throw new IOException(s"no SNOD symbol node at offset $addr")
    val n = buf.u16(addr + 6)
    (0 until n).map { i =>
      val e = addr + 8 + i.toLong * 40
      (cStringAt(buf, heapData + buf.u64(e)), buf.u64(e + 8))
    }
  }

  private def cStringAt(buf: Buf, off: Long): String = {
    var end = off
    while (buf.u8(end) != 0) end += 1 // u8 bounds-checks each step
    new String(buf.bytes(off, (end - off).toInt), StandardCharsets.UTF_8)
  }

  // -- dataset object header → decoded data --

  private case class Dtype(cls: Int, size: Int, signed: Boolean)

  private def parseDtype(buf: Buf, off: Long): Dtype = {
    val cls = buf.u8(off) & 0x0f
    val bits0 = buf.u8(off + 1)
    val size = buf.u32(off + 4)
    if (cls != 0 && cls != 1)
      throw new IOException(
        s"unsupported HDF5 dataset datatype class $cls (numeric only)")
    if ((bits0 & 0x01) != 0)
      throw new IOException("big-endian HDF5 dataset data unsupported")
    if (size < 1 || size > 8)
      throw new IOException(s"unsupported HDF5 element size $size")
    if (cls == 1 && size != 4 && size != 8)
      throw new IOException(s"unsupported HDF5 float width $size")
    Dtype(cls, size.toInt, cls == 1 || (bits0 & 0x08) != 0)
  }

  private def dataspaceDims(buf: Buf, off: Long): Seq[Long] = {
    val version = buf.u8(off)
    val rank = buf.u8(off + 1)
    val dimsOff = version match {
      case 1 => off + 8
      case 2 => off + 4
      case v => throw new IOException(s"unsupported HDF5 dataspace version $v")
    }
    (0 until rank).map(i => buf.u64(dimsOff + i.toLong * 8))
  }

  private sealed trait DataLayout
  private case class Compact(off: Long, size: Int) extends DataLayout
  private case class Contiguous(addr: Long, size: Long) extends DataLayout
  private case class Chunked(btree: Long, chunkDims: Seq[Long], elemSize: Int)
      extends DataLayout

  private def parseLayout(buf: Buf, off: Long): DataLayout = {
    val version = buf.u8(off)
    if (version != 3) throw new IOException(
      s"unsupported HDF5 data layout version $version (netcdf-c writes v3)")
    buf.u8(off + 1) match {
      case 0 => Compact(off + 4, buf.u16(off + 2))
      case 1 => Contiguous(buf.u64(off + 2), buf.u64(off + 10))
      case 2 =>
        val ndims = buf.u8(off + 2) // rank + 1 (trailing element-size dim)
        val btree = buf.u64(off + 3)
        val dims = (0 until ndims - 1).map(i => buf.u32(off + 11 + i.toLong * 4))
        val esz = buf.u32(off + 11 + (ndims - 1).toLong * 4)
        Chunked(btree, dims, esz.toInt)
      case c => throw new IOException(s"unsupported HDF5 layout class $c")
    }
  }

  /** Filter pipeline in application order:
    * (filter id, flags, client data values). */
  private def parseFilters(buf: Buf, off: Long): Seq[(Int, Int, Seq[Long])] = {
    val version = buf.u8(off)
    val n = buf.u8(off + 1)
    var o = version match {
      case 1 => off + 8
      case 2 => off + 2
      case v => throw new IOException(
        s"unsupported HDF5 filter pipeline version $v")
    }
    (0 until n).map { _ =>
      val id = buf.u16(o)
      val hasName = version == 1 || id >= 256
      val nameLen = if (hasName) buf.u16(o + 2) else 0
      val fOff = if (hasName) o + 4 else o + 2
      val flags = buf.u16(fOff)
      val nVals = buf.u16(fOff + 2)
      var p = fOff + 4
      if (nameLen > 0)
        p += (if (version == 1) pad8(nameLen.toLong) else nameLen.toLong)
      val cd = (0 until nVals).map(i => buf.u32(p + 4L * i))
      p += 4L * nVals
      if (version == 1 && nVals % 2 == 1) p += 4
      o = p
      (id, flags, cd)
    }
  }

  private val FILTER_DEFLATE = 1
  private val FILTER_SHUFFLE = 2
  private val FILTER_FLETCHER32 = 3
  private val FILTER_SZIP = 4

  /** HDF5's Fletcher-32 (H5_checksum_fletcher32 in the public HDF5
    * source): data as BIG-endian 16-bit words, partial sums folded
    * every 360 words to defer overflow, an odd trailing byte
    * high-padded, two final folds for remaining carries. */
  private[graft] def fletcher32(data: Array[Byte], len: Int): Long = {
    var sum1 = 0L
    var sum2 = 0L
    var i = 0
    var remaining = len / 2
    while (remaining > 0) {
      var t = math.min(360, remaining)
      remaining -= t
      while (t > 0) {
        sum1 += (((data(i) & 0xff) << 8) | (data(i + 1) & 0xff)).toLong
        sum2 += sum1
        i += 2
        t -= 1
      }
      sum1 = (sum1 & 0xffff) + (sum1 >> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    }
    if (len % 2 == 1) {
      sum1 += ((data(len - 1) & 0xff) << 8).toLong
      sum2 += sum1
    }
    sum1 = (sum1 & 0xffff) + (sum1 >> 16)
    sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    sum1 = (sum1 & 0xffff) + (sum1 >> 16)
    sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    (sum2 << 16) | sum1
  }

  /** Undo the fletcher32 filter: verify the little-endian 4-byte
    * checksum appended to the chunk, strip it. A mismatch is chunk
    * corruption — quarantine the granule, don't decode garbage. */
  private def defletcher(data: Array[Byte]): Array[Byte] = {
    if (data.length < 4)
      throw new IOException("fletcher32 chunk shorter than its checksum")
    val n = data.length - 4
    val stored = (data(n) & 0xffL) | ((data(n + 1) & 0xffL) << 8) |
      ((data(n + 2) & 0xffL) << 16) | ((data(n + 3) & 0xffL) << 24)
    val computed = fletcher32(data, n)
    if (computed != stored)
      throw new IOException(
        f"fletcher32 checksum mismatch: stored 0x$stored%08x, computed 0x$computed%08x")
    java.util.Arrays.copyOf(data, n)
  }

  /** Undefined data address ⇒ never written ⇒ fill value (netcdf's
    * lazy allocation); absent fill message ⇒ NaN for floats, 0 for
    * ints (netcdf defaults surface through _FillValue attrs anyway). */
  private def parseFill(buf: Buf, off: Long, dt: Dtype): Double = {
    val default = if (dt.cls == 1) Double.NaN else 0.0
    buf.u8(off) match {
      case v @ (1 | 2) =>
        val _ = v
        if (buf.u8(off + 3) != 1) default
        else {
          val sz = buf.u32(off + 4).toInt
          if (sz < dt.size) default
          else decodeElems(buf.bytes(off + 8, dt.size), dt, 1)(0)
        }
      case 3 =>
        if ((buf.u8(off + 1) & 0x20) == 0) default
        else {
          val sz = buf.u32(off + 2).toInt
          if (sz < dt.size) default
          else decodeElems(buf.bytes(off + 6, dt.size), dt, 1)(0)
        }
      case v => throw new IOException(s"unsupported HDF5 fill version $v")
    }
  }

  /** Little-endian numeric block → doubles. */
  private def decodeElems(b: Array[Byte], dt: Dtype, n: Int): Array[Double] = {
    val out = new Array[Double](n)
    val bb = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      out(i) = (dt.cls, dt.size) match {
        case (1, 4) => bb.getFloat(i * 4).toDouble
        case (1, 8) => bb.getDouble(i * 8)
        case (0, 1) =>
          if (dt.signed) bb.get(i).toDouble else (bb.get(i) & 0xff).toDouble
        case (0, 2) => if (dt.signed) bb.getShort(i * 2).toDouble
          else (bb.getShort(i * 2) & 0xffff).toDouble
        case (0, 4) => if (dt.signed) bb.getInt(i * 4).toDouble
          else (bb.getInt(i * 4).toLong & 0xffffffffL).toDouble
        case (0, 8) => bb.getLong(i * 8).toDouble
        case (c, s) =>
          throw new IOException(s"unsupported dataset element class $c size $s")
      }
      i += 1
    }
    out
  }

  /** Elements cap: 16 M (128 MB as doubles) — a granule VARIABLE is
    * bounded (the largest reference field, 409×5680 SST, is 2.3 M);
    * anything bigger in a header is corruption, not data. */
  private val MAX_ELEMS = 1 << 24

  private def readDataset(buf: Buf, name: String, addr: Long): Hdf5Dataset = {
    val msgs = messagesOf(buf, addr)
    def find(t: Int, what: String): Msg = msgs.find(_.msgType == t)
      .getOrElse(throw new IOException(s"dataset '$name' lacks $what message"))
    val attrs = msgs.filter(_.msgType == MSG_ATTRIBUTE)
      .map(m => parseAttribute(buf, m.off, m.size)).toMap
    val dims = dataspaceDims(buf, find(MSG_DATASPACE, "dataspace").off)
    val dt = parseDtype(buf, find(MSG_DATATYPE, "datatype").off)
    val total = dims.foldLeft(1L)(_ * _)
    if (total < 0 || total > MAX_ELEMS)
      throw new IOException(s"dataset '$name' claims $total elements (cap $MAX_ELEMS)")
    val fill = msgs.find(_.msgType == MSG_FILL)
      .map(m => parseFill(buf, m.off, dt))
      .getOrElse(if (dt.cls == 1) Double.NaN else 0.0)
    val filters = msgs.find(_.msgType == MSG_FILTER)
      .map(m => parseFilters(buf, m.off)).getOrElse(Seq.empty)
    filters.foreach { case (id, _, cd) =>
      if (id != FILTER_DEFLATE && id != FILTER_SHUFFLE &&
        id != FILTER_FLETCHER32 && id != FILTER_SZIP)
        throw new IOException(
          s"unsupported HDF5 filter $id on dataset '$name' " +
            "(shuffle + deflate + fletcher32 + szip only)")
      if (id == FILTER_SZIP && cd.length < 4)
        throw new IOException(
          s"szip filter on dataset '$name' carries ${cd.length} " +
            "client values (need options/bpp/ppb/pps)")
    }
    val out = Array.fill(total.toInt)(fill)
    parseLayout(buf, find(MSG_LAYOUT, "layout").off) match {
      case layout @ (Compact(_, _) | Contiguous(_, _)) if filters.nonEmpty =>
        // HDF5 only applies filters to chunked layouts; a pipeline on
        // a compact/contiguous dataset is a corrupt or crafted file.
        // Copying the bytes as-if-raw would decode compressed data as
        // sample values — loud quarantine, never silent garbage.
        throw new IOException(
          s"dataset '$name' declares a filter pipeline " +
            s"(${filters.map(_._1).mkString(",")}) on a " +
            s"non-chunked ${layout.getClass.getSimpleName} layout")
      case Compact(o, size) =>
        val want = total.toInt * dt.size
        if (size < want)
          throw new IOException(s"compact data of $size bytes < $want")
        System.arraycopy(decodeElems(buf.bytes(o, want), dt, total.toInt),
          0, out, 0, total.toInt)
      case Contiguous(dataAddr, size) =>
        if (dataAddr != UNDEF) { // UNDEF = never allocated ⇒ all fill
          val want = total.toInt * dt.size
          if (size < want)
            throw new IOException(s"contiguous data of $size bytes < $want")
          System.arraycopy(decodeElems(buf.bytes(dataAddr, want), dt,
            total.toInt), 0, out, 0, total.toInt)
        }
      case Chunked(btree, chunkDims, elemSize) =>
        if (elemSize != dt.size)
          throw new IOException(
            s"chunk element size $elemSize != datatype size ${dt.size}")
        if (chunkDims.length != dims.length)
          throw new IOException(
            s"chunk rank ${chunkDims.length} != dataspace rank ${dims.length}")
        if (btree != UNDEF)
          readChunks(buf, name, btree, dims, chunkDims, dt, filters, out)
    }
    Hdf5Dataset(name, dims, attrs, out)
  }

  private def readChunks(buf: Buf, name: String, btreeAddr: Long,
      dims: Seq[Long], chunkDims: Seq[Long], dt: Dtype,
      filters: Seq[(Int, Int, Seq[Long])], out: Array[Double]): Unit = {
    val rank = dims.length
    val chunkElems = chunkDims.foldLeft(1L)(_ * _)
    if (chunkElems <= 0 || chunkElems > MAX_ELEMS)
      throw new IOException(s"chunk of $chunkElems elements out of bounds")
    // row-major strides over the full dataspace and one chunk
    val dimStride = dims.scanRight(1L)(_ * _).tail
    val chunkStride = chunkDims.scanRight(1L)(_ * _).tail
    def walk(addr: Long, depth: Int): Unit = {
      if (depth > 32)
        throw new IOException("HDF5 chunk B-tree deeper than 32 levels")
      if (new String(buf.bytes(addr, 4), StandardCharsets.US_ASCII) != "TREE")
        throw new IOException(s"no chunk B-tree node at offset $addr")
      if (buf.u8(addr + 4) != 1)
        throw new IOException("group B-tree node where a chunk node expected")
      val level = buf.u8(addr + 5)
      val n = buf.u16(addr + 6)
      // key: chunk bytes(4) + filter mask(4) + offsets(8 × (rank+1))
      val keySize = 8L + 8L * (rank + 1)
      (0 until n).foreach { i =>
        val keyOff = addr + 24 + i * (keySize + 8)
        val child = buf.u64(keyOff + keySize)
        if (level > 0) walk(child, depth + 1)
        else {
          val storedBytes = buf.u32(keyOff).toInt
          val mask = buf.u32(keyOff + 4).toInt
          val coords = (0 until rank).map(d => buf.u64(keyOff + 8 + d * 8))
          placeChunk(buf.bytes(child, storedBytes), mask, coords)
        }
      }
    }
    def placeChunk(stored: Array[Byte], mask: Int, coords: Seq[Long]): Unit = {
      // filters were APPLIED pipeline-order on write ⇒ undo reversed;
      // mask bit i set = filter i was skipped for this chunk
      var data = stored
      filters.zipWithIndex.reverse.foreach { case ((id, _, cd), i) =>
        if ((mask & (1 << i)) == 0) data = id match {
          case FILTER_DEFLATE => inflate(data, (chunkElems * dt.size).toInt)
          case FILTER_SHUFFLE => unshuffle(data, dt.size)
          case FILTER_FLETCHER32 => defletcher(data)
          case FILTER_SZIP => deszip(data, cd, dt.size,
            (chunkElems * dt.size).toInt)
        }
      }
      if (data.length < chunkElems * dt.size)
        throw new IOException(s"chunk decoded to ${data.length} bytes, " +
          s"need ${chunkElems * dt.size}")
      val vals = decodeElems(data, dt, chunkElems.toInt)
      var l = 0L
      while (l < chunkElems) {
        // local chunk coords → global coords; clip partial edge chunks
        var flat = 0L
        var inBounds = true
        var d = 0
        while (d < rank && inBounds) {
          val g = coords(d) + (l / chunkStride(d)) % chunkDims(d)
          // g < 0: a corrupted chunk key whose u64 offset reads as a
          // negative Long — without this clip the negative flat index
          // truncates through .toInt into a small in-range-looking
          // value (found by the corrupt-granule fuzz property:
          // AIOOBE escaping the quarantine contract)
          if (g < 0 || g >= dims(d)) inBounds = false
          else flat += g * dimStride(d)
          d += 1
        }
        if (inBounds) out(flat.toInt) = vals(l.toInt)
        l += 1
      }
    }
    walk(btreeAddr, 0)
  }

  private def inflate(data: Array[Byte], expect: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(expect)
      val chunk = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(chunk)
        // needsDictionary: inflate() returns 0 with needsInput()=false
        // forever — without this check a crafted FDICT chunk spins the
        // task at 100% CPU instead of quarantining
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          throw new IOException("truncated deflate stream in HDF5 chunk")
        out.write(chunk, 0, n)
        if (out.size() > expect + 8192)
          throw new IOException(
            s"deflated HDF5 chunk exceeds expected $expect bytes")
      }
      out.toByteArray
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IOException(s"corrupt deflate stream: ${e.getMessage}")
    } finally inf.end()
  }

  /** Undo the szip filter: H5Zszip prefixes each compressed chunk
    * with its original byte count (4 bytes little-endian), then the
    * raw CCSDS-Rice stream decoded by [[Szip.decode]] with the
    * cd_values carried in the filter message. */
  private def deszip(data: Array[Byte], cd: Seq[Long], elemSize: Int,
      expect: Int): Array[Byte] = {
    if (data.length < 4)
      throw new IOException("szip chunk shorter than its size prefix")
    val orig = (data(0) & 0xFFL) | ((data(1) & 0xFFL) << 8) |
      ((data(2) & 0xFFL) << 16) | ((data(3) & 0xFFL) << 24)
    if (orig > expect)
      throw new IOException(
        s"szip chunk claims $orig original bytes, chunk holds $expect")
    if (orig % elemSize != 0)
      throw new IOException(
        s"szip original size $orig not a multiple of element size $elemSize")
    val p = Szip.Params(cd(0).toInt, cd(1).toInt, cd(2).toInt, cd(3).toInt)
    if (p.bitsPerPixel != elemSize * 8)
      throw new IOException(
        s"szip bits_per_pixel ${p.bitsPerPixel} != element ${elemSize * 8}")
    Szip.decode(java.util.Arrays.copyOfRange(data, 4, data.length), p,
      (orig / elemSize).toInt)
  }

  /** Undo the byte-shuffle filter: n size-byte elements stored as
    * `size` planes of n bytes each. */
  private def unshuffle(data: Array[Byte], size: Int): Array[Byte] = {
    if (size <= 1 || data.length % size != 0) data
    else {
      val n = data.length / size
      val out = new Array[Byte](data.length)
      var j = 0
      while (j < size) {
        var i = 0
        while (i < n) {
          out(i * size + j) = data(j * n + i)
          i += 1
        }
        j += 1
      }
      out
    }
  }

  // ---- fixture writer (reader's inverse, like NetcdfClassic.buildHeader) ----

  // -- shared datatype/dataspace/value encoders --

  private def dtString(len: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(0x13.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
    b.putInt(len)
    b.array()
  }
  private def dtVlenString: Array[Byte] = {
    // class 9 v1, type=string(1); base type: the 8-byte fixed-string
    val b = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(0x19.toByte); b.put(0x01.toByte); b.put(0.toByte); b.put(0.toByte)
    b.putInt(16) // element size on disk: len + heap addr + index
    b.put(dtString(1))
    b.array()
  }
  private def dtFixed(size: Int, signed: Boolean): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(0x10.toByte); b.put((if (signed) 0x08 else 0x00).toByte)
    b.put(0.toByte); b.put(0.toByte)
    b.putInt(size)
    b.putShort(0); b.putShort((size * 8).toShort)
    b.array()
  }
  private def dtFloat(size: Int): Array[Byte] = {
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
  private def dsScalar: Array[Byte] = Array[Byte](1, 0, 0, 0, 0, 0, 0, 0)
  private def ds1d(n: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.put(1.toByte); b.put(0.toByte)
    (0 until 5).foreach(_ => b.put(0.toByte))
    b.putLong(n)
    b.array()
  }
  /** Simple v1 dataspace of any rank. */
  private def dsNd(dims: Seq[Long]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + 8 * dims.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.put(dims.length.toByte); b.put(0.toByte)
    (0 until 5).foreach(_ => b.put(0.toByte))
    dims.foreach(b.putLong)
    b.array()
  }
  private def le(width: Int, v: Long): Array[Byte] = {
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
  private def padTo8(b: Array[Byte]): Array[Byte] =
    if (b.length % 8 == 0) b
    else b ++ new Array[Byte]((8 - b.length % 8) % 8)

  /** v1 attribute message, shared by both fixture writers. String
    * attrs encode fixed by default; `vlenRef` maps the UTF-8 payload
    * to its 16-byte vlen record (len + global heap addr + index) for
    * the NC_STRING form. */
  private def attrMessageV1(
      attrName: String, value: NetcdfClassic.AttrValue,
      vlenRef: Option[Array[Byte] => Array[Byte]]): Array[Byte] = {
    import NetcdfClassic._
    val (dt, ds, data) = value match {
      case CharAttr(s) =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        vlenRef match {
          case Some(ref) => (dtVlenString, dsScalar, ref(b))
          case None => (dtString(b.length), dsScalar, b)
        }
      case DoubleAttr(d) =>
        (dtFloat(8), dsScalar, le(8, java.lang.Double.doubleToLongBits(d)))
      case FloatAttr(f) =>
        (dtFloat(4), dsScalar, le(4, java.lang.Float.floatToIntBits(f).toLong))
      case IntAttr(is) => (dtFixed(4, signed = true),
        ds1d(is.length.toLong), is.toArray.flatMap(i => le(4, i.toLong)))
      case ShortAttr(sh) =>
        (dtFixed(2, signed = true), dsScalar, le(2, sh.toLong))
      case LongAttr(ls) => (dtFixed(8, signed = true),
        ds1d(ls.length.toLong), ls.toArray.flatMap(l => le(8, l)))
      case UByteAttr(ubs) => (dtFixed(1, signed = false),
        ds1d(ubs.length.toLong), ubs.toArray.flatMap(v => le(1, v.toLong)))
    }
    val nameBytes = attrName.getBytes(StandardCharsets.UTF_8) :+ 0.toByte
    val mb = new java.io.ByteArrayOutputStream()
    mb.write(1); mb.write(0) // attribute message v1
    mb.write(le(2, nameBytes.length.toLong))
    mb.write(le(2, dt.length.toLong))
    mb.write(le(2, ds.length.toLong))
    mb.write(padTo8(nameBytes)); mb.write(padTo8(dt)); mb.write(padTo8(ds))
    mb.write(padTo8(data))
    mb.toByteArray
  }

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

    // -- attribute messages (one shared encoder with buildDataFile) --
    var vlenIdx = 0
    val msgs: Seq[Array[Byte]] = attrs.map { case (attrName, value) =>
      val vref = if (!vlenStrings) None else Some((b: Array[Byte]) => {
        vlenIdx += 1
        val d = java.nio.ByteBuffer.allocate(16)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        d.putInt(b.length); d.putLong(HEAP_ADDR); d.putInt(vlenIdx)
        d.array()
      })
      attrMessageV1(attrName, value, vref)
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

  // -- data-file writer: root attrs + real VARIABLES (symbol-table
  // group, contiguous or chunked+shuffle+deflate layouts) --

  /** One fixture variable, netcdf-c shaped: row-major doubles encoded
    * as `dtype` (f4/f8/i1/i2/i4/i8), optionally chunked with the
    * shuffle and deflate filters netcdf applies. */
  case class FixtureVar(
      name: String,
      dims: Seq[Long],
      values: Array[Double],
      dtype: String = "f8",
      chunks: Option[Seq[Long]] = None,
      deflate: Boolean = false,
      shuffle: Boolean = false,
      fletcher: Boolean = false,
      szip: Boolean = false,
      fill: Option[Double] = None,
      attrs: Seq[(String, NetcdfClassic.AttrValue)] = Seq.empty)

  def buildDataFile(
      attrs: Seq[(String, NetcdfClassic.AttrValue)],
      vars: Seq[FixtureVar],
      /** Store root links DENSELY (fractal heap + name-index v2
        * B-tree — the libhdf5 1.10+ layout for groups past the
        * compact threshold) instead of the symbol-table group. */
      denseLinks: Boolean = false): Array[Byte] = {
    import NetcdfClassic._
    // SNOD entries must be name-ordered (HDF5 B-tree invariant)
    val vs = vars.sortBy(_.name)

    def dtypeOf(s: String): (Array[Byte], Int, Int) = s match {
      case "f8" => (dtFloat(8), 8, 1)
      case "f4" => (dtFloat(4), 4, 1)
      case "i8" => (dtFixed(8, signed = true), 8, 0)
      case "i4" => (dtFixed(4, signed = true), 4, 0)
      case "i2" => (dtFixed(2, signed = true), 2, 0)
      case "i1" => (dtFixed(1, signed = true), 1, 0)
      case other => throw new IllegalArgumentException(s"dtype $other")
    }
    def encode(v: Double, cls: Int, size: Int): Array[Byte] = (cls, size) match {
      case (1, 8) => le(8, java.lang.Double.doubleToLongBits(v))
      case (1, 4) => le(4, java.lang.Float.floatToIntBits(v.toFloat).toLong)
      case (0, w) => le(w, v.toLong)
      case (c, w) => throw new IllegalArgumentException(s"dtype $c/$w")
    }
    def padded(b: Array[Byte]): Array[Byte] = padTo8(b)
    // v1 attribute message: the SAME shared encoder buildFile uses
    // (fixed strings here — data files don't need the vlen form)
    def attrMsg(attrName: String, value: AttrValue): Array[Byte] =
      attrMessageV1(attrName, value, vlenRef = None)
    // v1 filter-pipeline message: shuffle, deflate, then fletcher32 —
    // netcdf's order (checksum is computed over the compressed bytes)
    def filterMsg(v: FixtureVar, elemSize: Int): Option[Array[Byte]] = {
      if (!v.deflate && !v.shuffle && !v.fletcher && !v.szip) None
      else {
        val fb = new java.io.ByteArrayOutputStream()
        val n = (if (v.shuffle) 1 else 0) + (if (v.deflate) 1 else 0) +
          (if (v.fletcher) 1 else 0) + (if (v.szip) 1 else 0)
        fb.write(1); fb.write(n); fb.write(new Array[Byte](6))
        def one(id: Int, values: Seq[Long]): Unit = {
          fb.write(le(2, id.toLong)); fb.write(le(2, 0L)) // no name
          fb.write(le(2, 1L)); fb.write(le(2, values.length.toLong))
          values.foreach(x => fb.write(le(4, x)))
          if (values.length % 2 == 1) fb.write(le(4, 0L)) // odd ⇒ pad word
        }
        if (v.shuffle) one(FILTER_SHUFFLE, Seq(elemSize.toLong))
        if (v.deflate) one(FILTER_DEFLATE, Seq(6L))
        if (v.szip) {
          val p = szipParams(v, elemSize)
          one(FILTER_SZIP, Seq(p.optionsMask.toLong, p.bitsPerPixel.toLong,
            p.pixelsPerBlock.toLong, p.pixelsPerScanline.toLong))
        }
        if (v.fletcher) one(FILTER_FLETCHER32, Seq.empty)
        Some(fb.toByteArray)
      }
    }
    // H5Z__set_local_szip shape: raw stream, LSB byte order, NN
    // preprocessing, pps = fastest chunk dim capped at 128 blocks
    def szipParams(v: FixtureVar, elemSize: Int): Szip.Params = {
      if (v.deflate || v.shuffle) throw new IllegalArgumentException(
        "fixture: szip composes with fletcher32 only")
      if (elemSize > 4) throw new IllegalArgumentException(
        "fixture: szip supports sample sizes up to 32 bits")
      val ppb = 8
      val scan = v.chunks.getOrElse(v.dims).last
      val pps = math.max(ppb.toLong,
        math.min(scan, 128L * ppb)).toInt
      Szip.Params(Szip.Raw | Szip.LSB | Szip.NN | Szip.AllowK13,
        elemSize * 8, ppb, pps)
    }
    def szipBytes(raw: Array[Byte], v: FixtureVar, esz: Int): Array[Byte] =
      le(4, raw.length.toLong) ++ Szip.encode(raw, szipParams(v, esz))
    def fillMsg(v: FixtureVar, cls: Int, size: Int): Option[Array[Byte]] =
      v.fill.map { f =>
        val fb = new java.io.ByteArrayOutputStream()
        fb.write(2); fb.write(2); fb.write(0); fb.write(1) // v2, defined
        fb.write(le(4, size.toLong)); fb.write(encode(f, cls, size))
        padded(fb.toByteArray)
      }
    def deflateBytes(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(6)
      try {
        d.setInput(raw); d.finish()
        val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
        val chunk = new Array[Byte](8192)
        while (!d.finished()) out.write(chunk, 0, d.deflate(chunk))
        out.toByteArray
      } finally d.end()
    }
    def shuffleBytes(raw: Array[Byte], size: Int): Array[Byte] = {
      val n = raw.length / size
      val out = new Array[Byte](raw.length)
      var i = 0
      while (i < n) {
        var j = 0
        while (j < size) { out(j * n + i) = raw(i * size + j); j += 1 }
        i += 1
      }
      out
    }

    // -- per-var precomputation: messages (addresses patched later)
    // and encoded data blocks --
    case class VarPlan(
        v: FixtureVar, cls: Int, esz: Int,
        dtB: Array[Byte], dsB: Array[Byte],
        filterB: Option[Array[Byte]], fillB: Option[Array[Byte]],
        attrB: Seq[Array[Byte]],
        layoutLen: Int,
        // chunked: (gridCoords, storedBytes); contiguous: one raw block
        chunksOut: Seq[(Seq[Long], Array[Byte])],
        contiguous: Option[Array[Byte]]) {
      def btreeLen: Int = {
        val keySize = 8 + 8 * (v.dims.length + 1)
        24 + chunksOut.length * (keySize + 8) + keySize
      }
      def headerLen: Int = {
        val bodies = Seq(dtB, dsB).map(b => 8 + padded(b).length).sum +
          (8 + layoutLen) +
          filterB.map(8 + _.length).getOrElse(0) +
          fillB.map(8 + _.length).getOrElse(0) +
          attrB.map(8 + _.length).sum
        16 + bodies
      }
      def nMsgs: Int = 3 + filterB.size + fillB.size + attrB.length
    }
    val plans = vs.map { v =>
      val (dtB, esz, cls) = dtypeOf(v.dtype)
      val total = v.dims.foldLeft(1L)(_ * _)
      require(v.values.length.toLong == total,
        s"${v.name}: ${v.values.length} values for dims ${v.dims}")
      val raw = {
        val bb = java.nio.ByteBuffer.allocate(v.values.length * esz)
        v.values.foreach(x => bb.put(encode(x, cls, esz)))
        bb.array()
      }
      v.chunks match {
        case None =>
          // layout v3 contiguous: ver+class+addr+size = 18 → pad 24
          VarPlan(v, cls, esz, dtB, dsNd(v.dims), filterMsg(v, esz),
            fillMsg(v, cls, esz), v.attrs.map { case (n2, a) => attrMsg(n2, a) },
            layoutLen = 24, chunksOut = Seq.empty, contiguous = Some(raw))
        case Some(cdims) =>
          require(cdims.length == v.dims.length,
            s"${v.name}: chunk rank != rank")
          val rank = v.dims.length
          val chunkElems = cdims.foldLeft(1L)(_ * _).toInt
          val dimStride = v.dims.scanRight(1L)(_ * _).tail
          val chunkStride = cdims.scanRight(1L)(_ * _).tail
          // row-major walk of the chunk grid
          val gridDims = v.dims.zip(cdims).map { case (d, c) => (d + c - 1) / c }
          val nChunks = gridDims.foldLeft(1L)(_ * _).toInt
          val gridStride = gridDims.scanRight(1L)(_ * _).tail
          val chunksOut = (0 until nChunks).map { g =>
            val coords = (0 until rank).map(d =>
              ((g / gridStride(d)) % gridDims(d)) * cdims(d))
            val cb = java.nio.ByteBuffer.allocate(chunkElems * esz)
            var l = 0
            while (l < chunkElems) {
              var flat = 0L
              var inBounds = true
              var d = 0
              while (d < rank && inBounds) {
                val gc = coords(d) + (l / chunkStride(d)) % cdims(d)
                if (gc >= v.dims(d)) inBounds = false
                else flat += gc * dimStride(d)
                d += 1
              }
              cb.put(encode(if (inBounds) v.values(flat.toInt) else 0.0,
                cls, esz))
              l += 1
            }
            var stored = cb.array()
            if (v.shuffle) stored = shuffleBytes(stored, esz)
            if (v.deflate) stored = deflateBytes(stored)
            if (v.szip) stored = szipBytes(stored, v, esz)
            if (v.fletcher) {
              val sum = fletcher32(stored, stored.length)
              stored = stored ++ le(4, sum)
            }
            (coords, stored)
          }.filterNot { case (coords, _) =>
            // netcdf's lazy allocation: an all-fill chunk is never
            // written; the reader reconstitutes it from the fill msg
            v.fill.exists { f =>
              val chunkVals = (0 until chunkElems).flatMap { l =>
                var flat = 0L
                var inBounds = true
                var d = 0
                while (d < rank && inBounds) {
                  val gc = coords(d) + (l / chunkStride(d)) % cdims(d)
                  if (gc >= v.dims(d)) inBounds = false
                  else flat += gc * dimStride(d)
                  d += 1
                }
                if (inBounds) Some(v.values(flat.toInt)) else None
              }
              chunkVals.forall(_ == f)
            }
          }
          // layout v3 chunked: 3 + 8 + 4*(rank+1) → pad8
          val layoutLen = ((3 + 8 + 4 * (rank + 1)) + 7) & ~7
          VarPlan(v, cls, esz, dtB, dsNd(v.dims), filterMsg(v, esz),
            fillMsg(v, cls, esz), v.attrs.map { case (n2, a) => attrMsg(n2, a) },
            layoutLen, chunksOut, contiguous = None)
      }
    }

    // -- address assignment --
    val rootAttrMsgs = attrs.map { case (n2, a) => attrMsg(n2, a) }
    // dense root: link-info message (18-byte body padded to 24);
    // classic root: symbol-table message (16-byte body)
    val rootHeaderLen = 16 + (8 + (if (denseLinks) 24 else 16)) +
      rootAttrMsgs.map(8 + _.length).sum
    val ROOT = 96L
    val heapAddr = ROOT + rootHeaderLen
    val nameOffsets = {
      var off = 8L // offset 0 reserved (empty name)
      vs.map { v =>
        val o = off
        off += pad8(v.name.getBytes(StandardCharsets.UTF_8).length + 1L)
        (v.name, o)
      }.toMap
    }
    val heapDataLen = 8L + vs.map(v =>
      pad8(v.name.getBytes(StandardCharsets.UTF_8).length + 1L)).sum
    val btreeAddr = heapAddr + 32 + heapDataLen
    val snodAddr = btreeAddr + 48
    val snodLen = 8L + 40L * vs.length

    /** Dense-link layout: geometry mirrors libhdf5's defaults scaled
      * down (4-wide doubling table, 512-byte starting blocks) so
      * multi-block heaps appear at test sizes; heap IDs are
      * 1 + 4(offset) + 2(length) bytes; v2 B-tree nodes are 512 bytes
      * with 11-byte (hash + heap ID) records. */
    case class DenseLayout(
        frhpAddr: Long, rootBlockAddr: Long, nRows: Int,
        blockOffs: Seq[Long], blockSizes: Seq[Long],
        blockFileAddrs: Seq[Long],
        objOffs: Seq[Long], objLens: Seq[Int],
        bthdAddr: Long, depth: Int, rootNodeAddr: Long,
        internalRecs: Seq[Int], leaves: Seq[Seq[Int]],
        leafAddrs: Seq[Long], end: Long)
    val D_WIDTH = 4
    val D_START = 512L
    val D_BLOCK_HEADER = 4 + 1 + 8 + 4 + 4 // sig+ver+hdr+offset4+checksum
    val D_FRHP_LEN = 146L
    val D_BTHD_LEN = 38L
    val D_NODE = 512
    val D_REC = 11
    val D_LEAF_CAP = 40 // < (D_NODE-10)/D_REC = 45
    val dense: Option[DenseLayout] = if (!denseLinks) None else Some {
      val objLens = vs.map(v =>
        3 + v.name.getBytes(StandardCharsets.UTF_8).length + 8)
      def rowSize(row: Int): Long =
        if (row < 2) D_START else D_START << (row - 1)
      // sequential slot fill in heap-linear order
      val oo = scala.collection.mutable.ArrayBuffer[Long]()
      val bo = scala.collection.mutable.ArrayBuffer[Long]()
      val bsz = scala.collection.mutable.ArrayBuffer[Long]()
      var nextBlockOff = 0L
      var used = 0L
      def open(): Unit = {
        val sz = rowSize(bo.length / D_WIDTH)
        bo += nextBlockOff; bsz += sz
        nextBlockOff += sz
        used = D_BLOCK_HEADER.toLong
      }
      open()
      objLens.foreach { len =>
        require(len <= bsz.last - D_BLOCK_HEADER, s"link too long: $len")
        if (used + len > bsz.last) open()
        oo += bo.last + used
        used += len
      }
      val nBlocks = bo.length
      val nRows = (nBlocks + D_WIDTH - 1) / D_WIDTH
      val rootIsDirect = nBlocks == 1
      val frhpAddr = heapAddr
      val fhibLen =
        if (rootIsDirect) 0L
        else 4L + 1 + 8 + 4 + nRows.toLong * D_WIDTH * 8 + 4
      val firstBlockAddr = frhpAddr + D_FRHP_LEN + fhibLen
      val blockFileAddrs = bsz.scanLeft(firstBlockAddr)(_ + _).init.toSeq
      val rootBlockAddr =
        if (rootIsDirect) blockFileAddrs.head
        else frhpAddr + D_FRHP_LEN
      val bthdAddr = blockFileAddrs.last + bsz.last
      // B-tree record split: in-order = leaf0, sep0, leaf1, sep1, ...
      val n = vs.length
      val (depth, internalRecs, leaves) =
        if (n <= D_LEAF_CAP)
          (0, Seq.empty[Int], Seq((0 until n): Seq[Int]))
        else {
          val ls = scala.collection.mutable.ArrayBuffer[Seq[Int]]()
          val ir = scala.collection.mutable.ArrayBuffer[Int]()
          var rest: Seq[Int] = 0 until n
          while (rest.length > D_LEAF_CAP + 1) {
            ls += rest.take(D_LEAF_CAP)
            ir += rest(D_LEAF_CAP)
            rest = rest.drop(D_LEAF_CAP + 1)
          }
          ls += rest
          (1, ir.toSeq, ls.toSeq)
        }
      val rootNodeAddr = bthdAddr + D_BTHD_LEN
      val leafAddrs =
        if (depth == 0) Seq(rootNodeAddr)
        else leaves.indices.map(i =>
          rootNodeAddr + D_NODE.toLong + i.toLong * D_NODE)
      val end = (if (depth == 0) rootNodeAddr + D_NODE
        else leafAddrs.last + D_NODE)
      DenseLayout(frhpAddr, rootBlockAddr, if (rootIsDirect) 0 else nRows,
        bo.toSeq, bsz.toSeq, blockFileAddrs, oo.toSeq, objLens,
        bthdAddr, depth, rootNodeAddr, internalRecs, leaves, leafAddrs, end)
    }
    var cursor = dense.map(_.end).getOrElse(snodAddr + snodLen)
    val headerAddrs = plans.map { p =>
      val a = cursor; cursor += p.headerLen; a
    }
    // data region: per var, btree (if chunked) then blocks
    val dataAddrs: Seq[(Long, Seq[Long])] = plans.map { p =>
      if (p.contiguous.isDefined) {
        val a = cursor; cursor += p.contiguous.get.length; (a, Seq.empty)
      } else {
        val bt = cursor; cursor += p.btreeLen
        val blocks = p.chunksOut.map { case (_, b) =>
          val a = cursor; cursor += b.length; a
        }
        (bt, blocks)
      }
    }
    val eof = cursor

    // -- emit --
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = { u16(v.toInt); u16((v >> 16).toInt) }
    def u64(v: Long): Unit = { u32(v); u32(v >> 32) }
    def raw(b: Array[Byte]): Unit = bos.write(b)
    def msg(t: Int, body: Array[Byte]): Unit = {
      u16(t); u16(body.length); u8(0); u8(0); u8(0); u8(0); raw(body)
    }
    // superblock v0
    raw(SIGNATURE)
    u8(0); u8(0); u8(0); u8(0); u8(0)
    u8(8); u8(8); u8(0)
    u16(4); u16(16)
    u32(0L)
    u64(0L)
    u64(UNDEF)
    u64(eof)
    u64(UNDEF)
    u64(0L) // root link name offset
    u64(ROOT)
    u32(1L); u32(0L) // cache type 1 (group), reserved
    (0 until 16).foreach(_ => u8(0))
    // root v1 object header: group-structure msg + root attrs
    u8(1); u8(0)
    u16(1 + rootAttrMsgs.length)
    u32(1L)
    u32((rootHeaderLen - 16).toLong)
    u32(0L)
    dense match {
      case Some(d) =>
        // link-info v0, flags 0: fractal heap + name-index addresses
        val lb = java.nio.ByteBuffer.allocate(24)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        lb.put(0.toByte).put(0.toByte)
        lb.putLong(d.frhpAddr); lb.putLong(d.bthdAddr)
        msg(MSG_LINK_INFO, lb.array())
      case None =>
        val stBody = java.nio.ByteBuffer.allocate(16)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        stBody.putLong(btreeAddr); stBody.putLong(heapAddr)
        msg(MSG_SYMBOL_TABLE, stBody.array())
    }
    rootAttrMsgs.foreach(m => msg(MSG_ATTRIBUTE, m))
    dense match {
      case Some(d) => emitDenseGroup(d)
      case None =>
        // local heap
        raw("HEAP".getBytes(StandardCharsets.US_ASCII))
        u8(0); u8(0); u8(0); u8(0)
        u64(heapDataLen)
        u64(heapDataLen) // free list: none (head past the names)
        u64(heapAddr + 32)
        (0 until 8).foreach(_ => u8(0)) // reserved empty name at offset 0
        vs.foreach { v =>
          val nb = v.name.getBytes(StandardCharsets.UTF_8) :+ 0.toByte
          raw(nb)
          (0 until (pad8(nb.length.toLong) - nb.length).toInt)
            .foreach(_ => u8(0))
        }
        // group B-tree: one leaf pointing at the single SNOD
        raw("TREE".getBytes(StandardCharsets.US_ASCII))
        u8(0); u8(0) // group node, level 0
        u16(1)
        u64(UNDEF); u64(UNDEF)
        u64(0L) // key 0: offset of smallest name (reserved empty)
        u64(snodAddr)
        u64(nameOffsets(vs.last.name)) // key 1: offset of largest name
        // SNOD
        raw("SNOD".getBytes(StandardCharsets.US_ASCII))
        u8(1); u8(0)
        u16(vs.length)
        vs.zip(headerAddrs).foreach { case (v, hAddr) =>
          u64(nameOffsets(v.name))
          u64(hAddr)
          u32(0L); u32(0L)
          (0 until 16).foreach(_ => u8(0))
        }
    }

    def emitDenseGroup(d: DenseLayout): Unit = {
      // FRHP — 146 bytes; fields the reader ignores hold plausible
      // values, checksums are zeros (unverified file-wide)
      raw("FRHP".getBytes(StandardCharsets.US_ASCII))
      u8(0) // version
      u16(7) // heap ID length: 1 + 4 offset + 2 length
      u16(0) // no I/O filters
      u8(0x02) // flags: direct blocks carry a (zeroed) checksum
      u32(4096L) // max managed object size (⇒ 2-byte ID lengths)
      u64(0L) // next huge id
      u64(UNDEF) // huge-object B-tree
      u64(0L) // free space
      u64(UNDEF) // free-space manager
      val space = d.blockOffs.last + d.blockSizes.last
      u64(space); u64(space) // managed / allocated space
      u64(space) // direct-block iterator offset
      u64(vs.length.toLong) // managed objects
      u64(0L); u64(0L); u64(0L); u64(0L) // huge/tiny sizes+counts
      u16(D_WIDTH)
      u64(D_START)
      u64(65536L) // max direct block size
      u16(32) // max heap size (bits) ⇒ 4-byte offsets
      u16(1) // starting rows in root indirect block
      u64(d.rootBlockAddr)
      u16(d.nRows) // 0 ⇒ root is a direct block
      u32(0L) // checksum
      // root indirect block, when the heap outgrew one direct block
      if (d.nRows > 0) {
        raw("FHIB".getBytes(StandardCharsets.US_ASCII))
        u8(0)
        u64(d.frhpAddr)
        u32(0L) // block offset of the root indirect block
        (0 until d.nRows * D_WIDTH).foreach { slot =>
          u64(if (slot < d.blockFileAddrs.length) d.blockFileAddrs(slot)
          else UNDEF)
        }
        u32(0L) // checksum
      }
      // direct blocks with packed link-message objects
      val linkBodies = vs.zip(headerAddrs).map { case (v, hAddr) =>
        val nb = v.name.getBytes(StandardCharsets.UTF_8)
        val b = java.nio.ByteBuffer.allocate(3 + nb.length + 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put(1.toByte).put(0.toByte) // link v1, flags: 1-byte name len
        b.put(nb.length.toByte).put(nb)
        b.putLong(hAddr)
        b.array()
      }
      d.blockOffs.indices.foreach { bi =>
        val block = new Array[Byte](d.blockSizes(bi).toInt)
        val hb = java.nio.ByteBuffer.wrap(block)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        hb.put("FHDB".getBytes(StandardCharsets.US_ASCII))
        hb.put(0.toByte)
        hb.putLong(d.frhpAddr)
        hb.putInt(d.blockOffs(bi).toInt) // 4-byte block offset
        // (4 zero bytes of checksum follow implicitly)
        d.objOffs.indices.foreach { oi =>
          val off = d.objOffs(oi)
          if (off >= d.blockOffs(bi) &&
            off < d.blockOffs(bi) + d.blockSizes(bi)) {
            System.arraycopy(linkBodies(oi), 0, block,
              (off - d.blockOffs(bi)).toInt, linkBodies(oi).length)
          }
        }
        raw(block)
      }
      // name-index v2 B-tree header
      raw("BTHD".getBytes(StandardCharsets.US_ASCII))
      u8(0); u8(5) // version, type 5: link-name index
      u32(D_NODE.toLong); u16(D_REC)
      u16(d.depth)
      u8(100); u8(40) // split / merge percent
      u64(d.rootNodeAddr)
      u16(if (d.depth == 0) d.leaves.head.length else d.internalRecs.length)
      u64(vs.length.toLong)
      u32(0L) // checksum
      // records in GLOBAL in-order position: hash field = order index
      // (enumeration never hashes names; order only has to be
      // consistent within the tree)
      val order: Map[Int, Int] = {
        val seq = scala.collection.mutable.ArrayBuffer[Int]()
        d.leaves.indices.foreach { i =>
          seq ++= d.leaves(i)
          if (i < d.internalRecs.length) seq += d.internalRecs(i)
        }
        seq.zipWithIndex.toMap
      }
      def record(nb: java.nio.ByteBuffer, oi: Int): Unit = {
        nb.putInt(order(oi))
        nb.put(0.toByte) // heap ID: version 0, managed
        nb.putInt(d.objOffs(oi).toInt)
        nb.putShort(d.objLens(oi).toShort)
      }
      def node(sig: String, body: java.nio.ByteBuffer => Unit): Unit = {
        val block = new Array[Byte](D_NODE)
        val nb = java.nio.ByteBuffer.wrap(block)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        nb.put(sig.getBytes(StandardCharsets.US_ASCII))
        nb.put(0.toByte); nb.put(5.toByte)
        body(nb)
        raw(block)
      }
      if (d.depth == 0) node("BTLF", nb => d.leaves.head.foreach(record(nb, _)))
      else {
        node("BTIN", { nb =>
          d.internalRecs.foreach(record(nb, _))
          // child pointers: address + record count (1 byte: max leaf
          // records (512-10)/11 = 45 fits)
          d.leafAddrs.indices.foreach { i =>
            nb.putLong(d.leafAddrs(i))
            nb.put(d.leaves(i).length.toByte)
          }
        })
        d.leaves.indices.foreach { i =>
          node("BTLF", nb => d.leaves(i).foreach(record(nb, _)))
        }
      }
    }
    // per-var object headers
    plans.zip(dataAddrs).foreach { case (p, (dataAddr, chunkAddrs)) =>
      u8(1); u8(0)
      u16(p.nMsgs)
      u32(1L)
      u32((p.headerLen - 16).toLong)
      u32(0L)
      msg(MSG_DATATYPE, padded(p.dtB))
      msg(MSG_DATASPACE, padded(p.dsB))
      p.fillB.foreach(b => msg(MSG_FILL, b))
      p.filterB.foreach(b => msg(MSG_FILTER, b))
      val lb = java.nio.ByteBuffer.allocate(p.layoutLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (p.contiguous.isDefined) {
        lb.put(3.toByte); lb.put(1.toByte)
        lb.putLong(dataAddr); lb.putLong(p.contiguous.get.length.toLong)
      } else {
        val rank = p.v.dims.length
        lb.put(3.toByte); lb.put(2.toByte); lb.put((rank + 1).toByte)
        lb.putLong(dataAddr) // chunk B-tree address
        p.v.chunks.get.foreach(c => lb.putInt(c.toInt))
        lb.putInt(p.esz)
      }
      msg(MSG_LAYOUT, lb.array())
      p.attrB.foreach(b => msg(MSG_ATTRIBUTE, b))
      val _ = chunkAddrs
    }
    // data region
    plans.zip(dataAddrs).foreach { case (p, (dataAddr, chunkAddrs)) =>
      p.contiguous match {
        case Some(rawData) => raw(rawData)
        case None =>
          val rank = p.v.dims.length
          // chunk B-tree leaf
          raw("TREE".getBytes(StandardCharsets.US_ASCII))
          u8(1); u8(0)
          u16(p.chunksOut.length)
          u64(UNDEF); u64(UNDEF)
          p.chunksOut.zip(chunkAddrs).foreach { case ((coords, stored), a) =>
            u32(stored.length.toLong); u32(0L)
            coords.foreach(u64)
            u64(0L) // trailing element-size offset
            u64(a)
          }
          // final key: the dataspace bound
          u32(0L); u32(0L)
          p.v.dims.foreach(u64)
          u64(0L)
          p.chunksOut.foreach { case (_, stored) => raw(stored) }
          val _ = (dataAddr, rank)
      }
    }
    bos.toByteArray
  }
}
