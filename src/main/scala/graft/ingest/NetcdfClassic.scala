package graft.ingest

import java.io.{DataInputStream, IOException}
import java.nio.charset.StandardCharsets

/** Pure-Scala reader for the NetCDF classic header (CDF-1, CDF-2
  * 64-bit-offset, CDF-5 64-bit-data) — the publicly documented
  * on-disk format (the NetCDF "classic format spec"). The reference
  * reads granule GLOBAL ATTRIBUTES through xarray
  * (avhrr recipe.py:46-63); everything it consumes lives in the
  * header, so this reader parses magic → numrecs → dim_list →
  * gatt_list and never touches variable data: a 100 MB granule costs
  * a few KB of reads. netcdf4/HDF5-backed granules route through the
  * sibling Hdf5Header root-attribute reader (the GranuleSource seam
  * sniffs the magic).
  *
  * All integers are big-endian; CDF-5 widens the NON_NEG fields to
  * 64 bits. Names and values are padded to 4-byte boundaries.
  */
object NetcdfClassic {

  /** One parsed attribute value, rendered to STRING — the reference
    * consumes attrs as strings (recipe.py:51-56); numeric arrays are
    * comma-joined. */
  case class Header(
      version: Int,
      numRecs: Long,
      dims: Seq[(String, Long)],
      attrs: Map[String, String])

  private val NC_DIMENSION = 0x0A
  private val NC_ATTRIBUTE = 0x0C
  /** Corrupt-header guard: a global attr value longer than this is
    * not granule metadata — fail loudly instead of buffering it. */
  private val MAX_ATTR_BYTES = 1 << 20

  /** Every length/count word from the file goes through this bound
    * before it sizes an allocation or a loop: a corrupt word that
    * reads as negative (or absurdly large) must surface as the
    * IOException the quarantine path catches — never as a
    * NegativeArraySizeException or an OOM that kills the task. */
  private def boundedCount(x: Long, what: String): Int = {
    if (x < 0 || x > MAX_ATTR_BYTES)
      throw new IOException(s"corrupt header: $what = $x out of bounds")
    x.toInt
  }

  def readHeader(in: DataInputStream): Header = {
    val magic = new Array[Byte](4)
    in.readFully(magic)
    if (magic(0) != 'C' || magic(1) != 'D' || magic(2) != 'F')
      throw new IOException(
        "not a NetCDF classic file (HDF5-backed netcdf4 routes through " +
          "Hdf5Header — NetcdfGranuleSource sniffs the magic)")
    val version = magic(3).toInt
    require(version == 1 || version == 2 || version == 5,
      s"unsupported NetCDF classic version $version")
    val wide = version == 5
    def readSize(): Long = if (wide) in.readLong() else in.readInt().toLong

    val numRecs = readSize() // STREAMING sentinel (-1) passes through
    val dims = readDimList(in, readSize _)
    val attrs = readAttrList(in, readSize _, version)
    Header(version, numRecs, dims, attrs)
  }

  private def readName(in: DataInputStream, readSize: () => Long): String = {
    val n = boundedCount(readSize(), "name length")
    val bytes = new Array[Byte](n)
    in.readFully(bytes)
    skipPad(in, n)
    new String(bytes, StandardCharsets.UTF_8)
  }

  private def skipPad(in: DataInputStream, n: Int): Unit = {
    val pad = (4 - (n % 4)) % 4
    var left = pad
    while (left > 0) { in.readByte(); left -= 1 }
  }

  private def readDimList(
      in: DataInputStream, readSize: () => Long): Seq[(String, Long)] = {
    val tag = in.readInt()
    val n0 = readSize()
    if (tag == 0) { require(n0 == 0, "ABSENT dim_list must be 0 0"); Seq.empty }
    else {
      require(tag == NC_DIMENSION, s"expected NC_DIMENSION tag, got $tag")
      val n = boundedCount(n0, "dim count")
      (0L until n).map { _ =>
        val name = readName(in, readSize)
        (name, readSize())
      }
    }
  }

  private def readAttrList(
      in: DataInputStream, readSize: () => Long,
      version: Int): Map[String, String] = {
    val tag = in.readInt()
    val n0 = readSize()
    if (tag == 0) { require(n0 == 0, "ABSENT gatt_list must be 0 0"); Map.empty }
    else {
      require(tag == NC_ATTRIBUTE, s"expected NC_ATTRIBUTE tag, got $tag")
      val n = boundedCount(n0, "attr count")
      (0L until n).map { _ =>
        val name = readName(in, readSize)
        val ncType = in.readInt()
        val nelems = boundedCount(readSize(), "attr nelems")
        name -> readValues(in, ncType, nelems, version)
      }.toMap
    }
  }

  /** Typed attribute values for buildHeader. */
  sealed trait AttrValue
  case class CharAttr(v: String) extends AttrValue
  case class DoubleAttr(v: Double) extends AttrValue
  case class FloatAttr(v: Float) extends AttrValue
  case class IntAttr(v: Seq[Int]) extends AttrValue
  case class ShortAttr(v: Short) extends AttrValue
  /** CDF-5-only: NC_INT64 (nc_type 10). */
  case class LongAttr(v: Seq[Long]) extends AttrValue
  /** CDF-5-only: NC_UBYTE (nc_type 7); values rendered unsigned. */
  case class UByteAttr(v: Seq[Int]) extends AttrValue

  /** Inverse of readHeader: serialize a classic header (CDF-1/2/5)
    * with the given dims and global attrs and an ABSENT var_list —
    * enough to round-trip granule metadata and to synthesize test
    * granules without a NetCDF library. */
  def buildHeader(
      attrs: Seq[(String, AttrValue)],
      dims: Seq[(String, Long)] = Seq.empty,
      version: Int = 1): Array[Byte] = {
    require(version == 1 || version == 2 || version == 5,
      s"unsupported NetCDF classic version $version")
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    def size(n: Long): Unit =
      if (version == 5) out.writeLong(n) else out.writeInt(n.toInt)
    def pad(n: Int): Unit =
      (0 until (4 - (n % 4)) % 4).foreach(_ => out.writeByte(0))
    def name(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      size(b.length.toLong); out.write(b); pad(b.length)
    }
    out.writeBytes("CDF"); out.writeByte(version)
    size(0L) // numrecs
    if (dims.isEmpty) { out.writeInt(0); size(0L) }
    else {
      out.writeInt(NC_DIMENSION); size(dims.length.toLong)
      dims.foreach { case (n, len) => name(n); size(len) }
    }
    out.writeInt(NC_ATTRIBUTE); size(attrs.length.toLong)
    attrs.foreach { case (n, v) =>
      name(n)
      v match {
        case CharAttr(s) =>
          val b = s.getBytes(StandardCharsets.UTF_8)
          out.writeInt(2); size(b.length.toLong); out.write(b); pad(b.length)
        case DoubleAttr(d) => out.writeInt(6); size(1L); out.writeDouble(d)
        case FloatAttr(f) => out.writeInt(5); size(1L); out.writeFloat(f)
        case IntAttr(is) =>
          out.writeInt(4); size(is.length.toLong); is.foreach(out.writeInt)
        case ShortAttr(s) =>
          out.writeInt(3); size(1L); out.writeShort(s.toInt); pad(2)
        case LongAttr(ls) =>
          require(version == 5, "NC_INT64 attrs are CDF-5 only")
          out.writeInt(10); size(ls.length.toLong); ls.foreach(out.writeLong)
        case UByteAttr(bs) =>
          require(version == 5, "NC_UBYTE attrs are CDF-5 only")
          out.writeInt(7); size(bs.length.toLong)
          bs.foreach(out.writeByte); pad(bs.length)
      }
    }
    out.writeInt(0); size(0L) // var_list ABSENT
    out.flush()
    bos.toByteArray
  }

  private def readValues(
      in: DataInputStream, ncType: Int, nelems: Int, version: Int): String = {
    // mirror the writer's require: the unsigned/64-bit types (nc_type
    // 7-11) exist only in CDF-5 — a CDF-1/2 header containing them is
    // corrupt and must fail loudly, not parse silently
    if (ncType >= 7 && version < 5)
      throw new IOException(
        s"nc_type $ncType is CDF-5 only but header is version $version")
    val elemSize = ncType match {
      case 1 | 2 | 7 => 1 // NC_BYTE / NC_CHAR / NC_UBYTE
      case 3 | 8 => 2 // NC_SHORT / NC_USHORT
      case 4 | 5 | 9 => 4 // NC_INT / NC_FLOAT / NC_UINT
      case 6 | 10 | 11 => 8 // NC_DOUBLE / NC_INT64 / NC_UINT64
      case other => throw new IOException(s"unknown nc_type $other")
    }
    val total = nelems.toLong * elemSize
    if (total > MAX_ATTR_BYTES)
      throw new IOException(s"attr value of $total bytes exceeds header bound")
    val out = ncType match {
      case 2 =>
        val bytes = new Array[Byte](nelems)
        in.readFully(bytes)
        new String(bytes, StandardCharsets.UTF_8)
      case 1 =>
        Seq.fill(nelems)(in.readByte().toString).mkString(", ")
      case 3 =>
        Seq.fill(nelems)(in.readShort().toString).mkString(", ")
      case 4 =>
        Seq.fill(nelems)(in.readInt().toString).mkString(", ")
      case 5 =>
        Seq.fill(nelems)(in.readFloat().toString).mkString(", ")
      case 6 =>
        Seq.fill(nelems)(in.readDouble().toString).mkString(", ")
      // CDF-5 types (magic version 5 is accepted above, so its
      // attribute types must decode too — pnetcdf emits them
      // routinely): unsigned widths render via the wider signed type
      case 7 =>
        Seq.fill(nelems)((in.readByte() & 0xff).toString).mkString(", ")
      case 8 =>
        Seq.fill(nelems)((in.readShort() & 0xffff).toString).mkString(", ")
      case 9 =>
        Seq.fill(nelems)((in.readInt().toLong & 0xffffffffL).toString)
          .mkString(", ")
      case 10 =>
        Seq.fill(nelems)(in.readLong().toString).mkString(", ")
      case 11 =>
        Seq.fill(nelems)(java.lang.Long.toUnsignedString(in.readLong()))
          .mkString(", ")
    }
    skipPad(in, total.toInt)
    out
  }
}
