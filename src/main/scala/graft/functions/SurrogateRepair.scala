package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Repair of surrogate-escaped strings (SURVEY.md §7.2 risk 2) — the
  * JVM equivalent of the reference's `reencode_surrogates`
  * (insitu recipe.py:48-63), which fixes attrs whose bytes were
  * decoded with Python's `surrogateescape` handler.
  *
  * Python maps each undecodable byte 0xXY to lone surrogate U+DCXY.
  * On the JVM those lone surrogates survive inside String; we reverse
  * the mapping: lone low surrogates U+DC80–U+DCFF become their
  * original byte, then the byte sequence is re-decoded as UTF-8
  * (REPLACE on true garbage). Paired (valid) surrogates pass through.
  */
object SurrogateRepair {

  def repair(s: String): String = {
    if (s == null) return null
    var hasLone = false
    var i = 0
    while (i < s.length && !hasLone) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c)) {
        if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1)))
          hasLone = true
        else i += 1 // valid pair, skip low half
      } else if (Character.isLowSurrogate(c)) hasLone = true
      i += 1
    }
    if (!hasLone) return s
    val bytes = new java.io.ByteArrayOutputStream(s.length * 2)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 0xdc80 && c <= 0xdcff) {
        // surrogateescape byte
        bytes.write(c - 0xdc00)
        i += 1
      } else if (Character.isHighSurrogate(c) && i + 1 < s.length &&
          Character.isLowSurrogate(s.charAt(i + 1))) {
        bytes.write(new String(Array(c, s.charAt(i + 1)))
          .getBytes(StandardCharsets.UTF_8))
        i += 2
      } else if (Character.isSurrogate(c)) {
        // unrepairable lone surrogate → replacement char
        bytes.write(0xef); bytes.write(0xbf); bytes.write(0xbd)
        i += 1
      } else {
        bytes.write(c.toString.getBytes(StandardCharsets.UTF_8))
        i += 1
      }
    }
    new String(bytes.toByteArray, StandardCharsets.UTF_8)
  }

  val repairUdf: UserDefinedFunction = udf(repair _)

  /** Byte-level decode with repair — the realistic Spark ingestion
    * path. A Spark string column physically cannot hold lone
    * surrogates (UTF8String is well-formed UTF-8, they become '?'),
    * so surrogate-damaged input must enter as BINARY and be repaired
    * while decoding. Decodes strict UTF-8, falling back per byte to
    * latin-1 (the same recovery surrogateescape+re-encode achieves
    * for single-byte encodings). */
  def decodeRepair(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val out = new StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b < 0x80) { out.append(b.toChar); i += 1 }
      else {
        // try multi-byte UTF-8 sequence
        val len =
          if ((b & 0xe0) == 0xc0) 2
          else if ((b & 0xf0) == 0xe0) 3
          else if ((b & 0xf8) == 0xf0) 4
          else 0
        // STRICT second-byte range per lead (RFC 3629 table): a
        // structural-only check would accept overlong (C0/C1, E0 80),
        // surrogate (ED A0..BF) and >U+10FFFF (F4 90.., F5..) forms,
        // which new String() turns into U+FFFD — destroying the bytes
        // the latin-1 fallback exists to preserve
        def b2ok: Boolean = {
          val b2 = bytes(i + 1) & 0xff
          b match {
            case 0xc0 | 0xc1 => false // overlong 2-byte
            case 0xe0 => b2 >= 0xa0 && b2 <= 0xbf // no overlong 3-byte
            case 0xed => b2 >= 0x80 && b2 <= 0x9f // no surrogates
            case 0xf0 => b2 >= 0x90 && b2 <= 0xbf // no overlong 4-byte
            case 0xf4 => b2 >= 0x80 && b2 <= 0x8f // ≤ U+10FFFF
            case x if x >= 0xf5 => false // > U+10FFFF
            case _ => (b2 & 0xc0) == 0x80
          }
        }
        val ok = len > 0 && i + len <= bytes.length &&
          (1 until len).forall(j => (bytes(i + j) & 0xc0) == 0x80) && b2ok
        if (ok) {
          out.append(new String(bytes, i, len, StandardCharsets.UTF_8))
          i += len
        } else {
          // undecodable byte → latin-1 recovery (what the reference's
          // re-encode achieves for ISO-8859-1-mojibake attrs)
          out.append(b.toChar)
          i += 1
        }
      }
    }
    out.toString
  }

  val decodeRepairUdf: UserDefinedFunction = udf(decodeRepair _)

  /** Map-valued form: fix every value of a string→string map
    * (`fix_dict` over ds.attrs, insitu recipe.py:56-61). */
  val repairMapUdf: UserDefinedFunction =
    udf { m: Map[String, String] =>
      if (m == null) null else m.map { case (k, v) => repair(k) -> repair(v) }
    }
}
