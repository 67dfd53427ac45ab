package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ingest.TarIo

/** snk_webdataset / src_webdataset + the TarIo container: the
  * properties the oracle gate can't state — the ustar byte layout
  * (proven against a HAND-BUILT header, not the writer's own
  * output), the WebDataset sample-contiguity/key-order contract
  * inside a shard, and the no-resync quarantine. */
class WebdatasetSpec extends SparkSpec {

  test("TarIo writer/reader round-trip across padding boundaries " +
      "(0, 511, 512, 513 bytes) and the 100-byte name limit") {
    val bos = new java.io.ByteArrayOutputStream()
    val sizes = Seq(0, 1, 511, 512, 513, 1000)
    sizes.zipWithIndex.foreach { case (n, i) =>
      TarIo.writeEntry(bos, s"e$i.bin",
        Array.tabulate(n)(j => ((i * 31 + j) % 251).toByte))
    }
    TarIo.finish(bos)
    val back = TarIo.readEntries(
      new java.io.ByteArrayInputStream(bos.toByteArray)).toVector
    assert(back.forall(_.err.isEmpty), back.map(_.err))
    assert(back.map(_.name) == sizes.indices.map(i => s"e$i.bin"))
    back.zip(sizes.zipWithIndex).foreach { case (e, (n, i)) =>
      assert(e.data.length == n)
      assert(e.data.zipWithIndex.forall { case (b, j) =>
        b == ((i * 31 + j) % 251).toByte })
    }
    intercept[IllegalArgumentException] {
      TarIo.writeEntry(new java.io.ByteArrayOutputStream(),
        "x" * 101, Array.emptyByteArray)
    }
    // the archive is block-aligned with the two-block terminator
    assert(bos.toByteArray.length % 512 == 0)
  }

  test("TarIo parses a HAND-BUILT ustar header (field offsets per " +
      "IEEE 1003.1, not the writer's own bytes — non-circular)") {
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit =
      System.arraycopy(s.getBytes("UTF-8"), 0, h, off, s.length)
    put(0, "hello.txt")
    put(100, "0000644") // mode
    put(108, "0000000"); put(116, "0000000")
    put(124, "00000000005") // size = 5, 11 octal digits
    put(136, "00000000000")
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    h(156) = '0'
    put(257, "ustar"); put(263, "00")
    var sum = 0L; (0 until 512).foreach(i => sum += (h(i) & 0xff))
    put(148, "%06o".format(sum)); h(154) = 0; h(155) = ' '
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(h)
    bos.write("world".getBytes("UTF-8"))
    bos.write(new Array[Byte](512 - 5)) // data padding
    bos.write(new Array[Byte](1024))    // terminator
    val es = TarIo.readEntries(
      new java.io.ByteArrayInputStream(bos.toByteArray)).toVector
    assert(es.size == 1 && es.head.err.isEmpty)
    assert(es.head.name == "hello.txt")
    assert(new String(es.head.data, "UTF-8") == "world")
  }

  test("a corrupt header quarantines as ONE error entry and stops " +
      "the file; entries before the damage survive") {
    val bos = new java.io.ByteArrayOutputStream()
    TarIo.writeEntry(bos, "ok.bin", Array[Byte](1, 2, 3))
    bos.write(Array.fill[Byte](512)('x'.toByte)) // garbage header
    TarIo.writeEntry(bos, "never-reached.bin", Array[Byte](4))
    TarIo.finish(bos)
    val es = TarIo.readEntries(
      new java.io.ByteArrayInputStream(bos.toByteArray)).toVector
    assert(es.map(_.name) == Vector("ok.bin", ""))
    assert(es.head.err.isEmpty && es(1).err.startsWith("tar:"),
      es.map(_.err))
  }

  test("readEntries onStop hook fires exactly once — on the clean " +
      "terminator, clean EOF, quarantine stop, and an empty archive " +
      "(the executor FD-release contract)") {
    def stops(bytes: Array[Byte]): Int = {
      var n = 0
      TarIo.readEntries(new java.io.ByteArrayInputStream(bytes),
        onStop = () => n += 1).foreach(_ => ())
      n
    }
    val bos = new java.io.ByteArrayOutputStream()
    TarIo.writeEntry(bos, "a.bin", Array[Byte](1))
    val noTerm = bos.toByteArray // ends at a header boundary, no marker
    TarIo.finish(bos)
    assert(stops(bos.toByteArray) == 1, "terminator path")
    assert(stops(noTerm) == 1, "clean-EOF path")
    val bad = new java.io.ByteArrayOutputStream()
    TarIo.writeEntry(bad, "ok.bin", Array[Byte](1))
    bad.write(Array.fill[Byte](512)('x'.toByte))
    assert(stops(bad.toByteArray) == 1, "quarantine-stop path")
    var m = 0
    val it = TarIo.readEntries(
      new java.io.ByteArrayInputStream(Array.emptyByteArray),
      onStop = () => m += 1)
    assert(!it.hasNext && m == 1, "empty archive fires at construction")
  }

  test("shard layout: samples are CONTIGUOUS (.bin then .json per " +
      "key) and keys ascend within a shard — the WebDataset " +
      "streaming contract") {
    val root = MultimodalQueries.wdsRootFor(spark, sf)
    val shard = Files.list(Paths.get(root)).iterator()
      .next() // any one shard
    val names = TarIo.readEntries(
      new java.io.BufferedInputStream(
        new java.io.FileInputStream(shard.toFile)))
      .map(_.name).toVector
    assert(names.nonEmpty && names.length % 2 == 0)
    val pairs = names.grouped(2).toVector
    pairs.foreach { p =>
      val k0 = p(0).stripSuffix(".bin")
      val k1 = p(1).stripSuffix(".json")
      assert(p(0).endsWith(".bin") && p(1).endsWith(".json") &&
        k0 == k1, s"sample must be a contiguous <key>.bin,<key>.json " +
        s"run, got $p")
    }
    val keys = pairs.map(_.head.stripSuffix(".bin"))
    assert(keys == keys.sorted, "keys must ascend within the shard")
    // memo: a second root request must not rebuild
    val before = MemoBuilds.count
    assert(MultimodalQueries.wdsRootFor(spark, sf) == root &&
      !MemoBuilds.labelsSince(before).contains("wds_fixture"))
  }

  test("a corrupt shard inside the glob quarantines without killing " +
      "healthy shards") {
    val dir = Files.createTempDirectory("graft-wds-spec")
    val good = new java.io.FileOutputStream(s"$dir/part-0.tar")
    TarIo.writeEntry(good, "000000001.bin", Array[Byte](9))
    TarIo.writeEntry(good, "000000001.json", "{}".getBytes("UTF-8"))
    TarIo.finish(good); good.close()
    Files.write(Paths.get(s"$dir/part-1.tar"),
      Array.fill[Byte](700)('z'.toByte))
    val rows = MultimodalQueries
      .tarEntries(spark, s"file:$dir/part-*.tar")
      .select(col("name"), col("err"), col("src_file")).collect()
    assert(rows.count(_.getString(1).isEmpty) == 2, rows.toSeq)
    assert(rows.exists(r => r.getString(1).startsWith("tar:") &&
      r.getString(2).endsWith("part-1.tar")), "bad shard must surface")
    dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
  }
}
