package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.geometry.Geometry
import graft.functions.SurrogateRepair

/** ScalaCheck properties (SURVEY.md §5.3): algebraic invariants of the
  * engine's geometry/overlap/dedup primitives, checked over generated
  * inputs rather than fixtures.
  */
object PropertySpec extends Properties("graft") {

  private val coord = Gen.chooseNum(-180.0, 180.0)
  private val boxGen: Gen[(Double, Double, Double, Double)] = for {
    w <- coord; s <- Gen.chooseNum(-90.0, 90.0)
    dw <- Gen.chooseNum(0.0, 40.0); dh <- Gen.chooseNum(0.0, 40.0)
  } yield (w, s, w + dw, s + dh)

  private def overlaps(
      a: (Double, Double, Double, Double),
      b: (Double, Double, Double, Double)): Boolean =
    a._1 <= b._3 && b._1 <= a._3 && a._2 <= b._4 && b._2 <= a._4

  property("bbox overlap is symmetric") = forAll(boxGen, boxGen) { (a, b) =>
    overlaps(a, b) == overlaps(b, a)
  }

  property("bbox overlap is reflexive") = forAll(boxGen) { a =>
    overlaps(a, a)
  }

  property("grid-cell bucketing finds every overlapping pair") =
    forAll(boxGen, boxGen) { (a, b) =>
      // the join_bbox_intersect scale path: cell-bucket candidates ⊇
      // true overlaps (residual predicate then exactifies)
      def cells(x: (Double, Double, Double, Double)): Set[(Int, Int)] =
        (for {
          cx <- math.floor(x._1 / 10).toInt to math.floor(x._3 / 10).toInt
          cy <- math.floor(x._2 / 10).toInt to math.floor(x._4 / 10).toInt
        } yield (cx, cy)).toSet
      !overlaps(a, b) || cells(a).intersect(cells(b)).nonEmpty
    }

  private val intervalGen: Gen[(Long, Long)] = for {
    s <- Gen.chooseNum(0L, 1000000L); d <- Gen.chooseNum(0L, 90000L)
  } yield (s, s + d)

  property("month-bucket interval join finds every overlapping pair") =
    forAll(intervalGen, intervalGen) { (a, b) =>
      // join_interval_overlap scale path with bucket width 30000
      val W = 30000L
      def buckets(x: (Long, Long)): Set[Long] =
        (x._1 / W to x._2 / W).toSet
      val overlap = a._1 <= b._2 && b._1 <= a._2
      !overlap || buckets(a).intersect(buckets(b)).nonEmpty
    }

  private val polylineGen: Gen[IndexedSeq[(Double, Double)]] =
    Gen.nonEmptyListOf(Gen.zip(coord, Gen.chooseNum(-90.0, 90.0)))
      .map(_.toIndexedSeq)

  property("douglas-peucker keeps endpoints and never grows") =
    forAll(polylineGen) { pts =>
      val simp = Geometry.douglasPeucker(pts, 0.001)
      simp.length <= pts.length &&
        simp.head == pts.head && simp.last == pts.last
    }

  property("douglas-peucker is idempotent") = forAll(polylineGen) { pts =>
    val once = Geometry.douglasPeucker(pts, 0.001)
    Geometry.douglasPeucker(once, 0.001) == once
  }

  property("surrogate repair is idempotent on repaired output") =
    forAll(Gen.asciiPrintableStr) { s =>
      val r = SurrogateRepair.repair(s)
      SurrogateRepair.repair(r) == r
    }

  property("decodeRepair never throws and round-trips valid UTF-8") =
    forAll { s: String =>
      val cleaned = SurrogateRepair.repair(s) // strip any lone surrogates
      SurrogateRepair.decodeRepair(
        cleaned.getBytes(java.nio.charset.StandardCharsets.UTF_8)) == cleaned
    }

  property("jaccard of identical shingle sets is 1") =
    forAll(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))) { words =>
      val text = words.mkString(" ")
      // dedup invariant f(f(x)) == f(x): identical docs always collide
      val h1 = java.security.MessageDigest.getInstance("SHA-256")
        .digest(text.getBytes("UTF-8")).toSeq
      val h2 = java.security.MessageDigest.getInstance("SHA-256")
        .digest(text.getBytes("UTF-8")).toSeq
      h1 == h2
    }

  private val identGen: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOf(Gen.frequency(
      (8, Gen.alphaNumChar), (1, Gen.const('_')), (1, Gen.const(':'))))
  } yield (h :: t).mkString

  private val cqlValueGen: Gen[Any] = Gen.oneOf(
    Gen.chooseNum(-1000000L, 1000000L),
    Gen.chooseNum(-1e6, 1e6),
    Gen.alphaNumStr.map(s => s + "'quoted"),
    Gen.oneOf(true, false))

  private val cqlNodeGen: Gen[graft.catalog.Cql2Filter.Node] = {
    import graft.catalog.Cql2Filter._
    val leaf: Gen[Node] = Gen.oneOf(
      for {
        p <- identGen; op <- Gen.oneOf("=", "<>", "<", "<=", ">", ">=")
        v <- cqlValueGen
      } yield Cmp(p, op, v),
      for {
        p <- identGen
        vs <- Gen.nonEmptyListOf(cqlValueGen).map(_.take(4))
      } yield In(p, vs),
      for { p <- identGen; s <- Gen.alphaNumStr } yield Like(p, s + "%"),
      for { p <- identGen; n <- Gen.oneOf(true, false) } yield IsNull(p, n),
      for {
        p <- identGen; lo <- cqlValueGen; hi <- cqlValueGen
      } yield Between(p, lo, hi),
      // CASEI forms: property side, value side (strings only), both
      for {
        p <- identGen; s <- Gen.alphaNumStr
        cv <- Gen.oneOf(true, false)
      } yield Cmp(p, "=", s, caseiProp = true, caseiValue = cv),
      for {
        p <- identGen
        vs <- Gen.nonEmptyListOf(cqlValueGen).map(_.take(3))
      } yield In(p, vs, casei = true),
      for { p <- identGen; s <- Gen.alphaNumStr } yield
        Like(p, s + "%", casei = true))
    def tree(depth: Int): Gen[Node] =
      if (depth == 0) leaf
      else Gen.frequency(
        (3, leaf),
        (1, Gen.zip(tree(depth - 1), tree(depth - 1)).map(t => And(t._1, t._2))),
        (1, Gen.zip(tree(depth - 1), tree(depth - 1)).map(t => Or(t._1, t._2))),
        (1, tree(depth - 1).map(Not)))
    tree(3)
  }

  private def render(n: graft.catalog.Cql2Filter.Node): String = {
    import graft.catalog.Cql2Filter._
    def lit(v: Any): String = v match {
      case s: String => "'" + s.replace("'", "''") + "'"
      case b: Boolean => if (b) "TRUE" else "FALSE"
      case other => other.toString
    }
    n match {
      case Cmp(p, op, v, cp, cv) =>
        val l = if (cp) s"CASEI($p)" else p
        val r = if (cv) s"CASEI(${lit(v)})" else lit(v)
        s"$l $op $r"
      case In(p, vs, c) =>
        s"${if (c) s"CASEI($p)" else p} IN (${vs.map(lit).mkString(", ")})"
      case Like(p, s, c) =>
        s"${if (c) s"CASEI($p)" else p} LIKE ${lit(s)}"
      case IsNull(p, neg) => s"$p IS ${if (neg) "NOT " else ""}NULL"
      case Between(p, lo, hi) => s"$p BETWEEN ${lit(lo)} AND ${lit(hi)}"
      case And(l, r) => s"(${render(l)}) AND (${render(r)})"
      case Or(l, r) => s"(${render(l)}) OR (${render(r)})"
      case Not(e) => s"NOT (${render(e)})"
      case other => sys.error(s"generator never emits $other")
    }
  }

  property("cql2 parser round-trips rendered ASTs") =
    forAll(cqlNodeGen) { node =>
      val text = render(node)
      val reparsed = new graft.catalog.Cql2Filter.Parser(text).parseAll()
      // doubles may re-render slightly differently; compare via
      // canonical re-render instead of AST equality
      render(reparsed) == text
    }

  private val wordGen = Gen.oneOf("a", "b", "cc", "ddd", "e", "")
  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 30)
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")

  property("repetition kernel is total on degenerate inputs") =
    Prop.all(
      graft.functions.TextFunctions
        .repetitionSignalsImpl("", 0L) == ((0.0, 0.0, 0.0)),
      graft.functions.TextFunctions
        .repetitionSignalsImpl(null, 0L) == ((0.0, 0.0, 0.0)))

  property("repetition kernel matches a brute-force reference") =
    forAll(textGen) { text =>
      // independent slow reference: materialize every gram list with
      // sliding(), count with groupBy, same tie-break and rounding
      def round4(x: Double) = BigDecimal(x + 1e-9)
        .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      val nChars = math.max(text.length.toLong, 1L)
      val words = text.split(" ", -1)
      def grams(n: Int): Seq[String] =
        if (words.length < n) Seq(text)
        else words.sliding(n).map(_.mkString(" ")).toSeq
      def top(n: Int): Double = {
        val counts = grams(n).groupBy(identity).view.mapValues(_.size)
        val (g, c) = counts.toSeq.maxBy { case (g, c) => (c, g) }
        round4(c.toDouble * g.length / nChars)
      }
      def dup(n: Int): Double = {
        val covered = grams(n).groupBy(identity).view.mapValues(_.size)
          .collect { case (g, c) if c > 1 => c.toLong * g.length }.sum
        if (covered == 0) 0.0 else round4(covered.toDouble / nChars)
      }
      val got = graft.functions.TextFunctions
        .repetitionSignalsImpl(text, nChars)
      got == ((top(2), top(3), dup(5)))
    }

  property("url template is injective on the 3-minute grid") =
    forAll(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(0L, 1000000L)) {
      (a, b) =>
        // distinct slots → distinct yyyyMMddHHmmss stamps (3-min grid)
        val fmt = java.time.format.DateTimeFormatter
          .ofPattern("yyyyMMddHHmmss").withZone(java.time.ZoneOffset.UTC)
        val ta = java.time.Instant.ofEpochSecond(a * 180)
        val tb = java.time.Instant.ofEpochSecond(b * 180)
        (a == b) == (fmt.format(ta) == fmt.format(tb))
    }

  // ---- HDF5 variable round-trip over the whole parameter space ----

  private val hdf5VarGen: Gen[graft.ingest.Hdf5Header.FixtureVar] = for {
    rank <- Gen.chooseNum(1, 3)
    dims <- Gen.listOfN(rank, Gen.chooseNum(1L, 9L))
    dtype <- Gen.oneOf("f8", "f4", "i8", "i4", "i2", "i1")
    chunked <- Gen.oneOf(true, false)
    // chunk dims may exceed, equal, or straddle the dims (edge chunks)
    chunks <- Gen.listOfN(rank, Gen.chooseNum(1L, 11L))
    deflate <- Gen.oneOf(true, false)
    shuffle <- Gen.oneOf(true, false)
    szip <- Gen.oneOf(true, false)
    fletcher <- Gen.oneOf(true, false)
    seed <- Gen.chooseNum(0, 1 << 20)
  } yield {
    val n = dims.product.toInt
    // values exactly representable in every generated dtype: small ints
    val values = Array.tabulate(n)(i => ((seed + i * 31) % 101 - 50).toDouble)
    // szip handles ≤32-bit samples and composes with fletcher only
    val szipOk = chunked && szip && dtype != "f8" && dtype != "i8"
    graft.ingest.Hdf5Header.FixtureVar(
      s"v$seed", dims, values, dtype,
      chunks = if (chunked) Some(chunks) else None,
      deflate = chunked && deflate && !szipOk,
      shuffle = chunked && shuffle && !szipOk,
      szip = szipOk, fletcher = chunked && fletcher)
  }

  property("hdf5 variables round-trip for any rank/dtype/chunking") =
    forAll(Gen.listOfN(2, hdf5VarGen), Gen.oneOf(true, false)) {
      (vars, dense) =>
      // distinct names (the SNOD requires unique sorted names); the
      // same variables must decode identically from a symbol-table
      // group and a dense (fractal-heap) group
      val named = vars.zipWithIndex.map { case (v, i) =>
        v.copy(name = s"var_$i")
      }
      val bytes = graft.ingest.Hdf5Header.buildDataFile(
        Seq(("id", graft.ingest.NetcdfClassic.CharAttr("prop"))), named,
        denseLinks = dense)
      val f = graft.ingest.Hdf5Header.readFile(bytes)
      named.forall { v =>
        val ds = f.dataset(v.name)
        ds.dims == v.dims && ds.data.toSeq == v.values.toSeq
      }
    }

  // ---- szip (CCSDS-Rice) codec round-trip over its parameter space ----

  property("szip encode/decode round-trips for any mode/geometry/data") = {
    import graft.ingest.Szip
    val gen = for {
      n <- Gen.oneOf(8, 16, 32)
      j <- Gen.oneOf(8, 10, 16, 32)
      blocksPerScan <- Gen.chooseNum(1, 9)
      nn <- Gen.oneOf(true, false)
      // shapes that steer the coder through its options: flat runs
      // (zero-blocks), smooth ramps (small k), and full-width noise
      // (no-compression beats any split)
      shape <- Gen.oneOf("flat", "ramp", "noise", "mixed")
      count <- Gen.chooseNum(1, 700)
      seed <- Gen.chooseNum(1, 1 << 20)
    } yield (n, j, blocksPerScan, nn, shape, count, seed)
    forAll(gen) { case (n, j, blocksPerScan, nn, shape, count, seed) =>
      val maxv = if (n == 32) 0xFFFFFFFFL else (1L << n) - 1
      val rnd = new scala.util.Random(seed)
      val samples = Array.tabulate(count) { i =>
        shape match {
          case "flat" => (seed.toLong * 7) % (maxv + 1)
          case "ramp" => math.min(maxv, seed.toLong % 1000 + i)
          case "noise" => rnd.nextLong().abs % (maxv + 1)
          case _ => if (i % 40 < 20) 42L else rnd.nextLong().abs % (maxv + 1)
        }
      }
      val esz = n / 8
      val raw = new Array[Byte](count * esz)
      samples.zipWithIndex.foreach { case (v, i) =>
        (0 until esz).foreach(b =>
          raw(i * esz + b) = ((v >>> (8 * b)) & 0xFF).toByte)
      }
      val mask = Szip.Raw | Szip.LSB | (if (nn) Szip.NN else Szip.EC)
      val p = Szip.Params(mask, n, j, j * blocksPerScan)
      Szip.decode(Szip.encode(raw, p), p, count).toSeq == raw.toSeq
    }
  }

  // ---- exact-intersects predicate invariants ----

  private val geomGen: Gen[Geometry.Geom] = {
    val pt = for { x <- coord; y <- Gen.chooseNum(-90.0, 90.0) }
      yield Geometry.GPoint(x, y)
    val line = for {
      n <- Gen.chooseNum(2, 6)
      pts <- Gen.listOfN(n, Gen.zip(coord, Gen.chooseNum(-90.0, 90.0)))
    } yield Geometry.GLine(pts.toIndexedSeq)
    val poly = boxGen.map { case (w, s, e, n) =>
      Geometry.GPolygon(IndexedSeq(IndexedSeq(
        (w, s), (e, s), (e, n), (w, n), (w, s))))
    }
    Gen.oneOf(pt, line, poly)
  }

  property("exact intersects is symmetric") =
    forAll(geomGen, geomGen) { (a, b) =>
      Geometry.intersects(a, b) == Geometry.intersects(b, a)
    }

  property("exact intersects is reflexive for non-degenerate geometries") =
    forAll(geomGen) { g => Geometry.intersects(g, g) }

  property("exact intersects implies envelope overlap") =
    forAll(geomGen, geomGen) { (a, b) =>
      // the envelope PREFILTER must never discard a true intersection
      // (candidates ⊇ matches — the index-then-recheck contract)
      !Geometry.intersects(a, b) || {
        val (aw, as_, ae, an) = Geometry.envelope(a)
        val (bw, bs, be, bn) = Geometry.envelope(b)
        aw <= be && bw <= ae && as_ <= bn && bs <= an
      }
    }

  // ---- media decoder invariants ----

  property("pgm round-trip is exact on the 8-bit grid") =
    forAll(Gen.chooseNum(1, 40), Gen.chooseNum(1, 40),
      Gen.chooseNum(0, 1 << 20)) { (w, h, seed) =>
      import graft.multimodal.RealDecoders._
      val img = GrayImage(w, h,
        Array.tabulate(w * h)(i => ((seed + i * 7) % 256) / 255f))
      val back = decodeNetpbm(encodePgm(img))
      back.width == w && back.height == h &&
        back.luma.zip(img.luma).forall { case (a, b) =>
          math.abs(a - b) <= 0.5f / 255f + 1e-6f
        }
    }

  property("cf time scale is linear: t(v+1unit) - t(v) = unit") =
    forAll(Gen.oneOf("seconds", "hours", "days"),
      Gen.chooseNum(-50000.0, 50000.0)) { (unit, v) =>
      graft.ingest.Hdf5InsituSource.cfEpoch(s"$unit since 1970-01-01")
        .exists { case (perUnit, epoch) =>
          val a = epoch + Math.round(v * perUnit)
          val b = epoch + Math.round((v + 1) * perUnit)
          // rounding keeps unit steps exact far beyond any real axis
          b - a == perUnit
        }
    }

  property("fletcher32 detects any single-byte corruption") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-128, 127).map(_.toByte)),
      Gen.chooseNum(0, Int.MaxValue), Gen.chooseNum(1, 255)) {
      (bytes, posSeed, delta) =>
      val data = bytes.toArray
      val sum = graft.ingest.Hdf5Header.fletcher32(data, data.length)
      // checksum is a 32-bit value and is stable
      val stable = sum == graft.ingest.Hdf5Header.fletcher32(
        data.clone(), data.length) && (sum >>> 32) == 0
      // flip one byte by a nonzero delta: the checksum must move
      // (Fletcher detects ALL single-byte errors by construction)
      val pos = posSeed % data.length
      val corrupt = data.clone()
      corrupt(pos) = (corrupt(pos) + delta).toByte
      stable && (corrupt(pos) == data(pos) || // wrapped to same value
        graft.ingest.Hdf5Header.fletcher32(corrupt, corrupt.length) != sum)
    }

  property("szip decode on corrupt streams stays inside the quarantine types") = {
    import graft.ingest.Szip
    forAll(
      Gen.chooseNum(0, 120).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)),
      Gen.oneOf(8, 16, 32), Gen.chooseNum(1, 200)) { (bytes, n, count) =>
      // the HDF5 chunk path wraps szip failures into the IOException
      // quarantine — any other escape (AIOOBE from the bit reader)
      // would kill a granule-ingest task
      try { Szip.decode(bytes, Szip.Params(Szip.NN, n, 16, 128), count); true }
      catch {
        case _: java.io.IOException | _: IllegalArgumentException => true
        case e: Throwable =>
          println(s"escaped ${e.getClass.getName}: ${e.getMessage}")
          false
      }
    }
  }

  property("classic netCDF header parse stays inside the quarantine types") =
    forAll(Gen.oneOf(
      for {
        n <- Gen.chooseNum(0, 300)
        bs <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
        magic <- Gen.oneOf(true, false)
      } yield {
        val noise = bs.toArray
        if (magic && noise.length >= 4) {
          noise(0) = 'C'; noise(1) = 'D'; noise(2) = 'F'; noise(3) = 1
        }
        noise
      },
      for {
        ver <- Gen.oneOf(1, 2, 5)
        nStomp <- Gen.chooseNum(1, 10)
        stomps <- Gen.listOfN(nStomp,
          Gen.zip(Gen.chooseNum(0, 10000), Gen.chooseNum(-128, 127)))
      } yield {
        val b = graft.ingest.NetcdfClassic.buildHeader(
          Seq(("id", graft.ingest.NetcdfClassic.CharAttr("fuzz")),
            ("n", graft.ingest.NetcdfClassic.IntAttr(Seq(7)))),
          dims = Seq(("time", 24L)), version = ver)
        stomps.foreach { case (p, v) => b(p % b.length) = v.toByte }
        b
      })) { bytes =>
      // NetcdfGranuleSource quarantines IOException | IllegalArgumentException
      try {
        graft.ingest.NetcdfClassic.readHeader(new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(bytes)))
        true
      } catch {
        case _: java.io.IOException | _: IllegalArgumentException => true
        case e: Throwable =>
          println(s"escaped ${e.getClass.getName}: ${e.getMessage}")
          false
      }
    }

  property("HDF5 decode on corrupted granules stays inside the quarantine types") =
    forAll(Gen.oneOf(
      // pure noise (sometimes with a valid magic prefix)
      for {
        n <- Gen.chooseNum(0, 400)
        bs <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
        magic <- Gen.oneOf(true, false)
      } yield {
        val noise = bs.toArray
        if (magic && noise.length >= 8)
          Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n') ++
            noise.drop(8)
        else noise
      },
      // a valid netcdf4 fixture with random bytes stomped
      for {
        nStomp <- Gen.chooseNum(1, 16)
        stomps <- Gen.listOfN(nStomp,
          Gen.zip(Gen.chooseNum(0, 100000), Gen.chooseNum(-128, 127)))
      } yield {
        val b = graft.ingest.Hdf5Header.buildDataFile(
          Seq(("id", graft.ingest.NetcdfClassic.CharAttr("fuzz"))),
          Seq(graft.ingest.Hdf5Header.FixtureVar("LONGITUDE", Seq(24L),
            Array.tabulate(24)(_ * 0.5), chunks = Some(Seq(16L)),
            deflate = true, shuffle = true)))
        stomps.foreach { case (p, v) => b(p % b.length) = v.toByte }
        b
      })) { bytes =>
      // Hdf5InsituSource quarantines IOException | IllegalArgumentException
      // ONLY — anything else (AIOOBE, NegativeArraySize, ...) would kill
      // the corpus job on one corrupt granule
      try {
        val f = graft.ingest.Hdf5Header.readFile(bytes)
        f.rootAttrs; f.datasetNames.foreach(n => f.dataset(n).data)
        true
      } catch {
        case _: java.io.IOException | _: IllegalArgumentException => true
        case e: Throwable =>
          println(s"escaped ${e.getClass.getName}: ${e.getMessage}")
          false
      }
    }

  property("MP4 parse on arbitrary bytes only ever raises the quarantine type") =
    forAll(Gen.oneOf(
      // pure noise
      Gen.chooseNum(0, 600).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)),
      // structured corruption: a valid fixture with random bytes stomped
      for {
        nStomp <- Gen.chooseNum(1, 12)
        stomps <- Gen.listOfN(nStomp,
          Gen.zip(Gen.chooseNum(0, 10000), Gen.chooseNum(-128, 127)))
      } yield {
        val b = graft.multimodal.Mp4Container.encodeMp4(7L,
          Array(30, 41, 25, 60, 33), syncEvery = 2, timescale = 1000,
          sampleDelta = 40, width = 32, height = 24)
        stomps.foreach { case (p, v) => b(p % b.length) = v.toByte }
        b
      })) { bytes =>
      // the quarantine contract: NonFatal callers rely on parse never
      // escaping with AIOOBE/NegativeArraySize/OOM on adversarial input
      try { graft.multimodal.Mp4Container.parse(bytes); true }
      catch {
        case _: IllegalArgumentException => true
        case e: Throwable =>
          println(s"escaped ${e.getClass.getName}: ${e.getMessage}")
          false
      }
    }

  private def hllRegs(keys: Seq[Long]): Map[Long, Long] =
    keys.foldLeft(Map.empty[Long, Long]) { (m, k) =>
      val reg = graft.functions.HllSketch.register(k, 12)
      val (b, r) = (reg / 64, reg % 64)
      m.updated(b, math.max(m.getOrElse(b, 0L), r))
    }

  property("hll register packs bucket < 2^p and rank in [1, 64-p+1]") =
    forAll { (k: Long) =>
      val reg = graft.functions.HllSketch.register(k, 12)
      val (b, r) = (reg / 64, reg % 64)
      b >= 0 && b < 4096 && r >= 1 && r <= 53
    }

  property("hll register files merge by max-per-bucket (sketch algebra)") =
    forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (xs, ys) =>
      val merged = (hllRegs(xs).toSeq ++ hllRegs(ys).toSeq)
        .groupMapReduce(_._1)(_._2)(math.max)
      merged == hllRegs(xs ++ ys)
    }

  property("hll estimate lands within 10% on 200..4000 distinct keys") =
    forAll(Gen.chooseNum(200, 4000), Gen.long) { (n, seed) =>
      // distinct keys from a splitmix stream — the generator itself
      // may collide; count the actual distinct set
      val keys = (0 until n).map(i =>
        graft.functions.HllSketch.mix(seed + i)).distinct
      val regs = hllRegs(keys)
      val m = 4096
      val v = m - regs.size
      val sn = regs.valuesIterator.map(r => BigInt(1) << (53 - r).toInt).sum
      val alpha = 0.7213 / (1 + 1.079 / m) * m * m
      val eraw = alpha / (v.toDouble + sn.toDouble / 9007199254740992.0)
      val est = if (eraw <= 2.5 * m && v > 0)
        m * math.log(m.toDouble / v) else eraw
      math.abs(est - keys.size) <= 0.10 * keys.size
    }

  property("MP4 encode/parse round-trips the full sample table") =
    forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(1, 200)).map(_.take(64)),
      Gen.chooseNum(1, 7), Gen.chooseNum(1, 9),
      Gen.chooseNum(1L, 1000000L)) { (sizesL, syncEvery, chunkSize, seed) =>
      import graft.multimodal.Mp4Container
      val sizes = sizesL.toArray
      val payload = Mp4Container.encodeMp4(seed, sizes, syncEvery,
        timescale = 1000, sampleDelta = 40, width = 32, height = 24,
        chunkSize = chunkSize)
      val t = Mp4Container.parse(payload).tracks.head
      val expectSync = sizes.indices.filter(_ % syncEvery == 0)
      val frames = Mp4Container.keyframeBytes(payload, maxFrames = 64)
      t.nSamples == sizes.length &&
        t.durationMs == sizes.length * 40L &&
        t.keyframes.map(_.sample) == expectSync.map(_ + 1) &&
        t.keyframes.map(_.size) == expectSync.map(i => sizes(i).toLong) &&
        t.keyframes.map(_.timeMs) == expectSync.map(_ * 40L) &&
        // extracted bytes match the deterministic mdat fill exactly
        frames.zip(expectSync).forall { case (f, i) =>
          f.length == sizes(i) && f.zipWithIndex.forall { case (b, j) =>
            (b & 0xff) == ((seed + i + j) % 251).toInt
          }
        }
    }

  private val tarEntryGen = for {
    n <- Gen.chooseNum(0, 2000)
    seed <- Gen.chooseNum(0, 250)
    name <- Gen.alphaNumStr.map(_.take(40)).suchThat(_.nonEmpty)
  } yield (name, Array.tabulate(n)(j => ((seed + j) % 251).toByte))

  property("TarIo round-trips arbitrary entry lists byte-exactly " +
      "and block-aligned") =
    forAll(Gen.listOfN(6, tarEntryGen)) { entries =>
      // distinct names (tar permits repeats, but exact-match compare
      // is cleaner keyed); suffix the index
      val named = entries.zipWithIndex.map { case ((nm, d), i) =>
        (s"$i-$nm", d) }
      val bos = new java.io.ByteArrayOutputStream()
      named.foreach { case (nm, d) =>
        graft.ingest.TarIo.writeEntry(bos, nm, d) }
      graft.ingest.TarIo.finish(bos)
      val bytes = bos.toByteArray
      val back = graft.ingest.TarIo.readEntries(
        new java.io.ByteArrayInputStream(bytes)).toVector
      bytes.length % 512 == 0 &&
        back.forall(_.err.isEmpty) &&
        back.map(_.name) == named.map(_._1).toVector &&
        back.zip(named).forall { case (e, (_, d)) =>
          java.util.Arrays.equals(e.data, d) }
    }

  property("TarIo on arbitrary garbage never throws - every entry is " +
      "clean or a quarantine, and a quarantine ends the file") =
    forAll(Gen.listOf(Gen.chooseNum(0, 255).map(_.toByte))) { junk =>
      val es = graft.ingest.TarIo.readEntries(
        new java.io.ByteArrayInputStream(junk.toArray)).toVector
      val errIdx = es.indexWhere(_.err.nonEmpty)
      (errIdx == -1 || errIdx == es.length - 1) &&
        es.count(_.err.nonEmpty) <= 1
    }
}
