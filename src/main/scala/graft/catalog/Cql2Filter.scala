package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode}
import org.apache.spark.sql.graftbridge.GraftExpr
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** CQL2-text filter compiler (SURVEY.md §3.3: stac-fastapi accepts a
  * CQL2 `filter` parameter and pgstac evaluates it;
  * docker-compose.yml:1-28). This is the practical subset the STAC
  * API's item-search extension uses: comparisons, IN, LIKE,
  * IS NULL, AND/OR/NOT, parentheses — compiled to a Catalyst Column
  * so Catalyst can push the resulting predicates into the parquet
  * scan like any native filter.
  *
  * Properties resolve to top-level item columns when present
  * (pushdown-able) and fall back to the open `properties` map.
  *
  * Grammar (case-insensitive keywords):
  *   expr     := term (OR term)*
  *   term     := factor (AND factor)*
  *   factor   := NOT factor | '(' expr ')' | spatial | temporal
  *               | predicate
  *   predicate:= operand op (literal | CASEI '(' string ')')
  *               | ident [NOT] BETWEEN literal AND literal
  *               | ident IN '(' lit (',' lit)* ')'
  *               | ident LIKE string | ident IS [NOT] NULL
  *   operand  := ident | CASEI '(' ident ')'
  *   spatial  := S_INTERSECTS '(' ident ',' wkt ')'
  *   temporal := (T_INTERSECTS | ANYINTERACTS)
  *               '(' ident ',' INTERVAL '(' string ',' string ')' ')'
  *   wkt      := POINT | LINESTRING | POLYGON | BBOX literal
  *   op       := '=' | '<>' | '<' | '<=' | '>' | '>='
  *   literal  := number | string | TRUE | FALSE
  *
  * The spatial/temporal/advanced operators mirror the classes pgstac
  * v0.9.2 serves behind the reference (docker-compose.yml:32):
  * s_intersects compiles to the same envelope-prefilter + exact
  * recheck shape as CatalogQuery's `intersects`, t_intersects /
  * anyinteracts to the interval-overlap predicate, BETWEEN and
  * CASEI() to plain Catalyst comparisons — all pushdown-eligible.
  */
object Cql2Filter {

  // ---- AST ----
  sealed trait Node
  case class Cmp(prop: String, op: String, value: Any,
      caseiProp: Boolean = false, caseiValue: Boolean = false) extends Node
  case class In(prop: String, values: Seq[Any],
      casei: Boolean = false) extends Node
  case class Like(prop: String, pattern: String,
      casei: Boolean = false) extends Node
  case class IsNull(prop: String, negated: Boolean) extends Node
  case class Between(prop: String, lo: Any, hi: Any) extends Node
  case class SIntersects(prop: String,
      geom: graft.geometry.Geometry.Geom) extends Node
  case class TIntersects(prop: String,
      lo: java.sql.Timestamp, hi: java.sql.Timestamp) extends Node
  case class And(l: Node, r: Node) extends Node
  case class Or(l: Node, r: Node) extends Node
  case class Not(e: Node) extends Node

  /** Compile a CQL2-text expression against an item DataFrame's
    * columns (`topCols`); unknown properties read the properties map. */
  def compile(text: String, topCols: Set[String]): Column =
    toColumn(new Parser(text).parseAll(), topCols)

  /** Compile a CQL2-JSON expression (`filter-lang: cql2-json` —
    * stac-fastapi accepts both encodings of the filter extension,
    * reference query surface docker-compose.yml:1-28). The JSON form
    * maps onto the SAME AST as the text compiler, so both languages
    * share one Column translation and cannot drift. */
  def compileJson(json: String, topCols: Set[String]): Column =
    toColumn(parseJson(json), topCols)

  /** CQL2-JSON → AST (OGC 21-065 JSON encoding): every node is
    * `{"op": .., "args": [..]}`; property operands are
    * `{"property": name}`; literals are JSON scalars; IN's second arg
    * is a JSON array. and/or are n-ary in the spec and fold left. */
  def parseJson(json: String): Node = {
    val root =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"cql2-json is not valid JSON: ${e.getMessage}")
      }
    fromJsonNode(root)
  }

  private def fromJsonNode(
      n: com.fasterxml.jackson.databind.JsonNode): Node = {
    require(n != null && n.isObject && n.has("op"),
      s"cql2-json node must be an object with an 'op': $n")
    val op = n.get("op").asText()
    val argsNode = n.get("args")
    val args: Seq[com.fasterxml.jackson.databind.JsonNode] =
      if (argsNode == null || !argsNode.isArray) Seq.empty
      else (0 until argsNode.size).map(argsNode.get)
    def propOf(a: com.fasterxml.jackson.databind.JsonNode): String = {
      require(a.isObject && a.has("property"),
        s"expected a {\"property\": ..} operand, got $a")
      a.get("property").asText()
    }
    // a property operand, optionally wrapped in {"op":"casei","args":[..]}
    def propOperand(
        a: com.fasterxml.jackson.databind.JsonNode): (String, Boolean) =
      if (a.isObject && a.has("op") &&
        a.get("op").asText().equalsIgnoreCase("casei")) {
        val inner = a.get("args")
        require(inner != null && inner.isArray && inner.size == 1,
          s"'casei' needs 1 arg: $a")
        (propOf(inner.get(0)), true)
      } else (propOf(a), false)
    // integers parse as Long and floats as Double — the same literal
    // types the text parser produces, so toColumn's try-cast rules
    // apply identically to both encodings
    def litOf(a: com.fasterxml.jackson.databind.JsonNode): Any =
      if (a.isTextual) a.asText()
      else if (a.isBoolean) a.asBoolean()
      else if (a.isIntegralNumber) a.asLong()
      else if (a.isNumber) a.asDouble()
      else throw new IllegalArgumentException(
        s"unsupported cql2-json literal: $a")
    def litOperand(
        a: com.fasterxml.jackson.databind.JsonNode): (Any, Boolean) =
      if (a.isObject && a.has("op") &&
        a.get("op").asText().equalsIgnoreCase("casei")) {
        val inner = a.get("args")
        require(inner != null && inner.isArray && inner.size == 1,
          s"'casei' needs 1 arg: $a")
        (litOf(inner.get(0)), true)
      } else (litOf(a), false)
    def nAry(mk: (Node, Node) => Node): Node = {
      require(args.length >= 2, s"'$op' needs >= 2 args, got ${args.length}")
      args.map(fromJsonNode).reduceLeft(mk)
    }
    op.toLowerCase match {
      case "and" => nAry(And.apply)
      case "or" => nAry(Or.apply)
      case "not" =>
        require(args.length == 1, s"'not' needs 1 arg, got ${args.length}")
        Not(fromJsonNode(args.head))
      case "=" | "<>" | "<" | "<=" | ">" | ">=" =>
        require(args.length == 2, s"'$op' needs 2 args, got ${args.length}")
        val (p, cp) = propOperand(args(0))
        val (v, cv) = litOperand(args(1))
        Cmp(p, op, v, caseiProp = cp, caseiValue = cv)
      case "like" =>
        require(args.length == 2, s"'like' needs 2 args")
        val (p, cp) = propOperand(args(0))
        val (v, cv) = litOperand(args(1))
        v match {
          case s: String => Like(p, s, casei = cp || cv)
          case other => throw new IllegalArgumentException(
            s"LIKE needs a string pattern, got $other")
        }
      case "in" =>
        require(args.length == 2 && args(1).isArray,
          s"'in' needs (property, array) args: $n")
        val (p, cp) = propOperand(args(0))
        In(p, (0 until args(1).size).map(i => litOf(args(1).get(i))),
          casei = cp)
      case "between" =>
        // OGC 21-065: between(value, low, high), bounds inclusive
        require(args.length == 3, s"'between' needs 3 args, got ${args.length}")
        Between(propOf(args(0)), litOf(args(1)), litOf(args(2)))
      case "s_intersects" =>
        require(args.length == 2, s"'s_intersects' needs 2 args")
        val g = args(1)
        require(g.isObject && g.has("type"),
          s"s_intersects: expected a GeoJSON geometry, got $g")
        val geom = graft.geometry.Geometry.parseGeoJson(g.toString)
          .getOrElse(throw new IllegalArgumentException(
            s"s_intersects: unsupported or malformed GeoJSON: $g"))
        SIntersects(propOf(args(0)), geom)
      case "t_intersects" | "anyinteracts" =>
        require(args.length == 2, s"'$op' needs 2 args")
        val (lo, hi) = temporalLiteral(args(1))
        TIntersects(propOf(args(0)), lo, hi)
      case "isnull" =>
        require(args.length == 1, s"'isNull' needs 1 arg")
        IsNull(propOf(args.head), negated = false)
      case other => throw new IllegalArgumentException(
        s"unsupported cql2-json op: '$other'")
    }
  }

  /** CQL2-JSON temporal literal: `{"interval": [lo, hi]}` (".." opens
    * an end) or `{"timestamp": "..."}` / a bare RFC 3339 string for an
    * instant. */
  private def temporalLiteral(
      a: com.fasterxml.jackson.databind.JsonNode):
      (java.sql.Timestamp, java.sql.Timestamp) =
    if (a.isObject && a.has("interval")) {
      val iv = a.get("interval")
      require(iv.isArray && iv.size == 2,
        s"temporal interval must be a 2-element array: $a")
      (parseInstant(iv.get(0).asText(), openLo),
        parseInstant(iv.get(1).asText(), openHi))
    } else if (a.isObject && a.has("timestamp")) {
      val t = parseInstant(a.get("timestamp").asText(), openLo)
      (t, t)
    } else if (a.isTextual) {
      val t = parseInstant(a.asText(), openLo)
      (t, t)
    } else throw new IllegalArgumentException(
      s"expected a temporal literal ({interval}/{timestamp}), got $a")

  private val openLo = java.sql.Timestamp.valueOf("0001-01-01 00:00:00")
  private val openHi = java.sql.Timestamp.valueOf("9999-12-31 23:59:59")

  /** RFC 3339 instant (date-only tolerated, UTC); `..`/empty → open. */
  private def parseInstant(s: String,
      open: java.sql.Timestamp): java.sql.Timestamp =
    if (s == null || s.isEmpty || s == "..") open
    else try java.sql.Timestamp.from(
      java.time.OffsetDateTime.parse(s).toInstant)
    catch {
      case _: java.time.format.DateTimeParseException =>
        try java.sql.Timestamp.from(java.time.LocalDate.parse(s)
          .atStartOfDay.toInstant(java.time.ZoneOffset.UTC))
        catch {
          case _: java.time.format.DateTimeParseException =>
            throw new IllegalArgumentException(
              s"temporal literal is not RFC 3339: '$s'")
        }
    }

  /** TRY-mode cast: a map property value that doesn't parse as the
    * literal's type becomes null (three-valued ⇒ row filtered out)
    * instead of an ANSI CAST_INVALID_INPUT crash killing the whole
    * search — properties are stringly-typed and user-authored. */
  private def tryCast(c: Column, dt: DataType): Column =
    GraftExpr.toColumn(Cast(GraftExpr.toExpr(c), dt, None, EvalMode.TRY))

  def toColumn(n: Node, topCols: Set[String]): Column = {
    // try_element_at: a missing map key is null (three-valued logic),
    // not a MAP_KEY_DOES_NOT_EXIST crash under Spark 4's default ANSI
    // mode — STAC properties are heterogeneous by design
    def prop(p: String): Column =
      if (topCols.contains(p)) col(p)
      else try_element_at(col("properties"), lit(p))
    // map-fallback properties are strings: comparing against a number
    // or boolean literal must not ANSI-crash on non-numeric values
    def typedSides(p: String, v: Any): (Column, Column) = {
      val c = prop(p)
      if (topCols.contains(p)) (c, lit(v))
      else v match {
        case n: Long => (tryCast(c, DoubleType), lit(n.toDouble))
        case d: Double => (tryCast(c, DoubleType), lit(d))
        case b: Boolean => (tryCast(c, BooleanType), lit(b))
        case other => (c, lit(other))
      }
    }
    n match {
      case Cmp(p, op, v, cp, cv) =>
        var (c, l) = typedSides(p, v)
        // CASEI(): case-insensitive comparison — lower() both sides
        // that asked for it (string semantics per OGC 21-065)
        if (cp) c = lower(c)
        if (cv) l = lower(l)
        op match {
          case "=" => c === l
          case "<>" => c =!= l
          case "<" => c < l
          case "<=" => c <= l
          case ">" => c > l
          case ">=" => c >= l
        }
      case In(p, vs, true) =>
        // case-insensitive membership: values lowercased at compile
        // time, the property column once per row
        lower(prop(p)).isin(vs.map {
          case s: String => s.toLowerCase
          case v => v
        }: _*)
      case In(p, vs, _) if !topCols.contains(p) &&
          vs.forall(v => v.isInstanceOf[Long] || v.isInstanceOf[Double]) =>
        // homogeneous numeric list: ONE try_cast + one isin
        tryCast(prop(p), DoubleType).isin(vs.map {
          case n: Long => n.toDouble
          case d: Double => d
        }: _*)
      case In(p, vs, _) if !topCols.contains(p) =>
        // MIXED-type list on a map-fallback property: each value
        // compares through its OWN try-cast branch (numeric values
        // against try_cast-to-double, strings/others against the raw
        // string), OR-ed together — `x IN (1, 'a')` must not fall
        // into Spark's ANSI common-type coercion, which would crash
        // the whole search on the first non-numeric property value
        vs.map { v =>
          val (c, l) = typedSides(p, v)
          c === l
        }.reduceOption(_ || _).getOrElse(lit(false))
      case In(p, vs, _) => prop(p).isin(vs: _*)
      case Like(p, pat, casei) =>
        if (casei) lower(prop(p)).like(pat.toLowerCase)
        else prop(p).like(pat)
      case IsNull(p, false) => prop(p).isNull
      case IsNull(p, true) => prop(p).isNotNull
      case Between(p, lo, hi) =>
        // bounds inclusive (OGC 21-065); each bound through its own
        // try-cast so a stringly map property can't ANSI-crash
        val (c1, l1) = typedSides(p, lo)
        val (c2, l2) = typedSides(p, hi)
        c1 >= l1 && c2 <= l2
      case SIntersects(p, geom) =>
        // the PostGIS index-then-recheck shape (same as CatalogQuery's
        // `intersects`): envelope prefilter on the pushdown-able bbox
        // scalars when the item frame carries them, exact test after —
        // the query geometry parsed ONCE at compile time, not per row
        val exact = graft.geometry.Geometry.intersectsWith(geom)(prop(p))
        if (Set("bbox_w", "bbox_e", "bbox_s", "bbox_n").subsetOf(topCols)) {
          val (w, s, e, nn) = graft.geometry.Geometry.envelope(geom)
          col("bbox_w") <= e && lit(w) <= col("bbox_e") &&
            col("bbox_s") <= nn && lit(s) <= col("bbox_n") && exact
        } else exact
      case TIntersects(p, lo, hi) =>
        // `datetime` on a STAC item means its [start, end] interval →
        // interval-overlap; a plain timestamp column → containment
        if (p == "datetime" && topCols.contains("start_datetime") &&
          topCols.contains("end_datetime"))
          col("start_datetime") <= lit(hi) && lit(lo) <= col("end_datetime")
        else {
          val c =
            if (topCols.contains(p)) col(p)
            else tryCast(prop(p),
              org.apache.spark.sql.types.TimestampType)
          c >= lit(lo) && c <= lit(hi)
        }
      case And(l, r) => toColumn(l, topCols) && toColumn(r, topCols)
      case Or(l, r) => toColumn(l, topCols) || toColumn(r, topCols)
      case Not(e) => !toColumn(e, topCols)
    }
  }

  // ---- recursive-descent parser ----
  final class Parser(input: String) {
    private var pos = 0

    def parseAll(): Node = {
      val e = expr()
      skipWs()
      require(pos >= input.length, s"trailing input at $pos: '${rest()}'")
      e
    }

    private def rest() = input.substring(math.min(pos, input.length))
    private def skipWs(): Unit =
      while (pos < input.length && input.charAt(pos).isWhitespace) pos += 1

    private def peekKeyword(kw: String): Boolean = {
      skipWs()
      val end = pos + kw.length
      def identChar(c: Char) = c.isLetterOrDigit || c == '_' || c == ':'
      end <= input.length &&
        input.substring(pos, end).equalsIgnoreCase(kw) &&
        // boundary must not be an identifier char: 'not_processed' is
        // a property name, not the NOT keyword
        (end == input.length || !identChar(input.charAt(end)))
    }

    private def eatKeyword(kw: String): Boolean = {
      if (peekKeyword(kw)) { pos += kw.length; true } else false
    }

    private def expr(): Node = {
      var l = term()
      while (eatKeyword("OR")) l = Or(l, term())
      l
    }

    private def term(): Node = {
      var l = factor()
      while (eatKeyword("AND")) l = And(l, factor())
      l
    }

    private def factor(): Node = {
      skipWs()
      if (eatKeyword("NOT")) Not(factor())
      else if (peekCall("S_INTERSECTS")) spatialPredicate()
      else if (peekCall("T_INTERSECTS") || peekCall("ANYINTERACTS"))
        temporalPredicate()
      else if (pos < input.length && input.charAt(pos) == '(') {
        pos += 1
        val e = expr()
        skipWs()
        require(pos < input.length && input.charAt(pos) == ')',
          s"expected ')' at $pos")
        pos += 1
        e
      } else predicate()
    }

    /** keyword followed (after whitespace) by '(' — distinguishes the
      * CASEI/S_INTERSECTS function forms from same-named properties. */
    private def peekCall(kw: String): Boolean = {
      if (!peekKeyword(kw)) return false
      var p2 = pos + kw.length
      while (p2 < input.length && input.charAt(p2).isWhitespace) p2 += 1
      p2 < input.length && input.charAt(p2) == '('
    }

    private def expect(ch: Char): Unit = {
      skipWs()
      require(pos < input.length && input.charAt(pos) == ch,
        s"expected '$ch' at $pos")
      pos += 1
    }

    private def predicate(): Node = {
      skipWs()
      val (p, caseiP) =
        if (peekCall("CASEI")) {
          eatKeyword("CASEI"); expect('('); val i = ident(); expect(')')
          (i, true)
        } else (ident(), false)
      skipWs()
      if (eatKeyword("IS")) {
        val negated = eatKeyword("NOT")
        require(eatKeyword("NULL"), s"expected NULL at $pos")
        IsNull(p, negated)
      } else if (eatKeyword("IN")) {
        skipWs()
        require(pos < input.length && input.charAt(pos) == '(',
          s"expected '(' after IN at $pos")
        pos += 1
        val vs = scala.collection.mutable.ArrayBuffer[Any](literal())
        skipWs()
        while (pos < input.length && input.charAt(pos) == ',') {
          pos += 1; vs += literal(); skipWs()
        }
        require(pos < input.length && input.charAt(pos) == ')',
          s"expected ')' at $pos")
        pos += 1
        In(p, vs.toSeq, casei = caseiP)
      } else if (eatKeyword("LIKE")) {
        val (v, caseiV) = caseiOrLiteral()
        v match {
          case s: String => Like(p, s, casei = caseiP || caseiV)
          case other => throw new IllegalArgumentException(
            s"LIKE needs a string pattern, got $other")
        }
      } else if (eatKeyword("BETWEEN")) {
        val lo = literal()
        require(eatKeyword("AND"), s"expected AND in BETWEEN at $pos")
        Between(p, lo, literal())
      } else if (peekKeyword("NOT")) {
        eatKeyword("NOT")
        require(eatKeyword("BETWEEN"),
          s"expected BETWEEN after NOT at $pos")
        val lo = literal()
        require(eatKeyword("AND"), s"expected AND in BETWEEN at $pos")
        Not(Between(p, lo, literal()))
      } else {
        val op = operator()
        val (v, caseiV) = caseiOrLiteral()
        Cmp(p, op, v, caseiProp = caseiP, caseiValue = caseiV)
      }
    }

    private def caseiOrLiteral(): (Any, Boolean) =
      if (peekCall("CASEI")) {
        eatKeyword("CASEI"); expect('('); val v = literal(); expect(')')
        (v, true)
      } else (literal(), false)

    /** S_INTERSECTS(geomProp, <WKT geometry>) */
    private def spatialPredicate(): Node = {
      eatKeyword("S_INTERSECTS")
      expect('('); val p = ident(); expect(',')
      val g = wktGeom()
      expect(')')
      SIntersects(p, g)
    }

    /** T_INTERSECTS/ANYINTERACTS(prop, INTERVAL('..','..')) — also
      * accepts TIMESTAMP('..') for an instant. */
    private def temporalPredicate(): Node = {
      if (!eatKeyword("T_INTERSECTS")) eatKeyword("ANYINTERACTS")
      expect('('); val p = ident(); expect(',')
      skipWs()
      val (lo, hi) =
        if (eatKeyword("INTERVAL")) {
          expect('(')
          val a = stringLit(); expect(','); val b = stringLit()
          expect(')')
          (parseInstant(a, openLo), parseInstant(b, openHi))
        } else if (eatKeyword("TIMESTAMP")) {
          expect('('); val t = stringLit(); expect(')')
          val ts = parseInstant(t, openLo)
          (ts, ts)
        } else throw new IllegalArgumentException(
          s"expected INTERVAL or TIMESTAMP at $pos")
      expect(')')
      TIntersects(p, lo, hi)
    }

    private def stringLit(): String = literal() match {
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"expected a string literal, got $other")
    }

    private def num(): Double = literal() match {
      case l: Long => l.toDouble
      case d: Double => d
      case other => throw new IllegalArgumentException(
        s"expected a number, got $other")
    }

    /** WKT geometry literal: POINT / LINESTRING / POLYGON (with
      * holes) / BBOX(w,s,e,n) — the forms CQL2-text spatial predicates
      * carry (OGC 21-054). */
    private def wktGeom(): graft.geometry.Geometry.Geom = {
      import graft.geometry.Geometry._
      def pointList(): IndexedSeq[(Double, Double)] = {
        val pts = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
        pts += ((num(), num()))
        skipWs()
        while (pos < input.length && input.charAt(pos) == ',') {
          pos += 1; pts += ((num(), num())); skipWs()
        }
        pts.toIndexedSeq
      }
      skipWs()
      if (eatKeyword("POINT")) {
        expect('('); val x = num(); val y = num(); expect(')')
        GPoint(x, y)
      } else if (eatKeyword("LINESTRING")) {
        expect('('); val pts = pointList(); expect(')')
        GLine(pts)
      } else if (eatKeyword("POLYGON")) {
        expect('(')
        val rings =
          scala.collection.mutable.ArrayBuffer[IndexedSeq[(Double, Double)]]()
        def ring(): Unit = { expect('('); rings += pointList(); expect(')') }
        ring()
        skipWs()
        while (pos < input.length && input.charAt(pos) == ',') {
          pos += 1; ring(); skipWs()
        }
        expect(')')
        GPolygon(rings.toIndexedSeq)
      } else if (eatKeyword("BBOX")) {
        expect('('); val w = num(); expect(','); val s = num(); expect(',')
        val e = num(); expect(','); val n = num(); expect(')')
        GPolygon(IndexedSeq(IndexedSeq((w, s), (e, s), (e, n), (w, n), (w, s))))
      } else throw new IllegalArgumentException(
        s"expected a WKT geometry at $pos: '${rest()}'")
    }

    private def ident(): String = {
      skipWs()
      val start = pos
      while (pos < input.length &&
        (input.charAt(pos).isLetterOrDigit || input.charAt(pos) == '_' ||
          input.charAt(pos) == ':')) pos += 1
      require(pos > start, s"expected identifier at $start")
      input.substring(start, pos)
    }

    private def operator(): String = {
      skipWs()
      val ops = Seq("<=", ">=", "<>", "=", "<", ">")
      ops.find(o => input.startsWith(o, pos)) match {
        case Some(o) => pos += o.length; o
        case None =>
          throw new IllegalArgumentException(s"expected operator at $pos")
      }
    }

    private def literal(): Any = {
      skipWs()
      require(pos < input.length, "expected literal at end of input")
      val c = input.charAt(pos)
      if (c == '\'') {
        pos += 1
        val sb = new StringBuilder
        var done = false
        while (!done) {
          require(pos < input.length, "unterminated string literal")
          val ch = input.charAt(pos)
          if (ch == '\'') {
            // CQL2 escapes a quote by doubling: 'O''Brien'
            if (pos + 1 < input.length && input.charAt(pos + 1) == '\'') {
              sb.append('\''); pos += 2
            } else { pos += 1; done = true }
          } else { sb.append(ch); pos += 1 }
        }
        sb.toString
      } else if (c.isDigit || c == '-' || c == '+') {
        val start = pos
        pos += 1
        while (pos < input.length &&
          (input.charAt(pos).isDigit || input.charAt(pos) == '.')) pos += 1
        // scientific notation: 1e-3, 2.5E+10
        if (pos < input.length &&
            (input.charAt(pos) == 'e' || input.charAt(pos) == 'E')) {
          pos += 1
          if (pos < input.length &&
            (input.charAt(pos) == '-' || input.charAt(pos) == '+')) pos += 1
          while (pos < input.length && input.charAt(pos).isDigit) pos += 1
        }
        val s = input.substring(start, pos)
        if (s.contains('.') || s.exists(ch => ch == 'e' || ch == 'E'))
          s.toDouble
        else s.toLong
      } else if (eatKeyword("TRUE")) true
      else if (eatKeyword("FALSE")) false
      else throw new IllegalArgumentException(s"bad literal at $pos: '${rest()}'")
    }
  }
}
