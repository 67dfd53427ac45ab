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
  *   factor   := NOT factor | '(' expr ')' | predicate
  *   predicate:= ident op literal | ident IN '(' lit (',' lit)* ')'
  *               | ident LIKE string | ident IS [NOT] NULL
  *   op       := '=' | '<>' | '<' | '<=' | '>' | '>='
  *   literal  := number | string | TRUE | FALSE
  */
object Cql2Filter {

  // ---- AST ----
  sealed trait Node
  case class Cmp(prop: String, op: String, value: Any) extends Node
  case class In(prop: String, values: Seq[Any]) extends Node
  case class Like(prop: String, pattern: String) extends Node
  case class IsNull(prop: String, negated: Boolean) extends Node
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
        Cmp(propOf(args(0)), op, litOf(args(1)))
      case "like" =>
        require(args.length == 2, s"'like' needs 2 args")
        litOf(args(1)) match {
          case s: String => Like(propOf(args(0)), s)
          case other => throw new IllegalArgumentException(
            s"LIKE needs a string pattern, got $other")
        }
      case "in" =>
        require(args.length == 2 && args(1).isArray,
          s"'in' needs (property, array) args: $n")
        In(propOf(args(0)),
          (0 until args(1).size).map(i => litOf(args(1).get(i))))
      case "isnull" =>
        require(args.length == 1, s"'isNull' needs 1 arg")
        IsNull(propOf(args.head), negated = false)
      case other => throw new IllegalArgumentException(
        s"unsupported cql2-json op: '$other'")
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
      case Cmp(p, op, v) =>
        val (c, l) = typedSides(p, v)
        op match {
          case "=" => c === l
          case "<>" => c =!= l
          case "<" => c < l
          case "<=" => c <= l
          case ">" => c > l
          case ">=" => c >= l
        }
      case In(p, vs) if !topCols.contains(p) &&
          vs.forall(v => v.isInstanceOf[Long] || v.isInstanceOf[Double]) =>
        // homogeneous numeric list: ONE try_cast + one isin
        tryCast(prop(p), DoubleType).isin(vs.map {
          case n: Long => n.toDouble
          case d: Double => d
        }: _*)
      case In(p, vs) if !topCols.contains(p) =>
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
      case In(p, vs) => prop(p).isin(vs: _*)
      case Like(p, pat) => prop(p).like(pat)
      case IsNull(p, false) => prop(p).isNull
      case IsNull(p, true) => prop(p).isNotNull
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

    private def predicate(): Node = {
      val p = ident()
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
        In(p, vs.toSeq)
      } else if (eatKeyword("LIKE")) {
        literal() match {
          case s: String => Like(p, s)
          case other => throw new IllegalArgumentException(
            s"LIKE needs a string pattern, got $other")
        }
      } else {
        val op = operator()
        Cmp(p, op, literal())
      }
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
