package graft.cypher

import Ast._

/** Raised on syntax errors and on constructs the grammar accepts but the
  * engine does not execute — mirroring the reference's parse-then-reject
  * posture for its ~70 planner TODO stubs (`QueryPlanner.cpp:65-463`). */
final case class CypherParseException(message: String) extends RuntimeException(message)

/**
 * Hand-rolled tokenizer + recursive-descent parser for the executable
 * Cypher subset. The reference uses an ANTLR openCypher-9 grammar
 * (`src/query/processor/cypher/astbuilder/ASTBuilder.h:23-185`); we parse
 * exactly the surface we execute and raise a clear error for the rest
 * (OPTIONAL MATCH, MERGE, SET, DELETE, UNWIND, CALL, UNION, WITH, CASE).
 */
object Parser {

  // ----- tokens -----------------------------------------------------------
  sealed trait Tok { def text: String }
  final case class Ident(text: String) extends Tok
  final case class Kw(text: String, raw: String) extends Tok // text = uppercased, raw = as written
  final case class StrTok(text: String) extends Tok
  final case class NumTok(text: String) extends Tok
  final case class Sym(text: String) extends Tok

  private val keywords = Set(
    "MATCH", "WHERE", "RETURN", "DISTINCT", "ORDER", "BY", "ASC", "ASCENDING",
    "DESC", "DESCENDING", "SKIP", "LIMIT", "AND", "OR", "XOR", "NOT", "AS",
    "STARTS", "ENDS", "WITH", "CONTAINS", "IN", "IS", "NULL", "TRUE", "FALSE",
    "CREATE", "OPTIONAL", "MERGE", "SET", "DELETE", "DETACH", "REMOVE",
    "UNWIND", "CALL", "UNION", "CASE")

  /** Cap for open-ended variable-length patterns (`*` / `*2..`). */
  val MaxVarLength = 8

  // (CALL/MERGE/SET/DELETE/REMOVE/UNWIND/OPTIONAL/CASE — all planner
  // TODOs in the reference — are executable here.)

  def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '/') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        val word = s.substring(start, i)
        val up = word.toUpperCase
        if (keywords.contains(up)) out += Kw(up, word) else out += Ident(word)
      } else if (c == '`') {
        val start = i + 1
        i += 1
        while (i < n && s.charAt(i) != '`') i += 1
        if (i >= n) throw CypherParseException("unterminated backtick identifier")
        out += Ident(s.substring(start, i)); i += 1
      } else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && s.charAt(i) != quote) {
          if (s.charAt(i) == '\\' && i + 1 < n) { sb.append(s.charAt(i + 1)); i += 2 }
          else { sb.append(s.charAt(i)); i += 1 }
        }
        if (i >= n) throw CypherParseException("unterminated string literal")
        out += StrTok(sb.toString); i += 1
      } else if (c.isDigit) {
        val start = i
        while (i < n && s.charAt(i).isDigit) i += 1
        if (i + 1 < n && s.charAt(i) == '.' && s.charAt(i + 1).isDigit) {
          i += 1
          while (i < n && s.charAt(i).isDigit) i += 1
        }
        out += NumTok(s.substring(start, i))
      } else {
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        if (Set("<>", "<=", ">=", "->", "<-", "=~", "..").contains(two)) { out += Sym(two); i += 2 }
        else { out += Sym(c.toString); i += 1 }
      }
    }
    out.result()
  }

  // ----- parser state -----------------------------------------------------
  final class P(toks: Vector[Tok]) {
    var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = {
      if (pos >= toks.length) throw CypherParseException("unexpected end of query")
      val t = toks(pos); pos += 1; t
    }
    def done: Boolean = pos >= toks.length
    def expectSym(s: String): Unit = peek match {
      case Some(Sym(`s`)) => pos += 1
      case other => throw CypherParseException(s"expected '$s' but found ${other.map(_.text).getOrElse("<eof>")}")
    }
    def expectKw(k: String): Unit = peek match {
      case Some(Kw(`k`, _)) => pos += 1
      case other => throw CypherParseException(s"expected $k but found ${other.map(_.text).getOrElse("<eof>")}")
    }
    def atSym(s: String): Boolean = peek.exists { case Sym(x) => x == s; case _ => false }
    def atKw(k: String): Boolean = peek.exists { case Kw(x, _) => x == k; case _ => false }
    def eatSym(s: String): Boolean = { if (atSym(s)) { pos += 1; true } else false }
    def eatKw(k: String): Boolean = { if (atKw(k)) { pos += 1; true } else false }
  }

  /** Parse a full statement, which may be a UNION chain of queries. */
  def parseStatement(query: String): UnionQuery = {
    val p = new P(tokenize(query))
    val head = parseQuery(p)
    val tails = List.newBuilder[(Boolean, Query)]
    while (p.atKw("UNION")) {
      p.next()
      val all = p.peek match {
        case Some(Ident(t)) if t.equalsIgnoreCase("ALL") => p.next(); true
        case _ => false
      }
      tails += ((all, parseQuery(p)))
    }
    UnionQuery(head, tails.result())
  }

  def parse(query: String): Query = {
    val u = parseStatement(query)
    if (u.tails.nonEmpty)
      throw CypherParseException("UNION statements go through Cypher.run (top-level only)")
    u.head
  }

  private def parseQuery(p: P): Query = {
    val clauses = List.newBuilder[Clause]
    while (!p.done && !p.atKw("UNION")) {
      p.peek match {
        case Some(Kw("CALL", _)) =>
          p.next()
          val name = new StringBuilder
          name ++= (p.next() match {
            case Ident(n) => n
            case t => throw CypherParseException(s"bad procedure name '${t.text}'")
          })
          while (p.eatSym(".")) {
            name += '.'
            name ++= (p.next() match {
              case Ident(n) => n
              case Kw(_, raw) => raw
              case t => throw CypherParseException(s"bad procedure name part '${t.text}'")
            })
          }
          p.expectSym("(")
          val args = List.newBuilder[Expr]
          if (!p.atSym(")")) { args += parseExpr(p); while (p.eatSym(",")) args += parseExpr(p) }
          p.expectSym(")")
          // YIELD isn't a tokenizer keyword — it arrives as an Ident
          def atYield = p.peek.exists { case Ident(t) => t.equalsIgnoreCase("YIELD"); case _ => false }
          val yields = List.newBuilder[(String, Option[String])]
          if (atYield) {
            p.next()
            def yieldItem(): Unit = {
              val c = p.next() match {
                case Ident(n) => n
                case Kw(_, raw) => raw
                case t => throw CypherParseException(s"bad YIELD column '${t.text}'")
              }
              val alias = if (p.eatKw("AS")) Some(p.next() match {
                case Ident(a) => a
                case Kw(_, raw) => raw
                case t => throw CypherParseException(s"bad YIELD alias '${t.text}'")
              }) else None
              yields += ((c, alias))
            }
            yieldItem()
            while (p.eatSym(",")) yieldItem()
          }
          clauses += CallPart(CallClause(name.toString, args.result(), yields.result()))
        case Some(Kw("WITH", _)) =>
          p.next()
          val projection = parseReturn(p)
          val where = if (p.eatKw("WHERE")) Some(parseExpr(p)) else None
          clauses += WithPart(WithClause(projection, where))
        case Some(Kw("MATCH", _)) | Some(Kw("OPTIONAL", _)) =>
          val optional = p.eatKw("OPTIONAL")
          p.expectKw("MATCH")
          val paths = List.newBuilder[PathPattern]
          paths += parseMatchPath(p)
          while (p.eatSym(",")) paths += parseMatchPath(p)
          val where = if (p.eatKw("WHERE")) Some(parseExpr(p)) else None
          clauses += MatchPart(MatchClause(paths.result(), where, optional))
        case Some(Kw("UNWIND", _)) =>
          p.next()
          val listExpr = parseExpr(p)
          p.expectKw("AS")
          val v = p.next() match {
            case Ident(a) => a
            case t => throw CypherParseException(s"bad UNWIND variable '${t.text}'")
          }
          clauses += UnwindPart(UnwindClause(listExpr, v))
        case Some(Kw("SET", _)) =>
          p.next()
          val items = List.newBuilder[(String, String, Expr)]
          def setItem(): Unit = {
            val prop = parseExpr(p) match {
              case Cmp("=", Property(v, k), value) => (v, k, value)
              case other => throw CypherParseException(
                s"SET expects n.prop = value, got ${text(other)}")
            }
            items += prop
          }
          setItem()
          while (p.eatSym(",")) setItem()
          clauses += SetPart(SetClause(items.result()))
        case Some(Kw("REMOVE", _)) =>
          p.next()
          val items = List.newBuilder[(String, String)]
          def removeItem(): Unit = parseExpr(p) match {
            case Property(v, k) => items += ((v, k))
            case other => throw CypherParseException(
              s"REMOVE expects n.prop, got ${text(other)}")
          }
          removeItem()
          while (p.eatSym(",")) removeItem()
          clauses += RemovePart(RemoveClause(items.result()))
        case Some(Kw("DELETE", _)) | Some(Kw("DETACH", _)) =>
          val detach = p.eatKw("DETACH")
          p.expectKw("DELETE")
          val vars = List.newBuilder[String]
          def delItem(): Unit = p.next() match {
            case Ident(v) => vars += v
            case t => throw CypherParseException(s"DELETE expects a variable, got '${t.text}'")
          }
          delItem()
          while (p.eatSym(",")) delItem()
          clauses += DeletePart(DeleteClause(vars.result(), detach))
        case Some(Kw("CREATE", _)) =>
          p.next()
          val paths = List.newBuilder[PathPattern]
          paths += parsePath(p)
          while (p.eatSym(",")) paths += parsePath(p)
          clauses += CreatePart(CreateClause(paths.result()))
        case Some(Kw("MERGE", _)) =>
          p.next()
          val paths = List.newBuilder[PathPattern]
          paths += parsePath(p)
          while (p.eatSym(",")) paths += parsePath(p)
          // ON CREATE SET / ON MATCH SET arms, each a comma list of
          // n.prop = value items ("ON" isn't a reserved keyword — it
          // arrives as an Ident)
          var onCreate = List.empty[(String, String, Expr)]
          var onMatch = List.empty[(String, String, Expr)]
          def atOn = p.peek.exists { case Ident(t) => t.equalsIgnoreCase("ON"); case _ => false }
          while (atOn) {
            p.next()
            val isCreate =
              if (p.eatKw("CREATE")) true
              else if (p.eatKw("MATCH")) false
              else throw CypherParseException("expected CREATE or MATCH after ON in MERGE")
            p.expectKw("SET")
            val items = List.newBuilder[(String, String, Expr)]
            def armItem(): Unit = parseExpr(p) match {
              case Cmp("=", Property(v, k), value) => items += ((v, k, value))
              case other => throw CypherParseException(
                s"ON ${if (isCreate) "CREATE" else "MATCH"} SET expects n.prop = value, got ${text(other)}")
            }
            armItem()
            while (p.eatSym(",")) armItem()
            if (isCreate) onCreate = onCreate ++ items.result()
            else onMatch = onMatch ++ items.result()
          }
          clauses += MergePart(MergeClause(paths.result(), onCreate, onMatch))
        case Some(Kw("RETURN", _)) =>
          p.next()
          clauses += ReturnPart(parseReturn(p))
        case Some(t) => throw CypherParseException(s"unexpected token '${t.text}'")
        case None => ()
      }
    }
    Query(clauses.result())
  }

  // ----- patterns ---------------------------------------------------------
  /** MATCH pattern, optionally named: `p = (a)-[r]->(b)`. Only MATCH
    * accepts path names — CREATE/MERGE parse bare paths, so a name there
    * is a syntax error, matching openCypher's read-only path binding.
    * (`p =~ ...` can't be mistaken for this: `=~` is one token.) */
  private def parseMatchPath(p: P): PathPattern = {
    val mark = p.pos
    p.peek match {
      case Some(Ident(name)) =>
        p.next()
        if (p.eatSym("=")) parsePath(p).copy(name = Some(name))
        else { p.pos = mark; parsePath(p) }
      case _ => parsePath(p)
    }
  }

  private def parsePath(p: P): PathPattern = {
    // shortestPath((a)-[*..k]-(b)) / allShortestPaths(...) — pattern
    // functions, MATCH-position only (not general expressions).
    p.peek match {
      case Some(Ident(fn))
          if fn.equalsIgnoreCase("shortestPath") || fn.equalsIgnoreCase("allShortestPaths") =>
        p.next(); p.expectSym("(")
        val inner = parsePath(p)
        p.expectSym(")")
        if (inner.hops.size != 1 || inner.hops.head._1.varLength.isEmpty)
          throw CypherParseException(
            s"$fn() requires a single variable-length relationship pattern")
        return inner.copy(shortest = Some(fn.equalsIgnoreCase("allShortestPaths")))
      case _ => ()
    }
    val start = parseNode(p)
    val hops = List.newBuilder[(RelPattern, NodePattern)]
    var continue = true
    while (continue) {
      if (p.atSym("-") || p.atSym("<-")) {
        val rel = parseRel(p)
        val node = parseNode(p)
        hops += ((rel, node))
      } else continue = false
    }
    PathPattern(start, hops.result())
  }

  private def parseNode(p: P): NodePattern = {
    p.expectSym("(")
    val variable = p.peek match {
      case Some(Ident(name)) => p.next(); Some(name)
      case _ => None
    }
    val labels = List.newBuilder[String]
    while (p.eatSym(":")) {
      p.peek match {
        case Some(Ident(l)) => p.next(); labels += l
        case Some(Kw(_, raw)) => p.next(); labels += raw // labels that collide with keywords
        case other => throw CypherParseException(s"expected label after ':' got ${other.map(_.text)}")
      }
    }
    val props = if (p.atSym("{")) parsePropMap(p) else Map.empty[String, Expr]
    p.expectSym(")")
    NodePattern(variable, labels.result(), props)
  }

  private def parseRel(p: P): RelPattern = {
    // <-[r:T]-  |  -[r:T]->  |  -[r:T]-  |  <--  |  -->  |  --
    val leftArrow = p.eatSym("<-")
    if (!leftArrow) p.expectSym("-")
    var variable: Option[String] = None
    val types = List.newBuilder[String]
    var props = Map.empty[String, Expr]
    var varLength: Option[(Int, Int)] = None
    if (p.eatSym("[")) {
      p.peek match {
        case Some(Ident(name)) => p.next(); variable = Some(name)
        case _ => ()
      }
      if (p.eatSym(":")) {
        def one(): Unit = p.peek match {
          case Some(Ident(t)) => p.next(); types += t
          case Some(Kw(_, raw)) => p.next(); types += raw
          case other => throw CypherParseException(s"expected relationship type got ${other.map(_.text)}")
        }
        one()
        while (p.eatSym("|")) { p.eatSym(":"); one() }
      }
      if (p.eatSym("*")) {
        // variable-length: * | *k | *a..b | *..b | *a..
        val lo = p.peek match {
          case Some(NumTok(t)) if !t.contains('.') => p.next(); Some(t.toInt)
          case _ => None
        }
        val hi =
          if (p.eatSym("..")) p.peek match {
            case Some(NumTok(t)) if !t.contains('.') => p.next(); Some(t.toInt)
            case _ => None
          }
          else lo // plain *k means exactly k
        varLength = Some((lo.getOrElse(1), hi.getOrElse(MaxVarLength)))
      }
      if (p.atSym("{")) props = parsePropMap(p)
      p.expectSym("]")
    }
    val rightArrow = p.eatSym("->")
    if (!rightArrow && !leftArrow) p.expectSym("-")
    else if (!rightArrow && leftArrow) p.expectSym("-")
    val dir =
      if (leftArrow && !rightArrow) DirLeft
      else if (!leftArrow && rightArrow) DirRight
      else if (!leftArrow && !rightArrow) DirBoth
      else throw CypherParseException("relationship cannot have arrows on both ends")
    RelPattern(variable, types.result(), dir, props, varLength)
  }

  private def parsePropMap(p: P): Map[String, Expr] = {
    p.expectSym("{")
    val out = Map.newBuilder[String, Expr]
    if (!p.atSym("}")) {
      def entry(): Unit = {
        val key = p.next() match {
          case Ident(k) => k
          case Kw(_, raw) => raw
          case StrTok(k) => k
          case t => throw CypherParseException(s"bad property key '${t.text}'")
        }
        p.expectSym(":")
        out += key -> parseExpr(p)
      }
      entry()
      while (p.eatSym(",")) entry()
    }
    p.expectSym("}")
    out.result()
  }

  // ----- RETURN -----------------------------------------------------------
  private def parseReturn(p: P): ReturnClause = {
    val distinct = p.eatKw("DISTINCT")
    val items = List.newBuilder[ReturnItem]
    def item(): Unit = {
      val e = parseExpr(p)
      val alias = if (p.eatKw("AS")) Some(p.next() match {
        case Ident(a) => a
        case Kw(_, raw) => raw
        case StrTok(a) => a
        case t => throw CypherParseException(s"bad alias '${t.text}'")
      }) else None
      items += ReturnItem(e, alias)
    }
    item()
    while (p.eatSym(",")) item()
    val orderBy = List.newBuilder[SortItem]
    if (p.eatKw("ORDER")) {
      p.expectKw("BY")
      def sortItem(): Unit = {
        val e = parseExpr(p)
        val asc =
          if (p.eatKw("DESC") || p.eatKw("DESCENDING")) false
          else { p.eatKw("ASC"); p.eatKw("ASCENDING"); true }
        orderBy += SortItem(e, asc)
      }
      sortItem()
      while (p.eatSym(",")) sortItem()
    }
    val skip = if (p.eatKw("SKIP")) Some(parseLong(p)) else None
    val limit = if (p.eatKw("LIMIT")) Some(parseLong(p)) else None
    ReturnClause(distinct, items.result(), orderBy.result(), skip, limit)
  }

  private def parseLong(p: P): Long = p.next() match {
    case NumTok(t) => t.toLong
    case t => throw CypherParseException(s"expected integer, found '${t.text}'")
  }

  // ----- expressions (precedence: OR < XOR < AND < NOT < cmp < add < mul < unary) -----
  def parseExpr(p: P): Expr = parseOr(p)

  private def parseOr(p: P): Expr = {
    var l = parseXor(p)
    while (p.eatKw("OR")) l = Or(l, parseXor(p))
    l
  }
  private def parseXor(p: P): Expr = {
    var l = parseAnd(p)
    while (p.eatKw("XOR")) l = Xor(l, parseAnd(p))
    l
  }
  private def parseAnd(p: P): Expr = {
    var l = parseNot(p)
    while (p.eatKw("AND")) l = And(l, parseNot(p))
    l
  }
  private def parseNot(p: P): Expr =
    if (p.eatKw("NOT")) Not(parseNot(p)) else parseComparison(p)

  private def parseComparison(p: P): Expr = {
    val l = parseAdd(p)
    p.peek match {
      case Some(Sym(op)) if Set("=", "<>", "<", ">", "<=", ">=").contains(op) =>
        p.next(); Cmp(if (op == "=") "=" else op, l, parseAdd(p))
      case Some(Kw("STARTS", _)) => p.next(); p.expectKw("WITH"); StartsWith(l, parseAdd(p))
      case Some(Kw("ENDS", _)) => p.next(); p.expectKw("WITH"); EndsWith(l, parseAdd(p))
      case Some(Kw("CONTAINS", _)) => p.next(); Contains(l, parseAdd(p))
      case Some(Kw("IN", _)) => p.next(); In(l, parseAtomOrList(p))
      case Some(Kw("IS", _)) =>
        p.next()
        val neg = p.eatKw("NOT")
        p.expectKw("NULL")
        IsNull(l, neg)
      case _ => l
    }
  }

  private def parseAtomOrList(p: P): Expr =
    if (p.atSym("[")) {
      p.expectSym("[")
      parseListBody(p)
    } else parseAdd(p)

  /** After `[`: list literal, list comprehension, or pattern
    * comprehension. `[x IN l ...]` parses the first element as an
    * In-expression; a following `]`, `WHERE` or `|` (i.e. anything but
    * `,`) makes it a comprehension, per openCypher. A path pattern with
    * ≥1 hop followed by WHERE or `|` is a pattern comprehension
    * (`[(a)-[:T]->(b) WHERE pred | proj]` — the projection is mandatory,
    * per the openCypher grammar). */
  private def parseListBody(p: P): Expr = {
    if (p.atSym("]")) { p.next(); return ListLit(Nil) }
    // try a pattern comprehension first with backtracking (rewind is free)
    if (p.atSym("(")) {
      val mark = p.pos
      val asPattern =
        try {
          val path = parsePath(p)
          if (path.hops.nonEmpty && (p.atKw("WHERE") || p.atSym("|"))) Some(path) else None
        } catch { case _: CypherParseException => None }
      asPattern match {
        case Some(path) =>
          val where = if (p.eatKw("WHERE")) Some(parseExpr(p)) else None
          p.expectSym("|")
          val proj = parseExpr(p)
          p.expectSym("]")
          return PatternComp(path, where, proj)
        case None => p.pos = mark
      }
    }
    val first = parseExpr(p)
    first match {
      case In(Variable(v), lst) if !p.atSym(",") =>
        val where = if (p.atKw("WHERE")) { p.next(); Some(parseExpr(p)) } else None
        val proj = if (p.eatSym("|")) Some(parseExpr(p)) else None
        p.expectSym("]")
        ListComp(v, lst, where, proj)
      case _ =>
        val xs = List.newBuilder[Expr]
        xs += first
        while (p.eatSym(",")) xs += parseExpr(p)
        p.expectSym("]")
        ListLit(xs.result())
    }
  }

  private def parseAdd(p: P): Expr = {
    var l = parseMul(p)
    var continue = true
    while (continue) p.peek match {
      case Some(Sym(op @ ("+" | "-"))) => p.next(); l = Arith(op, l, parseMul(p))
      case _ => continue = false
    }
    l
  }
  private def parseMul(p: P): Expr = {
    var l = parseUnary(p)
    var continue = true
    while (continue) p.peek match {
      case Some(Sym(op @ ("*" | "/" | "%" | "^"))) => p.next(); l = Arith(op, l, parseUnary(p))
      case _ => continue = false
    }
    l
  }
  private def parseUnary(p: P): Expr =
    if (p.eatSym("-")) Neg(parseUnary(p)) else parseAtom(p)

  private def parseAtom(p: P): Expr = p.next() match {
    case NumTok(t) =>
      if (t.contains('.')) DblLit(t.toDouble) else IntLit(t.toLong)
    case StrTok(s) => StrLit(s)
    case Kw("CASE", _) =>
      def atWord(w: String): Boolean = p.peek.exists {
        case Ident(t) => t.equalsIgnoreCase(w)
        case _ => false
      }
      def eatWord(w: String): Boolean = { if (atWord(w)) { p.next(); true } else false }
      val subject = if (atWord("WHEN")) None else Some(parseExpr(p))
      val whens = List.newBuilder[(Expr, Expr)]
      while (eatWord("WHEN")) {
        val w = parseExpr(p)
        if (!eatWord("THEN")) throw CypherParseException("expected THEN in CASE")
        whens += ((w, parseExpr(p)))
      }
      val els = if (eatWord("ELSE")) Some(parseExpr(p)) else None
      if (!eatWord("END")) throw CypherParseException("expected END closing CASE")
      val ws = whens.result()
      if (ws.isEmpty) throw CypherParseException("CASE needs at least one WHEN")
      CaseExpr(subject, ws, els)
    case Kw("TRUE", _) => BoolLit(true)
    case Kw("FALSE", _) => BoolLit(false)
    case Kw("NULL", _) => NullLit
    case Sym("(") =>
      // `(` opens either a parenthesized expression or a pattern
      // predicate `(n)-[:T]->(:L)`. Try the pattern first with
      // backtracking (the parser is an index over a token vector, so
      // rewinding is free); a path with ≥1 hop is a pattern predicate,
      // anything else — including a bare `(x)` — is an expression.
      val mark = p.pos - 1
      val asPattern =
        try {
          p.pos = mark
          val path = parsePath(p)
          if (path.hops.nonEmpty) Some(PatternPred(path)) else None
        } catch { case _: CypherParseException => None }
      asPattern match {
        case Some(pp) => pp
        case None =>
          p.pos = mark + 1
          val e = parseExpr(p)
          p.expectSym(")")
          e
      }
    case Sym("[") => parseListBody(p)
    case Ident(name) =>
      p.peek match {
        // EXISTS { [MATCH] paths [WHERE pred] } — existential subquery
        // (reference grammar: ASTBuilder.cpp:1086, planner TODO)
        case Some(Sym("{")) if name.equalsIgnoreCase("exists") =>
          p.next()
          p.eatKw("MATCH") // optional inside the braces
          val paths = List.newBuilder[PathPattern]
          paths += parsePath(p)
          while (p.eatSym(",")) paths += parsePath(p)
          val where = if (p.eatKw("WHERE")) Some(parseExpr(p)) else None
          p.expectSym("}")
          ExistsSub(paths.result(), where)
        case Some(Sym("(")) =>
          p.next()
          val lower = name.toLowerCase
          if (lower == "reduce") {
            // reduce(acc = init, v IN list | body)
            val acc = p.next() match {
              case Ident(a) => a
              case t => throw CypherParseException(s"reduce() accumulator name expected, got '${t.text}'")
            }
            p.expectSym("=")
            val init = parseExpr(p)
            p.expectSym(",")
            val v = p.next() match {
              case Ident(a) => a
              case t => throw CypherParseException(s"reduce() element variable expected, got '${t.text}'")
            }
            p.expectKw("IN")
            val lst = parseAtomOrList(p)
            p.expectSym("|")
            val body = parseExpr(p)
            p.expectSym(")")
            ReduceExpr(acc, init, v, lst, body)
          } else if (quantifierNames.contains(lower)) {
            // all/any/none/single(v IN list WHERE pred) — openCypher list
            // quantifiers (the predicate is mandatory)
            val v = p.next() match {
              case Ident(a) => a
              case t => throw CypherParseException(
                s"$lower() element variable expected, got '${t.text}'")
            }
            p.expectKw("IN")
            val lst = parseAtomOrList(p)
            p.expectKw("WHERE")
            val pred = parseExpr(p)
            p.expectSym(")")
            Quantifier(lower, v, lst, pred)
          } else if (aggregateNames.contains(lower)) {
            val distinct = p.eatKw("DISTINCT")
            val arg =
              if (p.atSym("*")) { p.next(); None }
              else if (p.atSym(")")) None
              else Some(parseExpr(p))
            // percentileCont/percentileDisc carry the percentile here
            val param = if (p.eatSym(",")) Some(parseExpr(p)) else None
            p.expectSym(")")
            Aggregate(lower, distinct, arg, param)
          } else {
            val args = List.newBuilder[Expr]
            if (!p.atSym(")")) { args += parseExpr(p); while (p.eatSym(",")) args += parseExpr(p) }
            p.expectSym(")")
            Func(lower, args.result())
          }
        case Some(Sym(".")) =>
          p.next()
          p.next() match {
            case Ident(k) => Property(name, k)
            case Kw(_, raw) => Property(name, raw)
            case t => throw CypherParseException(s"bad property key '${t.text}'")
          }
        case _ => Variable(name)
      }
    case t => throw CypherParseException(s"unexpected token '${t.text}' in expression")
  }
}
