package graft.cypher

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Ast._

/**
 * Compiles Cypher expressions to Catalyst Columns, reproducing the
 * reference's contextual string-coercion semantics: all stored property
 * values are strings; the *other* operand's type decides how a property
 * string is interpreted, and a value that fails to coerce makes the
 * comparison false (reference `Helpers.cpp:197-236`: coercion; and
 * `Helpers.cpp:73-88`: type-mismatch compare → false).
 *
 * In Spark this maps cleanly onto null-propagating casts: `cast(prop AS
 * DOUBLE)` is NULL when the string is non-numeric, any comparison with
 * NULL is NULL, and Filter drops non-true rows — same observable result,
 * fully inside whole-stage codegen (no UDFs anywhere).
 *
 * Divergences from the reference, both deliberate (SURVEY.md §2.2):
 *  - NOT is implemented correctly (the reference returns the un-negated
 *    child, `Helpers.cpp:164-166`).
 *  - STARTS WITH / ENDS WITH / CONTAINS / IN / IS NULL and arithmetic are
 *    executable here; the reference only parses them.
 */
object ExprCompiler {

  /** Static type lattice for coercion decisions. */
  sealed trait Kind
  case object KPropStr extends Kind // property value / id() — string needing contextual coercion
  case object KStr extends Kind
  case object KNum extends Kind
  case object KBool extends Kind
  case object KNull extends Kind
  case object KNode extends Kind
  case object KRel extends Kind
  case object KPath extends Kind // named path: struct(nodes: array<node>, rels: array<rel>)
  case object KRelList extends Kind // ARRAY<rel struct>: -[r*a..b]-> binding, relationships(p)
  case object KNodeList extends Kind // ARRAY<node struct>: nodes(p)
  case object KValue extends Kind // scalar bound by a WITH projection
  case object KOther extends Kind

  final case class Typed(col: Column, kind: Kind)

  /** Which variables are bound to nodes vs relationships. `lambdas` are
    * list-comprehension element variables, bound to the enclosing
    * higher-order function's lambda Column; they shadow outer bindings
    * for the comprehension's extent. */
  final case class Scope(vars: Map[String, Kind],
      lambdas: Map[String, Typed] = Map.empty) {
    def kindOf(v: String): Kind =
      vars.getOrElse(v, throw CypherParseException(s"undefined variable '$v'"))
    def withLambda(v: String, c: Column, kind: Kind = KPropStr): Scope =
      copy(lambdas = lambdas + (v -> Typed(c, kind)))
  }

  /** Value-mode compilation: expression → column (used by RETURN items,
    * ORDER BY keys, property-map literals and WHERE subtrees alike). */
  def compile(e: Expr, scope: Scope): Typed = e match {
    case Variable(v) if scope.lambdas.contains(v) =>
      // comprehension element / reduce accumulator: the binding carries
      // its kind (elements coerce like property values; accumulators
      // keep their init's kind)
      scope.lambdas(v)
    case Variable(v) =>
      scope.kindOf(v) match {
        // WITH-projected scalars coerce contextually like property values
        case KValue => Typed(col(s"`$v`"), KPropStr)
        case k => Typed(col(v), k)
      }
    case Property(v, k) if scope.lambdas.contains(v) =>
      // comprehension element over a rel/node list: struct-field reads
      // on the lambda Column (same pseudo-property precedence as below)
      val t = scope.lambdas(v)
      t.kind match {
        case KNode if k == "id" || k == "label" =>
          Typed(coalesce(element_at(t.col.getField("properties"), k),
            t.col.getField(k)), KPropStr)
        case KRel if k == "type" =>
          Typed(coalesce(element_at(t.col.getField("properties"), k),
            t.col.getField("type")), KPropStr)
        case KNode | KRel =>
          Typed(element_at(t.col.getField("properties"), k), KPropStr)
        case _ => throw CypherParseException(
          s"'$v' is not an entity element; cannot read property '$k'")
      }
    case Property(v, k) =>
      scope.kindOf(v) match {
        case KNode if k == "id" || k == "label" =>
          // structural fields double as pseudo-properties: stored property
          // wins (fixture graphs carry id/label in the map), struct field
          // backs graphs whose property maps don't repeat them
          Typed(coalesce(element_at(col(s"$v.properties"), k), col(s"$v.$k")), KPropStr)
        case KRel if k == "type" =>
          Typed(coalesce(element_at(col(s"$v.properties"), k), col(s"$v.type")), KPropStr)
        case KNode | KRel => Typed(element_at(col(s"$v.properties"), k), KPropStr)
        case _ => throw CypherParseException(s"'$v' is not an entity; cannot read property '$k'")
      }
    case StrLit(s) => Typed(lit(s), KStr)
    case IntLit(v) => Typed(lit(v), KNum)
    case DblLit(v) => Typed(lit(v), KNum)
    case BoolLit(v) => Typed(lit(v), KBool)
    case NullLit => Typed(lit(null).cast(StringType), KNull)
    case ListLit(xs) =>
      Typed(array(xs.map(x => compile(x, scope).col): _*), KOther)

    // [v IN list WHERE pred | proj] → filter/transform higher-order
    // functions with the element variable lambda-bound. The captured
    // outer columns are plain attribute reads (cheap per element); the
    // per-element work is exactly the predicate/projection itself.
    case ListComp(v, lst, where, proj) =>
      val listT = listTypedOf(lst, scope)
      val listCol = listT.col
      val ek = elemKindOf(listT.kind)
      val filtered = where match {
        case Some(w) =>
          filter(listCol, x => compile(w, scope.withLambda(v, x, ek)).col.try_cast(BooleanType))
        case None => listCol
      }
      val projected = proj match {
        case Some(pe) => transform(filtered, x => compile(pe, scope.withLambda(v, x, ek)).col)
        case None => filtered
      }
      Typed(projected, if (proj.isEmpty) listT.kind else KOther)

    // all/any/none/single(v IN list WHERE pred): forall/exists carry
    // openCypher's three-valued null logic natively; single needs the
    // exact true/null element counts to distinguish false from unknown
    case Quantifier(kind, v, lst, pred) =>
      val listT = listTypedOf(lst, scope)
      val listCol = listT.col
      def p(x: Column): Column =
        compile(pred, scope.withLambda(v, x, elemKindOf(listT.kind))).col.try_cast(BooleanType)
      val c = kind match {
        case "all" => forall(listCol, p)
        case "any" => exists(listCol, p)
        case "none" => !exists(listCol, p)
        case "single" =>
          val trues = size(filter(listCol, x => coalesce(p(x), lit(false))))
          val unknowns = size(filter(listCol, x => p(x).isNull))
          when(listCol.isNull, lit(null).cast(BooleanType))
            .when(trues > 1, lit(false))
            .when(unknowns > 0, lit(null).cast(BooleanType))
            .otherwise(trues === 1)
      }
      Typed(c, KBool)

    case PatternPred(_) =>
      throw CypherParseException(
        "pattern predicates are supported as top-level WHERE conjuncts only " +
          "(optionally under NOT / exists(...)) — not nested inside other expressions")

    case _: ExistsSub =>
      throw CypherParseException(
        "EXISTS { ... } subqueries are supported as top-level WHERE conjuncts only " +
          "(optionally under NOT) — not nested inside other expressions")

    case _: PatternComp =>
      throw CypherParseException(
        "pattern comprehensions are supported in WHERE, RETURN/WITH items, " +
          "ORDER BY keys and UNWIND only — not in this position")

    // reduce(acc = init, v IN list | body) → the aggregate HOF. Spark
    // requires the fold body's type to equal the zero's type, so both
    // coerce through the init expression's static kind (numeric folds run
    // in DOUBLE — the engine-wide arithmetic semantic; string folds in
    // STRING).
    case ReduceExpr(acc, init, v, lst, body) =>
      val listCol = listColOf(lst, scope)
      val initT = compile(init, scope)
      val (zero, coerce): (Column, Column => Column) = initT.kind match {
        case KNum => (initT.col.cast(DoubleType), (c: Column) => c.try_cast(DoubleType))
        case KStr => (initT.col.cast(StringType), (c: Column) => c.cast(StringType))
        case _ => (initT.col, (c: Column) => c)
      }
      Typed(aggregate(listCol, zero, (a, x) =>
        coerce(compile(body, scope.withLambda(acc, a, initT.kind)
          .withLambda(v, x, elemKindOf(listTypedOf(lst, scope).kind))).col)), KOther)

    case Func(name, args) => compileFunc(name, args, scope)

    case Cmp(op, l, r) =>
      val entity = (l, r) match {
        // lambda-bound variables (comprehension/quantifier elements)
        // shadow outer bindings and are never entities
        case (Variable(a), Variable(b))
            if !scope.lambdas.contains(a) && !scope.lambdas.contains(b) =>
          (scope.kindOf(a), scope.kindOf(b)) match {
            // entity equality compares ids (reference Helpers.cpp:171-182)
            case (KNode, KNode) => Some(applyOp(op, col(s"$a.id"), col(s"$b.id")))
            case (KRel, KRel) => Some(applyOp(op, col(s"$a.eid"), col(s"$b.eid")))
            case _ => None
          }
        case _ => None
      }
      Typed(entity.getOrElse(compileCmp(op, compile(l, scope), compile(r, scope))), KBool)
    case And(l, r) => Typed(compile(l, scope).col.try_cast(BooleanType) && compile(r, scope).col.try_cast(BooleanType), KBool)
    case Or(l, r) => Typed(compile(l, scope).col.try_cast(BooleanType) || compile(r, scope).col.try_cast(BooleanType), KBool)
    case Xor(l, r) => Typed(compile(l, scope).col.try_cast(BooleanType) =!= compile(r, scope).col.try_cast(BooleanType), KBool)
    case Not(c) => Typed(!compile(c, scope).col.try_cast(BooleanType), KBool)

    case StartsWith(l, r) => Typed(strOf(compile(l, scope)).startsWith(strOf(compile(r, scope))), KBool)
    case EndsWith(l, r) => Typed(strOf(compile(l, scope)).endsWith(strOf(compile(r, scope))), KBool)
    case Contains(l, r) => Typed(strOf(compile(l, scope)).contains(strOf(compile(r, scope))), KBool)

    case In(l, ListLit(items)) =>
      val lt = compile(l, scope)
      val anyNum = items.exists { case IntLit(_) | DblLit(_) => true; case _ => false }
      val left = if (anyNum) numOf(lt) else strOf(lt)
      val vals: List[Any] = items.map {
        case IntLit(v) => v.toDouble
        case DblLit(v) => v
        case StrLit(s) => s
        case BoolLit(b) => b.toString
        case other => throw CypherParseException(s"IN list supports literals only, got ${text(other)}")
      }
      Typed(left.isin(vals: _*), KBool)
    case In(l, other) =>
      throw CypherParseException(s"IN requires a literal list, got ${text(other)}")

    case IsNull(c, negated) =>
      val t = compile(c, scope)
      Typed(if (negated) t.col.isNotNull else t.col.isNull, KBool)

    case Arith(op, l, r) =>
      val lt = compile(l, scope); val rt = compile(r, scope)
      // openCypher `+` concatenates when a side is statically a string
      // (literal or a string-typed function result); property values keep
      // the engine-wide numeric-coercion semantics
      if (op == "+" && (lt.kind == KStr || rt.kind == KStr))
        return Typed(concat(strOf(lt), strOf(rt)), KStr)
      val a = numOf(lt); val b = numOf(rt)
      val c = op match {
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        case "/" => a / b
        case "%" => a % b
        case "^" => pow(a, b)
      }
      Typed(c, KNum)
    case Neg(c) => Typed(-numOf(compile(c, scope)), KNum)

    case CaseExpr(subject, whens, otherwise) =>
      val subj = subject.map(compile(_, scope))
      val branches = whens.map { case (w, t) =>
        val cond = subj match {
          case Some(s) => compileCmp("=", s, compile(w, scope)) // simple CASE
          case None => compile(w, scope).col.try_cast(BooleanType) // searched CASE
        }
        (cond, compile(t, scope))
      }
      val base = branches.foldLeft(Option.empty[Column]) { case (acc, (cond, t)) =>
        Some(acc.map(_.when(cond, t.col)).getOrElse(when(cond, t.col)))
      }.get
      val full = otherwise match {
        case Some(e) => base.otherwise(compile(e, scope).col)
        case None => base
      }
      Typed(full, branches.head._2.kind)

    case a: Aggregate =>
      throw CypherParseException(s"aggregate ${text(a)} is only allowed as a top-level RETURN item")
  }

  private def compileFunc(name: String, args: List[Expr], scope: Scope): Typed = (name, args) match {
    case ("id", List(Variable(v))) if !scope.lambdas.contains(v) =>
      scope.kindOf(v) match {
        case KNode => Typed(col(s"$v.id"), KPropStr)
        case KRel => Typed(col(s"$v.eid").cast(StringType), KPropStr)
        case _ => throw CypherParseException(s"id() needs an entity variable, got '$v'")
      }
    // lambda-bound entity elements (list comprehension over a rel/node
    // list): structural reads off the lambda Column
    case ("type", List(Variable(v)))
        if scope.lambdas.get(v).exists(_.kind == KRel) =>
      Typed(scope.lambdas(v).col.getField("type"), KStr)
    case ("id", List(Variable(v)))
        if scope.lambdas.get(v).exists(t => t.kind == KRel || t.kind == KNode) =>
      scope.lambdas(v) match {
        case Typed(c, KNode) => Typed(c.getField("id"), KPropStr)
        case Typed(c, _) => Typed(c.getField("eid").cast(StringType), KPropStr)
      }
    case ("labels", List(Variable(v)))
        if scope.lambdas.get(v).exists(_.kind == KNode) =>
      Typed(array(scope.lambdas(v).col.getField("label")), KOther)
    case ("type", List(Variable(v))) if scope.kindOf(v) == KRel => Typed(col(s"$v.type"), KStr)
    case ("labels", List(Variable(v))) if scope.kindOf(v) == KNode => Typed(array(col(s"$v.label")), KOther)
    case ("label", List(Variable(v))) if scope.kindOf(v) == KNode => Typed(col(s"$v.label"), KStr)
    case ("properties", List(Variable(v))) => Typed(col(s"$v.properties"), KOther)
    case ("tofloat", List(a)) => Typed(compile(a, scope).col.try_cast(DoubleType), KNum)
    case ("tointeger", List(a)) => Typed(compile(a, scope).col.try_cast(DoubleType).cast(LongType), KNum)
    case ("tostring", List(a)) => Typed(compile(a, scope).col.cast(StringType), KStr)
    case ("size", List(a)) =>
      val t = compile(a, scope)
      t.kind match {
        case KOther | KRelList | KNodeList => Typed(size(t.col), KNum)
        case _ => Typed(length(t.col.cast(StringType)), KNum)
      }
    case ("startnode", List(Variable(v))) if scope.kindOf(v) == KRel => Typed(col(s"$v.src"), KPropStr)
    case ("endnode", List(Variable(v))) if scope.kindOf(v) == KRel => Typed(col(s"$v.dst"), KPropStr)
    // named-path accessors: the planner materialized the path as
    // struct(nodes, rels), so these are field reads — no re-traversal
    case ("nodes", List(a)) =>
      val t = compile(a, scope)
      if (t.kind != KPath) throw CypherParseException("nodes() takes a named path")
      Typed(t.col.getField("nodes"), KNodeList)
    case ("relationships" | "rels", List(a)) =>
      val t = compile(a, scope)
      if (t.kind != KPath)
        throw CypherParseException("relationships() takes a named path")
      Typed(t.col.getField("rels"), KRelList)
    case ("length", List(a)) =>
      compile(a, scope) match {
        case Typed(c, KPath) => Typed(size(c.getField("rels")), KNum)
        case Typed(c, KOther | KRelList | KNodeList) =>
          Typed(size(c), KNum) // legacy list length
        case _ => throw CypherParseException(
          "length() takes a path or list (use size() for strings)")
      }
    case ("keys", List(Variable(v))) if scope.kindOf(v) == KNode || scope.kindOf(v) == KRel =>
      Typed(array_sort(map_keys(col(s"$v.properties"))), KOther)
    // range(a, b[, step]) — inclusive bounds, openCypher semantics
    case ("range", List(a, b)) =>
      Typed(sequence(numOf(compile(a, scope)).cast(LongType),
        numOf(compile(b, scope)).cast(LongType)), KOther)
    case ("range", List(a, b, st)) =>
      Typed(sequence(numOf(compile(a, scope)).cast(LongType),
        numOf(compile(b, scope)).cast(LongType),
        numOf(compile(st, scope)).cast(LongType)), KOther)
    // list accessors; out-of-range/empty → null, per openCypher
    case ("head", List(a)) => Typed(element_at(compile(a, scope).col, 1), KPropStr)
    case ("last", List(a)) => Typed(element_at(compile(a, scope).col, -1), KPropStr)
    case ("tail", List(a)) =>
      val c = compile(a, scope).col
      Typed(slice(c, lit(2), greatest(size(c) - 1, lit(0))), KOther)
    case ("toboolean", List(a)) =>
      Typed(compile(a, scope).col.try_cast(BooleanType), KBool)
    case ("left", List(a, n)) =>
      Typed(left(strOf(compile(a, scope)), numOf(compile(n, scope)).cast(IntegerType)), KStr)
    case ("right", List(a, n)) =>
      Typed(right(strOf(compile(a, scope)), numOf(compile(n, scope)).cast(IntegerType)), KStr)
    // exists(n.prop) — property existence (openCypher 9). The pattern
    // form exists((n)-[:T]->()) is handled by the planner as a semi-join;
    // reaching here with one means it was nested inside another expression.
    case ("exists", List(prop @ Property(_, _))) =>
      Typed(compile(prop, scope).col.isNotNull, KBool)
    case ("exists", List(PatternPred(_))) =>
      throw CypherParseException(
        "exists(pattern) is supported as a top-level WHERE conjunct only")
    // common scalar functions (parity-plus; reference implements only id())
    case ("toupper", List(a)) => Typed(upper(strOf(compile(a, scope))), KStr)
    case ("tolower", List(a)) => Typed(lower(strOf(compile(a, scope))), KStr)
    case ("trim", List(a)) => Typed(trim(strOf(compile(a, scope))), KStr)
    case ("ltrim", List(a)) => Typed(ltrim(strOf(compile(a, scope))), KStr)
    case ("rtrim", List(a)) => Typed(rtrim(strOf(compile(a, scope))), KStr)
    case ("reverse", List(a)) => Typed(reverse(strOf(compile(a, scope))), KStr)
    case ("replace", List(a, b, c)) =>
      Typed(replace(strOf(compile(a, scope)), strOf(compile(b, scope)), strOf(compile(c, scope))), KStr)
    // openCypher substring(s, start[, len]) is 0-based; Spark substring is 1-based
    case ("substring", List(a, b)) =>
      Typed(substring(strOf(compile(a, scope)),
        numOf(compile(b, scope)).cast(IntegerType) + 1, lit(Int.MaxValue)), KStr)
    case ("substring", List(a, b, c)) =>
      Typed(substring(strOf(compile(a, scope)),
        numOf(compile(b, scope)).cast(IntegerType) + 1,
        numOf(compile(c, scope)).cast(IntegerType)), KStr)
    case ("split", List(a, b)) =>
      Typed(split(strOf(compile(a, scope)), strOf(compile(b, scope)), lit(-1)), KOther)
    case ("coalesce", as) if as.nonEmpty =>
      val ts = as.map(compile(_, scope))
      Typed(coalesce(ts.map(_.col): _*), ts.head.kind)
    case ("abs", List(a)) => Typed(abs(numOf(compile(a, scope))), KNum)
    case ("sign", List(a)) => Typed(signum(numOf(compile(a, scope))), KNum)
    // openCypher math surface: log() is the NATURAL log (ln), matching
    // Neo4j; haversin(x) = (1 - cos(x)) / 2
    case ("exp", List(a)) => Typed(exp(numOf(compile(a, scope))), KNum)
    case ("log", List(a)) => Typed(log(numOf(compile(a, scope))), KNum)
    case ("log10", List(a)) => Typed(log10(numOf(compile(a, scope))), KNum)
    case ("sin", List(a)) => Typed(sin(numOf(compile(a, scope))), KNum)
    case ("cos", List(a)) => Typed(cos(numOf(compile(a, scope))), KNum)
    case ("tan", List(a)) => Typed(tan(numOf(compile(a, scope))), KNum)
    case ("cot", List(a)) => Typed(lit(1.0) / tan(numOf(compile(a, scope))), KNum)
    case ("asin", List(a)) => Typed(asin(numOf(compile(a, scope))), KNum)
    case ("acos", List(a)) => Typed(acos(numOf(compile(a, scope))), KNum)
    case ("atan", List(a)) => Typed(atan(numOf(compile(a, scope))), KNum)
    case ("atan2", List(a, b)) =>
      Typed(atan2(numOf(compile(a, scope)), numOf(compile(b, scope))), KNum)
    case ("degrees", List(a)) => Typed(degrees(numOf(compile(a, scope))), KNum)
    case ("radians", List(a)) => Typed(radians(numOf(compile(a, scope))), KNum)
    case ("haversin", List(a)) =>
      Typed((lit(1.0) - cos(numOf(compile(a, scope)))) / 2.0, KNum)
    case ("pi", Nil) => Typed(lit(math.Pi), KNum)
    case ("e", Nil) => Typed(lit(math.E), KNum)
    case ("isempty", List(a)) =>
      val t = compile(a, scope)
      t.kind match {
        case KOther | KRelList | KNodeList => Typed(size(t.col) === 0, KBool)
        case _ => Typed(length(t.col.cast(StringType)) === 0, KBool)
      }
    case ("ceil", List(a)) => Typed(ceil(numOf(compile(a, scope))).cast(DoubleType), KNum)
    case ("floor", List(a)) => Typed(floor(numOf(compile(a, scope))).cast(DoubleType), KNum)
    case ("sqrt", List(a)) => Typed(sqrt(numOf(compile(a, scope))), KNum)
    case ("round", List(a)) => Typed(round(numOf(compile(a, scope)), 0), KNum)
    case ("round", List(a, b)) =>
      val places = b match {
        case IntLit(v) => v.toInt
        case other => throw CypherParseException(
          s"round() precision must be an integer literal, got ${text(other)}")
      }
      Typed(round(numOf(compile(a, scope)), places), KNum)
    case _ =>
      throw CypherParseException(
        s"function '$name'/${args.length} not supported (reference implements only id(); we add " +
          "type, labels, properties, toFloat, toInteger, toString, size, startNode, endNode, " +
          "toUpper, toLower, trim, lTrim, rTrim, reverse, replace, substring, split, coalesce, " +
          "abs, sign, ceil, floor, sqrt, round, exp, log, log10, sin, cos, tan, cot, asin, " +
          "acos, atan, atan2, degrees, radians, haversin, pi, e, isEmpty, exists, keys, range, " +
          "head, last, tail, toBoolean, left, right, reduce, nodes, relationships, length, " +
          "all, any, none, single)")
  }

  private def strOf(t: Typed): Column = t.col.cast(StringType)
  private def numOf(t: Typed): Column = t.col.try_cast(DoubleType)

  /** List-position compile: a bare null literal types as STRING in the
    * property model, which the array higher-order functions reject —
    * retype it as a null array so filter/forall/exists follow their
    * null-in → null-out path (openCypher's null-list semantics). */
  private def listColOf(lst: Expr, scope: Scope): Column =
    listTypedOf(lst, scope).col

  private def listTypedOf(lst: Expr, scope: Scope): Typed = lst match {
    case NullLit => Typed(lit(null).cast(ArrayType(StringType)), KOther)
    case _ => compile(lst, scope)
  }

  /** Element kind of an entity-list column — lambda vars ranging over a
    * relationship/node list read struct fields, not name-prefixed
    * columns. */
  private def elemKindOf(k: Kind): Kind = k match {
    case KRelList => KRel
    case KNodeList => KNode
    case _ => KPropStr
  }

  /**
   * Comparison with contextual coercion. The decision table follows the
   * reference's FilterHelper: entity vs entity compares ids
   * (`Helpers.cpp:171-182`); a property string compared against a typed
   * literal is coerced to that type, failure → non-match
   * (`Helpers.cpp:197-236`); otherwise plain same-type comparison.
   */
  private def applyOp(op: String, a: Column, b: Column): Column = op match {
    case "=" => a === b
    case "<>" => a =!= b
    case "<" => a < b
    case ">" => a > b
    case "<=" => a <= b
    case ">=" => a >= b
  }

  def compileCmp(op: String, l: Typed, r: Typed): Column =
    (l.kind, r.kind) match {
      case (KNull, _) | (_, KNull) => lit(null).try_cast(BooleanType)
      case (KNum, _) | (_, KNum) => applyOp(op, l.col.try_cast(DoubleType), r.col.try_cast(DoubleType))
      case (KBool, _) | (_, KBool) => applyOp(op, l.col.try_cast(BooleanType), r.col.try_cast(BooleanType))
      case _ => applyOp(op, l.col.cast(StringType), r.col.cast(StringType))
    }
}
