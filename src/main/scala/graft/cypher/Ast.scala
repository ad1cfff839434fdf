package graft.cypher

/**
 * AST for the executable openCypher subset (SURVEY.md §2.1/§2.2): the
 * reference parses full openCypher 9 but plans/executes only MATCH
 * (paths, labels, property maps), WHERE (comparisons, boolean ops,
 * property lookup, id()), RETURN with DISTINCT / ORDER BY / SKIP / LIMIT
 * and aggregation, plus CREATE. We implement that surface (with correct
 * NOT and real DISTINCT — the reference's are buggy no-ops, see
 * `Helpers.cpp:164-166` and `OperatorExecutor.cpp:1351-1394`) and a few
 * parity-plus predicates the reference only parses (STARTS WITH / ENDS
 * WITH / CONTAINS / IN / IS NULL, arithmetic).
 */
object Ast {

  // ----- expressions ------------------------------------------------------
  sealed trait Expr
  final case class Variable(name: String) extends Expr
  final case class Property(variable: String, key: String) extends Expr
  final case class Func(name: String, args: List[Expr]) extends Expr
  /** Aggregation function call. `param` carries percentileCont/Disc's
    * second (percentile) argument. */
  final case class Aggregate(name: String, distinct: Boolean, arg: Option[Expr],
      param: Option[Expr] = None) extends Expr
  final case class StrLit(value: String) extends Expr
  final case class IntLit(value: Long) extends Expr
  final case class DblLit(value: Double) extends Expr
  final case class BoolLit(value: Boolean) extends Expr
  case object NullLit extends Expr
  final case class ListLit(items: List[Expr]) extends Expr
  final case class Cmp(op: String, left: Expr, right: Expr) extends Expr // = <> < > <= >=
  final case class And(left: Expr, right: Expr) extends Expr
  final case class Or(left: Expr, right: Expr) extends Expr
  final case class Xor(left: Expr, right: Expr) extends Expr
  final case class Not(child: Expr) extends Expr
  final case class StartsWith(left: Expr, right: Expr) extends Expr
  final case class EndsWith(left: Expr, right: Expr) extends Expr
  final case class Contains(left: Expr, right: Expr) extends Expr
  final case class In(left: Expr, list: Expr) extends Expr
  final case class IsNull(child: Expr, negated: Boolean) extends Expr
  final case class Arith(op: String, left: Expr, right: Expr) extends Expr // + - * / % ^
  final case class Neg(child: Expr) extends Expr
  /** CASE [subject] WHEN v THEN r ... [ELSE d] END — simple and searched. */
  /** List comprehension `[v IN list WHERE pred | proj]` (WHERE and the
    * projection each optional). The reference grammar parses these
    * (`ASTBuilder.h:139-183`) with no planner support; executable here
    * via Spark's filter/transform higher-order functions. */
  final case class ListComp(variable: String, list: Expr,
      where: Option[Expr], proj: Option[Expr]) extends Expr
  /** Pattern used as a boolean predicate in WHERE — `(n)-[:T]->(:L)` or
    * `exists((n)-...)`; compiled to a semi/anti join by the planner. */
  final case class PatternPred(path: PathPattern) extends Expr
  /** `reduce(acc = init, v IN list | expr)` — openCypher list fold,
    * compiled to Spark's `aggregate` higher-order function. */
  final case class ReduceExpr(acc: String, init: Expr, variable: String,
      list: Expr, body: Expr) extends Expr
  /** `EXISTS { [MATCH] paths [WHERE pred] }` — existential subquery. The
    * reference grammar parses these (`ASTBuilder.cpp:1086-1092`,
    * visitOC_ExistentialSubquery) with no planner support; executable here
    * as a decorrelated LEFT SEMI / LEFT ANTI join (Planner.applyExistsSub).
    * Variables shared with the outer scope correlate; the inner WHERE may
    * reference outer variables. */
  final case class ExistsSub(paths: List[PathPattern], where: Option[Expr]) extends Expr
  /** Pattern comprehension `[(a)-[:T]->(b) WHERE pred | proj]` — a list
    * per outer row of the projection over every match of the pattern.
    * Reference grammar: `ASTBuilder.cpp:1094-1160` (planner TODO).
    * Compiled to a grouped collect + left join, never per-row
    * re-execution; the list is sorted for determinism (openCypher leaves
    * comprehension order unspecified). */
  final case class PatternComp(path: PathPattern, where: Option[Expr],
      proj: Expr) extends Expr
  final case class CaseExpr(subject: Option[Expr], whens: List[(Expr, Expr)],
      otherwise: Option[Expr]) extends Expr
  /** `all/any/none/single(v IN list WHERE pred)` — openCypher list
    * quantifiers, compiled to Spark's forall/exists higher-order
    * functions (whose three-valued null semantics match openCypher's). */
  final case class Quantifier(kind: String, variable: String,
      list: Expr, pred: Expr) extends Expr

  val aggregateNames = Set("avg", "sum", "min", "max", "count", "collect",
    "stdev", "stdevp", "percentilecont", "percentiledisc")

  val quantifierNames = Set("all", "any", "none", "single")

  def containsAggregate(e: Expr): Boolean = e match {
    case _: Aggregate => true
    case Func(_, args) => args.exists(containsAggregate)
    case Cmp(_, l, r) => containsAggregate(l) || containsAggregate(r)
    case And(l, r) => containsAggregate(l) || containsAggregate(r)
    case Or(l, r) => containsAggregate(l) || containsAggregate(r)
    case Xor(l, r) => containsAggregate(l) || containsAggregate(r)
    case Not(c) => containsAggregate(c)
    case Arith(_, l, r) => containsAggregate(l) || containsAggregate(r)
    case Neg(c) => containsAggregate(c)
    case CaseExpr(s, ws, e) =>
      s.exists(containsAggregate) || ws.exists(p => containsAggregate(p._1) || containsAggregate(p._2)) ||
        e.exists(containsAggregate)
    case _ => false
  }

  /** Canonical source-like rendering, used as the default output column name
    * (reference output keys look like `n.age`, `avg(n.age)`). */
  def text(e: Expr): String = e match {
    case Variable(n) => n
    case Property(v, k) => s"$v.$k"
    case Func(n, args) => s"$n(${args.map(text).mkString(", ")})"
    case Aggregate(n, d, a, prm) =>
      val inner = a.map(text).getOrElse("*") + prm.map(", " + text(_)).getOrElse("")
      s"$n(${if (d) "DISTINCT " else ""}$inner)"
    case StrLit(s) => s"'$s'"
    case IntLit(v) => v.toString
    case DblLit(v) => v.toString
    case BoolLit(v) => v.toString
    case NullLit => "null"
    case ListLit(xs) => xs.map(text).mkString("[", ", ", "]")
    case Cmp(op, l, r) => s"${text(l)} $op ${text(r)}"
    case And(l, r) => s"${text(l)} AND ${text(r)}"
    case Or(l, r) => s"${text(l)} OR ${text(r)}"
    case Xor(l, r) => s"${text(l)} XOR ${text(r)}"
    case Not(c) => s"NOT ${text(c)}"
    case StartsWith(l, r) => s"${text(l)} STARTS WITH ${text(r)}"
    case EndsWith(l, r) => s"${text(l)} ENDS WITH ${text(r)}"
    case Contains(l, r) => s"${text(l)} CONTAINS ${text(r)}"
    case In(l, r) => s"${text(l)} IN ${text(r)}"
    case IsNull(c, neg) => s"${text(c)} IS ${if (neg) "NOT " else ""}NULL"
    case Arith(op, l, r) => s"${text(l)} $op ${text(r)}"
    case Neg(c) => s"-${text(c)}"
    case CaseExpr(subj, whens, els) =>
      "CASE" + subj.map(" " + text(_)).getOrElse("") +
        whens.map { case (w, t) => s" WHEN ${text(w)} THEN ${text(t)}" }.mkString +
        els.map(" ELSE " + text(_)).getOrElse("") + " END"
    case ListComp(v, l, w, pr) =>
      s"[$v IN ${text(l)}" + w.map(" WHERE " + text(_)).getOrElse("") +
        pr.map(" | " + text(_)).getOrElse("") + "]"
    case PatternPred(path) =>
      val hops = path.hops.map { case (r, n) =>
        s"-[${r.types.mkString("|")}]-${n.labels.mkString(":")}" }.mkString
      s"(${path.start.variable.getOrElse("")})$hops"
    case ReduceExpr(a, i, v, l, b) =>
      s"reduce($a = ${text(i)}, $v IN ${text(l)} | ${text(b)})"
    case ExistsSub(paths, w) =>
      s"EXISTS { ${paths.map(p => text(PatternPred(p))).mkString(", ")}" +
        w.map(" WHERE " + text(_)).getOrElse("") + " }"
    case PatternComp(path, w, proj) =>
      s"[${text(PatternPred(path))}" + w.map(" WHERE " + text(_)).getOrElse("") +
        s" | ${text(proj)}]"
    case Quantifier(k, v, l, p) => s"$k($v IN ${text(l)} WHERE ${text(p)})"
  }

  /** Variable names bound or referenced by a pattern: node/rel variables,
    * the path name, and free variables of inline property-map values. */
  def patternVars(p: PathPattern): Set[String] = {
    val nodes = p.start :: p.hops.map(_._2)
    val rels = p.hops.map(_._1)
    nodes.flatMap(_.variable).toSet ++ rels.flatMap(_.variable) ++ p.name ++
      nodes.flatMap(_.properties.values.flatMap(freeVars)) ++
      rels.flatMap(_.properties.values.flatMap(freeVars))
  }

  /** Free variable names of an expression (comprehension / reduce lambda
    * variables excluded within their extent). Used by the planner to
    * decide which outer bindings an EXISTS / pattern comprehension
    * correlates on. */
  def freeVars(e: Expr): Set[String] = e match {
    case Variable(n) => Set(n)
    case Property(v, _) => Set(v)
    case Func(_, args) => args.flatMap(freeVars).toSet
    case Aggregate(_, _, a, prm) => (a.toList ++ prm.toList).flatMap(freeVars).toSet
    case Cmp(_, l, r) => freeVars(l) ++ freeVars(r)
    case And(l, r) => freeVars(l) ++ freeVars(r)
    case Or(l, r) => freeVars(l) ++ freeVars(r)
    case Xor(l, r) => freeVars(l) ++ freeVars(r)
    case Not(c) => freeVars(c)
    case StartsWith(l, r) => freeVars(l) ++ freeVars(r)
    case EndsWith(l, r) => freeVars(l) ++ freeVars(r)
    case Contains(l, r) => freeVars(l) ++ freeVars(r)
    case In(l, r) => freeVars(l) ++ freeVars(r)
    case IsNull(c, _) => freeVars(c)
    case Arith(_, l, r) => freeVars(l) ++ freeVars(r)
    case Neg(c) => freeVars(c)
    case ListLit(xs) => xs.flatMap(freeVars).toSet
    case CaseExpr(s, ws, o) =>
      (s.toList ++ ws.flatMap(w => List(w._1, w._2)) ++ o.toList).flatMap(freeVars).toSet
    case ListComp(v, lst, w, pr) =>
      freeVars(lst) ++ ((w.toList ++ pr.toList).flatMap(freeVars).toSet - v)
    case ReduceExpr(acc, init, v, lst, body) =>
      freeVars(init) ++ freeVars(lst) ++ (freeVars(body) -- Set(acc, v))
    case PatternPred(p) => patternVars(p)
    case ExistsSub(paths, w) =>
      paths.flatMap(patternVars).toSet ++ w.toList.flatMap(freeVars)
    case PatternComp(path, w, proj) =>
      patternVars(path) ++ (w.toList :+ proj).flatMap(freeVars)
    case Quantifier(v0, v, l, p) => freeVars(l) ++ (freeVars(p) - v)
    case _ => Set.empty
  }

  /** Rebuild an expression with `f` applied to each direct child. Does NOT
    * descend into ExistsSub / PatternComp / PatternPred — those carry
    * whole subplans with their own variable scopes and are handled by
    * their own planner machinery. */
  def mapChildren(e: Expr, f: Expr => Expr): Expr = e match {
    case Func(n, args) => Func(n, args.map(f))
    case Aggregate(n, d, a, p) => Aggregate(n, d, a.map(f), p.map(f))
    case Cmp(op, l, r) => Cmp(op, f(l), f(r))
    case And(l, r) => And(f(l), f(r))
    case Or(l, r) => Or(f(l), f(r))
    case Xor(l, r) => Xor(f(l), f(r))
    case Not(c) => Not(f(c))
    case StartsWith(l, r) => StartsWith(f(l), f(r))
    case EndsWith(l, r) => EndsWith(f(l), f(r))
    case Contains(l, r) => Contains(f(l), f(r))
    case In(l, r) => In(f(l), f(r))
    case IsNull(c, n) => IsNull(f(c), n)
    case Arith(op, l, r) => Arith(op, f(l), f(r))
    case Neg(c) => Neg(f(c))
    case ListLit(xs) => ListLit(xs.map(f))
    case CaseExpr(s, ws, o) =>
      CaseExpr(s.map(f), ws.map { case (a, b) => (f(a), f(b)) }, o.map(f))
    case ListComp(v, l, w, pr) => ListComp(v, f(l), w.map(f), pr.map(f))
    case ReduceExpr(a, i, v, l, b) => ReduceExpr(a, f(i), v, f(l), f(b))
    case Quantifier(k, v, l, p) => Quantifier(k, v, f(l), f(p))
    case other => other
  }

  // ----- patterns ---------------------------------------------------------
  sealed trait Direction
  case object DirRight extends Direction // -[]->
  case object DirLeft extends Direction  // <-[]-
  case object DirBoth extends Direction  // -[]-

  final case class NodePattern(
      variable: Option[String],
      labels: List[String],
      properties: Map[String, Expr])

  final case class RelPattern(
      variable: Option[String],
      types: List[String],
      direction: Direction,
      properties: Map[String, Expr],
      varLength: Option[(Int, Int)] = None)

  /** `name` binds the whole path (`MATCH p = (a)-[]->(b)`) — the planner
    * materializes it as a struct of node/relationship arrays so
    * `nodes(p)` / `relationships(p)` / `length(p)` are plain column
    * accesses (no re-traversal). MATCH-only; CREATE/MERGE reject names. */
  /** `shortest`: the path is wrapped in a shortest-path pattern function —
    * `Some(false)` = `shortestPath(...)` (one deterministic shortest path
    * per endpoint pair), `Some(true)` = `allShortestPaths(...)` (every
    * minimal-length path). The reference grammar accepts both with no
    * planner support (`ASTBuilder.h:139-183`); executable here. */
  final case class PathPattern(start: NodePattern, hops: List[(RelPattern, NodePattern)],
      name: Option[String] = None, shortest: Option[Boolean] = None)

  // ----- clauses ----------------------------------------------------------
  final case class MatchClause(paths: List[PathPattern], where: Option[Expr], optional: Boolean = false)
  final case class ReturnItem(expr: Expr, alias: Option[String]) {
    def name: String = alias.getOrElse(text(expr))
  }
  final case class SortItem(expr: Expr, ascending: Boolean)
  final case class ReturnClause(
      distinct: Boolean,
      items: List[ReturnItem],
      orderBy: List[SortItem],
      skip: Option[Long],
      limit: Option[Long])

  final case class CreateClause(paths: List[PathPattern])

  /** WITH: intermediate projection (+ optional post-filter) chaining query
    * parts — the reference plans this as Apply but has no runtime executor
    * (SURVEY.md §2.1 #20); here it is executable (parity-plus). */
  final case class WithClause(projection: ReturnClause, where: Option[Expr])

  /** UNWIND list AS var — reference planner TODO; executable here. */
  final case class UnwindClause(list: Expr, variable: String)

  /** SET n.key = expr, ... — graph mutation (reference planner TODO). */
  final case class SetClause(items: List[(String, String, Expr)])
  /** REMOVE n.key, ... */
  final case class RemoveClause(items: List[(String, String)])
  /** [DETACH] DELETE v, ... */
  final case class DeleteClause(variables: List[String], detach: Boolean)
  /** MERGE (match-or-create over full path patterns), with optional
    * `ON CREATE SET` / `ON MATCH SET` arms (items shaped like SetClause's).
    * The reference parses MERGE but never executes it; both arms are
    * executable here (parity-plus). */
  final case class MergeClause(paths: List[PathPattern],
      onCreate: List[(String, String, Expr)] = Nil,
      onMatch: List[(String, String, Expr)] = Nil)
  /** CALL proc(args) [YIELD col [AS alias], ...] — executable against the
    * procedure registry (parity-plus: the reference parses CALL but has
    * no runtime executor). Empty `yields` = all output columns. */
  final case class CallClause(procedure: String, args: List[Expr],
      yields: List[(String, Option[String])])

  sealed trait Clause
  final case class CallPart(clause: CallClause) extends Clause
  final case class UnwindPart(clause: UnwindClause) extends Clause
  final case class SetPart(clause: SetClause) extends Clause
  final case class MergePart(clause: MergeClause) extends Clause
  final case class RemovePart(clause: RemoveClause) extends Clause
  final case class DeletePart(clause: DeleteClause) extends Clause
  final case class MatchPart(clause: MatchClause) extends Clause
  final case class WithPart(clause: WithClause) extends Clause
  final case class CreatePart(clause: CreateClause) extends Clause
  final case class ReturnPart(clause: ReturnClause) extends Clause

  /** Top-level UNION chain: head query plus (isUnionAll, query) tails. */
  final case class UnionQuery(head: Query, tails: List[(Boolean, Query)])

  final case class Query(clauses: List[Clause]) {
    def matches: List[MatchClause] = clauses.collect { case MatchPart(m) => m }
    def creates: List[CreateClause] = clauses.collect { case CreatePart(c) => c }
    def returns: Option[ReturnClause] = clauses.collectFirst { case ReturnPart(r) => r }
    def isMutation: Boolean = clauses.exists {
      case _: SetPart | _: RemovePart | _: DeletePart | _: CreatePart | _: MergePart => true
      case _ => false
    }
  }
}
