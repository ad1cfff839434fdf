package graft.cypher

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.PropertyGraph
import Ast._
import ExprCompiler.{Kind, KNode, KRel, Scope, Typed}

/**
 * Compiles a parsed Cypher query into one declarative DataFrame plan.
 *
 * Where the reference hand-builds a distributed operator pipeline — scans
 * anchored by annotation strength, ExpandAll shipping sub-queries to the
 * partition owning a node (`OperatorExecutor.cpp:1152-1186`), master-side
 * k-way merges — we emit joins/filters/aggregates and let Catalyst pick
 * join order and physical strategy; the shuffle service replaces
 * worker-to-worker row shipping wholesale (SURVEY.md §3.1).
 *
 * Semantics deliberately reproduced from the reference planner:
 *  - undirected graphs match every relationship in both orientations
 *    (`OperatorExecutor.cpp:610-725`);
 *  - consecutive hops of one path may not bind the same physical edge —
 *    the planner injects `r_i.eid <> r_{i+1}.eid`, mirroring
 *    `prepareWhereClause` (`QueryPlanner.cpp:571-582`);
 *  - `(:A:B)` label lists mean label ∈ {A,B} (MultipleNodeScanByLabel,
 *    `QueryPlanner.cpp:284-297`);
 *  - comma-separated patterns form a cartesian product
 *    (`QueryPlanner.cpp:190-196`) unless they share variables, in which
 *    case the shared binding constrains the join.
 */
final class Planner(graph: PropertyGraph, counterStart: Int = 0) {

  private var counter = counterStart
  private def fresh(prefix: String): String = { counter += 1; s"__${prefix}$counter" }

  // r16: named-path surface pruning (Planner.pathFieldUsage) — set by the
  // runner before planning; compilePath slims the tracked node/rel struct
  // arrays to the fields the query can actually read. Empty map = no
  // analysis ran = keep full structs everywhere.
  private var pathFieldUse
      : Map[String, (Option[Set[String]], Option[Set[String]])] = Map.empty
  private var relListUse: Map[String, Option[Set[String]]] = Map.empty
  def setSurfaceUse(u: Planner.SurfaceUsage): Unit = {
    pathFieldUse = u.paths; relListUse = u.relLists
  }
  /** Current anonymous-variable counter — used to seed a replacement
    * planner after a mutation so regenerated fresh names can't collide
    * with columns already bound by this planner. */
  private[cypher] def counterValue: Int = counter

  private def nodeStruct(v: String): DataFrame =
    graph.nodes.select(struct(col("id"), col("label"), col("properties")).as(v))

  private def edgeStruct(v: String, bothDirections: Boolean): DataFrame = {
    val base = if (bothDirections) PropertyGraph.bothOrientations(graph.edges) else graph.edges
    base.select(struct(col("eid"), col("src"), col("dst"), col("type"), col("properties")).as(v))
  }

  import Planner.BindCtx

  // ------------------------------------------------------------------
  // Anchored top-k pushdown (r15). `MATCH <linear path> RETURN ... ORDER
  // BY f(anchor) [, ...] LIMIT k` joins the FULL pattern product before
  // the TakeOrderedAndProject sees a row — output-quadratic patterns
  // (customers×suppliers per nation) materialize ~n² rows for a 500-row
  // answer, the one standing 100 TB scale-killer of the r14 audit. The
  // top-k rows can only come from anchors whose leading key is among the
  // k best *matched* anchors, so:
  //   phase A: walk the path as an anchor-id frontier (dedup per hop,
  //     final hop a LEFT SEMI — never materializes the product) to find
  //     which anchors have ≥1 match, and take the k-th best leading-key
  //     value among them (1-row frame, broadcast);
  //   phase B: plan the query unchanged but filter the anchor SCAN to
  //     `f <= kth` (ties kept via <=, null keys kept — a strict superset
  //     of the anchors that can reach the top k, so values are identical).
  // Installed only for shapes where the threshold argument is exact:
  // single linear fixed-length path, distinct node variables, anchor-only
  // scalar WHERE, no DISTINCT/aggregation, leading sort key a function of
  // the path's start variable alone.
  // ------------------------------------------------------------------
  private var anchorPrune: Map[String, DataFrame => DataFrame] = Map.empty

  /** Inspect a read query and, when the shape qualifies, register a
    * scan-time prune for the anchor variable. Returns the query to plan:
    * usually `q` unchanged — but when the leading sort key sits on the
    * path's LAST node, the path is REVERSED (each hop's arrow flipped;
    * exactly the same rows) so the sorted variable becomes the anchor
    * scan the prune can act on. Safe no-op otherwise (any compile
    * failure during speculative construction bails). */
  def installTopKPruning(q: Query): Query = {
    // the modifier source: RETURN directly after the MATCH, or the
    // first WITH (whose ORDER BY / LIMIT bound the rows every later
    // clause sees; a WITH ... WHERE filters AFTER the limit, so it
    // cannot change which rows reach it)
    val parts: Option[(MatchClause, ReturnClause, List[Clause])] =
      q.clauses match {
        case List(MatchPart(m), ReturnPart(ret)) => Some((m, ret, Nil))
        case MatchPart(m) :: (wp @ WithPart(w)) :: rest =>
          Some((m, w.projection, wp :: rest))
        case _ => None
      }
    parts match {
      case Some((m, ret, rest))
          if !m.optional && m.paths.size == 1 &&
            ret.limit.isDefined && ret.orderBy.nonEmpty =>
        // aggregating projections are admissible when the sort key is a
        // GROUPING key (installTopK checks): the LIMIT then counts
        // groups, a group exists iff ≥1 full row matches, and the k-th
        // DISTINCT matched f value bounds every group that can reach
        // the top k. ORDER BY an aggregate stays excluded — that
        // threshold isn't computable before aggregation.
        installTopK(q, m, ret, rest)
      case _ => q
    }
  }

  private def installTopK(q: Query, m: MatchClause, ret: ReturnClause,
                          rest: List[Clause]): Query = {
      val path0 = m.paths.head
      val k = ret.limit.get + ret.skip.getOrElse(0L)
      val allNodeVars = path0.start.variable.toList ++ path0.hops.flatMap(_._2.variable)
      val shapeOk = path0.shortest.isEmpty &&
        path0.hops.nonEmpty && path0.hops.forall(_._1.varLength.isEmpty) &&
        allNodeVars.distinct == allNodeVars && k > 0 && k <= 100000
      if (!shapeOk) return q
      // resolve the leading sort key through the RETURN items (aliases)
      val lead = ret.orderBy.head
      val leadItem = ret.items.find(i => i.expr == lead.expr ||
          i.alias.contains(text(lead.expr)) || i.name == text(lead.expr))
      val leadExpr = leadItem.map(_.expr).getOrElse(lead.expr)
      // aggregation: the sort key must be a grouping key — a RETURN
      // item that is itself aggregate-free (post-aggregation scope can
      // only sort on grouping keys or aggregates; the latter bails)
      val hasAgg = ret.items.exists(i => containsAggregate(i.expr))
      if (containsAggregate(leadExpr) || (hasAgg && leadItem.isEmpty)) return q
      val sortVars = freeVars(leadExpr)
      // pick the path orientation that puts the sorted variable at the
      // anchor scan: as written, or reversed (legal when no hop depends
      // on the typed-anchor orientation rule and no named-path arrays
      // would flip — explicit arrows flip losslessly)
      val (path, reversed) =
        if (path0.start.variable.exists(sortVars == Set(_))) (path0, false)
        else if (path0.hops.last._2.variable.exists(sortVars == Set(_)) &&
            path0.name.isEmpty &&
            (!graph.isDirected || path0.hops.forall(_._1.direction != DirBoth)))
          (Planner.reversePath(path0), true)
        else return q
      val startVar = path.start.variable.get
      // WHERE folds into phase A only as per-variable conjuncts: the
      // matched-anchor set must apply AT LEAST every constraint the
      // real query applies (a missed filter overestimates the matched
      // set → threshold too small → wrong answers; extra strictness
      // only keeps more anchors). A conjunct spanning two variables
      // can't anchor to one hop → bail.
      def conjunctsOf(e: Expr): List[Expr] = e match {
        case And(l, r) => conjunctsOf(l) ++ conjunctsOf(r)
        case other => List(other)
      }
      val pathVars: Set[String] = allNodeVars.toSet ++
        path.hops.flatMap(_._1.variable)
      val conjPairs = m.where.toList.flatMap(conjunctsOf)
        .map(c => (freeVars(c), c))
      val whereOk = conjPairs.forall { case (vs, _) =>
        vs.size == 1 && pathVars(vs.head) }
      if (whereOk) {
        val whereByVar: Map[String, List[Expr]] =
          conjPairs.groupBy(_._1.head).view.mapValues(_.map(_._2)).toMap
        scala.util.Try {
          val fCol = ExprCompiler.compile(leadExpr, Scope(Map(startVar -> KNode))).col
          // DISTINCT dedups rows before the limit; k anchors may share
          // the sort value and collapse, so the threshold must count
          // DISTINCT f values — k distinct values guarantee ≥ k distinct
          // rows (the sort key is an output item under DISTINCT, pinned
          // by compileReturn). Aggregation limits GROUPS the same way:
          // groups are keyed by the (finer) full grouping-key tuple, so
          // k distinct f values guarantee ≥ k groups, and every row of a
          // surviving group has f <= kth — aggregate values stay exact.
          // Without either, per-anchor counting prunes harder and each
          // anchor's ≥1 row stands on its own.
          val kth = matchedAnchorThreshold(path, startVar, fCol, lead.ascending,
            whereByVar, k.toInt, distinctF = ret.distinct || hasAgg)
          val prune: DataFrame => DataFrame = { scan =>
            val f = ExprCompiler.compile(leadExpr, Scope(Map(startVar -> KNode))).col
            scan.crossJoin(broadcast(kth)).where(
              col("__kth").isNull || f.isNull ||
                (if (lead.ascending) f <= col("__kth") else f >= col("__kth")))
              .drop("__kth")
          }
          anchorPrune += (startVar -> prune)
        }
      }
      if (reversed && anchorPrune.contains(startVar))
        q.copy(clauses = MatchPart(m.copy(paths = List(path))) ::
          (if (rest.isEmpty) List(ReturnPart(ret)) else rest))
      else q
  }

  /** Phase A of the top-k pushdown: the k-th best leading-key value among
    * anchors with ≥1 full-path match, as a 1-row (`__kth`) frame. The walk
    * carries (anchor id, leading key, previous eid, current node id) —
    * dedup'd per hop, so state is bounded by BFS frontier size, and the
    * final hop is a LEFT SEMI: the pattern's output product is never
    * materialized. Hop orientation/type/property semantics mirror
    * compilePath exactly (incl. the typed-anchor rule and consecutive
    * rel-uniqueness), so "matched" here is exactly "produces ≥1 row". */
  private def matchedAnchorThreshold(path: PathPattern, startVar: String,
      fCol: Column, asc: Boolean, whereByVar: Map[String, List[Expr]],
      k: Int, distinctF: Boolean = false): DataFrame = {
    def whereFilters(v: String, kind: Kind): Seq[Column] =
      whereByVar.getOrElse(v, Nil).map(e =>
        ExprCompiler.compile(e, Scope(Map(v -> kind))).col.try_cast(BooleanType))
    var base = nodeStruct(startVar)
    val anchorScope = Scope(Map(startVar -> KNode))
    labelFilter(startVar, path.start.labels).foreach(c => base = base.filter(c))
    propFilter(startVar, path.start.properties, anchorScope).foreach(c => base = base.filter(c))
    whereFilters(startVar, KNode).foreach(c => base = base.filter(c))
    val eidType = graph.edges.schema("eid").dataType
    var fr = base.select(col(s"$startVar.id").as("__aid"), fCol.as("__f"),
      lit(null).cast(eidType).as("__peid"), col(s"$startVar.id").as("__cur"))
    val anchorIdx = if (graph.isDirected) path.hops.indexWhere(_._1.types.nonEmpty) else -1
    val lastIdx = path.hops.size - 1
    path.hops.zipWithIndex.foreach { case ((rel, node), hopIdx) =>
      val bothDirs =
        if (graph.isDirected) rel.direction == DirBoth && hopIdx != anchorIdx
        else true
      val (fromField, toField) = rel.direction match {
        case DirLeft => ("dst", "src")
        case _ => ("src", "dst")
      }
      // use the REAL variable names so per-variable WHERE conjuncts
      // compile against the hop they constrain
      val rv = rel.variable.getOrElse(fresh("tkr"))
      val tv = node.variable.getOrElse(fresh("tkn"))
      var right = edgeStruct(rv, bothDirs)
        .join(nodeStruct(tv), col(s"$rv.$toField") === col(s"$tv.id"))
      labelFilter(tv, node.labels).foreach(c => right = right.filter(c))
      propFilter(tv, node.properties, Scope(Map(tv -> KNode))).foreach(c => right = right.filter(c))
      propFilter(rv, rel.properties, Scope(Map(rv -> KRel))).foreach(c => right = right.filter(c))
      whereFilters(tv, KNode).foreach(c => right = right.filter(c))
      whereFilters(rv, KRel).foreach(c => right = right.filter(c))
      var cond = col("__cur") === col(s"$rv.$fromField") &&
        (col("__peid").isNull || col("__peid") =!= col(s"$rv.eid"))
      if (rel.types.nonEmpty) cond = cond &&
        (if (rel.types.size == 1) col(s"$rv.type") === rel.types.head
         else col(s"$rv.type").isin(rel.types: _*))
      fr =
        if (hopIdx == lastIdx) fr.join(right, cond, "left_semi")
        else fr.join(right, cond)
          .select(col("__aid"), col("__f"),
            col(s"$rv.eid").as("__peid"), col(s"$tv.id").as("__cur"))
          .dropDuplicates("__aid", "__peid", "__cur")
    }
    val matched =
      if (distinctF) fr.select(col("__f")).distinct()
      else fr.select(col("__aid"), col("__f")).dropDuplicates("__aid")
    matched.where(col("__f").isNotNull)
      .orderBy(if (asc) col("__f").asc else col("__f").desc)
      .limit(k)
      .agg((if (asc) max(col("__f")) else min(col("__f"))).as("__kth"))
  }

  /** Label predicate on a bound node struct. */
  private def labelFilter(v: String, labels: List[String]): Option[Column] =
    if (labels.isEmpty) None
    else if (labels.size == 1) Some(col(s"$v.label") === labels.head)
    else Some(col(s"$v.label").isin(labels: _*)) // MultipleNodeScanByLabel

  /** Inline property-map predicate ({k: lit}) on a bound entity struct. */
  private def propFilter(v: String, props: Map[String, Expr], scope: Scope): Option[Column] = {
    if (props.isEmpty) return None
    val conds = props.toSeq.sortBy(_._1).map { case (k, valueExpr) =>
      val lhs = Typed(element_at(col(s"$v.properties"), k), ExprCompiler.KPropStr)
      val rhs = ExprCompiler.compile(valueExpr, scope)
      ExprCompiler.compileCmp("=", lhs, rhs)
    }
    Some(conds.reduce(_ && _))
  }

  /** One MATCH clause applied to the running binding context. Deferred
    * path finalizers (the shortest-path window filter) run AFTER the
    * WHERE, so endpoint predicates reach the scans first. */
  def applyMatch(start: BindCtx, m: MatchClause): BindCtx = {
    if (m.optional && start.df.nonEmpty) return applyOptionalMatch(start, m)
    var ctx = start
    val seeds = m.where.map(seedPredicates).getOrElse(Map.empty)
    m.paths.foreach { path => ctx = compilePath(path, ctx, seeds) }
    m.where.foreach { w => ctx = applyWhere(ctx, w) }
    applyPending(ctx)
  }

  /**
   * WHERE conjuncts of the form `id(v) = <literal>` (either operand
   * order). Such a predicate pins `v` to AT MOST ONE node, so a path
   * anchored at `v` is a pinpoint traversal: the anchor scan is seeded
   * with the filter and every expansion step broadcast-joins the (tiny)
   * accumulated frontier against the edge table instead of shuffling the
   * edges — the plan a 100 TB single-source query needs. Without this,
   * Catalyst keeps sort-merge joins: the cached node relation's size
   * estimate doesn't shrink under a filter (no CBO column stats), and
   * while AQE later flips the join to broadcast, the edge-side shuffles
   * have already run. The WHERE itself still applies afterwards
   * (idempotent — Catalyst collapses the duplicate filter).
   */
  private def seedPredicates(w: Ast.Expr): Map[String, Ast.Expr] = {
    def conjuncts(e: Ast.Expr): List[Ast.Expr] = e match {
      case Ast.And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => List(other)
    }
    def lit(e: Ast.Expr): Boolean = e match {
      case _: Ast.StrLit | _: Ast.IntLit | _: Ast.DblLit => true
      case _ => false
    }
    conjuncts(w).flatMap {
      case c @ Ast.Cmp("=", Ast.Func(f, List(Ast.Variable(v))), r)
          if f.equalsIgnoreCase("id") && lit(r) => Some(v -> c)
      case c @ Ast.Cmp("=", l, Ast.Func(f, List(Ast.Variable(v))))
          if f.equalsIgnoreCase("id") && lit(l) => Some(v -> c)
      case _ => None
    }.toMap
  }

  /** Apply any deferred per-path finalizers (see BindCtx.pending). */
  private def applyPending(start: BindCtx): BindCtx = {
    var ctx = start
    ctx.pending.foreach(f => ctx = ctx.copy(df = Some(f(ctx.df.get))))
    ctx.copy(pending = Nil)
  }

  /** WHERE handling: top-level conjuncts that are pattern predicates —
    * `(n)-[:T]->(:L)`, `exists(pattern)`, possibly under NOT — become
    * semi/anti joins; everything else recombines into one scalar filter.
    * A pattern nested deeper (e.g. under OR) is rejected with a clear
    * message by the expression compiler. */
  private def applyWhere(start: BindCtx, w: Ast.Expr): BindCtx = {
    def conjuncts(e: Ast.Expr): List[Ast.Expr] = e match {
      case Ast.And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => List(other)
    }
    def patternOf(e: Ast.Expr, negated: Boolean)
        : Option[(Either[PathPattern, ExistsSub], Boolean)] = e match {
      case Ast.PatternPred(p) => Some((Left(p), negated))
      case Ast.Func(n, List(Ast.PatternPred(p))) if n.equalsIgnoreCase("exists") =>
        Some((Left(p), negated))
      case es: Ast.ExistsSub => Some((Right(es), negated))
      case Ast.Not(inner) => patternOf(inner, !negated)
      case _ => None
    }
    val (patterns, scalars) = conjuncts(w).partition(patternOf(_, negated = false).isDefined)
    var ctx = start
    scalars.reduceOption(Ast.And.apply).foreach { s =>
      val (ctx2, rewritten) = materializePatternComps(ctx, List(s))
      ctx = ctx2
      val cond = ExprCompiler.compile(rewritten.head, Scope(ctx.scope)).col.try_cast(BooleanType)
      ctx = ctx.copy(df = Some(ctx.df.getOrElse(emptyRow()).filter(cond)))
    }
    patterns.foreach { pe =>
      patternOf(pe, negated = false).get match {
        case (Left(path), negated) => ctx = applyPatternPredicate(ctx, path, negated)
        case (Right(es), negated) => ctx = applyExistsSub(ctx, es, negated)
      }
    }
    ctx
  }

  /**
   * EXISTS { [MATCH] paths [WHERE pred] } (parity-plus — the reference
   * grammar parses existential subqueries, `ASTBuilder.cpp:1086`, planner
   * TODO): decorrelated into one LEFT SEMI (LEFT ANTI under NOT) join.
   * The subquery is compiled over a SEED frame — the distinct outer
   * bindings of every correlated variable (variables the subquery shares
   * with the outer scope, whether in its patterns or its WHERE) — so the
   * inner WHERE can reference outer variables, and the whole construct is
   * one equi-join shuffle at scale, never a per-row re-execution. An
   * uncorrelated EXISTS joins on a constant (broadcast 0/1-row side).
   */
  private def applyExistsSub(start: BindCtx, sub: ExistsSub, negated: Boolean): BindCtx = {
    val mentioned = sub.paths.flatMap(Ast.patternVars).toSet ++
      sub.where.toList.flatMap(Ast.freeVars)
    val shared = (mentioned & start.scope.keySet).toSeq.sorted.filterNot(_.startsWith("__"))
    shared.find(v => start.scope(v) == ExprCompiler.KPath).foreach { v =>
      throw CypherParseException(s"EXISTS cannot correlate on path variable '$v'")
    }
    var ctx =
      if (shared.isEmpty) BindCtx(None, Map.empty)
      else BindCtx(
        Some(Planner.dedupRows(start.df.get.select(shared.map(v => col(s"`$v`")): _*))),
        shared.map(v => v -> start.scope(v)).toMap)
    sub.paths.foreach { p => ctx = compilePath(p, ctx) }
    sub.where.foreach { w => ctx = applyWhere(ctx, w) }
    ctx = applyPending(ctx)
    val pruned =
      if (shared.isEmpty) ctx.df.get.select(lit(1).as("__ex"))
      else ctx.df.get.select(shared.map(v => col(s"`$v`").as(s"__ex_$v")): _*)
    val joinCond = shared.map { v =>
      start.scope(v) match {
        case KRel => col(s"`$v`.eid") === col(s"`__ex_$v`.eid")
        case KNode => col(s"`$v`.id") === col(s"`__ex_$v`.id")
        case _ => col(s"`$v`") === col(s"`__ex_$v`")
      }
    }.reduceOption(_ && _).getOrElse(lit(true))
    val joined = start.df.getOrElse(emptyRow())
      .join(pruned, joinCond, if (negated) "left_anti" else "left_semi")
    start.copy(df = Some(joined))
  }

  /**
   * Pattern predicate (parity-plus — the reference grammar parses pattern
   * expressions, planner TODO): compile the pattern as a standalone
   * subplan, then LEFT SEMI (or LEFT ANTI under NOT) join the running
   * binding on the shared variables' ids. Per openCypher, variables
   * introduced inside the predicate do not bind outside it — a semi join
   * keeps only the outer columns, so that falls out of the join shape.
   * At scale this is one equi-join shuffle on the shared ids, never a
   * per-row re-execution.
   */
  private def applyPatternPredicate(start: BindCtx, path: PathPattern,
                                    negated: Boolean): BindCtx = {
    val sub = applyPending(compilePath(path, BindCtx(None, Map.empty)))
    val shared = sub.scope.keySet.intersect(start.scope.keySet).toSeq.sorted
      .filterNot(_.startsWith("__"))
    shared.foreach { v =>
      if (sub.scope(v) != start.scope(v))
        throw CypherParseException(
          s"variable '$v' rebound with a different kind in a pattern predicate")
    }
    val pruned =
      if (shared.isEmpty) sub.df.get.select(lit(1).as("__pp"))
      else sub.df.get.select(shared.map(v => col(s"`$v`").as(s"__pp_$v")): _*)
    val joinCond = shared.map { v =>
      val key = if (start.scope(v) == KRel) "eid" else "id"
      col(s"`$v`.$key") === col(s"`__pp_$v`.$key")
    }.reduceOption(_ && _).getOrElse(lit(true))
    val joined = start.df.getOrElse(emptyRow())
      .join(pruned, joinCond, if (negated) "left_anti" else "left_semi")
    start.copy(df = Some(joined))
  }

  /**
   * Pattern comprehension `[(a)-[:T]->(b) WHERE pred | proj]` (parity-plus
   * — reference grammar `ASTBuilder.cpp:1094-1160`, planner TODO):
   * replace each PatternComp inside `exprs` with a fresh list-column
   * variable, materialized once as ONE grouped collect + ONE left
   * equi-join — never a per-row re-execution. Identical comprehensions
   * are memoized to a single materialization, so a comprehension repeated
   * across RETURN items / ORDER BY keys shares its join.
   */
  private def materializePatternComps(start: BindCtx, exprs: List[Expr])
      : (BindCtx, List[Expr]) = {
    var ctx = start
    val memo = scala.collection.mutable.Map.empty[PatternComp, String]
    def rewrite(e: Expr): Expr = e match {
      case pc: PatternComp =>
        val name = memo.getOrElseUpdate(pc, {
          val n = fresh("pcomp")
          ctx = attachPatternComp(ctx, pc, n)
          n
        })
        Variable(name)
      case other => mapChildren(other, rewrite)
    }
    val rewritten = exprs.map(rewrite)
    (ctx, rewritten)
  }

  /**
   * Materialize one pattern comprehension as a list column named
   * `outName` on the running binding. The subpattern is compiled over a
   * distinct SEED of the correlated outer variables (like EXISTS), the
   * projection is collected per correlation key, and the grouped lists
   * LEFT-join back on the entity ids — rows with no match get an empty
   * list (openCypher). At scale: one grouped shuffle plus one equi-join;
   * an uncorrelated comprehension reduces to a broadcast 1-row side.
   * Lists of orderable elements are sorted for determinism (openCypher
   * leaves comprehension order unspecified); map-bearing elements (whole
   * entities) are left unsorted — Spark cannot compare maps.
   */
  private def attachPatternComp(start: BindCtx, pc: PatternComp, outName: String): BindCtx = {
    val mentioned = patternVars(pc.path) ++ (pc.where.toList :+ pc.proj).flatMap(freeVars)
    val shared = (mentioned & start.scope.keySet).toSeq.sorted.filterNot(_.startsWith("__"))
    shared.find(v => start.scope(v) == ExprCompiler.KPath).foreach { v =>
      throw CypherParseException(
        s"pattern comprehension cannot correlate on path variable '$v'")
    }
    var sub =
      if (shared.isEmpty) BindCtx(None, Map.empty)
      else BindCtx(
        Some(Planner.dedupRows(start.df.get.select(shared.map(v => col(s"`$v`")): _*))),
        shared.map(v => v -> start.scope(v)).toMap)
    sub = compilePath(pc.path, sub)
    pc.where.foreach { w => sub = applyWhere(sub, w) }
    sub = applyPending(sub)
    def keyOf(v: String): Column = start.scope(v) match {
      case KRel => col(s"`$v`.eid")
      case KNode => col(s"`$v`.id")
      case _ => col(s"`$v`")
    }
    def keyName(v: String): String = s"${outName}_k_$v"
    val projected = sub.df.get.select(
      shared.map(v => keyOf(v).as(keyName(v))) :+
        ExprCompiler.compile(pc.proj, Scope(sub.scope)).col.as(s"${outName}_elem"): _*)
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val collected = {
      val c = collect_list(col(s"`${outName}_elem`"))
      val sorted =
        if (hasMap(projected.schema(s"${outName}_elem").dataType)) c else sort_array(c)
      sorted.as(outName)
    }
    val grouped =
      if (shared.isEmpty) broadcast(projected.agg(collected))
      else projected.groupBy(shared.map(v => col(s"`${keyName(v)}`")): _*).agg(collected)
    val joinCond = shared.map(v => keyOf(v) === col(s"`${keyName(v)}`"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val listType = grouped.schema(outName).dataType
    val joined = start.df.getOrElse(emptyRow())
      .join(grouped, joinCond, "left")
      .drop(shared.map(keyName): _*)
      .withColumn(outName, coalesce(col(s"`$outName`"), array().cast(listType)))
    start.copy(df = Some(joined)).withVar(outName, ExprCompiler.KOther)
  }

  /**
   * OPTIONAL MATCH (parity-plus — reference planner TODO,
   * `QueryPlanner.cpp:65-463`): the optional pattern is compiled as a
   * standalone subplan (its WHERE included, per openCypher), then
   * left-outer-joined to the running binding on the shared variables'
   * ids. Unmatched rows carry NULL entity structs, so property access on
   * them yields NULL downstream.
   */
  private def applyOptionalMatch(start: BindCtx, m: MatchClause): BindCtx = {
    var sub = BindCtx(None, Map.empty)
    m.paths.foreach { path => sub = compilePath(path, sub) }
    m.where.foreach { w => sub = applyWhere(sub, w) }
    sub = applyPending(sub)
    val shared = sub.scope.keySet.intersect(start.scope.keySet).toSeq.sorted
      .filterNot(_.startsWith("__"))
    shared.foreach { v =>
      if (sub.scope(v) != start.scope(v))
        throw CypherParseException(s"variable '$v' rebound with a different kind in OPTIONAL MATCH")
    }
    val newVars = (sub.scope.keySet -- start.scope.keySet).toSeq.sorted
      .filterNot(_.startsWith("__"))
    val pruned = sub.df.get.select((shared ++ newVars).map(v => col(s"`$v`").as(s"__opt_$v")): _*)
    val joinCond = shared.map { v =>
      val key = if (start.scope(v) == KRel) "eid" else "id"
      col(s"`$v`.$key") === col(s"`__opt_$v`.$key")
    }.reduceOption(_ && _).getOrElse(lit(true))
    val joined = start.df.get.join(pruned, joinCond, "left")
    val keep = start.df.get.columns.map(c => col(s"`$c`")) ++
      newVars.map(v => col(s"`__opt_$v`").as(v))
    BindCtx(Some(joined.select(keep.toIndexedSeq: _*)),
      start.scope ++ newVars.map(v => v -> sub.scope(v)))
  }

  /** MATCH clauses → binding DataFrame (one struct column per variable). */
  def compileMatch(matches: List[MatchClause]): (DataFrame, Scope) = {
    val ctx = matches.foldLeft(BindCtx(None, Map.empty))(applyMatch)
    (ctx.df.getOrElse(emptyRow()), Scope(ctx.scope))
  }

  /**
   * WITH projection (+ optional post-WHERE): re-binds the context to the
   * projected columns. The reference plans multi-part queries as Apply but
   * never executes them (`QueryPlanner.cpp:32-43`, no runtime executor) —
   * executable here as straightforward DataFrame composition.
   */
  def applyWith(start: BindCtx, w: WithClause): BindCtx = {
    val (ctx, projection) = rewriteProjection(start, w.projection)
    val scope = Scope(ctx.scope)
    val newScope: Map[String, Kind] = projection.items.map { i =>
      i.expr match {
        case Variable(v) => i.alias.getOrElse(v) -> scope.kindOf(v)
        case other =>
          val name = i.alias.getOrElse(throw CypherParseException(
            s"WITH expressions must be aliased: ${text(other)}"))
          name -> ExprCompiler.KValue
      }
    }.toMap
    val projected = compileReturn(ctx.df.getOrElse(emptyRow()), scope, projection)
    val filtered = w.where match {
      case Some(cond) =>
        projected.filter(ExprCompiler.compile(cond, Scope(newScope)).col.try_cast(BooleanType))
      case None => projected
    }
    BindCtx(Some(filtered), newScope)
  }

  /**
   * CALL proc(args) [YIELD ...]: invoke a registered procedure and bind
   * its (selected) output columns as scalar variables.
   *
   * As the FIRST clause: the procedure result IS the binding frame.
   * After a binding clause (openCypher's correlated form): supported for
   * the lateral-safe built-ins — `graft.degree(node[, 'in'|'out'])`
   * correlates per row via an equi-join on the bound node's id, and the
   * single-row procedures (`graft.counts`, `graft.triangleCount`) attach
   * via a broadcast cross join. Anything else would need a true lateral
   * re-invocation per row; rejected clearly.
   */
  def applyCall(start: BindCtx, c: CallClause): BindCtx = {
    if (start.df.nonEmpty) return applyLateralCall(start, c)
    val argValues: List[Any] = c.args.map {
      case IntLit(v) => v
      case DblLit(v) => v
      case StrLit(s) => s
      case BoolLit(b) => b
      case other => throw CypherParseException(
        s"CALL arguments must be literals, got ${Ast.text(other)}")
    }
    val out = Procedures.invoke(graph, c.procedure, argValues)
    val selected = yieldSelection(out, c)
    val df = out.select(selected.map { case (src, as) => col(s"`$src`").as(as) }: _*)
    BindCtx(Some(df), selected.map { case (_, as) => as -> ExprCompiler.KValue }.toMap)
  }

  /** Resolve the YIELD list against a procedure's output columns
    * (empty YIELD = all columns, unaliased). */
  private def yieldSelection(out: DataFrame, c: CallClause): List[(String, String)] =
    if (c.yields.isEmpty) out.columns.toList.map(n => (n, n))
    else c.yields.map { case (name, alias) =>
      val actual = out.columns.find(_.equalsIgnoreCase(name)).getOrElse(
        throw CypherParseException(
          s"procedure '${c.procedure}' yields ${out.columns.mkString(", ")} — no column '$name'"))
      (actual, alias.getOrElse(name))
    }

  /** Correlated CALL after a binding clause — compiled as a join, never a
    * per-row re-invocation, so the lateral form shuffles once like any
    * other join at scale. */
  private def applyLateralCall(start: BindCtx, c: CallClause): BindCtx = {
    val df = start.df.get
    def bindYields(joined: DataFrame, selected: List[(String, String)],
                   prefix: String): BindCtx = {
      selected.foreach { case (_, as) =>
        if (start.scope.contains(as) || df.columns.contains(as))
          throw CypherParseException(s"YIELD column '$as' is already bound — alias it with AS")
      }
      val keep = df.columns.map(n => col(s"`$n`")) ++
        selected.map { case (src, as) => col(s"`$prefix$src`").as(as) }
      BindCtx(Some(joined.select(keep.toIndexedSeq: _*)),
        start.scope ++ selected.map { case (_, as) => as -> ExprCompiler.KValue })
    }
    c.procedure.toLowerCase match {
      case "graft.degree" =>
        val (v, rest) = c.args match {
          case Variable(v0) :: tail => (v0, tail)
          case _ => throw CypherParseException(
            "correlated CALL graft.degree(node[, 'in'|'out']) needs a bound node variable as its first argument")
        }
        if (!start.scope.get(v).contains(ExprCompiler.KNode))
          throw CypherParseException(s"'$v' is not a bound node variable")
        val lits: List[Any] = rest.map {
          case StrLit(s) => s
          case other => throw CypherParseException(
            s"CALL arguments after the node variable must be literals, got ${Ast.text(other)}")
        }
        val out = Procedures.invoke(graph, c.procedure, lits) // (id, degree)
        val prefix = fresh("lat") + "_"
        val prefixed = out.columns.foldLeft(out)((d, n) => d.withColumnRenamed(n, s"$prefix$n"))
        val joined = df.join(prefixed, col(s"$v.id") === col(s"${prefix}id"), "left")
        bindYields(joined, yieldSelection(out, c), prefix)
      case p @ ("graft.counts" | "graft.trianglecount") =>
        if (c.args.nonEmpty)
          throw CypherParseException(s"$p takes no arguments")
        val out = Procedures.invoke(graph, p, Nil) // single row
        val prefix = fresh("lat") + "_"
        val prefixed = out.columns.foldLeft(out)((d, n) => d.withColumnRenamed(n, s"$prefix$n"))
        bindYields(df.crossJoin(broadcast(prefixed)), yieldSelection(out, c), prefix)
      case other =>
        throw CypherParseException(
          "CALL after a binding clause is supported for the lateral-safe procedures only " +
            s"(graft.degree, graft.counts, graft.triangleCount) — '$other' must be the first clause")
    }
  }

  /** UNWIND list AS var: explode the list into one row per element
    * (parity-plus — reference planner TODO). */
  def applyUnwind(start: BindCtx, u: UnwindClause): BindCtx = {
    if (start.scope.contains(u.variable))
      throw CypherParseException(s"UNWIND variable '${u.variable}' is already bound")
    val (ctx, rewritten) = materializePatternComps(start, List(u.list))
    val base = ctx.df.getOrElse(emptyRow())
    val listCol0 = ExprCompiler.compile(rewritten.head, Scope(ctx.scope)).col
    // UNWIND null produces ZERO rows (openCypher); the null literal
    // compiles as a STRING column (the property model's value type),
    // which explode() rejects — retype it as an array so the null flows
    // through explode's no-rows path (row-level null lists already
    // produce no rows without help)
    val listCol = rewritten.head match {
      case Ast.NullLit => lit(null).cast("array<string>")
      case _ => listCol0
    }
    BindCtx(Some(base.withColumn(u.variable, explode(listCol))),
      ctx.scope + (u.variable -> ExprCompiler.KValue))
  }

  /** Terminal RETURN. Pattern comprehensions in items / sort keys
    * materialize first (one grouped join each, memoized). */
  def applyReturn(ctx0: BindCtx, r: ReturnClause): DataFrame = {
    val (ctx, rewritten) = rewriteProjection(ctx0, r)
    compileReturn(ctx.df.getOrElse(emptyRow()), Scope(ctx.scope), rewritten)
  }

  /** Materialize pattern comprehensions referenced by a RETURN / WITH
    * projection, rewriting items and sort keys to the new list columns.
    * An unaliased rewritten item keeps its user-visible column name (the
    * original expression text) via an injected alias. */
  private def rewriteProjection(ctx0: BindCtx, r: ReturnClause): (BindCtx, ReturnClause) = {
    val exprs = r.items.map(_.expr) ++ r.orderBy.map(_.expr)
    val (ctx, rewritten) = materializePatternComps(ctx0, exprs)
    if (rewritten == exprs) return (ctx0, r)
    val (itemExprs, sortExprs) = rewritten.splitAt(r.items.size)
    val items = r.items.zip(itemExprs).map { case (i, e) =>
      if (e == i.expr) i else ReturnItem(e, Some(i.name))
    }
    val sorts = r.orderBy.zip(sortExprs).map { case (s, e) => s.copy(expr = e) }
    (ctx, r.copy(items = items, orderBy = sorts))
  }

  private def emptyRow(): DataFrame = graph.nodes.sparkSession.range(1).drop("id")

  /** Correctly-typed empty ARRAY<edge struct> — the seed for a named
    * path's relationship list (slice to length 0 keeps the element type,
    * unlike a bare `array()` whose elements would be NullType). */
  private def emptyEdgeArray: Column =
    emptyEdgeArrayOf(Seq("eid", "src", "dst", "type", "properties"))

  private def emptyEdgeArrayOf(fields: Seq[String]): Column = {
    val sch = graph.edges.schema
    val nullEdge = struct(fields
      .map(f => lit(null).cast(sch(f).dataType).as(f)): _*)
    slice(array(nullEdge), 1, 0)
  }

  private def compilePath(path: PathPattern, start: BindCtx,
                          seeds: Map[String, Ast.Expr] = Map.empty): BindCtx = {
    var ctx = start
    val startVar = path.start.variable.getOrElse(fresh("n"))
    // set when the anchor scan is pinned to ≤1 row by an id-equality
    // seed — expansion steps then broadcast the accumulated frontier
    var seededFrontier = false

    // Named path (`p = ...`): materialized incrementally as two array
    // columns (visited node structs / traversed rel structs) so it
    // composes with variable-length hops — each unrolled branch appends
    // its own hop entities before intermediates are projected away. The
    // final struct(nodes, rels) makes nodes()/relationships()/length()
    // plain field reads.
    // Shortest-path filtering needs the arrays too, even unnamed.
    val trackTag =
      if (path.name.isDefined || path.shortest.isDefined)
        Some(path.name.getOrElse(fresh("sp")))
      else None
    val pnCol = trackTag.map(n => s"__pn_$n")
    val prCol = trackTag.map(n => s"__pr_$n")

    // r16 surface pruning (Planner.pathFieldUsage): carry only the struct
    // fields the query can read through the tracking arrays — per hop the
    // property maps dominate the walk's width, and a `[e IN
    // relationships(p) | type(e)]` needs one narrow string. Unnamed
    // (shortest-only) tracking needs just the endpoint ids + the eid
    // tiebreak signature. An empty computed set keeps one narrow field so
    // size()/length() still count elements.
    val (nodeUse, relUse): (Option[Set[String]], Option[Set[String]]) =
      path.name match {
        case Some(pn) => pathFieldUse.getOrElse(pn, (None, None))
        case None => (Some(Set.empty[String]), Some(Set.empty[String]))
      }
    def keepOf(use: Option[Set[String]], spNeed: String,
               order: Seq[String]): Option[Seq[String]] = use.map { fs =>
      val want = fs ++ (if (path.shortest.isDefined) Set(spNeed) else Set.empty)
      val w2 = if (want.isEmpty) Set(spNeed) else want
      order.filter(w2)
    }
    val nodeKeep = keepOf(nodeUse, "id", Seq("id", "label", "properties"))
    val relKeep = keepOf(relUse, "eid",
      Seq("eid", "src", "dst", "type", "properties"))
    def slimN(c: Column): Column = nodeKeep match {
      case Some(fs) if fs.size < 3 => struct(fs.map(f => c.getField(f).as(f)): _*)
      case _ => c
    }
    def slimR(c: Column): Column = relKeep match {
      case Some(fs) if fs.size < 5 => struct(fs.map(f => c.getField(f).as(f)): _*)
      case _ => c
    }
    def emptyTrackedRels: Column = emptyEdgeArrayOf(relKeep match {
      case Some(fs) if fs.size < 5 => fs
      case _ => Seq("eid", "src", "dst", "type", "properties")
    })

    // Anchor: reuse an existing binding, else scan (AllNodeScan /
    // NodeScanByLabel collapse into a filtered scan; Catalyst pushes the
    // label predicate into the source).
    if (ctx.scope.contains(startVar)) {
      require(ctx.scope(startVar) == KNode, s"'$startVar' is not a node variable")
      val conds = labelFilter(startVar, path.start.labels).toSeq ++
        propFilter(startVar, path.start.properties, Scope(ctx.scope)).toSeq
      conds.foreach(c => ctx = ctx.copy(df = Some(ctx.df.get.filter(c))))
    } else {
      var scan = nodeStruct(startVar)
      labelFilter(startVar, path.start.labels).foreach(c => scan = scan.filter(c))
      ctx = ctx.withVar(startVar, KNode)
      propFilter(startVar, path.start.properties, Scope(ctx.scope))
        .foreach(c => scan = scan.filter(c))
      // pinpoint anchor (see seedPredicates): ≤1 row after this filter,
      // so the whole path becomes a broadcast-frontier traversal
      seeds.get(startVar).filter(_ => ctx.df.isEmpty).foreach { pred =>
        scan = scan.filter(
          ExprCompiler.compile(pred, Scope(ctx.scope)).col.try_cast(BooleanType))
        seededFrontier = true
      }
      // anchored top-k pushdown (installTopKPruning): restrict the scan
      // to anchors that can reach the query's top k before any expand
      // CONSUMED on first use — the main clause chain plans first, and a
      // later OPTIONAL MATCH / pattern subquery may rebind the same
      // variable NAME in a fresh context, which must scan unpruned.
      if (ctx.df.isEmpty) anchorPrune.get(startVar).foreach { p =>
        scan = p(scan); anchorPrune -= startVar
      }
      ctx = ctx.copy(df = Some(ctx.df.map(_.crossJoin(scan)).getOrElse(scan)))
    }
    pnCol.foreach { _ =>
      ctx = ctx.copy(df = Some(ctx.df.get
        .withColumn(pnCol.get, array(slimN(col(startVar))))
        .withColumn(prCol.get, emptyTrackedRels)))
    }

    var prevNode = startVar
    var prevRel: Option[String] = None
    // Reference anchor rule: the first hop with a relationship type
    // compiles to a RelationshipTypeScan (`QueryPlanner.cpp:921-975`),
    // and on a DIRECTED graph that scan emits the stored orientation only
    // regardless of the pattern arrow (`OperatorExecutor.cpp:478-608`:
    // the reverse emission is gated on !isDirected). Non-anchor hops are
    // ExpandAll, where a bare '-' follows both directions even on a
    // directed graph. Golden: `(n {name:'Eva'})-[:NEIGHBORS]-(x)` on the
    // directed fixture returns only the out-neighbor.
    val anchorIdx = if (graph.isDirected) path.hops.indexWhere(_._1.types.nonEmpty) else -1
    path.hops.zipWithIndex.foreach { case ((rel, node), hopIdx) =>
      val nodeVar = node.variable.getOrElse(fresh("n"))

      // Orientation (SURVEY.md §2.1 #5-8): undirected graph → both
      // orientations regardless of the arrow; directed graph → arrow
      // decides, '-' matches both — except at the typed anchor hop (above).
      val bothDirs =
        if (graph.isDirected) rel.direction == DirBoth && hopIdx != anchorIdx
        else true
      val (fromField, toField) = rel.direction match {
        case DirLeft => ("dst", "src")
        case _ => ("src", "dst")
      }

      /** One edge traversal step from `prev`; binds relVar (+ target node
        * struct unless joining to an already-bound variable). */
      def step(df0: DataFrame, prev: String, relVar: String, prevR: Option[String],
               target: String, targetIsBound: Boolean): DataFrame = {
        // a seeded frontier descends from a ≤1-row anchor: broadcast it
        // so the edge/node tables are probed in place, never shuffled
        val df = if (seededFrontier) broadcast(df0) else df0
        val edges = edgeStruct(relVar, bothDirs)
        var joinCond = col(s"$prev.id") === col(s"$relVar.$fromField")
        if (rel.types.nonEmpty) joinCond = joinCond &&
          (if (rel.types.size == 1) col(s"$relVar.type") === rel.types.head
           else col(s"$relVar.type").isin(rel.types: _*))
        // hop-uniqueness between consecutive relationships (QueryPlanner.cpp:571-582)
        prevR.foreach(pr => joinCond = joinCond && col(s"$pr.eid") =!= col(s"$relVar.eid"))
        if (targetIsBound)
          df.join(edges, joinCond && col(s"$relVar.$toField") === col(s"$target.id"))
        else {
          val joined = df.join(edges, joinCond)
          (if (seededFrontier) broadcast(joined) else joined)
            .join(nodeStruct(target), col(s"$relVar.$toField") === col(s"$target.id"))
        }
      }

      val targetBound = ctx.scope.contains(nodeVar)
      if (targetBound)
        require(ctx.scope(nodeVar) == KNode, s"'$nodeVar' is not a node variable")

      rel.varLength match {
        case None =>
          val relVar = rel.variable.getOrElse(fresh("r"))
          if (ctx.scope.contains(relVar))
            throw CypherParseException(s"relationship variable '$relVar' bound twice")
          ctx = ctx.withVar(relVar, KRel)
          if (!targetBound) ctx = ctx.withVar(nodeVar, KNode)
          ctx = ctx.copy(df = Some(step(ctx.df.get, prevNode, relVar, prevRel, nodeVar, targetBound)))
          propFilter(relVar, rel.properties, Scope(ctx.scope))
            .foreach(c => ctx = ctx.copy(df = Some(ctx.df.get.filter(c))))
          pnCol.foreach { _ =>
            ctx = ctx.copy(df = Some(ctx.df.get
              .withColumn(pnCol.get, concat(col(pnCol.get), array(slimN(col(nodeVar)))))
              .withColumn(prCol.get, concat(col(prCol.get), array(slimR(col(relVar)))))))
          }
          prevRel = Some(relVar)

        case Some((mn, mx)) =>
          // Variable-length expansion `*mn..mx` — the reference grammar
          // accepts this but its planner never executes it (parity-plus).
          // Bounded unrolling: one branch per length, intermediates are
          // anonymous and projected away, branches unioned. Binding the
          // relationship (`-[r*1..3]->`) yields the LIST of traversed
          // edge structs (openCypher): branch k arrays its k hop
          // structs, the zero branch the typed empty array.
          if (mn < 0 || mx < mn)
            throw CypherParseException(s"invalid variable-length bounds *$mn..$mx")
          val listVar: Option[String] = rel.variable
          listVar.foreach { lv =>
            if (ctx.scope.contains(lv))
              throw CypherParseException(s"relationship variable '$lv' bound twice")
            ctx = ctx.withVar(lv, ExprCompiler.KRelList)
          }
          val base = ctx.df.get
          val keepCols = base.columns.toSeq
          // Shared prefix walks: walk s extends walk s−1 (one step), so
          // every branch of the union references LITERALLY the same
          // subplan (same exprIds) for its prefix. Building each branch
          // from `base` with per-branch fresh variable names used to
          // defeat plan canonicalization — no exchange was ever reused
          // across branches, re-running the k−1 prefix joins per branch.
          // The last hop always lands on an anonymous target; branch k
          // then binds `nodeVar` by struct copy (unbound) or an id filter
          // (bound) — same rows either way, since a bound nodeVar comes
          // from the nodes table the anonymous join also reads.
          val prefixes = Vector.newBuilder[(DataFrame, String)]
          val hopRels = Vector.newBuilder[String]
          if (mx >= 1) {
            var df = base
            var prev = prevNode
            var prevR = prevRel
            for (_ <- 1 to mx) {
              val rv = fresh("r")
              val target = fresh("n")
              df = step(df, prev, rv, prevR, target, targetIsBound = false)
              // inline property predicates apply to EVERY traversed hop
              // (openCypher: `-[r:T*1..2 {k: v}]->` constrains each
              // relationship of the walk, not just one)
              propFilter(rv, rel.properties, Scope(ctx.scope))
                .foreach(c => df = df.filter(c))
              pnCol.foreach { _ =>
                df = df
                  .withColumn(pnCol.get, concat(col(pnCol.get), array(slimN(col(target)))))
                  .withColumn(prCol.get, concat(col(prCol.get), array(slimR(col(rv)))))
              }
              prefixes += ((df, target))
              hopRels += rv
              prev = target
              prevR = Some(rv)
            }
          }
          val walks = prefixes.result()
          val hops = hopRels.result()
          // r16 surface pruning for the BOUND LIST (same analysis as the
          // named-path arrays): carry only the struct fields the query's
          // lambdas read off `r`'s elements — full structs when opaque
          val listKeep: Option[Seq[String]] =
            listVar.flatMap(lv => relListUse.getOrElse(lv, None)).map { fs =>
              val w2 = if (fs.isEmpty) Set("eid") else fs
              Seq("eid", "src", "dst", "type", "properties").filter(w2)
            }.filter(_.size < 5)
          def slimL(c: Column): Column =
            listKeep.fold(c)(fs => struct(fs.map(f => c.getField(f).as(f)): _*))
          // branch k's bound list: its k hop structs (same fresh names
          // across branches — the shared-prefix subplans stay identical)
          def withRelList(df: DataFrame, k: Int): DataFrame =
            listVar.fold(df)(lv => df.withColumn(lv,
              if (k == 0) emptyEdgeArrayOf(listKeep.getOrElse(
                Seq("eid", "src", "dst", "type", "properties")))
              else array(hops.take(k).map(rv => slimL(col(s"`$rv`"))): _*)))
          val branches = (mn to mx).map { k =>
            // Zero-length hop (openCypher `*0..n`): the identity branch —
            // the target IS the start node, no relationship traversed, so
            // type/property constraints on the (absent) rel don't apply.
            // A named path gains no nodes/rels here: length(p) = 0.
            val bound = k match {
              case 0 =>
                if (targetBound)
                  base.filter(col(s"$prevNode.id") === col(s"$nodeVar.id"))
                else base.withColumn(nodeVar, col(prevNode))
              case _ =>
                val (df, target) = walks(k - 1)
                if (targetBound) df.filter(col(s"$target.id") === col(s"$nodeVar.id"))
                else df.withColumn(nodeVar, col(s"`$target`"))
            }
            val outCols = (if (targetBound) keepCols else keepCols :+ nodeVar) ++
              listVar.toSeq
            withRelList(bound, k).select(outCols.map(c => col(s"`$c`")): _*)
          }
          if (!targetBound) ctx = ctx.withVar(nodeVar, KNode)
          ctx = ctx.copy(df = Some(branches.reduce(_ unionByName _)))
          // uniqueness chains don't cross a var-length boundary
          prevRel = None
      }

      labelFilter(nodeVar, node.labels)
        .foreach(c => ctx = ctx.copy(df = Some(ctx.df.get.filter(c))))
      propFilter(nodeVar, node.properties, Scope(ctx.scope))
        .foreach(c => ctx = ctx.copy(df = Some(ctx.df.get.filter(c))))

      prevNode = nodeVar
      ()
    }
    if (path.name.isEmpty && path.shortest.isEmpty)
      trackTag.foreach { _ =>
        ctx = ctx.copy(df = Some(ctx.df.get.drop(pnCol.get, prCol.get)))
      }
    path.name.foreach { pn =>
      // checked at the end so entity variables bound INSIDE this path
      // (e.g. `MATCH p = (a)-[]->(p)`) also count as collisions
      if (ctx.scope.contains(pn))
        throw CypherParseException(s"path variable '$pn' is already bound")
      ctx = ctx.copy(df = Some(ctx.df.get
        .withColumn(pn, struct(col(pnCol.get).as("nodes"), col(prCol.get).as("rels")))
        .drop(pnCol.get, prCol.get)))
      ctx = ctx.withVar(pn, ExprCompiler.KPath)
    }
    // shortestPath()/allShortestPaths(): keep only minimal-length rows per
    // (start, end) endpoint pair — a window min over the traversed-rel
    // count, partitioned by the path arrays' endpoints (works whether or
    // not the endpoint variables are named). shortestPath() additionally
    // collapses ties to ONE deterministic path per pair: among min-length
    // rows, keep those carrying the lexicographically-least relationship
    // eid signature — a value filter, so outer bindings that share
    // endpoints all survive with the same winning path.
    //
    // DEFERRED via ctx.pending: applyMatch runs this after the clause's
    // WHERE, so endpoint predicates push into the scans below the unroll
    // (a filter cannot push through the window). Endpoint predicates are
    // constant per (start, end) pair — they keep or drop whole pairs,
    // never individual paths of a pair — so the per-pair minima are
    // unchanged (openCypher's shortest-path pre-filtering). Other callers
    // (pattern predicates, OPTIONAL MATCH) apply pending immediately.
    path.shortest.foreach { all =>
      import org.apache.spark.sql.expressions.Window
      // after the optional name fold, the arrays live either in the path
      // struct or in the still-present tracking columns
      val (nodesArr, relsArr, dropAfter) = path.name match {
        case Some(pn) => (col(s"`$pn`").getField("nodes"),
          col(s"`$pn`").getField("rels"), Seq.empty[String])
        case None => (col(pnCol.get), col(prCol.get), Seq(pnCol.get, prCol.get))
      }
      val finalize: DataFrame => DataFrame = { df0 =>
        val sId = element_at(nodesArr, 1).getField("id")
        val eId = element_at(nodesArr, -1).getField("id")
        // ONE window pass for both variants: allShortestPaths keys on the
        // hop count alone; shortestPath keys on struct(len, sig) whose
        // lexicographic min is exactly (min length, then least signature
        // among min-length rows) — folding the tiebreak into the same
        // window instead of paying a second exchange+sort over the unroll.
        val key =
          if (all) struct(size(relsArr))
          else struct(size(relsArr), array_join(
            transform(relsArr, r => r.getField("eid").cast(StringType)), "\u0001"))
        val df = df0
          .withColumn("__sp_key", key)
          .withColumn("__sp_win", min(col("__sp_key")).over(Window.partitionBy(sId, eId)))
          .where(col("__sp_key") === col("__sp_win"))
          .drop("__sp_key", "__sp_win")
        if (dropAfter.nonEmpty) df.drop(dropAfter: _*) else df
      }
      ctx = ctx.copy(pending = ctx.pending :+ finalize)
    }
    ctx
  }

  /** RETURN clause → projection / aggregation / dedup / sort / slice. */
  def compileReturn(bound: DataFrame, scope: Scope, ret: ReturnClause): DataFrame = {
    val hasAgg = ret.items.exists(i => containsAggregate(i.expr))
    var out: DataFrame =
      if (hasAgg) compileAggregation(bound, scope, ret)
      else {
        val itemCols = ret.items.map(i => ExprCompiler.compile(i.expr, scope).col.as(i.name))
        // ORDER BY keys that aren't output items ride along as hidden cols.
        val outputNames = ret.items.map(_.name).toSet
        val hidden = ret.orderBy.zipWithIndex.collect {
          case (s, idx) if !sortRefersToOutput(s.expr, ret.items) =>
            (idx, ExprCompiler.compile(s.expr, scope).col.as(s"__sort$idx"))
        }
        // openCypher: ORDER BY combined with DISTINCT may only reference
        // returned items — a hidden sort key would survive the dedup with
        // an arbitrary representative value, making row order
        // nondeterministic. Rejected rather than silently unstable.
        if (ret.distinct && hidden.nonEmpty)
          throw CypherParseException(
            "ORDER BY with DISTINCT can only reference returned items")
        var df = bound.select(itemCols ++ hidden.map(_._2): _*)
        if (ret.distinct) {
          // real DISTINCT — the reference's Distinct is a no-op projection
          // (OperatorExecutor.cpp:1351-1394); we implement the documented
          // semantics and note the divergence. Entity variables dedup by
          // id/eid (Spark rejects MAP columns in set operations).
          df = Planner.dedupRows(df, Some(ret.items.map(_.name)))
        }
        if (ret.orderBy.nonEmpty) {
          val sortCols = ret.orderBy.zipWithIndex.map { case (s, idx) =>
            val c =
              if (sortRefersToOutput(s.expr, ret.items)) colByName(outputName(s.expr, ret.items))
              else colByName(s"__sort$idx")
            // openCypher null ordering: nulls sort LAST ascending, FIRST
            // descending (Spark's default is the opposite for asc)
            if (s.ascending) c.asc_nulls_last else c.desc_nulls_first
          }
          df = df.orderBy(sortCols: _*)
        }
        if (hidden.nonEmpty) df = df.drop(hidden.map(h => s"__sort${h._1}"): _*)
        df
      }
    ret.skip.foreach(n => out = out.offset(n.toInt))
    ret.limit.foreach(n => out = out.limit(n.toInt))
    out
  }

  private def colByName(n: String): Column = col(s"`$n`")

  private def outputName(e: Expr, items: List[ReturnItem]): String =
    items.find(i => i.expr == e || i.alias.contains(text(e)) || i.name == text(e))
      .map(_.name)
      .getOrElse(throw CypherParseException(
        s"ORDER BY expression '${text(e)}' must reference a returned item in an aggregating query"))

  private def sortRefersToOutput(e: Expr, items: List[ReturnItem]): Boolean =
    items.exists(i => i.expr == e || i.alias.contains(text(e)) || i.name == text(e))

  /**
   * Grouped / global aggregation. The reference supports only a global
   * `avg` with a worker-partial + master-merge split
   * (`OperatorExecutor.cpp:1190-1210`, `Aggregation.cpp:83-96`); Spark's
   * partial/final aggregation is the same algebra, generalized here to
   * count/sum/min/max/collect with optional grouping keys (parity-plus,
   * SURVEY.md §2.2). Rows whose aggregated property is absent are skipped,
   * matching the reference's missing-property handling.
   */
  private def compileAggregation(bound: DataFrame, scope: Scope, ret: ReturnClause): DataFrame = {
    val (aggItems, keyItems) = ret.items.partition(i => containsAggregate(i.expr))
    // Entity-variable keys group by id/eid (struct columns contain maps,
    // which Spark cannot compare) and keep a representative struct via
    // first() — same result since ids identify entities.
    val groupCols = keyItems.map { i =>
      i.expr match {
        case Variable(v) if scope.kindOf(v) == KNode => col(s"$v.id")
        case Variable(v) if scope.kindOf(v) == KRel => col(s"$v.eid")
        // path structs contain maps (not groupable); key by the node/rel
        // id sequence, which identifies a path
        case Variable(v) if scope.kindOf(v) == ExprCompiler.KPath =>
          struct(transform(col(s"$v.nodes"), _.getField("id")),
            transform(col(s"$v.rels"), _.getField("eid")))
        case e => ExprCompiler.compile(e, scope).col
      }
    }
    val keyOutCols = keyItems.map { i =>
      i.expr match {
        case Variable(v) if scope.kindOf(v) == KNode || scope.kindOf(v) == KRel ||
            scope.kindOf(v) == ExprCompiler.KPath =>
          first(col(v)).as(i.name)
        case e => first(ExprCompiler.compile(e, scope).col).as(i.name)
      }
    }
    val aggCols = aggItems.map { i =>
      i.expr match {
        case Aggregate(fn, distinct, argOpt, param) =>
          compileAggFn(fn, distinct, argOpt, param, scope).as(i.name)
        case other =>
          throw CypherParseException(
            s"aggregates must be bare RETURN items, got ${text(other)}")
      }
    }
    val allAgg = keyOutCols ++ aggCols
    val grouped =
      if (groupCols.isEmpty) bound.agg(allAgg.head, allAgg.tail: _*)
      else bound.groupBy(groupCols: _*).agg(allAgg.head, allAgg.tail: _*)
    // restore original item order
    var df = grouped.select(ret.items.map(i => colByName(i.name)): _*)
    if (ret.orderBy.nonEmpty) {
      val sortCols = ret.orderBy.map { s =>
        val c = colByName(outputName(s.expr, ret.items))
        // openCypher null ordering (see compileReturn's twin)
        if (s.ascending) c.asc_nulls_last else c.desc_nulls_first
      }
      df = df.orderBy(sortCols: _*)
    }
    df
  }

  private def compileAggFn(fn: String, distinct: Boolean, argOpt: Option[Expr],
                           param: Option[Expr], scope: Scope): Column = {
    def arg: Column = ExprCompiler.compile(argOpt.get, scope).col
    def argNum: Column = arg.try_cast(DoubleType)
    def d(c: Column): Column = c // distinct applied via countDistinct etc. below
    def noDistinct(): Unit = if (distinct)
      throw CypherParseException(s"DISTINCT is not supported for $fn()")
    def pct: Double = param match {
      case Some(DblLit(v)) if v >= 0 && v <= 1 => v
      case Some(IntLit(v)) if v == 0 || v == 1 => v.toDouble
      case other => throw CypherParseException(
        s"$fn() needs a literal percentile in [0, 1] as its second argument, got " +
          other.map(text).getOrElse("none"))
    }
    if (param.nonEmpty && fn != "percentilecont" && fn != "percentiledisc")
      throw CypherParseException(s"$fn() takes one argument")
    fn match {
      case "count" =>
        argOpt match {
          case None => count(lit(1))
          case Some(Variable(v)) if scope.kindOf(v) == KNode => if (distinct) countDistinct(col(s"$v.id")) else count(col(s"$v.id"))
          case Some(Variable(v)) if scope.kindOf(v) == KRel => if (distinct) countDistinct(col(s"$v.eid")) else count(col(s"$v.eid"))
          case Some(_) => if (distinct) countDistinct(arg) else count(arg)
        }
      case "avg" => avg(argNum)
      case "sum" => sum(argNum)
      case "min" =>
        argOpt.get match {
          case Func("tofloat" | "tointeger", _) => min(argNum)
          case _ => min(arg)
        }
      case "max" =>
        argOpt.get match {
          case Func("tofloat" | "tointeger", _) => max(argNum)
          case _ => max(arg)
        }
      case "collect" => if (distinct) collect_set(arg) else collect_list(arg)
      // openCypher statistics aggregates (parity-plus, grammar-only in the
      // reference). percentileDisc is Spark's percentile_approx in exact
      // mode (accuracy >> group size): verified element-identical to
      // DuckDB's quantile_disc across rank conventions; percentileCont is
      // the exact interpolated percentile (== quantile_cont).
      case "stdev" => noDistinct(); stddev_samp(argNum)
      case "stdevp" => noDistinct(); stddev_pop(argNum)
      case "percentilecont" => noDistinct(); percentile(argNum, lit(pct))
      case "percentiledisc" =>
        noDistinct(); percentile_approx(argNum, lit(pct), lit(10000000))
      case other => throw CypherParseException(s"unknown aggregate '$other'")
    }
  }
}

object Planner {

  /**
   * r16 named-path surface analysis: for each named path, which struct
   * FIELDS its tracked nodes()/relationships() arrays can ever be read
   * through. The tracking arrays carry full entity structs (id, label,
   * properties / eid, src, dst, type, properties) per hop — at scale the
   * property maps dominate the walk's width, and most queries only read
   * `type(e)` or count the arrays. `None` = opaque use (the whole entity
   * escapes — keep every field); `Some(fs)` = only `fs` are read.
   *
   * Conservative by construction: only specifically recognized read
   * shapes contribute field sets — `size(nodes(p))` / `length(p)`
   * (count-only), list comprehensions / quantifiers / reduce over
   * `nodes(p)`/`relationships(p)` whose lambda bodies read `id()` /
   * `type()` / `labels()` / properties off the element — and ANY other
   * reference to the path variable or its arrays (returned whole,
   * UNWINDed, element membership, EXISTS correlation, head/last…)
   * degrades that surface to opaque.
   */
  /** [[surfaceUsage]] result: per-named-path (node fields, rel fields)
    * plus per var-length REL-LIST binding (`-[r*a..b]->`) rel fields.
    * `None` = opaque (keep every struct field). */
  final case class SurfaceUsage(
      paths: Map[String, (Option[Set[String]], Option[Set[String]])],
      relLists: Map[String, Option[Set[String]]])

  private[graft] def pathFieldUsage(q: Query)
      : Map[String, (Option[Set[String]], Option[Set[String]])] =
    surfaceUsage(q).paths

  private[graft] def relListFieldUsage(q: Query)
      : Map[String, Option[Set[String]]] = surfaceUsage(q).relLists

  private[graft] def surfaceUsage(q: Query): SurfaceUsage = {
    def varLenRelVars(pp: PathPattern): Seq[String] =
      pp.hops.flatMap(h => h._1.variable.filter(_ => h._1.varLength.isDefined))
    val (names, listNames): (Set[String], Set[String]) = {
      val pats = q.clauses.flatMap {
        case MatchPart(m) => m.paths
        case MergePart(m) => m.paths
        case CreatePart(c) => c.paths
        case _ => Nil
      }
      (pats.flatMap(_.name).toSet, pats.flatMap(varLenRelVars).toSet)
    }
    if (names.isEmpty && listNames.isEmpty)
      return SurfaceUsage(Map.empty, Map.empty)
    import scala.collection.mutable
    val nodeF = mutable.Map.empty[String, mutable.Set[String]]
    val relF = mutable.Map.empty[String, mutable.Set[String]]
    val listF = mutable.Map.empty[String, mutable.Set[String]]
    val opaqueN = mutable.Set.empty[String]
    val opaqueR = mutable.Set.empty[String]
    val opaqueL = mutable.Set.empty[String]
    def addN(p: String, fs: String*): Unit =
      nodeF.getOrElseUpdate(p, mutable.Set.empty) ++= fs
    def addR(p: String, fs: String*): Unit =
      relF.getOrElseUpdate(p, mutable.Set.empty) ++= fs
    def addL(r: String, fs: String*): Unit =
      listF.getOrElseUpdate(r, mutable.Set.empty) ++= fs
    def markAll(p: String): Unit = { opaqueN += p; opaqueR += p }
    def isNodesFn(f: String) = f == "nodes"
    def isRelsFn(f: String) = f == "relationships" || f == "rels"

    // fields a lambda body reads off its element variable `v`; `add` /
    // `opaqueElem` route to whichever surface the list came from
    def lambdaScan(isNode: Boolean, v: String, body: Expr,
                   add: Seq[String] => Unit, opaqueElem: () => Unit): Unit = {
      def go(e: Expr): Unit = e match {
        case Property(`v`, k) =>
          // pseudo-property precedence (ExprCompiler): id/label on nodes
          // and type on rels read coalesce(properties[k], struct.k)
          if (isNode && (k == "id" || k == "label")) add(Seq("properties", k))
          else if (!isNode && k == "type") add(Seq("properties", "type"))
          else add(Seq("properties"))
        case Func("id", List(Variable(`v`))) =>
          add(Seq(if (isNode) "id" else "eid"))
        case Func("type", List(Variable(`v`))) if !isNode => add(Seq("type"))
        case Func("labels" | "label", List(Variable(`v`))) if isNode =>
          add(Seq("label"))
        case Variable(`v`) => opaqueElem()
        case ListComp(v2, _, _, _) if v2 == v =>
          // the lambda var is shadowed inside — give up on slimming but
          // keep scanning for other surface references
          opaqueElem(); mapChildren(e, c => { scan(c); c }); ()
        case ReduceExpr(_, _, v2, _, _) if v2 == v =>
          opaqueElem(); mapChildren(e, c => { scan(c); c }); ()
        case Quantifier(_, v2, _, _) if v2 == v =>
          opaqueElem(); mapChildren(e, c => { scan(c); c }); ()
        case other if !freeVars(other).contains(v) => scan(other)
        case other => mapChildren(other, c => { go(c); c }); ()
      }
      go(body)
    }

    def scan(e: Expr): Unit = e match {
      // count-only shapes: no element fields needed
      case Func("size", List(Func(f, List(Variable(p)))))
          if names(p) && (isNodesFn(f) || isRelsFn(f)) => ()
      case Func("size", List(Variable(r))) if listNames(r) => ()
      case Func("length", List(Variable(p))) if names(p) => ()
      // recognized lambda wrappers: fields from the body
      case ListComp(v, Func(f, List(Variable(p))), w, pr)
          if names(p) && (isNodesFn(f) || isRelsFn(f)) =>
        val n = isNodesFn(f)
        (w.toList ++ pr.toList).foreach(b => lambdaScan(n, v, b,
          fs => if (n) addN(p, fs: _*) else addR(p, fs: _*),
          () => if (n) opaqueN += p else opaqueR += p))
      case ListComp(v, Variable(r), w, pr) if listNames(r) =>
        (w.toList ++ pr.toList).foreach(b => lambdaScan(isNode = false, v, b,
          fs => addL(r, fs: _*), () => opaqueL += r))
      case Quantifier(_, v, Func(f, List(Variable(p))), pred)
          if names(p) && (isNodesFn(f) || isRelsFn(f)) =>
        val n = isNodesFn(f)
        lambdaScan(n, v, pred,
          fs => if (n) addN(p, fs: _*) else addR(p, fs: _*),
          () => if (n) opaqueN += p else opaqueR += p)
      case Quantifier(_, v, Variable(r), pred) if listNames(r) =>
        lambdaScan(isNode = false, v, pred,
          fs => addL(r, fs: _*), () => opaqueL += r)
      case ReduceExpr(_, init, v, Func(f, List(Variable(p))), body)
          if names(p) && (isNodesFn(f) || isRelsFn(f)) =>
        scan(init)
        val n = isNodesFn(f)
        lambdaScan(n, v, body,
          fs => if (n) addN(p, fs: _*) else addR(p, fs: _*),
          () => if (n) opaqueN += p else opaqueR += p)
      case ReduceExpr(_, init, v, Variable(r), body) if listNames(r) =>
        scan(init)
        lambdaScan(isNode = false, v, body,
          fs => addL(r, fs: _*), () => opaqueL += r)
      // opaque surfaces: the arrays or their whole elements escape
      case Func(f, List(Variable(p))) if names(p) && isNodesFn(f) =>
        opaqueN += p
      case Func(f, List(Variable(p))) if names(p) && isRelsFn(f) =>
        opaqueR += p
      case Variable(p) if names(p) => markAll(p)
      case Variable(r) if listNames(r) => opaqueL += r
      case _: ExistsSub | _: PatternComp | _: PatternPred =>
        // subplans with their own scopes — mapChildren won't descend;
        // any surface reference inside is opaque
        val fv = freeVars(e)
        fv.intersect(names).foreach(markAll)
        fv.intersect(listNames).foreach(opaqueL += _)
      case other => mapChildren(other, c => { scan(c); c }); ()
    }

    def patternPropExprs(pp: PathPattern): Seq[Expr] =
      (pp.start :: pp.hops.map(_._2)).flatMap(_.properties.values) ++
        pp.hops.flatMap(_._1.properties.values)
    def scanReturn(r: ReturnClause): Unit = {
      r.items.foreach(i => scan(i.expr)); r.orderBy.foreach(s => scan(s.expr))
    }
    q.clauses.foreach {
      case MatchPart(m) =>
        m.where.foreach(scan); m.paths.flatMap(patternPropExprs).foreach(scan)
      case ReturnPart(r) => scanReturn(r)
      case WithPart(w) => scanReturn(w.projection); w.where.foreach(scan)
      case UnwindPart(u) => scan(u.list)
      case CallPart(c) => c.args.foreach(scan)
      case SetPart(s) => s.items.foreach { case (_, _, e) => scan(e) }
      case MergePart(m) =>
        m.paths.flatMap(patternPropExprs).foreach(scan)
        (m.onCreate ++ m.onMatch).foreach { case (_, _, e) => scan(e) }
      case CreatePart(c) => c.paths.flatMap(patternPropExprs).foreach(scan)
      case DeletePart(d) =>
        d.variables.filter(names).foreach(markAll)
        d.variables.filter(listNames).foreach(opaqueL += _)
      case _: RemovePart => ()
    }
    SurfaceUsage(
      names.map { p =>
        val nf = if (opaqueN(p)) None
                 else Some(nodeF.get(p).map(_.toSet).getOrElse(Set.empty[String]))
        val rf = if (opaqueR(p)) None
                 else Some(relF.get(p).map(_.toSet).getOrElse(Set.empty[String]))
        p -> ((nf, rf))
      }.toMap,
      listNames.map { r =>
        val lf = if (opaqueL(r)) None
                 else Some(listF.get(r).map(_.toSet).getOrElse(Set.empty[String]))
        r -> lf
      }.toMap)
  }

  /** The same linear path walked from the other end: node sequence
    * reversed, each hop's arrow flipped (edges themselves unchanged, so
    * exactly the same rows bind). Callers gate on the typed-anchor /
    * named-path caveats — see installTopKPruning. */
  private[cypher] def reversePath(p: PathPattern): PathPattern = {
    val nodes = p.start +: p.hops.map(_._2)
    val rels = p.hops.map(_._1)
    def flip(r: RelPattern) = r.copy(direction = r.direction match {
      case DirRight => DirLeft
      case DirLeft => DirRight
      case DirBoth => DirBoth
    })
    PathPattern(nodes.last,
      rels.reverse.zip(nodes.init.reverse).map { case (r, n) => (flip(r), n) })
  }
  /** Running binding state: the bound DataFrame (absent before any scan)
    * plus variable kinds. */
  /** `pending`: deferred whole-frame transforms (the shortest-path window
    * filter) applied by `applyMatch` AFTER the clause's WHERE, so endpoint
    * predicates (`WHERE id(c) = ...`) push into the scans below the unroll
    * instead of being blocked behind the window. */
  final case class BindCtx(df: Option[DataFrame], scope: Map[String, Kind],
      pending: List[DataFrame => DataFrame] = Nil) {
    def withVar(v: String, k: Kind): BindCtx = copy(scope = scope + (v -> k))
  }

  /**
   * DISTINCT / UNION dedup that tolerates entity columns. Spark rejects
   * MAP types in set operations (dropDuplicates over a node/relationship
   * struct throws AnalysisException), so:
   *  - entity structs dedup by id/eid — ids identify entities, the
   *    surviving representative struct is equivalent by construction;
   *  - bare MAP columns dedup by their sorted-entries JSON rendering
   *    (entry order inside a map is not semantically significant);
   *  - other map-bearing types (e.g. collected property maps) dedup by
   *    their JSON rendering.
   * `subset` restricts the dedup key to the named columns (RETURN
   * DISTINCT items); other columns survive with arbitrary representatives.
   */
  /** Attach comparable dedup-key columns for the named columns: entity
    * structs key by id/eid, map-bearing values by a deterministic JSON
    * rendering, plain values by themselves. Returns (df + temp key cols,
    * all key names, the temp key names to drop afterwards). */
  private[cypher] def withDedupKeys(df: DataFrame, subset: Option[Seq[String]] = None)
      : (DataFrame, Seq[String], Seq[String]) = {
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val names = subset.getOrElse(df.columns.toSeq)
    var out = df
    val keys = names.zipWithIndex.map { case (n, i) =>
      df.schema(n).dataType match {
        case s: StructType if s.fieldNames.contains("eid") =>
          val k = s"__dk$i"; out = out.withColumn(k, col(s"`$n`.eid")); k
        case s: StructType if s.fieldNames.contains("id") && s.fieldNames.contains("properties") =>
          val k = s"__dk$i"; out = out.withColumn(k, col(s"`$n`.id")); k
        case _: MapType =>
          val k = s"__dk$i"
          out = out.withColumn(k, to_json(array_sort(map_entries(col(s"`$n`"))))); k
        case dt if hasMap(dt) =>
          val k = s"__dk$i"; out = out.withColumn(k, to_json(col(s"`$n`"))); k
        case _ => n
      }
    }
    (out, keys, keys.filter(_.startsWith("__dk")))
  }

  private[cypher] def dedupRows(df: DataFrame, subset: Option[Seq[String]] = None): DataFrame = {
    val (out, keys, tmp) = withDedupKeys(df, subset)
    out.dropDuplicates(keys).drop(tmp: _*)
  }
}
