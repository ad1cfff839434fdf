package graft.cypher

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.PropertyGraph
import Ast._
import ExprCompiler.{KNode, KRel, Scope}

/**
 * Public entry point for the Cypher surface: parse → plan → one DataFrame.
 *
 * The reference's lifecycle (parse → analyze → plan → serialize JSON plan →
 * ship to every worker → thread-per-operator pull pipeline → master merge;
 * `CypherQueryExecutor.cpp:69-388`) collapses to: build a logical plan,
 * let Catalyst/Tungsten execute it. Results are lazy DataFrames; callers
 * choose collect/write/stream.
 */
object Cypher {

  /** Run a read query (MATCH [... WITH ...] RETURN ... [UNION ...])
    * against a graph. UNION dedups, UNION ALL concatenates — executable
    * here although the reference planner leaves Union as a TODO. */
  def run(graph: PropertyGraph, query: String): DataFrame = {
    val stmt = Parser.parseStatement(query)
    val head = runSingle(graph, stmt.head)
    stmt.tails.foldLeft(head) { case (acc, (all, q)) =>
      val u = acc.unionByName(runSingle(graph, q))
      // entity-aware dedup: plain dropDuplicates throws on MAP-bearing
      // entity structs (Spark set-op restriction)
      if (all) u else Planner.dedupRows(u)
    }
  }

  /**
   * Row intersection of two read queries — the reference DECLARES an
   * Intersection operator (`Operators.h:177-192`) but never executes it;
   * executable here (parity-plus). Distinct rows present in both results;
   * entity columns intersect by id/eid, map values by their sorted-entry
   * rendering (Spark's set operators reject MAP columns outright).
   */
  def intersect(graph: PropertyGraph, q1: String, q2: String): DataFrame = {
    val a = run(graph, q1)
    val b = run(graph, q2)
    if (!a.columns.sameElements(b.columns))
      throw CypherParseException(
        s"INTERSECT requires identical output columns: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val (ak, keys, tmp) = Planner.withDedupKeys(a)
    val (bk, _, _) = Planner.withDedupKeys(b)
    ak.dropDuplicates(keys)
      .join(bk.select(keys.map(k => col(s"`$k`")): _*).distinct(), keys.toSeq, "left_semi")
      .drop(tmp: _*)
  }

  private def runSingle(graph: PropertyGraph, q: Query): DataFrame = {
    if (q.isMutation)
      throw CypherParseException(
        "mutation queries (CREATE/MERGE/SET/REMOVE/DELETE) go through Cypher.execute — they produce a new graph")
    val planner = new Planner(graph)
    // named-path / rel-list surface pruning: slim the tracked struct
    // arrays to the fields the query reads (full structs when opaque)
    planner.setSurfaceUse(Planner.surfaceUsage(q))
    // anchored top-k pushdown — may reverse the path so the sorted
    // variable is the anchor scan; identity otherwise
    val q2 = planner.installTopKPruning(q)
    var ctx = Planner.BindCtx(None, Map.empty)
    var result: Option[DataFrame] = None
    q2.clauses.foreach {
      case _ if result.nonEmpty =>
        throw CypherParseException("RETURN must be the final clause")
      case MatchPart(m) => ctx = planner.applyMatch(ctx, m)
      case WithPart(w) => ctx = planner.applyWith(ctx, w)
      case UnwindPart(u) => ctx = planner.applyUnwind(ctx, u)
      case CallPart(c) => ctx = planner.applyCall(ctx, c)
      case ReturnPart(r) => result = Some(planner.applyReturn(ctx, r))
      case _ => () // mutation parts unreachable: guarded above
    }
    result.getOrElse(throw CypherParseException("query has no RETURN clause"))
  }

  /**
   * Execute a query that may mutate the graph (CREATE). Returns the
   * (possibly new) graph plus the result DataFrame if the query had RETURN.
   * Mirrors the reference's Create operator, which appends via the
   * partition-aware incremental store (`OperatorExecutor.cpp:1257-1281`);
   * here an append is a DataFrame union — partition residency is Spark's
   * problem, not the planner's.
   */
  def execute(graph: PropertyGraph, query: String): (PropertyGraph, Option[DataFrame]) = {
    val q = Parser.parse(query)
    if (!q.isMutation) return (graph, Some(run(graph, query)))
    val spark = graph.nodes.sparkSession
    val pathUse = Planner.surfaceUsage(q)
    var planner = new Planner(graph)
    planner.setSurfaceUse(pathUse)
    var ctx = Planner.BindCtx(None, Map.empty)
    var g = graph
    var dirty = false // graph mutated since ctx/planner were bound?
    var result: Option[DataFrame] = None
    // Read-your-writes: every clause after a mutation sees the mutated
    // graph (openCypher). Bound entity structs in the running frame are
    // re-resolved by id/eid against the new graph, and the planner is
    // replaced so later MATCH scans read the new graph too (its fresh-name
    // counter carries over so anonymous columns can't collide).
    def sync(): Unit = if (dirty) {
      ctx = rebind(g, ctx)
      planner = new Planner(g, planner.counterValue)
      planner.setSurfaceUse(pathUse)
      dirty = false
    }
    q.clauses.foreach {
      case MatchPart(m) => sync(); ctx = planner.applyMatch(ctx, m)
      case WithPart(w) => sync(); ctx = planner.applyWith(ctx, w)
      case UnwindPart(u) => sync(); ctx = planner.applyUnwind(ctx, u)
      case CallPart(c) => sync(); ctx = planner.applyCall(ctx, c)
      case CreatePart(c) => sync(); g = truncated(applyCreate(spark, g, c)); dirty = true
      case MergePart(mc) => sync(); g = applyMerge(g, mc); dirty = true
      case SetPart(sc) => sync(); g = truncated(applySet(g, ctx, sc)); dirty = true
      case RemovePart(rc) => sync(); g = truncated(applyRemove(g, ctx, rc)); dirty = true
      case DeletePart(dc) => sync(); g = truncated(applyDelete(g, ctx, dc)); dirty = true
      case ReturnPart(r) => sync(); result = Some(planner.applyReturn(ctx, r))
    }
    (g, result)
  }

  /** Lineage truncation after a mutation, PLAN-SIZE GATED. Every
    * mutation embeds the previous graph's plan several times (match
    * subplan + anti-joins + unions), so chained mutations grow the
    * logical plan geometrically and Catalyst analysis time with it; a
    * LAZY localCheckpoint resets plan depth without an eager driver
    * job. But a checkpoint is NOT free at read time — materializing it
    * writes the FULL graph frame (map-laden rows, GBs at 100× data) to
    * block storage, and a per-mutation checkpoint chain materializes
    * one full copy PER MUTATION when the graph is finally read
    * (measured sf10 solo: a 4-mutation MERGE script read 164.5 s, one
    * ~40 s frame copy per layer). Short scripts never need the
    * truncation — their whole chain composes into ONE pass over the
    * cached base — so checkpoint only when the logical plan actually
    * grows past a size that threatens analysis cost. */
  private def planSize(df: DataFrame): Int = {
    var n = 0
    df.queryExecution.logical.foreach(_ => n += 1)
    n
  }
  private def truncated(g: PropertyGraph): PropertyGraph = {
    def t(df: DataFrame): DataFrame =
      if (planSize(df) > 400) df.localCheckpoint(eager = false) else df
    PropertyGraph(t(g.nodes), t(g.edges), g.isDirected)
  }

  /** Re-resolve every bound entity struct in the frame against the
    * current graph: nodes rejoin by id, relationships by eid. An entity
    * deleted since binding resolves to NULL (documented divergence:
    * openCypher returns the deleted snapshot; we surface NULL). */
  private def rebind(g: PropertyGraph, ctx: Planner.BindCtx): Planner.BindCtx =
    ctx.df match {
      case None => ctx
      case Some(df0) =>
        var df = df0
        ctx.scope.toSeq.sortBy(_._1).foreach {
          case (v, KNode) =>
            val ns = g.nodes.select(col("id").as("__rb_id"),
              struct(col("id"), col("label"), col("properties")).as("__rb_s"))
            df = df.join(ns, col(s"$v.id") === col("__rb_id"), "left")
              .withColumn(v, col("__rb_s")).drop("__rb_id", "__rb_s")
          case (v, KRel) =>
            // on an undirected graph the bound struct may carry the
            // reversed orientation — match src as well as eid so the
            // refreshed struct keeps the orientation the pattern bound
            val base = if (g.isDirected) g.edges else PropertyGraph.bothOrientations(g.edges)
            val es = base.select(col("eid").as("__rb_eid"), col("src").as("__rb_src"),
              struct(col("eid"), col("src"), col("dst"), col("type"), col("properties")).as("__rb_s"))
            df = df.join(es,
              col(s"$v.eid") === col("__rb_eid") && col(s"$v.src") === col("__rb_src"), "left")
              .withColumn(v, col("__rb_s")).drop("__rb_eid", "__rb_src", "__rb_s")
          case _ => () // WITH-projected scalars keep their projected value
        }
        ctx.copy(df = Some(df))
    }

  /**
   * MERGE: match-or-create over a full path pattern. The pattern is
   * matched with the SAME planner machinery as MATCH — including
   * contextual string coercion via compileCmp, so `MERGE (n {age: 25.0})`
   * finds the node whose stored "25" a MATCH would find — and created
   * wholesale when no complete match exists.
   *
   * The create is GATED, not driver-decided: the literal rows are
   * anti-joined against a 1-row "pattern matched" relation, so the whole
   * MERGE stays lazy and MERGE-heavy workloads never serialize on
   * per-path driver count() jobs.
   *
   * Divergence from openCypher's duplicate-node gotcha, documented: our
   * CREATE is an id-keyed upsert, so when the full pattern misses but an
   * endpoint node already exists, the endpoint is reused (matched by id)
   * instead of duplicated anonymously.
   */
  private def applyMerge(g: PropertyGraph, mc: MergeClause): PropertyGraph = {
    var out = g
    if (mc.paths.size > 1 && (mc.onCreate.nonEmpty || mc.onMatch.nonEmpty))
      throw CypherParseException(
        "ON CREATE SET / ON MATCH SET require a single MERGE pattern")
    mc.paths.foreach { path =>
      val planner = new Planner(out)
      val matchedCtx = planner
        .applyMatch(Planner.BindCtx(None, Map.empty), MatchClause(List(path), None))
      val matched = matchedCtx.df.getOrElse(out.nodes.sparkSession.range(1).toDF())
      // nonempty iff the full pattern already has a match
      val gate = matched.select(lit(1).as("__hit")).limit(1)
      // ON CREATE SET folds into the literal rows before the gated create,
      // so it applies exactly when the create fires — no extra gate needed
      val createPath = if (mc.onCreate.isEmpty) path else foldOnCreate(path, mc.onCreate)
      out = truncated(applyCreate(out.nodes.sparkSession, out, CreateClause(List(createPath)), Some(gate)))
      // ON MATCH SET rides the matched binding: zero matched rows produce
      // zero (id, value) updates, so the arm is naturally gated and the
      // whole MERGE stays lazy (no driver-side matched/created decision)
      if (mc.onMatch.nonEmpty)
        out = truncated(applySet(out, matchedCtx, SetClause(mc.onMatch)))
    }
    out
  }

  /** Rewrite the MERGE pattern's property maps with the ON CREATE SET
    * items so created entities carry them; values must be literals (the
    * CREATE restriction). Unknown variables are rejected eagerly. */
  private def foldOnCreate(path: PathPattern, sets: List[(String, String, Expr)]): PathPattern = {
    val byVar = sets.groupBy(_._1)
    val known = (path.start :: path.hops.map(_._2)).flatMap(_.variable) ++
      path.hops.flatMap(_._1.variable)
    byVar.keys.find(v => !known.contains(v)).foreach(v =>
      throw CypherParseException(s"ON CREATE SET references variable '$v' not bound by the MERGE pattern"))
    def nodeProps(np: NodePattern): NodePattern = np.variable.flatMap(byVar.get) match {
      case Some(items) => np.copy(properties = np.properties ++ items.map(i => i._2 -> i._3))
      case None => np
    }
    def relProps(rp: RelPattern): RelPattern = rp.variable.flatMap(byVar.get) match {
      case Some(items) => rp.copy(properties = rp.properties ++ items.map(i => i._2 -> i._3))
      case None => rp
    }
    PathPattern(nodeProps(path.start), path.hops.map { case (r, n) => (relProps(r), nodeProps(n)) })
  }

  private def emptyMap = map().cast(MapType(StringType, StringType))

  /** Per-variable updated-property map: (id/eid, value) pairs derived from
    * the bound match frame; several matched rows per entity reduce with
    * max() for determinism. SET to NULL removes the key (openCypher). */
  private def applySet(g: PropertyGraph, ctx: Planner.BindCtx, sc: SetClause): PropertyGraph = {
    var out = g
    sc.items.foreach { case (v, key, valueExpr) =>
      val kind = ctx.scope.getOrElse(v,
        throw CypherParseException(s"undefined variable '$v' in SET"))
      val bound = ctx.df.getOrElse(
        throw CypherParseException("SET requires a preceding MATCH"))
      val value = ExprCompiler.compile(valueExpr, Scope(ctx.scope)).col.cast(StringType)
      val idCol = if (kind == KRel) col(s"$v.eid").cast(StringType) else col(s"$v.id")
      val updates = bound.select(idCol.as("__uid"), value.as("__val"))
        .groupBy("__uid").agg(max(col("__val")).as("__val"))
      def patch(props: org.apache.spark.sql.Column) =
        map_concat(
          map_filter(coalesce(props, emptyMap), (k, _) => k =!= key),
          coalesce(when(col("__val").isNotNull, map(lit(key), col("__val"))), emptyMap))
      kind match {
        case KNode =>
          val nodes = out.nodes.join(updates, col("id") === col("__uid"), "left")
            .select(col("id"), col("label"),
              when(col("__uid").isNotNull, patch(col("properties")))
                .otherwise(col("properties")).as("properties"))
          out = PropertyGraph(nodes, out.edges, out.isDirected)
        case KRel =>
          val edges = out.edges.join(updates, col("eid").cast(StringType) === col("__uid"), "left")
            .select(col("eid"), col("src"), col("dst"), col("type"),
              when(col("__uid").isNotNull, patch(col("properties")))
                .otherwise(col("properties")).as("properties"))
          out = PropertyGraph(out.nodes, edges, out.isDirected)
        case _ => throw CypherParseException(s"'$v' is not an entity variable")
      }
    }
    out
  }

  private def applyRemove(g: PropertyGraph, ctx: Planner.BindCtx, rc: RemoveClause): PropertyGraph =
    applySet(g, ctx, SetClause(rc.items.map { case (v, k) => (v, k, NullLit) }))

  /** DELETE: plain node delete refuses when incident edges remain
    * (openCypher); DETACH DELETE drops them too; relationship variables
    * delete by eid. */
  private def applyDelete(g: PropertyGraph, ctx: Planner.BindCtx, dc: DeleteClause): PropertyGraph = {
    var out = g
    val bound = ctx.df.getOrElse(
      throw CypherParseException("DELETE requires a preceding MATCH"))
    dc.variables.foreach { v =>
      ctx.scope.getOrElse(v, throw CypherParseException(s"undefined variable '$v' in DELETE")) match {
        case KNode =>
          // persisted: the deleted-id set feeds THREE consumers in the
          // detach form (node anti-join + two edge anti-joins) — without
          // it each recomputes the full bound-match scan (r18 sf10:
          // ~1/3 of a 52 s DETACH DELETE was exactly this). Small by
          // construction (matched ids only); ContextCleaner reclaims.
          val ids = bound.select(col(s"$v.id").as("__did")).distinct()
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          var nodes = out.nodes.join(ids, col("id") === col("__did"), "left_anti")
          if (!dc.detach) {
            // "cannot delete a node with relationships" (openCypher) as a
            // PLAN-EMBEDDED guard: the incident-edge count is folded into
            // the node plan (1-row aggregate, broadcast cross join) and
            // raise_error fires when the mutated graph's plan first
            // materializes — under AQE that is this statement's own
            // lineage-truncation checkpoint; without AQE, the first user
            // action. Either way there is no DELETE-specific driver
            // action: the former eager limit(1).count() here serialized
            // DELETE-heavy scripts on an EXTRA job per statement — the
            // same pathology the MERGE driver-count fix removed.
            val guard = out.edges.join(ids,
              col("src") === col("__did") || col("dst") === col("__did"))
              .agg(count(lit(1)).as("__incident"))
            nodes = nodes.crossJoin(guard)
              .where(when(col("__incident") > 0, raise_error(
                lit(s"cannot DELETE node '$v' with relationships — use DETACH DELETE")))
                .otherwise(lit(true)))
              .drop("__incident")
          }
          val edges =
            if (dc.detach)
              out.edges
                .join(ids.withColumnRenamed("__did", "src"), Seq("src"), "left_anti")
                .join(ids.withColumnRenamed("__did", "dst"), Seq("dst"), "left_anti")
                .select(col("eid"), col("src"), col("dst"), col("type"), col("properties"))
            else out.edges
          out = PropertyGraph(nodes, edges, out.isDirected)
        case KRel =>
          val eids = bound.select(col(s"$v.eid").as("__deid")).distinct()
          val edges = out.edges.join(eids, col("eid") === col("__deid"), "left_anti")
          out = PropertyGraph(out.nodes, edges, out.isDirected)
        case _ => throw CypherParseException(s"'$v' is not an entity variable")
      }
    }
    out
  }

  private def literalString(e: Expr): String = e match {
    case StrLit(s) => s
    case IntLit(v) => v.toString
    case DblLit(v) => v.toString
    case BoolLit(v) => v.toString
    case other => throw CypherParseException(s"CREATE property values must be literals, got ${text(other)}")
  }

  /** CREATE, optionally gated: when `skipIfNonEmpty` is given, the new
    * rows are anti-joined against it so nothing is added if that relation
    * has a row (lazy match-or-create for MERGE). */
  private def applyCreate(spark: SparkSession, g: PropertyGraph, c: CreateClause,
                          skipIfNonEmpty: Option[DataFrame] = None): PropertyGraph = {
    import scala.jdk.CollectionConverters._
    val nodeRows = scala.collection.mutable.ArrayBuffer.empty[(String, String, Map[String, String])]
    val edgeRows = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, Map[String, String])]
    c.paths.foreach { path =>
      def nodeId(np: NodePattern): String = {
        val props = np.properties.map { case (k, v) => k -> literalString(v) }
        val id = props.getOrElse("id",
          throw CypherParseException("CREATE node needs an {id: ...} property"))
        nodeRows += ((id, np.labels.headOption.getOrElse(""), props))
        id
      }
      var prev = nodeId(path.start)
      path.hops.foreach { case (rel, node) =>
        val target = nodeId(node)
        val props = rel.properties.map { case (k, v) => k -> literalString(v) }
        val typ = rel.types.headOption.getOrElse("")
        val (s, d) = rel.direction match {
          case DirLeft => (target, prev)
          case _ => (prev, target)
        }
        edgeRows += ((s, d, typ, props))
        prev = target
      }
    }
    val nodeSchema = StructType(Seq(
      StructField("id", StringType), StructField("label", StringType),
      StructField("properties", MapType(StringType, StringType))))
    val edgeSchema = StructType(Seq(
      StructField("src", StringType), StructField("dst", StringType),
      StructField("type", StringType), StructField("properties", MapType(StringType, StringType))))
    val litNodes = spark.createDataFrame(
      nodeRows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)).asJava, nodeSchema)
    val litEdges = spark.createDataFrame(
      edgeRows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3, r._4)).asJava, edgeSchema)
    // MERGE gate: keep the literal rows only when the gate relation is
    // empty (anti-join on an always-true condition = "right side empty")
    val newNodes = skipIfNonEmpty
      .map(gt => litNodes.join(gt, lit(true), "left_anti")).getOrElse(litNodes)
    val newEdges = skipIfNonEmpty
      .map(gt => litEdges.join(gt, lit(true), "left_anti")).getOrElse(litEdges)
    // upsert nodes: new definition wins over an existing row with same id
    val keptOld = g.nodes.join(newNodes.select(col("id").as("__nid")),
      col("id") === col("__nid"), "left_anti")
    val nodes = keptOld.unionByName(newNodes)
    val edges = g.edges.unionByName(PropertyGraph.withEid(newEdges))
    PropertyGraph(nodes, edges, g.isDirected)
  }

  /**
   * Render a result DataFrame as the reference's row-JSON shape: one JSON
   * object per row, entity variables expanded to their property maps with
   * id/label folded in (reference rows are JSON objects mapping variable →
   * entity, `OperatorExecutor.cpp:356-359`).
   */
  def toJsonRows(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        // relationship variable: reference emits the property map + type
        // (not the storage-level src/dst/eid) — e.g.
        // {"description":"...","id":"11","type":"FRIENDS"}
        case s: StructType if s.fieldNames.contains("eid") && s.fieldNames.contains("type") =>
          map_concat(
            map_filter(
              coalesce(col(s"`${f.name}`.properties"),
                map().cast(MapType(StringType, StringType))),
              (k, _) => k =!= "type"),
            map(lit("type"), col(s"`${f.name}`.type"))).as(f.name)
        case s: StructType if s.fieldNames.contains("properties") && s.fieldNames.contains("id") =>
          // fold id/label into the property map; drop duplicates from props
          // first (map_concat rejects duplicate keys under the default
          // EXCEPTION dedup policy)
          map_concat(
            map(lit("id"), col(s"`${f.name}`.id"), lit("label"),
              coalesce(col(s"`${f.name}`.label"), lit(""))),
            map_filter(
              coalesce(col(s"`${f.name}`.properties"),
                map().cast(MapType(StringType, StringType))),
              (k, _) => k =!= "id" && k =!= "label")).as(f.name)
        case _ => col(s"`${f.name}`").as(f.name)
      }
    }
    // keep explicit nulls — reference rows carry them ({"n.age":null,...})
    df.select(to_json(struct(cols.toIndexedSeq: _*),
      Map("ignoreNullFields" -> "false")).as("json"))
  }
}
