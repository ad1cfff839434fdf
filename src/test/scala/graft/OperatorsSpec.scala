package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class OperatorsSpec extends SparkSpec {

  test("asofJoin: latest right at-or-before left, per key, left-outer") {
    import spark.implicits._
    val quotes = Seq( // (qid, sym, qts, px)
      (1L, "A", 10L, 1.0), (2L, "A", 20L, 2.0), (3L, "A", 30L, 3.0),
      (4L, "B", 15L, 9.0)
    ).toDF("qid", "sym", "qts", "px")
    val trades = Seq( // (tid, sym, tts)
      (100L, "A", 5L),   // before any quote → null
      (101L, "A", 20L),  // equal ts → that quote is visible
      (102L, "A", 25L),  // between → ts=20 quote
      (103L, "A", 99L),  // after all → ts=30 quote
      (104L, "B", 14L),  // before B's quote → null
      (105L, "C", 50L)   // key with no quotes at all → null
    ).toDF("tid", "sym", "tts")
    val out = Relational.asofJoin(trades, quotes, Seq("sym"), "tts", "qts")
      .select(col("tid"), col("r_qid"), col("r_px")).orderBy("tid").collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq === Seq(
      (100L, None, None),
      (101L, Some(2L), Some(2.0)),
      (102L, Some(2L), Some(2.0)),
      (103L, Some(3L), Some(3.0)),
      (104L, None, None),
      (105L, None, None)))
  }

  test("asofJoin forward: earliest right at-or-after left, per key, left-outer") {
    import spark.implicits._
    val quotes = Seq(
      (1L, "A", 10L, 1.0), (2L, "A", 20L, 2.0), (3L, "A", 30L, 3.0),
      (4L, "B", 15L, 9.0)
    ).toDF("qid", "sym", "qts", "px")
    val trades = Seq(
      (100L, "A", 5L),   // before any quote → first quote (ts=10)
      (101L, "A", 20L),  // equal ts → that quote
      (102L, "A", 25L),  // between → ts=30 quote
      (103L, "A", 99L),  // after all → null
      (104L, "B", 14L),  // before B's quote → that quote
      (105L, "C", 50L)   // key with no quotes → null
    ).toDF("tid", "sym", "tts")
    val out = Relational.asofJoin(trades, quotes, Seq("sym"), "tts", "qts",
        direction = "forward")
      .select(col("tid"), col("r_qid"), col("r_px")).orderBy("tid").collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq === Seq(
      (100L, Some(1L), Some(1.0)),
      (101L, Some(2L), Some(2.0)),
      (102L, Some(3L), Some(3.0)),
      (103L, None, None),
      (104L, Some(4L), Some(9.0)),
      (105L, None, None)))
    // equal-timestamp ties resolve to the greatest payload, same as backward
    val right = Seq((7L, "A", 10L), (9L, "A", 10L), (8L, "A", 10L)).toDF("rid", "k", "rts")
    val left = Seq((1L, "A", 10L)).toDF("lid", "k", "lts")
    val tie = Relational.asofJoin(left, right, Seq("k"), "lts", "rts",
      direction = "forward").collect()
    assert(tie.head.getAs[Long]("r_rid") === 9L)
  }

  test("asofJoin: equal-timestamp right rows tie-break on payload struct order") {
    import spark.implicits._
    val right = Seq((7L, "A", 10L), (9L, "A", 10L), (8L, "A", 10L)).toDF("rid", "k", "rts")
    val left = Seq((1L, "A", 10L)).toDF("lid", "k", "lts")
    val out = Relational.asofJoin(left, right, Seq("k"), "lts", "rts").collect()
    // rid is the first right payload column → largest rid wins the tie
    assert(out.head.getAs[Long]("r_rid") === 9L)
  }

  test("asofJoin: null-timestamp right rows never match; null-ts left rows survive") {
    import spark.implicits._
    val right = Seq((Some(1L), "A", Option.empty[Long]), (Some(2L), "A", Some(10L)))
      .toDF("rid", "k", "rts")
    val left = Seq((Some(1L), "A", Some(5L)), (Some(2L), "A", Option.empty[Long]))
      .toDF("lid", "k", "lts")
    val out = Relational.asofJoin(left, right, Seq("k"), "lts", "rts")
      .orderBy("lid").collect()
    // lid=1 at ts=5: the null-ts right row must NOT be a fallback match
    assert(out(0).isNullAt(out(0).fieldIndex("r_rid")))
    // lid=2 has no timestamp → emitted, unmatched
    assert(out(1).isNullAt(out(1).fieldIndex("r_rid")))
  }

  test("asofJoin: MapType payload columns don't break the tiebreak ordering") {
    import spark.implicits._
    // maps are unorderable; the struct tiebreak must fall back to the
    // canonical-JSON rendering instead of failing analysis
    val right = Seq((1L, "A", 10L, Map("a" -> "1")), (2L, "A", 10L, Map("b" -> "2")))
      .toDF("rid", "k", "rts", "attrs")
    val left = Seq((1L, "A", 15L)).toDF("lid", "k", "lts")
    val out = Relational.asofJoin(left, right, Seq("k"), "lts", "rts").collect()
    // deterministic: {"rid":2,...,"attrs":{"b":"2"}} > {"rid":1,...} lexicographically
    assert(out.head.getAs[Long]("r_rid") === 2L)
  }

  test("asofJoin: null keys follow equi-join semantics — null matches nothing") {
    import spark.implicits._
    val right = Seq((Some(1L), Option.empty[String], Some(10L)), (Some(2L), Some("A"), Some(10L)))
      .toDF("rid", "k", "rts")
    val left = Seq((Some(1L), Option.empty[String], Some(15L)), (Some(2L), Some("A"), Some(15L)))
      .toDF("lid", "k", "lts")
    val out = Relational.asofJoin(left, right, Seq("k"), "lts", "rts")
      .orderBy("lid").collect()
    // null-keyed left row survives but must NOT match the null-keyed right row
    assert(out(0).isNullAt(out(0).fieldIndex("r_rid")))
    assert(out(1).getAs[Long]("r_rid") === 2L)
  }

  test("rangeJoin: containment exact at bucket edges, keys respected, no product in the plan") {
    import spark.implicits._
    val pts = Seq((1L, "k1", 5.0), (2L, "k1", 10.0), (3L, "k1", 25.0),
      (4L, "k2", 10.0), (5L, "k1", -3.0)).toDF("pid", "key", "x")
    val iv = Seq(("k1", "a", 0.0, 10.0), ("k1", "b", 10.0, 20.0),
      ("k2", "c", 0.0, 10.0), ("k1", "d", -10.0, -1.0)).toDF("key", "name", "lo", "hi")
    val out = Relational.rangeJoin(pts, iv, Seq("key"), "x", "lo", "hi", bucketWidth = 7)
      .select(col("pid"), col("r_name")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // 5.0 ∈ a only; 10.0 ∈ a AND b (inclusive both ends); 25.0 matches
    // nothing; k2's 10.0 only sees k2 intervals; -3.0 ∈ d (negative
    // buckets work)
    assert(out === Set((1L, "a"), (2L, "a"), (2L, "b"), (4L, "c"), (5L, "d")))
    // exactly one row per qualifying pair (bucket replication never dupes)
    val n = Relational.rangeJoin(pts, iv, Seq("key"), "x", "lo", "hi", bucketWidth = 7).count()
    assert(n === 5L)
    // bucket width doesn't change semantics
    val w1 = Relational.rangeJoin(pts, iv, Seq("key"), "x", "lo", "hi", bucketWidth = 1)
      .select(col("pid"), col("r_name")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(w1 === out)
    // the whole point: an equi-join shape, not a nested-loop product
    val plan = Relational.rangeJoin(pts, iv, Seq("key"), "x", "lo", "hi", bucketWidth = 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"rangeJoin degraded to a product:\n$plan")
    // inverted and null intervals drop; null points drop
    val bad = Seq(("k1", "z", Some(20.0), Some(0.0)), ("k1", "n", None, Some(5.0)))
      .toDF("key", "name", "lo", "hi")
    assert(Relational.rangeJoin(pts, bad, Seq("key"),
      "x", "lo", "hi", bucketWidth = 7).count() === 0L)
  }

  test("funnel: order matters, earliest-completion, per-step counts") {
    import spark.implicits._
    import graft.operators.EventOps
    val ev = Seq(
      // u1 completes A<B<C
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "C"),
      // u2 does B before A — B must re-occur after A to count; it doesn't
      (2L, 10L, "B"), (2L, 20L, "A"),
      // u3: A then B, no C
      (3L, 10L, "A"), (3L, 15L, "B"),
      // u4: earliest-completion — first B after A counts even though a
      // later B would also allow C
      (4L, 10L, "A"), (4L, 20L, "B"), (4L, 40L, "B"), (4L, 50L, "C")
    ).toDF("u", "ts", "t")
    val out = EventOps.funnel(ev, "u", "ts", "t", Seq("A", "B", "C"))
      .orderBy("step_no").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((1, "A", 4L), (2, "B", 3L), (3, "C", 2L)))
  }

  test("weeklyRetention: cohort by first week, offsets count active users") {
    import spark.implicits._
    import graft.operators.EventOps
    def ts(d: String) = java.sql.Timestamp.valueOf(d + " 12:00:00")
    val ev = Seq(
      (1L, ts("2024-01-01")), (1L, ts("2024-01-08")),  // cohort W0, active W0+W1
      (2L, ts("2024-01-02")),                          // cohort W0, only W0
      (3L, ts("2024-01-10")), (3L, ts("2024-01-22"))   // cohort W1, active W1+W3
    ).toDF("u", "ts")
    val out = EventOps.weeklyRetention(ev, "u", "ts")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSeq
    assert(out === Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 2, 1L)))
  }

  test("graft SQL functions register and run (runtime registration path)") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_vec_norm(array(3.0D, 4.0D)) AS n,
        |       graft_vec_sqdiff(array(1.0D, 1.0D), array(4.0D, 5.0D)) AS s""".stripMargin)
      .collect().head
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 5.0)
    assert(r.getDouble(2) === 25.0)
  }

  test("mortonCode: exact interleave, ordering clusters both dimensions") {
    import spark.implicits._
    import graft.operators.Layout
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (1023L, 1023L))
      .toDF("x", "y")
    val got = df.select(org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y"),
        Layout.mortonCode(org.apache.spark.sql.functions.col("x"),
          org.apache.spark.sql.functions.col("y"), bits = 10).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    def ref(x: Long, y: Long): Long =
      (0 until 10).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    got.foreach { case ((x, y), z) => assert(z === ref(x, y), s"($x,$y)") }
    // (1023,1023) uses every interleaved bit: 2^20 - 1
    assert(got((1023L, 1023L)) === (1L << 20) - 1)
  }

  test("bloomFilter: no false negatives, absent keys mostly reject, shards merge by BIT_OR") {
    import spark.implicits._
    import graft.pipeline.Sketches
    val members = (1L to 300L).map(i => i * 7).toDF("k")
    val sketch = Sketches.bloomFilter(members, "k")
    val probes = ((1L to 300L).map(i => i * 7) ++ (1L to 300L).map(i => i * 7 + 1)).toDF("k")
    val res = Sketches.bloomMightContain(sketch, probes.select($"k".as("key")), "key")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // every member MUST probe positive (bloom contract: no false negatives)
    (1L to 300L).map(_ * 7).foreach(k => assert(res(k) === 1, s"false negative for $k"))
    // absent keys mostly reject (4096 bits / 300 keys / k=5 -> fp rate ~1%)
    val fp = (1L to 300L).map(_ * 7 + 1).count(k => res(k) === 1)
    assert(fp < 30, s"false-positive rate implausibly high: $fp/300")
    // shard merge: union of per-shard sketches re-aggregated by BIT_OR
    // equals the single-pass sketch
    val sh1 = Sketches.bloomFilter(members.where($"k" <= 1000), "k")
    val sh2 = Sketches.bloomFilter(members.where($"k" > 1000), "k")
    val merged = sh1.unionByName(sh2).groupBy("word")
      .agg(org.apache.spark.sql.functions.call_function("bit_or",
        org.apache.spark.sql.functions.col("bits")).as("bits"))
    assert(merged.exceptAll(sketch).isEmpty && sketch.exceptAll(merged).isEmpty,
      "shard-merged sketch differs from single-pass sketch")
  }

  test("scd2: same-value runs merge, last-wins ties, open current version") {
    import spark.implicits._
    import graft.operators.Relational
    val ev = Seq(
      (1L, 10L, "A", 1L), (1L, 20L, "A", 2L), // run merges
      (1L, 30L, "B", 3L),                     // version change
      (1L, 30L, "C", 4L),                     // tie: higher event_id wins -> C
      (1L, 40L, "A", 5L),                     // back to A = new version
      (2L, 10L, "X", 6L))                     // second key, open version
      .toDF("user_id", "ts", "v", "event_id")
    val out = Relational.scd2(ev, Seq("user_id"), "ts", "v",
        tiebreakCol = Some("event_id"))
      .orderBy("user_id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.toSeq === Seq(
      (1L, "A", 10L, Some(30L)),
      (1L, "C", 30L, Some(40L)),
      (1L, "A", 40L, None),
      (2L, "X", 10L, None)))
  }

  test("perf catalog: append-only history, sla report grid, admission gate") {
    import graft.operators.PerfCatalog
    val dir = java.nio.file.Files.createTempDirectory("perfcat").toString
    val cat = new PerfCatalog(s"$dir/perf")
    // no history yet: first attempt must be admitted
    assert(cat.admit(spark, "trian", partitions = 4, slaMs = 10L))
    // record a few runs across two graphs / partition counts
    cat.record(spark, "trian", "powergrid", 4, 100L)
    cat.record(spark, "trian", "powergrid", 4, 200L)
    cat.record(spark, "trian", "powergrid", 4, 300L)
    cat.record(spark, "trian", "social", 8, 5000L)
    cat.record(spark, "pgrnk", "powergrid", 4, 50L)
    // the sla report grid: per (graph, partitions) attempts + median/max
    val rep = cat.slaReport(spark, "trian").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(4))).toSeq
    assert(rep === Seq(("powergrid", 4, 3L, 300L), ("social", 8, 1L, 5000L)))
    // admission: p90 of {100,200,300} = 300 fits a 400ms SLA, not 250ms
    assert(cat.admit(spark, "trian", 4, slaMs = 400L))
    assert(!cat.admit(spark, "trian", 4, slaMs = 250L))
    // unseen (command, partitions) combination admits
    assert(cat.admit(spark, "trian", 16, slaMs = 1L))
    // timed() wraps a body, records, and passes the result through
    val out = cat.timed(spark, "vcnt", "powergrid", 4) { 42 }
    assert(out === 42)
    assert(cat.history(spark).where(col("command") === "vcnt").count() === 1L)
  }

}
