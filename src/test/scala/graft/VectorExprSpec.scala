package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The native vector expressions ([[graft.functions.ArrayDot]] /
 * ArraySqDiff) must be BIT-identical to the higher-order-function forms
 * they replaced — every knn/beam/dedup oracle replays those semantics.
 */
class VectorExprSpec extends SparkSpec {

  import graft.functions.{vecCosine, vecDot, vecL2Dist, vecNearestCentroid, vecNorm}

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  private def hofNorm = (a: org.apache.spark.sql.Column) =>
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
  private def hofL2 = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))

  private def floatDf = {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType), nullable = true),
      StructField("b", ArrayType(FloatType), nullable = true)))
    val rng = new scala.util.Random(7)
    val rows =
      // random vectors exercise float-multiply rounding exactly
      Seq.fill(50)(Row(Seq.fill(17)(rng.nextFloat()), Seq.fill(17)(rng.nextFloat()))) ++
      Seq(
        Row(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
        Row(Seq(0.1f, 0.2f, 0.3f), Seq(0.7f, 0.8f, 0.9f)),
        Row(null, Seq(1.0f)),                    // null input
        Row(Seq(1.0f), null),
        Row(Seq(1.0f, 2.0f), Seq(1.0f)),         // length mismatch
        Row(Seq(1.0f, null), Seq(1.0f, 2.0f)),   // null element
        Row(Seq.empty[Any], Seq.empty[Any]),     // empty → 0.0
        Row(Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)))   // zero norm → NaN cosine
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("ArrayDot/ArraySqDiff match the HOF fold bit-for-bit on float arrays") {
    // cosine divides by the norms — under ANSI (Spark 4 default) a
    // zero-norm row throws in BOTH forms, so compare it on nonzero rows
    val df = floatDf.where(coalesce(hofNorm(col("a")) * hofNorm(col("b")), lit(1.0)) =!= 0.0)
      .select(
        vecDot(col("a"), col("b")).as("nd"), hofDot(col("a"), col("b")).as("hd"),
        vecNorm(col("a")).as("nn"), hofNorm(col("a")).as("hn"),
        vecL2Dist(col("a"), col("b")).as("nl"), hofL2(col("a"), col("b")).as("hl"),
        vecCosine(col("a"), col("b")).as("nc"),
        (hofDot(col("a"), col("b")) / (hofNorm(col("a")) * hofNorm(col("b")))).as("hc"))
    df.collect().foreach { r =>
      for ((n, h) <- Seq((0, 1), (2, 3), (4, 5), (6, 7))) {
        val (nv, hv) = (r.get(n), r.get(h))
        if (hv == null) assert(nv == null, s"native=$nv hof=null in row $r")
        else {
          // NaN == NaN must count as equal; otherwise require bit equality
          val (nd, hd) = (nv.asInstanceOf[Double], hv.asInstanceOf[Double])
          assert(java.lang.Double.doubleToLongBits(nd) == java.lang.Double.doubleToLongBits(hd),
            s"native=$nd hof=$hd in row $r")
        }
      }
    }
  }

  test("mixed float/double inputs promote per element like zip_with") {
    val df = floatDf.where(col("a").isNotNull)
      .select(col("a"), transform(col("b"), _.cast(DoubleType)).as("bd"))
    val rows = df.select(
      vecDot(col("a"), col("bd")).as("nd"), hofDot(col("a"), col("bd")).as("hd")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (Option(r.get(0)), Option(r.get(1))) match {
        case (Some(n), Some(h)) =>
          assert(java.lang.Double.doubleToLongBits(n.asInstanceOf[Double]) ==
            java.lang.Double.doubleToLongBits(h.asInstanceOf[Double]), s"row $r")
        case (n, h) => assert(n == h, s"row $r")
      }
    }
  }

  test("double arrays: exact equality incl. nulls and mismatches") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType), nullable = true),
      StructField("b", ArrayType(DoubleType), nullable = true)))
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(50)(Row(Seq.fill(33)(rng.nextDouble()), Seq.fill(33)(rng.nextDouble()))) ++
      Seq(Row(Seq(1.5, -2.5), Seq(4.0, 8.0)), Row(Seq(1.0), Seq(1.0, 2.0)), Row(null, Seq(1.0)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = df.select(
      vecDot(col("a"), col("b")).as("nd"), hofDot(col("a"), col("b")).as("hd")).collect()
    out.foreach { r =>
      assert(Option(r.get(0)) == Option(r.get(1)), s"row $r")
    }
  }

  test("nearestCentroid: window-formulation parity, ties, NaN, dirty rows") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // pseudo-random corpus + centroids; compare the codegen'd argmax
    // against the exact window formulation assignClusters replaced
    val rng = new scala.util.Random(7)
    val dim = 6
    val cents = Array.fill(5)(Array.fill(dim)(rng.nextDouble() - 0.5))
    val rows = (0 until 200).map(i => (i.toLong, Seq.fill(dim)(rng.nextDouble() - 0.5)))
    val corpus = rows.toDF("id", "vec")
    val centDf = cents.zipWithIndex
      .map { case (c, j) => (j, c.toSeq) }.toSeq.toDF("cid", "cvec")
    val fast = corpus
      .select(col("id"), vecNearestCentroid(col("vec"), cents).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val slow = corpus.crossJoin(broadcast(
        centDf.select(col("cid"), col("cvec"), vecNorm(col("cvec")).as("cvn"))))
      .withColumn("sim",
        vecDot(col("vec"), col("cvec")) / (vecNorm(col("vec")) * col("cvn")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("sim").desc, col("cid").asc)))
      .where(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(fast === slow)

    // exact tie: duplicate centroid — first (lowest) index must win
    val dup = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0))
    val t = Seq((1L, Seq(2.0, 0.0))).toDF("id", "vec")
      .select(vecNearestCentroid(col("vec"), dup)).head().getInt(0)
    assert(t === 0)
    // zero-norm corpus vector → all sims NaN → NaN sorts first, ties to
    // the lowest index (the Spark descending-order rule)
    val z = Seq((1L, Seq(0.0, 0.0))).toDF("id", "vec")
      .select(vecNearestCentroid(col("vec"), dup)).head().getInt(0)
    assert(z === 0)
    // null vector / null element / no dimension match → null
    val dirty = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, null), Row(2L, Seq(1.0, null)), Row(3L, Seq(1.0, 2.0, 3.0)))
        .map(r => Row(r.get(0), r.get(1)))),
      StructType(Seq(StructField("id", LongType),
        StructField("vec", ArrayType(DoubleType, containsNull = true)))))
    val d = dirty.select(vecNearestCentroid(col("vec"), dup)).collect()
    assert(d.forall(_.isNullAt(0)))
    // assignClusters end-to-end: maps index back to the cid values
    val asg = graft.pipeline.Similarity
      .assignClusters(corpus, "id", "vec", centDf, "cid", "cvec")
      .select("id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asg === slow)
  }

  test("native expressions stay inside whole-stage codegen") {
    val df = floatDf.select(vecDot(col("a"), col("b")).as("d"))
    val p = df.queryExecution.executedPlan
    // the projection containing graft_array_dot must sit inside a
    // whole-stage-codegen span (the `*(n)` prefix in the plan string) —
    // the entire point of the native expression
    val s = p.toString
    val projLine = s.linesIterator.find(_.contains("graft_array_dot")).getOrElse("")
    assert(projLine.contains("*("), s"projection not codegen'd:\n$s")
    df.collect() // and the generated code must actually compile/run
  }
}
