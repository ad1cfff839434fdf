package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Batch event-analytics operators over (user, timestamp, type) streams —
 * the funnel/cohort queries an events warehouse answers daily, expressed
 * as the joins/aggregates Catalyst optimizes rather than per-user UDFs.
 * (Beyond-reference surface, same rationale as
 * [[graft.pipeline.TextAnalysis]]: deterministic, scale-out analytics
 * complementing the reference's graph workloads.)
 */
object EventOps {

  /**
   * Ordered funnel completion: for each step k, the number of users with
   * an ordered event chain type₁ < type₂ < … < type_k (strictly
   * increasing timestamps, earliest-completion semantics: each prefix
   * completes at the EARLIEST possible time, which maximizes the chance
   * of completing the suffix — the standard funnel definition). Returns
   * (step_no 1-based, step, users), one row per step.
   *
   * Shape: one filtered min-aggregate per step over the events table —
   * k small (funnels are 3-6 steps), each pass shuffles only (user, ts).
   * No per-user collect, no window over the whole stream.
   */
  def funnel(events: DataFrame, userCol: String, tsCol: String, typeCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events.select(col(userCol).as("u"), col(tsCol).as("ts"),
      col(typeCol).as("t"))
    // reached(k): (u, tk) = earliest completion time of the step-k prefix.
    // Each step is checkpointed so step k never re-runs steps 1..k-1
    // (the count and the next step's join both read materialized rows).
    var reached = ev.where(col("t") === steps.head)
      .groupBy("u").agg(min(col("ts")).as("tk"))
      .localCheckpoint(true)
    var counts = List((1, steps.head, reached.count()))
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      reached = ev.where(col("t") === s)
        .join(reached, Seq("u"))
        .where(col("ts") > col("tk"))
        .groupBy("u").agg(min(col("ts")).as("tk"))
        .localCheckpoint(true)
      counts ::= ((i + 1, s, reached.count()))
    }
    counts.reverse.toDF("step_no", "step", "users")
  }

  /**
   * Weekly cohort retention: users grouped by the week of their first
   * event; each (cohort_week, week_offset) cell counts the cohort's
   * users active in that later week. Returns (cohort_week DATE,
   * week_offset INT, users), offset 0 = the cohort week itself.
   *
   * Shape: one min-aggregate for first-touch, one (user, week) distinct,
   * one grouped count — three shuffles on user/cohort keys, nothing
   * quadratic.
   */
  def weeklyRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val ev = events.select(col(userCol).as("u"),
      to_date(date_trunc("week", col(tsCol))).as("w"))
    val cohort = ev.groupBy("u").agg(min(col("w")).as("cw"))
    ev.distinct()
      .join(cohort, Seq("u"))
      .groupBy(col("cw").as("cohort_week"),
        (datediff(col("w"), col("cw")) / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("users"))
  }
}
