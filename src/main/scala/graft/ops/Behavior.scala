package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / product-analytics operators over an event or order
  * stream: cohort retention, Markov transition estimation, and the
  * ordered multi-step funnel. These are the batch analytics a BI reader
  * of the reference pipeline's `city_metrics` table asks next ("of the
  * riders who signed up in March, how many were still riding in June?",
  * "what do users do right after an error?") — the reference stops at
  * per-window counts (spark_jobs/streaming_job.py:117-125); these
  * operators answer the follow-ups from the same raw stream.
  *
  * Scale notes (100 TB posture):
  *  - every operator is one or two keyed shuffles over declarative
  *    aggregates — no windows over the whole corpus, no driver state;
  *  - per-user state (the funnel's per-step timestamp lists, the
  *    transition lag) is bounded by the fattest single user, the same
  *    bound sessionization and the streaming state store already accept;
  *  - outputs are tiny (cohort×offset grid, |types|² matrix, one row per
  *    funnel step), so every result is broadcast-joinable downstream.
  */
object Behavior {

  /** Months since epoch (year*12 + month-1) — integer algebra that both
    * engines compute identically, avoiding engine-specific interval or
    * date-diff semantics. */
  private def monthIdx(c: Column): Column =
    (year(c) * 12 + month(c) - 1).cast("int")

  /** Classic cohort retention: cohort = calendar month of the entity's
    * FIRST event; for each (cohort, month offset) the number of distinct
    * entities active in that month. Two shuffles: the (entity, month)
    * distinct, then the count grid; the cohort frame joins back on the
    * same entity key the distinct already partitioned by. Counts only —
    * exact at any scale. */
  def retentionCohort(df: DataFrame, entityCol: String, dateCol: String)
      : DataFrame = {
    val active = df
      .select(col(entityCol).as("__e"), monthIdx(col(dateCol)).as("__m"))
      .distinct()
    val cohort = active.groupBy(col("__e")).agg(min(col("__m")).as("__m0"))
    // `active` rows are already distinct per (entity, month), so the grid
    // count needs no countDistinct — a plain count is exact and keeps the
    // aggregate map-side combinable.
    active.join(cohort, "__e")
      .groupBy(col("__m0"), (col("__m") - col("__m0")).as("month_offset"))
      .agg(count(lit(1)).as("n_customers"))
      .select(
        floor(col("__m0") / 12).cast("int").as("cohort_year"),
        (col("__m0") % 12 + 1).cast("int").as("cohort_month"),
        col("month_offset").cast("int").as("month_offset"),
        col("n_customers"))
  }

  /** First-order Markov transition matrix over an ordered per-entity
    * event stream: counts of (previous type → next type) plus the
    * row-normalized probability. One window lag per entity (ordered by
    * time with the id as the total-order tiebreak, so tied timestamps
    * are deterministic), then a tiny |types|² aggregate; the probability
    * divides two exact longs, so it is bit-identical across engines. */
  def transitionMatrix(df: DataFrame, entityCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(idCol))
    val n = df
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val byPrev = Window.partitionBy(col("prev_type"))
    n.withColumn("p",
      col("n").cast("double") / sum(col("n")).over(byPrev).cast("double"))
  }

  /** Ordered multi-step funnel (e.g. signup → view → click → purchase):
    * per entity, step i counts as reached when some step-i event falls
    * STRICTLY after the earliest feasible completion time of step i-1.
    * Taking the MINIMUM feasible time at every step is the greedy that
    * maximizes completion (any completing assignment can be exchanged
    * step-by-step down to the earliest one), so "reached step i" is
    * well-defined, order-independent, and exact.
    *
    * One keyed shuffle: each entity aggregates one timestamp list per
    * step (bounded by that entity's own event count — the per-user bound
    * the session operators already accept), then the greedy chain is a
    * pure projection of array_min/filter over those lists, and the final
    * count collapses to one row per step. */
  def funnelSteps(df: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.size == steps.distinct.size,
      s"funnel steps must be non-empty and distinct: $steps")
    // collect_list skips the nulls the when() leaves on other types, so
    // each list holds exactly that step's timestamps for the entity.
    val aggs = steps.zipWithIndex.map { case (st, i) =>
      collect_list(when(col(typeCol) === lit(st), col(tsCol))).as(s"__a$i")
    }
    val perEntity = df.groupBy(col(entityCol)).agg(aggs.head, aggs.tail: _*)
    val withTimes = steps.indices.foldLeft(perEntity) { (d, i) =>
      val t =
        if (i == 0) array_min(col("__a0")) // empty list → null
        else array_min(filter(col(s"__a$i"), x => x > col(s"__t${i - 1}")))
      d.withColumn(s"__t$i", t)
    }
    // count() skips null step times, so c_i = entities reaching step i.
    val cnts = steps.indices.map(i => count(col(s"__t$i")).as(s"__c$i"))
    val one = withTimes.agg(cnts.head, cnts.tail: _*)
    val stackArgs = steps.zipWithIndex
      .map { case (st, i) => s"${i + 1}, '${st.replace("'", "''")}', __c$i" }
      .mkString(", ")
    one.selectExpr(
      s"stack(${steps.size}, $stackArgs) AS (step_idx, step, n_users)")
  }
}
