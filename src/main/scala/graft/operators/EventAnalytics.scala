package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over an event log: ordered-sequence funnels
  * and cohort retention — the two queries every large event warehouse runs
  * daily, shaped so the fact table crosses the network once.
  *
  * Both operators key every intermediate on the user column, so Catalyst
  * plans ONE exchange on `user` and reuses that partitioning for every
  * subsequent window/aggregation/join stage (ReusedExchange /
  * same-partitioning no-op): at 100 TB the event log is shuffled once, and
  * everything after works on co-located per-user groups.
  */
object EventAnalytics {

  /** Ordered funnel: for each user, the FIRST time each stage was reached,
    * where stage i counts only at a strictly LATER timestamp than stage
    * i-1's first completion (the standard "first matching subsequence"
    * funnel semantics — a purchase before signup does not complete the
    * funnel).
    *
    * Implementation: a cascade of whole-partition window minimums
    * (`min(ts WHERE type = stage_i AND ts > t_{i-1}) OVER (PARTITION BY
    * user)`), one per stage, then a per-user collapse. Every window shares
    * the same partition spec with no ordering, so the plan is one
    * Exchange + one Sort feeding k stacked Window nodes — stage count
    * changes CPU per row, never shuffle volume. The cascade cannot be one
    * associative aggregate (t_i depends on t_{i-1}), which is why it is
    * windows over a single partitioning rather than k self-joins.
    *
    * @param events  event rows
    * @param userCol grouping key
    * @param tsCol   LONG event time (any fixed unit; output stays in it)
    * @param typeCol event-type string column
    * @param stages  ordered stage names (funnel steps)
    * @return one row per user: `userCol`, `t1..tN` (first completion time
    *         per stage, null once the cascade breaks), `stage_reached`
    *         (BIGINT 0..N)
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val w = Window.partitionBy(userCol)
    var cur = events.select(col(userCol), col(tsCol).cast("long").as("_ts"), col(typeCol).as("_ty"))
    stages.zipWithIndex.foreach { case (st, i) =>
      val gate =
        if (i == 0) col("_ty") === st
        else col("_ty") === st && col(s"t$i").isNotNull && col("_ts") > col(s"t$i")
      cur = cur.withColumn(s"t${i + 1}", min(when(gate, col("_ts"))).over(w))
    }
    val tCols = stages.indices.map(i => s"t${i + 1}")
    // Folded inner-out: the LAST-wrapped branch (deepest stage) tests
    // first, so reaching stage i+1 wins over the always-non-null t_i.
    val reached = stages.indices
      .foldLeft(lit(0L)) { (acc, i) => when(col(s"t${i + 1}").isNotNull, lit((i + 1).toLong)).otherwise(acc) }
    val aggCols = tCols.map(c => min(col(c)).as(c)) // constant within the group
    cur
      .groupBy(col(userCol))
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("stage_reached", reached)
  }

  /** Slowly-changing-dimension Type-2 build: turn a change log (one row
    * per observed state of a key) into VALIDITY INTERVALS — each change
    * row becomes `[valid_from, valid_to]` with `valid_to` = the instant
    * before the key's next change (null while current). The standard
    * warehouse dimension shape that [[AsofJoin]] then serves point-in-time
    * lookups against.
    *
    * One shuffle: a single `lead` window over (key, ts, tie). `tieCol`
    * must be per-key unique (an id) so same-timestamp changes order
    * deterministically — the intervals it produces for a ts tie are
    * zero-length for all but the last change at that instant, which is
    * exactly "last write wins at the same timestamp" and replayable.
    *
    * @return input columns + `valid_from` (= tsCol), `valid_to` (null for
    *         the current row), `is_current` (BIGINT 0/1)
    */
  def scd2(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("valid_from", col(tsCol).cast("long"))
      .withColumn("valid_to", lead(col(tsCol).cast("long"), 1).over(w) - 1)
      .withColumn("is_current", col("valid_to").isNull.cast("long"))
  }

  /** Cohort retention: users bucketed by the period of their FIRST
    * activity (the cohort), counted as active per later period offset.
    * Periods are integer floor-divisions of the time column, so the
    * bucketing is exact at any unit.
    *
    * Plan: distinct (user, period) first — the only stage that sees raw
    * event volume, map-side-combinable — then the per-user first-period
    * aggregate and the join back both reuse the user partitioning; the
    * final (cohort, offset) aggregate works on |users| × |periods| rows at
    * most.
    *
    * @return `cohort_period, period_offset, n_active` (all BIGINT)
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      periodLength: Long): DataFrame = {
    require(periodLength > 0, s"periodLength must be positive, got $periodLength")
    val act = events
      .select(col(userCol).as("_u"), expr(s"$tsCol div $periodLength").as("_p"))
      .distinct()
    val first = act.groupBy(col("_u")).agg(min(col("_p")).as("cohort_period"))
    act
      .join(first, "_u")
      .groupBy(col("cohort_period"), (col("_p") - col("cohort_period")).as("period_offset"))
      .agg(count_distinct(col("_u")).as("n_active"))
  }

  /** Time-series resample + forward fill: per key, one row per period
    * between that key's first and last active period, value carried
    * forward across the gaps (last-observation-carried-forward — the
    * standard densification a downstream model or join expects from an
    * irregular event stream).
    *
    * Scale shape, stage by stage: (1) the ONLY pass over raw events is
    * the (key, period) aggregation — map-side combinable, the exchange
    * carries at most keys × active-periods rows — and its result
    * MATERIALIZES ([[graft.plans.Lineage.truncate]]): the aggregate
    * feeds two downstream branches (spans and the grid join) whose
    * column pruning de-unifies the plans, so without materialization
    * exchange reuse misses and the raw log is scanned per branch —
    * exactly the cost this operator exists to avoid (PlanAuditSpec pins
    * zero raw-source rescans in the serving plan); (2) key spans are a
    * second aggregation of the materialized frame (key-partitioned);
    * (3) the dense grid is `explode(sequence(first, last))` — generated
    * scan-local from the span row, never shuffled as raw events; (4) the
    * grid left-joins the period aggregates and (5) one window pass per
    * key in period order carries values forward. Everything after stage
    * 1 works on the aggregated domain, so a 100 TB event log costs one
    * aggregation plus keys × span bookkeeping.
    *
    * Span contract: the grid covers [min period, max period] PER KEY (no
    * global span — a key active for a week doesn't get a year of rows;
    * at 10⁶ keys × 10³ periods the grid is 10⁹ rows either way, so the
    * per-key span is also the smaller output). The first period of every
    * key has events by construction, so the fill never sees a leading
    * NULL.
    *
    * @return (key, period LONG, <valueCol> filled, n_events LONG — 0 on
    *         gap rows)
    */
  def resampleFill(
      events: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: Column,
      periodLength: Long
  ): DataFrame = {
    require(periodLength > 0, s"periodLength must be positive, got $periodLength")
    // Integer `div`, not float division-then-cast: the period index must
    // floor exactly (matches the oracle's `//`).
    val agg = graft.plans.Lineage.truncate(
      events
        .groupBy(col(keyCol), expr(s"CAST($timeCol AS BIGINT) div $periodLength").as("period"))
        .agg(sum(valueCol).as("_val"), count(lit(1)).as("n_events")))
    val spans = agg.groupBy(col(keyCol))
      .agg(min(col("period")).as("_p0"), max(col("period")).as("_p1"))
    val grid = spans.select(
      col(keyCol),
      explode(sequence(col("_p0"), col("_p1"))).as("period"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy("period")
    grid
      .join(agg, Seq(keyCol, "period"), "left")
      .select(
        col(keyCol),
        col("period"),
        last(col("_val"), ignoreNulls = true).over(w).as("value"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Time-weighted average over IRREGULAR observations, integer-exact:
    * each value holds until the key's next observation (classic TWAP /
    * step-function integral), so
    *
    *   twap = Σ valueFp·Δt / Σ Δt
    *
    * with Δt = next event's timestamp − this one's (the key's LAST
    * observation carries no weight — there is no interval it covers).
    * Everything INCLUDING the final quotient is BIGINT: `twap_fp` is the
    * integer `Σvw div Σdt` in the input's own fixed-point unit (a
    * pre-scaled milli variant would overflow — value·Δt·1000 can exceed
    * 2⁶³ on long spans — and a double division is inexact past 2⁵³; the
    * weighted sum and duration are emitted alongside for callers wanting
    * finer quotients). One key-window shuffle (the `lead`), one
    * aggregation.
    */
  def twap(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueFpCol: String,
      tieCols: Seq[String] = Nil
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Equal timestamps need a total order: which member of a tie group is
    // "last" decides whose value weights the gap to the next distinct ts.
    val w = Window.partitionBy(keyCol).orderBy((tsCol +: tieCols).map(col): _*)
    events
      .withColumn("_tw_next", lead(col(tsCol), 1).over(w))
      .where(col("_tw_next").isNotNull)
      .withColumn("_tw_dt", col("_tw_next") - col(tsCol))
      .groupBy(keyCol)
      .agg(
        sum(col(valueFpCol).cast("long") * col("_tw_dt")).as("weighted_sum"),
        sum(col("_tw_dt")).as("duration"))
      .withColumn("twap_fp", expr("weighted_sum div duration"))
  }

  /** Rolling per-key outlier monitor, INTEGER-exact: each event is tested
    * against the `lookback` PRECEDING events of its key (current row
    * excluded — no self-leakage), flagging when its deviation exceeds
    * `zThreshold` standard deviations. The z-test is algebraically
    * cleared of division and sqrt so it evaluates entirely in BIGINTs
    * from window sums of the fixed-point value:
    *
    *   (v·n − S₁)²  >  z² · (n·S₂ − S₁²)
    *
    * (both sides n²·var-scaled; S₁/S₂ = rolling sum / sum of squares).
    * No floating point anywhere → engine-exact, partition-order-proof.
    * Rows with fewer than `minPoints` predecessors are never flagged
    * (cold start). One shuffle (the key window).
    */
  def rollingOutliers(
      events: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueFpCol: String,
      lookback: Int = 10,
      minPoints: Int = 5,
      zThreshold: Int = 3
  ): DataFrame = {
    require(lookback >= minPoints && minPoints >= 2, "need lookback >= minPoints >= 2")
    require(zThreshold >= 1, "zThreshold must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-lookback, -1)
    val v  = col(valueFpCol).cast("long")
    val n  = count(lit(1)).over(w)
    val s1 = sum(v).over(w)
    val s2 = sum(v * v).over(w)
    events
      .withColumn("_ro_n", n)
      .withColumn("_ro_dev2", (v * col("_ro_n") - s1) * (v * col("_ro_n") - s1))
      .withColumn("_ro_nvar", col("_ro_n") * s2 - s1 * s1)
      .withColumn("is_outlier",
        col("_ro_n") >= minPoints &&
          col("_ro_dev2") > lit(zThreshold.toLong * zThreshold) * col("_ro_nvar"))
      .drop("_ro_n", "_ro_dev2", "_ro_nvar")
  }
}
