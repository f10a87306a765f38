package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped quantiles by VALUE HISTOGRAM — the distributed form of
  * per-group percentiles.
  *
  * Spark's built-in exact `percentile` aggregate buffers every raw value
  * per group in the aggregation buffer: the shuffle carries the whole
  * column and a hot group concentrates its entire value set in one task's
  * memory — the same wall `TextAnalysis.integerPercentileCutoff` documents
  * for the global case. This operator instead works in a caller-chosen
  * fixed-point domain (`fp = floor(value·scale + 0.5)`), where the value
  * histogram is a map-side-combinable `count` per (group, fp): the
  * exchange carries at most |groups| × |distinct fp| rows no matter how
  * many input rows exist, and everything after the histogram works on the
  * REDUCED frame. Quantiles over the fixed-point domain are EXACT (no
  * sketch, no interpolation): the k-th order statistic is read off the
  * cumulative histogram.
  *
  * Quantile contract (oracle-replayable, interpolation-free):
  * `q` of `n` values = the k-th smallest fp with `k = max(1, ceil(q·n))`,
  * `q·n` computed in IEEE double on both engines (bit-identical product,
  * so the ceil boundary cannot diverge).
  *
  * Plan: histogram aggregate (shuffle 1, partial/final) → re-key the
  * REDUCED histogram to group partitioning (shuffle 2, |groups × fp|
  * rows) for the cumulative window + the per-group collapse, which share
  * that partitioning (no further exchange; PlanAuditSpec pins 2 total).
  */
object Quantiles {

  /** @param df        input rows
    * @param groupCols grouping keys
    * @param valueCol  numeric column (any type castable to double)
    * @param scale     fixed-point multiplier (100 = cents for 2-decimal
    *                  money; pick the precision the domain carries)
    * @param qs        (output column name, quantile in (0, 1]) pairs
    * @return per group: keys, `n` (value count), one LONG fp column per
    *         requested quantile
    */
  def groupedExact(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      scale: Long,
      qs: Seq[(String, Double)]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(scale > 0, s"scale must be positive, got $scale")
    require(qs.nonEmpty, "need at least one quantile")
    qs.foreach { case (n, q) => require(q > 0 && q <= 1, s"quantile $n=$q outside (0, 1]") }
    val keys = groupCols.map(col)
    val hist = df
      .select(keys :+ floor(col(valueCol).cast("double") * scale + lit(0.5)).cast("long").as("_fp"): _*)
      .groupBy((groupCols :+ "_fp").map(col): _*)
      .agg(count(lit(1)).as("_c"))
    val wCum = Window.partitionBy(keys: _*).orderBy(col("_fp"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    val cum = hist
      .withColumn("_cum", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(wAll))
    val qAggs: Seq[Column] = qs.map { case (name, q) =>
      min(when(col("_cum") >= greatest(lit(1L), ceil(lit(q) * col("_n"))), col("_fp"))).as(name)
    }
    cum
      .groupBy(keys: _*)
      .agg(max(col("_n")).as("n"), qAggs: _*)
  }
}
