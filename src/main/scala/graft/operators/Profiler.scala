package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Single-pass data-quality profiling: per column, row/null/distinct counts
  * and min/max (rendered as strings so one result schema covers every
  * column type) — the first look anyone takes at an unfamiliar table.
  *
  * Scale shape: ONE aggregation job computes every column's stats together
  * (4·N aggregate expressions over one scan — map-side partial aggregation,
  * a single one-row result), then the driver pivots that row into
  * per-column records. Exact `countDistinct` is precise but each distinct
  * aggregate adds an expand + shuffle; HyperLogLog
  * (`approx_count_distinct`) keeps the whole profile a single map-side
  * pass. [[DistinctMode.Auto]] probes the row count (for file sources a
  * metadata-cheap job) and switches to HLL past the threshold — the same
  * auto-capacity-gating pattern as `Dedup.VerifyMode.Auto`.
  */
object Profiler {

  /** Strategy for the per-column distinct count. */
  sealed trait DistinctMode
  object DistinctMode {

    /** Exact `countDistinct` — N expand+shuffle aggregates. */
    case object Exact extends DistinctMode

    /** HyperLogLog `approx_count_distinct` — scan-local; `rsd` is the
      * target relative standard deviation (Spark's default 0.05; tighten
      * for profiles that feed downstream decisions — the HLL gate runs at
      * 0.01).
      */
    case class Approx(rsd: Double = 0.05) extends DistinctMode

    /** Exact below `maxExactRows` (probed with one `count()`), HLL above —
      * exact profiles on fixtures and small dims, single-pass HLL on the
      * 100 TB fact table, from the same call.
      */
    case class Auto(maxExactRows: Long = 50L * 1000 * 1000, rsd: Double = 0.05) extends DistinctMode
  }

  def profile(df: DataFrame, columns: Seq[String] = Seq.empty, mode: DistinctMode = DistinctMode.Auto()): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "nothing to profile")
    val approx: Option[Double] = mode match {
      case DistinctMode.Exact              => None
      case DistinctMode.Approx(rsd)        => Some(rsd)
      case DistinctMode.Auto(maxExact, rsd) => if (df.count() > maxExact) Some(rsd) else None
    }
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        approx.map(r => approx_count_distinct(col(c), r)).getOrElse(countDistinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c")
      )
    }
    val row   = df.agg(count(lit(1)).as("__n"), aggs: _*).head
    val total = row.getAs[Long]("__n")
    val out = cols.map { c =>
      Row(
        c,
        total,
        total - row.getAs[Long](s"__nn_$c"),
        row.getAs[Long](s"__nd_$c"),
        row.getAs[String](s"__mn_$c"),
        row.getAs[String](s"__mx_$c")
      )
    }
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(out: _*),
      StructType(Seq(
        StructField("column_name", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_nulls", LongType, nullable = false),
        StructField("n_distinct", LongType, nullable = false),
        StructField("min_value", StringType),
        StructField("max_value", StringType)
      ))
    )
  }

  /** Back-compat boolean form. */
  def profile(df: DataFrame, columns: Seq[String], approxDistinct: Boolean): DataFrame =
    profile(df, columns, if (approxDistinct) DistinctMode.Approx() else DistinctMode.Exact)
}
