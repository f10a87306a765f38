package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for every left row, the single nearest right row at or
  * before it (backward) or at or after it (forward) in the same key group
  * — the standard event-history enrichment operator (DuckDB `ASOF JOIN`,
  * pandas `merge_asof`, kdb `aj`). Spark has no native form, and the naive
  * formulations don't scale: a range theta-join degenerates to
  * BroadcastNestedLoopJoin, and a per-left-row correlated subquery is a
  * full right-scan per row.
  *
  * This is the one-shuffle union formulation instead: tag right rows
  * side 0 and left rows side 1, union them, and run ONE running
  * `last(right_payload, ignoreNulls)` window per key ordered by
  * (time, side) — ascending for backward, descending time for forward.
  * Each key group is sorted once; cost is a single shuffle of |L|+|R|
  * rows on the key columns — no pair explosion, and AQE's skew split
  * applies to the one exchange. Equal timestamps: the right row sorts
  * before the left (side 0 < 1), so an exactly-simultaneous right row IS
  * matched — the `l.t >= r.t` / `l.t <= r.t` convention of DuckDB/pandas.
  * Several right rows at one timestamp resolve deterministically by
  * `tieCols` order (pass an id column).
  */
object AsofJoin {

  sealed trait Direction
  object Direction {

    /** Match the latest right row with `right.time <= left.time`. */
    case object Backward extends Direction

    /** Match the earliest right row with `right.time >= left.time`. */
    case object Forward extends Direction
  }

  /** @param left      probe side — every row appears exactly once in the output
    * @param right     history side being matched
    * @param on        equality key columns (present in both frames)
    * @param timeCol   ordering column (same name and comparable type in both)
    * @param direction [[Direction.Backward]] (default) or [[Direction.Forward]]
    * @param tolerance max |left.time − right.time| for a match to count
    *                  (in the time column's own units — pass epoch
    *                  micros/millis for timestamps stored as longs);
    *                  matches farther away become nulls, like pandas
    *                  merge_asof's `tolerance`
    * @param tieCols   right-side tiebreak order within an equal timestamp
    * @param prefix    prefix for the matched right payload columns (null
    *                  when nothing matches)
    * @return all left columns, plus each non-key right column as
    *         `prefix + name`
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      timeCol: String,
      direction: Direction = Direction.Backward,
      tolerance: Option[Long] = None,
      tieCols: Seq[String] = Seq.empty,
      prefix: String = "asof_"
  ): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one key column")
    val payload = right.columns.filterNot(on.contains).toSeq
    val lType   = StructType(left.schema.fields.filterNot(f => on.contains(f.name)))
    val rType   = StructType(right.schema.fields.filterNot(f => on.contains(f.name)))
    val lRest   = left.columns.filterNot(on.contains).toSeq

    val l = left.select(
      on.map(col) ++ Seq(
        col(timeCol).as("__asof_t"),
        lit(1).as("__asof_side"),
        struct(lRest.map(col): _*).as("__asof_l"),
        lit(null).cast(rType).as("__asof_r")
      ): _*
    )
    val r = right.select(
      on.map(col) ++ Seq(
        col(timeCol).as("__asof_t"),
        lit(0).as("__asof_side"),
        lit(null).cast(lType).as("__asof_l"),
        struct(payload.map(col): _*).as("__asof_r")
      ): _*
    )

    val timeOrder = direction match {
      case Direction.Backward => col("__asof_t").asc
      case Direction.Forward  => col("__asof_t").desc
    }
    val order = Seq(timeOrder, col("__asof_side").asc) ++
      tieCols.map(c => col("__asof_r").getField(c).asc_nulls_first)
    val w = Window
      .partitionBy(on.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedRaw = last(col("__asof_r"), ignoreNulls = true).over(w)
    val matched = tolerance match {
      case None => matchedRaw
      case Some(tol) =>
        val gap = direction match {
          case Direction.Backward => col("__asof_t") - matchedRaw.getField(timeCol)
          case Direction.Forward  => matchedRaw.getField(timeCol) - col("__asof_t")
        }
        when(gap <= tol, matchedRaw)
    }

    l.unionByName(r)
      .withColumn("__asof_m", matched)
      .where(col("__asof_side") === 1)
      .select(
        on.map(col) ++
          lRest.map(c => col("__asof_l").getField(c).as(c)) ++
          payload.map(c => col("__asof_m").getField(c).as(prefix + c)): _*
      )
  }

  /** Backward as-of join — see [[asof]]. */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      timeCol: String,
      tieCols: Seq[String] = Seq.empty,
      prefix: String = "asof_"
  ): DataFrame = asof(left, right, on, timeCol, Direction.Backward, None, tieCols, prefix)

  /** Forward as-of join — see [[asof]]. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      timeCol: String,
      tieCols: Seq[String] = Seq.empty,
      prefix: String = "asof_"
  ): DataFrame = asof(left, right, on, timeCol, Direction.Forward, None, tieCols, prefix)
}
