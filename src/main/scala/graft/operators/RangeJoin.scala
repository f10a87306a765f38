package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned interval join (point-in-interval): every left POINT row paired
  * with every right INTERVAL row sharing the equality keys whose
  * half-open range contains it (`start <= point < end`).
  *
  * Spark plans the naive theta formulation (`p >= s AND p < e` with or
  * without equality keys) as a sort-merge on the keys followed by a
  * per-key-group pair scan — and with low-cardinality keys or none at
  * all it degenerates to BroadcastNestedLoopJoin, O(|L|·|R|) pair
  * evaluations. This is the standard binning decomposition instead
  * (the "bucketized interval join" every scale engine ships): each
  * interval EXPLODES into the fixed-width bins it overlaps, each point
  * computes its ONE bin, and the join becomes a plain equi-join on
  * `(keys..., bin)` plus an exact containment filter. A point lies in
  * exactly one bin and an interval covers that bin at most once, so pair
  * multiplicity is exact — no post-join dedup.
  *
  * Cost model: the interval side grows by `avg(width)/binWidth + 1`
  * exploded rows; both sides pay one shuffle on `(keys, bin)` (AQE skew
  * split applies — a hot bin is an ordinary hot join key here, where the
  * nested-loop formulation gives AQE nothing to split). Choose `binWidth`
  * near the TYPICAL interval width: much smaller explodes the build side,
  * much larger turns the bin into a weak prefilter and the containment
  * filter does the work pair-by-pair.
  *
  * Domain: point/start/end must be integer-typed (epoch micros/millis as
  * longs — the fixture convention). The bin is computed with exact
  * integer floor division (`(v - pmod(v, w)) / w`), correct for negative
  * values too — a double-based `floor(v/w)` would lose exactness past
  * 2^53.
  */
object RangeJoin {

  // (v - pmod) is exactly divisible, so integral `div`'s toward-zero
  // truncation never engages — this IS floor division, all-integer
  // (Column `/` is DOUBLE division: inexact past 2^53, e.g. epoch nanos).
  private def floorDiv(v: Column, w: Long): Column =
    call_function("div", v - pmod(v, lit(w)), lit(w))

  /** @param points    left side; each row joins the intervals containing it
    * @param intervals right side; `[startCol, endCol)` half-open; rows with
    *                  `end <= start` are empty and match nothing
    * @param on        equality key columns present in both frames
    * @param pointCol  integer point column on `points`
    * @param startCol  integer inclusive start on `intervals`
    * @param endCol    integer exclusive end on `intervals`
    * @param binWidth  bin size in the domain's own units
    * @return all columns of both frames (equality keys once), one row per
    *         qualifying (point, interval) pair
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      on: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(on.nonEmpty, "need at least one equality key — a keyless interval join has no shuffle key")
    val binned = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("_graft_bin",
        explode(sequence(floorDiv(col(startCol), binWidth), floorDiv(col(endCol) - 1, binWidth))))
    points
      .withColumn("_graft_bin", floorDiv(col(pointCol), binWidth))
      .join(binned, on :+ "_graft_bin")
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_graft_bin")
  }

  /** Interval OVERLAP join: every left×right interval pair sharing the
    * equality keys whose half-open ranges intersect
    * (`max(start) < min(end)`). Same binning decomposition as
    * [[pointInInterval]], but interval×interval needs a multiplicity
    * guard: two long intervals can share MANY bins, and a plain bin
    * equi-join would emit the pair once per shared bin. The standard fix
    * (no post-join distinct — a distinct would shuffle the full pair
    * stream again): allocate each pair to exactly ONE bin, the bin of
    * `max(leftStart, rightStart)`. That bin is always among the shared
    * bins of an overlapping pair (the later-starting interval's first
    * bin, which the other interval must also cover to overlap), so the
    * filter `bin == floorDiv(greatest(starts))` keeps the pair exactly
    * once and exactness needs no dedup shuffle.
    *
    * Left columns keep their names; right columns arrive via the caller
    * renaming (both frames must share ONLY the `on` columns).
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(on.nonEmpty, "need at least one equality key — a keyless interval join has no shuffle key")
    def explodeBins(df: DataFrame, s: String, e: String): DataFrame =
      df.where(col(e) > col(s))
        .withColumn("_graft_bin", explode(sequence(floorDiv(col(s), binWidth), floorDiv(col(e) - 1, binWidth))))
    explodeBins(left, leftStart, leftEnd)
      .join(explodeBins(right, rightStart, rightEnd), on :+ "_graft_bin")
      .where(greatest(col(leftStart), col(rightStart)) < least(col(leftEnd), col(rightEnd)))
      .where(col("_graft_bin") === floorDiv(greatest(col(leftStart), col(rightStart)), binWidth))
      .drop("_graft_bin")
  }
}
