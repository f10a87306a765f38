package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed (the
  * classic "one hot user/document melts one reducer" failure at 100 TB).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) already splits oversized SORT-MERGE partitions at runtime
  * — prefer it. Manual salting remains necessary when the skewed side
  * feeds an AGGREGATION or when the join strategy isn't sort-merge;
  * [[saltedJoin]] is that tool.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `keyCols` with the hot keys spread over
    * `salts` reducers: the big side gets a DETERMINISTIC salt derived from
    * `saltFrom` (any roughly-unique column — a PK, an event id), the small
    * side is replicated once per salt value, and the join key becomes
    * (keyCols..., salt). Row-for-row identical to the unsalted join; the
    * small side grows ×`salts` (keep it the dimension side).
    *
    * The salt is a pure column function — no rand(): task retries and
    * speculative duplicates salt identically, so results are stable under
    * at-least-once execution.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keyCols: Seq[String],
      saltFrom: String,
      salts: Int = 16,
      joinType: String = "inner"
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol = "__graft_salt"
    val b = big.withColumn(saltCol, pmod(xxhash64(col(saltFrom)), lit(salts.toLong)))
    val s = small.withColumn(saltCol, explode(sequence(lit(0L), lit(salts.toLong - 1))))
    b.join(s, keyCols :+ saltCol, joinType).drop(saltCol)
  }
}
