package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-join reduction via a broadcast Bloom filter — the "runtime filter"
  * a 100 TB fact-side shuffle join needs when only a sliver of the fact
  * table will survive the join.
  *
  * A shuffled equi-join moves BOTH sides through the exchange before a
  * single probe happens; when the dimension side is selective (a filtered
  * date range, a sampled key set), almost all of those fact bytes are
  * shuffled only to be dropped at the probe. Spark's own optimizer injects
  * exactly this reduction (`spark.sql.optimizer.runtime.bloomFilter.enabled`,
  * on by default since 3.5 and left on here) — but only when its
  * heuristics see a selective scan-level filter on the creation side. When
  * the small side is the OUTPUT of an aggregation, a dedup, or an operator
  * pipeline (every "survivor keys" frame this library produces), the
  * injection never fires; [[bloomPrunedJoin]] is the explicit form for
  * those plans.
  *
  * Mechanics: the small side's join keys are collapsed to one 64-bit
  * `xxhash64` each and collected into a driver-built Bloom filter
  * (`DataFrameStatFunctions.bloomFilter` — an aggregate over the small
  * side, NOT a row collect; only the fixed-size bit array reaches the
  * driver). The broadcast filter then prunes the big side SCAN-LOCAL —
  * below the exchange, so shuffle volume drops to (matching fraction +
  * fpp) of the fact table BEFORE any network move. The join that follows
  * discards the false positives, so the result is row-for-row the plain
  * join (`BloomJoinSpec` pins both the identity and the filter's
  * position under the exchange).
  *
  * Key hashing: compound keys hash as one tuple (`xxhash64(k1, k2, …)`
  * on both sides). An xxhash64 collision only ever ADDS a false positive
  * — membership answers stay one-sided — so correctness is unconditional.
  *
  * Join types: pruning deletes big-side rows that cannot match, which is
  * only sound when unmatched big-side rows are absent from the result —
  * `inner` and `left_semi` (big side left). An outer/anti form would need
  * the dropped rows back; refuse rather than silently corrupt.
  *
  * Sizing: `expectedItems` defaults to a `count()` of the small side (one
  * cheap job — the side is small by contract); pass it explicitly when
  * the caller already knows the cardinality. The filter's size is
  * O(expectedItems · ln(1/fpp)) bits — ~1.2 MB per million keys at 1%
  * fpp, broadcast once per executor like any dimension broadcast.
  */
object BloomJoin {

  def bloomPrunedJoin(
      big: DataFrame,
      small: DataFrame,
      keyCols: Seq[String],
      joinType: String = "inner",
      fpp: Double = 0.01,
      expectedItems: Option[Long] = None
  ): DataFrame = {
    require(keyCols.nonEmpty, "need at least one join key column")
    require(
      joinType == "inner" || joinType == "left_semi" || joinType == "leftsemi",
      s"bloomPrunedJoin: joinType '$joinType' keeps unmatched big-side rows the pruning deletes; " +
        "use inner or left_semi (or a plain join)")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val spark = big.sparkSession
    val keyed = small.select(xxhash64(keyCols.map(col): _*).as("__graft_bloom_key"))
    val n     = expectedItems.getOrElse(keyed.count())
    val bloom = keyed.stat.bloomFilter("__graft_bloom_key", math.max(n, 1L), fpp)
    val bc    = spark.sparkContext.broadcast(bloom)
    val might = udf((h: Long) => bc.value.mightContainLong(h))
    val pruned = big.where(might(xxhash64(keyCols.map(col): _*)))
    pruned.join(small, keyCols, joinType)
  }
}
