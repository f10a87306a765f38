package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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
    // Measured and REJECTED (r16): fanning the map side out
    // ([[graft.plans.Lineage.fanOutSmall]]) before this multi-aggregate
    // made the profile SLOWER (paired A/B: q_profile_hll 2.60 -> 3.14 s)
    // — exact count-distinct partials cannot pre-reduce unique keys, so
    // the added repartition shuffle + N-way distinct hash maps cost more
    // than the serial scan they replaced. Unlike the shingle/MinHash
    // passes (whose per-row UDF work dwarfs a narrow shuffle), this map
    // side is cheap per row; leave the scan's own parallelism alone.
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*).head
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

  /** Top-k frequent terms via a MERGEABLE Misra-Gries sketch — the
    * bounded-memory answer to "what are the heaviest tokens in 100 TB of
    * text" when an exact `GROUP BY term` would shuffle the full token
    * stream. Memory is `capacity` entries per partition summary and per
    * merge, whatever the corpus size.
    *
    * Sketch contract (classic Misra-Gries): estimates never OVERcount;
    * each estimate undercounts by at most the summary's total decrement,
    * reported as `err_bound` on every output row. Any term with true
    * frequency > err_bound is guaranteed present in the summary. When
    * `err_bound = 0` the sketch never evicted and the counts are EXACT —
    * the regime the correctness gate pins (fixture vocabulary ≪ capacity),
    * the same exact-below/approx-above split as [[DistinctMode.Auto]].
    *
    * Merge rule (Agarwal et al., "Mergeable Summaries"): sum summaries
    * termwise; if over capacity, subtract the (capacity+1)-th largest
    * count from every entry and drop the non-positives — error bounds
    * add. Execution shape: one `mapPartitions` pass building a per-
    * partition summary (tight hash-map kernel — the token stream never
    * shuffles), then a `treeReduce` of capacity-bounded maps (driver
    * receives ONE summary of ≤ capacity entries; log-depth combining
    * keeps any single reduce O(capacity)). Ties in the final top-k break
    * by term so reruns and the SQL oracle agree bit-for-bit.
    */
  def heavyHitterTerms(
      df: DataFrame,
      textCol: String,
      topK: Int,
      capacity: Int = 1 << 16
  ): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(capacity >= topK, s"capacity ($capacity) must be >= topK ($topK)")
    val spark = df.sparkSession
    import spark.implicits._

    type Summary = (Map[String, Long], Long) // (term -> est, total decrement)

    def shrink(m: scala.collection.mutable.HashMap[String, Long], dec: Long): Summary =
      if (m.size <= capacity) (m.toMap, dec)
      else {
        // (capacity+1)-th largest count; subtracting it keeps <= capacity
        // entries (everything at or below it zeroes out).
        val cut = m.valuesIterator.toArray.sortBy(-_).apply(capacity)
        (m.iterator.collect { case (t, c) if c > cut => t -> (c - cut) }.toMap, dec + cut)
      }

    def merge(a: Summary, b: Summary): Summary = {
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      a._1.foreach { case (t, c) => m.update(t, c) }
      b._1.foreach { case (t, c) => m.update(t, m.getOrElse(t, 0L) + c) }
      shrink(m, a._2 + b._2)
    }

    val summaries = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .as[String]
      .rdd
      .mapPartitions { it =>
        val m   = scala.collection.mutable.HashMap.empty[String, Long]
        var dec = 0L
        it.foreach { t =>
          if (m.contains(t) || m.size < 2 * capacity) m.update(t, m.getOrElse(t, 0L) + 1L)
          else {
            // Batch-evict down to `capacity` (amortizes the O(size) scan
            // over `capacity` inserts instead of paying it per token).
            val s = shrink(m, dec); dec = s._2
            m.clear(); s._1.foreach { case (k, v) => m.update(k, v) }
            m.update(t, 1L)
          }
        }
        Iterator.single(shrink(m, dec))
      }
    val (finalMap, errBound) =
      if (summaries.isEmpty()) (Map.empty[String, Long], 0L)
      else summaries.treeReduce(merge)
    finalMap.toSeq
      .sortBy { case (t, c) => (-c, t) }
      .take(topK)
      .map { case (t, c) => (t, c, errBound) }
      .toDF("term", "est_count", "err_bound")
  }

  /** Per-group z-score outlier flags with ALL-INTEGER arithmetic: a value
    * x is an outlier iff `(x − μ)² > z²·σ²`, tested as the cross-
    * multiplied integer inequality
    *
    *   `(n·x − S)² > z² · (n·Q − S²)`      (S = Σfp, Q = Σfp²)
    *
    * in the fixed-point domain `fp = floor(value·scale + 0.5)` — no
    * float mean, no float variance, no sqrt, so the verdict is bit-exact
    * on any engine and immune to summation order (the classic
    * cross-engine failure of stddev-based filters: Welford vs naive vs
    * partial-merge all round differently; an integer inequality cannot).
    * σ² here is the POPULATION variance (σ² = (n·Q − S²)/n²); a group
    * with zero variance flags nothing (rhs 0 ≥ lhs 0 fails strictly).
    *
    * The comparison runs in DECIMAL(38,0) (int128 on the oracle side):
    * the moment sums themselves are 64-bit (safe while `Σfp² < 2⁶³` —
    * |fp| ≤ 10⁶ holds past 10⁹ rows per group), but their PRODUCTS are
    * not — `(n·x − S)²` overflows a long at n·|fp| ≈ 3·10⁹, which a mere
    * ×10 soak of the events fixture reaches. 38 digits carry the
    * inequality to n ≈ 10¹² rows per group at |fp| ≤ 10⁶; both engines'
    * wide-integer arithmetic is exact, so the verdict still cannot
    * drift.
    *
    * Plan: one map-side-combinable aggregate for (n, S, Q) per group —
    * sums of fp and fp² — then the (tiny) moments frame broadcasts back
    * onto the scan; the flag itself is scan-local arithmetic.
    *
    * @return the input columns + `fp` (LONG) + `is_outlier` (BIGINT 0/1)
    */
  def zScoreOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      scale: Long = 100,
      z: Int = 3): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(scale > 0 && z > 0, s"scale and z must be positive, got scale=$scale z=$z")
    val withFp = df.withColumn(
      "fp", floor(col(valueCol).cast("double") * scale + lit(0.5)).cast("long"))
    val moments = withFp
      .groupBy(groupCols.map(c => col(c).as(s"_m_$c")): _*)
      .agg(
        count(lit(1)).as("_n"),
        sum(col("fp")).as("_s"),
        sum(col("fp") * col("fp")).as("_q"))
    val cond = groupCols.map(c => withFp(c) <=> moments(s"_m_$c")).reduce(_ && _)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val (nD, sD, qD) = (col("_n").cast(dec), col("_s").cast(dec), col("_q").cast(dec))
    val lhs = nD * col("fp").cast(dec) - sD
    withFp
      .join(broadcast(moments), cond)
      .withColumn(
        "is_outlier",
        (lhs * lhs > lit(z.toLong * z).cast(dec) * (nD * qD - sD * sD)).cast("long"))
      .drop((Seq("_n", "_s", "_q") ++ groupCols.map(c => s"_m_$c")): _*)
  }

  /** Population Stability Index between two snapshots of a fixed-point
    * value column — the standard distribution-drift monitor (did this
    * week's corpus/metric shift against last week's?):
    *
    *   PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b)
    *
    * over `numBins` fixed-width bins with add-one smoothing (so an empty
    * bin on one side contributes a finite, honest penalty). Determinism
    * discipline: the per-bin contribution is ONE double expression
    * rounded to nano-units; the total is then an exact BIGINT sum of ≤
    * `numBins` terms. Returns one row per OCCUPIED bin (`bin`, `a_cnt`, `b_cnt`,
    * `contrib_nano`) so the DRIVER of drift is visible, not just its
    * size; sum `contrib_nano` for the scalar PSI. Plan: one union-tagged
    * aggregation over `numBins` keys + a broadcast totals row — two
    * scans, one tiny shuffle, no windows.
    */
  def psiFixedPoint(
      dfA: DataFrame,
      dfB: DataFrame,
      valueFpCol: String,
      binWidth: Long,
      numBins: Int
  ): DataFrame = {
    require(binWidth > 0 && numBins > 0, "binWidth and numBins must be positive")
    val tagged = dfA.select(psiBin(col(valueFpCol), binWidth, numBins).as("bin"), lit(1).as("_side"))
      .unionByName(dfB.select(psiBin(col(valueFpCol), binWidth, numBins).as("bin"), lit(2).as("_side")))
    val counts = tagged.groupBy("bin")
      .agg(
        sum(when(col("_side") === 1, 1L).otherwise(0L)).as("a_cnt"),
        sum(when(col("_side") === 2, 1L).otherwise(0L)).as("b_cnt"))
    psiFromCounts(counts, numBins)
  }

  /** [[psiFixedPoint]]'s fixed-width clamped histogram bin. Spark's `/`
    * on longs is DOUBLE division; floor() restores the integer quotient
    * exactly for any |value| < 2^53 (cents domain).
    */
  def psiBin(c: Column, binWidth: Long, numBins: Int): Column =
    least(floor(greatest(c.cast("long"), lit(0L)) / binWidth), lit(numBins.toLong - 1)).cast("long")

  /** [[psiFixedPoint]]'s contribution stage over pre-computed per-bin
    * counts (`bin`, `a_cnt`, `b_cnt`) — split out so a streaming monitor
    * can maintain the current-side counts incrementally (a Complete-mode
    * aggregation) and still share the exact add-one-smoothed nano-unit
    * math with the batch path.
    */
  def psiFromCounts(counts: DataFrame, numBins: Int): DataFrame = {
    val totals = counts.agg(sum("a_cnt").as("_ta"), sum("b_cnt").as("_tb"))
    val pA = (col("a_cnt") + 1).cast("double") / (col("_ta") + numBins)
    val pB = (col("b_cnt") + 1).cast("double") / (col("_tb") + numBins)
    counts
      .crossJoin(broadcast(totals))
      .withColumn("contrib_nano",
        floor((pA - pB) * (log(pA) - log(pB)) * 1e9 + lit(0.5)).cast("long"))
      .select("bin", "a_cnt", "b_cnt", "contrib_nano")
  }

  /** [[psiFromCounts]] per GROUP — the windowed monitor's contribution
    * stage: `counts` carries (`keys...`, `bin`, `a_cnt`, `b_cnt`) and each
    * key group gets its own smoothing totals, so every group's rows are
    * exactly what [[psiFromCounts]] would produce on that group alone.
    * The totals side is one row per group (windows-in-flight scale, not
    * data scale) — broadcast, no shuffle of `counts`.
    */
  def psiFromCountsKeyed(counts: DataFrame, keys: Seq[String], numBins: Int): DataFrame = {
    require(keys.nonEmpty, "use psiFromCounts for the unkeyed form")
    val totals = counts.groupBy(keys.map(col): _*)
      .agg(sum("a_cnt").as("_ta"), sum("b_cnt").as("_tb"))
    val pA = (col("a_cnt") + 1).cast("double") / (col("_ta") + numBins)
    val pB = (col("b_cnt") + 1).cast("double") / (col("_tb") + numBins)
    counts
      .join(broadcast(totals), keys)
      .withColumn("contrib_nano",
        floor((pA - pB) * (log(pA) - log(pB)) * 1e9 + lit(0.5)).cast("long"))
      .select((keys.map(col) ++ Seq(col("bin"), col("a_cnt"), col("b_cnt"), col("contrib_nano"))): _*)
  }
}
