package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk auditing and enforcement over anonymized outputs — the QA
  * layer of the reference's domain (an anonymizer's output is only as good
  * as its re-identification risk). The reference itself transforms values
  * but never MEASURES the result (`/root/reference/simple-anonymizer` has
  * no risk check); these operators close that loop with the two standard
  * tabular-privacy criteria:
  *
  *  - '''k-anonymity''' (Sweeney 2002): every combination of
  *    quasi-identifier (QI) values must be shared by ≥ k rows, or an
  *    attacker who knows a subject's QIs narrows them to < k candidates.
  *  - '''l-diversity''' (Machanavajjhala 2007): within each QI group the
  *    SENSITIVE attribute must take ≥ l distinct values, or group
  *    membership alone leaks the sensitive value even at high k.
  *
  * Scale shape: the audit is ONE grouped aggregation over the QI columns —
  * `count` combines map-side, and the distinct-sensitive count is Spark's
  * two-phase partial-distinct plan, so the exchange carries at most
  * |QI groups| × |sensitive domain| rows, never the input. Enforcement
  * (suppression) joins the input against only the VIOLATING groups: in a
  * production pipeline that set is small (the point of suppression is that
  * few groups violate), so the join side broadcasts; a bounded probe
  * (`limit(maxBroadcastGroups + 1).count` — the sentinel pattern of
  * `TextAnalysis.integerPercentileCutoff`) detects the degenerate corpus
  * whose violating set is itself huge and falls back to a shuffled
  * hash join, result-identical (spec-pinned).
  */
object Privacy {

  /** Per-QI-group risk audit: group size (k-anonymity) and distinct
    * sensitive values (l-diversity), with 0/1 violation flags so the
    * output is a complete, hashable risk report.
    *
    * @param df           input rows
    * @param qiCols       quasi-identifier columns (the attacker's
    *                     background knowledge)
    * @param k            minimum acceptable group size
    * @param sensitiveCol sensitive-attribute column for l-diversity
    * @param l            minimum acceptable distinct sensitive values
    * @return one row per QI group: QIs, `group_size`, `sensitive_distinct`,
    *         `k_violation`, `l_violation` (BIGINT 0/1)
    */
  def kAnonymityAudit(
      df: DataFrame,
      qiCols: Seq[String],
      k: Int,
      sensitiveCol: String,
      l: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    df.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).as("group_size"),
        countDistinct(col(sensitiveCol)).as("sensitive_distinct"))
      .withColumn("k_violation", (col("group_size") < k).cast("long"))
      .withColumn("l_violation", (col("sensitive_distinct") < l).cast("long"))
  }

  /** Suppression enforcement: rows whose QI group has < k members get
    * every QI column nulled (full-domain suppression — the group becomes
    * indistinguishable from every other suppressed row), all other columns
    * pass through untouched. Output column ORDER is the input's.
    *
    * Plan: one grouped count over the QIs (map-side combinable) filtered
    * to violating groups, then an equi-join back on the QI columns. The
    * violating side broadcasts when a bounded count shows ≤
    * `maxBroadcastGroups` groups; past that the plain shuffled join runs
    * instead (identical rows — spec-pinned). `maxBroadcastGroups = 0`
    * forces the shuffled plan for tests/soaks.
    *
    * Null QI values in the INPUT are grouped SQL-GROUP-BY style (null is
    * its own group) and joined null-safely (`<=>`), so pre-suppressed rows
    * count toward — and stay consistent with — their own group.
    */
  def kAnonymize(
      df: DataFrame,
      qiCols: Seq[String],
      k: Int,
      maxBroadcastGroups: Int = 1 << 20): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    val violating = df
      .groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("_gsz"))
      .where(col("_gsz") < k)
      .select(qiCols.map(c => col(c).as(s"_v_$c")) :+ lit(1L).as("_viol"): _*)
    val smallEnough =
      maxBroadcastGroups > 0 &&
        violating.limit(maxBroadcastGroups + 1).count() <= maxBroadcastGroups
    val joinSide = if (smallEnough) broadcast(violating) else violating
    val cond = qiCols
      .map(c => df(c) <=> joinSide(s"_v_$c"))
      .reduce(_ && _)
    val qi = qiCols.toSet
    val outCols: Seq[Column] = df.columns.toSeq.map { c =>
      if (qi(c)) when(col("_viol").isNull, df(c)).as(c) else df(c)
    }
    df.join(joinSide, cond, "left").select(outCols: _*)
  }

  /** Ladder-search generalization to k-anonymity — FULL-DOMAIN recoding
    * (the OLA-style simplification): every QI column carries a ladder of
    * progressively coarser derivations (level 0 = finest), the whole table
    * steps the ladder TOGETHER, and the chosen level is the minimal one
    * whose QI groups all reach k. If even the coarsest level leaves
    * violations, the residue is suppressed by [[kAnonymize]] — the output
    * always satisfies k-anonymity over the emitted QI columns.
    *
    * Full-domain rather than local recoding deliberately: one level for
    * the whole table keeps the release's semantics uniform (every row's
    * `nation_gen` means the same thing), and the search is SQL-replayable
    * (the oracle re-derives the level with the same violation probes).
    *
    * Plan: the level search costs ONE scan, not one per level — every
    * level's QI tuple is exploded from each row (`array(struct(level 0
    * QIs), …)`) and a single grouped count builds ALL level histograms at
    * once (map-side combine absorbs the ×levels row inflation; the
    * exchange carries Σ-levels group counts). The histogram is
    * lineage-truncated once, so the per-level violation probes
    * (`limit(1)` existence checks) and the chosen level's violating-group
    * set are lookups against the materialized frame — the table itself is
    * touched exactly twice: histogram build, final projection. The
    * suppression join reuses the precomputed violating set (broadcast
    * under the same bounded probe as [[kAnonymize]], shuffled fallback
    * past it).
    *
    * @param ladders    per-QI (output name, level expressions
    *                   finest-first); shorter ladders saturate at their
    *                   last level. Levels must keep a consistent type per
    *                   column (the output schema cannot depend on the
    *                   data-chosen level).
    * @param sourceCols the raw columns the ladder expressions derive from —
    *                   DROPPED from the output (passing a fine-grained
    *                   source through beside its generalization would void
    *                   the whole release; the operator refuses to guess
    *                   which columns those are)
    * @return the remaining non-QI columns, the QI columns at the chosen
    *         level under their ladder names, `gen_level` (LONG), with
    *         residual violators suppressed
    */
  def generalizeToK(
      df: DataFrame,
      ladders: Seq[(String, Seq[Column])],
      sourceCols: Seq[String],
      k: Int,
      maxBroadcastGroups: Int = 1 << 20): DataFrame = {
    require(ladders.nonEmpty, "need at least one QI ladder")
    require(ladders.forall(_._2.nonEmpty), "every ladder needs at least one level")
    require(k >= 1, s"k must be >= 1, got $k")
    val names    = ladders.map(_._1)
    val maxLevel = ladders.map(_._2.size).max
    def qiAt(l: Int): Seq[Column] =
      ladders.map { case (n, lv) => lv(math.min(l, lv.size - 1)).as(n) }
    // All level histograms in one scan + one shuffle.
    val levelStructs = (0 until maxLevel).map(l =>
      struct(lit(l.toLong).as("_lvl") +: qiAt(l): _*))
    val hist = graft.plans.Lineage.truncate(
      df.select(explode(array(levelStructs: _*)).as("_e"))
        .select(col("_e._lvl").as("_lvl") +: names.map(n => col(s"_e.$n").as(n)): _*)
        .groupBy(col("_lvl") +: names.map(col): _*)
        .agg(count(lit(1)).as("_gsz")))
    def hasViolation(l: Int): Boolean =
      hist.where(col("_lvl") === l && col("_gsz") < k).limit(1).count() > 0
    val chosen = (0 until maxLevel).find(l => !hasViolation(l)).getOrElse(maxLevel - 1)
    val passthrough = df.columns.toSeq
      .filterNot(names.contains).filterNot(sourceCols.contains).map(df(_))
    val projected = df.select(
      passthrough ++ qiAt(chosen) :+ lit(chosen.toLong).as("gen_level"): _*)
    // Suppression join against the PRECOMPUTED violating set of the
    // chosen level — same groups kAnonymize would re-derive, without the
    // second aggregation over the table.
    val violating = hist
      .where(col("_lvl") === chosen && col("_gsz") < k)
      .select(names.map(n => col(n).as(s"_v_$n")) :+ lit(1L).as("_viol"): _*)
    val smallEnough =
      maxBroadcastGroups > 0 &&
        violating.limit(maxBroadcastGroups + 1).count() <= maxBroadcastGroups
    val joinSide = if (smallEnough) broadcast(violating) else violating
    val cond = names.map(n => projected(n) <=> joinSide(s"_v_$n")).reduce(_ && _)
    val outCols: Seq[Column] = projected.columns.toSeq.map { c =>
      if (names.contains(c)) when(col("_viol").isNull, projected(c)).as(c) else projected(c)
    }
    projected.join(joinSide, cond, "left").select(outCols: _*)
  }

  /** Differentially-private group counts via the two-sided geometric
    * (discrete Laplace) mechanism: `released = count + (G_a − G_b)` where
    * `G_a, G_b` are independent Geometric(1/2) draws. For sensitivity-1
    * counting queries the two-sided geometric with parameter p is
    * ε-DP with ε = ln(1/p) — here '''ε = ln 2''' (Ghosh–Roughgarden–
    * Sundararajan's universally-optimal integer mechanism). Only the
    * released value leaves the operator; the true count is dropped.
    *
    * The geometric draws are INTEGER-EXACT and seed-deterministic: each is
    * the trailing-zero count of `stableHash(groupKey|seed|side) | 2^20`
    * (uniform hash bits ⇒ trailing zeros ~ Geometric(1/2), capped at 20 —
    * a 2⁻²⁰-probability tail truncation per side, i.e. a δ ≈ 2⁻²⁰ term on
    * the guarantee, far below any statistical resolution). No `ln`, no
    * floating point, so the DuckDB oracle replays the release bit-exactly
    * from the shared md5 hash contract ([[graft.functions.Anonymizer]]).
    *
    * Honesty caveats, deliberate: determinism makes a release REPRODUCIBLE
    * (rerunning the pipeline republishes the identical noise — no privacy
    * spent twice); the caller must use a FRESH seed for each semantically
    * new release, exactly as they would draw fresh randomness. ε is fixed
    * at ln 2 by the bit-level construction; finer ε would need a
    * rational-arithmetic inverse-CDF, out of scope here.
    *
    * Plan: one grouped count (map-side combinable) + a scan-local noise
    * column — noise adds ZERO distributed work at any scale.
    */
  def noisyCounts(df: DataFrame, groupCols: Seq[String], seed: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    val noiseUdf = udf { (key: String) => noiseFor(key, seed) }
    val keyExpr = concat_ws("\u0001", groupCols.map(col): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_true_count"))
      .withColumn("released", col("_true_count") + noiseUdf(keyExpr))
      .drop("_true_count")
  }

  private def geo(key: String, seed: String, side: String): Int =
    java.lang.Integer.numberOfTrailingZeros(
      graft.functions.Anonymizer.stableHash(s"$key|$seed|$side") | (1 << 20))

  /** The shared two-sided-geometric draw: difference of two capped
    * Geometric(1/2) trailing-zero counts over the md5 hash contract.
    */
  private def noiseFor(key: String, seed: String): Long =
    (geo(key, seed, "a") - geo(key, seed, "b")).toLong

  /** Differentially-private group SUMS with USER-level contribution
    * bounding -- the companion release to [[noisyCounts]] for value
    * queries, at the same fixed e = ln 2:
    *
    *  1. each privacy unit's (e.g. user's) total contribution per group is
    *     summed in a fixed-point domain and CLAMPED to `[0, clampFp]` --
    *     without bounding, one outlier user makes the sensitivity (and
    *     hence any honest noise scale) unbounded; clamping is the standard
    *     bias-for-privacy trade and is part of the released query's
    *     definition;
    *  2. the clamped group sum is QUANTIZED to `clampFp` units (round half
    *     up, integer arithmetic). Neighboring datasets (+- one unit) move
    *     the sum by <= clampFp, so the quantized query has sensitivity 1
    *     on the clampFp lattice -- exactly the domain where the integer
    *     geometric mechanism gives e = ln 2. Releasing the UN-quantized
    *     sum plus lattice-valued noise would NOT be DP: the sub-lattice
    *     residue of the released value would reveal the exact sum;
    *  3. `released_fp = clampFp * (units + noise)`, noise the shared
    *     [[noisyCounts]] draw. Only the released value leaves.
    *
    * The quantization granularity IS the accuracy cost of the fixed-e
    * bit-level mechanism: pick `clampFp` as the real contribution bound,
    * not larger. Plan: two map-side-combinable aggregates (per-unit
    * clamp, then per-group sum) + a scan-local noise column.
    *
    * @param clampFp contribution bound in the fixed-point domain
    *                (`scale` units per 1.0 of `valueCol`)
    */
  def noisySums(
      df: DataFrame,
      groupCols: Seq[String],
      unitCol: String,
      valueCol: String,
      clampFp: Long,
      seed: String,
      scale: Long = 100): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(clampFp > 0, s"clampFp must be positive, got $clampFp")
    require(scale > 0, s"scale must be positive, got $scale")
    val noiseUdf = udf { (key: String) => noiseFor(key, seed) }
    val keyExpr  = concat_ws("\u0001", groupCols.map(col): _*)
    val perUnit = df
      .select(groupCols.map(col) :+ col(unitCol).as("_unit") :+
        floor(col(valueCol).cast("double") * scale + lit(0.5)).cast("long").as("_fp"): _*)
      .groupBy(groupCols.map(col) :+ col("_unit"): _*)
      .agg(sum(col("_fp")).as("_s"))
      .withColumn("_c", least(greatest(col("_s"), lit(0L)), lit(clampFp)))
    perUnit
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("_c")).as("_sum"))
      .withColumn("_units", expr(s"(_sum + ${clampFp / 2}) div $clampFp"))
      .withColumn("released_fp", lit(clampFp) * (col("_units") + noiseUdf(keyExpr)))
      .select(groupCols.map(col) :+ col("released_fp"): _*)
  }
}
