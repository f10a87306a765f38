package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling and dataset-split assignment.
  *
  * Both are pure per-row column expressions over the MD5 stableHash
  * contract ([[HashCols.stableHash]], whole-stage codegen): no shuffle, no
  * RNG state, no driver coordination — the sample/split of a row depends
  * only on its id, so it is stable across runs, executors, and retries
  * (the property a 100 TB training pipeline needs: re-running a failed
  * stage must not resample).
  */
object Sampling {

  /** Buckets per unit of probability — 1e6 gives ppm-resolution fractions. */
  val Buckets = 1000000L

  /** The row's deterministic bucket in [0, Buckets): stableHash of the id
    * rendered as a string (string form is the cross-engine contract — the
    * DuckDB oracle hashes the same text).
    */
  def hashBucket(id: Column): Column =
    pmod(HashCols.stableHash(id.cast("string")), lit(Buckets))

  /** Keep a deterministic `fraction` of rows by id-hash. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0, 1]")
    df.where(hashBucket(col(idCol)) < (fraction * Buckets).toLong)
  }

  /** Per-stratum deterministic sampling: each value of `strataCol` keeps
    * its own fraction of rows (strata without an entry keep
    * `defaultFraction`). The workhorse of corpus mixing — downsample
    * boilerplate-heavy sources, upweight rare high-quality ones — with the
    * same retry-stable pure-column shape as [[hashSample]]: no shuffle,
    * no RNG state, no per-stratum pass.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0
  ): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1), "fractions must be in [0, 1]")
    // math.round, not toLong: 0.2 * 1e6 is 199999.99999999997 in binary —
    // truncation would disagree with the oracle's literal threshold.
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(lit(math.round(defaultFraction * Buckets))) {
      case (acc, (stratum, f)) => when(col(strataCol) === stratum, lit(math.round(f * Buckets))).otherwise(acc)
    }
    df.where(hashBucket(col(idCol)) < threshold)
  }

  /** Per-row Bernoulli keep with probability read from `probCol` (clamped
    * to [0, 1]) — quality-WEIGHTED corpus sampling: feed a quality score
    * mapped to a keep probability and high-quality documents survive
    * proportionally more often. Same retry-stable pure-column shape as
    * [[hashSample]]; `floor` on both engines (a raw long cast truncates in
    * Spark but rounds in DuckDB — floor is the portable form).
    */
  def weightedSample(df: DataFrame, idCol: String, probCol: String): DataFrame = {
    val p = least(greatest(col(probCol), lit(0.0)), lit(1.0))
    df.where(hashBucket(col(idCol)) < floor(p * Buckets).cast("long"))
  }

  /** Fixed-point scale for the temperature-smoothed domain size: 2^20, so
    * `sqrt(n) * MixScale` is an EXACT power-of-two scaling of a correctly
    * rounded IEEE sqrt — the floor of that is bit-identical on any IEEE
    * engine, which is what makes [[mixtureSample]]'s T = 2 rates
    * cross-engine exact.
    */
  val MixScale = 1048576L

  /** Temperature-scaled mixture sampling over a domain column — the
    * multilingual / multi-source rebalancing recipe: sample domain d with
    * probability ∝ n_d^(1/T), renormalized. T = 1 preserves the corpus
    * mix, T → ∞ approaches uniform-over-domains; intermediate T upweights
    * rare domains (languages, sources) without flattening entirely.
    *
    * Per-domain keep rate: r_d = B·q_d / n_d with q_d = s_d / Z,
    * s_d = floor(n_d^(1/T) · 2^20), Z = Σ s_d, B = round(f · N) — capped
    * at 1 (a domain whose target exceeds its size keeps everything; the
    * shortfall is NOT redistributed, the standard recipe's behavior).
    * Rows with a NULL domain form their own domain (null-safe join).
    *
    * Numeric contract: at the default T = 2 the whole rate chain is
    * cross-engine bit-exact — IEEE sqrt is correctly rounded, the 2^20
    * scale and floor are exact, Z and B are integers, and the remaining
    * double chain ((B / Z) · s_d) / n_d · 10^6 is a fixed order of
    * correctly rounded ops. Other temperatures go through pow(), which is
    * not correctly rounded in general: still deterministic and
    * retry-stable WITHIN Spark, just not certified against a foreign
    * engine at the last ulp.
    *
    * Scale shape: one map-side-combinable domain count, two single-row
    * aggregates, and a BROADCAST join of the tiny per-domain threshold
    * frame back on the domain key feeding the same retry-stable
    * [[hashBucket]] filter as every sampler here. Assumes #domains ≪
    * corpus (languages, sources, hosts) so the rate frame broadcasts.
    */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      targetFraction: Double,
      temperature: Double = 2.0
  ): DataFrame = {
    require(targetFraction >= 0 && targetFraction <= 1, "targetFraction must be in [0, 1]")
    require(temperature > 0, "temperature must be positive")
    val smoothed =
      if (temperature == 2.0) sqrt(col("_mx_n"))
      else pow(col("_mx_n"), lit(1.0 / temperature))
    val scaled = df.groupBy(col(domainCol).as("_mx_dom"))
      .agg(count(lit(1)).as("_mx_n"))
      .withColumn("_mx_s", floor(smoothed * lit(MixScale)).cast("long"))
    val totals = scaled.agg(sum("_mx_s").as("_mx_z"), sum("_mx_n").as("_mx_total"))
    val thresholds = scaled
      .crossJoin(totals) // single-row right side
      .withColumn("_mx_b", round(col("_mx_total") * lit(targetFraction)).cast("long"))
      .withColumn("_mx_rate",
        ((col("_mx_b").cast("double") / col("_mx_z")) * col("_mx_s")) / col("_mx_n"))
      .withColumn("_mx_thr", least(floor(col("_mx_rate") * lit(Buckets)).cast("long"), lit(Buckets)))
      .select(col("_mx_dom"), col("_mx_thr"))
    df.join(broadcast(thresholds), col(domainCol) <=> col("_mx_dom"))
      .where(hashBucket(col(idCol)) < col("_mx_thr"))
      .drop("_mx_dom", "_mx_thr")
  }

  /** Assign each row a split label ("train"/"val"/"test"/...) by contiguous
    * hash-bucket ranges. Weights are normalized; the last split absorbs
    * rounding remainder so every row gets exactly one label.
    */
  def assignSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)], outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0), "split weights must be positive")
    val total = splits.map(_._2).sum
    val bounds = splits.init
      .scanLeft(0L) { case (acc, (_, w)) => acc + math.round(w / total * Buckets) }
      .tail
    val bucket = hashBucket(col(idCol))
    val labeled = splits.init.zip(bounds).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), fallback) => when(bucket < hi, lit(name)).otherwise(fallback)
    }
    df.withColumn(outCol, labeled)
  }

  /** Leakage-safe split: [[assignSplit]] with the guarantee that
    * NEAR-DUPLICATE documents never straddle splits — the eval-integrity
    * property a plain per-doc hash split silently violates (a test doc
    * whose near-twin sits in train is a leaked answer, and scraped corpora
    * are full of such twins even after exact dedup). Documents are
    * clustered by n-gram Jaccard ([[Dedup.ngramJaccardPairs]] →
    * [[Dedup.duplicateClusters]]); the split hash is keyed by the CLUSTER
    * REPRESENTATIVE, so a whole near-dup family lands in one split;
    * unclustered documents key by themselves (identical to the plain
    * split for them).
    *
    * Scale shape: the dedup stages' own auto-gated shapes, plus one left
    * join of the corpus against the (small — only clustered docs) label
    * frame and the pure-column split assignment. Retry-stable like every
    * sampler here.
    */
  def leakageSafeSplit(
      df: DataFrame,
      textCol: String,
      idCol: String,
      splits: Seq[(String, Double)],
      n: Int = 3,
      threshold: Double = 0.8,
      outCol: String = "split"
  ): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(df, textCol, idCol, n, threshold)
    val reps  = Dedup.duplicateClusters(pairs).toDF("_lsk_id", "_lsk_rep")
    val keyed = df
      .join(reps, col(idCol).cast("long") === col("_lsk_id"), "left")
      .withColumn("_split_key", coalesce(col("_lsk_rep"), col(idCol).cast("long")))
      .drop("_lsk_id", "_lsk_rep")
    assignSplit(keyed, "_split_key", splits, outCol).drop("_split_key")
  }

  /** Deterministic shard + within-shard position for training-data export —
    * the "global shuffle" a training run wants, without a global sort: the
    * id-hash assigns the shard AND the pseudo-random order inside it, so
    * writing each shard in `pos` order yields a reproducible, well-mixed
    * dataset at any scale.
    *
    * One shuffle (the window partition on `shard`); each shard sorts
    * independently, so parallelism = `numShards` and no stage ever sees a
    * global order. `seed` folds into the hash text, giving independent
    * reshuffles of the same corpus (epoch seeds). Retry-stable like every
    * sampler here: a row's (shard, pos) depends only on (id, seed, corpus
    * membership).
    */
  def shardAssign(df: DataFrame, idCol: String, numShards: Int, seed: Long = 0L): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = HashCols.stableHash(concat(col(idCol).cast("string"), lit("_shard"), lit(seed.toString)))
    val withShard = df
      .withColumn("shard", pmod(h, lit(numShards.toLong)))
      // The hash div numShards is the within-shard mix order (independent
      // of the shard bits); id breaks the rare hash-collision tie so the
      // order is total and deterministic.
      .withColumn("ord", floor(h / numShards))
    withShard
      .withColumn("pos", row_number().over(Window.partitionBy("shard").orderBy(col("ord"), col(idCol))).cast("long"))
      .drop("ord")
  }

  /** Deterministic GLOBAL shuffle order for training export: every row's
    * 0-based position in the corpus ordered by
    * `(stableHash(salt ++ id), id)` — the epoch-reshuffleable "random"
    * training order (new salt, new order), reproducible on any engine.
    *
    * The naive formulation — `row_number() OVER (ORDER BY hash)` with no
    * partitioning — plans as Exchange SinglePartition: ONE task sorts the
    * whole corpus, the exact bottleneck a 100 TB export cannot pay (and
    * what the DuckDB oracle happily computes single-node). This is the
    * two-phase decomposition instead:
    *
    *   1. bucket on the hash's HIGH bits (`h div (2³¹/buckets)`). The
    *      hash is uniform, so fixed-width hash-domain slices ARE balanced
    *      range partitions — order-preserving across buckets, no
    *      boundary-sampling pass (`repartitionByRange` samples, which
    *      would make positions depend on the sample);
    *   2. per-bucket local rank (one Window per bucket partition) plus
    *      driver-prefix-summed bucket COUNTS as offsets —
    *      `buckets` longs on the driver, broadcast-joined back.
    *
    * Cost: one count aggregation + one shuffle on the bucket + local
    * sorts. `buckets` must be a power of two dividing 2³¹ so the slice
    * arithmetic stays exact integer work.
    */
  def shuffleOrder(df: DataFrame, idCol: String, salt: String = "", buckets: Int = 256): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0 && buckets <= (1 << 20),
      s"buckets must be a power of two in [1, 2^20], got $buckets")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val width  = (1L << 31) / buckets
    val hashed = df
      .withColumn("_so_h", HashCols.stableHash(concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("_so_bucket", shiftright(col("_so_h"), 31 - Integer.numberOfTrailingZeros(buckets)).cast("int"))
    require(width * buckets == (1L << 31), "bucket arithmetic must tile the 31-bit hash domain exactly")
    val counts = hashed.groupBy("_so_bucket").count()
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val offsetsDf = broadcast(offsets.toSeq.toDF("_so_bucket", "_so_offset"))
    hashed
      .withColumn("_so_rank",
        row_number().over(Window.partitionBy("_so_bucket").orderBy(col("_so_h"), col(idCol))).cast("long") - 1L)
      .join(offsetsDf, "_so_bucket")
      .withColumn("shuffle_pos", col("_so_offset") + col("_so_rank"))
      .drop("_so_h", "_so_bucket", "_so_rank", "_so_offset")
  }

  /** Fixed-SIZE per-stratum sampling (the eval-set builder): exactly
    * `k` rows from every value of `strataCol` (all of them when a stratum
    * is smaller), chosen by the deterministic id-hash order — the
    * retry-stable equivalent of a per-stratum reservoir sample, without
    * reservoir state: rank-by-hash within the stratum is a pure window.
    * [[stratifiedSample]] keeps a FRACTION per stratum; this keeps a
    * COUNT — what a balanced eval/holdout set wants. One shuffle (the
    * stratum window); the hash order also makes the kept set NESTED:
    * fixedSizeStratified(k) ⊂ fixedSizeStratified(k+1).
    */
  def fixedSizeStratified(df: DataFrame, idCol: String, strataCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCol)
      .orderBy(hashBucket(col(idCol)).asc, col(idCol).asc)
    df.withColumn("_fs_rank", row_number().over(w))
      .where(col("_fs_rank") <= k)
      .drop("_fs_rank")
  }

  /** Length-bucketed batch formation for training export: every row gets
    * the `batch_id` it would receive if the corpus were globally sorted by
    * `(lenCol, idCol)` and cut into runs of `batchSize` — so each batch
    * holds near-equal-length sequences and padding waste (per-batch max
    * minus each member) is minimized, the standard bucketed-batching
    * trick.
    *
    * The naive form — `row_number() OVER (ORDER BY len, id)` — plans as
    * Exchange SinglePartition (one task sorts the corpus). This is the
    * two-phase decomposition instead, the [[shuffleOrder]] doctrine
    * applied to a VALUE ordering: fixed-width length slices are
    * order-preserving buckets (any len-monotone bucketing reproduces the
    * global order exactly), per-bucket local ranks are one window each,
    * and driver-prefix-summed bucket counts (`lenBuckets` longs) offset
    * them to global positions. Cost: one max-agg, one count-agg, one
    * shuffle on the bucket. Returns the input plus `global_pos` and
    * `batch_id`.
    */
  def lengthBucketedBatches(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      batchSize: Int,
      lenBuckets: Int = 256
  ): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    require(lenBuckets > 0 && lenBuckets <= (1 << 20), "lenBuckets must be in [1, 2^20]")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val maxLen = df.agg(coalesce(max(col(lenCol).cast("long")), lit(0L))).head.getLong(0)
    val width  = math.max(1L, maxLen / lenBuckets + 1)
    val bucketed = df.withColumn("_lb_bucket", (col(lenCol).cast("long") / width).cast("int"))
    val counts = bucketed.groupBy("_lb_bucket").count()
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val offsetsDf = broadcast(offsets.toSeq.toDF("_lb_bucket", "_lb_offset"))
    bucketed
      .withColumn("_lb_rank",
        row_number().over(
          Window.partitionBy("_lb_bucket").orderBy(col(lenCol).cast("long"), col(idCol))).cast("long") - 1L)
      .join(offsetsDf, "_lb_bucket")
      .withColumn("global_pos", col("_lb_offset") + col("_lb_rank"))
      .withColumn("batch_id", (col("global_pos") / batchSize).cast("long"))
      .drop("_lb_bucket", "_lb_rank", "_lb_offset")
  }

  /** DSIR-style importance weights over hashed unigram features (Xie et
    * al., "Data Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): every document is scored by how much more likely its
    * token bag is under a TARGET distribution (the rows matching
    * `targetPredicate` — e.g. a trusted high-quality slice) than under the
    * RAW corpus distribution, entirely in the hashed-feature space so the
    * model is `numBuckets` longs, not a vocabulary.
    *
    *   weight(doc) = Σ_tokens  ln p̂_target(bucket(tok)) − ln p̂_raw(bucket(tok))
    *
    * with add-one smoothing over the `numBuckets` feature buckets and
    * `bucket(tok) = stableHash(tok) mod numBuckets` (the cross-engine MD5
    * contract, [[HashCols.stableHash]]).
    *
    * Determinism discipline: each bucket's log-ratio is computed ONCE on
    * the driver and rounded to fixed-point nano-nats (a BIGINT); the
    * per-document weight is then an INTEGER dot product of token counts
    * with that vector — bit-identical on any engine, any partitioning, any
    * summation order (the same single-ln trick as the LM-score gates).
    *
    * Plan shape (the 100 TB story): one pass tokenize→explode→groupBy over
    * `numBuckets` keys builds BOTH count vectors (the target side is a
    * conditional sum in the same aggregate — no second scan); the
    * `numBuckets`-row model is collected (bounded by the require) and
    * re-enters the plan as an array LITERAL, so scoring is a scan-local
    * whole-stage-codegen projection: `aggregate(transform(tokens, …))`
    * with zero joins, zero shuffles, zero UDFs. Returns the input plus
    * `weight_fp` (nano-nats; null/empty text scores 0).
    */
  def importanceWeights(
      df: DataFrame,
      textCol: String,
      targetPredicate: Column,
      numBuckets: Int = 64
  ): DataFrame =
    df.withColumn("weight_fp",
      importanceScore(importanceModel(df, textCol, targetPredicate, numBuckets), col(textCol)))

  /** The trained DSIR model: `numBuckets` fixed-point nano-nat log-ratios.
    * One tokenize→explode→groupBy pass builds BOTH count vectors (the
    * target side is a conditional sum in the same aggregate); the
    * `numBuckets`-row result is collected (bounded by the require) and the
    * per-bucket log-ratio computed ONCE on the driver. Train-batch /
    * serve-anywhere: the array feeds [[importanceScore]] in a batch plan
    * or a streaming one.
    */
  def importanceModel(
      df: DataFrame,
      textCol: String,
      targetPredicate: Column,
      numBuckets: Int = 64
  ): Array[Long] = {
    require(numBuckets >= 2 && numBuckets <= (1 << 16),
      s"numBuckets must be in [2, 65536] (the model is collected to the driver), got $numBuckets")
    val counts = df
      .select(targetPredicate.as("_iw_tgt"), explode(Dedup.tokens(col(textCol))).as("_iw_tok"))
      .groupBy(pmod(HashCols.stableHash(col("_iw_tok")), lit(numBuckets.toLong)).as("_iw_bucket"))
      .agg(count(lit(1)).as("_iw_raw"), sum(when(col("_iw_tgt"), 1L).otherwise(0L)).as("_iw_t"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2)))

    val rawTot = counts.map(_._2).sum
    val tgtTot = counts.map(_._3).sum
    val lrFp   = new Array[Long](numBuckets)
    counts.foreach { case (bkt, raw, tgt) =>
      lrFp(bkt) = math.round(1e9 *
        (math.log((tgt + 1).toDouble / (tgtTot + numBuckets)) -
          math.log((raw + 1).toDouble / (rawTot + numBuckets))))
    }
    lrFp
  }

  /** Scan-local DSIR scoring: the model re-enters the plan as an array
    * LITERAL, so the weight is a codegen'd `aggregate(transform(tokens,…))`
    * projection — zero joins, zero shuffles, zero UDFs, and legal in a
    * streaming plan (stateless). Null/empty text scores 0; the integer sum
    * is bit-identical under any partitioning or summation order.
    */
  def importanceScore(model: Array[Long], text: Column): Column = {
    val lrArr = array(model.map(lit(_)): _*)
    coalesce(
      aggregate(
        transform(Dedup.tokens(text),
          tok => element_at(lrArr, pmod(HashCols.stableHash(tok), lit(model.length.toLong)).cast("int") + 1)),
        lit(0L),
        (acc, x) => acc + x),
      lit(0L))
  }

  /** Importance RESAMPLING, deterministically: keep the `quota` documents
    * with the highest [[importanceWeights]] scores (ties broken by id).
    * The published DSIR samples with Gumbel noise; a training pipeline
    * that must be retry-stable wants the same set every run, so this is
    * the noise-free top-quota form — the weight ordering is identical,
    * only the tie-handling at the quota boundary differs. Plans as
    * TakeOrderedAndProject (per-partition top-quota, then one merge): no
    * global sort, no single-partition exchange.
    */
  def importanceResample(
      df: DataFrame,
      idCol: String,
      textCol: String,
      targetPredicate: Column,
      quota: Int,
      numBuckets: Int = 64
  ): DataFrame =
    importanceWeights(df, textCol, targetPredicate, numBuckets)
      .orderBy(col("weight_fp").desc, col(idCol))
      .limit(quota)
}
