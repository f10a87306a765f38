package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage (entity resolution): find rows that refer
  * to the same real-world entity despite non-identical keys — the
  * dirty-data sibling of exact dedup, and the reference domain's natural
  * extension (an anonymizer's FK-consistent pseudonyms assume clean keys;
  * linkage is how keys get clean).
  *
  * Scale architecture — the three-tier ER pipeline, NOT a pairwise join
  * over rows:
  *
  *  1. '''Exact collapse''': distinct names with a deterministic numeric
  *     key (`min(id)` over the name's rows). At 100 TB the row count is
  *     unbounded but the NAME DICTIONARY is bounded by the value domain —
  *     every later stage works at dictionary scale.
  *  2. '''Blocked fuzzy match''': the dictionary self-joins only WITHIN
  *     deterministic blocks (default: same first token ∪ same last token —
  *     multi-pass blocking). Each pass is an equi-join on its block key
  *     (hash-partitionable, never a cartesian); candidates are verified by
  *     `levenshtein` with Spark's thresholded early-exit form. Recall is
  *     the blocking's, by construction: a true pair escaping EVERY pass'
  *     key (e.g. edits changing both first and last token) is never
  *     considered — add passes to tighten, exactly like MinHash band
  *     geometry (`Dedup.recallGeometry`); the oracle replays the same
  *     blocking, so gates pin the implemented semantics.
  *  3. '''Transitive canonicalization''': matched name pairs feed
  *     [[Dedup.duplicateClusters]] (union-find / pointer-jumping CC at
  *     dictionary scale); each cluster's minimum-key name becomes the
  *     canonical form, broadcast back onto the rows — the full corpus is
  *     touched exactly twice (dictionary build, final map), never
  *     pairwise.
  */
object RecordLinkage {

  /** Default multi-pass blocking: first whitespace token, last whitespace
    * token. A single-token name lands in the same block under both passes
    * (harmless — pairs dedup).
    */
  def defaultBlockers: Seq[Column => Column] = Seq(
    nm => element_at(split(nm, " "), 1),
    nm => element_at(split(nm, " "), -1)
  )

  /** The exact-collapse dictionary: one row per distinct name with key =
    * min(id) over the name's rows (deterministic, SQL-replayable).
    * Materialized (lineage-truncated) on build: every blocking pass joins
    * it on BOTH sides and the canonical map reads it twice more — without
    * truncation each reference would re-run the corpus-wide collapse,
    * which at 100 TB is the expensive scan of the whole pipeline.
    */
  def nameDictionary(df: DataFrame, idCol: String, nameCol: String): DataFrame =
    graft.plans.Lineage.truncate(
      df.groupBy(col(nameCol).as("nm"))
        .agg(min(col(idCol)).cast("long").as("nk")))

  /** Blocked fuzzy self-join over the name dictionary: all unordered
    * dictionary pairs that share at least one block key and sit within
    * `maxDist` edits. Each blocking pass filters with the THRESHOLDED
    * levenshtein (early-exits the DP row scan once the running minimum
    * exceeds `maxDist`) before the cross-pass distinct, so the dedup
    * exchange carries only true matches, not candidates.
    *
    * @return `key_a, key_b, name_a, name_b, dist` with `key_a < key_b`
    */
  def fuzzyNamePairs(
      dict: DataFrame,
      maxDist: Int,
      blockers: Seq[Column => Column] = defaultBlockers): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(blockers.nonEmpty, "need at least one blocking pass")
    val passes = blockers.map { b =>
      val l = dict.select(col("nk").as("key_a"), col("nm").as("name_a"), b(col("nm")).as("_bk_a"))
      val r = dict.select(col("nk").as("key_b"), col("nm").as("name_b"), b(col("nm")).as("_bk_b"))
      l.join(r, col("_bk_a") === col("_bk_b") && col("key_a") < col("key_b"))
        .where(levenshtein(col("name_a"), col("name_b"), maxDist) >= 0)
        .select("key_a", "key_b", "name_a", "name_b")
    }
    passes.reduce(_ unionByName _)
      .distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
  }

  /** Full entity resolution: every input row annotated with its cluster's
    * canonical name (the minimum-key dictionary entry reachable through
    * fuzzy matches; a name with no match canonicalizes to itself).
    *
    * @return the input columns plus `canon_name`
    */
  def canonicalizeByName(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      maxDist: Int,
      blockers: Seq[Column => Column] = defaultBlockers,
      clusterMode: Dedup.ClusterMode = Dedup.ClusterMode.Auto()): DataFrame = {
    val dict  = nameDictionary(df, idCol, nameCol)
    val pairs = fuzzyNamePairs(dict, maxDist, blockers)
    val clusters = Dedup.duplicateClusters(pairs, "key_a", "key_b", clusterMode)
    // name key -> canonical key (identity for untouched dictionary rows),
    // then canonical key -> canonical name via the dictionary itself.
    val repOf = dict
      .join(clusters, dict("nk") === clusters("node"), "left")
      .select(col("nm").as("_src_nm"), coalesce(col("cluster_rep"), col("nk")).as("_rep"))
    val canon = repOf
      .join(dict.select(col("nk").as("_rep2"), col("nm").as("canon_name")), col("_rep") === col("_rep2"))
      .select(col("_src_nm"), col("canon_name"))
    df.join(broadcast(canon), df(nameCol) === canon("_src_nm"), "left")
      .drop("_src_nm")
  }
}
