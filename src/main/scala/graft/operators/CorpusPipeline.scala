package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call corpus preparation — the standard LLM preprocessing chain in
  * the order production pipelines run it:
  *
  *   1. EXACT dedup: md5(text) identity, keep the minimum-id copy
  *      (the [[Dedup.exactDuplicates]] contract).
  *   2. Quality filter: whitespace token count ≥ `minTokens` AND
  *      duplicate-token fraction ≤ `maxDupTokenFrac`
  *      (the C4/Gopher-style [[TextAnalysis.repetitionMetrics]] signals).
  *   3. LM perplexity filter: add-one bigram LM trained on the quality
  *      survivors, keep docs with nll < `nllThreshold`
  *      (CCNet-style [[TextAnalysis.lmQualityScore]]).
  *   4. Deterministic hash split: train/val/test by id-hash buckets
  *      ([[Sampling.assignSplit]] — retry-stable, resplit-free).
  *
  * Returns one row per SURVIVING document: (doc_id, n_tokens, nll,
  * split). Every stage is one of the independently gated operators; this
  * is the composition a real user runs, and it is itself driver-hashed
  * end-to-end (`q_corpus_prepare`) so the stage seams — which corpus each
  * stage sees, in which order — are pinned, not just the stages.
  *
  * Scale shape: the sum of its parts, nothing new — one md5 aggregation +
  * semi-join (exact dedup), scan-local quality metrics, the LM's
  * bigram-keyed aggregations and joins, and a pure-column split. No
  * driver state, no collect, no window over the corpus. For near-dup
  * aware preparation, run [[Dedup.deduplicateCorpus]] before this and
  * [[Sampling.leakageSafeSplit]] instead of stage 4 — both gated
  * separately.
  */
object CorpusPipeline {

  def prepare(
      df: DataFrame,
      textCol: String,
      idCol: String,
      minTokens: Long = 20L,
      maxDupTokenFrac: Double = 0.5,
      nllThreshold: Double = 3.45,
      splits: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  ): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
    // 1. Exact dedup — min id per content hash, semi-joined back.
    val canon = base
      .groupBy(md5(col("text")).as("_h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    chain(base.join(canon, Seq("doc_id"), "left_semi"),
      minTokens, maxDupTokenFrac, nllThreshold, splits)
  }

  /** [[prepare]] with NEAR-duplicate-aware stage 1: the full
    * [[Dedup.deduplicateCorpus]] cluster dedup (inverted-index n-gram
    * Jaccard → connected components → keep the min-id representative)
    * replaces the md5 exact dedup — which it subsumes, since exact
    * duplicates cluster at jaccard = 1. After families are collapsed to
    * one representative each, the plain hash split IS leakage-safe (no
    * near-twin of a test doc can sit in train — it was deduplicated
    * away); keep losers instead with [[Sampling.leakageSafeSplit]] when
    * the corpus must retain its duplicates.
    */
  def prepareNearDupAware(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      jaccardThreshold: Double = 0.8,
      minTokens: Long = 20L,
      maxDupTokenFrac: Double = 0.5,
      nllThreshold: Double = 3.45,
      splits: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  ): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
    chain(Dedup.deduplicateCorpus(base, "text", "doc_id", n, jaccardThreshold),
      minTokens, maxDupTokenFrac, nllThreshold, splits)
  }

  /** Stages 2–4 (quality → LM → split), shared by both dedup fronts. */
  /** Right-to-be-forgotten across every persisted SERVING surface in one
    * call. All five graft index families (MinHash signature, image
    * fingerprint, Jaccard prefix, IVF cell, BM25 postings) share one
    * tombstone contract — a `(doc_id)` parquet set under
    * `<root>/_graft_tombstones` that every probe/load path anti-joins —
    * so a forget request fans out as |paths| metadata appends: cost
    * O(|ids|) PER SURFACE, zero index partitions touched, serving
    * uninterrupted. Reclaim space later by rebuilding each index from the
    * surviving docs (overwrite-persist clears tombstones); the erasure is
    * effective at probe time immediately.
    *
    * Returns a receipt frame (index_path, forgotten_ids) for the audit
    * trail a deletion request needs. Spec-verified end-to-end across all
    * five surfaces (ForgetFlowSpec): after one call, no probe of any
    * surface returns a forgotten id.
    */
  def forgetDocuments(ids: DataFrame, idCol: String, indexPaths: Seq[String]): DataFrame = {
    require(indexPaths.nonEmpty, "forgetDocuments: no index paths given")
    val spark = ids.sparkSession
    import spark.implicits._
    val n = ids.select(col(idCol)).distinct().count()
    indexPaths.foreach(p => Dedup.deleteFromPersistedIndex(ids, idCol, p))
    indexPaths.map(p => (p, n)).toDF("index_path", "forgotten_ids")
  }

  /** One-call COMPACTION across every persisted index family — the
    * reclamation companion to [[forgetDocuments]]: after enough forget
    * cycles the tombstone anti-joins and append segments dominate probe
    * cost, and this fans the rewrite out the same way the forget fanned
    * the deletes. The family is detected from the index's own frozen
    * metadata artifact (each family stores exactly one distinctive
    * `_`-prefixed dir beside its data), so a mixed list of paths needs no
    * caller-side bookkeeping. Returns an audit frame
    * (index_path, family).
    *
    * `ivfRetrain` is forwarded to [[Similarity.compactIvfIndex]] for any
    * IVF index in the list — pass [[Similarity.RetrainMode.Auto]] to
    * fold the append-drift check (surviving-cell imbalance) into the
    * periodic compaction sweep, so a drifted vector index re-trains its
    * quantizer in the same pass that reclaims its tombstones.
    */
  def compactIndexes(
      spark: org.apache.spark.sql.SparkSession,
      indexPaths: Seq[String],
      selective: Boolean = true,
      ivfRetrain: Similarity.RetrainMode = Similarity.RetrainMode.Never
  ): DataFrame = {
    require(indexPaths.nonEmpty, "compactIndexes: no index paths given")
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    // The metadata artifact lives in the CURRENT GENERATION once an index
    // has been compacted before — detect against the resolved data dir.
    def has(root: String, child: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(IndexStore.dataDir(spark, root), child)
      hp.getFileSystem(conf).exists(hp)
    }
    // Distinct indexes are independent rewrites over disjoint directories:
    // run them as CONCURRENT Spark jobs (one driver thread each) so the
    // cluster pipelines the five scans/shuffles instead of idling between
    // them — the same submit-parallelism Graft's level-parallel copy uses.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val report = Await.result(
      Future.sequence(indexPaths.map { p =>
        Future {
          val family =
            if (has(p, "_graft_index_meta")) { Dedup.compactSignatureIndex(spark, p, selective); "signature" }
            else if (has(p, "_graft_fp_meta")) { Dedup.compactFingerprintIndex(spark, p, selective); "fingerprint" }
            else if (has(p, "_graft_jidx_meta")) { Dedup.compactJaccardIndex(spark, p, selective); "jaccard" }
            else if (has(p, "_graft_centroids")) { Similarity.compactIvfIndex(spark, p, selective, retrain = ivfRetrain); "ivf" }
            else if (has(p, "_graft_meta")) { TextAnalysis.compactBm25Index(spark, p, selective); "bm25" }
            else if (has(p, "_graft_gram_meta")) { Dedup.compactGramIndex(spark, p, selective); "gram" }
            else throw new IllegalArgumentException(
              s"compactIndexes: $p carries no known index metadata artifact " +
                "(_graft_index_meta / _graft_fp_meta / _graft_jidx_meta / _graft_centroids / _graft_meta / _graft_gram_meta)")
          (p, family)
        }
      }),
      Duration.Inf)
    report.toDF("index_path", "family")
  }

  private def chain(
      deduped: DataFrame,
      minTokens: Long,
      maxDupTokenFrac: Double,
      nllThreshold: Double,
      splits: Seq[(String, Double)]
  ): DataFrame = {
    require(minTokens >= 2, "minTokens must be >= 2 (the LM stage needs at least one bigram)")
    // 2. Quality filter on the dedup survivors.
    val quality = TextAnalysis.repetitionMetrics(deduped, "text", "doc_id")
      .where(col("n_tokens") >= minTokens && col("dup_token_frac") <= maxDupTokenFrac)
      .select("doc_id", "n_tokens")
    // Materialized once: the LM stage reads this frame three times (bigram
    // counts, vocabulary count, final join) — without the truncate each
    // read re-runs the dedup join and the quality metrics from the scan.
    val qualityDocs = graft.plans.Lineage.truncate(deduped.join(quality, "doc_id"))
    // 3. LM filter — the model trains on the quality survivors themselves
    //    (self-trained; pass a reference corpus through lmQualityScore
    //    directly when a clean LM corpus exists).
    val kept = TextAnalysis.lmQualityScore(qualityDocs, "text", "doc_id", nllThreshold)
      .where(col("kept"))
      .select(col("doc_id"), col("nll"))
    // 4. Deterministic split over the survivors.
    Sampling.assignSplit(
      qualityDocs.select("doc_id", "n_tokens").join(kept, "doc_id"), "doc_id", splits)
      .select(col("doc_id"), col("n_tokens"), col("nll"), col("split"))
  }
}
