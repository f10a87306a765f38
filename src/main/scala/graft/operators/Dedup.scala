package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale training-data pipelines.
  *
  * Everything here is expressed with native Catalyst expressions and
  * higher-order functions (transform/aggregate/filter) plus shuffled
  * joins/groupBys — no Scala UDFs — so the hot paths stay in whole-stage
  * codegen and scale with partitioning:
  *
  *   - exact dedup: hash-groupBy on content (one shuffle on the text key);
  *   - n-gram Jaccard: shingle inverted index + pair-count join (never a
  *     cross join — cost is Σ per-shingle pair fanout, controlled by
  *     `maxShingleFreq` at scale);
  *   - MinHash+LSH: shingle→signature→band→bucket-join, the standard
  *     sub-quadratic near-dup pipeline;
  *   - SimHash: 32-bit sign-aggregated fingerprint per document;
  *   - embedding cosine: brute-force pair filter (correctness baseline; see
  *     [[Similarity]] for the LSH-bucketed scale path).
  */
object Dedup {

  /** Distinct character n-grams of `text`, positions 1..len-n+1. For texts
    * shorter than n the whole text is the single shingle (the `greatest`
    * guard also keeps `sequence` ascending — sequence(1, 0) would count
    * DOWN in Spark).
    */
  def shingles(text: Column, n: Int): Column =
    array_distinct(
      transform(sequence(lit(1), greatest(length(text) - (n - 1), lit(1))), i => text.substr(i, lit(n)))
    )

  /** One representative (min id) + multiplicity per distinct text.
    * Exact dedup = one hash shuffle on the content key; at 100 TB hash the
    * text first (`md5`) so the shuffle key is 32 bytes, not the document.
    */
  def exactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Pairs (id_a < id_b) with n-gram Jaccard ≥ `threshold`, via a shingle
    * inverted index: explode distinct shingles, self-join on shingle to
    * count intersections, then |A∩B| / (|A|+|B|−|A∩B|).
    *
    * @param maxShingleFreq drop shingles occurring in more than this many
    *   docs before pairing — stop-shingle removal bounds the join fanout at
    *   scale (a shingle present in k docs contributes k² pairs).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxShingleFreq: Option[Int] = None
  ): DataFrame = {
    val sh = df
      .select(col(idCol).as("doc_id"), explode(shingles(col(textCol), n)).as("sh"))
    val sized = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val pruned = (maxShingleFreq match {
      case Some(k) =>
        val keep = sh.groupBy("sh").agg(count(lit(1)).as("df_freq")).where(col("df_freq") <= k).select("sh")
        sh.join(keep, "sh")
      case None => sh
    }).select("doc_id", "sh") // using-column joins put the key first — pin order before toDF renames
    val a = pruned.toDF("doc_a", "sh")
    val b = pruned.toDF("doc_b", "sh")
    val inter = a
      .join(b, a("sh") === b("sh") && a("doc_a") < b("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sized.toDF("doc_a", "sz_a"), "doc_a")
      .join(sized.toDF("doc_b", "sz_b"), "doc_b")
      .withColumn("jaccard", col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** MinHash signature: sig(i) = min over shingles of stableHash(sh + "#" + i),
    * i in [0, numHashes). Pure HOF expression — one pass over the shingle
    * array per document, no shuffle.
    */
  def minHashSignature(text: Column, n: Int, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles(text, n), sh => HashCols.stableHash(concat(sh, lit("#"), i))))
    )

  /** LSH candidate pairs: docs sharing any band of the MinHash signature.
    * bands × rowsPerBand must equal numHashes. Scale shape: explode to
    * (band, band_key) and shuffle on the bucket key — never all-pairs.
    */
  def minHashLshCandidates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig  = df.select(col(idCol).as("doc_id"), minHashSignature(col(textCol), n, numHashes).as("sig"))
    val banded = sig.select(
      col("doc_id"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => struct(
            b.as("band"),
            concat_ws(":", transform(slice(col("sig"), b * rows + 1, lit(rows)), x => x.cast("string"))).as("key")
          )
        )
      ).as("bk")
    ).select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val l = banded.toDF("doc_a", "band", "key")
    val r = banded.toDF("doc_b", "band", "key")
    l.join(r, Seq("band", "key"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** MinHash LSH with exact-Jaccard verification of candidates — the full
    * sub-quadratic near-dup pipeline.
    */
  def minHashLshPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5
  ): DataFrame = {
    val cand = minHashLshCandidates(df, textCol, idCol, n, numHashes, bands)
    val docs = df.select(col(idCol).as("doc_id"), shingles(col(textCol), n).as("shs"))
    cand
      .join(docs.toDF("doc_a", "shs_a"), "doc_a")
      .join(docs.toDF("doc_b", "shs_b"), "doc_b")
      .withColumn("inter", size(array_intersect(col("shs_a"), col("shs_b"))))
      .withColumn(
        "jaccard",
        col("inter").cast("double") / (size(col("shs_a")) + size(col("shs_b")) - col("inter"))
      )
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Whitespace tokens with empties dropped (shared with [[TextAnalysis]]). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** 32-bit SimHash: bit j set iff Σ over tokens of ±1 (sign of token-hash
    * bit j) is positive. Token multiplicity acts as the classic weight.
    */
  def simHash32(text: Column): Column = {
    val tokHashes = transform(tokens(text), t => HashCols.stableHash(t))
    aggregate(
      sequence(lit(0), lit(31)),
      lit(0L),
      (acc, j) => {
        val pow  = pow2(j)
        val vote = aggregate(tokHashes, lit(0L), (a, h) => a + lit(2) * ((h / pow).cast("long") % 2) - 1)
        acc + when(vote > 0, pow).otherwise(lit(0L))
      }
    )
  }

  private def pow2(j: Column): Column = pow(lit(2.0), j).cast("long")

  /** Pairs of documents whose SimHash fingerprints differ in ≤ maxHamming
    * bits. Uses bit_count(xor) over a band-bucketed candidate set at scale;
    * here the fingerprint frame is small after aggregation.
    */
  def simHashPairs(fingerprints: DataFrame, idCol: String, fpCol: String, maxHamming: Int): DataFrame = {
    val a = fingerprints.select(col(idCol).as("doc_a"), col(fpCol).as("fp_a"))
    val b = fingerprints.select(col(idCol).as("doc_b"), col(fpCol).as("fp_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Brute-force embedding near-duplicate pairs (cosine ≥ threshold).
    * Correctness baseline — O(n²); use [[Similarity.lshBuckets]] to bound
    * the pair space at scale.
    */
  def embeddingNearDuplicates(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double
  ): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .where(col("cosine") >= threshold)
      // DECIMAL(9,6) (HALF_UP in both Spark and DuckDB) so the oracle
      // compare is insensitive to last-ulp float noise.
      .select(col("id_a"), col("id_b"), col("cosine").cast("decimal(9,6)").as("cos_r"))
  }
}
