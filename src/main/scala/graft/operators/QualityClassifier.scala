package graft.operators

import graft.functions.Anonymizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Supervised document-quality classifier: a fastText-style hashed-bag-of-
  * tokens LINEAR model (logistic regression over `dim` hash buckets),
  * trained by distributed gradient summation and served scan-local against
  * broadcast weights — the standard cheap distillation of an expensive
  * quality signal (LM perplexity, human labels, gold-vs-crawl membership)
  * into a model that scores 100 TB at scan speed.
  *
  * Everything is FIXED-POINT so both training and serving are exactly
  * reproducible and SQL-replayable:
  *
  *   - features: token → `stableHash(token) % dim` bucket, raw counts
  *     (integers — no FP normalization);
  *   - weights: micro-units (`Long` millionths), so a document's logit is
  *     `bias_micro + Σ_b count_b · w_micro[b]` — EXACT integer arithmetic,
  *     identical on any engine and any summation order;
  *   - training: per-iteration gradients are rounded to micro-unit `Long`s
  *     PER DOCUMENT before the cluster-wide sum, so the reduction is
  *     commutative integer addition — the trained weights are
  *     bit-identical regardless of partitioning (spec-pinned).
  *
  * Scale shape: training touches the corpus once per iteration with a
  * `treeAggregate` of a `dim`-length Long array (the model, ~8 KB at the
  * default 1024 buckets, broadcast each iteration); serving is one
  * mapPartitions over the scan with the weights in a broadcast — zero
  * shuffles, no driver involvement past the 8 KB model.
  */
object QualityClassifier {

  /** Trained model: `weightsMicro(b)` is the micro-unit weight of hash
    * bucket `b`; `biasMicro` the intercept. `logitMicro ≥ 0` ⇔ predicted
    * positive (p ≥ 0.5).
    */
  final case class Model(dim: Int, biasMicro: Long, weightsMicro: Array[Long]) {
    require(weightsMicro.length == dim, s"weights length ${weightsMicro.length} != dim $dim")

    /** Nonzero (bucket, weight) pairs — the compact/pinnable form. */
    def nonZero: IndexedSeq[(Int, Long)] =
      weightsMicro.iterator.zipWithIndex.collect { case (w, b) if w != 0L => (b, w) }.toIndexedSeq
  }

  object Model {

    /** Rebuild a dense model from its pinned sparse form. */
    def fromSparse(dim: Int, biasMicro: Long, nonZero: Seq[(Int, Long)]): Model = {
      val w = new Array[Long](dim)
      nonZero.foreach { case (b, v) => w(b) = v }
      Model(dim, biasMicro, w)
    }
  }

  /** Whitespace tokens of `t` (the shared corpus tokenization — mirrors
    * `Dedup.tokens` / the oracles' tokensSql).
    */
  @inline private def toks(t: String): Array[String] =
    if (t == null) Array.empty else t.split("\\s+").filter(_.nonEmpty)

  /** `(bucket, count)` feature pairs of one document. */
  private def features(t: String, dim: Int): Array[(Int, Int)] = {
    val m = new java.util.HashMap[Int, Int]()
    toks(t).foreach { tok => m.merge(Anonymizer.stableHash(tok) % dim, 1, _ + _) }
    val out = new Array[(Int, Int)](m.size)
    var i = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue); i += 1 }
    out
  }

  /** Exact integer logit of one document under `model`. */
  private def logitMicro(feats: Array[(Int, Int)], model: Model): Long = {
    var s = model.biasMicro
    var i = 0
    while (i < feats.length) { s += feats(i)._2.toLong * model.weightsMicro(feats(i)._1); i += 1 }
    s
  }

  /** Train by full-batch gradient descent: `iters` passes, each one
    * distributed gradient-sum (`treeAggregate` of a Long array — per-doc
    * contributions rounded to micro units BEFORE summation, so the result
    * is partitioning-independent) followed by a driver-side weight update.
    * `labelCol` must be 0/1 (the weak/distilled label — e.g. "kept by the
    * LM-perplexity filter"). The feature frame is materialized once and
    * reused across iterations.
    */
  def train(
      docs: DataFrame,
      textCol: String,
      labelCol: String,
      dim: Int = 1024,
      iters: Int = 50,
      learningRate: Double = 0.5
  ): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val featRdd = docs
      .select(col(labelCol).cast("int"), col(textCol))
      .as[(Int, String)]
      .rdd
      .map { case (y, t) => (y, features(t, dim)) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = featRdd.count().toDouble
    require(nDocs > 0, "QualityClassifier.train: empty corpus")

    var model = Model(dim, 0L, new Array[Long](dim))
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(model)
      // gradMicro(dim) is the bias slot; per-doc contributions are
      // micro-rounded Longs, so the cluster-wide sum commutes exactly.
      val grad = featRdd.treeAggregate(new Array[Long](dim + 1))(
        seqOp = (acc, doc) => {
          val (y, feats) = doc
          val m = bc.value
          val p = 1.0 / (1.0 + math.exp(-logitMicro(feats, m) / 1e6))
          val err = p - y
          var i = 0
          while (i < feats.length) {
            val (b, c) = feats(i)
            acc(b) += math.rint(err * c * 1e6).toLong
            i += 1
          }
          acc(dim) += math.rint(err * 1e6).toLong
          acc
        },
        combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a }
      )
      val w = model.weightsMicro.clone()
      var b = 0
      while (b < dim) {
        w(b) -= math.rint(learningRate * grad(b) / nDocs).toLong
        b += 1
      }
      val bias = model.biasMicro - math.rint(learningRate * grad(dim) / nDocs).toLong
      bc.destroy()
      model = Model(dim, bias, w)
      it += 1
    }
    featRdd.unpersist()
    model
  }

  /** Score every document scan-local against the broadcast model:
    * `(id, logit_micro, kept)` where `kept = logit_micro ≥ 0`. Zero
    * shuffles, codegen-adjacent single UDF — the 100-TB serving path.
    */
  /** The keep flag as a scan-local Column factory — the streaming-legal
    * building block for ensembles: composes into an existing projection
    * without dropping columns the way [[score]]'s select does. Same
    * broadcast-weights UDF, same integer logit.
    */
  def keptColumn(spark: SparkSession, model: Model): org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    val bc = spark.sparkContext.broadcast(model)
    val u  = udf { (t: String) => logitMicro(features(t, bc.value.dim), bc.value) >= 0 }
    text => u(text)
  }

  def score(df: DataFrame, textCol: String, idCol: String, model: Model): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val u = udf { (t: String) => logitMicro(features(t, bc.value.dim), bc.value) }
    df.select(
      col(idCol),
      u(col(textCol)).as("logit_micro")
    ).withColumn("kept", col("logit_micro") >= 0)
  }

  /** Persist a model as two tiny parquet relations (sparse weights +
    * meta) — the train-once/serve-forever split, same pattern as the BM25
    * and signature indexes.
    */
  def persistModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    model.nonZero.toDF("bucket", "w_micro")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/weights")
    Seq((model.dim, model.biasMicro)).toDF("dim", "bias_micro")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Reload a [[persistModel]] artifact. */
  def loadModel(spark: SparkSession, path: String): Model = {
    val meta = spark.read.parquet(s"$path/meta").select("dim", "bias_micro").head
    val nz = spark.read.parquet(s"$path/weights").select("bucket", "w_micro")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    Model.fromSparse(meta.getInt(0), meta.getLong(1), nz)
  }
}
