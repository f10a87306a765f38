package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the product-quantization tradeoff the `q_knn_pq_*` gates pin
  * only the exact half of: per-vector memory (the reason PQ exists at
  * 10⁹ vectors — embeddings stop fitting executor memory long before
  * compute runs out), ADC-only recall@k vs the exact ranking (the
  * quality cost of the m-lookup approximation, NO rescore), and probe
  * wall time brute vs two-stage vs IVF-PQ.
  *
  * Usage: runMain graft.tools.PqSoak <sfDir> [copies]
  * `copies` > 1 appends substitution-shifted copies of the corpus (ids
  * offset, components rotated) to measure at ×N.
  */
object PqSoak {

  def main(args: Array[String]): Unit = {
    val sfDir  = args(0)
    val copies = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tpch.table(spark, sfDir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val maxId = base.agg(max(col("vec_id"))).head.getLong(0)
    val corpus = (0 until copies).map { c =>
      if (c == 0) base
      else base.select((col("vec_id") + lit(c * (maxId + 1))).as("vec_id"),
        // Component rotation keeps the value distribution, moves identity.
        expr(s"concat(slice(embedding, ${c % 63 + 1} + 1, 9999), slice(embedding, 1, ${c % 63 + 1}))")
          .cast("array<float>").as("embedding"))
    }.reduce(_ unionByName _).cache()
    val n    = corpus.count()
    val dims = corpus.select(size(col("embedding"))).head.getInt(0)
    val queries = corpus.where("vec_id < 20").cache(); queries.count()

    val model = Similarity.pqTrain(corpus, "vec_id", "embedding", m = 16, k = 64)
    val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", model).cache()
    codes.count()

    def time[T](f: => T): (Double, T) = {
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
      }
      best.minBy(_._1)
    }

    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 10,
      guard = Similarity.ExactGuard.Off).cache()
    val (tBrute, _) = time(exact.count())

    // ADC-ONLY ranking (no rescore): shortlist = k, rescore trivial.
    val adcOnly = Similarity.pqAdcTopK(corpus, queries, "vec_id", "embedding", model,
      k = 10, shortlist = 10)
    val (tAdc, _) = time(adcOnly.count())
    def recallOf(approx: DataFrame): Double = {
      val r = Similarity.recallAtK(approx, exact)
        .agg(sum("n_hits").cast("double"), sum("n_exact").cast("double")).head
      r.getDouble(0) / r.getDouble(1)
    }
    val recallAdc = recallOf(adcOnly)

    val twoStage = Similarity.pqAdcTopK(corpus, queries, "vec_id", "embedding", model,
      k = 10, shortlist = 128)
    val (tTwo, _) = time(twoStage.count())
    val recallTwo = recallOf(twoStage)

    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding",
      nlist = math.max(16, math.min(256, math.round(4 * math.sqrt(n.toDouble)).toInt)))
    val ivfPq = Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding", cents, model,
      k = 10, nprobe = math.max(2, cents.length / 16), shortlist = 128)
    val (tIvfPq, _) = time(ivfPq.count())
    val recallIvfPq = recallOf(ivfPq)

    val bytesExact = dims * 4
    val bytesPq    = model.m + 4 // one byte per subspace + the float norm
    println(f"[pqsoak] n=$n%7d dims=$dims m=${model.m} k=${model.k} " +
      f"bytes/vec exact=$bytesExact pq=$bytesPq (x${bytesExact.toDouble / bytesPq}%.0f) " +
      f"wall: brute=$tBrute%.2f adcOnly=$tAdc%.2f twoStage=$tTwo%.2f ivfPq(nlist=${cents.length},nprobe=${math.max(2, cents.length / 16)})=$tIvfPq%.2f s " +
      f"recall@10: adcOnly=$recallAdc%.3f twoStage=$recallTwo%.3f ivfPq=$recallIvfPq%.3f")
    spark.stop()
  }
}
