package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline (query set × corpus —
  * fine when the query side is small/broadcastable). The scale path is
  * deterministic random-hyperplane LSH: vectors sharing a bucket signature
  * are the only candidates, turning top-k into a bucket-local problem.
  */
object Similarity {

  /** Cosine similarity of two float vectors, computed in double in index
    * order (a single aggregate pass; matches a sequential-sum oracle).
    */
  def cosine(a: Column, b: Column): Column = {
    val prods = zip_with(a, b, (x, y) => x.cast("double") * y.cast("double"))
    val dot   = aggregate(prods, lit(0.0), (acc, v) => acc + v)
    val na    = aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    val nb    = aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    dot / sqrt(na * nb)
  }

  /** Exact top-k neighbors for each query vector (brute force).
    *
    * Scale notes: `queries` is expected to be small — Spark broadcasts it
    * under AQE; the corpus is never shuffled, each partition scores its
    * rows and the per-query top-k is a k-bounded window.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      includeSelf: Boolean = false
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val joined = q
      .join(c, if (includeSelf) lit(true) else col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    joined
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
  }

  /** Deterministic pseudo-random hyperplane component: ±1 derived from the
    * MD5 stableHash of (plane, dim) — reproducible across runs/engines with
    * no RNG state.
    */
  private def planeSign(plane: Int, dim: Column): Column =
    when(HashCols.stableHash(concat(lit(s"hp$plane#"), dim)) % 2 === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Random-hyperplane LSH bucket signature: bit p = sign(v · h_p), packed
    * into a long. Vectors with equal signatures are near-duplicate
    * candidates; Hamming-close signatures are neighbor candidates.
    */
  def hyperplaneSignature(vec: Column, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val dotP = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (v, i) => v.cast("double") * planeSign(p, i)),
        lit(0.0),
        (acc, v) => acc + v
      )
      when(dotP > 0, lit(1L
        << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Bucket each vector by its hyperplane signature — the ANN scale path:
    * one narrow shuffle on the signature, candidate sets are bucket-local.
    */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String, numPlanes: Int = 16): DataFrame =
    df.select(col(idCol), col(vecCol), hyperplaneSignature(col(vecCol), numPlanes).as("bucket"))

  /** Approximate top-k: exact scoring restricted to same-bucket candidates. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int = 8
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = lshBuckets(queries, idCol, vecCol, numPlanes).toDF("query_id", "q_vec", "bucket")
    val c = lshBuckets(corpus, idCol, vecCol, numPlanes).toDF("neighbor_id", "c_vec", "bucket")
    val joined = q
      .join(c, "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    joined.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
  }
}
