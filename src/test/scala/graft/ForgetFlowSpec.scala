package graft

import graft.operators.{CorpusPipeline, Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** One forget call, five serving surfaces: after
  * [[CorpusPipeline.forgetDocuments]] fans a deletion request across the
  * MinHash-signature, image-fingerprint, Jaccard-prefix, IVF, and BM25
  * indexes, no probe of ANY surface may return a forgotten id — and every
  * non-forgotten result must be exactly what it was before (logical
  * deletes subtract, never perturb).
  */
class ForgetFlowSpec extends SparkSpec {
  import spark.implicits._

  private def rmTree(p: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(p))
  }

  it("forgetDocuments erases ids from all five index families in one call") {
    // Ten near-identical docs (shared body, distinct tail) so every probe
    // matches several of them on every surface.
    val docs = (0L until 10L).map(i =>
      (i, s"shared document body words alpha beta gamma delta tail$i more shared words"))
      .toDF("doc_id", "text")
    val probes = Seq((100L, "shared document body words alpha beta gamma delta tailX more shared words"))
      .toDF("doc_id", "text")
    val fps  = docs.select(col("doc_id"),
      Multimodal.imageDHash(Multimodal.syntheticPngTextured(col("doc_id"))).as("fp"))
    val fpProbes = Seq((100L, 0L)).toDF("doc_id", "seed")
      .select(col("doc_id"),
        Multimodal.imageDHash(Multimodal.syntheticPngTexturedJittered(col("seed"))).as("fp"))
    val sets = docs.select(col("doc_id"), Dedup.wordBigrams(col("text")).as("bg"))
    // Embeddings: docs 0..9 all near one direction so a query's top-k
    // includes several of them.
    val emb = (0L until 10L).map(i =>
      (i, Array(1.0f, 0.001f * i, 0.5f))).toDF("vec_id", "embedding")
    val embProbe = Seq((100L, Array(1.0f, 0.005f, 0.5f))).toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0, 0.5), Array(-1.0, 0.0, -0.5))

    val root = java.nio.file.Files.createTempDirectory("forget_").toString
    val (sig, fpp, jac, ivf, bm) =
      (s"$root/sig", s"$root/fp", s"$root/jac", s"$root/ivf", s"$root/bm25")
    try {
      Dedup.persistSignatureIndex(Dedup.buildSignatureIndex(docs, "text", "doc_id"), sig)
      Dedup.persistFingerprintIndex(fps, "doc_id", "fp", fpp, maxHamming = 3, fpBits = 63)
      Dedup.persistJaccardIndex(sets, "bg", "doc_id", jac, thresholdMilli = 500)
      Similarity.persistIvfIndex(emb, "vec_id", "embedding", cents, ivf)
      TextAnalysis.persistBm25Index(TextAnalysis.buildBm25Index(docs, "text", "doc_id"), bm)

      def surfaces(): Map[String, Set[Long]] = Map(
        "sig" -> Dedup.matchVsPersistedIndex(probes, "text", "doc_id", sig, estThreshold = 0.5)
          .select("matched_id").as[Long].collect().toSet,
        "fp" -> Dedup.matchVsFingerprintIndex(fpProbes, "doc_id", "fp", fpp)
          .select("matched_id").as[Long].collect().toSet,
        "jac" -> Dedup.matchVsJaccardIndex(
            probes.select(col("doc_id"), Dedup.wordBigrams(col("text")).as("bg")),
            "bg", "doc_id", jac)
          .select("matched_id").as[Long].collect().toSet,
        "ivf" -> Similarity.ivfTopKFromPersisted(spark, ivf, embProbe, "vec_id", "embedding",
            k = 8, nprobe = 2)
          .select("neighbor_id").as[Long].collect().toSet,
        "bm25" -> TextAnalysis.bm25TopKFromPersisted(spark, bm,
            Seq((1L, "alpha beta gamma")).toDF("query_id", "q_text"), "query_id", "q_text", k = 8)
          .select("doc_id").as[Long].collect().toSet
      )

      val before = surfaces()
      val forgotten = Set(0L, 3L, 7L)
      before.foreach { case (name, ids) =>
        withClue(s"$name before forget: ") { (ids & forgotten) should not be empty }
      }

      val receipt = CorpusPipeline.forgetDocuments(
        forgotten.toSeq.toDF("doc_id"), "doc_id", Seq(sig, fpp, jac, ivf, bm))
      receipt.count() shouldBe 5L
      receipt.select("forgotten_ids").as[Long].collect().toSet shouldBe Set(3L)

      val after = surfaces()
      after.foreach { case (name, ids) =>
        withClue(s"$name after forget: ") { (ids & forgotten) shouldBe empty }
      }
      // Subtraction only: survivors unchanged on the match surfaces (the
      // top-k surfaces may PROMOTE new survivors into freed slots, which
      // is the correct serving semantics — assert no survivor was lost).
      Seq("sig", "fp", "jac").foreach { name =>
        withClue(s"$name survivors: ") { after(name) shouldBe (before(name) -- forgotten) }
      }
      Seq("ivf", "bm25").foreach { name =>
        withClue(s"$name survivors: ") {
          (before(name) -- forgotten).subsetOf(after(name)) shouldBe true
        }
      }
    } finally rmTree(root)
  }
}
