package graft

import graft.dsl.TableSpec
import graft.operators.{Dedup, Similarity}
import graft.plans.SelfRefClosure
import org.apache.spark.sql.DataFrame

/** Scale-correctness evidence: operator results must be IDENTICAL under
  * different physical partitionings — the local stand-in for "would this
  * produce the same answer on 1000 executors as on 1". Each case runs an
  * operator on a 1-partition and a 7-partition copy of the same data and
  * compares exact result sets.
  */
class PartitionInvarianceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1 to 60).map { i =>
    val base = s"document number $i about spark query engines and data processing pipelines"
    (i.toLong, if (i % 7 == 0) base + " near duplicate variant" else base + s" unique tail $i")
  }.toDF("doc_id", "text")

  private def resultSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def invariant(name: String)(f: DataFrame => DataFrame): Unit =
    it(s"$name is partition-invariant") {
      resultSet(f(docs.repartition(1))) shouldBe resultSet(f(docs.repartition(7)))
    }

  describe("dedup operators") {
    invariant("exactDuplicates")(d => Dedup.exactDuplicates(d, "text", "doc_id"))
    invariant("ngramJaccardPairs")(d => Dedup.ngramJaccardPairs(d, "text", "doc_id", threshold = 0.7))
    invariant("minHashLshPairs")(d => Dedup.minHashLshPairs(d, "text", "doc_id", threshold = 0.7))
    invariant("simHash32")(d => d.select(org.apache.spark.sql.functions.col("doc_id"), Dedup.simHash32(org.apache.spark.sql.functions.col("text"))))
    invariant("duplicateClusters")(d =>
      Dedup.duplicateClusters(Dedup.ngramJaccardPairs(d, "text", "doc_id", threshold = 0.7)))
    invariant("exciseSharedSubstrings")(d =>
      Dedup.exciseSharedSubstrings(d, "text", "doc_id", k = 20))
    // Exact regime only: under eviction a Misra-Gries summary's CONTENT
    // legitimately depends on merge order; with capacity above the
    // vocabulary the sketch is exact and must not care how data is split.
    invariant("heavyHitterTerms (exact regime)")(d =>
      graft.operators.Profiler.heavyHitterTerms(d, "text", topK = 10, capacity = 4096))
    invariant("TopK.perKey")(d =>
      graft.operators.TopK.perKey(
        d.selectExpr("doc_id % 5 AS k", "CAST(doc_id % 13 AS DOUBLE) AS v", "doc_id"),
        Seq("k"), "v", "doc_id", k = 4))
    invariant("Sampling.shuffleOrder")(d =>
      graft.operators.Sampling.shuffleOrder(d.select("doc_id"), "doc_id", salt = "e:", buckets = 8))
    invariant("Skew.saltedJoin")(d => {
      val dim = (0 to 9).map(i => (i.toLong, s"label$i")).toDF("k", "label")
      graft.plans.Skew.saltedJoin(
        d.selectExpr("doc_id", "doc_id % 10 AS k"), dim, Seq("k"), saltFrom = "doc_id", salts = 8)
    })
  }

  describe("closure and anonymization") {
    invariant("SelfRefClosure")(d => {
      val h = d.selectExpr("doc_id AS id", "CASE WHEN doc_id > 1 THEN doc_id div 2 END AS parent_id")
      SelfRefClosure.filterReachable(h, h, Seq("parent_id"), Seq("id"))
    })
    invariant("TableSpec anonymization")(d =>
      TableSpec.select(row => Seq(row.doc_id, row.text.mapString(graft.functions.Anonymizer.LoremText))).compile(d))
  }

  describe("similarity") {
    lazy val vecs = (1 to 40)
      .map(i => (i.toLong, Array.tabulate(8)(j => ((i * 31 + j * 7) % 100) / 100.0f)))
      .toDF("vec_id", "embedding")

    it("bruteForceTopK is partition-invariant") {
      def run(n: Int) = Similarity.bruteForceTopK(
        vecs.repartition(n), vecs.where("vec_id <= 3").repartition(n), "vec_id", "embedding", k = 5)
      resultSet(run(1)) shouldBe resultSet(run(7))
    }
    it("embeddingNearDuplicates is partition-invariant") {
      def run(n: Int) =
        Dedup.embeddingNearDuplicates(vecs.repartition(n), "vec_id", "embedding", threshold = 0.9)
      resultSet(run(1)) shouldBe resultSet(run(7))
    }
  }

  describe("analytics wave") {
    // Synthetic event log derived deterministically from the doc ids:
    // ~12 users, interleaved stage types, value keyed off the id.
    invariant("EventAnalytics.funnel")(d =>
      graft.operators.EventAnalytics.funnel(
        d.selectExpr(
          "doc_id % 12 AS user_id",
          "doc_id * 1000000 AS tus",
          "element_at(array('signup','view','click','purchase','error'), CAST(doc_id % 5 AS INT) + 1) AS event_type"),
        "user_id", "tus", "event_type", Seq("signup", "view", "click", "purchase")))
    invariant("Quantiles.groupedExact")(d =>
      graft.operators.Quantiles.groupedExact(
        d.selectExpr("doc_id % 4 AS g", "CAST(doc_id % 17 AS DOUBLE) / 3 AS v"),
        Seq("g"), "v", scale = 100, qs = Seq(("p50", 0.5), ("p90", 0.9))))
    invariant("LinkGraph.triangleCount")(d =>
      graft.operators.LinkGraph.triangleCount(
        d.selectExpr("doc_id AS src", "(doc_id * 7 + 1) % 60 AS dst")
          .unionAll(d.selectExpr("doc_id AS src", "(doc_id * 13 + 2) % 60 AS dst"))))
    invariant("Profiler.zScoreOutliers")(d =>
      graft.operators.Profiler.zScoreOutliers(
        d.selectExpr("doc_id % 3 AS g", "CAST(CASE WHEN doc_id = 59 THEN 500 ELSE doc_id % 7 END AS DOUBLE) AS v"),
        Seq("g"), "v"))
    invariant("Privacy.noisySums")(d =>
      graft.operators.Privacy.noisySums(
        d.selectExpr("doc_id % 4 AS g", "doc_id % 9 AS u", "CAST(doc_id % 11 AS DOUBLE) AS v"),
        Seq("g"), "u", "v", clampFp = 300L, seed = "inv"))
  }
}
