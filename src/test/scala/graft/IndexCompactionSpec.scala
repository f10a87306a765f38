package graft

import graft.operators.{Dedup, IndexCompaction, Similarity, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural contract of index compaction (the correctness-vs-oracle half
  * lives in the five `*_compact` gates): tombstones are really gone,
  * append segments really fold, frozen metadata survives the swap, the
  * retire-install crash window repairs, and probes stay partition-pruned.
  */
class IndexCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def fs = new org.apache.hadoop.fs.Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def exists(p: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(p))

  private def parquetFilesUnder(dir: String): Seq[String] = {
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      val s = f.getPath.toString
      if (f.isFile && s.endsWith(".parquet") && !s.contains("/_graft_")) out += s
    }
    out.toSeq
  }

  private def docsDf(ids: Range): DataFrame =
    ids.map(i => (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta doc$i word${i % 7} tail${i % 3}"))
      .toDF("doc_id", "text")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  describe("signature-index compaction") {
    it("purges tombstoned docs, folds append segments, keeps meta, drops the tombstone set") {
      val dir = tmpDir("sigcmp_")
      Dedup.persistSignatureIndex(
        Dedup.buildSignatureIndex(docsDf(1 to 40), "text", "doc_id"), dir)
      Dedup.persistSignatureIndex(
        Dedup.buildSignatureIndex(docsDf(41 to 80), "text", "doc_id"), dir, append = true)
      Dedup.deleteFromPersistedIndex(
        (1 to 80).filter(_ % 3 == 0).map(_.toLong).toDF("doc_id"), "doc_id", dir)
      val filesBefore = parquetFilesUnder(dir).size
      val metaBefore  = sortedRows(spark.read.parquet(s"$dir/_graft_index_meta"))

      Dedup.compactSignatureIndex(spark, dir)

      exists(s"$dir/_graft_tombstones") shouldBe false
      exists(s"$dir._compact_staging") shouldBe false
      exists(s"$dir._compact_retired") shouldBe false
      sortedRows(spark.read.parquet(s"$dir/_graft_index_meta")) shouldEqual metaBefore
      parquetFilesUnder(dir).size should be < filesBefore
      // Compacted content ≡ fresh build on the survivors (banded rows).
      val fresh = tmpDir("sigcmp_fresh_")
      Dedup.persistSignatureIndex(
        Dedup.buildSignatureIndex(
          docsDf(1 to 80).where(col("doc_id") % 3 =!= 0), "text", "doc_id"), fresh)
      sortedRows(spark.read.parquet(dir)) shouldEqual sortedRows(spark.read.parquet(fresh))
      // And the probe path still works against the compacted layout.
      val probe = Dedup.matchVsPersistedIndex(docsDf(81 to 85), "text", "doc_id", dir)
      probe.columns.toSeq shouldEqual Seq("doc_id", "matched_id", "est_jaccard")
    }

    it("repairs the retire-install crash window on the next call") {
      val dir = tmpDir("sigcrash_")
      Dedup.persistSignatureIndex(
        Dedup.buildSignatureIndex(docsDf(1 to 30), "text", "doc_id"), dir)
      val content = sortedRows(spark.read.parquet(dir))
      // Simulate a crash between retire and install: the index exists only
      // at the retired path.
      val p = new org.apache.hadoop.fs.Path(dir)
      fs.rename(p, new org.apache.hadoop.fs.Path(dir + "._compact_retired")) shouldBe true
      exists(dir) shouldBe false

      Dedup.compactSignatureIndex(spark, dir) // repairs, then compacts

      exists(dir) shouldBe true
      exists(s"$dir._compact_retired") shouldBe false
      sortedRows(spark.read.parquet(dir)) shouldEqual content
    }
  }

  describe("jaccard-index compaction") {
    it("rewrites both relations minus tombstones and preserves the frozen dictionary") {
      val dir  = tmpDir("jaccmp_")
      val sets = docsDf(1 to 40).select(col("doc_id"), Dedup.wordNgrams(col("text"), 3).as("bg"))
      Dedup.persistJaccardIndex(sets, "bg", "doc_id", dir, thresholdMilli = 600)
      val dictBefore = sortedRows(spark.read.parquet(s"$dir/_graft_jidx_dict"))
      Dedup.deleteFromPersistedIndex(
        (1 to 40).filter(_ % 3 == 0).map(_.toLong).toDF("doc_id"), "doc_id", dir)

      Dedup.compactJaccardIndex(spark, dir)

      exists(s"$dir/_graft_tombstones") shouldBe false
      sortedRows(spark.read.parquet(s"$dir/_graft_jidx_dict")) shouldEqual dictBefore
      spark.read.parquet(s"$dir/postings").where(col("doc_id") % 3 === 0).count() shouldBe 0L
      spark.read.parquet(s"$dir/fullsets").where(col("doc_id") % 3 === 0).count() shouldBe 0L
    }
  }

  describe("bm25-index compaction") {
    it("recounts doc_freq exactly and purges docs/postings") {
      val dir = tmpDir("bmcmp_")
      TextAnalysis.persistBm25Index(
        TextAnalysis.buildBm25Index(docsDf(1 to 30), "text", "doc_id"), dir)
      TextAnalysis.appendToBm25Index(docsDf(31 to 60), "text", "doc_id", dir)
      TextAnalysis.deleteFromBm25Index(
        (1 to 60).filter(_ % 3 == 0).map(_.toLong).toDF("doc_id"), "doc_id", dir)

      TextAnalysis.compactBm25Index(spark, dir)

      exists(s"$dir/_graft_tombstones") shouldBe false
      spark.read.parquet(s"$dir/postings").where(col("doc_id") % 3 === 0).count() shouldBe 0L
      spark.read.parquet(s"$dir/docs").where(col("doc_id") % 3 === 0).count() shouldBe 0L
      // Term stats after compaction = one exact row per term: a fresh build
      // on the survivors agrees term-for-term.
      val freshIdx = TextAnalysis.buildBm25Index(
        docsDf(1 to 60).where(col("doc_id") % 3 =!= 0), "text", "doc_id")
      val compactTerms = spark.read.parquet(s"$dir/terms").select("term", "doc_freq")
      sortedRows(compactTerms) shouldEqual sortedRows(freshIdx.terms.select("term", "doc_freq"))
    }
  }

  describe("ivf-index compaction") {
    it("purges tombstoned vectors, folds cell segments, and carries the frozen centroids") {
      val dir = tmpDir("ivfcmp_")
      def emb(ids: Range): DataFrame = ids.map { i =>
        (i.toLong, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))
      }.toDF("vec_id", "embedding")
      val cents = Array.tabulate(4)(c => Array.tabulate(8)(d => (c + d % 3).toDouble))
      Similarity.persistIvfIndex(emb(1 to 40), "vec_id", "embedding", cents, dir)
      Similarity.appendToIvfIndex(emb(41 to 80), "vec_id", "embedding", dir)
      Similarity.deleteFromIvfIndex(
        (1 to 80).filter(_ % 3 == 0).map(_.toLong).toDF("vec_id"), "vec_id", dir)
      val filesBefore = parquetFilesUnder(dir).size
      val centsBefore = sortedRows(spark.read.parquet(s"$dir/_graft_centroids"))

      Similarity.compactIvfIndex(spark, dir)

      exists(s"$dir/_graft_tombstones") shouldBe false
      sortedRows(spark.read.parquet(s"$dir/_graft_centroids")) shouldEqual centsBefore
      parquetFilesUnder(dir).size should be < filesBefore
      val left = spark.read.parquet(dir)
      left.where(col("vec_id") % 3 === 0).count() shouldBe 0L
      left.count() shouldBe (1 to 80).count(_ % 3 != 0).toLong
    }
  }

  describe("fingerprint-index compaction") {
    it("is a no-op on content when nothing was ever deleted (segments still fold)") {
      val dir = tmpDir("fpcmp_")
      val fps = (1 to 40).map(i => (i.toLong, (i * 2654435761L) & ((1L << 63) - 1)))
        .toDF("doc_id", "fp")
      Dedup.persistFingerprintIndex(fps.where(col("doc_id") <= 20), "doc_id", "fp", dir,
        maxHamming = 3, fpBits = 63)
      Dedup.persistFingerprintIndex(fps.where(col("doc_id") > 20), "doc_id", "fp", dir,
        maxHamming = 3, fpBits = 63, append = true)
      val contentBefore = sortedRows(spark.read.parquet(dir))
      val filesBefore   = parquetFilesUnder(dir).size

      Dedup.compactFingerprintIndex(spark, dir)

      sortedRows(spark.read.parquet(dir)) shouldEqual contentBefore
      parquetFilesUnder(dir).size should be < filesBefore
    }
  }

  describe("compaction swap helper") {
    it("leaves no staging or retired residue on the happy path") {
      val dir = tmpDir("swap_")
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .withColumn("bucket", pmod(col("id"), lit(2)).cast("int"))
        .write.partitionBy("bucket").parquet(s"$dir/data")
      IndexCompaction.rewrite(spark, s"$dir/data", Set.empty) { staging =>
        spark.read.parquet(s"$dir/data")
          .repartition(col("bucket")).write.partitionBy("bucket").parquet(staging)
      }
      exists(s"$dir/data._compact_staging") shouldBe false
      exists(s"$dir/data._compact_retired") shouldBe false
      spark.read.parquet(s"$dir/data").count() shouldBe 2L
    }
  }
}
