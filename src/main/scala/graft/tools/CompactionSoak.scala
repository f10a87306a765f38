package graft.tools

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the lifecycle claim behind index compaction: probe cost GROWS
  * as append segments and tombstones accumulate across forget cycles, and
  * returns to build-fresh after `compact*` — the SCALE.md evidence for
  * the round-11 compaction work, on the two structurally different
  * families (banded signature index; BM25 postings + additive stats).
  *
  * Usage: runMain graft.tools.CompactionSoak <sfDir> [cycles]
  * Each cycle appends a full shifted copy of the corpus and tombstones a
  * third of all live ids, then times a FIXED probe batch (best of 2).
  * After the last cycle the index is compacted and the same probe runs
  * again — the row to compare against cycle 0.
  */
object CompactionSoak {

  private def bestOf2(f: () => Long): (Double, Long) = {
    val runs = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      val n  = f()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    runs.minBy(_._1)
  }

  private def parquetFiles(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isFile) (if (f.getName.endsWith(".parquet")) 1 else 0)
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
    walk(new java.io.File(dir))
  }

  def main(args: Array[String]): Unit = {
    val sfDir  = args(0)
    val cycles = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs  = graft.Tpch.table(spark, sfDir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    val probeDocs = docs.where(col("doc_id") % 17 === 3)
      .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
      .cache()
    probeDocs.count()

    // ---- signature index -------------------------------------------------
    val sigDir = java.nio.file.Files.createTempDirectory("cmp_soak_sig_").toString
    Dedup.persistSignatureIndex(Dedup.buildSignatureIndex(docs, "text", "doc_id"), sigDir)
    def sigProbe() = bestOf2(() =>
      Dedup.matchVsPersistedIndex(probeDocs, "text", "doc_id", sigDir).count())
    def row(tag: String, dir: String, t: (Double, Long)): Unit =
      println(f"[cmpsoak] $tag%-22s ${t._1}%7.2f s  ${t._2}%8d matches  ${parquetFiles(dir)}%5d files")
    row("sig cycle0 (fresh)", sigDir, sigProbe())
    (1 to cycles).foreach { c =>
      Dedup.persistSignatureIndex(
        Dedup.buildSignatureIndex(
          docs.select((col("doc_id") + lit(c * (maxId + 1))).as("doc_id"), col("text")),
          "text", "doc_id"),
        sigDir, append = true)
      Dedup.deleteFromPersistedIndex(
        docs.where(col("doc_id") % 3 === (c % 3)).select((col("doc_id") + lit(c * (maxId + 1))).as("doc_id")),
        "doc_id", sigDir)
      row(s"sig cycle$c", sigDir, sigProbe())
    }
    val tC0 = System.nanoTime()
    Dedup.compactSignatureIndex(spark, sigDir)
    println(f"[cmpsoak] sig compact took ${(System.nanoTime() - tC0) / 1e9}%.2f s")
    row("sig after-compact", sigDir, sigProbe())

    // ---- BM25 index ------------------------------------------------------
    val bmDir = java.nio.file.Files.createTempDirectory("cmp_soak_bm_").toString
    TextAnalysis.persistBm25Index(TextAnalysis.buildBm25Index(docs, "text", "doc_id"), bmDir)
    val spark2 = spark
    import spark2.implicits._
    val queries = Seq(
      (1L, "spark join window"), (2L, "hash merge sort batch"),
      (3L, "customer filter query"), (4L, "scan"), (5L, "stream data value key")
    ).toDF("query_id", "q_text")
    def bmProbe() = bestOf2(() =>
      TextAnalysis.bm25TopKFromPersisted(spark, bmDir, queries, "query_id", "q_text", k = 10).count())
    row("bm25 cycle0 (fresh)", bmDir, bmProbe())
    (1 to cycles).foreach { c =>
      TextAnalysis.appendToBm25Index(
        docs.select((col("doc_id") + lit(c * (maxId + 1))).as("doc_id"), col("text")),
        "text", "doc_id", bmDir)
      TextAnalysis.deleteFromBm25Index(
        docs.where(col("doc_id") % 3 === (c % 3)).select((col("doc_id") + lit(c * (maxId + 1))).as("doc_id")),
        "doc_id", bmDir)
      row(s"bm25 cycle$c", bmDir, bmProbe())
    }
    val tC1 = System.nanoTime()
    TextAnalysis.compactBm25Index(spark, bmDir)
    println(f"[cmpsoak] bm25 compact took ${(System.nanoTime() - tC1) / 1e9}%.2f s")
    row("bm25 after-compact", bmDir, bmProbe())

    spark.stop()
  }
}
