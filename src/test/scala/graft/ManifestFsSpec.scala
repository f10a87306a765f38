package graft

import graft.operators.{Dedup, IndexStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A local filesystem that is NOT `file:` — the object-store / HDFS
  * stand-in for [[ManifestFsSpec]]. Every `file:`-scheme fast path in
  * the index substrate (java.nio O_EXCL lock creation, atomic-move
  * heartbeats, and — before manifests — the hardlink partition carry)
  * is bypassed on this scheme, so the spec exercises exactly the code a
  * non-POSIX deployment runs. It intentionally offers NO link
  * primitive: a carry here is honest only as a manifest reference or a
  * full byte copy, and the spec asserts which one happens by counting
  * physically written bytes.
  */
class NoLinkFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "nolink"
  override def getUri: java.net.URI = java.net.URI.create("nolink:///")
}

/** FileContext face of [[NoLinkFileSystem]] (the atomic pointer flip and
  * heartbeat renewal go through FileContext rename).
  */
class NoLinkAbstractFs(uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new NoLinkFileSystem, conf, "nolink", false)

/** The 100-TB claim of manifest-carried generations: selective
  * compaction writes bytes proportional to the DIRTY fraction on a
  * filesystem with no hardlinks — where the pre-manifest carry silently
  * degraded to a full byte copy of every clean partition (HDFS/object
  * stores, exactly where big indexes live). Runs the whole
  * build → append/delete → compact → probe lifecycle on the `nolink://`
  * scheme and meters physical bytes.
  */
class ManifestFsSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(ids: Range): DataFrame =
    ids.map(i => (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta doc$i word${i % 7} tail${i % 3}"))
      .toDF("doc_id", "text")

  private def parquetBytesUnder(localDir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) (if (f.getName.endsWith(".parquet")) f.length() else 0L)
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(localDir))
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  it("selective compaction on a linkless filesystem writes bytes ∝ dirty fraction, lifecycle correct") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.nolink.impl", classOf[NoLinkFileSystem].getName)
    conf.set("fs.AbstractFileSystem.nolink.impl", classOf[NoLinkAbstractFs].getName)

    val local = java.nio.file.Files.createTempDirectory("nolink_").toString
    val dir   = s"nolink://$local/idx"

    // Build (flat layout) on the linkless scheme, then purge TWO ids:
    // their band rows dirty ≤ 2·bands of 64 buckets — the small-purge
    // shape whose cost model the manifest carry exists for.
    Dedup.persistSignatureIndex(
      Dedup.buildSignatureIndex(docsDf(1 to 200), "text", "doc_id"), dir)
    val bytesBefore = parquetBytesUnder(s"$local/idx")
    Dedup.deleteFromPersistedIndex(Seq(7L, 110L).toDF("doc_id"), "doc_id", dir)

    Dedup.compactSignatureIndex(spark, dir)

    // Bytes PHYSICALLY written by the compact = what landed in the new
    // generation. With ~16 dirty buckets of 64 that must sit far below
    // the index size; the pre-manifest fallback (FileUtil.copy of every
    // clean partition) would have re-written ≈ everything.
    val genBytes = parquetBytesUnder(s"$local/idx/_gen-00001")
    assert(genBytes > 0, "dirty partitions must be physically rewritten")
    assert(genBytes.toDouble / bytesBefore < 0.5,
      s"compact wrote $genBytes of $bytesBefore bytes — carry is copying, not referencing")
    val manifest = IndexStore.readManifest(spark, s"$local/idx/_gen-00001"
      .replace(s"$local", s"nolink://$local")).get
    manifest.filterNot(_.dir.startsWith("_gen-00001/")) should not be empty // references, not copies

    // Content: probe ≡ fresh build on the survivors (the gates' oracle
    // shape, here cross-scheme).
    val fresh = java.nio.file.Files.createTempDirectory("nolink_fresh_").toString
    Dedup.persistSignatureIndex(
      Dedup.buildSignatureIndex(
        docsDf(1 to 200).where(!col("doc_id").isin(7L, 110L)), "text", "doc_id"), fresh)
    sortedRows(Dedup.matchVsPersistedIndex(docsDf(201 to 210), "text", "doc_id", dir)) shouldEqual
      sortedRows(Dedup.matchVsPersistedIndex(docsDf(201 to 210), "text", "doc_id", fresh))

    // Second lifecycle round ON TOP of the manifested generation:
    // append (physically into the live generation), delete, compact
    // again — carried homes chain back to the flat era without copies,
    // and serving stays exact.
    Dedup.persistSignatureIndex(
      Dedup.buildSignatureIndex(docsDf(211 to 230), "text", "doc_id"), dir, append = true)
    Dedup.deleteFromPersistedIndex(Seq(42L).toDF("doc_id"), "doc_id", dir)
    Dedup.compactSignatureIndex(spark, dir)
    IndexStore.currentGeneration(spark, dir) shouldBe 2
    val fresh2 = java.nio.file.Files.createTempDirectory("nolink_fresh2_").toString
    Dedup.persistSignatureIndex(
      Dedup.buildSignatureIndex(
        (docsDf(1 to 200).unionByName(docsDf(211 to 230)))
          .where(!col("doc_id").isin(7L, 110L, 42L)), "text", "doc_id"), fresh2)
    sortedRows(Dedup.matchVsPersistedIndex(docsDf(231 to 240), "text", "doc_id", dir)) shouldEqual
      sortedRows(Dedup.matchVsPersistedIndex(docsDf(231 to 240), "text", "doc_id", fresh2))
    // Vacuum on the linkless scheme: reclaims unreferenced history, keeps
    // every referenced donor byte, serving still complete.
    IndexStore.vacuum(spark, dir)
    sortedRows(Dedup.matchVsPersistedIndex(docsDf(231 to 240), "text", "doc_id", dir)) shouldEqual
      sortedRows(Dedup.matchVsPersistedIndex(docsDf(231 to 240), "text", "doc_id", fresh2))
  }
}
