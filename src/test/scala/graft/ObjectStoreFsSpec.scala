package graft

import graft.operators.{Dedup, IndexStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A local filesystem that behaves like an S3-class OBJECT STORE at the
  * commit layer:
  *
  *  - `rename` is COPY + DELETE — functional but NOT atomic as a pair
  *    (exactly what S3A's rename is), and
  *  - the scheme has NO AbstractFileSystem binding, so
  *    `FileContext.getFileContext` throws `UnsupportedFileSystemException`
  *    exactly as it does for `s3a://`.
  *
  * Every FileContext-rename fast path in the index substrate is therefore
  * unavailable on this scheme; a green lifecycle proves the rename-free
  * pointer publish (create-exclusive `_graft_current.<n>`) and the
  * object-store fallbacks (overwrite-PUT metadata replace, converging
  * copy+delete data install) — the protocol the header of
  * [[graft.operators.IndexStore]] claims for object stores.
  */
class NonAtomicRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "objstore"
  override def getUri: java.net.URI = java.net.URI.create("objstore:///")
  override def rename(src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Boolean =
    try {
      if (!exists(src)) false
      else org.apache.hadoop.fs.FileUtil.copy(this, src, this, dst,
        /* deleteSource = */ true, /* overwrite = */ true, getConf)
    } catch { case _: java.io.IOException => false }
}

/** A filesystem that REFUSES to create pending markers — the injected
  * failure for the marker-create-must-abort contract: an install that
  * cannot mark itself pending must not move a byte, or a mid-install
  * crash would later be adopted as a complete batch.
  */
class PendingCreateFailFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "pendfail"
  override def getUri: java.net.URI = java.net.URI.create("pendfail:///")
  private def refuse(f: org.apache.hadoop.fs.Path): Unit =
    if (f.getName.endsWith(".pending"))
      throw new java.io.IOException(s"injected: pending marker create refused for $f")
  // Both public create chains RawLocalFileSystem exposes — the simple
  // overload does not route through the permission one.
  override def create(
      f: org.apache.hadoop.fs.Path,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    refuse(f)
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
  override def create(
      f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    refuse(f)
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }
}

class ObjectStoreFsSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(ids: Range): DataFrame =
    ids.map(i => (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta doc$i word${i % 7} tail${i % 3}"))
      .toDF("doc_id", "text")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def filesUnder(localDir: String): Seq[String] = {
    def walk(f: java.io.File): Seq[String] =
      if (f.isFile) Seq(f.getName)
      else Option(f.listFiles()).map(_.toSeq.flatMap(walk)).getOrElse(Seq.empty)
    walk(new java.io.File(localDir))
  }

  it("full index lifecycle is green on a non-atomic-rename, FileContext-less object-store scheme") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.objstore.impl", classOf[NonAtomicRenameFileSystem].getName)

    val local = java.nio.file.Files.createTempDirectory("objstore_").toString
    val dir   = s"objstore://$local/idx"

    // Premise pin: this scheme genuinely has no FileContext face — the
    // exact S3A situation the fallbacks exist for.
    intercept[org.apache.hadoop.fs.UnsupportedFileSystemException] {
      org.apache.hadoop.fs.FileContext.getFileContext(
        java.net.URI.create("objstore:///"), conf)
    }

    // Build (flat) → delete → selective compact: the publish is the
    // rename-free create-exclusive pointer, the carry is manifest lines.
    Dedup.persistSignatureIndex(
      Dedup.buildSignatureIndex(docsDf(1 to 200), "text", "doc_id"), dir)
    Dedup.deleteFromPersistedIndex(Seq(7L, 110L).toDF("doc_id"), "doc_id", dir)
    Dedup.compactSignatureIndex(spark, dir)
    IndexStore.currentGeneration(spark, dir) shouldBe 1
    // The versioned pointer IS the commit; no legacy content pointer left.
    filesUnder(s"$local/idx") should contain("_graft_current.1")
    filesUnder(s"$local/idx") should not contain "_graft_current"

    val fresh = java.nio.file.Files.createTempDirectory("objstore_fresh_").toString
    Dedup.persistSignatureIndex(
      Dedup.buildSignatureIndex(
        docsDf(1 to 200).where(!col("doc_id").isin(7L, 110L)), "text", "doc_id"), fresh)
    sortedRows(Dedup.matchVsPersistedIndex(docsDf(201 to 210), "text", "doc_id", dir)) shouldEqual
      sortedRows(Dedup.matchVsPersistedIndex(docsDf(201 to 210), "text", "doc_id", fresh))

    // Exactly-once stream append: the install path runs the copy+delete
    // fallback (no FileContext) under deterministic sb- names; a second
    // call with the SAME (streamId, batchId) must converge, not double.
    val batch = Dedup.buildSignatureIndex(docsDf(211 to 230), "text", "doc_id")
    Dedup.appendToSignatureIndexExactlyOnce(batch, dir, "st", 1L)
    Dedup.appendToSignatureIndexExactlyOnce(batch, dir, "st", 1L) // retry replay
    Dedup.compactSignatureIndex(spark, dir)
    IndexStore.currentGeneration(spark, dir) shouldBe 2
    filesUnder(s"$local/idx") should contain("_graft_current.2")
    filesUnder(s"$local/idx") should not contain "_graft_current.1" // pruned

    val fresh2 = java.nio.file.Files.createTempDirectory("objstore_fresh2_").toString
    Dedup.persistSignatureIndex(
      Dedup.buildSignatureIndex(
        docsDf(1 to 200).unionByName(docsDf(211 to 230))
          .where(!col("doc_id").isin(7L, 110L)), "text", "doc_id"), fresh2)
    sortedRows(Dedup.matchVsPersistedIndex(docsDf(231 to 240), "text", "doc_id", dir)) shouldEqual
      sortedRows(Dedup.matchVsPersistedIndex(docsDf(231 to 240), "text", "doc_id", fresh2))

    // Retention on the same scheme: vacuum keeps serving complete.
    IndexStore.vacuum(spark, dir)
    sortedRows(Dedup.matchVsPersistedIndex(docsDf(231 to 240), "text", "doc_id", dir)) shouldEqual
      sortedRows(Dedup.matchVsPersistedIndex(docsDf(231 to 240), "text", "doc_id", fresh2))
  }

  it("pointer resolution: versioned beats legacy, highest n wins, next publish prunes") {
    // Crash-window pins for the rename-free publish: a crash between
    // creating _graft_current.<n> and pruning leaves BOTH the legacy
    // content pointer and/or older versioned pointers on disk — readers
    // must resolve the highest versioned pointer, and the next publish
    // must repair the leftovers.
    val dir = java.nio.file.Files.createTempDirectory("ptrres_").toString
    Dedup.persistSignatureIndex(
      Dedup.buildSignatureIndex(docsDf(1 to 40), "text", "doc_id"), dir)
    Dedup.deleteFromPersistedIndex(Seq(3L).toDF("doc_id"), "doc_id", dir)
    Dedup.compactSignatureIndex(spark, dir) // publishes _graft_current.1
    IndexStore.currentGeneration(spark, dir) shouldBe 1

    // Plant the crash leftovers: a STALE legacy pointer naming gen 1 and
    // a stale lower versioned pointer — then publish gen 2.
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val legacy = new org.apache.hadoop.fs.Path(dir, "_graft_current")
    val out = fs.create(legacy, true)
    out.write("_gen-00001\n".getBytes("UTF-8")); out.close()
    IndexStore.currentGeneration(spark, dir) shouldBe 1 // versioned .1 still wins

    Dedup.deleteFromPersistedIndex(Seq(5L).toDF("doc_id"), "doc_id", dir)
    Dedup.compactSignatureIndex(spark, dir) // publishes .2, prunes .1 + legacy
    IndexStore.currentGeneration(spark, dir) shouldBe 2
    filesUnder(dir) should contain("_graft_current.2")
    filesUnder(dir) should not contain "_graft_current.1"
    filesUnder(dir) should not contain "_graft_current"

    // A leftover HIGHER versioned pointer from a fenced rival can never
    // exist (create-exclusive + fence), but a lower one must lose: plant
    // .1 again and confirm resolution is still gen 2.
    IndexStore.currentGeneration(spark, dir) shouldBe 2
    fs.create(new org.apache.hadoop.fs.Path(dir, "_graft_current.1"), true).close()
    IndexStore.currentGeneration(spark, dir) shouldBe 2
  }

  it("a failed pending-marker create aborts the install LOUDLY before any byte moves") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.pendfail.impl", classOf[PendingCreateFailFileSystem].getName)

    val local = java.nio.file.Files.createTempDirectory("pendfail_").toString
    val dir   = s"pendfail://$local/idx"
    Dedup.persistSignatureIndex(
      Dedup.buildSignatureIndex(docsDf(1 to 50), "text", "doc_id"), dir)
    val before = filesUnder(s"$local/idx")

    val ex = intercept[IllegalStateException] {
      Dedup.appendToSignatureIndexExactlyOnce(
        Dedup.buildSignatureIndex(docsDf(51 to 60), "text", "doc_id"), dir, "st", 0L)
    }
    ex.getMessage should include("pending marker")

    // Nothing landed and nothing staged: the batch is fully retryable.
    val after = filesUnder(s"$local/idx")
    after.filter(_.startsWith("sb-")) shouldBe empty
    after.toSet shouldEqual before.toSet
  }

  it("relStats' fallback reads a stream-batch-only partition as APPEND mass, not a clean base") {
    // A partition created ENTIRELY by stream appends since the last
    // compact (no manifest entry): its single large sb- file must read
    // as baseFiles = 0 / dirty — not masquerade as a clean base that
    // keeps the byte-mass trigger blind until a second file lands.
    val dir = java.nio.file.Files.createTempDirectory("sbfallback_").toString
    Seq((1L, 42)).toDF("doc_id", "v").coalesce(1)
      .write.parquet(s"$dir/bucket=0")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val pf = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/bucket=0"))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet")).head.getPath
    fs.rename(pf, new org.apache.hadoop.fs.Path(s"$dir/bucket=0/sb-st-3-0.parquet"))

    val st = IndexStore.relStats(spark, dir, "", "bucket")(0)
    st.files shouldBe 1
    st.baseFiles shouldBe 0
    st.dirty shouldBe true
    (st.bytes - st.baseBytes) shouldBe st.bytes // all mass reads as appended

    // Control: the same single file under a committer name is a base.
    val dir2 = java.nio.file.Files.createTempDirectory("sbfallback2_").toString
    Seq((1L, 42)).toDF("doc_id", "v").coalesce(1)
      .write.parquet(s"$dir2/bucket=0")
    val st2 = IndexStore.relStats(spark, dir2, "", "bucket")(0)
    st2.baseFiles shouldBe 1
    st2.dirty shouldBe false
  }
}
