package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The WebDataset tar source's contracts beyond the DuckDB gates:
  * real-world interop (GNU tar lists and extracts our shards — the writer
  * is not merely self-consistent with our own parser), the binaryFile
  * disk path (shards written as .tar files, read back through Spark's
  * binary file source — the production read shape), error tolerance, and
  * scan-locality of the extraction plan.
  */
class MultimodalTarSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureDocs = Seq(
    (0L, "alpha document zero"),
    (1L, "beta one"),
    (17L, "gamma seventeen lands in shard one"),
    (18L, "delta eighteen")
  ).toDF("doc_id", "text")

  private def shards = Multimodal.syntheticTarShards(fixtureDocs, "doc_id", "text")

  describe("syntheticTarShards") {
    it("groups samplesPerShard documents per shard with three adjacent entries each") {
      val byShard = Multimodal.tarEntries(shards, "shard_id", "content")
        .groupBy("shard_id").agg(count(lit(1)).as("n"), collect_list("entry_name").as("names"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[String](2))).toMap
      byShard.keySet shouldBe Set(0L, 1L)
      byShard(0L)._1 shouldBe 6  // docs 0, 1
      byShard(1L)._1 shouldBe 6  // docs 17, 18
      // Adjacency: each sample's three entries are consecutive, png first.
      byShard(0L)._2.grouped(3).toSeq.map(_.map(_.split('.').last)) shouldBe
        Seq(Seq("png", "txt", "json"), Seq("png", "txt", "json"))
    }

    it("GNU tar lists and extracts the shard bit-exactly (the writer is not self-consistent-only)") {
      import scala.sys.process._
      assume(new java.io.File("/usr/bin/tar").exists() || new java.io.File("/bin/tar").exists())
      val shard0 = shards.where(col("shard_id") === 0).head.getAs[Array[Byte]]("content")
      val dir = java.nio.file.Files.createTempDirectory("tar_interop_")
      val f   = dir.resolve("shard0.tar")
      java.nio.file.Files.write(f, shard0)
      try {
        val listed = Seq("tar", "-tf", f.toString).!!.trim.split("\n").toSeq
        listed shouldBe Seq(
          "0000000000.png", "0000000000.txt", "0000000000.json",
          "0000000001.png", "0000000001.txt", "0000000001.json")
        Seq("tar", "-xf", f.toString, "-C", dir.toString).! shouldBe 0
        // Extracted payloads match what our own walk returns, byte for byte.
        val ours = Multimodal.tarEntryList(shard0).toMap
        listed.foreach { name =>
          java.nio.file.Files.readAllBytes(dir.resolve(name)) shouldBe ours(name)
        }
        new String(java.nio.file.Files.readAllBytes(dir.resolve("0000000001.txt")), "UTF-8") shouldBe "beta one"
      } finally {
        Seq("rm", "-rf", dir.toString).!
      }
    }
  }

  describe("webdatasetSamples") {
    it("round-trips captions/meta and decodable images from disk through the binaryFile source") {
      val dir = java.nio.file.Files.createTempDirectory("tar_disk_")
      try {
        shards.collect().foreach { r =>
          java.nio.file.Files.write(
            dir.resolve(f"shard-${r.getLong(0)}%05d.tar"), r.getAs[Array[Byte]]("content"))
        }
        // The production read shape: binary file source over the shard
        // glob, one row per shard, extraction scan-local from there.
        val fromDisk = spark.read.format("binaryFile").load(s"$dir/shard-*.tar")
          .select(lit(0L).as("shard_id"), col("content"))
        val got = Multimodal.webdatasetSamples(fromDisk, "shard_id", "content")
          .select(col("key").cast("long").as("doc_id"), col("image"), col("caption"), col("meta"))
          .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1), r.getString(2), r.getString(3)))
          .sortBy(_._1)
        got.map(_._1).toSeq shouldBe Seq(0L, 1L, 17L, 18L)
        got.map(_._3).toSeq shouldBe fixtureDocs.orderBy("doc_id").select("text").as[String].collect().toSeq
        got.foreach { case (id, img, _, meta) =>
          meta should startWith(s"""{"id":$id,""")
          Multimodal.readImage(img) should not be null
        }
      } finally {
        import scala.sys.process._
        Seq("rm", "-rf", dir.toString).!
      }
    }

    it("gzip shards round-trip through export and GNU tar -tzf lists them") {
      import scala.sys.process._
      val dir = java.nio.file.Files.createTempDirectory("tar_gz_")
      try {
        val samples = fixtureDocs.select(
          col("doc_id"),
          Multimodal.syntheticPngTextured(col("doc_id")).as("image"),
          col("text").as("caption"),
          concat(lit("m"), col("doc_id").cast("string")).as("meta"))
        Multimodal.exportWebdataset(samples, "doc_id", "image", "caption", "meta",
          dir.toString, gzip = true) shouldBe 2L
        // Hadoop's local ChecksumFileSystem adds .crc sidecars; the glob
        // readers never see dot-files.
        val files = new java.io.File(dir.toString).listFiles()
          .map(_.getName).filterNot(_.startsWith(".")).sorted.toSeq
        files shouldBe Seq("shard-00000000.tar.gz", "shard-00000001.tar.gz")
        // Real gzip per GNU tar.
        Seq("tar", "-tzf", s"$dir/shard-00000000.tar.gz").!!.trim.split("\n").toSeq shouldBe
          Seq("0000000000.png", "0000000000.txt", "0000000000.json",
              "0000000001.png", "0000000001.txt", "0000000001.json")
        // And the magic-sniffing reader extracts the same samples.
        val fromDisk = spark.read.format("binaryFile").load(s"$dir/shard-*.tar.gz")
          .select(lit(0L).as("shard_id"), col("content"))
        val got = Multimodal.webdatasetSamples(fromDisk, "shard_id", "content")
          .select(col("key").cast("long"), col("caption")).as[(Long, String)]
          .collect().sortBy(_._1).toSeq
        got shouldBe fixtureDocs.orderBy("doc_id").as[(Long, String)].collect().toSeq
      } finally {
        Seq("rm", "-rf", dir.toString).!
      }
    }

    it("tolerates malformed archives, null content, and partial samples") {
      val junk = Seq(
        (1L, Array[Byte](1, 2, 3)),            // not a tar
        (2L, null.asInstanceOf[Array[Byte]]),  // null content
        (3L, new Array[Byte](2048))            // all zeros = empty archive
      ).toDF("shard_id", "content")
      Multimodal.webdatasetSamples(junk, "shard_id", "content").count() shouldBe 0
      // A sample missing its png still assembles with image = null.
      val partial =
        Multimodal.tarEntry("0000000042.txt", "only a caption".getBytes("UTF-8")) ++
          new Array[Byte](1024)
      val got = Multimodal.webdatasetSamples(
        Seq((9L, partial)).toDF("shard_id", "content"), "shard_id", "content").collect()
      got.length shouldBe 1
      got.head.getString(1) shouldBe "0000000042"
      got.head.isNullAt(2) shouldBe true      // image
      got.head.getString(3) shouldBe "only a caption"
      got.head.isNullAt(4) shouldBe true      // meta
    }

    it("plans scan-local — no Exchange anywhere in the extraction") {
      val plan = Multimodal.webdatasetSamples(shards, "shard_id", "content")
        .queryExecution.executedPlan.toString
      // The shard build itself groups (one shuffle, upstream); from the
      // binary column to samples there is no further exchange. Assert on
      // the disk-read shape, which has none at all.
      val dir = java.nio.file.Files.createTempDirectory("tar_plan_")
      try {
        shards.write.mode("overwrite").parquet(s"$dir/shards")
        val p = Multimodal.webdatasetSamples(
          spark.read.parquet(s"$dir/shards"), "shard_id", "content")
          .queryExecution.executedPlan.toString
        p should not include "Exchange"
      } finally {
        import scala.sys.process._
        Seq("rm", "-rf", dir.toString).!
      }
      plan should not be empty
    }
  }
}
