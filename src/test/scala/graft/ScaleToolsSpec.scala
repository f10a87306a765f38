package graft

import graft.plans.Skew
import graft.sinks.LakeSink
import org.apache.spark.sql.functions._

/** The scale-tool helpers: skew salting must be result-identical to the
  * plain join, and bucketed tables must equi-join WITHOUT a shuffle on
  * either side (the whole point of paying the bucketing write).
  */
class ScaleToolsSpec extends SparkSpec {
  import spark.implicits._

  describe("Skew.saltedJoin") {
    it("is row-for-row identical to the plain join, including join types") {
      // Heavily skewed fact side: one hot key.
      val fact = (1L to 500L).map(i => (if (i % 10 == 0) 2L else 1L, i)).toDF("k", "event_id")
      val dim  = Seq((1L, "hot"), (2L, "cold"), (3L, "unmatched")).toDF("k", "label")

      val plain  = fact.join(dim, Seq("k")).select("k", "event_id", "label").collect().toSet
      val salted = Skew.saltedJoin(fact, dim, Seq("k"), saltFrom = "event_id", salts = 8)
        .select("k", "event_id", "label").collect().toSet
      salted shouldBe plain

      val plainLeft = fact.join(dim.where("k = 2"), Seq("k"), "left")
        .select("k", "event_id", "label").collect().toSet
      val saltedLeft = Skew.saltedJoin(fact, dim.where("k = 2"), Seq("k"), "event_id", 8, "left")
        .select("k", "event_id", "label").collect().toSet
      saltedLeft shouldBe plainLeft
    }
    it("spreads a hot key over multiple salt values") {
      val fact = (1L to 500L).map(i => (1L, i)).toDF("k", "event_id")
      val saltCount = fact
        .withColumn("s", pmod(xxhash64(col("event_id")), lit(8L)))
        .select("s").distinct().count()
      saltCount shouldBe 8
    }
  }

  describe("LakeSink.writeSorted") {
    it("a selective sort-key filter scans a fraction of the rows an unsorted layout reads") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sorted").toString
      try {
        // Uniform key so an UNSORTED layout gives every row group the full
        // key domain (statistics prune nothing); 200k rows across several
        // row groups in both layouts.
        val n  = 200000L
        val df = spark.range(0, n).toDF("id")
          .select(pmod(xxhash64(col("id")), lit(n)).as("k"), col("id"))
        df.repartition(4).write.parquet(s"$dir/unsorted")
        LakeSink.writeSorted(df, s"$dir/sorted", Seq("k"), numFiles = 4)

        def scannedRows(path: String): Long = {
          val q = spark.read.parquet(path).where(col("k") >= 1000 && col("k") < 2000)
          q.collect()
          q.queryExecution.executedPlan.collectLeaves().collect {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.metrics("numOutputRows").value
          }.sum
        }
        val unsortedScan = scannedRows(s"$dir/unsorted")
        val sortedScan   = scannedRows(s"$dir/sorted")
        // Same answer...
        spark.read.parquet(s"$dir/sorted").where(col("k") >= 1000 && col("k") < 2000).count() shouldBe
          spark.read.parquet(s"$dir/unsorted").where(col("k") >= 1000 && col("k") < 2000).count()
        // ...but the sorted layout's statistics skip nearly everything:
        // the scan materializes a small multiple of the selected rows,
        // where the unsorted scan reads the table.
        sortedScan.toDouble should be < unsortedScan.toDouble * 0.2
      } finally {
        def rm(p: java.io.File): Unit = { Option(p.listFiles()).foreach(_.foreach(rm)); p.delete(); () }
        rm(new java.io.File(dir))
      }
    }
  }

  describe("parquet bloom filters (point-lookup row-group skipping)") {
    it("an equality probe on an unsorted high-cardinality column skips row groups only with bloom") {
      val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
      try {
        // Unsorted unique keys: every row group spans the full domain, so
        // min/max statistics prune NOTHING for a point probe — only the
        // bloom can skip. Small row groups force several groups per file.
        val n  = 200000L
        val df = spark.range(0, n).toDF("id")
          .select(xxhash64(col("id")).as("k"), col("id"))
        val rowGroupConf = Map("parquet.block.size" -> (256 * 1024).toString)
        df.repartition(2).write.options(rowGroupConf).parquet(s"$dir/plain")
        df.repartition(2).write.options(rowGroupConf)
          .option("parquet.bloom.filter.enabled#k", "true")
          .option("parquet.bloom.filter.expected.ndv#k", n.toString)
          .parquet(s"$dir/bloom")
        val probe = spark.range(0, n).select(xxhash64(col("id"))).limit(1).head.getLong(0)

        def scannedRows(path: String): Long = {
          val q = spark.read.parquet(path).where(col("k") === probe)
          q.collect()
          q.queryExecution.executedPlan.collectLeaves().collect {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.metrics("numOutputRows").value
          }.sum
        }
        spark.read.parquet(s"$dir/bloom").where(col("k") === probe).count() shouldBe
          spark.read.parquet(s"$dir/plain").where(col("k") === probe).count()
        val plainScan = scannedRows(s"$dir/plain")
        val bloomScan = scannedRows(s"$dir/bloom")
        // The bloom layout materializes a fraction of the rows: row
        // groups whose filter says "absent" never decode.
        bloomScan.toDouble should be < plainScan.toDouble * 0.2
      } finally {
        def rm(p: java.io.File): Unit = { Option(p.listFiles()).foreach(_.foreach(rm)); p.delete(); () }
        rm(new java.io.File(dir))
      }
    }

    it("compactParquet installs bloom filters on the rewrite") {
      val dir = java.nio.file.Files.createTempDirectory("graft-bloomc").toString + "/t"
      try {
        val n  = 100000L
        val df = spark.range(0, n).toDF("id").select(xxhash64(col("id")).as("k"), col("id"))
        df.repartition(8).write.options(Map("parquet.block.size" -> (256 * 1024).toString)).parquet(dir)
        LakeSink.compactParquet(spark, dir, targetFileBytes = 300 * 1024,
          bloomFilterCols = Seq("k"), bloomFilterNdv = Map("k" -> n))
        // Footer-level proof: the rewritten files carry a bloom filter
        // offset for column k.
        val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head
        val in = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath),
            spark.sparkContext.hadoopConfiguration))
        try {
          val cols = in.getFooter.getBlocks.get(0).getColumns
          val kCol = (0 until cols.size).map(cols.get)
            .find(_.getPath.toDotString == "k").get
          kCol.getBloomFilterOffset should be > 0L
        } finally in.close()
      } finally {
        def rm(p: java.io.File): Unit = { Option(p.listFiles()).foreach(_.foreach(rm)); p.delete(); () }
        rm(new java.io.File(dir).getParentFile)
      }
    }
  }

  describe("LakeSink.mergePartitioned") {
    it("upserts into touched partitions only — untouched day directories keep their exact files") {
      val dir = java.nio.file.Files.createTempDirectory("graft-merge").toString + "/t"
      try {
        val base = (1L to 300L).map(i => (i, i % 3, i * 10)).toDF("id", "day", "v")
        base.write.mode("overwrite").partitionBy("day").parquet(dir)
        def files(day: Long) = {
          val d = new java.io.File(s"$dir/day=$day")
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.lastModified())).sorted.toSeq
        }
        val day2Before = files(2)
        // Updates touch days 0 and 1 only: modify id 3 (day 0), id 1
        // (day 1), insert id 1000 into day 0.
        val updates = Seq((3L, 0L, 999L), (1L, 1L, 888L), (1000L, 0L, 777L)).toDF("id", "day", "v")
        val (written, parts) = LakeSink.mergePartitioned(spark, dir, updates, Seq("id"), "day")
        parts shouldBe 2L
        written shouldBe 201L // 100 + 100 survivors/updates + 1 insert
        val after = spark.read.parquet(dir)
        after.count() shouldBe 301
        after.where("id = 3").select("v").head.getLong(0) shouldBe 999L
        after.where("id = 1000").select("day", "v").head.toSeq shouldBe Seq(0, 777L)
        // Day 2 was never touched: same files, same mtimes — the rewrite's
        // blast radius really is the touched-partition set.
        files(2) shouldBe day2Before
      } finally {
        def rm(p: java.io.File): Unit = { Option(p.listFiles()).foreach(_.foreach(rm)); p.delete(); () }
        rm(new java.io.File(dir).getParentFile)
      }
    }

    it("refuses an update batch touching more partitions than the merge budget") {
      val dir = java.nio.file.Files.createTempDirectory("graft-merge2").toString + "/t"
      try {
        (1L to 20L).map(i => (i, i, i)).toDF("id", "day", "v")
          .write.mode("overwrite").partitionBy("day").parquet(dir)
        val updates = (1L to 20L).map(i => (i, i, i + 1)).toDF("id", "day", "v")
        an[IllegalArgumentException] should be thrownBy
          LakeSink.mergePartitioned(spark, dir, updates, Seq("id"), "day", maxTouchedPartitions = 5)
      } finally {
        def rm(p: java.io.File): Unit = { Option(p.listFiles()).foreach(_.foreach(rm)); p.delete(); () }
        rm(new java.io.File(dir).getParentFile)
      }
    }
  }

  describe("LakeSink.writeBucketed") {
    it("bucketed tables equi-join without a shuffle exchange") {
      val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
      val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("id", "va")
      val b = (1L to 1000L).map(i => (i, s"b$i")).toDF("id", "vb")
      LakeSink.writeBucketed(a, "bkt_a", Seq("id"), 4, sortCols = Seq("id"), path = Some(s"$dir/a"))
      LakeSink.writeBucketed(b, "bkt_b", Seq("id"), 4, sortCols = Seq("id"), path = Some(s"$dir/b"))
      try {
        val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
        joined.count() shouldBe 1000
        // The load-bearing property: no hash-partitioning exchange feeds
        // the join — bucket layout satisfies its distribution requirement.
        val plan = joined.queryExecution.executedPlan.toString
        plan should not include "Exchange hashpartitioning"
      } finally {
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
      }
    }
  }

  describe("LakeSink.compactParquet") {
    it("collapses a small-file directory, preserves every row, cleans up staging") {
      val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
      val df  = (1L to 5000L).map(i => (i, s"v$i")).toDF("id", "v")
      df.repartition(64).write.parquet(dir)
      val originally = spark.read.parquet(dir).collect().toSet

      val (before, after) = LakeSink.compactParquet(spark, dir, targetFileBytes = 8L * 1024 * 1024)
      before shouldBe 64
      after shouldBe 1 // 5000 tiny rows land far under one 8 MB target file
      spark.read.parquet(dir).collect().toSet shouldBe originally
      // No staging/retired residue survives a successful compaction.
      new java.io.File(dir + "._compact_staging").exists() shouldBe false
      new java.io.File(dir + "._compact_retired").exists() shouldBe false
    }

    it("repairs the retire→install crash window: a retired-only table is restored, then compacted") {
      val dir = java.nio.file.Files.createTempDirectory("graft-compact-crash").toString + "/t"
      val df  = (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v")
      df.repartition(8).write.parquet(dir)
      val originally = spark.read.parquet(dir).collect().toSet
      // Simulate a crash between rename(path→retired) and
      // rename(staging→path): table exists ONLY at the retired location,
      // plus a half-written staging dir.
      new java.io.File(dir).renameTo(new java.io.File(dir + "._compact_retired")) shouldBe true
      new java.io.File(dir + "._compact_staging").mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir + "._compact_staging", "part-garbage.parquet"),
        Array[Byte](1, 2, 3))

      val (before, after) = LakeSink.compactParquet(spark, dir, targetFileBytes = 8L * 1024 * 1024)
      before shouldBe 8
      after shouldBe 1
      spark.read.parquet(dir).collect().toSet shouldBe originally
      new java.io.File(dir + "._compact_retired").exists() shouldBe false
    }

    it("fails fast on a partitioned (subdirectory) layout instead of flattening it") {
      val dir = java.nio.file.Files.createTempDirectory("graft-compact-part").toString + "/t"
      (1L to 100L).map(i => (i, i % 3)).toDF("id", "p")
        .write.partitionBy("p").parquet(dir)
      val ex = intercept[IllegalArgumentException] {
        LakeSink.compactParquet(spark, dir)
      }
      ex.getMessage should include("subdirectories")
      // Untouched: the partitioned table still reads back whole.
      spark.read.parquet(dir).count() shouldBe 100
    }
  }

  describe("VersionedTable") {
    import graft.sinks.VersionedTable

    def tmpTable(): String =
      java.nio.file.Files.createTempDirectory("graft-vt").toString + "/t"

    it("time travel: every committed snapshot stays readable verbatim after later commits") {
      val dir = tmpTable()
      val v1  = (1L to 50L).map(i => (i, i * 10)).toDF("id", "v")
      VersionedTable.commit(spark, dir, v1, append = false) shouldBe 1
      VersionedTable.commit(spark, dir, (51L to 80L).map(i => (i, i * 10)).toDF("id", "v"),
        append = true) shouldBe 2
      VersionedTable.commit(spark, dir, (1L to 5L).map(i => (i, -1L)).toDF("id", "v"),
        append = false) shouldBe 3

      VersionedTable.latestVersion(spark, dir) shouldBe 3
      VersionedTable.read(spark, dir, Some(1)).count() shouldBe 50
      VersionedTable.read(spark, dir, Some(2)).count() shouldBe 80
      VersionedTable.read(spark, dir, Some(3)).count() shouldBe 5
      // Latest = version 3; v1's exact rows survived two later commits.
      VersionedTable.read(spark, dir).agg(sum("v")).head.getLong(0) shouldBe -5L
      VersionedTable.read(spark, dir, Some(1)).collect().toSet shouldBe v1.collect().toSet
    }

    it("fails fast on a missing version or an empty table") {
      val dir = tmpTable()
      a[NoSuchElementException] should be thrownBy VersionedTable.read(spark, dir)
      VersionedTable.commit(spark, dir, Seq((1L, 1L)).toDF("id", "v"), append = false)
      a[NoSuchElementException] should be thrownBy VersionedTable.read(spark, dir, Some(7))
    }

    it("a staged-but-uncommitted writer is invisible to readers (orphans never surface)") {
      val dir = tmpTable()
      VersionedTable.commit(spark, dir, (1L to 10L).map(i => (i, i)).toDF("id", "v"), append = false)
      // Simulate a writer that died after staging data but before claiming
      // its manifest: files exist under data/, no manifest references them.
      (100L to 200L).map(i => (i, i)).toDF("id", "v")
        .write.parquet(s"$dir/data/c99999-deadbeef")
      VersionedTable.read(spark, dir).count() shouldBe 10
      // vacuum reclaims the orphan subdir and keeps the live snapshot.
      val (_, droppedSubdirs) = VersionedTable.vacuum(spark, dir, keepVersions = 1)
      droppedSubdirs shouldBe 1
      VersionedTable.read(spark, dir).count() shouldBe 10
    }

    it("vacuum drops old manifests + unreferenced data; kept snapshots still read") {
      val dir = tmpTable()
      VersionedTable.commit(spark, dir, (1L to 10L).map(i => (i, i)).toDF("id", "v"), append = false)
      VersionedTable.commit(spark, dir, (11L to 20L).map(i => (i, i)).toDF("id", "v"), append = true)
      VersionedTable.commit(spark, dir, (21L to 25L).map(i => (i, i)).toDF("id", "v"), append = false)
      val (droppedManifests, droppedSubdirs) = VersionedTable.vacuum(spark, dir, keepVersions = 1)
      droppedManifests shouldBe 2
      // v3 references only its own commit's files: v1+v2's subdirs go.
      droppedSubdirs shouldBe 2
      VersionedTable.read(spark, dir).count() shouldBe 5
      a[NoSuchElementException] should be thrownBy VersionedTable.read(spark, dir, Some(1))
    }

    it("incremental reads return exactly the files each append added, and refuse overwrite gaps") {
      val dir = tmpTable()
      VersionedTable.commit(spark, dir, (1L to 10L).map(i => (i, i)).toDF("id", "v"), append = false)
      VersionedTable.commit(spark, dir, (11L to 15L).map(i => (i, i)).toDF("id", "v"), append = true)
      VersionedTable.commit(spark, dir, (16L to 18L).map(i => (i, i)).toDF("id", "v"), append = true)

      VersionedTable.readIncrement(spark, dir, 0, 1).count() shouldBe 10
      VersionedTable.readIncrement(spark, dir, 1, 2)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq shouldBe (11L to 15L)
      VersionedTable.readIncrement(spark, dir, 1, 3).count() shouldBe 8
      // Consumer checkpointing shape: increments partition the table.
      (VersionedTable.readIncrement(spark, dir, 0, 1).count() +
        VersionedTable.readIncrement(spark, dir, 1, 2).count() +
        VersionedTable.readIncrement(spark, dir, 2, 3).count()) shouldBe
        VersionedTable.read(spark, dir).count()

      // An overwrite breaks the append chain: the file-level diff can't
      // see removed rows, so the read must refuse, not silently lie.
      VersionedTable.commit(spark, dir, Seq((99L, 99L)).toDF("id", "v"), append = false)
      val ex = intercept[IllegalStateException] {
        VersionedTable.readIncrement(spark, dir, 3, 4)
      }
      ex.getMessage should include("not an append chain")
    }

    it("mergeSchema surfaces columns added by later appends, NULL for older files") {
      val dir = tmpTable()
      VersionedTable.commit(spark, dir, Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), append = false)
      VersionedTable.commit(spark, dir,
        Seq((3L, 30L, "x"), (4L, 40L, "y")).toDF("id", "v", "tag"), append = true)
      val merged = VersionedTable.read(spark, dir, mergeSchema = true)
      merged.columns.toSet shouldBe Set("id", "v", "tag")
      merged.where(col("tag").isNull).select("id").collect().map(_.getLong(0)).sorted.toSeq shouldBe
        Seq(1L, 2L)
      merged.count() shouldBe 4
    }

    it("commitIdempotent: a replayed micro-batch (same token) is a no-op returning the original version") {
      val dir = tmpTable()
      val b0  = Seq((1L, 1L), (2L, 2L)).toDF("id", "v")
      val b1  = Seq((3L, 3L)).toDF("id", "v")
      VersionedTable.commitIdempotent(spark, dir, b0, token = "batch-0") shouldBe 1
      VersionedTable.commitIdempotent(spark, dir, b1, token = "batch-1") shouldBe 2
      // foreachBatch retry / checkpoint-replay of batch 1: must NOT
      // double-append, and must report the version it already holds.
      VersionedTable.commitIdempotent(spark, dir, b1, token = "batch-1") shouldBe 2
      VersionedTable.latestVersion(spark, dir) shouldBe 2
      VersionedTable.read(spark, dir).count() shouldBe 3
      // A new batch after the replay proceeds normally.
      VersionedTable.commitIdempotent(spark, dir, Seq((4L, 4L)).toDF("id", "v"),
        token = "batch-2") shouldBe 3
      VersionedTable.read(spark, dir).count() shouldBe 4
    }

    it("compaction commits preserve rows, reduce files, and leave time travel intact") {
      val dir = tmpTable()
      // Streaming-ingest shape: many small commits → many small files.
      (1 to 6).foreach(k =>
        VersionedTable.commit(spark, dir,
          (k * 100L until k * 100L + 20L).map(i => (i, i)).toDF("id", "v").repartition(3),
          append = true))
      val before = VersionedTable.read(spark, dir).collect().toSet
      val (v, filesBefore, filesAfter) = VersionedTable.compact(spark, dir)
      v shouldBe 7
      filesAfter should be < filesBefore
      VersionedTable.read(spark, dir).collect().toSet shouldBe before
      // Pre-compaction snapshots still read (time travel intact)...
      VersionedTable.read(spark, dir, Some(3)).count() shouldBe 60
      // ...and an incremental consumer across the compaction boundary
      // refuses (it's an overwrite), rather than silently double-reading.
      an[IllegalStateException] should be thrownBy
        VersionedTable.readIncrement(spark, dir, 6, 7)
    }

    it("the version claim is create-exclusive: a pre-claimed manifest makes the commit lose") {
      val dir = tmpTable()
      VersionedTable.commit(spark, dir, Seq((1L, 1L)).toDF("id", "v"), append = false)
      // A racing winner claimed v2 between this writer's staging and its
      // claim: simulate by pre-creating the manifest path it will target.
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val claim = new org.apache.hadoop.fs.Path(dir, "_manifests/v00002.manifest")
      // Stage the loser's data first (so its version computation saw base=1),
      // then pre-claim, then let the loser try to claim the same version.
      // The public API recomputes base inside commit, so emulate the race
      // window with the primitive the protocol rests on:
      fs.create(claim, false).close()
      an[Exception] should be thrownBy fs.create(claim, false)
      // And the table remains consistent for readers: v2 (the winner's
      // empty manifest) is ignored by a version-3 commit going forward.
      VersionedTable.latestVersion(spark, dir) shouldBe 2
    }
  }
}
