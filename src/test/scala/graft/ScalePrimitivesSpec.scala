package graft

import graft.operators.{Dedup, Multimodal}
import graft.plans.BloomJoin
import graft.sinks.LakeSink
import org.apache.spark.sql.functions._

/** The round-8 scale primitives: Bloom semi-join reduction (result-identical
  * to the plain join AND pruning below the exchange), Z-order layout
  * (either-dimension pruning the 1-D sort cannot give), perceptual dHash
  * (codec-real, banded pairs == brute force), and the stream-stream
  * attribution join (cross-micro-batch matches land).
  */
class ScalePrimitivesSpec extends SparkSpec {
  import spark.implicits._

  describe("BloomJoin.bloomPrunedJoin") {
    it("is row-for-row identical to the plain join, inner and left_semi, even at fpp 0.5") {
      val big   = (1L to 2000L).map(i => (i % 400, i)).toDF("k", "v")
      val small = (0L to 30L).map(i => (i * 13, s"d$i")).toDF("k", "label")

      val plainInner = big.join(small, Seq("k")).collect().toSet
      val bloomInner = BloomJoin.bloomPrunedJoin(big, small, Seq("k")).collect().toSet
      bloomInner shouldBe plainInner

      // A deliberately terrible fpp lets many false positives through the
      // filter — the join must still discard every one of them.
      val sloppy = BloomJoin.bloomPrunedJoin(big, small, Seq("k"), fpp = 0.5).collect().toSet
      sloppy shouldBe plainInner

      val plainSemi = big.join(small, Seq("k"), "left_semi").collect().toSet
      val bloomSemi = BloomJoin.bloomPrunedJoin(big, small, Seq("k"), "left_semi").collect().toSet
      bloomSemi shouldBe plainSemi
    }

    it("handles compound keys as one hashed tuple") {
      val big   = (1L to 500L).map(i => (i % 20, i % 7, i)).toDF("a", "b", "v")
      val small = Seq((3L, 1L, "x"), (15L, 4L, "y"), (99L, 99L, "z")).toDF("a", "b", "label")
      val plain = big.join(small, Seq("a", "b")).collect().toSet
      BloomJoin.bloomPrunedJoin(big, small, Seq("a", "b")).collect().toSet shouldBe plain
    }

    it("refuses join types whose unmatched big-side rows the pruning would delete") {
      val df = Seq((1L, "a")).toDF("k", "v")
      an[IllegalArgumentException] should be thrownBy
        BloomJoin.bloomPrunedJoin(df, df, Seq("k"), "left")
      an[IllegalArgumentException] should be thrownBy
        BloomJoin.bloomPrunedJoin(df, df, Seq("k"), "full_outer")
    }

    it("prunes the big side BELOW the join (scan-local, before any exchange)") {
      // Force a shuffled join (no broadcast) so there is an exchange to be
      // below, then locate the bloom filter's FilterExec: it must sit in a
      // join-child subtree, i.e. the probe-side rows were filtered before
      // reaching the join, not after. AQE off so the executed plan is a
      // plain tree (the PlanAuditSpec convention).
      val prior    = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val big   = spark.range(0, 20000).select(pmod(col("id"), lit(997L)).as("k"), col("id").as("v"))
        val small = spark.range(0, 50).select((col("id") * 19).as("k"), col("id").as("w"))
        val joined = BloomJoin.bloomPrunedJoin(big, small, Seq("k"))
        joined.collect()
        val plan = joined.queryExecution.executedPlan
        val joins = plan.collect {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec    => j
          case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
        }
        joins should not be empty
        val probeSideFilters = joins.head.children.flatMap(_.collect {
          case f: org.apache.spark.sql.execution.FilterExec
              if f.condition.toString.toLowerCase.contains("udf") => f
        })
        probeSideFilters should not be empty
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
      }
    }
  }

  describe("LakeSink.writeZOrdered") {
    it("prunes selective filters on EITHER clustered dimension; a 1-D sort only prunes its own key") {
      val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
      try {
        // Two independent uniform dimensions: an unsorted layout prunes
        // neither, a 1-D sort on `a` prunes only `a`, the Z-order layout
        // must prune both.
        val n = 200000L
        val df = spark.range(0, n).toDF("id").select(
          pmod(xxhash64(col("id")), lit(1000L)).as("a"),
          pmod(xxhash64(col("id"), lit(1)), lit(1000L)).as("b"),
          col("id"))
        // 64 Morton-range files → each file pins a 6-bit Morton prefix,
        // i.e. 3 quantization bits of EACH dimension — file-level min/max
        // alone then bounds either dimension's scan to ~1/8 of the table.
        df.repartition(64).write.parquet(s"$dir/unsorted")
        LakeSink.writeSorted(df, s"$dir/sorted_a", Seq("a"), numFiles = 64)
        LakeSink.writeZOrdered(df, s"$dir/zorder", Seq("a", "b"), numFiles = 64)

        def scannedRows(path: String, cond: org.apache.spark.sql.Column): Long = {
          val q = spark.read.parquet(path).where(cond)
          q.collect()
          q.queryExecution.executedPlan.collectLeaves().collect {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.metrics("numOutputRows").value
          }.sum
        }
        val onA = col("a") >= 100 && col("a") < 150 // 5% of the a-domain
        val onB = col("b") >= 100 && col("b") < 150

        // Answers are layout-invariant.
        for (c <- Seq(onA, onB))
          spark.read.parquet(s"$dir/zorder").where(c).count() shouldBe
            spark.read.parquet(s"$dir/unsorted").where(c).count()

        val unsortedA = scannedRows(s"$dir/unsorted", onA)
        val zA        = scannedRows(s"$dir/zorder", onA)
        val zB        = scannedRows(s"$dir/zorder", onB)
        val sortedB   = scannedRows(s"$dir/sorted_a", onB)
        // Z-order prunes both dimensions (each keeps ~half the Morton
        // bits — a 5% filter on either dim should skip the large majority
        // of files) — while the 1-D layout reads essentially everything
        // for the non-sort dimension.
        zA.toDouble should be < unsortedA.toDouble * 0.35
        zB.toDouble should be < unsortedA.toDouble * 0.35
        sortedB.toDouble should be > unsortedA.toDouble * 0.9
      } finally {
        def rm(p: java.io.File): Unit = { Option(p.listFiles()).foreach(_.foreach(rm)); p.delete(); () }
        rm(new java.io.File(dir))
      }
    }
  }

  describe("Multimodal.imageDHash") {
    it("is invariant under a uniform non-clamping brightness shift and drifts only at saturation") {
      // doc_id % 3 == 0 → jitter 0 → byte-identical image → hamming 0.
      val ids = spark.range(0, 60).select((col("id") * 3).as("doc_id"))
      val zeroJitter = ids.select(
        Multimodal.imageDHash(Multimodal.syntheticPngTextured(col("doc_id"))).as("dh"),
        Multimodal.imageDHash(Multimodal.syntheticPngTexturedJittered(col("doc_id"))).as("dhj"))
      zeroJitter.where(col("dh") =!= col("dhj")).count() shouldBe 0L

      // Nonzero jitter: orderings mostly survive (small hamming), and the
      // hash stays in the sign-free 63-bit range.
      val jittered = spark.range(0, 200).select((col("id") * 3 + 1).as("doc_id"))
        .select(
          Multimodal.imageDHash(Multimodal.syntheticPngTextured(col("doc_id"))).as("dh"),
          Multimodal.imageDHash(Multimodal.syntheticPngTexturedJittered(col("doc_id"))).as("dhj"))
        .withColumn("ham", bit_count(col("dh").bitwiseXOR(col("dhj"))))
      jittered.agg(max(col("ham"))).head.getInt(0) should be <= 20
      jittered.where(col("dh") < 0 || col("dhj") < 0).count() shouldBe 0L
    }

    it("banded hamming pairs over 63-bit dHashes equal the brute-force pairs") {
      val hashes = spark.range(0, 300).toDF("id").select(
        col("id").as("doc_id"),
        Multimodal.imageDHash(Multimodal.syntheticPngTextured(col("id"))).as("dh"))
      // Add planted near-dups so the pair set is nonempty.
      val planted = spark.range(0, 300).toDF("id").select(
        (col("id") + 100000L).as("doc_id"),
        Multimodal.imageDHash(Multimodal.syntheticPngTexturedJittered(col("id"))).as("dh"))
      val all = hashes.unionByName(planted)
      val brute  = Dedup.simHashPairs(all, "doc_id", "dh", maxHamming = 3).collect().toSet
      val banded = Dedup.simHashPairsBanded(all, "doc_id", "dh", maxHamming = 3, fpBits = 63)
        .collect().toSet
      banded shouldBe brute
      brute should not be empty
    }

    it("returns the error-tolerant zero on null or undecodable bytes") {
      val df = Seq(
        (1L, null.asInstanceOf[Array[Byte]]),
        (2L, Array[Byte](1, 2, 3))
      ).toDF("id", "bytes")
      df.select(Multimodal.imageDHash(col("bytes"))).collect().map(_.getLong(0)).toSeq shouldBe
        Seq(0L, 0L)
    }
  }

  describe("LinkGraph.bfsLevels") {
    it("assigns first-visit hop distances, ignores unreachable nodes, stops early on a drained frontier") {
      // 0→1→2→3, 0→2 (shortcut), 3→0 (cycle), 9→9 (unreachable island).
      val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 2L), (3L, 0L), (9L, 9L)).toDF("src", "dst")
      val levels = graft.operators.LinkGraph.bfsLevels(e, "src", "dst", Seq(0L), maxDepth = 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      levels shouldBe Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L)
    }
    it("maxDepth truncates the expansion") {
      val e = (0L until 8L).map(i => (i, i + 1)).toDF("src", "dst")
      val levels = graft.operators.LinkGraph.bfsLevels(e, "src", "dst", Seq(0L), maxDepth = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      levels shouldBe Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L)
    }
    it("multi-source: each node takes the nearest source's distance") {
      val e = Seq((0L, 1L), (1L, 2L), (5L, 2L)).toDF("src", "dst")
      val levels = graft.operators.LinkGraph.bfsLevels(e, "src", "dst", Seq(0L, 5L), maxDepth = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      levels shouldBe Map(0L -> 0L, 5L -> 0L, 1L -> 1L, 2L -> 1L)
    }
  }

  describe("EventAnalytics.resampleFill") {
    it("densifies per-key spans and carries the last observation across gaps") {
      // key A: periods 10, 13 (gap 11, 12); key B: single period 5.
      val ev = Seq(
        ("A", 10L * 100, 7L), ("A", 10L * 100 + 50, 3L), ("A", 13L * 100, 20L),
        ("B", 5L * 100 + 1, 4L)
      ).toDF("k", "t", "v")
      val out = graft.operators.EventAnalytics
        .resampleFill(ev, "k", "t", col("v"), periodLength = 100L)
        .orderBy("k", "period")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      out shouldBe Seq(
        ("A", 10L, 10L, 2L), // 7 + 3
        ("A", 11L, 10L, 0L), // gap: carried
        ("A", 12L, 10L, 0L),
        ("A", 13L, 20L, 1L),
        ("B", 5L, 4L, 1L)
      )
    }
  }

  describe("stream-stream attribution join") {
    it("matches clicks to purchases across micro-batches (sf0.001: stream == batch)") {
      val sfDir = "/root/testdata/sf0.001"
      val batch = SparkEntry.queries("q_events_attribution")(spark, sfDir).collect().toSeq
      val strm  = SparkEntry.queries("q_events_attribution_stream")(spark, sfDir).collect().toSeq
      batch should not be empty
      strm shouldBe batch
    }

    it("a click in an early chunk joins a purchase arriving two chunks later") {
      // Synthetic replay: the click sits in chunk 1, its in-band purchase
      // in chunk 3 (value-split chunks), so the match can only come from
      // retained join STATE, not intra-batch co-presence.
      val base = 1700000000000000L // µs
      val rows = Seq(
        (1L, base, "click"),
        (2L, base + 60000000L, "click"), // noise keeping chunk 1 nonempty
        (3L, base + 600000000L, "view"),
        (4L, base + 700000000L, "view"),
        (1L, base + 1500000000L, "purchase"), // 25 min after user 1's click
        (5L, base + 1600000000L, "view")
      )
      val src = rows.toDF("user_id", "tus", "event_type")
        .select(col("user_id"), timestamp_micros(col("tus")).as("ts"), col("event_type"))
      val out = graft.streaming.StreamGates.replayViaFiles(
        spark, src, "ts", chunks = 3, org.apache.spark.sql.streaming.OutputMode.Append()) { in =>
        val clicks = in.where(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
          .withWatermark("click_ts", "1 second")
        val purchases = in.where(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
          .withWatermark("purchase_ts", "1 second")
        clicks.join(
          purchases,
          col("c_user") === col("p_user") &&
            col("purchase_ts") >= col("click_ts") &&
            col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      }
      out.select("c_user").collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
    }
  }
}
