package graft

import graft.operators.{Multimodal, TextAnalysis}
import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class MultimodalStreamingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), "image/png"),
    (2L, Array[Byte](9, 8, 7), "image/jpeg"),
    (3L, null.asInstanceOf[Array[Byte]], "image/png")
  ).toDF("media_id", "content", "mime")

  describe("Multimodal plumbing (stubbed kernels)") {
    it("decodeMeta yields a typed struct, null-safe") {
      val out  = media.select(col("media_id"), Multimodal.decodeMeta(col("content")))
      val rows = out.collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
      rows(1L).getInt(3) shouldBe 8 // n_bytes
      rows(3L).getInt(3) shouldBe 0 // null content → zeroed
      // deterministic: same content → same decode
      val again = media.select(Multimodal.decodeMeta(col("content"))).collect()
      again shouldBe media.select(Multimodal.decodeMeta(col("content"))).collect()
    }
    it("decodeImageMeta REALLY decodes PNG bytes (JDK ImageIO), tolerating garbage") {
      val df = Seq(1L, 2L, 3L, 4L).toDF("id")
        .select(col("id"), Multimodal.syntheticPng(col("id")).as("png"))
      val out = df.select(col("id"), Multimodal.decodeImageMeta(col("png")).as("m"))
        .select(col("id"), col("m._1"), col("m._2"), col("m._3"), col("m._5"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      out.foreach { case (id, w, h, c, px) =>
        val h0 = graft.functions.Anonymizer.stableHash(s"png$id")
        w shouldBe 1 + (h0 % 16).toInt
        h shouldBe 1 + ((h0 / 16) % 16).toInt
        c shouldBe (if (id % 2 == 0) 1 else 3)
        px shouldBe (h0 % 256).toInt
      }
      // Garbage / null bytes never fail the pipeline — zeroed dims.
      val junk = media.select(Multimodal.decodeImageMeta(col("content")).as("m"))
        .select(col("m._1")).collect().map(_.getInt(0)).toSet
      junk shouldBe Set(0)
    }
    it("decodeAudioMeta REALLY decodes WAV bytes (javax.sound.sampled), tolerating garbage") {
      val df = Seq(1L, 2L, 3L, 4L).toDF("id")
        .select(col("id"), Multimodal.syntheticWav(col("id")).as("wav"))
      val out = df.select(col("id"), Multimodal.decodeAudioMeta(col("wav")).as("m"))
        .select(col("id"), col("m._1"), col("m._2"), col("m._3"), col("m._5"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      out.foreach { case (id, rate, ch, frames, s00) =>
        val h0 = graft.functions.Anonymizer.stableHash(s"wav$id")
        rate shouldBe 8000 * (1 + (h0 % 3).toInt)
        ch shouldBe (if (id % 2 == 0) 1 else 2)
        frames shouldBe 1 + ((h0 / 16) % 64).toInt
        s00 shouldBe (((h0 % 65536) - 32768).toInt)
      }
      // Garbage / null bytes never fail the pipeline — zeroed meta.
      val junk = media.select(Multimodal.decodeAudioMeta(col("content")).as("m"))
        .select(col("m._1")).collect().map(_.getInt(0)).toSet
      junk shouldBe Set(0)
    }
    it("decodeMp4Meta REALLY walks ISO-BMFF boxes (no codec), tolerating garbage") {
      val df = Seq(1L, 2L, 3L, 4L).toDF("id")
        .select(col("id"), Multimodal.syntheticMp4(col("id")).as("mp4"))
      val out = df.select(col("id"), Multimodal.decodeMp4Meta(col("mp4")).as("m"))
        .select(col("id"), col("m._1"), col("m._2"), col("m._3"), col("m._4"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      out.foreach { case (id, ts, dur, w, h) =>
        val h0 = graft.functions.Anonymizer.stableHash(s"mp4$id")
        ts shouldBe (1000L * (1 + h0 % 5)).toInt
        dur shouldBe (1 + (h0 / 8) % 100000).toInt
        w shouldBe (16 * (1 + h0 % 64)).toInt
        h shouldBe (16 * (1 + (h0 / 64) % 64)).toInt
      }
      // Garbage / truncated / null bytes never fail the pipeline.
      val junk = media.select(Multimodal.decodeMp4Meta(col("content")).as("m"))
        .select(col("m._1")).collect().map(_.getInt(0)).toSet
      junk shouldBe Set(0)
      // A truncated valid file (box size past the end) zeroes out too.
      val trunc = df.select(Multimodal.decodeMp4Meta(expr("substring(mp4, 1, 40)")).as("m"))
        .select(col("m._1")).collect().map(_.getInt(0)).toSet
      trunc shouldBe Set(0)
      // A LYING header (well-formed moov/trak/tkhd types but a too-short
      // tkhd payload) clamps to zero — never a negative field.
      val lying = {
        def u32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        val tkhd = u32(12) ++ "tkhd".getBytes ++ u32(0) // 4-byte payload, fields absent
        val trak = u32(8L + tkhd.length) ++ "trak".getBytes ++ tkhd
        u32(8L + trak.length) ++ "moov".getBytes ++ trak
      }
      val ly = Seq(Tuple1(lying)).toDF("b")
        .select(Multimodal.decodeMp4Meta(col("b")).as("m"))
        .select(col("m._3"), col("m._4")).head
      (ly.getInt(0), ly.getInt(1)) shouldBe ((0, 0))
    }
    it("extractFeatures emits fixed-width vectors per item") {
      val out = Multimodal.extractFeatures(media, "media_id", "content", dim = 4)
      out.columns shouldBe Array("media_id", "features")
      val f = out.as[(Long, Seq[Float])].collect().toMap
      f(1L).length shouldBe 4
      f(3L) shouldBe Seq(0f, 0f, 0f, 0f) // null content → zero vector
    }
    it("resizeImage REALLY resizes (nearest neighbor, PNG round trip); non-image → null") {
      val df = Seq(2L, 5L).toDF("id")
        .select(col("id"), Multimodal.syntheticPng(col("id")).as("png"))
        .select(col("id"), col("png"), Multimodal.resizeImage(col("png"), 3, 2).as("small"))
      df.collect().foreach { r =>
        val id = r.getLong(0)
        val h0 = graft.functions.Anonymizer.stableHash(s"png$id")
        val w  = 1 + (h0 % 16).toInt
        val ht = 1 + ((h0 / 16) % 16).toInt
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
        img.getWidth shouldBe 3
        img.getHeight shouldBe 2
        // Nearest neighbor is exact: out(x,y,0) = in(x·w/3, y·ht/2, 0).
        val raster = img.getRaster
        for (y <- 0 until 2; x <- 0 until 3) {
          val (sx, sy) = (x * w / 3, y * ht / 2)
          raster.getSample(x, y, 0) shouldBe ((h0 + sx + 31L * sy) % 256).toInt
        }
      }
      // Non-image / null payloads resize to null, never throw.
      media.select(Multimodal.resizeImage(col("content"), 3, 2).as("b"))
        .collect().forall(_.isNullAt(0)) shouldBe true
    }
    it("extractFeatures uses the REAL image kernel on decodable payloads (normalized histogram)") {
      val df = Seq(4L).toDF("id").select(col("id"), Multimodal.syntheticPng(col("id")).as("content"))
      val f  = Multimodal.extractFeatures(df, "id", "content", dim = 8)
        .as[(Long, Seq[Float])].collect().head._2
      f.length shouldBe 8
      f.sum shouldBe 1.0f +- 1e-5f // histogram normalized by pixel count
      f.forall(_ >= 0f) shouldBe true
    }
    it("decodeAviFrames REALLY demuxes RIFF/AVI and decodes every frame, tolerating garbage") {
      val df = Seq(1L, 2L, 3L, 4L).toDF("id")
        .select(col("id"), Multimodal.syntheticAvi(col("id")).as("avi"))
      val out = Multimodal.decodeAviFrames(df, "id", "avi", stride = 1)
        .as[(Long, Int, Int, Int, Int, Int)].collect()
      out.groupBy(_._1).foreach { case (id, frames) =>
        val h0 = graft.functions.Anonymizer.stableHash(s"avi$id")
        frames.length shouldBe 2 + (h0 % 6).toInt
        frames.sortBy(_._2).foreach { case (_, idx, w, ht, c, s00) =>
          w shouldBe 1 + (h0 % 16).toInt
          ht shouldBe 1 + ((h0 / 16) % 16).toInt
          c shouldBe (if (id % 2 == 0) 1 else 3)
          s00 shouldBe ((h0 + 97L * idx) % 256).toInt
        }
      }
      // Stride samples every k-th frame, preserving container indices.
      Multimodal.decodeAviFrames(df, "id", "avi", stride = 2)
        .select("frame_idx").as[Int].collect().forall(_ % 2 == 0) shouldBe true
      // Garbage / null payloads yield no rows, never throw.
      Multimodal.decodeAviFrames(media, "media_id", "content", stride = 1).count() shouldBe 0
      // A truncated AVI yields the frames readable before the damage.
      val trunc = df.where("id = 1").select(col("id"), expr("substring(avi, 1, 64)").as("avi"))
      Multimodal.decodeAviFrames(trunc, "id", "avi").count() should be < 6L
    }
    it("sampleFrames keeps every stride-th fixed-size chunk") {
      val frames = Multimodal.sampleFrames(media.where("media_id = 1"), "media_id", "content", frameBytes = 2, stride = 2)
      // 8 bytes → 4 frames of 2 → indices 0, 2 kept
      frames.select("frame_idx").as[Int].collect().sorted shouldBe Array(0, 2)
    }
  }

  describe("Structured Streaming over events") {
    it("windowedAggregate computes tumbling windows on a MemoryStream") {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(java.sql.Timestamp, String, Double)]
      val df = input.toDF().toDF("ts", "event_type", "value")
      val query = EventStream.toMemorySink(
        EventStream.windowedAggregate(df, windowLength = "1 hour", watermarkDelay = "10 minutes"),
        "win_test"
      )
      def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      input.addData((ts(0, 5), "click", 1.0), (ts(0, 40), "click", 2.0), (ts(1, 10), "view", 5.0))
      query.processAllAvailable()
      val rows = spark.sql("SELECT * FROM win_test").collect()
      rows.map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet shouldBe
        Set(("2024-01-01 00:00:00.0", "click", 2L, 3.0), ("2024-01-01 01:00:00.0", "view", 1L, 5.0))
      query.stop()
    }
    it("dedupWithinWatermark keeps first arrival per key on a MemoryStream") {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(java.sql.Timestamp, String, Double)]
      val df = input.toDF().toDF("ts", "text_hash", "value")
      val query = EventStream.toMemorySink(
        EventStream.dedupWithinWatermark(df, Seq("text_hash"), watermarkDelay = "10 minutes"),
        "dedup_test",
        org.apache.spark.sql.streaming.OutputMode.Append()
      )
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      input.addData((ts(0), "aaa", 1.0), (ts(1), "bbb", 2.0))
      query.processAllAvailable()
      input.addData((ts(2), "aaa", 9.9)) // duplicate key within the horizon → dropped
      query.processAllAvailable()
      val vals = spark.sql("SELECT value FROM dedup_test").collect().map(_.getDouble(0)).toSet
      vals shouldBe Set(1.0, 2.0)
      query.stop()
    }
    it("enrichWithStatic joins a stream to a static dimension per micro-batch") {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Double)]
      val users = Seq((1L, "gold"), (2L, "free")).toDF("user_id", "tier")
      val query = EventStream.toMemorySink(
        EventStream.enrichWithStatic(input.toDF().toDF("user_id", "value"), users, Seq("user_id")),
        "enrich_test",
        org.apache.spark.sql.streaming.OutputMode.Append()
      )
      input.addData((1L, 5.0), (3L, 7.0)) // user 3 has no dimension row
      query.processAllAvailable()
      val rows = spark.sql("SELECT user_id, value, tier FROM enrich_test").collect()
        .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSet
      rows shouldBe Set((1L, 5.0, Some("gold")), (3L, 7.0, None)) // left join keeps the miss
      query.stop()
    }
    it("the scan-local pipeline operators run UNCHANGED on a stream") {
      // Quality filtering and deterministic sampling are pure column
      // transforms — the same code that batch gates verify drives a
      // readStream frame with no modification (the Spark-first payoff).
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val filtered = TextAnalysis.filterByQuality(
        input.toDF().toDF("doc_id", "text"), "text", "doc_id",
        TextAnalysis.QualityThresholds(minTokens = 3, maxDupTokenFrac = 0.5))
      val sampled = graft.operators.Sampling.hashSample(filtered, "doc_id", 1.0)
      val query = EventStream.toMemorySink(
        sampled.select("doc_id"), "qf_stream_test",
        org.apache.spark.sql.streaming.OutputMode.Append())
      input.addData((1L, "alpha beta gamma delta"), (2L, "x x x x"))
      query.processAllAvailable()
      spark.sql("SELECT doc_id FROM qf_stream_test").collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
      query.stop()
    }
    it("a late-but-within-watermark event must not rewind the session clock (regression)") {
      // gap 30min, delay 10min. Batch 1: t=0, t=20 → lastSeen 20. Batch 2
      // delivers t=15 (late, admitted by the watermark) and t=47. A naive
      // fold rewinds lastSeen to 15 and falsely closes at 47 (47−15 > 30);
      // correct semantics keeps ONE session (47−20 = 27 ≤ 30) absorbing
      // all four events.
      implicit val sqlCtx = spark.sqlContext
      def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
      val input = MemoryStream[EventStream.SessionEvent]
      val query = EventStream.toMemorySink(
        EventStream.sessionizeByEventTime(input.toDS(), gapMinutes = 30, watermarkDelay = "10 minutes").toDF(),
        "eq_sess_late", org.apache.spark.sql.streaming.OutputMode.Append())
      input.addData(EventStream.SessionEvent(9L, ts(0), 1.0), EventStream.SessionEvent(9L, ts(20), 2.0))
      query.processAllAvailable()
      input.addData(EventStream.SessionEvent(9L, ts(15), 4.0), EventStream.SessionEvent(9L, ts(47), 8.0))
      query.processAllAvailable()
      // Nothing closed: the single live session holds all four events.
      spark.sql("SELECT * FROM eq_sess_late").count() shouldBe 0
      // Flush via watermark and confirm the one session with every event.
      Seq(1, 2).foreach { k =>
        input.addData(EventStream.SessionEvent(-1L, ts(2000L * k), 0.0))
        query.processAllAvailable()
      }
      val sessions = spark.sql("SELECT * FROM eq_sess_late WHERE user_id = 9").collect()
        .map(r => (r.getTimestamp(1).getTime, r.getInt(2), r.getDouble(3)))
      query.stop()
      sessions.toSeq shouldBe Seq((ts(0).getTime, 4, 15.0))
    }
    it("nearDupCandidatesWithinWatermark pairs near-dups inside the window, streamed == batch") {
      implicit val sqlCtx = spark.sqlContext
      def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
      val textA  = "the quick brown fox jumps over the lazy dog again and again"
      val textA2 = "the quick brown fox jumps over the lazy cat again and again"
      val rows = Seq(
        (1L, ts(0), textA),
        (2L, ts(5), textA2),                    // near-dup of 1, inside the 60-min window
        (3L, ts(300), textA),                   // same text, 5 HOURS later → outside the window
        (4L, ts(1), "completely different words about spark execution engines")
      )
      def pairsOf(df: org.apache.spark.sql.DataFrame) =
        EventStream.nearDupCandidatesWithinWatermark(df, "doc_id", "ts", "text",
            windowMinutes = 60, minEstJaccard = 0.4)
          .toDF().select("doc_a", "doc_b").distinct()
          .as[(Long, Long)].collect().toSet

      val batchPairs = pairsOf(rows.toDF("doc_id", "ts", "text"))
      batchPairs should contain((1L, 2L))
      batchPairs.flatMap(p => Set(p._1, p._2)) should not contain 3L // window respected
      batchPairs.flatMap(p => Set(p._1, p._2)) should not contain 4L // unrelated text

      // Streamed in two chronological micro-batches: the cross-batch pair
      // (1 arrives in batch 1, 2 in batch 2) comes out of bucket STATE.
      val input = MemoryStream[(Long, java.sql.Timestamp, String)]
      val query = EventStream.toMemorySink(
        EventStream.nearDupCandidatesWithinWatermark(
          input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
          windowMinutes = 60, minEstJaccard = 0.4).toDF(),
        "neardup_stream", org.apache.spark.sql.streaming.OutputMode.Append())
      input.addData((1L, ts(0), textA), (4L, ts(1), rows(3)._3))
      query.processAllAvailable()
      input.addData((2L, ts(5), textA2), (3L, ts(300), textA))
      query.processAllAvailable()
      val streamed = spark.sql("SELECT DISTINCT doc_a, doc_b FROM neardup_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      query.stop()
      streamed shouldBe batchPairs
    }
    it("a trained LM model scores a STREAM scan-locally (train batch, serve stream)") {
      // The KenLM serving shape: the model is a broadcast artifact, the
      // scorer a pure column transform — so the same call drives a stream.
      implicit val sqlCtx = spark.sqlContext
      val corpus = Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy cat")
      ).toDF("doc_id", "text")
      val model = TextAnalysis.lmTrainCompact(corpus, "text")
      val batch = corpus
        .select(col("doc_id"), TextAnalysis.lmScoreScanLocal(model, spark)(col("text")).as("s"))
        .select(col("doc_id"), col("s._2")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val input = MemoryStream[(Long, String)]
      val query = EventStream.toMemorySink(
        input.toDF().toDF("doc_id", "text")
          .select(col("doc_id"), TextAnalysis.lmScoreScanLocal(model, spark)(col("text")).as("s"))
          .select(col("doc_id"), col("s._2").as("nll")),
        "lm_stream_test", org.apache.spark.sql.streaming.OutputMode.Append())
      input.addData((1L, "the quick brown fox jumps over the lazy dog"),
                    (2L, "the quick brown fox jumps over the lazy cat"))
      query.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM lm_stream_test").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      query.stop()
      streamed shouldBe batch
    }
    it("sessionize merges events within the gap (batch semantics)") {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      val evs = Seq(
        EventStream.SessionEvent(1L, ts(0), 1.0),
        EventStream.SessionEvent(1L, ts(5), 2.0),
        EventStream.SessionEvent(2L, ts(1), 7.0)
      ).toDS()
      val out = EventStream.sessionize(evs, gapMinutes = 30).collect().map(r => r.user_id -> r).toMap
      out(1L).n_events shouldBe 2
      out(1L).total_value shouldBe 3.0
      out(2L).n_events shouldBe 1
    }
  }

  // -------------------------------------------------------------------
  // Streaming ⇄ batch EQUIVALENCE on the real events fixture: the same
  // operator code must produce the same answers whether the fixture is
  // read as a bounded frame or replayed chronologically through a
  // MemoryStream — and must agree with the DuckDB-verified batch gates.
  // -------------------------------------------------------------------
  describe("streaming ⇄ batch equivalence (sf0.01 events fixture)") {
    val sfDir = "/root/testdata/sf0.01"

    // Tpch.events normalizes ts to long nanos regardless of the fixture's
    // physical parquet type; operators work in the µs domain (matches the
    // gate oracles' epoch_us).
    def fixtureEvents = {
      graft.Tpch.events(spark, sfDir)
        .select(
          col("event_id"), col("user_id"),
          timestamp_micros(expr("ts div 1000")).as("ts"),
          col("event_type"), col("value")
        )
    }

    it("windowedAggregate: chronological replay == bounded frame == the q_events_window gate") {
      val ev    = fixtureEvents
      def key(r: org.apache.spark.sql.Row) = (r.getTimestamp(0).getTime, r.getString(1))
      def agg(r: org.apache.spark.sql.Row) = (r.getLong(2), BigDecimal(r.getDouble(3)).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      val batch = EventStream.windowedAggregate(ev.select("ts", "event_type", "value"))
        .collect().map(r => key(r) -> agg(r)).toMap

      // Streamed: same rows, three chronological micro-batches, Complete mode.
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(java.sql.Timestamp, String, Double)]
      val query = EventStream.toMemorySink(
        EventStream.windowedAggregate(input.toDF().toDF("ts", "event_type", "value")),
        "eq_win", org.apache.spark.sql.streaming.OutputMode.Complete())
      val rows = ev.orderBy("ts").select("ts", "event_type", "value")
        .as[(java.sql.Timestamp, String, Double)].collect()
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        query.processAllAvailable()
      }
      val streamed = spark.sql("SELECT * FROM eq_win").collect().map(r => key(r) -> agg(r)).toMap
      query.stop()
      streamed shouldBe batch

      // And both match the DuckDB-verified gate (hour arithmetic form;
      // cnt exact, sums compared at 4 decimals — the gate sums in exact
      // DECIMAL, the operator in double).
      val gate = SparkEntry.queries("q_events_window")(spark, sfDir)
        .collect().map(r => key(r) -> agg(r)).toMap
      batch shouldBe gate
    }

    it("dedupWithinWatermark: streamed dedup == batch dropDuplicates (key sets)") {
      val ev = fixtureEvents.withColumn("k", pmod(col("event_id"), lit(97)))
      val batchKeys = ev.dropDuplicates("k").select("k").as[Long].collect().toSet

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(java.sql.Timestamp, Long)]
      val query = EventStream.toMemorySink(
        EventStream.dedupWithinWatermark(input.toDF().toDF("ts", "k"), Seq("k")),
        "eq_dedup", org.apache.spark.sql.streaming.OutputMode.Append())
      input.addData(ev.orderBy("ts").select("ts", "k").as[(java.sql.Timestamp, Long)].collect().toIndexedSeq)
      query.processAllAvailable()
      val streamedKeys = spark.sql("SELECT k FROM eq_dedup").collect().map(_.getLong(0))
      query.stop()
      streamedKeys.length shouldBe streamedKeys.distinct.length // exactly once per key
      streamedKeys.toSet shouldBe batchKeys
    }

    it("sessionize: batch final state == gaps-and-islands last session; event-time variant emits ALL sessions") {
      import org.apache.spark.sql.expressions.Window
      val ev = fixtureEvents
      def norm(start: Long, n: Int, total: Double) =
        (start, n, BigDecimal(total).setScale(4, BigDecimal.RoundingMode.HALF_UP))

      // Reference: the q_events_sessions gaps-and-islands computation
      // (gate-shaped) — the FULL session set.
      val byUser = Window.partitionBy("user_id").orderBy("ts_us")
      val sess = ev
        .withColumn("ts_us", expr("unix_micros(ts)"))
        .withColumn("prev", lag("ts_us", 1).over(byUser))
        .withColumn("flag", when(col("prev").isNull || col("ts_us") - col("prev") > lit(1800000000L), 1).otherwise(0))
        .withColumn("sno", sum("flag").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sno")
        .agg(count(lit(1)).as("n"), min("ts_us").as("start_us"), sum("value").as("total"))
      val allSessions = sess
        .select("user_id", "start_us", "n", "total")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1) / 1000) -> norm(r.getLong(1) / 1000, r.getLong(2).toInt, r.getDouble(3)))
        .toMap
      val lastByUser = sess
        .withColumn("maxsno", max("sno").over(Window.partitionBy("user_id")))
        .where(col("sno") === col("maxsno"))
        .select("user_id", "start_us", "n", "total")
        .collect()
        .map(r => r.getLong(0) -> norm(r.getLong(1) / 1000, r.getLong(2).toInt, r.getDouble(3)))
        .toMap

      // Batch mapGroupsWithState (processing-time variant): per-user fold,
      // final/live session only — the documented emission caveat.
      val ds = ev.select(col("user_id"), col("ts"), col("value")).as[EventStream.SessionEvent]
      val batchFinal = EventStream.sessionize(ds, gapMinutes = 30)
        .collect()
        .map(r => r.user_id -> norm(r.session_start.getTime, r.n_events, r.total_value))
        .toMap
      batchFinal shouldBe lastByUser

      // Event-time variant on the bounded frame: flatMapGroupsWithState
      // emits every closed session PLUS the live one — the full session set.
      val batchEventTime = EventStream.sessionizeByEventTime(ds, gapMinutes = 30)
        .collect()
        .map(r => (r.user_id, r.session_start.getTime) -> norm(r.session_start.getTime, r.n_events, r.total_value))
        .toMap
      batchEventTime shouldBe allSessions

      // Streamed through the EVENT-TIME variant (the processing-time one
      // never quiesces under processAllAvailable — see sessionize scaladoc):
      // chronological micro-batches, Append mode. Closed sessions flow out
      // on gap restart or watermark timeout; far-future sentinel events
      // (user −1) push the watermark past every live session's horizon so
      // the tail sessions flush too.
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[EventStream.SessionEvent]
      val query = EventStream.toMemorySink(
        EventStream.sessionizeByEventTime(input.toDS(), gapMinutes = 30).toDF(), "eq_sess",
        org.apache.spark.sql.streaming.OutputMode.Append())
      val rows  = ds.orderBy("ts").collect()
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        query.processAllAvailable()
      }
      val maxTs = rows.last.ts.getTime
      Seq(1, 2).foreach { k => // two watermark advances: carry + timeout batch
        input.addData(EventStream.SessionEvent(-1L, new java.sql.Timestamp(maxTs + k * 3600000L * 24), 0.0))
        query.processAllAvailable()
      }
      val streamed = spark.sql("SELECT * FROM eq_sess").collect()
        .filter(_.getLong(0) >= 0)
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime) -> norm(r.getTimestamp(1).getTime, r.getInt(2), r.getDouble(3)))
        .toMap
      query.stop()
      streamed shouldBe allSessions
    }

    it("sessionizeByEventTime emits a closed session even when the restart beats the watermark (regression)") {
      // The ADVICE scenario: user 7's second session starts AFTER the gap
      // but BEFORE the watermark passes lastSeen+gap (the lone user never
      // advances the watermark past its own horizon in time). The closed
      // first session must still be emitted — by the gap-restart invocation,
      // not the (never-firing) timeout.
      implicit val sqlCtx = spark.sqlContext
      def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
      val input = MemoryStream[EventStream.SessionEvent]
      val query = EventStream.toMemorySink(
        EventStream.sessionizeByEventTime(input.toDS(), gapMinutes = 30, watermarkDelay = "10 minutes").toDF(),
        "eq_sess_drop", org.apache.spark.sql.streaming.OutputMode.Append())
      // Batch 1: session A (2 events). Watermark after batch: ts(5) - 10min.
      input.addData(
        EventStream.SessionEvent(7L, ts(0), 1.0),
        EventStream.SessionEvent(7L, ts(5), 2.0))
      query.processAllAvailable()
      // Batch 2: 40 min later — past the 30-min gap, but the watermark
      // (ts(-5)…ts(35)) has NOT passed ts(5)+30min when this processes.
      input.addData(EventStream.SessionEvent(7L, ts(45), 4.0))
      query.processAllAvailable()
      val emitted = spark.sql("SELECT * FROM eq_sess_drop").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getInt(2), r.getDouble(3)))
      query.stop()
      // Session A (start ts(0), 2 events, 3.0) must be out; session B is
      // still live and correctly unemitted.
      emitted should contain((7L, ts(0).getTime, 2, 3.0))
      emitted.length shouldBe 1
    }
  }

  describe("webdatasetStream byte-budget pacing") {
    it("filesPerTriggerFor bounds the trigger by the LARGEST shard, floored at 1") {
      // 4 typical shards + 1 oversized: budget of 2 GB over a 600 MB max
      // shard → 3 files/trigger (worst-case bound, not average).
      val mb = 1024L * 1024
      Multimodal.filesPerTriggerFor(Seq(200 * mb, 210 * mb, 600 * mb, 190 * mb), 2048 * mb) shouldBe 3
      // A shard larger than the whole budget still flows — one per trigger.
      Multimodal.filesPerTriggerFor(Seq(4096 * mb), 1024 * mb) shouldBe 1
      // No shards observed yet: conservatively one file per trigger per
      // byte budget unit of 1 (empty dir at stream start).
      Multimodal.filesPerTriggerFor(Seq.empty, 1024 * mb) should be >= 1
    }

    it("webdatasetStream drains shards under the budget and assembles the same samples") {
      val docs = (1L to 48L).map(i => (i, s"caption $i")).toDF("doc_id", "caption")
      val samples = docs.select(col("doc_id"),
        Multimodal.syntheticPng(col("doc_id")).as("image"),
        col("caption"),
        concat(lit("{\"id\":"), col("doc_id").cast("string"), lit("}")).as("meta"))
      val shardDir = java.nio.file.Files.createTempDirectory("wds_knob_").toString
      Multimodal.exportWebdataset(samples, "doc_id", "image", "caption", "meta", shardDir,
        samplesPerShard = 8)
      val sink = java.nio.file.Files.createTempDirectory("wds_knob_sink_").toString + "/out"
      val q = Multimodal.webdatasetStream(spark, s"$shardDir/shard-*.tar",
          maxBytesPerTrigger = 64L * 1024) // tiny budget → multi-trigger drain
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("wds_knob_ckpt_").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val out = spark.read.parquet(sink)
      out.count() shouldBe 48L
      out.select("key").distinct().count() shouldBe 48L
      out.where(col("image").isNull || col("caption").isNull || col("meta").isNull)
        .count() shouldBe 0L
    }
  }
}
