package graft

import graft.operators.{EventAnalytics, Privacy, RecordLinkage}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Behavioral contracts of the warehouse-analytics wave: privacy audit +
  * suppression, blocked fuzzy linkage / entity resolution, funnels, and
  * cohort retention. The gates pin the fixtures; these specs pin the edge
  * semantics the fixtures don't reach (nulls, order violations, blocking
  * escapes, fallback-path identity).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  describe("Privacy.kAnonymityAudit") {
    it("flags undersized and under-diverse QI groups") {
      val df = Seq(
        ("a", "x", 1), ("a", "x", 1), ("a", "x", 2), // size 3, 2 sensitive values
        ("b", "y", 5)                                // size 1, 1 sensitive value
      ).toDF("qi1", "qi2", "sens")
      val out = Privacy.kAnonymityAudit(df, Seq("qi1", "qi2"), k = 2, sensitiveCol = "sens", l = 2)
        .orderBy("qi1").collect()
      out.map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))) shouldBe
        Array(("a", 3L, 2L, 0L, 0L), ("b", 1L, 1L, 1L, 1L))
    }
  }

  describe("Privacy.kAnonymize") {
    val df = Seq(
      (1L, "a", "x", 10.0), (2L, "a", "x", 20.0), (3L, "a", "x", 30.0),
      (4L, "b", "y", 40.0)
    ).toDF("id", "qi1", "qi2", "bal")

    it("nulls every QI column of violating groups, passes the rest through, keeps column order") {
      val out = Privacy.kAnonymize(df, Seq("qi1", "qi2"), k = 2).orderBy("id")
      out.columns.toSeq shouldBe Seq("id", "qi1", "qi2", "bal")
      out.collect() shouldBe Array(
        Row(1L, "a", "x", 10.0), Row(2L, "a", "x", 20.0), Row(3L, "a", "x", 30.0),
        Row(4L, null, null, 40.0))
    }

    it("forced shuffled-join fallback (maxBroadcastGroups = 0) is row-identical") {
      val bcast = Privacy.kAnonymize(df, Seq("qi1", "qi2"), k = 2).orderBy("id").collect()
      val shuf  = Privacy.kAnonymize(df, Seq("qi1", "qi2"), k = 2, maxBroadcastGroups = 0)
        .orderBy("id").collect()
      shuf shouldBe bcast
    }

    it("treats null QI values as their own group (null-safe join keeps them consistent)") {
      val withNulls = Seq(
        (1L, null.asInstanceOf[String], 1.0), (2L, null.asInstanceOf[String], 2.0),
        (3L, "solo", 3.0)
      ).toDF("id", "qi1", "bal")
      val out = Privacy.kAnonymize(withNulls, Seq("qi1"), k = 2).orderBy("id").collect()
      // The two-null group clears k = 2 (stays null as-was); "solo" violates.
      out shouldBe Array(Row(1L, null, 1.0), Row(2L, null, 2.0), Row(3L, null, 3.0))
    }
  }

  describe("Privacy.generalizeToK") {
    it("picks the minimal ladder level whose groups all reach k, and drops the source column") {
      // Level 0 (identity): six singleton groups — violates k = 2.
      // Level 1 (parity): two groups of three — passes.
      val df = Seq((1L, 10), (2L, 11), (3L, 12), (4L, 13), (5L, 14), (6L, 15)).toDF("id", "q")
      val out = Privacy.generalizeToK(
        df,
        ladders = Seq(("q_gen", Seq(col("q").cast("long"), pmod(col("q"), lit(2)).cast("long")))),
        sourceCols = Seq("q"), k = 2)
      out.columns.toSeq shouldBe Seq("id", "q_gen", "gen_level")
      val rows = out.orderBy("id").collect()
      rows.map(_.getLong(2)).toSet shouldBe Set(1L)       // chose level 1
      rows.map(_.getLong(1)).toSet shouldBe Set(0L, 1L)    // parity classes, nothing suppressed
    }

    it("suppresses the residue when the coarsest level still violates") {
      val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b")).toDF("id", "q")
      val out = Privacy.generalizeToK(
        df, ladders = Seq(("q_gen", Seq(col("q")))), sourceCols = Seq("q"), k = 2)
        .orderBy("id").collect()
      out.map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))) shouldBe
        Array((1L, "a"), (2L, "a"), (3L, "a"), (4L, null))
    }
  }

  describe("RecordLinkage") {
    val rows = Seq(
      (1L, "red bolt"), (2L, "rad bolt"), (3L, "red colt"),
      (4L, "blue gear"), (5L, "glue hear"),
      (6L, "red bolt") // exact duplicate of id 1 — collapses in the dictionary
    ).toDF("id", "nm")

    it("links within blocks only — a pair escaping every blocking pass is never considered") {
      val dict  = RecordLinkage.nameDictionary(rows, "id", "nm")
      val pairs = RecordLinkage.fuzzyNamePairs(dict, maxDist = 2)
        .select("key_a", "key_b", "dist").orderBy("key_a", "key_b").collect()
      // (1,2) share last token, dist 1; (1,3) share first token, dist 1.
      // (2,3) is within dist 2 but shares NEITHER token — blocking escape.
      // (4,5) likewise (dist 2, both tokens differ) — escape, documented.
      pairs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe
        Array((1L, 2L, 1L), (1L, 3L, 1L))
    }

    it("canonicalizes each cluster to its minimum-key name, identity for unlinked names") {
      val out = RecordLinkage.canonicalizeByName(rows, "id", "nm", maxDist = 2)
        .select("id", "canon_name").orderBy("id").collect()
      out.map(r => (r.getLong(0), r.getString(1))) shouldBe Array(
        (1L, "red bolt"), (2L, "red bolt"), (3L, "red bolt"),
        (4L, "blue gear"), (5L, "glue hear"),
        (6L, "red bolt"))
    }
  }

  describe("EventAnalytics.funnel") {
    val stages = Seq("signup", "view", "click", "purchase")

    it("counts a stage only strictly after the previous stage's first completion") {
      val ev = Seq(
        // user 1: click@15 precedes view@20 and must NOT satisfy stage 3.
        (1L, 10L, "signup"), (1L, 20L, "view"), (1L, 15L, "click"),
        (1L, 25L, "click"), (1L, 30L, "purchase"),
        // user 2: purchase before signup completes nothing past stage 1.
        (2L, 5L, "purchase"), (2L, 10L, "signup"),
        // user 3: never signs up — stage 0 even with later activity.
        (3L, 5L, "view")
      ).toDF("user_id", "tus", "event_type")
      val out = EventAnalytics.funnel(ev, "user_id", "tus", "event_type", stages)
        .orderBy("user_id").collect()
      out.map(r => (r.getLong(0), r.getLong(5))) shouldBe Array((1L, 4L), (2L, 1L), (3L, 0L))
      out(0).getLong(3) shouldBe 25L // t3 = the click AFTER the view
      out(1).isNullAt(2) shouldBe true
    }

    it("a same-timestamp next-stage event does not count (strictly-later contract)") {
      val ev  = Seq((1L, 10L, "signup"), (1L, 10L, "view")).toDF("user_id", "tus", "event_type")
      val out = EventAnalytics.funnel(ev, "user_id", "tus", "event_type", stages).collect()
      out(0).getLong(5) shouldBe 1L
    }
  }

  describe("Quantiles.groupedExact") {
    it("reads exact k-th order statistics off the fixed-point histogram, including tie runs") {
      val df = Seq(
        ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 100.0),
        ("b", -0.005) // fp = floor(-0.5 + 0.5) = 0
      ).toDF("g", "v")
      val out = graft.operators.Quantiles.groupedExact(
        df, Seq("g"), "v", scale = 100,
        qs = Seq(("p50", 0.5), ("p90", 0.9))).orderBy("g").collect()
      // a: n=4 → p50 = 2nd smallest = 200; p90 = ceil(3.6)=4th = 10000.
      out.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))) shouldBe
        Array(("a", 4L, 200L, 10000L), ("b", 1L, 0L, 0L))
    }

    it("hits the exact boundary when q·n is an integer (k = q·n, not q·n + 1)") {
      val df  = (1 to 10).map(i => ("g", i.toDouble)).toDF("g", "v")
      val out = graft.operators.Quantiles.groupedExact(
        df, Seq("g"), "v", scale = 1, qs = Seq(("p50", 0.5))).collect()
      out(0).getLong(2) shouldBe 5L // 5th smallest of 1..10
    }
  }

  describe("Privacy.noisyCounts") {
    val df = Seq.tabulate(40)(i => (i.toLong, if (i % 2 == 0) "A" else "B")).toDF("id", "seg")

    it("releases count + seed-deterministic discrete-Laplace noise, true count dropped") {
      val out = Privacy.noisyCounts(df, Seq("seg"), seed = "s1").orderBy("seg")
      out.columns.toSeq shouldBe Seq("seg", "released")
      val rows = out.collect().map(r => (r.getString(0), r.getLong(1)))
      // Noise replayed from the shared hash contract, bit-for-bit.
      def tz(s: String) = java.lang.Integer.numberOfTrailingZeros(
        graft.functions.Anonymizer.stableHash(s) | (1 << 20))
      rows.foreach { case (seg, released) =>
        val noise = tz(s"$seg|s1|a") - tz(s"$seg|s1|b")
        released shouldBe 20L + noise
        math.abs(noise.toLong) should be <= 20L
      }
      // Re-running releases the identical values (reproducible release).
      Privacy.noisyCounts(df, Seq("seg"), seed = "s1").orderBy("seg")
        .collect().map(r => (r.getString(0), r.getLong(1))) shouldBe rows
    }
  }

  describe("LinkGraph.triangleCount") {
    it("counts each triangle exactly once, in either edge direction, ignoring loops/dups") {
      // K4 on {1,2,3,4} (4 triangles) + a pendant edge + a self-loop +
      // reversed duplicates.
      val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield (a, b)
      val edges = (k4 ++ Seq((5L, 1L), (6L, 6L), (2L, 1L))).toDF("src", "dst")
      graft.operators.LinkGraph.triangleCount(edges).head.getLong(0) shouldBe 4L
    }
    it("a 4-cycle has no triangles") {
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
      graft.operators.LinkGraph.triangleCount(edges).head.getLong(0) shouldBe 0L
    }
  }

  describe("Profiler.zScoreOutliers") {
    it("flags via the integer cross-multiplied inequality; zero-variance groups flag nothing") {
      val df = (Seq.fill(10)(("a", 0.0)) ++ Seq(("a", 100.0)) ++
        Seq(("b", 5.0), ("b", 5.0))).toDF("g", "v")
      val out = graft.operators.Profiler.zScoreOutliers(df, Seq("g"), "v")
      // z² of the spike = (x−μ)²/σ² = 10 > 9 → flagged; the zeros are not
      // (their z² = 0.1); constant group b flags nothing.
      out.where(col("is_outlier") === 1).select("g", "fp").collect()
        .map(r => (r.getString(0), r.getLong(1))) shouldBe Array(("a", 10000L))
    }
  }

  describe("Expectations / EventAnalytics.twap") {
    import org.apache.spark.sql.functions._
    import graft.operators.Expectations
    it("rules count fails in one pass; NULL predicates fail; FK orphans counted") {
      val df = Seq[(java.lang.Long, String)]((1L, "ok"), (60L, "ok"), (null, "ok")).toDF("v", "s")
      val rep = Expectations.validate(df, Seq(
        Expectations.Rule("v_range", col("v").between(1, 50)),
        Expectations.Rule("v_nullable_ok", col("v").isNull || col("v") > 0)))
        .as[(String, Long, Long)].collect().map { case (k, a, b) => k -> ((a, b)) }.toMap
      rep("v_range") shouldBe ((3L, 2L))       // 60 fails range; NULL fails (unknown ≠ pass)
      rep("v_nullable_ok") shouldBe ((3L, 0L)) // rule that tolerates nulls says so
      an[IllegalArgumentException] should be thrownBy
        Expectations.validate(df, Seq.empty)
      val child  = Seq(1L, 2L, 9L).toDF("fk")
      val parent = Seq(1L, 2L, 3L).toDF("pk")
      Expectations.validateFk("fk", child, parent, Seq("fk" -> "pk"))
        .as[(String, Long, Long)].head shouldBe (("fk", 3L, 1L))
    }
    it("reports n_rows=0/n_fail=0 on an empty input (sum() NULL must not NPE)") {
      val empty = Seq.empty[(java.lang.Long, String)].toDF("v", "s")
      Expectations.validate(empty, Seq(
        Expectations.Rule("v_range", col("v").between(1, 50))))
        .as[(String, Long, Long)].head shouldBe (("v_range", 0L, 0L))
    }
    it("twap weights each value by its holding interval; last observation carries none") {
      // key k: v=100 for 10 us, v=200 for 30 us, final v=999 unweighted.
      val df = Seq(("k", 0L, 1L, 100L), ("k", 10L, 2L, 200L), ("k", 40L, 3L, 999L))
        .toDF("key", "t", "id", "v")
      val r = graft.operators.EventAnalytics.twap(df, "key", "t", "v", tieCols = Seq("id"))
        .as[(String, Long, Long, Long)].head()
      r shouldBe (("k", 100L * 10 + 200L * 30, 40L, (100L * 10 + 200L * 30) / 40))
      // Equal-timestamp tie: the tie-ordered LAST member weights the gap.
      val tie = Seq(("k", 0L, 1L, 100L), ("k", 0L, 2L, 500L), ("k", 20L, 3L, 0L))
        .toDF("key", "t", "id", "v")
      graft.operators.EventAnalytics.twap(tie, "key", "t", "v", tieCols = Seq("id"))
        .select("weighted_sum").as[Long].head() shouldBe 500L * 20
    }
  }

  describe("Profiler.psiFixedPoint") {
    import org.apache.spark.sql.functions._
    it("identical snapshots score zero; a shift scores positive; terms are nonnegative") {
      val a = Seq.tabulate(1000)(i => Tuple1(((i * 37) % 100).toLong)).toDF("v")
      val same = graft.operators.Profiler.psiFixedPoint(a, a, "v", binWidth = 10L, numBins = 10)
        .select("contrib_nano").as[Long].collect()
      same.forall(_ == 0L) shouldBe true
      // B concentrates mass in the top bins — drift must register.
      val b = Seq.tabulate(1000)(i => Tuple1(60L + ((i * 37) % 40))).toDF("v")
      val drift = graft.operators.Profiler.psiFixedPoint(a, b, "v", binWidth = 10L, numBins = 10)
        .select("bin", "contrib_nano").as[(Long, Long)].collect()
      drift.map(_._2).forall(_ >= 0L) shouldBe true // (p−q) and ln(p/q) share sign
      drift.map(_._2).sum should be > 100000000L    // PSI > 0.1 — the classic "investigate" bar
      drift.map(_._1).toSet shouldBe (0L until 10L).toSet // every bin reported (add-one smoothing)
    }
    it("the counts-composed path (streaming monitor shape) equals the one-shot batch path") {
      // The streaming gate maintains the two sides as SEPARATE count
      // frames joined full-outer with zero-fill; that composition must be
      // row-identical to psiFixedPoint's union-tagged aggregation —
      // including bins occupied by only one side.
      val a = Seq.tabulate(500)(i => Tuple1(((i * 13) % 60).toLong)).toDF("v")
      val b = Seq.tabulate(400)(i => Tuple1(30L + ((i * 13) % 60))).toDF("v")
      val oneShot = graft.operators.Profiler.psiFixedPoint(a, b, "v", binWidth = 10L, numBins = 10)
        .orderBy("bin").collect().toSeq
      val bin = (c: org.apache.spark.sql.Column) => graft.operators.Profiler.psiBin(c, 10L, 10)
      val aCnt = a.groupBy(bin(col("v")).as("bin")).agg(count(lit(1)).as("a_cnt"))
      val bCnt = b.groupBy(bin(col("v")).as("bin")).agg(count(lit(1)).as("b_cnt"))
      val composed = graft.operators.Profiler.psiFromCounts(
        aCnt.join(bCnt, Seq("bin"), "full_outer")
          .select(col("bin"),
            coalesce(col("a_cnt"), lit(0L)).as("a_cnt"),
            coalesce(col("b_cnt"), lit(0L)).as("b_cnt")),
        numBins = 10).orderBy("bin").collect().toSeq
      composed shouldBe oneShot
    }
  }

  describe("EventAnalytics.rollingOutliers") {
    import org.apache.spark.sql.functions._
    it("flags a spike against its preceding window only; cold start never flags") {
      // Key 'a': 8 near-constant values, then a spike, then normal again.
      val rows = (1 to 8).map(i => ("a", i.toLong, 100L + (i % 2))) ++
        Seq(("a", 9L, 5000L), ("a", 10L, 100L)) ++
        (1 to 3).map(i => ("b", i.toLong, 100L)) // too short to ever flag
      val df = rows.toDF("k", "t", "v")
      val out = graft.operators.EventAnalytics.rollingOutliers(
        df, "k", Seq("t"), "v", lookback = 8, minPoints = 5)
        .select("k", "t", "is_outlier")
        .collect().map(r => ((r.getString(0), r.getLong(1)), r.getBoolean(2))).toMap
      out(("a", 9L)) shouldBe true  // spike vs its 8 predecessors
      (1 to 8).foreach(i => out(("a", i.toLong)) shouldBe false) // cold start + constants
      // t=10 is normal-valued, but its window CONTAINS the spike → huge
      // variance → not flagged either.
      out(("a", 10L)) shouldBe false
      (1 to 3).foreach(i => out(("b", i.toLong)) shouldBe false)
    }
    it("zero-variance window flags any deviation, never the same value") {
      val rows = (1 to 6).map(i => ("k", i.toLong, 50L)) ++ Seq(("k", 7L, 51L), ("k", 8L, 50L))
      val out = graft.operators.EventAnalytics.rollingOutliers(
        rows.toDF("k", "t", "v"), "k", Seq("t"), "v", lookback = 6, minPoints = 5)
        .where(col("is_outlier")).select("t").as[Long].collect()
      out shouldBe Array(7L) // dev² > 0 = z²·0; t=8's window has var > 0 now but tiny dev
    }
  }

  describe("Privacy.noisySums") {
    it("clamps per-unit contributions, quantizes to the clamp lattice, adds the shared noise") {
      // unit 1 contributes 150 fp (clamped to 100); unit 2 contributes 30.
      val df = Seq(("g", 1L, 1.0), ("g", 1L, 0.5), ("g", 2L, 0.3)).toDF("grp", "u", "v")
      val out = Privacy.noisySums(df, Seq("grp"), "u", "v", clampFp = 100L, seed = "s9")
      out.columns.toSeq shouldBe Seq("grp", "released_fp")
      def tz(s: String) = java.lang.Integer.numberOfTrailingZeros(
        graft.functions.Anonymizer.stableHash(s) | (1 << 20))
      val noise = tz("g|s9|a") - tz("g|s9|b")
      // clamped sum = 100 + 30 = 130 → units = (130 + 50) div 100 = 1.
      out.collect()(0).getLong(1) shouldBe 100L * (1L + noise)
    }
  }

  describe("EventAnalytics.scd2") {
    it("builds validity intervals with last-write-wins at timestamp ties and a current flag") {
      val ch = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 20L, 102L), (2L, 5L, 103L))
        .toDF("k", "ts", "id")
      val out = EventAnalytics.scd2(ch, Seq("k"), "ts", "id")
        .orderBy("k", "valid_from", "id").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))
      out shouldBe Array(
        (1L, 100L, 10L, 19L, 0L),  // closed by the ts=20 change
        (1L, 101L, 20L, 19L, 0L),  // tie: inverted (empty) interval, not current
        (1L, 102L, 20L, -1L, 1L),  // last write at ts=20 wins as current
        (2L, 103L, 5L, -1L, 1L))
    }
  }

  describe("EventStream.funnelByEventTime") {
    import graft.streaming.EventStream
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    def us(sec: Long) = (1700000000L + sec) * 1000000L

    it("advances per-user state across micro-batches and never counts an out-of-order early event") {
      implicit val sqlCtx = spark.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.FunnelEvent]
      val query = EventStream.toMemorySink(
        EventStream.funnelByEventTime(input.toDS(), Seq("signup", "view", "purchase")).toDF(),
        "funnel_stream_spec", org.apache.spark.sql.streaming.OutputMode.Update())
      try {
        // view@5 precedes signup@10 — must not satisfy stage 2.
        input.addData(
          EventStream.FunnelEvent(1L, ts(5), "view"),
          EventStream.FunnelEvent(1L, ts(10), "signup"))
        query.processAllAvailable()
        input.addData(EventStream.FunnelEvent(1L, ts(20), "view"))
        query.processAllAvailable()
        input.addData(EventStream.FunnelEvent(1L, ts(30), "purchase"))
        query.processAllAvailable()
        val snaps = spark.sql("SELECT stage_reached, times FROM funnel_stream_spec ORDER BY stage_reached")
          .collect().map(r => (r.getInt(0), r.getSeq[Long](1)))
        snaps.map(_._1).toSeq shouldBe Seq(1, 2, 3) // one advance per batch
        snaps.last._2 shouldBe Seq(us(10), us(20), us(30))
      } finally query.stop()
    }

    it("on a bounded frame emits exactly the batch funnel") {
      val ev = Seq(
        (1L, 10L, "signup"), (1L, 20L, "view"), (1L, 15L, "click"),
        (1L, 25L, "click"), (1L, 30L, "purchase"),
        (2L, 5L, "purchase"), (2L, 10L, "signup"),
        (3L, 5L, "view"))
      val stages = Seq("signup", "view", "click", "purchase")
      val bounded = EventStream.funnelByEventTime(
        ev.map { case (u, s, t) => EventStream.FunnelEvent(u, ts(s), t) }.toDS(), stages)
        .collect().map(s => (s.user_id, s.stage_reached.toLong,
          s.times.map(t => if (t >= 0) t else -1L))).sortBy(_._1)
      val batch = EventAnalytics.funnel(
        ev.toDF("user_id", "tus", "event_type")
          .withColumn("tus", col("tus") * 1000000L + lit(1700000000L) * 1000000L),
        "user_id", "tus", "event_type", stages)
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(5),
          (1 to 4).map(i => if (r.isNullAt(i)) -1L else r.getLong(i))))
      bounded shouldBe batch
    }
  }

  describe("EventAnalytics.cohortRetention") {
    it("buckets users by first-activity period and counts distinct actives per offset") {
      val day = 10L
      val ev = Seq(
        (1L, 1L), (1L, 25L),  // u1: cohort 0, active offsets 0 and 2
        (1L, 3L),             // same period as the first — deduped
        (2L, 12L), (2L, 13L)  // u2: cohort 1, offset 0 only
      ).toDF("user_id", "tus")
      val out = EventAnalytics.cohortRetention(ev, "user_id", "tus", periodLength = day)
        .orderBy("cohort_period", "period_offset").collect()
      out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe
        Array((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L))
    }
  }
}
