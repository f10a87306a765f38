package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Pins the library-visible session-tuning contract (README "Embedding a
  * session"): after [[SessionTuning.tune]], resolving a bucket-partitioned
  * index relation (64 `bucket=N` dirs — more than Spark's default
  * parallel-discovery threshold of 32) launches NO distributed
  * file-listing job; without the tuning the same read pays one. The
  * untuned half proves the detection works, so the tuned half's zero is
  * meaningful despite the async listener bus.
  */
class SessionTuningSpec extends SparkSpec {
  private def countJobsDuring(body: => Unit): Int = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      // The listener bus is async; give queued events time to drain.
      val deadline = System.nanoTime() + 3000000000L
      var last = -1
      while (System.nanoTime() < deadline && jobs.get() != last) {
        last = jobs.get(); Thread.sleep(200)
      }
      jobs.get()
    } finally spark.sparkContext.removeSparkListener(l)
  }

  describe("SessionTuning.tune") {
    it("keeps a 64-bucket relation read's file listing driver-side (no Spark job)") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("tune_listing").resolve("rel").toString
      (0 until 64).toDF("bucket")
        .withColumn("v", org.apache.spark.sql.functions.col("bucket"))
        .repartition(org.apache.spark.sql.functions.col("bucket"))
        .write.partitionBy("bucket").parquet(dir)

      val key  = "spark.sql.sources.parallelPartitionDiscovery.threshold"
      val orig = spark.conf.getOption(key)
      try {
        // Untuned (Spark default 32): resolving 64 partition dirs launches
        // a distributed listing job at DataFrame CREATION time.
        // Explicit schema throughout: schema INFERENCE is its own Spark
        // job and would contaminate the count — only the listing differs.
        def resolve(): Unit =
          spark.read.schema("v INT, bucket INT").parquet(dir).schema

        spark.conf.set(key, "32")
        val untuned = countJobsDuring(resolve())
        untuned should be >= 1

        SessionTuning.tune(spark)
        spark.conf.get(key) shouldBe "1024"
        val tuned = countJobsDuring(resolve())
        tuned shouldBe 0
      } finally {
        orig match {
          case Some(v) => spark.conf.set(key, v)
          case None    => spark.conf.unset(key)
        }
      }
    }
  }
}
