package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SessionTuning.tune(spark)

    // JVM + codegen warmup on the smallest SF so measured times reflect
    // steady-state execution, not first-query class loading.
    try SparkEntry.queries("q_agg_group")(spark, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => () }

    // Box-speed canary: a fixed pure-Spark workload (range sum through a
    // shuffle), best of 3 AFTER warmup, reported beside the sweep. The
    // sweep's absolute seconds are only comparable across rounds when
    // the box ran at the same speed — the round-13 close-out measured
    // the SAME code at 371.7 s and 616.2 s hours apart under ambient
    // host contention. canary_sec attests the box: divide sweeps by
    // their canaries before reading a cross-round delta as a
    // regression.
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 50000000L, 1, 32)
        .selectExpr("id % 97 AS k", "id AS v").groupBy("k").sum("v").count()
      (System.nanoTime() - t0) / 1e9
    }
    canaryOnce()
    val canary = (1 to 3).map(_ => canaryOnce()).min

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      GateCache.releasePrivateCopies() // result materialized; outside the timer
      name -> dt
    }
    // Bracket the sweep: ambient contention can arrive MID-run (observed
    // canary 0.32 s at start of a sweep that still landed 30% slow), so
    // the artifact carries the box speed at BOTH ends.
    val canaryEnd = (1 to 3).map(_ => canaryOnce()).min
    val qs    = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json  = f"""{"metric":"total","value":$total%.3f,"unit":"sec","canary_sec":$canary%.3f,"canary_end_sec":$canaryEnd%.3f,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // Also persist the full per-query map to a file: a log-tail capture
    // can truncate the (long) JSON line, and the sweep is the round's
    // primary perf artifact (BENCH_r10 lost 145 of 221 queries that way).
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json"))
    Option(outPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(outPath, json.getBytes("UTF-8"))
    // LAST stdout line: a <500-byte summary that survives a 2 KB log-tail
    // capture intact. At 255 queries the full line above is ~6 KB, so a
    // tail-limited consumer saw only its truncated END and parsed nothing
    // (r14+r15 drivers both got parsed:null). The summary carries the
    // totals and points at the full per-query artifact on disk.
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","canary_sec":$canary%.3f,"canary_end_sec":$canaryEnd%.3f,"n_queries":${results.size},"full_results":"${outPath.toString}","sf":"$sfDir"}""")
    spark.stop()
  }
}
