package graft.tools

import graft.operators.{Dedup, IndexStore}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CROSS-PROCESS writer-lease soak — the daily-crawl × backfill shape
  * the in-JVM two-appender spec cannot prove: two SEPARATE JVMs (no
  * shared ThreadLocal re-entrancy set, two independent FileSystem
  * views) appending to and compacting the SAME persisted signature
  * index concurrently for ~20 interleaved cycles each. The invariant:
  * every batch either LANDS COMPLETELY or its writer fails LOUDLY —
  * the lease may serialize or reject work, it may never let two
  * committers interleave and silently lose files.
  *
  * Driver mode (default): seeds the index, forks two worker JVMs with
  * this classpath (same add-opens the build uses), waits, then audits —
  * every doc id from every cycle a worker REPORTED COMMITTED must be
  * present exactly once (band 0 row per doc), and no unreported id may
  * be present. Exit 1 on any loss/duplication.
  *
  * Worker mode (argv: worker <dir> <id> <cycles> <docs>): per cycle,
  * append a disjoint batch of new docs (ids namespaced by worker), and
  * every 5th cycle run a full compact — so compactions interleave with
  * the rival's appends and the generation-swap fence gets exercised
  * across processes. Prints `committed <cycle>` per landed batch.
  *
  * SCALE.md row: 2 workers × 20 cycles × 50 docs, zero lost rows.
  */
object CrossProcessLeaseSoak {

  private def session(threads: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def docs(spark: SparkSession, ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, s"alpha beta gamma delta epsilon zeta eta theta doc$i word${i % 7} tail${i % 3}"))
      .toDF("doc_id", "text")
  }

  def main(args: Array[String]): Unit =
    if (args.headOption.contains("worker")) worker(args) else driver(args)

  private def worker(args: Array[String]): Unit = {
    val Array(_, dir, idS, cyclesS, perS) = args.take(5)
    val (id, cycles, per) = (idS.toInt, cyclesS.toInt, perS.toInt)
    val spark = session(4)
    (0 until cycles).foreach { c =>
      val ids = (0 until per).map(k => id * 10000000L + c * 10000L + k)
      Dedup.persistSignatureIndex(
        Dedup.buildSignatureIndex(docs(spark, ids), "text", "doc_id"), dir, append = true)
      // The append ran under the lease and returned: the batch is durable.
      println(s"committed $id $c")
      if (c % 5 == 4) {
        Dedup.compactSignatureIndex(spark, dir)
        println(s"compacted $id $c")
      }
    }
    spark.stop()
  }

  private def driver(args: Array[String]): Unit = {
    val cycles = if (args.length > 0) args(0).toInt else 20
    val per    = if (args.length > 1) args(1).toInt else 50
    val dir    = java.nio.file.Files.createTempDirectory("graft_xproc_lease_").toString + "/idx"
    val spark  = session(8)

    Dedup.persistSignatureIndex(
      Dedup.buildSignatureIndex(docs(spark, (1L to 100L)), "text", "doc_id"), dir)

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def fork(id: Int): (Process, java.io.File) = {
      val out = java.io.File.createTempFile(s"xproc_w$id", ".log")
      val cmd = Seq(javaBin) ++ opens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.CrossProcessLeaseSoak",
        "worker", dir, id.toString, cycles.toString, per.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(out)
      (pb.start(), out)
    }
    val t0 = System.nanoTime()
    val (p1, o1) = fork(1)
    val (p2, o2) = fork(2)
    val rc1 = p1.waitFor()
    val rc2 = p2.waitFor()
    val secs = (System.nanoTime() - t0) / 1e9

    // Committed cycles per worker, from the workers' own reports.
    def committed(f: java.io.File, id: Int): Set[Int] =
      scala.io.Source.fromFile(f).getLines()
        .collect { case l if l.startsWith(s"committed $id ") => l.split(" ")(2).toInt }
        .toSet
    val c1 = committed(o1, 1)
    val c2 = committed(o2, 2)

    // Audit: one band-0 row per expected doc — no loss, no duplication.
    val expected: Set[Long] =
      (1L to 100L).toSet ++
        c1.flatMap(c => (0 until per).map(k => 1 * 10000000L + c * 10000L + k)) ++
        c2.flatMap(c => (0 until per).map(k => 2 * 10000000L + c * 10000L + k))
    val got = spark.read.parquet(IndexStore.dataDir(spark, dir))
      .where(col("band") === 0).groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val missing = expected.filterNot(got.contains)
    val dupes   = got.filter(_._2 != 1L)
    val stray   = got.keySet -- expected

    println(f"[xproc-lease] workers rc=($rc1,$rc2) cycles=(${c1.size},${c2.size})/$cycles " +
      f"docs=${expected.size} present=${got.size} missing=${missing.size} " +
      f"dupes=${dupes.size} stray=${stray.size} wall=$secs%.1f s")
    if (missing.nonEmpty) println(s"[xproc-lease] MISSING: ${missing.toSeq.sorted.take(20)}")
    if (dupes.nonEmpty)   println(s"[xproc-lease] DUPES: ${dupes.toSeq.sortBy(_._1).take(20)}")
    if (stray.nonEmpty)   println(s"[xproc-lease] STRAY: ${stray.toSeq.sorted.take(20)}")
    spark.stop()
    if (missing.nonEmpty || dupes.nonEmpty || stray.nonEmpty || rc1 != 0 || rc2 != 0)
      sys.exit(1)
  }
}
