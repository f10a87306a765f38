package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Real byte-pair encoding: a merge table TRAINED on the corpus (greedy
  * highest-count pair, the standard BPE recipe), then applied as a
  * deterministic encode kernel — replacing the counting approximation in
  * [[TextAnalysis.bpeTokenCount]] for workloads that need actual token
  * budgets (context-window packing, per-token pricing, chunking).
  *
  * Scale shape: training reduces the corpus to a word-frequency table
  * (one shuffle), caps it at `maxVocab` words (the standard recipe — pair
  * statistics beyond the head of the Zipf curve don't move merges), and
  * runs the greedy loop driver-side on that tiny table. Encoding
  * broadcasts the merge list and runs scan-local with a per-executor
  * word→count memo (corpus words repeat; the memo makes the amortized
  * cost per token O(1)).
  *
  * Determinism contract (replicated in the DuckDB oracle and pinned by
  * spec): training counts every adjacent symbol occurrence weighted by
  * word frequency, picks the highest count with ties broken by the
  * lexicographically smallest pair, and merges left-to-right
  * non-overlapping; encoding repeatedly merges the LEFTMOST occurrence of
  * the LOWEST-RANK applicable pair until none applies — each step is a
  * pure list operation, which is what makes the SQL replay exact.
  */
object Bpe {

  /** Train `numMerges` merges from the corpus' whitespace words.
    * Returns merges as "left right" strings (rank = index).
    */
  def trainMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int = 200,
      maxVocab: Int = 50000
  ): IndexedSeq[String] = {
    val wordCounts: Array[(String, Long)] = df
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      // Deterministic vocab cap: by count desc, then word — retraining on
      // the same corpus reproduces the identical merge table.
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))

    var vocab = wordCounts.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var done   = false
    while (merges.size < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (a, b) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
        merges += s"$a $b"
        vocab = vocab.map { case (syms, c) => (mergeAll(syms, a, b), c) }
      }
    }
    merges.toIndexedSeq
  }

  /** Left-to-right non-overlapping merge of every (a,b) adjacency — the
    * TRAINING-side vocabulary update.
    */
  private def mergeAll(syms: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) { out += a + b; i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Encode one word against a rank table: merge the LEFTMOST occurrence
    * of the LOWEST-RANK applicable pair, one merge per step, until no
    * pair applies — each step mirrors one recursion of the SQL replay.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var loop = true
    while (loop && syms.length > 1) {
      var best = Int.MaxValue
      var at   = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < best) { best = r; at = i }
        }
        i += 1
      }
      if (at < 0) loop = false
      else {
        val merged = syms(at) + syms(at + 1)
        syms = (syms.take(at) :+ merged) ++ syms.drop(at + 2)
      }
    }
    syms
  }

  private def ranksOf(merges: IndexedSeq[String]): Map[(String, String), Int] =
    merges.zipWithIndex.map { case (m, i) =>
      val Array(a, b) = m.split(" ", 2)
      (a, b) -> i
    }.toMap

  /** True BPE token count per text under a frozen merge table. The rank
    * map ships in the UDF closure (broadcast-by-closure — a few KB); a
    * per-executor word memo amortizes repeated words to a map lookup.
    */
  def tokenCount(merges: IndexedSeq[String]): Column => Column = {
    val ranks = ranksOf(merges)
    val memo  = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val u = udf { (t: String) =>
      if (t == null) 0L
      else {
        var total = 0L
        var i = 0
        val n = t.length
        while (i < n) {
          while (i < n && Character.isWhitespace(t.charAt(i))) i += 1
          val start = i
          while (i < n && !Character.isWhitespace(t.charAt(i))) i += 1
          if (i > start) {
            val w = t.substring(start, i)
            var c = memo.get(w)
            if (c == null) { c = encodeWord(w, ranks).length; memo.put(w, c) }
            total += c.toInt
          }
        }
        total
      }
    }
    (text: Column) => u(text)
  }

  /** Full BPE token SEQUENCE per text under a frozen merge table — the
    * actual encode output ([[tokenCount]] is its length, gate-pinned
    * separately). Same closure-shipped rank map; the memo caches each
    * word's token array, so repeated words cost one lookup.
    */
  def encodeTokens(merges: IndexedSeq[String]): Column => Column = {
    val ranks = ranksOf(merges)
    val memo  = new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    val u = udf { (t: String) =>
      if (t == null) Array.empty[String]
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        val n = t.length
        while (i < n) {
          while (i < n && Character.isWhitespace(t.charAt(i))) i += 1
          val start = i
          while (i < n && !Character.isWhitespace(t.charAt(i))) i += 1
          if (i > start) {
            val w = t.substring(start, i)
            var toks = memo.get(w)
            if (toks == null) { toks = encodeWord(w, ranks); memo.put(w, toks) }
            out ++= toks
          }
        }
        out.toArray
      }
    }
    (text: Column) => u(text)
  }

  /** Token-budget chunking under the SAME frozen merge table: cut at word
    * boundaries when the accumulated true-BPE cost would exceed
    * `chunkTokens` (words costlier than the whole budget become their own
    * chunk — nothing is ever dropped). Scan-local like
    * [[TextAnalysis.chunkByTokens]], but the budget is real tokens, not
    * whitespace words.
    */
  def chunkByBpeTokens(
      df: DataFrame,
      textCol: String,
      idCol: String,
      merges: IndexedSeq[String],
      chunkTokens: Int
  ): DataFrame = {
    require(chunkTokens >= 1, "chunkTokens must be >= 1")
    val ranks = ranksOf(merges)
    val memo  = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val u = udf { (t: String) =>
      if (t == null) Array.empty[(Int, String, Long)]
      else {
        def cost(w: String): Int = {
          var c = memo.get(w)
          if (c == null) { c = encodeWord(w, ranks).length; memo.put(w, c) }
          c.toInt
        }
        val words  = t.split("\\s+").filter(_.nonEmpty)
        val chunks = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
        val cur    = scala.collection.mutable.ArrayBuffer.empty[String]
        var curCost = 0L
        def flush(): Unit = if (cur.nonEmpty) {
          chunks += ((chunks.size, cur.mkString(" "), curCost))
          cur.clear(); curCost = 0L
        }
        words.foreach { w =>
          val c = cost(w)
          if (curCost + c > chunkTokens && cur.nonEmpty) flush()
          cur += w; curCost += c
        }
        flush()
        chunks.toArray
      }
    }
    df.select(col(idCol).cast("long").as("doc_id"), explode(u(col(textCol))).as("ch"))
      .select(
        col("doc_id"),
        col("ch._1").cast("long").as("chunk_idx"),
        col("ch._2").as("chunk_text"),
        col("ch._3").as("n_bpe_tokens")
      )
  }
}
