package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.DecimalType

/** Driver-gate closures that run the STREAMING operators — the result the
  * driver hashes against DuckDB came through the Structured Streaming
  * engine (MemoryStream replay → flatMapGroupsWithState / windowed agg →
  * memory sink), not through a batch shortcut. This promotes the
  * streaming⇄batch equivalence specs to driver-checked facts.
  *
  * MemoryStream is inherently driver-fed (a test/replay source); at
  * production scale the same operators run unchanged over a Kafka/file
  * source — the gate exercises the identical operator code and state
  * machinery, only the source differs.
  *
  * Numeric domains are chosen so streaming-side arithmetic is EXACT and
  * therefore byte-comparable to the DuckDB oracle:
  *  - values are scaled to cents (exact DECIMAL(14,2)·100 as double —
  *    integer-valued, so double summation in ANY order is exact; a single
  *    final ÷100 matches DuckDB's CAST(DECIMAL AS DOUBLE) rounding);
  *  - session times live in the MILLISECOND domain, because
  *    [[EventStream.SessionEvent]] carries `java.sql.Timestamp` whose
  *    `getTime` is ms-resolution (µs floor-divided by 1000 on decode —
  *    the oracle mirrors with epoch_us(ts)//1000).
  */
object StreamGates {

  /** Chronological replay (ascending chunks) through a streaming query into
    * a memory sink; returns the sink contents materialized to a local
    * frame, with the query stopped and the temp view dropped.
    */
  private def replay[A](
      spark: SparkSession,
      rows: Seq[A],
      chunks: Int,
      mode: OutputMode,
      flush: Seq[A] = Seq.empty
  )(build: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[A] => DataFrame)(
      implicit enc: org.apache.spark.sql.Encoder[A]
  ): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[A]
    val name  = s"stream_gate_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // Stateful streaming pays a per-micro-batch cost PER STATE PARTITION
    // (store commit + task launch × partitions × batches), and the state
    // partition count is frozen from spark.sql.shuffle.partitions at query
    // start. The fixture replay keys state by ~1.5k users — 8 partitions
    // saturate local[32] for that cardinality; the session's batch setting
    // (sized for 100k-row shuffles) would triple the gate's wall clock in
    // pure state-store overhead. Scoped to the streaming query only:
    // restored before the batch post-processing runs.
    val priorShufflePartitions = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val query =
      try build(input).writeStream.format("memory").queryName(name).outputMode(mode).start()
      finally spark.conf.set("spark.sql.shuffle.partitions", priorShufflePartitions)
    try {
      rows.grouped(math.max(1, rows.length / chunks + 1)).foreach { chunk =>
        input.addData(chunk)
        query.processAllAvailable()
      }
      // Watermark-flush events each get their own micro-batch: one to carry
      // the watermark forward, the next to run the resulting timeouts.
      flush.foreach { f =>
        input.addData(f)
        query.processAllAvailable()
      }
      val sunk = spark.table(name)
      spark.createDataFrame(sunk.collectAsList(), sunk.schema)
    } finally {
      query.stop()
      spark.catalog.dropTempView(name)
    }
  }

  /** `q_events_sessions_stream`: the sf events fixture replayed through
    * [[EventStream.sessionizeByEventTime]]. Every session is emitted by the
    * streaming state machine (gap-restart or watermark timeout — two
    * far-future sentinel events flush the tail live sessions); `session_no`
    * is then assigned by start order per user, giving exactly the
    * gaps-and-islands gate shape at ms resolution.
    */
  def sessionsViaStream(spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val ev = graft.Tpch.events(spark, sfDir)
      .select(
        col("user_id"),
        timestamp_micros(expr("ts div 1000")).as("ts"),
        // exact cents as double — see class doc
        (col("value").cast(DecimalType(14, 2)) * 100).cast("double").as("value")
      )
      .as[EventStream.SessionEvent]
      .collect()
      .sortBy(_.ts.getTime)
      .toSeq
    val maxMs = ev.last.ts.getTime
    val flush = Seq(1, 2).map(k =>
      EventStream.SessionEvent(-1L, new java.sql.Timestamp(maxMs + k * 86400000L), 0.0))
    val sessions = replay(spark, ev, chunks = 3, mode = OutputMode.Append(), flush = flush)(
      input => EventStream.sessionizeByEventTime(input.toDS(), gapMinutes).toDF())
    import org.apache.spark.sql.expressions.Window
    sessions
      .where(col("user_id") >= 0)
      .withColumn("start_ms", unix_millis(col("session_start")))
      .withColumn("session_no",
        row_number().over(Window.partitionBy("user_id").orderBy("start_ms")).cast("long"))
      .select(
        col("user_id"),
        col("session_no"),
        col("n_events").cast("long").as("n_events"),
        col("start_ms"),
        (col("total_value") / 100.0).as("total_value")
      )
      .orderBy("user_id", "session_no")
  }

  /** `q_events_window_stream`: the fixture replayed through
    * [[EventStream.windowedAggregate]] in Complete mode — the final sink
    * table is the full tumbling-window aggregation, same shape as the
    * batch `q_events_window` gate.
    */
  def windowViaStream(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tpch.events(spark, sfDir)
      .select(
        timestamp_micros(expr("ts div 1000")).as("ts"),
        col("event_type"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast("double").as("value")
      )
      .as[(java.sql.Timestamp, String, Double)]
      .collect()
      .sortBy(_._1.getTime)
      .toSeq
    replay(spark, ev, chunks = 3, mode = OutputMode.Complete())(
      input => EventStream.windowedAggregate(input.toDF().toDF("ts", "event_type", "value")))
      .select(
        col("window_start").as("hour_start"),
        col("event_type"),
        col("cnt"),
        (col("sum_value") / 100.0).as("sum_value")
      )
      .orderBy("hour_start", "event_type")
  }
}
