package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming
import graft.streaming.Streaming.Ev

/** Streaming-pipeline throughput measurement for the per-round
  * [[graft.Bench]] artifact (VERDICT r11 #5): §2.3 #33 was the one
  * component family with parity specs but no tracked perf number —
  * a state-store regression (a sessionizer that stopped evicting, a
  * monitor whose state went super-constant) would have shipped
  * silently. One `streaming_throughput` row now rides the same
  * min-of-3 / regression machinery as every query.
  *
  * What is measured: a fixed synthetic event set drained through the
  * two stateful shapes the engine deploys —
  *  - the INGEST pipeline: watermark → exactly-once dedup
  *    (`dropDuplicatesWithinWatermark`) → native `session_window`
  *    aggregation (two chained state stores, the append-mode
  *    multi-stateful plan), and
  *  - the CAUSAL MONITOR: the per-type z-score
  *    `flatMapGroupsWithState` detector (O(1) state per key) —
  * both fed from ONE MemoryStream in `chunks` micro-batches and
  * drained to the no-op sink, so the number is state-machinery
  * events/s, not sink cost. Event time advances monotonically with a
  * 3-hour jump every 20 rounds, so watermarks move, sessions
  * genuinely close, and dedup state is evicted — a drain that never
  * evicts would measure a pipeline no deployment runs.
  *
  * Determinism: the event set is a pure function of `n` (fixed base
  * timestamp, arithmetic values, ~2% planted event_id replays for the
  * dedup stage to drop), so a time regression IS a throughput
  * regression, exactly the sstable rows' contract.
  */
object StreamingThroughput {

  private val BaseMs = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private val Types = Array("view", "click", "purchase", "refund")
  private val Users = 2000

  /** The fixed event set: `n` events over `Users` users in event-time
    * order; every 50th event replays the previous event_id (the
    * at-least-once duplicate the dedup stage exists to drop). */
  def synthEvents(n: Int): Seq[Ev] = {
    (0 until n).map { i =>
      val round = i / Users
      val user = i % Users
      // 5-minute cadence inside a block of 20 rounds, then a 3-hour
      // jump: closes every open session (30-min gap) and advances the
      // watermark past the dedup horizon.
      val tsMs = BaseMs + (round % 20).toLong * 300000L +
        (round / 20).toLong * 10800000L
      val eventId = if (i % 50 == 0 && i > 0) (i - 1).toLong else i.toLong
      Ev(user.toLong, eventId, new Timestamp(tsMs),
        Types(i % Types.length), ((i * 31) % 1000) / 10.0)
    }
  }

  /** One timed drain of `evs` through both pipelines; returns wall
    * seconds. Fresh streams and state stores per call so min-of-3
    * attempts are independent measurements, not cache reads.
    *
    * The drain runs at `partitions` shuffle partitions (restored
    * after): every state store commits a checkpoint delta per
    * micro-batch, so at the bench session's 32 partitions the drain
    * measures 32 × chunks × stores checkpoint writes, not event
    * processing — a 400k-event drain was 6k events/s of pure commit
    * overhead. 8 partitions keeps multi-store parallelism honest
    * (state is still sharded and shuffled) at a per-batch cost the
    * event work can dominate. */
  def measureOnce(
      spark: SparkSession, evs: Seq[Ev], chunks: Int = 8,
      partitions: Int = 8): Double = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val shuffleKey = "spark.sql.shuffle.partitions"
    val priorParts = spark.conf.get(shuffleKey)
    spark.conf.set(shuffleKey, partitions.toString)
    try {
      val input = MemoryStream[Ev]
      // Both starts INSIDE the try that stops them: if the second
      // start throws, the first query (and its state stores) must not
      // leak into the bench session (ADVICE r12).
      var qIngest: org.apache.spark.sql.streaming.StreamingQuery = null
      var qMonitor: org.apache.spark.sql.streaming.StreamingQuery = null
      try {
        val ingest = Streaming.sessionizeNativeStream(
          Streaming.dedupStream(input.toDF().withWatermark("ts", "1 hour")))
        qIngest = ingest.writeStream.format("noop").outputMode("append").start()
        qMonitor = Streaming.zscoreAnomalies(input.toDS())
          .writeStream.format("noop").outputMode("append").start()
        val per = math.max(1, (evs.size + chunks - 1) / chunks)
        val t0 = System.nanoTime()
        evs.grouped(per).foreach { c =>
          input.addData(c)
          qIngest.processAllAvailable()
          qMonitor.processAllAvailable()
        }
        // The timed window includes the stops (unchanged from the
        // pre-r13 measurement, so the committed baseline still
        // compares); the outer finally's re-stop is then a no-op.
        qIngest.stop(); qMonitor.stop()
        (System.nanoTime() - t0) / 1e9
      } finally {
        if (qIngest != null) qIngest.stop()
        if (qMonitor != null) qMonitor.stop()
      }
    } finally spark.conf.set(shuffleKey, priorParts)
  }
}
