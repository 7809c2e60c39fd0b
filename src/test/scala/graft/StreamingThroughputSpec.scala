package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.StreamingThroughput

/** The streaming bench row's fixture and drain (VERDICT r11 #5): the
  * event set must be a pure function of n (a drifting fixture would
  * turn the min-of-3 time row into noise), must actually exercise the
  * stateful machinery (session closes, dedup replays), and the drain
  * must complete against the no-op sink. */
class StreamingThroughputSpec extends AnyFunSuite {
  import SparkTestSession._

  test("the synthetic event set is deterministic and plants the state work") {
    val a = StreamingThroughput.synthEvents(50000)
    val b = StreamingThroughput.synthEvents(50000)
    assert(a === b, "fixture must be a pure function of n")
    assert(a.size === 50000)
    // ~2% planted at-least-once replays for the dedup stage.
    val dupes = a.size - a.map(_.event_id).distinct.size
    assert(dupes === (a.size / 50) - 1, s"planted replays: $dupes")
    // Event time advances monotonically (watermark moves every chunk)...
    assert(a.sliding(2).forall(p => !p(1).ts.before(p.head.ts)))
    // ...and the 3-hour block jumps exist, so sessions genuinely close
    // (30-minute gap) and dedup state is evicted (1-hour watermark).
    val gaps = a.map(_.ts.getTime).distinct.sliding(2)
      .map { case Seq(x, y) => y - x }.toSeq
    assert(gaps.contains(10800000L - 19L * 300000L),
      "the every-20-rounds time jump must be present")
  }

  test("a small drain through both pipelines completes and takes nonzero time") {
    val evs = StreamingThroughput.synthEvents(4000)
    val sec = StreamingThroughput.measureOnce(spark, evs, chunks = 4)
    assert(sec > 0.0)
    // Independent attempts (fresh streams/state) must also work — the
    // min-of-3 contract.
    val sec2 = StreamingThroughput.measureOnce(spark, evs, chunks = 4)
    assert(sec2 > 0.0)
  }

  test("stage decomposition: stateless control has no state cost, stateful stages do") {
    val evs = StreamingThroughput.synthEvents(4000)
    val stages = StreamingThroughput.measureStages(spark, evs, chunks = 4).toMap
    assert(stages.keySet === Set("machinery", "dedup", "ingest", "monitor"))
    stages.foreach { case (name, d) =>
      assert(d.secs > 0.0 && d.batches > 0, s"$name: $d")
    }
    // The control pipeline is stateless by construction — if it ever
    // grows a state operator, the fixed-cost attribution is wrong.
    assert(stages("machinery").stateCommitMs === 0L,
      s"machinery stage must not touch a state store: ${stages("machinery")}")
    // Every stateful stage commits state each batch.
    Seq("dedup", "ingest", "monitor").foreach { n =>
      assert(stages(n).stateCommitMs > 0L, s"$n drained without state commits")
    }
    // The drain restores the session confs it tunes.
    assert(spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
      === "true")
  }

  test("sweepPoint: a second chunk count drains the same events end-to-end") {
    val evs = StreamingThroughput.synthEvents(4000)
    assert(StreamingThroughput.sweepPoint(spark, evs, chunks = 2) > 0.0)
  }
}
